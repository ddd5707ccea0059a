"""Vectorized MurmurHash3_x64_128 specialized to 8-byte keys, plus the
reference's deterministic row-seed schedule.

Semantics reproduced (bit-for-bit) from the reference CountMinDB:

- The reference hashes a single ``uint64_t`` key with
  ``MurmurHash3_x64_128(&key, 8, seed, out)`` and keeps ``out[1]`` (the h2
  word) — /root/reference/cm.h:387-391.  For an 8-byte input the generic
  algorithm collapses to a short chain of ~15 wrapping uint64 ops (the body
  loop is empty, the tail consumes all 8 bytes into ``k1``), which we express
  as NumPy uint64 ufunc chains so a whole token array is hashed at once with
  no per-row Python.
- Row seeds are drawn from ``std::mt19937_64(master_seed)`` through libstdc++
  ``std::uniform_int_distribution<uint32_t>(0, 2^32-1)``
  — /root/reference/cm.h:400-407.  We re-derive that schedule exactly
  (mt19937_64 + the libstdc++ downscaling algorithm) so sketches built here
  place counters in the same columns as the reference for a given
  ``(eps, delta, seed)``.

This module is pure NumPy — it is the single hot-path hash used by every
sketch in the library (Count-Min, HLL, Bloom, MinHash, SimHash).
"""

from __future__ import annotations

import threading

import numpy as np

_U64 = np.uint64

# MurmurHash3 x64_128 constants (public domain algorithm, Austin Appleby).
_C1 = _U64(0x87C37B91114253D5)
_C2 = _U64(0x4CF5AD432745937F)
_F1 = _U64(0xFF51AFD7ED558CCD)
_F2 = _U64(0xC4CEB9FE1A85EC53)
_LEN8 = _U64(8)
_R31 = _U64(31)
_R33 = _U64(33)
_R64_31 = _U64(64 - 31)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _R33)
    k = k * _F1
    k = k ^ (k >> _R33)
    k = k * _F2
    k = k ^ (k >> _R33)
    return k


def murmur3_x64_128_u64(keys: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash an array of uint64 keys; returns ``(h1, h2)`` uint64 arrays.

    Bit-identical to ``MurmurHash3_x64_128(&key, 8, seed, out)`` of the
    reference for every key/seed (verified against compiled golden vectors in
    tests/test_hashing.py).
    """
    k1 = np.asarray(keys, dtype=_U64).copy()
    k1 *= _C1
    k1 = (k1 << _R31) | (k1 >> _R64_31)
    k1 *= _C2

    s = _U64(seed & 0xFFFFFFFFFFFFFFFF)
    h1 = s ^ k1
    h2 = np.full(k1.shape, s, dtype=_U64)

    h1 ^= _LEN8
    h2 ^= _LEN8
    h1 += h2
    h2 += h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 += h2
    h2 += h1
    return h1, h2


def hash_u64(keys: np.ndarray, seed: int) -> np.ndarray:
    """The reference's hash: h2 word of murmur3_x64_128 (cm.h:390)."""
    return murmur3_x64_128_u64(keys, seed)[1]


# ---------------------------------------------------------------------------
# hot path: chunked, workspace-reusing h2 (zero large allocations per call)
# ---------------------------------------------------------------------------
# The naive ufunc chain above allocates ~10 array-sized uint64 temporaries per
# call; with 32 Python workers hashing multi-MB batches concurrently, the
# resulting mmap/page-fault churn serializes in the kernel and collapses
# scaling (measured: 151 -> 684 M hashes/s aggregate at 32 processes after
# this change). This variant processes fixed-size chunks through a
# preallocated workspace. Bit-identical output to hash_u64.
#
# Chunk size: the full workspace (5 buffers x _CHUNK x 8 B) must fit the
# per-core L2 (1.25 MB on this host) so the fused accumulate_into path never
# touches shared cache/DRAM between hash and histogram. Measured aggregate
# kernel throughput at 32 procs: 256k chunks 200 M tokens/s, 64k 375 M,
# 32k 530 M, 8k 430 M (loop overhead) -> 32k.

_CHUNK = 1 << 15
# Workspaces are THREAD-LOCAL: driver-side callers (e.g. a query fan-out
# over a ThreadPoolExecutor, py4j callback threads) may hash concurrently
# in one process, and a shared scratch buffer would let one thread
# overwrite another's half-computed columns — garbage indices at best,
# silently wrong but in-range estimates at worst.
_tls = threading.local()


def _workspace():
    ws = getattr(_tls, "ws", None)
    if ws is None:
        ws = _tls.ws = (np.empty(_CHUNK, np.uint64),
                        np.empty(_CHUNK, np.uint64),
                        np.empty(_CHUNK, np.uint64),
                        np.empty(_CHUNK, np.uint64))
    return ws


def _h2_chunk(seg: np.ndarray, s8: np.uint64, a: np.ndarray, b: np.ndarray,
              t: np.ndarray) -> np.ndarray:
    """h2 of one chunk into buffer ``b``; ``a``/``t`` are scratch."""
    np.multiply(seg, _C1, out=a)
    np.left_shift(a, _R31, out=t)
    np.right_shift(a, _R64_31, out=a)
    np.bitwise_or(a, t, out=a)
    np.multiply(a, _C2, out=a)
    # h1' = (seed ^ k1) ^ len = k1 ^ s8 ; h2' = seed ^ len = s8 (scalar)
    np.bitwise_xor(a, s8, out=a)
    a += s8                      # h1 += h2
    np.add(a, s8, out=b)         # h2 += h1
    for reg in (a, b):           # fmix64 both words
        np.right_shift(reg, _R33, out=t); reg ^= t; reg *= _F1
        np.right_shift(reg, _R33, out=t); reg ^= t; reg *= _F2
        np.right_shift(reg, _R33, out=t); reg ^= t
    a += b
    b += a
    return b


_WIDE_MASK32 = _U64(0xFFFFFFFF)


def _widen_chunk(seg: np.ndarray, buf: np.ndarray) -> np.ndarray:
    """Chunk-local widening to the uint64 key domain (tokens_to_u64
    semantics: narrow ints are reinterpreted as their unsigned value) —
    avoids a full-array 8-byte copy of the input."""
    if seg.dtype == np.uint64:
        return seg
    out = buf[:seg.shape[0]]
    np.copyto(out, seg, casting="unsafe")  # sign-extends signed inputs
    if seg.dtype.kind == "i" and seg.dtype.itemsize <= 4:
        out &= _WIDE_MASK32
    return out


def murmur_h2_into(keys: np.ndarray, seed: int, out: np.ndarray) -> np.ndarray:
    """Chunked h2 into a caller-provided uint64 buffer (bit-identical to
    ``hash_u64`` after tokens_to_u64 widening). Accepts any integer dtype."""
    n = keys.shape[0]
    a_full, b_full, t_full, wide = _workspace()
    s8 = _U64((int(seed) & 0xFFFFFFFFFFFFFFFF) ^ 8)
    for st in range(0, n, _CHUNK):
        en = min(st + _CHUNK, n)
        m = en - st
        seg = _widen_chunk(keys[st:en], wide)
        out[st:en] = _h2_chunk(seg, s8, a_full[:m], b_full[:m], t_full[:m])
    return out


def columns_into(keys: np.ndarray, seed: int, width: int,
                 out_cols: np.ndarray) -> np.ndarray:
    """Count-Min column placement ``h2(keys, seed) % width`` into a
    caller-provided int64 buffer — the entire hot path of a sketch build,
    chunked through the shared workspace. Accepts any integer dtype."""
    n = keys.shape[0]
    a_full, b_full, t_full, wide = _workspace()
    s8 = _U64((int(seed) & 0xFFFFFFFFFFFFFFFF) ^ 8)
    w = _U64(width)
    for st in range(0, n, _CHUNK):
        en = min(st + _CHUNK, n)
        m = en - st
        seg = _widen_chunk(keys[st:en], wide)
        b = _h2_chunk(seg, s8, a_full[:m], b_full[:m], t_full[:m])
        b %= w
        np.copyto(out_cols[st:en], b, casting="unsafe")
    return out_cols


def accumulate_into(keys: np.ndarray, seeds, width: int, table: np.ndarray,
                    weights: np.ndarray | None = None) -> None:
    """Fused Count-Min scatter: ``table[j] += histogram(h2(keys, seeds[j]) %
    width)`` for every depth row, in one chunked pass.

    Versus hash-then-bincount over the full array, the column indices here
    never leave the chunk workspace (they'd otherwise stream n*8 bytes to
    DRAM and back per depth row — the dominant memory traffic of a build,
    and the term that anti-scales when every core runs a worker). Token
    chunks are widened once and reused across all d rows. Bit-identical
    accumulation to the unfused path (same hash, same modulo, integer adds).
    """
    n = keys.shape[0]
    if n == 0:
        return
    a_full, b_full, t_full, wide = _workspace()
    cols = _cols_workspace()
    w = _U64(width)
    s8s = [_U64((int(s) & 0xFFFFFFFFFFFFFFFF) ^ 8) for s in seeds]
    d = len(s8s)
    fweights = None
    iweights = None
    # strategy: bincount's O(m + width) per chunk is unbeatable while the
    # row fits L2 (and is the multi-worker-validated hot path), but its
    # width-scan term collapses for wide sketches (w=1e6: 6.7 vs 16.6
    # M tok/s; w=4e6: 2.3 vs 13.8 — measured sweep in BENCH/BASELINE.md
    # session C2); past ~4 chunks' worth of counters switch to indexed
    # scatter, which touches only the m hit counters per chunk.
    scatter = width > 4 * _CHUNK
    if weights is not None:
        # the int64 table can only hold integral counts: the scatter path
        # casts weights to int64 and the bincount path truncates the
        # float64 chunk SUM on .astype(int64) — both silently corrupt
        # fractional weights, so reject them on EVERY path (the two paths
        # must agree for any width)
        fweights = np.asarray(weights, dtype=np.float64)
        iweights = fweights.astype(np.int64)
        if not np.array_equal(iweights, fweights):
            raise ValueError(
                "accumulate_into requires integral weights (counts); "
                "non-integral weights would truncate into the int64 "
                "counter table")
    for st in range(0, n, _CHUNK):
        en = min(st + _CHUNK, n)
        m = en - st
        seg = _widen_chunk(keys[st:en], wide)
        wseg = fweights[st:en] if fweights is not None else None
        for j in range(d):
            b = _h2_chunk(seg, s8s[j], a_full[:m], b_full[:m], t_full[:m])
            b %= w
            c = cols[:m]
            np.copyto(c, b, casting="unsafe")
            if scatter:
                np.add.at(table[j], c,
                          1 if wseg is None else iweights[st:en])
            elif wseg is None:
                table[j] += np.bincount(c, minlength=width)
            else:
                table[j] += np.bincount(c, weights=wseg,
                                        minlength=width).astype(np.int64)


def _cols_workspace() -> np.ndarray:
    cols = getattr(_tls, "cols", None)
    if cols is None:
        cols = _tls.cols = np.empty(_CHUNK, np.int64)
    return cols


def h1h2_chunks(keys: np.ndarray, seed: int):
    """Generator over (start, end, h1_view, h2_view) for fixed-size chunks —
    both 64-bit murmur words, workspace-backed (views are INVALIDATED by the
    next iteration; consume within the loop). Used by Bloom (double hashing)
    and any consumer that wants both words without large allocations."""
    n = keys.shape[0]
    a_full, b_full, t_full, wide = _workspace()
    s8 = _U64((int(seed) & 0xFFFFFFFFFFFFFFFF) ^ 8)
    for st in range(0, n, _CHUNK):
        en = min(st + _CHUNK, n)
        m = en - st
        seg = _widen_chunk(keys[st:en], wide)
        b = _h2_chunk(seg, s8, a_full[:m], b_full[:m], t_full[:m])
        # after _h2_chunk: a holds the final h1 word, b the final h2 word
        yield st, en, a_full[:m], b
    return


def tokens_to_u64(tokens: np.ndarray) -> np.ndarray:
    """Widen int32 tokens to the uint64 key domain the reference hashes.

    The reference draws uint32 keys and widens to uint64 (totaltest.cpp:19,
    39); int32 tokens are reinterpreted as their unsigned value first so
    negative int32 stays in [0, 2^32).
    """
    a = np.asarray(tokens)
    if a.dtype == np.uint64:
        return a
    if a.dtype.kind == "i":
        return a.astype(np.int64).astype(np.uint64) & _U64(0xFFFFFFFF) if a.dtype.itemsize <= 4 else a.astype(np.uint64)
    return a.astype(np.uint64)


# ---------------------------------------------------------------------------
# mt19937_64 + libstdc++ uniform_int_distribution<uint32_t> seed schedule
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


class MT19937_64:
    """Pure-Python mt19937_64 (matches std::mt19937_64). Cold path only —
    used once per sketch config to derive d row seeds (d <= ~30)."""

    _N = 312
    _M = 156
    _MATRIX_A = 0xB5026F5AA96619E9
    _UPPER = 0xFFFFFFFF80000000
    _LOWER = 0x7FFFFFFF

    def __init__(self, seed: int) -> None:
        mt = [0] * self._N
        mt[0] = seed & _MASK64
        for i in range(1, self._N):
            mt[i] = (6364136223846793005 * (mt[i - 1] ^ (mt[i - 1] >> 62)) + i) & _MASK64
        self._mt = mt
        self._idx = self._N

    def next_u64(self) -> int:
        if self._idx >= self._N:
            mt = self._mt
            for i in range(self._N):
                x = (mt[i] & self._UPPER) | (mt[(i + 1) % self._N] & self._LOWER)
                xa = x >> 1
                if x & 1:
                    xa ^= self._MATRIX_A
                mt[i] = mt[(i + self._M) % self._N] ^ xa
            self._idx = 0
        y = self._mt[self._idx]
        self._idx += 1
        y ^= (y >> 29) & 0x5555555555555555
        y ^= (y << 17) & 0x71D67FFFEDA60000 & _MASK64
        y ^= (y << 37) & 0xFFF7EEE000000000 & _MASK64
        y ^= y >> 43
        return y & _MASK64


def seed_schedule(master_seed: int, n: int) -> tuple[int, ...]:
    """First ``n`` draws of libstdc++
    ``uniform_int_distribution<uint32_t>(0, 2^32-1)`` over
    ``mt19937_64(master_seed)`` — the reference's row-seed derivation
    (cm.h:400-407).

    Modern libstdc++ (GCC >= 9) downscales a full-width 64-bit generator with
    Lemire's multiply-shift (Fast Random Integer Generation in an Interval,
    TOMACS 2019): ``product = u128(draw) * 2^32``; reject while
    ``u64(product) < (2^64 % 2^32)`` (never, for this range); return
    ``product >> 64``.
    """
    mt = MT19937_64(master_seed)
    rng = 1 << 32
    threshold = ((1 << 64) - rng) % rng
    out = []
    for _ in range(n):
        product = mt.next_u64() * rng
        while (product & _MASK64) < threshold:
            product = mt.next_u64() * rng
        out.append(product >> 64)
    return tuple(out)


def bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 arrays (0 -> 0). Exact for all 64-bit
    values (no float round-trip). Branch-free: each binary-search round
    adds its step and shifts via arithmetic on the whole array — no boolean
    mask gather/scatter (~3x faster on all-distinct streams, where this is
    the HLL rank extraction's dominant cost)."""
    r = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        step = (v >= (_U64(1) << _U64(s))).astype(np.int64) * s
        r += step
        v = v >> step.astype(np.uint64)
    # after the rounds v is 1 for every nonzero input, 0 otherwise
    return r + v.astype(np.int64)
