"""Priority sampling: a mergeable fixed-size WEIGHTED sample supporting
near-variance-optimal subset-sum estimation (Duffield, Lund, Thorup,
"Priority sampling for estimation of arbitrary subset sums", JACM 2007).

North-rule companion sketch: the theta sketch (theta.py) is a uniform
bottom-k sample of DISTINCT keys — it answers set-cardinality questions.
Priority sampling is its weighted counterpart over (key, weight) items:
keep the k items with the largest priorities q_i = w_i / u_i, u_i
uniform(0,1]; with tau = the (k+1)-th largest priority, the estimator
w_hat_i = max(w_i, tau) for sampled i (0 otherwise) is unbiased for any
subset sum Sum_{i in S} w_i, with variance within a factor (k+1)/(k-1)
of the optimal k-sample scheme. Use case here: a few-KB sample of
documents weighted by n_tok that answers "total tokens per source /
per predicate" without rescanning the corpus.

Determinism contract (same trade the theta sketch makes): u_i is derived
from the key bytes — u_i = (fmix64(polyhash(key) ^ seed) + 1) / 2^64 —
so the sample is a pure function of the key set, merges are associative,
commutative, idempotent, and byte-identical in any partition order
(tested). The randomness is fixed-per-seed rather than fresh-per-run;
estimates on adversarially chosen keys could correlate with the hash,
exactly as for KMV/theta.

Item model: keys are assumed DISTINCT identifiers (doc_id). If the same
key arrives twice (replayed batch, duplicated row), the copies collide
on the same u_i and are collapsed keeping the LARGEST weight —
max-weight collapse is associative/commutative/idempotent, so replays
cannot double-count. Each item may carry an optional small string
``payload`` (e.g. the source label) so group sums are answerable from
the sample alone; on a weight tie the lexicographically largest payload
wins, keeping the collapse deterministic.

No counterpart in the reference (CountMinDB is frequency-only); cited
against cm.h only in that this follows the same mergeable-aggregator
contract as every other sketch here.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import _fmix64

_MAGIC = b"PSM1"
_VERSION = 2
_FULL = float(1 << 64)
_B = np.uint64(1099511628211)  # FNV-1a style odd multiplier for polyhash

# exact fixed-point scale for the running weight total: every finite
# IEEE double is m * 2^e with e >= -1074, so sums in 2^-1074 units are
# EXACT arbitrary-precision integers — and integer addition is
# associative, which float += is not: a float total_weight made merge
# bytes depend on where the stream was split (hypothesis-caught).
_TW_SHIFT = 1074


def _sum_exact_54(a: np.ndarray) -> int:
    """Exact sum of int64 values < 2^54: 512-wide int64 partial sums
    cannot overflow, the few partials fold into a Python int."""
    n = a.shape[0]
    pad = (-n) % 512
    if pad:
        a = np.concatenate([a, np.zeros(pad, dtype=np.int64)])
    return sum(int(x) for x in a.reshape(-1, 512).sum(axis=1).tolist())


def _weights_units(w: np.ndarray) -> int:
    """sum(w) in exact 2^-1074 units: frexp mantissas are exact 53-bit
    integers; group by exponent, chunk-sum each group, shift into place.
    Order-independent by construction."""
    m, e = np.frexp(w)
    mi = np.round(m * float(1 << 53)).astype(np.int64)  # exact, [2^52, 2^53)
    sh = e.astype(np.int64) + (_TW_SHIFT - 53)
    order = np.argsort(sh, kind="stable")
    ssh, smi = sh[order], mi[order]
    starts = np.flatnonzero(np.r_[True, ssh[1:] != ssh[:-1]])
    bounds = np.append(starts, ssh.shape[0])
    total = 0
    for gi in range(starts.shape[0]):
        v = _sum_exact_54(smi[bounds[gi]:bounds[gi + 1]])
        s = int(ssh[starts[gi]])
        # negative shifts only for subnormals, whose mantissas carry the
        # matching trailing zeros (w * 2^1074 is integral) — exact
        total += (v << s) if s >= 0 else (v >> -s)
    return total


def _polyhash_segments(flat: np.ndarray, lens: np.ndarray,
                       seed: int) -> np.ndarray:
    """64-bit polynomial hash of each byte segment of ``flat`` (uint8,
    concatenated utf-8 keys, segment lengths ``lens``), finalized with
    fmix64 for uniformity: one power-table gather + one segmented
    add.reduceat — the doc_fingerprint idiom, no per-key Python loop."""
    n = lens.shape[0]
    out = np.zeros(n, dtype=np.uint64)
    total = int(lens.sum())
    if total:
        vals = flat.astype(np.uint64)
        maxlen = int(lens.max())
        pows = np.ones(maxlen, dtype=np.uint64)
        if maxlen > 1:
            np.multiply.accumulate(
                np.full(maxlen - 1, _B, np.uint64), out=pows[1:])
        ends = np.cumsum(lens)
        starts = ends - lens
        item_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.arange(total, dtype=np.int64) - starts[item_of]
        exps = lens[item_of] - 1 - pos
        nonempty = lens > 0
        out[nonempty] = np.add.reduceat(vals * pows[exps],
                                        starts[nonempty])
    # mix the length in so "a" and "a\0"-style prefixes can't collide
    out ^= lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return _fmix64(out ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))


def _priorities(hashes: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """q = w / u with u = (h+1)/2^64 in (0, 1]."""
    u = (hashes.astype(np.float64) + 1.0) / _FULL
    return weights / u


def _dedup_keep(h: np.ndarray, w: np.ndarray, key_at, pay_at) -> np.ndarray:
    """One representative index per distinct key in a batch: the copy with
    the max (weight, payload) — the same collapse rule ``_absorb`` applies.
    Vectorized on the 64-bit key hash (same key => same hash); only
    same-hash groups (rare) materialize and compare actual key bytes.

    This MUST run before the top-(k+1) pre-trim: trimming a batch on raw
    priorities first lets a duplicated key occupy several of the k+1 slots
    and evict a distinct key that belongs in the global top-(k+1), making
    the retained set depend on how rows were batched (merge-order
    byte-identity violation; caught by review in round 3)."""
    n = h.shape[0]
    order = np.argsort(h, kind="stable")
    hs = h[order]
    starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
    counts = np.diff(np.append(starts, n))
    kept = [order[starts[counts == 1]]]
    for s, c in zip(starts[counts > 1], counts[counts > 1]):
        best: dict[bytes, tuple[float, bytes, int]] = {}
        for i in order[s:s + c]:
            i = int(i)
            cand = (float(w[i]), bytes(pay_at(i)), i)
            key = bytes(key_at(i))
            prev = best.get(key)
            if prev is None or cand[:2] > prev[:2]:
                best[key] = cand
        if best:
            kept.append(np.fromiter((v[2] for v in best.values()),
                                    dtype=np.int64, count=len(best)))
    return np.concatenate(kept)


class PrioritySample:
    """At most k+1 (key, weight[, payload]) items with the largest
    hash-derived priorities; the (k+1)-th is the threshold witness, the
    first k are the sample."""

    __slots__ = ("k", "seed", "keys", "weights", "payloads", "hashes",
                 "prios", "n_items", "_tw_units")

    def __init__(self, k: int = 256, seed: int = 1337) -> None:
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = int(k)
        self.seed = int(seed)
        self.keys: list[bytes] = []
        self.payloads: list[bytes] = []
        self.weights = np.empty(0, dtype=np.float64)
        self.hashes = np.empty(0, dtype=np.uint64)
        self.prios = np.empty(0, dtype=np.float64)
        self.n_items = 0
        self._tw_units = 0   # exact Σw in 2^-1074 units (see _weights_units)

    @property
    def total_weight(self) -> float:
        """Exact Σ of all folded weights, correctly rounded to a double
        (tracked as an exact integer internally so merges in any order
        serialize byte-identically)."""
        if not self._tw_units:
            return 0.0
        from fractions import Fraction
        return float(Fraction(self._tw_units, 1 << _TW_SHIFT))

    # -- updates ------------------------------------------------------------

    def update_pairs(self, keys, weights, payloads=None) -> None:
        """Fold a batch of (key, weight[, payload]) items. ``keys`` and
        ``payloads`` are sequences of str/bytes; ``weights`` positive."""
        kb = [k.encode("utf-8") if isinstance(k, str) else bytes(k)
              for k in keys]
        n = len(kb)
        if n == 0:
            return
        w = np.asarray(weights, dtype=np.float64)
        if w.shape[0] != n:
            raise ValueError("keys and weights length mismatch")
        if not np.all(w > 0) or not np.all(np.isfinite(w)):
            raise ValueError("priority sampling needs finite weights > 0")
        if payloads is None:
            pb = [b""] * n
        else:
            pb = [p.encode("utf-8") if isinstance(p, str) else bytes(p)
                  for p in payloads]
            if len(pb) != n:
                raise ValueError("keys and payloads length mismatch")
        lens = np.array([len(b) for b in kb], dtype=np.int64)
        flat = (np.frombuffer(b"".join(kb), dtype=np.uint8)
                if lens.sum() else np.empty(0, dtype=np.uint8))
        h = _polyhash_segments(flat, lens, self.seed)
        q = _priorities(h, w)
        self.n_items += n
        self._tw_units += _weights_units(w)
        # pre-trim the batch to its top-(k+1) DISTINCT keys before the
        # python-side candidate collapse: everything below the (k+1)-th
        # collapsed priority can never enter the global top-(k+1), and
        # duplicates are collapsed first so a repeated key cannot crowd
        # distinct keys out of the pre-trim window (see _dedup_keep)
        cap = self.k + 1
        if n > cap:
            keep = _dedup_keep(h, w, lambda i: kb[i], lambda i: pb[i])
            if keep.shape[0] > cap:
                sub = np.argpartition(q[keep], keep.shape[0] - cap)
                keep = keep[sub[keep.shape[0] - cap:]]
            kb = [kb[i] for i in keep]
            pb = [pb[i] for i in keep]
            w, h, q = w[keep], h[keep], q[keep]
        self._absorb(kb, w, pb, h, q)

    def update_flat(self, flat: np.ndarray, lens: np.ndarray,
                    weights: np.ndarray, pay_flat: np.ndarray | None = None,
                    pay_lens: np.ndarray | None = None) -> None:
        """Zero-copy batch path: keys (and optional payloads) arrive as a
        concatenated uint8 buffer + per-item lengths, exactly the layout of
        an Arrow string column's (data, offsets-diff) buffers."""
        n = lens.shape[0]
        if n == 0:
            return
        w = np.asarray(weights, dtype=np.float64)
        if not np.all(w > 0) or not np.all(np.isfinite(w)):
            raise ValueError("priority sampling needs finite weights > 0")
        h = _polyhash_segments(np.asarray(flat, dtype=np.uint8),
                               lens, self.seed)
        q = _priorities(h, w)
        self.n_items += n
        self._tw_units += _weights_units(w)
        ends = np.cumsum(lens)
        starts = ends - lens
        kbuf = np.asarray(flat, dtype=np.uint8).tobytes()
        if pay_flat is not None:
            pends = np.cumsum(pay_lens)
            pstarts = pends - pay_lens
            pbuf = np.asarray(pay_flat, dtype=np.uint8).tobytes()
            pay_at = lambda i: pbuf[pstarts[i]:pends[i]]  # noqa: E731
        else:
            pbuf = None
            pay_at = lambda i: b""  # noqa: E731
        cap = self.k + 1
        keep = np.arange(n)
        if n > cap:
            # collapse duplicate keys before trimming — see _dedup_keep
            keep = _dedup_keep(h, w, lambda i: kbuf[starts[i]:ends[i]],
                               pay_at)
            if keep.shape[0] > cap:
                sub = np.argpartition(q[keep], keep.shape[0] - cap)
                keep = keep[sub[keep.shape[0] - cap:]]
        kb = [kbuf[starts[i]:ends[i]] for i in keep]
        pb = [pay_at(i) for i in keep] if pbuf is not None else \
            [b""] * len(keep)
        self._absorb(kb, w[keep], pb, h[keep], q[keep])

    def _absorb(self, kb, w, pb, h, q) -> None:
        """Collapse candidates with the retained set and keep the global
        top-(k+1). Operates on <= 2(k+1) items — the only non-vectorized
        region, bounded by k, never by batch size."""
        items: dict[bytes, tuple[float, bytes, int, float]] = {}
        for i, key in enumerate(self.keys):
            items[key] = (self.prios[i], self.payloads[i],
                          int(self.hashes[i]), float(self.weights[i]))
        for i, key in enumerate(kb):
            cand = (float(q[i]), bytes(pb[i]), int(h[i]), float(w[i]))
            prev = items.get(key)
            # max-weight (== max-priority, same u) collapse; payload
            # tie-break keeps the collapse order-free
            if prev is None or cand[:2] > prev[:2]:
                items[key] = cand
        order = sorted(items.items(),
                       key=lambda kv: (-kv[1][0], kv[1][2], kv[0]))
        order = order[:self.k + 1]
        self.keys = [k for k, _ in order]
        self.prios = np.array([v[0] for _, v in order], dtype=np.float64)
        self.payloads = [v[1] for _, v in order]
        self.hashes = np.array([v[2] for _, v in order], dtype=np.uint64)
        self.weights = np.array([v[3] for _, v in order], dtype=np.float64)

    # -- estimates ----------------------------------------------------------

    @property
    def threshold(self) -> float | None:
        """tau = (k+1)-th largest priority, or None in exact mode (fewer
        than k+1 items ever seen: every item is retained, estimates are
        exact sums)."""
        if len(self.keys) <= self.k:
            return None
        return float(self.prios[self.k])

    def sample(self) -> list[tuple[str, float, float]]:
        """The k sampled items as (key, weight, adjusted_weight) where
        adjusted_weight = max(weight, tau) is the unbiased per-item
        estimator of its own weight's contribution to any subset sum."""
        tau = self.threshold
        top = min(len(self.keys), self.k)
        adj = (self.weights[:top] if tau is None
               else np.maximum(self.weights[:top], tau))
        return [(self.keys[i].decode("utf-8"), float(self.weights[i]),
                 float(adj[i])) for i in range(top)]

    def estimate_total(self) -> float:
        """Unbiased estimate of the total weight (exact total_weight is
        also tracked; the gap between them is the sampling noise)."""
        tau = self.threshold
        top = min(len(self.keys), self.k)
        if tau is None:
            return float(self.weights[:top].sum())
        return float(np.maximum(self.weights[:top], tau).sum())

    def estimate_subset(self, pred) -> float:
        """Unbiased subset-sum estimate over an ARBITRARY key predicate
        (Duffield-Lund-Thorup's core property: E[Σ_{i in S, sampled}
        max(w_i, tau)] = Σ_{i in S} w_i for any fixed S). ``pred`` takes
        the decoded key string; only the k sampled items are evaluated,
        so the cost is O(k) regardless of how many items ever streamed.
        Exact when the sample never overflowed (tau is None)."""
        tau = self.threshold
        top = min(len(self.keys), self.k)
        adj = (self.weights[:top] if tau is None
               else np.maximum(self.weights[:top], tau))
        return float(sum(float(adj[i]) for i in range(top)
                         if pred(self.keys[i].decode("utf-8"))))

    def estimate_group_sums(self) -> dict[str, float]:
        """Subset-sum estimates grouped by payload — e.g. total n_tok per
        source from the sample alone."""
        tau = self.threshold
        top = min(len(self.keys), self.k)
        adj = (self.weights[:top] if tau is None
               else np.maximum(self.weights[:top], tau))
        out: dict[str, float] = {}
        for i in range(top):
            g = self.payloads[i].decode("utf-8")
            out[g] = out.get(g, 0.0) + float(adj[i])
        return out

    # -- merge --------------------------------------------------------------

    def _check(self, other: "PrioritySample") -> None:
        if not isinstance(other, PrioritySample):
            raise ValueError(
                f"cannot combine PrioritySample with {type(other).__name__}")
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("PrioritySample configs differ")

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        """Union of candidate sets, re-trimmed to the top-(k+1): the global
        top-(k+1) is contained in the union of per-part top-(k+1)s, so any
        merge order yields the identical retained set."""
        self._check(other)
        self._absorb(other.keys, other.weights, other.payloads,
                     other.hashes, other.prios)
        self.n_items += other.n_items
        self._tw_units += other._tw_units
        return self

    # -- misc ---------------------------------------------------------------

    def clear(self) -> None:
        self.keys = []
        self.payloads = []
        self.weights = np.empty(0, dtype=np.float64)
        self.hashes = np.empty(0, dtype=np.uint64)
        self.prios = np.empty(0, dtype=np.float64)
        self.n_items = 0
        self._tw_units = 0

    def nbytes(self) -> int:
        return (sum(len(k) for k in self.keys)
                + sum(len(p) for p in self.payloads)
                + self.weights.nbytes + self.hashes.nbytes)

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        n = len(self.keys)
        tw = self._tw_units.to_bytes(
            max(1, (self._tw_units.bit_length() + 7) // 8), "little")
        head = struct.pack("<4sHHqqqiq", _MAGIC, _VERSION, 0, self.k,
                           self.seed, self.n_items, len(tw), n)
        klens = np.array([len(b) for b in self.keys], dtype=np.int32)
        plens = np.array([len(b) for b in self.payloads], dtype=np.int32)
        return b"".join([
            head, tw,
            self.weights.astype(np.float64).tobytes(),
            klens.tobytes(), plens.tobytes(),
            b"".join(self.keys), b"".join(self.payloads),
        ])

    @staticmethod
    def from_bytes(buf: bytes) -> "PrioritySample":
        hs = struct.calcsize("<4sHHqqqiq")
        if len(buf) < hs:
            raise ValueError("truncated PrioritySample header")
        magic, ver, _pad, k, seed, n_items, tw_len, n = struct.unpack(
            "<4sHHqqqiq", buf[:hs])
        if magic == _MAGIC and ver == 1:
            # v1 blobs (header dq, float total-weight) may persist in
            # older stores; give an actionable message, not "bad blob".
            raise ValueError(
                "unsupported PrioritySample serialization version 1 "
                "(re-publish the sketch with the current library)")
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad PrioritySample serialization")
        if not 0 <= tw_len <= len(buf) - hs:
            raise ValueError("corrupt PrioritySample total-weight length")
        ps = PrioritySample(k=k, seed=seed)
        off = hs
        tw_units = int.from_bytes(buf[off:off + tw_len], "little")
        off += tw_len
        w = np.frombuffer(buf, dtype=np.float64, count=n, offset=off).copy()
        off += 8 * n
        klens = np.frombuffer(buf, dtype=np.int32, count=n, offset=off)
        off += 4 * n
        plens = np.frombuffer(buf, dtype=np.int32, count=n, offset=off)
        off += 4 * n
        keys, payloads = [], []
        for ln in klens:
            keys.append(bytes(buf[off:off + ln]))
            off += int(ln)
        for ln in plens:
            payloads.append(bytes(buf[off:off + ln]))
            off += int(ln)
        if off != len(buf):
            raise ValueError("truncated PrioritySample blob")
        lens = klens.astype(np.int64)
        flat = (np.frombuffer(b"".join(keys), dtype=np.uint8)
                if lens.sum() else np.empty(0, dtype=np.uint8))
        h = _polyhash_segments(flat, lens, seed)  # derived, not stored
        ps.keys = keys
        ps.payloads = payloads
        ps.weights = w
        ps.hashes = h
        ps.prios = _priorities(h, w)
        ps.n_items = n_items
        ps._tw_units = tw_units
        return ps
