"""Dyadic Count-Min: range counts, prefix ranks, and value quantiles over
the token-id domain from one mergeable structure.

The reference's Count-Min (cm.h:482-496) answers point frequencies only.
The classic dyadic extension (Cormode-Muthukrishnan 2005, section 4.2)
sketches the stream at every dyadic granularity — level l counts the
prefix ``token >> l`` — so any range [a, b] decomposes into at most
2*levels canonical dyadic intervals, each answered by ONE point query at
its level, and prefix ranks give quantiles by descending the implicit
dyadic tree.

Layout: levels where the shifted domain still exceeds the sketch width
use a full Count-Min (error <= eps * N per query, one-sided); coarser
levels fit an EXACT dense int64 array smaller than the sketch would be
(zero error, and cheaper than hashing — a CM at width >= domain is both
bigger and still collides). Only the sketched levels contribute error,
so the range bound is ``(#sketched interval queries) * eps * N`` and
every estimate is >= the true count (inherited one-sidedness).

Mergeable-aggregator contract (library-wide skeleton, spark_build.py
build_aggregator): merge is per-level elementwise/CM merge — associative,
commutative, byte-identical in any partition order (tested). A single
pass over a token batch collapses duplicates once (sort) and then folds
counts level-by-level with add.reduceat — O(distinct) per level, no
re-hash of the raw stream.
"""

from __future__ import annotations

import struct

import numpy as np

from .countmin import CMConfig, CountMinSketch, _unique_counts
from .hashing import seed_schedule

_MAGIC = b"DYA1"
_VERSION = 1


class DyadicCM:
    """Dyadic Count-Min over keys in ``[0, 2**universe_bits)``."""

    __slots__ = ("universe_bits", "eps", "delta", "seed", "levels",
                 "n_items", "total_count", "_exact_cut")

    def __init__(self, universe_bits: int = 31, eps: float = 1e-4,
                 delta: float = 0.05, seed: int = 1337,
                 levels: list | None = None, n_items: int = 0,
                 total_count: int = 0) -> None:
        if not 1 <= universe_bits <= 62:
            raise ValueError("universe_bits must be in [1, 62]")
        self.universe_bits = universe_bits
        self.eps = eps
        self.delta = delta
        self.seed = seed
        self.n_items = n_items
        self.total_count = total_count
        base = CMConfig(eps=eps, delta=delta, seed=seed)
        # coarser than this, an exact array is smaller than one sketch ROW
        self._exact_cut = base.width
        if levels is not None:
            self.levels = levels
            return
        lseeds = seed_schedule(seed, universe_bits)
        self.levels = []
        for l in range(universe_bits):
            domain = 1 << (universe_bits - l)
            if domain <= self._exact_cut:
                self.levels.append(np.zeros(domain, dtype=np.int64))
            else:
                self.levels.append(CountMinSketch(
                    CMConfig(eps=eps, delta=delta, seed=int(lseeds[l]))))

    def _is_exact(self, l: int) -> bool:
        return isinstance(self.levels[l], np.ndarray)

    @property
    def n_sketched_levels(self) -> int:
        return sum(0 if self._is_exact(l) else 1
                   for l in range(self.universe_bits))

    # -- updates -------------------------------------------------------------

    def update_batch(self, keys, counts=None) -> None:
        arr = np.asarray(keys)
        n = arr.shape[0]
        if n == 0:
            return
        if arr.dtype.kind not in "iu":
            raise ValueError("keys must be integers")
        amin, amax = int(arr.min()), int(arr.max())
        if amin < 0 or amax >> self.universe_bits:
            raise ValueError(
                f"keys [{amin}, {amax}] outside [0, 2^{self.universe_bits})")
        # counts-length validation must also precede any mutation (see
        # CountSketch.update_batch): no partial state on a raised error
        if counts is not None and np.asarray(counts).shape[0] != n:
            raise ValueError("counts length must match keys length")
        self.n_items += n
        if counts is None:
            # collapse on the NATIVE dtype (int32 sorts 2x faster and the
            # workspace is half the size), then widen only the uniques —
            # also takes ownership: _unique_counts returns views into a
            # reused buffer and the ladder below outlives the next call
            u0, c0 = _unique_counts(arr)
            u = u0.astype(np.int64)
            c = c0.astype(np.int64)
            self.total_count += n
        else:
            c = np.asarray(counts, dtype=np.int64)
            order = np.argsort(arr, kind="stable")
            u0 = arr.astype(np.int64, copy=False)[order]
            c0 = c[order]
            starts = np.flatnonzero(np.r_[True, u0[1:] != u0[:-1]])
            u = u0[starts]
            c = np.add.reduceat(c0, starts)
            self.total_count += int(c.sum())
        # fold level-by-level: (u, c) stays sorted under >> 1; adjacent
        # equal prefixes collapse with one reduceat — O(distinct)/level
        for l in range(self.universe_bits):
            lvl = self.levels[l]
            if isinstance(lvl, np.ndarray):
                # u is duplicate-free at every level (unique'd at level 0,
                # reduceat-collapsed below), so plain fancy indexing is
                # correct and several times faster than np.add.at
                lvl[u] += c
            else:
                lvl.update_batch(u, counts=c, preaggregate=False)
                # the level sees duplicate-collapsed keys, so its raw
                # n_items would depend on the partitioning; pin it to the
                # absorbed mass (partition-additive) for byte-identity
                lvl.n_items = lvl.total_count
            if l + 1 < self.universe_bits:
                u2 = u >> 1
                starts = np.flatnonzero(np.r_[True, u2[1:] != u2[:-1]])
                u = u2[starts]
                c = np.add.reduceat(c, starts)

    def update_unique(self, uniq, counts) -> None:
        """Duplicate-collapsed update: ``uniq`` MUST be duplicate-free,
        ``counts`` its multiplicities. Byte-identical to ``update_batch``
        of the expanded multiset: the counts path folds the same (u, c)
        histogram; n_items is re-pinned to occurrences (the counts path
        credits one item per KEY, the raw path one per occurrence)."""
        uniq = np.asarray(uniq)
        if uniq.shape[0] == 0:
            return
        c = np.asarray(counts, dtype=np.int64)
        before = self.n_items
        self.update_batch(uniq, counts=c)
        self.n_items = before + int(c.sum())

    # -- point queries at a level -------------------------------------------

    def _level_query(self, l: int, prefix: int) -> tuple[int, bool]:
        """(count upper-estimate of prefix p at level l, was_exact)."""
        if l == self.universe_bits:
            # the root: the whole-domain range [0, 2^ub) decomposes to the
            # single node at level ub, whose count is exact by definition
            return self.total_count, True
        lvl = self.levels[l]
        if isinstance(lvl, np.ndarray):
            return int(lvl[prefix]), True
        return int(lvl.point_query(prefix)), False

    # -- ranges --------------------------------------------------------------

    def _decompose(self, lo: int, hi: int):
        """Canonical dyadic cover of the inclusive range [lo, hi]:
        yields (level, prefix); at most 2 per level."""
        l = 0
        while lo <= hi:
            if lo & 1:
                yield l, lo
                lo += 1
            if not (hi & 1):
                yield l, hi
                if hi == 0:
                    break
                hi -= 1
            lo >>= 1
            hi >>= 1
            l += 1

    def range_count(self, lo: int, hi: int) -> int:
        """Estimated count of keys in the inclusive range [lo, hi].
        One-sided: always >= the true count; over by at most
        ``range_bound(lo, hi)`` w.p. >= 1 - (#sketched queries) * delta."""
        est, _ = self.range_count_with_bound(lo, hi)
        return est

    def range_count_with_bound(self, lo: int, hi: int) -> tuple[int, float]:
        if not 0 <= lo <= hi < (1 << self.universe_bits):
            raise ValueError("range outside the universe")
        est = 0
        n_sketched = 0
        for l, p in self._decompose(lo, hi):
            v, exact = self._level_query(l, p)
            est += v
            n_sketched += 0 if exact else 1
        return est, n_sketched * self.eps * self.total_count

    def prefix_rank(self, x: int) -> int:
        """Estimated #keys <= x (the rank of x)."""
        return self.range_count(0, x)

    # -- quantiles -----------------------------------------------------------

    def quantile(self, q: float) -> int:
        """Approximate q-quantile of the key distribution: descends the
        dyadic tree picking left/right by the child's (over-)estimated
        mass. Rank error <= n_sketched_levels * eps * N w.h.p."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        target = q * self.total_count
        prefix = 0
        for l in range(self.universe_bits - 1, -1, -1):
            left = prefix << 1
            c_left, _ = self._level_query(l, left)
            if target <= c_left:
                prefix = left
            else:
                target -= c_left
                prefix = left + 1
        return prefix

    def rank_error_bound(self) -> float:
        """Worst-case one-sided rank error of prefix_rank/quantile."""
        return self.n_sketched_levels * self.eps * self.total_count

    # -- merge ---------------------------------------------------------------

    def _check(self, other: "DyadicCM") -> None:
        if not isinstance(other, DyadicCM):
            raise ValueError(
                f"cannot combine DyadicCM with {type(other).__name__}")
        if (self.universe_bits, self.eps, self.delta, self.seed) != (
                other.universe_bits, other.eps, other.delta, other.seed):
            raise ValueError("DyadicCM configs differ")

    def merge(self, other: "DyadicCM") -> "DyadicCM":
        self._check(other)
        for l in range(self.universe_bits):
            if self._is_exact(l):
                self.levels[l] += other.levels[l]
            else:
                self.levels[l].merge(other.levels[l])
        self.n_items += other.n_items
        self.total_count += other.total_count
        return self

    # -- misc ----------------------------------------------------------------

    def clear(self) -> None:
        for l in range(self.universe_bits):
            if self._is_exact(l):
                self.levels[l].fill(0)
            else:
                self.levels[l].clear()
        self.n_items = 0
        self.total_count = 0

    def nbytes(self) -> int:
        return sum(lvl.nbytes if isinstance(lvl, np.ndarray)
                   else lvl.nbytes() for lvl in self.levels)

    # -- serialization (magic-dispatched via sketchlib.serde) ----------------

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<4sHHqddqqq", _MAGIC, _VERSION, 0,
                             self.universe_bits, self.eps, self.delta,
                             self.seed, self.n_items, self.total_count)]
        for l in range(self.universe_bits):
            if self._is_exact(l):
                body = np.ascontiguousarray(self.levels[l],
                                            dtype="<i8").tobytes()
                parts.append(struct.pack("<BQ", 0, len(body)))
            else:
                body = self.levels[l].to_bytes()
                parts.append(struct.pack("<BQ", 1, len(body)))
            parts.append(body)
        return b"".join(parts)

    def to_bytes_auto(self) -> bytes:
        """PARTIAL blob encoding (shuffle-bound; see serde.dumps_partial):
        each sketched level uses the CM size-adaptive encoding, so a
        partition slice that touches few counters at a coarse level ships
        sparse triples instead of the dense table. Final results must use
        to_bytes() — the dense byte-identity contract."""
        parts = [struct.pack("<4sHHqddqqq", _MAGIC, _VERSION, 0,
                             self.universe_bits, self.eps, self.delta,
                             self.seed, self.n_items, self.total_count)]
        for l in range(self.universe_bits):
            if self._is_exact(l):
                body = np.ascontiguousarray(self.levels[l],
                                            dtype="<i8").tobytes()
                parts.append(struct.pack("<BQ", 0, len(body)))
            else:
                body = self.levels[l].to_bytes_auto()
                parts.append(struct.pack("<BQ", 1, len(body)))
            parts.append(body)
        return b"".join(parts)

    @staticmethod
    def from_bytes(buf: bytes) -> "DyadicCM":
        hs = struct.calcsize("<4sHHqddqqq")
        magic, ver, _pad, ub, eps, delta, seed, n_items, total = (
            struct.unpack("<4sHHqddqqq", buf[:hs]))
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad DyadicCM serialization")
        off = hs
        levels = []
        ts = struct.calcsize("<BQ")
        for l in range(ub):
            kind, blen = struct.unpack("<BQ", buf[off:off + ts])
            off += ts
            body = buf[off:off + blen]
            if len(body) != blen:
                raise ValueError("truncated DyadicCM blob")
            off += blen
            if kind == 0:
                levels.append(np.frombuffer(body, dtype="<i8").copy())
            else:
                levels.append(CountMinSketch.from_bytes(body))
        return DyadicCM(universe_bits=ub, eps=eps, delta=delta, seed=seed,
                        levels=levels, n_items=n_items, total_count=total)
