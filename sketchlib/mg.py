"""Misra-Gries frequent-items summary (Misra & Gries 1982; mergeable form
per Agarwal et al., "Mergeable Summaries", PODS 2012).

North-rule companion sketch: the DETERMINISTIC counterpart of the
reference's Count-Min top-k use (cm.h:260-266 gives probabilistic
overestimates; MG gives certain underestimates). With k counters over a
stream of n items:

  f(x) - n/(k+1)  <=  est(x)  <=  f(x)        (est(x)=0 if x absent)

and every key with f(x) > n/(k+1) is GUARANTEED present — no failure
probability, no hash functions. ``n_items - total_count`` (items seen
minus surviving mass) bounds the total decrement, giving the tighter
per-query bound ``f(x) - est(x) <= (n_items - total_count)/(k+1)``.

Merge semantics (Agarwal et al. §3.1): sum counters pointwise, then
subtract the (k+1)-th largest value and drop non-positive counters. The
ERROR BOUND is preserved under ANY merge tree; the surviving counter
VALUES, however, depend on the merge order — unlike CM/HLL, MG merges are
not byte-identical across partitionings (intrinsic to counter-based
summaries; documented, and the distributed build's fixed slice->tree
order keeps results reproducible run-to-run on the same layout).

Batch update = merge with the batch's exact histogram (an MG summary with
zero error), so updates are one np.unique + one dict merge per batch —
no per-item Python.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MGK1"
_VERSION = 1


class MisraGries:
    """k-counter frequent-items summary over int64 keys."""

    __slots__ = ("k", "counters", "n_items")

    def __init__(self, k: int = 64,
                 counters: dict[int, int] | None = None,
                 n_items: int = 0) -> None:
        if not 1 <= k <= 65535:
            raise ValueError("k must be in [1, 65535] (uint16 in serde)")
        self.k = k
        self.counters = {} if counters is None else counters
        self.n_items = n_items

    # -- core -----------------------------------------------------------

    def _shrink(self) -> None:
        """Restore |counters| <= k: subtract the (k+1)-th largest count
        from every counter, drop non-positive (one batch decrement —
        equivalent to (|counters|-k) classic MG decrement rounds)."""
        if len(self.counters) <= self.k:
            return
        vals = np.fromiter(self.counters.values(), dtype=np.int64,
                           count=len(self.counters))
        # (k+1)-th largest = pivot; np.partition is O(n)
        pivot = int(np.partition(vals, len(vals) - (self.k + 1))
                    [len(vals) - (self.k + 1)])
        self.counters = {key: c - pivot for key, c in self.counters.items()
                        if c > pivot}

    def update_batch(self, keys) -> None:
        """Merge the batch's exact histogram, then one shrink — fully
        vectorized (sort + add.reduceat for the counter merge, np.partition
        for the pivot): per-batch cost is O(u log u) numpy on u uniques,
        with no per-unique Python loop, so MG rides the same hot build
        paths as CM/HLL (e.g. the one-scan corpus profile)."""
        arr = np.asarray(keys, dtype=np.int64)
        if arr.size == 0:
            return
        self.n_items += int(arr.size)
        uniq, cnt = np.unique(arr, return_counts=True)
        self._merge_hist(uniq, cnt)

    def update_unique(self, uniq, counts) -> None:
        """Duplicate-collapsed update: ``uniq`` MUST be duplicate-free,
        ``counts`` its multiplicities. Identical state to ``update_batch``
        of the expanded multiset — callers that already hold one shared
        unique pass (MultiSketch) skip this sketch's internal dedup."""
        uniq = np.asarray(uniq, dtype=np.int64)
        cnt = np.asarray(counts, dtype=np.int64)
        if uniq.size == 0:
            return
        self.n_items += int(cnt.sum())
        self._merge_hist(uniq, cnt)

    def _merge_hist(self, uniq: np.ndarray, cnt: np.ndarray) -> None:
        if self.counters:
            ck = np.fromiter(self.counters.keys(), dtype=np.int64,
                             count=len(self.counters))
            cv = np.fromiter(self.counters.values(), dtype=np.int64,
                             count=len(self.counters))
            allk = np.concatenate([ck, uniq])
            allv = np.concatenate([cv, cnt])
            order = np.argsort(allk, kind="stable")
            sk, sv = allk[order], allv[order]
            starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            uniq = sk[starts]
            cnt = np.add.reduceat(sv, starts)
        if uniq.shape[0] > self.k:
            # (k+1)-th largest = pivot; subtract, drop non-positive —
            # identical to _shrink on the merged histogram
            pivot = int(np.partition(cnt, uniq.shape[0] - (self.k + 1))
                        [uniq.shape[0] - (self.k + 1)])
            keep = cnt > pivot
            uniq, cnt = uniq[keep], cnt[keep] - pivot
        self.counters = dict(zip(uniq.tolist(), cnt.tolist()))

    def merge(self, other: "MisraGries") -> "MisraGries":
        if not isinstance(other, MisraGries):
            raise ValueError(
                f"cannot merge MisraGries with {type(other).__name__}")
        if self.k != other.k:
            raise ValueError("MisraGries configs differ (k)")
        cs = self.counters
        for key, c in other.counters.items():
            cs[key] = cs.get(key, 0) + c
        self.n_items += other.n_items
        self._shrink()
        return self

    # -- queries --------------------------------------------------------

    def point_query(self, key: int) -> int:
        """Underestimate: f(key) - n/(k+1) <= result <= f(key)."""
        return self.counters.get(int(key), 0)

    @property
    def total_count(self) -> int:
        """Surviving counter mass; n_items - total_count = total decrement
        x (k+1), so per-key error <= (n_items - total_count)/(k+1)."""
        return int(sum(self.counters.values()))

    def error_bound(self) -> int:
        """Certain per-key bound: f(x) - point_query(x) <= this."""
        return (self.n_items - self.total_count) // (self.k + 1)

    def top_items(self, limit: int | None = None) -> list[tuple[int, int]]:
        """(key, lower-bound count) sorted by count desc, key asc."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return items if limit is None else items[:limit]

    def clear(self) -> None:
        self.counters = {}
        self.n_items = 0

    def nbytes(self) -> int:
        # method (not property) — the MultiSketch/getMem contract calls
        # nbytes() uniformly across every sketch type
        return len(self.to_bytes())

    # -- serde ----------------------------------------------------------

    def to_bytes(self) -> bytes:
        keys = sorted(self.counters)
        head = struct.pack("<4sHHqq", _MAGIC, _VERSION, self.k,
                           self.n_items, len(keys))
        ka = np.array(keys, dtype=np.int64)
        va = np.array([self.counters[key] for key in keys], dtype=np.int64)
        return head + ka.tobytes() + va.tobytes()

    @staticmethod
    def from_bytes(buf: bytes) -> "MisraGries":
        hs = struct.calcsize("<4sHHqq")
        magic, ver, k, n_items, m = struct.unpack("<4sHHqq", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad MisraGries serialization")
        need = hs + 16 * m
        if len(buf) < need:
            raise ValueError(f"truncated MisraGries blob: {len(buf)} bytes, "
                             f"need {need}")
        ka = np.frombuffer(buf[hs:hs + 8 * m], dtype=np.int64)
        va = np.frombuffer(buf[hs + 8 * m:need], dtype=np.int64)
        return MisraGries(k=k, n_items=n_items,
                          counters=dict(zip(ka.tolist(), va.tolist())))
