"""Theta (KMV, k-minimum-values) distinct sketch with set operations.

North-rule companion sketch: HLL (hll.py) answers |A|, and union via
register-max, but intersections only through inclusion-exclusion — whose
error is scaled by |A ∪ B|, useless for small overlaps. The theta sketch
keeps the k smallest distinct 64-bit hash values; the sample is a uniform
subset of the key universe below the threshold theta = k-th smallest
hash / 2^64, so ANY set expression (union, intersection, difference) is
estimated by evaluating it on the samples below the common theta and
dividing by theta (Dasu et al. 2002; Beyer et al. 2007 KMV estimator).

Mergeable aggregator contract (same skeleton as sketchlib.hll): merge is
the union of hash sets truncated back to k — associative, commutative,
idempotent, so distributed merges are byte-identical in any partition
order (tested). update/merge are pure NumPy set ops on sorted uint64
arrays; no per-item Python. Relative standard error of the distinct
estimate is ~1/sqrt(k-2).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import murmur_h2_into

_MAGIC = b"THT1"
_VERSION = 1
_FULL = float(1 << 64)


class ThetaSketch:
    """KMV bottom-k sketch over 64-bit murmur hashes.

    ``values`` is a sorted, deduplicated uint64 array of the at-most-k
    smallest hash values seen. When fewer than k distinct hashes exist the
    sketch is in "exact mode" (theta == 1.0) and estimates are exact.
    """

    __slots__ = ("k", "seed", "values", "n_items")

    def __init__(self, k: int = 4096, seed: int = 1337,
                 values: np.ndarray | None = None, n_items: int = 0) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.seed = seed
        self.values = (np.empty(0, dtype=np.uint64)
                       if values is None else values)
        self.n_items = n_items

    # -- updates ------------------------------------------------------------

    def update_batch(self, keys) -> None:
        arr = np.asarray(keys)
        n = arr.shape[0]
        if n == 0:
            return
        self.n_items += n
        h = np.empty(n, dtype=np.uint64)
        murmur_h2_into(arr, self.seed, h)
        self._absorb(h)

    def _absorb(self, hashes: np.ndarray) -> None:
        merged = np.union1d(self.values, hashes)  # sorted + deduped
        if merged.shape[0] > self.k:
            merged = merged[:self.k]
        self.values = merged

    # -- estimates ----------------------------------------------------------

    def _theta_u64(self) -> np.uint64 | None:
        """Exact u64 sampling boundary (the k-th smallest hash), or None
        while the sketch is exact. Kept in u64 — a float64 round-trip can
        shift the cut past neighbouring hash values."""
        if self.values.shape[0] < self.k:
            return None
        return self.values[self.k - 1]

    @property
    def theta(self) -> float:
        """Sampling threshold as a fraction: every distinct key whose hash
        < theta * 2^64 is in the sample. 1.0 while the sketch is exact."""
        t = self._theta_u64()
        return 1.0 if t is None else float(t) / _FULL

    def estimate(self) -> float:
        nv = self.values.shape[0]
        if nv < self.k:
            return float(nv)             # exact mode
        # (k-1)/theta: the k-th value itself is the threshold, not a sample
        return (self.k - 1) / self.theta

    def rse(self) -> float:
        """Relative standard error of estimate() in sampling mode."""
        return 1.0 / np.sqrt(max(1, self.k - 2))

    # -- merges & set operations -------------------------------------------

    def _check(self, other: "ThetaSketch") -> None:
        if not isinstance(other, ThetaSketch):
            raise ValueError(
                f"cannot combine ThetaSketch with {type(other).__name__}")
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("ThetaSketch configs differ")

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """Union-merge in place (the aggregator contract)."""
        self._check(other)
        self._absorb(other.values)
        self.n_items += other.n_items
        return self

    def _common_cut(self, other: "ThetaSketch") -> np.uint64 | None:
        """Smaller of the two u64 boundaries; None when both are exact."""
        ta, tb = self._theta_u64(), other._theta_u64()
        if ta is None:
            return tb
        if tb is None:
            return ta
        return min(ta, tb)

    @staticmethod
    def _scaled_count(sample: np.ndarray, cut: np.uint64 | None) -> float:
        """|sample below cut| / theta — the KMV estimator for whatever set
        expression produced ``sample``. Exact when cut is None (both
        sketches still hold every hash they ever saw)."""
        if cut is None:
            return float(sample.shape[0])
        return sample[sample < cut].shape[0] / (float(cut) / _FULL)

    def estimate_union(self, other: "ThetaSketch") -> float:
        self._check(other)
        return self._scaled_count(np.union1d(self.values, other.values),
                                  self._common_cut(other))

    def estimate_intersection(self, other: "ThetaSketch") -> float:
        self._check(other)
        return self._scaled_count(np.intersect1d(self.values, other.values),
                                  self._common_cut(other))

    def estimate_difference(self, other: "ThetaSketch") -> float:
        """Estimate |self \\ other|."""
        self._check(other)
        return self._scaled_count(np.setdiff1d(self.values, other.values),
                                  self._common_cut(other))

    # -- misc ---------------------------------------------------------------

    def clear(self) -> None:
        self.values = np.empty(0, dtype=np.uint64)
        self.n_items = 0

    def nbytes(self) -> int:
        return self.values.nbytes

    # -- serialization (magic-dispatched via sketchlib.serde) ---------------

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sHHqqq", _MAGIC, _VERSION, 0, self.k,
                           self.seed, self.n_items)
        return head + np.ascontiguousarray(self.values).tobytes()

    @staticmethod
    def from_bytes(buf: bytes) -> "ThetaSketch":
        hs = struct.calcsize("<4sHHqqq")
        magic, ver, _pad, k, seed, n_items = struct.unpack("<4sHHqqq",
                                                           buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad ThetaSketch serialization")
        body = buf[hs:]
        if len(body) % 8:
            raise ValueError("truncated ThetaSketch blob")
        vals = np.frombuffer(body, dtype=np.uint64).copy()
        if vals.shape[0] > k:
            raise ValueError("ThetaSketch blob holds more than k values")
        return ThetaSketch(k=k, seed=seed, values=vals, n_items=n_items)


def overlap_matrix(sketches: dict) -> list[tuple]:
    """Pairwise set-overlap estimates across named Theta sketches:
    [(a, b, est_union, est_intersection, est_jaccard)] for every a < b
    in sorted-name order. G per-group sketches from ONE grouped scan
    give all G(G-1)/2 overlaps as KB-scale driver ops — the
    cross-source vocabulary-overlap matrix that would otherwise take a
    self-join per pair (or one G^2 shuffle) over the raw corpus. Each
    estimate carries the usual KMV bound: error <= ~1/sqrt(k-2) of the
    UNION size (intersection/difference error scales with the union's
    sample, not their own)."""
    names = sorted(sketches)
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            u = sketches[a].estimate_union(sketches[b])
            x = sketches[a].estimate_intersection(sketches[b])
            out.append((a, b, u, x, (x / u if u > 0 else 0.0)))
    return out
