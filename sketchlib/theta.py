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

    def update_unique(self, uniq, counts) -> None:
        """Duplicate-collapsed update: ``uniq`` MUST be duplicate-free,
        ``counts`` its multiplicities. Byte-identical to ``update_batch``
        of the expanded multiset (the bottom-k hash sample only sees
        distinct values); n_items still counts occurrences."""
        uniq = np.asarray(uniq)
        n = uniq.shape[0]
        if n == 0:
            return
        self.n_items += int(np.asarray(counts, dtype=np.int64).sum())
        h = np.empty(n, dtype=np.uint64)
        murmur_h2_into(uniq, self.seed, h)
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


def overlap_matrix(sketches: dict, max_groups: int = 1024) -> list[tuple]:
    """Pairwise set-overlap estimates across named Theta sketches:
    [(a, b, est_union, est_intersection, est_jaccard)] for every a < b
    in sorted-name order. G per-group sketches from ONE grouped scan
    give all G(G-1)/2 overlaps as KB-scale driver ops — the
    cross-source vocabulary-overlap matrix that would otherwise take a
    self-join per pair (or one G^2 shuffle) over the raw corpus. Each
    estimate carries the usual KMV bound: error <= ~1/sqrt(k-2) of the
    UNION size (intersection/difference error scales with the union's
    sample, not their own).

    DRIVER-LOCAL and O(G^2) by design — right at G<=~10^3 group counts
    (sources, languages), the wrong shape at G=10^4+ where the pair
    space alone is 5*10^7 numpy set ops in driver Python. ``max_groups``
    guards that cliff; past it use ``overlap_matrix_df``, which keeps
    the pair space distributed."""
    if len(sketches) > max_groups:
        raise ValueError(
            f"overlap_matrix is driver-local O(G^2); G={len(sketches)} "
            f"exceeds max_groups={max_groups} — use "
            "sketchlib.theta.overlap_matrix_df for a distributed pair "
            "evaluation (or raise max_groups deliberately)")
    names = sorted(sketches)
    out = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            u = sketches[a].estimate_union(sketches[b])
            x = sketches[a].estimate_intersection(sketches[b])
            out.append((a, b, u, x, (x / u if u > 0 else 0.0)))
    return out


def overlap_matrix_df(gdf, key_col: str = "key", sketch_col: str = "sketch",
                      min_jaccard: float | None = None):
    """Distributed ``overlap_matrix`` over a (key, theta-sketch blob)
    DataFrame — the shape ``spark_build.build_grouped_aggregator``
    emits. Neither the G^2 pair space nor the G*k hash samples ever
    land on the driver, so G=10^4 groups (10^8 pairs) stay a Spark
    problem: the samples explode to (key, hash) rows via ONE
    mapInPandas pass, shared hashes pair up through a self equi-JOIN on
    the hash value (output size = the true number of sample
    collisions, not G^2*k), and the full pair matrix is a cross join
    of the G-row per-key count frame — G^2 rows of tiny ints,
    distributed.

    Estimator note: every sample is cut to the GLOBAL minimum theta
    (the standard common-theta KMV composition) rather than
    overlap_matrix's per-pair min(theta_a, theta_b). Identical results
    while no sketch is saturated (exact mode); once saturated the
    estimates stay unbiased KMV estimates with a somewhat wider
    variance (the effective sample per pair is k * theta*/theta_pair).
    Hash values travel as order-preserving signed int64 (u64 XOR 2^63)
    because Spark has no unsigned type.

    Returns a DataFrame (a, b, est_union, est_intersection,
    est_jaccard) for every key pair a < b, optionally filtered to
    est_jaccard >= min_jaccard (at large G the full matrix is rarely
    what downstream wants — the thresholded variant never materializes
    the zero-overlap pairs)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from . import serde

    gdf = gdf.select(F.col(key_col).alias("key"),
                     F.col(sketch_col).alias("sketch"))

    def meta_fn(pdfs):
        for pdf in pdfs:
            rows = []
            for key, blob in zip(pdf["key"], pdf["sketch"]):
                sk = serde.loads(bytes(blob))
                if not isinstance(sk, ThetaSketch):
                    raise TypeError(
                        f"overlap_matrix_df needs ThetaSketch blobs, got "
                        f"{type(sk).__name__}")
                t = sk._theta_u64()
                # u64 -> order-preserving i64: subtract 2^63 (same map as
                # the XOR+view on the numpy side)
                ts = None if t is None else int(t) - (1 << 63)
                rows.append((key, ts, sk.k, sk.seed))
            yield pd.DataFrame(rows, columns=["key", "theta_s", "k", "seed"])

    meta = (gdf.mapInPandas(meta_fn,
                            "key string, theta_s long, k int, seed long")
            .cache())
    cfgs = meta.select("k", "seed").distinct().collect()
    if len(cfgs) > 1:
        meta.unpersist()
        raise ValueError(f"ThetaSketch configs differ across groups: "
                         f"{[(r['k'], r['seed']) for r in cfgs]}")
    cut_row = meta.agg(F.min("theta_s").alias("c"),
                       F.count("theta_s").alias("n_sat")).collect()[0]
    # global cut theta*: None while EVERY sketch is exact (min over no
    # saturated sketches); matches ThetaSketch._common_cut semantics
    cut_s = int(cut_row["c"]) if cut_row["n_sat"] > 0 else None
    # undo the i64 shift for the scale; same float64 arithmetic as
    # _scaled_count (count / (theta_u64 / 2^64))
    scale = 1.0 if cut_s is None else float(cut_s + (1 << 63)) / _FULL

    def values_fn(pdfs):
        for pdf in pdfs:
            keys, vals = [], []
            for key, blob in zip(pdf["key"], pdf["sketch"]):
                sk = serde.loads(bytes(blob))
                v = (sk.values ^ np.uint64(1 << 63)).view(np.int64)
                if cut_s is not None:
                    v = v[v < cut_s]     # strictly below, as _scaled_count
                keys.extend([key] * v.shape[0])
                vals.append(v)
            yield pd.DataFrame({
                "key": pd.Series(keys, dtype=object),
                "v": np.concatenate(vals) if vals else
                     np.empty(0, dtype=np.int64)})

    # cached: the self-join reads it twice and the counts groupBy a
    # third time — uncached, each evaluation re-deserializes every blob
    # and re-explodes G*k rows. meta stays cached too (G tiny rows);
    # neither is unpersisted here because the returned plan is lazy —
    # both frames must survive until the caller's action (Spark evicts
    # LRU if memory is ever tight).
    values = gdf.mapInPandas(values_fn, "key string, v long").cache()
    counts = (meta.select("key")
              .join(values.groupBy("key").agg(F.count("*").alias("n")),
                    "key", "left")
              .select("key", F.coalesce("n", F.lit(0)).alias("n")))

    inter = (values.alias("x").join(values.alias("y"), "v")
             .filter(F.col("x.key") < F.col("y.key"))
             .groupBy(F.col("x.key").alias("a"), F.col("y.key").alias("b"))
             .agg(F.count("*").alias("ni")))

    ca = counts.select(F.col("key").alias("a"), F.col("n").alias("na"))
    cb = counts.select(F.col("key").alias("b"), F.col("n").alias("nb"))
    pairs = (ca.crossJoin(cb).filter(F.col("a") < F.col("b"))
             .join(inter, ["a", "b"], "left")
             .select("a", "b", "na", "nb",
                     F.coalesce("ni", F.lit(0)).alias("ni")))
    out = (pairs
           .select("a", "b",
                   ((F.col("na") + F.col("nb") - F.col("ni")) / F.lit(scale))
                   .alias("est_union"),
                   (F.col("ni") / F.lit(scale)).alias("est_intersection"))
           .withColumn("est_jaccard",
                       F.when(F.col("est_union") > 0,
                              F.col("est_intersection") / F.col("est_union"))
                       .otherwise(F.lit(0.0))))
    if min_jaccard is not None:
        out = out.filter(F.col("est_jaccard") >= min_jaccard)
    return out
