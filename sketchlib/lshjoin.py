"""Skew-hardened candidate generation for LSH bucket self-joins.

Every LSH dedup path (MinHash bands, SimHash blocks, hyperplane tables)
ends in the same shape: explode ids into (bucket..., id) rows, self-join
on the bucket key, verify candidates exactly. That self-join is quadratic
in bucket size — an adversarial corpus of N near-identical documents puts
N ids into ONE bucket and the join emits O(N^2) candidate rows before any
verification can prune them.

``bucket_candidate_pairs`` bounds this with a per-bucket cap:

- buckets with <= cap members emit all C(n, 2) pairs — exact LSH
  semantics, byte-identical to the uncapped join;
- larger buckets emit STAR pairs (bucket-min id, member) — linear in
  bucket size, so per-bucket candidates are bounded by max(cap^2, n).

Documented recall effect of the cap: inside an over-cap bucket, a pair
not involving the bucket minimum is surfaced only if it also co-occurs in
another (under-cap) bucket. Connectivity is preserved — every member of
an over-cap bucket still links to its hub — so duplicate-CLUSTER
resolution (pipeline.connected_components) recovers the same clusters;
only the raw pair list thins. Buckets that big are, by construction,
near-identical content where star-linking is the right answer anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bucket_candidate_pairs(buckets: DataFrame, bucket_cols: list[str],
                           id_col: str, *, cap: int = 256) -> DataFrame:
    """DISTINCT (id_a, id_b) candidate pairs (id_a < id_b) from LSH bucket
    rows, with the per-bucket skew cap described in the module docstring.

    The window aggregates (count/min per bucket) shuffle on the same key
    as the join itself, so no extra exchange shape is introduced; a hot
    bucket lands in one task but does only linear work there.
    """
    if cap < 2:
        raise ValueError("cap must be >= 2")
    w = Window.partitionBy(*bucket_cols)
    sized = (buckets.select(id_col, *bucket_cols)
             .withColumn("_bsz", F.count(F.lit(1)).over(w))
             .withColumn("_bmin", F.min(id_col).over(w)))
    small = sized.filter(F.col("_bsz") <= cap).drop("_bsz", "_bmin")
    a = small.alias("a")
    b = small.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in bucket_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    small_pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"))
    big_pairs = (sized
                 .filter((F.col("_bsz") > cap)
                         & (F.col(id_col) != F.col("_bmin")))
                 .select(F.col("_bmin").alias("id_a"),
                         F.col(id_col).alias("id_b")))
    return small_pairs.unionByName(big_pairs).distinct()
