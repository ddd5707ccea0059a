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

Documented recall effect of the cap — stated precisely, because the
star pairs are CANDIDATES that still face exact verification downstream:

- pairs whose every shared bucket is over-cap are surfaced only as
  (hub, member) edges; if the hub does not verify against a member
  (hub = bucket-min id, which may be a hash collider rather than a true
  near-dup), that member's true pairs in this bucket are LOST, not just
  re-routed — verification does not follow transitivity;
- therefore completeness guarantees (LSH pigeonhole/recall claims) hold
  EXACTLY only while every relevant bucket has <= cap members. Callers
  needing the provable guarantee regardless of skew pass ``cap=None``
  (uncapped — accepts the O(n^2)-per-bucket risk the cap exists to
  avoid);
- in the intended regime (bucket space >> corpus, e.g. 2^16 buckets per
  table vs thousands of items) over-cap buckets occur only for mass-
  duplicated content, where hub-linking plus exact verification of
  identical payloads recovers the clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucket_candidate_pairs(buckets: DataFrame, bucket_cols: list[str],
                           id_col: str, *, cap: int | None = 256,
                           payload_cols: list[str] | None = None
                           ) -> DataFrame:
    """DISTINCT (id_a, id_b) candidate pairs (id_a < id_b) from LSH bucket
    rows, with the per-bucket skew cap described in the module docstring.
    ``cap=None`` disables the cap entirely: exact all-pairs-per-bucket
    semantics (the provable-completeness mode), at the cost of O(n^2)
    candidates from a pathological bucket.

    ``payload_cols``: per-id columns (functionally dependent on id_col,
    e.g. the SimHash fingerprint) carried through to the output as
    ``<col>_a`` / ``<col>_b`` — callers that need both sides' payloads
    for verification get them from the SAME shuffle instead of two
    re-attach joins on id afterwards (which cost ~2x the candidate join
    itself at bench scale; VERDICT r3 #3). Hub payloads for over-cap
    star pairs ride the same groupBy pass via min_by.

    The bucket stats shuffle on the same key as the join itself, so no
    extra exchange shape is introduced; a hot bucket lands in one task
    but does only linear work there.
    """
    pay = list(payload_cols or [])

    def side(df, tag):
        cols = [F.col(id_col).alias(f"id_{tag}")]
        cols += [F.col(c).alias(f"{c}_{tag}") for c in pay]
        return df.select(*cols)

    if cap is None:
        a = buckets.select(id_col, *pay, *bucket_cols).alias("a")
        b = buckets.select(id_col, *pay, *bucket_cols).alias("b")
        cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in bucket_cols]
        cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        return (a.join(b, cond)
                .select(F.col(f"a.{id_col}").alias("id_a"),
                        F.col(f"b.{id_col}").alias("id_b"),
                        *[F.col(f"a.{c}").alias(f"{c}_a") for c in pay],
                        *[F.col(f"b.{c}").alias(f"{c}_b") for c in pay])
                .distinct())
    if cap < 2:
        raise ValueError("cap must be >= 2")
    # bucket stats via groupBy, NOT a window: the partial (map-side)
    # aggregation collapses each bucket to one row before the shuffle,
    # and filtering to _bsz > 1 drops SINGLETON buckets — the vast
    # majority under uniform hashes — so the stats join and the self-
    # join below only ever touch collision rows. (The first capped
    # implementation windowed count/min over ALL bucket rows: full
    # shuffle + per-partition sort of 99%-singleton data, ~2.5x the
    # uncapped join's wall at bench scale.)
    agg = [F.count(F.lit(1)).alias("_bsz"), F.min(id_col).alias("_bmin")]
    agg += [F.min_by(c, id_col).alias(f"_bmin_{c}") for c in pay]
    stats = (buckets.groupBy(*bucket_cols).agg(*agg)
             .filter(F.col("_bsz") > 1))
    sized = (buckets.select(id_col, *pay, *bucket_cols)
             .join(stats, list(bucket_cols)))
    small = sized.filter(F.col("_bsz") <= cap)
    a = small.alias("a")
    b = small.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in bucket_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    small_pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *[F.col(f"a.{c}").alias(f"{c}_a") for c in pay],
        *[F.col(f"b.{c}").alias(f"{c}_b") for c in pay])
    big_pairs = (sized
                 .filter((F.col("_bsz") > cap)
                         & (F.col(id_col) != F.col("_bmin")))
                 .select(F.col("_bmin").alias("id_a"),
                         F.col(id_col).alias("id_b"),
                         *[F.col(f"_bmin_{c}").alias(f"{c}_a")
                           for c in pay],
                         *[F.col(c).alias(f"{c}_b") for c in pay]))
    return small_pairs.unionByName(big_pairs).distinct()
