"""Sketch-driven range partitioning: KLL quantile boundaries as a
reusable physical-layout planner.

Spark's ``repartitionByRange`` samples the input per query (a hidden
extra scan with non-deterministic boundaries) and throws the boundaries
away. Here the boundaries come from a mergeable KLL sketch built with
the standard partial + tree-merge topology (sketchlib.spark_build), so
they are

- deterministic for a given input and k (KLL compaction here is
  seeded/canonical — see kll.py),
- reusable: persist the sketch in the durable store and re-derive
  boundaries for tomorrow's writes so file layouts stay stable across
  runs (the property that makes downstream merge-on-read and
  partition-pruning predictable),
- composable: union two tables' sketches to plan a layout for their
  union without rescanning either.

Bucket assignment is pure Catalyst (an ``aggregate`` over the broadcast
boundary array — O(n_parts) comparisons per row inside whole-stage
codegen, no Python), so the assignment column can feed
``DataFrameWriter.partitionBy``, a ``repartition`` before a sorted
write, or a skew diagnosis, all JVM-side.

Guarantee: KLL normalized rank error eps (~1.7/k with k=400) bounds the
bucket-population imbalance: each bucket holds a rank slice of width
1/n_parts +- 2*eps, so max/mean count ratio <= 1 + 2*eps*n_parts for
continuous (tie-free) columns. Ties concentrate mass on one value and
are collapsed into one boundary (dedup below) — the imbalance is then a
property of the data, not the planner.

No counterpart in the reference (CountMinDB has no physical planner;
its only layout knob is the hash-routed block chunking of cm.h:440-467,
which this generalizes to value-range layout).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, functions as F

from .kll import KllSketch


def range_boundaries_from_sketch(sk, n_parts: int) -> list[float]:
    """n_parts-1 interior boundaries at equal rank spacing, strictly
    increasing (ties collapse, so heavy single values cannot split)."""
    if n_parts < 2:
        raise ValueError("n_parts must be >= 2")
    out: list[float] = []
    for i in range(1, n_parts):
        b = float(sk.quantile(i / n_parts))
        if not out or b > out[-1]:
            out.append(b)
    return out


def range_boundaries(df: DataFrame, value_col: str, n_parts: int, *,
                     k: int = 400) -> list[float]:
    """Distributed KLL build over ``value_col`` -> interior boundaries.
    One pass, partials shuffle as KB blobs, raw values never move."""
    from .spark_build import build_aggregator

    res = build_aggregator(df, value_col, functools.partial(KllSketch, k=k))
    if res.sketch.n_items == 0:
        raise ValueError(f"no non-null values in {value_col}")
    return range_boundaries_from_sketch(res.sketch, n_parts)


def range_bucket(col: Column, boundaries: list[float]) -> Column:
    """Catalyst-only bucket id: the number of boundaries <= col, i.e.
    searchsorted(boundaries, col, side='right') without leaving codegen.
    NULLs map to bucket -1 so they stay addressable."""
    if not boundaries:
        return F.when(col.isNull(), F.lit(-1)).otherwise(F.lit(0))
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    n = F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(col.cast("double") >= b, 1).otherwise(0))
    return F.when(col.isNull(), F.lit(-1)).otherwise(n)


def repartition_by_boundaries(df: DataFrame, value_col: str,
                              boundaries: list[float], *,
                              bucket_col: str = "_range_bucket") -> DataFrame:
    """Attach the bucket id and range-cluster the rows on it: one
    RANGE shuffle keyed by bucket, after which each task holds a
    contiguous interval of bucket ids — hence one contiguous value
    range — the layout a sorted/partitioned write wants. (A hash
    repartition on the bucket id would co-locate same-bucket rows but
    could pack non-adjacent buckets into one task and leave ~1/e of
    tasks empty; range partitioning keeps the contiguity the docstring
    promises. For exactly-one-bucket-per-output-dir, write with
    ``partitionBy(bucket_col)`` instead — the zorder_layout path.) The
    bucket column is kept (callers pass it to partitionBy or drop it)."""
    out = df.withColumn(bucket_col, range_bucket(F.col(value_col),
                                                 boundaries))
    return out.repartitionByRange(len(boundaries) + 1, F.col(bucket_col))


def zorder_value(cols_and_bounds: list[tuple[Column, list[float]]],
                 bits_per_dim: int = 8) -> Column:
    """Z-order (Morton) key over 2+ columns, each first rank-bucketed by
    its own KLL boundaries, then bit-interleaved — all in Catalyst, so
    the key feeds a repartition/sortWithinPartitions write with no
    Python on the data path.

    Why rank-bucket first: Morton interleaving assumes each dimension's
    code is uniformly spread; raw values with skew would waste the top
    bits on empty ranges. The KLL boundaries equalize mass per code
    (exactly the partitioner's balance guarantee), which is what makes
    z-prefix file pruning effective on BOTH dimensions at once.

    ``bits_per_dim`` b means each dimension contributes 2^b codes; pass
    boundaries of length 2^b - 1 (extra boundaries are truncated, fewer
    are zero-padded by construction since bucket ids just don't reach
    the top codes). NULL in any dimension yields NULL (callers route
    nulls to a dedicated partition).
    """
    if len(cols_and_bounds) < 2:
        raise ValueError("z-ordering needs >= 2 dimensions")
    if not 1 <= bits_per_dim <= 16:
        raise ValueError("bits_per_dim must be in [1, 16]")
    ndim = len(cols_and_bounds)
    if ndim * bits_per_dim > 63:
        raise ValueError("interleaved key must fit a signed 64-bit long")
    z = F.lit(0).cast("long")
    for d, (col, bounds) in enumerate(cols_and_bounds):
        bounds = list(bounds)[:(1 << bits_per_dim) - 1]
        code = range_bucket(col, bounds).cast("long")
        code = F.when(col.isNull(), F.lit(None)).otherwise(code)
        # spread code's bit i to interleaved position i*ndim + d
        for i in range(bits_per_dim):
            bit = F.shiftright(code, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndim + d))
    return z


def zorder_layout(df: DataFrame, value_cols: list[str], *,
                  n_parts: int = 32, bits_per_dim: int = 8, k: int = 400,
                  key_col: str = "_zorder") -> tuple[DataFrame, dict]:
    """Plan + apply a z-order layout: per-dimension KLL boundaries (one
    build pass per column), Morton key column, then the z key is itself
    range-clustered with ITS OWN KLL boundaries and sorted within each
    partition — every output file covers one compact, contiguous
    z-range, the layout that lets min/max file statistics prune on ANY
    of the dimensions. End-to-end deterministic (no sampling anywhere,
    unlike DataFrame.repartitionByRange), so re-running the layout
    yields the same file ranges. Returns (laid-out df, boundaries per
    column + key_col — persist them to keep layouts stable)."""
    n_codes = 1 << bits_per_dim
    bounds = {c: range_boundaries(df, c, n_codes, k=k)
              for c in value_cols}
    keyed = df.withColumn(
        key_col, zorder_value([(F.col(c), bounds[c]) for c in value_cols],
                              bits_per_dim))
    zb = range_boundaries(keyed, key_col, n_parts, k=k)
    bounds[key_col] = zb
    out = (repartition_by_boundaries(keyed, key_col, zb,
                                     bucket_col="_z_bucket")
           .sortWithinPartitions("_z_bucket", key_col))
    # hash repartition may co-locate two buckets in one task, so the
    # per-FILE compactness guarantee comes from writing with
    # .write.partitionBy("_z_bucket"): each directory then holds exactly
    # one contiguous z-range whatever task wrote it.
    return out, bounds
