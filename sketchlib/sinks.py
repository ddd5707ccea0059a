"""Bucketed / partitioned sinks: pre-shuffling data ONCE at write time so
every later join or aggregation on the bucket key runs with ZERO exchanges.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides; writing both tables bucketed by the join key (same bucket count)
makes the join a per-bucket zip — Spark plans SortMergeJoin with no
Exchange on either side. This is the storage-layout half of the engine's
shuffle-minimization story (the sketch side never shuffles raw data by
construction; this covers the exact relational side).

Bucketing requires the table catalog (bucket metadata lives there, not in
parquet files), so these helpers write managed tables with an explicit
``path``; plain ``partitionBy`` directory layout is used for partition
PRUNING (see similarity.ivf_write_index), bucketing for join/agg
CO-LOCATION.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key_col: str, *,
                   n_buckets: int, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets SortMergeJoin skip its sort stage too:
    the join becomes a pure streaming merge of pre-sorted bucket files."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key_col)
    if sort:
        w = w.sortBy(key_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key_col: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With both
    sides bucketed the physical plan contains no Exchange (plan-asserted
    in tests/test_plans.py) — the join cost is a linear merge per bucket,
    independent of cluster-wide data volume."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key_col)
