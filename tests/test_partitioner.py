"""Sketch-driven range partitioning: boundary monotonicity, Catalyst
bucket assignment == numpy searchsorted, balance under the KLL rank
bound, tie collapse, and the one-shuffle range clustering."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.kll import KllSketch
from sketchlib.partitioner import (range_boundaries,
                                   range_boundaries_from_sketch,
                                   range_bucket, repartition_by_boundaries)


def test_boundaries_monotone_and_balanced_local():
    rng = np.random.default_rng(3)
    vals = rng.lognormal(3.0, 1.2, 200_000)
    sk = KllSketch(k=400)
    sk.update_batch(vals)
    bounds = range_boundaries_from_sketch(sk, 16)
    assert bounds == sorted(bounds)
    assert len(bounds) == 15
    counts = np.bincount(np.searchsorted(bounds, vals, side="right"),
                         minlength=16)
    # KLL eps ~ 1.7/k -> slice width 1/16 +- 2*eps; generous factor
    assert counts.max() / counts.mean() < 1.35
    assert counts.min() > 0


def test_tie_collapse_constant_column():
    sk = KllSketch(k=200)
    sk.update_batch(np.full(10_000, 7.0))
    bounds = range_boundaries_from_sketch(sk, 8)
    assert bounds == [7.0]          # all interior quantiles tie -> one


def test_range_bucket_matches_searchsorted(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(50.0, 20.0, 5000).round(3)
    bounds = [20.0, 40.0, 50.0, 60.0, 80.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = (df.withColumn("b", range_bucket(F.col("v"), bounds))
           .groupBy("b").count().collect())
    got = {r["b"]: r["count"] for r in got}
    want = np.bincount(np.searchsorted(bounds, vals, side="right"),
                       minlength=6)
    assert got == {i: int(c) for i, c in enumerate(want) if c}
    # nulls go to bucket -1, empty boundary list to bucket 0
    ndf = spark.createDataFrame([(None,), (1.0,)], "v double")
    rows = {r["v"]: r["b"] for r in ndf.select(
        "v", range_bucket(F.col("v"), bounds).alias("b")).collect()}
    assert rows[None] == -1 and rows[1.0] == 0
    rows0 = ndf.select("v", range_bucket(F.col("v"), []).alias("b")).collect()
    assert {r["b"] for r in rows0} == {-1, 0}


def test_distributed_boundaries_balance_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.withColumn(
        "ts_us",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast("double"))
    bounds = range_boundaries(ev, "ts_us", 8, k=400)
    assert bounds == sorted(bounds) and len(bounds) == 7
    part = repartition_by_boundaries(ev, "ts_us", bounds)
    assert part.rdd.getNumPartitions() == 8
    counts = (part.groupBy("_range_bucket").count()
              .toPandas().set_index("_range_bucket")["count"])
    assert counts.max() / counts.mean() < 1.4
    # every row kept, each bucket's values sit inside its range
    assert int(counts.sum()) == ev.count()
    mins = (part.groupBy("_range_bucket")
            .agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"))
            .collect())
    for r in mins:
        b = r["_range_bucket"]
        if b > 0:
            assert r["lo"] >= bounds[b - 1]
        if b < len(bounds):
            assert r["hi"] < bounds[b]


def test_validation():
    sk = KllSketch(k=200)
    sk.update_batch(np.arange(100.0))
    with pytest.raises(ValueError):
        range_boundaries_from_sketch(sk, 1)


def _morton2(x, y, bits):
    z = np.zeros_like(x, dtype=np.int64)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_numpy_morton(spark):
    from sketchlib.partitioner import zorder_value
    rng = np.random.default_rng(4)
    xs = rng.uniform(0, 100, 2000)
    ys = rng.uniform(-50, 50, 2000)
    bx = list(np.linspace(0, 100, 16)[1:-1])    # 14 boundaries -> 15 codes
    by = list(np.linspace(-50, 50, 16)[1:-1])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)], "x double, y double")
    got = np.array([r["z"] for r in df.select(
        zorder_value([(F.col("x"), bx), (F.col("y"), by)],
                     bits_per_dim=4).alias("z")).collect()])
    cx = np.searchsorted(bx, xs, side="right").astype(np.int64)
    cy = np.searchsorted(by, ys, side="right").astype(np.int64)
    assert np.array_equal(got, _morton2(cx, cy, 4))


def test_zorder_null_and_validation(spark):
    from sketchlib.partitioner import zorder_value
    df = spark.createDataFrame([(1.0, None), (1.0, 2.0)],
                               "x double, y double")
    rows = df.select(zorder_value([(F.col("x"), [0.5]),
                                   (F.col("y"), [1.5])],
                                  bits_per_dim=1).alias("z")).collect()
    assert rows[0]["z"] is None and rows[1]["z"] is not None
    with pytest.raises(ValueError):
        zorder_value([(F.col("x"), [0.5])])
    with pytest.raises(ValueError):
        zorder_value([(F.col("x"), []), (F.col("y"), []),
                      (F.col("x"), []), (F.col("y"), [])],
                     bits_per_dim=16)


def test_zorder_layout_files_prune_both_dims(spark, tmp_path):
    """The point of the layout: after partitionBy(_z_bucket), a
    predicate on EITHER dimension skips most bucket directories by
    min/max alone."""
    from sketchlib.partitioner import zorder_layout
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("ts_us", F.unix_micros(
              F.col("ts").cast("timestamp_ltz")).cast("double"))
          .select("event_id", "ts_us",
                  F.col("value").cast("double").alias("val")))
    laid, bounds = zorder_layout(ev, ["ts_us", "val"], n_parts=16,
                                 bits_per_dim=4, k=400)
    assert laid.filter(F.col("_zorder").isNull()).count() == 0
    out = str(tmp_path / "z")
    laid.write.partitionBy("_z_bucket").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # per-bucket min/max of both dims: a selective 1-D predicate must
    # overlap only a minority of buckets (that's the pruning win)
    import pandas as pd
    mm = (back.groupBy("_z_bucket")
          .agg(F.min("ts_us").alias("tlo"), F.max("ts_us").alias("thi"),
               F.min("val").alias("vlo"), F.max("val").alias("vhi"))
          .toPandas())
    n_buckets = len(mm)
    assert n_buckets >= 12
    t10 = float(ev.selectExpr("percentile(ts_us, 0.10)").collect()[0][0])
    v10 = float(ev.selectExpr("percentile(val, 0.10)").collect()[0][0])
    t_hit = int((mm["tlo"] <= t10).sum())       # buckets a ts<=p10 scan touches
    v_hit = int((mm["vlo"] <= v10).sum())
    assert t_hit <= n_buckets * 0.7
    assert v_hit <= n_buckets * 0.7
    # and the layout is deterministic: re-planning yields identical bounds
    _, bounds2 = zorder_layout(ev, ["ts_us", "val"], n_parts=16,
                               bits_per_dim=4, k=400)
    assert bounds == bounds2
