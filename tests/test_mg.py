"""Misra-Gries frequent-items summary: the deterministic guarantee
(underestimate + certain n/(k+1) error bound + guaranteed presence of
heavy keys) must hold for every stream, partitioning and merge order."""

import functools

import numpy as np
import pytest

from sketchlib.mg import MisraGries


def _zipf_stream(n=50_000, a=1.3, seed=3):
    return np.random.default_rng(seed).zipf(a, n).astype(np.int64)


def _exact(keys):
    u, c = np.unique(keys, return_counts=True)
    return dict(zip(u.tolist(), c.tolist()))


def _check_guarantees(mg, keys):
    exact = _exact(keys)
    n = len(keys)
    assert mg.n_items == n
    bound = mg.error_bound()
    assert bound <= n // (mg.k + 1)
    for key, f in exact.items():
        est = mg.point_query(key)
        assert est <= f, f"overestimate for {key}"
        assert f - est <= bound, f"bound violated for {key}"
    # every key heavier than n/(k+1) is guaranteed present
    for key, f in exact.items():
        if f > n // (mg.k + 1):
            assert mg.point_query(key) > 0, f"heavy key {key} missing"
    # absent keys estimate 0 (never negative / never invented)
    assert mg.point_query(-12345) == 0


def test_single_pass_guarantees():
    keys = _zipf_stream()
    mg = MisraGries(k=32)
    mg.update_batch(keys)
    assert len(mg.counters) <= 32
    _check_guarantees(mg, keys)


def test_merge_any_partitioning_keeps_guarantees():
    keys = _zipf_stream(n=30_000)
    rng = np.random.default_rng(11)
    for n_parts in (2, 7, 16):
        parts = np.array_split(keys, n_parts)
        order = rng.permutation(n_parts)
        mg = MisraGries(k=48)
        for i in order:
            part_mg = MisraGries(k=48)
            part_mg.update_batch(parts[i])
            mg.merge(part_mg)
        _check_guarantees(mg, keys)


def test_batch_equals_incremental_bound():
    """Batched update is itself a merge; guarantees hold for tiny batches
    too (worst case for decrement accounting)."""
    keys = _zipf_stream(n=5_000)
    mg = MisraGries(k=16)
    for chunk in np.array_split(keys, 100):
        mg.update_batch(chunk)
    _check_guarantees(mg, keys)


def test_serde_roundtrip():
    keys = _zipf_stream(n=10_000)
    mg = MisraGries(k=32)
    mg.update_batch(keys)
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.k == mg.k and back.n_items == mg.n_items
    assert back.counters == mg.counters
    assert back.to_bytes() == mg.to_bytes()
    from sketchlib import serde
    assert serde.loads(mg.to_bytes()).counters == mg.counters


def test_merge_rejects_mismatched_k_and_type():
    a, b = MisraGries(k=8), MisraGries(k=16)
    with pytest.raises(ValueError):
        a.merge(b)
    with pytest.raises(ValueError):
        a.merge(object())


def test_top_items_deterministic_order():
    mg = MisraGries(k=8)
    mg.update_batch(np.array([5, 5, 3, 3, 9], dtype=np.int64))
    assert mg.top_items() == [(3, 2), (5, 2), (9, 1)]
    assert mg.top_items(limit=1) == [(3, 2)]


def test_truncated_blob_rejected():
    mg = MisraGries(k=8)
    mg.update_batch(np.arange(5, dtype=np.int64))
    with pytest.raises(ValueError):
        MisraGries.from_bytes(mg.to_bytes()[:-4])


def test_distributed_build_guarantees(spark):
    """build_aggregator over the tokens column: distributed MG keeps the
    deterministic guarantee vs the exact explode-count."""
    import functools
    from pyspark.sql import functions as F
    from sketchlib.spark_build import build_aggregator

    rows = [([int(x) for x in _zipf_stream(n=200, seed=s)],)
            for s in range(50)]
    df = spark.createDataFrame(rows, "tokens array<long>").repartition(8)
    res = build_aggregator(df, "tokens",
                           functools.partial(MisraGries, k=64))
    mg = res.sketch
    exact = {r["t"]: r["c"] for r in
             df.select(F.explode("tokens").alias("t"))
             .groupBy("t").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    assert mg.n_items == n
    bound = mg.error_bound()
    assert bound <= n // (mg.k + 1)
    for key, f in exact.items():
        est = mg.point_query(key)
        assert est <= f and f - est <= bound
        if f > n // (mg.k + 1):
            assert est > 0


def test_streaming_mg_keeps_guarantees(spark, tmp_path):
    """MisraGries composes with the streaming builder (factory-based, like
    every sketchlib sketch): incremental fold over arriving files keeps
    the certain guarantee vs the exact count of everything arrived."""
    import os
    from pyspark.sql import functions as F
    from sketchlib.datagen import generate_token_table
    from sketchlib.streaming import stream_build_from_files

    inbox = str(tmp_path / "mg_inbox")
    os.makedirs(inbox)
    for i in range(3):
        generate_token_table(f"{inbox}/part{i}.parquet", rows=300,
                             seed=200 + i, dist="zipf")
    builder, query = stream_build_from_files(
        spark, inbox, "tokens", functools.partial(MisraGries, k=32),
        work_dir=str(tmp_path / "mg_work"))
    query.awaitTermination(120)

    mg = builder.sketch
    exact = {r["t"]: r["c"] for r in
             spark.read.parquet(inbox)
             .select(F.explode("tokens").alias("t"))
             .groupBy("t").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    assert mg.n_items == n
    bound = mg.error_bound()
    assert bound <= n // (mg.k + 1)
    for key, f in exact.items():
        est = mg.point_query(key)
        assert est <= f and f - est <= bound
