"""Custom Python DataSource (`sketchlib_tokens`): batch reads must be
bit-identical to datagen's parquet output for the same params; streaming
reads must replay the same chunks deterministically."""

import pytest

from sketchlib import pysource
from sketchlib.pysource import _chunk_bounds, _TokenTableReader


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pysource.register(spark)


def test_batch_matches_generated_parquet(spark, tmp_path):
    from sketchlib.datagen import generate_token_table
    p = str(tmp_path / "tok.parquet")
    generate_token_table(p, rows=1500, seed=99, dist="zipf")
    via_file = spark.read.parquet(p)
    via_src = (spark.read.format("sketchlib_tokens")
               .option("rows", 1500).option("seed", 99)
               .option("dist", "zipf").load())
    assert via_src.schema == via_file.schema
    a = sorted(map(tuple, via_file.collect()))
    b = sorted(map(tuple, via_src.collect()))
    assert a == b


def test_uniform_dist_and_defaults(spark):
    df = (spark.read.format("sketchlib_tokens")
          .option("rows", 200).option("dist", "uniform").load())
    rows = df.collect()
    assert len(rows) == 200
    assert all(8 <= r["n_tok"] <= 512 for r in rows)
    assert all(len(r["tokens"]) == r["n_tok"] for r in rows)


def test_partitions_one_per_chunk():
    r = _TokenTableReader({"rows": "250000"})
    parts = r.partitions()
    assert [(p.chunk_idx, p.start_row, p.rows) for p in parts] == [
        (0, 0, 100_000), (1, 100_000, 100_000), (2, 200_000, 50_000)]
    assert list(_chunk_bounds(0)) == []


def test_sql_surface(spark):
    """DDL CREATE TABLE works (defaults only — Spark 4.1 drops Python-source
    DDL OPTIONS, documented in register()); sql_view carries parameters."""
    pysource.sql_view(spark, "tok_v", rows=700, seed=3)
    n, toks = spark.sql(
        "SELECT count(*) AS n, sum(n_tok) AS t FROM tok_v").first()
    assert n == 700 and toks > 0
    spark.sql("DROP TABLE IF EXISTS tok_ddl")
    spark.sql("CREATE TABLE tok_ddl USING sketchlib_tokens")
    try:
        # defaults: rows=100000 — proves the catalog table scans the source
        assert spark.table("tok_ddl").count() == 100_000
    finally:
        spark.sql("DROP TABLE tok_ddl")


def test_bad_options_rejected():
    with pytest.raises(ValueError):
        _TokenTableReader({"rows": "-1"})
    with pytest.raises(ValueError):
        _TokenTableReader({"dist": "pareto"})


def test_stream_feeds_incremental_sketch_build(spark, tmp_path):
    """The engine-native stream drives the foreachBatch incremental sketch
    builder; the result must be byte-identical to the batch build over the
    batch read of the same (rows, seed) — the replay-determinism the
    DataSource gets structurally, observed end-to-end."""
    from sketchlib.countmin import CMConfig, CountMinSketch
    from sketchlib.spark_build import build_sketch
    from sketchlib.streaming import StreamingSketchBuilder
    cfg = CMConfig(eps=0.005, delta=0.1, seed=11)
    stream = (spark.readStream.format("sketchlib_tokens")
              .option("rows", 300).option("seed", 21).load())
    builder = StreamingSketchBuilder(lambda: CountMinSketch(cfg), "tokens",
                                     str(tmp_path / "snap"))
    q = builder.attach(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    assert q.awaitTermination(180)
    batch = (spark.read.format("sketchlib_tokens")
             .option("rows", 300).option("seed", 21).load())
    want = build_sketch(batch, "tokens", cfg).sketch
    assert builder.sketch.n_items == want.n_items > 0
    assert builder.sketch.to_bytes() == want.to_bytes()


def test_stream_replays_batch_content(spark, tmp_path):
    """availableNow-style bounded drain: the stream over (rows, seed) must
    produce exactly the batch table's rows, then stop advancing."""
    import time
    batch = (spark.read.format("sketchlib_tokens")
             .option("rows", 400).option("seed", 7).load())
    want = sorted(map(tuple, batch.collect()))
    q = (spark.readStream.format("sketchlib_tokens")
         .option("rows", 400).option("seed", 7).load()
         .writeStream.format("memory").queryName("pysource_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.table("pysource_stream").count()
            if got >= 400:
                break
            time.sleep(0.5)
        got_rows = sorted(map(tuple, spark.table("pysource_stream").collect()))
        assert got_rows == want
    finally:
        q.stop()


def test_build_sketch_generated_byte_identical(spark):
    """The zero-IO in-task generator build must produce the SAME sketch
    bytes as building from the DataSource DataFrame (which pays the
    Python-source double hop) — multi-chunk, so the (seed, chunk_idx)
    keying and per-chunk partials are both exercised."""
    import math
    from sketchlib.countmin import CMConfig
    from sketchlib.spark_build import build_sketch, build_sketch_generated

    cfg = CMConfig(eps=1e-3, delta=math.exp(-3), seed=7)
    rows = 120_000  # 2 chunks: 100k + 20k
    df = (spark.read.format("sketchlib_tokens")
          .option("rows", rows).option("seed", 5).load())
    via_df = build_sketch(df, "tokens", cfg)
    gen = build_sketch_generated(spark, rows, cfg, seed=5)
    assert gen.sketch.to_bytes() == via_df.sketch.to_bytes()
    assert gen.n_rows == via_df.n_rows == rows
    assert len(gen.lineage) == 2  # one partial per 100k-row chunk
    empty = build_sketch_generated(spark, 0, cfg, seed=5)
    assert empty.sketch.n_items == 0 and empty.n_rows == 0


def test_blocked_zipf_bit_identity():
    """The cache-blocked zipf chain must be bit-identical to the naive
    full-array chain AND leave the RNG in the same state (so the
    downstream source-choice draws in _chunk are unchanged) — otherwise
    every previously generated table silently changes content."""
    import numpy as np
    from sketchlib.datagen import (_TOKEN_MASK, _zipf_ranks,
                                   _zipf_tokens_blocked)
    from sketchlib.hashing import murmur_h2_into

    for total in (0, 1, 65_535, 65_536, 65_537, 200_001):
        rng_a = np.random.default_rng([11, 3])
        ranks = _zipf_ranks(rng_a, total)
        h = np.empty(total, dtype=np.uint64)
        murmur_h2_into(ranks, 9001, h)
        h &= _TOKEN_MASK
        want = h.astype(np.int32)
        rng_b = np.random.default_rng([11, 3])
        got = _zipf_tokens_blocked(rng_b, total)
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, want)
        assert rng_a.random() == rng_b.random()


def test_chunk_tokens_out_buffer_bit_identity():
    """chunk_tokens(out=buf) must return the same tokens and the same RNG
    position as the allocating path, for both dists (the uniform path
    draws blockwise when a buffer is supplied)."""
    import numpy as np
    from sketchlib.datagen import chunk_tokens

    buf = np.empty(3000 * 512, dtype=np.int32)
    for dist in ("zipf", "uniform"):
        n_a, t_a, rng_a = chunk_tokens(42, 5, 3000, dist)
        n_b, t_b, rng_b = chunk_tokens(42, 5, 3000, dist, out=buf)
        np.testing.assert_array_equal(n_a, n_b)
        np.testing.assert_array_equal(t_a, t_b)
        assert rng_a.random() == rng_b.random()
