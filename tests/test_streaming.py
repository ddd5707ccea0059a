"""Structured Streaming incremental sketch maintenance: the streamed build
must equal the batch build byte-for-byte, and survive a restart
(at-least-once replay folded exactly once)."""

import math
import os
import shutil

import numpy as np

from sketchlib.countmin import CMConfig, CountMinSketch
from sketchlib.datagen import generate_token_table
from sketchlib.spark_build import build_sketch
from sketchlib.streaming import stream_build_from_files

CFG = CMConfig(eps=1e-3, delta=math.exp(-3), seed=1337)


def _cm_factory():
    return CountMinSketch(CFG)


def test_streaming_equals_batch(spark, tmp_path):
    # an "arriving files" directory with three deterministic drops
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    for i in range(3):
        generate_token_table(f"{inbox}/part{i}.parquet", rows=400,
                             seed=100 + i, dist="zipf")
    work = str(tmp_path / "work")

    builder, query = stream_build_from_files(
        spark, inbox, "tokens", _cm_factory, work_dir=work)
    query.awaitTermination(120)

    batch = build_sketch(spark.read.parquet(inbox), "tokens", CFG)
    assert builder.sketch.to_bytes() == batch.sketch.to_bytes()
    assert builder.last_batch_id >= 0

    # restart with NO new files: snapshot loads, nothing re-folds
    builder2, query2 = stream_build_from_files(
        spark, inbox, "tokens", _cm_factory, work_dir=work)
    query2.awaitTermination(120)
    assert builder2.sketch.to_bytes() == batch.sketch.to_bytes()

    # a new file arrives; incremental fold matches full rebuild
    generate_token_table(f"{inbox}/part3.parquet", rows=400,
                         seed=999, dist="uniform")
    builder3, query3 = stream_build_from_files(
        spark, inbox, "tokens", _cm_factory, work_dir=work)
    query3.awaitTermination(120)
    full = build_sketch(spark.read.parquet(inbox), "tokens", CFG)
    assert builder3.sketch.to_bytes() == full.sketch.to_bytes()


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """Simulate foreachBatch at-least-once: the same batch id delivered
    twice must fold once."""
    from sketchlib.streaming import StreamingSketchBuilder
    inbox = str(tmp_path / "inbox2")
    os.makedirs(inbox)
    generate_token_table(f"{inbox}/p.parquet", rows=300, seed=5, dist="zipf")
    df = spark.read.parquet(inbox)
    b = StreamingSketchBuilder(_cm_factory, "tokens", str(tmp_path / "snap"))
    b.process_batch(df, 0)
    once = b.sketch.to_bytes()
    b.process_batch(df, 0)  # replay
    assert b.sketch.to_bytes() == once
    b.process_batch(df, 1)  # genuinely new batch
    assert b.sketch.to_bytes() != once
