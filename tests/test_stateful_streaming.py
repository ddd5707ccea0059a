"""applyInPandasWithState operators: engine-managed per-key state
(running counts; sketch blobs as state) must equal the batch answer after
the stream drains."""

import math
import os

from pyspark.sql import functions as F

from sketchlib.countmin import CMConfig, CountMinSketch
from sketchlib.datagen import generate_token_table
from sketchlib.spark_build import build_sketch
from sketchlib.streaming import stateful_running_counts, stateful_sketch_state

CFG = CMConfig(eps=1e-3, delta=math.exp(-3), seed=1337)


def _drops(tmp_path, n_files=3, rows=200):
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    for i in range(n_files):
        generate_token_table(f"{inbox}/p{i}.parquet", rows=rows,
                             seed=300 + i, dist="zipf")
    return inbox


def test_stateful_running_counts(spark, tmp_path):
    inbox = _drops(tmp_path)
    static = spark.read.parquet(inbox)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1).parquet(inbox))
    q = (stateful_running_counts(stream, "source")
         .writeStream.format("memory").queryName("running_counts")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.table("running_counts")
    # update-mode emits a running value per micro-batch; the max per key is
    # the final state
    final = {r["key"]: r["m"] for r in
             got.groupBy("key").agg(F.max("n_events").alias("m")).collect()}
    expected = {r["source"]: r["cnt"] for r in
                static.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert final == expected


def test_stateful_sketch_state(spark, tmp_path):
    inbox = _drops(tmp_path)
    static = spark.read.parquet(inbox)
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 1).parquet(inbox))
    q = (stateful_sketch_state(stream, "source", "tokens",
                               lambda: CountMinSketch(CFG))
         .writeStream.format("memory").queryName("sketch_state")
         .option("checkpointLocation", str(tmp_path / "ckpt_sk"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(240)

    got = spark.table("sketch_state").collect()
    # last emission per key (largest n_items) is the final state
    final: dict[str, bytes] = {}
    best = {}
    for r in got:
        if r["n_items"] >= best.get(r["key"], -1):
            best[r["key"]] = r["n_items"]
            final[r["key"]] = bytes(r["sketch"])

    for src in final:
        ref = build_sketch(static.filter(F.col("source") == src),
                           "tokens", CFG)
        assert final[src] == ref.sketch.to_bytes(), src
