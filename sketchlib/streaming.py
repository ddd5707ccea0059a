"""Incremental sketch maintenance with Structured Streaming.

The reference has no time concept (SURVEY.md §2.2: benches loop over
pre-generated vectors) — but its buffer-then-merge design (cm.h:523-530) is
exactly a streaming micro-batch: every Count-Min/HLL/Bloom/DDSketch update
is associative and commutative, so a stream of token batches folds into a
running sketch with ``foreachBatch``:

  micro-batch df  -> distributed partial build (same mapInArrow machinery)
                  -> merge into the running sketch
                  -> atomically persist a snapshot (blob + watermark of
                     processed batch ids) next to Spark's own checkpoint.

Restart recovery: Spark replays any uncommitted micro-batch; the snapshot
carries ``last_batch_id`` so replayed batches are folded exactly once
(idempotent against the at-least-once contract of foreachBatch).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from . import serde
from .spark_build import build_aggregator


class StreamingSketchBuilder:
    """Owns a running sketch updated by foreachBatch micro-batches."""

    def __init__(self, factory, values_col: str, snapshot_dir: str) -> None:
        self.factory = factory
        self.values_col = values_col
        self.snapshot_dir = snapshot_dir
        os.makedirs(snapshot_dir, exist_ok=True)
        self.sketch, self.last_batch_id = self._load()

    # -- snapshot persistence (atomic rename; blob + manifest) ---------------
    def _paths(self):
        return (os.path.join(self.snapshot_dir, "sketch.bin"),
                os.path.join(self.snapshot_dir, "MANIFEST.json"))

    def _load(self):
        blob_path, man_path = self._paths()
        if os.path.exists(blob_path) and os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            with open(blob_path, "rb") as f:
                return serde.loads(f.read()), man["last_batch_id"]
        return self.factory(), -1

    def _save(self) -> None:
        blob_path, man_path = self._paths()
        tmp = blob_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.sketch.to_bytes())
        os.replace(tmp, blob_path)
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_batch_id": self.last_batch_id,
                       "n_items": self.sketch.n_items,
                       "updated_at": time.time()}, f)
        os.replace(tmp, man_path)

    # -- the foreachBatch hook ------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id:
            return  # replay of an already-folded micro-batch
        res = build_aggregator(batch_df, self.values_col, self.factory)
        self.sketch.merge(res.sketch)
        self.last_batch_id = batch_id
        self._save()

    def attach(self, stream_df: DataFrame, *, checkpoint_dir: str,
               trigger_once: bool = True):
        """Wire this builder to a streaming DataFrame; returns the query."""
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("update"))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def stream_build_from_files(spark: SparkSession, input_dir: str,
                            values_col: str, factory, *,
                            work_dir: str, schema=None,
                            max_files_per_trigger: int = 4,
                            trigger_once: bool = True):
    """File-source incremental build: new parquet files landing in
    ``input_dir`` fold into the running sketch. Returns (builder, query);
    call ``query.awaitTermination()`` then read ``builder.sketch``."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        import pyarrow.parquet as pq  # noqa: F401
        static = spark.read.parquet(input_dir)
        reader = reader.schema(static.schema)
    stream = (reader.option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_dir))
    builder = StreamingSketchBuilder(
        factory, values_col, os.path.join(work_dir, "snapshot"))
    query = builder.attach(stream,
                           checkpoint_dir=os.path.join(work_dir, "spark_ckpt"),
                           trigger_once=trigger_once)
    return builder, query
