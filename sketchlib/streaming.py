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
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import serde
from .spark_build import build_aggregator, build_grouped_aggregator


# -- atomic versioned snapshots ------------------------------------------------
# A snapshot (blobs + manifest) must become visible AS A UNIT: writing blobs
# then the manifest in place leaves a crash window where blobs already carry
# batch N while the manifest still says N-1, so foreachBatch replay folds
# batch N twice. Instead every save writes a fresh ``v{batch_id}/`` dir and
# atomically repoints a CURRENT file; a crash anywhere leaves CURRENT on the
# previous complete snapshot, and Spark's replay of the uncommitted batch is
# folded exactly once against it.

def _snapshot_load_dir(snapshot_dir: str) -> str | None:
    cur = os.path.join(snapshot_dir, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        ver = f.read().strip()
    vdir = os.path.join(snapshot_dir, ver)
    return vdir if os.path.isdir(vdir) else None


def _snapshot_commit(snapshot_dir: str, batch_id: int, write_fn) -> None:
    """write_fn(tmpdir) populates the snapshot; then tmpdir -> v{batch_id}
    and CURRENT is atomically repointed. Older versions are pruned."""
    ver = f"v{batch_id}"
    vdir = os.path.join(snapshot_dir, ver)
    tmpdir = vdir + ".tmp"
    shutil.rmtree(tmpdir, ignore_errors=True)
    os.makedirs(tmpdir)
    write_fn(tmpdir)
    shutil.rmtree(vdir, ignore_errors=True)
    os.rename(tmpdir, vdir)
    cur = os.path.join(snapshot_dir, "CURRENT")
    tmp = cur + ".tmp"
    with open(tmp, "w") as f:
        f.write(ver)
    os.replace(tmp, cur)
    for name in os.listdir(snapshot_dir):
        if name.startswith("v") and name != ver and not name.endswith(".tmp"):
            shutil.rmtree(os.path.join(snapshot_dir, name), ignore_errors=True)


class StreamingSketchBuilder:
    """Owns a running sketch updated by foreachBatch micro-batches."""

    def __init__(self, factory, values_col: str, snapshot_dir: str) -> None:
        self.factory = factory
        self.values_col = values_col
        self.snapshot_dir = snapshot_dir
        os.makedirs(snapshot_dir, exist_ok=True)
        self.sketch, self.last_batch_id = self._load()

    def _load(self):
        vdir = _snapshot_load_dir(self.snapshot_dir)
        if vdir is not None:
            with open(os.path.join(vdir, "MANIFEST.json")) as f:
                man = json.load(f)
            with open(os.path.join(vdir, "sketch.bin"), "rb") as f:
                return serde.loads(f.read()), man["last_batch_id"]
        return self.factory(), -1

    def _save(self) -> None:
        def write_fn(tmpdir):
            with open(os.path.join(tmpdir, "sketch.bin"), "wb") as f:
                f.write(self.sketch.to_bytes())
            with open(os.path.join(tmpdir, "MANIFEST.json"), "w") as f:
                json.dump({"last_batch_id": self.last_batch_id,
                           "n_items": self.sketch.n_items,
                           "updated_at": time.time()}, f)
        _snapshot_commit(self.snapshot_dir, self.last_batch_id, write_fn)

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


def windowed_counts(stream_df: DataFrame, time_col: str, value_col: str, *,
                    window: str = "10 minutes",
                    watermark: str = "5 minutes") -> DataFrame:
    """Event-time windowed counts with a watermark for late data — the
    standard Structured Streaming shape (the reference has no time concept;
    this is the Spark-native surface the north rule's pipeline needs for
    time-bucketed token statistics). Append-mode compatible: a window only
    emits once the watermark passes its end, late rows beyond the watermark
    are dropped by the engine, state is bounded by (windows in flight x
    distinct values).
    """
    return (stream_df
            .withWatermark(time_col, watermark)
            .groupBy(F.window(time_col, window).alias("win"),
                     F.col(value_col))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    value_col, "cnt"))


class WindowedSketchBuilder:
    """Per-event-time-window sketches maintained incrementally: each
    micro-batch builds grouped partials keyed by window start (distributed,
    map-side combined) and merges them into ``self.sketches[window_start]``.
    Same exactly-once snapshot contract as StreamingSketchBuilder — and the
    snapshot carries BOTH live and finalized windows, so finalized results
    survive restarts. Windows older than ``retention_windows`` behind the
    max seen are finalized and evicted from the live set (the sketch
    analogue of watermark state cleanup); late data for an
    already-finalized window merges INTO the finalized sketch (never
    replaces it).

    Driver-state boundedness: with ``store_path`` set, finalized windows
    SPILL to the durable sketch store (store.py) instead of accumulating
    in driver dicts — the driver holds only the live windows (bounded by
    ``retention_windows``) plus a set of finalized window-start ints, so
    a long-running stream's driver RSS stays flat while every finalized
    window remains loadable (``load_finalized``) and byte-identical.
    Late data for a spilled window folds via load-merge-save with the
    folding ``batch_id`` recorded in the store meta, so foreachBatch
    replays after a crash between store append and snapshot commit fold
    exactly once. Without ``store_path`` the driver-dict behavior is
    kept (fine for bounded backfills)."""

    def __init__(self, factory, time_col: str, values_col: str,
                 snapshot_dir: str, *, window_seconds: int = 600,
                 retention_windows: int = 64,
                 store_path: str | None = None,
                 store_prefix: str = "win") -> None:
        self.factory = factory
        self.time_col = time_col
        self.values_col = values_col
        self.window_seconds = window_seconds
        self.retention_windows = retention_windows
        self.snapshot_dir = snapshot_dir
        self.store_path = store_path
        self.store_prefix = store_prefix
        os.makedirs(snapshot_dir, exist_ok=True)
        self.sketches: dict[int, object] = {}
        self.finalized: dict[int, bytes] = {}
        self.finalized_ws: set[int] = set()   # store mode: ints, not blobs
        self.last_batch_id = -1
        self._load()

    def _store_name(self, ws: int) -> str:
        return f"{self.store_prefix}:{ws}"

    def _load(self) -> None:
        vdir = _snapshot_load_dir(self.snapshot_dir)
        if vdir is None:
            return
        with open(os.path.join(vdir, "MANIFEST.json")) as f:
            man = json.load(f)
        self.last_batch_id = man["last_batch_id"]
        for ws in man["windows"]:
            with open(os.path.join(vdir, f"w{ws}.bin"), "rb") as f:
                self.sketches[int(ws)] = serde.loads(f.read())
        for ws in man.get("finalized", []):
            with open(os.path.join(vdir, f"f{ws}.bin"), "rb") as f:
                self.finalized[int(ws)] = f.read()
        self.finalized_ws = set(man.get("finalized_ws", []))

    def _save(self) -> None:
        def write_fn(tmpdir):
            for ws, sk in self.sketches.items():
                with open(os.path.join(tmpdir, f"w{ws}.bin"), "wb") as f:
                    f.write(sk.to_bytes())
            for ws, blob in self.finalized.items():
                with open(os.path.join(tmpdir, f"f{ws}.bin"), "wb") as f:
                    f.write(blob)
            with open(os.path.join(tmpdir, "MANIFEST.json"), "w") as f:
                json.dump({"last_batch_id": self.last_batch_id,
                           "windows": sorted(self.sketches),
                           "finalized": sorted(self.finalized),
                           "finalized_ws": sorted(self.finalized_ws),
                           "window_seconds": self.window_seconds}, f)
        _snapshot_commit(self.snapshot_dir, self.last_batch_id, write_fn)

    def _spill_finalized(self, spark, ws: int, sketch, batch_id: int) -> None:
        from . import store
        store.save_sketch(spark, self.store_path, self._store_name(ws),
                          sketch, meta={"batch_id": batch_id,
                                        "window_start": ws})
        self.finalized_ws.add(ws)

    def _late_merge_store(self, spark, ws: int, sk, batch_id: int) -> None:
        """Fold a late slice into a spilled window, exactly once: the store
        meta records which batch last folded — a replayed batch (crash
        after store append, before snapshot commit) is skipped."""
        from . import store
        name = self._store_name(ws)
        ent = store.latest_entry(spark, self.store_path, name)
        if ent is not None and ent[1].get("batch_id", -1) >= batch_id:
            return                      # this batch's fold already landed
        cur = store.load_sketch(spark, self.store_path, name)
        store.save_sketch(spark, self.store_path, name, cur.merge(sk),
                          meta={"batch_id": batch_id, "window_start": ws})

    def load_finalized(self, spark, ws: int):
        """The finalized sketch for window-start ``ws`` wherever it lives
        (durable store in spill mode, snapshot dict otherwise)."""
        if self.store_path is not None:
            from . import store
            return store.load_sketch(spark, self.store_path,
                                     self._store_name(ws))
        return serde.loads(self.finalized[ws])

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id:
            return
        spark = batch_df.sparkSession
        win = ((F.unix_timestamp(F.col(self.time_col)) / self.window_seconds)
               .cast("long") * self.window_seconds)
        keyed = batch_df.withColumn("_win", win.cast("string"))
        grouped = build_grouped_aggregator(keyed, "_win", self.values_col,
                                           self.factory)
        for r in grouped.collect():
            ws = int(r["key"])
            sk = serde.loads(bytes(r["sketch"]))
            if ws in self.finalized_ws:
                self._late_merge_store(spark, ws, sk, batch_id)
                continue
            if ws in self.finalized:
                # late slice for a finalized window: fold into the full
                # finalized sketch (a fresh live sketch here would later
                # evict and clobber it with only the late slice)
                self.finalized[ws] = (
                    serde.loads(self.finalized[ws]).merge(sk).to_bytes())
                continue
            cur = self.sketches.get(ws)
            self.sketches[ws] = sk if cur is None else cur.merge(sk)
        if self.sketches:
            horizon = max(self.sketches) - \
                self.retention_windows * self.window_seconds
            for ws in [w for w in self.sketches if w < horizon]:
                done = self.sketches.pop(ws)
                if self.store_path is not None:
                    self._spill_finalized(spark, ws, done, batch_id)
                else:
                    self.finalized[ws] = done.to_bytes()
        self.last_batch_id = batch_id
        self._save()

    def attach(self, stream_df: DataFrame, *, checkpoint_dir: str,
               trigger_once: bool = True):
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("update"))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def decayed_point_query(builder: "WindowedSketchBuilder", spark,
                        keys, *, half_life_s: float,
                        now_ws: int | None = None):
    """Exponentially time-decayed frequency estimates assembled from the
    per-window sketches (live + finalized):

        est(key) = sum_w 2^(-age_w / half_life_s) * pq_w(key)

    The decay horizon is chosen at QUERY time — unlike decay-at-ingest
    sketches, one windowed build answers every half-life, because the
    window sketches are an exactly-mergeable partition of time. The CM
    one-sided guarantee survives the weighting: each pq_w is an upper
    bound on the window's true count and the weights are positive, so
    the weighted sum upper-bounds the true decayed count, with total
    slack <= sum_w 2^(-age_w/hl) * eps * ||f_w||_1 (each window's
    overcount is bounded by eps times ITS OWN mass, so recent-window
    error dominates exactly like the signal).

    Driver cost: one vectorized probe per retained window — bounded by
    retention_windows + finalized count, never by key cardinality or
    stream length. Returns {key: decayed_estimate}.
    """
    import numpy as np

    ks = np.asarray(keys, dtype=np.int64)
    windows: dict[int, object] = dict(builder.sketches)
    for ws in list(getattr(builder, "finalized", {})):
        windows[ws] = serde.loads(builder.finalized[ws])
    for ws in getattr(builder, "finalized_ws", ()):  # store-spilled
        windows[ws] = builder.load_finalized(spark, ws)
    if not windows:
        return {int(k): 0.0 for k in ks}
    if now_ws is None:
        now_ws = max(windows)
    out = np.zeros(len(ks), dtype=np.float64)
    for ws, sk in windows.items():
        age = max(0, now_ws - ws)
        weight = 2.0 ** (-age / half_life_s)
        out += weight * np.asarray(sk.point_query_batch(ks),
                                   dtype=np.float64)
    return {int(k): float(v) for k, v in zip(ks, out)}


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


def stream_dedup(stream_df: DataFrame, text_col: str = "text", *,
                 watermark_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup by content fingerprint (md5 of ``text_col``) —
    the incremental counterpart of pipeline.dedup_exact: the first arrival
    of each distinct content wins, later copies are dropped across
    micro-batches via engine-managed dedup state.

    With ``watermark_col`` set the state is BOUNDED:
    dropDuplicatesWithinWatermark keeps a fingerprint only until the
    watermark passes it, so duplicates separated by more than the
    watermark interval can re-emit — the standard correctness/state
    trade at unbounded-stream scale. Without a watermark the state grows
    with distinct contents (exact semantics; suitable for bounded
    backfills)."""
    s = stream_df.withColumn("_fp", F.md5(F.col(text_col)))
    if watermark_col is not None:
        s = s.withWatermark(watermark_col, watermark)
        return s.dropDuplicatesWithinWatermark(["_fp"]).drop("_fp")
    return s.dropDuplicates(["_fp"]).drop("_fp")


def stateful_running_counts(stream_df: DataFrame, key_col: str):
    """Arbitrary stateful streaming op via applyInPandasWithState: running
    per-key event counts maintained as engine-managed state (update mode,
    no timeout). Emits (key, n_events) with the running total every time a
    key appears in a micro-batch. State is one long per key — bounded by
    key cardinality, partitioned by the groupBy hash, recoverable from the
    checkpoint like any Structured Streaming state store."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        n = sum(len(pdf) for pdf in pdf_iter)
        cur = (state.get[0] if state.exists else 0) + n
        state.update((cur,))
        yield pd.DataFrame({"key": [key[0]], "n_events": [cur]})

    return (stream_df
            .withColumn("key", F.col(key_col).cast("string"))
            .groupBy("key")
            .applyInPandasWithState(
                fn, "key string, n_events long", "n_events long",
                "update", GroupStateTimeout.NoTimeout))


def stateful_sketch_state(stream_df: DataFrame, key_col: str,
                          values_col: str, factory):
    """Per-key sketches as MANAGED STREAMING STATE: the serialized sketch
    blob lives in the state store (binary column), each micro-batch's
    values fold in via the vectorized batch update, and the running
    estimate surface (n_items, total) emits per key. Unlike the
    foreachBatch builders (driver-held state), state here is partitioned
    across executors and recovers from the checkpoint — the idiomatic
    scale path when key cardinality exceeds driver memory."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        sk = serde.loads(bytes(state.get[0])) if state.exists else factory()
        for pdf in pdf_iter:
            col = pdf[values_col]
            if len(col) and isinstance(col.iloc[0], (list, np.ndarray)):
                vals = np.concatenate([np.asarray(v) for v in col])
            else:
                vals = col.to_numpy()
            sk.update_batch(vals)
        state.update((sk.to_bytes(),))
        yield pd.DataFrame({"key": [key[0]],
                            "n_items": [sk.n_items],
                            "sketch": [sk.to_bytes()]})

    return (stream_df
            .withColumn("key", F.col(key_col).cast("string"))
            .groupBy("key")
            .applyInPandasWithState(
                fn, "key string, n_items long, sketch binary",
                "sketch binary", "update", GroupStateTimeout.NoTimeout))


def stateful_sessionize(stream_df: DataFrame, user_col: str, ts_col: str, *,
                        gap_minutes: int = 30, watermark: str = "1 hour"):
    """Streaming session windows via applyInPandasWithState with an
    EVENT-TIME timeout — the streaming counterpart of pipeline.sessionize.

    State per user is three longs (session_start_us, last_ts_us,
    n_events); a session CLOSES either when a later event from the same
    user exceeds the gap inside a batch, or when the watermark passes
    last_ts + gap (engine timeout) — so closed sessions emit exactly once
    (append mode) and state is bounded by ACTIVE users, not history.
    Batch folding is vectorized (sort + np.diff split), no per-event
    Python beyond per-session boundaries."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    cols = ["user", "session_start_us", "session_end_us", "n_events"]

    def fn(key, pdf_iter, state):
        out: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            out.append((key[0], start, last, n))
            state.remove()
        else:
            parts = []
            for pdf in pdf_iter:
                t = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
                parts.append(t.to_numpy())
            ts = np.sort(np.concatenate(parts))
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            segs = np.split(ts, np.flatnonzero(np.diff(ts) > gap_us) + 1)
            for seg in segs:
                s0, s1 = int(seg[0]), int(seg[-1])
                if last is None:
                    start, last, n = s0, s1, len(seg)
                elif s0 <= last + gap_us and s1 >= start - gap_us:
                    # overlaps/extends the open session (late segs allowed
                    # within the watermark) — the span only grows, never
                    # regresses last_ts/start
                    n += len(seg)
                    start = min(start, s0)
                    last = max(last, s1)
                elif s1 < start - gap_us:
                    # late seg ENTIRELY before the open session: an older
                    # session of its own whose gap already elapsed — emit
                    # it closed, leave the open session's state alone
                    out.append((key[0], s0, s1, len(seg)))
                else:
                    out.append((key[0], start, last, n))  # close open
                    start, last, n = s0, s1, len(seg)
            to_ms = last // 1000 + gap_minutes * 60_000
            if to_ms <= state.getCurrentWatermarkMs():
                # the whole group arrived later than watermark+gap (late
                # shard / out-of-order file): its session is already over
                # — close now instead of setting an in-the-past timeout
                out.append((key[0], start, last, n))
                if state.exists:
                    state.remove()
            else:
                state.update((int(start), int(last), int(n)))
                state.setTimeoutTimestamp(to_ms)
        yield pd.DataFrame(out, columns=cols)

    return (stream_df
            .withWatermark(ts_col, watermark)
            .withColumn("user", F.col(user_col).cast("string"))
            .groupBy("user")
            .applyInPandasWithState(
                fn,
                "user string, session_start_us long, session_end_us long, "
                "n_events long",
                "session_start_us long, last_ts_us long, n_events long",
                "append", GroupStateTimeout.EventTimeTimeout))


def stream_interval_join(left: DataFrame, right: DataFrame, key_col: str,
                         ts_col: str, *, lower_us: int, upper_us: int,
                         watermark: str = "1 hour",
                         l_prefix: str = "l_",
                         r_prefix: str = "r_") -> DataFrame:
    """Watermarked stream-stream INNER interval join: pairs (l, r) sharing
    ``key_col`` with ``r.ts - l.ts ∈ [lower_us, upper_us]`` — the streaming
    counterpart of ``joins.range_join`` (same output contract: ``(key,
    l_*<left cols>, r_*<right cols>)``).

    Scale shape: both inputs carry event-time watermarks and the join
    condition bounds each side's event time relative to the other, so the
    engine derives state-eviction watermarks per side — a left row is held
    only until ``watermark + upper_us`` passes it, a right row until
    ``watermark - lower_us`` does. Join state is therefore bounded by
    arrival rate × (watermark + interval), not by stream length; state is
    hash-partitioned by key across executors and checkpoint-recoverable
    like any Structured Streaming state store.

    Correctness trade (same as every watermarked op): rows later than
    ``watermark`` are dropped, so pairs involving them never emit. On a
    bounded replay with a watermark exceeding total skew (e.g. a backfill
    with ``availableNow``), the emitted pairs are EXACTLY the batch
    ``range_join`` result — asserted in tests and oracle-checked by the
    ``streaming_interval_join`` driver query.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us < lower_us")
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    # prefix EVERY non-key column (event time included — watermark metadata
    # follows the attribute through aliasing) so the join output is
    # unambiguous without qualified access
    lsel = lw.select(
        F.col(key_col),
        *[F.col(c).alias(f"{l_prefix}{c}") for c in left.columns
          if c != key_col])
    rsel = rw.select(
        F.col(key_col).alias("_rkey"),
        *[F.col(c).alias(f"{r_prefix}{c}") for c in right.columns
          if c != key_col])
    lts, rts = f"{l_prefix}{ts_col}", f"{r_prefix}{ts_col}"
    # time bounds as INTERVAL arithmetic on the raw event-time columns —
    # casting them (e.g. to long) would hide the event-time attributes from
    # the unsupported-operation checker and forfeit state eviction
    cond = (
        (F.col(key_col) == F.col("_rkey"))
        & F.expr(f"{rts} >= {lts} + INTERVAL {int(lower_us)} MICROSECOND")
        & F.expr(f"{rts} <= {lts} + INTERVAL {int(upper_us)} MICROSECOND"))
    return lsel.join(rsel, cond, "inner").drop("_rkey")


# -- catalog upkeep from a stream ----------------------------------------------

class CatalogStreamUpkeep:
    """Keep :class:`~sketchlib.catalog.SketchCatalog` entries fresh from a
    Structured Stream.

    Each micro-batch is appended to the catalog's table as an atomically
    committed parquet directory (``batch-<id>/`` — named deterministically
    by ``batch_id``, staged OUTSIDE the table and renamed in, so a
    concurrent reader sees the whole batch or none of it, and a
    foreachBatch replay after a crash finds the committed dir and skips
    the write). The registered entries then delta-fold exactly the new
    files through the store manifest (incremental.py): the same per-file
    idempotency that makes batch ``refresh()`` safe makes the replayed
    refresh a no-op, so the at-least-once contract of foreachBatch never
    double-counts a token.

    At scale this is the catalog's freshness loop: the stream sink writes
    data files, the sketch fold scans ONLY those files, every published
    epoch is drift-comparable via ``cat.drift`` / ``cat.drift_grouped``,
    and a batch reader of the table sees exactly the committed batches
    (batch dirs are subdirectories — read with ``recursiveFileLookup``;
    the manifest walk is recursive already). The reference's
    buffer-then-merge loop (cm.h:523-530) run forever.
    """

    def __init__(self, cat, table_path: str, columns, *,
                 grouped=()) -> None:
        """``columns``: registered global entries to keep fresh;
        ``grouped``: (group_col, column) pairs with grouped
        registrations. All must be registered up front — upkeep never
        invents a spec."""
        self.cat = cat
        self.table_path = os.path.abspath(table_path)
        if not os.path.isdir(self.table_path):
            raise ValueError(
                f"{table_path} must be a directory of parquet files "
                "(single-file tables cannot take streamed appends)")
        self.columns = list(columns)
        self.grouped = [tuple(g) for g in grouped]
        if not self.columns and not self.grouped:
            raise ValueError("nothing to keep fresh: columns and grouped "
                             "are both empty")
        for c in self.columns:
            cat._spec(self.table_path, c)
        for g, c in self.grouped:
            cat._gspec(self.table_path, g, c)
        #: last Answer per entry, keyed ("" | group_col, column)
        self.last: dict[tuple, object] = {}

    def _commit_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        final = os.path.join(self.table_path, f"batch-{batch_id:08d}")
        if os.path.isdir(final):
            return False  # replayed batch: data already committed
        # stage as a SIBLING of the table dir — the manifest's file walk is
        # recursive, so an in-table staging dir would expose half-written
        # parts to a concurrent refresh
        staging = (self.table_path.rstrip(os.sep)
                   + f".upkeep-staging-{batch_id:08d}")
        shutil.rmtree(staging, ignore_errors=True)
        batch_df.write.mode("overwrite").parquet(staging)
        os.rename(staging, final)
        return True

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._commit_batch(batch_df, batch_id)
        for c in self.columns:
            self.last[("", c)] = self.cat.refresh(self.table_path, c)
        for g, c in self.grouped:
            self.last[(g, c)] = self.cat.refresh_grouped(
                self.table_path, g, c)

    def attach(self, stream_df: DataFrame, *, checkpoint_dir: str,
               trigger_once: bool = True):
        """Wire the upkeep to a streaming DataFrame; returns the query."""
        writer = (stream_df.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .outputMode("update"))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
