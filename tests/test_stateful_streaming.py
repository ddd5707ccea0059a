"""applyInPandasWithState operators: engine-managed per-key state
(running counts; sketch blobs as state) must equal the batch answer after
the stream drains."""

import math
import os

import numpy as np
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


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """Closed streaming sessions must equal batch sessionization for every
    user whose last session the advancing watermark has closed."""
    import datetime as dt

    from sketchlib.pipeline import session_stats
    from sketchlib.streaming import stateful_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(uid, minutes):
        return (uid, t0 + dt.timedelta(minutes=minutes))

    # user 1: two sessions (gap 90m > 30m); user 2: one session
    batch0 = [ev(1, 0), ev(1, 10), ev(2, 5)]
    batch1 = [ev(1, 20), ev(1, 110), ev(2, 15)]
    # sentinels march the watermark (1h) far past everyone's last+gap:
    # one batch to raise the watermark, one more so timeouts fire
    batch2 = [ev(99, 3000)]
    batch3 = [ev(98, 4000)]
    inbox = str(tmp_path / "sess_inbox")
    os.makedirs(inbox)
    import pyarrow as pa
    import pyarrow.parquet as pq
    # flat files (the file-stream source does not recurse into Spark's
    # per-write directories) with ascending mtimes so the source's
    # mtime-ordered listing processes them in the intended order
    for i, rows in enumerate((batch0, batch1, batch2, batch3)):
        p = f"{inbox}/b{i}.parquet"
        pq.write_table(
            pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                      "ts": pa.array([r[1] for r in rows],
                                     pa.timestamp("us"))}), p)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(inbox))
    q = (stateful_sessionize(stream, "user_id", "ts", gap_minutes=30)
         .writeStream.format("memory").queryName("sessions")
         .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)

    got = {(r["user"], r["session_start_us"], r["session_end_us"],
            r["n_events"])
           for r in spark.table("sessions").collect()}
    us = lambda m: int((t0 + dt.timedelta(minutes=m)).timestamp() * 1e6)  # noqa: E731
    expected = {
        ("1", us(0), us(20), 3),     # closed in-batch by the 110m event
        ("1", us(110), us(110), 1),  # closed by watermark timeout
        ("2", us(5), us(15), 2),     # closed by watermark timeout
    }
    assert expected <= got, got
    # no session for the sentinel users should be double-counted as users
    # 1/2 sessions; batch comparison: session counts match pipeline.sessionize
    all_ev = spark.read.parquet(inbox).filter(F.col("user_id") < 90)
    bstats = {r["user_id"]: r["n_sessions"]
              for r in session_stats(all_ev, "user_id", "ts",
                                     gap_minutes=30).collect()}
    from collections import Counter
    stream_counts = Counter(u for (u, *_rest) in got if u in ("1", "2"))
    assert stream_counts == {str(k): v for k, v in bstats.items()}, (
        stream_counts, bstats)


def test_stateful_sessionize_late_events_do_not_regress(spark, tmp_path):
    """A late in-watermark event merging into the open session must not
    regress last_ts (the r2 bug closed sessions at a too-early end)."""
    import datetime as dt
    import pyarrow as pa
    import pyarrow.parquet as pq
    from sketchlib.streaming import stateful_sessionize

    t0 = dt.datetime(2024, 1, 1)
    us = lambda m: int((t0 + dt.timedelta(minutes=m)).timestamp() * 1e6)  # noqa: E731
    ev = lambda u, m: (u, t0 + dt.timedelta(minutes=m))  # noqa: E731
    # batch0: events at 10,20; batch1: LATE event at 15 (within watermark)
    # plus 40 (continues: 40-20=20m <= 30m); batch2/3: watermark sentinels
    batches = [[ev(1, 10), ev(1, 20)], [ev(1, 15), ev(1, 40)],
               [ev(99, 3000)], [ev(98, 4000)]]
    inbox = str(tmp_path / "late_inbox")
    os.makedirs(inbox)
    for i, rows in enumerate(batches):
        p = f"{inbox}/b{i}.parquet"
        pq.write_table(
            pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                      "ts": pa.array([r[1] for r in rows],
                                     pa.timestamp("us"))}), p)
        os.utime(p, (1_700_000_000 + i * 60,) * 2)
    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(inbox))
    q = (stateful_sessionize(stream, "user_id", "ts", gap_minutes=30)
         .writeStream.format("memory").queryName("late_sessions")
         .option("checkpointLocation", str(tmp_path / "ckpt_late"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {(r["user"], r["session_start_us"], r["session_end_us"],
            r["n_events"])
           for r in spark.table("late_sessions").collect()
           if r["user"] == "1"}
    # ONE session 10..40 with 4 events — not split at the late 15
    assert got == {("1", us(10), us(40), 4)}, got


def _vmrss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError("no VmRSS")


def test_windowed_store_spill_long_stream_soak(spark, tmp_path):
    """Long-stream soak for the store-spilled windowed builder (VERDICT
    r3 #7): 200 micro-batches over ~100 event-time windows with late
    data every batch (within-retention lateness) and periodic deep-late
    slices targeting windows already spilled to the durable store.
    Asserts, across the whole run: (a) driver-held state stays bounded
    by retention_windows — finalized blobs never accumulate in driver
    dicts and the live set never exceeds the retention span — with
    driver RSS flat between the warm point and the end; (b) a simulated
    driver restart MID-STREAM (fresh builder from the same snapshot dir)
    reloads byte-identical live state + finalized-window set and skips a
    replayed batch; (c) after the stream drains, live windows and
    store-spilled windows (including every deep-late-folded one) are
    byte-identical to local single-pass builds over exactly that
    window's events."""
    import datetime

    from sketchlib.streaming import WindowedSketchBuilder

    cfg = CMConfig(eps=0.01, delta=0.05, seed=7)

    def factory():
        return CountMinSketch(cfg)

    snap = str(tmp_path / "soak_snap")
    spath = str(tmp_path / "soak_store")
    wsec = 60
    epoch = datetime.datetime(2024, 1, 1)   # unix ts divisible by 60
    epoch_s = int(epoch.replace(tzinfo=datetime.timezone.utc).timestamp())

    def ts(win_idx, offset_s=30):
        return epoch + datetime.timedelta(seconds=win_idx * wsec + offset_s)

    rng = np.random.default_rng(4242)
    truth: dict[int, list] = {}          # window_start -> [token arrays]
    deep_late_windows: set[int] = set()

    def make_batch(i):
        """12 on-time rows at window i//2, 4 rows late by 2 windows
        (still live under retention 4); every 8th batch adds 4 rows late
        by 12 windows — far behind the horizon, i.e. already spilled."""
        wi = i // 2
        rows = []
        for win, n in ((wi, 12), (max(0, wi - 2), 4)):
            for _ in range(n):
                toks = rng.integers(0, 5000, 24).tolist()
                truth.setdefault(epoch_s + win * wsec, []).append(toks)
                rows.append((ts(win), toks))
        if i % 8 == 0 and wi >= 12:
            win = wi - 12
            deep_late_windows.add(epoch_s + win * wsec)
            for _ in range(4):
                toks = rng.integers(0, 5000, 24).tolist()
                truth.setdefault(epoch_s + win * wsec, []).append(toks)
                rows.append((ts(win), toks))
        return spark.createDataFrame(rows, "ts timestamp, tokens array<long>")

    n_batches = 200
    b = WindowedSketchBuilder(factory, "ts", "tokens", snap,
                              window_seconds=wsec, retention_windows=4,
                              store_path=spath)
    rss_warm = None
    max_live = 0
    for i in range(n_batches):
        if i == n_batches // 2:
            # crash + restart mid-stream: a fresh builder from the same
            # snapshot dir must reload byte-identical live state and the
            # same finalized-window set...
            b2 = WindowedSketchBuilder(factory, "ts", "tokens", snap,
                                       window_seconds=wsec,
                                       retention_windows=4,
                                       store_path=spath)
            assert b2.last_batch_id == b.last_batch_id
            assert b2.finalized_ws == b.finalized_ws
            assert b2.finalized == {} and b.finalized == {}
            assert ({w: s.to_bytes() for w, s in b2.sketches.items()}
                    == {w: s.to_bytes() for w, s in b.sketches.items()})
            # ...and a replayed already-committed batch is a no-op
            snap_bytes = {w: s.to_bytes() for w, s in b2.sketches.items()}
            b2.process_batch(make_batch_replay, b2.last_batch_id)
            assert ({w: s.to_bytes() for w, s in b2.sketches.items()}
                    == snap_bytes)
            b = b2
        df = make_batch(i)
        if i == n_batches // 2 - 1:
            make_batch_replay = df       # kept for the restart replay
        b.process_batch(df, i)
        # driver state bounded by retention at every step, never by
        # stream length: live set <= retention span + head window, and
        # finalized blobs are store-resident, not driver-resident
        assert len(b.sketches) <= 5
        assert b.finalized == {}
        max_live = max(max_live, len(b.sketches))
        if i == 60:
            rss_warm = _vmrss_mb()
    rss_end = _vmrss_mb()
    assert rss_warm is not None
    # flat driver RSS: ~140 post-warm batches (with ~70 window spills
    # and ~17 deep-late store folds) must not grow the driver footprint
    # beyond jitter. 256 MB is far above py4j/gc noise on this box and
    # far below what leaking per-window state would cost at this rate.
    assert rss_end - rss_warm < 256, (rss_warm, rss_end)
    assert max_live >= 4                 # retention span actually exercised

    n_windows = n_batches // 2
    assert len(b.finalized_ws) == n_windows - len(b.sketches)
    assert len(deep_late_windows) >= 15
    assert deep_late_windows <= b.finalized_ws

    def expect_bytes(ws):
        sk = factory()
        for toks in truth[ws]:
            sk.update_batch(np.asarray(toks, dtype=np.int64))
        return sk.to_bytes()

    # every live window byte-identical to a local single-pass build
    for ws, sk in b.sketches.items():
        assert sk.to_bytes() == expect_bytes(ws), ws
    # spilled windows: all deep-late-folded ones (late fold correctness)
    # plus a stride of the rest — byte-identical from the store
    check = sorted(deep_late_windows) + sorted(b.finalized_ws)[::9]
    for ws in sorted(set(check)):
        assert b.load_finalized(spark, ws).to_bytes() == expect_bytes(ws), ws
