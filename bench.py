"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE
JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

The headline suite covers both sides of the engine:
- the DuckDB-checkable relational/pipeline queries from __spark_entry__
- the sketch workload proper: a distributed Count-Min build over a
  deterministic synthetic token table (FIXTURES.md §1 shape — the
  BASELINE.json input hint), grouped per-source builds, and batch point
  queries. The token table is generated once into data/ and reused.

Throughput (tokens/sec of the CM build) is reported alongside wall time;
scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

# before any numpy import — see sketchlib/__init__.py (THP-defrag stalls)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# 400k rows -> 32 row groups: one task per core at local[32] (the 200k
# table's 16 row groups left half the cores idle during cm_build)
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "400000"))

# incremental-maintenance bench state: the initial publish (a full scan,
# same cost as cm_build) happens ONCE per process; each suite run then
# appends a fresh 1% delta file and times only the delta fold — at 10^12
# sequences that fold IS the steady-state build cost.
_INCR: dict = {}


def get_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sketchlib-bench")
        .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # token row groups are ~6 MB zstd; small splits keep all cores busy
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # large-allocation reuse in Python workers (page-fault churn kills
        # multi-worker scaling; see sketchlib/hashing.py)
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "536870912")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "536870912")
        .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def token_table_path() -> str:
    from sketchlib.datagen import generate_token_table
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", f"token_sequences_{BENCH_ROWS}.parquet")
    generate_token_table(path, rows=BENCH_ROWS, seed=1337, dist="zipf")
    return path


def _cpu_jiffies():
    """(total, steal, busy, iowait) jiffies from /proc/stat — the suite
    runs on a shared VM whose throughput drifts 2-4x with co-tenant load
    (see BENCH/BASELINE.md), so every bench line carries its own
    weather."""
    try:
        vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
        return (sum(vals), (vals[7] if len(vals) > 7 else 0), busy,
                vals[4])
    except Exception:
        return 0, 0, 0, 0


_WHOLE_DISK = re.compile(r"(sd[a-z]+|vd[a-z]+|xvd[a-z]+|nvme\d+n\d+|"
                         r"mmcblk\d+)")


def _disk_io():
    """(sectors_read, io_ticks_ms) summed over whole physical block
    devices from /proc/diskstats (VERDICT r4 #8): at sf10 the 12 GB
    token table no longer fits the page cache, so run totals spread
    341-454 s with IO weather that steal%% cannot see. The sectors-read
    delta separates cold-cache runs (GBs re-read from disk) from warm
    ones (~0 MB) the same way steal separates CPU weather — see
    BENCH/BASELINE.md for the interpretation rule."""
    try:
        rd = ms = 0
        for line in open("/proc/diskstats"):
            f = line.split()
            if len(f) > 12 and _WHOLE_DISK.fullmatch(f[2]):
                rd += int(f[5])
                ms += int(f[12])
        return rd, ms
    except Exception:
        return 0, 0


_KERNEL_CHILD = r"""
import os, sys, time, math
sys.path.insert(0, {repo!r})
import numpy as np
from sketchlib.countmin import CMConfig, CountMinSketch
cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
toks = np.random.default_rng(7).integers(
    0, 2**31, size=2_000_000, dtype=np.int64).astype(np.int32)
cm = CountMinSketch(cfg)
cm.update_batch(toks, preaggregate=False)
t0 = time.perf_counter()
for _ in range(3):
    cm.update_batch(toks, preaggregate=False)
print(6e6 / (time.perf_counter() - t0))
"""


def _kernel_mtoks(n_procs: int) -> float:
    """Closed-loop CM-update throughput (M tokens/s) of n_procs plain
    processes — no Spark, no IO, byte-identical code every session. The
    third weather axis: co-tenant contention on this shared VM slows
    cycles WITHOUT appearing as steal (the vCPU is running, just
    slowly) or as disk reads; suite walls drift 2-4x while both proxies
    read zero. This calibration constant makes that visible — compare a
    run's host_kernel_mtoks against the calm-host reference in
    BENCH/BASELINE.md (~480-680 M/s at 32 procs; the constant itself
    spreads ~25% with host frequency/boost weather, so treat it as a
    same-direction proxy, not a divisor with three digits) before
    reading its wall times as code. ~2 s per sample."""
    import subprocess
    try:
        code = _KERNEL_CHILD.format(
            repo=os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, NUMPY_MADVISE_HUGEPAGE="0")
        ps = [subprocess.Popen([sys.executable, "-c", code],
                               stdout=subprocess.PIPE, env=env)
              for _ in range(n_procs)]
        return round(sum(float(p.communicate()[0]) for p in ps) / 1e6, 1)
    except Exception:
        return 0.0


def run_suite(spark, sf_dir: str, cpus: int) -> tuple[dict, dict]:
    """One pass over the headline suite; returns (timings, extra)."""
    import __spark_entry__ as entry_mod
    from sketchlib.countmin import CMConfig
    from sketchlib.spark_build import (build_grouped_parquet,
                                       build_sketch_parquet,
                                       inner_product_rawlog_parquet,
                                       point_query_col)

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    # -- relational / pipeline headline queries (driver-oracle suite) -------
    qs = entry_mod.queries()
    for name in ("word_freq_exact", "exact_dedup", "doc_quality",
                 "topk_users", "order_priority_join", "lineitem_pricing",
                 "minhash_dedup_pairs", "simhash_dedup_pairs",
                 "language_id", "ann_cosine_topk"):
        timed(name, lambda n=name: qs[n](spark, sf_dir).collect())

    # -- sketch workload on the synthetic token table ------------------------
    tok_path = token_table_path()
    toks = spark.read.parquet(tok_path)
    cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
    # warm page cache + spawn/reuse the Python worker pool so cm_build
    # measures steady-state throughput, not one-time worker forks; one
    # trivial applyInPandas job also warms the grouped merge worker path
    def _warmup():
        toks.count()
        build_sketch_parquet(spark, tok_path, "tokens",
                             CMConfig(eps=1.0, delta=0.5))
        (spark.range(256).withColumn("g", F.pmod("id", F.lit(32)))
         .groupBy("g")
         .applyInPandas(lambda pdf: pdf.head(1), schema="id long, g bigint")
         .count())

    from pyspark.sql import functions as F
    timed("token_table_warmup", _warmup)
    res = timed("cm_build",
                lambda: build_sketch_parquet(spark, tok_path, "tokens", cfg))
    extra["cm_build_tokens_per_sec"] = round(res.sketch.n_items / timings["cm_build"], 1)
    extra["cm_build_total_tokens"] = res.sketch.n_items

    # Count-Sketch build on the same table through the generic
    # parquet-direct path (same slice protocol; signed table, unbiased
    # estimates) — tracks how close the signed sketch stays to the CM
    # fast path (measured within ~1.3x at 2.08 B tokens)
    import functools
    from sketchlib.countsketch import CSConfig, CountSketch
    from sketchlib.spark_build import build_aggregator_parquet
    cs = timed("cs_build",
               lambda: build_aggregator_parquet(
                   spark, tok_path, "tokens",
                   functools.partial(CountSketch,
                                     CSConfig(width=cfg.width,
                                              depth=cfg.depth, seed=1337))))
    extra["cs_build_tokens_per_sec"] = round(
        cs.sketch.n_items / timings["cs_build"], 1)

    # one-SCAN corpus profile: CM + HLL + MG + Bloom built together from
    # a single parquet-direct pass (sketchlib.multi.MultiSketch) — at
    # 100 TB this replaces four full-corpus scans with one; compare its
    # wall to cm_build to read the marginal cost of the three extra
    # summaries on the same scan
    from sketchlib.bloom import BloomFilter
    from sketchlib.countmin import CountMinSketch
    from sketchlib.hll import HllSketch
    from sketchlib.mg import MisraGries
    from sketchlib.multi import MultiSketch
    prof = timed("corpus_profile",
                 lambda: build_aggregator_parquet(
                     spark, tok_path, "tokens",
                     functools.partial(MultiSketch, (
                         functools.partial(CountMinSketch, cfg),
                         functools.partial(HllSketch, 14),
                         functools.partial(MisraGries, 1024),
                         functools.partial(BloomFilter, capacity=2_000_000,
                                           fpr=0.01, seed=1337)))))
    extra["profile_tokens_per_sec"] = round(
        prof.sketch.n_items / timings["corpus_profile"], 1)
    extra["profile_distinct_est"] = round(
        prof.sketch.parts[1].estimate(), 1)

    # packed token-BIGRAM CM build on the same parquet-direct path:
    # within-row adjacent pairs straight from the Arrow list buffers
    # (ngrams.array_bigrams) — the phrase-frequency workload, no explode
    from sketchlib.ngrams import array_bigrams
    big = timed("bigram_build",
                lambda: build_aggregator_parquet(
                    spark, tok_path, "tokens",
                    functools.partial(CountMinSketch, cfg),
                    extract_array=array_bigrams))
    extra["bigram_pairs_per_sec"] = round(
        big.sketch.n_items / timings["bigram_build"], 1)

    # grouped build through the parquet-direct columnar source — the arrow
    # DataFrame path bounces every token through a JVM row (~0.5 GB/s
    # ceiling; 72.8 s vs 6.2 s for the global build in round 1)
    timed("cm_grouped_build",
          lambda: build_grouped_parquet(spark, tok_path, "source",
                                        "tokens", cfg).collect())

    # zero-IO generated build: tasks regenerate their chunks in-process
    # (no storage, no page cache) — the engine-native source path; byte-
    # identity to the parquet build is test-pinned at equal params. Task
    # granularity is one 100k-row chunk, so use >= cpus chunks (one full
    # wave) — BENCH_ROWS/100k would leave most cores idle.
    from sketchlib.spark_build import build_sketch_generated
    gen_rows = max(BENCH_ROWS, cpus * 100_000)
    gen = timed("cm_build_generated",
                lambda: build_sketch_generated(spark, gen_rows, cfg))
    extra["cm_generated_tokens_per_sec"] = round(
        gen.sketch.n_items / timings["cm_build_generated"], 1)
    extra["cm_generated_total_tokens"] = gen.sketch.n_items

    # steady-state incremental maintenance (sketchlib.incremental): keep
    # the published CM current by scanning ONLY the appended files. The
    # wall here is one delta fold (1% of the table) + store load/merge/
    # save; compare with cm_build — the full-rebuild alternative — and
    # note the fixed per-job latency dominates at bench scale, while at
    # cluster scale the fold cost tracks the delta fraction.
    import shutil
    import tempfile
    from sketchlib.incremental import incremental_build
    from sketchlib.datagen import generate_token_table
    cm_fac = functools.partial(CountMinSketch, cfg)
    if not _INCR:
        root = tempfile.mkdtemp(prefix="sketchlib_bench_incr_")
        data, st = os.path.join(root, "data"), os.path.join(root, "store")
        os.makedirs(data)
        shutil.copy(tok_path, os.path.join(data, "base.parquet"))
        incremental_build(spark, data, "tokens", cm_fac,
                          store_path=st, name="cm")
        _INCR.update(root=root, data=data, store=st, n=0)
    _INCR["n"] += 1
    delta_rows = max(1000, BENCH_ROWS // 100)
    dsrc = os.path.join(_INCR["root"], f"_delta{_INCR['n']}.parquet")
    generate_token_table(dsrc, rows=delta_rows, seed=9000 + _INCR["n"])
    shutil.move(dsrc, os.path.join(_INCR["data"],
                                   f"delta_{_INCR['n']}.parquet"))
    inc = timed("incremental_append",
                lambda: incremental_build(spark, _INCR["data"], "tokens",
                                          cm_fac, store_path=_INCR["store"],
                                          name="cm"))
    extra["incremental_delta_rows"] = inc.new_rows
    extra["incremental_vs_rebuild"] = round(
        timings["incremental_append"] / timings["cm_build"], 3)

    # sketch × raw-log inner product: one columnar pass over the table,
    # probing the built sketch (reference cm.h:723-785 semantics)
    timed("cm_inner_product_rawlog",
          lambda: inner_product_rawlog_parquet(spark, res.sketch, tok_path,
                                               "tokens"))

    probe_keys = toks.select(F.explode("tokens").alias("t")).limit(100_000)
    timed("cm_point_queries_100k",
          lambda: probe_keys.withColumn(
              "est", point_query_col(spark, res.sketch, F.col("t"))).collect())

    # priority-sample pairs build over the token table (doc_id weighted by
    # n_tok): the weighted-item aggregator path, keys consumed from Arrow
    # string buffers, one KB blob per task
    from sketchlib.psample import PrioritySample
    from sketchlib.spark_build import build_aggregator_pairs
    ps = timed("psample_build",
               lambda: build_aggregator_pairs(
                   toks, "doc_id", "n_tok",
                   functools.partial(PrioritySample, 256, 1337),
                   payload_col="source"))
    extra["psample_rows_per_sec"] = round(
        ps.sketch.n_items / timings["psample_build"], 1)

    # Bloom runtime-filter semi-join: dim keys -> mergeable Bloom ->
    # broadcast probe prunes the fact scan pre-shuffle (joins.py)
    from sketchlib.joins import bloom_semijoin
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
           .select(F.col("o_orderkey").alias("l_orderkey")))
    timed("bloom_semijoin",
          lambda: bloom_semijoin(spark, lineitem, dim, "l_orderkey",
                                 fpr=0.01).join(dim, "l_orderkey")
          .agg(F.count("*")).collect())

    return timings, extra


def main() -> None:
    """Median-of-n suite (VERDICT r2 #8): this host is a shared VM whose
    throughput drifts 2-4x with co-tenant load, so a single wall number
    invites misreading. The suite runs n>=3 times in one Spark session;
    the reported value/queries are the MEDIAN-total run's, and every run's
    total + its own steal/busy weather is published under "runs"."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    runs = []
    for i in range(n_runs):
        j0, d0, t0 = _cpu_jiffies(), _disk_io(), time.perf_counter()
        timings, extra = run_suite(spark, sf_dir, cpus)
        wall, d1, j1 = time.perf_counter() - t0, _disk_io(), _cpu_jiffies()
        if j1[0] > j0[0]:
            extra["host_steal_pct"] = round(100.0 * (j1[1] - j0[1])
                                            / (j1[0] - j0[0]), 2)
            extra["host_busy_pct"] = round(100.0 * (j1[2] - j0[2])
                                           / (j1[0] - j0[0]), 2)
            extra["host_iowait_pct"] = round(100.0 * (j1[3] - j0[3])
                                             / (j1[0] - j0[0]), 2)
        extra["disk_read_mb"] = round((d1[0] - d0[0]) * 512 / 1e6, 1)
        extra["disk_io_pct"] = round(100.0 * (d1[1] - d0[1])
                                     / (wall * 1000.0), 2)
        extra["host_kernel_mtoks"] = _kernel_mtoks(cpus)
        runs.append({"total": round(sum(timings.values()), 4),
                     "timings": timings, "extra": extra})

    med = sorted(runs, key=lambda r: r["total"])[len(runs) // 2]
    # per-QUERY medians across runs, not the median-total run's timings:
    # run 1 pays the cold page-cache scan of whichever query reads a
    # table first (word_freq_exact), so when run 1 lands as the median
    # by total, that one query carries the whole suite's cold-IO and
    # fakes a super-linear scale exponent (observed at sf1: 4.3 s cold
    # vs 0.6 s warm for the same query). Each query's median across the
    # same runs is steal-annotated by the same "runs" table and robust
    # to which run the cold IO landed in.
    queries = {q: sorted(r["timings"][q] for r in runs)[n_runs // 2]
               for q in runs[0]["timings"]}
    print(json.dumps({
        "metric": "sketchlib headline suite wall time (median of "
                  f"{n_runs})",
        "value": med["total"],
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_runs": n_runs,
        "runs": [{"total": r["total"],
                  "host_steal_pct": r["extra"].get("host_steal_pct"),
                  "host_busy_pct": r["extra"].get("host_busy_pct"),
                  "host_iowait_pct": r["extra"].get("host_iowait_pct"),
                  "disk_read_mb": r["extra"].get("disk_read_mb"),
                  "disk_io_pct": r["extra"].get("disk_io_pct"),
                  "host_kernel_mtoks": r["extra"].get(
                      "host_kernel_mtoks")}
                 for r in runs],
        **med["extra"],
    }))


if __name__ == "__main__":
    main()
