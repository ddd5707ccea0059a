"""Zero-IO scaling evidence: the generated Count-Min build at two
parallelism levels (north-rule two-cluster-size proxy, compute-only).

Unlike tools/bench_scaling.py (parquet ingest), every byte here is
regenerated in-task from ``(seed, chunk_idx)`` — no storage, no page
cache, no decode: the measurement isolates generation + sketch-fold
compute. Three layers, each 8 vs 32 procs (or local[8] vs local[32]):

- ``gen``: chunk_tokens into a persistent buffer (pure generation),
- ``genfold``: generation + update_batch(preaggregate=False),
- Spark E2E: build_sketch_generated paired fresh-JVM rounds.

Usage: python tools/bench_generated.py [rows] [spark_rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LOOP = r"""
import os, sys, time, json
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, {repo!r})
import math
import numpy as np
from sketchlib.datagen import chunk_tokens, CHUNK_ROWS
from sketchlib.countmin import CMConfig, CountMinSketch

proc_id = {proc_id}; nchunks = {nchunks}; mode = {mode!r}
cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
cm = CountMinSketch(cfg)
buf = np.empty(CHUNK_ROWS * 512, dtype=np.int32)
tot = 0
t0 = time.perf_counter()
for k in range(nchunks):
    idx = proc_id * nchunks + k
    _, toks, _ = chunk_tokens(1337, idx, CHUNK_ROWS, "zipf", out=buf)
    tot += toks.shape[0]
    if mode == "genfold":
        cm.update_batch(toks, preaggregate=False)
print(json.dumps({{"tokens": tot, "wall": time.perf_counter() - t0}}))
"""

SPARK_CHILD = r"""
import json, math, os, sys, time
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from sketchlib.countmin import CMConfig
from sketchlib.spark_build import build_sketch_generated

def cpu_jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    return sum(vals), (vals[7] if len(vals) > 7 else 0), busy

cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
    .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
build = lambda: build_sketch_generated(spark, {rows}, cfg)
build()  # warmup: worker pool + JIT
t0_j, s0, b0 = cpu_jiffies()
t0 = time.perf_counter()
res = build()
dt = time.perf_counter() - t0
t1_j, s1, b1 = cpu_jiffies()
steal_pct = 100.0 * (s1 - s0) / max(1, t1_j - t0_j)
busy_cpu_s = (b1 - b0) / 100.0
print(json.dumps({{"cpus": cpus, "best": dt, "tokens": res.sketch.n_items,
                   "steal_pct": round(steal_pct, 2),
                   "busy_cpu_s": round(busy_cpu_s, 2),
                   "tok_per_cpu_s": round(res.sketch.n_items / max(0.01, busy_cpu_s), 1),
                   "sketch_sha": __import__("hashlib").sha256(res.sketch.to_bytes()).hexdigest()[:16]}}))
spark.stop()
"""


def closed_loop(nproc: int, nchunks: int, mode: str) -> tuple[float, float]:
    """Aggregate tokens/s of nproc plain processes, wall seconds."""
    t0 = time.perf_counter()
    ps = [subprocess.Popen(
        [sys.executable, "-c",
         LOOP.format(repo=REPO, proc_id=i, nchunks=nchunks, mode=mode)],
        stdout=subprocess.PIPE) for i in range(nproc)]
    outs = [json.loads(p.communicate()[0]) for p in ps]
    wall = time.perf_counter() - t0
    return sum(o["tokens"] for o in outs) / wall, wall


def spark_level(cpus: int, rows: int) -> dict:
    code = SPARK_CHILD.format(repo=REPO, cpus=cpus, rows=rows)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"child local[{cpus}] failed")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main(rows: int = 8_000_000, spark_rounds: int = 3) -> None:
    # closed loops: 64 chunks of work split as 8x8 vs 32x2 (same input)
    for mode in ("gen", "genfold"):
        lo, _ = closed_loop(8, 8, mode)
        time.sleep(2)
        hi, _ = closed_loop(32, 2, mode)
        time.sleep(2)
        print(f"closed-loop {mode}: 8p {lo/1e6:.0f} M/s, 32p {hi/1e6:.0f} "
              f"M/s, eff {hi/(4*lo):.3f}", flush=True)

    pairs = []
    for rnd in range(spark_rounds):
        a = spark_level(8, rows)
        b = spark_level(32, rows)
        assert a["sketch_sha"] == b["sketch_sha"], "sketch bytes differ"
        eff = a["best"] / (4.0 * b["best"])
        eff_cpu = b["tok_per_cpu_s"] / max(1.0, a["tok_per_cpu_s"])
        pairs.append({"round": rnd, "low": a, "high": b,
                      "eff": round(eff, 3), "eff_cpu": round(eff_cpu, 3)})
        print(f"spark pair 8->32 round {rnd}: {a['best']:.1f}s vs "
              f"{b['best']:.1f}s eff={eff:.3f} eff_cpu={eff_cpu:.3f} "
              f"steal=({a['steal_pct']}, {b['steal_pct']})% "
              f"[{a['tokens']/b['best']/1e6:.0f} M tok/s at 32]", flush=True)
    print(json.dumps(pairs))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
