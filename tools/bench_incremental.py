"""Incremental-maintenance cost experiment (BENCH/BASELINE.md evidence).

The steady-state claim of sketchlib.incremental is that keeping a
published sketch current costs O(delta), not O(table): the fold scans
only the appended files and merges into the stored sketch. This harness
measures, at several table sizes on the same host/session:

- ``rebuild_s``   — a from-scratch parquet-direct CM build of the whole
  table (what a naive pipeline pays every day);
- ``fold_s``      — incremental_build folding a 1% appended delta into
  the published sketch (what sketchlib pays);
- ``fixed_s``     — the fold's size-independent floor, estimated by
  folding a single-ROW delta (store round-trips + one task wave).

Expected shape: rebuild_s grows linearly with rows; fold_s stays flat at
fixed_s + (1% scan), so the fold:rebuild ratio falls as the table grows
— at 10^12 sequences the ratio is the delta fraction, because the fixed
floor (a few driver jobs) is amortized to nothing.

Usage: python tools/bench_incremental.py [cpus] [sizes_csv]
Prints one JSON line per table size plus a summary line.
"""

from __future__ import annotations

import functools
import json
import math
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cpus: int = 32, sizes_csv: str = "400000,800000,1600000") -> None:
    from pyspark.sql import SparkSession

    from sketchlib.countmin import CMConfig, CountMinSketch
    from sketchlib.datagen import generate_token_table
    from sketchlib.incremental import incremental_build
    from sketchlib.spark_build import build_sketch_parquet

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(max(8, cpus)))
             .config("spark.driver.memory", "16g")
             .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
    fac = functools.partial(CountMinSketch, cfg)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for rows in [int(s) for s in sizes_csv.split(",")]:
        # base table reused across runs; deltas live in a throwaway dir
        base = os.path.join(repo, "data", f"token_sequences_{rows}.parquet")
        generate_token_table(base, rows=rows, seed=1337, dist="zipf")
        root = tempfile.mkdtemp(prefix="sketchlib_incr_bench_")
        data, st = os.path.join(root, "data"), os.path.join(root, "store")
        os.makedirs(data)
        shutil.copy(base, os.path.join(data, "base.parquet"))
        try:
            # warm: page cache + python worker pool (same rationale as
            # bench.py token_table_warmup)
            build_sketch_parquet(spark, base, "tokens",
                                 CMConfig(eps=1.0, delta=0.5))
            t0 = time.perf_counter()
            full = build_sketch_parquet(spark, base, "tokens", cfg)
            rebuild_s = time.perf_counter() - t0

            # initial publish (untimed: same cost class as rebuild_s)
            incremental_build(spark, data, "tokens", fac,
                              store_path=st, name="cm")

            dsrc = os.path.join(root, "_d.parquet")
            generate_token_table(dsrc, rows=max(1, rows // 100), seed=9001)
            shutil.move(dsrc, os.path.join(data, "delta.parquet"))
            t0 = time.perf_counter()
            inc = incremental_build(spark, data, "tokens", fac,
                                    store_path=st, name="cm")
            fold_s = time.perf_counter() - t0

            generate_token_table(dsrc, rows=1, seed=9002)
            shutil.move(dsrc, os.path.join(data, "delta_1row.parquet"))
            t0 = time.perf_counter()
            incremental_build(spark, data, "tokens", fac,
                              store_path=st, name="cm")
            fixed_s = time.perf_counter() - t0

            line = {"rows": rows, "tokens": int(full.sketch.n_items),
                    "rebuild_s": round(rebuild_s, 3),
                    "fold_s": round(fold_s, 3),
                    "fold_delta_rows": int(inc.new_rows),
                    "fixed_s": round(fixed_s, 3),
                    "fold_vs_rebuild": round(fold_s / rebuild_s, 3)}
            results.append(line)
            print(json.dumps(line), flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        print(json.dumps({
            "summary": "incremental fold is flat while rebuild grows",
            "rebuild_growth": round(hi["rebuild_s"] / lo["rebuild_s"], 2),
            "fold_growth": round(hi["fold_s"] / lo["fold_s"], 2),
            "rows_growth": round(hi["rows"] / lo["rows"], 2),
            "cpus": cpus}))

    # the other two maintenance regimes at the largest size: grouped
    # (per-source fleet, only touched groups republished) and table
    # (ε-beyond-memory, counter-coordinate merge) — same 1% delta
    from sketchlib.incremental import (incremental_build_grouped,
                                       incremental_build_table)
    rows = int(sizes_csv.split(",")[-1])
    base = os.path.join(repo, "data", f"token_sequences_{rows}.parquet")
    for regime, fold in (
            ("grouped", lambda sp, d, s: incremental_build_grouped(
                sp, d, "source", "tokens", fac, store_path=s, name="g")),
            ("table", lambda sp, d, s: incremental_build_table(
                sp, d, "tokens", cfg, store_path=s, name="t"))):
        root = tempfile.mkdtemp(prefix="sketchlib_incr_bench_")
        data, st = os.path.join(root, "data"), os.path.join(root, "store")
        os.makedirs(data)
        shutil.copy(base, os.path.join(data, "base.parquet"))
        try:
            fold(spark, data, st)                      # initial (untimed)
            dsrc = os.path.join(root, "_d.parquet")
            generate_token_table(dsrc, rows=max(1, rows // 100), seed=9003)
            shutil.move(dsrc, os.path.join(data, "delta.parquet"))
            t0 = time.perf_counter()
            fold(spark, data, st)
            print(json.dumps({"regime": regime, "rows": rows,
                              "fold_s": round(time.perf_counter() - t0, 3)}))
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         sys.argv[2] if len(sys.argv) > 2 else "400000,800000,1600000")
