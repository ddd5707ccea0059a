"""Distributed reproduction of the reference's flagship experiment
(error_bench.cpp:22-73): build a Count-Min sketch over a deterministic
key stream, probe q keys, and print the 20-bucket histogram of
abs(estimate - exact) plus the within-bound fraction.

The reference runs `./error_bench n u q` single-threaded with an
in-memory std::map oracle; here the build is the distributed
parquet-direct path and the oracle is an exact distributed groupBy —
same seed discipline (1337), same epsilon/delta shape
(eps = e/(10*u_distinct_scale), delta = e^-3 -> d = 3).

Usage: python tools/error_hist.py [rows] [q] [cm|cs]
Prints one JSON line:
  {"hist": [...20 buckets...], "within_bound_frac": f, "eps_l1": int,
   "delta": f, "n_tokens": N, "sidedness_violations": 0}

The ``cs`` mode runs the same experiment against the Count-Sketch
(countsketch.py): the histogram is of SIGNED error (collisions cancel
under random signs), the bound is eps*||f||_2 with eps = sqrt(3/w), and
instead of sidedness the output evidences unbiasedness — mean signed
error as a fraction of the bound, and error mass on both sides.
"""

from __future__ import annotations

import json
import math
import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(rows: int = 100_000, q: int = 100_000, sketch: str = "cm") -> None:
    import functools

    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    from sketchlib.countmin import CMConfig
    from sketchlib.countsketch import CSConfig, CountSketch
    from sketchlib.datagen import generate_token_table
    from sketchlib.spark_build import build_aggregator, build_sketch_parquet

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             # eps = e/(10*rows) means ~24 MB dense partials (w = 10*rows
             # at rows=1e5); 8 concurrent tasks of those through Arrow
             # OOM the default 1g local JVM heap
             .config("spark.driver.memory", "6g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(REPO, "data", f"token_sequences_{rows}.parquet")
    generate_token_table(path, rows=rows, seed=1337, dist="zipf")

    # eps = e/(10*rows), the error_bench parameter shape (the reference
    # keys eps off its stream-length argument n, which maps to rows here)
    toks = spark.read.parquet(path)
    if sketch == "cs":
        # width matched to the CM memory shape at the same rows argument
        # is pointless (CS errs in ||f||_2 units); eps = 0.3% of the l2
        # norm puts the bound at ~3x the per-row collision std (so the
        # within-bound fraction is a real measurement, not slack) with
        # the reference's d = 3 confidence rows
        cs_cfg = CSConfig.from_eps(0.003, math.exp(-3), seed=1337)
        res = build_aggregator(toks, "tokens",
                               functools.partial(CountSketch, cs_cfg))
        sk = res.sketch
        cfg = None
    else:
        cfg = CMConfig(eps=math.e / (10 * rows), delta=math.exp(-3),
                       seed=1337)
        res = build_sketch_parquet(spark, path, "tokens", cfg)
        sk = res.sketch
    n_tokens = sk.n_items     # the build already counted every token

    exact = (toks.select(F.explode("tokens").alias("t"))
             .groupBy("t").agg(F.count("*").alias("cnt")))
    # probe q keys drawn across the whole frequency range: half the
    # hottest + half a seeded uniform sample of distinct keys (probing
    # only the head would measure a systematically easier population)
    hot = exact.orderBy(F.desc("cnt"), "t").limit(q // 2).collect()
    # draw the uniform half from keys NOT already in the head (otherwise
    # the two populations overlap, fewer than q keys get probed, and the
    # tail half shrinks by the overlap); anti-join, not a 50k-literal IN
    hot_df = spark.createDataFrame([(r["t"],) for r in hot], "t long")
    # seed as an extra hash column, not `t + 1337` — ANSI mode overflows
    # int32 addition for tokens near INT32_MAX
    rest = (exact.join(F.broadcast(hot_df), "t", "left_anti")
            .orderBy(F.xxhash64(F.col("t"), F.lit(1337)))
            .limit(q - len(hot)).collect())
    by_key = {r["t"]: r["cnt"] for r in hot}
    by_key.update({r["t"]: r["cnt"] for r in rest})
    keys = np.array(sorted(by_key), dtype=np.int64)
    truth = np.array([by_key[k] for k in sorted(by_key)], dtype=np.int64)
    est = sk.point_query_batch(keys)

    err = est - truth
    if sketch == "cs":
        # exact l2 from the full distinct-count table (distributed agg)
        l2 = float(exact.select(
            F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("l2"))
            .collect()[0]["l2"])
        bound = cs_cfg.eps * l2
        delta = math.exp(-cs_cfg.depth)
        hist_edges = np.linspace(float(err.min()) - 1e-9,
                                 max(float(err.max()), 1.0), 21)
        hist, _ = np.histogram(err, bins=hist_edges)
        out = {
            "sketch": "cs",
            "hist": hist.tolist(),
            "hist_err_range": [float(err.min()), float(err.max())],
            "within_bound_frac": float((np.abs(err) <= bound).mean()),
            "eps_l2": float(bound),
            "delta": delta,
            "n_tokens": int(n_tokens),
            "n_probes": int(len(keys)),
            # unbiasedness evidence: mean signed error tiny vs the bound,
            # and error mass on BOTH sides (CM has zero negative mass)
            "mean_err_over_bound": float(err.mean() / bound),
            "neg_errs": int((err < 0).sum()),
            "pos_errs": int((err > 0).sum()),
            "w": cs_cfg.width, "d": cs_cfg.depth,
        }
        assert out["within_bound_frac"] >= 1 - delta
        assert out["neg_errs"] > 0 and out["pos_errs"] > 0
        assert abs(out["mean_err_over_bound"]) < 0.5
    else:
        bound = cfg.eps * sk.total_count
        hist_edges = np.linspace(0, max(float(err.max()), 1.0), 21)
        hist, _ = np.histogram(err, bins=hist_edges)
        out = {
            "hist": hist.tolist(),
            "hist_max_err": int(err.max()),
            "within_bound_frac": float((err <= bound).mean()),
            "eps_l1": int(bound),
            "delta": cfg.delta,
            "n_tokens": int(n_tokens),
            "n_probes": int(len(keys)),
            "sidedness_violations": int((err < 0).sum()),
            "w": cfg.width, "d": cfg.depth,
        }
        assert out["sidedness_violations"] == 0
        assert out["within_bound_frac"] >= 1 - cfg.delta
    print(json.dumps(out))


if __name__ == "__main__":
    args = sys.argv[1:]
    sketch = "cm"
    if args and args[-1] in ("cm", "cs"):
        sketch = args[-1]
        args = args[:-1]
    main(*(int(a) for a in args), sketch=sketch)
