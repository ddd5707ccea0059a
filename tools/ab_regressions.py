"""Calm-weather A/B attribution for the r3 bench regressions
(VERDICT r3 #3): simhash_dedup_pairs 1.08 -> 3.18 s and
cm_inner_product_rawlog 2.12 -> 4.85 s vs the r2 medians.

Code facts first (git archaeology, f34abff = r2 HEAD):
- inner_product_rawlog_parquet is byte-identical r2 -> r3 -> r4 (only
  surrounding comments moved), and none of its helpers
  (_default_n_slices, _slice_assignments, row_probe_sums) changed — any
  wall difference is host weather by construction.
- simhash_near_pairs DID change in r3: candidates route through
  lshjoin.bucket_candidate_pairs (skew cap), which added a window pass
  AND two re-attach joins on id to recover the fingerprints for the
  Hamming verify. r4 removes the re-attach joins (payload_cols ride the
  candidate shuffle); this harness times all three shapes.

Runs interleaved A/B/C x reps in ONE session (same JVM, same cache
state), reports per-shape medians plus the round's /proc/stat steal so
a noisy host is visible in the output. Exits nonzero if the current
shape is >1.3x the r2 shape on this host (the verdict's bar).

Usage: python tools/ab_regressions.py [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return sum(v), v[7]


def _simhash_r2_shape(df, id_col="doc_id", max_hamming=3):
    """The r2 candidate shape, reconstructed: uncapped block self-join
    with the fingerprint carried through (no window, no star pairs)."""
    from pyspark.sql import functions as F
    from sketchlib.pipeline import simhash64

    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    fps = simhash64(df, "text", id_col).cache()

    def block(i):
        shift = i * width
        nbits = 64 - shift if i == n_blocks - 1 else width
        mask = (1 << nbits) - 1
        return F.struct(
            F.lit(i).alias("blk"),
            F.shiftrightunsigned("simhash", shift).bitwiseAND(F.lit(mask))
            .alias("bv"))

    blocks = fps.select(
        id_col, "simhash",
        F.explode(F.array(*[block(i) for i in range(n_blocks)])).alias("b")
    ).select(id_col, "simhash", F.col("b.blk").alias("blk"),
             F.col("b.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, [F.col("a.blk") == F.col("b.blk"),
                       F.col("a.bv") == F.col("b.bv"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.simhash").alias("ha"),
                    F.col("b.simhash").alias("hb"))
            .distinct())
    out = (cand.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"))
    n = out.count()
    fps.unpersist()
    return n


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from sketchlib.pipeline import simhash_near_pairs

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def current():
        return simhash_near_pairs(docs).count()

    def r2():
        return _simhash_r2_shape(docs)

    # rawlog: identical code r2->r4; time it to separate weather
    import math
    from sketchlib.countmin import CMConfig
    from sketchlib.spark_build import (build_sketch_parquet,
                                       inner_product_rawlog_parquet)
    tok = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data",
        "token_sequences_400000.parquet")
    cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
    sk = build_sketch_parquet(spark, tok, "tokens", cfg).sketch

    def rawlog():
        return inner_product_rawlog_parquet(spark, sk, tok, "tokens")

    shapes = {"simhash_r2": r2, "simhash_r4": current, "rawlog": rawlog}
    # warm every path once (worker pools, page cache)
    counts = {k: fn() for k, fn in shapes.items()}
    times = {k: [] for k in shapes}
    j0 = _steal()
    for _ in range(reps):
        for k, fn in shapes.items():      # interleaved: shared weather
            t0 = time.perf_counter()
            n = fn()
            times[k].append(round(time.perf_counter() - t0, 3))
            assert n == counts[k], (k, n, counts[k])
    j1 = _steal()
    med = {k: statistics.median(v) for k, v in times.items()}
    out = {
        "reps": reps, "sf_dir": sf_dir,
        "steal_pct": round(100.0 * (j1[1] - j0[1]) / (j1[0] - j0[0]), 2),
        "medians": med, "all": times,
        "simhash_pairs": counts["simhash_r2"],
        "simhash_r4_over_r2": round(med["simhash_r4"] / med["simhash_r2"],
                                    3),
        "r2_reference": {"simhash": 1.08, "rawlog": 2.12},
    }
    print(json.dumps(out, indent=1))
    if med["simhash_r4"] > 1.3 * med["simhash_r2"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
