"""Per-file data-skipping index scale evidence (round-5 close).

Builds a token table of N_FILES parquet files (deterministic zipf parts
— no external data), registers a ``SketchCatalog.register_file_index``
over it, and measures the shapes that matter at 10^5-10^6 files:

- **registration**: one file-local build pass (no grouping shuffle —
  a row group belongs to exactly one file), wall and per-file blob cost.
- **locate_batch**: ONE fleet pass answers a whole key array (per blob:
  one ``contains_batch`` + one ``point_query_batch``) — wall must be
  ~flat in the number of probed keys, and ~linear in fleet rows, never
  in table bytes.
- **exact full-scan contrast**: the same membership question answered
  by scanning the table (explode + filter) — what the index avoids.
- **pruned verify**: reading ONLY the candidate files for a
  single-file key vs the full-table read.
- **delta fold**: one appended file must republish exactly ONE group
  row, wall independent of the existing fleet size.

Writes BENCH/fileindex_r5.json and prints the same JSON line.
Run with nothing else on the box (timings are the artifact).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_FILES = int(os.environ.get("FIDX_FILES", "128"))
ROWS_PER_FILE = int(os.environ.get("FIDX_ROWS", "4000"))
N_PROBE = int(os.environ.get("FIDX_PROBE", "10000"))


def main():
    from sketchlib.catalog import SketchCatalog
    from sketchlib.datagen import generate_token_table

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sketchlib_fidx_bench_")
    data = f"{root}/data"
    os.makedirs(data)
    t0 = time.perf_counter()
    for i in range(N_FILES):
        generate_token_table(os.path.join(data, f"part-{i:05d}.parquet"),
                             rows=ROWS_PER_FILE, seed=7000 + i,
                             dist="zipf")
    gen_s = time.perf_counter() - t0

    out = {"n_files": N_FILES, "rows_per_file": ROWS_PER_FILE,
           "gen_s": round(gen_s, 2)}
    try:
        cat = SketchCatalog(spark, f"{root}/store")
        t0 = time.perf_counter()
        cat.register_file_index(
            data, "tokens",
            [("bloom", {"capacity": 600_000, "fpr": 0.001}),
             ("cm", {"eps": 1e-3})])
        out["register_s"] = round(time.perf_counter() - t0, 2)

        base = spark.read.parquet(data).select(
            F.explode("tokens").alias("t"))
        n_tokens = base.count()
        out["n_tokens"] = int(n_tokens)

        # probe keys: a deterministic slice of the real vocabulary
        probe = [int(r["t"]) for r in
                 base.distinct().orderBy("t").limit(N_PROBE).collect()]
        out["n_probe"] = len(probe)

        t0 = time.perf_counter()
        lb = cat.locate_batch(data, "tokens", probe)
        out["locate_batch_s"] = round(time.perf_counter() - t0, 3)
        out["files_total"] = lb.extra["files_total"]
        hits = sum(len(v) for v in lb.value.values())
        out["candidate_pairs"] = int(hits)

        # the scan the index avoids: which files hold each probed key
        t0 = time.perf_counter()
        n_exact_pairs = (
            spark.read.parquet(data)
            .withColumn("f", F.input_file_name())
            .select("f", F.explode("tokens").alias("t"))
            .join(spark.createDataFrame([(k,) for k in probe],
                                        "t long"), "t")
            .select("f", "t").distinct().count())
        out["exact_scan_s"] = round(time.perf_counter() - t0, 3)
        out["exact_pairs"] = int(n_exact_pairs)
        if hits < n_exact_pairs:
            raise AssertionError("false negative: candidate pairs < "
                                 "exact pairs")
        out["fp_pair_ratio"] = round(
            (hits - n_exact_pairs) / max(n_exact_pairs, 1), 4)

        # single-file key: pruned verify vs full read
        single = None
        for k, v in sorted(lb.value.items()):
            if len(v) == 1:
                single = k
                break
        if single is not None:
            t0 = time.perf_counter()
            n_pruned = (cat.pruned_read(data, "tokens", single)
                        .select(F.explode("tokens").alias("t"))
                        .filter(F.col("t") == single).count())
            out["pruned_verify_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n_full = base.filter(F.col("t") == single).count()
            out["full_verify_s"] = round(time.perf_counter() - t0, 3)
            assert n_pruned == n_full
            out["verify_count"] = int(n_full)

        # delta: ONE appended file -> ONE republished group
        generate_token_table(os.path.join(data, "part-delta.parquet"),
                             rows=ROWS_PER_FILE, seed=9999, dist="zipf")
        t0 = time.perf_counter()
        r = cat.refresh_file_index(data, "tokens")
        out["delta_fold_s"] = round(time.perf_counter() - t0, 2)
        out["delta_updated_groups"] = r.extra["updated_groups"]
        assert r.extra["updated_groups"] == 1

        store_b = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(f"{root}/store") for f in fs)
        out["store_mb"] = round(store_b / 1e6, 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()

    line = json.dumps(out)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/fileindex_r5.json", "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
