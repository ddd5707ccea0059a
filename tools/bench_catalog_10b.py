"""Catalog at 10.4 B tokens: profile once, answer from blobs forever.

Registers a SketchCatalog over the 40 M-row / 10.4 B-token fixture
(`data/token_sequences_40000000.parquet`, the Session N table) and
measures the engine's headline promise at the top fixture decade:

- **profile**: ONE MultiSketch scan per column builds every registered
  sketch (CM eps=1e-4 + theta + MG(k=4096) on `tokens`; KLL on `n_tok`).
- **answers**: count-distinct, hot-key frequency, top-k, n_tok median —
  each answered from the store's MB-scale blobs in sub-second wall,
  via the Python verbs AND the SQL surface (`catalog_count_distinct` et
  al.), with explicit error contracts.
- **exact companions**: the same questions answered by scanning — the
  cost a user pays per question WITHOUT the catalog — plus the
  self-asserted guarantees (CM >= exact and within eps*N; theta within
  5x rse; MG top-k contains the true hot token; KLL median inside the
  exact 45-55 percentile window).

Writes BENCH/catalog_10b_r5.json and prints the same JSON line.
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

TABLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data",
    "token_sequences_40000000.parquet")


def main() -> None:
    from sketchlib.catalog import SketchCatalog
    from sketchlib.catalog_sql import register_catalog_sql

    if not os.path.exists(TABLE):
        raise SystemExit(f"fixture missing: {TABLE} — generate with "
                         "tools/make_sf.py / datagen first")

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("catalog-10b").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sketchlib_cat10b_")
    out: dict = {"metric": "catalog profile+answers at 10.4B tokens",
                 "rows": 40_000_000}
    try:
        cat = SketchCatalog(spark, f"{root}/store")

        t0 = time.perf_counter()
        cat.register(TABLE, "tokens",
                     [("cm", {"eps": 1e-4}), "theta",
                      ("mg", {"k": 4096})])
        out["profile_tokens_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        cat.register(TABLE, "n_tok", ["kll"])
        out["profile_ntok_s"] = round(time.perf_counter() - t0, 2)

        def timed(key, fn):
            t0 = time.perf_counter()
            v = fn()
            out[key] = round(time.perf_counter() - t0, 3)
            return v

        # answers from blobs (Python verbs)
        cd = timed("ans_count_distinct_s",
                   lambda: cat.count_distinct(TABLE, "tokens"))
        tk = timed("ans_topk_s", lambda: cat.topk(TABLE, "tokens", k=10))
        hot = int(tk.value[0][0])
        fq = timed("ans_frequency_s",
                   lambda: cat.frequency(TABLE, "tokens", hot))
        med = timed("ans_quantile_s",
                    lambda: cat.quantile(TABLE, "n_tok", 0.5))

        # answers from blobs (SQL surface)
        register_catalog_sql(spark, f"{root}/store")
        sql_row = timed("ans_sql_s", lambda: spark.sql(f"""
            SELECT catalog_count_distinct('{TABLE}', 'tokens') AS cd,
                   catalog_frequency('{TABLE}', 'tokens', {hot}) AS fq,
                   catalog_quantile('{TABLE}', 'n_tok', 0.5) AS med
        """).collect()[0])
        assert sql_row["cd"] == cd.value and sql_row["fq"] == fq.value \
            and sql_row["med"] == med.value

        # exact companions: what each question costs WITHOUT the catalog
        tok = spark.read.parquet(TABLE)
        exact_distinct = timed("exact_count_distinct_s", lambda: int(
            tok.select(F.explode("tokens").alias("t"))
            .agg(F.countDistinct("t")).collect()[0][0]))
        exact_hot = timed("exact_frequency_s", lambda: int(
            tok.select(F.explode("tokens").alias("t"))
            .filter(F.col("t") == hot).count()))
        exact_top = timed("exact_top1_s", lambda: (
            tok.select(F.explode("tokens").alias("t"))
            .groupBy("t").count()
            .orderBy(F.desc("count"), "t").first()))
        win = timed("exact_quantile_s", lambda: (
            tok.agg(F.expr(
                "percentile(n_tok, array(0.45, 0.5, 0.55))")
                .alias("p")).collect()[0]["p"]))

        n_l1 = int(tok.agg(F.sum("n_tok")).collect()[0][0])
        out["tokens_total"] = n_l1
        out["distinct_exact"] = exact_distinct
        out["distinct_est"] = round(float(cd.value), 1)
        rse = float(cd.contract.split("rse=")[1].split(" ")[0])
        out["guarantees"] = {
            "theta_within_bound": bool(
                abs(cd.value - exact_distinct)
                <= 5 * rse * exact_distinct + 2),
            "cm_ge_exact": bool(fq.value >= exact_hot),
            "cm_within_eps_l1": bool(fq.value - exact_hot
                                     <= 1e-4 * n_l1 + 1),
            "mg_top1_is_true_top1": bool(hot == int(exact_top["t"])),
            "kll_median_in_window": bool(win[0] <= med.value <= win[2]),
        }
        assert all(out["guarantees"].values()), out["guarantees"]

        blobs = sum(os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(f"{root}/store")
                    for f in fs)
        out["store_mb"] = round(blobs / 1e6, 2)
        out["speedup_distinct"] = round(
            out["exact_count_distinct_s"] / out["ans_count_distinct_s"],
            1)
        out["speedup_frequency"] = round(
            out["exact_frequency_s"] / out["ans_frequency_s"], 1)
        print(json.dumps(out))
        with open(os.path.join(os.path.dirname(TABLE), "..", "BENCH",
                               "catalog_10b_r5.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
