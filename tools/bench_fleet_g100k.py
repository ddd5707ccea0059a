"""G=100k grouped-fleet scale evidence (VERDICT r4 #1 Done criterion).

Builds a SketchCatalog grouped fleet over a synthetic table with 100 000
distinct groups (1 M rows, deterministic id-derived tokens — no RNG, no
external data) and measures the three answer shapes plus delta
maintenance:

- **single-group** (`group=`): answers one group from ONE committed
  store row (predicate pushed into the store parquet scan) — wall must
  be independent of G; `extra["groups"] == 1` and the targeted-read spy
  in tests/test_catalog.py pins the row-read count.
- **fleet as_df** (`as_df=True`): the full-fleet answer evaluated per
  group inside mapInPandas; the driver sees only the final aggregate —
  Python-driver RSS delta must stay flat (no G x KB fan-in).
- **fleet dict** (default): the small-G convenience that DOES fan in
  G x KB blobs — measured here as the contrast that motivates as_df.
- **delta fold**: an append touching 3 of 100k groups must republish
  exactly 3 rows in wall time independent of G.

Writes BENCH/fleet_g100k_r5.json and prints the same JSON line.
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

N_GROUPS = 100_000
ROWS = 1_000_000
TOKENS_PER_ROW = 16


def rss_mb() -> float:
    """Current (not high-water) resident set of THIS Python process."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def synth(spark, data: str, *, rows: int, offset: int = 0,
          groups: int = N_GROUPS) -> None:
    """Deterministic grouped token table: ``groups`` sources, id-derived
    int32 tokens (the input_hint shape: doc_id, tokens, n_tok, source)."""
    (spark.range(offset, offset + rows)
     .select(
         F.format_string("doc-%09d", "id").alias("doc_id"),
         F.expr(f"transform(sequence(0, {TOKENS_PER_ROW - 1}, 1), "
                "x -> cast(pmod(id * 131071 + x * 8191, 1000000) as int))"
                ).alias("tokens"),
         F.lit(TOKENS_PER_ROW).cast("int").alias("n_tok"),
         F.format_string("s%06d", F.pmod(F.col("id"),
                                         F.lit(groups))).alias("source"))
     .write.mode("append").parquet(data))


def main(n_groups: int = N_GROUPS, rows: int = ROWS) -> None:
    from sketchlib.catalog import SketchCatalog

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("fleet-g100k").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sketchlib_g100k_")
    out: dict = {"metric": f"grouped catalog fleet at G={n_groups}",
                 "n_groups": n_groups, "rows": rows}
    try:
        data, store = f"{root}/data", f"{root}/store"
        synth(spark, data, rows=rows, groups=n_groups)

        cat = SketchCatalog(spark, store)
        t0 = time.perf_counter()
        reg = cat.register_grouped(data, "source", "tokens",
                                   ["theta", ("mg", {"k": 64})])
        out["build_s"] = round(time.perf_counter() - t0, 2)
        out["build_groups"] = int(reg.extra["updated_groups"])
        assert out["build_groups"] == n_groups, reg.extra

        # single-group: one committed row per question, any G
        walls = []
        for gi in (0, n_groups // 3, n_groups - 1, 77 % n_groups,
                   n_groups // 2):
            g = f"s{gi:06d}"
            t0 = time.perf_counter()
            a = cat.count_distinct_grouped(data, "source", "tokens",
                                           group=g)
            walls.append(time.perf_counter() - t0)
            assert a.extra == {"group": g, "groups": 1,
                               "group_col": "source"}, a.extra
            # 10 rows x 16 tokens with stride-8191 offsets: distinct
            # tokens per group is ~160; theta k=4096 >> 160 => exact
            assert 1 <= a.value <= TOKENS_PER_ROW * (rows // n_groups)
        out["single_group_wall_s"] = round(sorted(walls)[len(walls) // 2],
                                           3)

        # fleet as_df: aggregate of 100k per-group answers, flat RSS
        r0 = rss_mb()
        t0 = time.perf_counter()
        fleet = cat.count_distinct_grouped(data, "source", "tokens",
                                           as_df=True)
        agg = fleet.value.agg(
            F.count("*").alias("n"), F.avg("value").alias("avg"),
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()[0]
        out["fleet_df_wall_s"] = round(time.perf_counter() - t0, 2)
        out["fleet_df_rss_delta_mb"] = round(rss_mb() - r0, 1)
        out["fleet_df_groups"] = int(agg["n"])
        assert int(agg["n"]) == n_groups

        # fleet dict (the driver fan-in contrast the verdict flagged)
        r0 = rss_mb()
        t0 = time.perf_counter()
        d = cat.count_distinct_grouped(data, "source", "tokens")
        out["fleet_dict_wall_s"] = round(time.perf_counter() - t0, 2)
        out["fleet_dict_rss_delta_mb"] = round(rss_mb() - r0, 1)
        assert len(d.value) == n_groups
        # same blobs, same arithmetic: spot-check agreement
        gprobe = f"s{n_groups // 3:06d}"
        assert d.value[gprobe] == cat.count_distinct_grouped(
            data, "source", "tokens", group=gprobe).value

        # delta fold: 30 rows touching 3 groups republishes 3 rows
        synth(spark, data, rows=30, offset=10_000_000, groups=3)
        t0 = time.perf_counter()
        ref = cat.refresh_grouped(data, "source", "tokens")
        out["delta_fold_wall_s"] = round(time.perf_counter() - t0, 2)
        out["delta_updated_groups"] = int(ref.extra["updated_groups"])
        assert out["delta_updated_groups"] == 3, ref.extra

        store_mb = sum(os.path.getsize(os.path.join(dp, f))
                       for dp, _, fs in os.walk(store) for f in fs)
        out["store_mb"] = round(store_mb / 1e6, 1)
        print(json.dumps(out))
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH",
                f"fleet_g{n_groups}_r5.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
