"""Temporal joins: as-of (union + ordered window) and bounded range join
(time-band buckets) vs brute-force truth on hand-built frames."""

import pytest
from pyspark.sql import functions as F

from sketchlib.joins import as_of_join, range_join


@pytest.fixture(scope="module")
def streams(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100),
         (1, "2024-01-01 11:00:00", 101),
         (1, "2024-01-01 09:00:00", 102),   # before any right row
         (2, "2024-01-01 10:30:00", 200),
         (3, "2024-01-01 10:00:00", 300)],  # key with no right rows
        "user_id long, ts_s string, event_id long"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 900),
         (1, "2024-01-01 10:30:00", 901),
         (1, "2024-01-01 11:00:00", 902),   # equal-ts tie with left 101
         (2, "2024-01-01 10:00:00", 903),
         (2, "2024-01-01 10:29:00", 904)],
        "user_id long, ts_s string, event_id long"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id")
    return left, right


def test_as_of_join_most_recent_at_or_before(streams):
    left, right = streams
    out = {r["event_id"]: r["event_id_asof"]
           for r in as_of_join(left, right, "user_id", "ts",
                               ["event_id"]).collect()}
    assert len(out) == 5               # every left row survives
    assert out[100] == 900             # 10:00 -> 09:30
    assert out[101] == 902             # 11:00 ties right 11:00 -> included
    assert out[102] is None            # nothing at or before 09:00
    assert out[200] == 904             # 10:30 -> 10:29
    assert out[300] is None            # key with no right rows


def test_as_of_join_strict_excludes_equal_ts(streams):
    left, right = streams
    out = {r["event_id"]: r["event_id_asof"]
           for r in as_of_join(left, right, "user_id", "ts", ["event_id"],
                               strict=True).collect()}
    assert out[101] == 901             # equal-ts right row no longer visible
    assert out[100] == 900


def test_as_of_join_matches_bruteforce(spark, streams):
    left, right = streams
    lrows = left.collect()
    rrows = right.collect()
    expected = {}
    for l in lrows:
        cands = [r for r in rrows
                 if r["user_id"] == l["user_id"] and r["ts"] <= l["ts"]]
        expected[l["event_id"]] = (max(cands, key=lambda r: r["ts"])["event_id"]
                                   if cands else None)
    got = {r["event_id"]: r["event_id_asof"]
           for r in as_of_join(left, right, "user_id", "ts",
                               ["event_id"]).collect()}
    assert got == expected


def test_range_join_matches_bruteforce_and_bounds(spark, streams):
    left, right = streams
    lo, hi = 0, 30 * 60 * 1_000_000     # [0, 30min] after the left row
    out = {(r["l_event_id"], r["r_event_id"])
           for r in range_join(left, right, "user_id", "ts",
                               lower_us=lo, upper_us=hi).collect()}
    lrows, rrows = left.collect(), right.collect()

    def us(t):
        import calendar
        return calendar.timegm(t.timetuple()) * 1_000_000 + t.microsecond

    expected = {(l["event_id"], r["event_id"])
                for l in lrows for r in rrows
                if l["user_id"] == r["user_id"]
                and lo <= us(r["ts"]) - us(l["ts"]) <= hi}
    assert out == expected
    assert (100, 901) in out            # +30:00 boundary is inclusive
    assert (101, 902) in out            # 0-offset boundary is inclusive
    # each pair appears exactly once (band replication never duplicates)
    rows = range_join(left, right, "user_id", "ts",
                      lower_us=lo, upper_us=hi).collect()
    assert len(rows) == len(out)


def test_as_of_join_carries_matched_row_atomically(spark):
    """A NULL attribute in the matched right row must stay NULL — not be
    backfilled from an older right row (per-column carry would fabricate
    a (ts, val) combination existing in no right row)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1)],
        "k long, ts_s string, lid long"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5),
         (1, "2024-01-01 09:30:00", None)],   # matched row, val NULL
        "k long, ts_s string, val long"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "val")
    row = as_of_join(left, right, "k", "ts", ["val"]).collect()[0]
    assert row["ts_asof"].minute == 30         # matched the 09:30 row
    assert row["val_asof"] is None             # its NULL val is preserved


def test_as_of_join_ignores_null_right_timestamps(spark):
    """Right rows with NULL ts are not valid as-of predecessors."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 08:00:00", 1)],
        "k long, ts_s string, lid long"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "lid")
    right = spark.createDataFrame(
        [(1, None, 99),
         (1, "2024-01-01 12:00:00", 5)],       # after the left row
        "k long, ts_s string, val long"
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "val")
    row = as_of_join(left, right, "k", "ts", ["val"]).collect()[0]
    assert row["val_asof"] is None and row["ts_asof"] is None


def test_as_of_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof (the semantics the
    operator restates distributively): 300 left x 200 right rows, 8 keys,
    duplicate timestamps included."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    left_pd = pd.DataFrame({
        "k": rng.integers(0, 8, 300),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 300), unit="s"),
        "lid": np.arange(300),
    })
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 8, 200),
        "ts": pd.to_datetime(rng.integers(0, 10_000, 200), unit="s"),
        "val": rng.integers(0, 1000, 200),
    }).drop_duplicates(["k", "ts"])  # tie rule differs: pandas keeps input
    # order, the distributed operator deterministically takes the greatest
    # right-row struct — dedup (k, ts) so both agree on every row
    out = as_of_join(spark.createDataFrame(left_pd),
                     spark.createDataFrame(right_pd),
                     "k", "ts", ["val"]).collect()
    got = {r["lid"]: (r["val_asof"], r["ts_asof"]) for r in out}

    # pandas asof: sort by ts then stable by insertion; for equal right
    # ts the LAST right row wins in both (running last over sorted rows)
    ref = pd.merge_asof(
        left_pd.sort_values(["ts", "lid"], kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward", suffixes=("", "_r"))
    assert len(got) == 300
    for _, row in ref.iterrows():
        want = None if pd.isna(row["val"]) else int(row["val"])
        assert got[row["lid"]][0] == want, (row["lid"], got[row["lid"]], want)


def test_bloom_semijoin_identical_to_plain_join(spark):
    from sketchlib.joins import bloom_semijoin, runtime_filtered_join
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
                .select("o_orderkey", "o_orderpriority") \
                .withColumnRenamed("o_orderkey", "l_orderkey")
    plain = (lineitem.join(dim, "l_orderkey")
             .agg(F.count("*").alias("n"),
                  F.sum("l_quantity").alias("q")).collect()[0])
    filt = bloom_semijoin(spark, lineitem, dim, "l_orderkey", fpr=0.01)
    n_fact = lineitem.count()
    n_filt = filt.count()
    # the filter actually prunes (URGENT is ~1/5 of orders) but never
    # drops a matching row
    assert n_filt < n_fact
    got = (filt.join(dim, "l_orderkey")
           .agg(F.count("*").alias("n"),
                F.sum("l_quantity").alias("q")).collect()[0])
    assert (got["n"], got["q"]) == (plain["n"], plain["q"])
    # convenience wrapper, same result
    rf = (runtime_filtered_join(spark, lineitem, dim, "l_orderkey",
                                fpr=0.01)
          .agg(F.count("*").alias("n"),
               F.sum("l_quantity").alias("q")).collect()[0])
    assert (rf["n"], rf["q"]) == (plain["n"], plain["q"])
    with pytest.raises(ValueError):
        runtime_filtered_join(spark, lineitem, dim, "l_orderkey",
                              how="left_outer")


def test_bloom_antijoin_exactly_left_anti(spark):
    from sketchlib.joins import bloom_antijoin
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    dim = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
           .select(F.col("o_orderkey").alias("l_orderkey")))
    plain = (lineitem.join(dim, "l_orderkey", "left_anti")
             .agg(F.count("*").alias("n"),
                  F.sum("l_quantity").alias("q"),
                  F.sum(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10**9))).alias("h")).collect()[0])
    got = (bloom_antijoin(spark, lineitem, dim, "l_orderkey", fpr=0.01)
           .agg(F.count("*").alias("n"),
                F.sum("l_quantity").alias("q"),
                F.sum(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10**9))).alias("h")).collect()[0])
    assert (got["n"], got["q"], got["h"]) == \
        (plain["n"], plain["q"], plain["h"])
    # null fact keys survive (left-anti keeps them; bloom must not drop)
    facts = spark.createDataFrame([(None,), (1,), (10**12,)],
                                  "l_orderkey long")
    out = {r["l_orderkey"] for r in
           bloom_antijoin(spark, facts, dim, "l_orderkey",
                          fpr=0.01).collect()}
    keep = {r["l_orderkey"] for r in
            facts.join(dim, "l_orderkey", "left_anti").collect()}
    assert out == keep and None in out


def test_skew_aware_join_exact_and_detects_hot_keys(spark):
    import numpy as np
    from sketchlib.joins import detect_hot_keys, skew_aware_join
    rng = np.random.default_rng(8)
    # power-law fact: key 7 holds ~40% of rows
    keys = np.where(rng.random(20000) < 0.4, 7,
                    rng.integers(0, 500, 20000))
    fact = spark.createDataFrame(
        [(int(k), int(i)) for i, k in enumerate(keys)], "k long, row_id long")
    dim = spark.createDataFrame(
        [(int(k), f"attr{k}") for k in range(500)], "k long, attr string")

    hot = detect_hot_keys(fact, "k", k=64, min_share=0.05)
    assert 7 in hot and len(hot) < 10

    plain = (fact.join(dim, "k")
             .agg(F.count("*").alias("n"),
                  F.sum(F.pmod(F.xxhash64("k", "row_id", "attr"),
                               F.lit(10**9))).alias("h")).collect()[0])
    got_df = skew_aware_join(spark, fact, dim, "k", k=64, min_share=0.05)
    got = got_df.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64("k", "row_id", "attr"),
                     F.lit(10**9))).alias("h")).collect()[0]
    assert (got["n"], got["h"]) == (plain["n"], plain["h"])
    # the hot branch broadcasts
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # precomputed hot set short-circuits detection; empty set = plain join
    got2 = skew_aware_join(spark, fact, dim, "k", hot_keys=[7]).agg(
        F.count("*").alias("n")).collect()[0]
    assert got2["n"] == plain["n"]
    got3 = skew_aware_join(spark, fact, dim, "k", hot_keys=[]).agg(
        F.count("*").alias("n")).collect()[0]
    assert got3["n"] == plain["n"]


def test_advise_join_estimates_and_strategy(spark):
    from sketchlib.joins import advise_join
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    adv = advise_join(spark, li, "l_orderkey", orders, "o_orderkey")
    exact = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert adv["est_join_rows"] >= exact          # CM one-sided
    assert adv["est_join_rows"] <= exact * 1.1    # tight at this eps
    assert adv["strategy"] == "broadcast_right"   # both sides tiny here
    n_ord = orders.count()
    d = adv["right"]["distinct_keys"]
    assert abs(d - n_ord) <= 0.05 * n_ord         # HLL p=14 on unique keys
    # force the skew branch: tiny broadcast budget + a skewed fact
    import numpy as np
    rng = np.random.default_rng(3)
    keys = np.where(rng.random(5000) < 0.5, 42, rng.integers(0, 200, 5000))
    fact = spark.createDataFrame([(int(k),) for k in keys], "k long")
    dim = spark.createDataFrame([(int(k),) for k in range(200)], "k long")
    adv2 = advise_join(spark, fact, "k", dim, "k", broadcast_rows=10,
                       skew_share=0.05)
    assert adv2["strategy"] == "skew_split"
    assert 42 in adv2["left"]["hot_keys"]


def test_auto_join_every_strategy_equals_plain_join(spark):
    """auto_join executes whichever strategy the advisor picked and every
    path returns exactly the plain inner join in the same column order —
    broadcast_right, broadcast_left, skew_split (forced via thresholds)
    and shuffle all checked, plus the persisted-advice re-plan path."""
    import numpy as np
    from sketchlib.joins import advise_join, auto_join

    rng = np.random.default_rng(11)
    keys = np.where(rng.random(8000) < 0.35, 42,
                    rng.integers(0, 150, 8000)).astype(np.int64)
    fact = spark.createDataFrame(
        [(int(k), int(i)) for i, k in enumerate(keys)],
        "k long, fval long").repartition(8)
    dim = spark.createDataFrame(
        [(int(k), f"d{k}") for k in range(150)], "kk long, dname string")
    plain = sorted(
        fact.join(dim.withColumnRenamed("kk", "k"), "k")
        .select("k", "fval", "dname").collect())

    for kwargs, want in [
        (dict(), "broadcast_right"),                       # dim is tiny
        (dict(broadcast_rows=10, skew_share=0.05), "skew_split"),
        (dict(broadcast_rows=10, skew_share=0.99), "shuffle"),
    ]:
        adv = advise_join(spark, fact, "k", dim, "kk", **kwargs)
        assert adv["strategy"] == want, (kwargs, adv["strategy"])
        got = sorted(auto_join(spark, fact, "k", dim, "kk",
                               advice=adv).collect())
        assert got == plain, want
    # broadcast_left: swap sides; canonical order puts the (fact) left
    # side's columns first
    adv = advise_join(spark, dim, "kk", fact, "k")
    assert adv["strategy"] == "broadcast_left"
    got = sorted(auto_join(spark, dim, "kk", fact, "k", advice=adv)
                 .select(F.col("kk").alias("k"), "fval", "dname").collect())
    assert got == plain
    # fresh advisory pass inside auto_join (no advice passed)
    got = sorted(auto_join(spark, fact, "k", dim, "kk").collect())
    assert got == plain
