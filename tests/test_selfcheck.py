"""selfcheck_summary (VERDICT r3 #2): the one oracled roll-up that makes
the rows-only tail visible to the driver's hard signal. These tests pin
its window arithmetic and prove the red-flip property: a single false
self-assert flag anywhere in the tail turns the row red."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_window_arithmetic():
    """52 oracled queries: 50 fill the driver window exactly (the 50th
    being selfcheck_summary); catalog_sample_subset and
    csv_source_stats are the deliberate overflows, re-checked against
    their DuckDB oracles inside selfcheck_summary."""
    names = list(E.queries())
    oracled = set(E.oracle_sql())
    window, tail = names[:50], names[50:]
    assert all(n in oracled for n in window)
    assert names[49] == "selfcheck_summary"
    assert [n for n in tail if n in oracled] == [
        "catalog_sample_subset", "csv_source_stats"]


def test_selfcheck_oracle_literals_track_registry():
    sql = E.oracle_sql()["selfcheck_summary"]
    n_tail = len(list(E.queries())[50:])
    assert f"CAST({n_tail} AS BIGINT) AS n_queries" in sql
    assert f"CAST({E._TAIL_FLAG_COLS} AS BIGINT) AS n_flag_cols" in sql


def _fake_queries(spark, ok_fn, bad_fn, n_bad):
    reg = {f"pad{i:02d}": ok_fn for i in range(50)}
    reg["tail_ok"] = ok_fn
    for i in range(n_bad):
        reg[f"tail_bad{i}"] = bad_fn
    return reg


def test_selfcheck_red_flip(spark, monkeypatch, tmp_path):
    """Flipping one tail invariant must flip all_true to False and be
    counted in n_false; with no flips the row is green."""
    def ok(s, sf):
        return s.createDataFrame([(1, True)], "x long, est_ge_exact boolean")

    def bad(s, sf):
        return s.createDataFrame([(1, True), (2, False)],
                                 "x long, est_ge_exact boolean")

    for n_bad, want_false in ((0, 0), (1, 1)):
        reg = _fake_queries(spark, ok, bad, n_bad)
        monkeypatch.setattr(E, "_registry", lambda r=reg: r)
        monkeypatch.setattr(E, "queries", lambda r=reg: r)
        monkeypatch.setattr(E, "oracle_sql", lambda: {})
        row = E._q_selfcheck_summary(spark, str(tmp_path)).collect()[0]
        assert row["n_queries"] == 1 + n_bad
        assert row["n_false"] == want_false
        assert row["all_true"] == (n_bad == 0)


def test_selfcheck_oracle_mismatch_flips(spark, monkeypatch, tmp_path):
    """A tail query whose DuckDB oracle disagrees must be counted in
    n_oracle_mismatch and flip all_true."""
    def q(s, sf):
        return s.createDataFrame([(7,)], "x long")

    reg = {f"pad{i:02d}": q for i in range(50)}
    reg["tail_oracled"] = q
    monkeypatch.setattr(E, "_registry", lambda: reg)
    monkeypatch.setattr(E, "queries", lambda: reg)
    for sql, want in (("SELECT CAST(7 AS BIGINT) AS x", 0),
                      ("SELECT CAST(8 AS BIGINT) AS x", 1)):
        monkeypatch.setattr(E, "oracle_sql",
                            lambda s=sql: {"tail_oracled": s})
        row = E._q_selfcheck_summary(spark, str(tmp_path)).collect()[0]
        assert row["n_oracle_checked"] == 1
        assert row["n_oracle_mismatch"] == want
        assert row["all_true"] == (want == 0)


def test_selfcheck_null_flag_is_red(spark, monkeypatch, tmp_path):
    """A NULL self-assert flag (e.g. F.when without .otherwise) is a
    broken invariant, not a pass: anything other than literal True
    counts in n_false."""
    from pyspark.sql import functions as F

    def ok(s, sf):
        return s.createDataFrame([(1, True)], "x long, est_ge_exact boolean")

    def nullflag(s, sf):
        return (s.createDataFrame([(1,)], "x long")
                .withColumn("est_ge_exact",
                            F.when(F.col("x") > 99, F.lit(True))))

    reg = {f"pad{i:02d}": ok for i in range(50)}
    reg["tail_null"] = nullflag
    monkeypatch.setattr(E, "_registry", lambda: reg)
    monkeypatch.setattr(E, "queries", lambda: reg)
    monkeypatch.setattr(E, "oracle_sql", lambda: {})
    row = E._q_selfcheck_summary(spark, str(tmp_path)).collect()[0]
    assert row["n_false"] == 1
    assert row["all_true"] is False
