"""Local simulation of the driver's correctness gate: runs every
``queries()`` entry on Spark and, where an ``oracle_sql()`` entry exists,
the same query on DuckDB; compares row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main(sf_dir="/root/testdata/sf0.01"):
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry_mod

    # comparison protocol shared with the driver-side selfcheck_summary —
    # one implementation, so the local gate and the in-process oracle
    # re-check can never disagree on normalization or hashing
    norm = entry_mod._norm_cell
    value_hash = entry_mod._value_hash

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entry_mod._ORACLE_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    print("== entry() smoke ==")
    df = entry_mod.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows, schema: {df.columns}")
    bad = [r for r in rows if r["cm_est"] < r["exact_cnt"]]
    print(f"entry cm_est >= exact_cnt violations: {len(bad)}")
    if not rows or bad:
        # the gate must FAIL on a broken flagship, not just narrate it
        print("FAILURES: entry() flagship (empty result or one-sided "
              "guarantee violated)")
        sys.exit(1)

    # self-assertion columns: rows-only sketch queries encode their own
    # guarantee as a boolean per row (the whole point of the flag); the
    # gate must FAIL when any is false, else a broken estimator still
    # passes as "N rows". Single source of truth lives in the entry
    # module (selfcheck_summary enforces the same set driver-side).
    ASSERT_COLS = entry_mod.SELF_ASSERT_COLS

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # two oracled queries deliberately overflow the driver's 50-entry
    # window — selfcheck_summary re-checks them against their oracles
    # in-process, so only an UNEXPECTED overflow is a problem
    overflow = [k for k in list(qs)[50:] if k in oracles]
    if overflow != ["catalog_sample_subset", "csv_source_stats"]:
        print(f"WARNING: oracled queries outside the driver's 50-entry "
              f"window: {overflow} — they will NOT get a driver "
              "correctness row")
    failures = []
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        scols = sdf.columns
        acols = [c for c in scols if c in ASSERT_COLS]
        bad_flags = sum(
            1 for r in srows
            for c in acols if r[scols.index(c)] is not True)
        if bad_flags:
            print(f"{name:28s} FAIL self-assert: {bad_flags} false "
                  f"{acols} rows")
            failures.append(name)
            continue
        if name not in oracles:
            tag = f" self-assert {acols} all-true" if acols else ""
            print(f"{name:28s} rows-only: {len(srows)} rows  "
                  f"cols={scols}{tag}")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = [tuple(norm(v) for v in r) for r in ores.fetchall()]
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        ok_hash = value_hash(srows, scols) == value_hash(orows, ocols)
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{name:28s} {status} rows {len(srows)}/{len(orows)} "
              f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} hash={'=' if ok_hash else 'MISMATCH'}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows and not ok_hash:
                ss, oo = sorted(srows), sorted(orows)
                for a, b in zip(ss, oo):
                    if a != b:
                        print(f"   first diff: spark={a} oracle={b}")
                        break
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall queries consistent with oracle")


if __name__ == "__main__":
    main(*sys.argv[1:])
