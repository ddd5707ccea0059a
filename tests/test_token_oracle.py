"""Oracle-checked token-array equality (the BASELINE.json input-hint
per-row invariant): a tokenizer expressible in BOTH engines — word ->
int32 token via the first 8 hex chars of md5 — maps documents.text to
(doc_id, tokens array<int32>, n_tok) in Spark and, independently, in
DuckDB SQL; the token ARRAYS must be equal row by row, not just counts.

This pins the whole ingest shape an external engine can see: split
semantics (single spaces, empties dropped), per-word hashing, array
order, and n_tok. The production tokenizer uses xxhash64 (JVM-side,
cheaper) which DuckDB lacks — md5 is the cross-engine witness that the
Spark pipeline produces exactly the declared arrays.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
MOD = 2**31


def _spark_tokens(spark):
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    tok = F.transform(
        words,
        lambda x: F.pmod(F.conv(F.substring(F.md5(x), 1, 8), 16, 10)
                         .cast("long"), F.lit(MOD)).cast("int"))
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", tok.alias("tokens"))
            .withColumn("n_tok", F.size("tokens")))


def _duckdb_tokens():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return con.sql(f"""
        SELECT doc_id,
               list_transform(
                   list_filter(string_split(text, ' '), x -> x <> ''),
                   x -> CAST(('0x' || substr(md5(x), 1, 8))::BIGINT
                             % {MOD} AS INT)) AS tokens
        FROM documents
    """).fetchall()


def test_token_arrays_equal_spark_vs_duckdb(spark):
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
           for r in _spark_tokens(spark).collect()}
    oracle = {doc_id: list(tokens) for doc_id, tokens in _duckdb_tokens()}
    assert set(got) == set(oracle)
    assert len(got) == 500
    mismatches = [d for d in oracle if got[d][0] != oracle[d]]
    assert mismatches == []                       # per-row array equality
    assert all(got[d][1] == len(oracle[d]) for d in oracle)   # n_tok
    # sanity: tokens are genuinely int32-ranged and non-degenerate
    flat = [t for d in oracle for t in oracle[d]]
    assert flat and all(0 <= t < MOD for t in flat)
    assert len(set(flat)) > 1


def test_md5_word_token_matches_python_reference(spark):
    """The md5 mapping itself, pinned against hashlib (a third
    implementation) for a handful of words."""
    import hashlib
    words = ["the", "scan", "window", "a", "zorder"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", F.pmod(F.conv(F.substring(F.md5("w"), 1, 8), 16, 10)
                    .cast("long"), F.lit(MOD)).cast("int").alias("tok"))
    got = {r["w"]: r["tok"] for r in df.collect()}
    for w in words:
        want = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % MOD
        assert got[w] == want, w
