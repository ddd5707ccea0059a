"""Source connectors: parquet/Iceberg resolution (test_spark_build covers
the parquet-direct path) + JSONL/CSV pinned-schema readers."""

import pytest
from pyspark.sql import functions as F

from sketchlib.sources import read_csv, read_jsonl

SCHEMA = "doc_id bigint, text string, source string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "alpha beta, gamma", "s0"), (1, "with \"quotes\" in it", "s1"),
         (2, "", "s1"), (3, "plain", "s0"),
         (4, "line one\nline two", "s0")],
        SCHEMA)


def test_jsonl_roundtrip(spark, docs, tmp_path):
    p = str(tmp_path / "docs_jsonl")
    docs.write.json(p)
    back = read_jsonl(spark, p, SCHEMA)
    assert back.schema == docs.schema  # pinned, not inferred
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_csv_roundtrip_quoting(spark, docs, tmp_path):
    p = str(tmp_path / "docs_csv")
    docs.write.option("header", "true").csv(p)
    back = read_csv(spark, p, SCHEMA)
    rows = {r["doc_id"]: r for r in back.collect()}
    # embedded comma and quotes survive the writer's quoting
    assert rows[0]["text"] == "alpha beta, gamma"
    assert rows[1]["text"] == 'with "quotes" in it'
    # CSV cannot distinguish empty string from null — documented lossiness
    assert rows[2]["text"] in ("", None)
    # embedded newline: the writer quotes it across physical lines;
    # multiLine=True (default) reassembles the record
    assert rows[4]["text"] == "line one\nline two"


def test_csv_rfc4180_escape(spark, tmp_path):
    """External RFC-4180 corpora double the quote char instead of
    backslash-escaping; escape='\"' parses them."""
    p = tmp_path / "rfc"
    p.mkdir()
    (p / "part-0.csv").write_text(
        'doc_id,text,source\n'
        '7,"she said ""hi"", then left",s9\n')
    back = read_csv(spark, str(p), SCHEMA, escape='"')
    [r] = back.collect()
    assert r["doc_id"] == 7
    assert r["text"] == 'she said "hi", then left'


def test_jsonl_corrupt_record_surfaced(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "source": "s"}\n'
        'this is not json\n')
    back = read_jsonl(spark, str(p), SCHEMA + ", _corrupt_record string")
    rows = back.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["doc_id"] == 1
    assert len(bad) == 1  # surfaced, not fatal
