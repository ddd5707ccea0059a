"""Token bigram extraction (sketchlib.ngrams): Arrow-buffer pairing vs a
per-row Python reference (row boundaries, nulls, empties, singletons),
packing invertibility, and the distributed CM-over-bigrams build."""

import math

import numpy as np
import pyarrow as pa
import pytest

from sketchlib.countmin import CMConfig, CountMinSketch
from sketchlib.ngrams import batch_bigrams, unpack_bigram, unpack_bigrams


def _ref_bigrams(rows):
    out = []
    for r in rows:
        if r is None:
            continue
        for x, y in zip(r, r[1:]):
            out.append((int(x) << 31) | int(y))
    return sorted(out)


@pytest.mark.parametrize("rows", [
    [[1, 2, 3], [4, 5], [6]],
    [[], [7, 8], None, [9], [10, 11, 12, 13]],
    [None, None, []],
    [[2**31 - 1, 0, 2**31 - 1]],
    [[5]],
    [],
])
def test_batch_bigrams_matches_reference(rows):
    batch = pa.RecordBatch.from_pydict(
        {"tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    got = batch_bigrams(batch, 0)
    assert sorted(got.tolist()) == _ref_bigrams(rows)
    assert got.dtype == np.int64
    if got.shape[0]:
        assert np.all(got >= 0)            # 62-bit packing stays positive


def test_packing_invertible():
    a, b = 2**31 - 1, 123456
    key = (a << 31) | b
    assert unpack_bigram(key) == (a, b)
    ka, kb = unpack_bigrams(np.array([key, (7 << 31) | 9]))
    assert ka.tolist() == [a, 7] and kb.tolist() == [b, 9]


def test_sliced_record_batch():
    """Arrow slices share buffers with nonzero offsets — pairing must
    respect the slice's own rows only."""
    big = pa.RecordBatch.from_pydict(
        {"tokens": pa.array([[1, 2], [3, 4, 5], [6, 7], [8]],
                            type=pa.list_(pa.int32()))})
    sl = big.slice(1, 2)                   # rows [3,4,5], [6,7]
    got = sorted(batch_bigrams(sl, 0).tolist())
    assert got == _ref_bigrams([[3, 4, 5], [6, 7]])


def test_parquet_direct_bigram_build_matches_dataframe_path(spark, tmp_path):
    """The parquet-direct columnar builder accepts the same extraction
    hook (extract_array): a CM over bigrams built straight from row-group
    reads is byte-identical to the DataFrame-path build over the same
    table."""
    import functools

    from sketchlib.datagen import generate_token_table
    from sketchlib.spark_build import (build_aggregator,
                                       build_aggregator_parquet)
    from sketchlib.ngrams import array_bigrams

    path = str(tmp_path / "toks.parquet")
    generate_token_table(path, rows=600, seed=77, dist="zipf")
    cfg = CMConfig(eps=1e-3, delta=math.exp(-3), seed=3)
    fac = functools.partial(CountMinSketch, cfg)
    direct = build_aggregator_parquet(spark, path, "tokens", fac,
                                      extract_array=array_bigrams)
    via_df = build_aggregator(spark.read.parquet(path), "tokens", fac,
                              extract=batch_bigrams)
    assert direct.sketch.to_bytes() == via_df.sketch.to_bytes()
    assert direct.sketch.n_items > 0


def test_distributed_bigram_cm_matches_local(spark):
    import functools

    from sketchlib.spark_build import build_aggregator

    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 50, rng.integers(2, 30)).astype(int).tolist()
            for _ in range(400)]
    df = spark.createDataFrame([(r,) for r in rows],
                               "tokens array<int>").repartition(8)
    cfg = CMConfig(eps=1e-3, delta=math.exp(-3), seed=99)
    res = build_aggregator(df, "tokens",
                           functools.partial(CountMinSketch, cfg),
                           extract=batch_bigrams)
    local = CountMinSketch(cfg)
    local.update_batch(np.array(_ref_bigrams(rows), dtype=np.int64))
    assert res.sketch.to_bytes() == local.to_bytes()
    # exact top bigram is never underestimated and within the bound
    flat = np.array(_ref_bigrams(rows), dtype=np.int64)
    uniq, cnt = np.unique(flat, return_counts=True)
    top = uniq[cnt.argmax()]
    est = int(res.sketch.point_query(int(top)))
    assert est >= int(cnt.max())
    assert est - int(cnt.max()) <= cfg.eps * flat.shape[0]


def test_array_bigrams_rejects_out_of_domain_tokens():
    from sketchlib.ngrams import array_bigrams

    for bad in ([[1, 2**31]], [[-1, 5]], [[2**40, 2**40 + 1]]):
        col = pa.array(bad, type=pa.list_(pa.int64()))
        with pytest.raises(ValueError, match="2\\*\\*31"):
            array_bigrams(col)
    # boundary value 2**31 - 1 stays legal
    ok = pa.array([[2**31 - 1, 2**31 - 1]], type=pa.list_(pa.int64()))
    assert array_bigrams(ok).tolist() == [((2**31 - 1) << 31) | (2**31 - 1)]


def test_bigram_query_survives_empty_docs(spark, tmp_path):
    """Regression: _q_cm_token_bigrams' exact-verification pass used
    F.slice('tokens', 1, n-1), which Spark rejects with length -1 on a
    doc that tokenizes to an empty array; the query must filter such
    rows before slicing."""
    import __spark_entry__ as E

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "en", "web", 22),
         (2, "", "en", "web", 0),
         (3, "   ", "en", "web", 3),
         (4, "the cat sat", "en", "cc", 11),
         (5, "one", "en", "cc", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    out = E.queries()["cm_token_bigrams"](spark, sf).collect()
    assert len(out) > 0
    assert all(r["est_ge_exact"] and r["within_bound"] for r in out)


def _ref_ngrams(rows, n, seed):
    """Per-row Python reference of array_ngrams' polynomial hash."""
    C = 0x9E3779B97F4A7C15
    M = (1 << 64) - 1
    out = []
    for r in rows:
        if r is None or len(r) < n:
            continue
        for i in range(len(r) - n + 1):
            h = (seed * C) & M
            for x in r[i:i + n]:
                h = (h * C + int(x)) & M
            h ^= h >> 29
            h = (h * C) & M
            out.append(h & 0x7FFFFFFFFFFFFFFF)
    return sorted(out)


@pytest.mark.parametrize("n", [2, 3, 5, 13])
@pytest.mark.parametrize("rows", [
    [[1, 2, 3, 4, 5], [6, 7], [8]],
    [[], [9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22], None],
    [None, None, []],
    [[2**31 - 1] * 15, [0] * 3],
    [],
])
def test_array_ngrams_matches_reference(rows, n):
    from sketchlib.ngrams import array_ngrams
    col = pa.array(rows, type=pa.list_(pa.int32()))
    got = array_ngrams(col, n, seed=7)
    assert sorted(got.tolist()) == _ref_ngrams(rows, n, 7)
    assert got.dtype == np.int64
    if got.shape[0]:
        assert np.all(got >= 0)


def test_array_ngrams_random_ragged():
    from sketchlib.ngrams import array_ngrams
    rng = np.random.default_rng(3)
    rows = []
    for _ in range(200):
        k = int(rng.integers(0, 20))
        rows.append(None if k == 19
                    else rng.integers(0, 2**31, size=k).tolist())
    col = pa.array(rows, type=pa.list_(pa.int32()))
    for n in (2, 3, 13):
        assert (sorted(array_ngrams(col, n, seed=11).tolist())
                == _ref_ngrams(rows, n, 11))


def test_array_ngrams_n_validation():
    from sketchlib.ngrams import array_ngrams
    with pytest.raises(ValueError, match="n >= 2"):
        array_ngrams(pa.array([[1, 2]], type=pa.list_(pa.int32())), 1)


def test_shingle_table_matches_reference(spark):
    from sketchlib.ngrams import shingle_table
    rows = [("a", list(range(20))), ("b", [1, 2]), ("c", []),
            ("d", list(range(100, 116)))]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = sorted((r["doc_id"], r["shingle"])
                 for r in shingle_table(df, "tokens", "doc_id", 13).collect())
    ref = []
    for doc, toks in rows:
        for k in _ref_ngrams([toks], 13, 1337):
            ref.append((doc, k))
    assert got == sorted(ref)
    assert not [d for d, _ in got if d in ("b", "c")]   # too short


def test_token_decontaminate_exact_and_pruned(spark):
    """The Bloom-prescreened screen equals the plain all-shingles join:
    planted overlaps found with exact counts, clean docs at 0."""
    from sketchlib.ngrams import shingle_table
    from sketchlib.pipeline import token_decontaminate
    rng = np.random.default_rng(5)
    evalset = spark.createDataFrame(
        [(f"e{i}", rng.integers(0, 2**31, size=40).tolist())
         for i in range(5)], "doc_id string, tokens array<int>")
    eval_rows = {r["doc_id"]: r["tokens"]
                 for r in evalset.collect()}
    corpus_rows = []
    for i in range(30):
        toks = rng.integers(0, 2**31, size=60).tolist()
        if i % 5 == 0:   # plant a 20-token eval span => 8 shared 13-grams
            span = eval_rows[f"e{i % 5 + (i // 5) % 5}"][3:23]
            toks[10:30] = span
        corpus_rows.append((f"d{i}", toks))
    corpus = spark.createDataFrame(corpus_rows,
                                   "doc_id string, tokens array<int>")

    got = {r["doc_id"]: r["matched_shingles"]
           for r in token_decontaminate(spark, corpus, evalset).collect()}

    # oracle: plain join of the two shingle tables, no bloom
    c_sh = shingle_table(corpus, "tokens", "doc_id", 13)
    e_sh = (shingle_table(evalset, "tokens", "doc_id", 13)
            .select("shingle").distinct())
    from pyspark.sql import functions as F
    exact = {r["doc_id"]: r["m"] for r in
             (c_sh.join(e_sh, "shingle", "left_semi")
              .groupBy("doc_id")
              .agg(F.count_distinct("shingle").alias("m")).collect())}
    assert len(got) == 30
    for d, m in got.items():
        assert m == exact.get(d, 0), (d, m, exact.get(d))
    assert sum(1 for m in got.values() if m > 0) >= 6   # plants found


def test_null_elements_refused():
    """Null ELEMENTS inside token lists would degrade Arrow's flatten to
    float64 — platform-dependent garbage hashes and decontamination
    false negatives — so every extractor refuses them loudly. Null ROWS
    remain fine (length 0)."""
    from sketchlib.ngrams import array_bigrams, array_ngrams
    bad = pa.array([[1, None, 3, 4]], type=pa.list_(pa.int32()))
    with pytest.raises(ValueError, match="null ELEMENTS"):
        array_ngrams(bad, 2)
    with pytest.raises(ValueError, match="null ELEMENTS"):
        array_bigrams(bad)
    ok = pa.array([None, [1, 2, 3], []], type=pa.list_(pa.int32()))
    assert array_ngrams(ok, 2).shape[0] == 2


def test_pmi_collocations_certified_bracket():
    """Every returned candidate's certified [pmi_lb, pmi_ub] contains
    the exact PMI; CM never undercounts; ranking is deterministic."""
    from collections import Counter

    from sketchlib.mg import MisraGries
    from sketchlib.ngrams import pmi_collocations

    rng = np.random.default_rng(42)
    # background zipf stream + a planted collocation (7001, 7002) whose
    # parts are rare alone: high PMI by construction
    rows = [rng.zipf(1.3, rng.integers(3, 40)).astype(np.int64) % 5000
            for _ in range(400)]
    rows += [np.array([7001, 7002], dtype=np.int64)] * 30

    uni = Counter()
    bi = Counter()
    for r in rows:
        uni.update(int(x) for x in r)
        bi.update((int(x) << 31) | int(y) for x, y in zip(r, r[1:]))
    n_tok = sum(uni.values())
    n_pairs = sum(bi.values())

    cfg = CMConfig(eps=1e-3, delta=1e-3, seed=7)
    uni_cm, bi_cm = CountMinSketch(cfg), CountMinSketch(cfg)
    mg, uni_mg = MisraGries(256), MisraGries(256)
    for r in rows:
        uni_cm.update_batch(r)
        uni_mg.update_batch(r)
    keys = np.fromiter(
        (k for k, c in bi.items() for _ in range(c)), dtype=np.int64)
    bi_cm.update_batch(keys)
    mg.update_batch(keys)

    got = pmi_collocations(uni_cm, bi_cm, mg, uni_mg=uni_mg, k=15)
    assert got, "no candidates survived"
    for a, b, est_ab, lb, pmi, ub in got:
        key = (a << 31) | b
        exact_ab, exact_a, exact_b = bi[key], uni[a], uni[b]
        assert est_ab >= exact_ab > 0
        exact_pmi = math.log((exact_ab / n_pairs)
                             / ((exact_a / n_tok) * (exact_b / n_tok)))
        assert lb <= exact_pmi <= ub
        assert lb <= pmi <= ub
    # the planted collocation must rank first by certified lower bound
    assert (got[0][0], got[0][1]) == (7001, 7002)
    # deterministic: same blobs, same ranking
    assert got == pmi_collocations(uni_cm, bi_cm, mg, uni_mg=uni_mg,
                                   k=15)
    # the unigram MG tightens (never loosens) the certified upper end
    loose = {(r[0], r[1]): r[5]
             for r in pmi_collocations(uni_cm, bi_cm, mg, k=15)}
    for a, b, _, _, _, ub in got:
        assert ub <= loose[(a, b)] + 1e-12


def test_pmi_collocations_min_pairs_floor():
    from sketchlib.mg import MisraGries
    from sketchlib.ngrams import pmi_collocations

    cfg = CMConfig(eps=1e-3, delta=1e-3, seed=7)
    uni_cm, bi_cm = CountMinSketch(cfg), CountMinSketch(cfg)
    mg = MisraGries(64)
    row = np.array([1, 2] * 50 + [3, 4], dtype=np.int64)
    uni_cm.update_batch(row)
    pairs = np.fromiter(((int(x) << 31) | int(y)
                         for x, y in zip(row, row[1:])), dtype=np.int64)
    bi_cm.update_batch(pairs)
    mg.update_batch(pairs)
    allc = pmi_collocations(uni_cm, bi_cm, mg, k=10)
    floored = pmi_collocations(uni_cm, bi_cm, mg, k=10, min_pairs=5)
    assert len(floored) < len(allc)
    assert all(r[2] >= 5 for r in floored)
