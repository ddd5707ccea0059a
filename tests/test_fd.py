"""Frequent Directions (sketchlib.fd): deterministic Gram-sketch bound,
mergeability across arbitrary orders, serialization, and the distributed
build through the generic aggregator paths."""

import functools

import numpy as np
import pytest

from sketchlib.fd import FrequentDirections

DIM = 48
ELL = 12


def _matrix(n=1500, seed=7):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n, 6))
    v = rng.normal(size=(6, DIM))
    return u @ v + 0.1 * rng.normal(size=(n, DIM))   # low-rank + noise


def _spec_err(a_gram, fd):
    b = fd.rows()
    ev = np.linalg.eigvalsh(a_gram - b.T @ b)
    return float(max(abs(ev[0]), abs(ev[-1]))), float(ev[0])


def test_bound_and_certificate():
    a = _matrix()
    fd = FrequentDirections(ell=ELL, dim=DIM)
    fd.update_batch(a)
    assert fd.n_items == a.shape[0]
    assert fd.fro2 == pytest.approx(float((a * a).sum()), rel=1e-12)
    spec, min_ev = _spec_err(a.T @ a, fd)
    tol = 1e-9 * fd.fro2
    assert min_ev >= -tol                      # A'A - B'B is PSD
    assert spec <= fd.error_certificate() + tol
    assert fd.error_certificate() <= fd.cov_error_bound() + tol
    # the sketch never stores more than the buffer
    assert fd.rows().shape[0] <= 2 * ELL


def test_exact_below_buffer():
    """Streams shorter than the buffer are represented exactly."""
    a = _matrix(n=2 * ELL - 1, seed=3)
    fd = FrequentDirections(ell=ELL, dim=DIM)
    fd.update_batch(a)
    spec, _ = _spec_err(a.T @ a, fd)
    assert spec <= 1e-9 * fd.fro2
    assert fd.error_certificate() == 0.0


def test_svd_fallback_path_keeps_bound(monkeypatch):
    """Regression (review r3): the gesdd-failure fallback used to re-run
    the identical np.linalg.svd call (a no-op retry). Force every SVD to
    fail and verify the eigh-of-Gram fallback still produces a sketch
    satisfying the FD bound and the PSD invariant."""
    def boom(*args, **kwargs):
        raise np.linalg.LinAlgError("forced gesdd failure")

    monkeypatch.setattr(np.linalg, "svd", boom)
    a = _matrix()
    fd = FrequentDirections(ell=ELL, dim=DIM)
    fd.update_batch(a)
    monkeypatch.undo()  # _spec_err may itself use svd/eigh freely
    assert fd.fro2 == pytest.approx(float((a * a).sum()), rel=1e-12)
    spec, min_ev = _spec_err(a.T @ a, fd)
    tol = 1e-6 * fd.fro2  # Gram squaring loses some precision vs gesdd
    assert min_ev >= -tol
    assert spec <= fd.error_certificate() + tol
    assert fd.rows().shape[0] <= 2 * ELL


def test_merge_any_order_keeps_bound():
    a = _matrix()
    gram = a.T @ a
    parts = []
    for i in range(5):
        f = FrequentDirections(ell=ELL, dim=DIM)
        f.update_batch(a[i * 300:(i + 1) * 300])
        parts.append(f.to_bytes())
    for order in (range(5), reversed(range(5)), (2, 0, 4, 1, 3)):
        m = FrequentDirections(ell=ELL, dim=DIM)
        for i in order:
            m.merge(FrequentDirections.from_bytes(parts[i]))
        assert m.n_items == a.shape[0]
        assert m.fro2 == pytest.approx(float((a * a).sum()), rel=1e-9)
        spec, min_ev = _spec_err(gram, m)
        tol = 1e-9 * m.fro2
        assert min_ev >= -tol
        assert spec <= m.error_certificate() + tol
        assert m.error_certificate() <= m.cov_error_bound() + tol


def test_flat_input_equals_matrix_input():
    a = _matrix(n=400, seed=11).astype(np.float32)
    f1 = FrequentDirections(ell=ELL, dim=DIM)
    f1.update_batch(a)
    f2 = FrequentDirections(ell=ELL, dim=DIM)
    f2.update_batch(a.ravel())                 # the Spark-builder shape
    assert f1.to_bytes() == f2.to_bytes()
    with pytest.raises(ValueError):
        f2.update_batch(np.zeros(DIM + 1))     # not a multiple of dim


def test_roundtrip_and_config_checks():
    a = _matrix(n=600, seed=5)
    fd = FrequentDirections(ell=ELL, dim=DIM)
    fd.update_batch(a)
    rt = FrequentDirections.from_bytes(fd.to_bytes())
    assert rt.to_bytes() == fd.to_bytes()
    assert (rt.n_items, rt.fro2, rt.shrink_total) == (
        fd.n_items, fd.fro2, fd.shrink_total)
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(ell=ELL + 1, dim=DIM))
    with pytest.raises(ValueError):
        FrequentDirections(ell=1, dim=DIM)
    from sketchlib import serde
    assert isinstance(serde.loads(fd.to_bytes()), FrequentDirections)


@pytest.fixture(scope="module")
def emb_parquet(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    a = _matrix(n=1200, seed=19).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(a.shape[0]), pa.int64()),
        "embedding": pa.array(list(a), pa.list_(pa.float32())),
    })
    path = str(tmp_path_factory.mktemp("fd") / "emb.parquet")
    pq.write_table(t, path, row_group_size=100)
    return path, a


def test_spark_build_aggregator(spark, emb_parquet):
    """Distributed FD build through the generic DataFrame partial+tree-merge
    path: bound holds against the exact distributed Gram, counts exact."""
    from sketchlib.similarity import gram_exact
    from sketchlib.spark_build import build_aggregator
    path, a = emb_parquet
    df = spark.read.parquet(path).repartition(7)
    res = build_aggregator(df, "embedding",
                           functools.partial(FrequentDirections, ELL, DIM))
    fd = res.sketch
    assert fd.n_items == a.shape[0]
    assert res.n_rows == a.shape[0]
    g, n = gram_exact(df, "embedding", DIM)
    assert n == a.shape[0]
    a64 = a.astype(np.float64)
    assert np.allclose(g, a64.T @ a64, rtol=1e-6, atol=1e-6)
    spec, min_ev = _spec_err(g, fd)
    tol = 1e-9 * fd.fro2
    assert min_ev >= -tol
    assert spec <= fd.error_certificate() + tol
    assert fd.error_certificate() <= fd.cov_error_bound() + tol


def test_spark_build_parquet_direct(spark, emb_parquet):
    """Parquet-direct build (row-group slices, no JVM scan) satisfies the
    same bound and sees every row exactly once."""
    from sketchlib.spark_build import build_aggregator_parquet
    path, a = emb_parquet
    res = build_aggregator_parquet(
        spark, path, "embedding",
        functools.partial(FrequentDirections, ELL, DIM))
    fd = res.sketch
    assert fd.n_items == a.shape[0]
    a64 = a.astype(np.float64)
    spec, min_ev = _spec_err(a64.T @ a64, fd)
    tol = 1e-9 * fd.fro2
    assert min_ev >= -tol
    assert spec <= fd.error_certificate() + tol


def test_project_onto_matches_numpy(spark, emb_parquet):
    """Distributed projection == numpy matmul, and the FD projection
    guarantee holds: rank-k error within k*certificate of optimal."""
    from sketchlib.similarity import project_onto
    from sketchlib.spark_build import build_aggregator
    path, a = emb_parquet
    df = spark.read.parquet(path).repartition(5)
    fd = build_aggregator(df, "embedding",
                          functools.partial(FrequentDirections, ELL, DIM)
                          ).sketch
    k = 4
    v = fd.top_directions(k)
    got = {r["vec_id"]: np.asarray(r["proj"])
           for r in project_onto(df, "embedding", v,
                                 keep_cols=("vec_id",)).collect()}
    a64 = a.astype(np.float64)
    want = a64 @ v.T
    assert len(got) == a.shape[0]
    for i in range(0, a.shape[0], 97):
        assert np.allclose(got[i], want[i], rtol=1e-6, atol=1e-9)
    # GLPW16 projection bound, certificate form
    fro2 = float((a64 * a64).sum())
    err_fd = fro2 - float((want * want).sum())
    evals = np.linalg.eigvalsh(a64.T @ a64)
    err_exact = fro2 - float(evals[-k:].sum())
    tol = 1e-9 * fro2
    assert err_exact - tol <= err_fd <= err_exact + k * fd.error_certificate() + tol
