"""Count-Sketch: unbiasedness, the eps*||f||_2 point-error bound, the AMS
F2 estimator, signed inner products, and byte-identical merges for every
partitioning/merge order — plus the distributed build through the generic
aggregator topology."""

import numpy as np
import pytest

from sketchlib.countsketch import CSConfig, CountSketch
from sketchlib.serde import loads


def _zipf_stream(n=200_000, a=1.2, seed=7):
    return (np.random.default_rng(seed).zipf(a, n) % 100_000).astype(np.int64)


def _exact(keys):
    u, c = np.unique(keys, return_counts=True)
    return u, c


def _build(keys, cfg, **kw):
    cs = CountSketch(cfg)
    cs.update_batch(keys, **kw)
    return cs


def test_config_shapes():
    cfg = CSConfig.from_eps(0.05, np.exp(-3))
    assert cfg.width == int(np.ceil(3 / 0.05**2))
    assert cfg.depth == 3
    assert len(cfg.row_seeds) == 3
    assert cfg.eps == pytest.approx(np.sqrt(3 / cfg.width))
    with pytest.raises(ValueError):
        CSConfig(width=0, depth=3)
    with pytest.raises(ValueError):
        CSConfig.from_eps(0.0, 0.1)


def test_point_error_bound_l2():
    keys = _zipf_stream()
    cfg = CSConfig.from_eps(0.05, np.exp(-4), seed=99)  # w=1200, d=4
    cs = _build(keys, cfg)
    u, c = _exact(keys)
    l2 = float(np.sqrt((c.astype(np.float64) ** 2).sum()))
    est = cs.point_query_batch(u)
    err = np.abs(est - c)
    frac_ok = float((err <= cfg.eps * l2).mean())
    # bound holds per-probe w.p. >= 1 - delta = 1 - e^-4 ~ 0.982
    assert frac_ok >= 1 - np.exp(-4), frac_ok
    # absent keys estimate near zero on the same scale
    absent = np.arange(200_000, 200_100, dtype=np.int64)
    assert np.all(np.abs(cs.point_query_batch(absent)) <= cfg.eps * l2 * 2)


def test_unbiasedness_over_seeds():
    """The mean estimate across independent hash families converges to the
    exact count — the property Count-Min cannot have (it is one-sided)."""
    keys = _zipf_stream(n=50_000, seed=3)
    u, c = _exact(keys)
    probe = u[np.argsort(c)[-5:]]          # the 5 heaviest keys
    exact = c[np.argsort(c)[-5:]].astype(np.float64)
    ests = np.zeros((40, 5))
    for i in range(40):
        cfg = CSConfig(width=256, depth=1, seed=1000 + i)
        ests[i] = _build(keys, cfg).point_query_batch(probe)
    mean = ests.mean(axis=0)
    l2 = float(np.sqrt((c.astype(np.float64) ** 2).sum()))
    se = l2 / np.sqrt(256) / np.sqrt(40) * 4     # 4 standard errors
    assert np.all(np.abs(mean - exact) <= se), (mean, exact, se)


def test_f2_estimate():
    keys = _zipf_stream()
    u, c = _exact(keys)
    f2 = float((c.astype(np.float64) ** 2).sum())
    cfg = CSConfig(width=2048, depth=5, seed=17)
    cs = _build(keys, cfg)
    rel = abs(cs.f2_estimate() - f2) / f2
    assert rel <= 4 / np.sqrt(cfg.width), rel
    assert cs.l2_estimate() == pytest.approx(np.sqrt(cs.f2_estimate()))


def test_inner_product_unbiased_scale():
    rng = np.random.default_rng(5)
    a = (rng.zipf(1.3, 80_000) % 10_000).astype(np.int64)
    b = (rng.zipf(1.3, 80_000) % 10_000).astype(np.int64)
    ua, ca = _exact(a)
    ub, cb = _exact(b)
    exact_ip = 0.0
    common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
    exact_ip = float((ca[ia].astype(np.float64) * cb[ib]).sum())
    cfg = CSConfig(width=4096, depth=5, seed=23)
    ip = _build(a, cfg).inner_product(_build(b, cfg))
    # median-of-rows IP error ~ ||a||_2 ||b||_2 / sqrt(w)
    la = np.sqrt((ca.astype(np.float64) ** 2).sum())
    lb = np.sqrt((cb.astype(np.float64) ** 2).sum())
    assert abs(ip - exact_ip) <= 4 * la * lb / np.sqrt(cfg.width)


def test_weighted_updates_and_counts_path():
    cfg = CSConfig(width=512, depth=5, seed=2)
    cs1 = CountSketch(cfg)
    cs1.update_batch(np.array([1, 2, 3], dtype=np.int64),
                     counts=np.array([10, 20, 30], dtype=np.int64))
    cs2 = CountSketch(cfg)
    cs2.update_batch(np.repeat(np.array([1, 2, 3], dtype=np.int64),
                               [10, 20, 30]))
    assert np.array_equal(cs1.table, cs2.table)
    assert cs1.total_count == cs2.total_count == 60
    with pytest.raises(ValueError):
        cs1.update_batch(np.array([1, 2]), counts=np.array([1]))


def test_preaggregate_identical():
    keys = _zipf_stream(n=30_000)
    cfg = CSConfig(width=777, depth=3, seed=4)
    a = _build(keys, cfg, preaggregate=True)
    b = _build(keys, cfg, preaggregate=False)
    assert np.array_equal(a.table, b.table)


def test_merge_byte_identical_any_partitioning():
    keys = _zipf_stream(n=60_000)
    cfg = CSConfig(width=1024, depth=4, seed=11)
    ref = _build(keys, cfg).to_bytes()
    rng = np.random.default_rng(13)
    for n_parts in (2, 5, 16):
        parts = np.array_split(keys, n_parts)
        order = rng.permutation(n_parts)
        acc = CountSketch(cfg)
        for i in order:
            acc.merge(_build(parts[i], cfg))
        assert acc.to_bytes() == ref
    with pytest.raises(ValueError):
        CountSketch(cfg).merge(CountSketch(CSConfig(width=1024, depth=4,
                                                    seed=12)))


def test_serde_roundtrip_and_magic_dispatch():
    keys = _zipf_stream(n=10_000)
    cs = _build(keys, CSConfig(width=300, depth=3, seed=6))
    blob = cs.to_bytes()
    back = loads(blob)
    assert isinstance(back, CountSketch)
    assert back.cfg == cs.cfg
    assert np.array_equal(back.table, cs.table)
    assert (back.n_items, back.total_count) == (cs.n_items, cs.total_count)
    assert back.to_bytes() == blob
    with pytest.raises(ValueError):
        CountSketch.from_bytes(blob[:-8])


def test_clear_and_nbytes():
    cs = _build(np.arange(100), CSConfig(width=64, depth=2))
    assert cs.nbytes() == 64 * 2 * 8
    cs.clear()
    assert cs.n_items == 0 and not cs.table.any()


def test_wide_table_scatter_path_matches_bincount():
    """Force the add.at path (width above the bincount crossover) and check
    it lands the same counters as a narrow-table rebuild of the same keys
    modulo an identical hash — via total mass preserved and serde shape."""
    keys = _zipf_stream(n=20_000)
    cfg = CSConfig(width=(1 << 17) + 1, depth=2, seed=3)
    cs = _build(keys, cfg)
    # signed mass: sum of |table| bounded by n, per row total signed mass
    # equals sum of signs which is whatever it is — but n_items/total exact
    assert cs.n_items == cs.total_count == 20_000
    u, c = _exact(keys)
    l2 = float(np.sqrt((c.astype(np.float64) ** 2).sum()))
    err = np.abs(cs.point_query_batch(u) - c)
    assert float((err <= np.sqrt(3 / cfg.width) * l2).mean()) >= 0.8


def test_distributed_build_matches_local(spark):
    """build_aggregator over the token table == local single-pass build,
    byte-identical."""
    from sketchlib.spark_build import build_aggregator
    import functools
    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    vals = df.select("user_id")
    cfg = CSConfig(width=512, depth=4, seed=77)
    res = build_aggregator(vals, "user_id",
                           functools.partial(CountSketch, cfg))
    local = CountSketch(cfg)
    arr = np.array([r[0] for r in vals.collect()], dtype=np.int64)
    local.update_batch(arr)
    assert res.sketch.to_bytes() == local.to_bytes()
    assert res.n_rows == arr.shape[0]


def test_sketch_probe_col_countsketch(spark):
    """The generalized broadcast probe column serves Count-Sketch too:
    per-row unbiased estimates (double-typed — medians of an even depth
    are half-integral) equal the local batch query exactly."""
    from pyspark.sql import functions as F
    from sketchlib.spark_build import build_aggregator, sketch_probe_col
    import functools
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cfg = CSConfig(width=512, depth=4, seed=5)
    sk = build_aggregator(df, "user_id",
                          functools.partial(CountSketch, cfg)).sketch
    probed = (df.select("user_id").distinct()
              .withColumn("est", sketch_probe_col(
                  spark, sk, F.col("user_id"),
                  method="point_query_batch", rtype="double"))
              .collect())
    keys = np.array([r["user_id"] for r in probed], dtype=np.int64)
    got = np.array([r["est"] for r in probed])
    assert np.array_equal(got, sk.point_query_batch(keys))
    # estimates aggregate distributively without driver-side rows
    total = (df.select("user_id")
             .withColumn("est", sketch_probe_col(
                 spark, sk, F.col("user_id"),
                 method="point_query_batch", rtype="double"))
             .agg(F.sum("est")).collect()[0][0])
    assert total is not None


def test_failed_update_leaves_state_untouched():
    """A rejected counts-length mismatch must not mutate n_items/total
    (a caught ValueError would otherwise break partial byte-identity)."""
    cfg = CSConfig(width=128, depth=3, seed=1)
    cs = _build(np.arange(50), cfg)
    before = cs.to_bytes()
    with pytest.raises(ValueError):
        cs.update_batch(np.array([1, 2, 3]), counts=np.array([1]))
    assert cs.to_bytes() == before
