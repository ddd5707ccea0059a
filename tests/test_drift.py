"""Certified TV-drift bounds (sketchlib.drift): the envelope must bracket
the exact empirical TV distance in EVERY regime — exact (distinct <= k,
bounds collapse to equality), sketchy (heavy shrinkage), and under any
merge order — because the bound is advertised as certain, not
probabilistic."""

import numpy as np
import pytest

from sketchlib.drift import DriftBounds, top_movers, tv_bounds
from sketchlib.mg import MisraGries


def _mg(stream, k=64, parts=1, order=None):
    chunks = np.array_split(np.asarray(stream, dtype=np.int64), parts)
    summaries = []
    for c in chunks:
        m = MisraGries(k)
        if len(c):
            m.update_batch(c)
        summaries.append(m)
    idx = list(range(len(summaries))) if order is None else list(order)
    acc = summaries[idx[0]]
    for i in idx[1:]:
        acc.merge(summaries[i])
    return acc


def _exact_tv(a, b):
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    keys = np.union1d(np.unique(a), np.unique(b))
    pa = np.array([(a == t).sum() for t in keys], dtype=np.float64) / len(a)
    pb = np.array([(b == t).sum() for t in keys], dtype=np.float64) / len(b)
    return 0.5 * float(np.abs(pa - pb).sum())


def test_exact_regime_identical_collapses_to_zero():
    rng = np.random.default_rng(1)
    s = rng.integers(0, 20, 5000)          # 20 distinct << k
    r = tv_bounds(_mg(s, k=64), _mg(s, k=64))
    assert r.d_a == r.d_b == 0.0
    assert r.tv_lb == r.tv_ub == 0.0


def test_exact_regime_disjoint_is_one():
    a = np.arange(10).repeat(100)
    b = np.arange(10, 20).repeat(100)
    r = tv_bounds(_mg(a, k=64), _mg(b, k=64))
    assert r.tv_lb == r.tv_ub == 1.0


def test_exact_regime_equals_exact_tv():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 30, 4000)
    b = np.concatenate([rng.integers(0, 30, 3000),
                        rng.integers(25, 40, 1000)])
    r = tv_bounds(_mg(a, k=256), _mg(b, k=256))
    exact = _exact_tv(a, b)
    assert r.d_a == r.d_b == 0.0
    assert r.tv_lb == pytest.approx(exact, abs=1e-12)
    assert r.tv_ub == pytest.approx(exact, abs=1e-12)


@pytest.mark.parametrize("k", [8, 32, 128, 1024])
@pytest.mark.parametrize("seed", [0, 3])
def test_envelope_brackets_exact_in_sketch_regime(k, seed):
    rng = np.random.default_rng(seed)
    # zipf streams over a domain >> k, epoch B with a planted remap of
    # 30% of its mass — a genuine shift plus heavy MG shrinkage
    a = rng.zipf(1.3, 20_000) % 5000
    b = rng.zipf(1.3, 20_000) % 5000
    mask = rng.random(len(b)) < 0.3
    b[mask] = (b[mask] * 131 + 17) % 5000
    r = tv_bounds(_mg(a, k=k), _mg(b, k=k))
    exact = _exact_tv(a, b)
    assert 0.0 <= r.tv_lb <= exact + 1e-12, (k, seed, r, exact)
    assert exact <= r.tv_ub + 1e-12, (k, seed, r, exact)
    if k >= 1024:
        assert r.tv_lb > 0.05               # big shift certified at big k


def test_null_case_never_certifies_false_drift():
    """Two samples of the SAME distribution: exact empirical TV is small
    but nonzero; the certified lb must stay at or below it (and with
    sketchy k, collapse to ~0 — resolution honesty, not false alarms)."""
    rng = np.random.default_rng(11)
    a = rng.zipf(1.3, 20_000) % 5000
    b = rng.zipf(1.3, 20_000) % 5000
    exact = _exact_tv(a, b)
    for k in (16, 128, 1024):
        r = tv_bounds(_mg(a, k=k), _mg(b, k=k))
        assert r.tv_lb <= exact + 1e-12


@pytest.mark.parametrize("order", [[0, 1, 2, 3], [3, 1, 0, 2],
                                   [2, 3, 0, 1]])
def test_bounds_sound_under_any_merge_order(order):
    """MG counter values depend on the merge tree; the certified envelope
    must bracket exact TV for EVERY order."""
    rng = np.random.default_rng(5)
    a = rng.zipf(1.3, 16_000) % 3000
    b = (rng.zipf(1.3, 16_000) % 3000)
    b[: len(b) // 4] = 42                   # planted heavy shift
    exact = _exact_tv(a, b)
    r = tv_bounds(_mg(a, k=64, parts=4, order=order),
                  _mg(b, k=64, parts=4, order=order))
    assert r.tv_lb <= exact + 1e-12 <= r.tv_ub + 2e-12


def test_top_movers_finds_planted_shift_and_only_certified():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 2000, 30_000)
    b = rng.integers(0, 2000, 30_000)
    b[:6000] = 1234                         # token 1234 gains ~20% mass
    mg_a, mg_b = _mg(a, k=256), _mg(b, k=256)
    movers = top_movers(mg_a, mg_b, limit=5)
    assert movers and movers[0][0] == 1234
    d_a = mg_a.error_bound() / mg_a.n_items
    d_b = mg_b.error_bound() / mg_b.n_items
    for t, pa, pb, lb in movers:
        # reported lb really is certified by the envelope
        assert lb <= abs(pa - pb) + max(d_a, d_b) + 1e-12
        assert lb > 0


def test_empty_epoch_rejected():
    with pytest.raises(ValueError, match="non-empty"):
        tv_bounds(MisraGries(8), _mg([1, 2, 3]))


def test_drift_report_spark_end_to_end(spark):
    from sketchlib.drift import drift_report

    rng = np.random.default_rng(3)
    rows_a = [(int(i), [int(t) for t in rng.integers(0, 50, 40)])
              for i in range(200)]
    rows_b = [(int(i), [int(t) for t in rng.integers(0, 50, 40)])
              for i in range(200)]
    rows_b += [(1000 + i, [777] * 40) for i in range(50)]   # planted drift
    df_a = spark.createDataFrame(rows_a, "id long, tokens array<int>")
    df_b = spark.createDataFrame(rows_b, "id long, tokens array<int>")
    bounds, movers = drift_report(df_a, df_b, "tokens", k=512)
    assert isinstance(bounds, DriftBounds)
    assert bounds.tv_lb > 0.1               # 20% of epoch-B mass moved
    assert bounds.tv_ub <= 1.0
    assert movers[0][0] == 777


def test_grouped_tv_bounds_flags_only_the_shifted_source(spark):
    """Per-source drift fleet: 8 sources, one shifted between epochs.
    Every per-group envelope must bracket that group's exact TV, and the
    shifted source must carry the (strictly) largest certified lb."""
    import functools

    from pyspark.sql import functions as F

    from sketchlib.drift import grouped_tv_bounds
    from sketchlib.spark_build import build_grouped_aggregator

    rng = np.random.default_rng(17)
    def epoch(shift_src=None):
        rows = []
        for s in range(8):
            for i in range(60):
                toks = rng.integers(0, 400, 50)
                if s == shift_src and i < 30:
                    toks = np.full(50, 999)          # planted shift
                rows.append((f"src{s}", [int(t) for t in toks]))
        return spark.createDataFrame(rows, "src string, tokens array<int>")

    df_a, df_b = epoch(), epoch(shift_src=3)
    mg = functools.partial(MisraGries, 512)
    g_a = build_grouped_aggregator(df_a, "src", "tokens", mg)
    g_b = build_grouped_aggregator(df_b, "src", "tokens", mg)
    out = {r["key"]: r for r in
           grouped_tv_bounds(g_a, g_b).collect()}
    assert len(out) == 8

    # exact per-source TV via plain Spark aggregation
    def counts(df):
        return (df.select("src", F.explode("tokens").alias("t"))
                .groupBy("src", "t").count())
    ca, cb = counts(df_a).collect(), counts(df_b).collect()
    import collections
    na, nb = collections.Counter(), collections.Counter()
    fa, fb = {}, {}
    for r in ca: fa[(r["src"], r["t"])] = r["count"]; na[r["src"]] += r["count"]
    for r in cb: fb[(r["src"], r["t"])] = r["count"]; nb[r["src"]] += r["count"]
    for s in (f"src{i}" for i in range(8)):
        keys = {t for (src, t) in set(fa) | set(fb) if src == s}
        exact = 0.5 * sum(abs(fa.get((s, t), 0) / na[s]
                              - fb.get((s, t), 0) / nb[s]) for t in keys)
        r = out[s]
        assert r["tv_lb"] <= exact + 1e-12 <= r["tv_ub"] + 2e-12, (s, r, exact)
        assert r["n_a"] == na[s] and r["n_b"] == nb[s]
    lbs = {s: out[s]["tv_lb"] for s in out}
    top = max(lbs, key=lbs.get)
    assert top == "src3" and lbs[top] > 0.2
    assert all(v < lbs["src3"] for s, v in lbs.items() if s != "src3")


def test_grouped_tv_bounds_rejects_non_mg_blobs(spark):
    import functools

    from sketchlib.drift import grouped_tv_bounds
    from sketchlib.hll import HllSketch
    from sketchlib.spark_build import build_grouped_aggregator

    df = spark.createDataFrame([("a", [1, 2, 3])] * 5,
                               "src string, tokens array<int>")
    g_mg = build_grouped_aggregator(df, "src", "tokens",
                                    functools.partial(MisraGries, 16))
    g_hll = build_grouped_aggregator(df, "src", "tokens",
                                     functools.partial(HllSketch, 10))
    with pytest.raises(Exception, match="MisraGries"):
        grouped_tv_bounds(g_mg, g_hll).collect()
