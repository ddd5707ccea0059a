"""Dyadic Count-Min: range counts one-sided within the interval bound,
prefix ranks and quantiles within the rank bound, exact/sketched level
split, byte-identical merges for any partitioning, partial sparse
encoding, and the distributed build through the generic aggregator."""

import numpy as np
import pytest

from sketchlib.dyadic import DyadicCM
from sketchlib.serde import dumps_partial, loads


UB = 16     # 65536-key test universe: several sketched + several exact levels


def _stream(n=120_000, seed=5):
    rng = np.random.default_rng(seed)
    return (rng.zipf(1.2, n) % (1 << UB)).astype(np.int64)


def _build(keys, **kw):
    d = DyadicCM(universe_bits=UB, eps=2e-3, delta=0.02, seed=77, **kw)
    d.update_batch(keys)
    return d


def test_level_split_and_memory():
    d = DyadicCM(universe_bits=UB, eps=2e-3, delta=0.02)
    # eps=2e-3 -> width 1360: levels with domain <= 1360 (top 10) are exact
    assert 0 < d.n_sketched_levels < UB
    for l in range(UB):
        dom = 1 << (UB - l)
        assert d._is_exact(l) == (dom <= d._exact_cut)
    assert d.nbytes() > 0


def test_range_counts_one_sided_within_bound():
    keys = _stream()
    d = _build(keys)
    rng = np.random.default_rng(9)
    for _ in range(50):
        lo = int(rng.integers(0, 1 << UB))
        hi = int(rng.integers(lo, 1 << UB))
        exact = int(((keys >= lo) & (keys <= hi)).sum())
        est, bound = d.range_count_with_bound(lo, hi)
        assert est >= exact, (lo, hi)
        assert est - exact <= bound + 1e-9, (lo, hi, est, exact, bound)
    # degenerate single-key range == point query semantics
    k = int(keys[0])
    exact = int((keys == k).sum())
    assert d.range_count(k, k) >= exact
    # whole domain is exact (root node)
    est, bound = d.range_count_with_bound(0, (1 << UB) - 1)
    assert est == keys.shape[0]
    with pytest.raises(ValueError):
        d.range_count(5, 4)
    with pytest.raises(ValueError):
        d.range_count(0, 1 << UB)


def test_prefix_rank_and_quantiles():
    keys = _stream()
    d = _build(keys)
    n = keys.shape[0]
    srt = np.sort(keys)
    bound = d.rank_error_bound()
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est_q = d.quantile(q)
        # the standard quantile sandwich (a heavy key can swallow q*n
        # entirely, so the rank of x itself is not the right target):
        # #keys < x must not exceed q*n + err, #keys <= x must reach
        # q*n - err
        below = int(np.searchsorted(srt, est_q, side="left"))
        at_or_below = int(np.searchsorted(srt, est_q, side="right"))
        assert below <= q * n + bound + 1, (q, est_q, below)
        assert at_or_below >= q * n - bound - 1, (q, est_q, at_or_below)
    # prefix rank is a one-sided range count
    x = int(np.median(keys))
    exact_rank = int((keys <= x).sum())
    assert 0 <= d.prefix_rank(x) - exact_rank <= bound
    with pytest.raises(ValueError):
        d.quantile(1.5)


def test_weighted_updates_match_repeats():
    a = DyadicCM(universe_bits=8, eps=0.02, delta=0.05, seed=3)
    a.update_batch(np.array([4, 9, 4], dtype=np.int64),
                   counts=np.array([5, 2, 3], dtype=np.int64))
    b = DyadicCM(universe_bits=8, eps=0.02, delta=0.05, seed=3)
    b.update_batch(np.repeat(np.array([4, 9], dtype=np.int64), [8, 2]))
    # same aggregate per key -> identical levels (update folds duplicates)
    assert a.to_bytes()[56:] == b.to_bytes()[56:]   # skip n_items header diff
    assert a.total_count == b.total_count == 10


def test_out_of_universe_rejected():
    d = DyadicCM(universe_bits=8, eps=0.02, delta=0.05)
    with pytest.raises(ValueError):
        d.update_batch(np.array([256], dtype=np.int64))
    with pytest.raises(ValueError):
        d.update_batch(np.array([-1], dtype=np.int64))


def test_merge_byte_identical_any_partitioning():
    keys = _stream(n=40_000)
    ref = _build(keys).to_bytes()
    rng = np.random.default_rng(21)
    for n_parts in (2, 7, 16):
        parts = np.array_split(keys, n_parts)
        order = rng.permutation(n_parts)
        acc = DyadicCM(universe_bits=UB, eps=2e-3, delta=0.02, seed=77)
        for i in order:
            part = DyadicCM(universe_bits=UB, eps=2e-3, delta=0.02, seed=77)
            part.update_batch(parts[i])
            acc.merge(part)
        assert acc.to_bytes() == ref
    with pytest.raises(ValueError):
        _build(keys[:10]).merge(DyadicCM(universe_bits=UB, eps=2e-3,
                                         delta=0.02, seed=78))


def test_serde_roundtrip_and_sparse_partials():
    keys = _stream(n=8_000)
    d = _build(keys)
    blob = d.to_bytes()
    back = loads(blob)
    assert isinstance(back, DyadicCM)
    assert back.to_bytes() == blob
    assert back.range_count(0, 100) == d.range_count(0, 100)
    # a small partition slice ships sparse CM levels; decodes to the
    # same structure byte-for-byte after re-densification
    small = DyadicCM(universe_bits=UB, eps=2e-3, delta=0.02, seed=77)
    small.update_batch(keys[:50])
    pblob = dumps_partial(small)
    assert len(pblob) < len(small.to_bytes())
    assert loads(pblob).to_bytes() == small.to_bytes()
    with pytest.raises(ValueError):
        DyadicCM.from_bytes(blob[:-4])


def test_distributed_build_matches_local(spark):
    from sketchlib.spark_build import build_aggregator
    import functools
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    vals = df.select("user_id")
    factory = functools.partial(DyadicCM, 20, 1e-3, 0.05, 99)
    res = build_aggregator(vals, "user_id", factory)
    local = factory()
    arr = np.array([r[0] for r in vals.collect()], dtype=np.int64)
    local.update_batch(arr)
    assert res.sketch.to_bytes() == local.to_bytes()


def test_failed_update_leaves_state_untouched():
    d = DyadicCM(universe_bits=8, eps=0.02, delta=0.05, seed=1)
    d.update_batch(np.arange(100, dtype=np.int64))
    before = d.to_bytes()
    with pytest.raises(ValueError):
        d.update_batch(np.array([1, 2, 3], dtype=np.int64),
                       counts=np.array([5], dtype=np.int64))
    assert d.to_bytes() == before
    with pytest.raises(ValueError):
        d.update_batch(np.array([999], dtype=np.int64))  # out of universe
    assert d.to_bytes() == before
