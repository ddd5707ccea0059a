"""Property-based tests (hypothesis): the algebraic contracts that every
distributed plan relies on, checked over adversarial random inputs rather
than fixtures — merge algebra, serialization roundtrips, one-sidedness,
and the ragged-take gather kernel."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib.countmin import CMConfig, CountMinSketch
from sketchlib import serde

CFG = CMConfig(eps=5e-3, delta=0.05, seed=99)

keys_arrays = st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                       min_size=0, max_size=400)


@settings(max_examples=50, deadline=None)
@given(keys=keys_arrays, cut1=st.integers(0, 400), cut2=st.integers(0, 400))
def test_merge_split_invariance(keys, cut1, cut2):
    """Any 3-way split, folded in any grouping, is byte-identical to the
    single-pass sketch — the contract that makes partition count and merge
    topology irrelevant."""
    arr = np.array(keys, dtype=np.int64)
    lo, hi = sorted((min(cut1, len(arr)), min(cut2, len(arr))))
    parts = [arr[:lo], arr[lo:hi], arr[hi:]]

    single = CountMinSketch(CFG)
    single.update_batch(arr)

    sks = []
    for p in parts:
        sk = CountMinSketch(CFG)
        sk.update_batch(p)
        sks.append(sk)
    left_fold = sks[0].merge(sks[1]).merge(sks[2])

    sks2 = []
    for p in parts:
        sk = CountMinSketch(CFG)
        sk.update_batch(p)
        sks2.append(sk)
    right_fold = sks2[2].merge(sks2[0]).merge(sks2[1])

    assert left_fold.to_bytes() == single.to_bytes()
    assert right_fold.to_bytes() == single.to_bytes()


@settings(max_examples=50, deadline=None)
@given(keys=keys_arrays)
def test_one_sided_and_total_count(keys):
    arr = np.array(keys, dtype=np.int64)
    sk = CountMinSketch(CFG)
    sk.update_batch(arr)
    assert sk.total_count == arr.shape[0]
    if arr.shape[0]:
        uniq, cnt = np.unique(arr, return_counts=True)
        est = sk.point_query_batch(uniq)
        assert np.all(est >= cnt)


@settings(max_examples=50, deadline=None)
@given(keys=keys_arrays)
def test_serde_roundtrips_dense_sparse_auto(keys):
    arr = np.array(keys, dtype=np.int64)
    sk = CountMinSketch(CFG)
    sk.update_batch(arr)
    dense = sk.to_bytes()
    for blob in (dense, sk.to_bytes_sparse(), sk.to_bytes_auto()):
        rt = serde.loads(blob)
        assert rt.to_bytes() == dense
        assert rt.n_items == sk.n_items and rt.total_count == sk.total_count


@settings(max_examples=50, deadline=None)
@given(keys=keys_arrays, counts_seed=st.integers(0, 2**31))
def test_cu_bounded_by_standard_and_truth(keys, counts_seed):
    """Conservative update stays one-sided and never exceeds standard CM."""
    arr = np.array(keys, dtype=np.int64)
    std = CountMinSketch(CFG)
    std.update_batch(arr)
    cu = CountMinSketch(CFG)
    cu.update_batch_cu(arr)
    if arr.shape[0]:
        uniq, cnt = np.unique(arr, return_counts=True)
        est_std = std.point_query_batch(uniq)
        est_cu = cu.point_query_batch(uniq)
        assert np.all(est_cu >= cnt)
        assert np.all(est_cu <= est_std)


@settings(max_examples=100, deadline=None)
@given(lens=st.lists(st.integers(0, 12), min_size=0, max_size=30),
       pick_seed=st.integers(0, 2**31))
def test_ragged_take_matches_naive(lens, pick_seed):
    """_ragged_take(flat, starts, lens) == concatenated python slices, for
    arbitrary row subsets including empty rows."""
    from sketchlib.spark_build import _ragged_take
    lens_a = np.array(lens, dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens_a, out=offsets[1:])
    flat = np.arange(int(offsets[-1]), dtype=np.int64) * 7 + 3
    rng = np.random.default_rng(pick_seed)
    mask = rng.random(len(lens)) < 0.5 if lens else np.zeros(0, bool)
    got = _ragged_take(flat, offsets[:-1][mask], lens_a[mask])
    expected = np.concatenate(
        [flat[offsets[i]:offsets[i + 1]] for i in range(len(lens)) if mask[i]]
        or [flat[:0]])
    assert np.array_equal(got, expected)


@settings(max_examples=50, deadline=None)
@given(a=keys_arrays, b=keys_arrays)
def test_inner_product_upper_bounds_and_rawlog_identity(a, b):
    """sketch×sketch IP upper-bounds the exact Σ fa·fb, and the raw-log
    row_probe_sums path equals it exactly (the identity the distributed
    one-pass estimator relies on)."""
    arr_a = np.array(a, dtype=np.int64)
    arr_b = np.array(b, dtype=np.int64)
    sa = CountMinSketch(CFG)
    sa.update_batch(arr_a)
    sb = CountMinSketch(CFG)
    sb.update_batch(arr_b)
    est = sa.inner_product(sb)
    ua, ca = np.unique(arr_a, return_counts=True)
    ub, cb = np.unique(arr_b, return_counts=True)
    common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
    exact = int(np.sum(ca[ia] * cb[ib]))
    assert est >= exact
    if arr_b.shape[0]:
        assert int(sa.row_probe_sums(arr_b).min()) == est


# -- PrioritySample algebra ---------------------------------------------------

_ps_items = st.lists(
    st.tuples(st.text(alphabet="abcdefghij0123456789", min_size=0,
                      max_size=12),
              st.floats(min_value=0.001, max_value=1e6,
                        allow_nan=False, allow_infinity=False)),
    min_size=0, max_size=300)


def _ps_build(items, k=24, seed=7):
    from sketchlib.psample import PrioritySample
    ps = PrioritySample(k=k, seed=seed)
    if items:
        ps.update_pairs([kk for kk, _ in items], [w for _, w in items])
    return ps


@settings(max_examples=50, deadline=None)
@given(items=_ps_items, cut1=st.integers(0, 300), cut2=st.integers(0, 300))
def test_psample_merge_split_invariance(items, cut1, cut2):
    """Any 3-way split, any merge order, byte-identical to single-pass —
    the contract that makes the sample safe under Spark repartitioning."""
    lo, hi = sorted((min(cut1, len(items)), min(cut2, len(items))))
    parts = [items[:lo], items[lo:hi], items[hi:]]
    ref = _ps_build(items).to_bytes()
    for order in ([0, 1, 2], [2, 0, 1], [1, 2, 0]):
        acc = _ps_build(parts[order[0]])
        acc.merge(_ps_build(parts[order[1]]))
        acc.merge(_ps_build(parts[order[2]]))
        assert acc.to_bytes() == ref


@settings(max_examples=50, deadline=None)
@given(items=_ps_items)
def test_psample_merge_idempotent_and_exact_mode(items):
    """Merging a part with itself never changes the retained set
    (at-least-once task semantics), and when everything fits (n <= k)
    estimates are exact subset sums over max-collapsed duplicates."""
    from sketchlib.psample import PrioritySample
    a = _ps_build(items)
    retained = {k: w for k, w, _ in a.sample()}
    a.merge(_ps_build(items))
    assert {k: w for k, w, _ in a.sample()} == retained
    big = PrioritySample(k=1024, seed=7)
    if items:
        big.update_pairs([k for k, _ in items], [w for _, w in items])
    assert big.threshold is None
    exact: dict[str, float] = {}
    for k, w in items:
        exact[k] = max(exact.get(k, 0.0), w)   # duplicate keys collapse
    assert big.estimate_total() == sum(exact.values()) or abs(
        big.estimate_total() - sum(exact.values())) < 1e-6 * max(
        1.0, sum(exact.values()))


@settings(max_examples=50, deadline=None)
@given(items=_ps_items)
def test_psample_serde_roundtrip(items):
    ps = _ps_build(items)
    back = serde.loads(ps.to_bytes())
    assert back.to_bytes() == ps.to_bytes()
    assert back.threshold == ps.threshold


# -- range-boundary planner ---------------------------------------------------

@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e9, max_value=1e9,
                               allow_nan=False, allow_infinity=False),
                     min_size=1, max_size=500),
       n_parts=st.integers(2, 32))
def test_range_boundaries_monotone_and_cover(vals, n_parts):
    """Boundaries are strictly increasing and inside the value range for
    ANY input (ties, skew, negatives) — the invariant file layouts rely
    on; searchsorted bucket ids always land in [0, n_parts-1]."""
    from sketchlib.kll import KllSketch
    from sketchlib.partitioner import range_boundaries_from_sketch
    sk = KllSketch(k=100)
    sk.update_batch(np.asarray(vals, dtype=np.float64))
    bounds = range_boundaries_from_sketch(sk, n_parts)
    assert bounds == sorted(set(bounds))
    assert len(bounds) <= n_parts - 1
    if bounds:
        assert min(vals) <= bounds[0] and bounds[-1] <= max(vals)
    ids = np.searchsorted(bounds, np.asarray(vals), side="right")
    assert ids.min() >= 0 and ids.max() <= len(bounds)
