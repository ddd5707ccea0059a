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
