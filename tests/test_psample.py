"""PrioritySample (DLT priority sampling): top-(k+1) retention vs brute
force, exact mode, deterministic merges, duplicate collapse, serde, and
the distributed build over the documents table."""

import functools

import numpy as np
import pytest

from sketchlib import serde
from sketchlib.psample import PrioritySample, _polyhash_segments, _priorities


def _mk_items(n, seed=7):
    rng = np.random.default_rng(seed)
    keys = [f"doc_{i:07d}" for i in range(n)]
    weights = rng.zipf(1.5, n).astype(np.float64)
    groups = [f"src{i % 5}" for i in range(n)]
    return keys, weights, groups


def _brute_topk(keys, weights, seed, m):
    kb = [k.encode() for k in keys]
    lens = np.array([len(b) for b in kb], dtype=np.int64)
    flat = np.frombuffer(b"".join(kb), dtype=np.uint8)
    h = _polyhash_segments(flat, lens, seed)
    q = _priorities(h, np.asarray(weights, dtype=np.float64))
    order = sorted(range(len(keys)),
                   key=lambda i: (-q[i], int(h[i]), kb[i]))
    return [keys[i] for i in order[:m]], q


def test_topk_matches_brute_force():
    keys, weights, _ = _mk_items(3000)
    ps = PrioritySample(k=64, seed=1337)
    for lo in range(0, 3000, 173):          # uneven batches
        ps.update_pairs(keys[lo:lo + 173], weights[lo:lo + 173])
    want, q = _brute_topk(keys, weights, 1337, 65)
    got = [k.decode() for k in ps.keys]
    assert got == want
    assert ps.threshold == pytest.approx(sorted(q)[-65])
    assert ps.n_items == 3000
    assert ps.total_weight == pytest.approx(float(np.sum(weights)))


def test_exact_mode_sums():
    keys, weights, groups = _mk_items(100)
    ps = PrioritySample(k=256, seed=1)
    ps.update_pairs(keys, weights, groups)
    assert ps.threshold is None
    assert ps.estimate_total() == pytest.approx(float(np.sum(weights)))
    est = ps.estimate_group_sums()
    for g in set(groups):
        exact = float(sum(w for w, gg in zip(weights, groups) if gg == g))
        assert est[g] == pytest.approx(exact)


def test_merge_byte_identity_any_split_any_order():
    keys, weights, groups = _mk_items(2000)
    one = PrioritySample(k=48, seed=9)
    one.update_pairs(keys, weights, groups)
    ref = one.to_bytes()
    rng = np.random.default_rng(0)
    for trial in range(3):
        n_parts = int(rng.integers(2, 8))
        assign = rng.integers(0, n_parts, 2000)
        parts = []
        for p in range(n_parts):
            sk = PrioritySample(k=48, seed=9)
            idx = np.where(assign == p)[0]
            sk.update_pairs([keys[i] for i in idx], weights[idx],
                            [groups[i] for i in idx])
            parts.append(sk)
        rng.shuffle(parts)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge(p)
        assert acc.to_bytes() == ref


def test_duplicate_keys_collapse_to_max_weight():
    ps = PrioritySample(k=8, seed=3)
    ps.update_pairs(["a", "b", "a"], [5.0, 2.0, 9.0])
    items = {k: w for k, w, _ in ps.sample()}
    assert items == {"a": 9.0, "b": 2.0}
    # replaying the same batch is idempotent on the retained set
    blob = ps.to_bytes()
    ps.update_pairs(["a", "b"], [9.0, 2.0])
    ps2 = PrioritySample.from_bytes(ps.to_bytes())
    assert {k: w for k, w, _ in ps2.sample()} == items
    assert blob[:4] == b"PSM1"


def test_duplicates_in_oversized_batch_do_not_evict_distinct_keys():
    """Regression (review r3): the pre-trim to top-(k+1) must collapse
    duplicate keys FIRST — a key duplicated inside one big batch used to
    occupy several pre-trim slots, evicting a distinct key that belongs in
    the global top-(k+1) and breaking batch-layout byte-identity."""
    one = PrioritySample(k=2, seed=7)
    one.update_pairs(["a", "a", "b", "c"], [10.0, 9.0, 1.0, 1.0])
    per_item = PrioritySample(k=2, seed=7)
    for key, w in [("a", 10.0), ("a", 9.0), ("b", 1.0), ("c", 1.0)]:
        per_item.update_pairs([key], [w])
    assert one.to_bytes() == per_item.to_bytes()
    assert one.threshold is not None  # 4 distinct-candidate slots > k
    # same invariant on the zero-copy flat path, duplicates at scale:
    # 600 copies of one hot key interleaved with 300 distinct keys
    keys = []
    weights = []
    for i in range(300):
        keys += ["hot", f"k{i:04d}"]
        weights += [1000.0 - i, 1.0 + (i % 7)]
    keys += ["hot"] * 300
    weights += [500.0] * 300
    flat = np.frombuffer(b"".join(k.encode() for k in keys), dtype=np.uint8)
    lens = np.array([len(k) for k in keys], dtype=np.int64)
    a = PrioritySample(k=16, seed=11)
    a.update_flat(flat, lens, np.array(weights))
    b = PrioritySample(k=16, seed=11)
    for k, w in zip(keys, weights):
        b.update_pairs([k], [w])
    assert a.to_bytes() == b.to_bytes()
    assert len({key for key, _, _ in a.sample()}) == 16


def test_serde_roundtrip_and_dispatch():
    keys, weights, groups = _mk_items(500)
    ps = PrioritySample(k=32, seed=42)
    ps.update_pairs(keys, weights, groups)
    back = serde.loads(ps.to_bytes())
    assert isinstance(back, PrioritySample)
    assert back.to_bytes() == ps.to_bytes()
    assert back.estimate_group_sums() == ps.estimate_group_sums()
    assert back.threshold == ps.threshold


def test_update_flat_equals_update_pairs():
    keys, weights, groups = _mk_items(700)
    a = PrioritySample(k=20, seed=5)
    a.update_pairs(keys, weights, groups)
    kb = b"".join(k.encode() for k in keys)
    klens = np.array([len(k) for k in keys], dtype=np.int64)
    pb = b"".join(g.encode() for g in groups)
    plens = np.array([len(g) for g in groups], dtype=np.int64)
    b = PrioritySample(k=20, seed=5)
    b.update_flat(np.frombuffer(kb, dtype=np.uint8), klens,
                  weights, np.frombuffer(pb, dtype=np.uint8), plens)
    assert a.to_bytes() == b.to_bytes()


def test_subset_sum_accuracy():
    keys, weights, groups = _mk_items(20000, seed=11)
    ps = PrioritySample(k=512, seed=1337)
    ps.update_pairs(keys, weights, groups)
    total = float(np.sum(weights))
    assert ps.estimate_total() == pytest.approx(total, rel=5 / np.sqrt(512))
    est = ps.estimate_group_sums()
    for g in set(groups):
        exact = float(sum(w for w, gg in zip(weights, groups) if gg == g))
        # per-group subsets are ~1/5 of the mass: looser relative bound
        assert est.get(g, 0.0) == pytest.approx(exact, rel=0.35)


def test_validation():
    ps = PrioritySample(k=8, seed=0)
    with pytest.raises(ValueError):
        ps.update_pairs(["a"], [0.0])
    with pytest.raises(ValueError):
        ps.update_pairs(["a"], [-1.0])
    with pytest.raises(ValueError):
        ps.merge(PrioritySample(k=16, seed=0))
    with pytest.raises(ValueError):
        PrioritySample(k=1)


def test_spark_build_pairs(spark):
    from sketchlib.spark_build import build_aggregator_pairs
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mk = functools.partial(PrioritySample, 64, 1337)
    res = build_aggregator_pairs(docs.repartition(7), "doc_id", "n_chars",
                                 mk, payload_col="source")
    res1 = build_aggregator_pairs(docs.coalesce(1), "doc_id", "n_chars",
                                  mk, payload_col="source")
    # partition-order independence, byte-for-byte
    assert res.sketch.to_bytes() == res1.sketch.to_bytes()
    assert len(res.lineage) == 7
    # exact-mode distributed build == exact sums
    import pyspark.sql.functions as F
    exact = {r["source"]: float(r["s"]) for r in
             docs.filter(F.col("n_chars") > 0).groupBy("source")
             .agg(F.sum("n_chars").alias("s")).collect()}
    big = build_aggregator_pairs(
        docs.repartition(5), "doc_id", "n_chars",
        functools.partial(PrioritySample, 100000, 1337),
        payload_col="source").sketch
    assert big.threshold is None
    got = big.estimate_group_sums()
    for g, v in exact.items():
        assert got[g] == pytest.approx(v)


def test_grouped_pairs_build_matches_local(spark):
    """Per-group distributed priority samples == local per-group builds,
    partition-order independent, byte-for-byte."""
    from sketchlib import serde
    from sketchlib.spark_build import build_grouped_aggregator_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mk = functools.partial(PrioritySample, 16, 1337)
    got = {r["key"]: bytes(r["sketch"]) for r in
           build_grouped_aggregator_pairs(
               docs.repartition(6), "lang", "doc_id", "n_chars", mk,
               payload_col="source").collect()}
    got1 = {r["key"]: bytes(r["sketch"]) for r in
            build_grouped_aggregator_pairs(
                docs.coalesce(1), "lang", "doc_id", "n_chars", mk,
                payload_col="source").collect()}
    assert got == got1 and got
    pdf = docs.toPandas()
    for lang, grp in pdf[pdf["n_chars"] > 0].groupby("lang"):
        ref = PrioritySample(k=16, seed=1337)
        ref.update_pairs([str(d) for d in grp["doc_id"]],
                         grp["n_chars"].astype(float).to_numpy(),
                         list(grp["source"]))
        assert got[lang] == ref.to_bytes()
        assert isinstance(serde.loads(got[lang]), PrioritySample)


def test_string_flat_lens_wide_and_sliced():
    """Arrow large_string (64-bit offsets) and sliced arrays both yield
    the right flat buffer + lengths — the zero-copy path the pairs
    builders rely on."""
    import pyarrow as pa

    from sketchlib.spark_build import _string_flat_lens

    for typ in (pa.string(), pa.large_string(), pa.binary(),
                pa.large_binary()):
        arr = pa.array([b"ab", b"", b"xyz"], type=typ)
        flat, lens = _string_flat_lens(arr)
        assert bytes(flat) == b"abxyz" and list(lens) == [2, 0, 3]
        flat2, lens2 = _string_flat_lens(arr.slice(1))
        assert bytes(flat2) == b"xyz" and list(lens2) == [0, 3]
    import pytest as _pt
    with _pt.raises(ValueError):
        _string_flat_lens(pa.array([1, 2]))
    with _pt.raises(ValueError):
        _string_flat_lens(pa.array(["a", None]))


def test_from_bytes_rejects_corrupt_tw_len():
    import struct

    ps = PrioritySample(k=4, seed=1)
    ps.update_pairs([b"a", b"b"], [1.0, 2.0])
    blob = bytearray(ps.to_bytes())
    hs = struct.calcsize("<4sHHqqqiq")
    # tw_len is the 'i' field right before the trailing 'q'
    tw_off = hs - struct.calcsize("<iq")
    for bad in (-8, len(blob)):
        corrupt = bytearray(blob)
        corrupt[tw_off:tw_off + 4] = struct.pack("<i", bad)
        with pytest.raises(ValueError, match="total-weight"):
            PrioritySample.from_bytes(bytes(corrupt))


def test_version1_blob_gets_actionable_error():
    """Old v1 blobs persisted in stores must fail with an explicit
    unsupported-version message, not the generic corrupt-blob error."""
    import struct

    from sketchlib.psample import _MAGIC

    ps = PrioritySample(k=4, seed=1)
    buf = bytearray(ps.to_bytes())
    struct.pack_into("<H", buf, 4, 1)   # rewrite version field to 1
    with pytest.raises(ValueError, match="version 1"):
        PrioritySample.from_bytes(bytes(buf))
    # a genuinely wrong magic still reports the generic error
    bad = b"XXXX" + bytes(buf[4:])
    with pytest.raises(ValueError, match="bad PrioritySample"):
        PrioritySample.from_bytes(bad)
