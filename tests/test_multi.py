"""MultiSketch composite aggregator: lockstep updates, part-wise merge
algebra (byte-identical any split/order), serde dispatch, and the
one-pass distributed build it exists for (advise_join's contract)."""

import math

import numpy as np
import pytest

from sketchlib import serde
from sketchlib.countmin import CMConfig, CountMinSketch
from sketchlib.hll import HllSketch
from sketchlib.mg import MisraGries
from sketchlib.multi import MultiSketch

CFG = CMConfig(eps=1e-3, delta=math.exp(-3), seed=42)


def _factories():
    import functools
    return (functools.partial(CountMinSketch, CFG),
            functools.partial(HllSketch, 12),
            functools.partial(MisraGries, 32))


def _stream(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).astype(np.int64) % 10_000


def test_lockstep_matches_individual_builds():
    vals = _stream()
    ms = MultiSketch(_factories())
    ms.update_batch(vals)
    singles = [f() for f in _factories()]
    for s in singles:
        s.update_batch(vals)
    for part, single in zip(ms.parts, singles):
        assert part.to_bytes() == single.to_bytes()
    assert ms.n_items == len(vals)


def test_merge_byte_identity_any_order():
    """For a FIXED partitioning, every merge order yields identical bytes
    (MG is merge-order deterministic but, like any counter-decrement
    summary, not split-independent; CM and HLL are both — checked against
    the single-pass build separately)."""
    vals = _stream(8000, seed=1)
    one = MultiSketch(_factories())
    one.update_batch(vals)
    rng = np.random.default_rng(2)
    n_parts = 6
    assign = rng.integers(0, n_parts, len(vals))

    def built(order):
        parts = []
        for p in range(n_parts):
            sk = MultiSketch(_factories())
            sk.update_batch(vals[assign == p])
            parts.append(sk)
        acc = parts[order[0]]
        for i in order[1:]:
            acc = acc.merge(parts[i])
        return acc

    ref = built(list(range(n_parts)))
    # the same merge tree reproduces identical bytes run-to-run
    assert built(list(range(n_parts))).to_bytes() == ref.to_bytes()
    exact = {k: int(c) for k, c in zip(*np.unique(vals,
                                                  return_counts=True))}
    for _ in range(3):
        acc = built(list(rng.permutation(n_parts)))
        # CM and HLL parts are merge-order independent, bit-for-bit
        assert acc.parts[0].to_bytes() == ref.parts[0].to_bytes()
        assert acc.parts[1].to_bytes() == ref.parts[1].to_bytes()
        # the MG part's counter VALUES legitimately depend on the merge
        # tree (mg.py docstring); its guarantee must hold for EVERY order
        mg = acc.parts[2]
        survivors = dict(mg.top_items())
        for k, c in exact.items():
            if c > mg.error_bound():
                assert k in survivors
                assert survivors[k] <= c <= survivors[k] + mg.error_bound()
    # split-independent parts match the single-pass build bit-for-bit
    assert ref.parts[0].to_bytes() == one.parts[0].to_bytes()  # CM
    assert ref.parts[1].to_bytes() == one.parts[1].to_bytes()  # HLL


def test_serde_roundtrip_both_encodings():
    vals = _stream(300, seed=3)
    ms = MultiSketch(_factories())
    ms.update_batch(vals)
    back = serde.loads(ms.to_bytes())
    assert isinstance(back, MultiSketch)
    assert back.to_bytes() == ms.to_bytes()
    # partial (size-adaptive) encoding round-trips through serde too
    partial = serde.loads(ms.to_bytes_auto())
    assert partial.to_bytes() == ms.to_bytes()


def test_validation():
    with pytest.raises(ValueError, match="at least one part"):
        MultiSketch(())
    a = MultiSketch(_factories())
    with pytest.raises(ValueError, match="cannot combine"):
        a.merge(HllSketch(12))
    b = MultiSketch(_factories()[:2])
    with pytest.raises(ValueError, match="part counts"):
        a.merge(b)
    # part-wise config validation comes from the parts themselves
    c = MultiSketch((lambda: CountMinSketch(CMConfig(1e-2, 0.1, seed=7)),
                     lambda: HllSketch(12), lambda: MisraGries(32)))
    with pytest.raises(ValueError):
        a.merge(c)


def test_grouped_multisketch_matches_local_per_group(spark):
    """Per-group composite builds (the corpus_profile_by_source shape):
    each group's CM and HLL parts match a local single-pass build over
    just that group's values, bit-for-bit."""
    from sketchlib import serde
    from sketchlib.spark_build import build_grouped_aggregator

    vals = _stream(3000, seed=5)
    groups = (vals % 3).astype(int)
    df = spark.createDataFrame(
        [(f"g{int(g)}", int(v)) for g, v in zip(groups, vals)],
        "g string, k long").repartition(6)
    res = build_grouped_aggregator(
        df, "g", "k", lambda: MultiSketch(_factories()))
    blobs = {r["key"]: bytes(r["sketch"]) for r in res.collect()}
    assert set(blobs) == {"g0", "g1", "g2"}
    for gi in range(3):
        local = MultiSketch(_factories())
        local.update_batch(vals[groups == gi])
        got = serde.loads(blobs[f"g{gi}"])
        assert got.parts[0].to_bytes() == local.parts[0].to_bytes()
        assert got.parts[1].to_bytes() == local.parts[1].to_bytes()
        assert got.parts[2].n_items == local.parts[2].n_items


def test_windowed_multisketch_stream_equals_batch(spark, tmp_path):
    """The windowed streaming builder is factory-generic for the
    composite too: per-window MultiSketch state folded across
    micro-batches matches single-shot batch builds of the same windows
    — byte-identical for the split-independent CM and HLL parts, bound-
    preserving for MG."""
    import os

    import functools
    from pyspark.sql import functions as F

    from sketchlib.datagen import generate_token_table
    from sketchlib.spark_build import build_aggregator
    from sketchlib.streaming import WindowedSketchBuilder

    inbox = str(tmp_path / "ms_inbox")
    os.makedirs(inbox)
    generate_token_table(f"{inbox}/p0.parquet", rows=300, seed=31,
                         dist="zipf")
    fac = functools.partial(MultiSketch, _factories())
    df = (spark.read.parquet(inbox)
          .withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00"))
                      + F.make_interval(mins=F.pmod(F.xxhash64("doc_id"),
                                                    F.lit(110)).cast("int"))))
    b = WindowedSketchBuilder(fac, "ts", "tokens",
                              str(tmp_path / "ms_snap"),
                              window_seconds=3600)
    split = F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
    b.process_batch(df.filter(split), 0)
    b.process_batch(df.filter(~split), 1)
    assert len(b.sketches) == 2
    for ws, sk in b.sketches.items():
        hour = (F.unix_timestamp("ts") / 3600).cast("long") * 3600
        ref = build_aggregator(df.filter(hour == ws), "tokens", fac).sketch
        assert sk.parts[0].to_bytes() == ref.parts[0].to_bytes()
        assert sk.parts[1].to_bytes() == ref.parts[1].to_bytes()
        assert sk.parts[2].n_items == ref.parts[2].n_items


def test_distributed_one_pass_build_matches_local(spark):
    from sketchlib.spark_build import build_aggregator
    vals = _stream(4000, seed=4)
    df = spark.createDataFrame([(int(v),) for v in vals], "k long") \
        .repartition(8)
    res = build_aggregator(df, "k", lambda: MultiSketch(_factories()))
    local = MultiSketch(_factories())
    local.update_batch(vals)
    # CM and HLL are split-independent: distributed == local, bit-for-bit
    assert res.sketch.parts[0].to_bytes() == local.parts[0].to_bytes()
    assert res.sketch.parts[1].to_bytes() == local.parts[1].to_bytes()
    # MG depends on the split but keeps its guarantee: every key above
    # n/(k+1) survives, and survivor counts underestimate by <= bound
    mg = res.sketch.parts[2]
    assert mg.n_items == len(vals)
    exact = {k: int(c) for k, c in
             zip(*np.unique(vals, return_counts=True))}
    top = {k for k, c in exact.items() if c > mg.error_bound()}
    survivors = dict(mg.top_items())
    for k in top:
        assert k in survivors
        assert survivors[k] <= exact[k] <= survivors[k] + mg.error_bound()
    assert res.n_rows == len(vals)


def test_corrupt_part_length_fails_cleanly():
    """A corrupt part length must hit the clean truncation error, not
    mis-slice into a confusing part-level serde failure."""
    import struct

    ms = MultiSketch(_factories())
    buf = bytearray(ms.to_bytes())
    hs = struct.calcsize("<4sHHi")
    # oversize the first part's length beyond the blob
    struct.pack_into("<q", buf, hs, len(buf) * 2)
    with pytest.raises(ValueError, match="truncated MultiSketch"):
        MultiSketch.from_bytes(bytes(buf))
    # negative length
    struct.pack_into("<q", buf, hs, -8)
    with pytest.raises(ValueError, match="truncated MultiSketch"):
        MultiSketch.from_bytes(bytes(buf))
    # negative part count
    buf2 = bytearray(ms.to_bytes())
    struct.pack_into("<i", buf2, struct.calcsize("<4sHH"), -1)
    with pytest.raises(ValueError, match="truncated MultiSketch"):
        MultiSketch.from_bytes(bytes(buf2))


def test_shared_unique_path_matches_raw_path():
    """The shared duplicate-collapse pass (one np.unique feeding every
    update_unique-capable part) is byte-identical to each part consuming
    the raw batch — across the dispatch threshold, mixed order-sensitive
    parts (KLL gets the raw batch), split+merge, and non-int fallback."""
    import functools

    from sketchlib.bloom import BloomFilter
    from sketchlib.countsketch import CSConfig, CountSketch
    from sketchlib.dyadic import DyadicCM
    from sketchlib.kll import KllSketch
    from sketchlib.theta import ThetaSketch

    fs = (functools.partial(CountMinSketch, CFG),
          functools.partial(CountSketch, CSConfig(1 << 12, 5, seed=9)),
          functools.partial(HllSketch, 12),
          functools.partial(MisraGries, 64),
          functools.partial(BloomFilter, capacity=50_000, fpr=0.01, seed=7),
          functools.partial(ThetaSketch, 512),
          functools.partial(DyadicCM, 20, 1e-3, 0.05),
          functools.partial(KllSketch, 200))
    rng = np.random.default_rng(11)
    for n in (100_000, MultiSketch._SHARED_UNIQUE_THRESHOLD,
              MultiSketch._SHARED_UNIQUE_THRESHOLD - 1, 4096):
        vals = rng.zipf(1.3, n).astype(np.int64) % (1 << 20)
        ms = MultiSketch(fs)
        ms.update_batch(vals)
        singles = [f() for f in fs]
        for s in singles:
            s.update_batch(vals)
        for part, single in zip(ms.parts, singles):
            assert part.to_bytes() == single.to_bytes(), (n, type(part))
            assert part.n_items == single.n_items, (n, type(part))
        # split + merge: shared path == raw path under the SAME split
        # (MG's shrink makes split-merge differ from single-pass by
        # design, so compare path-vs-path, not vs single-pass)
        cut = n // 3
        a, b = MultiSketch(fs), MultiSketch(fs)
        a.update_batch(vals[:cut])
        b.update_batch(vals[cut:])
        merged = a.merge(b)
        ra = [f() for f in fs]
        rb = [f() for f in fs]
        for s in ra:
            s.update_batch(vals[:cut])
        for s in rb:
            s.update_batch(vals[cut:])
        for part, x, y in zip(merged.parts, ra, rb):
            assert part.to_bytes() == x.merge(y).to_bytes(), (n, type(part))


def test_update_unique_direct_contract():
    """update_unique(uniq, counts) on each keyed sketch equals
    update_batch of the expanded multiset, byte for byte, including
    occurrence-counting lineage (n_items/total_count)."""
    import functools

    from sketchlib.bloom import BloomFilter
    from sketchlib.countsketch import CSConfig, CountSketch
    from sketchlib.dyadic import DyadicCM
    from sketchlib.theta import ThetaSketch

    rng = np.random.default_rng(3)
    uniq = np.unique(rng.integers(0, 1 << 20, 500, dtype=np.int64))
    cnt = rng.integers(1, 50, uniq.shape[0], dtype=np.int64)
    raw = np.repeat(uniq, cnt)
    rng.shuffle(raw)
    for f in (functools.partial(CountMinSketch, CFG),
              functools.partial(CountSketch, CSConfig(1 << 12, 5, seed=9)),
              functools.partial(HllSketch, 12),
              functools.partial(MisraGries, 64),
              functools.partial(BloomFilter, capacity=50_000, fpr=0.01,
                                seed=7),
              functools.partial(ThetaSketch, 512),
              functools.partial(DyadicCM, 20, 1e-3, 0.05)):
        via_unique, via_raw = f(), f()
        via_unique.update_unique(uniq, cnt)
        via_raw.update_batch(raw)
        assert via_unique.to_bytes() == via_raw.to_bytes(), type(via_raw)
        assert via_unique.n_items == via_raw.n_items
        # empty-unique no-op
        before = via_unique.to_bytes()
        via_unique.update_unique(np.empty(0, dtype=np.int64),
                                 np.empty(0, dtype=np.int64))
        assert via_unique.to_bytes() == before
