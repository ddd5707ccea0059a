"""Hash fidelity vs the reference (SURVEY.md §3.4, §5 item 1).

Golden vectors generated once by compiling the reference's MurmurHash3.cpp
(/root/reference/MurmurHash3.cpp:255-332) and libstdc++'s RNG stack with a
throwaway driver; the values below are its stdout, hardcoded so the suite
never touches the reference at runtime.
"""

import numpy as np
import pytest

from sketchlib.hashing import (
    bit_length_u64,
    hash_u64,
    murmur3_x64_128_u64,
    seed_schedule,
    tokens_to_u64,
)

# (seed, key, h1, h2) from MurmurHash3_x64_128(&key, 8, seed, out)
GOLDEN = [
    (0, 0, 2945182322382062539, 17462001654787800658),
    (0, 1, 19144387141682250, 4434582959624657926),
    (0, 1337, 12005549856504471719, 11687539886865518613),
    (0, 3735928559, 7380184112128478001, 894047025370732563),
    (0, 4294967295, 12360021701221590262, 10840173040782298326),
    (0, 1311768467463790320, 1034294729534915168, 4065853365001815665),
    (0, 42, 13163110875106803192, 2646172625393561472),
    (0, 2147483647, 17621136605956254054, 7430013799011051835),
    (1, 0, 8297479994805284640, 17436319037275032076),
    (1, 1, 4439858365408730184, 18241485134788043753),
    (1, 1337, 11384934912816432635, 10446309999489440445),
    (1, 3735928559, 3568305470078611615, 11717033814980551407),
    (1, 4294967295, 12869296949882621149, 11858723538104360100),
    (1, 1311768467463790320, 8234274047700489164, 19067927623412041),
    (1, 42, 9309130860759551759, 3884466351543623802),
    (1, 2147483647, 13361650829117783015, 12445107424335584477),
    (1337, 0, 17882155893232223713, 3064370245896719941),
    (1337, 1, 7396086730501389291, 11505652295479360229),
    (1337, 1337, 13117087210069350141, 15935256865024644375),
    (1337, 3735928559, 9168554060309629213, 15760273690018248167),
    (1337, 4294967295, 2743776740352894496, 18425249198110330429),
    (1337, 1311768467463790320, 3865065732872372111, 10750523896882910604),
    (1337, 42, 3785452611834399277, 17852220541738741942),
    (1337, 2147483647, 2355525550941365838, 17252338250779953696),
    (4294967295, 0, 10093894394248050754, 14102774318072404632),
    (4294967295, 1, 2145454048499925717, 6745256005189523715),
    (4294967295, 1337, 13277935794738274643, 8395586220173720390),
    (4294967295, 3735928559, 10730334466504193800, 11313648421404650941),
    (4294967295, 4294967295, 4806657623058444989, 6534458506337949059),
    (4294967295, 1311768467463790320, 16235417132507757250, 5389314566019825176),
    (4294967295, 42, 9443328280766498921, 14122851481795367672),
    (4294967295, 2147483647, 12278059714824066456, 16599690778809978722),
    (123456789, 0, 3984938816360117128, 10061127503453477659),
    (123456789, 1, 3491110763064834831, 5192115319739081893),
    (123456789, 1337, 14222041637643277991, 1926781687466572751),
    (123456789, 3735928559, 13959512244550908139, 15972537581264582107),
    (123456789, 4294967295, 4968212440621675876, 16597794963994406705),
    (123456789, 1311768467463790320, 7234047203498717954, 733077635048881352),
    (123456789, 42, 8976923591570792346, 2576617305940979776),
    (123456789, 2147483647, 2813975410494414451, 18423686796946155157),
]

# first 8 draws of uniform_int_distribution<uint32_t>(0, 2^32-1) over
# mt19937_64(master) — libstdc++, matching cm.h:400-407
GOLDEN_SEEDS = {
    1337: (3006588061, 2448158997, 2944967230, 3061206059, 1389239814, 1184984065, 114675147, 2403974338),
    42: (3243368317, 2744618937, 3230439039, 585286719, 3879510670, 404020322, 2467760665, 1601540474),
    0: (686307269, 4261231228, 169947671, 2566220035, 2329096211, 245499434, 2712393715, 1819221573),
}


def test_murmur_golden_vectors():
    seeds = sorted({g[0] for g in GOLDEN})
    for s in seeds:
        rows = [g for g in GOLDEN if g[0] == s]
        keys = np.array([g[1] for g in rows], dtype=np.uint64)
        h1, h2 = murmur3_x64_128_u64(keys, s)
        assert h1.tolist() == [g[2] for g in rows]
        assert h2.tolist() == [g[3] for g in rows]


def test_hash_u64_is_h2():
    keys = np.array([g[1] for g in GOLDEN if g[0] == 1337], dtype=np.uint64)
    got = hash_u64(keys, 1337)
    assert got.tolist() == [g[3] for g in GOLDEN if g[0] == 1337]


@pytest.mark.parametrize("master", sorted(GOLDEN_SEEDS))
def test_seed_schedule_matches_libstdcxx(master):
    assert seed_schedule(master, 8) == GOLDEN_SEEDS[master]


def test_tokens_to_u64_int32_negative():
    t = np.array([-1, 0, 2147483647, -2147483648], dtype=np.int32)
    u = tokens_to_u64(t)
    assert u.dtype == np.uint64
    assert u.tolist() == [4294967295, 0, 2147483647, 2147483648]


def test_bit_length_u64():
    v = np.array([0, 1, 2, 3, 4, 255, 256, 2**63, 2**64 - 1], dtype=np.uint64)
    assert bit_length_u64(v).tolist() == [0, 1, 2, 2, 3, 8, 9, 64, 64]


def test_hash_scalar_shape():
    h = hash_u64(np.array([7], dtype=np.uint64), 9)
    assert h.shape == (1,)


def test_accumulate_into_scatter_equals_bincount():
    """The wide-sketch scatter strategy (width > 4*chunk) must produce the
    exact same counters as the bincount strategy, weighted and not."""
    import numpy as np
    from sketchlib import hashing as H

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**32, size=300_000, dtype=np.int64)
    seeds = [11, 22, 33]
    for width in (1000, 5 * H._CHUNK):  # one per strategy branch
        t1 = np.zeros((3, width), np.int64)
        H.accumulate_into(keys, seeds, width, t1)
        # reference accumulation: plain full-array hash + bincount
        t2 = np.zeros((3, width), np.int64)
        for j, s in enumerate(seeds):
            h2 = H.murmur3_x64_128_u64(keys.astype(np.uint64), s)[1]
            cols = (h2 % np.uint64(width)).astype(np.int64)
            t2[j] += np.bincount(cols, minlength=width)
        assert np.array_equal(t1, t2), width
        # weighted
        w1 = np.zeros((3, width), np.int64)
        wts = rng.integers(1, 100, size=len(keys))
        H.accumulate_into(keys, seeds, width, w1, weights=wts)
        w2 = np.zeros((3, width), np.int64)
        for j, s in enumerate(seeds):
            h2 = H.murmur3_x64_128_u64(keys.astype(np.uint64), s)[1]
            cols = (h2 % np.uint64(width)).astype(np.int64)
            w2[j] += np.bincount(cols, weights=wts.astype(np.float64),
                                 minlength=width).astype(np.int64)
        assert np.array_equal(w1, w2), width


def test_accumulate_into_rejects_nonintegral_weights_on_every_path():
    """ADVICE r2 + r3 review: float weights silently corrupt on BOTH paths
    (scatter casts per-element to int64; bincount truncates the float64
    chunk sum on .astype(int64)) — must raise for any width, so the same
    call never has width-dependent accept/corrupt semantics."""
    import pytest
    from sketchlib import hashing as H

    keys = np.arange(100, dtype=np.int64)
    for width in (1024, 5 * H._CHUNK):     # bincount path, scatter path
        table = np.zeros((2, width), np.int64)
        with pytest.raises(ValueError, match="integral"):
            H.accumulate_into(keys, [1, 2], width, table,
                              weights=np.full(100, 1.5))
        # integral-valued floats are fine (exact on both paths)
        H.accumulate_into(keys, [1, 2], width, table,
                          weights=np.full(100, 2.0))
        assert table.sum() == 2 * 2 * 100


def test_concurrent_hashing_thread_safe():
    """Round-5 regression: the hash/column workspaces were module-global,
    so driver-side thread pools (the selfcheck fan-out, py4j callback
    threads) corrupted each other's half-computed columns — observed as
    an out-of-bounds IndexError inside point_query, but a collision can
    also land IN-range and return a silently wrong estimate. Workspaces
    are now thread-local; N threads hashing concurrently must reproduce
    the single-threaded answers bit-for-bit, across many iterations so a
    regression actually interleaves."""
    from concurrent.futures import ThreadPoolExecutor

    from sketchlib import hashing as H

    rng = np.random.default_rng(7)
    # span multiple chunks so every loop iteration touches the workspace
    keys = rng.integers(0, 2**63, size=3 * H._CHUNK + 123, dtype=np.int64)
    seeds = [11, 22, 33, 44]
    width = 40961
    expected = {}
    for s in seeds:
        out = np.empty(keys.shape[0], dtype=np.int64)
        H.columns_into(keys, s, width, out)
        expected[s] = out.copy()

    def worker(seed):
        for _ in range(8):
            out = np.empty(keys.shape[0], dtype=np.int64)
            H.columns_into(keys, seed, width, out)
            if not np.array_equal(out, expected[seed]):
                return False
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(worker, seeds * 4))
    assert all(results)
