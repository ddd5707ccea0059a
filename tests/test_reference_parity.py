"""Bit-level parity with the reference CountMinDB.

Golden state generated once by compiling the reference itself
(/root/reference/cm.h + MurmurHash3.cpp, Uncompressed backend) with a
throwaway driver: eps=e/10 (w=10), delta=e^-3 (d=3), seed=1337, six
updates. The counter matrix and pointQuery outputs below are the
reference's stdout — our sketch must place every count in the same cell
(cm.h:397-398 shape, cm.h:400-407 seeds, cm.h:486 placement) and return
identical estimates, including the pq(42)=9 collision artifact.
"""

import math

import numpy as np

from sketchlib.countmin import CMConfig, CountMinSketch

KEYS = np.array([0, 1, 42, 1337, 4294967295, 999999999999], dtype=np.uint64)
COUNTS = np.array([1, 10, 7, 3, 2, 5], dtype=np.int64)

GOLDEN_TABLE = [
    [3, 0, 17, 0, 0, 1, 2, 5, 0, 0],
    [0, 0, 0, 10, 10, 0, 0, 0, 7, 1],
    [0, 9, 0, 0, 5, 0, 0, 1, 3, 10],
]
GOLDEN_PQ = {0: 1, 1: 10, 42: 9, 1337: 3, 4294967295: 2, 999999999999: 5}


def _build() -> CountMinSketch:
    cfg = CMConfig(eps=math.e / 10.0, delta=math.exp(-3.0), seed=1337)
    assert (cfg.width, cfg.depth) == (10, 3)
    cm = CountMinSketch(cfg)
    cm.update_batch(KEYS, COUNTS)
    return cm


def test_counter_matrix_matches_reference():
    cm = _build()
    assert cm.table.tolist() == GOLDEN_TABLE


def test_point_queries_match_reference():
    cm = _build()
    est = cm.point_query_batch(KEYS)
    assert {int(k): int(e) for k, e in zip(KEYS.tolist(), est)} == GOLDEN_PQ
    # the 42 case is a genuine collision (true count 7, estimate 9):
    # matching it proves we reproduce the reference's placements, not just
    # its bound
    assert cm.point_query(42) == 9


def test_per_item_updates_equal_batch():
    """The reference updates one (key,count) at a time (cm.h:482); batched
    updates must land identically."""
    cfg = CMConfig(eps=math.e / 10.0, delta=math.exp(-3.0), seed=1337)
    one_by_one = CountMinSketch(cfg)
    for k, c in zip(KEYS.tolist(), COUNTS.tolist()):
        one_by_one.update_batch(np.array([k], dtype=np.uint64),
                                np.array([c], dtype=np.int64))
    assert one_by_one.to_bytes() == _build().to_bytes()
