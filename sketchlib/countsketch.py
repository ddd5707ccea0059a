"""Count-Sketch (AMS) — the unbiased companion to Count-Min.

Count-Min (countmin.py, the reference's core — cm.h:482-496) always
OVER-estimates: every colliding key adds its full count. Count-Sketch
(Charikar-Chen-Farach-Colton 2002) instead scatters each update with a
random sign, so collisions cancel in expectation and the per-row estimate
``s_j(x) * table[j][h_j(x)]`` is UNBIASED; the median over d rows
concentrates it. The error scale also changes: Count-Min errs by
``eps * ||f||_1`` while Count-Sketch errs by ``eps * ||f||_2`` — much
tighter on skewed (Zipf) token streams where ||f||_2 << ||f||_1. The same
signed table yields the classic AMS estimators: the second frequency
moment F2 = sum_t f(t)^2 (each row's sum of squares is an unbiased F2
estimate) and a signed inner product <f, g> (row-wise dot products,
median over rows) mirroring the reference's innerProductQuery
(cm.h:498-516) but unbiased.

Hashing: one murmur3_x64_128 pass per depth row gives BOTH the bucket
(h2 % w, the exact placement rule of the reference, cm.h:486-487) and the
sign (top bit of the h1 word) — the two words of a murmur hash are
independent enough for the pairwise-independence the analysis needs, and
the hot path stays the shared L2-resident chunk kernel (hashing.py).

Mergeable-aggregator contract (the library-wide skeleton, spark_build.py
build_aggregator): merge = elementwise table add — associative,
commutative, byte-identical for any partition/merge order (tested).
update/estimate are pure NumPy; no per-row Python.

Guarantees (tested in tests/test_countsketch.py):
- unbiasedness: mean estimate over independent seeds ~= exact count;
- point error: |est - f(x)| <= sqrt(3/w) * ||f||_2 per probe with
  probability >= 1 - delta for d = ceil(ln 1/delta) median rows;
- F2: relative error <= 4/sqrt(w) with the same confidence.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .countmin import _unique_counts
from .hashing import h1h2_chunks, seed_schedule

_MAGIC = b"CSK1"
_VERSION = 1
_U64 = np.uint64
_TOPBIT = _U64(63)


@dataclass(frozen=True)
class CSConfig:
    """Count-Sketch shape. Two sketches are mergeable iff configs are equal."""

    width: int
    depth: int
    seed: int = 1337
    row_seeds: tuple[int, ...] = field(init=False)

    def __post_init__(self) -> None:
        if self.width < 1 or self.depth < 1:
            raise ValueError("width and depth must be >= 1")
        # same deterministic mt19937_64/libstdc++ schedule the Count-Min
        # rows use (hashing.py) so a (seed) fully determines placement
        object.__setattr__(self, "row_seeds",
                           seed_schedule(self.seed, self.depth))

    @staticmethod
    def from_eps(eps: float, delta: float, seed: int = 1337) -> "CSConfig":
        """Shape for the published guarantee |err| <= eps * ||f||_2 w.p.
        >= 1-delta: w = ceil(3/eps^2) (per-row variance <= F2/w, Chebyshev
        failure <= 1/3), d = ceil(ln 1/delta) median rows."""
        if not 0 < eps < 1 or not 0 < delta < 1:
            raise ValueError("eps and delta must be in (0, 1)")
        return CSConfig(width=int(math.ceil(3.0 / (eps * eps))),
                        depth=int(math.ceil(math.log(1.0 / delta))),
                        seed=seed)

    @property
    def eps(self) -> float:
        """The eps this width supports (err scale in ||f||_2 units)."""
        return math.sqrt(3.0 / self.width)


class CountSketch:
    """Dense d*w signed int64 Count-Sketch with batch (vectorized) updates."""

    __slots__ = ("cfg", "table", "n_items", "total_count")

    def __init__(self, cfg: CSConfig, table: np.ndarray | None = None,
                 n_items: int = 0, total_count: int = 0) -> None:
        self.cfg = cfg
        if table is None:
            table = np.zeros((cfg.depth, cfg.width), dtype=np.int64)
        if table.shape != (cfg.depth, cfg.width):
            raise ValueError("table shape does not match config")
        self.table = table
        self.n_items = n_items
        self.total_count = total_count

    # -- updates -------------------------------------------------------------

    _AGG_THRESHOLD = 1 << 16   # same duplicate-collapse heuristic as CM

    def update_batch(self, keys, counts=None,
                     preaggregate: bool | None = None) -> None:
        """Signed scatter: ``table[j][h_j(x)] += s_j(x) * c`` per depth row.

        Keys stay in their native (narrow) dtype; widening happens
        chunk-locally inside the shared hash kernel. Duplicate keys are
        collapsed by one sort before hashing when the batch is large
        (skewed token streams are ~90% duplicates).
        """
        arr = np.asarray(keys)
        n = arr.shape[0]
        if n == 0:
            return
        # validate BEFORE mutating: a caller that catches the ValueError
        # must not be left with n_items disagreeing with the table (that
        # would break partial byte-identity)
        if counts is not None:
            cnts = np.asarray(counts, dtype=np.int64)
            if cnts.shape[0] != n:
                raise ValueError("counts length must match keys length")
        do_agg = (n >= self._AGG_THRESHOLD) if preaggregate is None else (
            preaggregate and n > 1)
        self.n_items += n
        if counts is None:
            if do_agg:
                arr, cnts = _unique_counts(arr)
            else:
                cnts = None
            self.total_count += n
        else:
            self.total_count += int(cnts.sum())
        self._scatter(arr, cnts)

    def update_unique(self, uniq, counts) -> None:
        """Duplicate-collapsed update: ``uniq`` MUST be duplicate-free,
        ``counts`` its multiplicities. Byte-identical to ``update_batch``
        of the expanded multiset — callers that already hold one shared
        unique pass (MultiSketch) skip this sketch's internal sort."""
        uniq = np.asarray(uniq)
        if uniq.shape[0] == 0:
            return
        c = np.asarray(counts, dtype=np.int64)
        n = int(c.sum())
        self.n_items += n
        self.total_count += n
        self._scatter(uniq, c)

    def _scatter(self, keys: np.ndarray, counts: np.ndarray | None) -> None:
        w = self.cfg.width
        # bincount's O(width) scan per chunk loses to indexed adds for wide
        # tables (same crossover as hashing.accumulate_into)
        use_bincount = w <= (1 << 17)
        for j, s in enumerate(self.cfg.row_seeds):
            row = self.table[j]
            for st, en, h1, h2 in h1h2_chunks(keys, s):
                cols = (h2 % _U64(w)).astype(np.int64)
                # sign = +1 when h1 top bit is 0, -1 when 1
                sgn = 1 - 2 * (h1 >> _TOPBIT).astype(np.int64)
                vals = sgn if counts is None else sgn * counts[st:en]
                if use_bincount:
                    # signed integral weights: float64 bincount sums are
                    # exact below 2^53, cast back is lossless
                    row += np.bincount(cols, weights=vals,
                                       minlength=w).astype(np.int64)
                else:
                    np.add.at(row, cols, vals)

    # -- queries -------------------------------------------------------------

    def _row_estimates(self, keys: np.ndarray) -> np.ndarray:
        """(d, n) matrix of signed per-row estimates."""
        n = np.asarray(keys).shape[0]
        out = np.empty((self.cfg.depth, n), dtype=np.int64)
        w = _U64(self.cfg.width)
        for j, s in enumerate(self.cfg.row_seeds):
            row = self.table[j]
            for st, en, h1, h2 in h1h2_chunks(np.asarray(keys), s):
                cols = (h2 % w).astype(np.int64)
                sgn = 1 - 2 * (h1 >> _TOPBIT).astype(np.int64)
                out[j, st:en] = sgn * row[cols]
        return out

    def point_query_batch(self, keys) -> np.ndarray:
        """Unbiased median-of-rows estimates (float64; median of an even
        depth averages the two middle rows)."""
        return np.median(self._row_estimates(keys), axis=0)

    def point_query(self, key: int) -> float:
        return float(self.point_query_batch(
            np.asarray([key], dtype=np.uint64))[0])

    def f2_estimate(self) -> float:
        """AMS second frequency moment: median over rows of the row's sum
        of squares (each row is an unbiased F2 estimator, variance
        <= 2*F2^2/w)."""
        sq = (self.table.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(sq))

    def l2_estimate(self) -> float:
        """Estimated ||f||_2 = sqrt(F2)."""
        return math.sqrt(max(0.0, self.f2_estimate()))

    def inner_product(self, other: "CountSketch") -> float:
        """Unbiased <f, g> estimate: median over rows of row dot products
        (cf. the reference's always-over innerProductQuery, cm.h:498-516)."""
        self._check(other)
        dots = np.einsum("ij,ij->i", self.table.astype(np.float64),
                         other.table.astype(np.float64))
        return float(np.median(dots))

    # -- merge ---------------------------------------------------------------

    def _check(self, other: "CountSketch") -> None:
        if not isinstance(other, CountSketch):
            raise ValueError(
                f"cannot combine CountSketch with {type(other).__name__}")
        if self.cfg != other.cfg:
            raise ValueError("CountSketch configs differ")

    def merge(self, other: "CountSketch") -> "CountSketch":
        """Elementwise add, in place (the aggregator contract)."""
        self._check(other)
        self.table += other.table
        self.n_items += other.n_items
        self.total_count += other.total_count
        return self

    def subtract(self, other: "CountSketch") -> "CountSketch":
        """Elementwise subtract, in place — merge inverted. The signed
        table is a sum of ±1-signed per-item contributions (linear), so
        subtraction of ANY two same-config sketches is well-defined: the
        result estimates the signed frequency difference f_a − f_b,
        unbiased, with the usual ε·‖f_a − f_b‖₂ error. For snapshots of
        one append-only stream the result is bit-for-bit the sketch of
        the appended delta (same identity as CountMinSketch.subtract,
        without the non-negativity restriction)."""
        self._check(other)
        self.table -= other.table
        self.n_items -= other.n_items
        self.total_count -= other.total_count
        return self

    # -- misc ----------------------------------------------------------------

    def clear(self) -> None:
        self.table.fill(0)
        self.n_items = 0
        self.total_count = 0

    def nbytes(self) -> int:
        return self.table.nbytes

    # -- serialization (magic-dispatched via sketchlib.serde) ----------------

    def to_bytes(self) -> bytes:
        cfg = self.cfg
        head = struct.pack("<4sHHqqqqq", _MAGIC, _VERSION, 0,
                           cfg.width, cfg.depth, cfg.seed,
                           self.n_items, self.total_count)
        return head + np.ascontiguousarray(self.table, dtype="<i8").tobytes()

    @staticmethod
    def from_bytes(buf: bytes) -> "CountSketch":
        hs = struct.calcsize("<4sHHqqqqq")
        magic, ver, _pad, w, d, seed, n_items, total = struct.unpack(
            "<4sHHqqqqq", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad CountSketch serialization")
        body = buf[hs:]
        if len(body) != w * d * 8:
            raise ValueError("truncated CountSketch blob")
        table = np.frombuffer(body, dtype="<i8").reshape(d, w).copy()
        return CountSketch(CSConfig(width=w, depth=d, seed=seed),
                           table=table, n_items=n_items, total_count=total)
