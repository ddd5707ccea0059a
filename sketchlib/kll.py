"""KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016) — simplified,
deterministic-compaction variant.

North-rule companion. Levels hold value buffers with weight 2^level; when a
level overflows its capacity (k * (2/3)^(top-level-distance), floor 8) it is
sorted and every other element is promoted. The classic algorithm flips a
random coin for the keep-offset; we derive the offset from a per-level
compaction counter instead, making every build/merge fully DETERMINISTIC for
a given operand order (bound-level determinism — byte-identical across
*merge orders* is provided by DDSketch, see sketchlib/ddsketch.py; KLL's
compaction is inherently order-sensitive).

Rank-error guarantee: eps ~ O(1/k) with the standard KLL constants; tests
check empirical rank error against exact sorts.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"
_VERSION = 1
_C = 2.0 / 3.0


class KllSketch:
    __slots__ = ("k", "levels", "compactions", "n_items")

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.compactions: list[int] = [0]
        self.n_items = 0

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(8, int(self.k * (_C ** depth)))

    def _compact_level(self, level: int) -> None:
        if level + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compactions.append(0)
        buf = np.sort(self.levels[level])
        offset = self.compactions[level] & 1  # deterministic "coin"
        self.compactions[level] += 1
        promoted = buf[offset::2]
        self.levels[level] = np.empty(0, dtype=np.float64)
        self.levels[level + 1] = np.concatenate([self.levels[level + 1], promoted])

    def _maybe_compact(self) -> None:
        level = 0
        while level < len(self.levels):
            if self.levels[level].shape[0] > self._capacity(level):
                self._compact_level(level)
            level += 1

    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        if v.shape[0] == 0:
            return
        self.n_items += v.shape[0]
        # feed in capacity-sized chunks so level-0 never balloons
        cap = max(self.k, 8)
        for st in range(0, v.shape[0], cap):
            self.levels[0] = np.concatenate([self.levels[0], v[st:st + cap]])
            self._maybe_compact()

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for lvl, buf in enumerate(self.levels):
            if buf.shape[0]:
                vals.append(buf)
                wts.append(np.full(buf.shape[0], 1 << lvl, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if not 0 <= q <= 1:
            raise ValueError("q in [0,1]")
        v, w = self._weighted()
        if v.shape[0] == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.shape[0] - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if v.shape[0] == 0:
            return float("nan")
        idx = np.searchsorted(v, x, side="right")
        return float(np.sum(w[:idx]) / np.sum(w))

    def merge(self, other: "KllSketch") -> "KllSketch":
        if not isinstance(other, KllSketch):
            raise ValueError(f"cannot merge KllSketch with {type(other).__name__}")
        if self.k != other.k:
            raise ValueError("KLL k differs")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compactions.append(0)
        for lvl, buf in enumerate(other.levels):
            if buf.shape[0]:
                self.levels[lvl] = np.concatenate([self.levels[lvl], buf])
        self.n_items += other.n_items
        self._maybe_compact()
        return self

    def nbytes(self) -> int:
        """Resident level-buffer bytes (getMem parity, cm.h:383)."""
        return int(sum(lv.nbytes for lv in self.levels))

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sHHqqq", _MAGIC, _VERSION, 0, self.k,
                           self.n_items, len(self.levels))
        parts = [head]
        for lvl, buf in enumerate(self.levels):
            parts.append(struct.pack("<qq", self.compactions[lvl], buf.shape[0]))
            parts.append(buf.astype("<f8").tobytes())
        return b"".join(parts)

    @staticmethod
    def from_bytes(buf: bytes) -> "KllSketch":
        hs = struct.calcsize("<4sHHqqq")
        magic, ver, _, k, n_items, n_levels = struct.unpack("<4sHHqqq", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad KllSketch serialization")
        sk = KllSketch(k=k)
        sk.n_items = n_items
        sk.levels = []
        sk.compactions = []
        off = hs
        for _ in range(n_levels):
            comp, n = struct.unpack("<qq", buf[off:off + 16]); off += 16
            if len(buf) < off + 8 * n:
                raise ValueError("truncated KllSketch blob")
            sk.compactions.append(comp)
            sk.levels.append(np.frombuffer(buf[off:off + 8 * n], dtype="<f8").copy())
            off += 8 * n
        return sk
