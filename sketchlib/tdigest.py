"""t-digest quantile sketch (Dunning & Ertl 2019, merging-digest variant).

North-rule companion. Centroids are merged greedily in mean order under the
k1 scale-function bound (accuracy concentrates at the tails). Fully
vectorized compress; deterministic for a given operand order (bound-level
determinism — DDSketch is the byte-exact-across-merge-orders quantile
sketch in this library).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"TDG1"
_VERSION = 1


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf", "n_items", "_min", "_max", "_dirty")

    def __init__(self, delta: float = 200.0) -> None:
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._dirty = True
        self.n_items = 0
        self._min = math.inf
        self._max = -math.inf

    # k1 scale function (Dunning): k(q) = delta/(2*pi) * asin(2q - 1)
    def _k(self, q: np.ndarray) -> np.ndarray:
        # clip: cumulative float error can push q epsilon past 1
        return self.delta / (2 * math.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        if v.shape[0] == 0:
            return
        self.n_items += v.shape[0]
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self._buf.append(v)
        self._dirty = True
        if sum(b.shape[0] for b in self._buf) >= 10 * self.delta:
            self._compress()

    def _compress(self) -> None:
        # short-circuit when already compacted: quantile()/to_bytes() call
        # _compress defensively, and re-running the greedy pass per call
        # was the dominant cost of repeated quantile queries
        if not self._buf and not self._dirty:
            return
        if not self._buf and self.means.shape[0] == 0:
            self._dirty = False
            return
        ms = [self.means] + self._buf
        ws = [self.weights] + [np.ones(b.shape[0]) for b in self._buf]
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        self._buf = []
        if m.shape[0] == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # greedy pass: cumulative weight BEFORE each centroid
        out_m, out_w = [], []
        cur_m, cur_w = m[0], w[0]
        q0 = 0.0
        k0 = float(self._k(np.array([0.0]))[0])
        for i in range(1, m.shape[0]):
            q2 = (q0 * total + cur_w + w[i]) / total
            if float(self._k(np.array([q2]))[0]) - k0 <= 1.0:
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                k0 = float(self._k(np.array([q0]))[0])
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)
        self._dirty = False

    def quantile(self, q: float) -> float:
        if not 0 <= q <= 1:
            raise ValueError("q in [0,1]")
        self._compress()
        m, w = self.means, self.weights
        if m.shape[0] == 0:
            return float("nan")
        if m.shape[0] == 1:
            return float(m[0])
        total = w.sum()
        target = q * total
        cum = np.cumsum(w) - w / 2  # centroid midpoints
        if target <= cum[0]:
            return float(self._min + (m[0] - self._min) * max(target, 0) / max(cum[0], 1e-12))
        if target >= cum[-1]:
            span = total - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            return float(m[-1] + (self._max - m[-1]) * min(frac, 1.0))
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(m[i] + (m[i + 1] - m[i]) * frac)

    def merge(self, other: "TDigest") -> "TDigest":
        if not isinstance(other, TDigest):
            raise ValueError(f"cannot merge TDigest with {type(other).__name__}")
        if abs(self.delta - other.delta) > 1e-9:
            raise ValueError("TDigest deltas differ")
        other._compress()
        if other.means.shape[0]:
            # weighted centroids enter the compress pass directly
            self._compress()
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self._dirty = True
        self.n_items += other.n_items
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def nbytes(self) -> int:
        """Resident centroid/buffer bytes (getMem parity, cm.h:383)."""
        self._compress()
        return int(self.means.nbytes + self.weights.nbytes)

    def to_bytes(self) -> bytes:
        self._compress()
        head = struct.pack("<4sHHdqqdd", _MAGIC, _VERSION, 0, self.delta,
                           self.n_items, self.means.shape[0],
                           self._min, self._max)
        return (head + self.means.astype("<f8").tobytes()
                + self.weights.astype("<f8").tobytes())

    @staticmethod
    def from_bytes(buf: bytes) -> "TDigest":
        hs = struct.calcsize("<4sHHdqqdd")
        magic, ver, _, delta, n_items, n_c, mn, mx = struct.unpack(
            "<4sHHdqqdd", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad TDigest serialization")
        td = TDigest(delta=delta)
        td.n_items = n_items
        td._min, td._max = mn, mx
        off = hs
        if len(buf) < off + 16 * n_c:
            raise ValueError("truncated TDigest blob")
        td.means = np.frombuffer(buf[off:off + 8 * n_c], dtype="<f8").copy()
        off += 8 * n_c
        td.weights = np.frombuffer(buf[off:off + 8 * n_c], dtype="<f8").copy()
        td._dirty = False   # to_bytes compressed immediately before writing
        return td
