"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee, VLDB 2019).

Quantile companion with the strongest merge property in the library: buckets
are fixed log-spaced bins (``key = ceil(log_gamma(x))``), so merge is
bucket-wise addition — associative, commutative, and byte-identical for any
partition/merge order (serialization is canonical: sorted bucket keys).
This is the byte-exact quantile sketch the north rule's merge invariant
asks for; KLL/t-digest (order-sensitive compaction) are bound-level
deterministic companions.

Guarantee: for any q, the returned value x_hat satisfies
``|x_hat - x_q| <= alpha * x_q`` (relative error), for positive inputs.
Zero and negative values are tracked in dedicated stores.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"DDS1"
_VERSION = 1


class DDSketch:
    __slots__ = ("alpha", "gamma", "_lg", "pos", "neg", "zero_count", "n_items")

    def __init__(self, alpha: float = 0.01) -> None:
        if not 0 < alpha < 1:
            raise ValueError("alpha must be in (0,1)")
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._lg = math.log(self.gamma)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero_count = 0
        self.n_items = 0

    # -- build ---------------------------------------------------------------
    def _bucketize(self, store: dict[int, int], vals: np.ndarray) -> None:
        keys = np.ceil(np.log(vals) / self._lg).astype(np.int64)
        uniq, counts = np.unique(keys, return_counts=True)
        for k, c in zip(uniq.tolist(), counts.tolist()):
            store[k] = store.get(k, 0) + c

    def update_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        n = v.shape[0]
        if n == 0:
            return
        if np.isnan(v).any():
            # NaN is neither >0, <0 nor ==0: counting it as a zero would
            # silently shift every low quantile toward 0
            raise ValueError("DDSketch.update_batch received NaN values")
        self.n_items += n
        pos = v > 0
        neg = v < 0
        self.zero_count += int(n - pos.sum() - neg.sum())
        if pos.any():
            self._bucketize(self.pos, v[pos])
        if neg.any():
            self._bucketize(self.neg, -v[neg])

    # -- query ---------------------------------------------------------------
    def count(self) -> int:
        return (sum(self.pos.values()) + sum(self.neg.values())
                + self.zero_count)

    def quantile(self, q: float) -> float:
        if not 0 <= q <= 1:
            raise ValueError("q in [0,1]")
        total = self.count()
        if total == 0:
            return float("nan")
        rank = q * (total - 1)
        # ordered: negatives (most negative first), zeros, positives
        cum = 0
        for k in sorted(self.neg, reverse=True):
            cum += self.neg[k]
            if cum > rank:
                return -2 * self.gamma ** k / (self.gamma + 1)
        if self.zero_count and cum + self.zero_count > rank:
            return 0.0
        cum += self.zero_count
        for k in sorted(self.pos):
            cum += self.pos[k]
            if cum > rank:
                return 2 * self.gamma ** k / (self.gamma + 1)
        k = max(self.pos) if self.pos else 0
        return 2 * self.gamma ** k / (self.gamma + 1)

    # -- algebra ---------------------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        if not isinstance(other, DDSketch):
            raise ValueError(f"cannot merge DDSketch with {type(other).__name__}")
        if abs(self.alpha - other.alpha) > 1e-12:
            raise ValueError("DDSketch alphas differ")
        for k, c in other.pos.items():
            self.pos[k] = self.pos.get(k, 0) + c
        for k, c in other.neg.items():
            self.neg[k] = self.neg.get(k, 0) + c
        self.zero_count += other.zero_count
        self.n_items += other.n_items
        return self

    def nbytes(self) -> int:
        """Resident bucket bytes (getMem parity, cm.h:383)."""
        # pos/neg are int->int dicts; 16 bytes ~ one packed (key, count)
        return 16 * (len(self.pos) + len(self.neg) + 1)

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sHHdqqqq", _MAGIC, _VERSION, 0, self.alpha,
                           self.zero_count, self.n_items,
                           len(self.pos), len(self.neg))
        parts = [head]
        for store in (self.pos, self.neg):
            ks = np.array(sorted(store), dtype="<i8")
            cs = np.array([store[int(k)] for k in ks], dtype="<i8")
            parts.append(ks.tobytes())
            parts.append(cs.tobytes())
        return b"".join(parts)

    @staticmethod
    def from_bytes(buf: bytes) -> "DDSketch":
        hs = struct.calcsize("<4sHHdqqqq")
        magic, ver, _, alpha, zc, n_items, np_, nn = struct.unpack(
            "<4sHHdqqqq", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad DDSketch serialization")
        sk = DDSketch(alpha=alpha)
        sk.zero_count = zc
        sk.n_items = n_items
        off = hs
        if len(buf) < hs + 16 * (np_ + nn):
            raise ValueError("truncated DDSketch blob")
        for store, cnt in ((sk.pos, np_), (sk.neg, nn)):
            ks = np.frombuffer(buf[off:off + 8 * cnt], dtype="<i8"); off += 8 * cnt
            cs = np.frombuffer(buf[off:off + 8 * cnt], dtype="<i8"); off += 8 * cnt
            store.update({int(k): int(c) for k, c in zip(ks, cs)})
        return sk
