"""Bloom filter (Bloom 1970) with Kirsch–Mitzenmacher double hashing.

North-rule companion sketch. The k probe positions are derived from the two
64-bit murmur words (``g_i = h1 + i*h2 mod m``, Kirsch & Mitzenmacher 2006)
so a batch costs one murmur pass regardless of k. Bit-OR merge is
associative, commutative, idempotent — byte-identical for any merge order.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import h1h2_chunks

_MAGIC = b"BLM1"
_VERSION = 1


class BloomFilter:
    __slots__ = ("capacity", "fpr", "seed", "m_bits", "k", "words", "n_items")

    def __init__(self, capacity: int, fpr: float = 0.01, seed: int = 1337,
                 words: np.ndarray | None = None, n_items: int = 0) -> None:
        if capacity <= 0 or not 0 < fpr < 1:
            raise ValueError("capacity must be > 0 and 0 < fpr < 1")
        self.capacity = capacity
        self.fpr = fpr
        self.seed = seed
        m = int(math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2)))
        self.m_bits = ((m + 63) // 64) * 64
        self.k = max(1, round(math.log(2) * self.m_bits / capacity))
        self.words = (np.zeros(self.m_bits // 64, dtype=np.uint64)
                      if words is None else words)
        self.n_items = n_items

    def _positions(self, h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
        g = (h1 + np.uint64(i) * h2) % np.uint64(self.m_bits)
        return g

    def update_batch(self, keys) -> None:
        arr = np.asarray(keys)
        if arr.shape[0] == 0:
            return
        self.n_items += arr.shape[0]
        # membership is idempotent: hash and set bits once per DISTINCT
        # key in the batch (a skewed batch is mostly duplicates, and each
        # duplicate would pay k hashed bitwise_or.at probes). Result is
        # bit-identical; n_items keeps counting occurrences folded.
        self._add_distinct(np.unique(arr))

    def update_unique(self, uniq, counts) -> None:
        """Duplicate-collapsed update: ``uniq`` MUST be duplicate-free,
        ``counts`` its multiplicities. Bit-identical to ``update_batch``
        of the expanded multiset — callers that already hold one shared
        unique pass (MultiSketch) skip this sketch's internal dedup."""
        uniq = np.asarray(uniq)
        if uniq.shape[0] == 0:
            return
        self.n_items += int(np.asarray(counts, dtype=np.int64).sum())
        self._add_distinct(uniq)

    def _add_distinct(self, arr: np.ndarray) -> None:
        one = np.uint64(1)
        six = np.uint64(6)
        mask = np.uint64(63)
        for _, _, h1, h2 in h1h2_chunks(arr, self.seed):
            for i in range(self.k):
                g = self._positions(h1, h2, i)
                np.bitwise_or.at(self.words, (g >> six).astype(np.int64),
                                 one << (g & mask))

    def contains_batch(self, keys) -> np.ndarray:
        arr = np.asarray(keys)
        n = arr.shape[0]
        out = np.ones(n, dtype=bool)
        one = np.uint64(1)
        six = np.uint64(6)
        mask = np.uint64(63)
        for st, en, h1, h2 in h1h2_chunks(arr, self.seed):
            hit = np.ones(en - st, dtype=bool)
            for i in range(self.k):
                g = self._positions(h1, h2, i)
                bits = self.words[(g >> six).astype(np.int64)] & (one << (g & mask))
                hit &= bits != 0
            out[st:en] = hit
        return out

    def contains(self, key: int) -> bool:
        return bool(self.contains_batch(np.array([key], dtype=np.uint64))[0])

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if not isinstance(other, BloomFilter):
            raise ValueError(f"cannot merge BloomFilter with {type(other).__name__}")
        if (self.capacity, self.fpr, self.seed) != (other.capacity, other.fpr, other.seed):
            raise ValueError("Bloom configs differ")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_items += other.n_items
        return self

    def nbytes(self) -> int:
        """Resident bit-array bytes (getMem parity, cm.h:383)."""
        return int(self.words.nbytes)

    def to_bytes(self) -> bytes:
        head = struct.pack("<4sHHqdqqq", _MAGIC, _VERSION, self.k,
                           self.capacity, self.fpr, self.seed, self.m_bits,
                           self.n_items)
        return head + self.words.astype("<u8").tobytes()

    @staticmethod
    def from_bytes(buf: bytes) -> "BloomFilter":
        hs = struct.calcsize("<4sHHqdqqq")
        magic, ver, k, cap, fpr, seed, m_bits, n_items = struct.unpack(
            "<4sHHqdqqq", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad BloomFilter serialization")
        if len(buf) < hs + m_bits // 8:
            raise ValueError("truncated BloomFilter blob")
        words = np.frombuffer(buf[hs:hs + m_bits // 8], dtype="<u8").astype(np.uint64)
        bf = BloomFilter(capacity=cap, fpr=fpr, seed=seed, words=words,
                         n_items=n_items)
        if bf.m_bits != m_bits or bf.k != k:
            raise ValueError(
                "BloomFilter header inconsistent with derived shape "
                f"(m_bits {m_bits} vs {bf.m_bits}, k {k} vs {bf.k})")
        return bf
