"""Serialization dispatch: every sketch blob starts with a 4-byte magic;
``loads`` routes to the right class so Spark merge stages can be
sketch-agnostic."""

from __future__ import annotations

from .bloom import BloomFilter
from .countmin import CountMinSketch
from .ddsketch import DDSketch
from .hll import HllSketch
from .kll import KllSketch
from .tdigest import TDigest

_REGISTRY = {
    b"CMSK": CountMinSketch,
    b"HLL1": HllSketch,
    b"BLM1": BloomFilter,
    b"DDS1": DDSketch,
    b"KLL1": KllSketch,
    b"TDG1": TDigest,
}


def loads(buf: bytes):
    """Deserialize any sketchlib sketch by its magic prefix."""
    cls = _REGISTRY.get(bytes(buf[:4]))
    if cls is None:
        raise ValueError(f"unknown sketch magic {bytes(buf[:4])!r}")
    return cls.from_bytes(buf)
