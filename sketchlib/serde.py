"""Serialization dispatch: every sketch blob starts with a 4-byte magic;
``loads`` routes to the right class so Spark merge stages can be
sketch-agnostic."""

from __future__ import annotations

from .bloom import BloomFilter
from .countmin import CountMinSketch
from .countsketch import CountSketch
from .ddsketch import DDSketch
from .dyadic import DyadicCM
from .fd import FrequentDirections
from .hll import HllSketch
from .kll import KllSketch
from .mg import MisraGries
from .multi import MultiSketch
from .psample import PrioritySample
from .tdigest import TDigest
from .theta import ThetaSketch

_REGISTRY = {
    b"CMSK": CountMinSketch,
    b"CMSP": CountMinSketch,   # sparse partial encoding (same class)
    b"HLL1": HllSketch,
    b"HLLS": HllSketch,   # sparse partial encoding (same class)
    b"BLM1": BloomFilter,
    b"DDS1": DDSketch,
    b"KLL1": KllSketch,
    b"TDG1": TDigest,
    b"MGK1": MisraGries,
    b"THT1": ThetaSketch,
    b"CSK1": CountSketch,
    b"DYA1": DyadicCM,
    b"FDR1": FrequentDirections,
    b"PSM1": PrioritySample,
    b"MUL1": MultiSketch,
}


def loads(buf: bytes):
    """Deserialize any sketchlib sketch by its magic prefix."""
    cls = _REGISTRY.get(bytes(buf[:4]))
    if cls is None:
        raise ValueError(f"unknown sketch magic {bytes(buf[:4])!r}")
    return cls.from_bytes(buf)


def dumps_partial(sk) -> bytes:
    """Serialize a PARTIAL blob (shuffle-bound, merged downstream): uses the
    sketch's size-adaptive encoding when it has one (Count-Min sparse
    triples for slices that touch few counters), dense otherwise. Final
    results must keep using to_bytes() — its dense form is the byte-
    identity contract."""
    f = getattr(sk, "to_bytes_auto", None)
    return f() if f is not None else sk.to_bytes()
