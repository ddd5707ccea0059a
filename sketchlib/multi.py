"""Composite mergeable aggregator: N sketches over ONE stream in ONE pass.

``MultiSketch`` wraps any tuple of sketchlib sketches behind the same
update/merge/serialize contract the distributed builders
(``spark_build.build_aggregator``) expect, so a single ``mapInArrow`` scan
feeds every wrapped sketch — the shape ``joins.advise_join`` promises
("a single pass over each side's key column"): CM + HLL + MG built
together, one scan per side, KB partial blobs on the shuffle, never rows.

Merge algebra: a MultiSketch merge is the part-wise merge, so it is
associative/commutative and byte-identical in any partition order exactly
when every part is (all sketchlib sketches are; property-tested). Partial
blobs use each part's size-adaptive encoding (``dumps_partial``), final
blobs each part's dense ``to_bytes`` — the same two-level contract as the
individual sketches.

No counterpart in the reference (CountMinDB is single-sketch); follows the
same mergeable-aggregator contract as cm.h's merge path (cm.h:787-816).
"""

from __future__ import annotations

import struct

_MAGIC = b"MUL1"
_VERSION = 1


class MultiSketch:
    """Tuple of sketches updated in lockstep from one stream."""

    __slots__ = ("parts",)

    def __init__(self, parts=()) -> None:
        self.parts = [p() if callable(p) else p for p in parts]
        if not self.parts:
            raise ValueError("MultiSketch needs at least one part")

    # -- updates --------------------------------------------------------

    # same duplicate-collapse crossover as CountMinSketch._AGG_THRESHOLD,
    # halved: the shared sort amortizes over EVERY unique-capable part,
    # so it pays off at smaller batches than a single sketch's own sort
    _SHARED_UNIQUE_THRESHOLD = 1 << 15

    def update_batch(self, vals) -> None:
        import numpy as np

        arr = np.asarray(vals)
        fast = [p for p in self.parts if hasattr(p, "update_unique")]
        # ONE shared duplicate-collapse pass for every part that accepts
        # (uniq, counts): skewed token batches are ~90% duplicates and
        # each keyed sketch would otherwise pay its own O(n log n) sort —
        # the dominant per-batch cost. Order-sensitive value sketches
        # (KLL/t-digest/DDSketch/PrioritySample) expose no update_unique
        # and keep seeing the raw batch; results are byte-identical
        # either way (property-tested).
        if (len(fast) >= 2 and arr.dtype.kind in "iu"
                and arr.shape[0] >= self._SHARED_UNIQUE_THRESHOLD):
            from .countmin import _unique_counts
            uniq, cnt = _unique_counts(arr)
            for p in self.parts:
                if hasattr(p, "update_unique"):
                    p.update_unique(uniq, cnt)
                else:
                    p.update_batch(arr)
        else:
            for p in self.parts:
                p.update_batch(arr)

    # -- lineage surface (build_aggregator reads these) ------------------

    @property
    def n_items(self) -> int:
        return int(self.parts[0].n_items)

    @property
    def total_count(self) -> int:
        return int(getattr(self.parts[0], "total_count", 0))

    # -- merge ----------------------------------------------------------

    def merge(self, other: "MultiSketch") -> "MultiSketch":
        if not isinstance(other, MultiSketch):
            raise ValueError(
                f"cannot combine MultiSketch with {type(other).__name__}")
        if len(self.parts) != len(other.parts):
            raise ValueError("MultiSketch part counts differ")
        for mine, theirs in zip(self.parts, other.parts):
            # each part's own merge validates type + config compatibility
            mine.merge(theirs)
        return self

    # -- misc -----------------------------------------------------------

    def clear(self) -> None:
        for p in self.parts:
            p.clear()

    def nbytes(self) -> int:
        return sum(p.nbytes() for p in self.parts)

    # -- serialization ---------------------------------------------------

    def _pack(self, blobs: list[bytes]) -> bytes:
        head = struct.pack("<4sHHi", _MAGIC, _VERSION, 0, len(blobs))
        return b"".join([head] + [struct.pack("<q", len(b)) + b
                                  for b in blobs])

    def to_bytes(self) -> bytes:
        return self._pack([p.to_bytes() for p in self.parts])

    def to_bytes_auto(self) -> bytes:
        """Partial (shuffle-bound) encoding: parts use their own
        size-adaptive form (e.g. Count-Min sparse triples)."""
        from .serde import dumps_partial
        return self._pack([dumps_partial(p) for p in self.parts])

    @staticmethod
    def from_bytes(buf: bytes) -> "MultiSketch":
        from . import serde
        hs = struct.calcsize("<4sHHi")
        magic, ver, _pad, n = struct.unpack("<4sHHi", buf[:hs])
        if magic != _MAGIC or ver != _VERSION:
            raise ValueError("bad MultiSketch serialization")
        if n < 0:
            raise ValueError("truncated MultiSketch blob")
        off = hs
        parts = []
        for _ in range(n):
            if off + 8 > len(buf):
                raise ValueError("truncated MultiSketch blob")
            (ln,) = struct.unpack("<q", buf[off:off + 8])
            off += 8
            # A corrupt length would mis-slice and surface as a confusing
            # part-level serde error; fail on the clean truncation path.
            if ln < 0 or off + ln > len(buf):
                raise ValueError("truncated MultiSketch blob")
            parts.append(serde.loads(bytes(buf[off:off + ln])))
            off += ln
        if off != len(buf):
            raise ValueError("truncated MultiSketch blob")
        return MultiSketch(parts)
