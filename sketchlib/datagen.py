"""Deterministic synthetic token-sequence table (FIXTURES.md §1).

Schema is exactly the BASELINE.json input hint:
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Workload distributions mirror the reference's benchmark generators
(totaltest.cpp:36-53):
- ``uniform``: uniform keys over the int31 token domain (totaltest.cpp:19, 36-43).
- ``zipf``: Zipf theta=0.99 ranks scrambled through MurmurHash3
  (zipf.h:7-41, totaltest.cpp:20, 45-53) — the skew workload. Inverse-CDF
  approximation for theta<1 over a 2^32 rank space:
  ``rank = ceil(N * u^(1/(1-theta)))``.

Generation is chunked (fixed 100k-row chunks, one RNG stream per chunk keyed
by ``(seed, chunk_index)``) so any scale is produced with bounded memory and
identical content regardless of how much is generated at once.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import murmur_h2_into

CHUNK_ROWS = 100_000
_TOKEN_MASK = np.uint64(0x7FFFFFFF)  # int31 domain, FIXTURES.md §1
SOURCES = ("web", "books", "code", "wiki")
SOURCE_WEIGHTS = (0.70, 0.15, 0.10, 0.05)

SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("tokens", pa.list_(pa.int32())),
    ("n_tok", pa.int32()),
    ("source", pa.string()),
])


def _zipf_ranks(rng: np.random.Generator, n: int, theta: float = 0.99,
                space: float = float(2**32)) -> np.ndarray:
    u = rng.random(n)
    ranks = np.ceil(space * u ** (1.0 / (1.0 - theta))).astype(np.uint64)
    return np.maximum(ranks, np.uint64(1))


def _chunk(seed: int, chunk_idx: int, rows: int, start_row: int,
           dist: str) -> pa.RecordBatch:
    rng = np.random.default_rng([seed, chunk_idx])
    n_tok = rng.integers(8, 513, size=rows).astype(np.int32)
    total = int(n_tok.sum())
    if dist == "uniform":
        tokens = rng.integers(0, 2**31 - 1, size=total, dtype=np.int64).astype(np.int32)
    elif dist == "zipf":
        ranks = _zipf_ranks(rng, total)
        # scramble ranks through murmur so hot keys are spread over the
        # token domain (totaltest.cpp:45-53 pattern); workspace-chunked hash
        # (bit-identical to hash_u64) to avoid ~2 GB of ufunc temporaries
        h = np.empty(total, dtype=np.uint64)
        murmur_h2_into(ranks, 9001, h)
        h &= _TOKEN_MASK
        tokens = h.astype(np.int32)
    else:
        raise ValueError(f"unknown dist {dist!r}")
    offsets = np.zeros(rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    token_col = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tokens))
    doc_ids = [f"doc-{i:012d}" for i in range(start_row, start_row + rows)]
    src_idx = rng.choice(len(SOURCES), size=rows, p=SOURCE_WEIGHTS)
    sources = [SOURCES[i] for i in src_idx.tolist()]
    return pa.RecordBatch.from_arrays(
        [pa.array(doc_ids), token_col, pa.array(n_tok), pa.array(sources)],
        schema=SCHEMA)


def generate_token_table(path: str, rows: int, seed: int = 1337,
                         dist: str = "zipf", compression: str = "zstd") -> str:
    """Write a deterministic token table to ``path`` (parquet). Idempotent:
    an existing file whose parquet metadata records the SAME generation
    params is reused; a row-count-only check would silently serve a file
    generated with a different seed/dist to every downstream benchmark."""
    params = f"rows={rows};seed={seed};dist={dist};v=1"
    if os.path.exists(path):
        try:
            md = pq.read_metadata(path)
            meta = md.metadata or {}
            if (md.num_rows == rows
                    and meta.get(b"sketchlib_gen") == params.encode()):
                return path
        except Exception:
            pass
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    # small row groups (~12.5k rows ≈ 3.2M tokens ≈ 13 MB) so Spark's
    # file-split planning yields real parallelism from a single file
    schema = SCHEMA.with_metadata({b"sketchlib_gen": params.encode()})
    with pq.ParquetWriter(tmp, schema, compression=compression) as writer:
        start = 0
        chunk_idx = 0
        while start < rows:
            n = min(CHUNK_ROWS, rows - start)
            batch = _chunk(seed, chunk_idx, n, start, dist)
            for off in range(0, n, 12_500):
                writer.write_batch(batch.slice(off, min(12_500, n - off)))
            start += n
            chunk_idx += 1
    os.replace(tmp, path)
    return path
