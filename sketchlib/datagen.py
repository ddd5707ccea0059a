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


# Cache-blocked zipf token generation. The naive chain (random -> pow ->
# ceil -> astype -> murmur -> astype) streams five full-chunk arrays
# (~100 B of DRAM traffic per token at 26 M tokens/chunk): fine for one
# process, but 32 concurrent generators saturate the VM's memory bandwidth
# and per-chunk wall inflates ~7-14x (measured — see BENCH/BASELINE.md
# Session E). Blocking the chain at 64k elements keeps every temporary
# cache-resident; only the final int32 token write (4 B/token) and the
# uniform draws touch DRAM. Bit-identical to the naive chain: PCG64
# random() is block-splittable (tested), every other op is elementwise.
_GEN_BLOCK = 1 << 16
_gen_ws = None


def _gen_workspace():
    global _gen_ws
    if _gen_ws is None:
        _gen_ws = (np.empty(_GEN_BLOCK, np.float64),
                   np.empty(_GEN_BLOCK, np.uint64),
                   np.empty(_GEN_BLOCK, np.uint64))
    return _gen_ws


def _zipf_tokens_blocked(rng: np.random.Generator, total: int,
                        theta: float = 0.99,
                        space: float = float(2**32)) -> np.ndarray:
    expo = 1.0 / (1.0 - theta)
    u_ws, r_ws, h_ws = _gen_workspace()
    tokens = np.empty(total, dtype=np.int32)
    one = np.uint64(1)
    for st in range(0, total, _GEN_BLOCK):
        m = min(st + _GEN_BLOCK, total) - st
        u = u_ws[:m]
        rng.random(out=u)
        np.power(u, expo, out=u)
        np.multiply(u, space, out=u)
        np.ceil(u, out=u)
        r = r_ws[:m]
        np.copyto(r, u, casting="unsafe")  # same C double->uint64 cast as astype
        np.maximum(r, one, out=r)
        h = h_ws[:m]
        murmur_h2_into(r, 9001, h)
        np.bitwise_and(h, _TOKEN_MASK, out=h)
        tokens[st:st + m] = h
    return tokens


def _chunk(seed: int, chunk_idx: int, rows: int, start_row: int,
           dist: str) -> pa.RecordBatch:
    rng = np.random.default_rng([seed, chunk_idx])
    n_tok = rng.integers(8, 513, size=rows).astype(np.int32)
    total = int(n_tok.sum())
    if dist == "uniform":
        tokens = rng.integers(0, 2**31 - 1, size=total, dtype=np.int64).astype(np.int32)
    elif dist == "zipf":
        # ranks scrambled through murmur so hot keys are spread over the
        # token domain (totaltest.cpp:45-53 pattern); the whole
        # rank->hash->mask chain is cache-blocked (bit-identical to
        # _zipf_ranks + hash, pinned by test_blocked_zipf_bit_identity)
        tokens = _zipf_tokens_blocked(rng, total)
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
