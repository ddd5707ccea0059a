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
import threading

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
# ceil -> astype -> murmur -> astype) allocates and streams five
# full-chunk arrays (~100 B of traffic per token at 26 M tokens/chunk,
# with ephemeral ~100-200 MB buffers whose pages are released and
# re-faulted chunk after chunk): fine for one process, collapses ~6x
# under 32 concurrent generators (measured — see BENCH/BASELINE.md
# Session E). Blocking the chain at 64k elements keeps
# every temporary cache-resident and allocation-free; only the final
# int32 token write (4 B/token) touches DRAM. Bit-identical to the naive
# chain: PCG64 random() is block-splittable (tested), every other op is
# elementwise.
_GEN_BLOCK = 1 << 16
# Thread-local: Spark workers are single-threaded, but driver-side callers
# (thread-pooled query fan-outs) may generate concurrently — a shared
# scratch buffer would interleave two generators' half-computed blocks.
_gen_tls = threading.local()


def _gen_workspace():
    ws = getattr(_gen_tls, "ws", None)
    if ws is None:
        ws = _gen_tls.ws = (np.empty(_GEN_BLOCK, np.float64),
                            np.empty(_GEN_BLOCK, np.uint64),
                            np.empty(_GEN_BLOCK, np.uint64))
    return ws


def _zipf_tokens_blocked(rng: np.random.Generator, total: int,
                        theta: float = 0.99,
                        space: float = float(2**32),
                        out: np.ndarray | None = None) -> np.ndarray:
    expo = 1.0 / (1.0 - theta)
    u_ws, r_ws, h_ws = _gen_workspace()
    # A fresh ~100 MB np.empty per chunk re-faults ~26k pages chunk after
    # chunk (overlapping lifetimes + varying sizes defeat glibc hole
    # reuse; pages get released and re-zeroed); at 32 concurrent
    # generators the kernel's fault/zeroing path contends and aggregate
    # throughput COLLAPSES (measured 141 vs 821 M tok/s —
    # BENCH/BASELINE.md Session E). Callers on the hot path pass a
    # persistent ``out`` buffer; ``None`` keeps a fresh allocation for
    # callers that hand the array to zero-copy Arrow (no aliasing).
    tokens = np.empty(total, dtype=np.int32) if out is None else out[:total]
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


def chunk_tokens(seed: int, chunk_idx: int, rows: int, dist: str = "zipf",
                 out: np.ndarray | None = None):
    """Token stream of chunk ``(seed, chunk_idx)`` WITHOUT the Arrow batch.

    Returns ``(n_tok, tokens, rng)`` where ``tokens`` is bit-identical to
    the flattened ``tokens`` column of ``_chunk`` for the same params (the
    doc-id/source draws happen after the token draws, so the prefix of the
    RNG stream is shared) and ``rng`` is positioned exactly where ``_chunk``
    would be before the source draw. ``out`` (capacity >= rows*512 int32)
    lets hot-path callers reuse one persistent buffer — see
    ``_zipf_tokens_blocked`` for why that matters under concurrency;
    the returned ``tokens`` is then a VIEW that the next call overwrites.
    """
    rng = np.random.default_rng([seed, chunk_idx])
    n_tok = rng.integers(8, 513, size=rows).astype(np.int32)
    total = int(n_tok.sum())
    if dist == "uniform":
        if out is None:
            tokens = rng.integers(0, 2**31 - 1, size=total,
                                  dtype=np.int64).astype(np.int32)
        else:
            # blocked draws are stream-identical: bounded integers() is
            # per-element sequential (pinned by test)
            tokens = out[:total]
            for st in range(0, total, _GEN_BLOCK):
                m = min(st + _GEN_BLOCK, total) - st
                tokens[st:st + m] = rng.integers(0, 2**31 - 1, size=m,
                                                 dtype=np.int64)
    elif dist == "zipf":
        # ranks scrambled through murmur so hot keys are spread over the
        # token domain (totaltest.cpp:45-53 pattern); the whole
        # rank->hash->mask chain is cache-blocked (bit-identical to
        # _zipf_ranks + hash, pinned by test_blocked_zipf_bit_identity)
        tokens = _zipf_tokens_blocked(rng, total, out=out)
    else:
        raise ValueError(f"unknown dist {dist!r}")
    return n_tok, tokens, rng


def _chunk(seed: int, chunk_idx: int, rows: int, start_row: int,
           dist: str) -> pa.RecordBatch:
    # fresh token allocation (out=None): pa.array(tokens) is zero-copy, so
    # the batch must own memory no later call mutates
    n_tok, tokens, rng = chunk_tokens(seed, chunk_idx, rows, dist)
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
