"""Token n-grams over the input-hint shape (tokens array<int32>): packed
adjacent pairs extracted straight from the Arrow list buffers — per-row
adjacency WITHOUT exploding rows or any per-row Python.

The sequence payload makes this the natural "phrase" workload: a bigram
key packs two 31-bit tokens into one int64 ((a << 31) | b — exact and
invertible, no hash collisions before the sketch), so every mergeable
sketch here (CM frequency, MG certain heavy hitters, HLL distinct
bigrams, ...) consumes bigram streams through the same build topologies
as unigrams, including the one-scan MultiSketch profile. Beyond bigrams,
``array_ngrams`` polynomial-hashes windows of any n (13 is the
conventional decontamination shingle length). At 10^12 sequences the
n-gram stream is ~|tokens| long; nothing new shuffles — the same KB
partial blobs move.

No counterpart in the reference (CountMinDB is key-value only); follows
the same update path as cm.h:272-316 once keys are packed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MASK31 = np.int64((1 << 31) - 1)
_POLY_C = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier


def _flat_lens(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 values, per-row lengths) of a list<int> column — THE
    shared flatten for every extractor here. Fails loudly on null
    ELEMENTS inside lists: Arrow's to_numpy then degrades to float64,
    turning nulls into platform-dependent garbage and rounding int64
    tokens above 2^53 — silent hash corruption (and decontamination
    false negatives) if allowed through. Null ROWS are fine (length 0)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.flatten()
    if values.null_count:
        raise ValueError(
            "token lists contain null ELEMENTS: flattening would degrade "
            "to float64 and hash platform-dependent garbage — drop or "
            "fill element nulls first (null/empty ROWS are fine)")
    flat = values.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = pc.list_value_length(col)
    if lens.null_count:
        lens = pc.fill_null(lens, 0)
    return flat, lens.to_numpy(zero_copy_only=False).astype(np.int64)


def batch_bigrams(batch: pa.RecordBatch, col_idx: int) -> np.ndarray:
    """RecordBatch adapter for ``array_bigrams`` — the ``extract`` hook
    shape ``spark_build.build_aggregator`` expects."""
    return array_bigrams(batch.column(col_idx))


def array_bigrams(col) -> np.ndarray:
    """Packed within-row adjacent pairs of a list<int32/int64> column:
    (a << 31) | b as int64. Vectorized: flatten once, pair by shifting
    the flat buffer, mask out the pairs that would cross row boundaries
    (and anything in a null/empty/singleton row). Also the
    ``extract_array`` hook for the parquet-direct builder."""
    flat, lens = _flat_lens(col)
    if flat.shape[0] < 2:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    valid = np.ones(flat.shape[0] - 1, dtype=bool)
    pos = ends[:-1] - 1                     # last value index of each row
    pos = pos[(pos >= 0) & (pos < valid.shape[0])]
    valid[pos] = False                      # pair would span two rows
    a = flat[:-1][valid]
    b = flat[1:][valid]
    # (a << 31) | b is exact only for tokens in [0, 2^31): a stray bit
    # above bit 30 would OR into a's field and silently collide keys.
    if a.size and (((a | b) >> np.int64(31)) != 0).any():
        raise ValueError("array_bigrams requires tokens in [0, 2**31)")
    return (a << np.int64(31)) | b


def array_ngrams(col, n: int, seed: int = 1337) -> np.ndarray:
    """Hashed within-row n-grams of a list<int32/int64> column: one
    int64 key per window of ``n`` adjacent tokens, polynomial-hashed
    (Horner, 64-bit wraparound, odd multiplier) — the shingle stream for
    token-level contamination screens (n=13 is the conventional
    decontamination length) and phrase sketching beyond bigrams, where
    exact bit-packing no longer fits 64 bits. NOT invertible, unlike
    array_bigrams' packing; collisions are ~2^-63 per pair, far below
    any sketch's own collision rate. Vectorized: n shifted views of the
    flat buffer, windows crossing row boundaries masked via a cumulative
    boundary count — no explode, no per-row Python. Also usable as the
    ``extract_array`` hook of the parquet-direct builder (wrap with
    functools.partial for the n/seed)."""
    return _ngrams_impl(col, n, seed)[0]


def array_ngrams_per_row(col, n: int,
                         seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    """(keys, per_row_counts) — array_ngrams plus the row alignment:
    valid windows never cross rows and come out in position order, so
    row i owns the next ``max(len_i - n + 1, 0)`` keys. The building
    block for (doc_id, shingle) tables (np.repeat row ids by counts)."""
    keys, counts = _ngrams_impl(col, n, seed)
    if int(counts.sum()) != keys.shape[0]:   # pragma: no cover
        raise RuntimeError("row-count/window alignment broke: "
                           f"{int(counts.sum())} != {keys.shape[0]}")
    return keys, counts


def _ngrams_impl(col, n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    if n < 2:
        raise ValueError("array_ngrams needs n >= 2 (unigrams are the "
                         "token stream itself)")
    flat, lens = _flat_lens(col)
    counts = np.maximum(lens - (n - 1), 0)
    flat = flat.astype(np.uint64)
    if flat.shape[0] < n:
        return np.empty(0, dtype=np.int64), counts
    ends = np.cumsum(lens)
    # crosses[i] == 1 when (i, i+1) spans two rows; a window starting at
    # i is valid iff no boundary falls among its n-1 internal pairs
    crosses = np.zeros(flat.shape[0], dtype=np.int64)
    pos = ends[:-1] - 1
    pos = pos[(pos >= 0) & (pos < flat.shape[0] - 1)]
    crosses[pos] = 1
    csum = np.concatenate(([0], np.cumsum(crosses)))
    n_windows = flat.shape[0] - n + 1
    valid = (csum[n - 1:n - 1 + n_windows] - csum[:n_windows]) == 0
    # seed mix in Python ints: numpy SCALAR uint64 overflow warns (array
    # ops wrap silently, which the Horner loop below relies on)
    h0 = (int(seed) * int(_POLY_C)) & 0xFFFFFFFFFFFFFFFF
    h = np.full(n_windows, np.uint64(h0), dtype=np.uint64)
    for j in range(n):
        h *= _POLY_C
        h += flat[j:j + n_windows]
    h ^= h >> np.uint64(29)
    h *= _POLY_C
    h &= np.uint64(0x7FFFFFFFFFFFFFFF)      # non-negative int64 keys
    return h[valid].astype(np.int64), counts


def shingle_table(df, tokens_col: str, id_col: str, n: int,
                  seed: int = 1337):
    """(id, shingle) DataFrame: every within-row n-gram hash paired with
    its row's id — the exploded shingle table, built by ONE mapInArrow
    pass (array_ngrams_per_row + np.repeat of the id column), no
    Catalyst explode of n-sized slices and no per-row Python. At 10^12
    sequences this is the probe side of a decontamination screen: feed
    it through a Bloom prescreen (joins.bloom_antijoin /
    pipeline.token_decontaminate) so only probable matches shuffle."""
    id_type = df.schema[id_col].dataType.simpleString()

    def fn(batches):
        for batch in batches:
            ii = batch.schema.get_field_index(id_col)
            ti = batch.schema.get_field_index(tokens_col)
            keys, counts = array_ngrams_per_row(batch.column(ti), n,
                                                seed=seed)
            ids = batch.column(ii).take(
                pa.array(np.repeat(np.arange(len(counts)), counts)))
            # parquet scans hand strings dictionary-encoded; Spark's
            # Arrow reader can't consume dictionary vectors back
            if pa.types.is_dictionary(ids.type):
                ids = ids.cast(ids.type.value_type)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(keys, type=pa.int64())],
                names=[id_col, "shingle"])

    return (df.select(id_col, tokens_col)
            .mapInArrow(fn, schema=f"{id_col} {id_type}, shingle long"))


def batch_ngrams(batch: pa.RecordBatch, col_idx: int, *, n: int,
                 seed: int = 1337) -> np.ndarray:
    """RecordBatch adapter for ``array_ngrams`` — partial over (n, seed)
    to get the ``extract`` hook shape build_aggregator expects."""
    return array_ngrams(batch.column(col_idx), n, seed=seed)


def unpack_bigram(key: int) -> tuple[int, int]:
    """Inverse of the (a << 31) | b packing."""
    return int(key) >> 31, int(key) & int(_MASK31)


def unpack_bigrams(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(keys, dtype=np.int64)
    return k >> np.int64(31), k & _MASK31


def pmi_collocations(uni_cm, bi_cm, bi_mg, *, uni_mg=None, k: int = 20,
                     min_pairs: int = 1) -> list[tuple]:
    """Sketch-certified collocation discovery: rank Misra-Gries-surviving
    bigrams by pointwise mutual information, with a DETERMINISTICALLY
    certified bracket per candidate — answered entirely from KB-scale
    blobs, no corpus rescans.

    PMI(a,b) = log( (c_ab/P) / ((c_a/N)(c_b/N)) ) with N total tokens,
    P total adjacent pairs (both exact: sketches carry exact totals).
    The bracket composes only CERTAIN inequalities — never the
    probabilistic eps*||f||_1 tail, which fails ~delta per query and
    would make the bracket a coin flip across many candidates:

    - c_ab in [mg_cnt, cm_ab]: CM never underestimates (cm.h:275-312
      one-sided contract); the MG survivor count never overestimates
      (decrements only remove true mass).
    - c_a, c_b in [max(uni_mg survivor count, mg_cnt, 1), cm_x]: every
      occurrence of the pair (a,b) contains one occurrence of a and one
      of b, so c_x >= c_ab >= mg_cnt structurally; an optional unigram
      MG tightens the lower end for head tokens.

    Monotonicity then gives PMI_exact in [pmi_lb, pmi_ub] ALWAYS.
    Returns the top-``k`` of (tok_a, tok_b, c_ab_est, pmi_lb, pmi_est,
    pmi_ub) ranked by certified PMI lower bound (desc, then tok_a/tok_b
    asc — fully deterministic); ``pmi_est`` is the plug-in estimate from
    the CM point queries. ``min_pairs`` drops candidates whose CM
    estimate is below a support floor before ranking.

    Scale shape: candidates come from the MG survivor set (<= its k),
    so the driver does O(k) float ops on blobs the build already
    shuffled — the 10^12-sequence cost is the two sketch builds, which
    are the existing one-scan topologies (build_aggregator over tokens
    and over batch_bigrams)."""
    import math

    n_tok = float(uni_cm.total_count)
    n_pairs = float(bi_cm.total_count)
    if n_tok <= 0 or n_pairs <= 0:
        return []
    uni_lo = dict(uni_mg.top_items()) if uni_mg is not None else {}
    out = []
    for key, mg_cnt in bi_mg.top_items():
        est_ab = float(bi_cm.point_query(int(key)))
        if est_ab < min_pairs:
            continue
        a, b = unpack_bigram(int(key))
        lo_ab = max(float(mg_cnt), 1.0)
        est_a = float(uni_cm.point_query(a))
        est_b = float(uni_cm.point_query(b))
        lo_a = max(float(uni_lo.get(a, 0)), lo_ab)
        lo_b = max(float(uni_lo.get(b, 0)), lo_ab)
        scale = n_tok * n_tok / n_pairs
        pmi = math.log(est_ab * scale / (est_a * est_b))
        pmi_ub = math.log(est_ab * scale / (lo_a * lo_b))
        pmi_lb = math.log(lo_ab * scale / (est_a * est_b))
        out.append((a, b, int(est_ab), pmi_lb, pmi, pmi_ub))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:k]
