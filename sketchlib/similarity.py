"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: pure Catalyst (zip_with + aggregate), the
  correctness baseline — one scan, no shuffle of vectors, pushdown-friendly.
- Random-hyperplane LSH buckets: the scale path — vectors are reduced to
  nbit sign fingerprints (one matrix multiply per Arrow batch), candidates
  meet in bucket joins instead of a cross join, then verify exact cosine on
  candidates only.
- IVF-style coarse quantization: seeded deterministic centroids (k-means++
  init, few Lloyd iterations, driver-side on a sample), assignment via
  Pandas UDF; queries probe nearest n_probe cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _lit_vec(vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vec])


def _id_type(df: DataFrame, id_col: str) -> str:
    return df.schema[id_col].dataType.simpleString()


def _dot(a, b) -> "F.Column":
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(c) -> "F.Column":
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _cosine(a, b) -> "F.Column":
    """Zero-safe cosine: NULL (not NaN, not a crash) when either vector
    has zero norm — try_divide keeps ANSI mode from raising
    DIVIDE_BY_ZERO, NULLs sort last in top-k and fail >= thresholds."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_to_query(df: DataFrame, vec_col: str, query_vec,
                    out_col: str = "cosine") -> DataFrame:
    """Append exact cosine similarity to a constant query vector — stays in
    whole-stage codegen (zip_with/aggregate), no Python."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    return df.withColumn(
        out_col, F.try_divide(_dot(F.col(vec_col), _lit_vec(q)),
                              _norm(F.col(vec_col)) * F.lit(qn)))


def ann_topk_bruteforce(df: DataFrame, vec_col: str, id_col: str,
                        query_vec, k: int = 10) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id."""
    scored = cosine_to_query(df, vec_col, query_vec)
    return (scored.select(id_col, "cosine")
            .orderBy(F.desc("cosine"), F.col(id_col)).limit(k))


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, nbits))


def lsh_fingerprints(df: DataFrame, vec_col: str, id_col: str, *,
                     nbits: int = 16, n_tables: int = 4,
                     dim: int = 64, seed: int = 1337) -> DataFrame:
    """(id, table, bucket) — sign-bit buckets under n_tables independent
    hyperplane sets. One matrix multiply per Arrow batch."""
    planes = [_hyperplanes(dim, nbits, seed + t) for t in range(n_tables)]
    weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))

    def fn(pdf_iter):
        for pdf in pdf_iter:
            ids = pdf[id_col].to_numpy()
            mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            out_ids, out_tab, out_buck = [], [], []
            for t, P in enumerate(planes):
                signs = (mat @ P) > 0
                bucket = (signs.astype(np.uint64) @ weights).astype(np.int64)
                out_ids.append(ids)
                out_tab.append(np.full(len(ids), t, dtype=np.int32))
                out_buck.append(bucket)
            yield pd.DataFrame({
                id_col: np.concatenate(out_ids),
                "table": np.concatenate(out_tab),
                "bucket": np.concatenate(out_buck),
            })

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} {_id_type(df, id_col)}, table int, bucket long")


def lsh_cosine_pairs(df: DataFrame, vec_col: str, id_col: str, *,
                     threshold: float = 0.85, nbits: int = 16,
                     n_tables: int = 4, dim: int = 64,
                     seed: int = 1337, bucket_cap: int = 256) -> DataFrame:
    """Near-duplicate embedding pairs: LSH bucket candidates -> exact cosine
    verify. Only (id, table, bucket) rows shuffle; exact cosine runs on the
    candidate pairs' vectors via a bucket-scoped join. Buckets larger than
    ``bucket_cap`` degrade to linear star pairs (sketchlib.lshjoin skew
    cap), so a corpus of N identical vectors cannot make one bucket
    O(N^2).

    Recall contract: while every bucket stays <= bucket_cap (the normal
    regime — 2^nbits buckets per table vs corpus size), exact duplicates
    share every bucket and recall on exact-dup pairs is 1.0; near-
    threshold pairs carry the usual hyperplane-LSH recall curve (raise
    n_tables / lower nbits to push it up). In an OVER-cap bucket the
    guarantee weakens: candidates are (bucket-min, member) stars, and if
    the bucket-min is a collider rather than a true dup, its members'
    mutual pairs are dropped by the verify step. bucket_cap=None restores
    exact bucket semantics at the quadratic-bucket risk."""
    from .lshjoin import bucket_candidate_pairs

    fp = lsh_fingerprints(df, vec_col, id_col, nbits=nbits,
                          n_tables=n_tables, dim=dim, seed=seed)
    cand = bucket_candidate_pairs(fp, ["table", "bucket"], id_col,
                                  cap=bucket_cap)
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def cosine_pairs_exact(df: DataFrame, vec_col: str, id_col: str, *,
                       threshold: float = 0.85) -> DataFrame:
    """Exact all-pairs cosine >= threshold (cross join — verification-scale
    only; lsh_cosine_pairs is the scale path). Returns (id_a, id_b)."""
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (va.join(vb, F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", _cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b"))


# ---------------------------------------------------------------------------
# IVF-style coarse quantization
# ---------------------------------------------------------------------------

def train_ivf_centroids(df: DataFrame, vec_col: str, *, n_cells: int = 16,
                        sample: int = 4096, iters: int = 5,
                        seed: int = 1337) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (k-means++ init,
    few Lloyd iterations). Centroid training is cheap and bounded; the
    expensive assignment stays distributed."""
    # deterministic sample regardless of partition layout: order by a
    # content hash, then limit — a bare limit() takes whatever partitions
    # answer first, so "seeded" centroids would still drift between runs
    rows = (df.select(vec_col)
            .filter(F.col(vec_col).isNotNull())
            .orderBy(F.xxhash64(F.col(vec_col)))
            .limit(sample).collect())
    X = np.vstack([np.asarray(r[0], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    # k-means++ init
    cents = [X[int(rng.integers(len(X)))]]
    for _ in range(n_cells - 1):
        d2 = np.min([(np.square(X - c).sum(axis=1)) for c in cents], axis=0)
        probs = d2 / d2.sum() if d2.sum() > 0 else np.ones(len(X)) / len(X)
        cents.append(X[int(rng.choice(len(X), p=probs))])
    C = np.vstack(cents)
    for _ in range(iters):
        d = np.square(X[:, None, :] - C[None, :, :]).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(n_cells):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ivf_cell_col(centroids: np.ndarray, vec_col):
    """Column expression: nearest-centroid cell id for each vector — a
    scalar pandas UDF (one matmul per Arrow batch), so the cell attaches
    IN PLACE with zero shuffle (the previous assign-then-join-by-id shape
    shuffled the whole vector table before every partitioned write)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def cell(vecs: pd.Series) -> pd.Series:
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        return pd.Series(_cell_block(X, C))

    return cell(vec_col)


def _cell_block(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid cell per row of X — one matmul; ties break to the
    lowest cell id (argmin), consistently across every assignment path."""
    d = (np.square(X).sum(axis=1)[:, None]
         - 2 * X @ C.T + np.square(C).sum(axis=1)[None, :])
    return d.argmin(axis=1).astype(np.int32)


def ivf_assign(df: DataFrame, vec_col: str, id_col: str,
               centroids: np.ndarray) -> DataFrame:
    """(id, cell) — nearest-centroid assignment via ivf_cell_col."""
    return df.select(id_col, ivf_cell_col(centroids, F.col(vec_col))
                     .alias("cell"))


def _probe_cells(query_vec, centroids: np.ndarray, n_probe: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d = np.square(C - q[None, :]).sum(axis=1)
    return [int(c) for c in np.argsort(d)[:n_probe]]


def ivf_write_index(df: DataFrame, vec_col: str, id_col: str,
                    centroids: np.ndarray, path: str) -> None:
    """Build the IVF index as STORAGE LAYOUT: the table is written
    partitioned by nearest-centroid cell (hive-style ``cell=N/`` dirs), paid
    once at ingest. Probes then read only the probed cells' files via
    parquet partition pruning — no per-query assignment pass, no join. This
    is the 100 TB shape: query cost scales with n_probe/n_cells of the
    table, independent of total size."""
    (df.withColumn("cell", ivf_cell_col(centroids, F.col(vec_col)))
       .write.mode("overwrite").partitionBy("cell").parquet(path))


def ivf_topk_indexed(spark, index_path: str, vec_col: str, id_col: str,
                     query_vec, centroids: np.ndarray, *, k: int = 10,
                     n_probe: int = 4) -> DataFrame:
    """ANN top-k over an ivf_write_index table. The ``cell`` filter is a
    partition filter (asserted in tests/test_plans.py: the scan's
    PartitionFilters carries it, files of unprobed cells are never opened)."""
    cells = _probe_cells(query_vec, centroids, n_probe)
    scan = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    return ann_topk_bruteforce(scan, vec_col, id_col, query_vec, k=k)


def ivf_topk(df: DataFrame, vec_col: str, id_col: str, query_vec,
             centroids: np.ndarray, *, k: int = 10,
             n_probe: int = 4) -> DataFrame:
    """Ad-hoc (index-free) IVF probe: assigns cells on the fly and filters —
    one full assignment pass per query, so ONLY for unindexed one-off
    queries. The scale path is ivf_write_index + ivf_topk_indexed, where the
    cell filter prunes parquet partitions instead."""
    cells = _probe_cells(query_vec, centroids, n_probe)
    pruned = (df.withColumn("cell", ivf_cell_col(centroids, F.col(vec_col)))
              .filter(F.col("cell").isin(cells)))
    return ann_topk_bruteforce(pruned, vec_col, id_col, query_vec, k=k)


def gram_exact(df: DataFrame, vec_col: str, dim: int):
    """Exact Gram matrix A'A of the embedding column, distributed: each
    partition folds its rows into ONE dim x dim float64 partial (a single
    BLAS syrk-shaped matmul per Arrow batch — no per-row Python), partials
    come back as dim*dim arrays and sum on the driver. Driver fan-in is
    n_partitions * dim^2 * 8 bytes (64-dim -> 32 KB per partial), bounded
    by partition count, never by row count; raw vectors never shuffle.
    Returns (G: np.ndarray dim x dim, n_rows: int). The test-side oracle
    for the FrequentDirections sketch (sketchlib.fd)."""
    import pyarrow as pa

    def fn(batches):
        g = np.zeros((dim, dim), dtype=np.float64)
        n = 0
        for batch in batches:
            col = batch.column(0)
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                col = col.flatten()
            flat = col.to_numpy(zero_copy_only=False)
            if flat.shape[0] % dim:
                raise ValueError(
                    f"vector column not a multiple of dim={dim}")
            x = flat.reshape(-1, dim).astype(np.float64, copy=False)
            g += x.T @ x
            n += x.shape[0]
        yield pa.RecordBatch.from_pydict(
            {"n": [n], "g": [g.ravel().tolist()]},
            schema=pa.schema([("n", pa.int64()),
                              ("g", pa.list_(pa.float64()))]))

    parts = (df.select(vec_col).filter(F.col(vec_col).isNotNull())
             .mapInArrow(fn, "n long, g array<double>").collect())
    G = np.zeros((dim, dim), dtype=np.float64)
    n_rows = 0
    for r in parts:
        G += np.asarray(r["g"], dtype=np.float64).reshape(dim, dim)
        n_rows += int(r["n"])
    return G, n_rows


def project_onto(df: DataFrame, vec_col: str, directions, *,
                 keep_cols: tuple = (), out_col: str = "proj") -> DataFrame:
    """Project the embedding column onto k row-orthonormal directions
    (k x dim, e.g. FrequentDirections.top_directions) — distributed
    dimensionality reduction: one batched matmul per Arrow batch, no
    shuffle, output rows carry ``keep_cols`` plus the k-dim projection.
    The direction matrix ships in the task closure (k*dim*8 bytes — for
    k=64, dim=1024 that is 512 KB, broadcast-sized)."""
    import pyarrow as pa

    v = np.ascontiguousarray(np.asarray(directions, dtype=np.float64))
    k, dim = v.shape
    keep = list(keep_cols)

    def fn(batches):
        for batch in batches:
            col = batch.column(len(keep))
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                col = col.flatten()
            flat = col.to_numpy(zero_copy_only=False)
            if flat.shape[0] % dim:
                raise ValueError(f"vector column not a multiple of dim={dim}")
            x = flat.reshape(-1, dim).astype(np.float64, copy=False)
            proj = x @ v.T                       # (n, k)
            out = {c: batch.column(i) for i, c in enumerate(keep)}
            out[out_col] = pa.array(list(proj), pa.list_(pa.float64()))
            yield pa.RecordBatch.from_pydict(out)

    src = df.select(*keep, vec_col).filter(F.col(vec_col).isNotNull())
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep]
        + [f"{out_col} array<double>"])
    return src.mapInArrow(fn, schema)


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011) — the compression half of the
# billion-scale IVF-PQ layout: embeddings become m uint8 codes (dim/m
# float32 -> 1 byte per subspace, 32x smaller at dim=64/m=8), and query
# distances are m table lookups per candidate instead of a dim-wide dot.
# ---------------------------------------------------------------------------

def _kmeans_1sub(X: np.ndarray, ksub: int, seed: int,
                 iters: int = 25) -> np.ndarray:
    """Deterministic Lloyd k-means for one subspace on a driver-side
    sample. Init is kmeans++-style with a seeded RNG; empty clusters
    re-seed to the point farthest from its centroid (keeps all ksub
    codes live on small samples)."""
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    C = np.empty((ksub, X.shape[1]), dtype=np.float64)
    C[0] = X[rng.integers(n)]
    d2 = np.square(X - C[0]).sum(axis=1)
    for j in range(1, ksub):
        p = d2 / max(d2.sum(), 1e-30)
        C[j] = X[rng.choice(n, p=p)]
        d2 = np.minimum(d2, np.square(X - C[j]).sum(axis=1))
    for _ in range(iters):
        d = (np.square(X).sum(1)[:, None] - 2 * X @ C.T
             + np.square(C).sum(1)[None, :])
        assign = d.argmin(axis=1)
        for j in range(ksub):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
            else:
                far = int(d.min(axis=1).argmax())
                C[j] = X[far]
    return C


def pq_train(df: DataFrame, vec_col: str, *, m: int = 8, ksub: int = 16,
             sample_rows: int = 4096, seed: int = 1337) -> np.ndarray:
    """Train PQ codebooks on a bounded driver-side sample (same contract
    as train_ivf_centroids: training is a small deterministic sample,
    ENCODING is distributed). Returns codebooks (m, ksub, dsub)."""
    # deterministic sample regardless of partition layout (same contract
    # as train_ivf_centroids): NULL vectors excluded, rows ordered by a
    # content hash before the limit — a bare limit() takes whatever
    # partitions answer first, so codebooks would drift between runs
    sample = np.vstack([np.asarray(r[0], dtype=np.float64) for r in
                        df.select(vec_col)
                        .filter(F.col(vec_col).isNotNull())
                        .orderBy(F.xxhash64(F.col(vec_col)))
                        .limit(sample_rows).collect()])
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if not 2 <= ksub <= 256:
        raise ValueError("ksub must be in [2, 256] (codes are uint8)")
    dsub = dim // m
    return np.stack([
        _kmeans_1sub(np.ascontiguousarray(sample[:, i*dsub:(i+1)*dsub]),
                     ksub, seed + i) for i in range(m)])


def pq_encode(df: DataFrame, vec_col: str, id_col: str,
              codebooks: np.ndarray) -> DataFrame:
    """(id, code binary) — distributed encoding, one argmin per subspace
    per batch (vectorized), codes travel as m-byte blobs. This is the
    column you persist next to (or instead of) the raw vectors: at
    dim=64/m=8 it is 32x smaller, so a 100 TB embedding column becomes
    ~3 TB of codes that fit hot storage."""
    cb = codebooks  # rides the closure; (m, ksub, dsub) float64

    def fn(pdf_iter):
        for pdf in pdf_iter:
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vec_col]])
            codes = _pq_encode_block(X, cb)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "code": [c.tobytes() for c in codes]})

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} {_id_type(df, id_col)}, code binary")


def _pq_encode_block(X: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n, dim) float block -> (n, m) uint8 codes: one argmin per
    subspace, vectorized over the block."""
    m, ksub, dsub = cb.shape
    codes = np.empty((X.shape[0], m), dtype=np.uint8)
    for i in range(m):
        sub = X[:, i*dsub:(i+1)*dsub]
        d = (np.square(sub).sum(1)[:, None] - 2 * sub @ cb[i].T
             + np.square(cb[i]).sum(1)[None, :])
        codes[:, i] = d.argmin(axis=1)
    return codes


def pq_topk(codes_df: DataFrame, id_col: str, query_vec,
            codebooks: np.ndarray, *, k: int = 10) -> DataFrame:
    """ANN top-k by asymmetric distance (ADC): the query builds one
    (m, ksub) lookup table of exact subspace distances, broadcast via
    the closure; each candidate's approximate distance is m uint8-indexed
    table lookups summed — no raw vectors read, no dot products.
    Returns (id, adc_dist) ascending."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    table = np.stack([
        np.square(codebooks[i] - q[i*dsub:(i+1)*dsub][None, :]).sum(axis=1)
        for i in range(m)])                      # (m, ksub)

    def fn(pdf_iter):
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8).reshape(-1, m)
            dist = table[np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "adc_dist": dist})

    scored = codes_df.mapInPandas(
        fn, schema=f"{id_col} {_id_type(codes_df, id_col)}, adc_dist double")
    return scored.orderBy("adc_dist", id_col).limit(k)


def pq_topk_rerank(df: DataFrame, codes_df: DataFrame, vec_col: str,
                   id_col: str, query_vec, codebooks: np.ndarray, *,
                   k: int = 10, rerank: int = 64) -> DataFrame:
    """The production IVF-PQ query shape: ADC over the compressed codes
    shortlists ``rerank`` candidates (cheap — table lookups over bytes),
    then ONLY those ids fetch their raw vectors (a k-row broadcast
    semi-join against the embedding table) for exact L2 re-ranking.
    Quantization error is confined to the shortlist boundary: any true
    neighbor ADC ranks inside ``rerank`` comes out exactly ordered.
    Returns (id, dist) ascending, exact distances."""
    q = np.asarray(query_vec, dtype=np.float64)
    short = pq_topk(codes_df, id_col, q, codebooks, k=rerank) \
        .select(id_col)
    cand = df.join(F.broadcast(short), id_col)
    dist = F.aggregate(
        F.zip_with(vec_col, _lit_vec(q), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (cand.select(id_col, dist.alias("dist"))
            .orderBy("dist", id_col).limit(k))


def ivfpq_write_index(df: DataFrame, vec_col: str, id_col: str,
                      centroids: np.ndarray, codebooks: np.ndarray,
                      path: str) -> None:
    """The composed billion-vector layout (IVF-PQ): PQ codes written
    partitioned by nearest coarse cell. A probe then reads only the
    probed cells' files (parquet partition pruning — same plan shape as
    ivf_write_index, asserted there) and scans CODES, not vectors:
    storage pruning x 16-32x byte compression multiply. Raw vectors stay
    in the source table and are touched only by the final re-rank.

    One pass: each Arrow batch computes its PQ codes AND its coarse cell
    in the same mapInPandas (the encode-then-assign-then-join-on-id shape
    read the raw vectors twice and shuffled every row through the join;
    review r3). Cell assignment reuses _cell_block, so ties break
    identically to ivf_cell_col / ivf_assign."""
    _ivfpq_write(df, vec_col, id_col, centroids, codebooks, path,
                 mode="overwrite")


def ivfpq_append_index(df: DataFrame, vec_col: str, id_col: str,
                       centroids: np.ndarray, codebooks: np.ndarray,
                       path: str, *, min_recall: float | None = None,
                       drift_queries: int = 16, drift_k: int = 10,
                       n_probe: int = 4, rerank: int = 64) -> None:
    """Incremental maintenance for the IVF-PQ layout: encode NEW vectors
    with the index's FROZEN centroids/codebooks and append their code
    files into the existing cell partitions — existing data is never
    rewritten, and probes over the updated index are identical to an
    index rebuilt from scratch over old ∪ new (same frozen models ⇒ same
    codes, same cells; test-pinned). The vector counterpart of
    incremental_build: a daily embedding append costs one encode pass
    over the delta.

    Frozen-model drift (inherent to every frozen-model ANN index): if
    the appended distribution drifts far from the training sample,
    recall for the new vectors degrades silently. Pass ``min_recall`` to
    run ivfpq_drift_check on the delta BEFORE anything is written: a
    delta whose self-recall under the frozen models falls below the
    threshold is REFUSED (ValueError) with the re-train path — retrain
    (train_ivf_centroids + pq_train over old ∪ new) and rebuild via
    ivfpq_write_index. In-distribution appends pass untouched."""
    codes = None
    if min_recall is not None:
        # the drift check encodes the delta; keep those codes cached and
        # reuse them for the write — the gated append stays ONE encode
        # pass over the delta, as advertised
        codes = _ivfpq_encode(df, vec_col, id_col, centroids,
                              codebooks).cache()
        rep = ivfpq_drift_check(df, vec_col, id_col, centroids, codebooks,
                                n_queries=drift_queries, k=drift_k,
                                n_probe=n_probe, rerank=rerank,
                                codes=codes)
        if rep["recall"] < min_recall:
            codes.unpersist()
            raise ValueError(
                f"ivfpq_append_index refused: frozen-model recall on the "
                f"appended delta is {rep['recall']:.3f} < min_recall="
                f"{min_recall} ({rep['n_queries']} probe queries, "
                f"k={rep['k']}) — the delta's distribution has drifted "
                "from the index's training sample. Re-train path: "
                "train_ivf_centroids + pq_train over old ∪ new, then "
                "rebuild with ivfpq_write_index.")
    _ivfpq_write(df, vec_col, id_col, centroids, codebooks, path,
                 mode="append", codes=codes)
    if codes is not None:
        codes.unpersist()


def _ivfpq_encode(df, vec_col, id_col, centroids, codebooks) -> DataFrame:
    """(id, code binary, cell int): one mapInPandas pass computes each
    Arrow batch's PQ codes AND coarse cell (reading the raw vectors
    once); shared by the index writers and the drift detector."""
    cb = codebooks
    C = np.asarray(centroids, dtype=np.float64)

    def fn(pdf_iter):
        for pdf in pdf_iter:
            X = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vec_col]])
            codes = _pq_encode_block(X, cb)
            yield pd.DataFrame({id_col: pdf[id_col],
                                "code": [c.tobytes() for c in codes],
                                "cell": _cell_block(X, C)})

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} {_id_type(df, id_col)}, code binary, cell int")


def _ivfpq_write(df, vec_col, id_col, centroids, codebooks, path, *,
                 mode: str, codes: DataFrame | None = None) -> None:
    if codes is None:
        codes = _ivfpq_encode(df, vec_col, id_col, centroids, codebooks)
    codes.write.mode(mode).partitionBy("cell").parquet(path)


def ivfpq_drift_check(delta_df: DataFrame, vec_col: str, id_col: str,
                      centroids: np.ndarray, codebooks: np.ndarray, *,
                      n_queries: int = 16, k: int = 10, n_probe: int = 4,
                      rerank: int = 64, seed: int = 1337,
                      codes: DataFrame | None = None) -> dict:
    """Measure how well the index's FROZEN centroids/codebooks serve the
    appended delta (VERDICT r3 #5). For a deterministic sample of the
    delta's own vectors (ordered by xxhash64(id, seed) — re-runs probe
    the same rows regardless of partition layout), run the full IVF-PQ
    query shape (coarse-cell probe → ADC shortlist → exact re-rank) over
    the delta encoded with the frozen models, and compare against the
    brute-force exact top-k over the same delta. Returns
    {"recall": mean, "per_query": [...], "n_queries", "k"}.

    Why self-recall detects drift: in-distribution vectors spread over
    the trained cells and quantize near their codewords, so the probe
    finds them (recall ≈ 1). A shifted distribution collapses into few
    (wrong) cells and its PQ codes degenerate — ADC distances stop
    discriminating, the shortlist misses true neighbors, recall drops.
    Cost: one encode pass over the delta plus n_queries KB-scale top-k
    jobs — O(delta), never touches the existing index. Pass ``codes``
    (a cached _ivfpq_encode frame for the same delta) to skip the
    encode pass entirely — ivfpq_append_index does, so a gated append
    encodes the delta exactly once."""
    own_codes = codes is None
    if own_codes:
        codes = _ivfpq_encode(delta_df, vec_col, id_col, centroids,
                              codebooks).cache()
    sample = (delta_df.select(id_col, vec_col)
              .filter(F.col(vec_col).isNotNull())
              .orderBy(F.xxhash64(F.col(id_col).cast("string"),
                                  F.lit(seed)))
              .limit(n_queries).collect())
    per_query = []
    for r in sample:
        q = np.asarray(r[vec_col], dtype=np.float64)
        cells = [int(c) for c in _probe_cells(q, centroids, n_probe)]
        cand = codes.filter(F.col("cell").isin(cells))
        ann = {row[id_col] for row in
               pq_topk_rerank(delta_df, cand, vec_col, id_col, q,
                              codebooks, k=k, rerank=rerank).collect()}
        dist = F.aggregate(
            F.zip_with(vec_col, _lit_vec(q), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        exact = {row[id_col] for row in
                 delta_df.select(id_col, dist.alias("d"))
                 .orderBy("d", id_col).limit(k).collect()}
        # denominator = what brute force actually returned, not k: a
        # delta smaller than k would otherwise cap recall at |delta|/k
        # and falsely refuse perfectly in-distribution small appends
        per_query.append(len(ann & exact) / max(1, len(exact)))
    if own_codes:
        codes.unpersist()
    recall = float(np.mean(per_query)) if per_query else 1.0
    return {"recall": recall, "per_query": per_query,
            "n_queries": len(per_query), "k": k}


def ivfpq_topk(spark, index_path: str, df: DataFrame, vec_col: str,
               id_col: str, query_vec, centroids: np.ndarray,
               codebooks: np.ndarray, *, k: int = 10, n_probe: int = 4,
               rerank: int = 64) -> DataFrame:
    """Query the ivfpq_write_index layout: partition-pruned scan of the
    probed cells' codes -> ADC shortlist -> exact re-rank against the
    raw table (broadcast semi-join of ``rerank`` ids). Returns
    (id, dist) ascending, exact distances for the returned rows."""
    cells = _probe_cells(query_vec, centroids, n_probe)
    codes = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    return pq_topk_rerank(df, codes, vec_col, id_col, query_vec,
                          codebooks, k=k, rerank=rerank)


# -- versioned IVF-PQ index: epochs, commit markers, retrain path --------
#
# The flat ivfpq_write_index/ivfpq_append_index layout freezes its
# models forever — past the drift gate the only answer was "rebuild by
# hand with new models, somewhere else" (VERDICT r4 #3). The versioned
# layout makes retraining a first-class, atomic operation:
#
#   <path>/epoch=<k>/cell=<c>/*.parquet   PQ codes of epoch k
#   <path>/_models/*.parquet              one row per COMMITTED epoch:
#       (epoch, n_cells, dim, m, ksub, centroids, codebooks, sha256,
#        meta_json) — appended AFTER the epoch's codes land, so the
#       models row IS the commit marker (store-style: readers resolve
#       max committed epoch; a crashed retrain leaves an orphan codes
#       dir that is never read and is overwritten by the retry).
#
# Queries resolve the committed epoch's models + codes in one place, so
# an index whose codebooks were retrained yesterday serves today's
# queries with the matching models automatically — the failure mode
# "caller holds old models, reads new codes" cannot happen.

_IVFPQ_MODELS_SCHEMA = (
    "epoch long, n_cells int, dim int, m int, ksub int, "
    "centroids binary, codebooks binary, sha256 string, meta_json string")


def _ivfpq_commit(spark, path: str, epoch: int, centroids: np.ndarray,
                  codebooks: np.ndarray, meta: dict) -> None:
    import hashlib
    import json

    from . import store

    C = np.ascontiguousarray(centroids, dtype=np.float64)
    cb = np.ascontiguousarray(codebooks, dtype=np.float64)
    cbytes, bbytes = C.tobytes(), cb.tobytes()
    sha = hashlib.sha256(cbytes + bbytes).hexdigest()
    row = (int(epoch), int(C.shape[0]), int(C.shape[1]),
           int(cb.shape[0]), int(cb.shape[1]), cbytes, bbytes, sha,
           json.dumps(meta, sort_keys=True))
    (store.one_part_df(spark, [row], _IVFPQ_MODELS_SCHEMA)
     .write.mode("append").parquet(path + "/_models"))


def ivfpq_committed(spark, path: str) -> tuple[int, np.ndarray,
                                               np.ndarray, dict]:
    """(epoch, centroids, codebooks, meta) of the committed index state:
    the highest _models row (sha tie-break), integrity-checked. Codes
    directories above it are crashed-retrain orphans and are ignored."""
    import hashlib
    import json

    rows = spark.read.parquet(path + "/_models").collect()
    win = max(rows, key=lambda r: (int(r["epoch"]), r["sha256"]))
    cbytes, bbytes = bytes(win["centroids"]), bytes(win["codebooks"])
    digest = hashlib.sha256(cbytes + bbytes).hexdigest()
    if digest != win["sha256"]:
        raise IOError(f"ivfpq models epoch {win['epoch']} corrupt: sha "
                      f"{digest[:16]} != {win['sha256'][:16]}")
    n_cells, dim = int(win["n_cells"]), int(win["dim"])
    m, ksub = int(win["m"]), int(win["ksub"])
    C = np.frombuffer(cbytes, dtype=np.float64).reshape(n_cells, dim)
    cb = np.frombuffer(bbytes, dtype=np.float64).reshape(
        m, ksub, dim // m)
    return int(win["epoch"]), C, cb, json.loads(win["meta_json"])


def _ivfpq_epoch_dir(path: str, epoch: int) -> str:
    return f"{path}/epoch={int(epoch)}"


def ivfpq_build(spark, df: DataFrame, vec_col: str, id_col: str,
                path: str, *, n_cells: int = 16, m: int = 8,
                ksub: int = 16, seed: int = 1337) -> dict:
    """Create a versioned IVF-PQ index at epoch 0: train models on a
    deterministic content-hash sample of ``df``, encode + cell-assign in
    one mapInPandas pass, write codes partitioned by cell, then commit
    the models row. Returns {"epoch", "action", "n_rows"}."""
    return _ivfpq_train_and_publish(spark, df, vec_col, id_col, path,
                                    epoch=0, n_cells=n_cells, m=m,
                                    ksub=ksub, seed=seed,
                                    action="built")


def _ivfpq_train_and_publish(spark, df, vec_col, id_col, path, *, epoch,
                             n_cells, m, ksub, seed, action) -> dict:
    cents = train_ivf_centroids(df, vec_col, n_cells=n_cells, seed=seed)
    cb = pq_train(df, vec_col, m=m, ksub=ksub, seed=seed)
    codes = _ivfpq_encode(df, vec_col, id_col, cents, cb)
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        _ivfpq_epoch_dir(path, epoch))
    n = spark.read.parquet(_ivfpq_epoch_dir(path, epoch)).count()
    _ivfpq_commit(spark, path, epoch, cents, cb,
                  {"action": action, "n_rows": int(n), "seed": seed})
    return {"epoch": int(epoch), "action": action, "n_rows": int(n)}


def ivfpq_retrain(spark, full_df: DataFrame, vec_col: str, id_col: str,
                  path: str, *, n_cells: int | None = None,
                  m: int | None = None, ksub: int | None = None,
                  seed: int | None = None) -> dict:
    """Retrain the index's models on a deterministic content-hash sample
    of ``full_df`` (old ∪ new — the caller's raw table), re-encode EVERY
    vector distributedly with the new models, and atomically swap: the
    new epoch's codes land first, the models-row append commits. Readers
    mid-retrain keep resolving the old epoch; a crash before the commit
    leaves an ignored orphan dir that the retry overwrites. Model shape
    params default to the committed epoch's (a retrain is a refit, not a
    reshape, unless asked)."""
    cur_epoch, C, cb, meta = ivfpq_committed(spark, path)
    return _ivfpq_train_and_publish(
        spark, full_df, vec_col, id_col, path, epoch=cur_epoch + 1,
        n_cells=n_cells or C.shape[0], m=m or cb.shape[0],
        ksub=ksub or cb.shape[1],
        seed=seed if seed is not None else int(meta.get("seed", 1337)),
        action="retrained")


def ivfpq_append(spark, delta_df: DataFrame, vec_col: str, id_col: str,
                 path: str, *, min_recall: float | None = None,
                 full_df: DataFrame | None = None,
                 drift_queries: int = 16, drift_k: int = 10,
                 n_probe: int = 4, rerank: int = 64) -> dict:
    """Gated incremental append for the versioned layout. The delta is
    encoded ONCE with the committed epoch's frozen models; when
    ``min_recall`` is set, ivfpq_drift_check reuses those codes to
    measure frozen-model self-recall on the delta:

    - recall >= min_recall (in-distribution): codes append into the
      committed epoch's cell partitions — models untouched, existing
      files never rewritten. {"action": "appended"}.
    - recall < min_recall (drifted) and ``full_df`` given: the gate
      FIRES and repairs itself — ivfpq_retrain over old ∪ new, atomic
      swap to epoch+1. {"action": "retrained", "gate_recall": ...}.
    - drifted with no ``full_df``: refused loudly with the retrain path
      (the pre-r5 behavior), nothing written.
    """
    epoch, cents, cb, _meta = ivfpq_committed(spark, path)
    codes = _ivfpq_encode(delta_df, vec_col, id_col, cents, cb).cache()
    try:
        if min_recall is not None:
            rep = ivfpq_drift_check(delta_df, vec_col, id_col, cents, cb,
                                    n_queries=drift_queries, k=drift_k,
                                    n_probe=n_probe, rerank=rerank,
                                    codes=codes)
            if rep["recall"] < min_recall:
                if full_df is None:
                    raise ValueError(
                        f"ivfpq_append refused: frozen-model recall on "
                        f"the delta is {rep['recall']:.3f} < min_recall="
                        f"{min_recall} — pass full_df (old ∪ new) to "
                        "retrain in place, or call ivfpq_retrain.")
                out = ivfpq_retrain(spark, full_df, vec_col, id_col,
                                    path)
                out["gate_recall"] = rep["recall"]
                return out
        codes.write.mode("append").partitionBy("cell").parquet(
            _ivfpq_epoch_dir(path, epoch))
        return {"epoch": int(epoch), "action": "appended",
                "n_rows": int(delta_df.count())}
    finally:
        codes.unpersist()


def ivfpq_query(spark, path: str, df: DataFrame, vec_col: str,
                id_col: str, query_vec, *, k: int = 10, n_probe: int = 4,
                rerank: int = 64) -> DataFrame:
    """Query the committed epoch of a versioned index: resolve models +
    codes together (epoch-consistent by construction), partition-pruned
    probe, ADC shortlist, exact re-rank against the raw table."""
    epoch, cents, cb, _meta = ivfpq_committed(spark, path)
    cells = _probe_cells(query_vec, cents, n_probe)
    codes = (spark.read.parquet(_ivfpq_epoch_dir(path, epoch))
             .filter(F.col("cell").isin(cells)))
    return pq_topk_rerank(df, codes, vec_col, id_col, query_vec, cb,
                          k=k, rerank=rerank)
