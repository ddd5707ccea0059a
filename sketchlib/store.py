"""Durable store for FINAL sketches — build once, probe in any later session.

A build over the full table is the expensive artifact (at 10^12 sequences
it is hours of cluster time); the sketch itself is KBs. The store persists
named sketches of ANY sketchlib type (magic-dispatched — serde.loads) as a
plain parquet TABLE, so it is listable/joinable from Spark, DuckDB or
pyarrow, travels on any Hadoop-compatible filesystem path, and keeps the
byte-identity contract: ``load_sketch(save_sketch(s)) .to_bytes() ==
s.to_bytes()`` exactly.

Layout under ``<path>/``:

- ``sketches/``  parquet rows ``(name, seq, kind, blob, sha256, n_rows,
  meta_json)`` — append-only; a re-save of ``name`` appends a higher
  ``seq`` and loads resolve latest-wins (object-store friendly: no
  read-modify-write of existing files).
- ``lineage/``   parquet rows ``(name, seq, pid, n_rows, n_items,
  total_count, build_ms)`` — the per-partition build lineage of each
  saved sketch, queryable for audit ("which slice contributed what").

Integrity: blobs carry their sha256; ``load_sketch`` re-hashes and
refuses corrupt rows.

Checkpoints (spark_build.checkpoint_dir) are the RESUME mechanism for
in-flight builds — partial blobs keyed by slice. The store is the
PUBLISH mechanism for finished ones; they intentionally do not share a
format.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import serde

_SKETCH_SCHEMA = ("name string, seq long, kind string, blob binary, "
                  "sha256 string, n_rows long, meta_json string")
_LINEAGE_SCHEMA = ("name string, seq long, pid long, n_rows long, "
                   "n_items long, total_count long, build_ms double")


def one_part_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """A DataFrame over driver-side ``rows`` with exactly ONE partition.

    ``spark.createDataFrame(rows, ...)`` slices the rows across
    defaultParallelism Python partitions (mostly empty for a few rows);
    ``.coalesce(1)`` on that evaluates every slice SEQUENTIALLY inside a
    single task — one Python-worker round-trip each, measured ~7 s per
    single-row store write at local[32]. Parallelizing to one slice up
    front writes the same one file ~10x faster."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema)


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    """A store table DataFrame, or None when the table doesn't exist
    yet. ONLY "path does not exist" maps to None — any other read
    failure (permissions, corrupt footer, transient FS error) must
    surface, never be mistaken for an empty store. The single place the
    version-sensitive Spark error-message match lives (also used by
    incremental's manifest reader)."""
    from pyspark.errors import AnalysisException
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def _winners(df: DataFrame) -> DataFrame:
    """One row per name: highest (seq, sha256) — THE winner rule shared
    by every reader (sha desc breaks same-seq writer-race ties
    deterministically; exact-duplicate rows collapse to one)."""
    from pyspark.sql.window import Window
    w = Window.partitionBy("name").orderBy(F.col("seq").desc(),
                                           F.col("sha256").desc())
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def winners_streaming(df: DataFrame) -> DataFrame:
    """`_winners` WITHOUT shuffling payload columns: the window over
    ``partitionBy(name)`` exchanges whole rows, so fleet-scale reads
    would shuffle G × KB of blob bytes just to pick winners. Here the
    winner (name, seq, sha256) keys are computed on a column-pruned
    projection (tiny Exchange) and broadcast-SEMI-joined back, so blobs
    stream from parquet straight into the consumer — the shape for
    10^5-10^6-row fleets. One subtlety: EXACT-duplicate rows (same
    name, seq AND sha — possible only when two writers race to publish
    byte-identical content at the same seq) collapse under the window
    but would BOTH survive a semi-join, double-counting a group in a
    downstream merge; their absence is checked on the pruned frame
    first and the rare duplicate case falls back to the shuffling
    `_winners`."""
    pruned = df.select("name", "seq", "sha256")
    dup = (pruned.groupBy("name", "seq", "sha256")
           .agg(F.count("*").alias("c")).filter(F.col("c") > 1)
           .limit(1).count())
    if dup:
        return _winners(df)
    keys = _winners(pruned)
    return df.join(F.broadcast(keys), ["name", "seq", "sha256"],
                   "left_semi")


def _next_seq(spark: SparkSession, path: str, name: str) -> int:
    df = read_table(spark, path + "/sketches")
    if df is None:
        return 0
    row = (df.filter(F.col("name") == name)
           .agg(F.max("seq").alias("m")).collect()[0])
    return 0 if row["m"] is None else int(row["m"]) + 1


def save_sketch(spark: SparkSession, path: str, name: str, sketch, *,
                lineage=None, n_rows: int = -1, meta: dict | None = None,
                seq: int | None = None) -> int:
    """Persist ``sketch`` under ``name``; returns the assigned seq.

    Concurrency contract: ONE writer per name. ``seq`` is assigned by a
    read-then-append, so two simultaneous writers of the same name can
    both claim the same seq; loads still resolve deterministically —
    ties break on blob sha256 (content-addressed, see ``load_sketch``) —
    but one of the two writes is shadowed. Different names never
    interfere (appends are independent files).

    ``lineage`` is an optional pandas DataFrame with columns
    (pid, n_rows, n_items, total_count, build_ms) — pass
    ``BuildResult.lineage`` to keep the per-partition audit trail with
    the published sketch.

    ``seq`` pins the sequence number explicitly (callers that must know
    it before the write, e.g. incremental.py's manifest_base meta);
    default is the usual read-then-append assignment. Same single-writer
    contract either way.
    """
    blob = sketch.to_bytes()
    if seq is None:
        seq = _next_seq(spark, path, name)
    kind = bytes(blob[:4]).decode("ascii", "replace")
    row = [(name, seq, kind, blob, hashlib.sha256(blob).hexdigest(),
            int(n_rows), json.dumps(meta or {}, sort_keys=True))]
    local = _local_dir(path + "/sketches")
    if local is not None:
        # same local-filesystem fast path as save_sketches_bulk: the
        # blob is driver-side bytes; a Spark job per publish costs
        # ~1-2 s of pickling + scheduling for a one-row write
        _append_rows_pyarrow(local, row)
    else:
        (one_part_df(spark, row, _SKETCH_SCHEMA)
         .write.mode("append").parquet(path + "/sketches"))
    if lineage is not None and len(lineage):
        lrows = [(name, seq, int(r["pid"]), int(r["n_rows"]),
                  int(r["n_items"]), int(r["total_count"]),
                  float(r["build_ms"])) for _, r in lineage.iterrows()]
        (one_part_df(spark, lrows, _LINEAGE_SCHEMA)
         .write.mode("append").parquet(path + "/lineage"))
    return seq


def load_sketch(spark: SparkSession, path: str, name: str,
                seq: int | None = None):
    """Load a sketch by name (latest seq unless pinned); integrity-checked."""
    df = spark.read.parquet(path + "/sketches").filter(F.col("name") == name)
    # sha256 tie-break makes latest-wins deterministic even if two
    # concurrent writers claimed the same seq (see save_sketch contract)
    if seq is None:
        row = (df.orderBy(F.col("seq").desc(), F.col("sha256").desc())
               .limit(1).collect())
    else:
        row = (df.filter(F.col("seq") == seq)
               .orderBy(F.col("sha256").desc()).limit(1).collect())
    if not row:
        raise KeyError(f"no sketch named {name!r}"
                       + (f" at seq {seq}" if seq is not None else ""))
    r = row[0]
    blob = bytes(r["blob"])
    digest = hashlib.sha256(blob).hexdigest()
    if digest != r["sha256"]:
        raise IOError(f"sketch {name!r} seq {r['seq']} corrupt: "
                      f"sha {digest[:16]} != recorded {r['sha256'][:16]}")
    return serde.loads(blob)


def latest_entry(spark: SparkSession, path: str,
                 name: str) -> tuple[int, dict] | None:
    """(seq, meta) of the latest saved version of ``name``; None when the
    store or the name doesn't exist yet. Used by streaming late-data
    folds to make load-merge-save idempotent across foreachBatch replays
    (the meta carries the folding batch_id).

    Only "store does not exist yet" maps to None — any OTHER read
    failure (permissions, corrupt footer, transient FS error) must
    surface: mapping it to None would bypass the replay guard in
    streaming._late_merge_store and double-fold a late slice (the
    read_table contract)."""
    df = read_table(spark, path + "/sketches")
    if df is None:
        return None
    rows = (df.filter(F.col("name") == name)
            .orderBy(F.col("seq").desc(), F.col("sha256").desc()).limit(1)
            .select("seq", "meta_json").collect())
    if not rows:
        return None
    return int(rows[0]["seq"]), json.loads(rows[0]["meta_json"])


def latest_sketch(spark: SparkSession, path: str, name: str,
                  seq: int | None = None) -> tuple[int, dict, object] | None:
    """(seq, meta, sketch) of the latest saved version of ``name`` in ONE
    store read (or the pinned ``seq``); None when the store, the name, or
    the pinned seq doesn't exist. For callers that need both the metadata
    and the sketch itself (incremental maintenance: the meta drives the
    delta diff and lineage checks, the sketch is the merge base) —
    latest_entry + load_sketch would read the store twice for the same
    row. Same integrity and error-surfacing rules as load_sketch."""
    df = read_table(spark, path + "/sketches")
    if df is None:
        return None
    df = df.filter(F.col("name") == name)
    if seq is not None:
        df = df.filter(F.col("seq") == seq)
    rows = (df.orderBy(F.col("seq").desc(), F.col("sha256").desc()).limit(1)
            .select("seq", "meta_json", "blob", "sha256").collect())
    if not rows:
        return None
    r = rows[0]
    blob = bytes(r["blob"])
    digest = hashlib.sha256(blob).hexdigest()
    if digest != r["sha256"]:
        raise IOError(f"sketch {name!r} seq {r['seq']} corrupt: "
                      f"sha {digest[:16]} != recorded {r['sha256'][:16]}")
    return int(r["seq"]), json.loads(r["meta_json"]), serde.loads(blob)


def max_seq_for_prefix(spark: SparkSession, path: str,
                       prefix: str) -> int | None:
    """Highest seq over every name of the form ``prefix/<group>``, or
    None when the store/prefix doesn't exist. INCLUDES uncommitted
    orphan rows from crashed grouped epochs — grouped maintenance uses
    this to publish retries at a fresh seq strictly above any orphan, so
    a retry folding a bigger delta can never tie (and sha-coin-flip)
    with the crashed attempt's rows."""
    df = read_table(spark, path + "/sketches")
    if df is None:
        return None
    row = (df.filter(F.col("name").startswith(prefix + "/"))
           .agg(F.max("seq").alias("m")).collect()[0])
    return None if row["m"] is None else int(row["m"])


def save_sketches_bulk(spark: SparkSession, path: str,
                       entries: list[tuple[str, int, object, int]],
                       meta: dict | None = None) -> None:
    """Append many ``(name, seq, sketch, n_rows)`` rows in ONE parquet
    write — the grouped-publish path, where per-group save_sketch calls
    would cost one Spark job per group. Same row format and integrity
    contract as save_sketch; no lineage rows (grouped builds carry their
    audit trail in the caller's manifest meta). Driver memory holds all
    blobs at once — bounded by (groups touched × blob size), the same
    fan-in the grouped build's collect already paid."""
    rows = []
    for name, seq, sketch, n_rows in entries:
        blob = sketch.to_bytes()
        rows.append((name, int(seq),
                     bytes(blob[:4]).decode("ascii", "replace"), blob,
                     hashlib.sha256(blob).hexdigest(), int(n_rows),
                     json.dumps(meta or {}, sort_keys=True)))
    if not rows:
        return
    local = _local_dir(path + "/sketches")
    if local is not None:
        # local-filesystem fast path: the blobs are ALREADY driver-side
        # bytes, so routing them through sc.parallelize pickles (and
        # base64s) every byte twice — measured ~30 s for a 64-group x
        # 1.1 MB fleet publish vs <1 s written directly. Atomic like
        # every store write: tmp file + os.replace, so a crash can
        # never leave a torn parquet part for readers to trip on
        # (Spark and pyarrow both ignore dot-prefixed files).
        _append_rows_pyarrow(local, rows)
    else:
        (one_part_df(spark, rows, _SKETCH_SCHEMA)
         .write.mode("append").parquet(path + "/sketches"))


def _local_dir(path: str) -> str | None:
    """Filesystem directory for a local store path (no scheme, or
    file:); None for remote filesystems, which keep the Spark write."""
    if path.startswith("file://"):
        return path[len("file://"):] or "/"
    if path.startswith("file:"):
        return path[len("file:"):] or "/"
    if "://" in path:
        return None
    return path


def _append_rows_pyarrow(dirpath: str, rows: list[tuple]) -> None:
    """Append one parquet part of sketch rows to a local store table,
    atomically (write `.tmp`, fsync, rename). Schema matches the
    Spark-written parts (string/int64/binary), so mixed-writer tables
    read identically. Rows are sorted by (name, seq) and written in
    row groups sized by BLOB BYTES (~24 MB each, clamped to [16, 4096]
    rows): parquet keeps min/max stats per row group, so a targeted
    read (``name == prefix/<group>`` / ``isin``) prunes to the row
    group holding that name instead of decompressing the whole part's
    blob column — measured 11.6 s → 2.5 s on a one-file delta fold
    against a 256 × 1 MB-blob part. Sizing by bytes, not a fixed row
    count, keeps BOTH payload regimes healthy: MB-scale blobs (file
    indexes) get ~24-row groups for fine pruning, while a 10^5-row
    fleet of KB blobs gets ~4096-row groups — a fixed 64 would mean
    1500+ row groups per part, and the per-row-group footer metadata
    then slows EVERY store read (measured 1.5 s → 8.4 s single-group
    reads at G=100k)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    cols = list(zip(*rows))
    avg_blob = max(1, sum(len(b) for b in cols[3]) // len(rows))
    rg_rows = max(16, min(4096, (24 << 20) // avg_blob))
    tbl = pa.table({
        "name": pa.array(cols[0], type=pa.string()),
        "seq": pa.array(cols[1], type=pa.int64()),
        "kind": pa.array(cols[2], type=pa.string()),
        "blob": pa.array(cols[3], type=pa.binary()),
        "sha256": pa.array(cols[4], type=pa.string()),
        "n_rows": pa.array(cols[5], type=pa.int64()),
        "meta_json": pa.array(cols[6], type=pa.string()),
    })
    final = os.path.join(dirpath,
                         f"part-{uuid.uuid4().hex}-pya.snappy.parquet")
    tmp = os.path.join(dirpath, f".{os.path.basename(final)}.tmp")
    pq.write_table(tbl, tmp, compression="snappy",
                   row_group_size=rg_rows)
    os.replace(tmp, final)


def load_group_sketches(spark: SparkSession, path: str, prefix: str,
                        max_seq: int | None = None,
                        min_seq: int | None = None,
                        groups: list[str] | None = None) -> dict[str, object]:
    """{group: sketch} for every name of the form ``prefix/<group>``, in
    ONE store read. Per group, the row with the highest seq wins (sha
    tie-break, as in load_sketch) — optionally bounded to
    ``min_seq <= seq <= max_seq``: max_seq is the committed-epoch pin
    that lets grouped incremental maintenance ignore orphan publishes
    from a crashed, uncommitted epoch; min_seq is the last full-rebuild
    epoch, below which rows describe a table state that no longer
    exists. Groups republish only when touched, so a group's latest seq
    is typically BELOW the current epoch. ``groups`` restricts the read
    to those group values (an isin filter the parquet scan can push
    down) — the incremental path loads only the delta's groups, never
    the whole fleet.

    Winner selection happens IN Spark (_winners) before blobs move, so
    the driver receives exactly one blob per group regardless of how
    many historical versions exist, and superseded rows are never
    hashed or deserialized — a corrupt superseded version cannot fail a
    read of intact winners."""
    p = prefix + "/"
    df = read_table(spark, path + "/sketches")
    if df is None:
        return {}
    df = df.filter(F.col("name").startswith(p))
    if groups is not None:
        df = df.filter(F.col("name").isin([p + g for g in groups]))
    if max_seq is not None:
        df = df.filter(F.col("seq") <= max_seq)
    if min_seq is not None:
        df = df.filter(F.col("seq") >= min_seq)
    out: dict[str, object] = {}
    # window winners + toArrow: arrow-collect is ~1.5x the py4j Row
    # collect, and for a COLLECT path the window's Exchange moves the
    # same bytes the collect pulls anyway — the broadcast-semi-join
    # variant (winners_streaming) measured 3x SLOWER here (18.5 s vs
    # 5.7 s at a G=100k KB-blob fleet); it pays off only for streamed
    # consumers (mapInPandas fleet answers), where it removes a G x
    # blob Exchange entirely
    for r in (_winners(df)
              .select("name", "seq", "blob", "sha256")
              .toArrow().to_pylist()):
        g = r["name"][len(p):]
        blob = bytes(r["blob"])
        digest = hashlib.sha256(blob).hexdigest()
        if digest != r["sha256"]:
            raise IOError(f"sketch {r['name']!r} seq {r['seq']} corrupt: "
                          f"sha {digest[:16]} != {r['sha256'][:16]}")
        out[g] = serde.loads(blob)
    return out


def list_sketches(spark: SparkSession, path: str) -> DataFrame:
    """EXACTLY one row per name — its winning version (highest seq, sha
    tie-break), the same winner every loader returns. A plain
    max-seq join would emit two rows per name after a same-seq writer
    race or a crash-left duplicate, making listings disagree with
    loads."""
    return _winners(
        spark.read.parquet(path + "/sketches")
        .select("name", "seq", "kind", F.length("blob").alias("bytes"),
                "sha256", "n_rows", "meta_json"))


def compact_store(spark: SparkSession, path: str) -> dict[str, dict]:
    """Merge each store table's many small append files into ONE file.

    Every publish appends a file, so a daily-publish store accumulates
    365 files/year per table — harmless for correctness (loads pick
    winning rows) but a listing/open cost on every read. Compaction
    rewrites sketches/, lineage/ and ingested/ each into a single zstd
    parquet file, PRESERVING every row: history is a feature
    (snapshot_diff needs old seqs; the manifest's current lineage drives
    incremental diffs), so nothing is pruned — only exact duplicate rows
    (left by a crashed prior compaction) are dropped.

    Never-missing by construction: the compacted file is written INTO
    the live directory first, then ONLY the part files it actually read
    are removed — a FRESH read at any instant sees the old snapshot,
    old+new (duplicate rows, which winning-row selection tolerates), or
    just the new file; the directory itself is never renamed so the
    store never appears missing/empty mid-compact. A part file appended
    by a racing publish (a contract violation — see below) is NOT
    deleted, so its rows survive even then. Two caveats: a reader
    holding a PLAN or cache whose file listing predates the compaction
    can hit FileNotFoundException on the removed parts (re-read, or
    spark.catalog.clearCache(), after compacting); and a crash
    mid-removal leaves duplicates that the next compaction cleans.

    Driver-side rewrite via pyarrow (the store is KB-MB scale by
    design); requires a pyarrow-readable path (local/posix — object
    stores would go through their own compaction). Single-writer
    contract as everywhere in the store: don't compact concurrently
    with a publish. Returns {table: {files_before, files_after, rows}}.
    """
    import uuid

    import pyarrow.parquet as pq

    stats: dict[str, dict] = {}
    for table in ("sketches", "lineage", "ingested"):
        d = os.path.join(path, table)
        if not os.path.isdir(d):
            continue
        parts = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        if not parts:
            continue
        import pyarrow.dataset as pads
        t = pads.dataset([os.path.join(d, p) for p in parts],
                         format="parquet").to_table()
        pdf = t.to_pandas()
        before = len(pdf)
        pdf = pdf.drop_duplicates()     # only crash-left exact dupes
        import pyarrow as pa
        out = os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, schema=t.schema,
                                            preserve_index=False),
                       out, compression="zstd")
        # Durability ordering: the part-file unlinks below must not hit
        # disk before the compacted file's data + its directory entry,
        # or a power loss could persist the deletes first and lose the
        # table. fsync the file, then the directory.
        fd = os.open(out, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        dfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        # delete exactly the snapshot we read (plus spark's write markers
        # and checksum companions) — never a file that appeared since
        for p in parts:
            for f in (p, f".{p}.crc"):
                full = os.path.join(d, f)
                if os.path.isfile(full):
                    os.remove(full)
        for f in ("_SUCCESS", "._SUCCESS.crc"):
            full = os.path.join(d, f)
            if os.path.isfile(full):
                os.remove(full)
        stats[table] = {"files_before": len(parts), "files_after": 1,
                        "rows": len(pdf), "dupes_dropped": before - len(pdf)}
    return stats


def load_lineage(spark: SparkSession, path: str, name: str,
                 seq: int | None = None) -> DataFrame:
    """Per-partition build lineage of a saved sketch (latest unless pinned)."""
    df = spark.read.parquet(path + "/lineage").filter(F.col("name") == name)
    if seq is None:
        latest = df.groupBy("name").agg(F.max("seq").alias("seq"))
        df = df.join(latest, ["name", "seq"])
    else:
        df = df.filter(F.col("seq") == seq)
    return df.select("name", "seq", "pid", "n_rows", "n_items",
                     "total_count", "build_ms")
