"""Custom Python DataSource (Spark 4 DataSource API): the deterministic
token table as a FIRST-CLASS readable format, batch and streaming.

``spark.read.format("sketchlib_tokens").option("rows", N)`` produces the
input-hint table ``(doc_id string, tokens array<int>, n_tok int, source
string)`` with content BIT-IDENTICAL to ``datagen.generate_token_table``'s
parquet output for the same (rows, seed, dist) — both route through the
same chunk kernel keyed by (seed, chunk_index), so no data ever needs to
exist on disk to be queried (the north rule's "synthesise deterministically
at small scale" as an engine source rather than a file-writing step).

Scale shape: one InputPartition per 100k-row chunk — partitions() returns
lightweight (chunk_idx, start_row, rows) triples, workers regenerate their
chunk independently (no driver-side data, no IO), and read() yields a
single Arrow RecordBatch per chunk (vectorized handoff, no per-row Python).
A 10^12-row table is 10^7 partitions of pure compute — embarrassingly
parallel, zero storage.

The streaming flavor (``spark.readStream.format("sketchlib_tokens")``)
emits one chunk per micro-batch with the chunk index as the offset:
because chunk content is a pure function of (seed, chunk_idx), replay
after failure re-produces byte-identical batches — exactly-once folds for
free (the property the snapshot/replay machinery in streaming.py has to
EARN for real sources is structural here).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA_DDL = ("doc_id string, tokens array<int>, n_tok int, source string")


def _opts(options):
    rows = int(options.get("rows", 100_000))
    seed = int(options.get("seed", 1337))
    dist = options.get("dist", "zipf")
    if rows < 0:
        raise ValueError("rows must be >= 0")
    if dist not in ("zipf", "uniform"):
        raise ValueError(f"unknown dist {dist!r}")
    return rows, seed, dist


@dataclass
class _Chunk(InputPartition):
    chunk_idx: int
    start_row: int
    rows: int


def _chunk_bounds(rows):
    from .datagen import CHUNK_ROWS
    start = 0
    idx = 0
    while start < rows:
        n = min(CHUNK_ROWS, rows - start)
        yield _Chunk(idx, start, n)
        start += n
        idx += 1


class _TokenTableReader(DataSourceReader):
    def __init__(self, options):
        self.rows, self.seed, self.dist = _opts(options)

    def partitions(self):
        return list(_chunk_bounds(self.rows))

    def read(self, partition: _Chunk):
        # one Arrow RecordBatch per chunk: the worker regenerates its own
        # slice from (seed, chunk_idx) — no IO, no driver data transfer
        from .datagen import _chunk
        yield _chunk(self.seed, partition.chunk_idx, partition.rows,
                     partition.start_row, self.dist)


class _TokenTableStreamReader(SimpleDataSourceStreamReader):
    """Offset = next chunk index; each micro-batch is exactly one chunk.
    Deterministic chunks make readBetweenOffsets (failure replay) emit
    byte-identical data."""

    def __init__(self, options):
        self.rows, self.seed, self.dist = _opts(options)
        self.n_chunks = sum(1 for _ in _chunk_bounds(self.rows))
        self._bounds = {c.chunk_idx: c for c in _chunk_bounds(self.rows)}

    def initialOffset(self):
        return {"chunk": 0}

    def read(self, start):
        i = start["chunk"]
        if i >= self.n_chunks:
            return [], start
        return self._emit(i), {"chunk": i + 1}

    def readBetweenOffsets(self, start, end):
        out = []
        for i in range(start["chunk"], end["chunk"]):
            out.extend(self._emit(i))
        return out

    def _emit(self, i):
        from .datagen import _chunk
        c = self._bounds[i]
        batch = _chunk(self.seed, c.chunk_idx, c.rows, c.start_row,
                       self.dist)
        # SimpleDataSourceStreamReader prefetches on the driver and pickles
        # the returned rows for replay — a materialized list of tuples, not
        # a generator (generators fail to pickle in the prefetch cache)
        return [(row["doc_id"], row["tokens"], row["n_tok"], row["source"])
                for row in batch.to_pylist()]


class TokenTableDataSource(DataSource):
    """``sketchlib_tokens`` format: options rows (default 100000), seed
    (default 1337), dist (zipf|uniform)."""

    @classmethod
    def name(cls):
        return "sketchlib_tokens"

    def schema(self):
        return _SCHEMA_DDL

    def reader(self, schema):
        return _TokenTableReader(self.options)

    def simpleStreamReader(self, schema):
        return _TokenTableStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('sketchlib_tokens').

    SQL surface: ``CREATE TABLE t USING sketchlib_tokens`` works, but (as
    of Spark 4.1) DDL ``OPTIONS`` are NOT forwarded to the Python source's
    reader — a DDL-created table always reads the defaults. To parameterize
    for SQL, load through the read API and register a view::

        sql_view(spark, "tok", rows=10_000, seed=5)
    """
    spark.dataSource.register(TokenTableDataSource)


def sql_view(spark, name: str, *, rows: int = 100_000, seed: int = 1337,
             dist: str = "zipf") -> None:
    """Expose a parameterized token table to SQL as a temp view (the
    options-carrying route around the DDL limitation noted in
    :func:`register`)."""
    register(spark)
    (spark.read.format("sketchlib_tokens")
     .option("rows", rows).option("seed", seed).option("dist", dist)
     .load().createOrReplaceTempView(name))
