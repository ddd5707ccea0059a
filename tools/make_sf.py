"""Scale-up fixture generator (VERDICT r3 #1): replicate the sf0.1
driver fixture K times with deterministic key shifts so bench.py can
measure per-query scale exponents at 10x without touching the
read-only /root/testdata.

Replication is NOT naive duplication — copy i gets:
- shifted primary keys everywhere (doc_id/event_id/o_orderkey/
  l_orderkey/vec_id + i * stride), join keys shifted consistently on
  both sides so join fan-out per key is unchanged;
- a DISJOINT vocabulary for documents.text: copy i>0 remaps each of
  the fixture's vocabulary words to a deterministic random word of the
  SAME LENGTH (seeded by the copy index). Same-length matters: the
  fixture's docs are ~50-word draws from a 31-word vocabulary, so
  near-dup counts under char-shingle MinHash are governed entirely by
  shingle statistics — word lengths and boundaries. A same-length
  bijection preserves those exactly per copy (within-copy pair counts
  match the original's) while copies share no words, so total pair
  counts scale linearly. Two rejected constructions, for the record:
  suffixing every word with the copy index plants shared suffix
  shingles across unrelated docs (268 pairs at sf0.1 -> 9.86M at
  "x10"); remapping to hex(xxhash64) words triples word lengths, which
  collapses cross-word shingle dilution and pushes the templated docs'
  estimated Jaccard past threshold (5.3M pairs).
Dimension tables (region/nation/customer/supplier/part) are copied
verbatim: they are the broadcast side and growing facts against fixed
dims is exactly the 100-TB shape.

Usage: python tools/make_sf.py [K] [out_dir] [src_dir]
Defaults: K=10, out=data/sf1, src=/root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRIDE = 1_000_000_000
DIMS = ("region", "nation", "customer", "supplier", "part")
FACTS = {
    "documents": ("doc_id",),
    # user_id shifts too: unshifted, every copy would interleave an
    # exact duplicate event stream per user at identical timestamps —
    # 10x-deeper per-key window sorts instead of 10x more keys, which
    # distorts exactly the per-query scale exponents this fixture
    # exists to measure
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "embeddings": ("vec_id",),
}
# output files sized so the 10x fixture still yields >= one task per
# core at local[32] on the biggest table
PARTS = {"documents": 8, "events": 16, "orders": 16, "lineitem": 32,
         "embeddings": 4}


def make_sf(spark, k: int, out_dir: str, src_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        df = spark.read.parquet(f"{src_dir}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: copied verbatim")

    import numpy as np

    # collision guard shared across ALL copies: short words (len 1-3)
    # have few [a-z] candidates, and per-copy independent draws could
    # hand two copies the same replacement — re-sharing exactly the
    # cross-copy words the disjointness argument assumes away
    used_global: set[str] = set()

    # words of length <= 2 draw from an extended lowercase-letter pool:
    # 26 latin chars cap length-1 replacements at 25 copies (the fixture
    # vocab contains "a"), so K=100 would exhaust candidates and spin.
    # Greek/Cyrillic/Latin-1 lowercase keep the SAME-LENGTH property —
    # Spark's length(), DuckDB's length() and the Python shingle loops
    # all count characters, not bytes — which is all the shingle-
    # statistics argument above needs.
    _LATIN = "".join(chr(97 + c) for c in range(26))
    _WIDE = (_LATIN
             + "".join(chr(c) for c in range(0x3B1, 0x3CA))    # α-ω
             + "".join(chr(c) for c in range(0x430, 0x450))    # а-я
             + "".join(chr(c) for c in range(0xE0, 0xF7)))     # à-ö

    def copy_vocab(words: list[str], i: int) -> dict[str, str]:
        """Deterministic same-length bijection for copy i: each vocab
        word maps to a fresh random lowercase word of identical length,
        distinct from every word used by ANY copy (and the original)."""
        rng = np.random.default_rng(202600 + i)
        out = {}
        used_global.update(words)
        for w in sorted(words):
            ab = _WIDE if len(w) <= 2 else _LATIN
            while True:
                cand = "".join(ab[c]
                               for c in rng.integers(0, len(ab), len(w)))
                if cand not in used_global:
                    used_global.add(cand)
                    out[w] = cand
                    break
        return out

    vocab = [r[0] for r in
             (spark.read.parquet(f"{src_dir}/documents.parquet")
              .select(F.explode(F.split("text", " ")).alias("w"))
              .filter(F.col("w") != "").distinct().collect())]

    for t, keys in FACTS.items():
        base = spark.read.parquet(f"{src_dir}/{t}.parquet")
        copies = []
        for i in range(k):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(i * STRIDE))
            if t == "documents" and i > 0:
                m = copy_vocab(vocab, i)
                mcol = F.create_map(*[F.lit(x) for kv in m.items()
                                      for x in kv])
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.coalesce(mcol[w], w)),
                        " "))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        (out.repartition(PARTS.get(t, 8))
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet"))
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows (x{k})")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "sf1")
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    make_sf(spark, k, out, src)
    spark.stop()


if __name__ == "__main__":
    main()
