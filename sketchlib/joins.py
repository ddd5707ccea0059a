"""Temporal joins the reference (and stock Spark) lacks: as-of join and
bounded range join, built from shuffle-safe primitives.

Both avoid the naive shapes that die at scale:

- A naive as-of join is ``join on key + filter r.ts <= l.ts`` → per-key
  cross product before the filter. Here it's the union + ordered-window
  trick (the distributed restatement of pandas ``merge_asof`` / Flink's
  temporal join): one shuffle on the key, one sort by (ts, side), and a
  running ``last(right attrs, ignorenulls)`` — linear in rows, no pair
  blow-up, whatever the key skew.
- A naive range join is ``join on key + BETWEEN`` → same cross product.
  Here left rows are bucketed by interval-width time bands and meet right
  rows only in the ≤2 bands their window overlaps — candidate pairs are
  bounded by actual temporal locality, not by key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_US = "bigint"


def _us(col):
    """Microseconds since epoch (wall-clock reinterpretation for NTZ)."""
    return F.unix_micros(col.cast("timestamp_ltz"))


def as_of_join(left: DataFrame, right: DataFrame, key_col: str, ts_col: str,
               right_cols: list[str], *, suffix: str = "_asof",
               strict: bool = False) -> DataFrame:
    """For every left row, attach the MOST RECENT right row at-or-before it
    (``right.ts <= left.ts``; ``strict=True`` for ``<``), per key.

    Returns the left rows plus ``{c}{suffix}`` for each requested right
    column and ``{ts_col}{suffix}`` (the matched right timestamp; all NULL
    when no right row precedes). Duplicate (key, ts) right rows tie-break
    deterministically: the greatest (right_cols..., ts) struct wins. One shuffle (the key), one sort — the
    window's running ``last(..., ignorenulls=True)`` carries the latest
    right values forward into the left rows.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    # side flag orders ties: right rows sort BEFORE left at equal ts for
    # <=, AFTER for strict < (so an equal-ts right row is not visible)
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    # the right attrs travel as ONE struct so the window carries the
    # matched right row ATOMICALLY: per-column last(..., ignorenulls)
    # would backfill a NULL attribute of the matched row from an OLDER
    # right row, emitting a column combination no right row contains
    rtype = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
        + [StructField("__ts", right.schema[ts_col].dataType)])
    l = left.select(
        *lcols,
        F.lit(l_tag).alias("_side"),
        F.lit(None).cast(rtype).alias("_rrow"))
    r = (right
         # a NULL-timestamp right row is not a valid as-of predecessor
         # (it would sort nulls-first and pollute every early left row)
         .filter(F.col(ts_col).isNotNull())
         .select(
             *[F.lit(None).cast(left.schema[c].dataType).alias(c)
               if c not in (key_col, ts_col) else F.col(c) for c in lcols],
             F.lit(r_tag).alias("_side"),
             F.struct(*[F.col(c).alias(c) for c in right_cols],
                      F.col(ts_col).alias("__ts")).alias("_rrow")))
    u = l.unionByName(r)
    # tertiary sort on the right-row struct makes duplicate (key, ts)
    # right rows deterministic: the greatest struct wins the tie (without
    # it, last() picks whichever the shuffle delivered last)
    w = (Window.partitionBy(key_col)
         .orderBy(_us(F.col(ts_col)), F.col("_side"), F.col("_rrow"))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = u.select(
        *lcols, "_side",
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"))
    return (out.filter(F.col("_side") == l_tag)
            .select(*lcols,
                    *[F.col(f"_m.{c}").alias(f"{c}{suffix}")
                      for c in right_cols],
                    F.col("_m.__ts").alias(f"{ts_col}{suffix}")))


def range_join(left: DataFrame, right: DataFrame, key_col: str,
               ts_col: str, *, lower_us: int, upper_us: int,
               l_prefix: str = "l_", r_prefix: str = "r_") -> DataFrame:
    """All pairs (l, r) sharing ``key_col`` with
    ``r.ts - l.ts ∈ [lower_us, upper_us]`` (microseconds).

    Band implementation: with band width = interval length, a left row's
    window overlaps at most 2 bands; right rows sit in exactly their own
    band — so each candidate pair meets exactly once (no distinct needed)
    and the join key (key, band) bounds bucket sizes by temporal density
    rather than key cardinality. Returns ``(key, l_*<left cols>,
    r_*<right cols>)`` for non-key columns.
    """
    if upper_us < lower_us:
        raise ValueError("upper_us < lower_us")
    width = max(upper_us - lower_us, 1)

    def fdiv(col):
        # exact floor-division in the integer domain (pmod is non-negative,
        # so the quotient's double division is of an exact multiple) —
        # FLOOR(big_us / w) in doubles can misbucket boundary rows
        return ((col - F.pmod(col, F.lit(width))) / F.lit(width)).cast("long")

    l_us = _us(F.col(ts_col))
    bands = F.sequence(fdiv(l_us + F.lit(lower_us)),
                       fdiv(l_us + F.lit(upper_us)))
    lsel = (left.select(
        F.col(key_col), l_us.alias("_lts"),
        *[F.col(c).alias(f"{l_prefix}{c}") for c in left.columns
          if c != key_col],
        F.explode(bands).alias("_band")))
    r_us = _us(F.col(ts_col))
    rsel = (right.select(
        F.col(key_col), r_us.alias("_rts"),
        *[F.col(c).alias(f"{r_prefix}{c}") for c in right.columns
          if c != key_col],
        fdiv(r_us).alias("_band")))
    joined = lsel.join(rsel, [key_col, "_band"])
    return (joined
            .filter((F.col("_rts") - F.col("_lts") >= F.lit(lower_us)) &
                    (F.col("_rts") - F.col("_lts") <= F.lit(upper_us)))
            .drop("_band", "_lts", "_rts"))


def bloom_semijoin(spark, fact: DataFrame, dim: DataFrame, key_col: str, *,
                   fpr: float = 0.002, capacity: int | None = None,
                   seed: int = 1337) -> DataFrame:
    """Runtime-filter the FACT side of a join with a Bloom filter built
    over the DIM side's join keys — sideways information passing, the
    move that makes a fact⋈dim join survive 100 TB: fact rows whose key
    cannot match are dropped AT THE SCAN, before they pay the shuffle.

    Shape: one pass over the (small) dim side builds a mergeable Bloom
    (partial + tree merge, sketchlib.spark_build.build_aggregator); the
    few-hundred-KB blob broadcasts; the fact scan probes it Arrow-
    vectorized (contains_batch — one deserialize per worker). No false
    negatives, so ``bloom_semijoin(...).join(dim, key)`` returns exactly
    ``fact.join(dim, key)``; false positives (rate ``fpr``) only leak
    extra rows into the shuffle, where the real join removes them.

    vs Spark's own runtime bloom filter (InjectRuntimeFilter, 3.3+):
    that one is per-query and JVM-internal; this one is an explicit,
    durable artifact — persist it via sketchlib.store and reuse it
    across queries/days as a standing "known keys" filter, or merge
    filters from incrementally arriving dim partitions.

    ``capacity`` defaults to a distinct-count of the dim keys (one light
    job on the small side). Returns the filtered fact DataFrame.
    """
    import functools

    from .bloom import BloomFilter
    from .spark_build import build_aggregator, sketch_probe_col

    keys = dim.select(key_col).filter(F.col(key_col).isNotNull())
    if capacity is None:
        capacity = max(1, keys.distinct().count())
    bf = build_aggregator(
        keys, key_col,
        functools.partial(BloomFilter, capacity=capacity, fpr=fpr,
                          seed=seed)).sketch
    claimed = sketch_probe_col(spark, bf, F.col(key_col),
                               method="contains_batch", rtype="boolean")
    # NULL fact keys are dropped BEFORE the probe, not just for join
    # semantics (NULL never matches an inner/semi join) but for probe
    # integrity: a null-containing Arrow batch degrades int64 -> float64
    # in pandas, silently corrupting keys >= 2^53 into FALSE NEGATIVES.
    # The isNotNull predicate is non-UDF so Catalyst evaluates it below
    # the Python-UDF filter node — probe batches are null-free.
    return fact.filter(F.col(key_col).isNotNull()).filter(claimed)


def runtime_filtered_join(spark, fact: DataFrame, dim: DataFrame,
                          key_col: str, *, fpr: float = 0.002,
                          capacity: int | None = None,
                          how: str = "inner") -> DataFrame:
    """``fact ⋈ dim`` with the fact side Bloom-pruned first (see
    bloom_semijoin). Result is identical to the plain join — the Bloom
    has no false negatives and the join itself discards false positives
    — but the fact-side shuffle carries ~|matching| + fpr·|fact| rows
    instead of |fact|."""
    if how not in ("inner", "left_semi"):
        raise ValueError("runtime filtering is sound for inner/left_semi "
                         "joins only (outer joins need the dropped rows)")
    return bloom_semijoin(spark, fact, dim, key_col, fpr=fpr,
                          capacity=capacity).join(dim, key_col, how)


def bloom_antijoin(spark, fact: DataFrame, dim: DataFrame, key_col: str, *,
                   fpr: float = 0.002, capacity: int | None = None,
                   seed: int = 1337) -> DataFrame:
    """EXACT left-anti join (fact rows with no match in dim) with the
    shuffle paid only by the Bloom-claimed-present slice.

    The inversion that makes this sound: a Bloom "absent" verdict is
    definitive (no false negatives), so every claimed-absent fact row is
    provably anti-join output and flows through with NO shuffle at all;
    only claimed-present rows (~match_rate + fpr of the fact) run the
    real LEFT ANTI join, which removes the true matches and keeps the
    false positives. Result is exactly ``fact.join(dim, key, "left_anti")``
    — asserted against it in tests — while the exchange carries the
    small slice instead of the whole fact table.

    At 100 TB this is the contamination-removal shape: "drop every
    document whose id appears in the eval set" shuffles only the ~0.1%
    of rows the filter cannot clear, not the corpus. NULL keys never
    match any dim row (SQL join semantics), so they pass through with
    the claimed-absent slice."""
    import functools

    from .bloom import BloomFilter
    from .spark_build import build_aggregator, sketch_probe_col

    keys = dim.select(key_col).filter(F.col(key_col).isNotNull())
    if capacity is None:
        capacity = max(1, keys.distinct().count())
    bf = build_aggregator(
        keys, key_col,
        functools.partial(BloomFilter, capacity=capacity, fpr=fpr,
                          seed=seed)).sketch
    claimed = sketch_probe_col(spark, bf, F.col(key_col),
                               method="contains_batch", rtype="boolean")
    # probe ONLY the non-null-key slice: a null-containing Arrow batch
    # degrades int64 -> float64 in pandas, corrupting keys >= 2^53 into
    # false negatives (here: contaminated rows leaking into the output).
    # NULL-key rows are definitive anti-join output anyway.
    null_clear = fact.filter(F.col(key_col).isNull())
    marked = (fact.filter(F.col(key_col).isNotNull())
              .withColumn("_bf_claimed", claimed))
    clear = (marked.filter(~F.col("_bf_claimed")).drop("_bf_claimed")
             .unionByName(null_clear))
    suspect = marked.filter(F.col("_bf_claimed")).drop("_bf_claimed")
    return clear.unionByName(
        suspect.join(dim.select(key_col).distinct(), key_col, "left_anti"))


def detect_hot_keys(df: DataFrame, key_col: str, *, k: int = 256,
                    min_share: float = 0.01) -> list[int]:
    """Join-key skew detection by a Misra-Gries pass (sketchlib.mg):
    one distributed build (KB-sized mergeable summaries, raw keys never
    shuffle) returns every key holding at least ``min_share`` of the
    rows — with MG's deterministic guarantee that no key above share
    1/(k+1) + min_share can be missed (survivor counts are
    underestimates by at most n/(k+1)). Integer keys only (the hash-join
    case that skews)."""
    import functools

    from .mg import MisraGries
    from .spark_build import build_aggregator

    res = build_aggregator(
        df.select(key_col), key_col, functools.partial(MisraGries, k))
    mg = res.sketch
    thresh = mg.n_items * min_share - mg.error_bound()
    return sorted(key for key, cnt in mg.top_items() if cnt >= thresh)


def skew_aware_join(spark, fact: DataFrame, dim: DataFrame, key_col: str,
                    *, k: int = 256, min_share: float = 0.01,
                    hot_keys: list[int] | None = None) -> DataFrame:
    """Inner equi-join that survives power-law join keys: MG-detected
    hot keys take the BROADCAST path (their dim rows are by construction
    few enough to broadcast: a key is hot on the FACT side), everything
    else takes the normal shuffle — so no reducer ever receives a hot
    key's full row set. This is the plan-time counterpart of AQE's
    runtime skew-split: it needs no post-shuffle statistics, works for
    shuffle-hash joins AQE's splitter does not cover, and the detected
    keys are an explicit, persistable artifact (reuse yesterday's hot
    set for today's stream). Result is exactly ``fact.join(dim, key)``
    — the two branches partition the fact by hot-key membership.
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(fact, key_col, k=k,
                                   min_share=min_share)
    if not hot_keys:
        return fact.join(dim, key_col)
    hot = [int(h) for h in hot_keys]
    fact_hot = fact.filter(F.col(key_col).isin(hot))
    fact_cold = fact.filter(~F.col(key_col).isin(hot)
                            | F.col(key_col).isNull())
    dim_hot = dim.filter(F.col(key_col).isin(hot))
    return (fact_cold.join(dim, key_col)
            .unionByName(fact_hot.join(F.broadcast(dim_hot), key_col)))


def advise_join(spark, left: DataFrame, left_key: str, right: DataFrame,
                right_key: str, *, eps: float = 1e-5,
                broadcast_rows: int = 10_000_000,
                skew_share: float = 0.01, mg_k: int = 1024) -> dict:
    """One-stop sketch-based join planning: a single pass over each
    side's key column builds CM (weighted, from pre-aggregated counts),
    HLL and MG summaries, and the advisor derives

    - ``est_join_rows``: CM inner-product upper bound on the equi-join
      output (cm.h:810-815 semantics; est >= exact always),
    - ``left/right_distinct_keys``: HLL estimates,
    - ``left/right_hot_keys``: MG keys above ``skew_share``,
    - ``strategy``: "broadcast_right"/"broadcast_left" when a side's
      ROW COUNT fits the broadcast budget, else "skew_split" when the
      bigger side's keys are skewed (route through skew_aware_join with
      the returned hot set), else "shuffle".

    All summaries are the mergeable KB-blob kind — the advisory pass
    shuffles sketches, never rows — and they persist (store.py), so a
    recurring pipeline pays the pass once and re-plans from blobs.
    """
    import functools

    from .countmin import CMConfig, CountMinSketch
    from .hll import HllSketch
    from .mg import MisraGries
    from .multi import MultiSketch
    from .spark_build import build_aggregator

    cfg = CMConfig(eps=eps, delta=0.05, seed=1337)
    sides = {}
    for name, df, key in (("left", left, left_key),
                          ("right", right, right_key)):
        # ONE scan builds all three summaries together (MultiSketch): the
        # CM table from raw unit updates is identical to one built from
        # pre-aggregated counts (same additions), so no groupBy shuffle —
        # only KB partial blobs move, honoring the single-pass contract
        res = build_aggregator(
            df.select(key), key,
            functools.partial(MultiSketch, (
                functools.partial(CountMinSketch, cfg),
                functools.partial(HllSketch, 14),
                functools.partial(MisraGries, mg_k))))
        cm, hll, mg = res.sketch.parts
        thresh = mg.n_items * skew_share - mg.error_bound()
        sides[name] = {
            "rows": mg.n_items,
            "distinct_keys": int(hll.estimate()),
            "hot_keys": sorted(k for k, c in mg.top_items()
                               if c >= thresh),
            "_cm": cm,
        }
    est = int(sides["left"]["_cm"].inner_product(sides["right"]["_cm"]))
    l, r = sides["left"], sides["right"]
    if r["rows"] <= broadcast_rows or l["rows"] <= broadcast_rows:
        strategy = ("broadcast_right" if r["rows"] <= l["rows"]
                    else "broadcast_left")
    elif (l["rows"] >= r["rows"] and l["hot_keys"]) or \
            (r["rows"] > l["rows"] and r["hot_keys"]):
        strategy = "skew_split"
    else:
        strategy = "shuffle"
    return {
        "est_join_rows": est,
        "strategy": strategy,
        "left": {k: v for k, v in l.items() if not k.startswith("_")},
        "right": {k: v for k, v in r.items() if not k.startswith("_")},
    }


def auto_join(spark, left: DataFrame, left_key: str, right: DataFrame,
              right_key: str, *, advice: dict | None = None,
              **advise_kwargs) -> DataFrame:
    """Inner equi-join executed via the advised strategy (advise_join):
    broadcast the smaller side, skew-split on the detected hot set, or
    plain shuffle. Every path returns exactly the plain join's rows in a
    canonical column order (key, left non-key cols, right non-key cols;
    non-key names must be disjoint). Pass a previously computed/persisted
    ``advice`` dict to skip the advisory pass — the recurring-pipeline
    shape: one sketch pass per day, every join that day re-plans from
    blobs."""
    if advice is None:
        advice = advise_join(spark, left, left_key, right, right_key,
                             **advise_kwargs)
    r = (right.withColumnRenamed(right_key, left_key)
         if right_key != left_key else right)
    out_cols = ([left_key]
                + [c for c in left.columns if c != left_key]
                + [c for c in r.columns if c != left_key])
    strategy = advice["strategy"]
    if strategy == "broadcast_right":
        out = left.join(F.broadcast(r), left_key)
    elif strategy == "broadcast_left":
        out = F.broadcast(left).join(r, left_key)
    elif strategy == "skew_split":
        if advice["left"]["rows"] >= advice["right"]["rows"]:
            fact, dim, hot = left, r, advice["left"]["hot_keys"]
        else:
            fact, dim, hot = r, left, advice["right"]["hot_keys"]
        out = skew_aware_join(spark, fact, dim, left_key, hot_keys=hot)
    else:
        out = left.join(r, left_key)
    return out.select(*out_cols)
