"""Certified distribution-drift bounds between two sketch epochs.

DETERMINISTIC total-variation bounds from two Misra-Gries summaries
(Misra & Gries 1982; mergeable form Agarwal et al., PODS 2012) — the
"did the corpus move between snapshots?" primitive for sketch-native
pipeline monitoring. The reference keeps one Count-Min per stream and
has no cross-epoch comparison (rafket/CountMinDB cm.h — point/inner
product only); this module is a north-rule companion built on the same
mergeable-aggregator contract.

Why Misra-Gries and not Count-Min: MG's error is CERTAIN. For every
token t (present or absent, est(t)=0 when absent)

    f(t) - D  <=  est(t)  <=  f(t),      D = certain decrement bound
                                             (<= n/(k+1))

with no failure probability, so bounds summed over thousands of
candidate tokens stay sound. Count-Min's eps*N guarantee holds per
query only with prob 1-delta; a union bound over |H| candidates decays
as |H|*delta and certifies nothing at |H| in the thousands.

The bound. Let p(t) = f(t)/n and p_hat(t) = est(t)/n, so p_hat is an
UNDER-estimate with deficit at most d = D/n, for EVERY token. With
Delta_hat(t) = p_hat_a(t) - p_hat_b(t), interval arithmetic gives the
per-token certified envelope

    p_a(t) - p_b(t)  in  [Delta_hat(t) - d_b,  Delta_hat(t) + d_a]

so |p_a - p_b| >= lb_t = max(0, Delta_hat - d_b, -Delta_hat - d_a) and
|p_a - p_b| <= ub_t = max(|Delta_hat - d_b|, |Delta_hat + d_a|).
Over the candidate set H = keys surviving in EITHER summary (every
token outside H has est=0 in both, lb_t = 0 there):

    TV  =  1/2 * sum_t |p_a - p_b|
        >= 1/2 * sum_{t in H} lb_t                       (tv_lb)
        <= 1/2 * [ sum_{t in H} ub_t
                   + (1 - sum_H p_hat_a) + (1 - sum_H p_hat_b) ]
                                                          (tv_ub)

using sum_{t not in H} |p_a - p_b| <= sum_{not H} p_a + sum_{not H} p_b
and sum_H p >= sum_H p_hat on each side. Both bounds are certain; when
both summaries are exact (distinct keys <= k, D = 0) they collapse to
the exact empirical TV distance.

At 10^12 sequences both epochs' summaries are KB blobs built by the
existing distributed one-pass builders (spark_build.build_aggregator*);
the comparison itself is O(|H|) driver arithmetic on those blobs —
nothing rescans the streams.
"""

from __future__ import annotations

from dataclasses import dataclass

from .mg import MisraGries


@dataclass(frozen=True)
class DriftBounds:
    """Certified TV-distance envelope between two MG epochs."""
    tv_lb: float            # TV >= tv_lb, with certainty
    tv_ub: float            # TV <= tv_ub, with certainty
    n_candidates: int       # |H|: keys surviving in either summary
    d_a: float              # epoch-A per-token deficit bound D_a/n_a
    d_b: float
    n_a: int                # stream items per epoch
    n_b: int


def _deficit(mg: MisraGries) -> float:
    if mg.n_items <= 0:
        raise ValueError("drift bounds need a non-empty epoch "
                         "(n_items == 0)")
    return mg.error_bound() / mg.n_items


def tv_bounds(mg_a: MisraGries, mg_b: MisraGries) -> DriftBounds:
    """Certified lower/upper bound on TV(p_a, p_b) from the summaries.

    Sound for ANY merge order the summaries were built with: MG counter
    values depend on the merge tree, but the deficit bound D does not
    (Agarwal et al. §3.1), and the envelope only uses est in [f-D, f].
    """
    d_a, d_b = _deficit(mg_a), _deficit(mg_b)
    n_a, n_b = mg_a.n_items, mg_b.n_items
    keys = set(mg_a.counters) | set(mg_b.counters)
    lb_sum = ub_sum = mass_a = mass_b = 0.0
    for t in keys:
        pa = mg_a.counters.get(t, 0) / n_a
        pb = mg_b.counters.get(t, 0) / n_b
        mass_a += pa
        mass_b += pb
        delta = pa - pb
        lb_sum += max(0.0, delta - d_b, -delta - d_a)
        ub_sum += max(abs(delta - d_b), abs(delta + d_a))
    tv_lb = min(0.5 * lb_sum, 1.0)
    tv_ub = max(tv_lb,
                min(0.5 * (ub_sum + (1.0 - mass_a) + (1.0 - mass_b)), 1.0))
    return DriftBounds(tv_lb=tv_lb, tv_ub=tv_ub,
                       n_candidates=len(keys), d_a=d_a, d_b=d_b,
                       n_a=n_a, n_b=n_b)


def top_movers(mg_a: MisraGries, mg_b: MisraGries,
               limit: int = 20) -> list[tuple[int, float, float, float]]:
    """Tokens with the largest CERTIFIED frequency shift.

    Returns up to ``limit`` rows (token, p_hat_a, p_hat_b, shift_lb)
    sorted by shift_lb descending, keeping only tokens whose certified
    lower bound on |p_a - p_b| is positive — every reported mover
    genuinely moved; silence about a token is NOT evidence of stability
    (its shift may be under the summaries' resolution d_a + d_b)."""
    d_a, d_b = _deficit(mg_a), _deficit(mg_b)
    n_a, n_b = mg_a.n_items, mg_b.n_items
    rows = []
    for t in set(mg_a.counters) | set(mg_b.counters):
        pa = mg_a.counters.get(t, 0) / n_a
        pb = mg_b.counters.get(t, 0) / n_b
        delta = pa - pb
        lb = max(0.0, delta - d_b, -delta - d_a)
        if lb > 0.0:
            rows.append((t, pa, pb, lb))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:limit]


def grouped_tv_bounds(gdf_a, gdf_b, *, key_col: str = "key",
                      sketch_col: str = "sketch"):
    """Per-group certified TV envelopes between two epochs of grouped
    Misra-Gries summaries — the fleet version of ``tv_bounds`` for
    "which sources moved between snapshots?".

    ``gdf_a``/``gdf_b`` are (key, sketch-blob) DataFrames, the shape
    ``spark_build.build_grouped_aggregator`` emits and
    ``incremental.current_group_sketches`` reloads from the store, so
    drift over published epochs rescans neither stream. Groups pair by
    an equi-JOIN on key and each pair's envelope is computed inside a
    mapInPandas batch — KB blobs, no G² anything, no driver loop;
    G = 10^4 sources stays a Spark problem. Keys present in only one
    epoch are omitted (a one-sided epoch has no two-sided envelope);
    anti-join the inputs for appear/disappear lists.

    Returns (key, tv_lb, tv_ub, n_candidates, n_a, n_b)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from . import serde

    a = gdf_a.select(F.col(key_col).alias("key"),
                     F.col(sketch_col).alias("sk_a"))
    b = gdf_b.select(F.col(key_col).alias("key"),
                     F.col(sketch_col).alias("sk_b"))
    joined = a.join(b, "key")
    key_type = joined.schema["key"].dataType.simpleString()

    def fn(pdfs):
        for pdf in pdfs:
            out = []
            for key, ba, bb in zip(pdf["key"], pdf["sk_a"], pdf["sk_b"]):
                mg_a = serde.loads(bytes(ba))
                mg_b = serde.loads(bytes(bb))
                for m in (mg_a, mg_b):
                    if not isinstance(m, MisraGries):
                        raise TypeError(
                            "grouped_tv_bounds needs MisraGries blobs, "
                            f"got {type(m).__name__} for key {key!r}")
                r = tv_bounds(mg_a, mg_b)
                out.append((key, r.tv_lb, r.tv_ub, r.n_candidates,
                            r.n_a, r.n_b))
            yield pd.DataFrame(out, columns=[
                "key", "tv_lb", "tv_ub", "n_candidates", "n_a", "n_b"])

    return joined.mapInPandas(
        fn, schema=f"key {key_type}, tv_lb double, tv_ub double, "
                   "n_candidates int, n_a long, n_b long")


def grouped_top_movers(gdf_a, gdf_b, *, key_col: str = "key",
                       sketch_col: str = "sketch", limit: int = 20):
    """Per-group certified top movers between two epochs of grouped
    Misra-Gries summaries — the fleet version of ``top_movers`` for
    "which tokens moved, per source, between snapshots?".

    Same input shape and pairing as ``grouped_tv_bounds`` (equi-join on
    group key; each pair evaluated inside a mapInPandas batch — KB
    blobs, no driver loop, G = 10^4+ stays a Spark problem). Emits up
    to ``limit`` rows per group: (key, token, p_old, p_new, shift_lb),
    only tokens whose certified lower bound on |p_old - p_new| is
    positive — every reported mover genuinely moved; silence about a
    token is NOT evidence of stability (resolution d_a + d_b). Groups
    present in only one epoch are omitted."""
    import pandas as pd
    from pyspark.sql import functions as F

    from . import serde

    a = gdf_a.select(F.col(key_col).alias("key"),
                     F.col(sketch_col).alias("sk_a"))
    b = gdf_b.select(F.col(key_col).alias("key"),
                     F.col(sketch_col).alias("sk_b"))
    joined = a.join(b, "key")
    key_type = joined.schema["key"].dataType.simpleString()

    def fn(pdfs):
        for pdf in pdfs:
            out = []
            for key, ba, bb in zip(pdf["key"], pdf["sk_a"], pdf["sk_b"]):
                mg_a = serde.loads(bytes(ba))
                mg_b = serde.loads(bytes(bb))
                for m in (mg_a, mg_b):
                    if not isinstance(m, MisraGries):
                        raise TypeError(
                            "grouped_top_movers needs MisraGries blobs, "
                            f"got {type(m).__name__} for key {key!r}")
                for tok, pa, pb, lb in top_movers(mg_a, mg_b,
                                                  limit=limit):
                    out.append((key, int(tok), pa, pb, lb))
            yield pd.DataFrame(out, columns=[
                "key", "token", "p_old", "p_new", "shift_lb"])

    return joined.mapInPandas(
        fn, schema=f"key {key_type}, token long, p_old double, "
                   "p_new double, shift_lb double")


def drift_report(df_a, df_b, values_col: str, *, k: int = 4096,
                 extract=None, limit: int = 20):
    """End-to-end drift check between two DataFrame epochs.

    Builds one MG(k) per epoch with the distributed one-pass builder
    (tokens never shuffle; KB partials tree-merge) and returns
    ``(DriftBounds, movers)``. ``values_col``/``extract`` as in
    ``spark_build.build_aggregator`` (array columns flatten; ``extract``
    can feed packed n-grams). For published epochs prefer building once
    and storing the blobs (sketchlib.store); this helper is the
    scan-now convenience."""
    import functools

    from .spark_build import build_aggregator

    factory = functools.partial(MisraGries, k)
    mg_a = build_aggregator(df_a, values_col, factory,
                            extract=extract).sketch
    mg_b = build_aggregator(df_b, values_col, factory,
                            extract=extract).sketch
    return tv_bounds(mg_a, mg_b), top_movers(mg_a, mg_b, limit=limit)
