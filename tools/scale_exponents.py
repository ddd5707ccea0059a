"""Per-query scale exponents from two bench.py JSON lines (VERDICT r3
#1): for each query timed at both scales, report the wall ratio and the
implied exponent alpha = log(t_hi/t_lo) / log(sf_hi/sf_lo) — alpha <= ~1
is linear-or-better, alpha >> 1 flags super-linear creep.

Fixed per-job overhead (Spark job launch, Python worker round-trips,
KB-blob merges) dominates small walls, so tiny-wall queries legitimately
show alpha near 0; the suspicious direction is only alpha > 1 on queries
whose t_hi is big enough to matter (see --min-sec).

Usage: python tools/scale_exponents.py lo.json hi.json [scale_ratio]
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    lo = json.load(open(sys.argv[1]))
    hi = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    min_sec = 0.5   # ignore alpha for sub-overhead walls at the HI scale

    rows = []
    for q, t_lo in sorted(lo["queries"].items()):
        t_hi = hi["queries"].get(q)
        if t_hi is None or t_lo <= 0:
            continue
        alpha = math.log(t_hi / t_lo) / math.log(ratio)
        rows.append((q, t_lo, t_hi, t_hi / t_lo, alpha))

    rows.sort(key=lambda r: -r[4])
    print(f"{'query':30s} {'t_lo':>8s} {'t_hi':>8s} {'ratio':>7s} "
          f"{'alpha':>6s}")
    flagged = []
    for q, t_lo, t_hi, r, a in rows:
        flag = ""
        if a > 1.15 and t_hi >= min_sec:
            flag = "  <-- SUPER-LINEAR"
            flagged.append(q)
        print(f"{q:30s} {t_lo:8.2f} {t_hi:8.2f} {r:7.2f} {a:6.2f}{flag}")
    print(f"\nsuite totals: {lo['value']:.1f}s -> {hi['value']:.1f}s "
          f"(x{hi['value']/lo['value']:.2f} at x{ratio:.0f} data)")
    for k in ("host_steal_pct", "host_busy_pct"):
        print(f"{k}: lo={lo.get(k)} hi={hi.get(k)}")
    if flagged:
        print(f"SUPER-LINEAR (alpha>1.15, t_hi>={min_sec}s): {flagged}")
        sys.exit(1)
    print("no super-linear queries")


if __name__ == "__main__":
    main()
