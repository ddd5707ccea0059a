"""Regenerate the '### Query inventory' table in SURVEY.md from the live
driver contract (__spark_entry__.queries() / oracle_sql()): entry order,
check type (oracle vs rows-only, and whether it falls inside the driver's
50-entry checked window), and each query's docstring first line.

Usage: python tools/sync_survey_inventory.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRIVER_WINDOW = 50
HEADER = "### Query inventory (driver contract, auto-synced)"


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    return doc.splitlines()[0].strip() if doc else ""


def main() -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = set(entry.oracle_sql())
    n_oracle = sum(1 for k in qs if k in oracles)
    n_total = len(qs)
    n_tail = max(0, n_total - DRIVER_WINDOW)

    lines = [
        HEADER,
        "",
        f"{n_total} queries, {n_oracle} oracle-checked; oracle-checked "
        "entries are ordered FIRST to fill the driver's "
        f"{DRIVER_WINDOW}-entry correctness window exactly. Every entry "
        f"past the window ({n_tail} of them) is RE-RUN driver-side by "
        "`selfcheck_summary` (the window's 50th entry): self-assert flag "
        "columns are enforced and the deliberately-overflowed oracled "
        "queries are DuckDB-checked in-process, so one pinned driver row "
        "goes red if any tail invariant breaks (plus pytest + "
        "tools/check_entry.py locally).",
        "",
        "| # | query | check | summary |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(qs.items(), start=1):
        if name in oracles and i <= DRIVER_WINDOW:
            check = "oracle (DuckDB value-hash)"
        elif name in oracles:
            # oracled but past the driver's window: its oracle runs
            # inside selfcheck_summary (driver-visible through that
            # row) and in the local gate
            check = "oracle (via selfcheck_summary + local gate)"
        elif i <= DRIVER_WINDOW:
            check = "rows-only (driver-run)"
        else:
            check = "rows-only (self-asserts via selfcheck_summary)"
        summary = first_line(fn).replace("|", "\\|")
        lines.append(f"| {i} | `{name}` | {check} | {summary} |")

    path = os.path.join(REPO, "SURVEY.md")
    text = open(path).read()
    start = text.index(HEADER)
    # table ends at the first line after `start` that is neither blank,
    # a table row, nor the intro sentence block
    tail = text[start:]
    m = re.search(r"\n\n(?!\|)(?=\S)(?!\d)", tail[len(HEADER):])
    end = start + len(HEADER) + (m.start() if m else len(tail))
    new = text[:start] + "\n".join(lines) + text[end:]
    open(path, "w").write(new)
    print(f"synced: {n_total} queries, {n_oracle} oracled, "
          f"{n_tail} outside window")


if __name__ == "__main__":
    main()
