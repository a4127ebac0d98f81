"""Registry hygiene gate (r3 VERDICT item 10): every query registered in
ebel_spark.queries must carry HARD driver evidence — a row in some
CORRECTNESS_r*.json — or at least sit inside the driver gate's first-50
window so the CURRENT round will produce one.  Fails (exit 1) on any
query with neither, so future additions self-report their evidence debt
instead of accumulating silently (the r2/r3 pattern this round closed).

Usage: python scripts/check_registry_evidence.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GATE_WINDOW = 50


def main() -> int:
    from ebel_spark.queries import QUERIES

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fd:
            rows = json.load(fd)
        # r4 ADVICE: a driver row only counts as hard evidence when it is
        # GREEN (rows/schema/hash all match) — an err-free mismatch row
        # (e.g. doc_budget_slice in r02) must not retire a query from the
        # gate window, or a real regression rotates out unseen.
        seen.update(
            n for n, r in rows.items()
            if isinstance(r, dict) and not r.get("err")
            and r.get("rows_match") and r.get("schema_match")
            and r.get("hash_match"))

    names = list(QUERIES)
    checked = [n for n in names if n in seen]
    scheduled = [n for i, n in enumerate(names)
                 if n not in seen and i < GATE_WINDOW]
    debt = [n for i, n in enumerate(names)
            if n not in seen and i >= GATE_WINDOW]

    print(f"registered={len(names)} driver-checked={len(checked)} "
          f"scheduled-this-round={len(scheduled)} evidence-debt={len(debt)}")
    if scheduled:
        print("scheduled (inside gate window, awaiting this round's run):")
        for n in scheduled:
            print(f"  {n}")
    if debt:
        print("EVIDENCE DEBT (never driver-checked AND outside the window):")
        for n in debt:
            print(f"  {n}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
