#!/usr/bin/env python
"""Round-N bookkeeping: merge the driver's latest CORRECTNESS file(s) into
the last-green-round map that orders the registry (queries.py emits stale
and never-verified queries first so a budget-capped driver sweep always
covers the most evidence-starved work).

Usage:
    python scripts/update_verified.py CORRECTNESS_r05.json
The round number is parsed from each filename (CORRECTNESS_r0N.json).
Prints the python literal for the updated map — paste it over
`_LAST_GREEN` in backend_fastapi_spark/queries.py.

If the driver regenerates /root/testdata, also bump `_DATA_GEN_ROUND` in
queries.py to the new round — that is what demotes older greens to stale.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import backend_fastapi_spark.queries as Q

    last_green = dict(Q._LAST_GREEN)
    for path in sys.argv[1:]:
        m = re.search(r"_r0*(\d+)", os.path.basename(path))
        if not m:
            raise SystemExit(f"cannot parse round number from {path!r}")
        rnd = int(m.group(1))
        rows = json.load(open(path))
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    known = set(Q.REGISTRY)
    last_green = {n: r for n, r in last_green.items() if n in known}
    print("_LAST_GREEN = {")
    for n in sorted(last_green):
        print(f'    "{n}": {last_green[n]},')
    print("}")
    # Rows-only queries the driver exercised (spark_rows > 0, no oracle):
    # print the updated recency map — paste it over
    # `_ROWS_ONLY_LAST_EXERCISED` in queries.py so they re-queue at the
    # tail of the tier-5 rotation (VERDICT r12 #1).
    rows_only = dict(Q._ROWS_ONLY_LAST_EXERCISED)
    for path in sys.argv[1:]:
        m = re.search(r"_r0*(\d+)", os.path.basename(path))
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) > 0
                and name in known
            ):
                rows_only[name] = max(rows_only.get(name, 0), rnd)
    print("_ROWS_ONLY_LAST_EXERCISED = {")
    for n in sorted(rows_only):
        print(f'    "{n}": {rows_only[n]},')
    print("}")
    fresh = sum(1 for r in last_green.values() if r >= Q._DATA_GEN_ROUND)
    print(
        f"# {len(last_green)} ever-green / {fresh} fresh (>= data gen r{Q._DATA_GEN_ROUND}) "
        f"/ {len(known)} registered",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
