#!/usr/bin/env python
"""Round-N bookkeeping: merge the driver's latest CORRECTNESS file into
the verified-name set that orders the registry (queries.py emits
not-yet-driver-verified queries first so a budget-capped driver sweep
always covers new work).

Usage:
    python scripts/update_verified.py CORRECTNESS_r02.json
prints the python literal for the updated frozenset — paste it over
`_R1_VERIFIED` in backend_fastapi_spark/queries.py (keep the name; it
means "verified by any prior round's driver run").
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import backend_fastapi_spark.queries as Q

    verified = set(Q._R1_VERIFIED)
    for path in sys.argv[1:]:
        rows = json.load(open(path))
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                verified.add(name)
    known = set(Q.REGISTRY)
    verified &= known  # drop renamed/retired queries
    names = sorted(verified)
    body = ", ".join(f'"{n}"' for n in names)
    print("_R1_VERIFIED = frozenset(")
    print(textwrap.fill("{" + body + "}", width=78, initial_indent="    ",
                        subsequent_indent="    "))
    print(")")
    print(f"# {len(names)} verified / {len(known)} registered", file=sys.stderr)


if __name__ == "__main__":
    main()
