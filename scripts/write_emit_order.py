#!/usr/bin/env python
"""Regenerate the committed QUERY_EMIT_ORDER.json sidecar from the current
registry + _LAST_GREEN state. Run after every scripts/update_verified.py
paste (or any registry/ordering edit) — tests/test_registry_order.py
asserts the committed copy matches the computed order, so forgetting this
step is a test failure, not silent drift.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from backend_fastapi_spark import queries as Q

    path = Q.write_emit_order()
    doc = Q.emit_order_doc()
    print(f"wrote {path}: {len(doc['order'])} names, "
          f"{doc['n_stale_green']} stale greens, "
          f"data_gen_round={doc['data_gen_round']}", file=sys.stderr)


if __name__ == "__main__":
    main()
