"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship user-context star query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry
(backend_fastapi_spark/queries.py) for the driver's DuckDB-oracle
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importable regardless of the harness's working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from backend_fastapi_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q_user_context_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted → rows-only check)."""
    return Q.oracle_sql()
