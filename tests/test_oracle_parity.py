"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from backend_fastapi_spark import queries as Q
from tests.conftest import SF_ORACLE
from tests.parity import compare, duck_con


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_query_matches_oracle(spark, con, name):
    spec = Q.REGISTRY[name]
    sdf = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert sdf.count() >= 0  # rows-only check, mirrors driver's weak gate
        return
    oracle = con.execute(spec.oracle).fetchdf()
    problems = compare(sdf, oracle, name)
    assert not problems, "\n".join(problems)
