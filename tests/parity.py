"""Local replica of the driver's DuckDB-oracle compare.

Normalizes both results the way the driver does (columns sorted by name,
rows order-insensitive) and asserts exact value equality — if this passes,
the driver's value-hash comparison should too.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return v
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=repr)
    return out


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    problems = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    # dtype-kind strictness: int vs float would pass Python ==, but the
    # driver's value-hash sees the representation — catch it here
    for c in sorted(sp.columns):
        ks, ko = sp[c].dtype.kind, oracle_df[c].dtype.kind
        if ks != ko and "O" not in (ks, ko):
            problems.append(
                f"{name}: dtype kind mismatch on {c}: "
                f"spark={sp[c].dtype} oracle={oracle_df[c].dtype}"
            )
    if len(sp) != len(oracle_df):
        problems.append(f"{name}: row count spark={len(sp)} oracle={len(oracle_df)}")
    a, b = normalize(sp), normalize(oracle_df)
    if a != b:
        sa, sb = set(map(repr, a)), set(map(repr, b))
        only_a = [r for r in a if repr(r) not in sb][:3]
        only_b = [r for r in b if repr(r) not in sa][:3]
        problems.append(
            f"{name}: value mismatch; spark-only={only_a} oracle-only={only_b}"
        )
    return problems
