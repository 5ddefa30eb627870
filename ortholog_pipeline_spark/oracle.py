"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side-by-side on the same parquet
tables and compares row count, schema (column names), and order-insensitive values —
the same shape as CORRECTNESS_r{N}.json. Used by tests/test_entry_parity.py and by
`python -m ortholog_pipeline_spark.oracle` for ad-hoc checks while iterating.
"""

from __future__ import annotations

import math

import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows — order-insensitive
    comparison form."""
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            # absorb float representation jitter across engines
            return round(v, 6)
        if hasattr(v, "isoformat"):  # datetime/date/pd.Timestamp
            return pd.Timestamp(v).isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        return v

    for c in df.columns:
        df[c] = df[c].map(norm)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions; empty = parity."""
    got = _canon(spark_df.toPandas())
    exp = _canon(oracle_df)
    problems: list[str] = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"schema: spark={list(got.columns)} oracle={list(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"rowcount: spark={len(got)} oracle={len(exp)}")
    n = min(len(got), len(exp))
    diff = got.iloc[:n].compare(exp.iloc[:n]) if n else pd.DataFrame()
    if not diff.empty:
        problems.append(f"values: {len(diff)} differing rows; first:\n{diff.head(3)}")
    return problems


def run_parity(sf_dir: str, only: list[str] | None = None, spark=None) -> dict[str, list[str]]:
    """Run every registered query with an oracle; returns {name: problems}."""
    from ortholog_pipeline_spark import queries as Q
    from ortholog_pipeline_spark.session import get_spark

    spark = spark or get_spark()
    con = duckdb_connection(sf_dir)
    results: dict[str, list[str]] = {}
    oracles = Q.oracle_sql()
    for name, fn in Q.queries().items():
        if only and name not in only:
            continue
        if name not in oracles:
            results[name] = (
                ["NO-ORACLE (rows-only)"]
                if fn(spark, sf_dir).count() < 0
                else []
            )
            continue
        try:
            results[name] = compare(fn(spark, sf_dir), con.sql(oracles[name]).df())
        except Exception as e:  # surface engine/SQL errors as findings
            results[name] = [f"ERROR: {type(e).__name__}: {e}"]
    return results


if __name__ == "__main__":
    import os
    import sys

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None
    res = run_parity(sf, only)
    bad = False
    for name, problems in sorted(res.items()):
        status = "OK" if not problems else "; ".join(problems)
        print(f"{name}: {status}")
        bad = bad or bool(problems)
    sys.exit(1 if bad else 0)
