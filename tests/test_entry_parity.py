"""Local mirror of the driver's correctness gate: every registered query with an
oracle must hash-match DuckDB at sf0.001 (sf0.01 is the driver's gate; 0.001 keeps
the test suite fast). Also smoke-checks entry() and the rows-only queries."""

from __future__ import annotations

import os

import pytest

from ortholog_pipeline_spark import queries as Q
from ortholog_pipeline_spark.oracle import compare, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/lineitem.parquet"), reason="testdata missing"
)


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_DIR)


_WITH_ORACLE = sorted(Q.oracle_sql())
_ROWS_ONLY = sorted(set(Q.queries()) - set(Q.oracle_sql()))


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, con, name):
    problems = compare(Q.queries()[name](spark, SF_DIR), con.sql(Q.oracle_sql()[name]).df())
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    assert Q.queries()[name](spark, SF_DIR).count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
