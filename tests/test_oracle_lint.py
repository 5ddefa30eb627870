"""Oracle-SQL lint (VERDICT r4 item 6): every multi-referenced CTE in every
registry oracle must carry DuckDB's MATERIALIZED hint.

Why this is a correctness-harness invariant and not a style nit: DuckDB 1.0
inlines every CTE reference as a subquery, so reference fan-out multiplies —
the ~sf1 species-replay oracle exceeded DuckDB's 100 GiB budget in under three
minutes until its 23 multi-referenced CTEs were materialized. The registry now
applies the hint mechanically in ``oracle_sql()`` assembly
(``materialize_multi_ref_ctes``); these tests pin (a) the assembled output has
zero violations, (b) the rewriter's behavior on the tricky shapes that made a
hand-maintained list fail before."""

from __future__ import annotations

from ortholog_pipeline_spark.queries._shared import (
    materialize_multi_ref_ctes,
    unmaterialized_multi_ref_ctes,
)


def test_all_registry_oracles_lint_clean():
    import __spark_entry__ as e

    os_ = e.oracle_sql()
    assert len(os_) >= 300
    bad = {
        name: [n for n, _, _ in unmaterialized_multi_ref_ctes(sql)]
        for name, sql in os_.items()
        if unmaterialized_multi_ref_ctes(sql)
    }
    assert bad == {}, f"multi-ref CTEs without MATERIALIZED: {bad}"


def test_rewrite_is_idempotent_over_registry():
    import __spark_entry__ as e

    for name, sql in e.oracle_sql().items():
        assert materialize_multi_ref_ctes(sql) == sql, name


def test_rewrite_adds_hint_only_to_multi_ref():
    sql = (
        "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) "
        "SELECT b1.x + b2.x FROM b b1, b b2"
    )
    out = materialize_multi_ref_ctes(sql)
    assert "b AS MATERIALIZED (" in out
    assert "a AS MATERIALIZED (" not in out  # single reference: stream inline


def test_rewrite_skips_window_clause_specs():
    # `WINDOW w1 AS (...), wf AS (PARTITION BY ...)` — the comma-separated
    # second spec wears the CTE shape but is NOT a CTE; rewriting it is a
    # DuckDB parse error (caught live: w_linear_interpolation in the r5 sweep)
    sql = (
        "WITH t AS (SELECT 1 AS x) "
        "SELECT sum(x) OVER w1, sum(x) OVER wf, t1.x FROM t t1, t t2 "
        "WINDOW w1 AS (ORDER BY t1.x), wf AS (PARTITION BY t1.x)"
    )
    out = materialize_multi_ref_ctes(sql)
    assert "wf AS MATERIALIZED" not in out
    assert "w1 AS MATERIALIZED" not in out
    assert "t AS MATERIALIZED (" in out  # the real CTE still rewrites


def test_rewrite_skips_recursive_self_reference():
    sql = (
        "WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL SELECT n+1 FROM r WHERE n<3) "
        "SELECT r1.n FROM r r1, r r2"
    )
    assert materialize_multi_ref_ctes(sql) == sql


def test_rewrite_not_fooled_by_column_alias_shadowing_cte_name():
    # `sz` CTE whose body aliases a column AS sz: multi-ref must still rewrite
    sql = (
        "WITH sz AS (SELECT len(t) AS sz FROM docs) "
        "SELECT s1.sz + s2.sz FROM sz s1, sz s2"
    )
    assert "sz AS MATERIALIZED (" in materialize_multi_ref_ctes(sql)


def test_rewritten_sql_runs_identically_in_duckdb():
    import duckdb

    sql = (
        "WITH base AS (SELECT unnest(range(1, 6)) AS n), "
        "doubled AS (SELECT n * 2 AS d FROM base) "
        "SELECT CAST(d1.d + d2.d AS BIGINT) AS s FROM doubled d1 "
        "JOIN doubled d2 ON d2.d = d1.d ORDER BY s"
    )
    out = materialize_multi_ref_ctes(sql)
    assert out != sql
    con = duckdb.connect()
    assert con.sql(sql).fetchall() == con.sql(out).fetchall()
