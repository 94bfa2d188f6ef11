"""Verb-level tests using the reference's own inline test vectors
(FIXTURES.md §7), so outputs are golden against feathr-online."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.operators.pipeline import Pipeline, PipelineError
from tests.conftest import rows


def test_project_arithmetic_golden(spark):
    # reference: piper/src/piper.rs:296-356 — t(a) | project b=a+42, c=a-42
    df = spark.createDataFrame([(1,), (2,), (3,)], "a int")
    out = Pipeline(df).project(b=F.col("a") + 42, c=F.col("a") - 42).df
    assert rows(out) == [(1, 43, -41), (2, 44, -40), (3, 45, -39)]


def test_project_health_check_invariant(spark):
    # reference health check: a=57 -> b=99 (pipelines.rs:176-206)
    df = spark.createDataFrame([(57,)], "a int")
    out = Pipeline(df).project(b=F.col("a") + 42).df
    assert out.collect()[0]["b"] == 99


def test_project_rejects_collision(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(PipelineError):
        Pipeline(df).project(a=F.col("a") + 1)


def test_where_and_take(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "x int")
    out = Pipeline(df).where(F.col("x") % 2 == 0).df
    assert rows(out) == [(0,), (2,), (4,), (6,), (8,)]
    assert Pipeline(df).take(3).df.count() == 3


def test_top_nulls_last(spark):
    df = spark.createDataFrame([(1,), (None,), (5,), (3,), (None,)], "x int")
    out = Pipeline(df).top(3, "x", ascending=False, nulls_first=False).df
    assert [r.x for r in out.collect()] == [5, 3, 1]
    out2 = Pipeline(df).top(3, "x", ascending=False, nulls_first=True).df
    assert [r.x for r in out2.collect()] == [None, None, 5]


def test_explode_golden(spark):
    # reference: explode_transformation.rs:143-174 — empty arrays vanish
    data = [
        (1, [10, 20]),
        (2, []),          # dropped
        (3, [30]),
        (4, None),        # dropped (inner explode)
    ]
    df = spark.createDataFrame(data, "a int, b array<int>")
    out = Pipeline(df).explode("b", cast="long").df
    assert rows(out) == [(1, 10), (1, 20), (3, 30)]


def test_distinct_by_projects_to_keys(spark):
    # reference: distinct_transformation.rs:58-67 — output schema = keys only
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z"), (2, "z")], "a int, b string")
    out = Pipeline(df).distinct("a").df
    assert out.columns == ["a"]
    assert rows(out) == [(1,), (2,)]
    # no keys: full-row dedupe
    assert len(rows(Pipeline(df).distinct().df)) == 3


def test_summarize_golden(spark):
    # reference: summarize_transformation.rs:193-244 — 6 rows, 3 groups,
    # output = agg columns then key columns
    df = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 300), (4, 20, 400), (5, 30, 500), (6, 30, 600)],
        "x int, y int, z int",
    )
    out = Pipeline(df).summarize(
        {"a": F.count(F.lit(1)), "sx": F.sum("x"), "sz": F.sum("z")}, by=["y"]
    ).df
    assert out.columns == ["a", "sx", "sz", "y"]
    assert rows(out) == [(2, 3, 300, 10), (2, 7, 700, 20), (2, 11, 1100, 30)]


def test_summarize_computed_key(spark):
    df = spark.createDataFrame([(1, 5), (2, 6), (3, 7)], "x int, v int")
    out = Pipeline(df).summarize(
        {"cnt": F.count(F.lit(1))}, by={"parity": F.col("x") % 2}
    ).df
    assert rows(out) == [(1, 0), (2, 1)]


def test_project_rename_remove_keep(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    out = Pipeline(df).project_rename(x="a").df
    assert out.columns == ["x", "b", "c"]
    assert Pipeline(df).project_remove("b").df.columns == ["a", "c"]
    assert Pipeline(df).project_keep("c", "a").df.columns == ["c", "a"]


def test_lookup_first_match_and_join_kinds(spark):
    # reference fixture: test-data/test_db.sql join_test(group_id, name, age)
    jt = spark.createDataFrame(
        [(1, "Jack", 30), (1, "Jane", 31), (1, "John", 32), (2, "Jill", 33), (2, "Jose", 34), (4, "Joan", 35)],
        "group_id int, name string, age int",
    )
    src = spark.createDataFrame([(1,), (2,), (3,)], "gid int")

    # lookup: exactly one match per key (deterministic: min age via tiebreak)
    out = Pipeline(src).lookup(jt, on=F.col("gid"), key="group_id", fields=["name", "age"], tiebreak="age").df
    assert rows(out) == [(1, "Jack", 30), (2, "Jill", 33), (3, None, None)]

    # join left-inner: 1:N, unmatched dropped
    inner = Pipeline(src).join(jt, "left-inner", on=F.col("gid"), key="group_id", fields=["name"]).df
    assert rows(inner) == [(1, "Jack"), (1, "Jane"), (1, "John"), (2, "Jill"), (2, "Jose")]

    # join left-outer: unmatched kept with nulls
    outer = Pipeline(src).join(jt, "left-outer", on=F.col("gid"), key="group_id", fields=["name"]).df
    assert rows(outer) == [(1, "Jack"), (1, "Jane"), (1, "John"), (2, "Jill"), (2, "Jose"), (3, None)]


def test_ignore_error(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "divide by zero"), (3, None)], "v int, _err_y string"
    )
    out = Pipeline(df).ignore_error().df
    assert out.columns == ["v"]
    assert rows(out) == [(1,), (3,)]


def test_verb_chain_is_one_plan(spark):
    """where→project→summarize→top must compile to a single optimized plan with
    filter pushdown (no materialization between verbs)."""
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "v int, k int")
    p = (
        Pipeline(df)
        .where(F.col("v") > 10)
        .project(v2=F.col("v") * 2)
        .summarize({"s": F.sum("v2")}, by=["k"])
        .top(2, "s")
    )
    plan = p.df._jdf.queryExecution().optimizedPlan().toString()
    # one logical plan containing aggregate over filtered input
    assert "Aggregate" in plan and "Filter" in plan
