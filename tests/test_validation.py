"""Strict/Lenient validation semantics (reference dataset.rs:414-548 vectors)."""

from pyspark.sql import functions as F
from pyspark.sql.types import StructType, StructField, IntegerType, StringType, BooleanType

from feathr_online_spark.operators.pipeline import Pipeline
from feathr_online_spark.operators.validation import collect_errors, validated

TARGET = StructType([
    StructField("col1", IntegerType()),
    StructField("col2", StringType()),
    StructField("col3", BooleanType()),
])


def test_lenient_converts(spark):
    # string→int, int→string, int→bool are all legal lenient conversions
    df = spark.createDataFrame([("42", 7, 1), ("oops", 8, 0)], "col1 string, col2 int, col3 int")
    out = validated(df, TARGET, mode="lenient")
    rows = {r.col2: r for r in out.collect()}
    assert rows["7"].col1 == 42 and rows["7"]._err_col1 is None
    assert rows["7"].col3 is True
    # unparseable string → null cell + error marker
    assert rows["8"].col1 is None and rows["8"]._err_col1 is not None


def test_strict_rejects_cross_class(spark):
    # strict legality = numeric↔numeric, string↔timestamp only (value.rs:1038-1094):
    # string→int, int→string and int→bool all become error cells
    df = spark.createDataFrame([("42", 7, 1)], "col1 string, col2 int, col3 int")
    out = validated(df, TARGET, mode="strict").collect()[0]
    assert out.col1 is None and out._err_col1 is not None
    assert out.col2 is None and out._err_col2 is not None
    assert out.col3 is None and out._err_col3 is not None
    # same row passes leniently
    len_out = validated(df, TARGET, mode="lenient").collect()[0]
    assert (len_out.col1, len_out.col2, len_out.col3) == (42, "7", True)


def test_strict_numeric_widening_ok(spark):
    df = spark.createDataFrame([(1, "x", True)], "col1 bigint, col2 string, col3 boolean")
    out = validated(df, TARGET, mode="strict").collect()[0]
    assert out.col1 == 1 and out._err_col1 is None            # long→int: numeric↔numeric
    assert out.col2 == "x" and out.col3 is True


def test_missing_column_fills_error(spark):
    df = spark.createDataFrame([(1,)], "col1 int")
    out = validated(df, TARGET).collect()[0]
    assert out.col2 is None and "missing" in out._err_col2
    assert out.col3 is None and "missing" in out._err_col3


def test_extra_columns_dropped_and_ignore_error_composes(spark):
    df = spark.createDataFrame(
        [("1", "a", 1, 99), ("x", "b", 0, 99)],
        "col1 string, col2 string, col3 int, extra int",
    )
    out = validated(df, TARGET, mode="lenient")
    assert "extra" not in out.columns
    kept = Pipeline(out).ignore_error().df
    assert [r.col2 for r in kept.collect()] == ["a"]  # the 'x' row drops


def test_collect_errors_report(spark):
    df = spark.createDataFrame(
        [("1", "a", 1), ("x", "b", 0), ("y", "c", 1)],
        "col1 string, col2 string, col3 int",
    )
    out = validated(df, TARGET, mode="lenient")
    rep = {(r.column, r.n) for r in collect_errors(out).collect()}
    assert ("col1", 2) in rep  # 'x' and 'y' failed string→int
    # clean frame → empty report with stable schema
    clean = spark.createDataFrame([(1,)], "v int")
    empty = collect_errors(clean)
    assert empty.count() == 0 and empty.columns == ["column", "message", "n"]
