"""Registry smoke: every registered piper built-in resolves and a sample of
representative entries evaluates with reference semantics."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.functions.registry import fn, names


def test_registry_size_and_resolution():
    ns = names()
    assert len(ns) >= 150  # the reference registers ~150 built-ins
    for n in ns:
        assert callable(fn(n))
    with pytest.raises(KeyError):
        fn("definitely_not_a_function")


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_representative_semantics(spark):
    # quirk entries route to piper semantics
    assert one(spark, fn("substring")(F.lit("hello"), 0, 2)) == "he"
    assert one(spark, fn("element_at")(F.array(F.lit(1), F.lit(2)), 0)) == 1
    assert one(spark, fn("mod")(F.lit(-7), F.lit(3))) == 2
    assert one(spark, fn("split")(F.lit("a.b"), ".")) == ["a", "b"]
    # bug-compat last_day/next_day = +1 day (reference mod.rs:224,271)
    import datetime
    d = one(spark, fn("last_day")(F.lit("2023-01-15").cast("date")))
    assert d == datetime.date(2023, 1, 16)
    # plain pass-throughs
    assert one(spark, fn("levenshtein")(F.lit("kitten"), F.lit("sitting"))) == 3
    assert one(spark, fn("instr")(F.lit("hello"), F.lit("l"))) == 3
    assert one(spark, fn("factorial")(F.lit(21))) is None  # null for n>20, as reference
    assert one(spark, fn("bucket")(F.lit(15), 10, 20)) == 1
    assert one(spark, fn("if")(F.lit(True), F.lit(1), F.lit(2))) == 1
    assert abs(one(spark, fn("pi")()) - 3.141592653589793) < 1e-12
    assert one(spark, fn("conv")(F.lit("ff"), 16, 10)) == "255"
    assert one(spark, fn("get_json_array")(F.lit('{"a": ["x","y"]}'), "$.a")) == ["x", "y"]
    # the reference demo shape: $[*].name over a root JSON array (pipeline.conf:67)
    assert one(spark, fn("get_json_array")(F.lit('[{"name":"Drama"},{"name":"Comedy"}]'), "$[*].name")) == ["Drama", "Comedy"]
    assert one(spark, fn("json_array_length")(F.lit("[1,2,3]"))) == 3
    assert one(spark, fn("bigint")(F.lit("42"))) == 42
    assert one(spark, fn("cot")(F.lit(1.0))) == pytest.approx(0.6420926159343306)
