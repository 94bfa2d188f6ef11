"""Golden tests for the piper-semantics function layer (SURVEY.md §2.4 quirks)."""

import pytest
from pyspark.sql import functions as F

import feathr_online_spark.functions as pf
from feathr_online_spark.functions.piper import strftime_to_java


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_substring0(spark):
    # reference string_functions.rs:91-124: 0-based, negative wraps from end
    s = F.lit("hello world")
    assert one(spark, pf.substring0(s, 0, 5)) == "hello"
    assert one(spark, pf.substring0(s, 6, 5)) == "world"
    assert one(spark, pf.substring0(s, -5, 5)) == "world"
    assert one(spark, pf.substring0(s, -100, 5)) == "hello"


def test_split_literal(spark):
    # reference splits on a LITERAL delimiter (string_functions.rs:8-54)
    assert one(spark, pf.split_literal(F.lit("a.b.c"), ".")) == ["a", "b", "c"]
    assert one(spark, pf.split_literal(F.lit("a|b|c"), "|")) == ["a", "b", "c"]


def test_element_at0(spark):
    # reference misc_functions.rs:306-326: 0-based, null out-of-range
    arr = F.array(F.lit(10), F.lit(20), F.lit(30))
    assert one(spark, pf.element_at0(arr, 0)) == 10
    assert one(spark, pf.element_at0(arr, 2)) == 30
    assert one(spark, pf.element_at0(arr, 3)) is None


def test_slice0(spark):
    # reference misc_functions.rs:340-359: 0-based [start, end), negative from end
    arr = F.array(*[F.lit(i) for i in range(5)])  # [0,1,2,3,4]
    assert one(spark, pf.slice0(arr, 1, 3)) == [1, 2]
    assert one(spark, pf.slice0(arr, 0, 5)) == [0, 1, 2, 3, 4]
    assert one(spark, pf.slice0(arr, -3, -1)) == [2, 3]
    assert one(spark, pf.slice0(arr, 3, 2)) == []
    assert one(spark, pf.slice0(arr, 2, 100)) == [2, 3, 4]


def test_div_and_mod(spark):
    # div: both → long (math_op.rs:200-228); mod_euclid = rem_euclid (mod.rs:264)
    assert one(spark, pf.div(F.lit(7.9), F.lit(2))) == 3
    assert one(spark, pf.mod_long(F.lit(7), F.lit(3))) == 1
    assert one(spark, pf.mod_euclid(F.lit(-7), F.lit(3))) == 2  # rem_euclid, not Rust %


def test_bucket(spark):
    # reference bucket.rs:13-48: index of first pivot > v; len(pivots) if none
    assert one(spark, pf.bucket(F.lit(5), 10, 20, 30)) == 0
    assert one(spark, pf.bucket(F.lit(15), 10, 20, 30)) == 1
    assert one(spark, pf.bucket(F.lit(10), 10, 20, 30)) == 1  # not strictly less than 10
    assert one(spark, pf.bucket(F.lit(99), 10, 20, 30)) == 3


def test_distance_km(spark):
    # haversine (misc_functions.rs:361-371): London→Paris ≈ 344 km
    d = one(spark, pf.distance_km(F.lit(51.5074), F.lit(-0.1278), F.lit(48.8566), F.lit(2.3522)))
    assert d == pytest.approx(343.5, abs=2.0)


def test_piper_avg_counts_nulls(spark):
    # reference avg counts null rows in the denominator (sum.rs:51-92)
    df = spark.createDataFrame([(1,), (3,), (None,)], "x int")
    got = df.agg(pf.piper_avg("x").alias("a")).collect()[0]["a"]
    assert got == pytest.approx(4 / 3)
    # contrast: Spark avg ignores nulls
    assert df.agg(F.avg("x")).collect()[0][0] == pytest.approx(2.0)


def test_strftime_bridge(spark):
    # the reference demo format "%Y/%-m/%-d %-H:%-M" (conf/pipeline.conf:21)
    assert strftime_to_java("%Y/%-m/%-d %-H:%-M") == "yyyy/M/d H:m"
    ts = one(spark, pf.timestamp_strftime(F.lit("2023/7/4 9:5"), "%Y/%-m/%-d %-H:%-M"))
    assert (ts.year, ts.month, ts.day, ts.hour, ts.minute) == (2023, 7, 4, 9, 5)


def test_array_agg_retains_nulls(spark):
    """Reference ArrayAgg/SetAgg/ArrayAggIf keep nulls (aggregation/
    array_agg.rs: feed() pushes every Value); Spark's collect_list/set drop
    them — the struct-wrap replication must retain them (VERDICT r2 #4)."""
    from pyspark.sql import functions as F

    from feathr_online_spark.functions.aggregations import agg_fn

    df = spark.createDataFrame(
        [(1, None, True), (2, "a", True), (3, None, False), (4, "a", True), (5, "b", None)],
        "id int, v string, keep boolean",
    ).coalesce(1).orderBy("id")
    row = df.agg(
        agg_fn("array_agg")(F.col("v")).alias("lst"),
        agg_fn("collect_set")(F.col("v")).alias("st"),
        agg_fn("array_agg_if")(F.col("v"), F.col("keep")).alias("lst_if"),
    ).collect()[0]
    assert row.lst == [None, "a", None, "a", "b"]
    # SetAgg: first-encounter order, null retained, dup 'a' collapsed
    assert row.st == [None, "a", "b"]
    # ArrayAggIf: cond true keeps the value EVEN IF NULL; false/null cond drops
    assert row.lst_if == [None, "a", "a"]


def test_first_last_column_flag_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from feathr_online_spark.functions.aggregations import agg_fn

    for name in ("first", "last"):
        with pytest.raises(TypeError, match="literal boolean"):
            agg_fn(name)(F.col("x"), F.col("flag"))
        # literal flags still work
        agg_fn(name)(F.col("x"), True)


def test_minhash_requires_non_ansi(spark):
    import pytest
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.dedup import minhash_signature

    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    minhash_signature(F.col("s"))  # fine under the engine session
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(RuntimeError, match="wrap-around"):
            minhash_signature(F.col("s"))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
