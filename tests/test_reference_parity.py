"""Reference-parity golden tests: the reference's OWN inline test vectors
(inputs and expected outputs copied verbatim from its #[test] functions),
run through our engine — the 'feathr-online transform/pipeline golden tests'
gate of the north rule.  Citations per test.

Plus the numpy-allclose feature-vector parity check: our as-of + derivation
outputs vs an independent pandas/numpy re-implementation of the same
semantics, compared per entity×timestamp.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feathr_online_spark.dsl import parse_pipelines
from feathr_online_spark.operators.asof import asof_join
from tests.conftest import rows as sorted_rows

EIGHT_ROWS = [
    (10, [1, 2, 3]),
    (10, []),
    (20, []),
    (20, [400]),
    (30, [4, 5, 6]),
    (30, [600]),
    (40, []),
    (40, [800]),
]


def test_explode_golden_exact(spark):
    """explode_transformation.rs:134-173 — 8 rows in, 9 rows out, empty
    arrays vanish; exact expected rows."""
    p = parse_pipelines("test_pipeline(a as int, b as array)\n| explode b as int\n;")["test_pipeline"]
    out = p.run(spark, [{"a": a, "b": [str(x) for x in b]} for a, b in EIGHT_ROWS])
    got = sorted_rows(out)
    assert got == [(10, 1), (10, 2), (10, 3), (20, 400), (30, 4), (30, 5), (30, 6), (30, 600), (40, 800)]


def test_distinct_golden_exact(spark):
    """distinct_transformation.rs:77-112 — distinct by a: 8 rows → 4, output
    schema = [a] only."""
    p = parse_pipelines("test_pipeline(a as int, b as array)\n| distinct by a\n;")["test_pipeline"]
    out = p.run(spark, [{"a": a, "b": [str(x) for x in b]} for a, b in EIGHT_ROWS])
    assert out.columns == ["a"]
    assert sorted_rows(out) == [(10,), (20,), (30,), (40,)]


def test_summarize_golden_exact(spark):
    """summarize_transformation.rs:193-244 — exact group values, output order
    aggs-then-keys."""
    p = parse_pipelines("t(x as int, y as int, z as int)\n| summarize a=count(), sx=sum(x), sz=sum(z) by y\n;")["t"]
    data = [(42, 1, 12), (37, 2, 13), (56, 3, 14), (89, 2, 15), (13, 3, 16), (24, 3, 17)]
    out = p.run(spark, [{"x": x, "y": y, "z": z} for x, y, z in data])
    assert out.columns == ["a", "sx", "sz", "y"]
    got = {r.y: (r.a, r.sx, r.sz) for r in out.collect()}
    assert got[1] == (1, 42, 12)
    assert got[2] == (2, 37 + 89, 13 + 15)
    assert got[3] == (3, 56 + 13 + 24, 14 + 16 + 17)


def test_top_golden_exact(spark):
    """top_transformation.rs:202-245 — top 5 by b asc nulls first: the null
    row leads, then ascending b."""
    p = parse_pipelines("t(a as int, b as int)\n| top 5 by b asc nulls first\n;")["t"]
    data = [(1, 2), (2, 1), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8), (9, None), (10, 10)]
    out = p.run(spark, [{"a": a, "b": b} for a, b in data])
    got = [(r.a, r.b) for r in out.collect()]
    assert got == [(9, None), (2, 1), (1, 2), (3, 3), (4, 4)]


def test_project_golden_exact(spark):
    """piper.rs:296-356 — t(a) | project b=a+42, c=a-42 over a ∈ {1,2,3}."""
    p = parse_pipelines("t(a as int)\n| project b=a+42, c=a-42\n;")["t"]
    out = p.run(spark, [{"a": 1}, {"a": 2}, {"a": 3}])
    assert sorted_rows(out) == [(1, 43, -41), (2, 44, -40), (3, 45, -39)]


def test_join_golden_exact(spark):
    """lookup_transformation.rs join tests + conf/pipeline.conf:38-48 —
    left-inner drops id=3, avg over double(age), array_agg then explode."""
    jt = spark.createDataFrame(
        [(1, "Jack", 30), (1, "Jane", 31), (1, "John", 32), (2, "Jill", 33), (2, "Jose", 34), (4, "Joan", 35)],
        "group_id int, name string, age int",
    )
    src = (
        "test_join_outer(id as int)\n"
        "| join kind=left-outer name, age from join_test on id\n"
        "| summarize avg_age=avg(double(age)), names=array_agg(name) by id\n"
        ";"
    )
    p = parse_pipelines(src)["test_join_outer"]
    out = p.run(spark, [{"id": 1}, {"id": 2}, {"id": 3}], {"join_test": (jt, "group_id")})
    got = {r.id: (r.avg_age, sorted(r.names)) for r in out.collect()}
    assert got[1] == (31.0, ["Jack", "Jane", "John"])
    assert got[2] == (33.5, ["Jill", "Jose"])
    # left-outer keeps id=3 with null age; piper avg = sum/count(*) → null/1 = None.
    # array_agg feeds the outer-join's null name too (array_agg.rs: feed()
    # pushes every Value), so the reference yields [null] — not [] — here.
    assert 3 in got and got[3][1] == [None]


def test_aggregation_golden_vectors(spark):
    """Aggregation accumulator vectors ported from the reference unit tests:
    all_any.rs:99-128 (every/any end states), array_agg.rs:104-150
    (array_agg keeps duplicates, collect_set dedups, array_agg_if filters),
    count.rs (count/count_if/distinct_count), min_max.rs (min_by skips null
    keys)."""
    from feathr_online_spark.functions.aggregations import agg_fn
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        # (b_all, b_any, v, keep, mkey, mval)
        [
            (True, False, 1, True, 5, "a"),
            (True, False, 2, False, None, "skipme"),   # null min_by key is skipped
            (True, False, 3, True, 1, "b"),
            (False, True, 2, False, 9, "c"),
            (True, False, 2, True, 2, "d"),
        ],
        "b_all boolean, b_any boolean, v int, keep boolean, mkey int, mval string",
    )
    row = df.agg(
        agg_fn("every")(F.col("b_all")).alias("every_"),
        agg_fn("any")(F.col("b_any")).alias("any_"),
        agg_fn("count")().alias("cnt"),
        agg_fn("count_if")(F.col("keep")).alias("cnt_if"),
        agg_fn("distinct_count")(F.col("v")).alias("dc"),
        F.sort_array(agg_fn("array_agg")(F.col("v"))).alias("arr"),
        F.sort_array(agg_fn("collect_set")(F.col("v"))).alias("st"),
        F.sort_array(F.filter(agg_fn("array_agg_if")(F.col("v"), F.col("keep")),
                              lambda x: x.isNotNull())).alias("arr_if"),
        agg_fn("min_by")(F.col("mkey"), F.col("mval")).alias("minby"),
    ).collect()[0]
    assert row.every_ is False          # one false poisons all (all_any.rs test_all)
    assert row.any_ is True             # one true sets any (test_any)
    assert row.cnt == 5 and row.cnt_if == 3 and row.dc == 3
    assert row.arr == [1, 2, 2, 2, 3]   # array_agg keeps duplicates
    assert row.st == [1, 2, 3]          # set_agg dedups
    assert row.arr_if == [1, 2, 3]      # only keep=true rows (array_agg_if)
    assert row.minby == "b"             # min non-null key=1 → 'b'; null key skipped


def test_math_promotion_and_concat_golden(spark):
    """math_op.rs semantics via the DSL: int/int `/` is Rust-truncated
    (DivideOperator via binary_math_op: Int/Int → Int), float mixes promote
    to true double division, string + anything concatenates (math_op.rs:82),
    div/% force long."""
    p = parse_pipelines(
        't(a as int, s as string)\n'
        '| project add = a + 1, tdiv = a / 4, fdiv = a / 4.0,'
        '  idiv = a div 4, m = a % 4, cat = s + "!" \n'
        ';'
    )["t"]
    r = p.run(spark, [{"a": 10, "s": "hi"}]).collect()[0]
    assert r.add == 11
    assert r.tdiv == 2                    # Int/Int truncates (math_op.rs:197)
    assert r.fdiv == pytest.approx(2.5)   # float operand → true division
    assert r.idiv == 2 and r.m == 2
    assert r.cat == "hi!"


# ---------------------------------------------------------------------------
# numpy-allclose feature-vector parity (north rule)
# ---------------------------------------------------------------------------

def test_asof_feature_vectors_allclose_vs_pandas_reference(spark):
    """Per entity×timestamp, the engine's attached feature vector must match
    an independent pandas merge_asof implementation under np.allclose, and
    token arrays must be byte-identical (per-row invariant)."""
    rng = np.random.default_rng(99)
    n_e, n_f, dim = 1200, 800, 8

    ev = pd.DataFrame({
        "entity": rng.integers(0, 30, n_e),
        "event_time": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 10_000, n_e), unit="m"),
        "eid": np.arange(n_e),
    })
    tokens = [rng.integers(0, 50257, rng.integers(1, 20)).astype("int32").tolist() for _ in range(n_e)]
    ev["tokens"] = tokens
    ft = pd.DataFrame({
        "entity": rng.integers(0, 30, n_f),
        "feature_time": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 10_000, n_f), unit="m"),
    })
    # unique (entity, ts) on the feature side so the expected vector is unambiguous
    ft = ft.drop_duplicates(["entity", "feature_time"]).reset_index(drop=True)
    fvec = rng.standard_normal((len(ft), dim)).astype("float32")
    ft["f_vec"] = [v.tolist() for v in fvec]

    events = spark.createDataFrame(ev, "entity long, event_time timestamp, eid long, tokens array<int>")
    features = spark.createDataFrame(ft, "entity long, feature_time timestamp, f_vec array<float>")

    out = asof_join(events, features).orderBy("eid").collect()

    # independent reference: pandas merge_asof per entity, strict (<)
    evs = ev.sort_values("event_time", kind="mergesort")
    fts = ft.sort_values("feature_time", kind="mergesort")
    expected = pd.merge_asof(
        evs, fts, by="entity", left_on="event_time", right_on="feature_time",
        allow_exact_matches=False, direction="backward",
    ).sort_values("eid")

    got_vecs = {r.eid: r.f_vec for r in out}
    got_tokens = {r.eid: r.tokens for r in out}
    n_matched = 0
    for _, row in expected.iterrows():
        eid = row["eid"]
        exp = row["f_vec"]
        got = got_vecs[eid]
        if isinstance(exp, list):
            assert got is not None, f"eid {eid}: engine missed a feature the oracle found"
            assert np.allclose(np.array(got, dtype=np.float64), np.array(exp, dtype=np.float64))
            n_matched += 1
        else:
            assert got is None, f"eid {eid}: engine attached a feature the oracle says is leakage"
        # per-row invariant: token arrays pass through byte-identical
        assert got_tokens[eid] == tokens[eid]
    assert n_matched > 200  # the comparison actually exercised real matches


def test_scalar_function_golden_vectors(spark):
    """Golden vectors lifted from the reference's own unit tests:
    string_functions.rs (substring, split, substring_index),
    misc_functions.rs (abs, ascii, concat_ws), bucket.rs, timestamp.rs."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    # string_functions.rs test_substring (0-based, negative-from-end)
    assert one(fn("substring")(F.lit("www.apache.org"), 4, 6)) == "apache"
    assert one(fn("substring")(F.lit("www.apache.org"), -3, 3)) == "org"
    # string_functions.rs test_split (literal delimiter)
    assert one(fn("split")(F.lit("a_b"), "_")) == ["a", "b"]
    # string_functions.rs test_substring_index vectors
    six = fn("substring_index")
    for count, want in [(2, "www.apache"), (3, "www.apache.org"), (4, "www.apache.org"),
                        (-1, "org"), (-2, "apache.org"), (-3, "www.apache.org"),
                        (-4, "www.apache.org"), (0, ""), (1, "www")]:
        assert one(six(F.lit("www.apache.org"), ".", count)) == want, count
    # misc_functions.rs test_abs / test_ascii / test_concat_ws
    assert one(fn("abs")(F.lit(-1))) == 1
    assert one(fn("ascii")(F.lit("a"))) == 97
    assert one(fn("concat_ws")("_", F.lit("a"), F.lit("b"), F.lit("c"))) == "a_b_c"
    # bucket.rs test_bucket_type: bucket(0.5, 0, 1, 2, 3) = 1
    assert one(fn("bucket")(F.lit(0.5), 0.0, 1.0, 2.0, 3.0)) == 1
    # mod.rs:366: timestamp() = to_timestamp (datetime_functions.rs:52-79)
    # → a DATETIME value; unix_timestamp/to_unix_timestamp (TimestampFunction,
    # timestamp.rs) → DOUBLE epoch seconds.  Same chrono parsing everywhere.
    import datetime as _dt
    assert one(fn("timestamp")(F.lit("2020-01-01 00:00:00"))) == _dt.datetime(2020, 1, 1)
    assert one(fn("timestamp")(F.lit("00:00:00-2020/01/01"), "%H:%M:%S-%Y/%m/%d")) == _dt.datetime(2020, 1, 1)
    assert one(fn("unix_timestamp")(F.lit("2020-01-01 00:00:00"))) == 1577836800.0
    assert one(fn("to_unix_timestamp")(F.lit("00:00:00-2020/01/01"), "%H:%M:%S-%Y/%m/%d")) == 1577836800.0
    assert one(fn("unix_timestamp")(F.lit("00:00:00-2020/01/01"), "%H:%M:%S-%Y/%m/%d",
                               "Asia/Shanghai")) == 1577836800.0 - 8 * 3600


def test_datetime_regexp_golden_vectors(spark):
    """More reference unit-test vectors: datetime_functions.rs (add_months
    end-of-month clamp, add_days, from_utc_timestamp, make_timestamp with
    timezone) and regexp.rs (regexp_extract group defaults, extract_all)."""
    import datetime

    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    d = F.lit("2021-03-31").cast("date")
    # add_months clamps to month end (2021-03-31 + 1mo = 2021-04-30)
    assert one(fn("add_months")(d, 1)) == datetime.date(2021, 4, 30)
    assert one(fn("date_add")(d, 1)) == datetime.date(2021, 4, 1)
    # from_utc_timestamp: UTC instant rendered as Asia/Shanghai wall time
    ts = F.lit("2022-03-04 05:00:00").cast("timestamp")
    shifted = one(fn("from_utc_timestamp")(ts, "Asia/Shanghai"))
    assert shifted == datetime.datetime(2022, 3, 4, 13, 0, 0)
    # make_timestamp with timezone: 13:00 Shanghai = 05:00 UTC
    mk = one(fn("make_timestamp")(F.lit(2021), F.lit(3), F.lit(31), F.lit(13),
                                  F.lit(0), F.lit(0), F.lit("Asia/Shanghai")))
    assert mk == datetime.datetime(2021, 3, 31, 5, 0, 0)
    # regexp.rs vectors: group default/0/1, miss → empty string; extract_all
    s = F.lit("hello world")
    assert one(fn("regexp_extract")(s, "^(hello)", 1)) == "hello"
    assert one(fn("regexp_extract")(s, "^(hello)", 0)) == "hello"
    assert one(fn("regexp_extract")(s, "^(world)", 1)) == ""
    assert one(fn("regexp_extract_all")(s, F.lit("^(hello)"), 1)) == ["hello"]
    assert one(fn("regexp_extract_all")(s, F.lit("^(world)"), 1)) == []
    assert one(fn("regexp_replace")(s, "o", "0")) == "hell0 w0rld"


def test_where_take_golden_exact(spark):
    """where_transformation.rs:61-90 (where a > 20 keeps rows 20-exclusive)
    and take_transformation.rs:57-80 (take 3 of a 7-row set).  `take` has no
    deterministic order in either engine; assert the count and that rows come
    from the input set."""
    p = parse_pipelines("t(a as int, b as array)\n| where a > 20\n;")["t"]
    data = [(10, ["1"]), (10, []), (20, []), (20, ["400"]), (30, ["600"]), (40, ["800"])]
    out = p.run(spark, [{"a": a, "b": b} for a, b in data])
    assert sorted(r.a for r in out.collect()) == [30, 40]

    p2 = parse_pipelines("t(a as int, b as array)\n| take 3\n;")["t"]
    out2 = p2.run(spark, [{"a": a, "b": b} for a, b in data]).collect()
    assert len(out2) == 3
    assert all(r.a in {10, 20, 30, 40} for r in out2)


def test_datetime_string_comparison(spark):
    """comparison_op.rs / value.rs:301-338: DateTime↔String comparison parses
    the string — Spark's implicit cast gives the same observable result."""
    p = parse_pipelines("t(ts as datetime)\n| where ts > \"2024-01-01 12:00:00\"\n;")["t"]
    import datetime

    rows = [{"ts": datetime.datetime(2024, 1, 1, 11)},
            {"ts": datetime.datetime(2024, 1, 1, 13)}]
    got = p.run(spark, rows).collect()
    assert len(got) == 1 and got[0].ts.hour == 13


def test_array_and_typeconv_golden_vectors(spark):
    """array_functions.rs + type_conv.rs unit-test vectors: array_distinct
    retains null; array_contains is an equality scan (null probe → false,
    missing probe in a null-carrying array → false — Spark's SQL semantics
    say null for both, so the registry wraps it); int() truncates toward
    zero like Rust `as` (type_conv.rs test: int(1.2) = 1)."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    arr = F.array(F.lit(1), F.lit(2), F.lit(3))
    arr_n = F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(None).cast("int"))
    assert one(fn("array_distinct")(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(2)))) == [1, 2, 3]
    assert one(fn("array_distinct")(arr_n)) == [1, 2, 3, None]
    assert one(fn("array_contains")(arr, F.lit(2))) is True
    assert one(fn("array_contains")(arr, F.lit(4))) is False
    assert one(fn("array_contains")(arr, F.lit(None).cast("int"))) is False
    assert one(fn("array_contains")(arr_n, F.lit(4))) is False
    assert one(fn("array_contains")(F.lit(None).cast("array<int>"), F.lit(4))) is None
    assert one(fn("array_except")(arr, F.array(F.lit(2), F.lit(3)))) == [1]
    assert one(fn("array_intersect")(arr, F.array(F.lit(2), F.lit(3)))) == [2, 3]
    assert one(fn("int")(F.lit(1.2))) == 1
    assert one(fn("int")(F.lit(-1.7))) == -1  # truncation toward zero, not floor
    assert one(fn("bigint")(F.lit("42"))) == 42


def test_to_json_golden_vectors(spark):
    """to_json.rs:16-25: to_json serializes ANY value via serde to_string —
    scalars included (Spark's native to_json rejects them)."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    assert one(fn("to_json")(F.lit(5))) == "5"
    assert one(fn("to_json")(F.lit(1.5))) == "1.5"
    assert one(fn("to_json")(F.lit(True))) == "true"
    assert one(fn("to_json")(F.lit("a"))) == '"a"'
    assert one(fn("to_json")(F.lit('say "hi" {ok}'))) == '"say \\"hi\\" {ok}"'
    assert one(fn("to_json")(F.lit(None).cast("int"))) == "null"
    assert one(fn("to_json")(F.array(F.lit(1), F.lit(2)))) == "[1,2]"
    assert one(fn("to_json")(F.struct(F.lit(1).alias("a")))) == '{"a":1}'
    # dynamic values through the DSL: the carrier IS the serialization
    p = parse_pipelines('t(d)\n| project j = to_json(d)\n;')["t"]
    got = {r.j for r in p.run(spark, [{"d": {"a": 1}}, {"d": "x"}, {"d": 7}]).collect()}
    assert got == {'{"a":1}', '"x"', "7"}


def test_string_misc_edge_golden_vectors(spark):
    """Edge vectors from string_functions.rs / misc_functions.rs /
    array_functions.rs where Spark's defaults diverge: split_part OOR →
    null (not ''), translate length-mismatch → null (not char deletion),
    ascii('') → null (not 0), array_position miss → null (not 0)."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    sp = fn("split_part")
    assert one(sp(F.lit("a_b_c"), "_", 2)) == "b"
    assert one(sp(F.lit("a_b_c"), "_", 3)) == "c"
    assert one(sp(F.lit("a_b_c"), "_", 0)) is None   # part 0 is an error
    assert one(sp(F.lit("a_b_c"), "_", 4)) is None   # out of range
    assert one(fn("translate")(F.lit("abcba"), "ab", "xy")) == "xycyx"
    assert one(fn("translate")(F.lit("abc"), "ab", "x")) is None  # len mismatch
    assert one(fn("ascii")(F.lit("a"))) == 97
    assert one(fn("ascii")(F.lit(""))) is None
    arr = F.array(F.lit(1), F.lit(2))
    assert one(fn("array_position")(arr, F.lit(2))) == 2
    assert one(fn("array_position")(arr, F.lit(9))) is None


def test_regexp_defaults_golden_vectors(spark):
    """regexp.rs registration quirks: regexp_extract's group index is
    optional (default 1); regexp_extract_all is binary and returns WHOLE
    matches (group 0) — Spark's default would be group 1."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    s = F.lit("ab12cd34")
    assert one(fn("regexp_extract")(s, r"([a-z]+)(\d+)")) == "ab"       # default group 1
    assert one(fn("regexp_extract")(s, r"([a-z]+)(\d+)", 2)) == "12"
    assert one(fn("regexp_extract_all")(s, F.lit(r"[a-z]+\d+"))) == ["ab12", "cd34"]  # whole matches
    assert one(fn("regexp_extract_all")(s, F.lit(r"([a-z]+)(\d+)"))) == ["ab12", "cd34"]


def test_registry_quirk_golden_vectors_mod_rs(spark):
    """Registration-level quirks from mod.rs: log(x, base) has the VALUE
    first (rust f64::log — Spark's log takes base first); dayofweek maps
    Sunday to 0 ((w+2)%8 bug, mod.rs:148); date_from_unix_date counts days
    from the Common Era (mod.rs:141), not the 1970 epoch; date() converts
    to the DateTime type, keeping the time (mod.rs:138)."""
    import datetime

    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    assert one(fn("log")(F.lit(8.0), F.lit(2.0))) == 3.0     # log(x, base)
    assert abs(one(fn("log")(F.lit(100.0), F.lit(10.0))) - 2.0) < 1e-12
    d_sun = F.lit("2024-01-07").cast("date")  # a Sunday
    d_mon = F.lit("2024-01-08").cast("date")
    d_sat = F.lit("2024-01-06").cast("date")
    assert one(fn("dayofweek")(d_sun)) == 0
    assert one(fn("dayofweek")(d_mon)) == 2
    assert one(fn("dayofweek")(d_sat)) == 7
    assert one(fn("date_from_unix_date")(F.lit(1))) == datetime.date(1, 1, 1)
    # python's toordinal() uses the same day-1 = 0001-01-01 convention as
    # chrono's from_num_days_from_ce — ground truth for the vector
    target = datetime.date(2024, 1, 30)
    assert one(fn("date_from_unix_date")(F.lit(target.toordinal()))) == target
    assert one(fn("date")(F.lit("2024-01-01 10:30:00"))) == datetime.datetime(2024, 1, 1, 10, 30)


def test_case_function_null_condition_errors(spark):
    """case.rs:46-50: a NULL condition is an error (→ null under
    error-as-value), NOT false — even when a later condition would match."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    nul = F.lit(None).cast("boolean")
    assert one(fn("case")(nul, F.lit(1), F.lit(2))) is None        # null cond → error, not default
    assert one(fn("case")(nul, F.lit(1), F.lit(True), F.lit(9), F.lit(2))) is None
    assert one(fn("case")(F.lit(False), F.lit(1), F.lit(True), F.lit(9))) == 9
    assert one(fn("case")(F.lit(False), F.lit(1), F.lit(2))) == 2  # default
    assert one(fn("case")(F.lit(False), F.lit(1))) is None         # no match, no default


def test_conv_lowercase_digits(spark):
    """conv matches the reference's lowercase digit alphabet
    (misc_functions.rs:245 b'a' + r - 10); its digit-REVERSAL bug is
    deliberately not replicated (PARITY_DELTAS.md)."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    assert one(fn("conv")(F.lit("255"), 10, 16)) == "ff"
    assert one(fn("conv")(F.lit("30"), 10, 16)) == "1e"   # correct order, not 'e1'
    assert one(fn("conv")(F.lit("z"), 36, 10)) == "35"


def test_array_set_ops_keep_duplicates(spark):
    """array_functions.rs: except/intersect are FILTERS that keep the left
    side's duplicates and order (Spark's versions dedup); union is the left
    array verbatim plus unseen right elements; arrays_zip pairs as 2-element
    arrays TRUNCATED to the shorter input (Spark pads structs)."""
    from feathr_online_spark.functions.registry import fn

    def one(expr):
        return spark.range(1).select(expr.alias("v")).collect()[0].v

    a = F.array(F.lit(1), F.lit(1), F.lit(2), F.lit(3))
    b = F.array(F.lit(2), F.lit(4), F.lit(4))
    assert one(fn("array_except")(a, b)) == [1, 1, 3]
    assert one(fn("array_intersect")(a, b)) == [2]
    assert one(fn("array_intersect")(F.array(F.lit(2), F.lit(2)), b)) == [2, 2]
    assert one(fn("array_union")(a, b)) == [1, 1, 2, 3, 4]
    assert one(fn("arrays_zip")(a, b)) == [[1, 2], [1, 4], [2, 4]]  # min length


def test_len_apply_time_dispatch_through_project(spark):
    """len/length dispatch on the operand type like the reference
    (len.rs:14-31): string → char count, array → element count.  The bare
    registry builder can't see types, so Pipeline.project supplies the
    dispatch at apply time from df.schema (VERDICT r3 #3)."""
    from feathr_online_spark.functions.registry import fn
    from feathr_online_spark.operators.pipeline import Pipeline

    df = spark.createDataFrame([("hello", ["a", "b", "c"], None)],
                               "s string, arr array<string>, narr array<int>")
    out = Pipeline(df).project(
        ls=fn("len")(F.col("s")),
        la=fn("length")(F.col("arr")),
        ln=fn("len")(F.col("narr")),   # null array → null count
    ).df
    r = out.collect()[0]
    assert (r.ls, r.la, r.ln) == (5, 3, None)


def test_len_bare_builder_raises_on_array(spark):
    """Outside a schema-aware path, fn('len') on an array operand must be a
    LOUD analyzer error — never a silent cast to string-length."""
    from pyspark.errors import AnalysisException

    from feathr_online_spark.functions.registry import fn

    df = spark.createDataFrame([(["a", "b"],)], "arr array<string>")
    with pytest.raises(AnalysisException):
        df.select(fn("len")(F.col("arr"))).collect()
