"""Full-JsonPath get_json_array / get_json_object parity
(reference extract_json.rs:6-80 + its test vectors)."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.functions import jsonpath as JP
from feathr_online_spark.functions.registry import fn


def sel(doc, path):
    return JP.select(doc, JP.parse_path(path))


# -- pure evaluator -----------------------------------------------------------

def test_reference_vectors():
    # extract_json.rs test_extract_json_array: $.* over flat object
    assert sel({"a": 1, "b": 2, "c": 3}, "$.*") == [1, 2, 3]
    # extract_json.rs test_extract_json_object: $.a first match
    assert sel({"a": {"b": [1, 2]}}, "$.a") == [{"b": [1, 2]}]


def test_path_shapes():
    doc = {"store": {"book": [{"t": "a", "p": 1}, {"t": "b", "p": 2}, {"t": "c"}],
                     "bike": {"p": 3}}}
    assert sel(doc, "$.store.book[*].t") == ["a", "b", "c"]
    assert sel(doc, "$.store.book[0].t") == ["a"]
    assert sel(doc, "$.store.book[-1].t") == ["c"]
    assert sel(doc, "$.store.book[0:2].p") == [1, 2]
    assert sel(doc, "$.store.book[0,2].t") == ["a", "c"]
    assert sel(doc, "$..p") == [1, 2, 3]                 # recursive descent
    assert sel(doc, "$['store']['bike'].p") == [3]
    assert sel(doc, "$.store.*") == [doc["store"]["book"], doc["store"]["bike"]]
    assert sel(doc, "$.missing") == []


def test_parse_errors():
    with pytest.raises(ValueError):
        JP.parse_path(".....")
    with pytest.raises(ValueError):
        JP.parse_path("$.a[bad]")


def test_spark_native_detection():
    assert JP.spark_native_path("$.a.b")
    assert JP.spark_native_path("$[0].x")
    assert not JP.spark_native_path("$..b")
    assert not JP.spark_native_path("$.a[0:2]")
    assert not JP.spark_native_path("$.a[1,2]")


# -- Spark bindings -----------------------------------------------------------

def test_get_json_array_spark(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": 2, "c": 3}',),
         ('{"items": [{"name": "x"}, {"name": "y"}]}',),
         ('not json',),
         (None,)],
        "j string",
    )
    out = df.select(
        fn("get_json_array")(F.col("j"), "$.*").alias("all_vals"),
        fn("get_json_array")(F.col("j"), "$.items[*].name").alias("names"),
    ).collect()
    assert out[0].all_vals == ["1", "2", "3"]
    assert out[1].names == ["x", "y"]
    assert out[2].all_vals is None          # invalid JSON → error-as-null
    assert out[3].all_vals is None


def test_get_json_object_fallback_spark(spark):
    df = spark.createDataFrame(
        [('{"a": {"deep": {"p": 42}}, "b": {"p": 7}}',)], "j string"
    )
    out = df.select(
        fn("get_json_object")(F.col("j"), "$..p").alias("first_p"),   # full path → UDF
        fn("get_json_object")(F.col("j"), "$.b.p").alias("native_p"), # subset → JVM
    ).collect()[0]
    assert out.first_p == "42"
    assert out.native_p == "7"


# -- hypothesis property tests (pure Python — no Spark per example) -----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _scalar = st.one_of(st.integers(-100, 100), st.text(max_size=5), st.booleans())
    _doc = st.recursive(
        _scalar,
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(st.from_regex(r"[a-z]{1,3}", fullmatch=True), inner, max_size=4),
        ),
        max_leaves=12,
    )

    @given(_doc, st.from_regex(r"[a-z]{1,3}", fullmatch=True))
    @settings(max_examples=100, deadline=None)
    def test_field_access_matches_direct(doc, key):
        """$.key == the dict's value exactly when present (field step)."""
        got = sel(doc, f"$.{key}")
        if isinstance(doc, dict) and key in doc:
            assert got == [doc[key]]
        else:
            assert got == []

    @given(_doc, st.from_regex(r"[a-z]{1,3}", fullmatch=True))
    @settings(max_examples=100, deadline=None)
    def test_recursive_descent_superset_of_field(doc, key):
        """$..key finds at least everything $.key finds, and exactly the
        number of dicts (at any depth) carrying the key."""
        direct = sel(doc, f"$.{key}")
        rec = sel(doc, f"$..{key}")
        for v in direct:
            assert v in rec

        def count(o):
            n = 0
            if isinstance(o, dict):
                n += 1 if key in o else 0
                n += sum(count(v) for v in o.values())
            elif isinstance(o, list):
                n += sum(count(v) for v in o)
            return n

        assert len(rec) == count(doc)

    @given(st.lists(_scalar, max_size=6))
    @settings(max_examples=100, deadline=None)
    def test_index_and_slice_match_python(arr):
        """[n] and [a:b] follow python list semantics; [*] is identity."""
        assert sel(arr, "$[*]") == list(arr)
        for i in range(-len(arr) - 1, len(arr) + 1):
            want = [arr[i]] if -len(arr) <= i < len(arr) else []
            assert sel(arr, f"$[{i}]") == want
        assert sel(arr, "$[1:3]") == arr[1:3]

except ImportError:  # pragma: no cover - hypothesis is baked into this env
    pass


def test_get_json_object_wildcard_first_match(spark):
    """Wildcard paths must return the FIRST match (extract_json.rs), not
    Spark's all-matches JSON array."""
    df = spark.createDataFrame([('{"a": [{"b": 1}, {"b": 2}]}',)], "j string")
    out = df.select(fn("get_json_object")(F.col("j"), "$.a[*].b").alias("v")).collect()[0]
    assert out.v == "1"


def test_get_json_array_object_elements_consistent(spark):
    """ADVICE r2 (medium): $.a (native fast path) and $['a'] (evaluator)
    must agree, including arrays of OBJECTS — the old from_json coercion
    nulled non-scalar elements."""
    df = spark.createDataFrame(
        [('{"items": [{"a": 1}, {"b": "x"}], "scalars": ["x", "y"], '
          '"one": 5, "empty": [], "mixed": [1, "s", null, [2]]}',)],
        "j string",
    )
    out = df.select(
        fn("get_json_array")(F.col("j"), "$.items").alias("objs_native"),
        fn("get_json_array")(F.col("j"), "$['items']").alias("objs_eval"),
        fn("get_json_array")(F.col("j"), "$.scalars").alias("scal_native"),
        fn("get_json_array")(F.col("j"), "$['scalars']").alias("scal_eval"),
        fn("get_json_array")(F.col("j"), "$.one").alias("one_native"),
        fn("get_json_array")(F.col("j"), "$['one']").alias("one_eval"),
        fn("get_json_array")(F.col("j"), "$.empty").alias("empty_native"),
        fn("get_json_array")(F.col("j"), "$['empty']").alias("empty_eval"),
        fn("get_json_array")(F.col("j"), "$.missing").alias("miss_native"),
        fn("get_json_array")(F.col("j"), "$['missing']").alias("miss_eval"),
        fn("get_json_array")(F.col("j"), "$.mixed").alias("mixed_native"),
        fn("get_json_array")(F.col("j"), "$['mixed']").alias("mixed_eval"),
    ).collect()[0]
    assert out.objs_native == out.objs_eval == ['{"a":1}', '{"b":"x"}']
    assert out.scal_native == out.scal_eval == ["x", "y"]
    assert out.one_native == out.one_eval == ["5"]
    assert out.empty_native == out.empty_eval == []
    assert out.miss_native == out.miss_eval == []
    # a JSON-null element is SQL NULL (Value::Null), not the text 'null'
    assert out.mixed_native == out.mixed_eval == ["1", "s", None, "[2]"]


def test_get_json_array_lossy_text_edges(spark):
    """Round-3 review findings: a STRING value that looks like a JSON array
    must stay ONE string element (Spark's native get_json_object text output
    cannot distinguish it — which is why there is no native fast path);
    JSON-null matches are [null]; a 'null' document selects nothing."""
    df = spark.createDataFrame(
        [('{"a": "[1,2]", "b": null}',), ("null",)], "j string"
    )
    out = df.select(
        fn("get_json_array")(F.col("j"), "$.a").alias("str_arr"),
        fn("get_json_array")(F.col("j"), "$.b").alias("null_match"),
        fn("get_json_object")(F.col("j"), "$.b").alias("null_obj"),
    ).collect()
    assert out[0].str_arr == ["[1,2]"]       # string stays a string
    assert out[0].null_match == [None]       # Value::Null element
    assert out[0].null_obj is None
    assert out[1].str_arr == []              # 'null' doc: no field matches
