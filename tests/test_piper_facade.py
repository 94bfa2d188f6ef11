"""Piper facade — the reference's Python embedding API shape
(python/src/lib.rs:399-527), exercised with the reference's own example
scripts (python/examples/udf_example.py, lookup_example.py,
fastapi_example.py)."""

import asyncio

import pytest

from feathr_online_spark.piper import Piper


def test_udf_example_shape(spark):
    """fastapi_example.py / udf_example.py: plain per-value UDFs, (ret,
    errors) tuple, failed cells null + error-as-value."""
    p = Piper(
        "t(x as int)\n| project y=inc(x), z=dec(x)\n;",
        {},
        {"inc": (lambda x: x + 42, "long"), "dec": (lambda x: x - 42, "long")},
        spark=spark,
    )
    try:
        rows, errors = p.process("t", {"x": 1})
        assert errors == []
        assert rows == [{"x": 1, "y": 43, "z": -41}]
        rows, errors = p.process("t", [{"x": 1}, {"x": 57}])
        assert {r["x"]: r["y"] for r in rows} == {1: 43, 57: 99}
        # a raising UDF nulls the cell instead of failing the job
        p2 = Piper(
            "t(x as int)\n| project y=boom(x)\n;",
            {},
            {"boom": (lambda x: 1 // (x - 1), "long")},
            spark=spark,
        )
        rows, _ = p2.process("t", [{"x": 1}, {"x": 3}])
        got = {r["x"]: r["y"] for r in rows}
        assert got == {1: None, 3: 0}
        p2.close()
    finally:
        p.close()


def test_lookup_example_shape(spark):
    """lookup_example.py: an ASYNC callable as the lookup map value; served
    field names harvested from the pipeline's own lookup verb.  Typed fields
    come from `as type` (schema-first engine — documented delta)."""
    FAKE = {1: ("John", 30), 2: ("Jane", 58), 4: ("Jill", 22)}

    async def lookup_source(key, fields):
        await asyncio.sleep(0)
        if int(key) not in FAKE:
            return []
        name, age = FAKE[int(key)]
        vals = {"name": name, "age": age}
        return [[vals[f] for f in fields]]

    p = Piper(
        "t(x as int)\n| lookup name, age as int from fake_src on x\n;",
        {"fake_src": lookup_source},
        spark=spark,
    )
    rows, errors = p.process("t", {"x": 1})
    assert errors == [] and rows == [{"x": 1, "name": "John", "age": 30}]
    rows, _ = p.process("t", {"x": 4})
    assert rows == [{"x": 4, "name": "Jill", "age": 22}]
    rows, _ = p.process("t", {"x": 9})     # miss → null-fill
    assert rows == [{"x": 9, "name": None, "age": None}]

    # the async face (fastapi_example.py)
    rows, errors = asyncio.run(p.process_async("t", {"x": 2}))
    assert errors == [] and rows[0]["name"] == "Jane"


def test_lookup_conf_path(spark):
    """A lookup.json path as the `lookups` argument: the reference's own
    conf + sqlite test.db serve the pipeline."""
    p = Piper(
        "jt(id as int)\n| join kind=left-inner name, age as int from join_test on id\n;",
        "/root/reference/conf/lookup.json",
        spark=spark,
    )
    rows, errors = p.process("jt", [{"id": 2}])
    assert errors == []
    assert sorted((r["name"], r["age"]) for r in rows) == [("Jill", 33), ("Jose", 34)]


def test_pyspark_example_without_the_matryoshka(spark):
    """The reference's pyspark_example.py wraps Piper.process inside a
    per-row pyspark UDF ('pretty much like Matryoshka doll') — one GIL
    round-trip per row.  Here the SAME pipeline applies to the whole
    DataFrame as one Catalyst plan: Piper.pipelines[name].apply(df)."""
    p = Piper(
        "test_udf(x as string)\n| project y=convertCase(x)\n;",
        functions={"convertCase": (
            lambda s: " ".join(w[:1].upper() + w[1:] for w in s.split(" ")) + " ",
            "string",
        )},
        spark=spark,
    )
    try:
        df = spark.createDataFrame(
            [("1", "john jones"), ("2", "tracey smith"), ("3", "amy sanders")],
            ["Seqno", "x"],
        )
        out = p.pipelines["test_udf"].apply(df, p.sources)
        got = {r.Seqno: r.y for r in out.collect()}
        assert got == {"1": "John Jones ", "2": "Tracey Smith ", "3": "Amy Sanders "}
    finally:
        p.close()


def test_udf_shadowing_restores_builtin(spark):
    """A user UDF may shadow a built-in for the Piper's lifetime; close()
    must RESTORE the built-in, not delete it from the process registry."""
    from feathr_online_spark.functions.registry import fn

    p = Piper(
        "t(x as int)\n| project y = round(x)\n;",
        functions={"round": (lambda x: 99, "long")},
        spark=spark,
    )
    rows, _ = p.process("t", {"x": 3})
    assert rows[0]["y"] == 99          # shadowed
    p.close()
    assert fn("round") is not None     # built-in restored
    p2 = Piper("t(x as double)\n| project y = round(x)\n;", spark=spark)
    rows, _ = p2.process("t", {"x": 3.4})
    assert rows[0]["y"] == 3.0         # built-in semantics back


def test_dynamic_outputs_decode_to_python_values(spark):
    """process() returns runtime-typed python values for untyped (dynamic)
    columns — the reference's rows are Values, not JSON text."""
    p = Piper("t(x)\n| project d = x * 2\n;", spark=spark)
    rows, _ = p.process("t", [{"x": 21}, {"x": 2.5}])
    got = sorted(r["x"] for r in rows)
    assert got == [2.5, 21]                 # inputs decode back (21, not "21")
    assert {r["d"] for r in rows} == {42.0, 5.0}
    p2 = Piper("t(obj)\n| project name = obj.name, whole = obj\n;", spark=spark)
    rows, _ = p2.process("t", {"obj": {"name": "bob", "n": 2}})
    assert rows[0]["whole"] == {"name": "bob", "n": 2}   # object decodes to dict
    assert rows[0]["name"] == "bob"

def test_dynamic_aggregate_propagates_through_top_and_process(spark):
    """A dynamic min/max aggregate stays runtime-typed downstream (ADVICE r3):
    `top by mx` must order 10 above 9 (numeric, not carrier-text '9' > '10'),
    and process() must decode the aggregate back to a python number."""
    src = ("t(g as string, x)\n"
           "| summarize mx = max(x) by g\n"
           "| top 2 by mx\n"
           ";")
    p = Piper(src, spark=spark)
    rows, errors = p.process(
        "t",
        [{"g": "a", "x": 9}, {"g": "b", "x": 10}, {"g": "c", "x": 2}],
    )
    assert not any(errors)
    # lexical carrier ordering would rank '9' > '10' and keep ('a', '9');
    # runtime-typed ordering keeps 10 and 9 — as numbers, not text
    assert [(r["g"], r["mx"]) for r in rows] == [("b", 10), ("a", 9)]


def test_process_input_bound_raises_with_guidance(spark):
    """process() collects to the driver, so its input is bounded (VERDICT r3
    #5): above the bound it raises, naming CompiledPipeline.apply for batch —
    and under the bound the facade still works."""
    p = Piper("t(x as long)\n| project y = x + 1\n;", spark=spark,
              max_process_rows=10)
    with pytest.raises(ValueError, match="CompiledPipeline.apply"):
        p.process("t", [{"x": i} for i in range(11)])
    rows, _ = p.process("t", [{"x": i} for i in range(10)])
    assert sorted(r["y"] for r in rows) == list(range(1, 11))
