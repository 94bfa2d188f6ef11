"""Lookup-source registry: the reference's connector surface re-expressed as
DataFrames.

The reference loads every lookup source wholesale into an in-memory BTreeMap
(CSV/Parquet/JSON/NDJSON via polars — piper/src/pipeline/lookup/local_store/
mod.rs:22-168; SQLite/MSSQL via per-key queries).  The Spark-native equivalent
is simply a *DataFrame registered under a name*: file formats map to
``spark.read.<fmt>``, databases to ``spark.read.jdbc``, and the `lookup`/`join`
verbs consume them as (usually broadcast) join sides — Catalyst then owns the
physical strategy instead of per-key point reads.

Out-of-scope connectors (Redis feathr-online store, HTTP JSON API, CosmosDB —
SURVEY.md §2.5) raise cleanly; they are request/response-serving concerns with
no batch analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class CallableSource:
    """User-function lookup source — the batch analog of the reference's
    Python lookup callables (python/src/lib.rs:56-158,
    python/examples/lookup_example.py:12-36): ``fn(key, fields)`` returns a
    list of rows, each a list aligned with ``fields``.

    The reference calls the function per request key; the batch engine calls
    it per DISTINCT probe key inside ``mapInPandas`` — Arrow-batched transfer,
    one Python round-trip per partition, never per input row.  Async
    callables (the reference mandates coroutines) are gathered concurrently
    per batch under a bounded semaphore (``max_concurrency``, default 64),
    preserving the reference's overlapping-I/O behaviour for slow remote
    lookups without stampeding a backend with tens of thousands of
    simultaneous requests when a partition holds many keys.

    ``fields_schema`` is a DDL string for the served columns, e.g.
    ``"name string, age long"``; the key column's type is adopted from the
    probe side at materialize time.
    """

    def __init__(self, fn, key: str, fields_schema: str, max_concurrency: int = 64):
        self.fn = fn
        self.key = key
        self.fields_schema = fields_schema
        self.max_concurrency = max_concurrency
        from pyspark.sql.types import StructType

        self._fields_struct = StructType.fromDDL(fields_schema)

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self._fields_struct.fields]

    def materialize(self, keys_df: DataFrame) -> DataFrame:
        """Evaluate the callable for every (distinct) key row in ``keys_df``
        (single column named ``self.key``) → DataFrame(key, *fields)."""
        import asyncio
        import inspect

        fn = self.fn
        key = self.key
        names = self.field_names
        out_schema = (
            f"{key} {keys_df.schema[0].dataType.simpleString()}, {self.fields_schema}"
        )
        is_async = inspect.iscoroutinefunction(fn)
        max_conc = self.max_concurrency

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                keys = list(pdf[key])
                if is_async:
                    async def _all():
                        sem = asyncio.Semaphore(max_conc)

                        async def one(k):
                            async with sem:
                                return await fn(k, names)

                        return await asyncio.gather(*(one(k) for k in keys))

                    results = asyncio.run(_all())
                else:
                    results = [fn(k, names) for k in keys]
                rows = []
                for k, res in zip(keys, results):
                    for row in res or []:
                        rows.append([k, *row])
                yield pd.DataFrame(rows, columns=[key] + names)

        return keys_df.mapInPandas(gen, out_schema)


class SourceRegistry:
    """Name → DataFrame map mirroring the reference's lookup config
    (conf/lookup.json): each entry has a key column and the fields it serves."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sources: dict[str, DataFrame] = {}
        self._keys: dict[str, str] = {}

    def register(self, name: str, df: DataFrame, key: str) -> None:
        self._sources[name] = df
        self._keys[name] = key

    def register_file(self, name: str, path: str, key: str, fmt: str | None = None, **options) -> None:
        """CSV / Parquet / JSON / NDJSON sources (local_store/mod.rs:22-29
        format dispatch).  Spark's json reader handles both JSON-lines and
        (with multiLine) array-of-objects, covering the reference's json+ndjson
        pair."""
        if fmt is None:
            parts = path.lower().split(".")
            # compression suffixes are transparent to Spark's readers —
            # nyc_online.csv.gz is a csv (reference local_store reads it so)
            while parts and parts[-1] in ("gz", "bz2", "zst", "snappy", "deflate"):
                parts.pop()
            ext = parts[-1] if parts else ""
            fmt = {"csv": "csv", "parquet": "parquet", "json": "json", "ndjson": "json"}.get(ext)
            if fmt is None:
                raise ValueError(f"cannot infer format from '{path}'")
        if fmt == "csv":
            # apply whether fmt was inferred OR passed explicitly — a
            # headerless read yields _c0.._cN and the key column vanishes
            options.setdefault("header", "true")
            options.setdefault("inferSchema", "true")
        reader = self.spark.read.options(**options)
        self.register(name, reader.format(fmt).load(path), key)

    def register_jdbc(self, name: str, url: str, table: str, key: str, **options) -> None:
        """SQL Server / SQLite / any JDBC source (lookup/mssql, lookup/sqlite)."""
        df = self.spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()
        self.register(name, df, key)

    def register_callable(self, name: str, fn, key: str, fields_schema: str) -> None:
        """Python-callable lookup source (reference python/src/lib.rs:56-158):
        ``fn(key, fields) -> list[rows]``, sync or async.  Consumed by the
        lookup/join verbs like any other source; materialized lazily against
        the probe side's distinct keys."""
        self._sources[name] = CallableSource(fn, key, fields_schema)
        self._keys[name] = key

    def get(self, name: str) -> DataFrame:
        if name not in self._sources:
            raise KeyError(f"unknown lookup source '{name}'")
        return self._sources[name]

    def key_of(self, name: str) -> str:
        return self._keys[name]

    def as_dsl_sources(self) -> dict:
        """The registry in the shape CompiledPipeline.apply/run expects —
        ``{name: (DataFrame, key)}`` entries plus CallableSources verbatim —
        so a reference deployment runs with its own two config files::

            reg = SourceRegistry(spark)
            load_lookup_conf(reg, "conf/lookup.json")
            pipes = parse_pipelines(open("conf/pipeline.conf").read())
            out = pipes["nyc_taxi_demo"].run(spark, rows, reg.as_dsl_sources())
        """
        return {
            name: src if isinstance(src, CallableSource) else (src, self._keys[name])
            for name, src in self._sources.items()
        }


# ---------------------------------------------------------------------------
# Reference lookup.json loader
# ---------------------------------------------------------------------------

def _sqlite_callable(db_path: str, sql: str, cols: list[str], stringify: bool):
    """Per-key SQLite lookup served through CallableSource — the reference's
    sqlite class (per-key ``sqlTemplate`` with a ``:key`` parameter,
    piper/src/pipeline/lookup/) runs LIVE on python's stdlib sqlite3, no JDBC
    driver needed.  One connection per worker process, cached by pid."""
    conns: dict = {}

    def fn(key, fields):
        import os
        import sqlite3

        pid = os.getpid()
        con = conns.get(pid)
        if con is None:
            con = conns.setdefault(pid, sqlite3.connect(db_path))
        cur = con.execute(sql, {"key": key})
        by_name = [d[0] for d in cur.description]
        rows = []
        for r in cur.fetchall():
            m = dict(zip(by_name, r))
            vals = [m.get(c) for c in cols]
            if stringify:
                vals = [None if v is None else str(v) for v in vals]
            rows.append(vals)
        return rows

    return fn


def _result_path_callable(fetch, result_path: dict[str, str]):
    """Wrap a raw-JSON fetcher (``fetch(key) -> json text``, sync or async)
    so the conf's ``resultPath`` JsonPaths extract the served fields — the
    HttpJsonApiSource contract (reference lookup/http_json_api.rs): one
    response document per key, one JsonPath per output field."""
    import inspect

    from feathr_online_spark.functions import jsonpath as JP

    steps = {f: JP.parse_path(p) for f, p in result_path.items()}

    def extract(doc_text, fields):
        import json as _json

        try:
            doc = _json.loads(doc_text) if doc_text is not None else None
        except (ValueError, TypeError):
            doc = None
        if doc is None:
            return []
        row = []
        for f in fields:
            hits = JP.select(doc, steps[f])
            v = hits[0] if hits else None
            row.append(None if v is None else (v if isinstance(v, str) else _json.dumps(v)))
        return [row]

    if inspect.iscoroutinefunction(fetch):
        async def fn(key, fields):
            return extract(await fetch(key), fields)
    else:
        def fn(key, fields):
            return extract(fetch(key), fields)

    return fn


def load_lookup_conf(
    registry: SourceRegistry,
    path: str,
    base_dir: str | None = None,
    callables: dict | None = None,
    json_callables: dict | None = None,
    field_types: dict[str, str] | None = None,
    env: dict | None = None,
) -> dict:
    """Load the reference's ``conf/lookup.json`` (piper -c accepts exactly
    this file) into a SourceRegistry.  Returns
    ``{"registered": {name: class}, "skipped": {name: reason}}`` — loading is
    best-effort per source, like the reference's own startup.

    - ``local`` → register_file (csv[.gz]/parquet/json by extension),
      relative paths resolved against ``base_dir`` (default: the conf file's
      parent directory's parent, matching the reference repo layout).
    - ``sqlite`` → LIVE per-key lookups through python's stdlib sqlite3
      wrapped in a CallableSource (no JDBC driver needed); field types
      default to strings unless ``field_types[name]`` gives a DDL string.
    - ``mssql`` → register_jdbc when the interpolated connectionString is a
      ``jdbc:`` URL; ADO-style strings are skipped with instructions.
    - Redis / Cosmos / HTTP classes are request-serving backends with no
      batch analog: they register ONLY when the caller injects a fetch
      function — ``callables={name: fn}`` for a row-returning
      ``fn(key, fields)``, or ``json_callables={name: fetch}`` for a raw
      ``fetch(key) -> json text`` whose fields are then extracted with the
      conf's OWN resultPath JsonPaths (the HttpJsonApiSource contract) —
      otherwise they are skipped with the reason recorded.
    - ``${VAR}`` values interpolate from ``env`` (default os.environ);
      a missing variable skips that source.
    """
    import json
    import os
    import re

    env = dict(os.environ) if env is None else env
    callables = callables or {}
    json_callables = json_callables or {}
    field_types = field_types or {}
    base = base_dir or os.path.dirname(os.path.dirname(os.path.abspath(path)))

    class _MissingEnv(KeyError):
        pass

    def interp(v):
        if isinstance(v, str):
            def sub(m):
                name = m.group(1)
                if name not in env:
                    raise _MissingEnv(name)
                return env[name]

            return re.sub(r"\$\{([^}]*)\}", sub, v)
        if isinstance(v, dict):
            return {k: interp(x) for k, x in v.items()}
        if isinstance(v, list):
            return [interp(x) for x in v]
        return v

    with open(path) as f:
        conf = json.load(f)

    registered: dict[str, str] = {}
    skipped: dict[str, str] = {}
    for raw in conf.get("sources", []):
        name = raw.get("name", "<unnamed>")
        cls = raw.get("class", "")
        try:
            src = interp(raw)
        except _MissingEnv as e:
            if name in callables or name in json_callables:
                # an injected fetcher replaces the backend connection — the
                # conf's ${VARS} (api keys, hosts) are irrelevant to it; only
                # resultPath/availableFields matter and those are static
                src = raw
            else:
                skipped[name] = f"missing environment variable {e.args[0]}"
                continue
        try:
            if cls == "local":
                p = src["path"]
                if not os.path.isabs(p):
                    p = os.path.join(base, p)
                if not os.path.exists(p):
                    skipped[name] = f"file not found: {p}"
                    continue
                registry.register_file(name, p, key=src["keyColumn"])
                if src.get("fields"):
                    df = registry.get(name)
                    registry.register(name, df.select(src["keyColumn"], *src["fields"]),
                                      src["keyColumn"])
            elif cls == "sqlite":
                db = src["dbPath"]
                if not os.path.isabs(db):
                    db = os.path.join(base, db)
                if not os.path.exists(db):
                    skipped[name] = f"sqlite db not found: {db}"
                    continue
                cols = src["availableFields"]
                ddl = field_types.get(name)
                stringify = ddl is None
                schema = ddl or ", ".join(f"{c} string" for c in cols)
                registry.register_callable(
                    name, _sqlite_callable(db, src["sqlTemplate"], cols, stringify),
                    key="key", fields_schema=schema,
                )
            elif cls == "mssql":
                conn = src["connectionString"]
                if conn.lower().startswith("jdbc:"):
                    registry.register_jdbc(name, conn, src.get("table", name), key="key")
                else:
                    skipped[name] = ("ADO connection strings are not JDBC URLs; "
                                     "call register_jdbc(name, 'jdbc:sqlserver://…', …) directly")
            elif name in callables or name in json_callables:
                fields = list((src.get("resultPath") or {}).keys()) or src.get("availableFields", [])
                schema = field_types.get(name) or ", ".join(f"{c} string" for c in fields)
                if name in callables:
                    fn = callables[name]
                else:
                    fn = _result_path_callable(json_callables[name], src.get("resultPath") or {})
                registry.register_callable(name, fn, key="key", fields_schema=schema)
            else:
                skipped[name] = (f"{cls} is a request-serving backend with no batch analog; "
                                 f"inject callables={{'{name}': fn}} to serve it from python")
                continue
            registered[name] = cls
        except Exception as e:  # best-effort per source, like the reference startup
            skipped[name] = f"{type(e).__name__}: {e}"
    return {"registered": registered, "skipped": skipped}
