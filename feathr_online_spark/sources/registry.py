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
            ext = path.rsplit(".", 1)[-1].lower()
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
