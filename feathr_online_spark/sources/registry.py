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
            if ext == "csv":
                options.setdefault("header", "true")
                options.setdefault("inferSchema", "true")
        reader = self.spark.read.options(**options)
        self.register(name, reader.format(fmt).load(path), key)

    def register_jdbc(self, name: str, url: str, table: str, key: str, **options) -> None:
        """SQL Server / SQLite / any JDBC source (lookup/mssql, lookup/sqlite)."""
        df = self.spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()
        self.register(name, df, key)

    def get(self, name: str) -> DataFrame:
        if name not in self._sources:
            raise KeyError(f"unknown lookup source '{name}'")
        return self._sources[name]

    def key_of(self, name: str) -> str:
        return self._keys[name]
