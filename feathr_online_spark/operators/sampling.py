"""Deterministic hash-based sampling & train/test splitting.

The reference has no sampling surface; a training-data pipeline at 100 TB
needs one, and the only shape that works at that scale is HASH sampling:
membership is a pure function of the row's key, so it is

- **shuffle-free**: a map-side filter over the scan — no exchange, no
  coordination, works identically on 1 or 1000 executors;
- **rerun-stable**: unlike ``df.sample()`` (rand() per task attempt), the
  same key lands on the same side across retries, re-ingests and engine
  versions — a crawler re-delivering a document cannot flip it from test
  into train;
- **entity-coherent**: keying the split on an entity id (user, document,
  domain) puts ALL of that entity's rows on one side — the split-level
  leakage guarantee (no user straddling train and eval), same spirit as the
  as-of join's temporal guarantee;
- **composable**: a ``salt`` string re-draws independently (sample #2 of the
  same corpus), and nested sampling (sample of a sample) multiplies
  fractions exactly.

Two hash flavours:

- ``kind="xxhash64"`` (default): Spark's native 64-bit hash — fastest, the
  production path;
- ``kind="md5"``: first 4 hex chars of md5 compared against a hex
  threshold.  ~3× slower but byte-identical in every engine that has md5
  (DuckDB, Trino, BigQuery, …) — the cross-engine-checkable path the
  driver gate uses, and the right choice when a split must be reproduced
  outside Spark.  Granularity: 1/65536 of fraction resolution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MD5_SPACE = 1 << 16  # 4 hex chars


def _key_str(on: Column | str, salt: str) -> Column:
    c = F.col(on) if isinstance(on, str) else on
    # a NULL key must still land deterministically on ONE side — without the
    # coalesce the md5 path's comparison is NULL and both filters of a split
    # silently DROP the row (sentinel: a string no cast-of-value produces)
    c = F.coalesce(c.cast("string"), F.lit("\x00__null_key__"))
    return F.concat(c, F.lit(salt)) if salt else c


def hash_in_fraction(on: Column | str, fraction: float, salt: str = "",
                     kind: str = "xxhash64") -> Column:
    """Boolean: the key falls in the first ``fraction`` of the hash space.
    Deterministic in the key (and salt) only — see module docstring.
    NULL keys hash as a sentinel, so they fall coherently on one side
    (never silently dropped)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    # exact edges: fraction*space truncation must not strand the top bucket
    # (format(65536, '04x') is 5 chars and the hex compare would keep ~6%)
    if fraction >= 1.0:
        return F.lit(True)
    if fraction <= 0.0:
        return F.lit(False)
    key = _key_str(on, salt)
    if kind == "xxhash64":
        # pmod maps the signed 64-bit hash into [0, 2^30) exactly (abs()
        # would overflow on Long.MIN_VALUE); 2^-30 fraction granularity
        bucket = F.pmod(F.xxhash64(key), F.lit(1 << 30))
        return bucket < F.lit(int(fraction * (1 << 30)))
    if kind == "md5":
        threshold = format(int(fraction * _MD5_SPACE), "04x")
        return F.substring(F.md5(F.encode(key, "UTF-8")), 1, 4) < F.lit(threshold)
    raise ValueError(f"unknown hash kind: {kind}")


def hash_sample(df: DataFrame, on: Column | str, fraction: float,
                salt: str = "", kind: str = "xxhash64") -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``on`` (all rows sharing a
    key are kept or dropped TOGETHER — entity-coherent by construction)."""
    return df.filter(hash_in_fraction(on, fraction, salt, kind))


def with_split(df: DataFrame, on: Column | str, test_fraction: float,
               salt: str = "", kind: str = "xxhash64",
               split_col: str = "is_test") -> DataFrame:
    """Add a boolean ``split_col``: true = test/eval side.  Entity-coherent
    (split keyed on ``on``) and rerun-stable; downstream writers typically
    partition by it."""
    return df.withColumn(split_col, hash_in_fraction(on, test_fraction, salt, kind))


def train_test_split(df: DataFrame, on: Column | str, test_fraction: float,
                     salt: str = "", kind: str = "xxhash64"
                     ) -> tuple[DataFrame, DataFrame]:
    """(train_df, test_df) — two filters over one scan, no shuffle; a key
    appears on exactly one side."""
    marked = with_split(df, on, test_fraction, salt, kind)
    return (marked.filter(~F.col("is_test")).drop("is_test"),
            marked.filter(F.col("is_test")).drop("is_test"))
