"""Lookup-source registry (DataFrame-backed)."""

from feathr_online_spark.sources.registry import SourceRegistry  # noqa: F401
