"""Scalar-function layer: piper semantics expressed as native Column builders.

Most of the reference's ~150 built-ins (piper/src/pipeline/function/mod.rs:49-437)
deliberately mirror Spark SQL names and need no wrapper at all — use
``pyspark.sql.functions`` directly.  This module adds only the functions whose
reference semantics *differ* from Spark (0-based indexing, literal split,
euclidean mod, ...) plus the reference's non-Spark extras (bucket, distance).

Everything is a pure Column expression — JVM-side, codegen-friendly, no UDFs.
"""

from feathr_online_spark.functions.piper import (  # noqa: F401
    bucket,
    distance_km,
    div,
    element_at0,
    mod_euclid,
    mod_long,
    piper_avg,
    slice0,
    split_literal,
    substring0,
    timestamp_strftime,
)
