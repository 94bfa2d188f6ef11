"""Per-partition lineage/metrics emission (north_star requirement).

Every production run appends one row per task partition to a metrics table:
``(partition_id, rows, checksum, wall_time_s)``.  Implemented as a single
``mapInPandas`` pass — Arrow-batched, O(rows) with no extra shuffle — that
both *passes data through unchanged* (lineage as a transparent pipeline stage)
or, via ``partition_lineage``, computes the metrics table as its own action.

The checksum is an order-insensitive XOR-fold of per-row xxhash64 so it is
stable under any task scheduling, making it usable for resume verification
(same input partition → same checksum)."""

from __future__ import annotations

import time
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, DoubleType

LINEAGE_SCHEMA = StructType(
    [
        StructField("partition_id", LongType(), False),
        StructField("rows", LongType(), False),
        StructField("checksum", LongType(), False),
        StructField("wall_time_s", DoubleType(), False),
    ]
)


def partition_lineage(df: DataFrame) -> DataFrame:
    """Compute the lineage/metrics DataFrame for ``df``: one row per partition.

    Row hash is computed JVM-side (xxhash64 over all columns) before the
    pandas fold, so Python only sees one long column — the hot path stays
    vectorized.
    """
    hashed = df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")).withColumn(
        "__pid", F.spark_partition_id().cast("long")
    )

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        t0 = time.time()
        pid = -1
        n = 0
        acc = 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iloc[0])
                n += len(pdf)
                # XOR-fold: order-insensitive, associative — scheduler-stable
                acc = _xor_fold(pdf["__h"].to_numpy(), acc)
        if pid >= 0:
            yield pd.DataFrame(
                {
                    "partition_id": [pid],
                    "rows": [n],
                    "checksum": [acc],
                    "wall_time_s": [time.time() - t0],
                }
            )

    return hashed.mapInPandas(fold, LINEAGE_SCHEMA)


def _xor_fold(arr, seed: int) -> int:
    import numpy as np

    v = np.bitwise_xor.reduce(arr.astype(np.int64)) if len(arr) else 0
    return int(v) ^ seed
