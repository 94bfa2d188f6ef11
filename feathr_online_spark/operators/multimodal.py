"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow batch
shape, mapInPandas signatures.  The actual codec work (image decode, audio
resample, video frame extraction) requires libraries not present in this
container, so the decode kernel is STUBBED: ``decoder="fake"`` produces a
deterministic feature vector from the payload bytes (so pipelines and tests
run end-to-end), while ``decoder="real"`` raises NotImplementedError at the
exact point a PIL/libav call would go.

Design for 100 TB of media:
- payloads stay ``binary`` columns; metadata travels in a sibling struct so
  filters (mime, width, duration) prune BEFORE any decode;
- decode runs in ``mapInPandas`` — per-partition Arrow batches, one Python
  worker per core, no per-row overhead; batch size bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap memory;
- decoded features are fixed-width float arrays so downstream similarity /
  dedup reuse operators from similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def _fake_decode_batch(payloads, dim: int):
    """Deterministic stand-in for a codec: fold payload bytes into a float
    vector.  Vectorized numpy over the whole Arrow batch."""
    import numpy as np

    out = np.zeros((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):  # byte-string loop, not a row-wise UDF call
        arr = np.frombuffer(p, dtype=np.uint8)
        if len(arr) == 0:
            continue
        pad = (-len(arr)) % dim
        folded = np.pad(arr, (0, pad)).reshape(-1, dim).sum(axis=0)
        out[i] = folded.astype(np.float32) / max(float(arr.sum()), 1.0)
    return out


def extract_features(df: DataFrame, decoder: str = "fake", dim: int = FEATURE_DIM) -> DataFrame:
    """binary payload → fixed-width feature vector via mapInPandas.

    ``decoder="real"`` marks where PIL/torchaudio/pyav decode would run —
    intentionally NotImplementedError in this container."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/libav — not available in this container"
                )
            feats = _fake_decode_batch(pdf["payload"].tolist(), dim)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": list(feats),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    pruned = df.select("asset_id", "kind", "payload")
    return pruned.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: the Spark plumbing (filter by kind, mapInPandas
    batch shape) is real; the pixel work is NotImplementedError."""

    def run(batches: Iterator) -> Iterator:
        raise NotImplementedError("image resize requires PIL — not available in this container")
        yield  # pragma: no cover

    return df.filter(F.col("kind") == "image").mapInPandas(run, df.schema)


def sample_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Video frame sampling stub (same contract as resize_images)."""

    def run(batches: Iterator) -> Iterator:
        raise NotImplementedError("frame sampling requires pyav — not available in this container")
        yield  # pragma: no cover

    return df.filter(F.col("kind") == "video").mapInPandas(run, df.schema)


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests: payload bytes derived from
    the asset id."""
    import numpy as np

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 4096))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        rows.append((i, kind, payload, f"{kind}/x-fake", 64, 64, 1000))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
