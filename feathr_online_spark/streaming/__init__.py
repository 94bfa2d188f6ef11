"""Structured Streaming surface of the engine.

The reference has NO streaming semantics — no watermarks, windows, or
stateful operators; its "online" is synchronous HTTP request/response
(piper/src/service.rs:187; `window`/`session_window` are commented out of
its function registry, piper/src/pipeline/function/mod.rs:328,413).  This
package is engine surface BEYOND parity: the batch point-in-time core's
semantics (operators.asof / operators.windows), re-expressed over
readStream → watermark → stateful operator → writeStream (streaming/pit.py):

- ``stream_windowed_features`` — watermarked tumbling/sliding aggregates
- ``stream_sessionize`` — native ``session_window`` gap sessions
- ``stream_forward_fill`` — cross-micro-batch backfill (applyInPandasWithState)
- ``stream_asof_enrich`` — streaming point-in-time enrichment, strict ``<``
- ``stream_exact_dedup`` — ingest dedup with watermark-bounded state
"""

from feathr_online_spark.streaming.pit import (  # noqa: F401
    stream_asof_enrich,
    stream_exact_dedup,
    stream_forward_fill,
    stream_sessionize,
    stream_windowed_features,
)
