"""Streaming surface — intentionally minimal.

The reference has NO streaming semantics: no watermarks, windows, or stateful
operators; "online" means synchronous HTTP request/response
(piper/src/service.rs:187; `window`/`session_window` are commented out of its
function registry, piper/src/pipeline/function/mod.rs:328,413).  The batch
point-in-time core (operators.asof / operators.windows) IS the semantic
payload; a Structured Streaming wrapper (readStream → same column expressions
→ writeStream with watermarks) is a natural v2 extension and deliberately out
of scope for v1 (SURVEY.md §7.5).
"""
