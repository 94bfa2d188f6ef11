"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports ``asof_seq_per_sec`` — the north-rule throughput metric: rows/sec
of the strict as-of join + feature-derivation job over the synthesized
tokenized-sequence table (see feathr_online_spark/datagen.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_SEQ = int(os.environ.get("SPARK_GRAFT_BENCH_SEQ", "1000000"))
# this box's warm-run variance is ±2-3× (BENCH/BASELINE.md); min-of-N per
# query is the documented protocol for every number we publish.  Default
# bumped 2 → 3 after r3's dedup_minhash "doubling" turned out to be exactly
# this: min-of-2 catching two slow reps (min-of-5 re-measure: 6.0 s, same
# code the driver clocked at 12.5 s — see BENCH/BASELINE.md).
N_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def north_rule_job(spark, seq_path: str, feat_path: str):
    """The headline job: strict as-of join of tokenized sequences against the
    feature table + windowed derivations (rolling history count, session id,
    forward-filled scalar) + token-level derived features — all JVM-side.

    Plan shape (verified via .explain): ONE Exchange + ONE Sort serve the as-of
    window AND all three feature windows (their [entity, event_time] ordering
    is a prefix of the as-of sort).  Token-derived features are computed
    BEFORE the exchange and the raw ``tokens`` array is dropped, so the
    shuffle/sort move ~100 B rows instead of ~1 KB — at 100 TB that is the
    difference between shuffling 100 TB and shuffling 10 TB.
    """
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.asof import asof_join
    from feathr_online_spark.operators.windows import forward_fill, rolling, sessionize

    seq = spark.read.parquet(seq_path).select(
        "doc_id", "entity", "event_time", "n_tok", "source",
        # derive token features map-side, pre-shuffle; drop the wide array
        (F.col("n_tok") / F.nullif(F.size("tokens"), F.lit(-1))).alias("tok_ratio"),
        F.xxhash64("tokens").alias("tok_fingerprint"),
    )
    feat = spark.read.parquet(feat_path)
    joined = asof_join(seq, feat, on="entity", left_ts="event_time",
                       right_ts="feature_time", strict=True)
    enriched = rolling(joined, {"hist_n": ("n_tok", "count")}, rows=16, include_current=False)
    enriched = sessionize(enriched, gap_seconds=3600)
    enriched = forward_fill(enriched, ["f_scalar"])
    return enriched.select(
        "doc_id", "entity", "event_time", "n_tok", "source",
        "session_id", "hist_n", "f_scalar",
        F.aggregate("f_vec", F.lit(0.0), lambda a, x: a + x).alias("f_vec_sum"),
        "tok_ratio", "tok_fingerprint",
    )


def north_rule_job_bucketed(spark, seq_path: str, feat_path: str,
                            bucket_seconds: int = 86400):
    """The skew-proof variant of the headline job: the same strict as-of +
    trailing-window + sessionization composite through
    ``pit_fused_bucketed`` (operators/skew.py), so the Zipf-hot entity
    splits across ~30 day-buckets instead of landing in ONE window task.

    This is the path whose scaling the north rule's ≥0.8 criterion is about:
    the plain job's 8→32 step is floored by the hot-entity straggler (one
    task owns ~25% of all rows — no parallelism helps), while here the
    biggest partition is (hot entity × 1 day), so added cores keep helping.
    """
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.skew import pit_fused_bucketed

    seq = spark.read.parquet(seq_path).select(
        "doc_id", "entity", "event_time", "n_tok", "source",
        (F.col("n_tok") / F.nullif(F.size("tokens"), F.lit(-1))).alias("tok_ratio"),
        F.xxhash64("tokens").alias("tok_fingerprint"),
    )
    feat = spark.read.parquet(feat_path)
    out = pit_fused_bucketed(
        seq, feat, on="entity", left_ts="event_time", right_ts="feature_time",
        strict=True,
        rolling_spec={"name": "hist_n", "col": "n_tok", "fn": "count",
                      "range_seconds": 3600, "include_current": False},
        session_gap=3600,
        bucket_seconds=bucket_seconds,
    )
    return out.select(
        "doc_id", "entity", "event_time", "n_tok", "source",
        "session_id", "hist_n", "f_scalar",
        F.aggregate("f_vec", F.lit(0.0), lambda a, x: a + x).alias("f_vec_sum"),
        "tok_ratio", "tok_fingerprint",
    )


def _timed(fn, *args) -> float:
    t0 = time.time()
    fn(*args)
    return time.time() - t0


def main() -> None:
    from feathr_online_spark.session import get_spark
    from feathr_online_spark import datagen
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="feathr_online_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen so the first measured query isn't charged the
    # session startup cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_full(df) -> None:
        # noop sink: materializes EVERY output column (count() would let
        # Catalyst prune the derived ones away) without writing anything
        df.write.format("noop").mode("overwrite").save()

    def time_query(fn) -> float:
        best = None
        for _ in range(max(N_REPS, 1)):
            t0 = time.time()
            run_full(fn(spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        timings[name] = time_query(fn)

    # engine/verify split (VERDICT r3 #10): several gates deliberately carry
    # exact-verification legs (recall/tolerance checks) on top of the engine
    # operator; time the engine-only variant so drift in `queries` totals can
    # be attributed to the engine vs the gate design at a glance.
    engine_sec: dict[str, float] = {}
    verify_sec: dict[str, float] = {}
    for name, fn in getattr(entrymod, "engine_queries", dict)().items():
        engine_sec[name] = time_query(fn)
        verify_sec[name] = round(max(0.0, timings[name] - engine_sec[name]), 3)

    # north-rule throughput: as-of + derivation over N_SEQ synthesized rows
    fix = datagen.write_fixture(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                             ".fixtures", "bench"), n_seq=N_SEQ)
    out = north_rule_job(spark, fix["sequences"], fix["features"])
    n_out = out.count()  # row count for the throughput denominator (cached plan pieces warm)
    asof_sec = min(_timed(run_full, out) for _ in range(3))  # min-of-3: this box's variance is ±2×
    timings["asof_northrule"] = round(asof_sec, 3)
    seq_per_sec = round(n_out / asof_sec, 1)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "engine_sec": engine_sec,
        "verify_sec": verify_sec,
        "sf": SF_DIR,
        "asof_rows": n_out,
        "asof_seq_per_sec": seq_per_sec,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "reps": max(N_REPS, 1),
    }))


if __name__ == "__main__":
    main()
