"""Approximate sketches: accuracy bounds vs exact, and mergeability (the
property that matters at 100 TB — partial sketches combine across partitions)."""

import pytest
from pyspark.sql import functions as F


def test_hll_and_quantiles_accuracy(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r.event_type: (r.hll, r.hllpp) for r in ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll"),
        F.approx_count_distinct("user_id").alias("hllpp"),
    ).collect()}
    for et, n in exact.items():
        hll, hllpp = approx[et]
        assert abs(hll - n) / n < 0.05
        assert abs(hllpp - n) / n < 0.05

    # median estimate within the value range and ordered quantiles
    q = ev.agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias("q")).collect()[0]["q"]
    assert q[0] <= q[1] <= q[2]
    exact_median = ev.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]
    assert q[0] == pytest.approx(exact_median, rel=0.05)


def test_hll_sketches_merge_across_partitions(spark, sf_dir):
    """Union of per-partition sketches equals the global sketch estimate —
    the algebraic property that makes them shuffle-light at scale."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    global_est = ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))).collect()[0][0]
    merged_est = (
        ev.withColumn("p", F.pmod(F.col("event_id"), F.lit(8)))
        .groupBy("p").agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .collect()[0][0]
    )
    assert merged_est == global_est
