"""Multimodal plumbing: schema, mapInPandas batch shape, stub contracts."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synth_assets,
)
from feathr_online_spark.operators.similarity import knn_bruteforce


def test_extract_features_shape_and_determinism(spark):
    assets = synth_assets(spark, n=30)
    out = extract_features(assets)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic: same payload → same features
    rows2 = extract_features(synth_assets(spark, n=30)).collect()
    m1 = {r.asset_id: r.features for r in rows}
    m2 = {r.asset_id: r.features for r in rows2}
    assert m1 == m2


def test_features_feed_similarity(spark):
    """Decoded features plug straight into the similarity operators."""
    feats = extract_features(synth_assets(spark, n=24)).select(
        F.col("asset_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    q = feats.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = knn_bruteforce(q, feats, k=3).collect()
    by_q = {r.q_id: r for r in out if r.rank == 1}
    assert by_q[0].neighbor_id == 0 and by_q[1].neighbor_id == 1  # self is nearest


def test_real_decoder_raises(spark):
    assets = synth_assets(spark, n=3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(assets, decoder="real").collect()


def test_resize_and_frames_are_stubs(spark):
    assets = synth_assets(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_images(assets, 32, 32).collect()
    with pytest.raises(Exception, match="NotImplementedError|pyav"):
        sample_frames(assets, 40).collect()
