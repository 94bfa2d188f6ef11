"""Deterministic hash sampling / train-test split (operators/sampling.py):
rerun-stability, entity coherence, fraction accuracy, salt independence and
nested composition."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.operators.sampling import (
    hash_in_fraction,
    hash_sample,
    train_test_split,
    with_split,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 2000 entities × 5 rows each
    return spark.range(10_000).select(
        (F.col("id") % 2000).alias("entity"), F.col("id").alias("row_id"))


@pytest.mark.parametrize("kind", ["xxhash64", "md5"])
def test_split_is_deterministic_and_entity_coherent(keyed, kind):
    train, test = train_test_split(keyed, "entity", 0.3, kind=kind)
    train2, test2 = train_test_split(keyed, "entity", 0.3, kind=kind)
    assert train.count() == train2.count() and test.count() == test2.count()
    # no entity on both sides, and every row lands somewhere
    both = train.select("entity").distinct().join(
        test.select("entity").distinct(), "entity").count()
    assert both == 0
    assert train.count() + test.count() == keyed.count()
    # entity-coherent: each surviving entity keeps ALL 5 of its rows
    per = test.groupBy("entity").count().select(
        F.min("count").alias("mn"), F.max("count").alias("mx")).collect()[0]
    assert (per.mn, per.mx) == (5, 5)


@pytest.mark.parametrize("kind", ["xxhash64", "md5"])
def test_fraction_accuracy(keyed, kind):
    ents = keyed.select("entity").distinct()
    got = hash_sample(ents, "entity", 0.3, kind=kind).count() / 2000
    assert abs(got - 0.3) < 0.05   # binomial(2000, 0.3) 3σ ≈ 0.031


def test_salt_redraws_independently(keyed):
    ents = keyed.select("entity").distinct()
    a = set(r.entity for r in hash_sample(ents, "entity", 0.5).collect())
    b = set(r.entity for r in hash_sample(ents, "entity", 0.5, salt="v2").collect())
    overlap = len(a & b) / 2000
    assert abs(overlap - 0.25) < 0.06   # independent draws overlap ≈ 0.5·0.5
    assert a != b


def test_nested_sampling_multiplies_fractions(keyed):
    ents = keyed.select("entity").distinct()
    outer = hash_sample(ents, "entity", 0.5, salt="s1")
    inner = hash_sample(outer, "entity", 0.5, salt="s2")
    assert abs(inner.count() / 2000 - 0.25) < 0.06


def test_split_marker_column(keyed):
    m = with_split(keyed, "entity", 0.2, split_col="in_eval")
    assert "in_eval" in m.columns
    assert m.filter(F.col("in_eval").isNull()).count() == 0


def test_bad_fraction_raises(keyed):
    with pytest.raises(ValueError):
        hash_in_fraction("entity", 1.5)
    with pytest.raises(ValueError):
        hash_in_fraction("entity", 0.5, kind="sha9")


@pytest.mark.parametrize("kind", ["xxhash64", "md5"])
def test_null_keys_never_dropped_and_stay_coherent(spark, kind):
    """r4 review fix: NULL keys must land deterministically on ONE side of a
    split — never vanish from both (the md5 comparison is NULL on NULL)."""
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (5, 3), (None, 4)], "entity long, row_id long")
    train, test = train_test_split(df, "entity", 0.5, kind=kind)
    assert train.count() + test.count() == 4
    null_sides = {
        side for side, d in (("train", train), ("test", test))
        if d.filter(F.col("entity").isNull()).count() > 0
    }
    assert len(null_sides) == 1   # all three null rows on one side together


@pytest.mark.parametrize("kind", ["xxhash64", "md5"])
@pytest.mark.parametrize("frac,expect", [(1.0, 100), (0.0, 0)])
def test_fraction_edges_exact(spark, kind, frac, expect):
    """r4 review fix: fraction 1.0 keeps EVERYTHING (the naive md5 hex
    threshold '10000' kept ~6%), fraction 0.0 keeps nothing."""
    df = spark.range(100)
    assert hash_sample(df, "id", frac, kind=kind).count() == expect
