"""Text analysis: token counts, quality features, language ID, fingerprints."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.operators.text import (
    content_fingerprint,
    lang_id,
    quality_features,
    quality_score,
    rolling_fingerprint,
    token_count_bpe,
    token_count_ws,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world  foo",), ("a b,c 12!",)], "t string")
    ws = [r.c for r in df.select(token_count_ws("t").alias("c")).collect()]
    assert ws == [3, 3]
    bpe = [r.c for r in df.select(token_count_bpe("t").alias("c")).collect()]
    # "a b,c 12!" → a, b, ',', c, 12, '!' = 6
    assert bpe == [3, 6]


def test_quality_features_and_score(spark):
    df = spark.createDataFrame([("The cat and the dog sat on the mat.",)], "t string")
    feats = df.withColumns(quality_features("t")).collect()[0]
    assert feats.n_words == 9
    # stopwords: The, and, the, on, the → 5 of 9
    assert feats.stopword_ratio == pytest.approx(5 / 9, abs=1e-3)
    score = df.select(quality_score("t").alias("s")).collect()[0]["s"]
    assert 0.0 <= score <= 1.0


def test_lang_id(spark):
    rows = [
        ("the quick brown fox is in the garden with the dog",),
        ("der hund ist nicht mit der katze und der maus",),
        ("el perro y la gata es en la casa por un dia",),
        ("le chien est dans les jardins pour une promenade et le chat",),
        ("今天天气很好我们去公园散步",),
        ("zzz qqq xxx",),
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [r.l for r in df.select(lang_id("t").alias("l")).collect()]
    assert got == ["en", "de", "es", "fr", "zh", "unknown"]


def test_content_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",), ("other",)], "t string")
    fps = [r.f for r in df.select(content_fingerprint("t").alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_rolling_fingerprint_near_dup_stability(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame([(base,), (base + " extra",), ("totally different words here now ok",)], "t string")
    fps = [r.f for r in df.select(rolling_fingerprint("t").alias("f")).collect()]
    assert fps[0] == fps[1]  # min-shingle-hash robust to suffix append
    assert fps[0] != fps[2]
