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
        # r5 marker languages
        ("il cane non è che un animale di casa per questo sono contento",),
        ("o cão não é mais que um animal de casa para quem gosta como eu mas",),
        ("het is een hond die niet met de kat wil spelen maar ook niet weg wil",),
        # r5 script-range languages
        ("сегодня хорошая погода и мы идём гулять в парк",),
        ("الطقس جميل اليوم ونحن ذاهبون إلى الحديقة",),
        ("आज मौसम अच्छा है और हम पार्क जा रहे हैं",),
        ("오늘 날씨가 좋아서 우리는 공원에 갑니다",),
        ("きょうは天気がいいので公園へさんぽに行きます",),  # kana outweighs kanji
    ]
    df = spark.createDataFrame(rows, "t string")
    got = [r.l for r in df.select(lang_id("t").alias("l")).collect()]
    assert got == ["en", "de", "es", "fr", "zh", "unknown",
                   "it", "pt", "nl", "ru", "ar", "hi", "ko", "ja"]


def test_lang_fixture_classifies_as_planted(spark, tmp_path):
    """Every planted multilingual sample doc must classify as its own
    language — the property the extended lang_id gate relies on."""
    from feathr_online_spark.operators.text import write_lang_fixture

    p = str(tmp_path / "lang.parquet")
    write_lang_fixture(p)
    df = spark.read.parquet(p)
    bad = df.select("lang_true", lang_id("text").alias("lang_pred")) \
            .filter(F.col("lang_true") != F.col("lang_pred")).collect()
    assert bad == [], bad


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


def test_repetition_signals_golden(spark):
    """Hand-computed Gopher-style repetition signals (token-level, basis
    points with floor — operators/text.py repetition_signals_bp)."""
    from pyspark.sql import functions as F

    from feathr_online_spark.operators.text import is_repetitive, repetition_signals_bp

    rows = [
        ("plain", "one two three four five six"),            # no repetition
        ("loop", "ab cd ab cd ab cd ab cd"),                 # one bigram dominates
        ("stutter", "go go go go go go go go go go"),        # single token
        ("short", "hi"),                                     # no bigrams/5-grams
        ("empty", "   "),                                    # no tokens at all
    ]
    df = spark.createDataFrame(rows, "name string, text string")
    s = repetition_signals_bp(F.col("text"))
    got = {r.name: (r.dw, r.t2, r.d5, r.rep) for r in df.select(
        "name", s["dup_word_bp"].alias("dw"), s["top2_bp"].alias("t2"),
        s["dup5_bp"].alias("d5"), is_repetitive("text").alias("rep")).collect()}
    # plain: 6 distinct of 6; top bigram count 1 → floor(2*10000/6)=3333; 2
    # distinct 5-grams of 2.  NOT flagged: 6 words < the min-10-words guard
    # (top2_bp on short docs reflects length, not repetition — r4 review fix)
    assert got["plain"] == (0, 3333, 0, False)
    # loop: 8 tokens, 2 distinct → dup_word 7500; "ab cd" appears 4 of 7
    # bigrams → min(4*2*10000/8, 10000) = 10000; 5-grams: 4 total, 2 distinct
    # ("ab cd ab cd ab", "cd ab cd ab cd") → 5000
    assert got["loop"] == (7500, 10000, 5000, False)  # 8 words < 10 guard
    # stutter: 10 tokens 1 distinct → 9000; "go go" ×9 → cap 10000; 6
    # 5-grams 1 distinct → floor(5*10000/6)=8333; 10 words → guard passes
    assert got["stutter"] == (9000, 10000, 8333, True)
    # the guard is a parameter: disabled, the short repetitive doc flags too
    from feathr_online_spark.operators.text import is_repetitive as _isr
    flagged = df.select("name", _isr("text", min_words=0).alias("r")).collect()
    assert {r.name: r.r for r in flagged}["loop"] is True
    assert got["short"] == (0, 0, 0, False)
    assert got["empty"] == (0, 0, 0, False)
