"""Dedup operators: exact, n-gram Jaccard, MinHash LSH, SimHash — with planted
duplicates so expected outputs are known."""

import pytest
from pyspark.sql import functions as F

from feathr_online_spark.operators.dedup import (
    exact_dedup,
    exact_dup_stats,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_pairs,
)


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit → high trigram jaccard
OTHER = "completely different content about spark query engines and shuffles etc etc etc etc etc"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),          # exact dup of 1
        (3, "  THE quick   brown fox jumps over the lazy dog while the cat sleeps "
            "on the warm windowsill in the afternoon sun near the garden "),  # normalized dup of 1
        (4, NEAR),          # near dup of 1
        (5, OTHER),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d"],)], "w array<string>")
    got = df.select(shingles(F.col("w"), 3).alias("s")).collect()[0]["s"]
    assert got == ["a b c", "b c d"]
    # shorter than n → empty
    df2 = spark.createDataFrame([(["a", "b"],)], "w array<string>")
    assert df2.select(shingles(F.col("w"), 3).alias("s")).collect()[0]["s"] == []


def test_exact_dedup(docs):
    kept = exact_dedup(docs, "text", "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4, 5]  # 2 and 3 collapse into 1


def test_exact_dup_stats(docs):
    row = exact_dup_stats(docs, "text").collect()[0]
    assert (row.n_docs, row.n_unique) == (5, 3)


def test_ngram_jaccard_pairs(docs):
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    got = {(r.a, r.b): r.jaccard for r in pairs.collect()}
    # exact/normalized dups have jaccard 1.0; near-dup pair well above 0.5
    assert got[(1, 2)] == 1.0 and got[(1, 3)] == 1.0 and got[(2, 3)] == 1.0
    assert got[(1, 4)] > 0.5 and got[(2, 4)] > 0.5
    assert not any(5 in p for p in got)


def test_minhash_matches_exact_jaccard(docs):
    exact = {(r.a, r.b): r.jaccard for r in
             ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    mh = {(r.a, r.b): r.jaccard for r in
          minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert mh == exact  # LSH recall ≈ 1 at this jaccard level; verify step is exact


def test_dedup_clusters_transitive(spark):
    """A~B, B~C, D~E → clusters {A,B,C} and {D,E}; chain of length 4 needs
    multiple propagation rounds."""
    from feathr_online_spark.operators.dedup import dedup_clusters, dedup_survivors

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {r.id: r.cluster for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i, f"t{i}") for i in [1, 2, 3, 4, 7, 10, 11]],
                                 "doc_id long, text string")
    kept = dedup_survivors(docs, pairs, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 7, 10]


def test_end_to_end_dedup_pipeline(docs):
    """pairs → clusters → survivors over the planted-dup fixture: docs 2,3,4
    all collapse into doc 1 (2,3 exact/normalized; 4 near-dup)."""
    from feathr_online_spark.operators.dedup import dedup_survivors

    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).select("a", "b")
    kept = dedup_survivors(docs, pairs, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 5]


def test_simhash_pairs(docs):
    got = {(r.a, r.b): r.hamming for r in simhash_pairs(docs, "text", "doc_id", max_hamming=6).collect()}
    # exact/normalized dups → identical simhash (hamming 0)
    assert got[(1, 2)] == 0 and got[(1, 3)] == 0
    # near dup → small hamming
    assert got[(1, 4)] <= 6
    # unrelated doc must not pair with anything
    assert not any(5 in p for p in got)


def test_contamination_stats_and_decontaminate(spark):
    from feathr_online_spark.operators.dedup import contamination_stats, decontaminate

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words entirely unrelated content here"),
         (3, "short doc")],                      # < 3 words after split? 2 words → no shingles
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    stats = {r.id: (r.n_contaminated, r.contaminated)
             for r in contamination_stats(train, evalset, "text", "doc_id").collect()}
    # doc 1 shares 'quick brown fox' + 'brown fox jumps' with the eval doc
    assert stats[1][0] >= 2 and stats[1][1]
    assert stats[2] == (0, False)
    assert stats[3] == (0, False)                # shingle-less doc kept, not dropped
    out = decontaminate(train, evalset, "text", "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]


def test_prepare_corpus_composition(spark):
    from feathr_online_spark.operators.dedup import ngram_jaccard_pairs
    from feathr_online_spark.operators.prep import prepare_corpus

    base = ("the cat sat on the mat and it was a good day for sitting on mats "
            "with a cat that sat")
    docs = spark.createDataFrame(
        [(1, base),                          # survivor of the near-dup pair
         (2, base + " indeed"),              # near-dup of 1 → dropped
         (3, base),                          # exact dup of 1 → dropped
         (4, "der hund ist nicht mit der katze und das ist gut so ja")],  # German → dropped
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    out = prepare_corpus(docs, "text", "doc_id", langs=("en",),
                         min_quality_bp=0, near_dup_pairs=pairs)
    assert sorted(r.doc_id for r in out.collect()) == [1]


def test_numpy_kernels_bit_identical(spark, docs):
    """r6 internals: the numpy MinHash-signature and simhash kernels must be
    bit-identical to the JVM Column forms they replaced — including across
    Arrow batch boundaries (tiny maxRecordsPerBatch exercises the simhash
    per-partition carry)."""
    from feathr_online_spark.operators.dedup import (
        _minhash_sigs_pd,
        _widen,
        minhash_signature,
        simhash64,
        with_shingle_hashes,
    )

    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        sh = with_shingle_hashes(_widen(docs), "text", 3).select(
            F.col("doc_id").alias("id"), "shingles"
        ).filter(F.size("shingles") > 0)
        jvm_sig = {r.id: list(r.sig) for r in
                   sh.select("id", minhash_signature(F.col("shingles"), 32).alias("sig")).collect()}
        np_sig = {r.id: list(r.sig) for r in _minhash_sigs_pd(sh, 32).collect()}
        assert np_sig == jvm_sig

        # JVM reference simhash: explode + 64 conditional vote sums
        w = _widen(docs).select(F.col("doc_id").alias("id"),
                                F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"))
        h = w.filter(F.col("w") != "").select("id", F.xxhash64("w").alias("h"))
        votes = [F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                        .otherwise(-1)).alias(f"v{i}") for i in range(64)]
        agg = h.groupBy("id").agg(*votes)
        sim = F.lit(0).cast("long")
        for i in range(64):
            bit = F.shiftleft(F.lit(1).cast("long"), i)
            sim = sim.bitwiseOR(F.when(F.col(f"v{i}") > 0, bit).otherwise(F.lit(0).cast("long")))
        ref = {r.id: r.s for r in agg.select("id", sim.alias("s")).collect()}
        got = {r.id: r.simhash for r in simhash64(docs, "text", "doc_id").collect()}
        assert got == ref
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
