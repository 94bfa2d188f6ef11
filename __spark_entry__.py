"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time query on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.

Convention used throughout so the driver's order-insensitive value-hash compare
is stable across engines:
- timestamps are projected as ``unix_micros`` longs (Spark) / ``epoch_us``
  (DuckDB) — no tz/format ambiguity;
- every double is ``round(x, 4)`` on both sides;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feathr_online_spark.operators.asof import asof_join
from feathr_online_spark.operators.dedup import (
    exact_dup_stats,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from feathr_online_spark.operators.multimodal import extract_features, synth_assets
from feathr_online_spark.operators.pipeline import Pipeline
from feathr_online_spark.operators.similarity import embedding_topk_pairs, knn_bruteforce
from feathr_online_spark.operators.text import lang_id, quality_features, quality_score
from feathr_online_spark.operators.windows import rolling, sessionize


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: point-in-time enrichment (as-of join, strict <) + window features
# ---------------------------------------------------------------------------

def q_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click/view event, attach the user's most recent prior
    purchase amount (strictly before the event — zero temporal leakage)."""
    events = _t(spark, sf_dir, "events")
    left = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("entity"),
        F.col("ts").alias("event_time"),
        "event_id",
        F.round("value", 4).alias("value"),
    )
    feat = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("entity"), F.col("ts").alias("feature_time"))
        .agg(F.round(F.sum("value"), 4).alias("purchase_value"))
    )
    out = asof_join(left, feat, on="entity", left_ts="event_time", right_ts="feature_time", strict=True)
    return out.select(
        "event_id",
        F.col("entity").alias("user_id"),
        F.unix_micros("event_time").alias("ts_us"),
        "value",
        "purchase_value",
    )


ORACLE_ASOF_PURCHASE = """
WITH feat AS (
  SELECT user_id, ts, round(sum(value), 4) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
), lev AS (
  SELECT event_id, user_id, ts, round(value, 4) AS value
  FROM events WHERE event_type IN ('click', 'view')
)
SELECT lev.event_id, lev.user_id, epoch_us(lev.ts) AS ts_us, lev.value, f.purchase_value
FROM lev LEFT JOIN LATERAL (
  SELECT purchase_value FROM feat
  WHERE feat.user_id = lev.user_id AND feat.ts < lev.ts
  ORDER BY feat.ts DESC LIMIT 1
) f ON TRUE
"""


# ---------------------------------------------------------------------------
# Verb coverage queries (SURVEY.md §2.1)
# ---------------------------------------------------------------------------

def q_where_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where + project (computed columns, math/string functions)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        Pipeline(li)
        .where((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05))
        .project(
            gross=F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4),
            qty_bucket=F.floor(F.col("l_quantity") / 10).cast("int"),
            flag_lo=F.lower("l_returnflag"),
        )
        .project_keep("l_orderkey", "l_linenumber", "gross", "qty_bucket", "flag_lo")
        .df
    )


ORACLE_WHERE_PROJECT = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS gross,
       CAST(floor(l_quantity / 10) AS INTEGER) AS qty_bucket,
       lower(l_returnflag) AS flag_lo
FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
"""


def q_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """summarize with computed grouping keys (TPC-H Q1 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        Pipeline(li)
        .where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .summarize(
            {
                "sum_qty": F.sum("l_quantity"),
                "sum_base_price": F.round(F.sum("l_extendedprice"), 2),
                "sum_disc_price": F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2),
                "avg_disc": F.round(F.avg("l_discount"), 6),
                "count_order": F.count(F.lit(1)),
            },
            by=["l_returnflag", "l_linestatus"],
        )
        .df
    )


ORACLE_SUMMARIZE = """
SELECT sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order,
       l_returnflag, l_linestatus
FROM lineitem WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top N by aggregate (TakeOrderedAndProject)."""
    ev = _t(spark, sf_dir, "events")
    return (
        Pipeline(ev)
        .summarize({"total": F.round(F.sum("value"), 4), "n": F.count(F.lit(1))}, by=["user_id"])
        # struct ordering = (total, user_id) lexicographic — deterministic under ties
        .top(10, F.struct(F.col("total"), F.col("user_id")), ascending=False)
        .df
    )


ORACLE_TOP = """
SELECT round(sum(value), 4) AS total, count(*) AS n, user_id
FROM events GROUP BY user_id
ORDER BY total DESC, user_id DESC LIMIT 10
"""


def q_distinct_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct by keys — output schema is the keys only
    (distinct_transformation.rs:58-67)."""
    ev = _t(spark, sf_dir, "events")
    return Pipeline(ev).distinct("user_id", "event_type").df


ORACLE_DISTINCT_BY = "SELECT DISTINCT user_id, event_type FROM events"


def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (inner semantics: empty arrays drop) over tokenized documents."""
    docs = _t(spark, sf_dir, "documents")
    return (
        Pipeline(docs)
        .project(word=F.split(F.col("text"), " "))
        .project_keep("doc_id", "word")
        .explode("word")
        .summarize({"n": F.count(F.lit(1))}, by=["word"])
        .top(20, F.struct(F.col("n"), F.col("word")), ascending=False)
        .df
    )


ORACLE_EXPLODE = """
SELECT count(*) AS n, word
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word ORDER BY n DESC, word DESC LIMIT 20
"""


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join kind=left-inner (1:N equi-join, broadcast dimension)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        Pipeline(orders)
        .join(cust, "left-inner", on=F.col("o_custkey"), key="c_custkey",
              fields={"c_name": "c_name", "c_nationkey": "c_nationkey"}, broadcast_hint=True)
        .summarize({"orders_n": F.count(F.lit(1)), "total": F.round(F.sum("o_totalprice"), 2)},
                   by=["c_nationkey"])
        .df
    )


ORACLE_JOIN_INNER = """
SELECT count(*) AS orders_n, round(sum(o_totalprice), 2) AS total, c_nationkey
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def q_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lookup verb: 1:1 enrich with first-match semantics + left-outer nulls."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        Pipeline(nation)
        .lookup(region, on=F.col("n_regionkey"), key="r_regionkey",
                fields={"region_name": "r_name"}, tiebreak="r_regionkey")
        .project_keep("n_nationkey", "n_name", "region_name")
        .df
    )


ORACLE_LOOKUP = """
SELECT n_nationkey, n_name, r.r_name AS region_name
FROM nation LEFT JOIN region r ON n_regionkey = r_regionkey
"""


# ---------------------------------------------------------------------------
# Window / PIT coverage (SURVEY.md §7.1 step 6)
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gap-based sessionization (30 min) of the event stream per user."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"), F.col("ts").alias("event_time"), "event_id"
    )
    out = sessionize(ev, gap_seconds=1800)
    return out.groupBy("entity").agg(
        F.max("session_id").alias("max_session"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(F.col("entity").alias("user_id"), "max_session", "n_events")


ORACLE_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_id
  FROM d
)
SELECT user_id, max(session_id) AS max_session, count(*) AS n_events
FROM s GROUP BY user_id
"""


def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trailing 1-hour rolling aggregate per user, excluding the current row
    (leakage-safe history feature)."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity"), F.col("ts").alias("event_time"),
        "event_id", "value",
    )
    out = rolling(ev, {"hist_sum": ("value", "sum"), "hist_n": ("value", "count")},
                  range_seconds=3600, include_current=False)
    return out.select(
        "event_id",
        F.col("entity").alias("user_id"),
        F.round(F.coalesce(F.col("hist_sum"), F.lit(0.0)), 4).alias("hist_sum"),
        F.col("hist_n").cast("long").alias("hist_n"),
    )


ORACLE_ROLLING = """
SELECT event_id, user_id,
       round(coalesce(sum(value) OVER w, 0.0), 4) AS hist_sum,
       count(value) OVER w AS hist_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)
"""


# ---------------------------------------------------------------------------
# Training-data ops: dedup / similarity / text analysis (SURVEY.md §7 + brief)
# ---------------------------------------------------------------------------

# Shared DuckDB prelude: word arrays and distinct 3-gram shingle sets per doc,
# mirroring operators.dedup.with_shingles (lower → split → 3-gram → distinct).
_DUCK_SHINGLES = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS sg
  FROM w WHERE len(ws) >= 3
)
"""

_DUCK_JACCARD_PAIRS = _DUCK_SHINGLES + """
SELECT a.doc_id AS a, b.doc_id AS b,
       round(len(list_intersect(a.sg, b.sg))::DOUBLE
             / len(list_distinct(list_concat(a.sg, b.sg))), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.sg, b.sg))::DOUBLE
            / len(list_distinct(list_concat(a.sg, b.sg))), 4) >= 0.5
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact-dedup statistics per source (md5 content fingerprint)."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dup_stats(docs, "text", by="source")


ORACLE_DEDUP_EXACT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS n_unique
FROM documents GROUP BY source
"""


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """near-dup pairs by exact word-3-gram Jaccard ≥ 0.5 (inverted index)."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """near-dup pairs via MinHash(128)+LSH(32 bands) with exact-Jaccard verify;
    at jaccard ≥ 0.5 LSH recall ≈ 1, so the oracle is the exact pair set."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", n=3, k=128, bands=32, threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """near-dup pairs by 64-bit SimHash hamming ≤ 3 (no SQL oracle — xxhash64
    is Spark-specific; correctness covered by planted-dup pytest goldens)."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, "text", "doc_id", max_hamming=3)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """language-ID heuristic (stopword markers + CJK chars) → counts per lang."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(lang_id("text").alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# marker lists must match operators.text.LANG_MARKERS
ORACLE_LANG_ID = """
WITH s AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws, text FROM documents
), sc AS (
  SELECT doc_id,
    len(list_filter(ws, x -> list_contains(['the','and','of','to','is','in','that','with','for','it'], x))) AS s_en,
    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','von'], x))) AS s_de,
    len(list_filter(ws, x -> list_contains(['el','la','los','que','y','es','en','un','una','por'], x))) AS s_es,
    len(list_filter(ws, x -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], x))) AS s_fr,
    len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
  FROM s
), p AS (
  SELECT CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'unknown'
              WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
              WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
              WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
              ELSE 'zh' END AS lang_pred
  FROM sc
)
SELECT lang_pred, count(*) AS n FROM p GROUP BY lang_pred
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality features + composite score per document, in integer basis
    points (exact cross-engine arithmetic — see quality_features_bp)."""
    from feathr_online_spark.operators.text import quality_features_bp, quality_score_bp

    docs = _t(spark, sf_dir, "documents")
    feats = quality_features_bp("text")
    return docs.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["punct_bp"].alias("punct_bp"),
        feats["stopword_bp"].alias("stopword_bp"),
        quality_score_bp("text").alias("quality_bp"),
    )


ORACLE_TEXT_QUALITY = """
WITH q AS (
  SELECT doc_id, text,
         length(text)::BIGINT AS n_chars,
         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_words,
         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS n_punct,
         len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digit,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
             x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was',
                                 'for','on','with','as','by','at','it','that','this','be'], lower(x))))::BIGINT AS n_stop
  FROM documents
), b AS (
  SELECT doc_id, n_words,
         floor(n_punct * 10000 / n_chars)::BIGINT AS punct_bp,
         floor(n_digit * 10000 / n_chars)::BIGINT AS digit_bp,
         floor(n_stop * 10000 / n_words)::BIGINT AS stopword_bp
  FROM q
)
SELECT doc_id, n_words, punct_bp, stopword_bp,
       floor((least(n_words * 200, 10000) * 4
              + least(stopword_bp * 5, 10000) * 3
              + greatest(0, 10000 - punct_bp * 3 - digit_bp * 2) * 3) / 10)::BIGINT AS quality_bp
FROM b
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact cosine top-10 neighbors for the first 5 vectors (brute force)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return knn_bruteforce(queries, emb, k=10).select(
        "q_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank"
    )


ORACLE_ANN_TOPK = """
WITH s AS (
  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS c6
  FROM embeddings q JOIN embeddings c ON q.vec_id < 5
), r AS (
  SELECT q_id, neighbor_id, c6,
         row_number() OVER (PARTITION BY q_id ORDER BY c6 DESC, neighbor_id) AS rank
  FROM s
)
SELECT q_id, neighbor_id, round(c6, 4) AS cos_sim, rank FROM r WHERE rank <= 10
"""


def q_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top-20 most-similar embedding pairs (embedding near-dup report)."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_topk_pairs(emb, k=20).select(
        "a", "b", F.round("cos_sim", 4).alias("cos_sim")
    )


ORACLE_EMBEDDING_PAIRS = """
WITH p AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS c6
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT a, b, round(c6, 4) AS cos_sim
FROM p ORDER BY c6 DESC, a, b LIMIT 20
"""


def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal plumbing: synthetic binary assets → mapInPandas feature
    extraction (deterministic fake decoder; no SQL oracle — binary/UDF)."""
    assets = synth_assets(spark, n=96)
    feats = extract_features(assets)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_asof_purchase(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_purchase": q_asof_purchase,
        "where_project": q_where_project,
        "summarize": q_summarize,
        "top": q_top,
        "distinct_by": q_distinct_by,
        "explode": q_explode,
        "join_inner": q_join_inner,
        "lookup": q_lookup,
        "sessionize": q_sessionize,
        "rolling": q_rolling,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram": q_dedup_ngram,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "ann_topk": q_ann_topk,
        "embedding_pairs": q_embedding_pairs,
        "multimodal": q_multimodal,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "asof_purchase": ORACLE_ASOF_PURCHASE,
        "where_project": ORACLE_WHERE_PROJECT,
        "summarize": ORACLE_SUMMARIZE,
        "top": ORACLE_TOP,
        "distinct_by": ORACLE_DISTINCT_BY,
        "explode": ORACLE_EXPLODE,
        "join_inner": ORACLE_JOIN_INNER,
        "lookup": ORACLE_LOOKUP,
        "sessionize": ORACLE_SESSIONIZE,
        "rolling": ORACLE_ROLLING,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "dedup_ngram": _DUCK_JACCARD_PAIRS,
        "dedup_minhash": _DUCK_JACCARD_PAIRS,
        "lang_id": ORACLE_LANG_ID,
        "text_quality": ORACLE_TEXT_QUALITY,
        "ann_topk": ORACLE_ANN_TOPK,
        "embedding_pairs": ORACLE_EMBEDDING_PAIRS,
        # dedup_simhash, multimodal: intentionally no oracle (engine-specific
        # hashing / binary+UDF) → driver rows-only check
    }
