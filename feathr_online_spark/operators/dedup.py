"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine.

Scale design notes (the point of each variant):

- **exact**: one md5-keyed groupBy — a single shuffle of (hash, id) pairs,
  never of document bodies.
- **ngram_jaccard_pairs**: candidate generation by inverted index (explode
  shingles → self-join on shingle) with a document-frequency cap dropping
  stop-shingles — without the cap a hot shingle produces O(df²) candidate
  pairs and kills the join at scale.  Exact Jaccard verifies candidates.
- **minhash_lsh_pairs**: the 100 TB path — signature size k, b bands; only
  documents agreeing on a whole band collide, so candidate count is driven by
  the (b, r) S-curve, not by corpus size.  Bands are banded-hash rows in an
  exploded table; the bucket self-join is an equi-join Catalyst handles with
  AQE skew splitting.
- **simhash_pairs**: 64-bit simhash; Hamming ≤ d pairs found by the
  pigeonhole band trick ((d+1) chunks, at least one must match exactly).
- embedding-cosine near-dup lives in operators/similarity.py.

All hashing is JVM xxhash64; shingling/banding are higher-order array
functions — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feathr_online_spark.operators.text import content_fingerprint, words


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def shingles(word_arr: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles from a token array: transform over a 0..len-n
    index sequence, concat_ws each window.  Empty array when len < n.
    (Guarded with when(): Spark's sequence(0, -1) counts BACKWARDS, it is not
    empty, so the short-array case needs an explicit branch.)"""
    idx = F.sequence(F.lit(0), F.size(word_arr) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(word_arr, i + 1, n)))
    sh = F.when(F.size(word_arr) >= n, sh).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh) if distinct else sh


def _widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle width.

    The dedup pipelines are CPU-dense but byte-light (a 5 k-doc parquet is one
    scan partition; AQE then coalesces every downstream shuffle back to one
    task because the *bytes* are small).  An explicit repartition pins the
    parallelism — at real scale the input is already wide and this is a
    no-op-cost safety, locally it is the difference between 1 and 32 cores.
    """
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(width)


def with_shingles(df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles") -> DataFrame:
    return df.withColumn(out_col, shingles(words(F.lower(F.col(text_col))), n))


def with_shingle_hashes(df: DataFrame, text_col: str, n: int = 3, out_col: str = "shingles",
                        words_col: str | None = None) -> DataFrame:
    """Distinct n-gram shingles hashed to xxhash64 longs — one string hash per
    shingle, after which every downstream comparison/join/minhash works on
    8-byte longs instead of ~25-byte strings (~2-3× cheaper end-to-end;
    64-bit collisions are ~n²/2⁶⁵ — irrelevant at any corpus size that fits a
    cluster).  Set equality/Jaccard over hashes equals that over strings.

    ``words_col``: name of a pre-tokenized ``array<string>`` column to shingle
    instead of re-tokenizing ``text_col`` — lets several dedup legs share one
    (persisted) tokenization pass."""
    base = F.col(words_col) if words_col else words(F.lower(F.col(text_col)))
    sh = shingles(base, n)
    return df.withColumn(out_col, F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s))))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct normalized content (min id wins).  Returns
    the surviving rows.  Shuffle payload is only (fingerprint, id)."""
    fp = df.select(content_fingerprint(F.col(text_col)).alias("__fp"), F.col(id_col))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


def exact_dup_stats(df: DataFrame, text_col: str, by: str | None = None) -> DataFrame:
    """(group, n_docs, n_unique) dedup statistics."""
    fp = content_fingerprint(F.col(text_col))
    keys = [by] if by else []
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup (inverted index + exact verify)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 100_000,
    words_col: str | None = None,
) -> DataFrame:
    """All (a, b, jaccard) pairs with word-n-gram Jaccard ≥ threshold, a < b.

    Count-based exact algorithm — no per-pair array work:
    |A∩B| IS the number of co-occurrences in the inverted-index self-join
    (shingle sets are distinct per doc), so
    ``jaccard = inter / (|A| + |B| - inter)`` comes from one groupBy over the
    join — the shuffle carries only (a, b) id pairs, never shingle arrays.
    ~30× faster than verify-by-array-intersection at sf0.1 and the only shape
    that scales: per-pair state is one counter.

    ``max_df`` drops stop-shingles (df > cap) before pair expansion — a hot
    shingle contributes O(df²) candidate rows.  With a cap the computed
    ``inter`` undercounts pairs whose overlap includes capped shingles
    (jaccard is then a lower bound; recall at the threshold requires the pair
    to share enough rare shingles — at web scale this is the standard trade;
    default cap is effectively off for test-sized corpora).

    r6 note: the only change vs r5 is pre-projecting the input to
    (id, tokens) before the widening repartition, so document text never
    rides that exchange (−15% measured).  Two tempting "improvements" were
    measured and REJECTED on the 50k-doc corpus (same-JVM A/B, min-of-2):
    carrying (sza, szb) through the self-join to kill the post-aggregation
    size joins widens the ~10⁸-row pair exchange from 16 to 32 bytes/row —
    24 → 68 s; and replacing the self-join with a per-shingle collect_list
    + array-expression pair expansion moves the bucket cross product from
    codegen'd join machinery into interpreted HOF eval, which is quadratic
    per HOT shingle (a boilerplate 3-gram shared by thousands of docs) and
    took minutes.  The self-join does NOT re-run the shingling: both sides
    read one ReusedExchange of the same repartition.
    """
    keep = [id_col, words_col or text_col]
    sh = with_shingle_hashes(_widen(df.select(*keep)), text_col, n, words_col=words_col).select(
        F.col(id_col).alias("id"), "shingles", F.size("shingles").alias("sz")
    )
    # (A high-threshold prefix-filter path — Bayardo-style all-pairs over a
    # hash-order prefix index with full-set verify — was measured and
    # REJECTED at t=0.8: the array-intersect verify over the candidate set
    # loses to the count-based aggregate, 21 → 29 s at sf1.0.)
    inv = sh.select("id", F.explode("shingles").alias("s")).repartition("s")
    rare = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_df)
    inv = inv.join(rare.select("s"), "s", "left_semi")
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    inter = (
        inv.alias("x")
        .join(inv.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        # explicit exchange: the (a, b) pair space is large but byte-small —
        # AQE would coalesce the groupBy reduce stage to ~1 task otherwise
        .repartition(width, "a", "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    sizes = sh.select("id", "sz")
    j = (
        inter.join(sizes.withColumnsRenamed({"id": "a", "sz": "__sza"}), "a")
        .join(sizes.withColumnsRenamed({"id": "b", "sz": "__szb"}), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("__inter") / (F.col("__sza") + F.col("__szb") - F.col("__inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return j


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Join shingle sets onto candidate (a, b) pairs and keep jaccard ≥ t.

    The candidate set is tiny relative to the corpus — broadcast it (and the
    first join's result) so both attach joins stream the shingle table
    map-side instead of shuffling it twice."""
    a_sets = sh.select(F.col("id").alias("a"), F.col("shingles").alias("__sa"))
    b_sets = sh.select(F.col("id").alias("b"), F.col("shingles").alias("__sb"))
    j = F.broadcast(cand).join(a_sets, "a")
    j = (
        F.broadcast(j).join(b_sets, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("__sa", "__sb"))
                / F.size(F.array_union("__sa", "__sb")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return j


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(k: int, seed: int = 97531) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine constants; a odd so x → a·x+b is a
    bijection on the 64-bit wrap-around ring."""
    import random

    r = random.Random(seed)
    return [(r.getrandbits(63) | 1, r.getrandbits(63)) for _ in range(k)]


def _wrap64(e: Column) -> Column:
    """Identity: non-ANSI Spark long arithmetic wraps like Java — documented
    intent.  Under ANSI mode the same multiply-add would instead raise
    ARITHMETIC_OVERFLOW on (essentially) every signature; minhash_signature
    guards the session setting up front so external callers fail with a
    clear message rather than a mid-job executor error."""
    return e


def _require_non_ansi() -> None:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None and spark.conf.get("spark.sql.ansi.enabled", "false").lower() == "true":
        raise RuntimeError(
            "minhash_signature requires spark.sql.ansi.enabled=false: its affine "
            "permutations rely on 64-bit wrap-around multiply-add, which ANSI mode "
            "rejects as ARITHMETIC_OVERFLOW. Build the session via "
            "feathr_online_spark.session.get_spark() or set the conf explicitly."
        )


def minhash_signature(shingle_arr: Column, k: int = 128) -> Column:
    """k-permutation MinHash signature over ALREADY-HASHED shingles (longs,
    see with_shingle_hashes): permutation i is the affine map
    ``x → a_i·x + b_i`` on the wrap-around 64-bit ring (a_i odd → bijective),
    the datasketch-style construction.  One multiply-add per (element, perm)
    instead of one xxhash64 — measured 2.3× faster end-to-end at sf0.1 —
    with identical LSH behaviour (equal sets ⇒ equal signatures; banding
    collision probability follows the same S-curve).

    Array of k longs, all JVM-side (whole-stage codegen'd arithmetic).

    NB: the per-perm closure must be built by a factory — a ``lambda s, i=i``
    default arg makes PySpark treat the function as the 2-arg (element, index)
    transform variant, silently replacing the constant with the array index."""
    _require_non_ansi()
    params = _minhash_params(k)

    def perm(a: int, b: int):
        return lambda s: _wrap64(s * F.lit(a) + F.lit(b))

    return F.array(*[F.array_min(F.transform(shingle_arr, perm(a, b))) for a, b in params])


def _minhash_sigs_pd(sh: DataFrame, k: int) -> DataFrame:
    """(id, shingles) → (id, sig) with the signature computed in numpy —
    bit-identical to ``minhash_signature`` (same ``_minhash_params`` affine
    constants, uint64 wrap-around multiply-add = Java long overflow, and the
    per-permutation min taken over the SIGNED int64 view, matching JVM
    ``array_min``).  The k-permutation sweep was the minhash gate's dominant
    interpreted-HOF cost (k × |shingles| lambda evals per doc); here it is
    k vectorized passes over the batch's flattened shingle array with a
    segmented ``minimum.reduceat``.  Ids must be integral (the gate's doc
    ids are longs)."""
    import pandas as pd

    params = _minhash_params(k)

    def gen(batches):
        import numpy as np

        a_np = np.array([p[0] for p in params], dtype=np.uint64)
        b_np = np.array([p[1] for p in params], dtype=np.uint64)
        for pdf in batches:
            arrs = [np.asarray(x, dtype=np.int64) for x in pdf["shingles"]]
            keep = [i for i, x in enumerate(arrs) if len(x)]
            if not keep:
                continue
            ids = pdf["id"].to_numpy()[keep]
            arrs = [arrs[i] for i in keep]
            lens = np.array([len(x) for x in arrs])
            offs = np.concatenate(([0], np.cumsum(lens[:-1])))
            flat = np.concatenate(arrs).view(np.uint64)
            sig = np.empty((len(arrs), k), dtype=np.int64)
            for i in range(k):
                y = (flat * a_np[i] + b_np[i]).view(np.int64)
                sig[:, i] = np.minimum.reduceat(y, offs)
            yield pd.DataFrame({"id": ids, "sig": list(sig)})

    return sh.select("id", "shingles").mapInPandas(gen, schema="id long, sig array<bigint>")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    words_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH banding, verified with exact Jaccard.

    r = k/bands rows per band; a pair lands in the same bucket with
    probability 1-(1-j^r)^bands — at (k=128, b=32, r=4) recall at j≥0.5 is
    ≈0.99 and ≈1.0 at j≥0.8.  Only same-bucket documents are compared, so
    cost scales with collisions, not corpus².
    """
    if k % bands != 0:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    keep = [id_col, words_col or text_col]
    _require_non_ansi()   # documents the wrap-around contract for this path too
    sh = with_shingle_hashes(_widen(df.select(*keep)), text_col, n, words_col=words_col).select(
        F.col(id_col).alias("id"), "shingles"
    ).filter(F.size("shingles") > 0)
    sig = _minhash_sigs_pd(sh, k)
    # one row per (doc, band): bucket key = xxhash64 of the band's slice
    bucketed = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.transform(
                        F.slice("sig", b * r + 1, r), lambda v: v.cast("string")
                    ))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # bucket SELF-join: both sides read ONE ReusedExchange of the bucketed
    # rows (the k-permutation signature pass is not duplicated), and the
    # cross product per bucket runs inside codegen'd join machinery — an
    # interpreted posting-list expansion was tried and loses badly on hot
    # buckets.  No explicit repartition here: a user-specified distribution
    # would be preserved by AQE and disable its skew-join splitting, which
    # is exactly what protects the hot buckets.
    cand = (
        bucketed.alias("x")
        .join(
            bucketed.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    return _verify_jaccard(cand, sh.select("id", "shingles"), threshold)


# ---------------------------------------------------------------------------
# Duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def dedup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Group near-dup pairs (a, b) into clusters: (id, cluster) where cluster
    is the minimum id reachable through the pair graph — i.e. connected
    components, so transitive duplicates (A~B, B~C) land in one group and a
    single survivor (the cluster id) can be kept.

    Algorithm: iterative min-label propagation (the standard large-graph
    approach when the component count is unknown): every node repeatedly
    adopts the smallest label among itself and its neighbors until a pass
    changes nothing.  Each iteration is one join + one aggregation — all
    DataFrame ops; iteration count is O(graph diameter), which for near-dup
    clusters (dense little cliques) is 1-2.  The driver only checks a
    convergence COUNT per pass, never data.

    Each round's labels are persisted and MATERIALIZED (the convergence
    count forces it), so round k reads round k-1 from cache instead of
    re-executing the entire join chain — O(k) work instead of O(k²).
    Superseded label frames are unpersisted as soon as the next round lands
    (persist, unlike localCheckpoint, lets us release executor storage
    deterministically); only the final labels stay cached briefly and are
    dropped before returning.
    """
    # both edge directions from ONE evaluation of the (potentially expensive)
    # pairs lineage: the old two-branch union re-ran the full pair detection
    # twice before the persist (measured: dedup_clusters ≈ 2× dedup_ngram at
    # sf1.0 for exactly this reason)
    edges = (
        pairs.select(F.explode(F.array(
            F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
        )).alias("e"))
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("lbl", F.col("node"))
        .persist()
    )
    try:
        for _ in range(max_iters):
            # smallest neighbor label per node (disambiguated column names — the
            # label frame is derived from edges, so lineage would collide)
            nbr = edges.join(labels.select(F.col("node").alias("dst"), F.col("lbl").alias("dlbl")), "dst")
            neighbor_min = nbr.groupBy(F.col("src").alias("node")).agg(F.min("dlbl").alias("nlbl"))
            # the change flag rides the label frame — no extra join against
            # the previous round to detect convergence
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select("node",
                        F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
                        (F.coalesce(F.col("nlbl"), F.col("lbl")) < F.col("lbl")).alias("__chg"))
                .persist()
            )
            # full-scan aggregate (not limit(1)): guarantees EVERY partition
            # of new_labels lands in the cache in one job — a short-circuit
            # limit would leave uncached partitions whose lineage re-runs
            # the whole prior round after its unpersist
            changed = new_labels.agg(
                F.sum(F.col("__chg").cast("int")).alias("n")).collect()[0][0] or 0
            labels.unpersist()      # release the superseded round's blocks
            labels = new_labels
            if changed == 0:
                break
        out = labels.select(F.col("node").alias("id"), F.col("lbl").alias("cluster"))
        # detach the result from the cached frame so the cache can be freed
        out = out.localCheckpoint()
    finally:
        edges.unpersist()
        labels.unpersist()
    return out


def dedup_survivors(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Drop all but one document per near-dup cluster (the min-id survivor) —
    the end-to-end dedup: pair detection (any of the *_pairs operators) →
    clustering → anti-join of non-survivors."""
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Cross-corpus decontamination
# ---------------------------------------------------------------------------

def contamination_stats(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_overlap: int = 2,
    words_col: str | None = None,
) -> DataFrame:
    """Per-train-document contamination against an eval corpus: the number of
    distinct word-n-gram shingles the document shares with ANY eval document
    — the standard benchmark-decontamination primitive for training-data
    pipelines (flag/drop train docs that leak eval content).

    Returns (id, n_shingles, n_contaminated, contaminated) where
    ``contaminated = n_contaminated >= min_overlap``.

    Scale shape: the eval shingle set is deduplicated FIRST (one distinct of
    hashed longs — eval sets are small relative to the corpus) and the train
    side probes it with a semi-join per exploded shingle; the shuffle carries
    only (doc id, shingle hash) pairs, and Catalyst/AQE broadcasts the eval
    set when it fits.  Never an all-pairs document comparison.

    ``words_col``: pre-tokenized column on BOTH frames (see
    with_shingle_hashes) so the train and eval legs can share one persisted
    tokenization.
    """
    keep = [id_col, words_col or text_col]
    tr = with_shingle_hashes(_widen(train.select(*keep)), text_col, n, words_col=words_col).select(
        F.col(id_col).alias("id"), "shingles", F.size("shingles").alias("n_shingles")
    )
    ev_sh = (
        with_shingle_hashes(evalset.select(*keep), text_col, n, words_col=words_col)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    probes = tr.select("id", F.explode("shingles").alias("s"))
    # broadcast hint: the distinct eval shingle set is 8 bytes/shingle and
    # eval corpora are small by definition — a map-side semi-join probe
    # instead of shuffling every (id, shingle) of the train side
    hits = probes.join(F.broadcast(ev_sh), "s", "left_semi").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return (
        tr.select("id", "n_shingles")
        .join(hits, "id", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn("contaminated", F.col("n_contaminated") >= min_overlap)
    )


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Drop contaminated training documents (see contamination_stats)."""
    bad = (
        contamination_stats(train, evalset, text_col, id_col, n, min_overlap)
        .filter(F.col("contaminated"))
        .select(F.col("id").alias(id_col))
    )
    return train.join(bad, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str, id_col: str,
              words_col: str | None = None) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over word hashes: per bit, majority vote
    of word-hash bits.  Explode words → 64 conditional sums in ONE groupBy
    (single shuffle of (id, word-hash)).  ``words_col``: pre-tokenized
    array<string> column to use instead of tokenizing ``text_col``."""
    import pandas as pd

    base = F.col(words_col) if words_col else words(F.lower(F.col(text_col)))
    keep = [id_col, words_col or text_col]
    w = _widen(df.select(*keep)).select(F.col(id_col).alias("id"), F.explode(base).alias("w"))
    h = w.select("id", F.xxhash64("w").alias("h"))

    # r6: the per-bit majority vote runs as a segmented numpy reduction in
    # mapInPandas INSTEAD of a groupBy(id) with 64 conditional sums — after
    # the widening repartition the explode is narrow, so every doc's rows
    # are contiguous within one partition and no shuffle is needed at all;
    # a doc spanning two Arrow batches is handled by carrying its partial
    # bit counts.  Values are bit-identical: bit i set ⇔ Σ(±1) > 0 ⇔
    # 2·count_i > n, same xxhash64 word hashes (still computed codegen'd,
    # JVM-side).  Ids must be integral (the gate's doc ids are longs).
    def gen(batches):
        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        carry_id, carry_cnt, carry_n = None, None, 0
        pend_ids: list = []
        pend_sims: list = []

        def flush(doc_id, cnt, n):
            v = (np.uint64(0) + ((2 * cnt > n).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            pend_ids.append(doc_id)
            pend_sims.append(np.array([v], dtype=np.uint64).view(np.int64)[0])

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            hv = pdf["h"].to_numpy(dtype=np.int64).view(np.uint64)
            bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
            cnts = np.add.reduceat(bits, starts, axis=0)
            lens = np.diff(np.concatenate((starts, [len(ids)])))
            seg_ids = ids[starts]
            if carry_id is not None:
                if seg_ids[0] == carry_id:
                    # fold the carried partial into segment 0, then treat
                    # every segment uniformly below
                    cnts[0] = cnts[0] + carry_cnt
                    lens[0] = lens[0] + carry_n
                else:
                    flush(carry_id, carry_cnt, carry_n)
                carry_id = None
            # all but the LAST segment are complete docs; the last may
            # continue into the next batch — hold it as the carry
            for j in range(len(seg_ids) - 1):
                flush(seg_ids[j], cnts[j], lens[j])
            carry_id, carry_cnt, carry_n = seg_ids[-1], cnts[-1], int(lens[-1])
            if pend_ids:
                yield pd.DataFrame({"id": pend_ids, "simhash": pend_sims})
                pend_ids, pend_sims = [], []
        if carry_id is not None:
            flush(carry_id, carry_cnt, carry_n)
        if pend_ids:
            yield pd.DataFrame({"id": pend_ids, "simhash": pend_sims})

    return h.mapInPandas(gen, schema="id long, simhash long")


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    words_col: str | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into (max_hamming+1) chunks; any pair
    within distance d agrees exactly on ≥1 chunk → equi-join per chunk, then
    verify with bit_count(a XOR b)."""
    sh = simhash64(df, text_col, id_col, words_col=words_col)
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
        )
        for c in range(n_chunks)
    ]
    chunks = sh.select(
        "id", "simhash", F.explode(F.array(*chunk_structs)).alias("ck")
    ).select("id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    # chunk SELF-join: both sides read ONE ReusedExchange of the chunk rows
    # (the simhash aggregation — the dominant cost — is not duplicated), and
    # the per-bucket cross product stays in codegen'd join machinery — an
    # interpreted posting-list expansion was tried and loses badly on hot
    # chunk keys.  No explicit repartition: it would pin a user distribution
    # and disable AQE skew-join splitting of hot chunk keys.
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("a"), F.col("y.id").alias("b"),
            F.col("x.simhash").alias("ha"), F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
