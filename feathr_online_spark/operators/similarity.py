"""Similarity search over embedding columns (array<float>).

- ``cosine`` — pure-Column cosine similarity (zip_with dot product; doubles
  throughout so results are engine-portable).
- ``knn_bruteforce`` — exact top-k: broadcast the (small) query set against
  the corpus, one window per query.  The baseline and the verifier.
- ``knn_lsh`` — random-hyperplane LSH: deterministic planes (seeded numpy)
  shipped as literal arrays; sign pattern = bucket; probe only the query's
  bucket (+ optional multi-probe).  The scale path: bucket join instead of
  corpus × query cross product.
- ``embedding_topk_pairs`` — most-similar corpus pairs (embedding near-dup).

No Python in the scoring path — the dot products are JVM higher-order
functions; numpy appears only at plan-build time to generate plane literals.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def _blocked_knn_cand(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str,
    q_vec: str,
    c_id: str,
    c_vec: str,
    quantized: bool = False,
) -> DataFrame:
    """Per-(corpus block, query) top-k candidates for an exact KNN scan,
    computed with BLAS: the corpus is hashed into `width` blocks, the (few)
    queries replicate to every block, and each block-task scores its block
    against all queries as one numpy float64 matrix product, emitting only
    its local top-k per query ordered by (round(score, 6) DESC, id ASC) —
    the comparator the caller's final window applies, so the merged global
    top-k is exactly the old cross-join/window result.  Replaces the
    interpreted per-pair zip_with/aggregate dot (HOFs are CodegenFallback;
    guide §4.2) — the corpus ships through Arrow ONCE, queries |Q|·width
    times.

    ``quantized=True`` reproduces the SQ8 recipe of
    ``knn_bruteforce_quantized`` bit-for-bit in numpy: unit-normalize both
    sides, per-vector symmetric int8 quantization (scale = max|x|/127,
    q = round(x/s)), exact integer dot, times the two scales."""
    import pandas as pd

    width = int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    cb = corpus.select(
        F.pmod(F.xxhash64(F.col(c_id)), F.lit(width)).cast("int").alias("blk"),
        F.lit(0).alias("side"),
        F.col(c_id).alias("xid"),
        F.col(c_vec).cast("array<double>").alias("vec"),
    )
    qb = queries.select(
        F.explode(F.sequence(F.lit(0), F.lit(width - 1))).alias("__b"),
        F.lit(1).alias("side"),
        F.col(q_id).alias("xid"),
        F.col(q_vec).cast("array<double>").alias("vec"),
    ).select(F.col("__b").cast("int").alias("blk"), "side", "xid", "vec")

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        qs = pdf[pdf["side"] == 1]
        cs = pdf[pdf["side"] == 0]
        if qs.empty or cs.empty:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "cid": pd.Series(dtype="int64"),
                                 "dot": pd.Series(dtype="float64")})
        qi = qs["xid"].to_numpy(dtype=np.int64)
        ci = cs["xid"].to_numpy(dtype=np.int64)
        qx = np.stack(qs["vec"].to_numpy()).astype(np.float64)
        cx = np.stack(cs["vec"].to_numpy()).astype(np.float64)
        if quantized:
            qx /= np.linalg.norm(qx, axis=1, keepdims=True)
            cx /= np.linalg.norm(cx, axis=1, keepdims=True)
            qsc = np.abs(qx).max(axis=1) / 127.0
            csc = np.abs(cx).max(axis=1) / 127.0
            qsc = np.where(qsc > 0, qsc, 1.0)
            csc = np.where(csc > 0, csc, 1.0)
            qq = np.round(qx / qsc[:, None]).astype(np.int64)
            cq = np.round(cx / csc[:, None]).astype(np.int64)
            m = (cq @ qq.T).astype(np.float64) * csc[:, None] * qsc[None, :]
        else:
            m = (cx @ qx.T) / (np.linalg.norm(cx, axis=1)[:, None]
                               * np.linalg.norm(qx, axis=1)[None, :])
        out_q, out_c, out_d = [], [], []
        kk = min(k, len(ci))
        key = np.round(m, 6)
        key = np.where(np.isnan(key), np.inf, key)   # Spark sorts NaN greatest
        for j in range(len(qi)):
            idx = np.lexsort((ci, -key[:, j]))[:kk]
            out_q.append(np.full(kk, qi[j]))
            out_c.append(ci[idx])
            out_d.append(m[idx, j])
        return pd.DataFrame({"qid": np.concatenate(out_q),
                             "cid": np.concatenate(out_c),
                             "dot": np.concatenate(out_d)})

    return cb.unionByName(qb).groupBy("blk").applyInPandas(
        score_block, schema="qid long, cid long, dot double")


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query.  Deterministic ordering:
    (round(cos, 6) DESC, neighbor id ASC).  O(|Q|·|C|) scoring but the
    arithmetic runs as blocked BLAS matrix products (r6 — see
    _blocked_knn_cand); the final merge is a window over ≤ |Q|·width·k
    candidate rows.  At 100 TB this is the verify/eval path, not serving."""
    cand = _blocked_knn_cand(queries, corpus, k, q_id, q_vec, c_id, c_vec)
    scored = cand.select(
        F.col("qid").alias(q_id),
        F.col("cid").alias("neighbor_id"),
        F.round("dot", 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "cos_sim", "rank")
    )


def quantize_vectors(df: DataFrame, vec_col: str = "embedding",
                     q_col: str = "q_vec8", scale_col: str = "q_scale") -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: ``q = round(x/s)`` with
    ``s = max|x| / 127``, stored as ``array<tinyint>`` + one float scale —
    the faiss ``SQ8`` recipe.

    Why at 100 TB: a float32 embedding column is 4 bytes/dim; int8 is 1 —
    the dominant storage/scan/shuffle cost of an embedding corpus drops 4×,
    and the int dot product below recovers cosine to ~1e-2, far inside the
    gap between a near-dup (cos ≥ 0.99) and the random-pair background
    (≈ 0.6 here) — so dedup/ANN candidate generation can run entirely on
    the quantized column and only the final verify (if any) touches floats.
    Pure column expressions, map-side, no shuffle."""
    v = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    return (df.withColumn(scale_col, scale)
              .withColumn(q_col, F.transform(
                  v, lambda x: F.round(x / F.col(scale_col)).cast("tinyint"))))


def dot_quantized(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Approximate dot product from two int8 vectors + their scales:
    ``(Σ qa·qb) · sa · sb``.  The accumulation is integer (exact); only the
    two scale multiplies are float."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda a, b: a.cast("int") * b.cast("int")),
        F.lit(0).cast("long"), lambda s, v: s + v,
    )
    return acc.cast("double") * sa * sb


def knn_bruteforce_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact scan over int8-quantized UNIT vectors: normalize → quantize both
    sides (SQ8: per-vector symmetric scale), score with the integer dot
    (≈ cosine), per-query top-k.  Same blocked-BLAS shape as knn_bruteforce
    (r6 — _blocked_knn_cand(quantized=True) reproduces
    quantize_vectors/dot_quantized in numpy: identical scales, identical
    rounding grid, exact integer accumulation); 4× less data per candidate
    at the storage layer is unchanged — quantization here models the scan
    cost, the Column-expression recipe stays in quantize_vectors for
    writers."""
    cand = _blocked_knn_cand(queries, corpus, k, q_id, q_vec, c_id, c_vec,
                             quantized=True)
    scored = cand.select(
        F.col("qid").alias(q_id),
        F.col("cid").alias("neighbor_id"),
        F.round("dot", 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "cos_sim", "rank")
    )


def _plane_literals(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_of(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of the vector against each hyperplane, packed
    into a long."""
    vd = vec.cast("array<double>")
    b = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vd, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        b = b.bitwiseOR(bit)
    return b


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucketing, score only same-bucket
    candidates.  With n_planes=8 the corpus splits into ≤256 buckets — the
    cross product shrinks ~256× at the cost of recall.  ``multiprobe=L`` also
    probes every bucket up to L sign-flips away (L=1 → n+1 buckets, L=2 →
    1 + n + n(n-1)/2) — the standard recall/cost dial.  Bucket assignment is
    a map-side Column expression; the probe is an equi-join on bucket id, so
    each corpus vector is scored against only the queries probing its bucket.

    Pass ``dim`` explicitly to keep plan-build free of driver actions; when
    omitted it is inferred with one bounded ``.first()`` on the query side."""
    if dim is None:
        dim = len(queries.select(q_vec).first()[0])
    planes = _plane_literals(dim, n_planes, seed)
    cb = corpus.withColumn("__bucket", bucket_of(F.col(c_vec), planes))
    qb = queries.withColumn("__b0", bucket_of(F.col(q_vec), planes))
    probe_buckets = [F.col("__b0")]
    if multiprobe >= 1:
        probe_buckets += [
            F.col("__b0").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i)) for i in range(n_planes)
        ]
    if multiprobe >= 2:
        probe_buckets += [
            F.col("__b0")
            .bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
            .bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), j))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    qb = qb.withColumn("__bucket", F.explode(F.array(*probe_buckets))).drop("__b0")
    # vectorized cosine over the bucket-join candidates (r6; bucket
    # assignment stays the JVM plan-literal expression on BOTH sides so a
    # sign-boundary ulp can never split a query from its own bucket)
    scored = cb.join(F.broadcast(qb), "__bucket").select(
        F.col(q_id),
        F.col(c_id).alias("neighbor_id"),
        F.round(_cosine_pd()(F.col(q_vec), F.col(c_vec)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "cos_sim", "rank")
    )


def _cosine_pd() -> "Column":
    """Vectorized (Arrow/pandas) cosine of two array columns — numpy float64
    per batch, same formula as ``cosine`` (dot / (|a|·|b|)).  For scoring
    joins whose pair volume makes the interpreted zip_with/aggregate dot the
    bottleneck (HOFs are CodegenFallback); values agree with the JVM fold to
    well past the round(·, 6) grid every consumer applies."""
    import pandas as pd

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(a.to_numpy()).astype(np.float64)
        y = np.stack(b.to_numpy()).astype(np.float64)
        d = np.einsum("ij,ij->i", x, y)
        return pd.Series(d / (np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)))

    return cos


def normalized(vec: Column) -> Column:
    """Unit-normalize an array<numeric> column (double).  Normalizing ONCE per
    vector turns every pairwise cosine into a bare dot product — O(d) saved
    per pair, which at |C|²/2 pairs is the dominant cost."""
    vd = vec.cast("array<double>")
    n = _norm(vd)
    return F.transform(vd, lambda x: x / n)


def _dist2(vec: Column, lits: list[float]) -> Column:
    """Squared L2 distance between a vector column and a literal centroid —
    unrolled zip_with, pure JVM."""
    cent = F.array(*[F.lit(float(x)) for x in lits])
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), cent, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 10,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    sample_cap: int = 4096,
) -> list[list[float]]:
    """Coarse quantizer: k-means trained driver-side on a BOUNDED sample —
    the standard IVF recipe (faiss trains its quantizer on a sample too):
    the coarse geometry of a corpus is captured by a few thousand vectors,
    so there is no reason to run Lloyd iterations as distributed jobs.

    Why not iterate on the cluster (the r3 design): each Lloyd step rebuilt
    the unrolled n_cells×dim assignment expression with fresh literals —
    a full corpus scan PLUS a multi-second codegen compile per iteration,
    a fixed cost that dominated the gate wall (measured ~4 s at sf0.001
    where the data itself is trivial).  Sampling moves training to numpy
    (deterministic, µs per iteration), cuts the Spark actions from
    iters+1 to ONE bounded collect (≤ sample_cap × dim doubles — ~2 MB at
    the defaults), and affords 10 iterations instead of 2.  The
    DISTRIBUTED path is unchanged: cell assignment stays a map-side
    expression over the scan, probes stay an equi-join; centroids remain
    plan metadata, exactly like the LSH planes.

    Sample choice (ADVICE r4): the first ``sample_cap`` vectors ordered by
    ``xxhash64(id)`` — a deterministic pseudo-random draw.  Ordering by raw
    id would bias the sample on any id-correlated corpus (ids assigned by
    source or ingest time → the quantizer sees only the oldest shard and
    recall degrades); hashing first decorrelates the draw from ingest order
    while keeping it rerun-stable.  Physically this is TakeOrderedAndProject
    (per-partition top-k + driver merge, no global sort, no full shuffle) —
    the same bounded cost at 100 TB.

    Init is deterministic farthest-first traversal (the k-means++ idea with
    the argmax taken exactly instead of sampled): start from the sample's
    first row, repeatedly add the point farthest from the chosen set.
    "First n_cells rows" init left centroid quality at the mercy of the
    sample order (measured: recall@10 swung 5-7/10 vs 8-10/10 on the same
    sample under two orderings); farthest-first spreads the init across the
    data's hull and is order-robust.  numpy argmin/argmax ties break
    low-index — same result every run."""
    import numpy as np

    rows = (corpus.select(c_id, c_vec)
            .orderBy(F.xxhash64(F.col(c_id).cast("string")), c_id)
            .limit(sample_cap).select(c_vec).collect())
    x = np.array([list(map(float, r[0])) for r in rows], dtype=np.float64)
    if len(x) == 0:
        # ADVICE r5: x[0] would raise an inscrutable IndexError
        raise ValueError("train_ivf_centroids: empty corpus — nothing to sample")
    n_cells = min(n_cells, len(x))
    picked = [0]
    d_min = ((x - x[0]) ** 2).sum(axis=1)
    for _ in range(n_cells - 1):
        if d_min.max() == 0:
            # fewer distinct points than n_cells: argmax over all-zero
            # distances would re-pick index 0 and emit duplicate centroids
            # (ADVICE r5) — truncate to the distinct-point count
            break
        nxt = int(d_min.argmax())
        picked.append(nxt)
        d_min = np.minimum(d_min, ((x - x[nxt]) ** 2).sum(axis=1))
    n_cells = len(picked)
    cents = x[picked].copy()
    for _ in range(iters):
        # (n, k) squared distances; argmin ties → lowest cell id
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def assign_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id as a Column: lexicographic min over
    (distance, cell-id) structs — deterministic argmin, row-local."""
    structs = [
        F.struct(_dist2(vec, c).alias("d"), F.lit(i).alias("c")) for i, c in enumerate(centroids)
    ]
    return F.least(*structs)["c"]


def _assign_cell_pd(centroids: list[list[float]]) -> "Column":
    """Vectorized (Arrow/pandas) nearest-centroid assignment — one numpy
    distance matrix per batch instead of n_cells interpreted _dist2 folds
    per row.  np.argmin ties break low-index, matching assign_cell's
    lexicographic (distance, cell) min."""
    import pandas as pd

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(v.to_numpy()).astype(np.float64)
        c = np.asarray(centroids, dtype=np.float64)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return assign


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    iters: int = 2,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed into k-means cells; each query
    scores only its n_probe nearest cells — the classic inverted-file index.

    The cell assignment is a map-side expression over the Iceberg/parquet
    scan; the probe is an equi-join on cell id, so scoring cost shrinks
    ~n_cells/n_probe-fold vs brute force.  At 100 TB the cell column is
    written once at ingest (partition-by-cell) and probes prune partitions."""
    cents = train_ivf_centroids(corpus, n_cells, iters, c_id, c_vec)
    # cell assignment + probe scoring run vectorized (Arrow/numpy, r6): the
    # per-row n_cells×dim interpreted distance folds and the per-pair
    # interpreted cosine were ~6 s of the gate at 20k×64 — same argmin
    # tie-break, same values at the round(·, 6) grid
    cb = corpus.withColumn("__cell", _assign_cell_pd(cents)(F.col(c_vec)))
    # per-query probe cells: sort the (distance, cell) structs, take n_probe
    # (|Q| rows — the interpreted form is fine here)
    probe_structs = F.array(*[
        F.struct(_dist2(F.col(q_vec), c).alias("d"), F.lit(i).cast("int").alias("c")) for i, c in enumerate(cents)
    ])
    qb = queries.withColumn(
        "__cell", F.explode(F.transform(F.slice(F.array_sort(probe_structs), 1, n_probe), lambda s: s["c"]))
    )
    scored = cb.join(F.broadcast(qb), "__cell").select(
        F.col(q_id),
        F.col(c_id).alias("neighbor_id"),
        F.round(_cosine_pd()(F.col(q_vec), F.col(c_vec)), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, "neighbor_id", "cos_sim", "rank")
    )


def embedding_topk_pairs(
    corpus: DataFrame,
    k: int = 20,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Global top-k most-similar (a, b) corpus pairs by cosine — the
    embedding near-dup report (exact).

    Blocked matrix form (r6): the corpus is hashed into B blocks and every
    unordered block pair (bi ≤ bj) becomes ONE task that computes its
    |bi|×|bj| dot-product matrix with BLAS (numpy float64) and emits only
    its local top-k candidates; the global top-k is a Spark
    ``orderBy().limit(k)`` over ≤ k·B(B+1)/2 candidate rows
    (TakeOrderedAndProject).  This replaces the r5 self-join whose per-pair
    zip_with/aggregate dot was evaluated INTERPRETED (higher-order
    functions are CodegenFallback) — measured 70 s → ~2 s on a 20 k-vector
    corpus at local[32].

    Scale shape: each vector is shuffled B+1 times (B ≈ √(2·parallelism)),
    so shuffle volume is O(N·√P) vector rows, never the N² pair space; the
    N² arithmetic happens inside BLAS at hardware speed.  Per-task memory
    is two blocks + one |bi|×|bj| float64 matrix — bound B so blocks stay
    ~10-50 k vectors at target scale.  For 100 TB corpora still prefer the
    LSH bucketing above; this exact variant is the oracle.

    Determinism: candidate selection inside a task orders by
    (round(dot, 6) DESC, a ASC, b ASC) — the same ordering the final Spark
    sort applies — so the survivors are exactly the global top-k."""
    import pandas as pd

    width = int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if n_blocks is None:
        # B(B+1)/2 group-tasks ≈ 2-4× the shuffle width keeps every core busy
        # without replicating vectors more than ~B+1 times
        n_blocks = max(2, int(round((4 * width) ** 0.5)))
    B = n_blocks

    base = corpus.select(F.col(c_id).alias("id"), F.col(c_vec).alias("v"),
                         F.pmod(F.xxhash64(F.col(c_id)), F.lit(B)).cast("int").alias("blk"))
    # side 0 = the block-row of the pair, side 1 = the block-column; the
    # diagonal group (bi == bj) receives the same block on both sides
    left = base.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("bj"),
        F.lit(0).alias("side"), "id", "v",
    )
    # the diagonal group reads its block from the LEFT side only (triu), so
    # the right side replicates to strictly-lower block ids; blk=0 yields an
    # empty/null sequence which explode (inner semantics) drops
    right = base.select(
        F.explode(F.when(F.col("blk") >= 1,
                         F.sequence(F.lit(0), F.col("blk") - 1))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit(1).alias("side"), "id", "v",
    )
    tagged = left.unionByName(right)

    def topk_block(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "dot": pd.Series(dtype="float64")})
        lp = pdf[pdf["side"] == 0]
        if lp.empty:
            return empty
        li = lp["id"].to_numpy(dtype=np.int64)
        lx = np.stack(lp["v"].to_numpy()).astype(np.float64)
        lx /= np.linalg.norm(lx, axis=1, keepdims=True)
        if pdf["bi"].iat[0] == pdf["bj"].iat[0]:
            # diagonal block: pairs within one block — strict upper triangle
            # over id-sorted rows gives each unordered pair once with a < b
            order = np.argsort(li, kind="stable")
            li, lx = li[order], lx[order]
            m = lx @ lx.T
            iu, ju = np.triu_indices(len(li), 1)
            a, b, d = li[iu], li[ju], m[iu, ju]
        else:
            rp = pdf[pdf["side"] == 1]
            if rp.empty:
                return empty
            ri = rp["id"].to_numpy(dtype=np.int64)
            rx = np.stack(rp["v"].to_numpy()).astype(np.float64)
            rx /= np.linalg.norm(rx, axis=1, keepdims=True)
            m = lx @ rx.T
            ai = np.broadcast_to(li[:, None], m.shape).ravel()
            bi_ = np.broadcast_to(ri[None, :], m.shape).ravel()
            d = m.ravel()
            a = np.minimum(ai, bi_)   # blocks are disjoint id sets: a < b
            b = np.maximum(ai, bi_)
        if len(d) > k:
            # order = (round6 DESC, a ASC, b ASC) — NaN (zero-norm vector)
            # sorts FIRST to match Spark's NaN-greatest descending order
            key = np.round(d, 6)
            key = np.where(np.isnan(key), np.inf, key)
            idx = np.lexsort((b, a, -key))[:k]
            a, b, d = a[idx], b[idx], d[idx]
        return pd.DataFrame({"a": a, "b": b, "dot": d})

    cand = tagged.groupBy("bi", "bj").applyInPandas(
        topk_block, schema="a long, b long, dot double")
    pairs = cand.select("a", "b", F.round("dot", 6).alias("cos_sim"))
    return pairs.orderBy(F.col("cos_sim").desc(), F.col("a"), F.col("b")).limit(k)


def embedding_lsh_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 8,
    multiprobe: int = 2,
    seed: int = 42,
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup (a, b, cos_sim) pairs via hyperplane-LSH bucketing
    — the SCALE path that replaces embedding_topk_pairs' exact self-join at
    100 TB: candidates come from an equi-join on bucket id (one side
    multiprobes up to ``multiprobe`` sign-flips), so cost follows
    Σ bucket_size² instead of |corpus|²; every candidate is then verified
    with the exact cosine, so precision is 1.0 by construction and recall
    follows the LSH S-curve (at cos ≥ 0.999, 8 planes, multiprobe=2 it is
    ≈ 0.999; the planted-dup gate pins ≥ 0.9).

    Planes are plan literals (no driver-side data), vectors are unit-
    normalized map-side so verification is a bare dot product, and the
    candidate join is explicitly widened against AQE's byte-based coalescing
    (the pair space is CPU-heavy but byte-small)."""
    if dim is None:
        dim = len(corpus.select(c_vec).first()[0])
    planes = _plane_literals(dim, n_planes, seed)
    width = int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    unit = corpus.select(F.col(c_id).alias("__id"), normalized(F.col(c_vec)).alias("__v"))
    unit = unit.withColumn("__b0", bucket_of(F.col("__v"), planes))
    right = unit.select(F.col("__id").alias("b"), F.col("__v").alias("__vb"),
                        F.col("__b0").alias("__bucket"))
    probes = [F.col("__b0")]
    if multiprobe >= 1:
        probes += [F.col("__b0").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                   for i in range(n_planes)]
    if multiprobe >= 2:
        probes += [
            F.col("__b0")
            .bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
            .bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), j))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    left = (
        unit.withColumn("__bucket", F.explode(F.array(*probes)))
        .select(F.col("__id").alias("a"), F.col("__v").alias("__va"), "__bucket")
        .repartition(width, "__bucket")
    )
    cand = (
        left.join(right, "__bucket")
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])          # (a,b) can meet in several probe buckets
    )
    return (
        cand.withColumn("cos_sim", F.round(_dot(F.col("__va"), F.col("__vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )


def write_embedding_fixture(
    path: str,
    n_base: int = 512,
    n_dups: int = 64,
    dim: int = 64,
    seed: int = 42,
    eps: float = 0.04,
) -> str:
    """Deterministic embedding corpus WITH planted near-duplicates: n_base
    unit vectors plus n_dups perturbed copies of the first n_dups (noise
    scale ``eps`` → cos ≈ 1/sqrt(1+eps²) ≈ 0.9992); at dim 64 random pairs
    stay below cos ≈ 0.6, so the exact pair set at any threshold ≥ 0.9 IS
    the planted set — ground truth for recall-gating approximate near-dup
    search.  Idempotent atomic single-file pyarrow write via the shared
    fixture writer (the Spark gate query and the DuckDB oracle both ensure
    it, so driver evaluation order cannot matter).  Dup vec_id = n_base + i
    for base id i."""
    from feathr_online_spark.datagen import write_parquet_fixture

    def build():
        import numpy as np
        import pyarrow as pa

        rng = np.random.default_rng(seed)
        base = rng.standard_normal((n_base, dim))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        noise = rng.standard_normal((n_dups, dim))
        noise /= np.linalg.norm(noise, axis=1, keepdims=True)
        dups = base[:n_dups] + eps * noise
        vecs = np.concatenate([base, dups]).astype(np.float32)
        ids = np.arange(len(vecs), dtype=np.int64)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), dim).cast(
            pa.list_(pa.float32())
        )
        return pa.table({"vec_id": pa.array(ids), "embedding": emb})

    return write_parquet_fixture(path, build)
