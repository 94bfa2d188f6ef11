"""Key salting for skewed joins/aggregations.

The synthetic (and real) workloads have Zipf-hot ``doc_id``/``source`` keys; a
shuffle on such a key sends one reducer 100× the median partition.  AQE's
skew-join splitting handles the join case at runtime, but explicit salting is
the deterministic tool (and the north_star demands it): spread the hot side
across K sub-keys, replicate the small side K ways, join on (key, salt).

Pure column ops — the salt is ``pmod(xxhash64(...random-ish row bits...), K)``
on the big side and an ``explode(sequence(0, K-1))`` replication on the small
side, so everything remains one declarative plan Catalyst can optimize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    k: int,
    salt_col: str = "__salt",
    from_cols: list[str] | None = None,
    per_row: bool = False,
) -> DataFrame:
    """Add a salt in [0, k): deterministic hash over ``from_cols`` (default:
    all columns) — with ``per_row=False`` the salt is stable across retries,
    unlike rand().

    ``per_row=True`` mixes ``monotonically_increasing_id()`` into the hash:
    byte-identical rows (re-crawled duplicate documents under one hot key —
    the very skew the dedup operators exist for) would otherwise all hash to
    ONE salt and the spread degenerates to the unsalted straggler.  The
    trade-off: ``monotonically_increasing_id()`` is NOT deterministic under
    stage retries / AQE recomputation, so ``per_row=True`` FORFEITS the
    retry-stability promise above.  It is only safe where any salt value is
    correct for every row — i.e. JOIN spreading against a fully replicated
    small side (``salted_join``, whose replicas serve every salt).  Do not
    use it in retry-sensitive contexts (e.g. a salt persisted across stages,
    or partitioning a distinct-count — see salted_aggregate)."""
    cols = [F.col(c) for c in (from_cols or df.columns)]
    if per_row:
        cols = [*cols, F.monotonically_increasing_id()]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(k)))


def replicate(df: DataFrame, k: int, salt_col: str = "__salt") -> DataFrame:
    """Replicate every row k times with salt 0..k-1 (the small/dimension side
    of a salted join)."""
    return df.withColumn(salt_col, F.explode(F.sequence(F.lit(0), F.lit(k - 1))))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    k: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot values of ``on``: salt the big side,
    replicate the small side k ways, join on (on, salt).  Post-join the salt
    is dropped.  k≈8-32 suffices for Zipf skew; beyond that the replication
    cost of the small side dominates."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # right/full outer would surface each unmatched small-side row k
        # times (one per replica) — silently corrupt results
        raise ValueError(f"salted_join does not support how={how!r}: the small "
                         f"side is replicated {k}×, so unmatched small-side rows "
                         f"of an outer join would duplicate")
    keys = [on] if isinstance(on, str) else list(on)
    # per_row: duplicate-heavy hot keys (identical rows hash to one salt)
    # still spread; join correctness is unaffected — every small-side
    # replica carries every salt value
    b = with_salt(big, k, per_row=True)
    s = replicate(small, k)
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    k: int,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: group on (keys, salt) with
    the partial aggregate, then on keys with the merge aggregate.

    ``aggs`` maps output name → (partial_expr, merge_expr_builder) where the
    merge expr references the partial's column name, e.g.::

        salted_aggregate(df, ["source"], {
            "cnt": (F.count(F.lit(1)), F.sum("cnt")),
            "sum_v": (F.sum("value"), F.sum("sum_v")),
        }, k=16)

    ``salt_from`` is REQUIRED for distinct-style partials: the salt
    partitions the rows, so a countDistinct partial is only mergeable by
    SUM when all copies of each distinct value land in ONE salt bucket —
    i.e. the salt must be a function of the distinct-target column::

        salted_aggregate(df, ["source"], {
            "du": (F.countDistinct("user"), F.sum("du")),
        }, k=16, salt_from=["user"])

    (The all-columns default would split one user's rows across salts and
    the sum would overcount.)  Algebraic aggregates (count/sum/min/max) are
    merge-safe under any salt.

    Note: Spark's own partial+final hash agg already does this for algebraic
    aggregates — reach for salted_aggregate only for the cases it can't help
    (exact distinct-count per hot key, collect-based aggs).
    """
    salt_cols = [F.col(c) for c in (salt_from or df.columns)]
    partial = df.withColumn("__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(k)))
    p = partial.groupBy(*keys, "__salt").agg(*[pexpr.alias(name) for name, (pexpr, _) in aggs.items()])
    return p.groupBy(*keys).agg(*[mexpr.alias(name) for name, (_, mexpr) in aggs.items()])
