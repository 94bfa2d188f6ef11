"""End-to-end training-corpus preparation: the composition every LLM data
pipeline runs before tokenization — language filter → quality threshold →
exact-dedup survivor selection → (optionally) near-dup survivor selection and
benchmark decontamination.

Each stage is one of the already-gated primitives (operators/text.py,
operators/dedup.py); this module owns the COMPOSITION so the whole prep is
one Catalyst plan: the filters are map-side and run before the dedup
shuffle, so the (fingerprint, id) exchange only carries rows that survived
the cheap predicates — at 100 TB that ordering is the difference between
shuffling the full corpus and shuffling the keep-set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feathr_online_spark.operators.dedup import decontaminate, dedup_survivors, exact_dedup
from feathr_online_spark.operators.text import lang_id, quality_score_bp


def prepare_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    langs: tuple[str, ...] = ("en",),
    min_quality_bp: int = 0,
    evalset: DataFrame | None = None,
    near_dup_pairs: DataFrame | None = None,
) -> DataFrame:
    """Surviving documents with their (lang_pred, quality_bp) annotations.

    Stage order is deliberate: map-side predicates (language, quality) first,
    exact dedup second (shuffle only the keep-set's fingerprints), then the
    optional near-dup survivor anti-join and eval-set decontamination.
    """
    annotated = df.withColumns({
        "lang_pred": lang_id(F.col(text_col)),
        "quality_bp": quality_score_bp(text_col),
    })
    kept = annotated.filter(
        F.col("lang_pred").isin(*langs) & (F.col("quality_bp") >= min_quality_bp)
    )
    kept = exact_dedup(kept, text_col, id_col)
    if near_dup_pairs is not None:
        kept = dedup_survivors(kept, near_dup_pairs, id_col)
    if evalset is not None:
        kept = decontaminate(kept, evalset, text_col, id_col)
    return kept
