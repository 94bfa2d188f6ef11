"""Relational operators: the reference DSL's 13 verbs (Pipeline), the
point-in-time core (asof, windows), and training-data ops (dedup, similarity,
text, multimodal)."""

from feathr_online_spark.operators.pipeline import Pipeline  # noqa: F401
from feathr_online_spark.operators.asof import asof_join  # noqa: F401
from feathr_online_spark.operators.windows import (  # noqa: F401
    forward_fill,
    lag_lead,
    rolling,
    sessionize,
)
