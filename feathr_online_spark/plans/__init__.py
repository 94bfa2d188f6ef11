"""Scale/ops helpers: skew salting, lineage metrics, checkpoint/resume."""

from feathr_online_spark.plans.salting import salted_join, with_salt  # noqa: F401
from feathr_online_spark.plans.lineage import partition_lineage  # noqa: F401
from feathr_online_spark.plans.checkpoint import (  # noqa: F401
    load_done_partitions,
    mark_done,
    resume_filter,
)
