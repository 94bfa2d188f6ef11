"""pit_enrich (hot/cold split composite) must equal the all-plain pipeline."""

from datetime import datetime, timedelta

import numpy as np
from pyspark.sql import functions as F

from feathr_online_spark.operators.asof import asof_join
from feathr_online_spark.operators.pit import hot_entities, pit_enrich
from feathr_online_spark.operators.windows import forward_fill, rolling, sessionize
from tests.conftest import rows

BASE = datetime(2024, 1, 1)


def test_pit_enrich_equals_plain(spark):
    rng = np.random.default_rng(21)
    n = 2000
    ents = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 20, n))  # entity 0 hot
    secs = rng.choice(2 * 24 * 3600, size=n, replace=False)
    ev = [(int(e), BASE + timedelta(seconds=int(s)), i,
           None if rng.random() < 0.2 else float(np.round(rng.random(), 3)))
          for i, (e, s) in enumerate(zip(ents, secs))]
    events = spark.createDataFrame(ev, "entity long, event_time timestamp, eid long, f_scalar double")
    fts = [(int(rng.integers(0, 20)), BASE + timedelta(seconds=int(s)), float(np.round(rng.random(), 3)))
           for s in rng.choice(2 * 24 * 3600, size=800, replace=False)]
    features = spark.createDataFrame(fts, "entity long, feature_time timestamp, fv double")

    composite = pit_enrich(
        events, features,
        rolling_spec={"name": "hist_n", "col": "eid", "fn": "count", "rows": 4},
        session_gap=1800, ffill_cols=["f_scalar"],
        hot_threshold=300, bucket_seconds=4 * 3600,
    )

    plain = asof_join(events, features)
    plain = rolling(plain, {"hist_n": ("eid", "count")}, rows=4, include_current=False)
    plain = sessionize(plain, 1800)
    plain = forward_fill(plain, ["f_scalar"])

    assert sorted(composite.columns) == sorted(plain.columns)
    cols = sorted(plain.columns)
    assert rows(composite.select(cols)) == rows(plain.select(cols))


def test_hot_entities_detection(spark):
    df = spark.createDataFrame([(0,)] * 500 + [(1,)] * 10, "entity long")
    hot = [r.entity for r in hot_entities(df, threshold=100).collect()]
    assert hot == [0]
