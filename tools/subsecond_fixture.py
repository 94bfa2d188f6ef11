"""Dense sub-second events fixture: per-user gaps cluster at the 1800 s
session boundary and the 3600 s rolling-frame edge with microsecond jitter
(±0.5 s), so any engine/oracle disagreement in gap or range-frame time math
flips a boundary.  Values carry exactly 4 decimals so ``round(x, 4)`` is an
identity on both engines — the fixture isolates TIME math from cross-engine
double tie-rounding (Spark rounds half-up, DuckDB half-even; full-precision
driver data never lands exactly on a tie, but synthetic 6-decimal values
did).

Usage: python tools/subsecond_fixture.py [out_dir]
then:  python tools/check_oracle.py <out_dir> sessionize rolling pit_fused ...
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


def write(out_dir: str, n: int = 4000, seed: int = 777) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        p = f"{BASE_SF}/{t}.parquet"
        if os.path.exists(p):
            shutil.copy(p, f"{out_dir}/{t}.parquet")
    rng = np.random.default_rng(seed)
    user_id = rng.integers(0, 25, size=n)
    etype = rng.choice(["click", "view", "purchase", "error"], size=n,
                       p=[0.4, 0.3, 0.2, 0.1])
    value = np.round(rng.uniform(0, 100, size=n), 4)
    base = 1_704_067_200_000_000  # 2024-01-01 in micros
    ts = np.zeros(n, dtype=np.int64)
    cur = {u: base + int(rng.integers(0, 1_000_000)) for u in range(25)}
    for i in range(n):
        r = rng.random()
        if r < 0.5:
            gap = int(rng.integers(1, 900_000))                          # sub-second
        elif r < 0.75:
            gap = int(1_800_000_000 + rng.integers(-500_000, 500_000))   # session edge
        else:
            gap = int(3_600_000_000 + rng.integers(-500_000, 500_000))   # frame edge
        cur[user_id[i]] += gap
        ts[i] = cur[user_id[i]]
    props = np.array(['{"k": "%d"}' % k for k in rng.integers(0, 50, size=n)])
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(user_id.astype(np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]"), type=pa.timestamp("us")),
        "event_type": pa.array(etype),
        "value": pa.array(value),
        "props": pa.array(props),
    })
    pq.write_table(tbl, f"{out_dir}/events.parquet")
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures", "subsecond")
    print("wrote", write(out))
