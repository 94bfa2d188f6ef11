"""Scaling-efficiency evidence for the north rule (BASELINE.md protocol).

Runs the IDENTICAL north-rule job on IDENTICAL input at two parallelism
levels — local[8] and local[32] — in separate JVMs, and reports throughput at
each plus scaling efficiency (T_32/T_8)/4.  Each JVM runs the job several
times and takes the MIN (robust to this box's ±2× timing noise).

Usage: python tools/scaling_bench.py [n_seq] [reps] [n_small] [n_big] [job]
``job`` ∈ plain | bucketed (default plain) — bucketed runs the skew-proof
fused path (bench.north_rule_job_bucketed), the one whose scaling the ≥0.8
criterion is about.
Prints one JSON line; also meant to be pasted into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from feathr_online_spark.session import get_spark
from bench import north_rule_job, north_rule_job_bucketed

spark = get_spark(app_name="scaling_bench")
spark.sparkContext.setLogLevel("ERROR")
job = north_rule_job_bucketed if {job!r} == "bucketed" else north_rule_job
df = job(spark, {seq!r}, {feat!r})
n = df.count()
times = []
for _ in range({reps}):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
print("RESULT " + json.dumps({{"rows": n, "times": times}}))
"""


def run_at(cpus: int, seq: str, feat: str, reps: int, job: str = "plain") -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = CHILD.format(repo=REPO, seq=seq, feat=feat, reps=reps, job=job)
    out = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True,
                         text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child (cpus={cpus}) produced no RESULT:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_seq = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    job = sys.argv[5] if len(sys.argv) > 5 else "plain"
    hot_frac = float(sys.argv[6]) if len(sys.argv) > 6 else None

    sys.path.insert(0, REPO)
    from feathr_online_spark import datagen

    fix = datagen.write_fixture(os.path.join(REPO, ".fixtures", "scaling"), n_seq=n_seq,
                                hot_frac=hot_frac)

    results = {}
    for cpus in (n_small, n_big):
        r = run_at(cpus, fix["sequences"], fix["features"], reps, job)
        best = min(r["times"])
        results[cpus] = {
            "rows": r["rows"],
            "times_sec": [round(t, 2) for t in r["times"]],
            "best_sec": round(best, 2),
            "rows_per_sec": round(r["rows"] / best, 1),
        }

    ratio = n_big / n_small
    eff = (results[n_big]["rows_per_sec"] / results[n_small]["rows_per_sec"]) / ratio
    print(json.dumps({
        "job": f"north_rule asof+features ({job})",
        "n_seq": n_seq,
        **({"hot_frac": hot_frac} if hot_frac is not None else {}),
        f"local{n_small}": results[n_small],
        f"local{n_big}": results[n_big],
        "scaling_efficiency_n_to_4n": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
