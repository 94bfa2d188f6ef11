"""Round-6 optimization measurement harness (bench.py itself is FROZEN).

Times any subset of the declared queries with the noop sink (guide §1.4),
labels jobs (§1.5), and optionally dumps .explain("formatted") to
plans/r06/<name>_<tag>.txt.  Prints one JSON line per run.

Usage:
    python bench_extra.py --sf /root/testdata/sf1.0 --reps 2 \
        --queries embedding_pairs,dedup_clusters --plans before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default="")     # comma list; empty = all
    ap.add_argument("--plans", default="")       # tag -> dump plans/r06/<q>_<tag>.txt
    args = ap.parse_args()

    from feathr_online_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench_extra_r06")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm codegen

    qs = entrymod.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()] or list(qs)

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            try:
                df = fn(spark, args.sf)
                with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                    fh.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            except Exception as e:  # noqa: BLE001
                print(f"# plan dump failed for {name}: {e}", file=sys.stderr)
        best = None
        samples[name] = []
        for rep in range(max(args.reps, 1)):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples[name].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]} {samples[name]}", file=sys.stderr, flush=True)

    print(json.dumps({"sf": args.sf, "reps": args.reps, "queries": timings,
                      "samples": samples,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
