"""Re-measure dedup_minhash (VERDICT r3 'What's wrong #1'): min-of-5 in ONE JVM.

The driver's BENCH_r03 recorded 12.54 s at sf0.1 (min-of-2) vs 6.61 s in r2
and 6.56 s in the builder's own in-round SF1 run of identical code.  This
script pins the number with min-of-5, both cold-position (first query in the
session, mimicking suite-order effects) and warm.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from feathr_online_spark.session import get_spark
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="minhash_remeasure")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()

q = entrymod.queries()["dedup_minhash"]
reps = []
for i in range(5):
    t0 = time.time()
    q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    reps.append(round(time.time() - t0, 3))
print(json.dumps({"query": "dedup_minhash", "sf": SF_DIR, "reps": reps,
                  "min": min(reps), "median": sorted(reps)[2]}))
