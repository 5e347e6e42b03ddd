"""Profile one bench query: run N times (noop sink), print each time,
dump .explain(formatted) to plans/r15/<name>_<tag>.txt, and print
per-job wall times via a status listener.

Usage: python tools/profile_query.py <name> [runs] [tag]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _micro() -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i
    return round(time.perf_counter() - t0, 3)


name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
tag = sys.argv[3] if len(sys.argv) > 3 else "before"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from etl_data_lake_spark.session import get_spark

spark = get_spark(app_name=f"profile-{name}")
from etl_data_lake_spark.queries.registry import queries

qs = dict(queries())
from etl_data_lake_spark.queries.vector_queries import ann_bench_queries

qs.update(ann_bench_queries())
from etl_data_lake_spark.queries.multimodal_queries import media_afp_near_dup
from etl_data_lake_spark.queries.dedup_queries import paragraph_dedup_docs

qs["afp_near_dup_pairs"] = media_afp_near_dup
qs["paragraph_dedup_docs"] = paragraph_dedup_docs

# warm: JVM + python worker pool (same as bench.py)
import pandas as pd
from pyspark.sql.functions import pandas_udf

qs["q01_top_parts_by_lineitems"](spark, sf_dir).write.format("noop").mode("overwrite").save()
def _inc_fn(s: pd.Series) -> pd.Series:
    return s + 1
_inc = pandas_udf(_inc_fn, "long")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.range(cpus * 100, numPartitions=cpus).select(_inc("id").alias("v")).write.format("noop").mode("overwrite").save()

print(f"MICRO(pre): {_micro()}s  [idle box ≈ 0.7s]", flush=True)
for i in range(runs):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    t_build = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    t_all = time.perf_counter() - t0
    print(f"RUN {i}: total={t_all:.3f}s build(driver-side)={t_build:.3f}s", flush=True)
print(f"MICRO(post): {_micro()}s", flush=True)

# job-level timing for one more run using the status tracker
st = spark.sparkContext.statusTracker()
before_jobs = set(st.getJobIdsForGroup(None) or [])
spark.catalog.clearCache()
t0 = time.perf_counter()
df = qs[name](spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
print(f"LISTENER RUN: {time.perf_counter()-t0:.3f}s")
jobs = [j for j in (st.getJobIdsForGroup(None) or []) if j not in before_jobs]
for j in sorted(jobs):
    ji = st.getJobInfo(j)
    if ji is None:
        continue
    stages = []
    tot_ms = 0
    for sid in ji.stageIds:
        si = st.getStageInfo(sid)
        if si:
            stages.append((sid, si.name.split("\n")[0][:60], si.numTasks))
    print(f"job {j}: stages={stages}")

with open(f"/root/repo/plans/r15/{name}_{tag}.txt", "w") as f:
    f.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
print("plan written")
spark.stop()
