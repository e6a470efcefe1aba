"""Run a named sequence of queries() entries with the exact bench config,
printing per-query wall-clock — for bisecting cross-query interference."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

names = sys.argv[1].split(",")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    # match bench.py (r13): origin-capture off, so solo pins stay
    # comparable with in-bench timings
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

qs = entrymod.queries()
qs.update(getattr(entrymod, "bench_only_queries", dict)())
# every run is recorded (repeated names no longer overwrite), so
# "q,q,q,q,q" gives the n=5 solo-pin protocol its raw series + median
out = {}
for name in names:
    t0 = time.time()
    qs[name](spark, SF).count()
    out.setdefault(name, []).append(round(time.time() - t0, 2))
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark._jvm.System.gc()


def _median(xs):
    s = sorted(xs)
    return round(
        s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2, 3
    )


print(
    json.dumps(
        {
            n: (v[0] if len(v) == 1 else {"runs": v, "median": _median(v)})
            for n, v in out.items()
        }
    )
)
spark.stop()
