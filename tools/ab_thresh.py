"""A/B a set of queries() entries under two autoBroadcastJoinThreshold values."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = sys.argv[1].split(",")
THRESH = sys.argv[2]  # e.g. "10485760" or "67108864"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", THRESH)
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

qs = entrymod.queries()
out = {}
for name in QUERIES:
    t0 = time.time()
    qs[name](spark, SF).count()
    out[name] = round(time.time() - t0, 2)
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
print(json.dumps({"thresh": THRESH, "timings": out}))
spark.stop()
