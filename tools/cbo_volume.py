"""Measure Engine(stats=True) cost-based BGP join ordering at VOLUME
(r10 verdict #8): run the full 10k-company pipeline lifecycle twice in
one session — stats off, then stats on — and print both wall-clocks plus
the organizations-graph quad counts (must match).

What stats=True changes: each update's BGP compiles with
store.predicate_stats() seeded into the compile context, so the
cost-based orderer sorts triple patterns by predicate cardinality
instead of textual order (plans/compiler.py). The cache is prefetched
once before the jobs=N fan-out (r11) so threads don't race a cold cache.

Usage: python tools/cbo_volume.py [n_companies] [--jobs N]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10000
JOBS = 1
if "--jobs" in sys.argv:
    _ji = sys.argv.index("--jobs") + 1
    if _ji >= len(sys.argv) or not sys.argv[_ji].isdigit():
        sys.exit("usage: cbo_volume.py [N] --jobs <int>")
    JOBS = int(sys.argv[_ji])

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from knowledge_graph_etl_spark.engine import GRAPH_NS, Engine
from knowledge_graph_etl_spark.mappings import run_pipeline
from knowledge_graph_etl_spark.mappings.fixtures import volume_documents

SPARQL_DIR = "/root/reference/airflow_files/dags/sparql"
docs = {
    k: v.localCheckpoint(eager=True)
    for k, v in volume_documents(spark, n_companies=N).items()
}

order = (
    (True, False) if "--reverse" in sys.argv else (False, True)
)  # run both orders to deconfound same-session warmth
results = {}
for stats in order:
    path = tempfile.mkdtemp(prefix=f"cbo_{stats}_")
    eng = Engine(spark, store_path=path, stats=stats)
    t0 = time.time()
    run_pipeline(
        eng,
        docs,
        SPARQL_DIR,
        run_id=f"cbo-{stats}",
        ts="2024-01-01T00:00:00+00:00",
        env="qas",
        optimize=True,
        jobs=JOBS,
    )
    sec = round(time.time() - t0, 1)
    quads = eng.store.graph(GRAPH_NS + "organizations").count()
    results[f"stats={stats}"] = {"sec": sec, "quads": quads}
    print(f"stats={stats}: {sec}s, {quads} quads", flush=True)
    shutil.rmtree(path, ignore_errors=True)

same = len({v["quads"] for v in results.values()}) == 1
print({"results": results, "quads_equal": same})
spark.stop()
