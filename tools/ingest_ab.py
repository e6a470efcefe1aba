"""A/B the two JSON→quads ingest paths at volume (r11 verdict item 6):
the Arrow ``mapInPandas`` walker (ingest.json_to_quads) vs the JVM
VARIANT level walk (ingest_variant.json_to_quads_variant) on the
pipeline's own staging corpus (volume_documents), BOTH run orders in
one session — the CBO-methodology guard against warm-second-run bias
(BASELINE.md r11: the second run is ~20% warmer and once flipped an
apparent winner).

Usage: python tools/ingest_ab.py [n_companies] [rounds]
Prints one JSON line with per-path times per order plus quad counts.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from knowledge_graph_etl_spark.ingest import json_to_quads
from knowledge_graph_etl_spark.ingest_variant import json_to_quads_variant
from knowledge_graph_etl_spark.mappings.fixtures import volume_documents

docs = {
    k: (v.localCheckpoint(eager=True) if hasattr(v, "localCheckpoint") else v)
    for k, v in volume_documents(spark, n_companies=N).items()
}
frames = [v for v in docs.values() if hasattr(v, "count")]
print(json.dumps({"corpus_docs": sum(f.count() for f in frames)}), flush=True)


def run(fn):
    t0 = time.time()
    n = 0
    for f in frames:
        n += fn(f, "urn:g:staging").count()
    return round(time.time() - t0, 2), n


out = {"n_companies": N, "orders": []}
for rnd in range(ROUNDS):
    for order in (["walker", "variant"], ["variant", "walker"]):
        rec = {"round": rnd, "order": "->".join(order)}
        for name in order:
            fn = json_to_quads if name == "walker" else json_to_quads_variant
            sec, quads = run(fn)
            rec[name + "_sec"] = sec
            rec[name + "_quads"] = quads
        out["orders"].append(rec)
        print(json.dumps(rec), flush=True)

ws = [r["walker_sec"] for r in out["orders"]]
vs = [r["variant_sec"] for r in out["orders"]]
out["walker_median"] = sorted(ws)[len(ws) // 2]
out["variant_median"] = sorted(vs)[len(vs) // 2]
print(json.dumps(out))
spark.stop()
