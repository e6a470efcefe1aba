"""Session configuration the engine wants — shipped with the package.

The engine's hot path is DRIVER-side plan construction (the 16-update
mapping compile builds hundreds of DataFrames per pipeline run), so two
session settings matter to it specifically and are easy to miss when a
caller builds their own ``SparkSession``:

* ``spark.python.sql.dataFrameDebugging.enabled=false`` — PySpark's
  DataFrame-debugging origin capture wraps EVERY DataFrame/Column API
  call with a conf read plus a ``PySparkCurrentOrigin`` set/clear (3
  extra py4j round trips) and a Python ``inspect`` stack walk, purely to
  decorate error messages with the user call site. Measured on the
  16-update mapping compile (r13): 100.5k → 27.9k py4j round trips
  (−72%), compile 52.6 → 39.2 s. The cost is driver-side CPython/py4j
  work, identical at any cluster size; the only loss is the Python
  call-site line in JVM error messages — keep it on while developing,
  turn it off for production runs.
* ``spark.sql.adaptive.enabled=true`` (Spark's default since 3.2, stated
  so nobody turns it off globally): the engine's corpus-sized joins rely
  on AQE for partition coalescing and runtime join-strategy selection.
  (The incremental pipeline *scopes* AQE off around its delta-sized
  scratch work itself — see ``mappings.pipeline._delta_conf`` — callers
  don't need to.)

``ENGINE_SESSION_CONFS`` is the dict; :func:`apply_engine_confs` applies
it to a builder. Scale-dependent settings (shuffle partitions, memory)
are deliberately NOT set here — they belong to the deployment, not the
engine (see bench.py for the harness's local-mode choices).

Usage::

    from pyspark.sql import SparkSession
    from knowledge_graph_etl_spark.session import apply_engine_confs

    spark = apply_engine_confs(SparkSession.builder).getOrCreate()
"""

from __future__ import annotations

#: session settings the engine benefits from at ANY cluster size
ENGINE_SESSION_CONFS: dict[str, str] = {
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
}


def apply_engine_confs(builder, overrides: dict[str, str] | None = None):
    """Apply :data:`ENGINE_SESSION_CONFS` (plus ``overrides``) to a
    ``SparkSession.Builder`` and return it, chainable."""
    for k, v in {**ENGINE_SESSION_CONFS, **(overrides or {})}.items():
        builder = builder.config(k, v)
    return builder
