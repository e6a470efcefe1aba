"""Benchmark harness: run every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query is timed as a full action (df.count() after the plan is built) —
wall-clock includes scan, shuffle, and result materialization. value = total
seconds across all queries.

Protocol decision (r14, closing the r13 judge's open item): the DEFAULT
run is ONE session with adaptive retry + fresh-JVM escalation as the
in-run adjudicator; shard mode (SPARK_GRAFT_BENCH_SHARDS=N — sequential
fresh-JVM slices) stays OPT-IN. Rationale: sharding removes positional
JVM-state humps structurally but costs a measured +9% total (N-1 extra
JVM+warmup startups) and changes what the headline total means
mid-history; the retry/escalation machinery classifies the same humps at
measurement time without perturbing the recorded first-run totals, and
the r13/r14 runs adjudicated every breach it flagged. Read a single
entry's regression verdict from min(first, retry, fresh) — over_bar —
never from the first-run number alone. Round-over-round comparisons must
read the committed BENCH_local.json (complete record), not a captured
stdout tail, which is how the r12 payload was lost (BENCH_r12.json
parsed: null).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _jvm_probe(spark) -> dict:
    """Per-entry accumulation probe (SPARK_GRAFT_BENCH_PROBE=1): what, if
    anything, survives the per-entry clearCache+unpersist+System.gc and
    builds up across a 232-entry run (r12 verdict, What's wrong #1 —
    table_profile 9.27 s at bench position ~207 vs 0.83 s solo on the
    same box). Candidates and why each is measured:

    * heap_mb — driver old-gen survivors right after the full GC;
    * metaspace_mb — codegen classes whose loaders something retains;
    * codecache_mb (segmented pools summed) + jit_ms — a JIT code cache
      near its 240 MB default stops compilation ("CodeCache is full")
      and flushing causes recompile storms: the one candidate that
      produces exactly the observed late-run MOVING humps;
    * gc_ms — cumulative collector time (pause inflation shows up as a
      growing per-entry delta);
    * shuffle_mb / shuffle_files — spark.local.dir residue: shuffle
      cleanup via ContextCleaner is ASYNC for shuffles, so files can
      outlive the GC that enqueued them and their deletion I/O lands
      inside later entries' timings;
    * py4j_pool — Python-side JavaObject bindings (a leak here pins JVM
      objects); temp_views — catalog growth; threads — executor/cleaner
      thread leaks.

    Cost: a handful of py4j calls + one os.walk of the block-manager
    dirs, ~10-50 ms per entry, probe-mode only (never in driver runs)."""
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory
    heap = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed()
    pools = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        pools[p.getName()] = p.getUsage().getUsed()
    meta = pools.get("Metaspace", 0)
    code = sum(v for k, v in pools.items() if k.startswith("CodeHeap"))
    jit = mf.getCompilationMXBean().getTotalCompilationTime()
    gc_ms = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc_ms += it.next().getCollectionTime()
    shuffle_bytes = 0
    shuffle_files = 0
    try:
        dirs = jvm.org.apache.spark.SparkEnv.get().blockManager().diskBlockManager().localDirs()
        for d in dirs:
            for root, _subdirs, files in os.walk(d.getAbsolutePath()):
                for f in files:
                    try:
                        shuffle_bytes += os.path.getsize(os.path.join(root, f))
                        shuffle_files += 1
                    except OSError:
                        pass
    except Exception:  # noqa: BLE001 - probe must never break the bench
        shuffle_bytes = -1
    return {
        "heap_mb": round(heap / 1e6),
        "metaspace_mb": round(meta / 1e6),
        "codecache_mb": round(code / 1e6),
        "jit_ms": jit,
        "gc_ms": gc_ms,
        "shuffle_mb": round(shuffle_bytes / 1e6),
        "shuffle_files": shuffle_files,
        "py4j_pool": len(spark.sparkContext._gateway.gateway_property.pool),
        "temp_views": len(spark.catalog.listTables()),
        "threads": jvm.java.lang.Thread.activeCount(),
    }


#: setup fixture → the bench entries that probe it (the untimed ensure_*
#: warmups only run in a shard whose slice contains a dependent entry)
_SETUP_DEPENDENTS = {
    "ensure_steady_index": ("dedup_incremental_steady",),
    "ensure_knn_adjacency": ("ann_beam_topk",),
    "ensure_text_index": ("search_bm25_steady",),
    "ensure_volume_base": ("kg_pipeline_incremental", "kg_volume_read"),
}


def _parent(shards: int) -> int:
    """Sharded driver (r12 verdict, What's wrong #1): run the bench as
    ``shards`` SEQUENTIAL child processes, each a FRESH JVM covering a
    contiguous alphabetical slice, then merge per-query timings and run
    the drift/bar tripwires over the union. Rationale (measured, r13
    probe run — BASELINE.md): per-entry clearCache+unpersist+GC cannot
    clear JVM-level state — the JIT code cache grows 77→149 MB across
    one 232-entry session (240 MB default cap; a fuller cache = sweep/
    recompile storms, the observed late-run moving humps), live threads
    grow 512→771, and the kg_pipeline_* entries pin ~220 MB of shuffle
    files for the rest of the run (their shuffle deps are referenced by
    the shared volume-store state by design). A new PROCESS resets all
    three; an in-place SparkSession restart resets none of the JVM part.
    Children run sequentially (never concurrently: they'd fight for the
    32 cores and the Derby metastore lock) and share the warehouse, so
    the volume base still builds once."""
    import json as _json
    import subprocess
    import tempfile

    import __spark_entry__ as entrymod

    names = sorted(
        set(entrymod.queries())
        | set(getattr(entrymod, "bench_only_queries", dict)())
    )
    bounds = [round(i * len(names) / shards) for i in range(shards + 1)]
    merged: dict[str, float] = {}
    merged_retries: dict[str, float] = {}
    merged_fresh: dict[str, float] = {}
    for i in range(shards):
        lo, hi = bounds[i], bounds[i + 1]
        if lo == hi:
            continue
        out = tempfile.NamedTemporaryFile(
            prefix=f"bench_shard{i}_", suffix=".json", delete=False
        ).name
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_SLICE"] = f"{lo}:{hi}"
        env["SPARK_GRAFT_BENCH_OUT"] = out
        if os.environ.get("SPARK_GRAFT_BENCH_PROBE"):
            env["SPARK_GRAFT_BENCH_PROBE_PATH"] = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                f"BENCH_probe.shard{i}.jsonl",
            )
        print(
            f"# shard {i + 1}/{shards}: entries {lo}..{hi - 1} "
            f"({names[lo]}..{names[hi - 1]})",
            file=sys.stderr,
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env
        )
        if proc.returncode != 0:
            print(f"# shard {i} exited rc={proc.returncode}", file=sys.stderr)
        try:
            with open(out) as fh:
                child = _json.load(fh)
            merged.update(child.get("queries", {}))
            merged_retries.update(child.get("retries", {}))
            merged_fresh.update(child.get("fresh", {}))
        except (OSError, ValueError) as e:
            print(f"# shard {i}: no result ({e})", file=sys.stderr)
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass
    _finish(merged, None, merged_retries, merged_fresh)
    return 0


def main() -> int:
    loadavg_launch = tuple(round(x, 2) for x in os.getloadavg())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    shards = int(os.environ.get("SPARK_GRAFT_BENCH_SHARDS", "1"))
    slice_env = os.environ.get("SPARK_GRAFT_BENCH_SLICE")
    if shards > 1 and slice_env is None:
        return _parent(shards)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("kg-etl-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default (10 MB) broadcast threshold on purpose: dimension-side
        # broadcasts are explicit `F.broadcast` hints; a high threshold
        # makes Catalyst broadcast one side of the dedup self-joins, which
        # kills the ReusedExchange that lets the inverted index / banded
        # signatures be computed once for both sides

        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # r13 (guide §4/§5): PySpark's DataFrame-debugging origin capture
        # wraps EVERY DataFrame/Column API call with a conf.get + a
        # PySparkCurrentOrigin.set/clear — 3 extra py4j round-trips plus a
        # Python `inspect` stack walk per call. Measured on the 16-update
        # mapping compile: 100.5k -> 27.9k round-trips (-72%) with it off.
        # Driver-side cost only, identical on any cluster size; the only
        # loss is the Python call-site line in JVM error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # JVM/codegen warm-up on synthetic data (no test tables touched): the
    # first query otherwise pays ~4 s of one-time class-loading + codegen
    # compilation that belongs to the session, not to that query
    from pyspark.sql import functions as F

    warm = spark.range(1_000_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    warm.groupBy("k").count().join(
        F.broadcast(spark.range(97).withColumnRenamed("id", "k")), "k"
    ).count()
    # OS page-cache warm-up: touch every test-table parquet once so the
    # FIRST query to read a table doesn't absorb its cold-read cost (r06
    # measured ann_embedding_neardup 3.20 s cold-front vs 0.86 s warm —
    # purely the embeddings.parquet cold read landing on whichever query
    # sorts first alphabetically in its table's family)
    import glob as _glob

    # raw byte read for every file: a Spark count() is served from the
    # parquet FOOTER (empty projection, no data pages), so it would warm
    # nothing — only a full byte read actually pulls contents into cache
    for pq in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        with open(pq, "rb") as fh:
            while fh.read(1 << 24):
                pass
    # codegen warm-up for the minhash machinery: the tokenize→32-way-min→
    # band→self-join pipeline compiles ~10 s of whole-stage-codegen classes
    # the first time it runs in a session; without this, whichever dedup-
    # family query sorts first alphabetically (curation_pipeline_v2)
    # absorbs that one-time cost (r07 A/B: 30.6 s first run vs 17.6 s with
    # this warmup, identical code)
    from knowledge_graph_etl_spark.extensions.dedup import corpus_dedup

    synth = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha beta"),
            (F.col("id") % 7).cast("string"),
            (F.col("id") % 3).cast("string"),
        ).alias("text"),
    )
    corpus_dedup(synth, num_hashes=32, bands=4, threshold=0.8, hash_fn="md5").count()

    # entry list up front (queries() builds a dict, no Spark touched):
    # in shard-child mode only this slice's entries run, and the ensure_*
    # setups below are gated on whether a dependent entry is in-slice
    all_queries = dict(entrymod.queries())
    # throughput-only variants (no DuckDB oracle — e.g. xxhash64 scale
    # paths) are benched but deliberately absent from the correctness gate
    all_queries.update(getattr(entrymod, "bench_only_queries", dict)())
    # ALPHABETICAL bench order, decoupled from the registry's rotating
    # correctness-window order: run position shifts measured 1.5-2x swings
    # on heavy compositions (curation_pipeline_v2 16.9 -> 31.2 s when its
    # position moved, r06), so a stable order is a precondition for
    # meaningful round-over-round comparison
    names = sorted(all_queries)
    if slice_env is not None:
        lo, hi = (int(x) for x in slice_env.split(":"))
        names = names[lo:hi]
    run_set = set(names)

    def _needs(setup_name: str) -> bool:
        return slice_env is None or any(
            dep in run_set for dep in _SETUP_DEPENDENTS[setup_name]
        )

    # UNTIMED setup: one-time corpus indexing for the steady-state dedup
    # entry. The operator's point is the probe-only cost against a
    # prebuilt bucketed index; a fresh session's in-memory catalog would
    # otherwise charge the full corpus rebuild to the timed entry
    # (measured 4.8 s rebuild-inclusive vs ~3 s probe-only, r07).
    setup = getattr(entrymod, "ensure_steady_index", None)
    if setup is not None and _needs("ensure_steady_index"):
        setup(spark, sf_dir)
        # one untimed probe: the FIRST probe of a session pays ~3 s of
        # one-time whole-stage-codegen for the probe join pipeline (r08
        # solo A/B: 6.6 s first probe vs 3.2-3.4 s steady) — session
        # cost, not operator cost, same rationale as the minhash warmup
        entrymod.dedup_incremental_steady_q(spark, sf_dir).count()
    # same pattern for the graph-ANN adjacency index: build untimed so
    # ann_beam_topk measures the bucket-pruned probe, not the knn-graph
    # rebuild (one untimed probe for the same codegen rationale)
    setup_knn = getattr(entrymod, "ensure_knn_adjacency", None)
    if setup_knn is not None and _needs("ensure_knn_adjacency"):
        setup_knn(spark, sf_dir)
        entrymod.ann_beam_topk_q(spark, sf_dir).count()
    # and for the steady-state inverted text index: search_bm25_steady
    # measures the bucket-pruned probe, not the one-time corpus tokenize
    setup_txt = getattr(entrymod, "ensure_text_index", None)
    if setup_txt is not None and _needs("ensure_text_index"):
        setup_txt(spark, sf_dir)
        entrymod.search_bm25_steady_q(spark, sf_dir).count()
    # and the 10k-company volume store + seeded derivation ledger:
    # kg_pipeline_incremental measures steady-state maintenance, not the
    # one-time base build (cached per warehouse via a marker file)
    setup_vol = getattr(entrymod, "ensure_volume_base", None)
    if setup_vol is not None and _needs("ensure_volume_base"):
        try:
            setup_vol(spark, sf_dir)
        except RuntimeError:
            pass  # reference sparql dir absent: the entry will error too
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    spark._jvm.System.gc()

    timings: dict[str, float] = {}
    probe_fh = None
    if os.environ.get("SPARK_GRAFT_BENCH_PROBE"):
        probe_fh = open(
            os.environ.get(
                "SPARK_GRAFT_BENCH_PROBE_PATH",
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_probe.jsonl",
                ),
            ),
            "w",
        )
    def _reset() -> None:
        # queries are independent: drop caches (in-memory store unions) AND
        # localCheckpoint RDDs (clearCache doesn't touch those) so one
        # query's residue doesn't GC-thrash the next — matches how each
        # would run in its own job at scale; then force a full GC so one
        # query's garbage (shuffle buffers, broadcast blocks, unrolled
        # cache pages) isn't paid for as GC pauses inside the NEXT query's
        # timing — measured 2-4x inflation on late queries without this
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark._jvm.System.gc()

    # bars for the ADAPTIVE RETRY (r13, measured — BASELINE.md "r13: the
    # bench harness's in-run accumulation"): an entry that exceeds 2x its
    # bar in-run is re-run ONCE after the standard reset, and only a
    # breach that PERSISTS on the retry reports as over_bar. The r12/r13
    # evidence is that in-run breaches are overwhelmingly positional
    # session state (cold JIT profile up front, accumulation late on a
    # degraded host): every judged breach of r12 adjudicated to at-record
    # solo. The retry IS that adjudication, at measurement time, inside
    # the same session — a real regression stays >2x on the second run.
    # First-run timings remain the recorded values (totals stay
    # comparable); retries are reported alongside.
    sf_is_bench = os.path.basename(sf_dir.rstrip("/")) == "sf0.1"
    bars_for_retry: dict = {}
    if sf_is_bench:
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tools",
                    "bench_bars.json",
                )
            ) as fh:
                bars_for_retry = json.load(fh)
        except (OSError, ValueError):
            bars_for_retry = {}
    retries: dict[str, float] = {}
    # Fresh-JVM escalation (r13, second iteration — measured): the
    # in-session retry re-runs in the SAME degraded JVM, so JVM-level
    # state (JIT code-cache sweeps, thread growth, pinned shuffle files
    # — the probe-run findings above) makes breaches "persist" on retry
    # while the identical entry runs at-bar solo minutes later
    # (graph_pagerank: 16.9s in-bench + 15.4s retry vs 6.0s solo median
    # the same hour, unchanged code). A breach that persists on retry
    # is therefore adjudicated ONCE MORE in a fresh child process via
    # tools/seq_bench.py (two runs; the first warms the JVM, the min is
    # the verdict) — the manual n=5 solo-pin protocol's decision rule,
    # automated at measurement time. Capped at 12 escalations per run
    # (~40s each) so a pathological day degrades loudly, not endlessly;
    # the cap being hit is logged (no silent caps).
    fresh: dict[str, float] = {}
    max_escalations = int(os.environ.get("SPARK_GRAFT_BENCH_ESCALATIONS", "12"))

    pos = 0
    for name in names:
        fn = all_queries[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"# bench error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        _reset()
        bar = bars_for_retry.get(name, {}).get("bar", 0)
        if bar > 0 and timings[name] > 2.0 * bar:
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
                retries[name] = round(time.time() - t0, 3)
                print(
                    f"# retry {name}: {timings[name]:.2f}s first run "
                    f"(bar {bar:.2f}), {retries[name]:.2f}s on retry",
                    file=sys.stderr,
                )
            except Exception:  # noqa: BLE001 - keep the first timing
                pass
            _reset()
            if retries.get(name, timings[name]) > 2.0 * bar:
                if len(fresh) >= max_escalations:
                    print(
                        f"# fresh-JVM escalation SKIPPED for {name}: cap "
                        f"of {max_escalations} reached — treat this "
                        "run's over_bar as host-suspect",
                        file=sys.stderr,
                    )
                else:
                    import subprocess

                    here_dir = os.path.dirname(os.path.abspath(__file__))
                    child_env = dict(os.environ)
                    child_env["PYTHONPATH"] = here_dir
                    try:
                        cp = subprocess.run(
                            [
                                sys.executable,
                                os.path.join(here_dir, "tools", "seq_bench.py"),
                                f"{name},{name}",
                            ],
                            env=child_env,
                            capture_output=True,
                            text=True,
                            timeout=600,
                        )
                        data = json.loads(cp.stdout.strip().splitlines()[-1])
                        v = data[name]
                        runs = v["runs"] if isinstance(v, dict) else [v]
                        fresh[name] = min(runs)
                        print(
                            f"# fresh-JVM adjudication {name}: runs {runs} "
                            f"-> {fresh[name]:.2f}s (bar {bar:.2f})",
                            file=sys.stderr,
                        )
                    except Exception as e:  # noqa: BLE001 - keep in-session values
                        print(
                            f"# fresh-JVM adjudication {name} failed: {e}",
                            file=sys.stderr,
                        )
        if probe_fh is not None:
            rec = {"pos": pos, "query": name, "sec": timings[name]}
            rec.update(_jvm_probe(spark))
            rec["loadavg1"] = round(os.getloadavg()[0], 2)
            probe_fh.write(json.dumps(rec) + "\n")
            probe_fh.flush()
        pos += 1

    if probe_fh is not None:
        probe_fh.close()

    if slice_env is not None:
        # shard child: the parent merges and runs the tripwires once
        out_path = os.environ["SPARK_GRAFT_BENCH_OUT"]
        with open(out_path, "w") as fh:
            json.dump(
                {"queries": timings, "retries": retries, "fresh": fresh}, fh
            )
        spark.stop()
        return 0

    _finish(timings, loadavg_launch, retries, fresh)
    spark.stop()
    return 0


def _finish(
    timings: dict[str, float],
    loadavg_launch: tuple | None = None,
    retries: dict[str, float] | None = None,
    fresh: dict[str, float] | None = None,
) -> None:
    """Tripwires + payload over the (merged) per-query timings: drift vs
    the previous committed run, per-entry 2x bars, the ONE stdout JSON
    line, and the complete BENCH_local.json record."""
    if loadavg_launch is None:
        loadavg_launch = tuple(round(x, 2) for x in os.getloadavg())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Drift tripwire (r08 verdict item 7): compare the shared-entry sum
    # against the newest committed BENCH_r{N}.json at measurement time,
    # alongside the launch load average — so "machine state vs real
    # regression" is decided from evidence recorded WITH the run, not
    # reconstructed afterwards. > ~1.15x on a settled box (low loadavg)
    # means bisect, don't attribute.
    loadavg = loadavg_launch
    shared_sum_vs_prev = None
    here = os.path.dirname(os.path.abspath(__file__))
    # the previous run's full record is the on-disk BENCH_local.json as
    # of launch (read before this run overwrites it) — the driver's
    # BENCH_r{N}.json wrappers hold only a truncated stdout tail
    prev_path = os.environ.get(
        "SPARK_GRAFT_BENCH_PREV", os.path.join(here, "BENCH_local.json")
    )
    if os.path.isfile(prev_path):
        prev_file = os.path.basename(prev_path)
        try:
            with open(prev_path) as fh:
                prev_payload = json.load(fh)
            prev_q = (
                prev_payload.get("queries", {})
                if prev_payload.get("sf") == sf_val
                else {}  # different scale factor: nothing comparable
            )
            shared = [
                q
                for q in timings
                if timings[q] >= 0 and prev_q.get(q, -1) >= 0
            ]
            cur_sum = sum(timings[q] for q in shared)
            prev_sum = sum(prev_q[q] for q in shared)
            if prev_sum > 0:
                shared_sum_vs_prev = {
                    "ratio": round(cur_sum / prev_sum, 3),
                    "n_shared": len(shared),
                    "cur_sum": round(cur_sum, 1),
                    "prev_sum": round(prev_sum, 1),
                    "prev_file": prev_file,
                }
                print(
                    f"# drift: shared-entry sum {cur_sum:.1f}s vs "
                    f"{prev_sum:.1f}s in {prev_file} "
                    f"({cur_sum / prev_sum:.3f}x over {len(shared)} "
                    f"shared entries); loadavg at launch {loadavg}",
                    file=sys.stderr,
                )
        except (OSError, ValueError, KeyError) as e:
            print(f"# drift tripwire skipped: {e}", file=sys.stderr)
    # Per-entry bar tripwire (r09 verdict item 4): the shared-sum check
    # above is blind to slow creep (+20%/round never trips a previous-run
    # comparison yet compounds to 2.5x — agg_hist_quantiles r07..r09), so
    # every entry is ALSO checked against its first-recorded-or-pinned
    # bar in tools/bench_bars.json (see tools/make_bench_bars.py). The
    # 2x threshold is the repo's standing per-query regression bar.
    over_bar = None
    retries = retries or {}
    fresh = fresh or {}
    bars_path = os.path.join(here, "tools", "bench_bars.json")
    if os.path.isfile(bars_path) and sf_val == 0.1:
        try:
            with open(bars_path) as fh:
                bars = json.load(fh)

            def _eff(q: str) -> float:
                # adaptive retry + fresh-JVM escalation (r13): a breach
                # must persist on the in-session re-run AND on the
                # fresh-process adjudication to report — min(first,
                # retry, fresh) is checked against the bar; "cur" stays
                # the first run so totals remain comparable across rounds
                vals = [timings[q]]
                if retries.get(q) is not None and retries[q] >= 0:
                    vals.append(retries[q])
                if fresh.get(q) is not None and fresh[q] >= 0:
                    vals.append(fresh[q])
                return min(vals)

            over_bar = [
                {
                    "query": q,
                    "cur": timings[q],
                    "retry": retries.get(q),
                    "fresh": fresh.get(q),
                    "bar": bars[q]["bar"],
                    "ratio": round(_eff(q) / bars[q]["bar"], 2),
                    "bar_source": bars[q]["source"],
                }
                for q in sorted(timings)
                if timings[q] >= 0
                and q in bars
                and bars[q]["bar"] > 0
                and _eff(q) > 2.0 * bars[q]["bar"]
            ]
            if over_bar:
                for ob in over_bar:
                    print(
                        f"# OVER 2x BAR (persisted on retry): "
                        f"{ob['query']} {ob['cur']:.2f}s first / "
                        f"{(ob['retry'] if ob['retry'] is not None else ob['cur']):.2f}s retry vs "
                        f"{ob['bar']:.2f}s ({ob['ratio']}x, "
                        f"{ob['bar_source']})",
                        file=sys.stderr,
                    )
            else:
                print(
                    f"# over_bar: clean ({sum(1 for q in timings if q in bars)}"
                    f"/{len(timings)} barred entries within 2x)",
                    file=sys.stderr,
                )
        except (OSError, ValueError, KeyError, TypeError) as e:
            print(f"# bar tripwire skipped: {e}", file=sys.stderr)
    payload = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "loadavg": loadavg,
        "shared_sum_vs_prev": shared_sum_vs_prev,
        "over_bar": over_bar,
        "retries": retries,
        "fresh": fresh,
    }
    print(json.dumps(payload))
    # Also persist the COMPLETE per-query record to a file: the driver's
    # captured stdout tail truncates long runs (BENCH_r04 lost its first 21
    # per-query timings), so round-over-round comparisons read this file,
    # committed with the round, instead of the driver's tail.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
    except OSError as e:
        print(f"# bench: could not write {out_path}: {e}", file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
