"""Parquet data-layout operators: sort-ordered writes and small-file
compaction.

At 100 TB the difference between a usable table and an unusable one is
LAYOUT, not computation: (a) row-group min/max statistics only prune
when values are clustered — a randomly-ordered write leaves every file
spanning the whole key range, so every filter scans every file; (b) a
table written by a 10 000-task job is 10 000 files — NameNode/listing
pressure and per-file open cost dominate reads. Both are fixed by how
the write is planned, which Spark exposes but does not default to.

``write_sorted`` = range-repartition on the cluster keys + in-partition
sort + parquet write: each output file then covers a narrow,
non-overlapping slice of the key space, so a predicate on the leading
key prunes to O(matching files) via footer stats alone (verified in
tests by reading the row-group min/max back with pyarrow). This is the
single-dimension analog of Z-ordering — for multi-column point lookups
interleave the key bits yourself or layer bucketing.

``compact_files`` = read → size-aware coalesce → rewrite: resizes a
directory of too-many/too-small files to ``target_file_mb`` using the
measured on-disk bytes (not row counts — rows vary in width).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``sort_by``: range-repartition
    on the sort keys (each output task owns a contiguous, non-overlapping
    key slice) then sort within partitions (row groups inside each file
    are clustered too), so every file's footer min/max on the leading
    sort column is narrow and a point/range filter skips non-matching
    files entirely — the layout prerequisite for predicate pushdown to
    actually prune I/O at scale.

    ``partition_by``: optional hive-style directory partitioning layered
    on top (prune by directory before footers). ``num_files``: output
    file count per partition-by value set (default: current parallelism).
    Range repartitioning samples the sort keys — one extra pass over the
    input, the price of the layout."""
    if not sort_by:
        raise ValueError("sort_by must name at least one column")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    cols = [df[c] for c in sort_by]
    out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_files(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ~``target_file_mb`` files — the
    small-files compaction every long-lived table eventually needs
    (streaming sinks and over-parallel writers leave thousands of KB-size
    files; open/list overhead then dominates scans). File count is sized
    from the MEASURED directory bytes, so row width doesn't skew it;
    ``sort_by`` re-clusters while compacting (one pass doing both).

    Writes to ``path + '.compact'`` then swaps via two ``os.rename``
    calls. Each rename is atomic but the PAIR is not: a reader between
    them sees no table at that path, and a crash between them would
    leave the data stranded in ``.old`` — the swap is wrapped so a
    failed second rename restores ``.old`` back to ``path``. For
    serving tables that need a truly atomic swap, point readers at a
    symlink/manifest and flip that instead. Local-filesystem only
    (``os.rename``/``os.walk`` — not object stores, where rename is a
    copy and a transactional table format is the right tool).
    Returns ``{"files_before", "files_after", "bytes"}``."""
    before_bytes = _dir_bytes(path)
    files_before = sum(
        1
        for _root, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    df = spark.read.parquet(path)
    n = max(1, math.ceil(before_bytes / (target_file_mb * 1024 * 1024)))
    if sort_by:
        cols = [df[c] for c in sort_by]
        out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n)
    tmp = path.rstrip("/") + ".compact"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)  # restore — leave .compact for inspection
        raise
    import shutil

    shutil.rmtree(old)
    files_after = sum(
        1
        for _root, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": before_bytes,
    }


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` from parquet FOOTER statistics
    only (pyarrow metadata — no data pages read): the direct evidence of
    whether a layout prunes. Sorted by min."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics:
                        s = col.statistics
                        if s.has_min_max:
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                out.append((lo, hi))
    return sorted(out)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on a Z-ORDER (Morton) curve over two or
    more numeric columns — the multi-dimensional version of
    :func:`write_sorted`: a single sort key can only prune filters on its
    leading column, while interleaving the bits of several columns makes
    every file cover a bounded HYPER-RECTANGLE of the key space, so
    footer min/max stats prune selective filters on ANY of the z-columns
    (the technique Delta/Iceberg expose as OPTIMIZE ZORDER BY).

    Construction (all JVM expressions): each column is affinely scaled to
    ``bits`` unsigned bits using its global min/max (one tiny 2-value
    aggregate per column — the only extra pass), then the scaled values'
    bits are interleaved MSB-first into the Morton key the write range-
    partitions and sorts on. Ties and NULLs (mapped to 0) only affect
    placement, never correctness — the layout is advisory; readers rely
    on footer stats, not on the key."""
    if len(zorder_by) < 2:
        raise ValueError("zorder_by needs >= 2 columns (use write_sorted for 1)")
    if not 4 <= bits <= 21:
        raise ValueError(f"bits must be in [4, 21], got {bits}")
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in zorder_by],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in zorder_by],
    ).collect()[0]
    scaled = []
    top = (1 << bits) - 1
    for c in zorder_by:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) if mx is not None and mn is not None and mx > mn else 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(mn or 0.0))
                        / F.lit(span)
                        * F.lit(float(top))
                    ).cast("long"),
                ),
            )
        )
    z = F.lit(0).cast("long")
    # standard Morton interleave: bit b of column i lands at output
    # position b*ncols + i, so higher-order bits of every column dominate
    # the curve equally — one |-chain, whole-stage codegen friendly
    n = len(zorder_by)
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    nf = num_files or df.sparkSession.sparkContext.defaultParallelism
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(nf, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a BUCKETED managed table: rows are hash-routed into
    ``num_buckets`` files per partition by ``bucket_by`` (Spark's
    ``bucketBy``, metastore-backed — bucketing metadata only survives
    through ``saveAsTable``, not plain ``.parquet(path)``).

    Why this is a first-class layout operator at 100 TB: two tables
    bucketed on the SAME keys into the SAME bucket count join with ZERO
    shuffle — the scan itself is the exchange. For a fact table joined on
    the same key by every downstream query (quads on ``s``, lineitem on
    ``l_orderkey``, gram/posting tables on their id), bucketing pays the
    one-time shuffle at WRITE time and amortizes it over every subsequent
    join and aggregation on that key; ``sort_by`` additionally pre-sorts
    within buckets so sort-merge joins skip their sort. Verified by plan
    evidence in tests/test_layout.py: a join of two co-bucketed tables
    contains no Exchange on either side.

    The table lands in the session's warehouse dir; pair with
    ``spark.sql.sources.bucketing.enabled`` (default true) and read back
    via ``spark.table(table)`` — ``spark.read.parquet`` on the files
    bypasses the metastore and loses the bucket spec.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(
        int(num_buckets), *bucket_by
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def zorder_skipping_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    probe_x: tuple[int, int],
    probe_y: tuple[int, int],
    file_bits: int = 6,
    grid_bits: int = 16,
) -> DataFrame:
    """Data-skipping effectiveness report: how many files a 2-D range
    probe must scan under three layouts of the same table — ``zorder``
    (Morton-interleaved blocks, what :func:`write_zordered` produces),
    ``linear_x`` (single-column sort, :func:`write_sorted`), and ``hash``
    (the unclustered shuffle-write default). This is the "measure, don't
    guess" companion to the writers: it turns the layout choice into
    numbers before anyone rewrites 100 TB.

    Model: both coordinates are scaled to a ``grid_bits`` integer grid
    with EXACT integer arithmetic ``((v - min) * 2^g) div (span + 1)``
    (bit-identical across engines — float scaling would lose bits beyond
    2^53 for epoch-microsecond coordinates), and a "file" is a fixed
    key-range block: the top ``file_bits`` bits of the layout key
    (Morton code / x grid / md5 hash). Equal-width blocks stand in for
    the size-based splits of a real write — footer min/max pruning
    semantics are identical. A file is scanned iff its bounding box
    intersects the probe rectangle, exactly the parquet row-group
    min/max test.

    One scan, one tiny shuffle: the three layouts are unpivoted with
    ``stack`` (3 rows per input row, combined map-side) into a groupBy on
    (layout, file_id) — ≤ 3·2^file_bits groups — then a 3-row final
    aggregate. ``rows_matched`` is layout-invariant by construction, a
    built-in sanity check.

    Returns ``(layout, files_total, files_scanned, rows_scanned,
    rows_matched)`` ordered by layout.
    """
    from .hashing import md5_u60

    top = 1 << grid_bits
    src = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    stats = F.broadcast(
        src.agg(
            F.min("x").alias("mnx"),
            F.max("x").alias("mxx"),
            F.min("y").alias("mny"),
            F.max("y").alias("mxy"),
        )
    )
    g = src.crossJoin(stats).select(
        "x",
        "y",
        F.expr(f"((x - mnx) * {top}) div (mxx - mnx + 1)").alias("xg"),
        F.expr(f"((y - mny) * {top}) div (mxy - mny + 1)").alias("yg"),
    )
    z = F.lit(0).cast("long")
    for b in range(grid_bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(F.col("xg"), b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col("yg"), b).bitwiseAND(F.lit(1)), 2 * b)
        )
    nfiles = 1 << file_bits
    matched = (
        (F.col("x") >= probe_x[0])
        & (F.col("x") <= probe_x[1])
        & (F.col("y") >= probe_y[0])
        & (F.col("y") <= probe_y[1])
    ).cast("long")
    melted = (
        g.withColumn("__fz", F.shiftright(z, 2 * grid_bits - file_bits))
        .withColumn("__fx", F.shiftright(F.col("xg"), grid_bits - file_bits))
        .withColumn(
            "__fh",
            md5_u60(
                F.concat_ws(
                    ":", F.col("x").cast("string"), F.col("y").cast("string")
                )
            )
            % nfiles,
        )
        .withColumn("m", matched)
        .select(
            "x",
            "y",
            "m",
            F.expr(
                "stack(3, 'zorder', __fz, 'linear_x', __fx, 'hash', __fh) "
                "as (layout, file_id)"
            ),
        )
    )
    per_file = melted.groupBy("layout", "file_id").agg(
        F.min("x").alias("fminx"),
        F.max("x").alias("fmaxx"),
        F.min("y").alias("fminy"),
        F.max("y").alias("fmaxy"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("m").alias("n_matched"),
    )
    scanned = (
        (F.col("fminx") <= probe_x[1])
        & (F.col("fmaxx") >= probe_x[0])
        & (F.col("fminy") <= probe_y[1])
        & (F.col("fmaxy") >= probe_y[0])
    ).cast("long")
    return (
        per_file.withColumn("s", scanned)
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("files_total"),
            F.sum("s").cast("bigint").alias("files_scanned"),
            F.sum(F.col("s") * F.col("n_rows")).cast("bigint").alias("rows_scanned"),
            F.sum("n_matched").cast("bigint").alias("rows_matched"),
        )
        .orderBy("layout")
    )
