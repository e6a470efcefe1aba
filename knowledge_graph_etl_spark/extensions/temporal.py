"""Temporal join operators Spark lacks as built-ins.

* :func:`asof_join` — merge-based as-of (point-in-time) join: for each
  left row, the latest right row with ``right.ts <= left.ts`` in the same
  key group. The classic time-series enrichment (trade←quote, event←state
  snapshot) that engines with a native ASOF JOIN (DuckDB, kdb, Pandas
  ``merge_asof``) ship built-in.
* :func:`range_join_events` — event-to-interval assignment via a
  bucketized equi-join, avoiding the O(N·M) theta-join Spark would
  otherwise plan for ``start <= ts < end``.
* :func:`gapfill_locf` — dense time-bucket grid per key with
  last-observation-carried-forward, the hypertable
  ``time_bucket_gapfill(...) + locf(...)`` rollup shape.

All are compositions of existing DataFrame ops — no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``right_cols`` values
    of the LATEST ``right`` row in its ``by`` group with
    ``right.ts <= left.ts`` (inclusive — a right row exactly at the left
    timestamp matches, like DuckDB ``ASOF JOIN``'s ``>=``); NULLs when no
    prior right row exists (left-join semantics).

    Implementation is the merge-based plan, not a range theta-join: tag and
    union both inputs, ONE shuffle on ``by``, one in-partition sort on
    ``(ts, tag)`` — right rows sort before left rows at equal timestamps —
    then ``last(value, ignorenulls)`` over the unbounded-preceding window
    carries each right value forward to the left rows it covers. Cost is a
    single exchange of both inputs regardless of time-range width, where a
    non-equi join would nested-loop per key group. Skewed keys behave like
    any windowed aggregation (AQE handles moderate skew; salt upstream for
    a pathological single key).

    ``right`` must be unique per (by, ts) — pre-aggregate duplicates to
    keep "the latest row" well-defined (enforced cheaply: duplicate
    timestamps would silently pick the physical-order last, so callers
    dedupe first)."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (by, ts_col)
    ]
    # carry ONE struct of (ts + value columns), not per-column carries:
    # last(col, ignorenulls) per column would skip a legitimately-NULL
    # field of the latest right row and splice in a STALE older value —
    # mixing columns from different right rows. The struct itself is
    # non-null exactly when a right row exists, so its fields (NULLs
    # included) always travel together.
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(ts_col).alias(f"{prefix}{ts_col}"),
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        ).alias("__asof"),
    )
    l = left.withColumn("__tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__asof", F.last("__asof", ignorenulls=True).over(w))
    out = u.where(F.col("__tag") == 1)
    for c in [f"{prefix}{ts_col}"] + [f"{prefix}{c}" for c in right_cols]:
        out = out.withColumn(c, F.col("__asof")[c])
    return out.drop("__tag", "__asof")


def range_join_events(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Assign events to intervals (``start <= ts < end``) via bucketization:
    each interval explodes into its covered ``bucket_width``-sized buckets,
    events hash to exactly one bucket, and the match becomes an EQUI-join
    on bucket (then the exact range predicate as a cheap post-filter).

    Pick ``bucket_width`` near the typical interval length: an interval
    spanning B buckets emits B rows, so the blow-up is bounded by
    span/width, while Spark's native plan for the raw range predicate is a
    broadcast nested-loop over every (event, interval) pair. All columns
    of both inputs are preserved."""
    ev = events.withColumn(
        "__bucket", (F.col(ts_col) / bucket_width).cast("bigint")
    )
    # degenerate intervals (end <= start) are dropped BEFORE the explode:
    # sequence(a, b) with a > b counts DOWN, so one malformed row would
    # otherwise explode into |start-end|/bucket_width spurious bucket rows
    # (potentially millions) that the post-filter only discards after the
    # join. An empty interval correctly matches zero events.
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("bigint"),
                # end is exclusive, but an interval ending exactly on a
                # bucket boundary still owns no part of that bucket —
                # sequence() is inclusive so subtract the boundary case
                ((F.col(end_col) - 1) / bucket_width).cast("bigint"),
            )
        ),
    )
    return (
        ev.join(iv, "__bucket")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_width: int,
    fill_default: float = -1.0,
) -> DataFrame:
    """Time-bucket rollup over a DENSE per-key grid with
    last-observation-carried-forward — the time-series engine primitive
    (TimescaleDB ``time_bucket_gapfill`` + ``locf``, InfluxDB
    ``fill(previous)``) that Spark has no built-in for.

    ``ts_col`` must be an integer timestamp (e.g. epoch micros);
    buckets are ``(ts div width) * width``.  Per (key, bucket) the
    rollup keeps ``COUNT(*)`` and ``MAX(value)``; then every key is
    expanded to the FULL bucket range observed anywhere in the input
    (the global ``[min, max]`` grid, like gapfilling a query window),
    empty buckets get ``n_events = 0`` / ``is_gap = true``, and
    ``filled_value`` carries the last non-null ``bucket_max`` forward
    within the key (``fill_default`` before the key's first
    observation — a sentinel rather than NULL so integer/float columns
    stay NULL-free for exact cross-engine comparison).

    Returns ``(key, bucket, n_events, filled_value, is_gap)`` with the
    original key/ts column names preserved.

    Scale shape: one map-side-combinable aggregation on (key, bucket);
    the grid is built distributed — distinct keys × an exploded
    ``sequence(min, max, width)`` from a broadcast one-row bounds
    relation, never a driver loop — and sized time_range/width per key,
    which is the result's own cardinality; LOCF is one window per key
    ordered by bucket.  Nothing is proportional to input × keys.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    width = F.lit(int(bucket_width))
    bucket = (F.expr(f"CAST({ts_col} AS BIGINT) DIV {int(bucket_width)}") * width).alias(
        ts_col
    )
    agg = (
        df.select(F.col(key_col), bucket, F.col(value_col).alias("_v"))
        .groupBy(key_col, ts_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("_v").alias("_bucket_max"),
        )
    )
    bounds = agg.agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = (
        agg.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), width.cast("long"))
            ).alias(ts_col),
        )
    )
    filled = grid.join(agg, [key_col, ts_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key_col),
        F.col(ts_col),
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias(
            "n_events"
        ),
        F.coalesce(
            F.last("_bucket_max", ignorenulls=True).over(w),
            F.lit(float(fill_default)),
        ).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def nearest_event_match(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    tolerance: int,
    left_id_col: str,
    right_id_col: str,
) -> DataFrame:
    """Cross-source event reconciliation: for each left event, the
    NEAREST right event of the same key within ``±tolerance`` time units
    — both directions, unlike :func:`asof_join` (latest ``<=``). The
    shape every dual-pipeline audit needs ("did the warehouse see the
    event the stream saw, and with what lag?"): unmatched left rows are
    REPORTED (NULL match), not dropped, because the unmatched set is the
    finding.

    Spark has no native band join that picks one best match; the naive
    form is a per-row range theta-join. Here: both sides bucket at
    ``tolerance`` width, the right side replicates into its bucket ±1
    (so every pair within tolerance shares a bucket row — bounded ×3
    fan-out, never corpus²), the exact ``|Δt| <= tolerance`` filter runs
    inside the join, and one window per left row keeps the best match
    (smallest ``|Δt|``, then earlier right ts, then smaller right id —
    total order, engine-reproducible). A left anti-join back to the
    spine restores unmatched rows.

    Returns ``(left_id, key, left_ts, right_id, right_ts, dt)`` with
    ``dt = right_ts - left_ts`` (NULL row tail for unmatched).
    """
    if tolerance < 1:
        raise ValueError(f"tolerance must be >= 1, got {tolerance}")
    l = left.select(
        F.col(left_id_col).alias("left_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("left_ts"),
    )
    r = right.select(
        F.col(right_id_col).alias("right_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("right_ts"),
    )
    lb = l.withColumn(
        "bucket", F.floor(F.col("left_ts") / F.lit(int(tolerance)))
    )
    rb = r.select(
        "right_id",
        "key",
        "right_ts",
        F.explode(
            F.array(F.lit(-1), F.lit(0), F.lit(1))
        ).alias("shift"),
    ).select(
        "right_id",
        "key",
        "right_ts",
        (
            F.floor(F.col("right_ts") / F.lit(int(tolerance)))
            + F.col("shift")
        ).alias("bucket"),
    )
    cand = (
        lb.join(rb, ["key", "bucket"])
        .where(
            F.abs(F.col("right_ts") - F.col("left_ts"))
            <= F.lit(int(tolerance))
        )
        .select(
            "left_id",
            "key",
            "left_ts",
            "right_id",
            "right_ts",
            (F.col("right_ts") - F.col("left_ts")).alias("dt"),
        )
    )
    w = Window.partitionBy("left_id").orderBy(
        F.abs(F.col("dt")).asc(), F.col("right_ts").asc(), F.col("right_id").asc()
    )
    best = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    # the NULL tail's right_id must carry the SOURCE id type (string ids
    # are legal), not a hardcoded long — otherwise unionByName coerces or
    # fails; right_ts/dt stay long by the cast contract above.
    unmatched = (
        l.join(best.select("left_id"), "left_id", "left_anti")
        .select(
            "left_id",
            "key",
            "left_ts",
            F.lit(None).cast(r.schema["right_id"].dataType).alias("right_id"),
            F.lit(None).cast("long").alias("right_ts"),
            F.lit(None).cast("long").alias("dt"),
        )
    )
    return best.unionByName(unmatched)
