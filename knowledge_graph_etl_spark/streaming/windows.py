"""Streaming analytics operators: windowed aggregation + sessionization.

Beyond-reference operators (the reference workload has no streaming,
SURVEY.md §2.5) built the idiomatic Structured-Streaming way:

  * ``windowed_event_counts`` — tumbling event-time windows with a
    watermark for late data; works identically on batch DataFrames
    (same code path, Catalyst handles both).
  * ``sessionize`` — gap-based session windows via
    ``applyInPandasWithState`` (the custom-stateful-operator escape
    hatch) on streams, with a batch window-function equivalent for
    oracle checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window counts/sums per group. On a streaming input the
    watermark bounds state and admits late rows up to the delay; on a
    batch input the same expression is a plain grouped aggregate."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "cnt",
            "sum_value",
        )
    )


def dedup_events(
    events: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: first arrival per key wins; the watermark
    bounds the dedup state (a key older than the delay is dropped from
    state — at 100 TB/day unbounded dedup state is the streaming killer,
    so the delay IS the dedup horizon). On a batch input the same
    ``dropDuplicates`` is a plain hash aggregate.

    Returns only the key columns (deterministic in both modes — which
    full row survives ``dropDuplicates`` is arrival-order-dependent).

    On streams this uses ``dropDuplicatesWithinWatermark``: plain
    ``dropDuplicates(keys)`` only evicts state when the watermarked
    event-time column is PART of the keys, so with pure business keys the
    state would grow forever and the watermark would be a no-op."""
    keys = list(key_cols)
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark_delay)
        return events.dropDuplicatesWithinWatermark(keys).select(*keys)
    return events.dropDuplicates(keys).select(*keys)


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization.

    Streaming path: ``applyInPandasWithState`` keeps per-user open-session
    state (start, last-seen, count) and emits a session row when the gap
    closes it or the state times out past the watermark. Batch path: the
    classic gaps-and-islands rewrite (lag + cumulative sum), which is the
    SQL-oracle-checkable equivalent.
    """
    if not events.isStreaming:
        from pyspark.sql import Window

        w = Window.partitionBy(user_col).orderBy(ts_col)
        gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
        df = events.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
        )
        df = df.withColumn(
            "session_id",
            F.sum("new_session").over(
                Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        return df.groupBy(user_col, "session_id").agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        ).drop("session_id")

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_seconds * 1000
    # honor the caller's column names and the user column's actual type —
    # the output schema must match what the update function emits in both
    # modes (a hardcoded 'user_id bigint' breaks string ids / renamed cols)
    user_dtype = events.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {user_dtype}, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )

    def update(key, pdfs, state):
        (user,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [user],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        ts_ms = []
        for pdf in pdfs:
            ts_ms.extend(int(t.value // 1_000_000) for t in pd.to_datetime(pdf[ts_col]))
        ts_ms.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_ms[0], ts_ms[0], 0
        out = []
        for t in ts_ms:
            if t - last > gap_ms:
                out.append((user, start, last, n))
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        # EventTimeTimeout requires a timestamp STRICTLY past the current
        # watermark; a group whose newest event is already more than
        # gap_seconds behind the watermark (late data within the watermark
        # delay but outside the gap) would otherwise throw and kill the
        # whole query — clamp, so such a session times out on the next
        # watermark advance instead
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        if out:
            yield pd.DataFrame(
                {
                    user_col: [r[0] for r in out],
                    "session_start": [pd.Timestamp(r[1], unit="ms") for r in out],
                    "session_end": [pd.Timestamp(r[2], unit="ms") for r in out],
                    "n_events": [r[3] for r in out],
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
