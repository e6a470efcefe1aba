"""Stream-stream interval join.

``interval_join`` builds the one join shape Structured Streaming supports
between two streams: equi-key plus a bounded event-time lag
(``right.ts ∈ [left.ts - max_lag, left.ts]``). The SAME function works on
batch DataFrames (the condition is ordinary SQL there), which is what the
stream==batch test and the SQL oracle exercise.

Scale shape: on streams, the watermarks bound the join state Spark keeps
per side (a right row can be dropped once it is older than
``left watermark - max_lag``); on batch, the equi-key carries the hash
join and the time bound is a post-join filter. No UDFs, no state handling
code — the declarative condition IS the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_lag_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark_seconds: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Join each left row to every right row in the same ``key`` group
    whose timestamp lies within the preceding ``max_lag_seconds``
    (inclusive on both ends: a right row at exactly ``left.ts`` or
    exactly ``max_lag`` earlier matches). Right columns are prefixed.

    For streaming inputs pass ``watermark_seconds`` — both sides get an
    event-time watermark, which is what lets Spark expire join state; in
    batch mode leave it None (a watermark on a batch frame is a no-op
    anyway, but explicit is better)."""
    if max_lag_seconds < 0:
        raise ValueError(f"max_lag_seconds must be >= 0, got {max_lag_seconds}")
    if watermark_seconds is not None:
        left = left.withWatermark(left_ts, f"{watermark_seconds} seconds")
        right = right.withWatermark(right_ts, f"{watermark_seconds} seconds")
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{prefix}{c}")
    cond = (
        (F.col(key) == F.col(f"{prefix}{key}"))
        & (
            F.col(f"{prefix}{right_ts}")
            >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag_seconds} SECONDS")
        )
        & (F.col(f"{prefix}{right_ts}") <= F.col(left_ts))
    )
    return left.join(r, cond).drop(f"{prefix}{key}")


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the standard dimension-lookup
    pattern on an event stream. Stateless under Structured Streaming:
    each micro-batch joins against the current snapshot of the static
    side, no watermark, no state store. The SAME call works on batch
    DataFrames, which is what the stream==batch test and the SQL oracle
    exercise.

    Scale shape: ``broadcast=True`` (default) ships the dimension to every
    task — the stream side is NEVER shuffled, which is the only acceptable
    plan when the stream is the 100 TB side; turn it off only for a
    dimension too large to broadcast (then both sides shuffle on the key
    per micro-batch)."""
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on=key, how=how)
