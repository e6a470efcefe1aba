"""Running-statistics anomaly flagging — the custom stateful streaming
operator pattern (``applyInPandasWithState``) with an EXACT batch
equivalent.

Each event is judged against the running mean/variance of the PRIOR
events of its key (in (ts, id) order): flag iff at least ``min_prior``
prior events exist and ``|v - mean| > z·σ``. The test is evaluated in
integer arithmetic so batch, streaming, and the SQL oracle agree
bit-for-bit — floating-point running variance is order- and
engine-dependent, which would make the streaming path unverifiable:

    quantize   vq = floor(v·1000 + 0.5)            (milli-units, bigint)
    state      n, S = Σ vq, Q = Σ vq²              (prior events only)
    flag   ⇔   n ≥ min_prior  ∧  (vq·n − S)² > z²·(n·Q − S²)

(the σ test cross-multiplied by n² — no division, no floats; decimals
on the Spark side, HUGEINT on DuckDB, Python ints in the stream state).

Batch path: one cumulative window per key — a single hash exchange.
Streaming path: per-key (n, S, Q) state updated in arrival order; within
each micro-batch rows are applied in (ts, id) order, so feeding batches
in event-time order reproduces the batch semantics exactly (the
stream==batch parity contract used by the other streaming operators).
State is three int64s per key — bounded by key cardinality, not stream
length — with an event-time timeout evicting idle keys past the
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def flag_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    z: int = 3,
    min_prior: int = 5,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """→ ``(id_col, key_col, n_prior, is_anomaly)`` for every event."""
    if not events.isStreaming:
        vq = F.floor(F.col(value_col) * F.lit(1000.0) + F.lit(0.5)).cast("long")
        df = events.select(
            F.col(id_col), F.col(key_col), F.col(ts_col), vq.alias("vq")
        )
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        n = F.count("vq").over(w)
        s = F.sum("vq").over(w)
        q = F.sum(F.col("vq") * F.col("vq")).over(w)
        nd = n.cast(_DEC)
        sd = s.cast(_DEC)
        qd = q.cast(_DEC)
        vd = F.col("vq").cast(_DEC)
        lhs = vd * nd - sd
        flag = (n >= min_prior) & (
            lhs * lhs > F.lit(z * z).cast(_DEC) * (nd * qd - sd * sd)
        )
        # decimal(38,0) overflow guard: with ANSI off, an overflowing
        # product (|vq|·n past ~1e19 milli-units — extreme value
        # magnitudes × deep histories) yields NULL, and silently mapping
        # that to is_anomaly=false would diverge from the streaming
        # path's unbounded Python ints. flag is NULL exactly when
        # n ≥ min_prior and a product overflowed (false & NULL = false in
        # 3VL, so short histories can't trip this) — raise loudly with
        # the remediation instead of emitting a wrong verdict.
        overflow_err = F.raise_error(
            F.concat(
                F.lit(
                    "flag_anomalies: decimal(38,0) overflow in the z-test "
                    "for key "
                ),
                F.col(key_col).cast("string"),
                F.lit(
                    " (quantized |value*1000| x history length exceeds "
                    "~1e19); rescale the value column or window the "
                    "history"
                ),
            )
        ).cast("boolean")
        return df.select(
            F.col(id_col),
            F.col(key_col),
            F.coalesce(n, F.lit(0)).cast("bigint").alias("n_prior"),
            F.when((n >= min_prior) & flag.isNull(), overflow_err)
            .otherwise(F.coalesce(flag, F.lit(False)))
            .alias("is_anomaly"),
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_dtype = events.schema[key_col].dataType.simpleString()
    id_dtype = events.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_dtype}, {key_col} {key_dtype}, "
        "n_prior bigint, is_anomaly boolean"
    )
    z2 = z * z

    def update(key, pdfs, state):
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, s, q = state.get if state.exists else (0, 0, 0)
        rows = []
        max_ts = 0
        for pdf in pdfs:
            ordered = pdf.sort_values([ts_col, id_col])
            ts_ms = (
                pd.to_datetime(ordered[ts_col]).astype("int64") // 1_000_000
            )
            max_ts = max(max_ts, int(ts_ms.max()) if len(ts_ms) else 0)
            for eid, v in zip(ordered[id_col], ordered[value_col]):
                import math

                vq = math.floor(float(v) * 1000.0 + 0.5)
                lhs = vq * n - s
                flag = n >= min_prior and lhs * lhs > z2 * (n * q - s * s)
                rows.append((eid, k, n, bool(flag)))
                n, s, q = n + 1, s + vq, q + vq * vq
        state.update((n, s, q))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts, wm + 1) + 24 * 3600 * 1000)
        if rows:
            yield pd.DataFrame(
                rows, columns=[id_col, key_col, "n_prior", "is_anomaly"]
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="n bigint, s bigint, q bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
