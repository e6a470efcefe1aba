"""Streaming CUSUM drift alarms — the stateful-streaming twin of
:func:`..extensions.events.cusum_changepoints`, same integer recurrence
(see that docstring for the statistics), as an
``applyInPandasWithState`` operator.

Semantics and parity contract (the pattern of the other streaming
operators here): a period is scored when it CLOSES — i.e. when a later
period's first event for that key arrives; gap periods close as real
zero-counts (dense semantics, identical to the batch twin's zero-filled
grid). The baseline mean needs the first ``baseline_periods`` closed
periods, so those counts are BUFFERED in state (bounded by
``baseline_periods``) and replayed through the recurrence the moment
the baseline completes — afterwards state is five integers plus the
empty buffer, bounded per key regardless of stream length. Feeding
micro-batches in event-time order reproduces the batch twin exactly on
every closed period (tests/test_streaming.py pins stream==batch modulo
each key's still-open final period); events arriving for an
already-closed period (past the order contract / watermark) are
dropped, the same late-data stance as the windowed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cusum_alarms(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    period_us: int = 3_600_000_000,
    baseline_periods: int = 24,
    threshold_x1000: int = 5000,
    slack_x1000: int = 500,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """→ ``(key_col, period, stat_hi_x1000, stat_lo_x1000, direction)``
    per alarming CLOSED period (batch input: every period, via the batch
    twin)."""
    if not events.isStreaming:
        from ..extensions.events import cusum_changepoints

        return cusum_changepoints(
            events,
            group_col=key_col,
            ts_col=ts_col,
            period_us=period_us,
            baseline_periods=baseline_periods,
            threshold_x1000=threshold_x1000,
            slack_x1000=slack_x1000,
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_dtype = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_dtype}, period bigint, stat_hi_x1000 bigint, "
        "stat_lo_x1000 bigint, direction string"
    )
    K = baseline_periods
    TH = threshold_x1000
    SL = slack_x1000

    def update(key, pdfs, state):
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            mean_m, hi, lo, cur_p, cur_c, buf = state.get
            buf = list(buf)
        else:
            mean_m, hi, lo, cur_p, cur_c, buf = -1, 0, 0, None, 0, []
            cur_p = -1  # -1 = no open period yet
        out = []

        def step(p, c):
            nonlocal hi, lo
            nh = max(0, hi + (1000 * c - mean_m - SL))
            nl = max(0, lo - (1000 * c - mean_m + SL))
            if nh > TH or nl > TH:
                out.append(
                    (k, p, nh, nl, "up" if nh > TH else "down")
                )
                hi, lo = 0, 0
            else:
                hi, lo = nh, nl

        def close(p, c):
            nonlocal mean_m, buf
            if mean_m < 0:
                buf.append(c)
                if len(buf) == K:
                    mean_m = sum(buf) * 1000 // K
                    p0 = p - (len(buf) - 1)
                    for i, cb in enumerate(buf):
                        step(p0 + i, cb)
                    buf = []
            else:
                step(p, c)

        max_ts = 0
        for pdf in pdfs:
            ordered = pdf.sort_values([ts_col])
            ts_us = pd.to_datetime(ordered[ts_col]).astype("int64") // 1_000
            if len(ts_us):
                max_ts = max(max_ts, int(ts_us.max()) // 1000)
            for t in ts_us:
                p = int(t) // period_us
                if cur_p < 0:
                    cur_p, cur_c = p, 1
                elif p == cur_p:
                    cur_c += 1
                elif p > cur_p:
                    close(cur_p, cur_c)
                    for gap in range(cur_p + 1, p):
                        close(gap, 0)
                    cur_p, cur_c = p, 1
                # p < cur_p: late past the order contract — dropped
        state.update((mean_m, hi, lo, cur_p, cur_c, buf))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts, wm + 1) + 24 * 3600 * 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    key_col,
                    "period",
                    "stat_hi_x1000",
                    "stat_lo_x1000",
                    "direction",
                ],
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=(
                "mean bigint, hi bigint, lo bigint, cur_p bigint, "
                "cur_c bigint, buf array<bigint>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
