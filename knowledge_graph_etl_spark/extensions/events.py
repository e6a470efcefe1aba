"""Event-sequence analytics: funnel conversion and retention cohorts.

The event-stream side of the engine (windowed counts, sessionization,
interval joins live in :mod:`..streaming`) plus the two batch analyses
every product/behavior pipeline runs. Both are built on integer time
arithmetic (epoch microseconds / integer period indexes) so the
notoriously float-and-timezone-fragile funnel/cohort numbers are exactly
reproducible — and SQL-oracle-able — across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: how many users performed step 1, then
    step 2 at-or-after their step-1 time, then step 3 after that, … —
    the sequential-minimum-time formulation (a user's step-k time is the
    EARLIEST step-k event at/after their step-(k-1) time; ties on the
    same timestamp count, matching "same-batch" events). Returns one row
    per step: ``(step_index, step, n_users, conversion_ppm)`` with
    conversion in integer parts-per-million of the step-1 population.

    ``within_seconds`` bounds the whole funnel to a window after the
    user's step-1 time (the usual "converted within 7 days" form).

    Scale shape: one filtered min-aggregate per step, each keyed on the
    uniform user id (map-side combinable) joined to the previous step's
    per-user time — k steps cost k bounded shuffles on the same key, and
    Catalyst reuses the partitioning across them; the final counts
    reduce k tiny rows. Never a self-join of the event log."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("et"), us.alias("t")
    )
    cur = base.where(F.col("et") == steps[0]).groupBy("u").agg(
        F.min("t").alias("t1")
    )
    if within_seconds is not None:
        cur = cur.withColumn(
            "deadline", F.col("t1") + F.lit(int(within_seconds) * 1_000_000)
        )
    reached = [cur.select("u", F.col("t1").alias("tk"))]
    prev = cur
    for step in steps[1:]:
        ev = base.where(F.col("et") == step)
        j = ev.join(prev, "u").where(F.col("t") >= F.col(f"t{len(reached)}"))
        if within_seconds is not None:
            j = j.where(F.col("t") <= F.col("deadline"))
        agg_cols = [F.min("t").alias(f"t{len(reached) + 1}")] + [
            F.first(f"t{i + 1}").alias(f"t{i + 1}") for i in range(len(reached))
        ]
        if within_seconds is not None:
            agg_cols.append(F.first("deadline").alias("deadline"))
        nxt = j.groupBy("u").agg(*agg_cols)
        reached.append(nxt.select("u", F.col(f"t{len(reached) + 1}").alias("tk")))
        prev = nxt
    tagged = None
    for i, df in enumerate(reached):
        part = df.select(
            F.lit(i + 1).alias("step_index"),
            F.lit(steps[i]).alias("step"),
            "u",
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    counts = tagged.groupBy("step_index", "step").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    first_n = counts.where(F.col("step_index") == 1).select(
        F.col("n_users").alias("__n1")
    )
    # one-row broadcast; an empty step-1 population yields an empty funnel
    return counts.join(F.broadcast(first_n)).select(
        "step_index",
        "step",
        "n_users",
        F.expr("CAST(1000000 * n_users div __n1 AS BIGINT)").alias(
            "conversion_ppm"
        ),
    )


def retention_cohorts(
    events: DataFrame,
    period_seconds: int = 7 * 86_400,
    max_offset: int | None = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention cohort matrix: users are cohorted by the period of their
    FIRST event (``floor(epoch_us / period)`` — integer period indexes,
    no calendar/timezone arithmetic to diverge across engines), and each
    (cohort, offset) cell counts the cohort's users active ``offset``
    periods later. Returns ``(cohort_period, period_offset, n_active,
    retention_ppm)`` — offset 0 is the cohort size by construction.

    Scale shape: one min-aggregate on the user key (first event), one
    join back (uniform key), one distinct on (cohort, offset, user) —
    map-side combinable — and the final count; the matrix is
    O(cohorts × offsets) rows however big the log."""
    if period_seconds < 1:
        raise ValueError(f"period_seconds must be >= 1, got {period_seconds}")
    p_us = int(period_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    base = events.select(F.col(user_col).alias("u"), us.alias("t")).withColumn(
        "pd", F.expr(f"t div {p_us}")
    )
    first = base.groupBy("u").agg(F.min("pd").alias("cohort"))
    cells = (
        base.join(first, "u")
        .select("u", "cohort", (F.col("pd") - F.col("cohort")).alias("off"))
        .where(F.col("off") >= 0)
    )
    if max_offset is not None:
        cells = cells.where(F.col("off") <= max_offset)
    active = cells.distinct().groupBy("cohort", "off").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    size = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        active.join(size, "cohort")
        .select(
            F.col("cohort").cast("bigint").alias("cohort_period"),
            F.col("off").cast("bigint").alias("period_offset"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.expr("CAST(1000000 * n_active div n_cohort AS BIGINT)").alias(
                "retention_ppm"
            ),
        )
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (the "what do users do next" model behind next-action prediction,
    session-flow dashboards, and anomalous-sequence detection). For every
    ordered pair of consecutive events within a user's timeline, counts
    the (src → dst) transition and its maximum-likelihood probability.

    Returns ``(src, dst, n, src_total, p_ppm)`` where ``p_ppm`` is the
    integer parts-per-million MLE ``n * 1e6 div src_total`` — integer so
    the result is bit-reproducible and SQL-oracle-able.

    Scale shape: ONE shuffle on the user key for the ``lead()`` window
    (per-user partitions are small — a user's event count, not the
    corpus), then a groupBy on (src, dst) whose cardinality is
    |event types|² — tiny, so the second aggregation is effectively a
    map-side combine into a handful of keys. ``src_total`` comes from a
    window over the already-aggregated matrix (|types|² rows), never a
    second pass over the events. Deterministic: the sequence order ties
    on ``tie_col`` (unique event id), so equal timestamps don't make the
    matrix run-dependent.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    pairs = (
        events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        F.col("n").cast("bigint").alias("n"),
        F.sum("n").over(wsrc).cast("bigint").alias("src_total"),
        F.expr("n * 1000000 div sum(n) over (partition by src)")
        .cast("bigint")
        .alias("p_ppm"),
    )


def seasonal_naive_backtest(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    period_us: int = 3_600_000_000,
    season: int = 24,
    holdout: int = 48,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (ŷ_t = y_{t-season})
    on per-group event counts — the baseline every capacity-planning /
    anomaly-threshold forecast must beat, and the eval harness that says
    whether it does ("measure, don't guess" for the time dimension).

    Pipeline: bucket events into ``period_us`` periods per group; build
    the DENSE period grid (global min..max, zero-filled via a
    group×period sequence cross join — a gap hour is a real 0, skipping
    it would silently align the season lag wrong); forecast by
    ``lag(season)``; score the last ``holdout`` periods. Metrics are
    integer and exactly reproducible: ``mae_milli`` = Σ|err|·1000 div n
    and ``smape_ppm`` = (Σ 2·10⁶·|f−a| div (f+a), skipping both-zero
    periods) div n_nonzero.

    Scale shape: ONE count aggregate over the corpus (map-combinable),
    then everything operates on the |G|·T count grid — tiny relative to
    the events. The dense grid is a per-group ``sequence`` explode, the
    lag and scoring one window per group. Returns
    ``(group, n_eval, n_nonzero, mae_milli, smape_ppm)``."""
    from pyspark.sql import Window

    per = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(period_us)).cast("bigint")
    counts = (
        events.select(F.col(group_col).alias("g"), per.alias("p"))
        .groupBy("g", "p")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bounds = counts.agg(
        F.min("p").alias("pmin"), F.max("p").alias("pmax")
    )
    grid = (
        counts.select("g")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            F.explode(F.sequence(F.col("pmin"), F.col("pmax"))).alias("p"),
        )
    )
    dense = grid.join(counts, ["g", "p"], "left").select(
        "g", "p", F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("a")
    )
    w = Window.partitionBy("g").orderBy("p")
    scored = (
        dense.withColumn("f", F.lag("a", season).over(w))
        .crossJoin(F.broadcast(bounds))
        .where(
            (F.col("p") > F.col("pmax") - holdout) & F.col("f").isNotNull()
        )
        .withColumn("abs_err", F.abs(F.col("f") - F.col("a")))
        .withColumn(
            "sm",
            F.when(
                F.col("f") + F.col("a") > 0,
                F.expr("2000000 * abs_err div (f + a)"),
            ),
        )
    )
    return scored.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.count("sm").cast("bigint").alias("n_nonzero"),
        F.expr("sum(abs_err) * 1000 div count(*)")
        .cast("bigint")
        .alias("mae_milli"),
        F.expr(
            "CASE WHEN count(sm) > 0 THEN sum(sm) div count(sm) END"
        )
        .cast("bigint")
        .alias("smape_ppm"),
    )


def rolling_distinct(
    events: DataFrame,
    window_periods: int = 7,
    period_us: int = 86_400_000_000,
    ts_col: str = "ts",
    entity_col: str = "user_id",
) -> DataFrame:
    """Exact distinct entities per rolling window (e.g. 7-day active
    users per day) — the metric SQL cannot express directly at scale
    because ``COUNT(DISTINCT) OVER (RANGE ...)`` doesn't exist in Spark
    (and re-scanning the window per day is O(days·window) passes).

    The scalable rewrite: reduce to first-class (entity, period) pairs
    (one distinct aggregate — the corpus touch), then EXPLODE each pair
    to the ``window_periods`` window-ends it contributes to (a bounded
    ×W fan-out of the already-deduplicated pairs, not the events), and
    count distinct entities per window end. Windows with no activity in
    their trailing span simply don't appear; window ends are emitted
    only for periods that exist in the data (plus the tail they cover).

    Scale shape: distinct-pair aggregate (map-combinable, uniform keys)
    → lateral explode ×W → one count-distinct per period. Total shuffled
    volume is |distinct pairs|·W, independent of raw event multiplicity.
    Returns ``(period, n_distinct)`` where ``period`` is the epoch
    period index of the window END (window = [period-W+1, period])."""
    if window_periods < 1:
        raise ValueError(f"window_periods must be >= 1, got {window_periods}")
    per = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(period_us)).cast(
        "bigint"
    )
    pairs = (
        events.select(F.col(entity_col).alias("e"), per.alias("p")).distinct()
    )
    # each active (entity, period) contributes to window ends p..p+W-1;
    # clamp to the corpus' max period so trailing phantom windows (ends
    # after the last observed period) are not emitted
    bounds = pairs.agg(F.max("p").alias("pmax"))
    fan = (
        pairs.crossJoin(F.broadcast(bounds))
        .select(
            "e",
            F.explode(
                F.sequence(
                    F.col("p"),
                    F.least(
                        F.col("p") + (window_periods - 1), F.col("pmax")
                    ),
                )
            ).alias("period"),
        )
    )
    return (
        fan.groupBy("period")
        .agg(F.count_distinct("e").cast("bigint").alias("n_distinct"))
        .orderBy("period")
    )


def trend_by_group(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    period_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-group linear trend (OLS slope/intercept of value over time)
    from sufficient statistics — the "is this metric drifting" question
    answered in ONE aggregate pass: no window, no per-group fit loop.
    x = period index relative to each group's first period (keeps the
    integer products small and the intercept interpretable), y = value
    in MILLI-units — milli, not micro, keeps n·Σxy under 2^63 for
    ~10^4-period groups with 10^5 rows (DuckDB would silently widen to
    HUGEINT; Spark's bigint would overflow, so the unit choice is the
    cross-engine safety margin).

    Exactness: the five sufficient sums (n, Σx, Σy, Σxy, Σx²) are exact
    bigints, and the closed-form slope/intercept are integer-div
    rationals — ``slope_milli_per_period = (n·Σxy − Σx·Σy) div
    (n·Σx² − Σx²)`` — so the fit is bit-identical across engines and
    partitionings (float accumulation would be neither). Groups with a
    degenerate x spread (all one period) report NULL slope.

    Scale shape: one groupBy aggregate, map-side combinable; the min-x
    normalization is a window-free second tiny join (per-group min
    period from the same shuffle via two-phase agg). Returns
    ``(group, n, slope_milli_per_period, intercept_milli)``."""
    per = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(period_us)).cast(
        "bigint"
    )
    base = events.select(
        F.col(group_col).alias("g"),
        per.alias("p"),
        F.floor(F.col(value_col).cast("double") * 1e3 + F.lit(0.5))
        .cast("bigint")
        .alias("y"),
    ).where(F.col("y").isNotNull())
    pmin = base.groupBy("g").agg(F.min("p").alias("p0"))
    x = (F.col("p") - F.col("p0")).alias("x")
    suff = (
        base.join(pmin, "g")
        .select("g", x, "y")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.expr("(n * sxy - sx * sy) div (n * sxx - sx * sx)")
    intercept = F.expr("(sy - ((n * sxy - sx * sy) div (n * sxx - sx * sx)) * sx) div n")
    return suff.select(
        F.col("g").alias(group_col),
        F.col("n").cast("bigint").alias("n"),
        F.when(det != 0, slope).cast("bigint").alias("slope_milli_per_period"),
        F.when(det != 0, intercept).cast("bigint").alias("intercept_milli"),
    )


def cusum_changepoints(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    period_us: int = 3_600_000_000,
    baseline_periods: int = 24,
    threshold_x1000: int = 5000,
    slack_x1000: int = 500,
) -> DataFrame:
    """CUSUM change-point detection over per-group period counts — the
    classic drift alarm (Page 1954): accumulate deviations of each
    period's count from a baseline mean, reset at zero, and flag periods
    where the cumulative excess crosses the threshold. Catches sustained
    level shifts that per-period z-score alarms miss.

    Integer formulation (bit-reproducible): baseline mean is taken over
    each group's first ``baseline_periods`` periods in milli-units
    (``sum·1000 div k``); the one-sided statistics are

        hi_t = max(0, hi_{t-1} + (1000·c_t − mean − slack))
        lo_t = max(0, lo_{t-1} − (1000·c_t − mean + slack))

    and a period alarms when ``hi_t`` (upward) or ``lo_t`` (downward)
    exceeds ``threshold_x1000``; on alarm BOTH statistics reset to zero
    (standard restart-after-detection — without it a sustained shift
    re-alarms every period until it decays). The recurrence is a size-bounded
    per-group ordered scan — implemented as ``aggregate()`` over each
    group's collected period series (a group's period count is bounded
    by the time range, thousands, never corpus-sized), keeping the whole
    computation one shuffle + one JVM expression, no Python.

    Returns one row per alarming period:
    ``(group, period, stat_hi_x1000, stat_lo_x1000, direction)``."""
    per = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(period_us)).cast(
        "bigint"
    )
    counts = (
        events.select(F.col(group_col).alias("g"), per.alias("p"))
        .groupBy("g", "p")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # dense per-group grid so silent periods (count 0) push the low-side
    # statistic instead of vanishing
    gb = counts.groupBy("g").agg(F.min("p").alias("pmin"), F.max("p").alias("pmax"))
    dense = (
        gb.select("g", F.explode(F.sequence("pmin", "pmax")).alias("p"))
        .join(counts, ["g", "p"], "left")
        .select("g", "p", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
    )
    series = dense.groupBy("g").agg(
        F.array_sort(F.collect_list(F.struct("p", "c"))).alias("s")
    )
    k = baseline_periods
    mean_m = F.expr(
        f"aggregate(slice(s, 1, {k}), cast(0 as bigint), (a, r) -> a + r.c) "
        f"* 1000 div least(size(s), {k})"
    )
    # ordered scan: aggregate() threads (hi, lo, out-array) through the
    # per-group series; out collects alarming (p, hi, lo) structs
    nh = f"greatest(cast(0 as bigint), acc.hi + (1000 * r.c - __mean - {slack_x1000}))"
    nl = f"greatest(cast(0 as bigint), acc.lo - (1000 * r.c - __mean + {slack_x1000}))"
    alarm = f"({nh} > {threshold_x1000} OR {nl} > {threshold_x1000})"
    scan = F.expr(
        "aggregate(s, "
        "named_struct('hi', cast(0 as bigint), 'lo', cast(0 as bigint), "
        "'out', cast(array() as array<struct<p:bigint,hi:bigint,lo:bigint>>)), "
        "(acc, r) -> named_struct("
        f"'hi', CASE WHEN {alarm} THEN cast(0 as bigint) ELSE {nh} END, "
        f"'lo', CASE WHEN {alarm} THEN cast(0 as bigint) ELSE {nl} END, "
        f"'out', CASE WHEN {alarm} "
        f"THEN array_append(acc.out, named_struct('p', r.p, 'hi', {nh}, 'lo', {nl})) "
        "ELSE acc.out END), "
        "acc -> acc.out)"
    )
    out = (
        series.withColumn("__mean", mean_m)
        .select("g", F.explode(scan).alias("a"))
        .select(
            F.col("g").alias(group_col),
            F.col("a.p").alias("period"),
            F.col("a.hi").alias("stat_hi_x1000"),
            F.col("a.lo").alias("stat_lo_x1000"),
            F.when(F.col("a.hi") > threshold_x1000, F.lit("up"))
            .otherwise(F.lit("down"))
            .alias("direction"),
        )
    )
    return out.orderBy(group_col, "period")


def conversion_paths(
    events: DataFrame,
    target: str = "purchase",
    depth: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """Top converting paths: for every occurrence of the ``target``
    event, the sequence of up to ``depth`` immediately-preceding events
    in that user's timeline, aggregated into path frequencies — the
    "what do users do right before buying" attribution query (the
    fixed-depth, exactly-aggregable cousin of sequential-pattern
    mining; :func:`markov_transitions` is the depth-1 global view).

    Paths shorter than ``depth`` (target near the user's start) are
    real paths with a ``^`` start marker, not dropped — conversions from
    a cold start are usually the interesting ones.

    Scale shape: ``depth`` lag() columns over ONE user-key window
    shuffle, a filter to target rows, then a path-cardinality aggregate
    (≤ |types|^depth keys, map-combined). Returns ``(path, n)`` with
    ``path`` like ``"view>click>purchase"``."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    lags = [
        F.coalesce(F.lag(type_col, i).over(w), F.lit("^"))
        for i in range(depth, 0, -1)
    ]
    path = F.concat_ws(">", *lags, F.col(type_col))
    return (
        events.withColumn("__path", path)
        .where(F.col(type_col) == target)
        .groupBy(F.col("__path").alias("path"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
    )


def time_weighted_avg(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    quant_scale: int = 1000,
) -> DataFrame:
    """Time-weighted average (TWAP) per group over irregularly sampled
    values — the hypertable rollup a plain AVG gets wrong: a sensor that
    reports 100 for an hour and 0 for a second must average ≈100, not
    50. Each sample is held until the NEXT sample of its group
    (zero-order hold); the last sample has no held duration and carries
    no weight.

    Exact integers: values milli-quantize to ``floor(x·quant_scale+0.5)``
    bigints; weights are epoch-microsecond gaps; ``twap_milli =
    Σ(gap·v) div Σ(gap)``. Because Σgap per group is bounded by the
    observed SPAN (gaps tile it), the weighted sum is bounded by
    ``span_µs · max|v_milli|`` — overflow-safe for |v| ≤ ~10⁶ over
    multi-year spans; quantize coarser for wilder domains. NULL values
    are excluded before pairing (the hold skips to the next real
    sample). Groups with a single sample report ``twap_milli`` NULL
    (nothing was ever held).

    Scale shape: ONE shuffle on the group key for the lead() window,
    then a map-side-combinable sum — the same cost as any per-key
    sessionization. Returns ``(group, n_samples, held_us,
    twap_milli)``.
    """
    if quant_scale < 1:
        raise ValueError(f"quant_scale must be >= 1, got {quant_scale}")
    from pyspark.sql import Window

    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(int(quant_scale)) + F.lit(0.5)
    ).cast("bigint")
    rows = (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.col(ts_col).cast("bigint").alias("ts"),
            qv.alias("v"),
            *( [F.col(tiebreak_col)] if tiebreak_col else [] ),
        )
    )
    worder = [F.col("ts").asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy("g").orderBy(*worder)
    gap = (F.lead("ts").over(w) - F.col("ts")).alias("gap")
    held = rows.select("g", "v", gap)
    return (
        held.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_samples"),
            F.sum("gap").cast("bigint").alias("held_us"),
            F.sum(F.col("gap") * F.col("v")).cast("bigint").alias("_wv"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_samples",
            F.coalesce(F.col("held_us"), F.lit(0))
            .cast("bigint")
            .alias("held_us"),
            F.when(
                F.coalesce(F.col("held_us"), F.lit(0)) > 0,
                F.expr("_wv div held_us"),
            )
            .cast("bigint")
            .alias("twap_milli"),
        )
    )


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_horizon_days: int = 3,
) -> DataFrame:
    """Kaplan–Meier survival (retention) curve over per-user observed
    lifetimes — the churn analysis retention_cohorts' fixed-period
    matrix can't express: lifetime = days between a user's first and
    last event; users whose last event falls within
    ``censor_horizon_days`` of the corpus end are CENSORED (still
    alive: they leave the risk set without counting as churn — dropping
    them instead is the classic retention-inflating mistake).

    Estimator: S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over distinct event
    times, with d_i = churns at lifetime t_i and n_i = users still at
    risk. Determinism (the unigram_lm_score discipline): each factor's
    ``log2(1 − d/n)`` is computed in double from exact bigint counts
    and 1e-6-quantized PER STEP; the running sum is then an exact
    integer cumulation, so the curve is order-independent and
    SQL-oracle-able. ``surv_ppm`` re-exponentiates the exact log-sum
    (same pow(2, x) libm call both engines). S hits exact 0 when the
    last at-risk user churns (log2(0) = −inf): emitted as
    ``surv_log2_micro = NULL, surv_ppm = 0``.

    Scale shape: ONE map-combinable per-user aggregate over the corpus
    (min/max ts), one per-day count aggregate, then windows over the
    |distinct lifetimes| rows — bounded by the corpus time span in
    days, never by users or events. Returns one row per distinct churn
    lifetime: ``(t_days, n_risk, n_churn, n_censored_at_t,
    surv_log2_micro, surv_ppm)``."""
    from pyspark.sql import Window

    per_user = events.groupBy(user_col).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    gmax = per_user.agg(F.max("last_ts").alias("gmax"))
    lifetimes = per_user.crossJoin(F.broadcast(gmax)).select(
        F.datediff(F.col("last_ts"), F.col("first_ts"))
        .cast("bigint")
        .alias("t_days"),
        (
            F.col("last_ts")
            < F.col("gmax") - F.expr(f"INTERVAL {int(censor_horizon_days)} DAYS")
        ).alias("churned"),
    )
    per_t = lifetimes.groupBy("t_days").agg(
        F.sum(F.when(F.col("churned"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_churn"),
        F.sum(F.when(~F.col("churned"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_censored_at_t"),
    )
    # at-risk = users with lifetime >= t: reverse running sum over the
    # day-domain rows (bounded by corpus span, never corpus-sized)
    w_desc = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.withColumn(
        "n_risk", F.sum(F.col("n_churn") + F.col("n_censored_at_t")).over(w_desc)
    )
    step = at_risk.withColumn(
        "log_step_micro",
        F.when(
            F.col("n_churn") == 0, F.lit(0).cast("bigint")
        ).when(
            F.col("n_churn") < F.col("n_risk"),
            F.floor(
                F.log2(
                    F.lit(1.0)
                    - F.col("n_churn").cast("double")
                    / F.col("n_risk").cast("double")
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("bigint"),
        ).otherwise(F.lit(None).cast("bigint")),  # d == n: S drops to 0
    )
    w_asc = Window.orderBy(F.asc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # SQL SUM ignores NULLs, so an S=0 step is tracked explicitly: any
    # row at-or-after a d==n step reports survival 0 (a d==n step can in
    # fact only be the last churn row — the risk set is empty beyond it —
    # but the explicit flag makes the zero state locally checkable)
    curve = step.withColumn(
        "n_zero_steps",
        F.sum(
            F.when(F.col("log_step_micro").isNull(), 1).otherwise(0)
        ).over(w_asc),
    ).withColumn("log_sum_micro", F.sum("log_step_micro").over(w_asc))
    return (
        curve.where(F.col("n_churn") > 0)
        .select(
            "t_days",
            "n_risk",
            "n_churn",
            "n_censored_at_t",
            F.when(F.col("n_zero_steps") > 0, F.lit(None).cast("bigint"))
            .otherwise(F.col("log_sum_micro").cast("bigint"))
            .alias("surv_log2_micro"),
            F.when(F.col("n_zero_steps") > 0, F.lit(0))
            .otherwise(
                F.floor(
                    F.pow(
                        F.lit(2.0),
                        F.col("log_sum_micro").cast("double")
                        / F.lit(1000000.0),
                    )
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
            )
            .cast("bigint")
            .alias("surv_ppm"),
        )
    )
