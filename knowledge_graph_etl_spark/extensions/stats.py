"""Distribution statistics operators.

:func:`group_quantiles` — exact discrete per-group quantiles via the
rank-selection rule (smallest value whose cumulative rank reaches the
requested fraction), computed with ONE window pass + ONE aggregate.

Built-in alternatives and why not: ``percentile_approx`` is approximate
(t-digest — fine for monitoring, wrong for a correctness-gated pipeline);
``percentile``/``percentile_cont`` interpolate between values, and the
interpolation arithmetic is not bit-reproducible across engines. The
rank-selection form picks REAL data values with pure integer logic, so it
is exact, deterministic, and verifiable against any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_u60


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    fracs: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-group discrete quantiles: for each fraction ``p``, the value at
    rank ``ceil(p * n)`` in ascending order (SQL ``percentile_disc``
    semantics). Output: one row per group with ``n_rows`` and one
    ``p<frac>`` column per fraction (``p0_5`` for the median).

    Scale shape: one shuffle on the group key for the in-partition sort
    (rank + group count share the same window frame), then a map-side
    combinable min-aggregate. A single giant group serializes into one
    task — same caveat as any exact per-group sort; pre-split such groups
    or fall back to ``percentile_approx``."""
    if not fracs:
        raise ValueError("fracs must be non-empty")
    if any(not 0.0 < f <= 1.0 for f in fracs):
        raise ValueError(f"fractions must be in (0, 1], got {fracs}")
    w = Window.partitionBy(group_col).orderBy(value_col)
    wn = Window.partitionBy(group_col)
    # NULL values are excluded BEFORE ranking (percentile_disc semantics):
    # ranked NULLs would sort first, occupy ranks, and shift — or NULL out —
    # every quantile; n_rows likewise counts only real values. A group
    # whose values are all NULL disappears from the output.
    ranked = df.select(group_col, value_col).where(
        F.col(value_col).isNotNull()
    ).select(
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    aggs = [F.min("__n").alias("n_rows")]
    for f in fracs:
        target = F.ceil(F.lit(float(f)) * F.col("__n"))
        name = "p" + str(f).replace(".", "_").rstrip("0").rstrip("_")
        aggs.append(
            F.min(F.when(F.col("__rn") == target, F.col(value_col))).alias(name)
        )
    return ranked.groupBy(group_col).agg(*aggs)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count via a KMV (k-minimum-values)
    sketch — the classic bottom-k estimator: hash values uniformly into
    (0,1], keep each group's k smallest distinct hashes, estimate
    ``(k-1) / h_k`` from the k-th smallest. Groups with fewer than k
    distinct values report their EXACT count (the sketch degenerates to
    the full set).

    Unlike HLL (``approx_count_distinct``), KMV on a fixed hash is fully
    deterministic — same input, same estimate, on any engine — so even the
    *approximate* answer is verifiable against a SQL oracle, and estimates
    are reproducible across pipeline re-runs. Standard error ≈ 1/√(k-2).

    Scale shape: one distinct-aggregate on (group, hash) — map-side
    combinable, uniform 8-byte keys — then a per-group bottom-k via
    ``row_number`` over the hash order. Returns
    ``(group_col, n_kept, est_distinct)``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # md5_u60 → uniform integer in [0, 2^60); +1 keeps the normalized
    # hash in (0, 1] so the estimator never divides by zero
    h = (md5_u60(F.col(value_col).cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(16**15))
    pairs = df.select(F.col(group_col), h.alias("__h")).distinct()
    w = Window.partitionBy(group_col).orderBy("__h")
    ranked = pairs.withColumn("__rk", F.row_number().over(w)).where(
        F.col("__rk") <= k
    )
    return ranked.groupBy(group_col).agg(
        F.count("*").alias("n_kept"),
        F.round(
            F.when(
                F.count("*") < k, F.count("*").cast("double")
            ).otherwise(F.lit(float(k - 1)) / F.max("__h")),
            4,
        ).alias("est_distinct"),
    )
