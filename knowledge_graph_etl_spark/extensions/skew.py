"""Skew-mitigation operators: salted shuffle join and two-phase distinct
aggregation.

Why these exist at 100 TB: a shuffle hash-partitions by key, so ONE hot
logical key (a viral document, a null-ish default id, a mega-customer) lands
on ONE task regardless of cluster size. AQE's skew-join splits oversized
*partitions*, but a single logical key hashing to a single partition cannot
be split without changing the join itself — that is what salting does:

* ``salted_join`` — replicate the small side ``salt`` times (one copy per
  salt value) and give every big-side row a deterministic pseudo-random
  salt, joining on ``(key, salt)``. The hot key's rows now spread over
  ``salt`` tasks. Result set is IDENTICAL to the plain join (each big-side
  row still meets every matching small-side row exactly once) — verified
  against the unsalted oracle.
* ``two_phase_distinct`` — COUNT(DISTINCT x) GROUP BY k shuffles every
  (k, x) pair to k's single reducer; pre-deduplicating on (k, x) — a
  shuffle whose key space is the full pair domain, hence un-skewed — turns
  the final per-key step into a plain COUNT over already-unique rows.

Both stay entirely in built-in Column expressions (no UDFs); the salt is
a seeded ``rand()`` so even FULLY-DUPLICATE rows of a hot key spread over
salts (a row-content hash cannot do that), while the join result itself is
salt-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, spreading each big-side key over
    ``salt`` shuffle partitions.

    ``small`` is replicated ``salt``× (its shuffled volume multiplies —
    use for sides that are too big to broadcast but far smaller than
    ``big``; with a broadcastable side, ``F.broadcast`` needs no salt at
    all). ``how`` supports the join types whose semantics survive key
    replication unchanged on the big side: ``inner``, ``left``,
    ``left_semi``, ``left_anti``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    # seeded rand, not a row-content hash: fully-duplicate rows of a hot
    # key (the classic dirty-data skew) must spread over salts too, which
    # any deterministic function of the row's columns cannot do. The join
    # RESULT is salt-independent (the small side is replicated at every
    # salt value), so recomputation under task retry is semantically safe
    # — the same guarantee class as Spark's own round-robin repartition.
    big_salted = big.withColumn(
        SALT_COL, F.floor(F.rand(seed=42) * salt).cast("int")
    )
    small_rep = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_rep, on=[*keys, SALT_COL], how=how)
    return out.drop(SALT_COL)


def two_phase_distinct(
    df: DataFrame,
    group_cols: list[str] | str,
    distinct_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Skew-safe ``COUNT(DISTINCT distinct_col) GROUP BY group_cols``.

    Phase 1 deduplicates on (group, value) — the shuffle key is the PAIR,
    so a hot group fans out over as many partitions as it has distinct
    values. Phase 2 counts the surviving unique rows per group; its input
    is bounded by the distinct-value count, not the raw row count.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    uniq = df.select(*groups, distinct_col).dropDuplicates([*groups, distinct_col])
    # count(col), not count(*): COUNT(DISTINCT x) ignores NULL x, so the
    # surviving (group, NULL) row must not be counted
    return uniq.groupBy(*groups).agg(F.count(F.col(distinct_col)).alias(out_col))


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnosis — the measurement that tells you WHETHER
    :func:`salted_join` / AQE skew handling is needed, and how big a salt
    to pick, before burning a cluster run on a skewed shuffle. Per-key
    row counts → global heavy hitters plus imbalance statistics.

    Returns the ``top_k`` heaviest keys:
    ``(rank, <key_cols>, key_count, share_ppm, skew_ratio_ppm,
    suggested_salt, n_keys, n_rows)`` — ``share_ppm`` the key's fraction
    of all rows, ``skew_ratio_ppm`` its count over the mean per-key count
    (1e6 = perfectly uniform), ``suggested_salt`` that ratio rounded up
    (replicating the small side this many times levels the hot key to
    ~average task size). All ratios are integer ppm (exact cross-engine
    division). Ties break on the key columns ascending.

    Scale shape: one map-side-combinable count on the key (the same
    shuffle being diagnosed, but with combiners — per-partition partial
    counts mean the hot key ships one row per upstream partition, not
    its full row set), a broadcast 1-row totals aggregate, and a
    distributed sort-limit (TakeOrdered) for the top-k — no single-task
    stage anywhere.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("key_count")
    )
    totals = counts.agg(
        F.sum("key_count").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    order = [F.col("key_count").desc()] + [F.col(c).asc() for c in key_cols]
    top = counts.orderBy(*order).limit(int(top_k))
    from pyspark.sql import Window

    w = Window.orderBy(*order)  # top_k rows only — the window is tiny
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            *key_cols,
            "key_count",
            # decimal(38,0) intermediates: key_count * n_keys * 1e6 in
            # int64 overflows at ~1e7 rows x 1e6 keys — exactly the scale
            # this diagnostic targets; the final ratios fit BIGINT
            # (bounded by n_keys * 1e6)
            F.expr(
                "CAST(CAST(key_count AS DECIMAL(38,0)) * 1000000 "
                "DIV n_rows AS BIGINT)"
            ).alias("share_ppm"),
            F.expr(
                "CAST(CAST(key_count AS DECIMAL(38,0)) * n_keys * 1000000 "
                "DIV n_rows AS BIGINT)"
            ).alias("skew_ratio_ppm"),
            F.expr(
                "CAST((CAST(key_count AS DECIMAL(38,0)) * n_keys + n_rows - 1) "
                "DIV n_rows AS BIGINT)"
            ).alias("suggested_salt"),
            "n_keys",
            "n_rows",
        )
    )
