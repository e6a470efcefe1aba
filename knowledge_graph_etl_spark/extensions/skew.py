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
