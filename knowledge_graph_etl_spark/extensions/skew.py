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
``pmod(xxhash64(entire row), salt)`` — deterministic under task retry,
uniform for any row mix, and requiring no extra column from the caller.
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
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(salt)),
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
    return uniq.groupBy(*groups).agg(F.count(F.lit(1)).alias(out_col))
