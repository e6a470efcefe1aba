"""Skew-mitigation operator tests: salted join and two-phase distinct must
be RESULT-identical to their plain equivalents (the whole point — change
the shuffle, not the answer), including under a deliberately hot key."""

from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.skew import salted_join, two_phase_distinct


def _hot_tables(spark):
    # 10k rows, 90% on ONE key (the skew case AQE can't split)
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("name")
    )
    return big, small


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_matches_plain(spark):
    big, small = _hot_tables(spark)
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt=8).select("k", "v", "name")
    assert _rows(salted) == _rows(plain)


def test_salted_left_join_keeps_unmatched(spark):
    big, small = _hot_tables(spark)
    small_half = small.where(F.col("k") < 50)
    plain = big.join(small_half, "k", "left").select("k", "v", "name")
    salted = salted_join(big, small_half, "k", how="left", salt=4).select(
        "k", "v", "name"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_semi_and_anti(spark):
    big, small = _hot_tables(spark)
    small_half = small.where(F.col("k") % 2 == 0)
    for how in ("left_semi", "left_anti"):
        plain = big.join(small_half, "k", how)
        salted = salted_join(big, small_half, "k", how=how, salt=4)
        assert _rows(salted.select("k", "v")) == _rows(plain.select("k", "v"))


def test_salted_join_rejects_right_outer(spark):
    big, small = _hot_tables(spark)
    import pytest

    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="right")


def test_two_phase_distinct_matches_count_distinct(spark):
    big, _ = _hot_tables(spark)
    df = big.select("k", (F.col("v") % 37).alias("x"))
    plain = df.groupBy("k").agg(F.countDistinct("x").alias("n_distinct"))
    two = two_phase_distinct(df, "k", "x")
    assert _rows(two) == _rows(plain)


def test_two_phase_distinct_multi_group(spark):
    df = spark.range(5_000).select(
        (F.col("id") % 3).alias("a"),
        (F.col("id") % 2).alias("b"),
        (F.col("id") % 11).alias("x"),
    )
    plain = df.groupBy("a", "b").agg(F.countDistinct("x").alias("n_distinct"))
    two = two_phase_distinct(df, ["a", "b"], "x")
    assert _rows(two) == _rows(plain)
