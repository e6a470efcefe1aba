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


def test_two_phase_distinct_ignores_nulls(spark):
    rows = [("view", 1), ("view", None), ("buy", None), ("click", 2), ("click", 2)]
    df = spark.createDataFrame(rows, "event_type string, user_id int")
    got = {
        (r["event_type"], r["n_distinct"])
        for r in two_phase_distinct(df, "event_type", "user_id").collect()
    }
    # COUNT(DISTINCT x) semantics: NULLs don't count; all-NULL group -> 0
    assert got == {("view", 1), ("buy", 0), ("click", 1)}


def test_salted_join_spreads_duplicate_hot_rows(spark):
    # the classic dirty-data skew: many IDENTICAL rows of one hot key
    big = spark.range(5_000).select(F.lit(7).alias("k"), F.lit("same").alias("v"))
    small = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt=8).select("k", "v", "name")
    assert _rows(salted) == _rows(plain)
    # the salt must actually spread identical rows (a row-content hash
    # cannot): check the internal salt column takes multiple values
    from knowledge_graph_etl_spark.extensions.skew import SALT_COL

    salted_col = big.withColumn(SALT_COL, F.floor(F.rand(seed=42) * 8).cast("int"))
    n_salts = salted_col.select(SALT_COL).distinct().count()
    assert n_salts > 1
