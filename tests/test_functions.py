"""Scalar-function semantics vs Python oracles (SURVEY.md §5.2 item 2,
gotchas: STRAFTER first-occurrence, ENCODE_FOR_URI RFC 3986)."""

import hashlib
import urllib.parse

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.functions import (
    bound,
    concat,
    encode_for_uri,
    iif,
    lcase,
    md5,
    replace,
    strafter,
    strbefore,
    strstarts,
)


def run(spark, col_expr, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["r"] for r in df.select(col_expr.alias("r")).collect()]


def test_md5_concat_lcase(spark):
    vals = ["Content Partner", "", "ünïcode"]
    got = run(spark, md5(concat(F.lit("ns:"), F.col("v"))), vals)
    assert got == [hashlib.md5(("ns:" + v).encode()).hexdigest() for v in vals]
    assert run(spark, lcase(F.col("v")), ["AbC"]) == ["abc"]


def test_concat_null_propagation(spark):
    # SPARQL: unbound arg → unbound result; Spark concat(NULL,…) → NULL ✓
    got = run(spark, concat(F.lit("x"), F.col("v")), [None])
    assert got == [None]


@pytest.mark.parametrize(
    "s,sep,want",
    [
        ("1 - Cultuur - extra", " - ", "Cultuur - extra"),  # FIRST occurrence
        ("no separator", " - ", ""),                        # absent → empty string
        ("a - ", " - ", ""),
        (" - b", " - ", "b"),
        ("", " - ", ""),
    ],
)
def test_strafter(spark, s, sep, want):
    assert run(spark, strafter(F.col("v"), sep), [s]) == [want]


def test_strafter_null(spark):
    assert run(spark, strafter(F.col("v"), "-"), [None]) == [None]


def test_strbefore(spark):
    assert run(spark, strbefore(F.col("v"), " - "), ["a - b - c", "nope"]) == ["a", ""]


@pytest.mark.parametrize(
    "s",
    ["Accountmanager Publiek", "a b~c*d", "één/twee?drie", "keep-AZaz09_.~", "100%"],
)
def test_encode_for_uri_rfc3986(spark, s):
    # XPath fn:encode-for-uri == urllib.parse.quote with unreserved safe set
    want = urllib.parse.quote(s, safe="-_.~")
    assert run(spark, encode_for_uri(F.col("v")), [s]) == [want]


def test_replace_and_strstarts_and_if_bound(spark):
    assert run(spark, replace(F.col("v"), " ", "_"), ["a b c"]) == ["a_b_c"]
    assert run(
        spark,
        iif(strstarts(F.col("v"), "http"), F.lit("y"), F.lit("n")),
        ["https://x", "www.x"],
    ) == ["y", "n"]
    assert run(spark, iif(bound(F.col("v")), F.col("v"), F.lit("dflt")), [None, "x"]) == [
        "dflt",
        "x",
    ]
