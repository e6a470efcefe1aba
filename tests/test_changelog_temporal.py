"""Unit tests for the CDC materializations (extensions/changelog.py) and
the gap-fill + LOCF rollup (extensions/temporal.gapfill_locf) — oracled in
the driver gate since r06, pinned here on hand-built changelogs covering
the behavior-rich edges: deletes, out-of-order arrival, re-insert after
delete, ties, pre-first-observation gaps."""

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.extensions.changelog import (
    VALID_TO_OPEN,
    latest_snapshot,
    scd2_intervals,
)
from knowledge_graph_etl_spark.extensions.temporal import gapfill_locf


def _log(spark):
    # (key, ts, val, op) — key 1: two upserts; key 2: upsert then delete;
    # key 3: upsert, delete, re-insert; rows deliberately out of order
    rows = [
        (1, 10, "a1", "upsert"),
        (2, 10, "b1", "upsert"),
        (1, 30, "a2", "upsert"),
        (3, 40, "c2", "upsert"),
        (2, 20, "b?", "delete"),
        (3, 10, "c1", "upsert"),
        (3, 20, "c?", "delete"),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "val", "op"])


def test_latest_snapshot_applies_deletes_and_order(spark):
    out = {
        r["k"]: (r["ts"], r["val"])
        for r in latest_snapshot(_log(spark), ["k"], ["ts"]).collect()
    }
    # key 1: newest upsert wins; key 2: final op is delete -> gone;
    # key 3: re-inserted after delete -> present with the newest version
    assert out == {1: (30, "a2"), 3: (40, "c2")}


def test_latest_snapshot_validates_args(spark):
    with pytest.raises(ValueError):
        latest_snapshot(_log(spark), [], ["ts"])
    with pytest.raises(ValueError):
        latest_snapshot(_log(spark), ["k"], [])


def test_scd2_intervals_history(spark):
    rows = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["is_current"], r["val"])
        for r in scd2_intervals(_log(spark), ["k"], "ts").collect()
    }
    # key 1: [10,30) closed by the next upsert, [30, open)
    assert rows[(1, 10)] == (30, False, "a1")
    assert rows[(1, 30)] == (VALID_TO_OPEN, True, "a2")
    # key 2: the delete closes the interval; no row for the delete itself
    assert rows[(2, 10)] == (20, False, "b1")
    assert (2, 20) not in rows
    # key 3: upsert closed by delete, re-insert open-ended
    assert rows[(3, 10)] == (20, False, "c1")
    assert rows[(3, 40)] == (VALID_TO_OPEN, True, "c2")
    assert len(rows) == 5


def test_scd2_tiebreak_totalizes_equal_timestamps(spark):
    rows = [
        (1, 10, 1, "v1", "upsert"),
        (1, 10, 2, "v2", "upsert"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "seq", "val", "op"])
    out = sorted(
        scd2_intervals(df, ["k"], "ts", tiebreak_cols=["seq"]).collect(),
        key=lambda r: r["seq"],
    )
    # same-ts versions chain: seq 1 closed AT ts 10 by seq 2, seq 2 open
    assert (out[0]["valid_to"], out[0]["is_current"]) == (10, False)
    assert (out[1]["valid_to"], out[1]["is_current"]) == (VALID_TO_OPEN, True)


def test_gapfill_locf_grid_and_carry_forward(spark):
    # key "x": buckets 0 and 30; key "y": only bucket 20 — global grid
    # spans [0, 30], so x gaps at 10/20 carry 5.0, y gaps before its
    # first observation take the fill_default
    rows = [("x", 3, 5.0), ("x", 31, 7.0), ("y", 25, 9.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = {
        (r["k"], r["ts"]): (r["n_events"], r["filled_value"], r["is_gap"])
        for r in gapfill_locf(df, "k", "ts", "v", bucket_width=10).collect()
    }
    assert out[("x", 0)] == (1, 5.0, False)
    assert out[("x", 10)] == (0, 5.0, True)
    assert out[("x", 20)] == (0, 5.0, True)
    assert out[("x", 30)] == (1, 7.0, False)
    assert out[("y", 0)] == (0, -1.0, True)
    assert out[("y", 10)] == (0, -1.0, True)
    assert out[("y", 20)] == (1, 9.0, False)
    assert out[("y", 30)] == (0, 9.0, True)
    assert len(out) == 8  # 2 keys x dense 4-bucket grid
    with pytest.raises(ValueError):
        gapfill_locf(df, "k", "ts", "v", bucket_width=0)


def test_snapshot_diff_classifies_all_four(spark):
    from knowledge_graph_etl_spark.extensions.changelog import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert out[1]["status"] == "unchanged"
    assert out[2]["status"] == "changed" and out[2]["old_md5"] != out[2]["new_md5"]
    assert out[3]["status"] == "removed" and out[3]["new_md5"] == ""
    assert out[4]["status"] == "added" and out[4]["old_md5"] == ""
    assert len(out) == 4
    # identical snapshots -> everything unchanged
    same = snapshot_diff(old, old).collect()
    assert all(r["status"] == "unchanged" for r in same) and len(same) == 3


def test_snapshot_diff_null_text_is_present_not_absent(spark):
    """Review-pinned: NULL text on a PRESENT row must not read as an
    added/removed row — it hashes as the empty string."""
    from knowledge_graph_etl_spark.extensions.changelog import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x"), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "changed", 2: "unchanged"}


def test_scd2_apply_snapshot_all_four_cases(spark):
    from knowledge_graph_etl_spark.extensions.changelog import (
        VALID_TO_OPEN,
        scd2_apply_snapshot,
    )

    dim = spark.createDataFrame(
        [
            # closed history row — must pass through untouched
            (1, "a-old", 100, 50, False),
            (1, "a", 100, VALID_TO_OPEN, True),   # unchanged
            (2, "b", 100, VALID_TO_OPEN, True),   # attr will change
            (3, "c", 100, VALID_TO_OPEN, True),   # deleted upstream
        ],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    ).withColumn("valid_from", F.col("valid_from").cast("long"))
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (4, "d")], "k int, attr string"
    )
    out = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply_snapshot(dim, snap, ["k"], ["attr"], ts=200).collect()
    }
    assert out == {
        (1, "a-old", 100, 50, False),
        (1, "a", 100, VALID_TO_OPEN, True),
        (2, "b", 100, 200, False),
        (2, "b2", 200, VALID_TO_OPEN, True),
        (3, "c", 100, 200, False),
        (4, "d", 200, VALID_TO_OPEN, True),
    }


def test_scd2_apply_null_attr_is_unchanged(spark):
    from knowledge_graph_etl_spark.extensions.changelog import (
        VALID_TO_OPEN,
        scd2_apply_snapshot,
    )

    dim = spark.createDataFrame(
        [(1, None, 100, VALID_TO_OPEN, True)],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    )
    snap = spark.createDataFrame([(1, None)], "k int, attr string")
    rows = scd2_apply_snapshot(dim, snap, ["k"], ["attr"], ts=200).collect()
    assert len(rows) == 1 and rows[0].valid_from == 100 and rows[0].is_current


def test_scd2_apply_equals_full_rebuild(spark):
    """Iterated incremental application == scd2_intervals over the
    change-only changelog of the same snapshot series."""
    from knowledge_graph_etl_spark.extensions.changelog import (
        VALID_TO_OPEN,
        scd2_apply_snapshot,
        scd2_intervals,
    )

    snaps = {
        100: [(1, "a"), (2, "b"), (3, "c")],
        200: [(1, "a"), (2, "b2")],            # 2 changed, 3 deleted
        300: [(1, "a2"), (2, "b2"), (4, "d")], # 1 changed, 4 added
    }
    dim = spark.createDataFrame(
        [(k, v, 100, VALID_TO_OPEN, True) for k, v in snaps[100]],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    )
    for ts in (200, 300):
        snap = spark.createDataFrame(snaps[ts], "k int, attr string")
        dim = scd2_apply_snapshot(dim, snap, ["k"], ["attr"], ts=ts)
    # change-only changelog of the same series
    log = [(1, "a", 100, "upsert"), (2, "b", 100, "upsert"),
           (3, "c", 100, "upsert"), (2, "b2", 200, "upsert"),
           (3, None, 200, "delete"), (1, "a2", 300, "upsert"),
           (4, "d", 300, "upsert")]
    cl = spark.createDataFrame(log, "k int, attr string, ts long, op string")
    full = scd2_intervals(cl, ["k"], "ts").select(
        "k", "attr", "valid_from", "valid_to", "is_current"
    )
    a = {tuple(r) for r in dim.collect()}
    b = {tuple(r) for r in full.collect()}
    assert a == b


def test_scd2_apply_validates(spark):
    from knowledge_graph_etl_spark.extensions.changelog import (
        VALID_TO_OPEN,
        scd2_apply_snapshot,
    )

    dim = spark.createDataFrame(
        [(1, "a", 100, VALID_TO_OPEN, True)],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    )
    snap = spark.createDataFrame([(1, "a")], "k int, attr string")
    with pytest.raises(ValueError):
        scd2_apply_snapshot(dim, snap, [], ["attr"], ts=200)
    with pytest.raises(ValueError):
        scd2_apply_snapshot(dim, snap, ["k"], ["attr"], ts=VALID_TO_OPEN)
    with pytest.raises(ValueError):
        scd2_apply_snapshot(
            dim.drop("is_current"), snap, ["k"], ["attr"], ts=200
        )
