"""Structured-Streaming operators: ingest-to-store, windowed aggregation
with watermark, stateful sessionization. File-stream sources +
availableNow triggers keep runs deterministic."""

import json
import os

import pytest
from pyspark.sql import functions as F

from knowledge_graph_etl_spark.store import GraphStore
from knowledge_graph_etl_spark.streaming import (
    dedup_events,
    sessionize,
    stream_insert_into_store,
    stream_json_to_quads,
    windowed_event_counts,
)


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_into_store(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_jsonl(
        os.path.join(src, "batch1.jsonl"),
        [
            {"doc_id": "a", "json": json.dumps({"name": "A", "n": 1})},
            {"doc_id": "b", "json": json.dumps({"name": "B"})},
        ],
    )
    store = GraphStore(spark, str(tmp_path / "store"))
    docs = (
        spark.readStream.schema("doc_id string, json string")
        .json(src)
    )
    quads = stream_json_to_quads(docs, "urn:g:stream", namespace="urn:p:")
    q = stream_insert_into_store(
        quads, store, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    got = {
        (r["s"], r["p"], r["o_value"])
        for r in store.graph("urn:g:stream").collect()
    }
    assert ("_:ba-0", "urn:p:name", "A") in got
    assert ("_:ba-0", "urn:p:n", "1") in got
    assert ("_:bb-0", "urn:p:name", "B") in got

    # second batch overlapping the first: set semantics across batches
    _write_jsonl(
        os.path.join(src, "batch2.jsonl"),
        [
            {"doc_id": "a", "json": json.dumps({"name": "A", "n": 1})},  # dup
            {"doc_id": "c", "json": json.dumps({"name": "C"})},
        ],
    )
    q = stream_insert_into_store(
        stream_json_to_quads(
            spark.readStream.schema("doc_id string, json string").json(src),
            "urn:g:stream",
            namespace="urn:p:",
        ),
        store,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    rows = store.graph("urn:g:stream").collect()
    assert len(rows) == len({tuple(r) for r in rows})  # no duplicates
    assert ("_:bc-0", "urn:p:name", "C") in {
        (r["s"], r["p"], r["o_value"]) for r in rows
    }


def _event_rows():
    return [
        # user 1: two sessions separated by > 30 min
        (1, "2024-01-01T10:00:00", "view", 1.0),
        (1, "2024-01-01T10:10:00", "view", 2.0),
        (1, "2024-01-01T11:30:00", "buy", 5.0),
        # user 2: one session
        (2, "2024-01-01T10:05:00", "view", 3.0),
    ]


def _events_df(spark):
    df = spark.createDataFrame(
        _event_rows(), "user_id bigint, ts_s string, event_type string, value double"
    )
    return df.select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    )


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    batch = windowed_event_counts(_events_df(spark), window_duration="1 hour")
    expect = {
        (str(r["window_start"]), r["event_type"], r["cnt"], r["sum_value"])
        for r in batch.collect()
    }
    src = str(tmp_path / "ev")
    _events_df(spark).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src)
    out = windowed_event_counts(stream, window_duration="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"], r["cnt"], r["sum_value"])
        for r in spark.table("win_counts").collect()
    }
    assert got == expect and len(got) == 2


def test_sessionize_batch(spark):
    out = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in sessionize(_events_df(spark), gap_seconds=1800).collect()
    }
    assert out == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (1, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1),
        (2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1),
    }


def test_sessionize_stream_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "ev2")
    _events_df(spark).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src)
    out = sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.table("sessions").collect()
    }
    # within one availableNow run only sessions CLOSED by a later event in
    # the same user's stream emit; open sessions wait for timeout.
    # user 1's first session closes when the 11:30 event arrives.
    assert (1, "2024-01-01 10:00:00", 2) in got


def test_dedup_events_stream_matches_batch(spark, tmp_path):
    # duplicate keys across the stream: (1, view) appears twice
    batch = dedup_events(_events_df(spark), key_cols=("user_id", "event_type"))
    expect = {(r["user_id"], r["event_type"]) for r in batch.collect()}
    assert expect == {(1, "view"), (1, "buy"), (2, "view")}
    src = str(tmp_path / "ev_dedup")
    _events_df(spark).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "user_id bigint, ts timestamp, event_type string, value double"
    ).parquet(src)
    out = dedup_events(stream, key_cols=("user_id", "event_type"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_keys")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["event_type"]) for r in spark.table("dedup_keys").collect()}
    assert got == expect


def test_sessionize_survives_late_event_past_gap(spark, tmp_path):
    """A group whose newest event is already more than gap_seconds behind
    the current watermark (late data is NOT filtered for stateful
    applyInPandasWithState) must not kill the query: the timeout timestamp
    is clamped past the watermark instead of raising."""
    d = tmp_path / "late"
    d.mkdir()
    df1 = spark.createDataFrame(
        [(1, "2024-01-01T12:00:00", "view", 1.0)],
        "user_id bigint, ts_s string, event_type string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    df2 = spark.createDataFrame(
        # 09:25 event: within nothing — watermark after batch1 is
        # 12:00 - 2h = 10:00, and 09:25 + 30min gap = 09:55 < 10:00
        [(2, "2024-01-01T09:25:00", "view", 1.0)],
        "user_id bigint, ts_s string, event_type string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    df1.write.parquet(str(d / "b1"))
    df2.write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema(
            "user_id bigint, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d) + "/*")
    )
    out = sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the query completed without the IllegalArgumentException; user 2's
    # state was registered (it emits on timeout in a later batch — here we
    # only assert survival and that nothing crashed)
    assert q.exception() is None


def test_curate_docs_stream_matches_batch(spark, tmp_path):
    """curate_docs is stateless, so the same transform must produce the
    same curated rows from a file stream as from the batch read."""
    from knowledge_graph_etl_spark.streaming import curate_docs

    rows = [
        {"doc_id": "keep", "text": "one two\tthree  mail a@b.io five six"},
        {"doc_id": "short", "text": "too short"},
        {"doc_id": "ip", "text": "host 10.1.2.3 up and running fine now"},
    ]
    src = str(tmp_path / "docs")
    _write_jsonl(os.path.join(src, "b1.jsonl"), rows[:2])
    _write_jsonl(os.path.join(src, "b2.jsonl"), rows[2:])

    batch = curate_docs(
        spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in rows], "doc_id string, text string"
        )
    )
    stream = curate_docs(
        spark.readStream.schema("doc_id string, text string").json(src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("curate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {tuple(r) for r in spark.sql("SELECT * FROM curate_out").collect()}
    got_batch = {tuple(r) for r in batch.collect()}
    assert got_stream == got_batch
    ids = {t[0] for t in got_batch}
    assert ids == {"keep", "ip"}  # 'short' filtered by token length
    by_id = {t[0]: t for t in got_batch}
    assert "<EMAIL>" in by_id["keep"][1] and by_id["keep"][2] == 1
    assert "<IP>" in by_id["ip"][1] and by_id["ip"][3] == 1
    assert "\t" not in by_id["keep"][1]  # normalization collapsed the tab


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """interval_join: same rows from a pair of file streams as from the
    batch frames (watermarked stream-stream join vs plain range join)."""
    from knowledge_graph_etl_spark.streaming import interval_join

    lrows = [
        {"user": "u1", "ts": "2024-01-01T10:00:00", "what": "buy"},
        {"user": "u1", "ts": "2024-01-01T12:00:00", "what": "buy2"},
        {"user": "u2", "ts": "2024-01-01T10:30:00", "what": "buy3"},
    ]
    rrows = [
        {"user": "u1", "ts": "2024-01-01T09:30:00", "page": "a"},  # within 1h of buy
        {"user": "u1", "ts": "2024-01-01T08:00:00", "page": "b"},  # too old
        {"user": "u1", "ts": "2024-01-01T11:59:00", "page": "c"},  # within 1h of buy2
        {"user": "u2", "ts": "2024-01-01T10:30:00", "page": "d"},  # exactly at ts
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_jsonl(os.path.join(lsrc, "a.jsonl"), lrows)
    _write_jsonl(os.path.join(rsrc, "a.jsonl"), rrows)
    schema_l = "user string, ts timestamp, what string"
    schema_r = "user string, ts timestamp, page string"

    batch = interval_join(
        spark.read.schema(schema_l).json(lsrc),
        spark.read.schema(schema_r).json(rsrc),
        key="user",
        max_lag_seconds=3600,
    )
    got_batch = {(r["what"], r["r_page"]) for r in batch.collect()}
    assert got_batch == {("buy", "a"), ("buy2", "c"), ("buy3", "d")}

    stream = interval_join(
        spark.readStream.schema(schema_l).json(lsrc),
        spark.readStream.schema(schema_r).json(rsrc),
        key="user",
        max_lag_seconds=3600,
        watermark_seconds=7200,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r["what"], r["r_page"])
        for r in spark.sql("SELECT * FROM ij_out").collect()
    }
    assert got_stream == got_batch


def test_enrich_stream_matches_batch(spark, tmp_path):
    from knowledge_graph_etl_spark.streaming import enrich_stream

    ev = spark.createDataFrame(
        [(1, 10, "click"), (2, 11, "view"), (3, 99, "click")],
        "event_id long, user_id long, event_type string",
    )
    dim = spark.createDataFrame(
        [(10, "A"), (11, "B")], "user_id long, name string"
    )
    batch = {
        tuple(r) for r in enrich_stream(ev, dim).collect()
    }
    # unmatched user keeps the event with name NULL (left join)
    assert (99, 3, "click", None) in batch and len(batch) == 3
    src = str(tmp_path / "enr")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string"
    ).parquet(src)
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("enriched").collect()}
    assert got == batch


# -- running-stats anomaly flagging -------------------------------------------


def _anom_rows():
    # user 7: steady values then a spike; user 8: too few priors to flag
    rows = []
    for i in range(8):
        rows.append((100 + i, 7, f"2024-01-01T10:{i:02d}:00", 10.0 + (i % 2)))
    rows.append((120, 7, "2024-01-01T10:30:00", 500.0))  # spike
    rows.append((121, 7, "2024-01-01T10:31:00", 10.0))   # back to normal
    rows.append((200, 8, "2024-01-01T10:00:00", 1.0))
    rows.append((201, 8, "2024-01-01T10:01:00", 99.0))   # only 1 prior
    return rows


def _anom_df(spark):
    df = spark.createDataFrame(
        _anom_rows(), "event_id bigint, user_id bigint, ts_s string, value double"
    )
    return df.select(
        "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"), "value"
    )


def test_flag_anomalies_batch(spark):
    from knowledge_graph_etl_spark.streaming.anomaly import flag_anomalies

    out = {r["event_id"]: r for r in flag_anomalies(_anom_df(spark)).collect()}
    assert len(out) == len(_anom_rows())  # every event judged
    assert out[120]["is_anomaly"] and out[120]["n_prior"] == 8  # the spike
    # steady values never flag; early events lack min_prior
    for eid in list(range(100, 108)) + [200, 201]:
        assert not out[eid]["is_anomaly"], eid
    # 121 follows the spike: mean/σ inflated by it, 10.0 not 3σ out
    assert not out[121]["is_anomaly"]


def test_flag_anomalies_stream_matches_batch(spark, tmp_path):
    from knowledge_graph_etl_spark.streaming.anomaly import flag_anomalies

    batch = {
        (r["event_id"], r["user_id"], r["n_prior"], r["is_anomaly"])
        for r in flag_anomalies(_anom_df(spark)).collect()
    }
    src = str(tmp_path / "anom")
    _anom_df(spark).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, user_id bigint, ts timestamp, value double"
    ).parquet(src)
    q = (
        flag_anomalies(stream)
        .writeStream.format("memory")
        .queryName("anom")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["user_id"], r["n_prior"], r["is_anomaly"])
        for r in spark.table("anom").collect()
    }
    assert got == batch


def test_flag_anomalies_overflow_raises_not_false(spark):
    """ADVICE r04: a decimal(38,0) overflow in the batch z-test must raise
    (with the rescale remediation), never silently report
    is_anomaly=false — the streaming path's unbounded Python ints would
    disagree."""
    import datetime

    import pytest

    from knowledge_graph_etl_spark.streaming.anomaly import flag_anomalies

    t0 = datetime.datetime(2026, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), "u1", 1.0) for i in range(5)
    ]
    # 6th event: value quantizes to 2e18 milli-units -> (vq*n)^2 ~ 1e38
    # overflows decimal(38,0)
    rows.append((5, t0 + datetime.timedelta(minutes=5), "u1", 2.0e15))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id string, value double"
    )
    with pytest.raises(Exception, match="overflow|USER_RAISED"):
        flag_anomalies(df).collect()
    # sane magnitudes keep working and flag the obvious spike
    ok_rows = [
        (i, t0 + datetime.timedelta(minutes=i), "u1", 1.0) for i in range(5)
    ] + [(5, t0 + datetime.timedelta(minutes=5), "u1", 100.0)]
    ok = spark.createDataFrame(
        ok_rows, "event_id bigint, ts timestamp, user_id string, value double"
    )
    got = {r["event_id"]: r["is_anomaly"] for r in flag_anomalies(ok).collect()}
    assert got[5] is True and not any(got[i] for i in range(5))


def _neardup_docs():
    text_a = "the quick brown fox jumps over the lazy dog while the band plays on"
    return [
        (1, text_a),
        (2, "completely different content about parquet files and shuffles"),
        (3, text_a + " tonight"),  # near-dup of 1
        (4, text_a),  # exact dup of 1
    ]


def test_flag_neardups_batch(spark):
    from knowledge_graph_etl_spark.streaming.neardup import flag_neardups

    docs = spark.createDataFrame(_neardup_docs(), "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["dup_of"]): r["est_jaccard"]
        for r in flag_neardups(docs, threshold=0.7).collect()
    }
    assert (4, 1) in got and got[(4, 1)] == 1.0
    assert (3, 1) in got and got[(3, 1)] >= 0.7
    assert all(k[0] != 2 for k in got)  # unrelated doc never flagged


def test_flag_neardups_stream_matches_batch(spark, tmp_path):
    """Cross-batch state: docs 1-2 arrive in micro-batch 1, docs 3-4 in
    micro-batch 2 — the later batch's dups are flagged against the
    REMEMBERED firsts. Output set (deduped across bucket groups) equals
    the batch twin's."""
    from knowledge_graph_etl_spark.streaming.neardup import flag_neardups

    rows = _neardup_docs()
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    expect = {
        (r["doc_id"], r["dup_of"], r["est_jaccard"])
        for r in flag_neardups(docs, threshold=0.7).collect()
    }
    src = str(tmp_path / "nd")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(rows[:2], "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    spark.createDataFrame(rows[2:], "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(src, "b2"))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = flag_neardups(stream, threshold=0.7)
    q = (
        out.writeStream.format("memory")
        .queryName("neardups")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["dup_of"], r["est_jaccard"])
        for r in spark.table("neardups").collect()
    }
    assert got == expect


def _drift_df(spark):
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    rows = []
    # key A: 10/h for 6h baseline, then 2/h for 6h -> downward alarms;
    # key B: flat 6/h throughout -> no alarms. Sentinel far-future event
    # per key closes every real period in the stream.
    for h in range(6):
        rows += [("A", t0 + datetime.timedelta(hours=h, minutes=m)) for m in range(0, 60, 6)]
    for h in range(6, 12):
        rows += [("A", t0 + datetime.timedelta(hours=h, minutes=m)) for m in range(0, 60, 30)]
    for h in range(12):
        rows += [("B", t0 + datetime.timedelta(hours=h, minutes=m)) for m in range(0, 60, 10)]
    sentinel = t0 + datetime.timedelta(hours=13)
    rows += [("A", sentinel), ("B", sentinel)]
    return spark.createDataFrame(rows, "event_type string, ts timestamp"), sentinel


def test_cusum_alarms_stream_matches_batch(spark, tmp_path):
    """Closed-period parity: the stateful stream (buffered baseline,
    dense gap closing, reset-on-alarm) equals the batch twin on every
    period except the stream's still-open sentinel period."""
    from knowledge_graph_etl_spark.streaming.drift import cusum_alarms

    df, sentinel = _drift_df(spark)
    sent_p = int(sentinel.timestamp() * 1_000_000) // 3_600_000_000
    kw = dict(baseline_periods=4, threshold_x1000=4000, slack_x1000=500)
    batch = {
        tuple(r)
        for r in cusum_alarms(df, **kw).collect()
        if r["period"] != sent_p
    }
    assert batch, "fixture must alarm"
    assert all(r[4] == "down" for r in batch)
    src = str(tmp_path / "drift")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("event_type string, ts timestamp").parquet(src)
    q = (
        cusum_alarms(stream, **kw)
        .writeStream.format("memory")
        .queryName("drift_alarms")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.table("drift_alarms").collect()
        if r["period"] != sent_p
    }
    assert got == batch
