"""Incremental extraction stream: the reference's batch+poll pattern
(main.py:276-314 / frontend polling) as foreachBatch micro-batches.

Contract: (1) a drain run extracts everything currently present with output
identical to the batch plan, (2) adding files and re-running processes ONLY the
new files (streaming checkpoint = exactly-once per input file), (3) the progress
table aggregates like the reference's GET /status.
"""

from __future__ import annotations

import pytest

from pdf_extract_sys_spark import corpus as C
from pdf_extract_sys_spark.corpus import corpus_to_spark
from pdf_extract_sys_spark.streaming import poll_status, stream_extract


@pytest.fixture()
def dirs(tmp_path):
    return {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "progress": str(tmp_path / "progress"),
        "cp": str(tmp_path / "cp"),
    }


def _spans_by_doc(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_stream_matches_batch_and_resumes_incrementally(spark, dirs):
    first = C.generate_corpus(30, seed=11)
    corpus_to_spark(spark, first).write.mode("append").parquet(dirs["in"])

    stream_extract(
        spark,
        input_path=dirs["in"],
        output_path=dirs["out"],
        progress_path=dirs["progress"],
        checkpoint_location=dirs["cp"],
    )
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 30

    # identical to the batch plan on the same input
    from pdf_extract_sys_spark.pipeline import extract_corpus

    batch = extract_corpus(spark.read.parquet(dirs["in"]))
    assert _spans_by_doc(out1) == _spans_by_doc(batch)

    st = poll_status(spark, dirs["progress"])
    assert st["docs_done"] == 30 and st["epochs"] >= 1
    assert st["spans_emitted"] > 0 and st["bytes_processed"] > 0

    # add NEW docs; drain again — only the new files are processed
    second = C.generate_corpus(12, seed=12)
    second["doc_id"] = "n-" + second["doc_id"].astype(str)
    corpus_to_spark(spark, second).write.mode("append").parquet(dirs["in"])
    stream_extract(
        spark,
        input_path=dirs["in"],
        output_path=dirs["out"],
        progress_path=dirs["progress"],
        checkpoint_location=dirs["cp"],
    )
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 42  # appended, not re-extracted
    st2 = poll_status(spark, dirs["progress"])
    assert st2["docs_done"] == 42


def test_poll_status_empty(spark, tmp_path):
    st = poll_status(spark, str(tmp_path / "nope"))
    assert st == {"epochs": 0, "docs_done": 0, "spans_emitted": 0,
                  "parse_failures": 0, "bytes_processed": 0}


SF_DIR = "/root/testdata/sf0.001"


def _drain_sessionize(spark, in_dir, out_dir, cp_dir):
    from pyspark.sql import functions as F

    from pdf_extract_sys_spark.streaming import sessionize_events_stream

    schema = spark.read.parquet(in_dir).schema
    stream = spark.readStream.schema(schema).parquet(in_dir)
    sess = sessionize_events_stream(stream)

    def sink(df, eid):
        df.withColumn("epoch", F.lit(int(eid))).write.mode("append").parquet(out_dir)

    q = (sess.writeStream.foreachBatch(sink)
         .option("checkpointLocation", cp_dir)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: state carried ACROSS micro-batches
    (two separate drains sharing a checkpoint) reproduces the batch
    q_sessionize_events result when events arrive in event-time order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdf_extract_sys_spark.queries import q_sessionize_events

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.select(F.percentile_approx(us, 0.5).alias("m")).first()["m"]
    in_dir, out_dir, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")

    ev.filter(us <= cut).write.mode("append").parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, cp)
    ev.filter(us > cut).write.mode("append").parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, cp)

    w = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
    final = (
        spark.read.parquet(out_dir)
        .withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .select("user_id", "n_sessions", "n_events")
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in final.collect()}
    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_sessionize_events(spark, SF_DIR).collect()
    }
    assert got == want


def test_sessionize_out_of_order_events_counted_late(spark, tmp_path):
    """One user's events split across two drains OUT of event-time order: the
    second batch delivers events OLDER than the first batch's last event. They
    must not corrupt the gap math (silently inflating/deflating sessions) —
    they are excluded and surfaced in n_late (r2 VERDICT #7)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    in_dir, out_dir, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    mins = lambda m: t0 + pd.Timedelta(minutes=m)  # noqa: E731
    # batch 1: events at 0 and 10 min (one session)
    b1 = pd.DataFrame({"user_id": [7, 7], "event_id": [1, 2],
                       "ts": [mins(0), mins(10)], "event_type": ["a", "a"]})
    # batch 2: a LATE event at 5 min (older than last_us=10min) plus an
    # in-order event 40 min later (gap > 30 min → second session)
    b2 = pd.DataFrame({"user_id": [7, 7], "event_id": [3, 4],
                       "ts": [mins(5), mins(50)], "event_type": ["a", "a"]})
    spark.createDataFrame(b1).write.mode("append").parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, cp)
    spark.createDataFrame(b2).write.mode("append").parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, cp)

    w = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
    final = (
        spark.read.parquet(out_dir)
        .withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        .collect()
    )[0]
    assert final["n_sessions"] == 2  # 0/10min session + 50min session
    assert final["n_events"] == 3  # the late event is excluded, not misfolded
    assert final["n_late"] == 1  # and explicitly surfaced


def test_windowed_counts_with_watermark(spark, tmp_path):
    """Event-time windowed agg + watermark (complete mode to a memory sink)
    equals the batch window aggregation."""
    from pyspark.sql import functions as F

    from pdf_extract_sys_spark.streaming import windowed_event_counts

    src = f"{SF_DIR}/events.parquet"
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    spark.read.parquet(src).write.mode("append").parquet(str(tmp_path))
    agg = windowed_event_counts(spark.readStream.schema(schema).parquet(str(tmp_path)))
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["w_start"], r["event_type"]): r["n"]
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    want = {
        (r["w_start"], r["event_type"]): r["n"]
        for r in (
            spark.read.parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("w_start"), "event_type", "n")
            .collect()
        )
    }
    assert got == want and len(got) > 0


def _drain_dedup(spark, in_dir, out_dir, cp_dir):
    from pyspark.sql import functions as F

    from pdf_extract_sys_spark.streaming import dedup_exact_stream

    schema = spark.read.parquet(in_dir).schema
    stream = spark.readStream.schema(schema).parquet(in_dir)
    out = dedup_exact_stream(stream)

    def sink(df, eid):
        df.withColumn("epoch", F.lit(int(eid))).write.mode("append").parquet(out_dir)

    q = (out.writeStream.foreachBatch(sink)
         .option("checkpointLocation", cp_dir)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()


def test_streaming_dedup_matches_batch_any_split(spark, tmp_path):
    """dedup_exact_stream folds a commutative monoid (count-sum, min-keeper),
    so the final state after draining ANY split of the corpus equals the batch
    q_dedup_exact groupBy. The split is adversarial: the SECOND drain delivers
    the even (smaller-min) doc_ids, so a first-seen-wins implementation would
    keep the wrong keeper — min-merge must win."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pdf_extract_sys_spark.queries import q_dedup_exact

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    in_dir, out_dir, cp = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "cp")

    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(in_dir)
    _drain_dedup(spark, in_dir, out_dir, cp)
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(in_dir)
    _drain_dedup(spark, in_dir, out_dir, cp)

    w = Window.partitionBy("content_hash").orderBy(F.col("epoch").desc())
    final = (
        spark.read.parquet(out_dir)
        .withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    )
    got = {
        r["content_hash"]: (r["n_docs"], r["keeper_doc_id"]) for r in final.collect()
    }
    want = {
        r["content_hash"]: (r["n_docs"], r["keeper_doc_id"])
        for r in q_dedup_exact(spark, SF_DIR).collect()
    }
    assert got == want
