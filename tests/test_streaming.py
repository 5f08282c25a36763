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
