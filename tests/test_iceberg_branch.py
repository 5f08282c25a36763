"""Iceberg write-path branch selection. The sandbox has no Iceberg jars, so the
executable contract is: refs dispatch to the right backend, availability is
detected honestly, an iceberg: ref without the runtime fails loudly (never a
silent parquet fallback), and parquet behavior is unchanged."""

from __future__ import annotations

import pytest

from pdf_extract_sys_spark.checkpoint import (
    ICEBERG_PREFIX,
    iceberg_available,
    is_iceberg_ref,
    run_extraction,
)


def test_ref_dispatch():
    assert is_iceberg_ref("iceberg:prod.extract.spans")
    assert not is_iceberg_ref("/data/out/spans")
    assert not is_iceberg_ref("s3://bucket/spans")
    assert ICEBERG_PREFIX == "iceberg:"


def test_iceberg_not_available_in_sandbox(spark):
    # no iceberg-spark-runtime jar here; a configured deployment flips this
    assert iceberg_available(spark) is False


def test_iceberg_ref_without_runtime_fails_loudly(spark, tmp_path):
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        run_extraction(
            spark,
            run_id="r-ice",
            input_path="iceberg:prod.corpus.docs",
            output_path=str(tmp_path / "out"),
            checkpoint_path=str(tmp_path / "cp"),
            num_partitions=4,
        )


def test_parquet_path_unchanged(spark, tmp_path):
    from pdf_extract_sys_spark import corpus as C
    from pdf_extract_sys_spark.corpus import corpus_to_spark

    src = str(tmp_path / "in")
    corpus_to_spark(spark, C.generate_corpus(40, seed=7)).write.parquet(src)
    s = run_extraction(
        spark,
        run_id="r-pq",
        input_path=src,
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "cp"),
        num_partitions=4,
    )
    assert s.docs_done == 40 and s.partitions_pending == 4
    assert spark.read.parquet(str(tmp_path / "out")).count() == 40
