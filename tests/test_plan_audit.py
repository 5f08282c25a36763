"""Physical-plan audits: the plans we WANT, not just plans that pass.

  * extraction normal path: zero Exchange (shuffle-free), PythonMapInArrow only,
    never BatchEvalPython (north rule: no per-row Python)
  * relational queries: filters pushed to the parquet scan, column-pruned
    ReadSchema, broadcast joins where a side is small
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extract_sys_spark import corpus as C
from pdf_extract_sys_spark.pipeline import extract_corpus
from pdf_extract_sys_spark.queries import (
    q_anti_join_resume,
    q_broadcast_join_topn,
    q_pricing_summary,
)
from pdf_extract_sys_spark.schema import CORPUS_SCHEMA

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory) -> str:
    p = str(tmp_path_factory.mktemp("plan") / "corpus")
    pdf = C.generate_corpus(30, seed=3)
    spark.createDataFrame(pdf.to_dict("records"), schema=CORPUS_SCHEMA).write.parquet(p)
    return p


def test_normal_path_is_shuffle_free(spark, corpus_path):
    src = spark.read.parquet(corpus_path)
    out = extract_corpus(src, salt_threshold=10**9)  # normal path only
    plan = plan_of(out)
    # the union's mega branch is statically present but empty; the NORMAL branch
    # (scan → filter → MapInArrow, listed first under the Union) must not shuffle
    normal_part = plan.split("MapInArrow")[0]
    assert "Exchange" not in normal_part, normal_part
    assert "BatchEvalPython" not in plan


def test_no_per_row_python_full_pipeline(spark, corpus_path):
    src = spark.read.parquet(corpus_path)
    plan = plan_of(extract_corpus(src, salt_threshold=4))
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" in plan


def test_pricing_summary_pushdown_and_pruning(spark):
    df = q_pricing_summary(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    rs = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in rs  # untouched columns pruned away
    assert "l_quantity" in rs


def test_broadcast_join_used(spark):
    plan = plan_of(q_broadcast_join_topn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_anti_join_is_broadcast(spark):
    plan = plan_of(q_anti_join_resume(spark, SF))
    assert "LeftAnti" in plan


def test_no_per_row_python_in_any_registry_query(spark):
    """Every registered query's executed plan: PythonMapInArrow / ArrowEvalPython /
    FlatMapGroupsInPandas only — never BatchEvalPython (north rule)."""
    from pdf_extract_sys_spark.queries import REGISTRY

    for name, (fn, _sql) in REGISTRY.items():
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} has per-row Python:\n{plan[:2000]}"


def test_minhash_signatures_plan_is_pure_map(spark):
    """Hash-once + shuffle-free BY KEY: the shingle hashing runs inside ONE
    vectorized Arrow kernel (r6, guide §4.2 — no JVM-side md5 left in the
    plan, exactly one MapInArrow, never BatchEvalPython), and the only
    Exchange permitted is the conditional round-robin _spread parallelism
    floor (per-shingle hashing is compute-bound, so partition count must come
    from the compute, not the dimension-scale input bytes — guide §2/§6).
    The signature computation itself never shuffles rows by key: no
    hash/range partitioning anywhere."""
    from pdf_extract_sys_spark.queries import q_minhash_signatures

    plan = plan_of(q_minhash_signatures(spark, SF))
    assert "md5" not in plan, plan
    assert plan.count("MapInArrow") == 1, plan
    assert "BatchEvalPython" not in plan, plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("RoundRobinPartitioning" in ln for ln in exchanges), plan
    assert len(exchanges) <= 1, plan
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_lsh_pairs_materialized_once_and_shared(spark):
    """Candidate pairs are eagerly localCheckpoint'ed: the returned plan is a
    lineage-truncated RDD scan (zero md5 — the shingle→minhash pipeline cannot
    re-run downstream), and the three consumers share ONE materialization per
    (app, sf_dir, band_cap)."""
    from pdf_extract_sys_spark.queries import lsh_candidate_pairs, q_minhash_lsh_pairs

    df = q_minhash_lsh_pairs(spark, SF)
    plan = plan_of(df)
    assert "ExistingRDD" in plan, plan
    assert "md5" not in plan, plan
    # memoized: same object handed to every consumer in this application
    assert lsh_candidate_pairs(spark, SF) is df


def test_size_col_routing_matches_default_and_prunes(spark, tmp_path):
    """The n_spans stats column (write_corpus_parquet) must (a) route
    identically to size(spans), and (b) reach the parquet scan as a pushed
    filter so row-group stats prune the mega-side scans (the 100 TB skew-
    routing pattern)."""
    from pdf_extract_sys_spark.corpus import write_corpus_parquet

    p = str(tmp_path / "stats_corpus")
    pdf = C.generate_corpus(60, seed=7, mega_doc_every=20, mega_doc_pages=12)
    write_corpus_parquet(pdf, p, n_files=4, row_group_size=8)
    src = spark.read.parquet(p)
    a = extract_corpus(src, salt_threshold=8)
    b = extract_corpus(src, salt_threshold=8, size_col="n_spans")

    def norm(df):
        rows = df.collect()
        return sorted(
            (r["doc_id"], r["n_spans"], r["parse_failed"], r["bytes_in"],
             tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
            for r in rows
        )

    assert norm(a) == norm(b)
    plan = plan_of(b)
    assert "PushedFilters" in plan and "n_spans" in plan
