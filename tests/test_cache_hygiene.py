"""Cache-lifecycle hygiene (r3 VERDICT #5/#8/#10 + ADVICE):

  * PERSIST BALANCE: every DataFrame.persist() issued while a registry query
    builds + materializes must be matched by an unpersist() before the query
    returns its (checkpointed) result — the structural test for the r2/r3
    persist-leak class (q_extract_sentences held its corpus cache forever).
    localCheckpoint results are exempt by design: they are the query's OWNED
    return value, lineage-truncated and freed by Spark's ContextCleaner when
    the caller drops the last reference. (An earlier draft asserted that
    persistent RDDs GC-drain to zero; the ContextCleaner's weak-reference
    timing makes that nondeterministic under load — the balance check is the
    deterministic version of the same invariant.)
  * the LSH candidate-pairs memo invalidates when the documents table is
    rewritten under the same path (data fingerprint in the key), and
    clear_lsh_cache() forces recomputation.
"""

from __future__ import annotations

import time

SF = "/root/testdata/sf0.001"


def test_every_persist_is_released(spark):
    """Run EVERY registry query; any .persist() left unbalanced when the query
    has returned and materialized is a leak (library users accumulate one
    pinned cache per call — the r3 q_extract_sentences defect)."""
    from pyspark.sql import DataFrame

    from pdf_extract_sys_spark import queries as Q

    live: dict[int, str] = {}
    orig_persist, orig_unpersist = DataFrame.persist, DataFrame.unpersist
    current = {"q": None}

    def persist(self, *a, **k):
        out = orig_persist(self, *a, **k)
        live[id(self)] = current["q"]
        return out

    def unpersist(self, *a, **k):
        live.pop(id(self), None)
        return orig_unpersist(self, *a, **k)

    DataFrame.persist, DataFrame.unpersist = persist, unpersist
    try:
        Q.clear_lsh_cache()
        for name, (fn, _sql) in Q.REGISTRY.items():
            current["q"] = name
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            del df
            assert not live, (
                f"{name} leaked persisted DataFrame(s) ({list(live.values())}):"
                " persist() without matching unpersist() after the query"
                " returned and materialized"
            )
    finally:
        DataFrame.persist, DataFrame.unpersist = orig_persist, orig_unpersist
        Q.clear_lsh_cache()


def _write_documents(spark, path: str, texts: list[str]) -> None:
    rows = [(i, t, "en") for i, t in enumerate(texts)]
    (
        spark.createDataFrame(rows, "doc_id long, text string, lang string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/documents.parquet")
    )


def test_lsh_cache_invalidates_on_table_rewrite(spark, tmp_path):
    from pdf_extract_sys_spark.queries import clear_lsh_cache, lsh_candidate_pairs

    sf_dir = str(tmp_path)
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    _write_documents(spark, sf_dir, [base, base + "tail", "completely different text here"])
    first = lsh_candidate_pairs(spark, sf_dir)
    n_first = first.count()
    # memo hit: same object back while the table is unchanged
    assert lsh_candidate_pairs(spark, sf_dir) is first
    # rewrite the table (different content => different fingerprint): the old
    # entry must NOT be served
    time.sleep(0.02)  # ensure mtime_ns advances even on coarse filesystems
    _write_documents(spark, sf_dir, ["totally new corpus with no duplicates at all"])
    second = lsh_candidate_pairs(spark, sf_dir)
    assert second is not first
    assert second.count() == 0 and n_first >= 1


def test_clear_lsh_cache_forces_recompute(spark, tmp_path):
    from pdf_extract_sys_spark.queries import clear_lsh_cache, lsh_candidate_pairs

    sf_dir = str(tmp_path)
    _write_documents(spark, sf_dir, ["some text " * 10, "some text " * 10])
    a = lsh_candidate_pairs(spark, sf_dir)
    clear_lsh_cache()
    b = lsh_candidate_pairs(spark, sf_dir)
    assert a is not b
    assert [r.asDict() for r in a.orderBy("doc_a", "doc_b").collect()] == [
        r.asDict() for r in b.orderBy("doc_a", "doc_b").collect()
    ]
