"""Hot-band guard: a degenerate corpus (many identical docs → one giant LSH band)
must NOT go quadratic. Bands over the cap degrade to keeper-representative
pairing: the band's min doc_id pairs with every other member (linear), so every
member is still flagged as a near-dup of the keeper.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extract_sys_spark.queries import _sql_lsh_pairs, q_minhash_lsh_pairs

N_DOCS = 1000
CAP = 64


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sf")
    text = "the quick brown fox jumps over the lazy dog again and again " * 4
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
            "text": pa.array([text] * N_DOCS),
            "lang": pa.array(["en"] * N_DOCS),
            "source": pa.array(["dup"] * N_DOCS),
            "n_chars": pa.array([len(text)] * N_DOCS, type=pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_hot_band_guard_linear_not_quadratic(spark, degenerate_dir):
    pairs = q_minhash_lsh_pairs(spark, degenerate_dir, band_cap=CAP).collect()
    # identical docs → identical signatures → one band of 1000 members per band
    # index; guarded output is keeper-vs-rest, NOT the ~500k all-pairs explosion
    assert len(pairs) == N_DOCS - 1
    assert all(r["doc_a"] == 0 for r in pairs)
    assert sorted(r["doc_b"] for r in pairs) == list(range(1, N_DOCS))
    assert all(r["est_jaccard"] == 1.0 for r in pairs)


N_VECS = 400


@pytest.fixture(scope="module")
def degenerate_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_emb")
    vec = [0.25] * 64
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": pa.array([vec] * N_VECS, type=pa.list_(pa.float32())),
            "label": pa.array([0] * N_VECS, type=pa.int32()),
        }
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


def test_hot_bucket_guard_embeddings(spark, degenerate_emb_dir):
    from pdf_extract_sys_spark.queries import q_dedup_embedding_cosine

    pairs = q_dedup_embedding_cosine(spark, degenerate_emb_dir, bucket_cap=32).collect()
    # identical vectors → one signature → every band bucket holds all 400 vectors
    # (> cap) → keeper-vs-rest, not the ~80k all-pairs explosion
    assert len(pairs) == N_VECS - 1
    assert all(r["id_a"] == 0 and r["cosine"] == 1.0 for r in pairs)
    assert sorted(r["id_b"] for r in pairs) == list(range(1, N_VECS))


def test_hot_band_guard_matches_oracle(spark, degenerate_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{degenerate_dir}/documents.parquet')"
    )
    orows = con.sql(_sql_lsh_pairs(band_cap=CAP)).fetchall()
    srows = q_minhash_lsh_pairs(spark, degenerate_dir, band_cap=CAP).collect()
    assert len(orows) == len(srows) == N_DOCS - 1
    assert sorted((r[0], r[1]) for r in orows) == sorted(
        (r["doc_a"], r["doc_b"]) for r in srows
    )


# ---------------------------------------------------------------------------------
# round-5 review regressions: degenerate documents must not abort ANSI-mode jobs
# ---------------------------------------------------------------------------------


@pytest.fixture(scope="module")
def degenerate_short_dir(tmp_path_factory):
    """Corpus containing single-word / empty / two-word docs — n-gram windows
    past the array end must yield NULL (filtered), not an ANSI
    INVALID_ARRAY_INDEX abort."""
    d = tmp_path_factory.mktemp("short_sf")
    texts = ["word", "", "two words",
             "a perfectly ordinary sentence with enough words to gate " * 4]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["short"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_dsir_single_word_docs_do_not_abort(spark, degenerate_short_dir):
    from pdf_extract_sys_spark.queries import SQL_DSIR, q_dsir_select

    rows = {r["doc_id"]: r for r in q_dsir_select(spark, degenerate_short_dir).collect()}
    # 1-word and empty docs have no bigram → absent; 2-word doc has exactly one
    assert set(rows) == {2, 3} and rows[2]["n_bigrams"] == 1
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{degenerate_short_dir}/documents.parquet'"
    )
    oracle = {r[0]: r for r in con.execute(SQL_DSIR).fetchall()}
    assert set(oracle) == {2, 3}


def test_ngram_jaccard_short_docs_do_not_abort(spark, degenerate_short_dir):
    from pdf_extract_sys_spark.queries import q_ngram_jaccard_pairs

    q_ngram_jaccard_pairs(spark, degenerate_short_dir).collect()  # must not raise


# ---------------------------------------------------------------------------------
# round-6 optimization regression: the vectorized within-band pair kernel of
# q_dedup_embedding_cosine must agree with the DuckDB oracle on a corpus that
# actually PRODUCES pairs (the driver SFs yield zero rows for this query, which
# would let a broken rewrite pass trivially)
# ---------------------------------------------------------------------------------


@pytest.fixture(scope="module")
def neardup_emb_dir(tmp_path_factory):
    """20 base vectors, each followed by 9 slightly-perturbed near-duplicates
    (cosine > 0.9 within a family, < 0.9 across) — non-trivial float math."""
    import random

    import numpy as np

    d = tmp_path_factory.mktemp("neardup_emb")
    rng = random.Random(20260822)
    base = [[rng.uniform(-1.0, 1.0) for _ in range(64)] for _ in range(20)]
    vecs = []
    for i in range(200):
        v = list(base[i % 20])
        if i >= 20:
            for _ in range(3):
                j = rng.randrange(64)
                v[j] += rng.uniform(-0.08, 0.08)
        vecs.append(np.asarray(v, dtype=np.float32))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), type=pa.int32()),
        }
    )
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


def test_dedup_embedding_cosine_matches_oracle_nonzero(spark, neardup_emb_dir):
    from pdf_extract_sys_spark.queries import SQL_DEDUP_EMB, q_dedup_embedding_cosine

    srows = q_dedup_embedding_cosine(spark, neardup_emb_dir).collect()
    assert len(srows) > 100  # the families really produce pairs
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{neardup_emb_dir}/embeddings.parquet')"
    )
    orows = con.sql(SQL_DEDUP_EMB).fetchall()
    assert sorted((r["id_a"], r["id_b"], r["cosine"]) for r in srows) == sorted(
        (r[0], r[1], r[2]) for r in orows
    )
