"""connected_components: pointer-doubling min-label propagation (r2 VERDICT #4).

A chain-shaped cluster is the worst case for plain propagation (O(diameter)
rounds). Pointer doubling must converge in O(log diameter) rounds, the final
plan must be lineage-truncated (constant size, not one join per round), and the
labels must match the recursive-CTE oracle.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pdf_extract_sys_spark.queries import connected_components

N_CHAIN = 200


def test_chain_converges_logarithmically(spark):
    nodes = spark.range(N_CHAIN).select(F.col("id").alias("doc_id"))
    edges = (
        spark.range(N_CHAIN - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    stats: dict = {}
    labels = connected_components(nodes, edges, stats=stats)
    rows = labels.collect()
    assert len(rows) == N_CHAIN
    assert all(r["label"] == 0 for r in rows)  # one component, min id 0
    # doubling: 200-link chain in ~log2 rounds, nowhere near the 200 of plain
    # propagation (each round: min-of-neighbors then label := label-of-label)
    assert stats["rounds"] <= 12, stats
    # lineage truncated: the result is a checkpoint scan, not an n-round join tree
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert plan.count("Join") == 0, plan


def test_two_components_and_singletons(spark):
    # components {0..4 star}, {10,11}, singletons 20, 21
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 10, 11, 20, 21]], ["doc_id"]
    )
    edges = spark.createDataFrame(
        [(4, 1), (1, 2), (4, 3), (0, 4), (11, 10)], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: r["label"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 20: 20, 21: 21}


def test_chain_matches_recursive_cte_oracle(spark):
    nodes = spark.range(N_CHAIN).select(F.col("id").alias("doc_id"))
    edges = (
        spark.range(N_CHAIN - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    # perturb: two chains (cut at 100) so the oracle exercises >1 component
    edges = edges.filter(F.col("doc_a") != 99)
    got = sorted(
        (r["doc_id"], r["label"]) for r in connected_components(nodes, edges).collect()
    )
    con = duckdb.connect()
    want = con.sql(
        f"""
        WITH RECURSIVE
        nodes AS (SELECT UNNEST(range({N_CHAIN})) AS doc_id),
        e0 AS (SELECT UNNEST(range({N_CHAIN - 1})) AS a),
        edges AS (SELECT a, a + 1 AS b FROM e0 WHERE a != 99
                  UNION ALL SELECT a + 1, a FROM e0 WHERE a != 99),
        cc(node, label) AS (
          SELECT doc_id, doc_id FROM nodes
          UNION
          SELECT e.b, cc.label FROM cc JOIN edges e ON cc.node = e.a)
        SELECT node, MIN(label) FROM cc GROUP BY node ORDER BY node
        """
    ).fetchall()
    assert got == [(int(a), int(b)) for a, b in want]


def test_foreign_edge_endpoints_stay_out_of_labels(spark):
    # an edge endpoint that is NOT in `nodes` must not appear in the result
    # (the fused union+groupBy propagate drops it via the prev-NULL filter;
    # the old left-join-back formulation guaranteed this structurally)
    nodes = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    edges = spark.createDataFrame([(1, 2), (2, 99)], ["doc_a", "doc_b"])
    labels = connected_components(nodes, edges)
    rows = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert set(rows) == {1, 2}, rows
    assert rows == {1: 1, 2: 1}
