#!/usr/bin/env python3
"""Generate distribution-matched benchmark tables at an arbitrary scale factor.

The driver's CORRECTNESS/bench tables (/root/testdata/sf*) are read-only and
only present at sf<=0.1, but the round-end measurement runs at sf=1.0. This
script synthesizes tables with the SAME schema and the same empirical
distributions (measured from sf0.1: 31-word document vocabulary, uniform
10..100 words/doc, 5% near-duplicates via copy+" dup" suffix, ~0.16% exact
duplicates, unit-norm 64-dim embeddings with 10 labels, TPC-H-ish fact
tables) so per-query optimization numbers at sf1.0 scale are comparable to
the driver's. Used ONLY for local measurement (bench_extra.py --sf-dir ...);
never for correctness oracles, which run on the driver's own sf0.01 tables.

Usage: python bench_data.py --sf 1.0 --out /root/repo/.bench/sf1.0
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]  # 'dup' only ever appears as the near-duplicate suffix marker
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    wc = rng.integers(10, 101, size=n)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n):
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=wc[i])]))
    # 5% near-duplicates: replace the doc with a copy of a random other doc
    # plus the " dup" suffix (matches the sf0.1 structure: 250/5000 docs).
    n_near = n // 20
    tgt = rng.choice(n, size=n_near, replace=False)
    src = rng.integers(0, n, size=n_near)
    for t, s in zip(tgt, src):
        if s != t:
            texts[t] = texts[s] + " dup"
    # ~0.16% exact duplicates (8 pairs per 5000 docs at sf0.1)
    n_exact = max(1, n // 625)
    tgt2 = rng.choice(n, size=n_exact, replace=False)
    src2 = rng.integers(0, n, size=n_exact)
    for t, s in zip(tgt2, src2):
        if s != t:
            texts[t] = texts[s]
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    source = np.array([f"src{i % 20}" for i in range(n)])
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })


def gen_lineitem(n_orders: int, rng: np.random.Generator) -> pa.Table:
    n = 4 * n_orders  # 600k lineitem / 150k orders at sf0.1
    orderkey = rng.integers(0, n_orders, size=n)
    ship = (np.datetime64("1995-01-01") +
            rng.integers(0, 2500, size=n).astype("timedelta64[D]"))
    return pa.table({
        "l_orderkey": pa.array(orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 20 * n_orders // 150, size=n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_orders // 150, size=n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.float64)),
        "l_extendedprice": pa.array(rng.uniform(900.0, 105000.0, size=n)),
        "l_discount": pa.array(rng.integers(0, 11, size=n) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, size=n) / 100.0),
        "l_returnflag": pa.array(rng.choice(["N", "R", "A"], size=n), pa.string()),
        "l_linestatus": pa.array(rng.choice(["F", "O"], size=n), pa.string()),
        "l_shipdate": pa.array(ship.astype("datetime64[us]"), pa.timestamp("us")),
    })


def gen_orders(n: int, rng: np.random.Generator) -> pa.Table:
    od = (np.datetime64("1994-01-01") +
          rng.integers(0, 2400, size=n).astype("timedelta64[D]"))
    return pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n // 10, size=n), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], size=n), pa.string()),
        "o_totalprice": pa.array(rng.uniform(1000.0, 500000.0, size=n)),
        "o_orderdate": pa.array(od.astype("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"], size=n), pa.string()),
    })


def gen_customer(n: int, rng: np.random.Generator) -> pa.Table:
    return pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n), pa.int32()),
        "c_acctbal": pa.array(rng.uniform(-999.0, 9999.0, size=n)),
        "c_mktsegment": pa.array(
            rng.choice(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                        "MACHINERY"], size=n), pa.string()),
    })


def gen_part(n: int, rng: np.random.Generator) -> pa.Table:
    return pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array([f"part name {i}" for i in range(n)], pa.string()),
        "p_brand": pa.array([f"Brand#{rng.integers(1, 6)}{rng.integers(1, 6)}"
                             for _ in range(n)], pa.string()),
        "p_type": pa.array(rng.choice(
            ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"],
            size=n), pa.string()),
        "p_size": pa.array(rng.integers(1, 51, size=n), pa.int32()),
        "p_retailprice": pa.array(rng.uniform(900.0, 2000.0, size=n)),
    })


def gen_supplier(n: int, rng: np.random.Generator) -> pa.Table:
    return pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n), pa.int32()),
        "s_acctbal": pa.array(rng.uniform(-999.0, 9999.0, size=n)),
    })


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    n_users = max(1, n // 67)  # 100k events / 1500 users at sf0.1
    ts = (np.datetime64("2024-01-01", "us") +
          np.sort(rng.integers(0, 30 * 86400 * 10**6, size=n)).astype(
              "timedelta64[us]"))
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["signup", "purchase", "view", "click", "error"], size=n),
            pa.string()),
        "value": pa.array(rng.uniform(0.0, 100.0, size=n)),
        "props": pa.array([f'{{"k": {v}}}' for v in
                           rng.integers(0, 100, size=n)], pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    sf = args.sf
    out = Path(args.out or f"/root/repo/.bench/sf{sf}")
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    tables = {
        "documents": gen_documents(int(50_000 * sf), rng),
        "embeddings": gen_embeddings(int(20_000 * sf), rng),
        "orders": gen_orders(int(1_500_000 * sf), rng),
        "lineitem": gen_lineitem(int(1_500_000 * sf), rng),
        "customer": gen_customer(int(150_000 * sf), rng),
        "part": gen_part(int(200_000 * sf), rng),
        "supplier": gen_supplier(int(10_000 * sf), rng),
        "events": gen_events(int(1_000_000 * sf), rng),
        "nation": pa.table({
            "n_nationkey": pa.array(np.arange(25), pa.int32()),
            "n_name": pa.array([f"NATION{i}" for i in range(25)], pa.string()),
            "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
        }),
        "region": pa.table({
            "r_regionkey": pa.array(np.arange(5), pa.int32()),
            "r_name": pa.array([f"REGION{i}" for i in range(5)], pa.string()),
        }),
    }
    for name, tbl in tables.items():
        pq.write_table(tbl, out / f"{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")
    (out / "_DONE").write_text("")


if __name__ == "__main__":
    main()
