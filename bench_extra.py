#!/usr/bin/env python3
"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
timing + .explain("formatted") capture, with the SAME session configuration
and per-query methodology as bench.py's registry section (pass-major
round-robin, min over passes, clear_lsh_cache before q_minhash_lsh_pairs,
clearCache after each query). bench.py itself is frozen for measurement;
numbers cited in OPTIMIZATION_r06.md come from here.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --passes 2 \
      [--only q_minhash_signatures,q_dsir_select] [--plans plans/r06 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: whole registry)")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from bench import make_session

    spark = make_session(args.cpus, shuffle=2 * args.cpus)

    from pdf_extract_sys_spark import queries as Q
    from pdf_extract_sys_spark.queries import REGISTRY

    names = list(REGISTRY) if not args.only else args.only.split(",")
    for n in names:
        if n not in REGISTRY:
            raise SystemExit(f"unknown query {n}")

    if args.plans:
        # Plan capture bypasses the eager localCheckpoint()s so the dumps show
        # the queries' INTERNAL plans (scan → ... ) instead of a lineage-
        # truncated ExistingRDD; timing passes below run the real, unpatched
        # code path.
        from pyspark.sql import DataFrame

        pdir = Path(args.plans)
        pdir.mkdir(parents=True, exist_ok=True)
        Q.clear_lsh_cache()
        orig_lc = DataFrame.localCheckpoint
        DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore
        try:
            for name in names:
                df = REGISTRY[name][0](spark, args.sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                (pdir / f"{name}_{args.suffix}.txt").write_text(txt)
                spark.catalog.clearCache()
        finally:
            DataFrame.localCheckpoint = orig_lc  # type: ignore
        Q.clear_lsh_cache()

    qbest: dict[str, float] = {n: float("inf") for n in names}
    for p in range(args.passes):
        for name in names:
            fn = REGISTRY[name][0]
            if name == "q_minhash_lsh_pairs":
                Q.clear_lsh_cache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:pass{p}")
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            qbest[name] = min(qbest[name], dt)
            print(f"pass{p} {name}: {dt:.3f}s", flush=True)
            spark.catalog.clearCache()
    print(json.dumps({n: round(v, 3) for n, v in qbest.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
