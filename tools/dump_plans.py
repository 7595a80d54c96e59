#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage:
  python tools/dump_plans.py <out_dir> <suffix> <sf_dir> <query,query,...>

Writes <out_dir>/<query>_<suffix>.txt for each query. Plans only —
no terminal action is executed (AQE plans show isFinalPlan=false; the
shape, Exchange count, join strategy and PushedFilters are all
visible). CAVEAT (round 13, ADVICE r12): queries whose CONSTRUCTION
is eager — localCheckpoint seams (_clean_corpus, _prepare_corpus_v2,
corpus_drift, the CMS counted builds) and collected model tables
(lm_perplexity_buckets' weights) — fire those upstream jobs while the
DataFrame is being built, so dumping their plans executes real work
and needs a real SF_DIR sized accordingly.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir, suffix, sf_dir, names = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        sys.argv[4].split(","),
    )
    os.makedirs(out_dir, exist_ok=True)
    from ramen_spark import get_spark
    from ramen_spark.queries import QUERIES

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
