#!/usr/bin/env python
"""A/B the ngram_jaccard_pairs self-join shapes at the sf10 stress
tier (VERDICT r5 #4 / r6 #5: 21 GB sort spill vs 2.1 GB shuffle
write on the baseline).

Variants:
  base        — string shingle key, AQE-chosen sort-merge join
  hash64      — xxhash64 long shingle key (no text in shuffle/sort)
  shj         — string key, shuffle-hash join hint (no sort at all)
  hash64+shj  — both

Prints one JSON line per variant: wall (min over runs), shuffle
bytes written, spill bytes (from the SQL status store). Results and
the adopted default live in SCALE.md §7.

Usage: python tools/ngram_spill_experiment.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from ramen_spark import get_spark
    from ramen_spark.catalog import load_table
    from ramen_spark.operators.dedup import ngram_jaccard_pairs
    from tools.query_metrics import (
        last_execution_metrics,
        latest_execution_id,
    )

    spark = get_spark("ngram_spill_experiment")
    docs = load_table(spark, sf_dir, "documents")
    # the registry query's knobs (queries.py ngram_jaccard_pairs)
    kw = dict(shingle_k=3, threshold=0.4, max_shingle_freq=1000)

    variants = {
        "base": {},
        "hash64": {"shingle_key": "hash64"},
        "shj": {"join_strategy": "shuffle_hash"},
        "hash64+shj": {
            "shingle_key": "hash64",
            "join_strategy": "shuffle_hash",
        },
    }
    # warmup: classload/JIT for the operator path
    ngram_jaccard_pairs(docs.limit(2000), **kw).write.format("noop").mode(
        "overwrite"
    ).save()

    for name, extra in variants.items():
        best, met = None, None
        n_rows = None
        for _ in range(runs):
            before = latest_execution_id(spark)
            t0 = time.perf_counter()
            out = ngram_jaccard_pairs(docs, **kw, **extra)
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
                met = last_execution_metrics(spark, after_id=before)
        print(
            json.dumps(
                {
                    "variant": name,
                    "wall_s": round(best, 2),
                    **(met or {}),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
