#!/usr/bin/env python
"""A/B measurement helper for optimization rounds: time a list of
queries (noop sink, min-of-N wall, min executor CPU, and the LAST
run's shuffle/spill summed over ALL of its SQL executions — including
construction-time localCheckpoint/collect jobs, which bench.py's
final-execution metric excludes by design) from a given repo checkout.
Wall/CPU mirror bench.py's run_query methodology; shuffle/spill are
the like-for-like A/B definition (ADVICE r12), so they can read HIGHER
than bench_full.json for checkpoint-heavy queries.

Usage:
  python tools/ab_measure.py <repo_path> <sf_dir> <runs> <query,query,...>

Prints one JSON line per query to stdout (logs to stderr).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, sf_dir, runs, names = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4].split(","),
    )
    sys.path.insert(0, repo)
    emit_fd = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    from ramen_spark import get_spark
    from ramen_spark.queries import QUERIES
    from tools.query_metrics import (
        cpu_time_since,
        executions_metrics_since,
        latest_execution_id,
        stage_cpu_snapshot,
    )

    spark = get_spark("ab_measure")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: same JIT-touching preamble as bench.py, tiniest SF
    from ramen_spark.catalog import load_table

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = "/root/testdata/sf0.001"
    warm = load_table(spark, warm_dir, "events")
    warm.groupBy("event_type").agg({"value": "sum"}).collect()
    QUERIES["minhash_lsh_pairs"](spark, warm_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        best = None
        cpus = []
        run_before = -1
        for _ in range(runs):
            # per-run execution watermark: shuffle/spill are summed
            # over ALL executions of the LAST run — round-12 query
            # shapes move real shuffle into construction-time
            # localCheckpoint/collect jobs (separate executions), and
            # the old final-execution read under-reported them
            # (ADVICE r12). bench.py keeps the final-execution
            # definition so its ratchet stays comparable round-over-
            # round; A/B comparisons within one round use this.
            run_before = latest_execution_id(spark)
            before_cpu = stage_cpu_snapshot(spark)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            cpu_ns = cpu_time_since(spark, before_cpu)
            if cpu_ns is not None:
                cpus.append(cpu_ns)
        m = executions_metrics_since(spark, after_id=run_before) or {}
        row = {
            "query": name,
            "wall_s": round(best, 3),
            "cpu_s": round(min(cpus) / 1e9, 3) if cpus else None,
            "shuffle_mb": round(m.get("shuffle_bytes", 0) / 1e6, 1),
            "spill_mb": round(m.get("spill_bytes", 0) / 1e6, 1),
        }
        os.write(emit_fd, (json.dumps(row) + "\n").encode())
    spark.stop()


if __name__ == "__main__":
    main()
