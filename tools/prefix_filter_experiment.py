#!/usr/bin/env python
"""Re-run SCALE §7's prefix-filter calculus on the adversarial-skew
tier (the §4c follow-up): does PPJoin/SSJoin rarest-first prefix
filtering (Chaudhuri 2006; Xiao 2008) beat the full posting join once
shingle doc-frequency is heavy-tailed?

Variant A: production ngram_jaccard_pairs (hash64 keys, shuffle-hash,
hot-shingle cutoff 1000).
Variant B: prefix-filtered exact join — global df per shingle, per-doc
rarest-first rank (window over the doc), prefix length
n − ⌈t·n⌉ + 1, candidates from the PREFIX self-join only, then exact
verification by re-joining full postings over the candidate pairs.

Prints one JSON line per variant: wall, candidate-pair count, output
pairs, shuffle/spill. Equality of outputs is asserted (both exact).

Usage: python tools/prefix_filter_experiment.py [sf_dir] [threshold]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10skew"
    t = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    cutoff = 1000

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ramen_spark import get_spark
    from ramen_spark.catalog import load_table
    from ramen_spark.functions import text as Tx
    from ramen_spark.operators.dedup import ngram_jaccard_pairs
    from tools.query_metrics import (
        last_execution_metrics,
        latest_execution_id,
    )

    spark = get_spark("prefix_filter_experiment")
    docs = load_table(spark, sf_dir, "documents")

    # --- variant A: production operator -------------------------------
    before = latest_execution_id(spark)
    t0 = time.perf_counter()
    out_a = ngram_jaccard_pairs(
        docs, threshold=t, max_shingle_freq=cutoff,
        join_strategy="shuffle_hash",
    )
    n_out_a = out_a.count()
    wall_a = time.perf_counter() - t0
    met_a = last_execution_metrics(spark, after_id=before) or {}
    print(
        json.dumps(
            {"variant": "full_join", "wall_s": round(wall_a, 2),
             "out_pairs": n_out_a, **met_a}
        ),
        flush=True,
    )

    # --- variant B: prefix filter + verify ----------------------------
    before = latest_execution_id(spark)
    t0 = time.perf_counter()
    toks = docs.select(
        F.col("doc_id"),
        F.split(Tx.normalized_text(F.col("text")), " ").alias("_toks"),
    )
    rows = toks.select(
        "doc_id",
        F.explode(Tx.word_shingles_of_tokens(F.col("_toks"), 3)).alias("_s"),
    ).select("doc_id", F.xxhash64("_s").alias("_s"))
    dfreq = rows.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
    rows = rows.join(dfreq.filter(F.col("_df") > cutoff), "_s", "left_anti")
    sizes = rows.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_n"))
    # rarest-first rank per doc: ONE window over the full posting
    # relation (this is the cost §7 priced in)
    ranked = (
        rows.join(dfreq, "_s")
        .join(sizes, "doc_id")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_df", "_s")
            ),
        )
    )
    import math  # noqa: F401  (ceil via SQL below keeps it columnar)

    prefix = ranked.filter(
        F.col("_rk") <= F.col("_n") - F.ceil(F.lit(t) * F.col("_n")) + 1
    ).select("doc_id", "_s", "_n")
    a = prefix.select(
        F.col("doc_id").alias("id_a"), F.col("_n").alias("_na"), "_s"
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), F.col("_n").alias("_nb"), "_s"
    )
    cand = (
        a.join(b.hint("shuffle_hash"), "_s")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.least("_na", "_nb") >= F.lit(t) * F.greatest("_na", "_nb"))
        )
        .select("id_a", "_na", "id_b", "_nb")
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint(eager=True)
    )
    n_cand = cand.count()
    # exact verification: intersection size by re-joining FULL postings
    # over the candidate pairs (two id-keyed joins + one count)
    inter = (
        cand.join(rows.select(F.col("doc_id").alias("id_a"), "_s"), "id_a")
        .join(
            rows.select(F.col("doc_id").alias("id_b"), "_s"),
            ["id_b", "_s"],  # equi-join on (doc, shingle): intersection rows
        )
        .groupBy("id_a", "_na", "id_b", "_nb")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out_b = (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )
    n_out_b = out_b.count()
    wall_b = time.perf_counter() - t0
    met_b = last_execution_metrics(spark, after_id=before) or {}
    print(
        json.dumps(
            {"variant": "prefix_filter", "wall_s": round(wall_b, 2),
             "candidates": n_cand, "out_pairs": n_out_b, **met_b}
        ),
        flush=True,
    )
    assert n_out_a == n_out_b, (n_out_a, n_out_b)
    spark.stop()


if __name__ == "__main__":
    main()
