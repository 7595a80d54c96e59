#!/usr/bin/env python
"""A/B the duplicated-span MARKING stage (the count-over-hash window
that feeds both duplicated_spans and remove_duplicated_spans).

Variant A: production — Window.partitionBy(_h) count  (Exchange+Sort)
           then lag-window coverage (second Exchange+Sort).
Variant B: localCheckpoint postings → groupBy(_h).count → filter →
           broadcast left-semi back onto the checkpointed postings
           (zero sorts; the hot-hash set is small by construction),
           then per-doc sort_array(collect_list) + run-length fold
           for coverage (row-local; no second window).
Variant C: B's marking but via groupBy(_h).agg(collect_list(id,pos))
           + explode (one exchange, no checkpoint/join — at the mercy
           of ObjectHashAggregate's sort fallback), same fold.

All three end in the duplicated_spans output schema; row counts and
a full checksum are printed so equality is verifiable. One JSON line
per variant: wall, cpu, shuffle, spill.

Usage: python tools/span_mark_experiment.py [sf_dir] [runs]
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ramen_spark import get_spark
    from ramen_spark.catalog import load_table
    from ramen_spark.operators.dedup import _span_postings
    from tools.query_metrics import (
        cpu_time_since,
        last_execution_metrics,
        latest_execution_id,
        stage_cpu_snapshot,
    )

    spark = get_spark("span_mark_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    k, min_count, id_col = 20, 2, "doc_id"

    def totals_join(cov, toks):
        totals = toks.select(
            F.col(id_col),
            F.size("_toks").alias("n_tokens"),
            F.greatest(F.size("_toks") - (k - 1), F.lit(0)).alias("n_spans"),
        ).filter(F.col("n_spans") > 0)
        return totals.join(cov, id_col, "left").select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_spans").cast("bigint").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("bigint")
            .alias("n_dup_spans"),
            F.round(
                F.coalesce(F.col("_dup_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_token_frac"),
        )

    def fold_cov(starts_df):
        # starts_df: (id, _ps sorted int array) -> per-doc coverage
        init = F.struct(
            F.lit(None).cast("int").alias("prev"),
            F.lit(0).cast("long").alias("tot"),
        )

        def step(acc, x):
            contrib = F.when(acc["prev"].isNull(), F.lit(k)).otherwise(
                F.least(F.lit(k), x - acc["prev"])
            )
            return F.struct(
                x.alias("prev"), (acc["tot"] + contrib).alias("tot")
            )

        tot = F.aggregate(F.col("_ps"), init, step, lambda a: a["tot"])
        return starts_df.select(
            id_col,
            tot.alias("_dup_tokens"),
            F.size("_ps").cast("bigint").alias("n_dup_spans"),
        )

    def variant_a():
        toks, spans = _span_postings(docs, "text", id_col, k)
        marked = spans.withColumn(
            "_c", F.count(F.lit(1)).over(Window.partitionBy("_h"))
        ).filter(F.col("_c") >= min_count)
        win = Window.partitionBy(id_col).orderBy("_pos")
        prev = F.lag("_pos").over(win)
        contrib = F.when(prev.isNull(), F.lit(k)).otherwise(
            F.least(F.lit(k), F.col("_pos") - prev)
        )
        cov = (
            marked.withColumn("_cov", contrib)
            .groupBy(id_col)
            .agg(
                F.sum("_cov").alias("_dup_tokens"),
                F.count(F.lit(1)).alias("n_dup_spans"),
            )
        )
        return totals_join(cov, toks)

    def variant_b():
        toks, spans = _span_postings(docs, "text", id_col, k)
        spans = spans.localCheckpoint()
        hot = (
            spans.groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= min_count)
            .select("_h")
        )
        marked = spans.join(hot, "_h", "left_semi")
        starts = marked.groupBy(id_col).agg(
            F.sort_array(F.collect_list("_pos")).alias("_ps")
        )
        return totals_join(fold_cov(starts), toks)

    def variant_c():
        toks, spans = _span_postings(docs, "text", id_col, k)
        groups = (
            spans.groupBy("_h")
            .agg(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col("_pos").alias("p"))
                ).alias("_g")
            )
            .filter(F.size("_g") >= min_count)
        )
        marked = groups.select(F.explode("_g").alias("_e")).select(
            F.col("_e.i").alias(id_col), F.col("_e.p").alias("_pos")
        )
        starts = marked.groupBy(id_col).agg(
            F.sort_array(F.collect_list("_pos")).alias("_ps")
        )
        return totals_join(fold_cov(starts), toks)

    for name, fn in [("A_window", variant_a), ("B_semijoin", variant_b), ("C_collect", variant_c)]:
        spark.sparkContext.setJobDescription(f"span_mark:{name}")
        before_id = latest_execution_id(spark)
        best, cpus = None, []
        for _ in range(runs):
            before_cpu = stage_cpu_snapshot(spark)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            c = cpu_time_since(spark, before_cpu)
            if c is not None:
                cpus.append(c)
        m = last_execution_metrics(spark, after_id=before_id) or {}
        chk = (
            fn()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("n_dup_spans")).alias("sd"),
                F.sum(F.col(id_col) * F.col("n_dup_spans")).alias("sx"),
                F.sum(
                    (F.col("dup_token_frac") * 1e6).cast("long")
                ).alias("sf"),
            )
            .collect()[0]
        )
        print(
            json.dumps(
                {
                    "variant": name,
                    "wall_s": round(best, 3),
                    "cpu_s": round(min(cpus) / 1e9, 3) if cpus else None,
                    "shuffle_mb": round(m.get("shuffle_bytes", 0) / 1e6, 1),
                    "spill_mb": round(m.get("spill_bytes", 0) / 1e6, 1),
                    "check": [chk["n"], chk["sd"], chk["sx"], chk["sf"]],
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
