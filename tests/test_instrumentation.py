"""Worker runtime stats (instrumentation.py) — the reference's
src/runtime_stats.type surface extracted from executed-plan SQL
metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.instrumentation import (
    RUNTIME_STATS_SCHEMA,
    StatsRegistry,
    worker_stats,
)


def test_worker_stats_counts_in_and_out(spark):
    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    s = worker_stats(df, "p/agg")
    assert s["tot_in_tuples"] == 1000
    assert s["tot_out_tuples"] == 7
    assert s["cur_groups"] >= 7  # partial-agg rows counted too
    assert s["cur_ram"] > 0
    assert s["tot_out_bytes"] > 0  # the one shuffle's dataSize


def test_worker_stats_parquet_bytes(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(5000).withColumn("v", F.rand(7)).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("id") < 100)
    df.collect()
    s = worker_stats(df, "p/scan")
    assert s["tot_in_bytes"] > 0  # file-scan size reaches the record
    assert s["tot_out_tuples"] == 100


def test_registry_snapshot_and_ps(spark):
    reg = StatsRegistry()
    df1 = spark.range(10)
    df1.collect()
    reg.record(df1, "p/a", stats_time=1.0, startup=1.0)
    df2 = spark.range(20)
    df2.collect()
    reg.record(df2, "p/a", stats_time=2.0, startup=2.0)
    reg.record(df2, "p/b", stats_time=2.0)

    snap = reg.snapshot(spark)
    assert snap.schema == RUNTIME_STATS_SCHEMA
    assert snap.count() == 3
    ps = {r["worker"]: r for r in reg.ps(spark).collect()}
    assert set(ps) == {"p/a", "p/b"}
    # ramen ps shows the LATEST record, supervisor keeps min startup
    assert ps["p/a"]["stats_time"] == 2.0
    assert ps["p/a"]["first_startup"] == 1.0
    assert ps["p/a"]["last_startup"] == 2.0


def test_instrumentation_feeds_archivist(spark):
    """The stats records carry exactly what the archivist cost model
    needs (bytes out per function, groups) — wire-compatible with
    sources.archivist.FuncStats."""
    from ramen_spark.sources.archivist import FuncStats

    df = spark.range(1000).groupBy((F.col("id") % 5).alias("k")).agg(
        F.sum("id").alias("s")
    )
    df.collect()
    s = worker_stats(df, "p/agg")
    span = 100.0  # pretend the stats cover 100 s of event time
    fs = FuncStats(
        fq=s["worker"],
        bytes_per_sec=s["tot_out_bytes"] / span,
        cpu_per_sec=1e-4,
        parents=["p/raw"],
    )
    assert fs.bytes_per_sec > 0
