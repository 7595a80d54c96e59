"""Worker runtime stats — the reference's instrumentation surface
(src/runtime_stats.type, src/CodeGenLib_Stats.ml).

The reference's workers periodically publish a runtime-stats record
(tuples in/selected/out, bytes, groups, RAM, CPU, wait times) that
feeds ``ramen ps``, the archivist's cost model, and the
``#instrumentation`` stream programs can consume
(examples/benchmarks/comms.ramen).

Spark-first mapping: a "worker" is a materialized function DataFrame;
its stats come from the EXECUTED plan's SQL metrics after an action —
numOutputRows at the leaves (input tuples) and the root (output
tuples), file-scan sizes, shuffle volumes, per-operator peak memory
and spill, hash-aggregate group counts. ``worker_stats`` extracts
them; ``StatsRegistry`` accumulates per-function snapshots and serves
them back as a DataFrame with the reference's schema — the
``#instrumentation`` source for RaQL programs and the stats feed for
the archivist solver (sources/archivist.FuncStats.bytes_per_sec /
cpu_per_sec come straight from here).

Not derivable from SQL metrics (documented nulls): CPU seconds
(JVM-wide, not per-query, in local mode), wait times, and the
notification counters (owned by streaming.sinks/alerter).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["RUNTIME_STATS_SCHEMA", "worker_stats", "StatsRegistry"]

# mirrors src/runtime_stats.type field-for-field (worker added as the
# record key, as the confserver keys stats by site/fq)
RUNTIME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("worker", T.StringType(), False),
        T.StructField("stats_time", T.DoubleType(), False),
        T.StructField("first_startup", T.DoubleType(), False),
        T.StructField("last_startup", T.DoubleType(), False),
        T.StructField("min_etime", T.DoubleType(), True),
        T.StructField("max_etime", T.DoubleType(), True),
        T.StructField("first_input", T.DoubleType(), True),
        T.StructField("last_input", T.DoubleType(), True),
        T.StructField("first_output", T.DoubleType(), True),
        T.StructField("last_output", T.DoubleType(), True),
        T.StructField("tot_in_tuples", T.LongType(), True),
        T.StructField("tot_sel_tuples", T.LongType(), True),
        T.StructField("tot_out_filtered", T.LongType(), True),
        T.StructField("tot_out_tuples", T.LongType(), True),
        T.StructField("tot_out_errs", T.LongType(), True),
        T.StructField("tot_full_bytes", T.LongType(), True),
        T.StructField("tot_full_bytes_samples", T.LongType(), True),
        T.StructField("cur_groups", T.LongType(), True),
        T.StructField("max_groups", T.LongType(), True),
        T.StructField("tot_in_bytes", T.LongType(), True),
        T.StructField("tot_out_bytes", T.LongType(), True),
        T.StructField("tot_wait_in", T.DoubleType(), True),
        T.StructField("tot_wait_out", T.DoubleType(), True),
        T.StructField("tot_firing_notifs", T.LongType(), True),
        T.StructField("tot_extinguished_notifs", T.LongType(), True),
        T.StructField("tot_cpu", T.DoubleType(), True),
        T.StructField("cur_ram", T.LongType(), True),
        T.StructField("max_ram", T.LongType(), True),
    ]
)

_LEAF_SOURCES = {
    "Range", "Scan parquet", "Scan csv", "Scan json", "Scan text",
    "LocalTableScan", "Scan ExistingRDD", "BatchScan",
}


def _unwrap(node):
    nm = node.getClass().getSimpleName()
    if nm == "AdaptiveSparkPlanExec":
        return _unwrap(node.executedPlan())
    if "QueryStage" in nm:
        return _unwrap(node.plan())
    if nm == "ReusedExchangeExec":
        return _unwrap(node.child())
    return node


def _walk(node):
    node = _unwrap(node)
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _metrics(node) -> dict[str, int]:
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            out[kv._1()] = int(kv._2().value())
        except Exception:
            pass
    return out


def worker_stats(
    df: DataFrame,
    worker: str,
    stats_time: float | None = None,
    startup: float | None = None,
) -> dict[str, Any]:
    """Runtime-stats record for a function whose DataFrame has just
    run an action — extracted from the executed plan's SQL metrics.
    Call AFTER ``.collect()`` / ``.write`` (metrics are zero before).
    """
    now = stats_time if stats_time is not None else time.time()
    plan = df._jdf.queryExecution().executedPlan()
    tot_in = tot_in_bytes = tot_out_bytes = 0
    peak_ram = spill = 0
    groups = []
    root_rows: int | None = None
    for node in _walk(plan):
        name = node.nodeName()
        m = _metrics(node)
        rows = m.get("numOutputRows")
        if root_rows is None and rows is not None:
            root_rows = rows  # first metric-bearing node from the top
        if any(name.startswith(s) for s in _LEAF_SOURCES):
            tot_in += rows or 0
            tot_in_bytes += m.get("filesSize", m.get("bytesRead", 0) or 0)
        if name.startswith("HashAggregate") and rows is not None:
            groups.append(rows)
        if name.startswith(("Exchange", "ShuffleExchange")):
            tot_out_bytes += m.get("dataSize", 0)
        peak_ram += m.get("peakMemory", 0)
        spill += m.get("spillSize", 0)
    return {
        "worker": worker,
        "stats_time": now,
        "first_startup": startup if startup is not None else now,
        "last_startup": startup if startup is not None else now,
        "min_etime": None,
        "max_etime": None,
        "first_input": None,
        "last_input": None,
        "first_output": None,
        "last_output": None,
        "tot_in_tuples": tot_in,
        "tot_sel_tuples": None,  # selection runs fused in the scan
        "tot_out_filtered": None,
        "tot_out_tuples": root_rows,
        "tot_out_errs": 0,
        "tot_full_bytes": None,
        "tot_full_bytes_samples": None,
        "cur_groups": max(groups) if groups else None,
        "max_groups": max(groups) if groups else None,
        "tot_in_bytes": tot_in_bytes,
        "tot_out_bytes": tot_out_bytes,
        "tot_wait_in": None,  # not exposed by SQL metrics
        "tot_wait_out": None,
        "tot_firing_notifs": None,  # owned by streaming.sinks/alerter
        "tot_extinguished_notifs": None,
        "tot_cpu": None,  # JVM-wide in local mode, not per-query
        "cur_ram": peak_ram,
        "max_ram": peak_ram + spill,
    }


class StatsRegistry:
    """Accumulates per-worker snapshots (the confserver's stats tree)
    and serves them as the ``#instrumentation`` DataFrame."""

    def __init__(self) -> None:
        self._rows: list[dict[str, Any]] = []
        self._first_startup: dict[str, float] = {}

    def record(self, df: DataFrame, worker: str, **kw) -> dict[str, Any]:
        row = worker_stats(df, worker, **kw)
        # supervisor keeps the minimum first_startup across restarts
        fs = self._first_startup.setdefault(worker, row["first_startup"])
        row["first_startup"] = fs
        self._rows.append(row)
        return row

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self._rows, RUNTIME_STATS_SCHEMA)

    def ps(self, spark: SparkSession) -> DataFrame:
        """`ramen ps` — latest record per worker."""
        from pyspark.sql import functions as F

        df = self.snapshot(spark)
        latest = df.groupBy("worker").agg(
            F.max_by(F.struct(*df.columns), "stats_time").alias("s")
        )
        return latest.select("s.*")
