"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
one JVM); the same conf block is what we would ship to a 1000-executor
cluster — AQE owns runtime re-planning (partition coalescing, skew-join
splitting, dynamic broadcast), shuffle partitions start near the core
count and AQE coalesces down, Arrow is on for every pandas exchange,
and the session timezone is pinned to UTC so event-time semantics are
deployment-independent (and oracle-comparable against DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ramen_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    At 100 TB the knobs that matter are declared here once:
    AQE + skew-join handling, a broadcast threshold large enough to keep
    dimension tables (region/nation/supplier/part at any SF) on the
    broadcast path, and bounded file-split sizes so scan partitions stay
    executor-memory-friendly.
    """
    cpus = cpus or _DEFAULT_CPUS
    # Rule of thumb: shuffle partitions ≈ active cores locally; on a real
    # cluster this is a starting point AQE coalesces/expands at runtime.
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces DOWN from the initial partition count but never
        # expands it: with initial = core count, a 1000×-tier shuffle
        # (260 M-row posting windows) spills at ~8 GB/partition. Start
        # high and let AQE pick the real number per stage — measured
        # neutral-to-faster at sf0.1 and −8% on the sf100 window query.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(256, 8 * cpus)),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE sizes post-shuffle partitions from the MAP-side bytes of
        # the shuffle feeding them — but fan-out stages (the posting
        # self-joins: candidate pairs ≈ Σdf² of a 64 MB posting
        # partition) explode 10-40× AFTER the exchange, so 64 MB-sized
        # inputs build multi-GB aggregation state per task and spill.
        # Measured round 12 on the adversarial-skew ngram tier:
        # advisory 64m → 14.6 GB spill / 1000 s CPU (warm); 16m →
        # ZERO spill / 892 s; 8m → zero spill / 616 s. 16 MB is the
        # local default (32-core single node: task-scheduling overhead
        # is negligible, memory per concurrent task is the binding
        # constraint); on a large cluster the shuffle-block count
        # grows with partition count (guide §2.2), so deployments
        # should revisit via SPARK_GRAFT_ADVISORY_PARTITION ("64m",
        # "256m") rather than edit code.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "16m"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no ns
        # timestamp — read as long, catalog.py normalizes to µs.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Streaming state at scale: RocksDB keeps per-key state off-heap
        # so generalized COMMIT groups (SURVEY §2.2) survive high key
        # cardinality; harmless for batch.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
