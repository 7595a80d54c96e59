"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

Reading is always schema-on-file parquet (columnar, predicate pushdown,
column pruning all free via Catalyst). ``register_views`` exposes them
as temp views so operators can be written in either DataFrame or SQL
form against the same names DuckDB pre-registers for the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — these
# scale sub-linearly (region/nation are constant-size; supplier/part grow
# but stay << fact tables). Join helpers use this set to force the
# broadcast path rather than trusting size estimation on fresh scans.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Below this size a table is join-dimension-sized; parallelizing its scan
# costs more than it buys.
_REBALANCE_MIN_BYTES = 256 * 1024

# Tables whose pipelines are dominated by per-row narrow compute (shingle
# hashing, vector arithmetic) rather than scan→shuffle-agg. For these an
# up-front round-robin repartition pays for itself; for scan→agg tables
# the map-side partial aggregate is already the cheap part and the extra
# shuffle only adds latency (measured at sf0.1: q1 +0.7s, minhash −2.2s).
NARROW_HEAVY = frozenset({"documents", "embeddings"})


def _parse_bytes(s: str, default: int = 128 << 20) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m',
    '134217728b', '1g') — caller-built sessions may carry any of
    these forms; a bare int() crashed on suffixes."""
    try:
        s = str(s).strip().lower()
        mult = 1
        for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40), ("b", 1)):
            if s.endswith(suf):
                s, mult = s[: -len(suf)], m
                break
        return int(float(s)) * mult
    except (ValueError, TypeError):
        return default


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def table_num_rows(sf_dir: str, name: str) -> int | None:
    """Row count from parquet FOOTER metadata only — no Spark job, no
    data pages read. Operators whose plan shape depends on corpus size
    (e.g. simhash's adaptive chunk width) take this as a hint so query
    construction never fires an eager action; in a real deployment the
    metastore/table stats supply the same number. Returns None when the
    path isn't local parquet (caller falls back or counts explicitly)."""
    path = table_path(sf_dir, name)
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the engine depends on, applied here so
    the code also works under a caller-built SparkSession (the driver
    constructs its own): ns-parquet reading and UTC event-time."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in the file; Spark has no ns
    timestamp. Depending on the Spark build the scan surfaces it as
    either a raw ns long (legacy nanosAsLong conf honored) or a
    µs-truncated TIMESTAMP_NTZ (native nanos read). Normalize both to
    the engine's TimestampType contract with exact ns→µs truncation —
    identical to DuckDB's ns→µs cast, keeping oracles value-exact
    (verified against epoch_us on the same file)."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        # integer division, not double math: 1e18-scale ns would lose
        # precision through a double
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if t == "timestamp_ntz":
        # already µs-truncated by the scan; UTC session makes the
        # NTZ→LTZ cast instant-preserving
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True
) -> DataFrame:
    _ensure_session_confs(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    if name == "events":
        df = _normalize_event_ts(df)
    if rebalance and name in NARROW_HEAVY:
        # Un-splittable inputs (single-row-group parquet, gz CSV…)
        # serialize every narrow stage onto one core. When the scan
        # can't produce ≥ parallelism splits, round-robin repartition
        # once so shingling / hashing / projection run wide. Filters and
        # pruning still push through Repartition, and at real scale
        # (files ≫ maxPartitionBytes × cores) this is a no-op.
        size = _path_bytes(path)
        max_split = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
        )
        target = spark.sparkContext.defaultParallelism
        if size >= _REBALANCE_MIN_BYTES and size < max_split * target:
            # Round 12 measured (and REJECTED) skipping this exchange
            # when the scan already yields ~core-count splits: the
            # repartition is not only balance — identical load_table
            # subtrees below it ReuseExchange, so every fan-out query
            # (tf×df, posting self-joins, pipeline stages) reads the
            # decoded text ONCE. With the exchange gated off, those
            # plans re-scan + re-decode per consumer: sf10 tfidf CPU
            # 150→459 s, ngram 607→999 s, skew entropy 113→239 s and
            # walls grew straggler tails (minhash 10.3→24.1 s). The
            # ~107 MB text shuffle is the cheaper side of that trade
            # at every measured tier (OPTIMIZATION_r12.md, negative
            # results).
            df = df.repartition(target)
    return df


def load_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming read of a testdata table (file-stream source): the
    source needs a directory + glob (not a bare file), and the schema
    must match the RAW file (events.ts is ns-long there), so the µs
    normalization is re-applied after the scan."""
    _ensure_session_confs(spark)
    raw_schema = spark.read.parquet(table_path(sf_dir, name)).schema
    df = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view named after itself."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def widen(df: DataFrame) -> DataFrame:
    """Repartition an under-partitioned DataFrame up to core count for
    narrow compute-heavy stages (Python codec kernels, hashing). Only
    ever *raises* parallelism — on a wide scan (the 100 TB case) it is
    a metadata check and no shuffle."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
