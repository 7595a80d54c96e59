"""Streaming sources mirroring the reference's three operation kinds
(SURVEY §2.1): EVERY-clock, file tail, Kafka, LISTEN protocols.

The fixed protocol schemas (collectd / netflow v5 / graphite) are
engine-level schemas here — the reference decodes the wire formats in
C/OCaml (src/RamenCollectd.ml:24-90, src/RamenNetflow.ml:14-142,
src/RamenGraphiteSink.ml). The binary decode kernels live in
ramen_spark.sources.binary (mapInPandas over a packet byte column);
graphite's text protocol parses right here with builtin expressions.
Only the binary UDP *receiver* is out of scope in this container —
packets route in via any file/Kafka binary column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def rate_clock(spark: SparkSession, seconds: float) -> DataFrame:
    """EVERY d / YIELD (src/CodeGenLib_Skeletons.ml:403-431): a tuple
    every d seconds — the rate source scaled to 1/d rows per second."""
    if seconds <= 1:
        # rate source takes integer rows/sec
        rps = max(int(round(1.0 / seconds)), 1)
        src = spark.readStream.format("rate").option("rowsPerSecond", str(rps)).load()
        return src.select(F.col("timestamp").alias("t"), F.col("value").alias("tick"))
    # slower than 1 Hz: 1 row/sec, keep every Nth
    n = int(round(seconds))
    src = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    return src.filter(F.col("value") % n == 0).select(
        F.col("timestamp").alias("t"), (F.col("value") / n).cast("long").alias("tick")
    )


def file_tail(
    spark: SparkSession,
    path_glob: str,
    schema: T.StructType,
    fmt: str = "csv",
    clean_source: str = "off",
    **options: str,
) -> DataFrame:
    """READ FROM FILES "glob" (src/raql_operation.type:54-138): tail a
    directory/glob as a stream. ``clean_source='delete'`` ≈ the
    reference's THEN DELETE."""
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("cleanSource", clean_source)
        .option("maxFilesPerTrigger", options.pop("maxFilesPerTrigger", "64"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path_glob)


def kafka_source(
    spark: SparkSession, brokers: str, topic: str, starting: str = "earliest"
) -> DataFrame:
    """READ FROM KAFKA TOPIC (src/raql_operation.type:87-113). Requires
    the spark-sql-kafka package on the classpath (not in this
    container — raises a clear error otherwise)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )


# Fixed protocol schemas (LISTEN FOR ..., src/raql_operation.type:139-145)

# collectd value list (src/RamenCollectd.ml:24-90)
COLLECTD_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("start", T.DoubleType(), False),
        T.StructField("plugin", T.StringType(), True),
        T.StructField("instance", T.StringType(), True),
        T.StructField("type_name", T.StringType(), True),
        T.StructField("type_instance", T.StringType(), True),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("value2", T.DoubleType(), True),
        T.StructField("value3", T.DoubleType(), True),
        T.StructField("value4", T.DoubleType(), True),
        T.StructField("value5", T.DoubleType(), True),
    ]
)

# NetFlow v5 record (src/RamenNetflow.ml:14-142)
NETFLOW_V5_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("start", T.DoubleType(), False),
        T.StructField("stop", T.DoubleType(), False),
        T.StructField("seqnum", T.LongType(), False),
        T.StructField("engine_type", T.IntegerType(), False),
        T.StructField("engine_id", T.IntegerType(), False),
        T.StructField("sampling_type", T.IntegerType(), False),
        T.StructField("sampling_rate", T.IntegerType(), False),
        T.StructField("src", T.LongType(), False),  # ipv4 as long
        T.StructField("dst", T.LongType(), False),
        T.StructField("next_hop", T.LongType(), False),
        T.StructField("src_port", T.IntegerType(), False),
        T.StructField("dst_port", T.IntegerType(), False),
        T.StructField("in_iface", T.IntegerType(), False),
        T.StructField("out_iface", T.IntegerType(), False),
        T.StructField("packets", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("tcp_flags", T.IntegerType(), False),
        T.StructField("ip_proto", T.IntegerType(), False),
        T.StructField("ip_tos", T.IntegerType(), False),
        T.StructField("src_as", T.IntegerType(), False),
        T.StructField("dst_as", T.IntegerType(), False),
        T.StructField("src_mask", T.IntegerType(), False),
        T.StructField("dst_mask", T.IntegerType(), False),
    ]
)


def listen_for(spark: SparkSession, protocol: str, host: str, port: int) -> DataFrame:
    """LISTEN FOR collectd|netflow — socket source + binary decode.

    The wire-format decoders are real (sources.binary:
    decode_netflow_v5 / decode_collectd — mapInPandas over a binary
    packet column); what this container lacks is a binary UDP
    *receiver* (Spark's socket source is text-only). Stubbed here:
    feed packets from any binary-column stream (file, Kafka value)
    through those decoders instead.
    """
    raise NotImplementedError(
        f"LISTEN FOR {protocol}: no binary UDP receiver in this container; "
        "route packets from a file/kafka binary column through "
        "sources.binary.decode_netflow_v5 / decode_collectd (schemas: "
        "NETFLOW_V5_SCHEMA / COLLECTD_SCHEMA)"
    )


GRAPHITE_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("start", T.DoubleType(), True),
    ]
)


def parse_graphite(df: DataFrame, line_col: str = "value") -> DataFrame:
    """LISTEN FOR graphite (src/RamenGraphiteSink.ml): plaintext
    ``metric.path value timestamp`` lines → typed rows. Pure builtin
    split/cast expressions, so it composes with the text socket source
    (``spark.readStream.format("socket")``) or any line stream;
    malformed lines surface as NULL value/start rather than dropping
    (the filter is the caller's policy decision)."""
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    return df.select(
        F.try_element_at(parts, F.lit(1)).alias("metric"),
        F.try_element_at(parts, F.lit(2)).cast("double").alias("value"),
        F.try_element_at(parts, F.lit(3)).cast("double").alias("start"),
    )
