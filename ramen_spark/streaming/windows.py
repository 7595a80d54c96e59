"""Streaming event-time windows — the COMMIT fast path.

The common RaQL shape ``GROUP BY key, time//dt + COMMIT AFTER
in.time > out.time + slack`` is exactly a tumbling window with a
watermark of ``slack`` (SURVEY §2.2 COMMIT row): the watermark delays
emission until event time passes the window end plus slack, then the
group is finalized and dropped — FLUSH semantics, state store bounded
by (keys × open windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_stream(
    events: DataFrame,
    time_col: str,
    width: str,
    slack: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """COMMIT AFTER in.time > out.time + slack ⇒ watermark(slack) +
    tumbling window. Append mode emits exactly one tuple per closed
    window per key."""
    return (
        events.withWatermark(time_col, slack)
        .groupBy(F.window(F.col(time_col), width), *keys)
        .agg(*aggs)
    )


def sliding_stream(
    events: DataFrame,
    time_col: str,
    width: str,
    slide: str,
    slack: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    return (
        events.withWatermark(time_col, slack)
        .groupBy(F.window(F.col(time_col), width, slide), *keys)
        .agg(*aggs)
    )


def dedup_within_watermark(events: DataFrame, key_cols: list[str], time_col: str, within: str) -> DataFrame:
    """REMEMBER-as-filter in streaming: drop tuples whose key was seen
    within the watermark horizon (exact, bounded state — the Spark
    twin of the reference's rotating bloom filters,
    src/RamenBloomFilter.ml)."""
    return events.withWatermark(time_col, within).dropDuplicatesWithinWatermark(key_cols)


def run_to_memory(df: DataFrame, name: str) -> DataFrame:
    """Drive a (bounded) streaming DataFrame to completion into a
    memory sink and return the result table — used by tests to check
    batch/stream parity on finite inputs."""
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark = df.sparkSession
    return spark.table(name)
