"""Event-time windows & timeseries bucketing.

Reference semantics:
- Events are time INTERVALS [start, stop] (src/event_time.type:1-12,
  src/RamenEventTime.ml:12-19).
- ``ramen timeseries`` buckets archived output onto a regular grid,
  spreading an event's value across every bucket it overlaps
  (src/RamenTimeseries.ml:42-47).
- EVERY d (YIELD) — a source-less clock (src/CodeGenLib_Skeletons.ml:403).

All batch forms are pure DataFrame ops (one shuffle on the grouping
key); the streaming twins live in ramen_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling(df: DataFrame, time_col: str, width: str, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Tumbling event-time window over a timestamp column using the
    native ``window()`` expression (map-side partial agg + 1 shuffle)."""
    return df.groupBy(F.window(F.col(time_col), width), *keys).agg(*aggs)


def sliding(df: DataFrame, time_col: str, width: str, slide: str, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Sliding window — each row lands in width/slide buckets (native
    ``window(col, width, slide)`` explodes map-side; shuffle carries
    the fan-out, same plan Spark uses at any scale)."""
    return df.groupBy(F.window(F.col(time_col), width, slide), *keys).agg(*aggs)


def session(df: DataFrame, time_col: str, gap: str, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Session windows (no RaQL counterpart; reference users emulate
    with COMMIT AFTER age(in.start) — we expose the native form)."""
    return df.groupBy(F.session_window(F.col(time_col), gap), *keys).agg(*aggs)


def timeseries(
    df: DataFrame,
    start_col: str,
    stop_col: str,
    value_col: str,
    bucket_seconds: float,
    since: float,
    until: float,
    factors: list[str] | None = None,
) -> DataFrame:
    """Regular-grid timeseries over interval events, spreading each
    event's value across the buckets its [start, stop) overlaps,
    weighted by overlap fraction (src/RamenTimeseries.ml:42-47).

    Spark-first shape: compute the overlapped bucket range per row,
    ``explode(sequence(...))`` to (bucket, weighted value), then one
    groupBy. The explode fan-out equals the average number of buckets
    an event spans — bounded by event duration / bucket width, not by
    data volume, so the plan is scale-stable.
    """
    start = F.col(start_col).cast("double")
    stop = F.coalesce(F.col(stop_col).cast("double"), start)
    dur = F.greatest(stop - start, F.lit(1e-9))

    first_b = F.greatest(F.floor((start - since) / bucket_seconds), F.lit(0)).cast("long")
    # exclusive stop via ceil−1, NOT an epsilon subtraction: at epoch
    # magnitudes a 1e-9 nudge is below double ulp (~2.4e-7 at 1.7e9),
    # which leaked a zero-weight row into the next bucket for events
    # ending exactly on a boundary (inflating n_events / avg)
    last_b = F.least(
        F.ceil((stop - since) / bucket_seconds) - 1,
        F.lit(int((until - since) / bucket_seconds) - 1),
    ).cast("long")

    df = df.filter((stop > since) & (start < until))
    df = df.withColumn("_bucket", F.explode(F.sequence(first_b, F.greatest(last_b, first_b))))
    b_start = F.lit(since) + F.col("_bucket") * bucket_seconds
    b_stop = b_start + bucket_seconds
    overlap = F.least(stop, b_stop) - F.greatest(start, b_start)
    # a point event (stop == start) lands wholly in its one bucket
    frac = F.when(stop <= start, F.lit(1.0)).otherwise(
        F.greatest(overlap, F.lit(0.0)) / dur
    )
    df = df.withColumn("_wval", F.col(value_col).cast("double") * frac)

    group_cols = [F.col("_bucket").alias("bucket")] + [F.col(f) for f in (factors or [])]
    return (
        df.groupBy(*group_cols)
        .agg(
            F.sum("_wval").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.min(start).alias("min_start"),
            F.max(stop).alias("max_stop"),
            # per-bucket extremes of the RAW value (consolidation
            # min/max in the serving APIs, src/RamenTimeseries.ml)
            F.min(F.col(value_col).cast("double")).alias("min_value"),
            F.max(F.col(value_col).cast("double")).alias("max_value"),
        )
        .withColumn("bucket_start", F.lit(since) + F.col("bucket") * bucket_seconds)
    )


def yield_every(spark: SparkSession, seconds: float, n_ticks: int) -> DataFrame:
    """EVERY d (batch form): a deterministic clock table — ``range``
    is generated parallel on executors, no driver loop. Streaming twin:
    ramen_spark.streaming.sources.rate_clock."""
    return spark.range(n_ticks).select(
        (F.col("id") * seconds).alias("t"),
        F.col("id").alias("tick"),
    )
