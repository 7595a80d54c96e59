"""Bucketed (co-located) storage — shuffle-free joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the join key. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions files on disk, and any later
join/groupBy on the same key with the same bucket count reads
co-located buckets and skips the Exchange entirely (Catalyst's
bucketing rule matches output partitioning to required distribution).

Guidelines encoded here:
- bucket count is a power of two sized so one bucket of the LARGER
  table fits an executor core's memory slice;
- both sides of a recurring join must use the SAME key AND count;
- ``sortBy`` the bucket key so merge-join needs no per-task sort.

The reference has no storage layer to compare (workers stream through
ring buffers; archives are per-function ORC files,
src/RamenOrc.ml) — this is the Spark-native answer to the same
"don't move data you already placed" concern its out-refs solve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. Joins/aggregations on ``keys`` against tables bucketed the
    same way run shuffle-free (and sort-free when ``sort``)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucketing metadata rides along
    from the catalog, so downstream plans see the co-location."""
    return spark.table(table)
