"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in ramen_spark.queries — one entry per
operator from SURVEY.md §2 plus the training-pipeline extensions
(dedup / similarity / text analysis). This module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's own
    benchmark shape (per-minute tumbling GROUP BY + SUM + conditional
    AVG — site/blog/2019-02.php), lowered to a native tumbling
    aggregate."""
    from ramen_spark.queries import QUERIES

    return QUERIES["tumbling_revenue_per_minute"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ramen_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; entries
    absent here (sequential recurrences, Python-seeded LSH planes,
    the general COMMIT engine) get the driver's rows-only check."""
    from ramen_spark.queries import ORACLES

    return dict(ORACLES)
