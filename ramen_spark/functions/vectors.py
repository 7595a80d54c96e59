"""Vector / embedding math over array<float|double> columns.

All built-in higher-order functions (zip_with / aggregate) — JVM-side,
no Python in the hot path. Accumulation is forced to double so results
are deterministic and match the DuckDB oracle's double arithmetic.

Scale: row-local expressions; the similarity-search operators in
ramen_spark.operators.similarity decide the join/shuffle strategy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product of two numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    d = norm2(a) * norm2(b)
    return F.when(d > 0, dot(a, b) / d)


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def scale(a: Column, s: Column | float) -> Column:
    s = s if isinstance(s, Column) else F.lit(float(s))
    return F.transform(a, lambda x: x.cast("double") * s)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x.cast("double") + y.cast("double"))


def mean_vector(agg_ready_sum: Column, n: Column) -> Column:
    """Divide an element-wise summed vector by a count (for centroid
    computation after groupBy().agg() of per-dimension sums)."""
    return F.transform(agg_ready_sum, lambda x: x / n)


def lsh_bucket(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id (SimHash-for-vectors): one bit
    per plane = sign of <a, plane>. ``planes`` is a small Python-side
    list of hyperplanes (deterministic, seeded by caller) baked into
    the expression as literals → still no UDF, broadcast-free."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(a, F.array(*[F.lit(float(v)) for v in plane]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc2, x: acc2 + x,
        )
        acc = acc + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc
