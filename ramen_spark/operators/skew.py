"""Skew-resistant aggregation — salting for hot keys.

Not a reference operator (the reference is single-process per
function; skew is invisible there) but a required tool at 100 TB:
a ``groupBy(key)`` where one key holds a large fraction of rows
turns into one straggler task. Salting splits every hot key across
``n_salts`` reducers with a two-stage aggregate:

  stage 1: groupBy(key, salt) — partial aggregates, perfectly spread;
  stage 2: groupBy(key)       — combines ``|keys| × n_salts`` tiny rows.

The second shuffle is negligible (cardinality × n_salts rows). AQE's
skew handling covers *joins*; aggregation skew still needs this
shape when the key histogram is pathological.

Only algebraic aggregates decompose this way; the helper exposes the
standard ones (count/sum/min/max + avg via sum/count). The salt is
derived deterministically from a high-cardinality column when given
(reproducible runs), else sprayed uniformly with ``rand`` (same
results, non-deterministic task placement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate"]

# (partial agg, combine agg) per supported spec
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column | str, str]],
    n_salts: int = 32,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-stage skew-proof ``groupBy(keys).agg(...)``.

    ``aggs`` maps output alias → (column, how) with how in
    {count, sum, min, max, avg}. ``salt_from`` names a
    high-cardinality column to derive a deterministic salt from
    (``xxhash64 % n_salts``); omitted → ``rand()``-based spray.
    """
    if n_salts < 2:
        raise ValueError("n_salts must be >= 2")
    salt = (
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
        if salt_from
        else (F.rand() * n_salts).cast("int")
    )
    partials: list[Column] = []
    combines: list[Column] = []
    for alias, (col, how) in aggs.items():
        col = F.col(col) if isinstance(col, str) else col
        if how == "avg":
            partials += [F.sum(col).alias(f"_s_{alias}"), F.count(col).alias(f"_c_{alias}")]
            combines.append(
                (F.sum(f"_s_{alias}") / F.sum(f"_c_{alias}")).alias(alias)
            )
        elif how in _ALGEBRAIC:
            part, comb = _ALGEBRAIC[how]
            partials.append(part(col).alias(f"_p_{alias}"))
            combines.append(comb(f"_p_{alias}").alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate {how!r} cannot be salted")
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*combines)
