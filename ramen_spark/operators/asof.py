"""As-of (point-in-time) join — a training-pipeline / time-series staple.

The reference has no joins at all (SURVEY §2.4 "Joins: none"); its
users correlate streams by GROUP BY over a union of parents
(examples/monitoring/network/hosts.ramen:12-47).  The as-of join is
the natural generalization of that pattern: for every left row
(key, t) attach the most recent right row (key, t_r) with t_r <= t.

Implementation is the *union trick*, not a range join:

  1. tag left rows side=1, right rows side=0, union them on
     (key, ts, side, right-payload);
  2. one window per key ordered by (ts, side, arrival) and
     ``last(payload, ignorenulls=True)`` carries the latest right
     payload forward onto each left row;
  3. keep side=1 rows.

Cost: ONE shuffle + sort over |L| + |R| rows — no cross product, no
per-left-row probe, no broadcast requirement.  At 100 TB this is the
same shape as any keyed window aggregate; a range join would be
quadratic per key and a broadcast join would need R to fit in RAM.
Skew note: partitioning is by key only (window needs all of a key's
rows together) — salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    *,
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach the latest ``payload_cols`` from ``right`` (per ``keys``,
    as of ``left_ts``) to every row of ``left``.

    ``strict=False`` matches right rows with ``right_ts <= left_ts``
    (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics);
    ``strict=True`` requires ``right_ts < left_ts``.  ``tiebreak``
    orders right rows that share the same (key, ts) so the carried
    payload is deterministic.
    """
    for c in payload_cols:
        if c in left.columns:
            raise ValueError(f"payload column {c!r} collides with a left column")

    # side ordering decides whether an equal-ts right row is visible to
    # the left row: right-before-left (0 < 1) => inclusive (<=);
    # left-before-right => strict (<).
    l_side, r_side = (0, 1) if strict else (1, 0)

    # The payload is carried as ONE struct (not column-by-column): with
    # per-column last(ignorenulls) a legitimately-NULL payload field
    # would be papered over by an older right row, stitching values
    # from different rows. The struct is tagged non-null as a whole, so
    # every payload field comes from the same (latest) right row and
    # real NULLs survive.
    payload_struct = F.struct(*[F.col(c) for c in payload_cols]).alias("__payload")

    l_tagged = (
        left.withColumn("__ts", F.col(left_ts).cast("double"))
        .withColumn("__side", F.lit(l_side))
        .withColumn(
            "__payload",
            F.lit(None).cast(
                "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols) + ">"
            ),
        )
    )

    r_cols = [F.col(k) for k in keys] + [
        F.col(right_ts).cast("double").alias("__ts"),
        F.lit(r_side).alias("__side"),
        payload_struct,
    ]
    r_tagged = right.select(*r_cols)
    for c in left.columns:
        if c not in keys:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged)

    order = [F.col("__ts"), F.col("__side")]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c != "__payload"],
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    is_left = F.col("__side") == l_side
    flat = [F.col(f"__payload.{c}").alias(c) for c in payload_cols]
    keep = [c for c in carried.columns if c not in ("__ts", "__side", "__payload")]
    return carried.filter(is_left).select(*keep, *flat)
