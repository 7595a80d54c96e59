"""Interval (range) join — point-in-interval matching at scale.

Training/observability extension (no reference counterpart; the
nearest reference surfaces are the event-time lifespans of
`EVENT STARTING AT … DURATION`, /root/reference/src/raql_operation.type
event-time clauses, which this generalizes to joining OTHER streams
against those lifespans — "which events fell inside which incident
window" is the ramen alerter's outage-attribution question asked
relationally).

Spark has no native range join: `left JOIN right ON t BETWEEN lo AND
hi` plans as BroadcastNestedLoopJoin (small side) or a cartesian —
O(|L|·|R|) compares either way, a scale cliff. The standard fix
(Databricks' range-join "bin" optimization, DuckDB's IEJoin paper)
is bucketization, which composes from existing operators:

  1. pick a bucket width B (≈ the median interval span);
  2. points get ONE bucket: floor(t / B);
  3. intervals EXPLODE to every bucket they overlap —
     sequence(floor(lo/B), floor(hi/B)) rows each;
  4. equi-join on (keys…, bucket) — hash-partitioned, AQE-skew-safe,
     broadcastable when the exploded interval side is small;
  5. residual filter lo <= t <= hi drops same-bucket non-overlaps.

Each point matches an interval in EXACTLY one bucket (the point's
own), so no post-join dedup is needed. Cost: |L| + Σ(span/B + 1) join
rows instead of |L|·|R| compares. B trades replication (wide
intervals ⇒ many buckets) against bucket collision (narrow B ⇒ more
residual-filter waste); span/B ≈ 1-4 is the sweet spot.

sequence() footgun (SCALE §5): sequence(a, b) with b < a counts DOWN —
inverted intervals (hi < lo) would silently explode to a descending
bucket range and then pass no residual filter, paying cost for zero
rows. They are dropped up front instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row with lo <= t <= hi
    (inclusive both ends), optionally also matching on equality
    `keys` present in both sides. t/lo/hi must be mutually comparable
    orderable columns on which integer division by `bucket` is
    meaningful (longs: epoch micros, ids, offsets). Output: all point
    columns + all interval columns (minus the join keys' duplicates).

    how='inner' (default) emits matches only; how='left' keeps
    unmatched points with NULL interval columns (one row each) — the
    enrichment form.

    Column-name contract: the two sides must not share any non-key
    column name — both are emitted by name, and a collision (e.g. both
    carrying `event_id` or `ts`) would make every downstream select or
    filter on that name throw AMBIGUOUS_REFERENCE. Raises ValueError
    up front instead; rename/alias one side before joining.

    Streaming: a streaming `points` side against a STATIC `intervals`
    side is a plain stream-static equi-join (the explode lives on the
    static side) and works unchanged — batch parity pinned by
    test_stream_static_interval_join.
    """
    if bucket <= 0:
        raise ValueError("bucket must be a positive integer")
    keys = list(keys or [])
    clash = sorted(
        (set(points.columns) & set(intervals.columns)) - set(keys)
    )
    if clash:
        raise ValueError(
            "interval_join: non-key column name collision between points "
            f"and intervals: {clash} — both sides are emitted by name, so "
            "a shared name makes downstream references ambiguous; rename "
            "one side (e.g. intervals.withColumnRenamed) before joining"
        )
    b = int(bucket)

    # integer `div`, not float `/`+cast: double division can land an
    # exact boundary at x.9999…, off-by-one-ing the bucket. `div`
    # truncates toward zero — exact floor for the non-negative
    # time/id domains this operator is for (documented).
    def _bkt(col: str):
        return F.expr(f"CAST(`{col}` AS BIGINT) div {b}")

    pts = points.withColumn("_bkt", _bkt(t_col))
    ivs = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn("_bkt", F.explode(F.sequence(_bkt(lo_col), _bkt(hi_col))))
    )
    cond = [pts["_bkt"] == ivs["_bkt"]]
    cond += [pts[k] == ivs[k] for k in keys]
    residual = (pts[t_col] >= ivs[lo_col]) & (pts[t_col] <= ivs[hi_col])
    matched = pts.join(ivs, [*cond, residual], "inner")
    # drop the helper + the interval side's duplicated key columns
    out_cols = [pts[c] for c in points.columns] + [
        ivs[c] for c in intervals.columns if c not in keys
    ]
    if how == "inner":
        return matched.select(*out_cols)
    if how == "left":
        # left form: unmatched points survive with NULLs. The residual
        # must live in the join condition (not a post-filter) so a
        # point whose only bucket-mates fail the range check still
        # emits its NULL row exactly once... but bucket explosion can
        # match a point to the SAME interval only once (single point
        # bucket), so no dedup is needed here either.
        left = pts.join(ivs, [*cond, residual], "left")
        return left.select(*out_cols)
    raise ValueError(f"unsupported how={how!r}")
