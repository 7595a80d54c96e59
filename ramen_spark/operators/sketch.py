"""Distinct-count sketches — the cardinality primitives a 100 TB
pipeline needs where exact COUNT(DISTINCT) is unaffordable (distinct
URLs per snapshot, distinct users per slice, vocabulary growth
tracking).

Training-pipeline extension (no reference counterpart; the nearest
reference surface is the DISTINCT novelty operator,
/root/reference/src/raql_expr.type `Distinct`, which tracks per-group
novelty rather than estimating cardinality).

KMV (k-minimum-values, a.k.a. bottom-k / theta sketch): keep the k
smallest values of a uniform hash of the column; the k-th smallest,
normalized to [0,1), estimates the distinct count as (k-1)/h_k
(Bar-Yossef et al. 2002; the estimator DataSketches' theta sketch
uses). Unlike HLL it is DETERMINISTIC given the hash — which makes it
oracle-checkable value-exactly against DuckDB (Spark's own
approx_count_distinct is HLL++ with engine-private registers — no
cross-engine oracle possible). The hash here is the first 12 hex
digits of md5 (a 48-bit uniform value both engines compute verbatim —
the same cross-engine trick the dedup fingerprints use).

100 TB shape — the whole point of a sketch is what does NOT move:
the naive relational form (DISTINCT pairs then a per-key window
rank ≤ k) shuffles EVERY distinct (key, hash) pair and then funnels
each key's distinct set into one window task — a hot key with 10^9
distinct values is a 10^9-row task (windows do no partial
aggregation). ``kmv_distinct`` instead prunes map-side: an
Arrow-batched per-partition pass keeps at most k smallest DISTINCT
hashes per key per partition (bounded heap state, O(keys·k) memory),
so the only Exchange carries ≤ k × n_partitions rows per key — for
k=256 on a 10 000-partition scan that is ≤ 2.6 M short rows per key
regardless of data size. Min-k is order-independent and the
per-partition min-k is a superset of the global min-k, so the result
is bit-identical to the naive form on any partitioning (pinned by
test + the registered oracle).

Sketch algebra: the (key, hash) rows the prefilter emits ARE a
mergeable sketch — union of snapshots = min-k over the concatenation,
so per-shard sketches can be persisted and merged without rescanning
(the same incremental contract as the banded dedup indexes).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^48 — hash values are 48-bit uniform ints from the md5 prefix
_HASH_SPACE = float(1 << 48)


def md5_hash48(col: Column) -> Column:
    """48-bit uniform hash both engines compute identically:
    conv(substring(md5(x), 1, 12), 16, 10) ≡ DuckDB
    ('0x' || substring(md5(x), 1, 12))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def _prefilter_min_k(keys: list[str], k: int):
    """mapInPandas kernel: per partition, per key, keep the k smallest
    DISTINCT hashes. Bounded state (dict of ≤ k-element arrays), Arrow
    batch in/out — nothing interpreted per element beyond a numpy
    unique + slice per (batch, key)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, "np.ndarray"] = {}

        def fold(kt: tuple, hs: "pd.Series") -> None:
            prev = state.get(kt)
            arr = hs.to_numpy(dtype="int64")
            if prev is not None:
                arr = np.concatenate([prev, arr])
            state[kt] = np.unique(arr)[:k]  # unique sorts ascending

        for pdf in batches:
            if pdf.empty:
                continue
            if keys:
                for key, hs in pdf.groupby(keys, sort=False, dropna=False)[
                    "_h"
                ]:
                    fold(key if isinstance(key, tuple) else (key,), hs)
            else:
                fold((), pdf["_h"])  # global sketch: one group
        rows: list[tuple] = []
        for kt, arr in state.items():
            rows.extend(kt + (int(h),) for h in arr)
        if rows:
            yield pd.DataFrame(rows, columns=[*keys, "_h"])

    return run


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-key distinct-count estimate via a k-minimum-values sketch.

    Output: (keys…, n_kept, kth_min, est_distinct) where n_kept is the
    sketch fill (= min(k, true distinct count)), kth_min the largest
    retained hash, and est_distinct the estimate — EXACT (= n_kept)
    while the sketch is under-full, floor((k-1)/(kth_min/2^48)) once
    saturated (floor, not round: both engines floor doubles
    identically, with no half-mode ambiguity). Deterministic: same
    input ⇒ same output on any partitioning, any row order.

    Plan shape (the scale contract): scan → mapInPandas prefilter
    (bounded, map-side, ≤ k distinct hashes per key per partition) →
    ONE Exchange of the pruned rows → final min-k + estimate per key.
    No full-data shuffle, no per-key window over the raw distinct set.
    """
    if k < 2:
        raise ValueError("kmv_distinct needs k >= 2")
    pruned = kmv_prune(df, keys, value_col, k)
    return kmv_finalize(pruned, keys, k)


def kmv_prune(
    df: DataFrame, keys: list[str], value_col: str, k: int
) -> DataFrame:
    """The sketch-building half of :func:`kmv_distinct`: hash + the
    map-side bounded prefilter → (keys…, _h) rows, ≤ k per key per
    partition. These rows ARE the mergeable sketch: min-k over a
    union of prune outputs equals min-k over the union of inputs —
    what the streaming lane persists and merges.

    keys=[] is the GLOBAL sketch (one group). NULL values are ignored
    (the SQL COUNT(DISTINCT …) convention) — a NULL hash would
    otherwise NaN-cast to INT64_MIN inside the Arrow prefilter and
    squat in the min slot forever."""
    hashed = df.select(
        *keys, md5_hash48(F.col(value_col)).alias("_h")
    ).filter(F.col("_h").isNotNull())
    schema_keys = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in hashed.schema.fields
        if f.name != "_h"
    ]
    schema = ", ".join([*schema_keys, "_h long"])
    return hashed.mapInPandas(_prefilter_min_k(keys, k), schema)


def kmv_finalize(
    pruned: DataFrame,
    keys: list[str],
    k: int,
    salt_above_partitions: int = 64,
) -> DataFrame:
    """Sketch rows → (keys…, n_kept, kth_min, est_distinct). collect_set
    dedups across partitions map-side; the global min-k is the first
    k of the sorted set — input is ≤ k × n_partitions rows per key,
    so the single Exchange here is tiny.

    Wide-scan guard: at P partitions the terminal per-key array is
    ≤ k·P elements (k=256 on a 10 000-partition scan = 2.6 M longs in
    ONE array in ONE task). Above ``salt_above_partitions`` input
    partitions, an intermediate min-k level is inserted: group by
    (keys…, _h mod ceil(√P)), keep each salt bucket's k smallest, then
    finalize — both levels are bounded at ~k·√P rows per key. Lossless:
    a hash among the global k smallest has at most k−1 hashes below it
    in total, hence at most k−1 within its own salt bucket, so every
    global min survives its bucket's min-k. Narrow inputs keep the
    single-Exchange plan (pinned by test); the salted form costs one
    extra bounded Exchange and is value-identical on any partitioning."""
    n_parts = pruned.rdd.getNumPartitions()
    if n_parts > salt_above_partitions:
        import math

        s = int(math.ceil(math.sqrt(n_parts)))
        pruned = (
            pruned.groupBy(*keys, (F.col("_h") % s).alias("_salt"))
            .agg(
                F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_m")
            )
            .select(*keys, F.explode("_m").alias("_h"))
        )
    mins = pruned.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_mins")
    )
    n_kept = F.size(F.col("_mins"))
    kth = F.element_at(F.col("_mins"), n_kept).cast("long")
    est = F.when(n_kept < k, n_kept.cast("long")).otherwise(
        F.floor(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / kth.cast("double"))
        .cast("long")
    )
    return mins.select(
        *keys,
        n_kept.cast("long").alias("n_kept"),
        kth.alias("kth_min"),
        est.alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch — frequency estimation over unbounded key spaces
# ---------------------------------------------------------------------------


def _cms_col(value: Column, d: int, width: int) -> Column:
    """Row-d hash column: independent hash families from md5 of a
    d-prefixed value — deterministic, identical in DuckDB
    (md5(CAST(d AS VARCHAR) || '#' || v))."""
    return (
        md5_hash48(F.concat(F.lit(str(d)), F.lit("#"), value.cast("string")))
        % width
    )


def _cms_cells(value: Column, depth: int, width: int) -> Column:
    """The exploded (row, col) cell addresses of a value — the ONE
    definition of the sketch's cell addressing, shared by build and
    lookup so they can never drift apart."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"),
                    _cms_col(value, d, width).alias("col"),
                )
                for d in range(depth)
            ]
        )
    )


def count_min_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build a count-min sketch over a value column → (row, col, cnt)
    cell relation, depth × width cells total.

    CMS (Cormode & Muthukrishnan 2005): depth independent hash rows;
    est(v) = min over rows of cnt[d, h_d(v)] — always ≥ the true
    count, within εN with probability 1−δ for width = e/ε, depth =
    ln(1/δ). Deterministic here (md5 hash families), hence
    oracle-checkable value-exactly — unlike Spark's native
    CountMinSketch aggregate, whose hash seeds are engine-private.

    100 TB shape: the input explodes ×depth map-side, but the groupBy
    partial-combines to ≤ depth × width cells PER MAP TASK before the
    Exchange — the shuffle is O(depth·width·n_tasks) regardless of
    data volume, and the result is a fixed-size mergeable summary
    (union of corpora = cell-wise sum), the same persistable-index
    contract as the banded dedup indexes. No key, however hot, can
    skew it: every row lands on depth cells of a FIXED keyspace."""
    if depth < 1 or width < 1:
        raise ValueError("count_min_build needs depth >= 1 and width >= 1")
    cells = df.select(_cms_cells(F.col(value_col), depth, width).alias("c"))
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.col").alias("col")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


def count_min_lookup(
    cms: DataFrame, probes: DataFrame, value_col: str, depth: int, width: int
) -> DataFrame:
    """Estimate counts for probe values against a built sketch:
    probes (any DataFrame with `value_col`) → (value_col, cms_est).
    Each probe fans to its depth cells, broadcast-joins the cell
    relation (depth × width rows — always broadcastable), and takes
    the min; absent cells count 0."""
    fan = probes.select(
        value_col, _cms_cells(F.col(value_col), depth, width).alias("c")
    ).select(value_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    joined = fan.join(F.broadcast(cms), ["row", "col"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est")
    )
