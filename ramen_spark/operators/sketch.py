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
        for pdf in batches:
            if pdf.empty:
                continue
            grouped = pdf.groupby(keys, sort=False, dropna=False)["_h"]
            for key, hs in grouped:
                kt = key if isinstance(key, tuple) else (key,)
                prev = state.get(kt)
                arr = hs.to_numpy(dtype="int64")
                if prev is not None:
                    arr = np.concatenate([prev, arr])
                state[kt] = np.unique(arr)[:k]  # unique sorts ascending
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
    hashed = df.select(*keys, md5_hash48(F.col(value_col)).alias("_h"))
    schema_keys = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in hashed.schema.fields
        if f.name != "_h"
    )
    pruned = hashed.mapInPandas(
        _prefilter_min_k(keys, k), f"{schema_keys}, _h long"
    )
    # ≤ k × n_partitions rows per key from here on — tiny. collect_set
    # dedups across partitions map-side; the global min-k is the first
    # k of the sorted set.
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
