"""TOP / LARGEST / heavy hitters (SURVEY §2.4).

The reference's TOP is an approximate, exponentially-decayed heavy
hitter sketch tracking 10× the requested size (src/HeavyHitters.ml:1-324,
raql_expr.type:317-346) — an artifact of single-pass, bounded-memory,
single-process execution. On Spark the EXACT computation is a shuffle
away and strictly dominates on quality; we implement exact top-k as the
default and keep the decay semantics (FOR THE LAST d) via time-weighted
scores. All three RaQL output forms are covered: LIST TOP, IS IN TOP,
RANK OF x IN TOP.

Scale: groupBy(key) partial-aggregates map-side, so the shuffle carries
one row per distinct key, not per input row; the final rank is a window
over the (small) aggregated set, or a broadcast-joined top set for the
IS IN / RANK OF forms against the full stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rank_small(df: DataFrame, order: list[Column]) -> DataFrame:
    """Attach ``rank`` to an already-bounded (≤ top-k sized) relation.

    Uses a constant-valued partition window: on ≤n rows the single
    partition is semantically required and costless. The partition
    expression must be constant per row yet NOT foldable — a literal
    would be constant-folded into an empty partition spec, putting
    WindowExec back on its move-everything path (and warning). A
    column-dependent zero (col*0, null-guarded) survives optimization.
    NEVER apply to an unbounded relation — callers must limit() first.
    """
    first = df.columns[0]
    const_part = F.coalesce(F.length(F.col(first).cast("string")) * F.lit(0), F.lit(0))
    win = Window.partitionBy(const_part).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(win))


def _sigma_filter(grouped: DataFrame, by: list[str] | None, sigmas: float) -> DataFrame:
    """TOP ... ABOVE s SIGMAS noise filter (raql_expr.type:328-346,
    src/HeavyHitters.ml:193-210 fold_top cutoff): keep only entries
    whose weight exceeds mean + s·stddev of the weights. The reference
    computes the stats inside its decayed sketch over per-insertion
    weights; with exact per-item aggregation the natural (and noise-
    filtering-equivalent) population is the per-item total weights —
    documented delta, same intent: drop the undistinguished mass.

    Shape at scale: stats are a 1-row aggregate over the already-
    aggregated (one row per distinct item) relation, broadcast back —
    or an unordered per-group window for the grouped form. No
    single-partition funnels."""
    thresh = F.col("_mw") + F.lit(float(sigmas)) * F.coalesce(F.col("_sw"), F.lit(0.0))
    if not by:
        stats = grouped.agg(
            F.avg("weight").alias("_mw"), F.stddev_pop("weight").alias("_sw")
        )
        grouped = grouped.crossJoin(F.broadcast(stats))
    else:
        sw = Window.partitionBy(*by)
        grouped = grouped.withColumn("_mw", F.avg("weight").over(sw)).withColumn(
            "_sw", F.stddev_pop("weight").over(sw)
        )
    return grouped.filter(F.col("weight") >= thresh).drop("_mw", "_sw")


def top_list(
    df: DataFrame,
    item_cols: list[str],
    n: int,
    weight: Column | None = None,
    by: list[str] | None = None,
    sigmas: float = 0.0,
) -> DataFrame:
    """LIST TOP n x BY w [per group ``by``] [ABOVE s SIGMAS] — exact:
    aggregate weight per item, optionally drop statistical noise
    (_sigma_filter), rank, keep n. Deterministic tiebreak on the item
    value.

    Global form (no ``by``) compiles to orderBy().limit(n) →
    TakeOrderedAndProject: each partition keeps a local n-row heap and
    only n rows per partition reach the driver-side merge — no global
    sort, no single-partition shuffle of the keyset. Rank is then
    assigned on the ≤n-row result. The grouped form stays a partitioned
    window (parallel across groups)."""
    w = weight if weight is not None else F.lit(1)
    grouped = df.groupBy(*(by or []), *item_cols).agg(F.sum(w).alias("weight"))
    if sigmas > 0:
        grouped = _sigma_filter(grouped, by, sigmas)
    order = [F.col("weight").desc()] + [F.col(c).asc() for c in item_cols]
    if not by:
        return _rank_small(grouped.orderBy(*order).limit(n), order)
    win = Window.partitionBy(*by).orderBy(*order)
    return grouped.withColumn("rank", F.row_number().over(win)).filter(F.col("rank") <= n)


def rank_in_top(
    df: DataFrame,
    item_cols: list[str],
    n: int,
    weight: Column | None = None,
    by: list[str] | None = None,
    rank_col: str = "top_rank",
) -> DataFrame:
    """RANK OF x IN TOP n — annotate every input row with the item's
    rank (NULL if not in the top n): broadcast the top set back onto
    the stream — no second shuffle of the fact table."""
    tops = top_list(df, item_cols, n, weight, by).select(
        *(by or []), *item_cols, F.col("rank").alias(rank_col)
    )
    return df.join(F.broadcast(tops), on=(by or []) + item_cols, how="left")


def is_in_top(
    df: DataFrame,
    item_cols: list[str],
    n: int,
    weight: Column | None = None,
    by: list[str] | None = None,
    flag_col: str = "in_top",
) -> DataFrame:
    """IS x IN TOP n — boolean membership per row."""
    ranked = rank_in_top(df, item_cols, n, weight, by, rank_col="_r")
    return ranked.withColumn(flag_col, F.col("_r").isNotNull()).drop("_r")


def decayed_top(
    df: DataFrame,
    item_cols: list[str],
    n: int,
    time_col: str,
    half_life_seconds: float,
    weight: Column | None = None,
    now_expr: Column | None = None,
    sigmas: float = 0.0,
) -> DataFrame:
    """TOP n ... FOR THE LAST d — exponential decay: each contribution
    is weighted 2^(-(now - t)/half_life) (the reference decays scores
    by powers of 2 per period, src/HeavyHitters.ml 'decay').

    now defaults to max(time) in the data (batch replay semantics),
    computed as a 1-row aggregate broadcast-cross-joined back — NOT a
    no-partition window, which would funnel the whole raw stream
    through a single WindowExec partition. The scan stays fully
    parallel; the broadcast is one double.
    """
    w = weight if weight is not None else F.lit(1.0)
    if now_expr is None:
        now_df = df.agg(F.max(F.col(time_col).cast("double")).alias("_now"))
        df = df.crossJoin(F.broadcast(now_df))
        now_expr = F.col("_now")
    age = now_expr - F.col(time_col).cast("double")
    decayed = w.cast("double") * F.pow(F.lit(2.0), -age / F.lit(half_life_seconds))
    grouped = df.withColumn("_dw", decayed).groupBy(*item_cols).agg(F.sum("_dw").alias("weight"))
    if sigmas > 0:
        grouped = _sigma_filter(grouped, None, sigmas)
    order = [F.col("weight").desc()] + [F.col(c).asc() for c in item_cols]
    return _rank_small(grouped.orderBy(*order).limit(n), order)


def largest(
    df: DataFrame,
    n: int,
    by: list[Column | str],
    keys: list[str] | None = None,
    but: int = 0,
    smallest: bool = False,
) -> DataFrame:
    """LARGEST/SMALLEST [BUT m] n x BY w — per-group top/bottom rows by
    weight expression(s) (doc/raql/expr.ml:950). Window rank ≤ n."""
    order = [
        (F.col(c) if isinstance(c, str) else c).asc() if smallest else (F.col(c) if isinstance(c, str) else c).desc()
        for c in by
    ]
    if not keys:
        # Global form: TakeOrderedAndProject (per-partition heaps of
        # but+n rows), then rank only the bounded result.
        bounded = _rank_small(df.orderBy(*order).limit(but + n), order)
        return bounded.filter(F.col("rank") > but).drop("rank")
    win = Window.partitionBy(*keys).orderBy(*order)
    rn = F.row_number().over(win)
    return df.withColumn("_rn", rn).filter((F.col("_rn") > but) & (F.col("_rn") <= but + n)).drop("_rn")
