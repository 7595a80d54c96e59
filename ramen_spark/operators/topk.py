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


def top_list(
    df: DataFrame,
    item_cols: list[str],
    n: int,
    weight: Column | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """LIST TOP n x BY w [per group ``by``] — exact: aggregate weight
    per item, rank, keep n. Deterministic tiebreak on the item value."""
    w = weight if weight is not None else F.lit(1)
    grouped = df.groupBy(*(by or []), *item_cols).agg(F.sum(w).alias("weight"))
    order = [F.col("weight").desc()] + [F.col(c).asc() for c in item_cols]
    win = Window.partitionBy(*(by or [F.lit(1)])).orderBy(*order)
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
) -> DataFrame:
    """TOP n ... FOR THE LAST d — exponential decay: each contribution
    is weighted 2^(-(now - t)/half_life) (the reference decays scores
    by powers of 2 per period, src/HeavyHitters.ml 'decay').

    now defaults to max(time) in the data (batch replay semantics).
    """
    w = weight if weight is not None else F.lit(1.0)
    if now_expr is None:
        now_expr = F.max(F.col(time_col).cast("double")).over(Window.partitionBy())
    age = now_expr - F.col(time_col).cast("double")
    decayed = w.cast("double") * F.pow(F.lit(2.0), -age / F.lit(half_life_seconds))
    grouped = df.withColumn("_dw", decayed).groupBy(*item_cols).agg(F.sum("_dw").alias("weight"))
    order = [F.col("weight").desc()] + [F.col(c).asc() for c in item_cols]
    win = Window.partitionBy(F.lit(1)).orderBy(*order)
    return grouped.withColumn("rank", F.row_number().over(win)).filter(F.col("rank") <= n)


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
    win = Window.partitionBy(*(keys or [F.lit(1)])).orderBy(*order)
    rn = F.row_number().over(win)
    return df.withColumn("_rn", rn).filter((F.col("_rn") > but) & (F.col("_rn") <= but + n)).drop("_rn")
