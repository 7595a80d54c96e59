"""Ordered stateful series functions (SURVEY §2.4).

RaQL's per-group stateful functions assume arrival order. In batch we
make order explicit: every helper takes (keys, order_col) and compiles
to a native SQL window expression wherever one exists — lag, moveavg,
derive, one-out-of, past are pure Window functions (one shuffle+sort,
whole-stage codegen). The genuinely sequential recurrences (EWMA
smooth, damped Holt/Holt-Winters, hysteresis, remember) use a grouped
Arrow fold (``applyInPandas`` — vectorized numpy inside), which is one
shuffle on the key and a linear scan per group: the same asymptotic
shape the reference's single-threaded loop has, but parallel across
groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(keys: list[str], order_col: str) -> Window:
    return Window.partitionBy(*keys).orderBy(order_col)


# ---------------------------------------------------------------------------
# pure window expressions
# ---------------------------------------------------------------------------


def lag(col: Column | str, k: int, keys: list[str], order_col: str) -> Column:
    """LAG [k] x — value k steps ago, NULL before (doc/raql/expr.ml:837)."""
    return F.lag(col, k).over(_w(keys, order_col))


def moveavg(col: Column | str, k: int, keys: list[str], order_col: str) -> Column:
    """k-MOVEAVG — mean of last k values incl. current (doc:888)."""
    return F.avg(col).over(_w(keys, order_col).rowsBetween(-(k - 1), 0))


def season_moveavg(col: str, period: int, k: int, keys: list[str], order_col: str) -> Column:
    """SEASON-MOVEAVG(p,k) — mean of v(t-p), v(t-2p) … v(t-kp)
    (raql_expr.type:263-272, tests/func/season.ramen)."""
    lags = [F.lag(col, period * i).over(_w(keys, order_col)) for i in range(1, k + 1)]
    arr = F.array(*lags)
    valid = F.filter(arr, lambda x: x.isNotNull())
    return F.when(
        F.size(valid) > 0,
        F.aggregate(valid, F.lit(0.0), lambda a, x: a + x.cast("double")) / F.size(valid),
    )


def derive(value_col: str, time_col: str, keys: list[str], order_col: str) -> Column:
    """DERIVE — d value / d time between consecutive rows
    (raql_expr.type:260, CodeGenLib.ml:443-467)."""
    w = _w(keys, order_col)
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt = F.col(time_col) - F.lag(time_col).over(w)
    return F.when(dt != 0, dv.cast("double") / dt.cast("double"))


def one_out_of(col: str, n: int, keys: list[str], order_col: str) -> Column:
    """ONE OUT OF n x — the value once per n rows, else NULL
    (doc/raql/expr.ml:879)."""
    rn = F.row_number().over(_w(keys, order_col))
    return F.when((rn - 1) % n == 0, F.col(col))


def distinct_flag(col: str, keys: list[str], order_col: str) -> Column:
    """DISTINCT x — True the first time a value is seen in the group
    (doc/raql/expr.ml:816). Exact, via a nested partition."""
    w = Window.partitionBy(*keys, col).orderBy(order_col)
    return F.row_number().over(w) == 1


def past_values(col: str, d_seconds: float, time_col: str, keys: list[str]) -> Column:
    """PAST d OF x (sliding) — array of the last d seconds' values
    (raql_expr.type:347, CodeGenLib.ml:600-679)."""
    # rangeBetween takes integer bounds → order on integer microseconds
    w = (
        Window.partitionBy(*keys)
        .orderBy((F.col(time_col).cast("double") * 1000000).cast("long"))
        .rangeBetween(-int(d_seconds * 1000000), 0)
    )
    return F.collect_list(col).over(w)


def running(agg: Column, keys: list[str], order_col: str) -> Column:
    """Running aggregate since group start (RaQL stateful default:
    every stateful fn exposes its value per-row)."""
    return agg.over(_w(keys, order_col).rowsBetween(Window.unboundedPreceding, 0))


# ---------------------------------------------------------------------------
# sequential recurrences — grouped Arrow folds
# ---------------------------------------------------------------------------


def smooth(
    df: DataFrame,
    value_col: str,
    alpha: float,
    keys: list[str],
    order_col: str | list[str],
    out_col: str = "smoothed",
) -> DataFrame:
    """SMOOTH [α] x — EWMA: s = α·x + (1-α)·s_prev
    (doc/raql/expr.ml:849, CodeGenLib.ml:343-346).

    pandas ewm(alpha, adjust=False) IS this recurrence, vectorized in
    C per group. One shuffle on keys. ``order_col`` may be a list so
    callers can tie-break equal timestamps deterministically.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    return df.groupBy(*keys).applyInPandas(fold, schema=schema) if keys else df.groupBy(
        F.lit(1)
    ).applyInPandas(fold, schema=schema)


def hysteresis(
    df: DataFrame,
    value_col: str,
    accept: float,
    maximum: float,
    keys: list[str],
    order_col: str | list[str],
    out_col: str = "in_range",
) -> DataFrame:
    """HYSTERESIS(v, accept, max) — Schmitt trigger: True while v stays
    on the accept side; once past ``maximum`` it turns False until v
    crosses back past ``accept`` (doc/raql/expr.ml:894,
    CodeGenLib.ml:506-513)."""
    rising = maximum >= accept  # the 'max' side is above

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        v = pdf[value_col].to_numpy(dtype=float)
        out = np.empty(len(v), dtype=bool)
        ok = True
        for i, x in enumerate(v):
            if ok:
                ok = (x <= maximum) if rising else (x >= maximum)
            else:
                ok = (x <= accept) if rising else (x >= accept)
            out[i] = ok
        pdf[out_col] = out
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} boolean"
    gb = df.groupBy(*keys) if keys else df.groupBy(F.lit(1))
    return gb.applyInPandas(fold, schema=schema)


def damped_holt(
    df: DataFrame,
    value_col: str,
    alpha: float,
    beta: float,
    phi: float,
    keys: list[str],
    order_col: str,
    out_col: str = "holt",
) -> DataFrame:
    """DAMPEDHOLT(α,β,φ) x — damped-trend double exponential smoothing
    (raql_expr.type:279, CodeGenLib.ml:348-358): forecast = level +
    φ·trend after updating level/trend with each observation."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        v = pdf[value_col].to_numpy(dtype=float)
        out = np.empty(len(v))
        level, trend = (v[0] if len(v) else 0.0), 0.0
        for i, x in enumerate(v):
            prev_level = level
            level = alpha * x + (1 - alpha) * (level + phi * trend)
            trend = beta * (level - prev_level) + (1 - beta) * phi * trend
            out[i] = level + phi * trend
        pdf[out_col] = out
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    gb = df.groupBy(*keys) if keys else df.groupBy(F.lit(1))
    return gb.applyInPandas(fold, schema=schema)


def remember(
    df: DataFrame,
    key_expr_col: str,
    time_col: str,
    duration: float,
    keys: list[str],
    out_col: str = "seen_before",
    refresh: bool = True,
) -> DataFrame:
    """REMEMBER/RECALL — 'was this value seen within the last
    ``duration`` seconds?' (doc/raql/expr.ml:926,
    src/RamenBloomFilter.ml). REMEMBER refreshes the TTL on re-sight;
    RECALL doesn't.

    Exact implementation (the reference trades exactness for a Bloom
    filter; at Spark scale an exact hash map per group partition is
    affordable and removes false positives — documented improvement).
    One shuffle on keys.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="stable")
        last_seen: dict = {}
        t = pdf[time_col].to_numpy(dtype=float)
        vals = pdf[key_expr_col].to_numpy()
        out = np.empty(len(t), dtype=bool)
        for i, (ts, v) in enumerate(zip(t, vals)):
            prev = last_seen.get(v)
            out[i] = prev is not None and ts - prev <= duration
            if refresh or prev is None or ts - prev > duration:
                last_seen[v] = ts
        pdf[out_col] = out
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} boolean"
    gb = df.groupBy(*keys) if keys else df.groupBy(F.lit(1))
    return gb.applyInPandas(fold, schema=schema)


def reservoir_sample(
    df: DataFrame, n: int, keys: list[str], seed: int = 42
) -> DataFrame:
    """SAMPLE n x — uniform sample of ≤ n rows per group
    (doc/raql/expr.ml:860, src/RamenSampling.ml).

    Distributed shape: rank rows by a deterministic per-row hash
    within each group and keep the first n — statistically equivalent
    to reservoir sampling, one shuffle, no state."""
    order = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    w = Window.partitionBy(*keys).orderBy(order)
    return df.withColumn("_rs", F.row_number().over(w)).filter(F.col("_rs") <= n).drop("_rs")


def damped_holt_winters(
    df: DataFrame,
    value_col: str,
    alpha: float,
    beta: float,
    gamma: float,
    phi: float,
    period: int,
    keys: list[str],
    order_col: str,
    out_col: str = "hw",
) -> DataFrame:
    """DAMPEDHOLTWINTER(α,β,γ,φ,p) x — damped additive-seasonal
    Holt-Winters (raql_expr.type:315-316, CodeGenLib.ml:360-382):
    level/trend as damped Holt plus a seasonal component of the given
    period. Grouped Arrow fold; one shuffle on keys."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        v = pdf[value_col].to_numpy(dtype=float)
        n = len(v)
        out = np.empty(n)
        season = np.zeros(period)
        level, trend = (v[0] if n else 0.0), 0.0
        for i, x in enumerate(v):
            s_idx = i % period
            prev_level = level
            level = alpha * (x - season[s_idx]) + (1 - alpha) * (level + phi * trend)
            trend = beta * (level - prev_level) + (1 - beta) * phi * trend
            season[s_idx] = gamma * (x - level) + (1 - gamma) * season[s_idx]
            out[i] = level + phi * trend + season[(i + 1) % period]
        pdf[out_col] = out
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    gb = df.groupBy(*keys) if keys else df.groupBy(F.lit(1))
    return gb.applyInPandas(fold, schema=schema)


def fit_predict(
    df: DataFrame,
    obs_col: str,
    pred_cols: list[str],
    keys: list[str],
    order_col: str,
    out_col: str = "fitted",
) -> DataFrame:
    """FIT / MULTILINREG (doc/raql/expr.ml:341, CodeGenLib.ml:946-1083):
    least-squares fit of obs ~ preds (+ intercept) over the group's
    rows, evaluated per row (the reference predicts the last
    observation of the window from the others). numpy lstsq per group —
    vectorized, one shuffle."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        y = pdf[obs_col].to_numpy(dtype=float)
        X = np.column_stack(
            [pdf[c].to_numpy(dtype=float) for c in pred_cols] + [np.ones(len(pdf))]
        )
        if len(pdf) >= X.shape[1]:
            coef, *_ = np.linalg.lstsq(X, y, rcond=None)
            pdf[out_col] = X @ coef
        else:
            pdf[out_col] = np.nan
        return pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", {out_col} double"
    gb = df.groupBy(*keys) if keys else df.groupBy(F.lit(1))
    return gb.applyInPandas(fold, schema=schema)
