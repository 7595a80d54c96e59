"""Alert → RaQL transpilation (src/CodeGen_Alert2RaQL.ml).

The reference's HTTP API accepts declarative threshold alerts
(RamenApi.ml AlertInfoV1: table, column, threshold, hysteresis,
duration/ratio, time-step, where/having filters, group-by) and
transpiles each into a three-function RaQL program:

- ``filtered``: WHERE filter over the parent table, optionally
  re-aggregated onto a TRUNCATE(start, time_step) grid (min/max/sum
  re-aggregation per field, "same" for averages);
- ``ok``: per-point health via
  ``COALESCE(HYSTERESIS(filtered_value, recovery, threshold), true)``
  — KEEPing the group so hysteresis state survives; a baseline
  threshold variant derives the threshold from a seasonal
  SAMPLE/PERCENTILE/SMOOTH chain;
- ``alert``: ``firing`` = last point unhealthy (or the PAST-window
  unhealthy ratio ≥ ratio), emitted on ``AFTER CHANGED firing``
  with a NOTIFY carrying the alert identity.

This module generates the same program SHAPE as RaQL text and
compiles it with the in-repo front-end (plans.raql.compile_program) —
the generated text is itself valid input for the reference. Serving
side: api.jsonrpc_handle implements ``set-alerts`` with it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

__all__ = ["AlertSpec", "Baseline", "generate_alert_raql", "compile_alert"]


@dataclass
class Baseline:
    """Seasonal baseline threshold (VA.Baseline): sample the recent
    past, take a percentile once per window, smooth, offset by
    max_distance (absolute or relative)."""

    avg_window: float = 3600.0
    sample_size: int = 1000
    percentile: float = 90.0
    seasonality: int = 24
    smooth_factor: float = 0.5
    max_distance_abs: float | None = None
    max_distance_rel: float | None = 0.1


@dataclass
class AlertSpec:
    """AlertInfoV1 (RamenApi.ml:175-197)."""

    table: str
    column: str
    threshold: float | Baseline
    hysteresis: float = 0.0
    duration: float = 0.0
    ratio: float = 1.0
    time_step: float = 0.0
    where: list[dict] = field(default_factory=list)  # {lhs, rhs, op}
    having: list[dict] = field(default_factory=list)
    group_by: list[str] | None = None
    id: str = ""
    desc_title: str = ""
    desc_firing: str = ""
    desc_recovery: str = ""
    enabled: bool = True
    carry_fields: list[str] = field(default_factory=list)
    carry_csts: list[dict] = field(default_factory=list)  # {name, value}


def _q(s: str) -> str:
    """ramen_quote: single-quote names that aren't plain identifiers
    OR collide with RaQL keywords (a column named `group`/`start` must
    not parse as a clause)."""
    from ramen_spark.plans.raql import _KEYWORDS

    if s.isidentifier() and s.lower() not in _KEYWORDS:
        return s
    return "'" + s.replace("'", "''") + "'"


def _filters_raql(filters: list[dict], col_types: dict[str, str]) -> str:
    """simple_filter list → RaQL condition (AND of lhs op rhs), string
    rhs quoted per the column type (CodeGen_SimpleFilter2RaQL.ml)."""
    if not filters:
        return "true"
    parts = []
    for f_ in filters:
        lhs, rhs, op = f_["lhs"], str(f_["rhs"]), f_.get("op", "=")
        t = col_types.get(lhs, "string")
        rhs_raql = f'"{rhs}"' if t in ("string", "char") else rhs
        parts.append(f"{_q(lhs)} {op} {rhs_raql}")
    return " AND ".join(parts)


def _nice(x: float) -> str:
    return repr(float(x))


def generate_alert_raql(
    a: AlertSpec,
    col_types: dict[str, str],
    parent_group_keys: list[str] | None = None,
) -> str:
    """→ the alerting program text (filtered → ok → alert), the same
    structure CodeGen_Alert2RaQL.generate writes to disk.

    ``col_types``: the parent table's columns (name → RaQL-ish type,
    for quoting filter literals). ``parent_group_keys``: the parent's
    simple group-by fields; grouping defaults to them (combined
    alert), as in group_keys_of_operation."""
    group_by = (
        sorted(a.group_by)
        if a.group_by is not None
        else sorted(parent_group_keys or [])
    )
    # a WHERE equality pins a group key → no need to group on it
    pinned = {f_["lhs"] for f_ in a.where if f_.get("op", "=") == "="}
    group_by = [g for g in group_by if g not in pinned]
    need_reaggr = a.time_step > 0

    carried = sorted(
        {a.column, *group_by, *(f_["lhs"] for f_ in a.having), *a.carry_fields}
    )

    lines: list[str] = ["-- Alerting program (generated)", ""]
    w = lines.append

    # -- filtered ---------------------------------------------------------
    w("DEFINE filtered AS")
    w(f"  FROM {_q(a.table)}")
    w(f"  WHERE {_filters_raql(a.where, col_types)}")
    w("  SELECT")
    gb = list(group_by)
    if need_reaggr:
        w(f"    TRUNCATE(start, {_nice(a.time_step)}) AS start,")
        w(f"    start + {_nice(a.time_step)} AS stop,")
        for fn in carried:
            if fn in group_by:
                w(f"    {_q(fn)},")
            elif fn != a.column:
                w(f"    sum {_q(fn)} AS {_q(fn)},")
        # aggregate the alarmed column directly into `value` (the
        # reference re-aggregates under the same name and out-chains;
        # same result, no alias shadowing)
        vexpr = _q(a.column) if a.column in group_by else f"sum {_q(a.column)}"
        w(f"    {vexpr} AS value,")
        # window extremes of the RAW column (well-defined here, unlike
        # min-of-running-sum; the ok/alert functions read min_value /
        # max_value either way)
        w(f"    min {_q(a.column)} AS min_value,")
        w(f"    max {_q(a.column)} AS max_value")
        gb = [f"start // {_nice(a.time_step)}"] + [_q(g) for g in group_by]
        w("  GROUP BY " + ", ".join(gb))
        slack = max(a.time_step, 60.0)
        w(f"  COMMIT AFTER in.start > out.start + 1.5 * {_nice(slack)};")
    else:
        for fn in carried:
            if fn == "value":
                # the `AS value` alias below IS this column (or would
                # shadow a same-named carried field)
                continue
            w(f"    {_q(fn)},")
        w(f"    {_q(a.column)} AS value,")
        w("    start, stop;")
    w("")

    # -- ok ---------------------------------------------------------------
    w("DEFINE ok AS")
    w("  FROM filtered")
    w("  SELECT *,")
    if need_reaggr:
        w("    min_value, max_value,")
    w(f"    IF {_filters_raql(a.having, col_types)} THEN value AS filtered_value,")
    group_by_raql = [_q(g) for g in group_by]
    group_by_period = None
    if isinstance(a.threshold, Baseline):
        b = a.threshold
        w("    -- Compute the baseline:")
        w(
            f"    SAMPLE {b.sample_size} OF THE PAST "
            f"{_nice(b.avg_window)} SECONDS OF filtered_value AS _recent_values,"
        )
        w(
            f"    ONCE EVERY {_nice(b.avg_window)} SECONDS _recent_values "
            "AS _values,"
        )
        w(f"    {_nice(b.percentile)}th PERCENTILE _values AS _perc,")
        w(f"    SMOOTH ({_nice(b.smooth_factor)}, _perc) AS baseline,")
        if b.max_distance_abs is not None:
            w(f"    baseline + {_nice(b.max_distance_abs)} AS threshold,")
        else:
            sign = "+" if a.hysteresis <= 0 else "-"
            w(
                f"    baseline {sign} ABS (baseline * "
                f"{_nice(b.max_distance_rel or 0.1)}) AS threshold,"
            )
        threshold = "threshold"
        group_by_period = (
            f"(start // {_nice(b.avg_window)}) % {b.seasonality}"
        )
    else:
        threshold = _nice(a.threshold)
    recovery = (
        f"{threshold} + {_nice(a.hysteresis)}"
        if a.hysteresis >= 0
        else f"{threshold}{_nice(a.hysteresis)}"
    )
    w("    COALESCE(")
    w(f"      HYSTERESIS (filtered_value, {recovery}, {threshold}),")
    w("    true) AS ok")
    gb2 = group_by_raql + ([group_by_period] if group_by_period else [])
    if gb2:
        w("  GROUP BY " + ", ".join(gb2))
    w("  KEEP;")
    w("")

    # -- alert ------------------------------------------------------------
    if a.enabled:
        w("DEFINE alert AS")
        w("  FROM ok")
        w("  SELECT *,")
        if need_reaggr:
            w("    max_value, min_value,")
        if a.duration > 0:
            w(
                f"    COALESCE(AVG(PAST {_nice(a.duration)} SECONDS OF "
                f"float(not ok)) >= {_nice(a.ratio)}, false)"
            )
        else:
            w("    not ok")
        w("      AS firing,")
        w(f'    "{a.id}" AS id,')
        for cst in a.carry_csts:
            w(f'    "{cst["value"]}" AS {_q(cst["name"])},')
        w("    1 AS certainty,")
        if need_reaggr:
            w('    string(min_value) || "," || string(max_value) AS values,')
        w(f'    "{a.column}" AS column,')
        w(f"    {threshold} AS thresholds,")
        w(f"    {_nice(a.duration)} AS duration,")
        title = a.id or a.desc_title
        base = f"{title} on {a.column} ({a.table}) triggered" if title else (
            f"{a.column} ({a.table}) triggered"
        )
        desc_f = a.desc_firing or f"{a.column} went beyond the threshold."
        desc_r = a.desc_recovery or f"The value of {a.column} recovered."
        w(f'    (IF firing THEN "{desc_f}" ELSE "{desc_r}") AS desc')
        if group_by_raql:
            w("  GROUP BY " + ", ".join(group_by_raql))
        w("  AFTER CHANGED firing |? firing")
        if not group_by_raql:
            w(f'  NOTIFY "{base}"')
        else:
            tagged = ' || ", " || '.join(
                f'"{g}:" || string({g})' for g in group_by_raql
            )
            w(f'  NOTIFY "{base} for " || {tagged}')
        w("    AND KEEP;")
    return "\n".join(lines) + "\n"


def compile_alert(
    a: AlertSpec,
    col_types: dict[str, str],
    name: str = "alert_prog",
    parent_group_keys: list[str] | None = None,
):
    """Generate + compile through the in-repo RaQL front-end →
    plans.program.Program (materialize with
    externals={a.table: parent_df})."""
    from ramen_spark.plans.raql import compile_program

    text = generate_alert_raql(a, col_types, parent_group_keys)
    return compile_program(text, name=name), text
