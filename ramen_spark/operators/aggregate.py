"""RaQL's ``Aggregate`` operation, Spark-first.

The reference's one-size-fits-all operation (SURVEY §2.1-2.2; runtime
loop src/CodeGenLib_Skeletons.ml:433-960) is: per input tuple —
where → group lookup → update group state → evaluate COMMIT condition →
emit output tuple → FLUSH or KEEP the group.

Two implementations:

1. **Native fast path** (``tumbling_aggregate``): the overwhelmingly
   common commit shape ``GROUP BY key, time//dt + COMMIT AFTER
   in.time > out.time + slack`` is exactly a tumbling event-time
   window. We lower it to ``groupBy(key, floor(time/dt))`` — pure
   Catalyst: map-side partial aggregation, one shuffle on
   (key, bucket), AQE-sized reducers. This is the plan that survives
   100 TB; it is what bench.py measures.

2. **General engine** (``commit_aggregate``): arbitrary commit
   conditions over (current input, group state, group's previous
   output) — semantics Catalyst can't express (emission interleaved
   with accumulation, KEEP vs FLUSH, COMMIT BEFORE re-seeding the
   group). Implemented as an ordered fold per group key via
   ``applyInPandas``: one shuffle on the group key, then a sequential
   scan within each group (this is inherent — the reference is a
   single-threaded loop; we get distribution ACROSS groups for free).
   ``global_last``-style cross-group state requires a single group and
   is documented as the sequential corner.

Reference parity notes:
- COMMIT AFTER (default true → emit per input): src/RamenOperation.ml:857.
- COMMIT BEFORE emits the pre-update aggregate, then restarts the
  group seeded with the current tuple: src/CodeGenLib_Skeletons.ml:620-695.
- FLUSH destroys group state after commit; KEEP retains it
  (src/raql_flush_method.type).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# fast path: tumbling event-time window
# ---------------------------------------------------------------------------


def time_bucket(time_col: Column, width_seconds: float) -> Column:
    """``time // dt`` — the reference's idiomatic window key
    (e.g. the KSQL-benchmark query groups on
    ``capture_begin // 60_000_000`` — site/blog/2019-02.php)."""
    return F.floor(time_col.cast("double") / F.lit(width_seconds))


def tumbling_aggregate(
    df: DataFrame,
    keys: list[str | Column],
    time_col: str | Column,
    width_seconds: float,
    aggs: list[Column],
    where: Column | None = None,
) -> DataFrame:
    """GROUP BY keys + time//dt — the native lowering of
    ``COMMIT AFTER in.time > out.time + dt`` tumbling windows.

    Catalyst gives partial (map-side) aggregation before the single
    shuffle on (keys, bucket); filters passed via ``where`` are pushed
    into the scan.
    """
    time_col = F.col(time_col) if isinstance(time_col, str) else time_col
    if where is not None:
        df = df.filter(where)
    bucket = time_bucket(time_col, width_seconds).alias("time_bucket")
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.groupBy(*key_cols, bucket).agg(*aggs)


# ---------------------------------------------------------------------------
# general engine: ordered fold with COMMIT/FLUSH semantics
# ---------------------------------------------------------------------------

State = dict[str, Any]
Row = dict[str, Any]


def _schema_names(ddl: str) -> list[str]:
    """Top-level field names of a DDL schema string (commas inside
    struct<...>/array<...> don't split)."""
    names, depth, cur = [], 0, ""
    for ch in ddl:
        if ch == "," and depth == 0:
            names.append(cur.strip().split(" ")[0].split(":")[0])
            cur = ""
            continue
        if ch == "<":
            depth += 1
        if ch == ">":
            depth -= 1
        cur += ch
    if cur.strip():
        names.append(cur.strip().split(" ")[0].split(":")[0])
    return names


def commit_aggregate(
    df: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    init_state: Callable[[], State],
    update: Callable[[State, Row], None],
    finalize: Callable[[State, Row, Row | None], Row],
    commit_cond: Callable[[State, Row, Row | None], bool],
    output_schema: str,
    commit_before: bool = False,
    flush: bool = True,
    where: Callable[[State, Row, Row | None], bool] | None = None,
    trigger_df: DataFrame | None = None,
    trigger_mode: str | None = None,
    trigger_in_cols: list[str] | None = None,
) -> DataFrame:
    """General COMMIT engine (batch).

    Per group (shuffled once on ``key_cols``), rows are folded in
    ``order_col`` order:

    - AFTER (default): update state with the row, evaluate
      ``commit_cond(state, row, previous_out)``; on True emit
      ``finalize(state, row, previous_out)`` and (if ``flush``) reset
      state.
    - BEFORE: evaluate the condition first; on True emit the
      *pre-update* aggregate, reset the group, then accumulate the
      current row into the fresh state
      (src/CodeGenLib_Skeletons.ml:620-646 semantics).

    ``previous_out`` is the group's last committed output (RaQL's
    ``previous`` / ``local_last`` namespace, src/raql_variable.type).

    ``where``: stateful filter evaluated per row INSIDE the fold (RaQL
    allows stateful functions in WHERE — tests/func/basic_aggr.ramen
    f2); rows it rejects advance WHERE state but neither update the
    group nor trigger commits.

    ``trigger_df`` (with ``trigger_mode``): the GLOBAL trigger relation
    for the reference's ``check_commit_for_all`` path — commit
    conditions referencing the input tuple, at which EVERY live group
    must (re-)evaluate its commit (src/CodeGen_Helpers.ml:52,
    src/CodeGenLib_Skeletons.ml:810-868). Column ``__trig_ord`` holds
    the global order value; ``trigger_mode``:

    - ``"positions"``: the condition reads only ``in`` — the relation
      is the pre-filtered trigger positions; every live group commits
      (and flushes) at each one.
    - ``"rows"``: the condition also reads out/previous
      (``COMMIT AFTER in.m <> out.m``, count.ramen / tumbling.ramen) —
      the relation carries the condition's in-columns
      (``trigger_in_cols``) for EVERY input row, and each group
      evaluates ``commit_cond(state, trigger_row, previous)`` against
      its own candidate.

    The trigger relation stays distributed: it is replicated per group
    key (crossJoin with the distinct keys — the reference documents
    check-all as the slow path meant for few-group aggregations, so the
    fan-out is |triggers|×|groups| with both factors expected small)
    and cogrouped into the fold, never materialized on the driver.

    This is the slow general path by design — Python per row, but one
    shuffle total and parallel across groups. Lower to
    ``tumbling_aggregate`` whenever the commit shape allows.
    """
    first_order = order_col if isinstance(order_col, str) else order_col[0]
    in_cols = trigger_in_cols or []
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    # NULLABLE integral columns arrive float64 after the Arrow
    # transfer (pandas has no nullable int64 on this path): 160 → 160.0
    # — which corrupts anything that FORMATS the value (string concat
    # '||', md5-hash aggregates like KMV DISTINCT). Restore Python
    # ints from the Spark schema, which knows the true type.
    _int_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ByteType, ShortType, IntegerType, LongType))
    ]

    def fold_with(pdf: pd.DataFrame, trigs: list, trows: list) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")  # str or list of cols
        # NULLs surface as NaN in float columns after Arrow transfer;
        # the fold's SKIP/KEEP NULLS semantics need real None
        pdf = pdf.astype(object).where(pdf.notna(), None)
        for c in _int_cols:
            if c in pdf.columns:
                # explicit object dtype — a bare list assignment would
                # re-infer float64 and undo the conversion
                pdf[c] = pd.Series(
                    [None if v is None else int(v) for v in pdf[c]],
                    dtype=object, index=pdf.index,
                )
        out_rows: list[Row] = []
        state = init_state()
        previous: Row | None = None

        def emit(row):
            nonlocal state, previous
            out = finalize(state, row, previous)
            out_rows.append(out)
            previous = out
            if flush:
                state = init_state()

        ti = 0
        tri = 0

        def fire_conditional_triggers(upto, inclusive: bool) -> None:
            # check-all-with-out mode: evaluate the commit condition
            # for THIS group against each global input row in order.
            # state['__trig'] marks cross-group evaluation: the
            # candidate must build from the group's own last row
            nonlocal tri
            while tri < len(trows) and (
                trows[tri][0] <= upto if inclusive else trows[tri][0] < upto
            ):
                trow = trows[tri][1]
                tri += 1
                if state.get("__n", 0) > 0:
                    state["__trig"] = True
                    try:
                        fire = commit_cond(state, trow, previous)
                    finally:
                        state.pop("__trig", None)
                    if fire:
                        emit(state.get("__last_row"))

        for row in pdf.to_dict("records"):
            state["__prev_out"] = previous  # previous namespace for update
            # fire earlier global triggers (rows of OTHER groups)
            while ti < len(trigs) and trigs[ti] < row[first_order]:
                ti += 1
                if state.get("__n", 0) > 0:
                    emit(state.get("__last_row", row))
            if trows:
                fire_conditional_triggers(row[first_order], inclusive=False)
            if where is not None and not where(state, row, previous):
                continue
            if commit_before:
                if trows:
                    # the self trigger is evaluated right here (BEFORE
                    # semantics); consume its global entry silently
                    while tri < len(trows) and trows[tri][0] <= row[first_order]:
                        tri += 1
                if commit_cond(state, row, previous):
                    # the emitted candidate predates the incoming row:
                    # its non-aggregate fields read the LAST aggregated
                    # row (reference commit-before, commit_before.ramen)
                    fin_row = state.get("__last_row", row)
                    out = finalize(state, fin_row, previous)
                    out_rows.append(out)
                    previous = out
                    state = init_state()
                    state["__prev_out"] = previous
                update(state, row)
            else:
                update(state, row)
                if trows:
                    # the group's own row is also a global trigger,
                    # checked post-update (reference aggregate_one order)
                    fire_conditional_triggers(row[first_order], inclusive=True)
                elif trigs:
                    # trigger mode: this row may itself be the trigger
                    if ti < len(trigs) and trigs[ti] == row[first_order]:
                        ti += 1
                        emit(row)
                elif commit_cond(state, row, previous):
                    emit(row)
        while ti < len(trigs):
            ti += 1
            if state.get("__n", 0) > 0:
                emit(state.get("__last_row"))
        if trows:
            fire_conditional_triggers(float("inf"), inclusive=True)
        cols = _schema_names(output_schema)
        if out_rows:
            # finalize keeps private (_-prefixed) fields for commit
            # conditions / previous — project to the declared schema
            return pd.DataFrame(out_rows).reindex(columns=cols)
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        return fold_with(pdf, [], [])

    def fold_cogrouped(pdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        # rebuild the per-group trigger list from the cogrouped trigger
        # relation (this group's replica of the global triggers)
        tpdf = tpdf.astype(object).where(tpdf.notna(), None)
        if trigger_mode == "positions":
            trigs = sorted(tpdf["__trig_ord"].tolist())
            trows: list = []
        else:
            trigs = []
            trows = sorted(
                (
                    (r["__trig_ord"], {c: r[f"__tc_{c}"] for c in in_cols})
                    for r in tpdf.to_dict("records")
                ),
                key=lambda t_: t_[0],
            )
        return fold_with(pdf, trigs, trows)

    if trigger_df is not None:
        # check-all-groups: cogroup the data with the trigger relation
        # so every group's fold task receives the global triggers via
        # the same shuffle — no driver-side materialization
        if key_cols:
            # fresh exprIds on the key projection — both cogroup sides
            # descend from the same source relation
            keys_df = df.select(
                *[F.col(k).alias(k) for k in key_cols]
            ).distinct()
            trig = trigger_df.crossJoin(F.broadcast(keys_df))
            grouped = df.groupBy(*key_cols).cogroup(trig.groupBy(*key_cols))
        else:
            g = F.lit(1).alias("_g")
            grouped = df.groupBy(g).cogroup(trigger_df.groupBy(g))
        return grouped.applyInPandas(fold_cogrouped, schema=output_schema)

    if key_cols:
        # groupBy+applyInPandas = exactly one shuffle on the key
        return df.groupBy(*key_cols).applyInPandas(fold, schema=output_schema)
    # single global group (reference: no GROUP BY ⇒ one group) —
    # inherently sequential, matches the reference's execution model
    return df.groupBy(F.lit(1).alias("_g")).applyInPandas(fold, schema=output_schema)
