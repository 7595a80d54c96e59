"""The general COMMIT/FLUSH engine in streaming form.

Batch oracle: operators.aggregate.commit_aggregate. Here the same
(init/update/finalize/commit_cond) callbacks run incrementally under
``applyInPandasWithState``: per group key, state holds the running
aggregate plus the last committed output (RaQL's ``previous``); each
micro-batch folds its rows in event-order and emits the committed
tuples. State lives in the state store (RocksDB per session.py) —
bounded by live groups, exactly like the reference's group hashtable
(src/CodeGenLib_Skeletons.ml:717-760) but partitioned across
executors.

Caveat (documented): ordering is guaranteed WITHIN a micro-batch by
the explicit sort; cross-batch reordering beyond the watermark is the
same trade every streaming engine makes. The batch engine is the
semantic oracle (SURVEY §7 'hard parts').
"""

from __future__ import annotations

import base64
import pickle
from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

State = dict[str, Any]
Row = dict[str, Any]


def _enc(obj) -> str:
    return base64.b64encode(pickle.dumps(obj)).decode("ascii")


def _dec(raw: str):
    return pickle.loads(base64.b64decode(raw))


def streaming_commit_aggregate(
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
) -> DataFrame:
    """Streaming twin of commit_aggregate with identical callbacks.

    State is pickled (base64 in a string state column) so ANY Python
    fold state — including plans.raql._Fold's accumulator/row-state
    dicts — survives micro-batches without a fixed struct schema; swap
    for a typed state schema when the state shape is static and hot.

    ``where``: stateful filter evaluated per row inside the fold —
    rejected rows advance WHERE state but neither update the group nor
    trigger commits (batch commit_aggregate parity).

    ``order_col`` None ⇒ ARRIVAL order within each micro-batch (the
    reference's worker loop consumes its ringbuf in arrival order).
    """
    order_list = (
        [order_col] if isinstance(order_col, str)
        else list(order_col) if order_col else []
    )

    def process(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            st_raw, prev_raw = state.get
            st = _dec(st_raw)
            previous = _dec(prev_raw) if prev_raw else None
        else:
            st, previous = init_state(), None

        out_rows: list[Row] = []
        rows: list[Row] = []
        for pdf in pdfs:
            pdf = pdf.astype(object).where(pdf.notna(), None)
            rows.extend(pdf.to_dict("records"))
        if order_list:
            rows.sort(key=lambda r: tuple(r[c] for c in order_list))

        for row in rows:
            if isinstance(st, dict):
                st["__prev_out"] = previous  # previous namespace for update
            if where is not None and not where(st, row, previous):
                continue
            if commit_before:
                if commit_cond(st, row, previous):
                    # the emitted candidate predates the incoming row
                    # (batch engine parity: last aggregated row)
                    fin_row = (
                        st.get("__last_row", row) if isinstance(st, dict) else row
                    )
                    out = finalize(st, fin_row, previous)
                    out_rows.append(out)
                    previous = out
                    st = init_state()
                    if isinstance(st, dict):
                        st["__prev_out"] = previous
                update(st, row)
            else:
                update(st, row)
                if commit_cond(st, row, previous):
                    out = finalize(st, row, previous)
                    out_rows.append(out)
                    previous = out
                    if flush:
                        st = init_state()

        state.update((_enc(st), _enc(previous) if previous else None))
        if out_rows:
            from ramen_spark.operators.aggregate import _schema_names

            yield pd.DataFrame(out_rows).reindex(
                columns=_schema_names(output_schema)
            )

    from pyspark.sql import functions as F

    # no GROUP BY ⇒ one global group, as in the batch engine; the
    # constant key must be a materialized column (streaming
    # applyInPandasWithState rejects expression grouping keys)
    if key_cols:
        grouped = df.groupBy(*key_cols)
    else:
        grouped = df.withColumn("_g", F.lit(1)).groupBy("_g")
    return grouped.applyInPandasWithState(
        process,
        outputStructType=output_schema,
        stateStructType="st string, prev string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_commit_worker(
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
    check_all: bool = False,
) -> DataFrame:
    """The reference's worker loop in streaming form: ONE state-store
    entry holds the whole group hashtable, rows fold in global order.

    This exists for ``check_commit_for_all`` commit conditions —
    conditions over the incoming tuple that must be re-evaluated for
    EVERY live group on every input (COMMIT AFTER in.m <> out.m,
    count.ramen; COMMIT BEFORE in.start >= out.stop, tumbling.ramen —
    src/CodeGen_Helpers.ml:52, src/CodeGenLib_Skeletons.ml:810-868).
    Cross-group visibility is inherent to the semantics, so the stream
    serializes through one task — exactly the reference's
    one-worker-per-function model; functions WITHOUT check-all
    conditions take the per-group-partitioned
    ``streaming_commit_aggregate`` (the scale path) instead.

    Trigger semantics mirror operators.aggregate.commit_aggregate's
    cogrouped batch path tuple-for-tuple:

    - every input row (including WHERE-rejected ones) is a trigger:
      each live group (``__n`` > 0) evaluates the condition with
      ``state['__trig']`` set (candidate built from the group's last
      aggregated row) and commits/flushes on True;
    - in AFTER mode the row's own group checks post-update via the
      same trigger path; in BEFORE mode the own check runs pre-update
      on the plain condition and the own trigger is consumed silently.

    ``order_col`` None ⇒ arrival order within each micro-batch.
    """
    order_list = (
        [order_col] if isinstance(order_col, str)
        else list(order_col) if order_col else []
    )

    def process(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        groups: dict[tuple, dict] = _dec(state.get[0]) if state.exists else {}
        out_rows: list[Row] = []

        def emit(g: dict, row: Row | None) -> None:
            out = finalize(g["st"], row, g["prev"])
            out_rows.append(out)
            g["prev"] = out
            if flush:
                g["st"] = init_state()

        rows: list[Row] = []
        for pdf in pdfs:
            pdf = pdf.astype(object).where(pdf.notna(), None)
            rows.extend(pdf.to_dict("records"))
        if order_list:
            rows.sort(key=lambda r: tuple(r[c] for c in order_list))

        for row in rows:
            gkey = tuple(row[k] for k in key_cols)
            g = groups.get(gkey)
            if g is None:
                g = groups[gkey] = {"st": init_state(), "prev": None}
            st = g["st"]
            st["__prev_out"] = g["prev"]
            accepted = where is None or where(st, row, g["prev"])
            if accepted:
                st = g["st"]
                if commit_before:
                    if commit_cond(st, row, g["prev"]):
                        out = finalize(st, st.get("__last_row", row), g["prev"])
                        out_rows.append(out)
                        g["prev"] = out
                        g["st"] = st = init_state()
                        st["__prev_out"] = g["prev"]
                    update(st, row)
                else:
                    update(st, row)
                    if not check_all and commit_cond(st, row, g["prev"]):
                        emit(g, row)
            if check_all:
                # this row triggers every live group's commit check;
                # a BEFORE-mode own check already ran above (silent
                # consumption of the own trigger, batch parity)
                skip_own = accepted and commit_before
                for k2, g2 in list(groups.items()):
                    if skip_own and k2 == gkey:
                        continue
                    st2 = g2["st"]
                    if st2.get("__n", 0) <= 0:
                        continue
                    st2["__trig"] = True
                    try:
                        fire = commit_cond(st2, row, g2["prev"])
                    finally:
                        st2.pop("__trig", None)
                    if fire:
                        emit(g2, st2.get("__last_row"))

        state.update((_enc(groups), None))
        if out_rows:
            from ramen_spark.operators.aggregate import _schema_names

            yield pd.DataFrame(out_rows).reindex(
                columns=_schema_names(output_schema)
            )

    from pyspark.sql import functions as F

    return df.withColumn("_w", F.lit(1)).groupBy("_w").applyInPandasWithState(
        process,
        outputStructType=output_schema,
        stateStructType="st string, prev string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
