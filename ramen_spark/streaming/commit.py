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
) -> DataFrame:
    """Streaming twin of commit_aggregate with identical callbacks.

    State is pickled (base64 in a string state column) so ANY Python
    fold state — including plans.raql._Fold's accumulator/row-state
    dicts — survives micro-batches without a fixed struct schema; swap
    for a typed state schema when the state shape is static and hot.
    """
    order_list = [order_col] if isinstance(order_col, str) else list(order_col)

    def _enc(obj) -> str:
        return base64.b64encode(pickle.dumps(obj)).decode("ascii")

    def _dec(raw: str):
        return pickle.loads(base64.b64decode(raw))

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
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: tuple(r[c] for c in order_list))

        for row in rows:
            if isinstance(st, dict):
                st["__prev_out"] = previous  # previous namespace for update
            if commit_before:
                if commit_cond(st, row, previous):
                    out = finalize(st, row, previous)
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

    return df.groupBy(*key_cols).applyInPandasWithState(
        process,
        outputStructType=output_schema,
        stateStructType="st string, prev string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
