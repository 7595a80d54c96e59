"""NOTIFY sink + tail sinks (SURVEY §2.2 NOTIFY row, §3.3 tail).

The reference's ``NOTIFY "name" [WHEN cond]`` emits a notification
tuple — a name plus string parameters, with ``${field}`` templating
(src/raql_operation.type:22-23, src/RamenStringExpansion.ml) — into
the alerter pipeline (src/RamenAlerter.ml:1-40: notifications are
deduplicated into incidents, debounced, then delivered via contacts).

Spark-first shape:

- template expansion is a row-local builtin-expression rewrite
  (``format_string`` over the referenced columns — no UDF);
- delivery is a ``foreachBatch`` sink so ANY Python callable
  (HTTP poster, Kafka producer, log writer) receives small pandas
  batches of notification tuples — the alerter daemon's transport
  surface without the daemon;
- incident semantics (dedup + debounce) are expressed as batch
  operators over the notification stream so they run identically in
  replay (batch) and live (streaming) mode.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_notifications", "notify_sink", "debounce_incidents"]

_TEMPLATE_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z_0-9]*)\}")


def build_notifications(
    df: DataFrame,
    name_template: str,
    when=None,
    param_cols: list[str] | None = None,
) -> DataFrame:
    """NOTIFY "name" [WHEN cond] — filter to firing rows and build
    notification tuples (name, parameters map).

    ``name_template`` may reference columns as ``${col}``
    (src/RamenStringExpansion.ml); expansion compiles to
    ``format_string`` — row-local, codegen'd, no UDF.
    """
    out = df if when is None else df.filter(when)
    refs = _TEMPLATE_RE.findall(name_template)
    fmt = _TEMPLATE_RE.sub("%s", name_template)
    name_col = (
        F.format_string(fmt, *[F.col(r).cast("string") for r in refs]) if refs else F.lit(name_template)
    )
    params = param_cols or []
    return out.select(
        name_col.alias("notification"),
        F.create_map(
            *[x for c in params for x in (F.lit(c), F.col(c).cast("string"))]
        ).alias("parameters"),
    )


def notify_sink(
    notifications: DataFrame,
    send: Callable[[str, dict[str, str]], None],
    checkpoint: str | None = None,
):
    """Attach a delivery callable to a (streaming) notification frame:
    ``send(name, params)`` per notification, via foreachBatch (the
    alerter's http/exec/kafka contact surface,
    src/RamenAlerter.ml contacts). Returns the StreamingQuery; for a
    batch frame, delivers immediately and returns None."""

    def deliver(batch_df: DataFrame, _epoch: int) -> None:
        for row in batch_df.toLocalIterator():
            send(row["notification"], dict(row["parameters"] or {}))

    if not notifications.isStreaming:
        deliver(notifications, -1)
        return None
    writer = notifications.writeStream.foreachBatch(deliver).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def debounce_incidents(
    notifications: DataFrame,
    time_col: str,
    quiet_seconds: float,
) -> DataFrame:
    """Alerter incident semantics in batch/replay form: consecutive
    firings of the same notification name closer than
    ``quiet_seconds`` belong to one incident (dedup+debounce,
    src/RamenAlerter.ml:1-40). Output: one row per incident with
    first/last firing times and the firing count.

    Plan: lag per name → session-start flags → running sum = incident
    id → groupBy. Two window passes over one shuffle partitioning, no
    state store needed in replay."""
    w = Window.partitionBy("notification").orderBy(time_col)
    gap = F.col(time_col).cast("double") - F.lag(F.col(time_col).cast("double")).over(w)
    flagged = notifications.withColumn(
        "_new", F.when(gap.isNull() | (gap > quiet_seconds), 1).otherwise(0)
    )
    numbered = flagged.withColumn(
        "_incident",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return numbered.groupBy("notification", "_incident").agg(
        F.min(time_col).alias("first_seen"),
        F.max(time_col).alias("last_seen"),
        F.count(F.lit(1)).alias("n_firings"),
    ).drop("_incident")


def program_notifications(op, df: DataFrame, params: dict | None = None) -> DataFrame | None:
    """The NOTIFY clause of a COMPILED operation → notification frame
    (``notification`` string + all output fields as string
    ``parameters`` — the reference sends the full tuple as notification
    parameters, src/RamenOperation.ml notifications). Returns None when
    the operation has no NOTIFY. String templates go through
    ``build_notifications`` (``${col}`` expansion); expression
    templates (the alert transpiler's ``NOTIFY "x for " || string(k)``)
    compile through the RaQL Column compiler. Works on batch and
    streaming frames alike — chain into ``notify_sink`` or
    ``alerter_sink``."""
    notify = getattr(op, "notify", None)
    if notify is None:
        return None
    if isinstance(notify, str):
        return build_notifications(df, notify, param_cols=list(df.columns))
    from ramen_spark.plans.raql import Compiler

    schema = {f_.name: f_.dataType.simpleString() for f_ in df.schema.fields}
    name_col = Compiler(params, schema=schema).col(notify)
    params_map = F.create_map(
        *[x for c in df.columns for x in (F.lit(c), F.col(c).cast("string"))]
    )
    return df.select(
        name_col.alias("notification"), params_map.alias("parameters")
    )
