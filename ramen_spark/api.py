"""Read-side serving APIs over the Parquet archive.

Two surfaces the reference exposes for dashboards:

- the **Graphite impersonator** (src/RamenGraphite.ml) — enough of the
  Graphite API for Grafana to autocomplete and chart: metric paths are
  ``program.function.<factor value>….<data field>`` with ``*`` globs,
  ``/metrics/find`` completes the LAST path component only
  (RamenGraphite.ml:258-310), ``/render`` returns
  ``[{target, datapoints: [[value|null, bucket_ts], …]}]``
  (RamenGraphite.ml:336-563);
- the **JSON-RPC v1 HTTP API** (src/RamenApi.ml:725-760 router):
  methods ``version``, ``get-tables``, ``get-columns``,
  ``get-timeseries``/``set-alerts`` (request/response shapes
  RamenApi.ml:436-472; set-alerts transpiles AlertInfoV1 specs into
  RaQL alert programs via alerts.py — CodeGen_Alert2RaQL.ml).

Spark-first shape: both serve from the function archives
(sources.archive — day-partitioned Parquet with FACTORS as partition
columns), so factor enumeration is a partition listing and a render
is a partition-pruned replay slice through operators.windows.
timeseries (the bucket-spreading grid). No daemon: these are pure
functions a web layer (or a test) calls with a SparkSession; the
``set-alerts`` method compiles alert programs into an in-memory store
(the reference saves them to the confserver); their NOTIFY output
feeds streaming.alerter.
"""

from __future__ import annotations

import fnmatch
import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ramen_spark.operators.windows import timeseries as ts_grid
from ramen_spark.sources.archive import replay

__all__ = ["ArchiveCatalog", "metrics_find", "render", "jsonrpc_handle", "tail", "tail_follow"]

API_VERSION = "v1"  # reference current_api_version accepts 1 only


@dataclass
class _Table:
    fq: str
    path: str
    time_col: str
    stop_col: str | None
    factors: list[str]
    doc: str
    _schema: Any = field(default=None, repr=False)


class ArchiveCatalog:
    """fq function name → archive location + event-time metadata.

    The reference discovers this from the confserver's compiled
    programs; here functions register their archive explicitly (or a
    deployment walks the archive root)."""

    def __init__(self) -> None:
        self._tables: dict[str, _Table] = {}

    def register(
        self,
        fq: str,
        path: str,
        time_col: str = "start",
        stop_col: str | None = None,
        factors: list[str] | None = None,
        doc: str = "",
    ) -> None:
        self._tables[fq] = _Table(
            fq, path, time_col, stop_col, list(factors or []), doc
        )

    def tables(self) -> dict[str, str]:
        return {fq: t.doc for fq, t in self._tables.items()}

    # -- persistence: the confserver's config-tree role ------------------
    # The reference's catalog lives in the confserver; here a deploy
    # writes a manifest next to the archives so later CLI invocations
    # (tail/timeseries/httpd in a fresh process) rediscover the tables.

    def save(self, path: str) -> None:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as fh:
            json.dump(
                [
                    {
                        "fq": t.fq,
                        "path": t.path,
                        "time_col": t.time_col,
                        "stop_col": t.stop_col,
                        "factors": t.factors,
                        "doc": t.doc,
                    }
                    for t in self._tables.values()
                ],
                fh,
                indent=1,
            )

    @classmethod
    def load(cls, path: str) -> "ArchiveCatalog":
        cat = cls()
        try:
            with open(path) as fh:
                entries = json.load(fh)
            for e in entries:
                cat.register(
                    e["fq"], e["path"], time_col=e["time_col"],
                    stop_col=e.get("stop_col"),
                    factors=e.get("factors") or [], doc=e.get("doc", ""),
                )
        except (json.JSONDecodeError, KeyError, TypeError) as exc:
            raise ValueError(
                f"corrupt archive catalog {path}: {exc!r} — re-run "
                f"`run` to rebuild it, or fix the manifest by hand"
            ) from exc
        return cat

    def get(self, fq: str) -> _Table:
        return self._tables[fq]

    def schema(self, spark: SparkSession, fq: str):
        t = self._tables[fq]
        if t._schema is None:
            t._schema = spark.read.parquet(t.path).schema
        return t._schema

    def columns(self, spark: SparkSession, fq: str) -> dict[str, dict]:
        """get-columns: name → {type, factor} (RamenApi.ml get_columns
        exposes type/units/factor flags from the compiled operation)."""
        t = self._tables[fq]
        out = {}
        for f_ in self.schema(spark, fq).fields:
            if f_.name == "dt":
                continue  # archive partition bucket, not a user column
            out[f_.name] = {
                "type": f_.dataType.simpleString(),
                "factor": f_.name in t.factors,
            }
        return out

    def data_fields(self, spark: SparkSession, fq: str) -> list[str]:
        """Numeric, non-factor, non-time fields — the chartable ones
        (RamenGraphite.ml only_num_fields)."""
        t = self._tables[fq]
        skip = set(t.factors) | {t.time_col, t.stop_col, "dt"}
        numeric = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")
        return [
            f_.name
            for f_ in self.schema(spark, fq).fields
            if f_.name not in skip
            and f_.dataType.simpleString().startswith(numeric)
        ]

    # -- the metric component tree ---------------------------------------

    def _component_domains(
        self, spark: SparkSession, fq: str, since=None, until=None
    ) -> list[list[str]]:
        """Per-depth component domains for one table: program path
        components (fixed), one level per factor (distinct archived
        values — a partition listing), then the data fields."""
        t = self._tables[fq]
        levels: list[list[str]] = [[c] for c in fq.split("/")]
        if t.factors:
            df = spark.read.parquet(t.path)
            if since is not None and until is not None:
                from ramen_spark.sources.archive import DT_SECONDS

                df = df.filter(
                    (F.col("dt") >= int(since // DT_SECONDS))
                    & (F.col("dt") <= int(until // DT_SECONDS))
                )
            for fac in t.factors:
                vals = [
                    str(r[0])
                    for r in df.select(fac).distinct().orderBy(fac).collect()
                ]
                levels.append(vals)
        levels.append(self.data_fields(spark, fq))
        return levels


def _glob_match(pattern: str, value: str) -> bool:
    return fnmatch.fnmatchcase(value, pattern)


def _glob_to_java_regex(pat: str) -> str:
    """Graphite glob → anchored Java regex (rlike): * → .*, ? → .,
    [..] passed through, everything else escaped."""
    import re as _re

    out = []
    i = 0
    while i < len(pat):
        ch = pat[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = pat.find("]", i + 1)
            if j == -1:
                out.append(_re.escape(ch))
            else:
                out.append(pat[i : j + 1])
                i = j
        else:
            out.append(_re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def metrics_find(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    query: str,
    since: float | None = None,
    until: float | None = None,
) -> list[dict]:
    """/metrics/find: expand the LAST component of a dotted glob query
    (earlier components must match but stay as written in ``id``) —
    RamenGraphite.ml:258-310 semantics, {text, id, expandable, leaf,
    allowChildren} rows, unique by id."""
    parts = query.split(".")
    prefix = ".".join(parts[:-1])
    out: list[dict] = []
    seen: set[str] = set()
    for fq in catalog.tables():
        levels = catalog._component_domains(spark, fq, since, until)
        if len(parts) > len(levels):
            continue
        if not all(
            any(_glob_match(p, v) for v in levels[i])
            for i, p in enumerate(parts[:-1])
        ):
            continue
        depth = len(parts) - 1
        leaf = 1 if depth == len(levels) - 1 else 0
        for v in levels[depth]:
            if not _glob_match(parts[-1], v):
                continue
            mid = {
                "text": v,
                "id": (prefix + "." if prefix else "") + v,
                "expandable": 1 - leaf,
                "leaf": leaf,
                "allowChildren": 1 - leaf,
            }
            if mid["id"] not in seen:
                seen.add(mid["id"])
                out.append(mid)
    return out


def _timeseries_for(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    fq: str,
    data_field: str,
    factor_parts: list[str],
    since: float,
    until: float,
    num_points: int,
    consolidation: str = "avg",
) -> list[tuple[tuple[str, ...], list[float | None]]]:
    """One table/field timeseries on a regular num_points grid:
    partition-pruned replay slice → bucket-spreading grid
    (operators.windows.timeseries), grouped by the still-globbed
    factors. Returns [(factor_values, per-bucket values)]."""
    t = catalog.get(fq)
    step = (until - since) / num_points
    df = replay(spark, t.path, since, until, time_col=t.time_col)
    group_facs: list[str] = []
    for fac, pat in zip(t.factors, factor_parts):
        if pat == "*" or any(ch in pat for ch in "*?["):
            group_facs.append(fac)
            if pat != "*":
                df = df.filter(
                    F.col(fac).cast("string").rlike(_glob_to_java_regex(pat))
                )
        else:
            df = df.filter(F.col(fac).cast("string") == pat)
    stop_col = t.stop_col or t.time_col
    grid = ts_grid(
        df, t.time_col, stop_col, data_field, step, since, until,
        factors=group_facs,
    )
    agg = {
        "avg": F.col("sum_value") / F.col("n_events"),
        "sum": F.col("sum_value"),
        "min": F.col("min_value"),
        "max": F.col("max_value"),
    }[consolidation or "avg"]
    rows = grid.select(
        "bucket", *group_facs, agg.alias("_v")
    ).collect()
    series: dict[tuple[str, ...], list[float | None]] = {}
    for r in rows:
        key = tuple(str(r[f_]) for f_ in group_facs)
        vals = series.setdefault(key, [None] * num_points)
        b = int(r["bucket"])
        if 0 <= b < num_points:
            vals[b] = float(r["_v"]) if r["_v"] is not None else None
    if not series and not group_facs:
        series[()] = [None] * num_points
    return sorted(series.items())


def render(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    targets: list[str],
    since: float,
    until: float,
    max_data_points: int = 100,
) -> list[dict]:
    """/render: fully expand each dotted target, one timeseries per
    matching (table, factor combination, field) —
    [{target, datapoints: [[value|null, bucket_start_ts], …]}]
    (RamenGraphite.ml:336-563; datapoints carry the value FIRST,
    Graphite wire order)."""
    num_points = max(1, max_data_points)
    step = (until - since) / num_points
    out: list[dict] = []
    for target in targets:
        parts = target.split(".")
        for fq in catalog.tables():
            t = catalog.get(fq)
            fq_comps = fq.split("/")
            depth = len(fq_comps) + len(t.factors) + 1
            if len(parts) != depth:
                continue
            if not all(
                _glob_match(p, c) for p, c in zip(parts, fq_comps)
            ):
                continue
            factor_parts = parts[len(fq_comps):-1]
            field_pat = parts[-1]
            for df_name in catalog.data_fields(spark, fq):
                if not _glob_match(field_pat, df_name):
                    continue
                for fvals, vals in _timeseries_for(
                    spark, catalog, fq, df_name, factor_parts,
                    since, until, num_points,
                ):
                    # target = concrete factor parts kept as written,
                    # globbed ones substituted with resolved values
                    it = iter(fvals)
                    fac_comps = [
                        next(it) if any(ch in p for ch in "*?[") else p
                        for p in factor_parts
                    ]
                    comps = fq_comps + fac_comps + [df_name]
                    out.append({
                        "target": ".".join(comps),
                        "datapoints": [
                            [v, since + (b + 1) * step]
                            for b, v in enumerate(vals)
                        ],
                    })
    return out


# -- JSON-RPC v1 (RamenApi.ml) ---------------------------------------------


def _set_alerts(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    params: dict,
    table_prefix: str,
    store: dict | None,
) -> None:
    """set-alerts (RamenApi.ml set_alerts): params =
    {table: {column: [alert…]}} with the AlertInfoV1 fields
    (threshold + recovery → hysteresis = recovery − threshold).
    Each alert transpiles to a RaQL program (alerts.py) compiled by
    the front-end — compile errors surface as the RPC error."""
    from ramen_spark.alerts import AlertSpec, compile_alert

    store = store if store is not None else {}
    for tbl, columns in (params or {}).items():
        fq = table_prefix + tbl
        cols = catalog.columns(spark, fq)
        for column, alerts in (columns or {}).items():
            if column not in cols:
                raise ValueError(f"No column {column} in table {tbl}")
            for i, al in enumerate(alerts or []):
                thr = float(al["threshold"])
                spec = AlertSpec(
                    table=fq,
                    column=column,
                    threshold=thr,
                    hysteresis=float(al.get("recovery", thr)) - thr,
                    duration=float(al.get("duration", 0.0)),
                    ratio=float(al.get("ratio", 1.0)),
                    time_step=float(al.get("time-step", 0.0)),
                    where=list(al.get("where", [])),
                    having=list(al.get("having", [])),
                    id=str(al.get("id", "")),
                    desc_title=str(al.get("desc-title", "")),
                    desc_firing=str(al.get("desc-firing", "")),
                    desc_recovery=str(al.get("desc-recovery", "")),
                    enabled=bool(al.get("enabled", True)),
                )
                col_types = {n: c["type"] for n, c in cols.items()}
                prog, text = compile_alert(
                    spec, col_types, name=f"alert/{tbl}/{column}/{i}"
                )
                store[(tbl, column, i)] = (spec, prog, text)


def _apply_simple_filters(df: DataFrame, where: list[dict]) -> DataFrame:
    """AlertInfoV1.simple_filter list: {lhs, rhs, op} with op one of
    = != < <= > >= (RamenApi.ml simple_filter)."""
    ops = {
        "=": "==", "!=": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">=",
    }
    for flt in where or []:
        lhs = F.col(flt["lhs"]).cast("string")
        op = ops[flt.get("op", "=")]
        rhs = F.lit(str(flt["rhs"]))
        df = df.filter(
            {
                "==": lhs == rhs, "!=": lhs != rhs,
                "<": lhs < rhs, "<=": lhs <= rhs,
                ">": lhs > rhs, ">=": lhs >= rhs,
            }[op]
        )
    return df


def tail(
    spark: SparkSession,
    catalog: "ArchiveCatalog",
    fq: str,
    last: int = 10,
    where: list[dict] | None = None,
    since: float | None = None,
    until: float | None = None,
) -> DataFrame:
    """``ramen tail func`` (src/RamenCliCmd.ml:1090): the function's
    most recent ``last`` tuples, optionally time-sliced and filtered
    (the CLI's --last/--where/--since/--until). Spark shape: the time
    predicate prunes dt partitions, the order+limit lowers to
    TakeOrderedAndProject (top-k, never a global sort), and rows come
    back in event-time order like the reference's tail output."""
    from ramen_spark.sources.archive import read_archive, replay

    t = catalog.get(fq)
    if since is not None or until is not None:
        df = replay(
            spark, t.path,
            since if since is not None else float("-inf"),
            until if until is not None else float("inf"),
            time_col=t.time_col,
        )
    else:
        df = read_archive(spark, t.path)
    if where:
        df = _apply_simple_filters(df, where)
    df = df.orderBy(F.col(t.time_col).desc()).limit(last)
    return df.orderBy(F.col(t.time_col)).drop("dt")


def tail_follow(
    spark: SparkSession,
    spool: str,
    schema,
    callback,
    checkpoint: str | None = None,
):
    """``ramen tail --follow``: stream a function's live spool (the
    deploy_program_streaming output dir) and hand each new micro-batch
    of tuples to ``callback(rows)``. Returns the StreamingQuery (stop()
    to detach). The reference's follow mode subscribes to the worker's
    output ringbuf; the spool IS that buffer here."""
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(spool)
    )

    def deliver(batch_df, _epoch):
        rows = batch_df.collect()
        if rows:
            callback(rows)

    writer = stream.writeStream.foreachBatch(deliver)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def jsonrpc_handle(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    body: str,
    table_prefix: str = "",
    alerts_store: dict | None = None,
) -> str:
    """The v1 JSON-RPC dispatcher (RamenApi.ml:725-760): parse
    {method, params, id}, answer {result, id} or {error, id}.

    ``alerts_store``: mutable dict receiving compiled alert programs
    from ``set-alerts`` (keyed (table, column, index) →
    (AlertSpec, Program, generated RaQL text)); the reference saves
    the generated sources to the confserver instead."""
    req = json.loads(body)
    rid = req.get("id")

    def ok(result) -> str:
        return json.dumps({"result": result, "id": rid})

    def err(msg: str) -> str:
        return json.dumps({"error": str(msg), "id": rid})

    try:
        method = str(req.get("method", "")).lower()
        params = req.get("params") or {}
        if method == "version":
            return ok(API_VERSION)
        if method == "get-tables":
            pre = table_prefix + params.get("prefix", "")
            return ok({
                fq[len(table_prefix):]: doc
                for fq, doc in catalog.tables().items()
                if fq.startswith(pre)
            })
        if method == "get-columns":
            out = {}
            for tbl in params.get("tables", []):
                out[tbl] = catalog.columns(spark, table_prefix + tbl)
            return ok(out)
        if method == "get-timeseries":
            return ok(_get_timeseries(spark, catalog, params, table_prefix))
        if method == "set-alerts":
            _set_alerts(spark, catalog, params, table_prefix, alerts_store)
            return ok(None)
        return err(f"unknown method {method!r}")
    except Exception as e:  # bad_request surface
        return err(repr(e))


def _get_timeseries(
    spark: SparkSession,
    catalog: ArchiveCatalog,
    req: dict,
    table_prefix: str,
) -> dict:
    since, until = float(req["since"]), float(req["until"])
    if since > until:
        raise ValueError("since must come before until")
    num_points = int(req.get("num-points", req.get("num_points", 0)) or 0)
    time_step = float(req.get("time-step", 0.0) or 0.0)
    if (num_points <= 0) == (time_step <= 0):
        raise ValueError("must set exactly one of num-points or time-step")
    if num_points <= 0:
        # Timeseries.compute_num_points: grid aligned on time_step
        num_points = max(1, int(round((until - since) / time_step)))
    step = (until - since) / num_points
    bucket_time = str(req.get("bucket-time", "end")).lower()
    offs = {"begin": 0.0, "middle": 0.5, "end": 1.0}
    if bucket_time not in offs:
        raise ValueError(
            "The only possible values for bucket_time are begin, middle, end"
        )
    consolidation = str(req.get("consolidation", "") or "avg").lower()
    times = [since + (b + offs[bucket_time]) * step for b in range(num_points)]
    values: dict[str, dict] = {}
    for tbl, spec in (req.get("data") or {}).items():
        fq = table_prefix + tbl
        t = catalog.get(fq)
        select = spec.get("select", [])
        factors = spec.get("factors", [])
        df = replay(spark, t.path, since, until, time_col=t.time_col)
        df = _apply_simple_filters(df, spec.get("where", []))
        # one grid per selected field, grouped by requested factors
        labels: list[list[str]] = []
        cols: list[list[list[float | None]]] = []
        label_idx: dict[tuple[str, ...], int] = {}
        stop_col = t.stop_col or t.time_col
        for fname in select:
            grid = ts_grid(
                df, t.time_col, stop_col, fname, step, since, until,
                factors=list(factors),
            )
            agg = {
                "avg": F.col("sum_value") / F.col("n_events"),
                "sum": F.col("sum_value"),
                "min": F.col("min_value"),
                "max": F.col("max_value"),
            }[consolidation]
            for r in grid.select("bucket", *factors, agg.alias("_v")).collect():
                key = tuple(str(r[f_]) for f_ in factors)
                if key not in label_idx:
                    label_idx[key] = len(labels)
                    labels.append(list(key))
                    cols.append([[None] * num_points for _ in select])
                b = int(r["bucket"])
                if 0 <= b < num_points:
                    col_i = select.index(fname)
                    cols[label_idx[key]][col_i][b] = (
                        float(r["_v"]) if r["_v"] is not None else None
                    )
        if not labels and not factors:
            labels = [[]]
            cols = [[[None] * num_points for _ in select]]
        values[tbl] = {
            "column-labels": labels,
            "column-values": cols,
        }
    return {"times": times, "values": values}
