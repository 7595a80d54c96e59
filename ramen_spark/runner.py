"""`ramen run` — deploy a program and its archive surface.

The reference's supervisor starts workers, wires their output
ringbufs, and the archivist decides what gets archived; the GC
enforces retention; readers (tail/replay/Graphite/API) consume the
archives (SURVEY §3). Spark-first: `deploy_program` materializes a
compiled Program, writes each ``PERSIST FOR`` function's output to
its Parquet archive partitioned by the function's FACTORS, enforces
the retention horizon, and registers everything in an
``api.ArchiveCatalog`` — after which the whole read surface
(metrics_find / render / get-timeseries / replay_via_recompute /
the archivist solver) serves those functions with no further wiring.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ramen_spark.api import ArchiveCatalog
from ramen_spark.sources.archive import archive, enforce_retention

__all__ = ["deploy_program"]


def _time_col(df: DataFrame) -> str | None:
    for c in ("start", "ts", "time"):
        if c in df.columns:
            return c
    return None


def deploy_program(
    spark: SparkSession,
    prog,
    archive_root: str,
    params: dict[str, Any] | None = None,
    externals: dict[str, DataFrame] | None = None,
    now_seconds: float | None = None,
    catalog: ArchiveCatalog | None = None,
) -> tuple[dict[str, DataFrame], ArchiveCatalog]:
    """Materialize ``prog`` and archive its persistent functions.

    Per public function with ``PERSIST FOR``: write
    ``{archive_root}/{prog.name}/{fn}`` partitioned by day-bucket +
    the function's FACTORS, drop partitions past the retention
    horizon, and register the table (fq = ``prog.name/fn``) in the
    catalog. Returns (function DataFrames, catalog)."""
    import time

    now = now_seconds if now_seconds is not None else time.time()
    cat = catalog if catalog is not None else ArchiveCatalog()
    dfs = prog.materialize(
        spark, params=params, externals=externals, register_views=False
    )
    for name, fn in prog.functions.items():
        if fn.persist_for is None or fn.is_private:
            continue
        df = dfs.get(name)
        if df is None:
            continue
        tcol = _time_col(df)
        if tcol is None:
            continue  # no event time → nothing to slice or retain
        path = f"{archive_root}/{prog.name}/{name}"
        facs = [f_ for f_ in fn.factors if f_ in df.columns]
        # overwrite: a deploy recomputes the function's full output,
        # so re-deploys stay idempotent (incremental appends are the
        # streaming path's job)
        archive(df, path, time_col=tcol, factors=facs, mode="overwrite")
        enforce_retention(path, fn.persist_for, now)
        stop = "stop" if "stop" in df.columns else None
        cat.register(
            f"{prog.name}/{name}", path,
            time_col=tcol, stop_col=stop, factors=facs, doc=fn.doc,
        )
    # persist the catalog next to the archives (the confserver's role)
    # so fresh processes (CLI tail/timeseries/httpd) rediscover tables
    import os as _os

    cat.save(_os.path.join(archive_root, "_catalog.json"))
    return dfs, cat


def _compile_fn(op, src, params, order_cols):
    """Route one function's Operation to the streaming fold engine or
    the stateless Column compiler (the same decision the batch body
    makes)."""
    from pyspark.sql.types import ArrayType

    from ramen_spark.plans.raql import (
        _needs_fold_engine,
        compile_commit_streaming,
        compile_operation,
    )

    src_arr = frozenset(
        f_.name for f_ in src.schema.fields
        if isinstance(f_.dataType, ArrayType)
    )
    if _needs_fold_engine(op, src_arr) or op.group_by or (
        op.commit_after is not None
    ):
        return compile_commit_streaming(
            op, src, params=params, order_cols=order_cols
        )
    return compile_operation(op, src, params)


def deploy_program_streaming(
    spark: SparkSession,
    prog,
    work_dir: str,
    source_streams: dict[str, DataFrame],
    params: dict[str, Any] | None = None,
    order_cols: dict[str, list[str]] | None = None,
):
    """The reference's ALWAYS-ON mode at the program level: every
    function runs as its own Structured Streaming query, chained
    through durable parquet spools (the Spark twin of the reference's
    per-function ringbufs, src/RingBuf.ml — a worker's output buffer
    IS its children's input). Spooling between stages is also what
    makes arbitrary stateful chaining legal: each stateful operator
    lives in its own query, exactly one per function.

    ``source_streams``: name → streaming DataFrame for external
    parents. Each function compiles from its parsed RaQL Operation —
    the stateless shapes through the Column compiler, everything else
    through compile_commit_streaming (per-group scale path or
    check-all worker mode). Ordering inside micro-batches comes from
    ``order_cols[fn]`` or the function's ts/start column.

    ``source_streams`` keys are resolved two ways: a key matching a
    FUNCTION NAME injects that stream as the function's output (the
    reference test-runner's feed mechanism, src/RamenTests.ml — used
    for YIELD clocks and LISTEN sources whose recorded tuples are
    replayed); any other key serves as an external parent (cross-
    program references, including ``../prog/fn`` relative paths).

    Returns {name: (output_stream_reader, StreamingQuery, spool_dir)}:
    drive with query.processAllAvailable() in topo order (tests) or
    let the triggers run; read a function's live output by re-reading
    its spool.
    """
    import os
    import posixpath

    from ramen_spark.plans.raql import (
        _needs_fold_engine,
        compile_commit_streaming,
        compile_operation,
    )

    from ramen_spark.plans.raql import ReadCsv, _spark_type_of_csv_field

    # program parameter defaults apply exactly as in batch materialize,
    # and program-scope global maps get their engine-reserved stores
    # (fold-local writes; see plans.raql mapadd handling)
    params = {**getattr(prog, "defaults", {}), **(params or {})}
    params.setdefault(
        "__globals", {n: {} for n in getattr(prog, "global_names", ())}
    )
    params.setdefault("__globals_rel", {})
    out: dict[str, tuple[DataFrame, Any, str]] = {}
    order = prog._topo_order()
    for name in order:
        fn = prog.functions[name]
        if name in source_streams:
            # function-output injection: the provided stream IS this
            # function's output (no query of its own — children chain
            # on the durable stream directly)
            out[name] = (source_streams[name], None, None)
            continue
        if isinstance(fn.op, ReadCsv):
            # READ FROM FILE as a LIVE source: tail the file/glob as a
            # CSV stream (scalar columns; the compound/ClickHouse cell
            # layouts stay batch-only here)
            from pyspark.sql import types as T

            rc = fn.op
            schema = T.StructType(
                [
                    T.StructField(fname, _spark_type_of_csv_field(ts), True)
                    for fname, ts in rc.fields
                ]
            )
            reader = (
                spark.readStream.format("csv")
                .schema(schema)
                .option("sep", rc.separator)
            )
            if rc.null_str:
                reader = reader.option("nullValue", rc.null_str)
            load_path = rc.path
            if os.path.isfile(load_path):
                # file streams tail DIRECTORIES; narrow with a glob
                reader = reader.option(
                    "pathGlobFilter", os.path.basename(load_path)
                )
                load_path = os.path.dirname(load_path) or "."
            out[name] = (reader.load(load_path), None, load_path)
            continue
        if fn.op is None or not hasattr(fn.op, "fields"):
            # ListenFor and other non-relational sources: wire their
            # live streams explicitly (streaming.sources.listen_for /
            # listen_for_graphite) via source_streams
            raise NotImplementedError(
                f"{name}: provide this source as a stream in "
                "source_streams (LISTEN sources: streaming.sources."
                "listen_for / listen_for_graphite)"
            )
        if not fn.parents and (fn.op.is_yield or not fn.op.sources):
            # YIELD / EVERY clock as a LIVE source: the rate stream at
            # the declared period, shaped like the batch tick frame
            # (_tick ordinal + _now wall clock) so the same compile
            # path applies (src/CodeGenLib_Skeletons.ml:403-431)
            from pyspark.sql import functions as F

            from ramen_spark.plans.raql import _eval_const
            from ramen_spark.streaming.sources import rate_clock

            period = _eval_const(fn.op.every, params)
            period = float(period) if period else 1.0
            clock = rate_clock(spark, period).select(
                F.col("tick").alias("_tick"),
                F.col("t").cast("double").alias("_now"),
            )
            compiled = _compile_fn(fn.op, clock, params, ["_tick"])
            spool = os.path.join(work_dir, prog.name, name)
            os.makedirs(spool, exist_ok=True)
            q = (
                compiled.writeStream.format("parquet")
                .option("path", spool)
                .option(
                    "checkpointLocation",
                    os.path.join(work_dir, "_ckpt", prog.name, name),
                )
                .outputMode("append")
                .start()
            )
            out[name] = (compiled, q, spool)
            continue
        parents: list[DataFrame] = []
        for parent in fn.parents:
            candidates = [parent]
            if parent.startswith(".."):
                # relative program path (plans.program.materialize's
                # resolution, any_ext_child.ramen)
                candidates.append(
                    posixpath.normpath(posixpath.join(prog.name, parent))
                )
            def _of(entry):
                stream_df, pq_, spool = entry
                if pq_ is None:
                    # source function (CSV tail / injected stream):
                    # chain directly — it is durable upstream
                    return stream_df
                return (
                    spark.readStream.schema(stream_df.schema)
                    .option("pathGlobFilter", "*.parquet")
                    .parquet(spool)
                )

            resolved = None
            for c in candidates:
                if c in out:
                    resolved = [_of(out[c])]
                    break
                if c in source_streams:
                    resolved = [source_streams[c]]
                    break
            if resolved is None:
                # `prog#_/func` — every running instance of the program
                # (plans.program.materialize's wildcard resolution)
                for c in candidates:
                    if "#_" not in c:
                        continue
                    pre, post = c.split("#_", 1)
                    matches = [
                        v
                        for k, v in source_streams.items()
                        if k.startswith(pre + "#") and k.endswith(post)
                    ]
                    if matches:
                        resolved = matches
                        break
            if resolved is None:
                raise KeyError(f"parent {parent!r} of {name!r} not provided")
            parents.extend(resolved)
        src = parents[0]
        if len(parents) > 1:
            # merged stream carries the fields COMMON to all parents,
            # by name (reference parent-type unification,
            # RamenOperation.ml — same rule as the batch body)
            common = [
                c for c in src.columns
                if all(c in p_.columns for p_ in parents[1:])
            ]
            if any(set(p_.columns) != set(src.columns) for p_ in parents[1:]):
                src = src.select(*common)
                rest = [p_.select(*common) for p_ in parents[1:]]
            else:
                rest = parents[1:]
            for p_ in rest:
                src = src.unionByName(p_)

        oc = (order_cols or {}).get(name)
        if oc is None:
            for c in ("ts", "start", "_seq"):
                if c in src.columns:
                    oc = [c]
                    break
            else:
                # no event-time or explicit sequence column: arrival
                # order within each micro-batch — the reference's
                # ringbuf consumption order
                oc = []
        compiled = _compile_fn(fn.op, src, params, oc)

        spool = os.path.join(work_dir, prog.name, name)
        os.makedirs(spool, exist_ok=True)
        q = (
            compiled.writeStream.format("parquet")
            .option("path", spool)
            .option(
                "checkpointLocation",
                os.path.join(work_dir, "_ckpt", prog.name, name),
            )
            .outputMode("append")
            .start()
        )
        out[name] = (compiled, q, spool)
    return out
