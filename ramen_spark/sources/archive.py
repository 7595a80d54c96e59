"""Archival & replay — the archivist/replayer surfaces (SURVEY §3.3).

The reference archives worker output in ORC/ringbuf files with an
SMT-solved storage budget (src/RamenArchivist.ml) and replays history
by re-running the dataflow over the archived slice
(src/RamenReplay.ml). Spark-first equivalents:

- archive: Parquet partitioned by a coarse event-time bucket column
  (``dt``) plus declared FACTORS — partition pruning then makes both
  retention enforcement and replay a metadata operation, at any scale.
- retention (PERSIST FOR d, src/retention.type:1-8): drop expired dt
  partitions — file-level deletes, no rewrite.
- replay: read the archive with a time-range filter; the filter hits
  the dt partition column and min/max parquet stats, so a replay of
  1 day over a year of archive reads ~1/365 of the bytes.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DT_SECONDS = 86400  # one partition per day of event time


def archive(
    df: DataFrame,
    path: str,
    time_col: str = "start",
    factors: list[str] | None = None,
    mode: str = "append",
    format: str = "parquet",
) -> None:
    """Write a function's output to its archive, partitioned by
    day-bucket + FACTORS (low-cardinality dims,
    src/raql_operation.type:50-52). ``format``: "parquet" (default) or
    "orc" — the reference's archive format (src/RamenOrc.ml); both
    carry the same schema fidelity and partition layout, so retention
    and replay work unchanged."""
    out = df.withColumn(
        "dt", F.floor(F.col(time_col).cast("double") / DT_SECONDS).cast("long")
    )
    out.write.mode(mode).partitionBy("dt", *(factors or [])).format(
        format
    ).save(path)


def enforce_retention(path: str, persist_for_seconds: float, now_seconds: float) -> list[str]:
    """PERSIST FOR d: delete dt partitions wholly older than the
    horizon. Returns removed partition dirs. (On object storage this
    is a lifecycle rule; locally, directory removals.)"""
    horizon_dt = int((now_seconds - persist_for_seconds) // DT_SECONDS)
    removed = []
    root = Path(path)
    if not root.exists():
        return removed
    for p in root.glob("dt=*"):
        try:
            dt_val = int(p.name.split("=", 1)[1])
        except ValueError:
            continue
        if dt_val < horizon_dt:
            shutil.rmtree(p)
            removed.append(str(p))
    return removed


def _detect_format(path: str) -> str:
    """Archive format by data-file extension (first file found wins):
    lets replay/catalog readers serve Parquet and ORC archives through
    one code path without carrying format metadata around."""
    root = Path(path)
    for p in root.rglob("*.orc"):
        return "orc"
    return "parquet"


def read_archive(
    spark: SparkSession, path: str, format: str | None = None
) -> DataFrame:
    """Read an archive regardless of which writer produced it. A
    STREAMING-written archive carries a ``_spark_metadata`` sink log
    that keeps listing files after ``enforce_retention`` deletes their
    partitions (reads would FileNotFound); loading the dt partitions
    through ``basePath`` bypasses the log — after a retention pass the
    partition listing is the source of truth, exactly the reference's
    archivist-GC model (deleted ringbuf files simply stop being
    listed)."""
    fmt = format or _detect_format(path)
    if (Path(path) / "_spark_metadata").exists():
        return (
            spark.read.option("basePath", path)
            .format(fmt)
            .load(f"{path}/dt=*")
        )
    return spark.read.format(fmt).load(path)


def replay(
    spark: SparkSession,
    path: str,
    since_seconds: float,
    until_seconds: float,
    time_col: str = "start",
    format: str | None = None,
) -> DataFrame:
    """ramen replay --since --until: time-sliced read of the archive.
    The dt predicate prunes partitions; the fine predicate uses
    columnar min/max stats (parquet and ORC both carry them). Channel
    isolation (src/RamenChannel.ml) is unnecessary — every replay is
    its own DataFrame."""
    lo_dt = int(since_seconds // DT_SECONDS)
    hi_dt = int(until_seconds // DT_SECONDS)
    df = read_archive(spark, path, format=format)
    return df.filter(
        (F.col("dt") >= lo_dt)
        & (F.col("dt") <= hi_dt)
        & (F.col(time_col).cast("double") >= since_seconds)
        & (F.col(time_col).cast("double") < until_seconds)
    )


def archive_time_range(spark: SparkSession, path: str) -> tuple[float, float] | None:
    """Coarse time range covered by an archive, from its dt partition
    directories (a metadata listing, no data read). None when empty.
    Day-granular: a day with zero rows is indistinguishable from a
    missing day (the reference keeps exact per-file ranges in runtime
    stats, src/RamenArchivist.ml compute_archives); pass explicit
    coverage to replay_via_recompute when that matters."""
    import os

    dts = []
    try:
        for p in os.listdir(path):
            if p.startswith("dt="):
                try:
                    dts.append(int(p.split("=", 1)[1]))
                except ValueError:
                    pass
    except FileNotFoundError:
        return None
    if not dts:
        return None
    return (min(dts) * DT_SECONDS, (max(dts) + 1) * DT_SECONDS)


def replay_via_recompute(
    spark: SparkSession,
    prog,
    target: str,
    since_seconds: float,
    until_seconds: float,
    archives: dict[str, str],
    coverage: dict[str, tuple[float, float]] | None = None,
    params: dict | None = None,
    externals: dict | None = None,
    time_col: str = "start",
) -> DataFrame:
    """``ramen replay func --since --until`` with the MINIMAL ANCESTOR
    SET (src/RamenReplay.ml:1-12): walk up from ``target``; a function
    whose archive covers the range is served by a partition-pruned
    read, everything above it is pruned from the replay; an uncovered
    function recomputes from its (recursively replayed) parents by
    re-running its body over the sliced inputs. Channels
    (src/RamenChannel.ml) are unnecessary — each replay is its own
    DataFrame graph, isolation is free.

    ``archives``: function name → archive path (sources.archive
    layout). ``coverage`` overrides the dt-listing range per function
    (exact ranges, e.g. from the archivist's allocation).
    """
    cov = dict(coverage or {})

    def covered(fn_name: str) -> bool:
        path = archives.get(fn_name)
        if path is None:
            return False
        rng = cov.get(fn_name) or archive_time_range(spark, path)
        return rng is not None and rng[0] <= since_seconds and until_seconds <= rng[1]

    inject: dict[str, DataFrame] = {}

    def plan(fn_name: str) -> None:
        if fn_name not in prog.functions:
            return  # external source: caller supplies via externals
        if covered(fn_name):
            inject[f"{prog.name}/{fn_name}"] = replay(
                spark, archives[fn_name], since_seconds, until_seconds,
                time_col=time_col,
            ).drop("dt")
            return  # ancestors pruned from the replay
        for parent in prog.functions[fn_name].parents:
            plan(parent)

    plan(target)
    dfs = prog.materialize(
        spark,
        params=params,
        externals={**(externals or {}), **inject},
        register_views=False,
    )
    out = dfs[target]
    if time_col in out.columns and f"{prog.name}/{target}" not in inject:
        out = out.filter(
            (F.col(time_col).cast("double") >= since_seconds)
            & (F.col(time_col).cast("double") < until_seconds)
        )
    return out


def archive_stream(
    df,
    path: str,
    checkpoint: str,
    time_col: str = "start",
    factors: list[str] | None = None,
    trigger_seconds: float | None = None,
    format: str = "parquet",
):
    """Streaming twin of ``archive``: continuously land a function's
    output stream into its day+factor-partitioned Parquet/ORC archive
    (exactly-once via the checkpoint; the reference's workers write
    their archives incrementally the same way). Readers — replay,
    the Graphite/JSON-RPC surface, the archivist — see the same
    layout as batch archives; ``enforce_retention`` applies
    unchanged. Returns the StreamingQuery."""
    out = df.withColumn(
        "dt", F.floor(F.col(time_col).cast("double") / DT_SECONDS).cast("long")
    )
    writer = (
        out.writeStream.format(format)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("dt", *(factors or []))
        .outputMode("append")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
