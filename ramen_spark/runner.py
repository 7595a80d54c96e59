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
    return dfs, cat
