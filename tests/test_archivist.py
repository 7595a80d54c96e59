"""Archivist storage-budget solver (sources/archivist.py) — the
optimization stated in src/RamenArchivist.ml:191-258."""

from __future__ import annotations

import math

import pytest

from ramen_spark.sources.archive import DT_SECONDS, archive
from ramen_spark.sources.archivist import (
    FuncStats,
    Retention,
    apply_allocation,
    solve_storage,
)

DAY = 86400.0


def _chain():
    """raw → agg → report: raw is heavy (1 kB/s), agg is cheap to
    store (10 B/s) but costs CPU to recompute from raw."""
    return {
        "p/raw": FuncStats("p/raw", bytes_per_sec=1000.0, cpu_per_sec=0.0),
        "p/agg": FuncStats(
            "p/agg", bytes_per_sec=10.0, cpu_per_sec=1e-4, parents=["p/raw"]
        ),
        "p/report": FuncStats(
            "p/report", bytes_per_sec=1.0, cpu_per_sec=1e-5, parents=["p/agg"]
        ),
    }


def test_tight_budget_archives_the_cheap_function():
    """With room for the aggregate's history but not the raw stream's,
    the solver archives the aggregate (serving the query by read) and
    drops raw archival."""
    alloc = solve_storage(
        _chain(),
        {"p/agg": Retention(7 * DAY)},
        size_limit=10.0 * 7 * DAY * 1.5,  # fits agg, nowhere near raw
    )
    assert alloc["p/agg"] == 7 * DAY
    assert alloc["p/raw"] == 0.0


def test_roomy_budget_prefers_cheapest_total_cost():
    """With budget for either, reading the small agg archive beats
    archiving raw and recomputing agg every query."""
    alloc = solve_storage(
        _chain(),
        {"p/agg": Retention(7 * DAY, query_freq=10.0)},
        size_limit=1e12,
    )
    assert alloc["p/agg"] == 7 * DAY


def test_raw_query_forces_raw_archive():
    """A no-parent function has infinite recompute cost: querying it
    directly leaves no choice but archiving it (RamenArchivist note)."""
    alloc = solve_storage(
        _chain(),
        {"p/raw": Retention(1 * DAY)},
        size_limit=1000.0 * DAY * 2,
    )
    assert alloc["p/raw"] == 1 * DAY


def test_infeasible_raises():
    with pytest.raises(ValueError, match="no feasible"):
        solve_storage(
            _chain(),
            {"p/raw": Retention(7 * DAY)},
            size_limit=100.0,  # can't fit a day of raw anywhere
        )


def test_recompute_path_chosen_when_storage_is_precious():
    """Two queried functions compete for one budget: the solver spends
    it where reading saves the most, recomputing the other through its
    archived parent."""
    funcs = {
        "p/raw": FuncStats("p/raw", 100.0, 0.0),
        # two derived views FATTER than raw (e.g. exploded joins);
        # a is 100× hotter than b
        "p/a": FuncStats("p/a", 200.0, 1e-3, parents=["p/raw"]),
        "p/b": FuncStats("p/b", 200.0, 1e-3, parents=["p/raw"]),
    }
    L = DAY
    # budget: raw + ONE view (both views together don't fit)
    budget = 100.0 * L + 200.0 * L
    alloc = solve_storage(
        funcs,
        {"p/a": Retention(L, query_freq=100.0), "p/b": Retention(L, query_freq=1.0)},
        size_limit=budget,
    )
    # the hot view reads from its own archive; the cold one recomputes
    # from archived raw
    assert alloc["p/a"] == L
    assert alloc["p/b"] == 0.0
    assert alloc["p/raw"] == L


def test_apply_allocation_enforces_horizons(spark, tmp_path):
    """Solved durations drive partition-level retention on the real
    parquet archives (the reference GC's consumption side)."""
    from pyspark.sql import functions as F

    now = 100 * DT_SECONDS
    rows = [(now - d * DT_SECONDS + 10.0, float(d)) for d in range(10)]
    df = spark.createDataFrame(rows, "start double, v double")
    path = str(tmp_path / "arch")
    archive(df, path, time_col="start")
    removed = apply_allocation(
        {"p/agg": 3 * DT_SECONDS}, {"p/agg": path}, now_seconds=now
    )
    # partitions older than 3 days are gone, newer ones remain
    left = spark.read.parquet(path).select("v").collect()
    assert sorted(r["v"] for r in left) == [0.0, 1.0, 2.0, 3.0]
    assert len(removed["p/agg"]) == 6


def test_replay_minimal_ancestor_set(spark, tmp_path):
    """ramen replay semantics (src/RamenReplay.ml): a covered archive
    serves the slice by read (ancestors pruned); an uncovered range
    recomputes through the DAG from the parents' archived slices.
    Source attribution proven via inputFiles()."""
    from pyspark.sql import functions as F

    from ramen_spark.plans.program import Program
    from ramen_spark.sources.archive import archive, replay_via_recompute

    D = float(DT_SECONDS)
    # raw: 10 days, 4 rows/day; agg: daily sums
    raw_rows = [
        (d * D + h * 3600.0, 1.0) for d in range(10) for h in (0, 6, 12, 18)
    ]
    raw_df = spark.createDataFrame(raw_rows, "start double, v double")

    prog = Program("p")

    @prog.define("raw")
    def _raw(spark_, params):
        return raw_df

    @prog.define("agg", parents=["raw"])
    def _agg(spark_, params, raw):
        return (
            raw.groupBy(F.floor(F.col("start") / D).alias("day"))
            .agg(F.sum("v").alias("s"))
            .select((F.col("day") * D).alias("start"), "s")
        )

    raw_path, agg_path = str(tmp_path / "raw"), str(tmp_path / "agg")
    archive(raw_df, raw_path, time_col="start")
    # agg archived for days 8-9 ONLY, with a sentinel value proving
    # reads come from the archive, not recompute
    agg_late = spark.createDataFrame(
        [(8 * D, 400.0), (9 * D, 400.0)], "start double, s double"
    )
    archive(agg_late, agg_path, time_col="start")
    archives = {"raw": raw_path, "agg": agg_path}

    # days 3-5: agg archive doesn't cover → recompute from raw archive
    out = replay_via_recompute(
        spark, prog, "agg", 3 * D, 6 * D, archives
    )
    rows = {r["start"]: r["s"] for r in out.collect()}
    assert rows == {3 * D: 4.0, 4 * D: 4.0, 5 * D: 4.0}
    assert all("/raw/" in f or "raw" in f for f in out.inputFiles())

    # days 8-9: covered → served from the agg archive (sentinel 400)
    out = replay_via_recompute(
        spark, prog, "agg", 8 * D, 10 * D, archives
    )
    rows = {r["start"]: r["s"] for r in out.collect()}
    assert rows == {8 * D: 400.0, 9 * D: 400.0}
    assert all("agg" in f for f in out.inputFiles())
