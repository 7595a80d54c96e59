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
