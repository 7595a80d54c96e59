"""Archivist storage-budget solver (src/RamenArchivist.ml:191-258).

The reference's archivist decides WHICH functions archive their
output and for HOW LONG, given a global storage budget: querying
history of length L at frequency H from function F costs either

- the IO cost of reading the archive: ``L × H × read_cost(F)``
  (read_cost = bytes/s × recall_cost), when F archives ≥ L; or
- the cost of recomputing from its parents:
  ``Σ_p query_cost(p, L) + L × H × cpu_cost(F)`` — infinite for a
  function with no parents (raw input can't be recomputed).

Minimize total query cost subject to
``Σ bytes/s(F) × duration(F) ≤ size_limit``.

The reference compiles this into SMT formulas for Z3 with continuous
storage shares (perc_i). Spark-first v1: the solution space is
DISCRETIZED to the demanded durations — a function either archives
long enough to serve some query horizon on the recompute paths
through it, or not at all; intermediate durations serve no query and
only waste budget, so the optimum of the discretized problem matches
the continuous one whenever budget allows any full choice (the
reference's own note says the shares come out at the demand points).
Exact branch-and-bound over the per-function candidate sets — program
DAGs are small (tens of functions), so exhaustive search with budget
and best-cost pruning is instant; the exponential worst case is
guarded with a node cap.

Execution side: ``apply_allocation`` turns the chosen durations into
``sources.archive.enforce_retention`` horizons per archive path (the
reference's GC consumes the same output).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

__all__ = ["FuncStats", "Retention", "solve_storage", "apply_allocation"]


@dataclass
class FuncStats:
    """Per-function runtime stats the solver needs
    (RamenArchivist.ml arc_stats)."""

    fq: str
    bytes_per_sec: float  # archive growth rate
    cpu_per_sec: float  # cost to recompute 1 s of output (excl. parents)
    parents: list[str] = field(default_factory=list)


@dataclass
class Retention:
    """User configuration per queried function
    (src/RamenRetention: duration + query frequency)."""

    duration: float  # seconds of history queries need
    query_freq: float = 1.0  # queries per second (the H weight)


def solve_storage(
    funcs: dict[str, FuncStats],
    retentions: dict[str, Retention],
    size_limit: float,
    recall_cost: float = 1e-6,
    max_nodes: int = 2_000_000,
) -> dict[str, float]:
    """→ {fq: archive_duration_seconds} minimizing total query cost
    within the storage budget. Raises ValueError when no feasible
    allocation exists (a no-parent function must be archived for the
    full duration of any query that reaches it)."""
    order = list(funcs)

    # demanded durations per function: every query propagates its
    # horizon up the recompute DAG (RamenArchivist 'obtained from the
    # parents recursively')
    demands: dict[str, set[float]] = {f: set() for f in funcs}

    def propagate(fq: str, dur: float) -> None:
        if dur in demands[fq]:
            return
        demands[fq].add(dur)
        for p in funcs[fq].parents:
            propagate(p, dur)

    for fq, ret in retentions.items():
        if ret.duration > 0:
            propagate(fq, ret.duration)

    candidates: dict[str, list[float]] = {
        f: sorted({0.0, *demands[f]}) for f in order
    }

    def query_cost(alloc: dict[str, float], fq: str, dur: float) -> float:
        st = funcs[fq]
        if alloc[fq] >= dur:
            return dur * st.bytes_per_sec * recall_cost
        if not st.parents:
            return math.inf  # raw input: no recompute path
        c = dur * st.cpu_per_sec
        for p in st.parents:
            c += query_cost(alloc, p, dur)
        return c

    def total_cost(alloc: dict[str, float]) -> float:
        tot = 0.0
        for fq, ret in retentions.items():
            if ret.duration > 0:
                tot += ret.query_freq * query_cost(alloc, fq, ret.duration)
        return tot

    best: tuple[float, dict[str, float]] | None = None
    visited = 0

    def search(i: int, alloc: dict[str, float], used: float) -> None:
        nonlocal best, visited
        visited += 1
        if visited > max_nodes:
            raise RuntimeError(
                "archivist solver node cap exceeded — the DAG/candidate "
                "product is degenerate; coarsen retentions"
            )
        if i == len(order):
            cost = total_cost(alloc)
            if math.isfinite(cost) and (best is None or cost < best[0]):
                best = (cost, dict(alloc))
            return
        fq = order[i]
        bps = funcs[fq].bytes_per_sec
        for d in candidates[fq]:
            sz = d * bps
            if used + sz > size_limit + 1e-9:
                continue  # candidates ascend: larger ones also overflow
            alloc[fq] = d
            search(i + 1, alloc, used + sz)
        alloc[fq] = 0.0

    search(0, {f: 0.0 for f in order}, 0.0)
    if best is None:
        raise ValueError(
            "no feasible allocation: a queried no-parent function exceeds "
            "the storage budget"
        )
    return best[1]


def apply_allocation(
    allocation: dict[str, float],
    archive_paths: dict[str, str],
    now_seconds: float,
) -> dict[str, list[str]]:
    """Enforce the solved durations on the on-disk archives: each
    function's retention horizon becomes its allocated duration
    (0 ⇒ drop everything). Returns removed partitions per fq."""
    from ramen_spark.sources.archive import enforce_retention

    removed: dict[str, list[str]] = {}
    for fq, dur in allocation.items():
        path = archive_paths.get(fq)
        if path is None:
            continue
        removed[fq] = enforce_retention(path, dur, now_seconds)
    return removed
