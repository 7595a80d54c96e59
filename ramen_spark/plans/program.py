"""DEFINE-graph semantics (reference parity, SURVEY §3.1):

- ``DEFINE f AS SELECT ... FROM p1, p2`` — a Function whose body gets
  its parents' DataFrames (multi-parent = unionByName of parents, the
  reference's interleaved-stream model, src/RingBuf.ml:4-6).
- ``PARAMETERS p DEFAULTS TO v`` — program parameters; an instance's
  identity is (program name, params) (src/RamenProgram.ml:35-42).
- ``RUN IF cond`` — program-level condition over params
  (src/RamenProgram.ml:29-50).
- ``DEFINE LAZY`` / private functions (leading underscore) — not
  materialized as public views (src/RamenProgram.ml private-name
  rules: '_'-prefixed names are internal).
- ``PERSIST FOR d`` — retention forwarded to sources.archive.

Cycles are rejected (the reference's graph is a DAG across programs;
we enforce it per program).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Body = Callable[..., DataFrame]  # (spark, params, *parent_dfs) -> DataFrame


@dataclass
class Function:
    name: str
    body: Body
    parents: list[str] = field(default_factory=list)
    persist_for: float | None = None
    doc: str = ""
    # ordering-only dependencies (no DataFrame passed): global-map
    # readers run after the writers that fill the map
    after: list[str] = field(default_factory=list)
    # FACTORS — archive partition dimensions (raql Operation.factors)
    factors: list[str] = field(default_factory=list)
    # the parsed RaQL Operation (attached by compile_program) — lets
    # alternate deployments (streaming) recompile the same semantics
    op: Any = None

    @property
    def is_private(self) -> bool:
        return self.name.startswith("_")


class Program:
    """A named set of functions + parameters, materialized in
    topological order."""

    def __init__(
        self,
        name: str,
        parameters: dict[str, Any] | None = None,
        run_if: Callable[[dict[str, Any]], bool] | None = None,
        global_names: list[str] | None = None,
    ):
        self.name = name
        self.defaults = dict(parameters or {})
        self.run_if = run_if
        self.functions: dict[str, Function] = {}
        # DECLARE'd global map variables (program scope); materialize
        # instantiates one shared dict per run under params __globals
        self.global_names = list(global_names or [])

    # -- definition ------------------------------------------------------

    def define(
        self,
        name: str,
        parents: list[str] | None = None,
        persist_for: float | None = None,
        doc: str = "",
        after: list[str] | None = None,
        factors: list[str] | None = None,
    ) -> Callable[[Body], Body]:
        """Decorator: ``@prog.define("f", parents=["raw"])`` over a
        body ``(spark, params, *parent_dfs) -> DataFrame``."""

        def deco(body: Body) -> Body:
            if name in self.functions:
                raise ValueError(f"function {name!r} already defined in {self.name!r}")
            self.functions[name] = Function(
                name, body, list(parents or []), persist_for, doc,
                list(after or []), list(factors or []),
            )
            return body

        return deco

    # -- resolution ------------------------------------------------------

    def _topo_order(self) -> list[str]:
        order: list[str] = []
        state: dict[str, int] = {}  # 0=todo 1=visiting 2=done

        def visit(n: str) -> None:
            if state.get(n) == 2:
                return
            if state.get(n) == 1:
                raise ValueError(f"cycle through {n!r} in program {self.name!r}")
            state[n] = 1
            fn = self.functions.get(n)
            if fn is None:
                raise KeyError(f"unknown parent {n!r} in program {self.name!r}")
            for p in fn.parents:
                if p in self.functions:  # external refs resolve at materialize
                    visit(p)
            for p in fn.after:
                if p in self.functions:
                    visit(p)
            state[n] = 2
            order.append(n)

        for n in self.functions:
            visit(n)
        return order

    def materialize(
        self,
        spark: SparkSession,
        params: dict[str, Any] | None = None,
        externals: dict[str, DataFrame] | None = None,
        register_views: bool = True,
    ) -> dict[str, DataFrame]:
        """Instantiate every function with the given parameter overrides
        (instance identity = name+params). Parents are resolved from
        earlier functions, then from ``externals`` (other programs /
        sources). Public functions are registered as temp views
        ``program/function`` → ``program_function``."""
        p = {**self.defaults, **(params or {})}
        unknown = {
            k for k in (params or {}) if not k.startswith("__")
        } - set(self.defaults)  # __-prefixed keys are engine-reserved
        if unknown:
            raise ValueError(f"unknown parameters {sorted(unknown)} for program {self.name!r}")
        if self.run_if is not None and not self.run_if(p):
            return {}
        p["__globals"] = {n: {} for n in self.global_names}
        # per-key write relations (DataFrames) registered by writer
        # functions; readers broadcast-join them (raql._join_global_map_reads)
        p["__globals_rel"] = {}

        ext = dict(externals or {})
        out: dict[str, DataFrame] = {}
        for name in self._topo_order():
            fn = self.functions[name]
            # source injection: an external keyed "<program>/<function>"
            # replaces the function's output — the reference test
            # runner's way of feeding LISTEN sources recorded tuples
            inj = ext.get(f"{self.name}/{name}")
            if inj is not None:
                out[name] = inj
                if register_views and not fn.is_private:
                    inj.createOrReplaceTempView(f"{self.name}_{name}")
                continue
            parent_dfs = []
            for parent in fn.parents:
                candidates = [parent]
                if parent.startswith(".."):
                    # relative to this program's path (reference
                    # program-path resolution, any_ext_child.ramen)
                    import posixpath

                    candidates.append(
                        posixpath.normpath(posixpath.join(self.name, parent))
                    )
                resolved: list[DataFrame] | None = None
                for c in candidates:
                    if c in out:
                        resolved = [out[c]]
                        break
                    if c in ext:
                        resolved = [ext[c]]
                        break
                if resolved is None:
                    # `prog#_/func` — every instance of the program
                    for c in candidates:
                        if "#_" not in c:
                            continue
                        pre, post = c.split("#_", 1)
                        matches = [
                            v
                            for k, v in ext.items()
                            if k.startswith(pre + "#") and k.endswith(post)
                        ]
                        if matches:
                            resolved = matches
                            break
                if resolved is None:
                    raise KeyError(
                        f"parent {parent!r} of {name!r} not defined nor provided externally"
                    )
                parent_dfs.extend(resolved)
            df = fn.body(spark, p, *parent_dfs)
            out[name] = df
            if register_views and not fn.is_private:
                df.createOrReplaceTempView(f"{self.name}_{name}")
        return {n: d for n, d in out.items()}
