"""Program/DEFINE-graph semantics (plans.program): multi-parent union,
params, RUN IF, private functions, cycle detection — reference
behaviors per src/RamenProgram.ml (SURVEY §3.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.catalog import load_table
from ramen_spark.plans import Program
from tests.conftest import SF_SMALL


def _build(spark):
    prog = Program("mon", parameters={"min_value": 10.0}, run_if=lambda p: p["min_value"] >= 0)

    @prog.define("raw")
    def raw(spark_, params):
        return load_table(spark_, SF_SMALL, "events")

    @prog.define("_big", parents=["raw"], doc="private intermediate")
    def big(spark_, params, raw_df):
        return raw_df.filter(F.col("value") >= params["min_value"])

    @prog.define("clicks", parents=["_big"])
    def clicks(spark_, params, big_df):
        return big_df.filter(F.col("event_type") == "click")

    @prog.define("errors", parents=["_big"])
    def errors(spark_, params, big_df):
        return big_df.filter(F.col("event_type") == "error")

    # FROM f1, f2 — interleaved union of parents
    @prog.define("alerts", parents=["clicks", "errors"])
    def alerts(spark_, params, clicks_df, errors_df):
        return clicks_df.unionByName(errors_df).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    return prog


def test_materialize_topo_and_union(spark):
    out = _build(spark).materialize(spark)
    rows = {r["event_type"]: r["n"] for r in out["alerts"].collect()}
    assert set(rows) == {"click", "error"}
    # equals direct computation
    ev = load_table(spark, SF_SMALL, "events")
    exp = (
        ev.filter((F.col("value") >= 10.0) & F.col("event_type").isin("click", "error"))
        .groupBy("event_type")
        .count()
    )
    assert rows == {r["event_type"]: r["count"] for r in exp.collect()}


def test_params_change_instance(spark):
    out = _build(spark).materialize(spark, params={"min_value": 1000.0})
    assert out["alerts"].count() == 0


def test_unknown_param_rejected(spark):
    with pytest.raises(ValueError, match="unknown parameters"):
        _build(spark).materialize(spark, params={"nope": 1})


def test_run_if_skips(spark):
    assert _build(spark).materialize(spark, params={"min_value": -1.0}) == {}


def test_private_not_registered(spark):
    _build(spark).materialize(spark)
    assert spark.catalog.tableExists("mon_clicks")
    assert not spark.catalog.tableExists("mon__big")


def test_cycle_detected(spark):
    prog = Program("cyc")
    prog.define("a", parents=["b"])(lambda s, p, b: b)
    prog.define("b", parents=["a"])(lambda s, p, a: a)
    with pytest.raises(ValueError, match="cycle"):
        prog.materialize(spark)


def test_external_parents(spark):
    prog = Program("child")

    @prog.define("agg", parents=["upstream"])
    def agg(spark_, params, up):
        return up.groupBy("event_type").count()

    ev = load_table(spark, SF_SMALL, "events")
    out = prog.materialize(spark, externals={"upstream": ev})
    assert out["agg"].count() == 5
