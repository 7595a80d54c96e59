"""Alert → RaQL transpilation (alerts.py, src/CodeGen_Alert2RaQL.ml):
declarative threshold alerts become three-function RaQL programs that
compile and RUN through the in-repo front-end."""

from __future__ import annotations

import pytest

from ramen_spark.alerts import AlertSpec, Baseline, compile_alert, generate_alert_raql

COLS = {"start": "float", "stop": "float", "iface": "string", "bytes": "float"}


def _mk_df(spark, values, iface="eth0"):
    rows = [
        (float(i), float(i) + 1.0, iface, float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "start double, stop double, iface string, bytes double")


def test_constant_threshold_alert_fires_and_recovers(spark):
    """Above-threshold alert with hysteresis: firing flips on crossing
    300 up, recovers only below 250 (recovery = threshold + negative
    hysteresis), and AFTER CHANGED emits only the transitions."""
    a = AlertSpec(
        table="net/traffic", column="bytes", threshold=300.0,
        hysteresis=-50.0, id="high-traffic",
        where=[{"lhs": "iface", "rhs": "eth0", "op": "="}],
    )
    prog, text = compile_alert(a, COLS)
    assert "HYSTERESIS" in text and "CHANGED firing" in text
    # 100,100,400(fire),280(still firing: > 250),200(recover),500(fire)
    df = _mk_df(spark, [100, 100, 400, 280, 200, 500])
    out = prog.materialize(
        spark, externals={"net/traffic": df}, register_views=False
    )
    alerts = sorted(
        (r["start"], r["firing"]) for r in out["alert"].collect()
    )
    # CHANGED firing |? firing: the initial healthy row emits nothing
    # (CHANGED is NULL -> firing=False); only transitions appear
    assert alerts == [(2.0, True), (4.0, False), (5.0, True)]
    descs = {r["firing"]: r["desc"] for r in out["alert"].collect()}
    assert "threshold" in descs[True] or "beyond" in descs[True]
    assert "recovered" in descs[False]


def test_where_filter_excludes_other_groups(spark):
    a = AlertSpec(
        table="t", column="bytes", threshold=300.0,
        where=[{"lhs": "iface", "rhs": "eth1", "op": "="}],
    )
    prog, _ = compile_alert(a, COLS)
    df = _mk_df(spark, [500, 500, 500], iface="eth0")  # all filtered out
    out = prog.materialize(spark, externals={"t": df}, register_views=False)
    assert out["alert"].count() == 0


def test_grouped_alert_notifies_per_group(spark):
    """group_by iface: one hysteresis state per interface, NOTIFY name
    carries the group tag (the reference's per-group notification)."""
    a = AlertSpec(table="t", column="bytes", threshold=300.0, group_by=["iface"])
    prog, text = compile_alert(a, COLS)
    assert 'NOTIFY' in text and "iface:" in text
    import pyspark.sql.functions as F

    d0 = _mk_df(spark, [100, 400], iface="eth0")
    d1 = _mk_df(spark, [100, 100], iface="eth1")
    out = prog.materialize(
        spark, externals={"t": d0.unionByName(d1)}, register_views=False
    )
    firing = {
        (r["iface"], r["firing"]) for r in out["alert"].collect()
    }
    assert ("eth0", True) in firing
    assert ("eth1", True) not in firing


def test_reaggregation_time_step(spark):
    """time_step > 0 re-aggregates onto a TRUNCATE grid before the
    hysteresis (the reference's need_reaggr path) with min/max value
    carried through."""
    a = AlertSpec(table="t", column="bytes", threshold=500.0, time_step=2.0)
    prog, text = compile_alert(a, COLS)
    assert "TRUNCATE(start, 2.0)" in text and "COMMIT AFTER" in text
    # per-2s sums: [100+100, 400+300, 10+10] = [200, 700, 20]; the
    # commit slack floors at 60 s (reference: 'assume 1min'), so a
    # straggler at t=200 flushes the earlier buckets
    rows = [(float(i), float(i) + 1.0, "eth0", v)
            for i, v in enumerate([100.0, 100.0, 400.0, 300.0, 10.0, 10.0])]
    rows.append((200.0, 201.0, "eth0", 1.0))
    df = spark.createDataFrame(
        rows, "start double, stop double, iface string, bytes double"
    )
    out = prog.materialize(spark, externals={"t": df}, register_views=False)
    vals = {r["start"]: r["value"] for r in out["filtered"].collect()}
    assert vals == {0.0: 200.0, 2.0: 700.0, 4.0: 20.0}  # t=200 cell open
    assert {r["start"]: r["min_value"] for r in out["filtered"].collect()}[
        2.0
    ] == 300.0
    alerts = sorted((r["start"], r["firing"]) for r in out["alert"].collect())
    assert alerts == [(2.0, True), (4.0, False)]


def test_duration_ratio_window(spark):
    """duration > 0: firing when the PAST-window unhealthy ratio
    reaches `ratio` — one bad point among good ones doesn't fire at
    ratio 0.6, a majority does."""
    a = AlertSpec(
        table="t", column="bytes", threshold=300.0,
        duration=3.0, ratio=0.6,
    )
    prog, text = compile_alert(a, COLS)
    assert "PAST 3.0 SECONDS" in text
    df = _mk_df(spark, [100, 400, 100, 400, 400, 400])
    out = prog.materialize(spark, externals={"t": df}, register_views=False)
    rows = sorted((r["start"], r["firing"]) for r in out["alert"].collect())
    # transitions only: fires at t=3 when the (t-3, t] window holds
    # 2 bad of 3 points (0.67 ≥ 0.6), never recovers in the data
    assert rows == [(3.0, True)]


def test_baseline_threshold_compiles_and_runs(spark):
    """Baseline threshold: the SAMPLE→ONCE EVERY→PERCENTILE→SMOOTH
    chain compiles and the program runs end-to-end (seasonal group)."""
    a = AlertSpec(
        table="t", column="bytes",
        threshold=Baseline(avg_window=10.0, sample_size=100,
                           percentile=90.0, seasonality=4,
                           smooth_factor=0.5, max_distance_rel=0.2),
    )
    prog, text = compile_alert(a, COLS)
    assert "SMOOTH" in text and "PERCENTILE" in text
    df = _mk_df(spark, [100] * 50 + [1000] * 5)
    out = prog.materialize(spark, externals={"t": df}, register_views=False)
    rows = out["ok"].collect()
    assert len(rows) == 55
    assert {r["ok"] for r in rows} == {True, False}


def test_generated_text_shape():
    """The generated text mirrors the reference's program structure:
    three DEFINEs, hysteresis in ok, notification in alert."""
    a = AlertSpec(table="n/t", column="bytes", threshold=1.0, id="x")
    text = generate_alert_raql(a, COLS)
    i_f = text.index("DEFINE filtered AS")
    i_ok = text.index("DEFINE ok AS")
    i_al = text.index("DEFINE alert AS")
    assert i_f < i_ok < i_al
    assert "COALESCE(\n      HYSTERESIS" in text
    assert "KEEP;" in text
