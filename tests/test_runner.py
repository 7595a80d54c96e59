"""deploy_program (runner.py): the `ramen run` + archivist + reader
wiring in one call — compile a RaQL program with PERSIST FOR and
FACTORS, deploy it, and serve it through the Graphite/JSON-RPC
surface with retention enforced."""

from __future__ import annotations

import pytest

from ramen_spark.api import metrics_find, render
from ramen_spark.plans.raql import compile_program
from ramen_spark.runner import deploy_program
from ramen_spark.sources.archive import DT_SECONDS

DAY = float(DT_SECONDS)
DAY0 = 100 * DAY


def test_deploy_archives_serves_and_retains(spark, tmp_path):
    text = """
DEFINE PERSIST FOR 5d traffic AS
  SELECT start, stop, iface, sum bytes AS bytes
  FROM src
  GROUP BY iface, start // 3600
  COMMIT AFTER in.start > out.stop
  FACTORS iface;
"""
    prog = compile_program(text, name="net")
    rows = [
        (DAY0 + d * DAY + h * 3600.0, DAY0 + d * DAY + (h + 1) * 3600.0,
         iface, float(100 * d + h))
        for d in range(10)
        for h in (0, 6)
        for iface in ("eth0", "eth1")
    ]
    src = spark.createDataFrame(
        rows, "start double, stop double, iface string, bytes double"
    )
    dfs, cat = deploy_program(
        spark, prog, str(tmp_path), externals={"src": src},
        now_seconds=DAY0 + 10 * DAY,
    )

    # archived with factor partitioning, retention drops old days:
    # horizon = now - 5d → days 0-4 gone, 5-9 kept
    import os

    root = tmp_path / "net" / "traffic"
    dts = sorted(p for p in os.listdir(root) if p.startswith("dt="))
    assert len(dts) == 5
    assert min(int(p.split("=")[1]) for p in dts) >= 105
    assert any("iface=eth0" in str(p) for p in (root / dts[0]).iterdir())

    # the serving surface picks the table up with zero extra wiring
    assert cat.tables() == {"net/traffic": ""}
    got = metrics_find(spark, cat, "net.traffic.*")
    assert [m["text"] for m in got] == ["eth0", "eth1"]
    out = render(
        spark, cat, ["net.traffic.eth0.bytes"],
        since=DAY0 + 5 * DAY, until=DAY0 + 6 * DAY, max_data_points=24,
    )
    vals = [v for v, _ in out[0]["datapoints"] if v is not None]
    # day 5 hourly sums at h=0 and h=6: 500 and 506
    assert vals == [500.0, 506.0]


def test_deploy_skips_non_persistent(spark, tmp_path):
    prog = compile_program(
        "DEFINE f AS SELECT a, b FROM src;", name="p"
    )
    src = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    dfs, cat = deploy_program(
        spark, prog, str(tmp_path), externals={"src": src}
    )
    assert cat.tables() == {}
    assert dfs["f"].count() == 1


def test_archive_stream_lands_partitioned(spark, tmp_path):
    """archive_stream: a live stream lands in the same day+factor
    partition layout batch archives use; replay and the serving
    surface read it unchanged."""
    from pyspark.sql import functions as F

    from ramen_spark.sources.archive import archive_stream, replay

    rows = [
        (DAY0 + d * DAY + 10.0, iface, float(d))
        for d in range(4)
        for iface in ("eth0", "eth1")
    ]
    src = tmp_path / "src"
    spark.createDataFrame(
        rows, "start double, iface string, bytes double"
    ).coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(
        "start double, iface string, bytes double"
    ).parquet(str(src))
    q = archive_stream(
        stream, str(tmp_path / "arch"), str(tmp_path / "ckpt"),
        time_col="start", factors=["iface"],
    )
    q.processAllAvailable()
    q.stop()

    import os

    root = tmp_path / "arch"
    dts = sorted(p for p in os.listdir(root) if p.startswith("dt="))
    assert len(dts) == 4
    assert any("iface=eth1" in str(p) for p in (root / dts[0]).iterdir())
    sl = replay(spark, str(root), DAY0 + DAY, DAY0 + 3 * DAY, time_col="start")
    assert sorted(r["bytes"] for r in sl.collect()) == [1.0, 1.0, 2.0, 2.0]


def test_deploy_program_streaming_chain(spark, tmp_path):
    """The always-on mode: a two-function RaQL program runs as chained
    streaming queries through parquet spools (per-function queries =
    the reference's one-worker-per-function model); results match the
    batch materialization of the SAME program."""
    from pyspark.sql import functions as F

    from ramen_spark.runner import deploy_program_streaming

    text = """
DEFINE big AS
  SELECT ts, user, value
  FROM src
  WHERE value >= 10;

DEFINE per_user AS
  SELECT user, sum value AS total, count value AS n
  FROM big
  GROUP BY user
  COMMIT AFTER count value >= 3;
"""
    prog = compile_program(text, name="p")
    rows = [
        (float(i), ["u1", "u2"][i % 2], float(5 + i)) for i in range(20)
    ]
    src_dir = tmp_path / "srcdata"
    src_batch = spark.createDataFrame(rows, "ts double, user string, value double")
    src_batch.coalesce(1).write.parquet(str(src_dir))

    stream = spark.readStream.schema(src_batch.schema).parquet(str(src_dir))
    deployed = deploy_program_streaming(
        spark, prog, str(tmp_path / "work"), {"src": stream}
    )
    try:
        # drive in topo order so children see the parents' spools
        for name in ("big", "per_user"):
            deployed[name][1].processAllAvailable()
        got = sorted(
            (r["user"], r["total"], r["n"])
            for r in spark.read.parquet(deployed["per_user"][2]).collect()
        )
    finally:
        for _, q, _ in deployed.values():
            q.stop()

    exp_dfs = prog.materialize(
        spark, externals={"src": src_batch}, register_views=False
    )
    exp = sorted(
        (r["user"], r["total"], r["n"]) for r in exp_dfs["per_user"].collect()
    )
    assert got == exp and len(got) > 0


def test_count_spec_runs_fully_streaming(spark, tmp_path):
    """CAPSTONE: the reference's own count.ramen — DISTINCT counting,
    nullable predicates, check-all commit on manufacturer change —
    deployed as LIVE STREAMS (deploy_program_streaming: CSV tail →
    worker-mode stateful query → parquet spool), checked against the
    count.test present tuples."""
    import os

    from ramen_spark.runner import deploy_program_streaming

    FUNC = "/root/reference/tests/func"
    if not os.path.isdir(FUNC):
        pytest.skip("reference checkout absent")
    from tests.test_func_corpus import _fixture

    cars_schema = _fixture(spark, "cars").schema
    cars_stream = (
        spark.readStream.schema(cars_schema)
        .format("csv")
        .option("sep", ",")
        .option("pathGlobFilter", "cars.csv")
        .load(os.path.join(FUNC, "fixtures"))
    )
    prog = compile_program(
        open(os.path.join(FUNC, "count.ramen")).read(), name="count",
        base_dir=FUNC,
    )
    deployed = deploy_program_streaming(
        spark, prog, str(tmp_path / "work"),
        {"fixtures/cars/csv": cars_stream},
        order_cols={"f": []},  # arrival order within the one batch
    )
    try:
        deployed["f"][1].processAllAvailable()
        rows = {
            r["manufacturer"]: r
            for r in spark.read.parquet(deployed["f"][2]).collect()
        }
    finally:
        for _, q, _ in deployed.values():
            if q is not None:
                q.stop()

    am = rows["aston martin"]
    assert (am["num_lines"], am["num_models"], am["num_power_cars"],
            am["num_eco_cars"], am["num_eco_cars_nullable"]) == (8, 3, 8, 1, 1)
    mm = rows["Mitsubishi Motors Co"]
    assert (mm["num_lines"], mm["num_models"], mm["num_power_cars"],
            mm["num_eco_cars"], mm["num_eco_cars_nullable"]) == (39, 9, 0, 32, None)


def test_deploy_streaming_yield_clock_is_live(spark, tmp_path):
    """YIELD/EVERY functions run as REAL rate streams in the always-on
    mode (no injection needed): the clock drives the previous-chained
    recurrence live, and a downstream function consumes the spool."""
    import time

    from ramen_spark.runner import deploy_program_streaming

    text = """
DEFINE gen AS
  YIELD 1 + (previous.x |? 0) AS x
  EVERY 0.05s;

DEFINE doubled AS
  SELECT x, x * 2 AS y
  FROM gen;
"""
    prog = compile_program(text, name="clockp")
    deployed = deploy_program_streaming(
        spark, prog, str(tmp_path / "work"), {}
    )
    try:
        # POLL the spool — never processAllAvailable() on a live rate
        # stream: the clock produces a new tick every 0.05 s, so if a
        # micro-batch ever takes longer than the tick interval the
        # stream is permanently backlogged and processAllAvailable
        # livelocks (observed: 260+ batches, test hung). The chained
        # queries make progress on their own triggers; the spool fills
        # without being flushed from here.
        deadline = time.time() + 60
        rows = []
        spool = deployed["doubled"][2]
        schema = deployed["doubled"][0].schema
        while time.time() < deadline:
            time.sleep(2)
            try:
                rows = spark.read.schema(schema).parquet(spool).collect()
            except Exception:
                rows = []  # spool dir not created yet
            if len(rows) >= 5:
                break
        assert len(rows) >= 5
        xs = sorted(r["x"] for r in rows)
        # the previous-chain counts 1, 2, 3, … and y doubles it
        assert xs[:3] == [1, 2, 3]
        assert all(r["y"] == 2 * r["x"] for r in rows)
    finally:
        for _, q, _ in deployed.values():
            if q is not None:
                q.stop()
