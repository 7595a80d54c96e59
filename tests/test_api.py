"""Read-side serving APIs (ramen_spark.api): the Graphite
impersonator (find-metrics + render, src/RamenGraphite.ml) and the
JSON-RPC v1 API (src/RamenApi.ml) served from a Parquet archive
fixture."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ramen_spark.api import ArchiveCatalog, jsonrpc_handle, metrics_find, render
from ramen_spark.sources.archive import archive

DAY0 = 1704067200.0  # 2024-01-01 UTC


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    """Archive of a 'net/traffic' function: event-time intervals, one
    factor (iface), two numeric fields (bytes, packets) — 24 hourly
    rows per iface with value = hour index."""
    root = tmp_path_factory.mktemp("api") / "net_traffic"
    rows = [
        (DAY0 + h * 3600.0, DAY0 + (h + 1) * 3600.0, iface, float(h), h)
        for h in range(24)
        for iface in ("eth0", "eth1")
    ]
    df = spark.createDataFrame(
        rows, "start double, stop double, iface string, bytes double, packets long"
    )
    archive(df, str(root), time_col="start", factors=["iface"])
    cat = ArchiveCatalog()
    cat.register(
        "net/traffic", str(root),
        time_col="start", stop_col="stop", factors=["iface"],
        doc="per-iface traffic",
    )
    return cat


def test_metrics_find_walks_the_tree(spark, catalog):
    # level 0: program component
    got = metrics_find(spark, catalog, "*")
    assert [(m["text"], m["leaf"], m["expandable"]) for m in got] == [
        ("net", 0, 1)
    ]
    # level 1: the function, still expandable
    got = metrics_find(spark, catalog, "net.*")
    assert [(m["id"], m["leaf"]) for m in got] == [("net.traffic", 0)]
    # level 2: factor values from the archive partitions
    got = metrics_find(spark, catalog, "net.traffic.*")
    assert [m["text"] for m in got] == ["eth0", "eth1"]
    assert all(m["allowChildren"] == 1 for m in got)
    # level 3: numeric data fields are the leaves (start/stop/factor
    # columns excluded)
    got = metrics_find(spark, catalog, "net.traffic.eth0.*")
    assert sorted(m["text"] for m in got) == ["bytes", "packets"]
    assert all(m["leaf"] == 1 and m["expandable"] == 0 for m in got)
    # last component only is completed; id keeps the written prefix
    got = metrics_find(spark, catalog, "net.*.eth0.byt*")
    assert [m["id"] for m in got] == ["net.*.eth0.bytes"]


def test_render_concrete_target(spark, catalog):
    # 24 buckets over the day → one value per hour (avg consolidation
    # of a constant-per-hour series = the hour index)
    out = render(
        spark, catalog, ["net.traffic.eth0.bytes"],
        since=DAY0, until=DAY0 + 86400.0, max_data_points=24,
    )
    assert len(out) == 1
    assert out[0]["target"] == "net.traffic.eth0.bytes"
    pts = out[0]["datapoints"]
    assert len(pts) == 24
    # datapoints are [value, ts] pairs on the grid (value first)
    assert [round(v, 6) for v, _ in pts] == [float(h) for h in range(24)]
    assert pts[0][1] == DAY0 + 3600.0  # bucket end times


def test_render_expands_factor_glob(spark, catalog):
    out = render(
        spark, catalog, ["net.traffic.*.bytes"],
        since=DAY0, until=DAY0 + 86400.0, max_data_points=24,
    )
    assert sorted(o["target"] for o in out) == [
        "net.traffic.eth0.bytes",
        "net.traffic.eth1.bytes",
    ]


def test_render_time_slice_prunes(spark, catalog):
    # a 6-hour slice yields only those buckets
    out = render(
        spark, catalog, ["net.traffic.eth0.bytes"],
        since=DAY0 + 6 * 3600.0, until=DAY0 + 12 * 3600.0,
        max_data_points=6,
    )
    assert [round(v, 6) for v, _ in out[0]["datapoints"]] == [6.0, 7.0, 8.0, 9.0, 10.0, 11.0]


def _rpc(spark, catalog, method, params, rid=1):
    resp = json.loads(
        jsonrpc_handle(
            spark, catalog,
            json.dumps({"method": method, "params": params, "id": rid}),
        )
    )
    assert resp["id"] == rid
    return resp


def test_jsonrpc_version_tables_columns(spark, catalog):
    assert _rpc(spark, catalog, "version", {})["result"] == "v1"
    tables = _rpc(spark, catalog, "get-tables", {"prefix": "net/"})["result"]
    assert tables == {"net/traffic": "per-iface traffic"}
    cols = _rpc(spark, catalog, "get-columns", {"tables": ["net/traffic"]})[
        "result"
    ]["net/traffic"]
    assert cols["iface"]["factor"] is True
    assert cols["bytes"] == {"type": "double", "factor": False}
    assert "dt" not in cols  # archive partition bucket stays internal
    bad = _rpc(spark, catalog, "no-such", {})
    assert "unknown method" in bad["error"]


def test_jsonrpc_get_timeseries(spark, catalog):
    req = {
        "since": DAY0,
        "until": DAY0 + 4 * 3600.0,
        "num-points": 4,
        "consolidation": "sum",
        "data": {
            "net/traffic": {
                "select": ["bytes"],
                "where": [{"lhs": "iface", "rhs": "eth0", "op": "="}],
                "factors": [],
            }
        },
    }
    res = _rpc(spark, catalog, "get-timeseries", req)["result"]
    assert res["times"] == [DAY0 + (b + 1) * 3600.0 for b in range(4)]
    tv = res["values"]["net/traffic"]
    assert tv["column-labels"] == [[]]
    assert [round(v, 6) for v in tv["column-values"][0][0]] == [0.0, 1.0, 2.0, 3.0]


def test_jsonrpc_get_timeseries_factors_and_timestep(spark, catalog):
    req = {
        "since": DAY0,
        "until": DAY0 + 2 * 3600.0,
        "time-step": 3600.0,
        "bucket-time": "begin",
        "data": {
            "net/traffic": {"select": ["bytes", "packets"], "factors": ["iface"]}
        },
    }
    res = _rpc(spark, catalog, "get-timeseries", req)["result"]
    assert res["times"] == [DAY0, DAY0 + 3600.0]
    tv = res["values"]["net/traffic"]
    assert sorted(map(tuple, tv["column-labels"])) == [("eth0",), ("eth1",)]
    for label_cols in tv["column-values"]:
        assert [round(v, 6) for v in label_cols[0]] == [0.0, 1.0]  # bytes
        assert [round(v, 6) for v in label_cols[1]] == [0.0, 1.0]  # packets
    # validation mirrors check_get_timeseries_req
    bad = _rpc(
        spark, catalog, "get-timeseries",
        {"since": DAY0, "until": DAY0 + 1, "data": {}},
    )
    assert "num-points" in bad["error"]


def test_jsonrpc_set_alerts(spark, catalog):
    """set-alerts (RamenApi.ml): AlertInfoV1 specs transpile to RaQL
    alert programs via alerts.py, compiled by the front-end; bad
    columns surface as RPC errors."""
    store = {}
    req = {
        "net/traffic": {
            "bytes": [
                {
                    "threshold": 20.0,
                    "recovery": 15.0,
                    "id": "high-bytes",
                    "where": [{"lhs": "iface", "rhs": "eth0", "op": "="}],
                }
            ]
        }
    }
    resp = json.loads(
        jsonrpc_handle(
            spark, catalog,
            json.dumps({"method": "set-alerts", "params": req, "id": 9}),
            alerts_store=store,
        )
    )
    assert resp == {"result": None, "id": 9}
    (spec, prog, text) = store[("net/traffic", "bytes", 0)]
    assert "HYSTERESIS" in text and spec.hysteresis == -5.0
    # the compiled program RUNS against the archived table
    src = spark.read.parquet(catalog.get("net/traffic").path)
    out = prog.materialize(
        spark, externals={"net/traffic": src}, register_views=False
    )
    fired = [r for r in out["alert"].collect() if r["firing"]]
    assert len(fired) >= 1  # hourly values cross 20 at hour 21+

    bad = json.loads(
        jsonrpc_handle(
            spark, catalog,
            json.dumps({
                "method": "set-alerts",
                "params": {"net/traffic": {"nope": [{"threshold": 1}]}},
                "id": 10,
            }),
        )
    )
    assert "nope" in bad["error"]


def test_http_server_serves_graphite_and_rpc(spark, catalog):
    """The live HTTP surface (httpd.serve): metrics/find + render over
    GET, JSON-RPC over POST — what a Grafana graphite datasource
    actually hits."""
    import urllib.request

    from ramen_spark.httpd import serve

    srv = serve(spark, catalog)
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/version", timeout=30) as r:
            assert json.loads(r.read()) == "v1"
        with urllib.request.urlopen(
            f"{base}/metrics/find?query=net.traffic.*", timeout=60
        ) as r:
            got = json.loads(r.read())
        assert [m["text"] for m in got] == ["eth0", "eth1"]
        until = DAY0 + 4 * 3600.0
        with urllib.request.urlopen(
            f"{base}/render?target=net.traffic.eth0.bytes"
            f"&from={DAY0}&until={until}&maxDataPoints=4",
            timeout=60,
        ) as r:
            rend = json.loads(r.read())
        assert rend[0]["target"] == "net.traffic.eth0.bytes"
        assert [round(v, 6) for v, _ in rend[0]["datapoints"]] == [
            0.0, 1.0, 2.0, 3.0,
        ]
        req = urllib.request.Request(
            f"{base}/api/v1",
            data=json.dumps(
                {"method": "get-tables", "params": {"prefix": ""}, "id": 1}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            rpc = json.loads(r.read())
        assert rpc["result"] == {"net/traffic": "per-iface traffic"}
        with urllib.request.urlopen(f"{base}/nope", timeout=30) as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404  # the /nope probe
    finally:
        srv.shutdown()


def test_render_partial_factor_glob(spark, catalog):
    """A non-* factor glob (eth[01] / eth1*) filters server-side via
    the anchored regex translation."""
    out = render(
        spark, catalog, ["net.traffic.eth1*.bytes"],
        since=DAY0, until=DAY0 + 3600.0, max_data_points=1,
    )
    assert [o["target"] for o in out] == ["net.traffic.eth1.bytes"]


def test_tail_last_tuples(spark, tmp_path):
    """`ramen tail` (RamenCliCmd.ml:1090): last-N tuples in event-time
    order, --where filters, top-k plan (no global sort)."""
    from pyspark.sql import functions as F

    from ramen_spark.api import ArchiveCatalog, tail
    from ramen_spark.sources.archive import archive

    df = spark.range(100).select(
        (F.col("id") * 60.0).alias("start"),
        (F.col("id") % 2).cast("string").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    path = str(tmp_path / "t")
    archive(df, path, time_col="start")
    cat = ArchiveCatalog()
    cat.register("p/f", path, time_col="start")

    out = tail(spark, cat, "p/f", last=5)
    assert [r["v"] for r in out.collect()] == [95.0, 96.0, 97.0, 98.0, 99.0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    filt = tail(spark, cat, "p/f", last=3, where=[{"lhs": "k", "rhs": "0", "op": "="}])
    assert [r["v"] for r in filt.collect()] == [94.0, 96.0, 98.0]

    sliced = tail(spark, cat, "p/f", last=100, since=0.0, until=300.0)
    assert [r["v"] for r in sliced.collect()] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_tail_follow_streams_new_tuples(spark, tmp_path):
    """`ramen tail --follow`: new spool files reach the callback."""
    import time

    from pyspark.sql import functions as F

    from ramen_spark.api import tail_follow

    spool = tmp_path / "spool"
    spool.mkdir()
    df = spark.range(10).select(
        F.col("id").cast("double").alias("start"), F.col("id").alias("v")
    )
    df.filter("v < 5").coalesce(1).write.mode("append").parquet(str(spool))

    got = []
    q = tail_follow(spark, str(spool), df.schema, lambda rows: got.extend(rows))
    try:
        q.processAllAvailable()
        assert sorted(r["v"] for r in got) == [0, 1, 2, 3, 4]
        df.filter("v >= 5").coalesce(1).write.mode("append").parquet(str(spool))
        q.processAllAvailable()
        assert sorted(r["v"] for r in got) == list(range(10))
    finally:
        q.stop()
