"""Streaming twins: batch results are the oracle (SURVEY §7 —
'define batch semantics as the oracle, document streaming
equivalence')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.catalog import load_table
from ramen_spark.streaming.commit import streaming_commit_aggregate
from ramen_spark.streaming.windows import dedup_within_watermark, run_to_memory, tumbling_stream
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_stream(spark):
    from ramen_spark.catalog import load_stream

    batch = load_table(spark, SF_SMALL, "events")
    return load_stream(spark, SF_SMALL, "events"), batch


def test_tumbling_stream_matches_batch(spark, events_stream):
    stream, batch = events_stream
    aggs = [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s")]

    out = run_to_memory(
        tumbling_stream(stream, "ts", "10 minutes", "1 minute", ["event_type"], aggs),
        "tumbling_out",
    )
    got = {
        (r["event_type"], r["window"]["start"], r["n"], r["s"]) for r in out.collect()
    }

    exp_df = batch.groupBy(F.window("ts", "10 minutes"), "event_type").agg(*aggs)
    exp_all = {
        (r["event_type"], r["window"]["start"], r["window"]["end"], r["n"], r["s"])
        for r in exp_df.collect()
    }
    # append mode emits only windows the watermark closed: end <= max_ts - delay
    import datetime as dt

    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(minutes=1)
    exp_closed = {(t, s, n, v) for (t, s, e, n, v) in exp_all if e <= horizon}
    got_keys = got
    assert exp_closed <= got_keys <= {(t, s, n, v) for (t, s, e, n, v) in exp_all}
    assert len(exp_closed) > 0


def test_streaming_commit_matches_batch_engine(spark, events_stream):
    stream, batch = events_stream
    cb = dict(
        key_cols=["event_type"],
        order_col="event_id",
        init_state=lambda: {"n": 0, "sum": 0.0},
        output_schema="event_type string, n long, sum_value double",
    )

    def update(st, row):
        st["n"] += 1
        st["sum"] += row["value"]

    def fin(st, row, prev):
        return {"event_type": row["event_type"], "n": st["n"], "sum_value": round(st["sum"], 6)}

    def cond(st, row, prev):
        return st["n"] >= 50

    sel = ["event_id", "event_type", "value"]
    s_out = run_to_memory(
        streaming_commit_aggregate(
            stream.select(*sel), update=update, finalize=fin, commit_cond=cond, **cb
        ),
        "commit_out",
    )
    got = {(r["event_type"], r["sum_value"]) for r in s_out.collect()}

    from ramen_spark.operators.aggregate import commit_aggregate

    b_out = commit_aggregate(
        batch.select(*sel), update=update, finalize=fin, commit_cond=cond, **cb
    )
    exp = {(r["event_type"], r["sum_value"]) for r in b_out.collect()}
    assert got == exp and len(got) > 0


def test_dedup_within_watermark(spark, events_stream):
    stream, batch = events_stream
    out = run_to_memory(
        dedup_within_watermark(stream, ["user_id", "event_type"], "ts", "10 minutes"),
        "dedup_out",
    )
    n_distinct = batch.select("user_id", "event_type").distinct().count()
    # watermark dedup keeps ≥ distinct-forever count (re-emits after horizon)
    assert n_distinct <= out.count() <= batch.count()


def test_rate_clock_shape(spark):
    from ramen_spark.streaming.sources import rate_clock

    df = rate_clock(spark, 0.5)
    assert df.isStreaming and set(df.columns) == {"t", "tick"}


def test_streaming_notify_sink(spark, events_stream):
    """NOTIFY over a stream: template-expanded notifications delivered
    through foreachBatch; batch build over the same data is the
    oracle for count and names."""
    from ramen_spark.streaming.sinks import build_notifications, notify_sink

    stream, batch = events_stream
    notifs = build_notifications(
        stream,
        "spike on ${event_type}",
        when=F.col("value") > 195,
        param_cols=["event_id"],
    )
    got: list[tuple[str, dict]] = []
    q = notify_sink(notifs, lambda name, params: got.append((name, params)))
    q.processAllAvailable()
    q.stop()

    exp = build_notifications(
        batch, "spike on ${event_type}", when=F.col("value") > 195, param_cols=["event_id"]
    )
    assert len(got) == exp.count()
    assert {n for n, _ in got} == {r["notification"] for r in exp.collect()}


def test_parse_graphite_lines(spark):
    from ramen_spark.streaming.sources import parse_graphite

    lines = [
        ("servers.web1.cpu.idle 97.5 1700000000",),
        ("  a.b -3 1700000001  ",),  # leading/trailing space, negative
        ("bad-line-no-fields",),
    ]
    df = spark.createDataFrame(lines, "value string")
    rows = {r["metric"]: (r["value"], r["start"]) for r in parse_graphite(df).collect()}
    assert rows["servers.web1.cpu.idle"] == (97.5, 1700000000.0)
    assert rows["a.b"] == (-3.0, 1700000001.0)
    assert rows["bad-line-no-fields"] == (None, None)


def test_streaming_netflow_decode_e2e(spark, tmp_path):
    """LISTEN FOR netflow, streaming composition: packets land as a
    binary column in parquet files, a file stream tails them, the
    decode kernel runs inside the stream, and a foreachBatch sink
    aggregates — proving the decoder composes with Structured
    Streaming, not just batch."""
    from pyspark.sql import types as T

    from ramen_spark.sources.binary import decode_netflow_v5, encode_netflow_v5

    flows = [
        {"src": i, "bytes": 10 * i, "packets": 1, "ip_proto": i % 3} for i in range(90)
    ]
    pkts = [encode_netflow_v5(flows[i : i + 30], flow_sequence=i) for i in range(0, 90, 30)]
    schema = T.StructType([T.StructField("packet", T.BinaryType())])
    src_dir = tmp_path / "pkts"
    src_dir.mkdir()
    spark.createDataFrame([(p,) for p in pkts], schema).write.parquet(
        str(src_dir / "batch0")
    )

    stream = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(str(src_dir) + "/*")
    decoded = decode_netflow_v5(stream)

    got: dict[int, int] = {}

    def sink(batch_df, _epoch):
        for r in batch_df.groupBy("ip_proto").agg(F.sum("bytes").alias("b")).collect():
            got[r["ip_proto"]] = got.get(r["ip_proto"], 0) + r["b"]

    q = decoded.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    want: dict[int, int] = {}
    for f in flows:
        want[f["ip_proto"]] = want.get(f["ip_proto"], 0) + f["bytes"]
    assert got == want


def test_raql_commit_streaming_matches_batch(spark, events_stream):
    """compile_commit_streaming runs the SAME parsed Operation + _Fold
    through applyInPandasWithState and must emit the batch compiler's
    tuples (which for this count-window shape take the Catalyst-lowered
    path — fold-vs-lowered cross-validation for free)."""
    from ramen_spark.plans.raql import (
        compile_commit_operation,
        compile_commit_streaming,
    )

    stream, batch = events_stream
    text = (
        "select event_type, round(sum value, 2) as s, count value as n "
        "group by event_type commit after count value >= 50"
    )
    schema = "event_type string, s double, n long"
    sel = ["event_id", "event_type", "value"]
    s_out = run_to_memory(
        compile_commit_streaming(
            text, stream.select(*sel), output_schema=schema, order_cols=["event_id"]
        ),
        "raql_commit_stream",
    )
    got = sorted((r["event_type"], r["s"], r["n"]) for r in s_out.collect())
    b_out = compile_commit_operation(
        text, batch.select(*sel), output_schema=schema, order_cols=["event_id"]
    )
    exp = sorted((r["event_type"], r["s"], r["n"]) for r in b_out.collect())
    assert got == exp and len(got) > 0


def test_raql_commit_streaming_keep_running_count(spark, events_stream):
    """word_count counter1 shape: COMMIT AND KEEP ALL AFTER true —
    running per-key count emitted on every input row, state never
    flushed (tests/func/word_count.ramen)."""
    from ramen_spark.plans.raql import (
        compile_commit_operation,
        compile_commit_streaming,
    )

    stream, batch = events_stream
    text = (
        "select event_type, sum 1 as n group by event_type "
        "commit and keep all after true"
    )
    schema = "event_type string, n long"
    sel = ["event_id", "event_type"]
    s_out = run_to_memory(
        compile_commit_streaming(
            text, stream.select(*sel), output_schema=schema, order_cols=["event_id"]
        ),
        "raql_keep_stream",
    )
    got = sorted((r["event_type"], r["n"]) for r in s_out.collect())
    b_out = compile_commit_operation(
        text, batch.select(*sel), output_schema=schema, order_cols=["event_id"]
    )
    exp = sorted((r["event_type"], r["n"]) for r in b_out.collect())
    assert got == exp and len(got) > 0


def test_raql_commit_streaming_row_stateful(spark, events_stream):
    """LAG inside the streaming fold: _Fold row-state (arbitrary Python
    objects) must survive the pickle state round-trip."""
    from ramen_spark.plans.raql import (
        compile_commit_operation,
        compile_commit_streaming,
    )

    stream, batch = events_stream
    text = (
        "select event_type, lag 1 value as pv, round(sum value, 2) as s "
        "group by event_type commit after count value >= 100"
    )
    schema = "event_type string, pv double, s double"
    sel = ["event_id", "event_type", "value"]
    s_out = run_to_memory(
        compile_commit_streaming(
            text, stream.select(*sel), output_schema=schema, order_cols=["event_id"]
        ),
        "raql_lag_stream",
    )
    got = sorted((r["event_type"], r["pv"], r["s"]) for r in s_out.collect())
    b_out = compile_commit_operation(
        text, batch.select(*sel), output_schema=schema, order_cols=["event_id"]
    )
    exp = sorted((r["event_type"], r["pv"], r["s"]) for r in b_out.collect())
    assert got == exp and len(got) > 0


def test_listen_for_netflow_real_udp(spark):
    """LISTEN FOR netflow end-to-end over a REAL UDP socket: encoded
    v5 packets sent as datagrams to the listener's ephemeral port land
    in the spool, stream through the decode kernel, and aggregate to
    the sent flow totals."""
    import socket
    import time

    from ramen_spark.sources.binary import encode_netflow_v5
    from ramen_spark.streaming.sources import listen_for

    decoded, spool = listen_for(spark, "netflow")
    try:
        flows = [
            {"src": i, "bytes": 100 + i, "packets": 1, "ip_proto": i % 2}
            for i in range(60)
        ]
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(0, 60, 30):
            c.sendto(
                encode_netflow_v5(flows[i : i + 30], flow_sequence=i),
                ("127.0.0.1", spool.port),
            )
        c.close()
        # wait for the receiver thread to drain the socket, then land;
        # each attempt re-reads the whole (uncheckpointed) spool, so
        # totals rebuild from scratch per attempt
        deadline = time.time() + 10
        got: dict[int, int] = {}

        def sink(batch_df, _e):
            for r in batch_df.groupBy("ip_proto").agg(
                F.sum("bytes").alias("b")
            ).collect():
                got[r["ip_proto"]] = got.get(r["ip_proto"], 0) + r["b"]

        while time.time() < deadline and sum(got.values()) < sum(
            f["bytes"] for f in flows
        ):
            time.sleep(0.3)
            spool.flush()
            got.clear()
            q = decoded.writeStream.foreachBatch(sink).trigger(
                availableNow=True
            ).start()
            q.awaitTermination(60)
        want: dict[int, int] = {}
        for f in flows:
            want[f["ip_proto"]] = want.get(f["ip_proto"], 0) + f["bytes"]
        assert got == want
    finally:
        spool.close()


def test_listen_for_collectd_real_udp(spark):
    """LISTEN FOR collectd over a real UDP datagram."""
    import socket
    import time

    from ramen_spark.sources.binary import encode_collectd
    from ramen_spark.streaming.sources import listen_for

    decoded, spool = listen_for(spark, "collectd")
    try:
        pkt = encode_collectd(
            [
                {"host": "web1", "time": 1.7e9, "plugin": "cpu", "values": [42.0]},
                {"host": "web1", "time": 1.7e9, "plugin": "mem", "values": [7.0]},
            ]
        )
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        c.sendto(pkt, ("127.0.0.1", spool.port))
        c.close()
        rows = []
        deadline = time.time() + 10
        while time.time() < deadline and len(rows) < 2:
            time.sleep(0.3)
            spool.flush()
            rows = []

            def sink(batch_df, _e):
                rows.extend(batch_df.collect())

            q = decoded.writeStream.foreachBatch(sink).trigger(
                availableNow=True
            ).start()
            q.awaitTermination(60)
        got = {(r["plugin"], r["value"]) for r in rows}
        assert got == {("cpu", 42.0), ("mem", 7.0)}
    finally:
        spool.close()


def test_listen_for_graphite_real_tcp(spark):
    """LISTEN FOR graphite over a real TCP connection: a server
    thread feeds plaintext metric lines to the socket source; the
    parsed stream lands typed rows."""
    import socket
    import threading

    from ramen_spark.streaming.sources import listen_for_graphite

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    lines = [
        "servers.web1.cpu.idle 97.5 1700000000\n",
        "servers.web1.mem.used 1234 1700000001\n",
    ]

    def serve():
        conn, _ = srv.accept()
        for ln in lines:
            conn.sendall(ln.encode())
        import time as _t

        _t.sleep(3)  # keep the connection up while the batch drains
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = listen_for_graphite(spark, "127.0.0.1", port)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("graphite_tcp")
        .start()
    )
    import time

    deadline = time.time() + 30
    rows = []
    while time.time() < deadline and len(rows) < 2:
        time.sleep(0.5)
        rows = spark.table("graphite_tcp").collect()
    q.stop()
    srv.close()
    got = {r["metric"]: (r["value"], r["start"]) for r in rows}
    assert got == {
        "servers.web1.cpu.idle": (97.5, 1700000000.0),
        "servers.web1.mem.used": (1234.0, 1700000001.0),
    }


def test_streaming_soak_bounded_state_and_retention(spark, tmp_path):
    """VERDICT r3 #10 — the always-on mode's durability story: a
    grouped stateful query runs across MANY micro-batches on the
    RocksDB state store; per-group state must stay bounded by the
    group count (no leak across triggers), the spool must honor
    retention (expired day-partitions deleted), and re-reading the
    surviving spool must agree with the batch engine over the same
    retained slice."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    from ramen_spark.plans.raql import (
        compile_commit_operation,
        compile_commit_streaming,
    )
    from ramen_spark.sources.archive import (
        DT_SECONDS,
        archive_stream,
        enforce_retention,
        read_archive,
    )

    n_groups, n_files, rows_per_file = 4, 24, 50
    src = tmp_path / "soak_src"
    src.mkdir()
    all_rows = []
    for i in range(n_files * rows_per_file):
        # event time advances ~1 day every 2 files so retention has
        # partitions to expire
        all_rows.append(
            (float(i * DT_SECONDS / (2 * rows_per_file)),
             f"g{i % n_groups}", float(i % 7))
        )
    df = spark.createDataFrame(all_rows, "start double, k string, v double")
    for i in range(n_files):
        df.filter(
            (F.col("start") >= all_rows[i * rows_per_file][0])
            & (F.col("start") <= all_rows[(i + 1) * rows_per_file - 1][0])
        ).coalesce(1).write.parquet(str(src / f"f{i:03d}"))

    text = (
        "select k, min start as start, sum v as total, count v as n "
        "group by k commit after count v >= 25"
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/f*")
        )
        out = compile_commit_streaming(text, stream, order_cols=["start"])
        spool = str(tmp_path / "soak_spool")
        q = archive_stream(
            out, spool, str(tmp_path / "soak_ckpt"), time_col="start"
        )
        try:
            q.processAllAvailable()
            prog = q.lastProgress
            state_rows = sum(
                s["numRowsTotal"] for s in prog["stateOperators"]
            )
            # bounded: one state entry per live group, not per trigger
            assert 0 < state_rows <= n_groups, prog["stateOperators"]
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    # checkpoint is compacted metadata, not an unbounded row log: it
    # must stay far smaller than the data that flowed through
    ckpt_bytes = sum(
        os.path.getsize(p)
        for p in _glob.glob(str(tmp_path / "soak_ckpt") + "/**", recursive=True)
        if os.path.isfile(p)
    )
    assert ckpt_bytes < 20 * 1024 * 1024

    # retention: drop day-partitions past the horizon; survivors only
    last_t = all_rows[-1][0]
    removed = enforce_retention(spool, 3 * DT_SECONDS, last_t)
    assert removed, "soak produced no expirable partitions"
    kept = read_archive(spark, spool)
    horizon_dt = int((last_t - 3 * DT_SECONDS) // DT_SECONDS)
    assert kept.agg(F.min("dt")).collect()[0][0] >= horizon_dt

    # surviving slice agrees with the batch engine over the same input
    batch = compile_commit_operation(
        text, spark.read.parquet(str(src) + "/f*"), order_cols=["start"]
    ).withColumn(
        "dt", F.floor(F.col("start") / F.lit(float(DT_SECONDS))).cast("long")
    ).filter(F.col("dt") >= horizon_dt)
    exp = sorted(tuple(r) for r in batch.select("k", "total", "n").collect())
    got = sorted(tuple(r) for r in kept.select("k", "total", "n").collect())
    assert got == exp and len(got) > 0


def test_alert_pipeline_streaming_capstone(spark, tmp_path):
    """FULL ALERTING CHAIN, always-on: a declarative threshold alert
    (AlertSpec) transpiles to the filtered→ok→alert RaQL program
    (src/CodeGen_Alert2RaQL.ml), deploys with every function as its
    own streaming query (deploy_program_streaming), the alert
    function's NOTIFY clause feeds the notification frame
    (program_notifications), and notify_sink drives the Alerter FSM —
    incident opens on the firing transition and closes on recovery,
    end-to-end from a declarative spec to an incident journal."""
    from pyspark.sql import functions as F

    from ramen_spark.alerts import AlertSpec, compile_alert
    from ramen_spark.runner import deploy_program_streaming
    from ramen_spark.streaming.alerter import Alerter, Contact
    from ramen_spark.streaming.sinks import notify_sink, program_notifications

    # host h1: fire (120, 130) → recover (30, below the 50 floor) →
    # fire again (140); h2 stays healthy throughout
    vals = {"h1": [20.0, 120.0, 130.0, 30.0, 140.0],
            "h2": [10.0, 20.0, 10.0, 20.0, 10.0]}
    rows = []
    for i in range(5):
        for h, vs in vals.items():
            rows.append((h, float(i), float(i) + 1.0, vs[i]))
    ev = spark.createDataFrame(
        rows, "host string, start double, stop double, value double"
    )
    src = tmp_path / "ev"
    ev.coalesce(1).write.parquet(str(src))

    spec = AlertSpec(
        table="ev", column="value", threshold=100.0, hysteresis=-50.0,
        group_by=["host"], id="hi_value",
    )
    prog, _text = compile_alert(
        spec,
        {"host": "string", "start": "float", "stop": "float",
         "value": "float"},
    )

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    deployed = deploy_program_streaming(
        spark, prog, str(tmp_path / "work"), {"ev": stream}
    )
    try:
        for name in prog._topo_order():
            q = deployed[name][1]
            if q is not None:
                q.processAllAvailable()
        alert_stream, _, alert_spool = deployed["alert"]
        out = (
            spark.readStream.schema(alert_stream.schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(alert_spool)
        )
        notifs = program_notifications(prog.functions["alert"].op, out)
        assert notifs is not None

        alerter = Alerter({"ops": [Contact("log")]}, debounce_delay=0)

        def deliver(name, params):
            alerter.notify(
                float(params["start"]),
                name,
                firing=params["firing"] == "true",
            )

        nq = notify_sink(
            notifs, deliver, checkpoint=str(tmp_path / "nckpt")
        )
        try:
            nq.processAllAvailable()
        finally:
            nq.stop()
    finally:
        for _, q, _ in deployed.values():
            if q is not None:
                q.stop()

    alerter.advance(100.0)
    # h1's firing transitions: open at t=1, close at t=3, reopen at t=4
    incs = [i for i in alerter.incidents.values() if "h1" in i.name]
    assert len(incs) >= 1
    journal = " | ".join(e for i_ in incs for _, e in i_.journal)
    # fire → recover → refire, then delivery
    assert journal.count("Notified") >= 2
    assert "Stop Notification" in journal
    assert "Sent 1st message" in journal
    # h2 never fired: no incident carries its name
    assert not any("h2" in i.name for i in alerter.incidents.values())


def test_raql_commit_streaming_kmv_distinct(spark, events_stream):
    """KMV DISTINCT in the always-on fold (round-10): the streaming
    engine's per-group bounded min-k state must survive the pickle
    state round-trip across micro-batches and emit the batch fold's
    estimates exactly (saturated at k=16)."""
    from ramen_spark.plans.raql import (
        compile_commit_operation,
        compile_commit_streaming,
    )

    stream, batch = events_stream
    text = (
        "select event_type, kmv 16 distinct user_id as au, count 1 as n "
        "group by event_type commit and keep all after true"
    )
    schema = "event_type string, au long, n long"
    sel = ["event_id", "event_type", "user_id"]
    s_out = run_to_memory(
        compile_commit_streaming(
            text, stream.select(*sel), output_schema=schema,
            order_cols=["event_id"],
        ),
        "raql_kmv_stream",
    )
    got = sorted((r["event_type"], r["au"], r["n"]) for r in s_out.collect())
    b_out = compile_commit_operation(
        text, batch.select(*sel), output_schema=schema,
        order_cols=["event_id"],
    )
    exp = sorted((r["event_type"], r["au"], r["n"]) for r in b_out.collect())
    assert got == exp and len(got) > 0
    # and the final running estimate equals the Catalyst batch operator
    from ramen_spark.operators.sketch import kmv_distinct

    finals = {}
    for et, au, n in got:
        if et not in finals or n > finals[et][1]:
            finals[et] = (au, n)
    direct = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(batch, ["event_type"], "user_id", 16).collect()
    }
    assert {k: v[0] for k, v in finals.items()} == direct
