"""Alerter incident lifecycle (streaming.alerter) — e2e flows
mirroring the reference's tests/alerter/basic.test and retry.test
(run there against the live alerter daemon; here against the
deterministic event-time FSM with a log-list contact standing in for
the http/Ignore contact)."""

from __future__ import annotations

import pytest

from ramen_spark.streaming.alerter import Alerter, Contact, alerter_sink


def _events(journal):
    return [e for _, e in journal]


def test_basic_flow_debounced_message():
    """tests/alerter/basic.test: contact timeout=0, NOTIFY debounce=5
    at t=1 → incident 0 on test_team, journal 'Notified' immediately,
    'Sent 1st message via test_ctc' not before t=6."""
    sent = []
    a = Alerter(
        {"test_team": [Contact("test_ctc", via=lambda *args: sent.append(args))]}
    )
    a.notify(1.0, "test_team: alert", debounce=5)
    assert "0" in a.incidents
    assert a.incidents["0"].team == "test_team"
    assert _events(a.journal("0")) == ["Notified"]

    a.advance(5.9)  # debounce not elapsed: no message yet
    assert sent == []
    a.advance(6.1)
    assert _events(a.journal("0")) == [
        "Notified",
        "Sent 1st message via test_ctc",
    ]
    assert len(sent) == 1 and sent[0][2] is True  # is_start
    a.advance(100.0)  # timeout=0 → fire-and-forget, no resend
    assert len(sent) == 1


def test_retry_until_ack():
    """tests/alerter/retry.test: contact timeout=4, debounce=0 →
    'Sent 1st message' immediately, 'Sent 2nd message' ~4s later,
    then ack → 'Acknowledged test_ctc', no further resends."""
    sent = []
    a = Alerter(
        {"test_team": [
            Contact("test_ctc", via=lambda *args: sent.append(args), timeout=4)
        ]}
    )
    a.notify(1.0, "test_team: alert", debounce=0)
    a.advance(1.0)
    assert _events(a.journal("0")) == [
        "Notified",
        "Sent 1st message via test_ctc",
    ]
    a.advance(5.0)  # no ack within 4s → resend
    assert _events(a.journal("0"))[-1] == "Sent 2nd message via test_ctc"
    a.ack(6.0, "0", "test_ctc")
    assert _events(a.journal("0"))[-1] == "Acknowledged test_ctc"
    a.advance(60.0)  # acked → no more resends
    assert len(sent) == 2


def test_dedup_same_name_one_incident():
    """Multiple firings of one name contribute to ONE incident
    (deduplication, RamenAlerter.ml glossary)."""
    a = Alerter({"t": [Contact("c")]}, debounce_delay=5)
    a.notify(1.0, "t: alert")
    a.notify(2.0, "t: alert")
    a.notify(3.0, "t: other")
    assert len(a.incidents) == 2
    assert _events(a.journal("0")) == ["Notified", "Duplicate"]


def test_extinguish_sends_stop_and_reopens_fresh():
    """firing=false closes the incident: a started dialog sends the
    end-of-alert message; a later firing for the same name opens a
    NEW incident."""
    sent = []
    a = Alerter(
        {"t": [Contact("c", via=lambda *args: sent.append(args))]},
        debounce_delay=0,
    )
    a.notify(1.0, "t: alert")
    a.advance(1.0)  # start message out (StartSent)
    a.notify(5.0, "t: alert", firing=False)
    assert _events(a.journal("0"))[-1] == "Stop Notification"
    a.advance(5.0)
    assert _events(a.journal("0"))[-1] == "Sent 1st message via c"
    assert sent[-1][2] is False  # is_start=False: the stop message
    a.notify(9.0, "t: alert")
    assert len(a.incidents) == 2  # new incident, not the closed one


def test_extinguish_before_send_cancels():
    """A stop arriving within the debounce window cancels the unsent
    start message entirely (StartToBeSentThenStopped) — the debounce
    exists so flapping never reaches a human."""
    sent = []
    a = Alerter(
        {"t": [Contact("c", via=lambda *args: sent.append(args))]},
        debounce_delay=10,
    )
    a.notify(1.0, "t: flap")
    a.notify(2.0, "t: flap", firing=False)
    a.advance(60.0)
    assert sent == []


def test_team_longest_prefix_and_fallback():
    """find_in_charge: longest team-name prefix wins; unknown names
    fall back to the default team (RamenAlerter.ml:182-217)."""
    a = Alerter(
        {"ops": [Contact("c1")], "ops/db": [Contact("c2")]},
        default_team="ops",
    )
    a.notify(1.0, "ops/db: replication lag")
    a.notify(2.0, "web: 500s")
    assert a.incidents["0"].team == "ops/db"
    assert a.incidents["1"].team == "ops"


def test_alerter_sink_streaming_e2e(spark, tmp_path):
    """NOTIFY stream → foreachBatch → incident FSM: the full pipeline
    from a notification frame to journaled incidents, with the
    log-list contact standing in for the http contact."""
    rows = [
        (1.0, "t: cpu high", True),
        (2.0, "t: cpu high", True),  # dedup into incident 0
        (3.0, "t: disk full", True),
        (20.0, "t: cpu high", False),  # extinguish
    ]
    src = tmp_path / "notifs"
    spark.createDataFrame(
        rows, "sent_time double, notification string, firing boolean"
    ).coalesce(1).write.parquet(str(src))

    sent = []
    a = Alerter(
        {"t": [Contact("c", via=lambda *args: sent.append(args))]},
        debounce_delay=5,
    )
    stream = spark.readStream.schema(
        "sent_time double, notification string, firing boolean"
    ).parquet(str(src))
    q = alerter_sink(stream, a)
    q.processAllAvailable()
    q.stop()

    assert len(a.incidents) == 2
    # cpu-high: notified at 1, dup at 2, start message at 6 (debounce
    # 5), stop notification at 20 (its stop message is debounced to 25
    # — past the last event, so still pending)
    ev = _events(a.journal("0"))
    assert ev == [
        "Notified",
        "Duplicate",
        "Sent 1st message via c",
        "Stop Notification",
    ]
    assert len(sent) == 2  # one start message per incident
    assert _events(a.journal("1")) == ["Notified", "Sent 1st message via c"]
    # batch replay produces the identical journals
    b = Alerter({"t": [Contact("c")]}, debounce_delay=5)
    alerter_sink(spark.read.parquet(str(src)), b)
    assert _events(b.journal("0")) == ev


def test_fpr_budget_suppresses_uncertain_incidents():
    """pass_fpr (RamenAlerter.ml:379-425): a burst of low-certainty
    notifications is throttled once the expected false-positive count
    exceeds the budget; certainty-1 notifications always pass."""
    a = Alerter(
        {"t": [Contact("c")]}, debounce_delay=0, max_fpr=1.0 / 100.0
    )
    created = 0
    for i in range(20):
        a.notify(1.0 + i * 0.1, f"t: flaky {i}", certainty=0.3)
    created = len(a.incidents)
    assert 1 <= created < 20  # first passes, the burst is throttled
    # a certain incident still passes
    a.notify(5.0, "t: real", certainty=1.0)
    assert len(a.incidents) == created + 1


def test_notification_timeout_extinguishes():
    """A firing notification with timeout=10: no re-firing within 10 s
    ends the incident (Stop Timeout) and sends the stop message; a
    later firing opens a NEW incident."""
    sent = []
    a = Alerter(
        {"t": [Contact("c", via=lambda *args: sent.append(args))]},
        debounce_delay=0,
    )
    a.notify(1.0, "t: alert", timeout=10.0)
    a.advance(1.0)  # start message
    a.advance(20.0)  # timeout probe at t=11 fires
    ev = _events(a.journal("0"))
    assert "Stop Timeout" in ev
    assert ev[-1] == "Sent 1st message via c" and sent[-1][2] is False
    a.notify(30.0, "t: alert")
    assert len(a.incidents) == 2


def test_refiring_defers_timeout():
    """Re-firing within the horizon keeps the incident alive."""
    a = Alerter({"t": [Contact("c")]}, debounce_delay=0)
    a.notify(1.0, "t: alert", timeout=10.0)
    a.notify(8.0, "t: alert", timeout=10.0)  # refresh
    a.advance(12.0)  # first probe at 11: last_firing=8 → keep
    assert "Stop Timeout" not in _events(a.journal("0"))
    a.advance(19.0)  # second probe at 18: 18-8 >= 10 → extinguish
    assert "Stop Timeout" in _events(a.journal("0"))


def test_max_incident_age_cancels():
    """Dialog work scheduled for an incident older than
    max_incident_age cancels instead of sending."""
    sent = []
    a = Alerter(
        {"t": [Contact("c", via=lambda *args: sent.append(args))]},
        debounce_delay=100.0,  # message scheduled at t=101
        max_incident_age=50.0,
    )
    a.notify(1.0, "t: alert")
    a.advance(200.0)
    assert sent == []
    assert _events(a.journal("0"))[-1] == "Cancelled (too old)"


def test_full_monitoring_loop(spark):
    """The reference's main use case end-to-end: a metric stream runs
    through a TRANSPILED alert program (alerts.py), its firing
    transitions become notifications, and the alerter FSM turns them
    into incidents with start/stop messages."""
    from pyspark.sql import functions as F

    from ramen_spark.alerts import AlertSpec, compile_alert

    rows = [
        (float(i), float(i) + 1.0, "eth0", v)
        for i, v in enumerate([10.0, 20.0, 400.0, 420.0, 30.0, 20.0])
    ]
    df = spark.createDataFrame(
        rows, "start double, stop double, iface string, bytes double"
    )
    spec = AlertSpec(
        table="t", column="bytes", threshold=300.0, id="high",
        group_by=["iface"],
    )
    cols = {"start": "float", "stop": "float", "iface": "string",
            "bytes": "float"}
    prog, _ = compile_alert(spec, cols)
    alert_out = prog.materialize(
        spark, externals={"t": df}, register_views=False
    )["alert"]

    # the NOTIFY wiring: one notification per transition, named per
    # group, firing flag carried through
    notifs = alert_out.select(
        F.col("start").alias("sent_time"),
        F.concat(F.lit("t: high on "), F.col("iface")).alias("notification"),
        F.col("firing"),
    )
    sent = []
    a = Alerter(
        {"t": [Contact("c", via=lambda *args: sent.append(args))]},
        debounce_delay=0.5,
    )
    alerter_sink(notifs.coalesce(1).sortWithinPartitions("sent_time"), a)
    a.advance(100.0)

    assert len(a.incidents) == 1
    ev = _events(a.journal("0"))
    # fired at t=2, start message after debounce, recovered at t=4,
    # stop message after its debounce
    assert ev[0] == "Notified"
    assert "Stop Notification" in ev
    assert [s[2] for s in sent] == [True, False]  # start then stop


def test_exec_contact_end_to_end(tmp_path):
    """Exec contact kind (RamenAlerter.ml:568-581 execute_cmd): the
    command template expands the delivery dict (|shell escaping) and
    runs through the shell — here appending to a file so the delivery
    is observable end-to-end."""
    from ramen_spark.streaming.alerter import exec_contact

    log = tmp_path / "alerts.log"
    c = exec_contact(
        "exec_ctc",
        'echo "${name|shell} firing=${firing}" >> ' + str(log),
    )
    a = Alerter({"t": [c]}, debounce_delay=0)
    a.notify(1.0, "t: cpu high", parameters={"desc": "too hot"})
    a.advance(2.0)
    assert log.read_text().strip() == "t: cpu high firing=true"
    a.notify(3.0, "t: cpu high", firing=False)
    a.advance(10.0)
    assert log.read_text().strip().splitlines()[-1] == "t: cpu high firing=false"


def test_sqlite_contact_lazy_create_and_insert(tmp_path):
    """Sqlite contact kind (RamenAlerter.ml:593-615 sqllite_insert):
    first insert fails (no table) → CREATE runs → insert retried; the
    |sql filter doubles quotes."""
    import sqlite3

    from ramen_spark.streaming.alerter import sqlite_contact

    db = str(tmp_path / "alerts.db")
    c = sqlite_contact(
        "sql_ctc",
        file=db,
        insert="INSERT INTO alerts VALUES ('${name|sql}', ${certainty})",
        create="CREATE TABLE alerts (name TEXT, certainty REAL)",
    )
    a = Alerter({"t": [c]}, debounce_delay=0)
    a.notify(1.0, "t: o'brien down", certainty=0.75)
    a.advance(2.0)
    rows = sqlite3.connect(db).execute("SELECT * FROM alerts").fetchall()
    assert rows == [("t: o'brien down", 0.75)]


def test_exec_contact_failure_feeds_retry(tmp_path):
    """A failing exec (non-zero exit) raises out of the delivery —
    with a contact timeout the scheduler retries, mirroring the
    reference's failed-send accounting."""
    from ramen_spark.streaming.alerter import exec_contact

    calls = []

    def runner(cmd):
        calls.append(cmd)

    c = exec_contact("e", "true ${name}", timeout=10.0, _runner=runner)
    a = Alerter({"t": [c]}, debounce_delay=0)
    a.notify(1.0, "t: x")
    a.advance(2.0)
    assert len(calls) == 1
    a.advance(13.0)  # no ack → resent after the contact timeout
    assert len(calls) == 2
    a.ack(13.5, "0", "e")
    a.advance(30.0)
    assert len(calls) == 2


def test_kafka_contact_env_gated():
    from ramen_spark.streaming.alerter import kafka_contact

    with pytest.raises(NotImplementedError, match="Kafka client"):
        kafka_contact("k", {}, "alerts", 0, "${name}")


def test_outage_grouping():
    """RamenAlerter.ml:41-43: every incident is its own outage until
    manually grouped; grouping documents a shared cause and leaves
    delivery untouched."""
    a = Alerter({"t": [Contact("c")]}, debounce_delay=0)
    a.notify(1.0, "t: a")
    a.notify(2.0, "t: b")
    a.notify(3.0, "t: c")
    assert a.outages() == {"0": ["0"], "1": ["1"], "2": ["2"]}
    oid = a.group_outage(["0", "1"])
    assert oid == "0"
    assert a.outages() == {"0": ["0", "1"], "2": ["2"]}
