"""NOTIFY sink pipeline (template expansion, delivery, incident
debounce) and the SORT LAST bounded reorder buffer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.catalog import load_table
from ramen_spark.operators.sortbuf import sort_last
from ramen_spark.streaming.sinks import (
    build_notifications,
    debounce_incidents,
    notify_sink,
)
from tests.conftest import SF_SMALL


def test_notification_template_expansion(spark):
    ev = load_table(spark, SF_SMALL, "events")
    notifs = build_notifications(
        ev,
        "high value on ${event_type}",
        when=F.col("value") > 190,
        param_cols=["event_id", "value"],
    )
    rows = notifs.collect()
    exp = ev.filter(F.col("value") > 190).count()
    assert len(rows) == exp
    assert all(r["notification"].startswith("high value on ") for r in rows)
    assert all("event_id" in r["parameters"] and "value" in r["parameters"] for r in rows)


def test_notification_no_template_refs(spark):
    ev = load_table(spark, SF_SMALL, "events")
    notifs = build_notifications(ev.limit(3), "static alert")
    assert [r["notification"] for r in notifs.collect()] == ["static alert"] * 3


def test_notify_sink_batch_delivery(spark):
    ev = load_table(spark, SF_SMALL, "events")
    notifs = build_notifications(
        ev, "alert ${event_type}", when=F.col("value") > 195, param_cols=["event_id"]
    )
    got: list[tuple[str, dict]] = []
    ret = notify_sink(notifs, lambda name, params: got.append((name, params)))
    assert ret is None  # batch mode delivers inline
    assert len(got) == notifs.count()
    assert all(n.startswith("alert ") for n, _ in got)


def test_debounce_incidents(spark):
    rows = [
        ("a", 0.0), ("a", 10.0), ("a", 20.0),    # one incident (gaps <= 30)
        ("a", 100.0),                            # new incident (gap 80 > 30)
        ("b", 5.0),                              # separate name
    ]
    df = spark.createDataFrame(rows, "notification string, t double")
    out = {(r["notification"], r["first_seen"]): r for r in
           debounce_incidents(df, "t", 30.0).collect()}
    assert len(out) == 3
    assert out[("a", 0.0)]["n_firings"] == 3 and out[("a", 0.0)]["last_seen"] == 20.0
    assert out[("a", 100.0)]["n_firings"] == 1
    assert out[("b", 5.0)]["n_firings"] == 1


def test_sort_last_pop_order(spark):
    # single partition → exact reference semantics: buffer 3, pop
    # smallest when full, drain ascending at end-of-stream
    data = [(5,), (1,), (4,), (2,), (8,), (3,)]
    df = spark.createDataFrame(data, "k int").coalesce(1)
    got = [r["k"] for r in sort_last(df, 3, "k").collect()]
    # inserts: 5,1,4 (full) -> pop 1; +2 -> pop 2; +8 -> pop 4; +3 -> pop 3?
    # buffer after pops: {5,8}+3 ... drain ascending: 3,5,8
    assert got == [1, 2, 4, 3, 5, 8]
    assert sorted(got) == [1, 2, 3, 4, 5, 8]


def test_sort_last_repairs_bounded_disorder(spark):
    # shuffled-by-at-most-3 stream is fully repaired by a buffer of 4
    import random

    rng = random.Random(7)
    seq = list(range(100))
    # bounded shuffle: swap within distance 2
    for i in range(0, 98, 2):
        if rng.random() < 0.5:
            seq[i], seq[i + 1] = seq[i + 1], seq[i]
    df = spark.createDataFrame([(x,) for x in seq], "k int").coalesce(1)
    got = [r["k"] for r in sort_last(df, 4, "k").collect()]
    assert got == sorted(seq)


def test_sort_last_keeps_schema_and_rows(spark):
    ev = load_table(spark, SF_SMALL, "events").limit(500).coalesce(1)
    out = sort_last(ev, 16, "event_id")
    assert out.schema == ev.schema
    assert out.count() == 500


def test_sort_last_rejects_bad_n(spark):
    ev = load_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError):
        sort_last(ev, 0, "event_id")


def test_sort_last_or_until_fires_early(spark):
    """UNTIL pops before the buffer is full (RamenSortBuf pop-on-until,
    CodeGenLib_Skeletons.ml:911-917): with `sort.count >= 2` the
    buffer behaves like SORT LAST 2 despite n=100."""
    data = [(5,), (1,), (4,), (2,), (3,)]
    df = spark.createDataFrame(data, "k int").coalesce(1)
    until = lambda row, sv: sv["count"] >= 2  # noqa: E731
    got = [r["k"] for r in sort_last(df, 100, "k", until=until).collect()]
    # inserts: 5,1 → pop 1; +4 → pop 4? no: buffer {5,4} pops 4; +2 → pop 2;
    # +3 → pop 3; drain: 5
    assert got == [1, 4, 2, 3, 5]


def test_sort_last_until_sees_sort_first(spark):
    """The UNTIL condition reads sort.first (FIFO head, the reference's
    sort.* variables). Observed through emission order — the closure
    runs in the Python worker, so side effects aren't visible here.

    With `until first.k == 5`: 5 is popped immediately (it is its own
    FIFO head), producing the non-sorted prefix [5, 1, ...] that a
    plain n-buffer could never emit."""
    data = [(5,), (1,), (4,), (2,), (8,)]
    df = spark.createDataFrame(data, "k int").coalesce(1)
    until = lambda row, sv: sv["first"]["k"] == 5  # noqa: E731
    got = [r["k"] for r in sort_last(df, 3, "k", until=until).collect()]
    # 5: first=5 → pop 5 | 1,4: fill | 2: full → pop 1 | 8: full → pop 2
    # drain: 4, 8
    assert got == [5, 1, 2, 4, 8]


def test_sort_last_until_sees_smallest_greatest(spark):
    """UNTIL reading sort.greatest/sort.smallest: fire when the buffered
    spread reaches 6. Produces [3, 1, ...] — 3 pops before the later,
    smaller 1 arrives, proving the spread condition (not buffer size)
    triggered the pop."""
    data = [(5,), (9,), (3,), (4,), (1,)]
    df = spark.createDataFrame(data, "k int").coalesce(1)
    until = lambda row, sv: sv["greatest"]["k"] - sv["smallest"]["k"] >= 6  # noqa: E731
    got = [r["k"] for r in sort_last(df, 100, "k", until=until).collect()]
    # 5,9: spread 4 | +3: spread 6 → pop 3 | +4: {5,9,4} spread 5 |
    # +1: spread 8 → pop 1 | drain: 4, 5, 9
    assert got == [3, 1, 4, 5, 9]


def test_sort_last_multi_key(spark):
    """Multiple BY keys compare lexicographically; expressions allowed
    (sort.ramen uses BY -n, year)."""
    data = [(1, 10), (2, 10), (1, 5), (2, 5)]
    df = spark.createDataFrame(data, "a int, b int").coalesce(1)
    got = [(r["a"], r["b"]) for r in sort_last(df, 4, [F.col("a"), F.col("b")]).collect()]
    assert got == [(1, 5), (1, 10), (2, 5), (2, 10)]


def test_sort_last_raql_until_clause(spark):
    """Front-end: SORT LAST n OR UNTIL sort.count >= 2 BY k compiles
    and reorders the fold input."""
    from ramen_spark.plans.raql import compile_commit_operation

    rows = [(3, 30.0), (1, 10.0), (2, 20.0)]
    df = spark.createDataFrame(rows, "seq int, v double").coalesce(1)
    out = compile_commit_operation(
        "select last v as lv, count v as n "
        "sort last 100 or until sort.count >= 2 by seq "
        "commit after count v >= 3",
        df,
        output_schema="lv double, n long",
    )
    # emission order 1,2,3 → one window of 3 with last v = 30
    assert [r["lv"] for r in out.collect()] == [30.0]
