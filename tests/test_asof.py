"""Unit tests for the as-of join operator (operators/asof.py).

Covers inclusive vs strict matching, rows before any right match,
payload carry across multiple left rows, and the single-shuffle plan
shape (the union trick must not introduce a range probe or a second
exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ramen_spark.operators.asof import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [
            ("a", 1.0, "l1"),
            ("a", 5.0, "l2"),
            ("a", 10.0, "l3"),
            ("b", 3.0, "l4"),
        ],
        "k string, t double, lbl string",
    )
    right = spark.createDataFrame(
        [
            ("a", 2.0, 20.0),
            ("a", 5.0, 50.0),
            ("a", 9.0, 90.0),
            ("c", 1.0, 99.0),
        ],
        "k string, rt double, payload double",
    )
    return left, right


def test_inclusive_match(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["payload"])
    got = {r["lbl"]: r["payload"] for r in out.collect()}
    # l1@t=1: no right <= 1 → NULL; l2@t=5: right@5 matches (inclusive);
    # l3@t=10: right@9; l4 key b: no right rows at all.
    assert got == {"l1": None, "l2": 50.0, "l3": 90.0, "l4": None}


def test_strict_match(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["payload"], strict=True)
    got = {r["lbl"]: r["payload"] for r in out.collect()}
    # strict: l2@t=5 must NOT see right@5, falls back to right@2.
    assert got == {"l1": None, "l2": 20.0, "l3": 90.0, "l4": None}


def test_left_row_count_and_columns_preserved(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["payload"])
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)
    assert "payload" in out.columns


def test_payload_collision_rejected(spark):
    left, right = _fixture(spark)
    bad_right = right.withColumnRenamed("payload", "lbl")
    try:
        asof_join(left, bad_right, ["k"], "t", "rt", ["lbl"])
    except ValueError:
        return
    raise AssertionError("expected ValueError on colliding payload column")


def test_single_shuffle_plan(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["payload"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the window; no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in plan


def test_null_payload_field_survives(spark):
    """A legitimately-NULL field in the latest right row must NOT be
    papered over by an older non-NULL value — all payload fields come
    from the same (latest) right row (struct carry, ADVICE r1)."""
    left = spark.createDataFrame([(1, 10.0)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 1.0, 5.0, "old"), (1, 2.0, None, "new")],
        "k int, rt double, a double, b string",
    )
    row = asof_join(left, right, ["k"], "t", "rt", ["a", "b"]).collect()[0]
    assert row["b"] == "new"
    assert row["a"] is None  # latest row's real NULL, not the stale 5.0
