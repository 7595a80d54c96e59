"""RaQL front-end: expression corpus evaluated from RaQL TEXT (the
same documented examples as test_scalar_semantics, now through the
parser), plus SELECT-operation compilation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ramen_spark.catalog import load_table
from ramen_spark.plans.raql import compile_expr, compile_operation, parse_operation
from tests.conftest import SF_SMALL

# (raql text, expected) — doc/raql/expr.ml examples through the parser
EXPR_CASES = [
    ("27 + 15", 42),
    ("1.5 + 1", 2.5),
    ("6 * 7", 42),
    ("84/2", 42.0),
    ("0/0", None),
    ("10//3", 3),
    ("3 % 2", 1),
    ("-3 % 2", -1),
    ("2 ^ 3", 8.0),
    ("2 ^ 3 ^ 2", 512.0),  # right-assoc
    ("TRUNCATE(153.6, 10)", 150.0),
    ("RELDIFF(10, 9)", 0.1),
    ("ABS(-1.2)", 1.2),
    ("MIN(1, 2, 3)", 1),
    ("MAX(1, 2, 3)", 3),
    ("COALESCE(NULL, 1)", 1),
    ("NOT TRUE", False),
    ("NOT (0 > 1)", True),
    ("FALSE OR TRUE", True),
    ("TRUE AND FALSE", False),
    ("1 >= 0", True),
    ('"foo" = "FOO"', False),
    ('"foo" || "bar"', "foobar"),
    ('"foobar" LIKE "foo%"', True),
    ('"foobar" NOT LIKE "foo"', True),
    ('"foobar" STARTS WITH "foo"', True),
    ('"foobar" ENDS WITH "bar"', True),
    ("NULL IS NULL", True),
    ("NULL IS NOT NULL", False),
    ("LENGTH \"foo\"", 3),
    ("LOWER \"Foo\"", "foo"),
    ("SQRT 16", 4.0),
    ("SQRT(-1)", None),
    ("LOG 1", 0.0),
    ("EXP 0", 1.0),
    ("SQ 4", 16),
    ("CEIL 41.2", 42),
    ("FLOOR(-42.7)", -43),
    ("IF 1 > 0 THEN 10 ELSE 20", 10),
    ("CASE WHEN 1 > 2 THEN 1 WHEN 2 > 1 THEN 2 ELSE 3 END", 2),
    ("90 PERCENTILE [1; 2; 3; 4; 5; 6; 7; 8; 9; 10]", 9),
    ("2 IN (1, 2, 3)", True),
    ("5 NOT IN (1, 2, 3)", True),
    ("[10; 20; 30][1]", 20),  # 0-based indexing
    ("1k + 1", 1001),
    ("1Ki", 1024),
    ("0x10", 16),
    ("2 * 3 + 4", 10),  # precedence
    ("2 + 3 * 4", 14),
    ("(2 + 3) * 4", 20),
]


@pytest.mark.parametrize("text,expected", EXPR_CASES, ids=[c[0][:30] for c in EXPR_CASES])
def test_expr_through_parser(spark, text, expected):
    got = spark.range(1).select(compile_expr(text).alias("v")).collect()[0]["v"]
    if expected is None:
        assert got is None
    elif isinstance(expected, float):
        assert got == pytest.approx(expected, rel=1e-9)
    else:
        assert got == expected


def test_param_reference(spark):
    got = (
        spark.range(1)
        .select(compile_expr("param.threshold * 2", {"threshold": 21}).alias("v"))
        .collect()[0]["v"]
    )
    assert got == 42


def test_operation_parse_shape():
    op = parse_operation(
        "SELECT MIN x AS mn, MAX x AS mx FROM tbl WHERE x > 0 "
        "GROUP BY k COMMIT AFTER SUM 1 >= 10"
    )
    assert [f.alias for f in op.fields] == ["mn", "mx"]
    assert op.sources == ["tbl"] and op.where is not None
    assert len(op.group_by) == 1 and op.commit_after is not None


def test_compile_simple_projection(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation(
        'SELECT event_id, value * 2 AS v2 WHERE event_type = "click"', ev
    )
    rows = out.collect()
    exp = ev.filter(F.col("event_type") == "click").count()
    assert len(rows) == exp
    assert set(out.columns) == {"event_id", "v2"}


def test_compile_group_aggregate(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation(
        "SELECT event_type, COUNT(1) AS n, SUM value AS total, "
        "MIN value AS mn, MAX value AS mx GROUP BY event_type",
        ev,
    )
    got = {r["event_type"]: (r["n"], round(r["total"], 6)) for r in out.collect()}
    exp_df = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("t")
    )
    exp = {r["event_type"]: (r["n"], r["t"]) for r in exp_df.collect()}
    assert {k: (v[0], round(v[1], 6)) for k, v in got.items()} == exp


def test_compile_global_group(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation("SELECT COUNT(1) AS n, AVG value AS m", ev).collect()
    assert out[0]["n"] == ev.count()


def test_compile_tumbling_shape(spark):
    """The reference's benchmark query shape, from RaQL text
    (site/blog/2019-02.php) — time bucket in GROUP BY, per-minute
    aggregate; batch ignores the already-satisfied COMMIT clause."""
    ev = load_table(spark, SF_SMALL, "events").withColumn(
        "t_us", F.unix_micros("ts")
    )
    out = compile_operation(
        "SELECT event_type, t_us // 60000000 AS minute, SUM value AS s, COUNT(1) AS n "
        "GROUP BY event_type, t_us // 60000000 "
        "COMMIT AFTER in.t_us > out.minute * 60000000 + 120000000",
        ev,
    )
    exp = ev.groupBy("event_type", F.expr("t_us div 60000000")).count().count()
    assert out.count() == exp
    assert set(out.columns) == {"event_type", "minute", "s", "n"}


def test_private_fields_dropped(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation("SELECT value * 2 AS _hidden, event_id", ev)
    assert out.columns == ["event_id"]


def test_unknown_function_rejected():
    with pytest.raises(ValueError, match="unknown RaQL function"):
        compile_expr("FROBNICATE(1)")


# ---------------------------------------------------------------------------
# star expansion, out-field chaining, multi-parent FROM, programs
# ---------------------------------------------------------------------------


def test_star_expansion(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation("SELECT * FROM events", ev)
    assert out.columns == ev.columns
    assert out.count() == ev.count()


def test_star_minus_and_named(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation("SELECT * - props - ts, value * 2 AS dbl FROM events", ev)
    assert "props" not in out.columns and "ts" not in out.columns
    # value still present (named fields excluded only when re-aliased)
    assert "dbl" in out.columns and "value" in out.columns


def test_out_field_reference_chain(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = compile_operation(
        "SELECT value + 1 AS v1, out.v1 * 10 AS v10, v10 + v1 AS v11 FROM events", ev
    )
    row = out.select("v1", "v10", "v11").first()
    assert row["v10"] == row["v1"] * 10
    assert row["v11"] == row["v10"] + row["v1"]


def test_program_two_stage_pipeline(spark):
    from ramen_spark.plans.raql import compile_program

    ev = load_table(spark, SF_SMALL, "events")
    prog = compile_program(
        """
        PARAMETERS thresh DEFAULTS TO 0;
        DEFINE _flt AS SELECT event_type, value FROM events WHERE value > param.thresh;
        DEFINE per_type AS SELECT event_type, SUM value AS s, COUNT(1) AS n
          FROM _flt GROUP BY event_type
        """,
        name="p",
    )
    dfs = prog.materialize(spark, externals={"events": ev}, register_views=False)
    assert set(dfs) == {"_flt", "per_type"}
    exp = (
        ev.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    got = {r["event_type"]: r["n"] for r in dfs["per_type"].collect()}
    want = {r["event_type"]: r["n"] for r in exp.collect()}
    assert got == want


def test_program_param_override(spark):
    from ramen_spark.plans.raql import compile_program

    ev = load_table(spark, SF_SMALL, "events")
    prog = compile_program(
        "DEFINE f AS SELECT COUNT(1) AS n FROM events WHERE value > param.lo;"
        "PARAMETERS lo DEFAULTS TO 0",
        name="p2",
    )
    # no COMMIT clause → default commit cond `true`: the running COUNT
    # emits per input row (RamenOperation.ml:857,1335); the final total
    # is the max
    n_all = (
        prog.materialize(spark, externals={"events": ev}, register_views=False)
        ["f"].agg(F.max("n").alias("n")).first()["n"]
    )
    n_hi = (
        prog.materialize(
            spark, params={"lo": 150}, externals={"events": ev}, register_views=False
        )["f"].agg(F.max("n").alias("n")).first()["n"]
    )
    assert n_hi < n_all


def test_program_multi_parent_union(spark):
    from ramen_spark.plans.raql import compile_program

    ev = load_table(spark, SF_SMALL, "events")
    a = ev.filter(F.col("value") < 50)
    b = ev.filter(F.col("value") >= 50)
    prog = compile_program(
        "DEFINE merged AS SELECT COUNT(1) AS n FROM a, b", name="p3"
    )
    got = prog.materialize(spark, externals={"a": a, "b": b}, register_views=False)
    # running COUNT (default commit `true`): final total = max
    assert got["merged"].agg(F.max("n").alias("n")).first()["n"] == ev.count()


# ------------------------------------------------- general COMMIT front-end


def test_commit_clause_rejected_by_fast_path(spark):
    from ramen_spark.plans.raql import compile_operation

    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(NotImplementedError, match="compile_commit_operation"):
        compile_operation("select sum v as s commit after sum v >= 3", df)


def test_commit_after_count_batches(spark):
    """COMMIT AFTER count >= 3 AND FLUSH: every 3rd row per key emits
    the partial sum and the group resets — the RaQL count-window."""
    from ramen_spark.plans.raql import compile_commit_operation

    rows = [
        (k, i, float(10 * i + ki))
        for ki, k in enumerate(("a", "b"))
        for i in range(7)
    ]
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    out = compile_commit_operation(
        "select k, sum v as s, count v as n from x group by k commit after count v >= 3",
        df.withColumn("ts", F.col("seq")),
        output_schema="k string, s double, n long",
    )
    got = {(r["k"], r["n"], r["s"]) for r in out.collect()}
    # per key: rows v = 10i+k for i in 0..6; windows [0,1,2] and [3,4,5]
    want = set()
    for ki, k in ((0, "a"), (1, "b")):
        vs = [10 * i + ki for i in range(7)]
        want.add((k, 3, float(sum(vs[0:3]))))
        want.add((k, 3, float(sum(vs[3:6]))))
    assert got == want  # trailing partial group (i=6) never commits


def test_commit_before_reseeds_group(spark):
    """COMMIT BEFORE emits the PRE-update aggregate then restarts the
    group seeded with the current row (CodeGenLib_Skeletons.ml:620-646)."""
    from ramen_spark.plans.raql import compile_commit_operation

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)], "seq int, v double"
    )
    out = compile_commit_operation(
        "select sum v as s commit before sum v + v > 4",
        df.withColumn("ts", F.col("seq")),
        output_schema="s double",
    )
    # fold: s=1, s=3; row v=3 → cand pre-update s=3, cond 3+3>4 → emit 3,
    # reseed with 3; row v=4: cond 3+4>4 → emit 3 (pre-update), reseed 4
    assert [r["s"] for r in out.orderBy("s").collect()] == [3.0, 3.0]


def test_commit_keep_retains_state(spark):
    """KEEP: group state survives the commit → running (cumulative)
    emission instead of windowed."""
    from ramen_spark.plans.raql import compile_commit_operation

    df = spark.createDataFrame([(i, 1.0) for i in range(4)], "seq int, v double")
    out = compile_commit_operation(
        "select sum v as s commit keep after true",
        df.withColumn("ts", F.col("seq")),
        output_schema="s double",
    )
    assert sorted(r["s"] for r in out.collect()) == [1.0, 2.0, 3.0, 4.0]


def test_commit_previous_namespace(spark):
    """previous.s = the group's last committed output: emit only when
    the sum has grown by ≥ 2 since the last commit."""
    from ramen_spark.plans.raql import compile_commit_operation

    df = spark.createDataFrame([(i, 1.0) for i in range(6)], "seq int, v double")
    out = compile_commit_operation(
        "select sum v as s commit keep after coalesce(previous.s, 0) + 2 <= sum v",
        df.withColumn("ts", F.col("seq")),
        output_schema="s double",
    )
    assert sorted(r["s"] for r in out.collect()) == [2.0, 4.0, 6.0]


def test_parse_sort_last_and_notify():
    from ramen_spark.plans.raql import Field, parse_operation

    op = parse_operation(
        'select v, sum v as s from x sort last 10 by ts, seq '
        'group by k commit after sum v >= 5 notify "high ${s}"'
    )
    n, by, until = op.sort_last
    assert n == 10 and [f.path for f in by] == ["ts", "seq"]
    assert until is None
    assert op.notify == "high ${s}"


def test_parse_sort_last_or_until():
    from ramen_spark.plans.raql import Binop, parse_operation

    op = parse_operation(
        "select v from x sort last 10 or until sort.count >= 3 by ts"
    )
    n, by, until = op.sort_last
    assert n == 10 and len(by) == 1
    assert isinstance(until, Binop) and until.op == ">="


def test_sort_last_drives_commit_fold_order(spark):
    """SORT LAST … BY seq: the commit fold consumes rows in seq order
    even when the frame arrives shuffled."""
    from ramen_spark.plans.raql import compile_commit_operation

    rows = [(3, 30.0), (1, 10.0), (4, 40.0), (2, 20.0)]
    df = spark.createDataFrame(rows, "seq int, v double")
    out = compile_commit_operation(
        "select last v as lv, count v as n sort last 4 by seq "
        "commit after count v >= 2",
        df,
        output_schema="lv double, n long",
    )
    # seq order 1,2,3,4 → windows (10,20) and (30,40): last v = 20, 40
    assert sorted(r["lv"] for r in out.collect()) == [20.0, 40.0]


def test_notify_template_builds_sink_rows(spark):
    """NOTIFY name template feeds the notification builder
    (streaming/sinks.py) with ${field} expansion."""
    from ramen_spark.plans.raql import parse_operation
    from ramen_spark.streaming.sinks import build_notifications

    op = parse_operation('select user_id, v notify "hot user ${user_id}"')
    df = spark.createDataFrame([(7, 1.0), (9, 2.0)], "user_id int, v double")
    notes = build_notifications(df, op.notify)
    got = sorted(r["notification"] for r in notes.collect())
    assert got == ["hot user 7", "hot user 9"]


def test_alias_shadowing_preserves_input_namespace(spark):
    """`in.x` (and bare refs to input names) must keep reading the
    INPUT tuple even when a select alias shadows the input column
    (reference: in. always denotes the input, src/RamenExpr.ml)."""
    df = spark.createDataFrame([(10.0,), (20.0,)], ["value"])
    out = compile_operation(
        "SELECT value*2 AS value, in.value AS orig, value + 1 AS bare_plus FROM x",
        df,
    )
    rows = sorted(out.collect())
    assert [(r["value"], r["orig"], r["bare_plus"]) for r in rows] == [
        (20.0, 10.0, 11.0),
        (40.0, 20.0, 21.0),
    ]
    # out.-qualified chaining still reads the new value
    out2 = compile_operation(
        "SELECT value*2 AS value, out.value + 1 AS chained FROM x", df
    )
    assert sorted(r["chained"] for r in out2.collect()) == [21.0, 41.0]


def test_parse_event_clause_forms():
    """EVENT clause grammar (src/RamenOperation.ml:1230-1248): scale,
    duration units, STOPS AT, bare DURATION, and the STARTS kw form."""
    from ramen_spark.plans.raql import parse_operation

    op = parse_operation(
        "select n from x event starts at n*10 with duration 0.1s"
    )
    assert op.event_time == (("n", 10.0), ("const", 0.1))

    op = parse_operation(
        "select first, last from x event starts at first and stops at last"
    )
    assert op.event_time == (("first", 1.0), ("stop", "last", 1.0))

    op = parse_operation(
        "select t, d from x event starting at t*0.001 and duration d*60"
    )
    assert op.event_time == (("t", 0.001), ("field", "d", 60.0))

    op = parse_operation("select t from x event starting at t duration 2 minutes")
    assert op.event_time == (("t", 1.0), ("const", 120.0))

    # clause-order-free: EVENT before WHERE with a top-level AND
    op = parse_operation(
        "select t from x event starting at t where t > 1 and t < 5"
    )
    assert op.event_time == (("t", 1.0), ("const", 0.0))
    assert op.where is not None


def test_event_time_resolves_hash_start_stop(spark):
    """#start/#stop virtual fields compile against the EVENT clause
    (event_time.ramen: `#stop AS m EVENT STARTS AT n*10 WITH DURATION
    0.1s` → m = n*10 + 0.1)."""
    df = spark.createDataFrame([(5,)], "v int")
    out = compile_operation(
        "select v as n, #stop as m, #start as s from x "
        "event starts at n*10 with duration 0.1s",
        df,
    )
    r = out.collect()[0]
    assert (r["n"], r["m"], r["s"]) == (5, 50.1, 50.0)


def test_hash_start_falls_back_to_column_convention(spark):
    """Without an EVENT clause, #start/#stop read the start/stop
    columns (the repo's timeseries convention)."""
    df = spark.createDataFrame([(1.0, 2.0)], "start double, stop double")
    out = compile_operation("select #stop - #start as dur from x", df)
    assert out.collect()[0]["dur"] == 1.0


def test_with_event_time_bridge(spark):
    """with_event_time materializes the annotation as start/stop double
    columns for operators/windows.py consumers (port_scan.ramen:29
    EVENT STARTS AT first AND STOPS AT last)."""
    from ramen_spark.plans.raql import parse_operation, with_event_time

    op = parse_operation(
        "select f as first, l as last from x event starts at first and stops at last"
    )
    df = spark.createDataFrame([(10.0, 12.5)], "first double, last double")
    r = with_event_time(df, op).collect()[0]
    assert (r["start"], r["stop"]) == (10.0, 12.5)


def test_parse_top_family():
    """TOP grammar forms (doc:975-1006): LIST TOP, IS IN TOP with BY /
    OVER / ABOVE SIGMAS, RANK OF … IN TOP, LARGEST/SMALLEST BUT/UP TO."""
    from ramen_spark.plans.raql import Call, parse_expr

    e = parse_expr("list top 3 manufacturer")
    assert isinstance(e, Call) and e.fn == "top" and e.opts["n"] == 3

    e = parse_expr("top 5 user_id by value above 2 sigmas")
    assert e.fn == "top" and e.opts["sigmas"] == 2.0 and e.opts["by"] is not None

    e = parse_expr("is manufacturer in top 2 over 20")
    assert e.fn == "is_in_top" and e.opts["n"] == 2

    e = parse_expr("rank of user_id in top 10 by value")
    assert e.fn == "rank_in_top" and e.opts["n"] == 10

    e = parse_expr("largest but 1 up to 3 v by w")
    assert e.fn == "largest" and e.opts == {
        "n": 3, "but": 1, "by": e.opts["by"], "smallest": False, "up_to": True
    } and len(e.opts["by"]) == 1

    e = parse_expr("smallest 2 v")
    assert e.fn == "largest" and e.opts["smallest"] and e.opts["by"] == []


def test_top_and_largest_in_commit_fold(spark):
    """LIST TOP / RANK OF / LARGEST evaluate in the COMMIT engine with
    exact weights (top_expr.ramen semantics)."""
    from ramen_spark.plans.raql import compile_commit_operation

    rows = [("x", 1.0)] * 5 + [("z", 1.0)] * 1 + [("y", 1.0)] * 3
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "seq int, item string, w double"
    )
    out = compile_commit_operation(
        "select top 2 item as t2, largest up to 2 seq as l2, "
        "rank of item in top 2 as rk "
        "commit after sum 1 >= 9",
        df,
        output_schema="t2 array<string>, l2 array<int>, rk bigint",
        order_cols=["seq"],
    )
    r = out.collect()[0]
    assert r["t2"] == ["x", "y"]        # exact counts 5, 3
    assert r["l2"] == [8, 7]            # arrival order: most recent first
    assert r["rk"] == 2                 # last row's item = y → rank 2


def test_variant_expression(spark):
    """VARIANT(exp) — experiment variant lookup
    (src/RamenExperiments.ml; CodeGenLib.ml:59 get_variant): the
    assigned variant name, NULL for unknown experiments. Assignments
    ride the reserved __experiments parameter."""
    from ramen_spark.plans.raql import compile_program

    prog = compile_program(
        'DEFINE f AS YIELD variant("tester") AS v, variant("nope") AS w',
        name="pvar",
    )
    row = prog.materialize(
        spark,
        params={"__experiments": {"tester": "on"}},
        register_views=False,
    )["f"].first()
    assert row["v"] == "on" and row["w"] is None
    row2 = prog.materialize(spark, register_views=False)["f"].first()
    assert row2["v"] is None


def test_text_pipeline_scalars_in_raql(spark):
    """The training-data text scalars are part of the RaQL dialect:
    score, gate, and route documents from RaQL text alone — values
    must equal the functions.text builders they alias."""
    import ramen_spark.functions.text as Tx

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "x"),
        ],
        ["doc_id", "text"],
    )
    out = compile_operation(
        "SELECT doc_id, QUALITY_SCORE text AS q, "
        "DETECT_LANGUAGE text AS lang, TOKEN_COUNT text AS n, "
        "FINGERPRINT text AS fp WHERE TOKEN_COUNT text > 1",
        docs,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert list(rows) == [1]
    exp = docs.filter(F.col("doc_id") == 1).select(
        Tx.quality_score(F.col("text")).alias("q"),
        Tx.detect_language(F.col("text")).alias("lang"),
        Tx.token_count(F.col("text")).alias("n"),
        Tx.fingerprint(F.col("text")).alias("fp"),
    ).collect()[0]
    got = rows[1]
    assert (got["q"], got["lang"], got["n"], got["fp"]) == (
        exp["q"], exp["lang"], exp["n"], exp["fp"]
    )


def test_dominant_script_in_raql(spark):
    """DOMINANT_SCRIPT composes in RaQL like any stateless scalar and
    matches the functions.text builder."""
    import ramen_spark.functions.text as Tx

    docs = spark.createDataFrame(
        [(1, "hello world plain latin text"), (2, "привет мир это тест")],
        ["doc_id", "text"],
    )
    out = compile_operation(
        "SELECT doc_id, DOMINANT_SCRIPT text AS script", docs
    )
    rows = {r["doc_id"]: r["script"] for r in out.collect()}
    assert rows == {1: "latin", 2: "cyrillic"}
    exp = docs.select(
        "doc_id",
        Tx.dominant_script(Tx.script_counts(F.col("text"))).alias("s"),
    ).collect()
    assert {r["doc_id"]: r["s"] for r in exp} == rows


def test_canonical_url_in_raql(spark):
    """CANONICAL_URL is a dialect scalar: dedup keys derivable from
    RaQL text, values equal to functions.text.canonical_url."""
    import ramen_spark.functions.text as Tx

    docs = spark.createDataFrame(
        [
            (1, "HTTPS://A.B:443/P/?utm_source=x&id=9#f"),
            (2, "http://C.d/q/"),
        ],
        ["doc_id", "url"],
    )
    out = compile_operation(
        "SELECT doc_id, CANONICAL_URL url AS canon", docs
    )
    got = {r["doc_id"]: r["canon"] for r in out.collect()}
    exp = {
        r["doc_id"]: r["c"]
        for r in docs.select(
            "doc_id", Tx.canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    assert got == exp == {
        1: "https://a.b/P?id=9",
        2: "http://c.d/q",
    }


def test_curation_scalars_in_raql(spark):
    """Round-8 curation scalars in the dialect: REDACT_PII and
    URL_HOST / REGISTRABLE_DOMAIN compose in RaQL select/where like
    any stateless function, matching their functions.text builders."""
    import ramen_spark.functions.text as Tx

    docs = spark.createDataFrame(
        [
            (1, "mail me at bob@corp.example or 10.1.2.3", "https://a.b.news.test/x"),
            (2, "nothing sensitive here", "ftp://plain.test/"),
        ],
        ["doc_id", "text", "url"],
    )
    out = compile_operation(
        "SELECT doc_id, REDACT_PII text AS clean, URL_HOST url AS host, "
        "REGISTRABLE_DOMAIN (URL_HOST url) AS dom",
        docs,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["clean"] == "mail me at <EMAIL> or <IP>"
    assert rows[1]["host"] == "a.b.news.test"
    assert rows[1]["dom"] == "news.test"
    assert rows[2]["clean"] == "nothing sensitive here"
    assert rows[2]["host"] == "plain.test"
    exp = docs.select(
        "doc_id", Tx.redact_pii(F.col("text")).alias("c")
    ).collect()
    assert {r["doc_id"]: r["c"] for r in exp} == {
        i: rows[i]["clean"] for i in rows
    }


def test_parse_sketch_aggregates():
    """KMV [k] DISTINCT x and CMS TOP n [OVER m] x [BY w] parse to the
    sketch aggregate calls (round-10 dialect exposure of
    operators.sketch; nearest reference rows raql_expr.type
    Distinct/Top). Bare `kmv` / `cms` stay ordinary field names."""
    from ramen_spark.plans.raql import Call, Field, parse_expr

    e = parse_expr("kmv distinct user_id")
    assert isinstance(e, Call) and e.fn == "kmv_distinct"
    assert e.opts["k"] == 256
    e = parse_expr("KMV 64 DISTINCT user_id")
    assert e.fn == "kmv_distinct" and e.opts["k"] == 64
    e = parse_expr("CMS TOP 5 user_id")
    assert e.fn == "cms_top" and e.opts["n"] == 5 and "by" not in e.opts
    e = parse_expr("cms top 3 over 100 user_id by value")
    assert e.fn == "cms_top" and e.opts["n"] == 3
    assert isinstance(e.opts["by"], Field)
    # bare names keep working
    assert isinstance(parse_expr("kmv"), Field)
    assert isinstance(parse_expr("cms + 1").a, Field)


def test_sketch_aggregates_compile(spark):
    """Grouped KMV/CMS fields compile through the sketch-branch
    rewrite: estimates match operators.sketch run directly, all-NULL
    groups coalesce (0 / []), and the Column form is rejected with
    guidance."""
    from ramen_spark.operators.sketch import cms_top, kmv_distinct

    rows = [("a", i % 37) for i in range(500)] + [("b", None)] * 5
    df = spark.createDataFrame(rows, "g string, v long")
    out = compile_operation(
        "SELECT g, COUNT(1) AS n, KMV 16 DISTINCT v AS kd, "
        "CMS TOP 2 v AS hot GROUP BY g",
        df,
    )
    got = {r["g"]: r for r in out.collect()}
    direct = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(df, ["g"], "v", 16).collect()
    }
    assert got["a"]["kd"] == direct["a"]
    assert got["a"]["n"] == 500
    assert got["b"]["kd"] == 0 and got["b"]["hot"] == []
    dtop = {r["g"]: r["top"] for r in cms_top(df, ["g"], "v", 2).collect()}
    assert got["a"]["hot"] == dtop["a"]
    with pytest.raises(NotImplementedError, match="operation level"):
        compile_expr("1 + kmv distinct x")
    with pytest.raises(NotImplementedError, match="whole select field"):
        compile_operation("SELECT g, 1 + KMV DISTINCT v AS bad GROUP BY g", df)


def test_cms_top_output_kinds(spark):
    """The sketch-backed membership/rank kinds (round-10 gap: the
    reference's src/raql_top_output.type has LIST / IS x IN / RANK OF
    x IN, but CMS TOP had only LIST): parse forms, group-constant
    probe enforcement, NULL conventions, and ONE shared branch for
    identical CMS specs."""
    from ramen_spark.plans.raql import Call, parse_expr

    e = parse_expr('IS "en" IN CMS TOP 5 lang BY w')
    assert isinstance(e, Call) and e.fn == "is_in_cms_top"
    assert e.opts["n"] == 5 and "by" in e.opts and len(e.args) == 2
    e = parse_expr("RANK OF 42 IN CMS TOP 3 OVER 100 user_id")
    assert e.fn == "rank_in_cms_top" and e.opts["n"] == 3
    # the exact forms keep parsing unchanged
    assert parse_expr("IS x IN TOP 2").fn == "is_in_top"
    assert parse_expr("RANK OF x IN TOP 2").fn == "rank_in_top"

    rows = [("a", "en", 5), ("a", "en", 3), ("a", "fr", 2), ("a", "de", 1),
            ("b", "fr", 9), ("b", "fr", 1), ("b", "en", 1)]
    df = spark.createDataFrame(rows, "g string, lang string, w int")
    out = compile_operation(
        'SELECT g, CMS TOP 2 lang BY w AS hot, '
        'IS "en" IN CMS TOP 2 lang BY w AS has_en, '
        'RANK OF "fr" IN CMS TOP 2 lang BY w AS fr_rank, '
        'RANK OF "zz" IN CMS TOP 2 lang BY w AS zz_rank '
        "GROUP BY g",
        df,
    )
    got = {r["g"]: r for r in out.collect()}
    assert got["a"]["hot"] == ["en", "fr"]
    assert got["a"]["has_en"] is True and got["a"]["fr_rank"] == 2
    assert got["b"]["fr_rank"] == 1 and got["b"]["has_en"] is True
    assert got["a"]["zz_rank"] is None and got["b"]["zz_rank"] is None

    # identical specs share ONE cms branch: 4 fields, 2 joins total
    # (cms internal candidate join + one spine join)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 2, plan

    # probe kinds work WITHOUT the LIST kind present (temp list col)
    out2 = compile_operation(
        'SELECT g, IS "fr" IN CMS TOP 1 lang BY w AS fr1 GROUP BY g', df
    )
    got2 = {r["g"]: r["fr1"] for r in out2.collect()}
    assert got2 == {"a": False, "b": True}

    # per-row probes are the EXACT engine's job — rejected loudly
    with pytest.raises(NotImplementedError, match="constant or parameter"):
        compile_operation(
            "SELECT g, IS lang IN CMS TOP 2 lang AS bad GROUP BY g", df
        )


def test_sketch_aggregates_global_group(spark):
    """Global (no GROUP BY) sketch fields: one row, left-join spine
    semantics keep the row even when the sketch side is empty."""
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "v long")
    out = compile_operation(
        "SELECT COUNT(1) AS n, KMV DISTINCT v AS kd, CMS TOP 3 v AS hot", df
    )
    r = out.collect()[0]
    assert r["n"] == 100 and r["kd"] == 7 and len(r["hot"]) == 3
    allnull = spark.createDataFrame([(None,)] * 4, "v long")
    r2 = compile_operation(
        "SELECT COUNT(1) AS n, KMV DISTINCT v AS kd, CMS TOP 3 v AS hot",
        allnull,
    ).collect()[0]
    assert r2["n"] == 4 and r2["kd"] == 0 and r2["hot"] == []
    # empty input: the global group still yields its ONE row
    # (reference global-aggregate semantics — groupBy() with no keys)
    empty = spark.createDataFrame([], "v long")
    rows3 = compile_operation(
        "SELECT COUNT(1) AS n, KMV DISTINCT v AS kd, CMS TOP 3 v AS hot",
        empty,
    ).collect()
    assert len(rows3) == 1
    assert rows3[0]["n"] == 0 and rows3[0]["kd"] == 0 and rows3[0]["hot"] == []


def test_sketch_aggregates_null_group_key(spark):
    """A NULL group key is a real group (Spark groupBy keeps it): the
    sketch-branch joins must be null-safe, or the NULL group's
    estimates silently coalesce to 0/[] (round-10 review finding)."""
    from ramen_spark.operators.sketch import kmv_distinct

    rows = [(None, i % 9) for i in range(60)] + [("a", i % 5) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = compile_operation(
        "SELECT g, COUNT(1) AS n, KMV 16 DISTINCT v AS kd, "
        "CMS TOP 2 v AS hot GROUP BY g",
        df,
    )
    got = {r["g"]: r for r in out.collect()}
    direct = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(df, ["g"], "v", 16).collect()
    }
    assert got[None]["kd"] == direct[None] == 9
    assert got["a"]["kd"] == direct["a"] == 5
    assert len(got[None]["hot"]) == 2 and got[None]["n"] == 60


def test_parse_quantile_sketch():
    """KMV [k] p PERCENTILE x BY id parses to the quantile-sketch
    aggregate (round-10b: completes the dialect sketch family beside
    KMV DISTINCT / CMS TOP; exact `p PERCENTILE v` is doc:681).
    Ordinal and vector percentile specs; bare `kmv` indexing still
    backtracks to a field; missing BY is a hard, explained error."""
    from ramen_spark.plans.raql import Binop, Call, Field, parse_expr

    e = parse_expr("KMV 90th PERCENTILE n_chars BY doc_id")
    assert isinstance(e, Call) and e.fn == "quantile_sketch"
    assert e.opts == {"k": 1024, "ps": [0.9], "single": True}
    assert isinstance(e.args[0], Field) and isinstance(e.args[1], Field)
    e = parse_expr("kmv 32 [50th; 99th] percentile v by id")
    assert e.fn == "quantile_sketch"
    assert e.opts["k"] == 32 and e.opts["ps"] == [0.5, 0.99]
    assert e.opts["single"] is False
    # `kmv[1]` is INDEXING a field named kmv, not a sketch
    e = parse_expr("kmv[1]")
    assert isinstance(e, Binop) and e.op == "index"
    with pytest.raises(SyntaxError, match="BY"):
        parse_expr("KMV 90th PERCENTILE n_chars")
    with pytest.raises(SyntaxError, match=r"\[0, 100\]"):
        parse_expr("KMV 150th PERCENTILE v BY id")


def test_quantile_sketch_compiles_to_operator(spark):
    """Grouped and global KMV PERCENTILE fields compile through the
    sketch-branch rewrite: values match operators.sketch.
    quantile_sketch run directly; an all-NULL group estimates NULL
    (the PERCENTILE-of-empty convention, NOT 0)."""
    from ramen_spark.operators.sketch import quantile_sketch

    rows = [("a", i, float(i * 7 % 101)) for i in range(300)]
    rows += [("b", 1000 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = compile_operation(
        "SELECT g, COUNT(1) AS n, "
        "KMV 16 [50th; 90th] PERCENTILE v BY id AS p, "
        "KMV 16 50th PERCENTILE v BY id AS med GROUP BY g",
        df,
    )
    got = {r["g"]: r for r in out.collect()}
    direct = {
        r["g"]: r
        for r in quantile_sketch(
            df, ["g"], "v", "id", ps=[0.5, 0.9], k=16
        ).collect()
    }
    assert got["a"]["p"] == [direct["a"]["p50"], direct["a"]["p90"]]
    assert got["a"]["med"] == direct["a"]["p50"]
    assert got["a"]["n"] == 300
    # all-NULL group: no sketch row -> NULL estimates, count intact
    assert got["b"]["n"] == 5 and got["b"]["p"] is None
    assert got["b"]["med"] is None
    # global form: one row even on empty input
    [g] = compile_operation(
        "SELECT COUNT(1) AS n, KMV 16 50th PERCENTILE v BY id AS med", df
    ).collect()
    assert g["n"] == 305 and g["med"] is not None
    empty = spark.createDataFrame([], "g string, id long, v double")
    [ge] = compile_operation(
        "SELECT COUNT(1) AS n, KMV 16 50th PERCENTILE v BY id AS med", empty
    ).collect()
    assert ge["n"] == 0 and ge["med"] is None
    # Column form rejected with guidance, like the other sketches
    with pytest.raises(NotImplementedError, match="whole select field"):
        compile_operation(
            "SELECT g, 1 + KMV 90th PERCENTILE v BY id AS bad GROUP BY g", df
        )


def test_raql_quantile_sketch_oracle_null_group_parity(spark, tmp_path):
    """The registered raql_quantile_sketch oracle must agree with the
    Spark compile on a group whose sketch input is ALL NULL: Spark's
    left-join convention yields a NULL array, and the oracle's
    match-marker CASE must yield NULL too — not [NULL, NULL], which
    DuckDB's list constructor would produce over a failed join
    (review fix). Runs BOTH engines over the same synthetic parquet."""
    import duckdb

    import ramen_spark.queries as Q

    rows = [(i, f"lang{i % 2}", 100 + i) for i in range(40)]
    rows += [(100 + i, "hollow", None) for i in range(4)]  # all-NULL n_chars
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    # the oracle/query read (doc_id, lang, n_chars); synthesize lang
    docs = df.selectExpr("doc_id", "text AS lang", "n_chars")
    p = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(p)

    from ramen_spark.plans.raql import compile_operation

    out = compile_operation(
        "SELECT lang, COUNT(1) AS n, "
        "KMV 32 [50th; 90th] PERCENTILE n_chars BY doc_id AS chars_p, "
        "KMV 32 90th PERCENTILE n_chars BY doc_id AS p90c "
        "GROUP BY lang",
        spark.read.parquet(p),
    ).select("lang", F.col("n").cast("long").alias("n"), "chars_p", "p90c")
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    want = sorted(tuple(r) for r in con.execute(
        Q.ORACLES["raql_quantile_sketch"]
    ).fetchall())
    assert got == want
    hollow = [r for r in got if r[0] == "hollow"]
    assert hollow and hollow[0][2] is None and hollow[0][3] is None


def test_quantile_sketch_rejected_in_commit_fold_with_guidance(spark):
    """The COMMIT fold's sketch accumulator covers KMV DISTINCT only;
    KMV PERCENTILE under a COMMIT clause must fail loudly with the
    routing advice, never silently compile to something else."""
    from ramen_spark.plans.raql import compile_commit_operation

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, id long, v double")
    with pytest.raises(NotImplementedError, match="operation level"):
        compile_commit_operation(
            "SELECT g, KMV 16 50th PERCENTILE v BY id AS med "
            "GROUP BY g COMMIT AFTER COUNT(1) >= 2",
            df,
        )
