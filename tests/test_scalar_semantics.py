"""Reference operator-doc example corpus (SURVEY §5-a).

Each case is one documented (expression, expected) pair from the
reference's operator documentation (doc/raql/expr.ml, cited per
case) re-expressed against our Column library / Spark SQL. These pin
the SEMANTICS (null propagation, edge values, signs); representation
deltas (hash values, float printing) are documented exclusions in
SURVEY §7.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ramen_spark.functions import network as N
from ramen_spark.functions import scalar as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


APPROX = [
    # doc/raql/expr.ml:63 PI
    ("pi", lambda: S.pi(), math.pi),
    # :186-237 math funcs
    ("exp0", lambda: F.exp(F.lit(0)), 1.0),
    ("exp1", lambda: F.exp(F.lit(1)), 2.71828182846),
    ("log1", lambda: S.log(F.lit(1)), 0.0),
    ("log10_100", lambda: S.log10(F.lit(100)), 2.0),
    ("sqrt16", lambda: S.sqrt(F.lit(16)), 4.0),
    ("sq4", lambda: S.sq(F.lit(4)), 16),
    ("ceil", lambda: F.ceil(F.lit(41.2)), 42),
    ("floor", lambda: F.floor(F.lit(42.7)), 42),
    ("floor_neg", lambda: F.floor(F.lit(-42.7)), -43),
    ("round", lambda: F.round(F.lit(42.4)), 42),
    # :238-283 trig
    ("cos_pi", lambda: F.cos(S.pi()), -1.0),
    ("sin_pi", lambda: F.sin(S.pi()), 0.0),
    ("acos", lambda: F.acos(F.lit(-1)), math.pi),
    ("asin", lambda: 2 * F.asin(F.lit(1)), math.pi),
    ("atan", lambda: 4 * F.atan(F.lit(1)), math.pi),
    ("cosh0", lambda: F.cosh(F.lit(0)), 1.0),
    # :437-499 arithmetic
    ("add", lambda: F.lit(27) + F.lit(15), 42),
    ("add_mixed", lambda: F.lit(1.5) + F.lit(1), 2.5),
    ("sub_unsigned", lambda: F.lit(1) - F.lit(2), -1),  # u8-u8 is signed
    ("mul", lambda: F.lit(6) * F.lit(7), 42),
    ("div_int", lambda: S.div(F.lit(84), F.lit(2)), 42.0),
    ("div_inf", lambda: S.div(F.lit(1), F.lit(0)), float("inf")),
    ("idiv", lambda: S.idiv_int(F.lit(10), F.lit(3)), 3),
    ("idiv_neg", lambda: S.idiv_int(F.lit(-10), F.lit(3)), -3),  # ints: toward 0
    ("idiv_float", lambda: S.idiv(F.lit(10.5), F.lit(3.1)), 3),
    ("idiv_float_neg", lambda: S.idiv(F.lit(-10.5), F.lit(3.1)), -4),  # floats: floored
    ("mod", lambda: S.mod(F.lit(3), F.lit(2)), 1),
    ("mod_neg_a", lambda: S.mod(F.lit(-3), F.lit(2)), -1),
    ("mod_neg_b", lambda: S.mod(F.lit(3), F.lit(-2)), 1),
    ("pow", lambda: F.pow(F.lit(2), F.lit(3)), 8.0),
    ("pow_pi", lambda: F.pow(S.pi(), S.pi()), 36.4621596072079),
    # :500-521 truncate / reldiff
    ("truncate_m", lambda: S.truncate(F.lit(153.6), 10.0), 150.0),
    ("truncate_1", lambda: S.truncate(F.lit(5.8)), 5.0),
    ("truncate_neg", lambda: S.truncate(F.lit(-2.3)), -3.0),
    ("reldiff_eq", lambda: S.reldiff(F.lit(1), F.lit(1)), 0.0),
    ("reldiff_10_9", lambda: S.reldiff(F.lit(10), F.lit(9)), 0.1),
    ("reldiff_9_10", lambda: S.reldiff(F.lit(9), F.lit(10)), 0.1),
    ("reldiff_neg", lambda: S.reldiff(F.lit(-9), F.lit(-10)), 0.1),
    ("reldiff_gt1", lambda: S.reldiff(F.lit(1), F.lit(-10)), 1.1),
    ("reldiff_zero", lambda: S.reldiff(F.lit(0.0), F.lit(0.0)), 0.0),
    # :159-172 abs/neg
    ("abs", lambda: F.abs(F.lit(-1.2)), 1.2),
    # :404-423 variadic min/max
    ("max3", lambda: S.max_of(F.lit(1), F.lit(2), F.lit(3)), 3),
    ("min_str", lambda: S.min_of(F.lit("foo"), F.lit("bar")), "bar"),
    # :122-131 length (bytes)
    ("len_foo", lambda: S.length(F.lit("foo")), 3),
    ("len_empty", lambda: S.length(F.lit("")), 0),
    # :133-144 case
    ("lower", lambda: F.lower(F.lit("Foo Bar Baz")), "foo bar baz"),
    ("upper", lambda: F.upper(F.lit("Foo Bar Baz")), "FOO BAR BAZ"),
    # :575 concat
    ("concat", lambda: F.concat(F.lit("foo"), F.lit("bar")), "foobar"),
    # :455 int * string
    ("str_repeat", lambda: S.string_repeat(F.lit("foo"), F.lit(2)), "foofoo"),
    # :596-625 bitwise
    ("bitand", lambda: F.lit(1029).bitwiseAND(F.lit(15)), 5),
    ("bitor", lambda: F.lit(1025).bitwiseOR(F.lit(5)), 1029),
    ("bitxor", lambda: F.lit(1029).bitwiseXOR(F.lit(15)), 1034),
    ("shiftright", lambda: F.shiftright(F.lit(1029), 3), 128),
    ("shiftleft", lambda: F.shiftleft(F.lit(5), 3), 40),
    # :284 hash — deterministic (value differs from OCaml Hashtbl: documented)
    ("hash_null", lambda: S.hash64(F.lit(None).cast("string")), None),
    # :303 chr
    ("chr", lambda: S.chr_(F.lit(65)), "A"),
    # :94-121 peek
    ("peek_u32le", lambda: S.peek_u32_le(F.lit("\x02\x01\x00\x00")), 258),
    # :145 uuid_of_u128
    (
        "uuid",
        lambda: S.uuid_of_u128(F.lit(0x123456789ABC), F.lit(0xDEFFEDCBA098765431 & 0xFFFFFFFFFFFFFFFF)),
        None,  # placeholder — checked separately below
    ),
]
APPROX = [c for c in APPROX if c[0] != "uuid"]


@pytest.mark.parametrize("name,expr,expected", APPROX, ids=[c[0] for c in APPROX])
def test_doc_example(spark, name, expr, expected):
    got = _one(spark, expr())
    if expected is None:
        assert got is None
    elif isinstance(expected, float):
        if math.isinf(expected):
            assert math.isinf(got) and (got > 0) == (expected > 0)
        else:
            assert got == pytest.approx(expected, rel=1e-9, abs=1e-9), name
    else:
        assert got == expected, name


def test_div_null_on_0_over_0(spark):
    assert _one(spark, S.div(F.lit(0), F.lit(0))) is None


def test_log_sqrt_negative_null(spark):
    # doc:192,210 — LOG(-1)=NULL, SQRT(-1)=NULL
    assert _one(spark, S.log(F.lit(-1))) is None
    assert _one(spark, S.sqrt(F.lit(-1))) is None


def test_boolean_table(spark):
    # doc:522-537
    rows = spark.sql(
        "SELECT (false AND false) a, (false AND true) b, (true OR false) c, NOT true d"
    ).collect()[0]
    assert (rows["a"], rows["b"], rows["c"], rows["d"]) == (False, False, True, False)


def test_comparisons_struct_lexicographic(spark):
    # doc:538-574 — tuples compare lexicographically
    r = spark.sql(
        "SELECT named_struct('a', 5, 'b', 1) < named_struct('a', 5, 'b', 2) AS lt,"
        "       array(1, 2) <> array(2, 1) AS ne"
    ).collect()[0]
    assert r["lt"] is True and r["ne"] is True


def test_like_patterns(spark):
    # doc:310-340
    cases = [
        ("foobar", "foo%", True),
        ("foobar", "foo", False),
        ("foobar", r"foo\%", False),
        ("foobar", "f%r", True),
        ("foobar", "%oo%", True),
        ("foobar", "f__b_r", True),
        ("foobar", "fo_b%", True),
        ("foobar", "%baz", False),
        ("foobar", "", False),
    ]
    cols = [S.like(F.lit(s), p).alias(f"c{i}") for i, (s, p, _) in enumerate(cases)]
    row = spark.range(1).select(*cols).collect()[0]
    for i, (s, p, exp) in enumerate(cases):
        assert row[f"c{i}"] is exp, (s, p)


def test_starts_ends_with(spark):
    assert _one(spark, S.starts_with(F.lit("foobar"), F.lit("foo"))) is True
    assert _one(spark, S.ends_with(F.lit("foobar"), F.lit("bar"))) is True


def test_coalesce(spark):
    # doc:424
    assert _one(spark, S.coalesce(F.lit(None).cast("int"), F.lit(1))) == 1


def test_is_null(spark):
    # doc:173-185 — (NULL = 1) IS NULL
    r = spark.sql("SELECT (NULL = 1) IS NULL AS x").collect()[0]["x"]
    assert r is True


def test_substring_negatives(spark):
    # doc:702 — byte positions, negatives from the end
    assert _one(spark, S.substring(F.lit("hello"), 1, 3)) == "el"
    assert _one(spark, S.substring(F.lit("hello"), -3, 5)) == "llo"
    assert _one(spark, S.substring(F.lit("hello"), 3, 1)) == ""
    assert _one(spark, S.substring(F.lit("hello"), 0, 99)) == "hello"


def test_index_from_start_end(spark):
    # doc:666 — 0-based, -1 when absent
    assert _one(spark, S.index_of(F.lit("foobar"), "o")) == 1
    assert _one(spark, S.index_of(F.lit("foobar"), "o", from_end=True)) == 2
    assert _one(spark, S.index_of(F.lit("foobar"), "z")) == -1
    assert _one(spark, S.index_of(F.lit("foobar"), "z", from_end=True)) == -1


def test_basename(spark):
    # doc:395
    assert _one(spark, S.basename(F.lit("/usr/local/bin/x"))) == "x"
    assert _one(spark, S.basename(F.lit("noslash"))) == "noslash"


def test_percentile_nearest_rank(spark):
    # doc:681 / CodeGenLib.ml:158-297 — nearest-rank on arrays
    arr = F.array(*[F.lit(x) for x in [3, 1, 4, 1, 5, 9, 2, 6]])
    assert _one(spark, S.percentile_of_array(arr, 50)) in (3, 4)  # rank semantics
    assert _one(spark, S.percentile_of_array(arr, 100)) == 9
    assert _one(spark, S.percentile_of_array(arr, 0)) == 1


def test_uuid_of_u128(spark):
    # doc:145-152: 0x123456789abcdeffedcba098765431 →
    # "00123456-789a-bcde-ffed-cba098765431" (hi/lo 64-bit halves)
    v = 0x123456789ABCDEFFEDCBA098765431
    hi, lo = v >> 64, v & 0xFFFFFFFFFFFFFFFF
    if lo >= 1 << 63:  # two's-complement signed long carries the same 64 bits
        lo -= 1 << 64
    got = _one(spark, S.uuid_of_u128(F.lit(hi), F.lit(lo)))
    assert got == "00123456-789a-bcde-ffed-cba098765431"


def test_format_time(spark):
    # doc:640 FORMAT_TIME
    got = _one(spark, S.format_time("%Y-%m-%d", F.lit(1645380250.0)))
    assert got == "2022-02-20"
    assert _one(spark, S.format_time("%s", F.lit(1645380250.0))) == "1645380250"


def test_parse_time(spark):
    # doc:291 — NULL on unparseable
    assert _one(spark, S.parse_time(F.lit("1976-01-28 12:00:00"))) == 191678400.0
    assert _one(spark, S.parse_time(F.lit("garbage"))) is None


def test_age_now_random_bounds(spark):
    # doc:45,53,64
    r = spark.range(1).select(
        S.age(S.now() - 3).alias("age3"), S.random().alias("rnd")
    ).collect()[0]
    assert 2.0 <= r["age3"] <= 4.5
    assert 0.0 <= r["rnd"] < 1.0


def test_ipv4_roundtrip(spark):
    ip = 0xC0A80001  # 192.168.0.1
    assert _one(spark, N.ipv4_to_string(F.lit(ip))) == "192.168.0.1"
    assert _one(spark, N.string_to_ipv4(F.lit("192.168.0.1"))) == ip
    assert _one(spark, N.string_to_ipv4(F.lit("999.1.1.1"))) is None


def test_cidr_ops(spark):
    # doc BEGINOFRANGE/ENDOFRANGE + IP IN CIDR (192.168.10.0/24)
    cidr = N.cidr_v4(F.lit(0xC0A80A42), 24)
    assert _one(spark, N.begin_of_range(cidr)) == 0xC0A80A00
    assert _one(spark, N.end_of_range(cidr)) == 0xC0A80AFF
    assert _one(spark, N.cidr_contains(cidr, F.lit(0xC0A80A01))) is True
    assert _one(spark, N.cidr_contains(cidr, F.lit(0xC0A80B01))) is False


def test_eth_format(spark):
    assert _one(spark, N.eth_to_string(F.lit(0x18D6C72871F5))) == "18:d6:c7:28:71:f5"


def test_sparkline(spark):
    got = _one(spark, S.sparkline(F.array(*[F.lit(float(x)) for x in [0, 1, 2, 3, 4, 5, 6, 7]])))
    assert got == "▁▂▃▄▅▆▇█"


def test_histogram_buckets(spark):
    # doc:784 — under/overflow buckets
    vals = [(-1.0, 0), (0.0, 1), (19.9, 1), (20.0, 2), (199.9, 10), (200.0, 11), (250.0, 11)]
    cols = [S.histogram(F.lit(v), 0.0, 200.0, 10).alias(f"b{i}") for i, (v, _) in enumerate(vals)]
    row = spark.range(1).select(*cols).collect()[0]
    for i, (v, exp) in enumerate(vals):
        assert row[f"b{i}"] == exp, v


def test_ipv6_parse(spark):
    # full, compressed, loopback, invalid forms (src/RamenIpv6.ml)
    full = "20010db8000000000000000000000001"
    assert _one(
        spark, F.hex(N.string_to_ipv6(F.lit("2001:db8::1")))
    ).lower() == full
    assert _one(
        spark,
        F.hex(N.string_to_ipv6(F.lit("2001:0db8:0000:0000:0000:0000:0000:0001"))),
    ).lower() == full
    assert _one(spark, F.hex(N.string_to_ipv6(F.lit("::1")))).lower() == (
        "0" * 31 + "1"
    )
    assert _one(spark, F.hex(N.string_to_ipv6(F.lit("::")))) == "0" * 32
    for bad in ("1.2.3.4", "2001:db8", "g::1", "1:::2", "1:2:3:4:5:6:7:8:9", ""):
        assert _one(spark, N.string_to_ipv6(F.lit(bad))) is None


def test_connected_components_raises_on_nonconvergence(spark):
    """A diameter deeper than max_iter must raise, never return wrong
    cluster ids silently (ADVICE r2)."""
    from ramen_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)
    got = {
        (r["v"], r["component"])
        for r in connected_components(pairs, max_iter=25).collect()
    }
    assert got == {(i, 1) for i in range(1, 7)}
