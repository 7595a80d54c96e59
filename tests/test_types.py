"""RaQL type lattice: container mapping, wraparound arithmetic,
width promotion (SURVEY §1.2)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ramen_spark.types import spark_type_of, widest, with_units, wrap_int


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_container_mapping():
    assert spark_type_of("u8") == T.ShortType()  # headroom bit
    assert spark_type_of("i8") == T.ByteType()
    assert spark_type_of("u24") == T.IntegerType()
    assert spark_type_of("i64") == T.LongType()
    assert spark_type_of("u64") == T.DecimalType(20, 0)
    assert spark_type_of("u128") == T.DecimalType(38, 0)
    assert spark_type_of("float?") == T.DoubleType()
    assert spark_type_of("ipv4") == T.LongType()


@pytest.mark.parametrize(
    "t,val,expected",
    [
        ("u8", 300, 44),
        ("u8", 256, 0),
        ("u8", -1, 255),
        ("i8", 130, -126),
        ("i8", -129, 127),
        ("u16", 65536 + 5, 5),
        ("i16", 32768, -32768),
        ("u24", 1 << 24, 0),
        ("u32", (1 << 32) + 7, 7),
        ("i32", 1 << 31, -(1 << 31)),
    ],
)
def test_wraparound(spark, t, val, expected):
    assert _one(spark, wrap_int(F.lit(val), t)) == expected


def test_wraparound_u64(spark):
    # 2^64 + 1 wraps to 1
    big = F.lit(str((1 << 64) + 1)).cast("decimal(38,0)")
    assert _one(spark, wrap_int(big, "u64")) == Decimal(1)


def test_widest_promotion():
    assert widest("u8", "u16") == "u16"
    assert widest("i8", "i32") == "i32"
    assert widest("u32", "i32") == "i40"  # mixed sign widens
    assert widest("u8", "i8") == "i16"


def test_units_metadata(spark):
    df = spark.range(1).select(with_units(F.lit(10.0), "speed", "m/s"))
    assert df.schema["speed"].metadata["units"] == "m/s"


def test_peek_u128_overflow_is_loud(spark):
    """128-bit fidelity v1 delta (types.py): PEEK u128 of a value
    beyond Decimal(38,0) must RAISE, never return a silently-wrong
    NULL; in-range values (peek.test's IPv6) stay exact."""
    import pytest as _pytest

    from ramen_spark.plans.raql import compile_operation

    # in-range: the peek.test value (~4.25e37) round-trips exactly
    ok = compile_operation(
        'select peek u128 big endian "\\x20\\x01\\x44\\xC8\\x01\\x29\\x26\\x32'
        '\\x00\\x33\\x00\\x00\\x02\\x52\\x00\\x02" as v',
        spark.range(1),
    )
    assert str(ok.collect()[0]["v"]) == "42541883211820625267710156367912370178"
    # overflow: loud error, not NULL
    import pyspark.sql.functions as F

    df = spark.range(1).select(F.concat(*[F.chr(F.lit(255))] * 16).alias("b"))
    bad = compile_operation("select peek u128 big endian b as v", df)
    with _pytest.raises(Exception, match="[Dd]ecimal|USER_RAISED|v1 delta"):
        bad.collect()
