"""RaQL type lattice ↔ Spark types (SURVEY §1.2).

The reference has 9 integer widths × 2 signs with 2-complement
wraparound (src/raql_type.ml:16-33), network types (src/raql_type.ml:
34-40), and nullability as part of every type. Spark mapping:

- each RaQL int maps to the smallest Spark integral container;
  the odd widths (U24/U40/U48/U56 + all unsigned) emulate wraparound
  with ``wrap_int`` where tests require exact overflow behavior;
- U64 → DecimalType(20,0); **U128/I128 → DecimalType(38,0) — a
  DOCUMENTED v1 delta**: exact in ±(10^38−1) (covers every doc-corpus
  and func-spec 128-bit case incl. peek.test's IPv6 value), but ~71%
  of the full u128 range is unrepresentable. No silent loss: casts
  beyond the range are NULL per the cast-failure convention,
  ``wrap_int`` raises NotImplementedError, and PEEK u128/i128 raises
  at runtime when an in-range-but-unrepresentable value is assembled
  (plans/raql._compile_peek). Full fidelity would be a 16-byte
  BinaryType with two-limb arithmetic — rejected for v1: it forfeits
  Catalyst comparisons/arithmetic on a type the corpus only ever
  feeds with values < 10^38;
- Ipv4/Eth → LongType; Ipv6 → BinaryType(16); Ip/Cidr sum types →
  struct (functions.network);
- nullability → StructField.nullable; units → column metadata.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class IntSpec:
    bits: int
    signed: bool

    @property
    def spark_type(self) -> T.DataType:
        if self.signed:
            for bits, t in ((8, T.ByteType()), (16, T.ShortType()), (32, T.IntegerType()), (64, T.LongType())):
                if self.bits <= bits:
                    return t
            # Spark decimal caps at 38 digits: i128 range (39 digits)
            # does not fit exactly — carried as Decimal(38,0); use 16-byte
            # BinaryType when full 128-bit fidelity is required
            return T.DecimalType(38, 0)
        # unsigned needs one extra bit of headroom in a signed container
        for bits, t in ((8, T.ByteType()), (16, T.ShortType()), (32, T.IntegerType()), (64, T.LongType())):
            if self.bits < bits:
                return t
        return T.DecimalType(20 if self.bits <= 64 else 38, 0)


INT_TYPES: dict[str, IntSpec] = {}
for _b in (8, 16, 24, 32, 40, 48, 56, 64, 128):
    INT_TYPES[f"u{_b}"] = IntSpec(_b, signed=False)
    INT_TYPES[f"i{_b}"] = IntSpec(_b, signed=True)

SCALAR_TO_SPARK: dict[str, T.DataType] = {
    "void": T.NullType(),
    "bool": T.BooleanType(),
    "char": T.StringType(),
    "float": T.DoubleType(),
    "string": T.StringType(),
    "eth": T.LongType(),
    "ipv4": T.LongType(),
    "ipv6": T.BinaryType(),
    **{name: spec.spark_type for name, spec in INT_TYPES.items()},
}


def spark_type_of(raql: str) -> T.DataType:
    """'u8' / 'string' / 'float?' → Spark type (the '?' nullability
    marker is carried by the field, not the type)."""
    base = raql.rstrip("?").lower()
    try:
        return SCALAR_TO_SPARK[base]
    except KeyError:
        raise ValueError(f"unknown RaQL type {raql!r}") from None


def wrap_int(col: Column, raql_type: str) -> Column:
    """2-complement wraparound to the given RaQL int type
    (site/language_reference.php 'Integers': arithmetic wraps).

    u8: 300 → 44; i8: 130 → -126. Uses pmod against 2^bits then
    re-centers for signed types — pure JVM expressions.
    """
    spec = INT_TYPES[raql_type.lower()]
    if spec.bits > 64:
        raise NotImplementedError(
            "128-bit wraparound exceeds Spark decimal precision (38); "
            "carry u128/i128 as 16-byte BinaryType if exact overflow matters"
        )
    if spec.bits == 64:
        modulus = F.lit(str(1 << 64)).cast("decimal(38,0)")
        v = F.pmod(col.cast("decimal(38,0)"), modulus)
        if spec.signed:
            half = F.lit(str(1 << 63)).cast("decimal(38,0)")
            v = F.when(v >= half, v - modulus).otherwise(v)
            return v.cast("long")
        return v.cast("decimal(20,0)")
    modulus = F.lit(1 << spec.bits)
    v = F.pmod(col.cast("long"), modulus)
    if spec.signed:
        half = F.lit(1 << (spec.bits - 1))
        v = F.when(v >= half, v - modulus).otherwise(v)
    return v.cast(spec.spark_type)


def widest(*raql_types: str) -> str:
    """RaQL 'largest type' promotion for arithmetic
    (doc/raql/expr.ml:437 '+' returns the largest of its operands'
    types; '-' always signed)."""
    specs = [INT_TYPES[t.lower()] for t in raql_types]
    bits = max(s.bits for s in specs)
    signed = any(s.signed for s in specs)
    # an unsigned operand of the max width forces one step wider when
    # mixed with signed (u32 + i32 → i64-ish); reference promotes to
    # the smallest type containing both ranges
    if signed and any((not s.signed) and s.bits == bits for s in specs):
        order = [8, 16, 24, 32, 40, 48, 56, 64, 128]
        bits = order[min(order.index(bits) + 1, len(order) - 1)]
    return f"{'i' if signed else 'u'}{bits}"


def with_units(col: Column, name: str, units: str) -> Column:
    """Attach the reference's unit vector (src/units.type) as column
    metadata — warn-only dimensional metadata, round-trips through
    Catalyst."""
    return col.alias(name, metadata={"units": units})
