"""Stateless scalar operators (SURVEY §2.3).

Each function mirrors one RaQL operator's semantics (reference file:line
in the docstring) as a composition of built-in pyspark functions —
JVM-side, codegen-friendly, never a row-at-a-time Python UDF.

NULL-propagation notes (reference doc/raql/expr.ml):
- ``0/0`` is NULL (raql div, doc:464) — Spark's ``/`` already yields
  NULL for div-by-zero under ANSI-off, but we force the 0/0 → NULL rule
  explicitly so ANSI mode can't change semantics.
- ``LOG/LOG10/SQRT`` of negative input → NULL (doc:186-237). Spark
  returns NULL for log of non-positive and NaN for sqrt(neg); we
  normalize NaN → NULL to match.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# nullary (raql_expr.type:65-84)
# ---------------------------------------------------------------------------


def now() -> Column:
    """NOW — float unix timestamp (doc/raql/expr.ml:45)."""
    return F.unix_timestamp().cast("double")


def random() -> Column:
    """RANDOM — uniform [0,1) (doc/raql/expr.ml:53)."""
    return F.rand()


def pi() -> Column:
    return F.lit(math.pi)


# ---------------------------------------------------------------------------
# unary (raql_expr.type:85-152)
# ---------------------------------------------------------------------------


def age(x: Column) -> Column:
    """AGE x = now - x (doc/raql/expr.ml:64)."""
    return now() - x.cast("double")


def force(x: Column) -> Column:
    """FORCE e — t? → t, error on NULL (doc/raql/expr.ml:86).

    assert_true returns NULL when the predicate holds (and raises
    otherwise), so the when() always falls through to x.
    """
    return F.when(F.assert_true(x.isNotNull()).isNotNull(), F.lit(None)).otherwise(x)


def _null_if_nan(c: Column) -> Column:
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def sqrt(x: Column) -> Column:
    """SQRT — NULL on negative (doc/raql/expr.ml:210)."""
    return _null_if_nan(F.sqrt(x))


def log(x: Column) -> Column:
    """LOG (natural) — NULL on non-positive (doc/raql/expr.ml:192)."""
    return F.log(x)


def log10(x: Column) -> Column:
    return F.log10(x)


def sq(x: Column) -> Column:
    """SQ x = x*x, keeps operand type (doc/raql/expr.ml:216)."""
    return x * x


def length(x: Column) -> Column:
    """LENGTH — string byte length (doc/raql/expr.ml:122).

    RaQL strings are byte strings; Spark ``length`` is chars. Use
    ``octet_length`` to match byte semantics for non-ASCII data.
    """
    return F.octet_length(x)


def basename(x: Column) -> Column:
    """BASENAME — strip leading dirs (doc/raql/expr.ml:395)."""
    return F.element_at(F.split(x, "/"), -1)


def hash64(x: Column) -> Column:
    """HASH — any → i64, deterministic (doc/raql/expr.ml:284).

    Uses xxhash64: deterministic across runs/cluster but different
    values than the reference's OCaml Hashtbl.hash (documented delta).
    HASH NULL = NULL (doc:284; xxhash64 alone would return the seed).
    """
    return F.when(x.isNull(), F.lit(None)).otherwise(F.xxhash64(x))


def uuid_of_u128(hi: Column, lo: Column) -> Column:
    """UUID_OF_U128 — 128-bit int → uuid-formatted string
    (doc/raql/expr.ml:145). Takes the value as two 64-bit halves."""
    hx = F.concat(F.lpad(F.hex(hi), 16, "0"), F.lpad(F.hex(lo), 16, "0"))
    return F.lower(
        F.concat_ws(
            "-",
            F.substring(hx, 1, 8),
            F.substring(hx, 9, 4),
            F.substring(hx, 13, 4),
            F.substring(hx, 17, 4),
            F.substring(hx, 21, 12),
        )
    )


def chr_(x: Column) -> Column:
    """CHR — int → 1-char string (doc/raql/expr.ml:303)."""
    return F.char(x)


# ---------------------------------------------------------------------------
# binary / ternary (raql_expr.type:166-208)
# ---------------------------------------------------------------------------


def div(a: Column, b: Column) -> Column:
    """``/`` — always float; 0/0 → NULL, x/0 → ±Inf
    (doc/raql/expr.ml:464: "84/2"→42, "1/0"→Inf, "0/0"→NULL)."""
    a = a.cast("double")
    b = b.cast("double")
    return (
        F.when((a == 0) & (b == 0), F.lit(None))
        .when(b == 0, F.signum(a) * F.lit(float("inf")))
        .otherwise(a / b)
    )


def idiv(a: Column, b: Column) -> Column:
    """``//`` on floats — floored division (doc/raql/expr.ml:475
    "10.5//3.1"→3; floats round toward −∞)."""
    return F.floor(a.cast("double") / b.cast("double"))


def idiv_int(a: Column, b: Column) -> Column:
    """``//`` on integers — truncates toward 0 like OCaml's ``/``
    (doc/raql/expr.ml:475 "-10//3"→-3). Long cast of the double
    quotient truncates toward zero (exact below 2^53)."""
    return (a.cast("double") / b.cast("double")).cast("long")


def mod(a: Column, b: Column) -> Column:
    """``%`` — sign follows dividend, OCaml semantics
    (doc/raql/expr.ml:485). Spark's ``%`` matches (C semantics)."""
    return a % b


def truncate(x: Column, m: Column | float = 1.0) -> Column:
    """TRUNCATE(x, m) — floor to multiple of m (doc/raql/expr.ml:500)."""
    m = m if isinstance(m, Column) else F.lit(m)
    return F.floor(x / m) * m


def reldiff(a: Column, b: Column) -> Column:
    """RELDIFF(a,b) = |a-b| / max(|a|,|b|), 0 when both are 0
    (src/RamenHelpersNoLog.ml:36-39; doc/raql/expr.ml:511 —
    RELDIFF(1,-10)=1.1, so the result may exceed 1)."""
    d = F.abs(a - b)
    scale = F.greatest(F.abs(a), F.abs(b))
    return F.when(scale == 0, F.lit(0.0)).otherwise(d.cast("double") / scale)


def string_repeat(s: Column, n: Column) -> Column:
    """``int * string`` repeats the string (doc/raql/expr.ml:455)."""
    return F.repeat(s, n)


def substring(s: Column, start: Column | int, stop: Column | int) -> Column:
    """SUBSTRING(s, start, stop) — byte positions, 0-based, negatives
    count from the end, start inclusive / stop exclusive
    (doc/raql/expr.ml:702, CodeGenLib.ml:308-325)."""
    start = start if isinstance(start, Column) else F.lit(start)
    stop = stop if isinstance(stop, Column) else F.lit(stop)
    ln = F.length(s)
    norm = lambda p: F.when(p < 0, F.greatest(ln + p, F.lit(0))).otherwise(F.least(p, ln))  # noqa: E731
    b, e = norm(start), norm(stop)
    return F.when(e <= b, F.lit("")).otherwise(s.substr(b + 1, e - b))


def index_of(s: Column, c: Column | str, from_end: bool = False) -> Column:
    """INDEX [FROM START|END](s, c) — 0-based position of char, -1 if
    absent (doc/raql/expr.ml:666)."""
    c = c if isinstance(c, Column) else F.lit(c)
    if not from_end:
        return F.instr(s, c) - 1
    # last occurrence: length - 1 - position in reversed string
    rev_pos = F.instr(F.reverse(s), c)
    return F.when(rev_pos == 0, F.lit(-1)).otherwise(F.length(s) - rev_pos)


def starts_with(s: Column, pre: Column) -> Column:
    return s.startswith(pre)


def ends_with(s: Column, suf: Column) -> Column:
    return s.endswith(suf)


def like(s: Column, pattern: str) -> Column:
    """x LIKE "pat" — %/_ wildcards, \\ escape (doc/raql/expr.ml:310,
    glob engine src/Globs.ml)."""
    return s.like(pattern)


def in_(x: Column, container: Column) -> Column:
    """``x IN s`` — array membership / substring (doc/raql/expr.ml:626).
    (IP IN CIDR lives in functions.network.cidr_contains.)"""
    return F.array_contains(container, x)


def coalesce(*cols: Column) -> Column:
    return F.coalesce(*cols)


def min_of(*cols: Column) -> Column:
    """variadic MIN (doc/raql/expr.ml:404)."""
    return F.least(*cols)


def max_of(*cols: Column) -> Column:
    return F.greatest(*cols)


# ---------------------------------------------------------------------------
# time formatting (doc/raql/expr.ml:291,640)
# ---------------------------------------------------------------------------

_STRFTIME_DIRECTIVES = {
    "Y": "yyyy", "m": "MM", "d": "dd", "H": "HH", "M": "mm", "S": "ss",
    "j": "DDD", "y": "yy", "e": "d", "p": "a",
}


def format_time(fmt: str, t: Column) -> Column:
    """FORMAT_TIME(fmt, t) — strftime-style template over a float
    unix-seconds value (doc/raql/expr.ml:640). ``%s`` = raw epoch
    seconds; ``%u`` = day of week with Sunday = 0 (reference example
    doc:662 prints 0 for a Sunday). Literal text is emitted verbatim
    (never fed to the Java pattern engine, where letters are pattern
    directives)."""
    ts = F.timestamp_seconds(t.cast("double"))
    pieces: list[Column] = []
    buf = ""
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            d = fmt[i + 1]
            i += 2
            if d == "%":
                buf += "%"
                continue
            if buf:
                pieces.append(F.lit(buf))
                buf = ""
            if d == "s":
                pieces.append(t.cast("long").cast("string"))
            elif d == "u":
                pieces.append((F.dayofweek(ts) - 1).cast("string"))
            elif d == "S":
                # reference strftime prints seconds+fraction as %05.2f
                # (CodeGenLib.ml:698: "00.00" for exact minutes)
                tf = t.cast("double")
                pieces.append(
                    F.format_string(
                        "%05.2f",
                        F.date_format(ts, "ss").cast("double") + (tf - F.floor(tf)),
                    )
                )
            elif d == "j":
                # reference: string_of_int tm_yday — 0-based, unpadded
                pieces.append((F.dayofyear(ts) - 1).cast("string"))
            elif d == "n":
                pieces.append(F.lit("\n"))
            elif d == "t":
                pieces.append(F.lit("\t"))
            elif d in _STRFTIME_DIRECTIVES:
                pieces.append(F.date_format(ts, _STRFTIME_DIRECTIVES[d]))
            else:
                buf += "%" + d
        else:
            buf += ch
            i += 1
    if buf:
        pieces.append(F.lit(buf))
    if not pieces:
        return F.lit("")
    return F.concat(*pieces) if len(pieces) > 1 else pieces[0].cast("string")


# second-resolution formats (truncate); the reference's
# time_of_abstime grammar (RamenHelpersNoLog.ml:1067-1135)
_PARSE_TIME_FMTS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd",
    "dd.MM.yyyy",
    "MM/dd/yyyy",
    "M/d/yyyy",
)
# fractional-second formats: the reference scans %f seconds and sets
# tm_sec = round_to_int s — the fraction ROUNDS to the nearest second,
# half away from zero ("...T18:20:00.9" == "... 18:20:01", time.test)
_PARSE_TIME_FRAC_FMTS = (
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
)


def parse_time(s: Column, fmts: tuple[str, ...] = _PARSE_TIME_FMTS) -> Column:
    """PARSE_TIME — string → float unix seconds, NULL if unparseable
    (doc/raql/expr.ml:291, RamenHelpersNoLog.ml:1067 time_of_abstime).
    Candidate order mirrors the reference: raw epoch float first, then
    the at(1)-style date forms."""
    candidates = [s.try_cast("double")]
    candidates += [
        F.round(
            F.unix_micros(F.try_to_timestamp(s, F.lit(f))) / F.lit(1000000.0)
        ).cast("double")
        for f in _PARSE_TIME_FRAC_FMTS
    ]
    candidates += [
        F.unix_timestamp(F.try_to_timestamp(s, F.lit(f))).cast("double")
        for f in fmts
    ]
    return F.coalesce(*candidates)


# ---------------------------------------------------------------------------
# array ops: percentile / peek / sparkline / histogram-of-array
# ---------------------------------------------------------------------------


def percentile_of_array(arr: Column, p: float) -> Column:
    """p PERCENTILE v — nearest-rank percentile of an array
    (doc/raql/expr.ml:681, CodeGenLib.ml:158-297: index =
    round((n-1) * p/100) of the sorted array)."""
    srt = F.array_sort(arr)
    n = F.size(arr)
    idx = F.round((n - 1) * F.lit(p / 100.0)).cast("int")
    return F.element_at(srt, idx + 1)


def peek_u32_le(s: Column) -> Column:
    """PEEK U32 LITTLE ENDIAN s — first 4 string bytes → u32
    (doc/raql/expr.ml:94). Built-ins only: ascii() of substrings."""
    b = lambda i: F.ascii(F.substring(s, i, 1)).cast("long")  # noqa: E731
    return b(1) + b(2) * 256 + b(3) * 65536 + b(4) * 16777216


def sparkline(arr: Column) -> Column:
    """SPARKLINE — numeric vector → unicode bars ▁▂▃▄▅▆▇█
    (raql_expr.type:133). Higher-order functions only (no UDF)."""
    bars = "▁▂▃▄▅▆▇█"
    mn = F.array_min(arr)
    mx = F.array_max(arr)
    rng = F.when(mx == mn, F.lit(1.0)).otherwise((mx - mn).cast("double"))
    idx = lambda x: F.least(  # noqa: E731
        F.floor(((x - mn).cast("double") / rng) * 8).cast("int"), F.lit(7)
    )
    mapped = F.transform(arr, lambda x: F.substring(F.lit(bars), idx(x) + 1, 1))
    return F.array_join(mapped, "")


def histogram(x: Column, lo: float, hi: float, n_buckets: int) -> Column:
    """HISTOGRAM(x, min, max, n) bucket index for one value: 0 =
    underflow, 1..n in-range, n+1 = overflow (doc/raql/expr.ml:784,
    CodeGenLib.ml:515-540). Aggregate with groupBy(bucket).count() or
    pivot to the u32[n+2] vector shape."""
    w = (hi - lo) / n_buckets
    return (
        F.when(x < lo, F.lit(0))
        .when(x >= hi, F.lit(n_buckets + 1))
        .otherwise(F.floor((x - F.lit(lo)) / F.lit(w)).cast("int") + 1)
    )
