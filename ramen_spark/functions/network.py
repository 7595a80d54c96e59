"""Network types & operators: Eth, IPv4/IPv6, CIDR, GeoIP.

Reference type lattice: src/raql_type.ml:34-40 (Eth, Ipv4, Ipv6, Ip,
Cidrv4, Cidrv6, Cidr). Representation here (SURVEY §1.2):

- IPv4  → LongType (0..2^32-1) + dotted-quad formatter.
- Eth   → LongType (48-bit)   + colon-hex formatter.
- IPv6  → 16-byte BinaryType (lexicographic compare == numeric compare).
- CIDRv4 → struct<addr:long, mask:int>.

All helpers are built-in expression compositions (bit math stays inside
whole-stage codegen); nothing here needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# IPv4
# ---------------------------------------------------------------------------


def ipv4_to_string(ip: Column) -> Column:
    """Dotted-quad text of a long-encoded IPv4 (src/RamenIpv4.ml)."""
    return F.concat_ws(
        ".",
        ((ip / (1 << 24)) % 256).cast("long").cast("string"),
        ((ip / (1 << 16)) % 256).cast("long").cast("string"),
        ((ip / (1 << 8)) % 256).cast("long").cast("string"),
        (ip % 256).cast("long").cast("string"),
    )


def string_to_ipv4(s: Column) -> Column:
    """Parse dotted-quad → long; NULL on malformed input."""
    p = F.split(s, r"\.")
    ok = (F.size(p) == 4) & s.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    val = (
        F.element_at(p, 1).cast("long") * (1 << 24)
        + F.element_at(p, 2).cast("long") * (1 << 16)
        + F.element_at(p, 3).cast("long") * (1 << 8)
        + F.element_at(p, 4).cast("long")
    )
    in_range = (
        (F.element_at(p, 1).cast("int") <= 255)
        & (F.element_at(p, 2).cast("int") <= 255)
        & (F.element_at(p, 3).cast("int") <= 255)
        & (F.element_at(p, 4).cast("int") <= 255)
    )
    return F.when(ok & in_range, val)


def string_to_ipv6(s: Column) -> Column:
    """IPv6 text → 16-byte binary (src/RamenIpv6.ml of_string): full
    8-hextet and ``::``-compressed forms; the embedded-IPv4 dot form
    (``::ffff:1.2.3.4``) is not parsed. Unparsable → NULL. Pure
    expression composition — stays inside whole-stage codegen."""
    two = F.split(s, "::", -1)
    has_comp = F.size(two) == 2

    def hextets_of(c: Column) -> Column:
        return F.filter(F.split(c, ":"), lambda x: F.length(x) > 0)

    left = hextets_of(F.element_at(two, 1))
    right = F.when(has_comp, hextets_of(F.element_at(two, 2))).otherwise(
        F.array().cast("array<string>")
    )
    nmiss = (F.lit(8) - F.size(left) - F.size(right)).cast("int")
    hextets = F.concat(left, F.array_repeat(F.lit("0"), nmiss), right)
    valid = (
        (F.size(two) <= 2)
        & ~s.contains(":::")
        & (has_comp | (F.size(left) == 8))
        & (F.size(hextets) == 8)
        & F.forall(hextets, lambda x: x.rlike("^[0-9A-Fa-f]{1,4}$"))
    )
    packed = F.unhex(
        F.concat_ws("", F.transform(hextets, lambda x: F.lpad(F.lower(x), 4, "0")))
    )
    return F.when(valid, packed).otherwise(F.lit(None).cast("binary"))


def ip_in_cidr_generic(ip: Column, cidr: Column) -> Column:
    """Generic ``ip IN cidr`` over the sum structs
    (ip<version,v4,v6>, cidr<version,addr4,addr6,mask>) with a DYNAMIC
    mask column (ip.ramen f5). Built-ins only:

    - v4: numeric range around the masked base (dynamic shift via
      pow/floor — shiftleft needs a literal).
    - v6: hex-prefix compare at nibble granularity, remainder nibble
      via conv(); unsigned lexicographic binary semantics.
    """
    ver_ok = ip.getField("version") == cidr.getField("version")
    mask = cidr.getField("mask")

    p4 = F.pow(F.lit(2.0), (32 - mask).cast("double")).cast("long")
    base = (F.floor(cidr.getField("addr4") / p4) * p4).cast("long")
    v4 = ip.getField("v4")
    v4_ok = (v4 >= base) & (v4 < base + p4)

    iph = F.hex(ip.getField("v6"))
    nh = F.hex(cidr.getField("addr6"))
    fnib = F.floor(mask / 4).cast("int")  # full hex nibbles in prefix
    rem = (mask % 4).cast("int")  # leftover bits inside the next nibble
    pre_ok = F.substring(iph, F.lit(1), fnib) == F.substring(nh, F.lit(1), fnib)
    nib = lambda h: F.conv(F.substring(h, fnib + 1, F.lit(1)), 16, 10).cast("int")  # noqa: E731
    shift = F.pow(F.lit(2.0), (4 - rem).cast("double"))
    rem_ok = F.when(rem == 0, F.lit(True)).otherwise(
        F.floor(nib(iph) / shift) == F.floor(nib(nh) / shift)
    )
    v6_ok = pre_ok & rem_ok

    return ver_ok & F.when(ip.getField("version") == 4, v4_ok).otherwise(v6_ok)


def ip_family(ip_struct: Column) -> Column:
    """IPFAMILY — 4 or 6 (doc/raql/expr.ml:385); takes the sum-type
    struct<version, v4, v6> encoding of Ip."""
    return ip_struct.getField("version")


# ---------------------------------------------------------------------------
# CIDR (v4) — struct<addr:long, mask:int>
# ---------------------------------------------------------------------------


def cidr_v4(addr: Column, mask: Column | int) -> Column:
    mask = mask if isinstance(mask, Column) else F.lit(mask)
    return F.struct(addr.cast("long").alias("addr"), mask.cast("int").alias("mask"))


def begin_of_range(cidr: Column) -> Column:
    """BEGINOFRANGE cidr (raql_expr.type:130, CodeGenLib.ml:1085)."""
    addr, mask = cidr.getField("addr"), cidr.getField("mask")
    block = F.pow(F.lit(2.0), (32 - mask).cast("double")).cast("long")
    return (F.floor(addr / block) * block).cast("long")


def end_of_range(cidr: Column) -> Column:
    """ENDOFRANGE cidr — last address of the block (CodeGenLib.ml:1088)."""
    addr, mask = cidr.getField("addr"), cidr.getField("mask")
    block = F.pow(F.lit(2.0), (32 - mask).cast("double")).cast("long")
    return (F.floor(addr / block) * block + block - 1).cast("long")


def cidr_contains(cidr: Column, ip: Column) -> Column:
    """``ip IN cidr`` membership (doc/raql/expr.ml:626 'IP IN CIDR')."""
    return (ip >= begin_of_range(cidr)) & (ip <= end_of_range(cidr))


# ---------------------------------------------------------------------------
# Eth
# ---------------------------------------------------------------------------


def eth_to_string(mac: Column) -> Column:
    """48-bit long → 'aa:bb:cc:dd:ee:ff' (src/RamenEthAddr.ml)."""
    hx = F.lpad(F.lower(F.hex(mac)), 12, "0")
    return F.concat_ws(
        ":", *[F.substring(hx, i, 2) for i in (1, 3, 5, 7, 9, 11)]
    )


# ---------------------------------------------------------------------------
# GeoIP: COUNTRYCODE (doc/raql/expr.ml:366, src/CountryOfIp.ml)
# ---------------------------------------------------------------------------


def countrycode_join(df: DataFrame, ip_col: str, ranges: DataFrame, out_col: str = "country") -> DataFrame:
    """COUNTRYCODE ip — range lookup via broadcast interval join.

    ``ranges`` has (ip_from, ip_to, cc) like the reference's bundled
    IpToCountry.csv (src/CountryOfIp.ml:1-17). The range table is small
    (~200k rows) → broadcast; the range predicate is evaluated
    map-side, so this scales to any fact-table size without a shuffle.
    """
    r = F.broadcast(ranges)
    cond = (F.col(ip_col) >= r["ip_from"]) & (F.col(ip_col) <= r["ip_to"])
    return df.join(r, cond, "left").withColumnRenamed("cc", out_col).drop("ip_from", "ip_to")


def load_ip_to_country(path: str) -> list[tuple[int, int, str]]:
    """Parse the public Webnet77/software77 IpToCountry.csv[.gz] the
    reference bundles (src/CountryOfIp.ml loads the same file):
    quoted rows "ip_from","ip_to","registry","assigned","ctry",….
    Returns sorted (ip_from, ip_to, cc) tuples for COUNTRYCODE."""
    import csv
    import gzip
    import io

    opener = gzip.open if path.endswith(".gz") else open
    out: list[tuple[int, int, str]] = []
    with opener(path, "rb") as fh:
        text = io.TextIOWrapper(fh, encoding="utf-8", errors="replace")
        for row in csv.reader(text):
            if not row or row[0].lstrip().startswith("#"):
                continue
            try:
                out.append((int(row[0]), int(row[1]), row[4]))
            except (ValueError, IndexError):
                continue
    out.sort()
    return out


def countrycode_expr(ip: Column, ranges: list[tuple[int, int, str]]) -> Column:
    """COUNTRYCODE as a COLUMN: Arrow-batched binary search over the
    (sorted) ranges, broadcast to executors in the UDF closure —
    NULL outside every range (reference behavior for unknown IPs).
    For relational pipelines prefer ``countrycode_join`` (broadcast
    interval join, no Python); this form exists for the RaQL
    expression position where COUNTRYCODE composes with arbitrary
    scalar expressions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rs = sorted(ranges)
    fr = np.array([r[0] for r in rs], dtype=np.float64)
    to = np.array([r[1] for r in rs], dtype=np.float64)
    cc = np.array([r[2] for r in rs], dtype=object)

    # NB: no type hints — `from __future__ import annotations` turns
    # them into strings pandas_udf can't resolve from this scope
    def _lookup(v):
        x = v.to_numpy(dtype="float64", na_value=np.nan)
        idx = np.searchsorted(fr, x, side="right") - 1
        ok = (idx >= 0) & ~np.isnan(x)
        idx = np.clip(idx, 0, len(fr) - 1)
        ok &= x <= to[idx]
        res = np.where(ok, cc[idx], None)
        return pd.Series(res, dtype=object)

    _lookup.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_lookup, "string")(ip.cast("double"))


def load_ip_to_country6(path: str) -> list[tuple[int, int, str]]:
    """Parse the bundled IpToCountry.6R.csv[.gz]: rows
    ``start_ip6-end_ip6,cc,registry,assigned`` with textual IPv6
    bounds → sorted (start_int, end_int, cc) 128-bit ranges."""
    import csv
    import gzip
    import io
    import ipaddress

    opener = gzip.open if path.endswith(".gz") else open
    out: list[tuple[int, int, str]] = []
    with opener(path, "rb") as fh:
        text = io.TextIOWrapper(fh, encoding="utf-8", errors="replace")
        for row in csv.reader(text):
            if not row or row[0].lstrip().startswith("#") or "-" not in row[0]:
                continue
            try:
                lo_s, hi_s = row[0].split("-", 1)
                out.append(
                    (
                        int(ipaddress.IPv6Address(lo_s.strip())),
                        int(ipaddress.IPv6Address(hi_s.strip())),
                        row[1],
                    )
                )
            except (ValueError, IndexError, ipaddress.AddressValueError):
                continue
    out.sort()
    return out


def countrycode_expr6(ip6: Column, ranges6: list[tuple[int, int, str]]) -> Column:
    """COUNTRYCODE over the 16-byte IPv6 binary lane: exact 128-bit
    bisect per value inside an Arrow-batched UDF (doubles would lose
    precision past 2^53; the range bounds are full 128-bit)."""
    import bisect

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rs = sorted(ranges6)
    starts = [r[0] for r in rs]

    def _lookup(v):
        out = []
        for b in v:
            if b is None:
                out.append(None)
                continue
            x = int.from_bytes(bytes(b), "big")
            i = bisect.bisect_right(starts, x) - 1
            out.append(rs[i][2] if i >= 0 and x <= rs[i][1] else None)
        return pd.Series(out, dtype=object)

    _lookup.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_lookup, "string")(ip6)
