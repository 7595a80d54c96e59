"""Deterministic Bloom filter — broadcast join pruning for the cases
where even the DISTINCT key set of the small side is too big to ship
as an exact relation, but its BITMAP is not.

Training-pipeline extension (no reference counterpart; the nearest
reference surface is the REMEMBER operator's bloom-filter state,
/root/reference/src/raql_expr.type `Remember` — the reference uses
exactly this structure per-worker for novelty detection; here it is a
RELATIONAL artifact any join can prune against). The same idea ships
inside engines as runtime row-level filtering / semi-join reduction;
this is the explicit, persistable form.

Layout: m bits packed 32 per 64-bit word → a (word, bits) relation of
≤ m/32 rows (m = 2²⁰ bits ≈ 32 k rows ≈ 0.5 MB — broadcastable at any
m a driver can hold). Only the low 32 bits of each word are used:
DuckDB raises on `1::BIGINT << 63` (overflow-checked shifts), so
32-bit packing is the widest layout both engines compute identically
— the cross-engine determinism rule (md5 hash families, like the KMV
and CMS sketches) is what makes a Bloom filter ORACLE-CHECKABLE at
all.

Guarantees: NO false negatives (a member always passes — so an exact
join downstream of the prefilter returns exactly its unfiltered
result, pinned by test); false-positive rate ≈ (1 − e^(−kn/m))^k,
the caller's m/k tradeoff.

100 TB shape: the bitmap build is one partial-combined groupBy to
≤ m/32 rows; the probe is k broadcast hash joins (map-side, ZERO
exchange on the probed side) + a row-local bit test — the big side
never shuffles to be pruned. Bitmaps are mergeable (bit_or), the same
persistable-index contract as the sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ramen_spark.operators.sketch import md5_hash48

_BITS_PER_WORD = 32  # NOT 64: see module docstring (DuckDB << overflow)


def _positions(col, m_bits: int, k: int):
    """The k bit positions of a value by DOUBLE HASHING (Kirsch &
    Mitzenmacher 2006): pos_i = (h1 + i·h2) mod m from ONE md5 — the
    asymptotic FP rate is unchanged and the probe pays one hash
    instead of k. (Measured at sf10: the hash swap alone is
    wall-neutral — the md5s were never the bottleneck there — but at
    real crawl shingle volumes k−1 fewer md5s per probed row is free
    headroom, and one-hash probes are what the literature ships.)
    h1 = top 24 bits, h2 = low 24 bits forced odd (odd step +
    power-of-two-friendly m keeps the probe sequence non-degenerate).
    Identical arithmetic in DuckDB."""
    h = md5_hash48(col.cast("string"))
    h1 = F.shiftright(h, 24)
    h2 = h.bitwiseAND(F.lit((1 << 24) - 1)).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(i) * h2) % m_bits for i in range(k)]


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build the (word, bits) bitmap relation over a column's values.
    Deterministic, mergeable (union two bitmaps with
    groupBy(word).agg(bit_or(bits)))."""
    if m_bits < _BITS_PER_WORD or k < 1:
        raise ValueError("bloom_build needs m_bits >= 32 and k >= 1")
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("_pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("_pos"), 5).cast("int").alias("word"),
            F.col("_pos").bitwiseAND(F.lit(31)).cast("int").alias("_bit"),
        )
        .select(
            "word",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_bit AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame, col: str, bitmap: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """Filter ``df`` to the rows whose ``col`` MIGHT be in the set the
    bitmap was built over (false positives possible at the configured
    rate; false negatives never). k broadcast left joins + a row-local
    bit test — the probed side never shuffles. m_bits and k MUST match
    the build call (a mismatch silently probes wrong bits — they are
    parameters, not metadata, by design: the bitmap stays a plain
    relation any engine can persist)."""
    if m_bits < _BITS_PER_WORD or k < 1:
        raise ValueError("bloom_might_contain needs m_bits >= 32 and k >= 1")
    out = df
    helper: list[str] = []
    cond = F.lit(True)
    for i, pos in enumerate(_positions(F.col(col), m_bits, k)):
        w, b, m, bits = f"_w{i}", f"_bit{i}", f"_m{i}", f"_bits{i}"
        helper += [w, b, m, bits]
        out = (
            out.withColumn(w, F.shiftright(pos, 5).cast("int"))
            .withColumn(b, pos.bitwiseAND(F.lit(31)).cast("int"))
            .withColumn(
                m, F.expr(f"shiftleft(CAST(1 AS BIGINT), {b})")
            )
        )
        bm = F.broadcast(
            bitmap.select(
                F.col("word").alias(f"{w}_key"), F.col("bits").alias(bits)
            )
        )
        out = out.join(bm, out[w] == bm[f"{w}_key"], "left").drop(f"{w}_key")
        cond = cond & (
            F.coalesce(F.col(bits), F.lit(0)).bitwiseAND(F.col(m)) != 0
        )
    return out.filter(cond).drop(*helper)
