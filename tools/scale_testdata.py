"""Scale the driver's sf0.1 testdata to an sfN-equivalent (bench-only).

TESTDATA.md's generator isn't available (testdata is read-only driver
output), so the 10× bench tier is derived from sf0.1 with per-table
transforms chosen to preserve each headline query's SCALE SHAPE — the
point is catching scale cliffs (join fan-out, candidate-pair blowup,
per-group growth), not TPC-H fidelity:

- fact tables (lineitem, orders, events): N shifted copies — unique
  keys offset per copy so key cardinality grows linearly; event
  timestamps are kept, so time-window groups get N× rows each (a
  higher event rate over the same wall-clock, the reference's own
  scaling axis);
- events.user_id shifts per copy → user cardinality (top-k keyset,
  per-user groups) also grows linearly;
- documents: doc_id shifts AND copies > 0 get every token suffixed
  with a copy tag — intra-copy near-dup structure (shingle-set
  isomorphism) is preserved exactly, while cross-copy Jaccard drops
  to 0 so candidate pairs scale ~linearly like a real corpus (naive
  duplication would square them);
- embeddings: vec_id shifts and copies > 0 get a deterministic
  per-element perturbation, so LSH/IVF buckets don't fill with exact
  clones;
- dimension tables (region…customer) stay single-copy: they remain
  broadcast-sized at any realistic fact scale, which is exactly the
  plan shape worth benching.

Usage: python tools/scale_testdata.py [factor] [src] [dst]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY_OFFSET = 10_000_000  # above every sf0.1 key domain
USER_OFFSET = 1_000_000

DIMS = ["region", "nation", "part", "supplier", "customer"]
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _fan_out(df: DataFrame, table: str, factor: int) -> DataFrame:
    """All ``factor`` key-shifted copies in ONE plan: explode a copy
    index per row and express every per-copy transform over the ``_c``
    column. (The previous shape — ``factor`` DataFrames chained with
    unionByName — built an O(factor)-branch plan that OOM'd the
    driver at factor=1000.)"""
    out = df.select(
        "*",
        F.explode(
            # long copy index: an INT _c overflows _c * KEY_OFFSET in
            # int32 beyond factor ≈ 214
            F.sequence(F.lit(0).cast("long"), F.lit(factor - 1).cast("long"))
        ).alias("_c"),
    )
    for k in FACTS[table]:
        out = out.withColumn(k, F.col(k) + F.col("_c") * F.lit(KEY_OFFSET))
    if table == "events":
        out = out.withColumn(
            "user_id", F.col("user_id") + F.col("_c") * F.lit(USER_OFFSET)
        )
    elif table == "documents":
        # suffix every token on copies > 0: shingle sets stay
        # isomorphic within the copy, disjoint across copies
        out = out.withColumn(
            "text",
            F.when(F.col("_c") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1zc"), F.col("_c").cast("string")),
                )
            ),
        )
    elif table == "embeddings":
        # hash-based iid perturbation, amplitude ±0.3. Two measured
        # tier artifacts forced this exact form:
        # - amplitude ±0.05 over 64 dims keeps cross-copy cosine at
        #   ≈ 0.96, ABOVE the 0.95 near-dup threshold — every base
        #   became a clique of `factor` mutual near-dups and pairwise
        #   outputs grew quadratically in the factor (~10⁹ pairs at
        #   factor=1000, which no real corpus has);
        # - sin(vec_id + 7i + 13c) is a ONE-PARAMETER family: every
        #   perturbation lies on a single closed curve in R^64, so all
        #   2 M vectors concentrated in ~4.7 k of 65 k LSH buckets
        #   (max occupancy 26 k, Σocc² = 9 G candidate pairs).
        # xxhash64 per (vec_id, element, copy) scatters directions;
        # ±0.3 vs unit-norm bases gives cross-copy cosine ≈ 0.6.
        out = out.withColumn(
            "embedding",
            F.when(F.col("_c") == 0, F.col("embedding")).otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i, F.col("_c")),
                                F.lit(2001),
                            )
                            - 1000
                        ).cast("double")
                        / 1000.0
                        * 0.3
                    ).cast("float"),
                )
            ),
        )
    # contiguous copy runs inside each partition (no extra shuffle):
    # interleaving copies of the same base row was measured ~15%
    # slower to scan+shuffle downstream (worse parquet compression
    # locality for the token-salted text)
    return out.sortWithinPartitions("_c").drop("_c")


# --- adversarial-skew documents tier (VERDICT r5 #2 / r6 #3) -------------
#
# The plain tiers keep shingle doc-frequencies near-uniform (token
# salting makes copies disjoint), so the hot-shingle cutoff, the
# AllPairs length filter, the span-hash count windows, and the
# temperature-mix group window were all benched in the EASY regime.
# This tier manufactures the two skew shapes real corpora have:
#
# - boilerplate: ~3% of docs (doc_id % 100 < 3, stable across copies
#   because KEY_OFFSET % 100 == 0) get an identical 12-token header
#   prepended AFTER copy-salting — its shingles reach df ≈ 0.03·N
#   corpus-wide (18 k at the 100× tier), far beyond any cutoff, and
#   its 10-token spans make span-hash groups of the same size;
# - a Zipf token tail: 20 tokens per doc drawn rank r =
#   ⌊exp(u·ln V)⌋ with u = xxhash64(doc_id, i)/2³² uniform — p(r) ∝
#   1/r over V = 50 k, shared across copies, so shingle df follows a
#   heavy tail through the 100–1000 band that drives Σdf² under the
#   cutoff (the regime SCALE §7's prefix-filter decision assumed
#   away);
# - language skew: 90% of docs reassigned to 'en', making the
#   temperature-mix rank window one hot group.

BOILERPLATE = (
    "terms of service apply all rights reserved click here to "
    "subscribe now unsubscribe"
)
ZIPF_VOCAB = 50_000
ZIPF_TAIL = 20


def _skew_documents(df: DataFrame) -> DataFrame:
    import math

    def zipf_tok(i: int):
        u = (
            F.pmod(
                F.xxhash64(F.col("doc_id"), F.lit(i)), F.lit(2**32)
            ).cast("double")
            / float(2**32)
        )
        return F.concat(
            F.lit("zw"),
            F.floor(F.exp(u * math.log(ZIPF_VOCAB)))
            .cast("long")
            .cast("string"),
        )

    tail = F.concat_ws(" ", *[zipf_tok(i) for i in range(ZIPF_TAIL)])
    text = F.concat_ws(" ", F.col("text"), tail)
    text = F.when(
        F.col("doc_id") % 100 < 3, F.concat_ws(" ", F.lit(BOILERPLATE), text)
    ).otherwise(text)
    lang = F.when(F.col("doc_id") % 10 < 9, F.lit("en")).otherwise(
        F.col("lang")
    )
    return df.withColumn("text", text).withColumn("lang", lang)


HOT_CLUSTER_FRAC_MOD = 10  # vec hot when hash % 10 < 3 (30%)
HOT_CLUSTER_K = 4
HOT_CLUSTER_PULL = 0.4  # additive centroid weight. Calibration note
# (a first attempt hit the §5 generator-artifact trap): centroid
# elements ~U(-1,1) give |c| ≈ √(64/3) ≈ 4.6 vs ~unit vectors, so a
# convex 0.55 blend made the shared centroid DOMINATE — cluster-mate
# cosine ≥ 0.95 and 784 k manufactured near-dup pairs (quadratic
# cliques no real corpus has; measured 187 s). Additive x + 0.4·c
# keeps the shared component at s·|c| ≈ 1.8 vs |x| ≈ 1-1.7 →
# cluster-mate cosine ≈ 0.5-0.8: hot LSH buckets (the stress), few
# above-0.95 true pairs (the realism).


def _skew_embeddings(df: DataFrame) -> DataFrame:
    """30% of vectors pulled toward one of 4 shared pseudo-random
    centroids (deterministic, element-wise xxhash64): LSH bucket
    occupancy and IVF cell sizes go heavy-tailed, the adaptive
    n_planes / occupancy knobs' actual stress case."""
    # key cluster membership on the BASE id (vec_id mod KEY_OFFSET):
    # every copy of a base gets the IDENTICAL pull, so planted
    # near-dup pairs keep their cosine (a shared additive component
    # raises it slightly) and the detector still has true positives
    # to find — keying on the raw vec_id instead silently broke every
    # pair with exactly one hot member (measured: output went to 0)
    base_id = F.pmod(F.col("vec_id"), F.lit(KEY_OFFSET))
    k = F.pmod(F.xxhash64(base_id, F.lit("cluster")), F.lit(HOT_CLUSTER_K))
    is_hot = (
        F.pmod(F.xxhash64(base_id, F.lit("hot")), F.lit(HOT_CLUSTER_FRAC_MOD))
        < 3
    )
    w = float(HOT_CLUSTER_PULL)

    def centroid_elem(i):
        return (
            (F.pmod(F.xxhash64(k, i, F.lit(999)), F.lit(2001)) - 1000).cast(
                "double"
            )
            / 1000.0
        )

    blended = F.transform(
        "embedding",
        lambda x, i: (x + centroid_elem(i) * w).cast("float"),
    )
    return df.withColumn(
        "embedding", F.when(is_hot, blended).otherwise(F.col("embedding"))
    )


def scale_skewed_documents(
    spark: SparkSession, src: str, dst: str, factor: int = 100
) -> None:
    """Documents + embeddings skewed tier (the six stress queries
    read nothing else)."""
    os.makedirs(dst, exist_ok=True)
    n_parts = max(32, min(1024, factor))
    base = spark.read.parquet(f"{src}/documents.parquet")
    out = _skew_documents(
        _fan_out(base.repartition(n_parts), "documents", factor)
    )
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    out_e = _skew_embeddings(
        _fan_out(emb.repartition(n_parts), "embeddings", factor)
    )
    out_e.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    with open(os.path.join(dst, "_VERSION"), "w") as fh:
        fh.write(_generator_version(src, factor))


def _generator_version(src: str = "", factor: int = 0) -> str:
    """Identity of a generated tier: hash of this module's source PLUS
    the (src, factor) pair — bench.py regenerates a cached tier when
    the generator changed OR when the cache was built from a different
    source dir / scale factor (review finding: a tier generated from
    sf0.01 would otherwise be silently benched as the sf0.1-derived
    one under the same path)."""
    import hashlib

    with open(os.path.abspath(__file__), "rb") as fh:
        h = hashlib.md5(fh.read()).hexdigest()
    return f"{h}:{os.path.abspath(src) if src else ''}:{factor}"


def tier_is_current(dst: str, src: str = "", factor: int = 0) -> bool:
    try:
        return (
            open(os.path.join(dst, "_VERSION")).read()
            == _generator_version(src, factor)
        )
    except OSError:
        return False


def scale(spark: SparkSession, src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    for t in FACTS:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        # pre-split the SMALL base so each writer's slice of the
        # factor-times-larger generated output stays row-group sized —
        # the repartition shuffle moves base bytes, never generated
        n_parts = max(32, min(1024, factor))
        out = _fan_out(base.repartition(n_parts), t, factor)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    with open(os.path.join(dst, "_VERSION"), "w") as fh:
        fh.write(_generator_version(src, factor))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sf1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        # 32 concurrent writer tasks each sort+buffer a generated
        # partition; the 1 GB default heap OOMs at factor ≥ 100
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .appName("scale_testdata")
        .getOrCreate()
    )
    scale(spark, src, dst, factor)
    print(f"wrote {dst} at {factor}x {src}")
    spark.stop()


if __name__ == "__main__":
    main()
