"""Corpus-mixing samplers — the data-weighting stage of an LLM
training pipeline.

Not in the reference's surface (training-pipeline extension, like
operators.dedup / operators.packing): a raw crawl over-represents its
largest domains, so training mixtures re-weight groups by a
temperature exponent before sampling (the multilingual-sampling rule
popularized by the mBERT/XLM-R and GPT-3/The-Pile data work:
p(group) ∝ n_group^alpha with alpha < 1 flattening the distribution).

Everything here is DETERMINISTIC — selection is by md5-hash rank, not
RNG — so reruns, retries and the DuckDB oracle reproduce the sample
bit-for-bit. That property is what makes sampling usable inside a
fault-tolerant pipeline: a re-executed partition must not change the
sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temperature_mix(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-weighted mixture sampling: keep ~``target_frac`` of
    the corpus, re-balanced across ``group_col`` by ``alpha``.

    Per group g with n_g rows, the mixture weight is
    w_g = n_g^alpha / Σ n^alpha; the per-group quota is
    round(target_total · w_g), clamped to n_g (downsampling only — an
    upsampled group would need row replication, which belongs in the
    epoch schedule, not the sample; a clamped group is visible in the
    output as ``quota == group_total``). alpha = 1 keeps natural
    proportions, alpha = 0 gives every group the same quota.

    Selection inside a group is by rank of md5(id) — a deterministic
    uniform order, with the id as tie-break so the rank is total.

    Determinism caveat: the normalizer Σ n^alpha is a float sum, and
    float addition is not associative — Spark may combine partials in
    a different order across runs/partitionings, shifting ``_z`` by an
    ulp. A group whose quota expression lands exactly on a .5 rounding
    boundary can therefore flip by ±1 row between runs. Row selection
    within the quota stays deterministic (md5 rank); only the boundary
    quota itself carries this ulp sensitivity.

    100 TB shape: group statistics are one map-side-combinable
    count per group (a relation of |groups| rows that AQE broadcasts
    back), and the rank is one window partitioned by group — the only
    shuffle, on the same key the downstream mixture is consumed by.
    The skew that motivates the temperature is carried by the window's
    per-group partitions; a pathologically-hot group can be salted by
    pre-splitting into shards and taking quota/shards per shard.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(
        F.sum("_n").alias("_total"),
        F.sum(F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))).alias(
            "_z"
        ),
    )
    quotas = counts.crossJoin(tot).select(
        F.col(group_col),
        F.col("_n"),
        F.least(
            F.col("_n"),
            F.round(
                F.lit(float(target_frac))
                * F.col("_total")
                * F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
                / F.col("_z")
            ).cast("long"),
        ).alias("_quota"),
    )
    win = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "_rk", F.row_number().over(win)
    )
    return (
        ranked.join(quotas, group_col)
        .filter(F.col("_rk") <= F.col("_quota"))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("_n").cast("bigint").alias("group_total"),
            F.col("_quota").cast("bigint").alias("quota"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how target-like its hashed-unigram distribution is.
    ``target_pred`` is a boolean Column marking the in-domain
    exemplars (e.g. ``F.col("lang") == "en"``); both bucket models are
    estimated from the corpus itself in one pass.

    Per hash bucket b (md5 48-bit % n_buckets, the oracle-reproducible
    hash of functions.text.md5_hash_pair): the target model counts
    tokens of target docs, the raw model counts all tokens, both
    add-one smoothed. The per-bucket log importance ratio
    ln(p_target(b) / p_raw(b)) is FROZEN TO INTEGER MICRO-NATS
    (round(·×1e6)) before any per-document use, so document scores are
    integer sums — exact, order-independent, and bit-identical in the
    DuckDB oracle regardless of how Spark combines partials (the
    float-sum ulp caveat of temperature_mix does not apply here).

    Output: (id_col, n_tokens, score_micro, avg_logratio) — one row
    per document with ≥1 token. Selection composes downstream: rank
    by avg_logratio with operators.topk or gate at a threshold;
    upsampling-with-replacement belongs in the epoch schedule.

    100 TB shape: one groupBy on the int bucket key (≤ n_buckets
    groups, map-side combinable), a crossJoin with a 1-row totals
    relation, an AQE-broadcast join of the ≤4096-row weight table back
    onto the exploded tokens, and one groupBy on the doc id. No text
    ever rides a shuffle key; the weight model is O(n_buckets), not
    O(vocab)."""
    from ramen_spark.functions.text import md5_hash_pair, tokens

    B = int(n_buckets)
    tok = docs.select(
        F.col(id_col),
        target_pred.cast("int").alias("_is_t"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    )
    h1, _ = md5_hash_pair(F.col("_tok"))
    bucketed = tok.select(id_col, "_is_t", (h1 % B).alias("_bk"))
    cnt = bucketed.groupBy("_bk").agg(
        F.count(F.lit(1)).alias("_c_r"), F.sum("_is_t").alias("_c_t")
    )
    tot = cnt.agg(F.sum("_c_r").alias("_r"), F.sum("_c_t").alias("_t"))
    weights = cnt.crossJoin(tot).select(
        F.col("_bk"),
        F.round(
            F.log(
                ((F.col("_c_t") + F.lit(1.0)) * (F.col("_r") + F.lit(B)))
                / ((F.col("_c_r") + F.lit(1.0)) * (F.col("_t") + F.lit(B)))
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("_w"),
    )
    return (
        bucketed.join(weights, "_bk")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("_w").cast("bigint").alias("score_micro"),
        )
        .withColumn(
            "avg_logratio",
            F.round(
                F.col("score_micro").cast("double") / 1e6 / F.col("n_tokens"), 6
            ),
        )
    )
