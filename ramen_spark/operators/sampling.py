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


def lm_perplexity_buckets(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 4096,
) -> DataFrame:
    """CCNet-style LM-perplexity quality bucketing (Wenzek et al.
    2020, "CCNet: Extracting high quality monolingual datasets from
    web crawl data"): score every document by its cross-entropy under
    a target language model, then split EACH LANGUAGE into
    head/middle/tail perplexity tertiles — the quality strata
    downstream pipelines sample from. CCNet's model is a KenLM 5-gram
    trained on Wikipedia; this engine estimates a hashed word-BIGRAM
    model from the corpus' own ``target_pred`` slice (no external
    model artifact), which keeps the operator self-contained and the
    oracle exact while preserving the pipeline shape (fixed reference
    model → per-doc nats → per-language tertiles).

    Per hash bucket b (48-bit md5 % n_buckets): the target model
    counts bigrams of target docs, add-one smoothed over the bucket
    space; ln p(b) is FROZEN TO INTEGER MICRO-NATS per bucket (the
    dsir_importance determinism rule) so per-document cross-entropy
    is an integer sum — order-independent and bit-identical in the
    DuckDB oracle. Output per document with ≥1 bigram:
    (id, lang, n_bigrams, avg_nats, ppl_bucket) where ppl_bucket is
    head (most target-like third of its language), middle, or tail.

    100 TB shape: one explode row per token carrying an int bucket
    key, one ≤n_buckets groupBy (map-side combinable), the ≤4096-row
    weight table AQE-broadcast back onto the stream, one groupBy on
    the doc id, and one per-language window over the ONE-ROW-PER-DOC
    relation (not the token stream). No text on any shuffle key; the
    model is O(n_buckets), not O(vocab²).
    """
    from ramen_spark.functions.text import md5_hash_pair, tokens, window_starts

    B = int(n_buckets)
    # guard FIRST (round 13, ADVICE r12): the weight table below is
    # collected to a driver-side literal, so the bound must hold — and
    # it must be checked before any DataFrame work, because cnt's
    # localCheckpoint fires a full corpus scan at construction time
    # (an invalid B used to pay that job just to raise).
    if B > (1 << 16):
        raise ValueError(
            f"n_buckets={B} exceeds the collectable weight-table bound "
            "(65536); shrink the bucket space or restore the join path"
        )
    toks = docs.select(
        F.col(id_col),
        F.col(lang_col),
        target_pred.cast("int").alias("_is_t"),
        tokens(F.col(text_col)).alias("_w"),
    )
    w = F.col("_w")
    bigram = F.transform(
        window_starts(F.size(w), 2),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1)
        ),
    )
    # model pass: only TARGET docs are exploded (round 12 — the
    # non-target slice never contributes to cnt/tot, so hashing it
    # here was pure waste; the scoring side no longer reads this
    # relation at all, see below)
    big = toks.filter(F.col("_is_t") == 1).select(
        id_col, lang_col, "_is_t", F.explode(bigram).alias("_bg")
    )
    h1, _ = md5_hash_pair(F.col("_bg"))
    bucketed = big.select(id_col, lang_col, "_is_t", (h1 % B).alias("_bk"))
    # cnt feeds BOTH the per-bucket weights and (by summation) the
    # target-bigram total — localCheckpoint so the token stream is
    # exploded/hashed ONCE for the model side instead of twice
    # (round 12; tot was previously a second full pass over
    # ``bucketed`` — Σ cnt._c IS the target-bigram count).
    cnt = (
        bucketed.groupBy("_bk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint()
    )
    # coalesce: an all-non-target corpus must yield _t = 0 (what
    # sum(_is_t) over the stream gave), not NULL from the empty agg
    tot = cnt.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("_t")
    )
    # weight EVERY bucket (unseen buckets get the add-one floor), so
    # the doc-side join is a plain inner join on a complete table
    weights = (
        docs.sparkSession.range(B)
        .select(F.col("id").cast("long").alias("_bk"))
        .join(cnt, "_bk", "left")
        .crossJoin(tot)
        .select(
            "_bk",
            F.round(
                F.log(
                    (F.coalesce(F.col("_c"), F.lit(0)) + F.lit(1.0))
                    / (F.col("_t") + F.lit(B))
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("_wm"),
        )
    )
    # scoring pass (round 12): the weight table is bounded at B rows
    # by construction, so it collects to an ARRAY LITERAL (the
    # kmeans-centroid bounded-driver-traffic precedent; B ≤ 2^16
    # guard below) and per-document cross-entropy becomes a ROW-LOCAL
    # integer fold over the doc's own bigrams — no second explode of
    # the token stream, no broadcast-join probe, no per-doc
    # aggregation Exchange. Exact: _wm values are integer micro-nats,
    # so the fold's sum is order-independent (the dsir determinism
    # rule); n_bigrams = max(|w|−1, 0) is what the explode counted.
    # The token array is LET-BOUND via a single-element transform so
    # CollapseProject cannot re-inline tokens(text) per element_at
    # (the tf-fold lesson, measured 60× — OPTIMIZATION_r12.md).
    # ONE array literal, not B per-element F.lit nodes (round 13,
    # VERDICT r12 #4): near the 65536 guard bound the per-element form
    # builds a Catalyst tree with 2^16 Literal children — O(B) to
    # analyze/serialize per use; F.lit(list) is a single
    # Literal(ArrayData) node of O(1) tree size at any B.
    wvals = [int(r["_wm"]) for r in weights.orderBy("_bk").collect()]
    arr = F.lit(wvals).cast("array<long>")

    def _score(wv):
        nb = F.greatest(F.size(wv) - 1, F.lit(0))
        ce = F.aggregate(
            window_starts(F.size(wv), 2),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            - F.element_at(
                arr,
                (
                    md5_hash_pair(
                        F.concat_ws(
                            " ",
                            F.element_at(wv, i),
                            F.element_at(wv, i + 1),
                        )
                    )[0]
                    % B
                    + 1
                ).cast("int"),
            ),
        )
        return F.struct(
            nb.cast("bigint").alias("nb"), ce.cast("bigint").alias("ce")
        )

    stat = F.element_at(F.transform(F.array(w), _score), 1)
    per_doc = (
        toks.select(id_col, lang_col, stat.alias("_st"))
        .filter(F.col("_st.nb") > 0)
        .select(
            id_col,
            lang_col,
            F.col("_st.nb").alias("n_bigrams"),
            F.round(
                F.col("_st.ce").cast("double") / 1e6 / F.col("_st.nb"), 6
            ).alias("avg_nats"),
        )
    )
    tert = Window.partitionBy(lang_col).orderBy(
        F.col("avg_nats").asc(), F.col(id_col).asc()
    )
    return per_doc.select(
        id_col,
        lang_col,
        "n_bigrams",
        "avg_nats",
        F.when(F.ntile(3).over(tert) == 1, F.lit("head"))
        .when(F.ntile(3).over(tert) == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


def epoch_schedule(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    epoch_tokens_frac: float = 1.0,
) -> DataFrame:
    """Epoch schedule with replacement — the upsampling half that
    ``temperature_mix`` deliberately leaves out (its quotas clamp at
    n_g; training mixtures like GPT-3/The-Pile instead repeat small
    high-weight groups: The Pile trains Wikipedia ~3 epochs while
    Common Crawl sees <1). Emits one row PER SCHEDULED COPY:
    (id, group, epoch_copy, n_copies) where Σ n_copies over a group ≈
    its temperature quota and epoch_copy numbers the repeats 1..c.

    Quota_g = round(epoch_total · n_g^alpha / Σ n^alpha) with
    epoch_total = epoch_tokens_frac · N — NOT clamped. Every doc in g
    gets ⌊quota/n_g⌋ copies; the quota remainder goes one copy each to
    the quota%n_g docs ranked first by md5(id) — the same
    deterministic draw as temperature_mix, so reruns and the oracle
    reproduce the schedule bit-for-bit (same Σ n^alpha ulp caveat on
    exact .5 rounding boundaries). Docs scheduled zero times disappear
    (a group can still be DOWN-sampled when its weight shrinks under
    alpha).

    100 TB shape: one count per group (AQE-broadcast back), one
    md5-rank window per group, and the replication is a row-local
    sequence() explode — no shuffle grows with the copy count; the
    schedule is materialized as (id, copy) pairs for the downstream
    shuffle/pack stage to interleave, never as duplicated text.
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
        F.round(
            F.lit(float(epoch_tokens_frac))
            * F.col("_total")
            * F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
            / F.col("_z")
        )
        .cast("long")
        .alias("_quota"),
    )
    win = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "_rk", F.row_number().over(win)
    )
    n_copies = (
        F.col("_quota") / F.col("_n")
    ).cast("long") + F.when(
        F.col("_rk") <= F.col("_quota") % F.col("_n"), F.lit(1)
    ).otherwise(F.lit(0))
    staged = (
        ranked.join(quotas, group_col)
        .withColumn("_c", n_copies)
        .filter(F.col("_c") >= 1)
    )
    return staged.select(
        F.col(id_col),
        F.col(group_col),
        F.explode(F.sequence(F.lit(1), F.col("_c"))).alias("epoch_copy"),
        F.col("_c").cast("bigint").alias("n_copies"),
    )


def training_order(
    df: DataFrame,
    seed: int = 0,
    shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle — the 'randomize
    the corpus before each run' step a training job needs, without an
    RNG: rank = 48-bit md5 hash of (id, seed), shard = rank mod
    shards, position = dense order of (rank, id) within the shard.
    A new seed is a new permutation; a re-executed partition
    reproduces its rows exactly (the module's determinism contract,
    and why this is oracle-exact in DuckDB).

    100 TB shape: NO global sort — the only wide op is the
    per-shard row_number window, i.e. one hash exchange on shard +
    shard-local sort; consumers read shards independently in
    (shard, pos) order, which is the standard sharded-dataset
    contract (WebDataset/Mosaic-style). A global total order would be
    a range exchange over the whole corpus for no training benefit.

    Output: input columns + (rank, shard, pos)."""
    rank = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(f"#{int(seed)}")
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("rank", id_col)
    return (
        df.withColumn("rank", rank)
        .withColumn(
            "shard", F.pmod(F.col("rank"), F.lit(int(shards))).cast("int")
        )
        .withColumn("pos", F.row_number().over(w))
    )


def cluster_balanced_sample(
    emb: DataFrame,
    centroids: list[list[float]],
    cap: int,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving selection: cap each semantic cell (a
    k-means cell over the embedding space — the SemDeDup/DataComp
    clustering prior) at ``cap`` members, picked by deterministic
    md5(id, seed) rank. Where temperature_mix re-weights by a LABELED
    group (lang, source), this balances by CONTENT — the defense
    against a crawl where one topic dominates the corpus.

    100 TB shape: cell assignment is a row-local argmax over broadcast
    centroid literals (zero shuffle, identical to the IVF probe);
    the cap is one hash exchange on the cell id + a per-cell window.
    Cell count should grow with the corpus (similarity.auto_n_cells)
    so cells stay ~uniform; a fixed tiny k would make each cell a hot
    shuffle key.

    Output: (id, cell, cell_size, pick_rank ≤ cap) — deterministic:
    a new seed is a new sample, a re-executed partition reproduces
    its picks (the module's contract).
    """
    from ramen_spark.operators.similarity import _nearest_cell

    assigned = emb.select(
        F.col(id_col),
        _nearest_cell(F.col(vec_col).cast("array<double>"), centroids).alias(
            "cell"
        ),
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(f"#{int(seed)}"))
        ).alias("_rk"),
    )
    w = Window.partitionBy("cell").orderBy("_rk", id_col)
    sized = assigned.withColumn(
        "cell_size", F.count(F.lit(1)).over(Window.partitionBy("cell"))
    ).withColumn("pick_rank", F.row_number().over(w))
    return sized.filter(F.col("pick_rank") <= int(cap)).select(
        id_col,
        "cell",
        F.col("cell_size").cast("bigint").alias("cell_size"),
        F.col("pick_rank").cast("int").alias("pick_rank"),
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    weight_col: str = "n_tokens",
    pri_col: str = "q_micro",
    id_col: str = "doc_id",
    id_range: int = 1 << 16,
    keys: list[str] | None = None,
) -> DataFrame:
    """Select the best documents until a token budget is exhausted —
    the "give me the top N billion tokens by quality" cut every
    training-mix recipe ends with. A row is kept iff it fits entirely:
    cum(weight over all strictly-better rows, priority (pri desc,
    id asc)) + its own weight <= budget. Deterministic total order ⇒
    rerun-stable and oracle-exact (the DuckDB twin is one cumulative
    window).

    100 TB shape — a global ordered prefix WITHOUT a global sort
    (the same discipline as training_order): the naive form is a
    cumsum window over a single global ordering — every row through
    ONE task. Instead, two bounded prefix levels:

      1. per-PRIORITY-VALUE totals (partial-combined groupBy; the
         priority is an integer micro-score, so the level-1 relation
         is bounded by the score DOMAIN — ≤ ~1e6 rows forever, and
         the cumsum window over it is bounded the same way);
         priority values that fit whole are selected wholesale, and
         at most ONE boundary value remains;
      2. inside the boundary value only: a FIXED LADDER of id-range
         levels (buckets of id_range³, id_range², id_range ids —
         trunc-div is monotone in the id, so bucket order = the
         (pri, id) order there), each level a bounded cumsum +
         wholesale buckets + at most ONE boundary bucket for the next
         level; a final per-row window over the last boundary bucket
         — ≤ ``id_range`` rows by uniqueness of ids.

    The ladder's bound is UNCONDITIONAL (round-11, closing the old
    sparse-id degradation): the top level has ≤ id_space/id_range³
    occupied buckets (2^16 at the 2^16 default over 64-bit ids) no
    matter how sparse or adversarial the id layout — random 63-bit
    hash ids included — and every later level enumerates one parent's
    ≤ id_range children. Pinned by the adversarially-sparse property
    test (ids spaced ≥ id_range² apart, plus random 62-bit ids).

    Output: the selected rows of ``df`` (all original columns).

    ``keys`` (round-10b) applies the SAME budget independently per
    group — the "N tokens per language" cut of a mixture recipe. The
    algorithm is unchanged with every level keyed: totals per
    (keys…, priority), cumsum windows partitioned by the keys (each
    group's window is bounded by ITS priority/range domain — no
    single-task funnel on a hot group), boundary relations per key.
    The level-1/2 relations are bounded by |keys| × the score/range
    domain, so they lose the unconditional broadcast hint (AQE
    decides); the keys=[] path keeps the original plan bit-for-bit.
    """
    # NULL weights count as 0 (the SQL SUM-over-window convention the
    # oracle follows); NULL priorities sort WORST (both engines default
    # NULLS LAST under DESC) and are handled below with null-safe joins.
    K = list(keys or [])
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    p = F.col(pri_col).cast("long")
    # localCheckpoint: the input subtree feeds FOUR branches (level-1
    # totals, wholesale keep, level-2 totals, boundary tail) — Spark
    # shares no subtrees, so an expensive upstream (quality scoring)
    # would re-run per branch (measured 21.2 -> 4.9 s at 100x, 166.6 -> 28.4 s at 1000x).
    # Same eager-job/lineage tradeoff as tfidf_top_terms' docstring.
    rows = df.withColumn("_w", w).withColumn("_p", p).localCheckpoint()

    def bcast(rel: DataFrame) -> DataFrame:
        # keyed level relations scale with |keys| × domain — let AQE
        # pick; the global form keeps its measured broadcast plan
        return rel if K else F.broadcast(rel)

    def nsjoin(left: DataFrame, rel: DataFrame, on: list[str], how: str) -> DataFrame:
        # null-SAFE equi-join (operators.joins — the shared house
        # implementation): NULL keys and NULL priorities are real
        # groups (sort worst); a plain equi-join would never match
        # them back. `on` always contains the level column, never [].
        from ramen_spark.operators.joins import null_safe_join

        return null_safe_join(left, bcast(rel), on, how)

    # level 1: totals per (keys…, priority value) — bounded per group
    # by the score domain
    per_p = rows.groupBy(*K, "_p").agg(F.sum("_w").alias("_pw"))
    w1 = (
        Window.partitionBy(*K)
        .orderBy(F.col("_p").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum1 = per_p.withColumn(
        "_before", F.coalesce(F.sum("_pw").over(w1), F.lit(0))
    )
    full_p = cum1.filter(F.col("_before") + F.col("_pw") <= budget).select(
        *K, "_p"
    )
    # boundary test is <=, not <: when strictly-better priorities
    # consume the budget EXACTLY, zero-weight rows at the head of the
    # next priority still fit (cum <= budget in the oracle) — a
    # strict < silently dropped them (found by review, now in the
    # property test)
    boundary = cum1.filter(
        (F.col("_before") <= budget)
        & (F.col("_before") + F.col("_pw") > budget)
    ).select(*K, "_p", (F.lit(budget) - F.col("_before")).alias("_rem"))

    keep_whole = nsjoin(rows, full_p, [*K, "_p"], "leftsemi")

    # levels 2-4: a FIXED id-range LADDER over the boundary priority
    # (round-10 agenda #7 — the old single range level degraded to one
    # row per doc under sparse ids, e.g. random 63-bit hash ids).
    # Buckets of id_range^3, then id_range^2, then id_range ids: the
    # top level has ≤ id_space/id_range^3 occupied buckets (2^16 for
    # the 2^16 default over 64-bit ids) NO MATTER how the ids are laid
    # out, and each later level enumerates the children of exactly ONE
    # boundary bucket — ≤ id_range buckets; the final per-row window
    # holds ≤ id_range rows by id uniqueness. Every window is bounded
    # by max(id_range, id_space/id_range^3) per key UNCONDITIONALLY —
    # floor-div is monotone in the id, so bucket-asc order is id-asc
    # order and the prefix semantics are unchanged (value-identical to
    # the naive global cumsum, pinned by the sparse-id property test,
    # which now includes ids straddling zero — exact-width buckets
    # need FLOOR, not trunc, division; see the level loop below).
    out_cols = df.columns
    cur = nsjoin(rows, boundary, [*K, "_p"], "inner")
    rem_col = "_rem"
    parts = [keep_whole.select(*out_cols)]
    # clamp: a huge caller id_range could overflow the long literal at
    # ^3 — 2^62 caps the bucket width, which only makes the top level
    # COARSER (fewer buckets), never unbounded
    for li, width in enumerate(
        min(int(id_range) ** e, 1 << 62) for e in (3, 2, 1)
    ):
        # FLOOR division, in pure bigint arithmetic (a float detour
        # would lose precision past 2^53): SQL `div` truncates toward
        # zero, so for ids straddling zero bucket 0 would span
        # (-width, width) — twice the intended width, weakening the
        # documented per-level bounds by up to 2× (round-11 advice).
        # floor = trunc − 1 exactly when the remainder is negative
        # (Spark's % follows the dividend sign); no intermediate can
        # overflow. Floor-div stays monotone in the id, so bucket-asc
        # order is still id-asc order and prefix semantics hold.
        lvl = cur.withColumn(
            "_rng",
            F.expr(
                f"CAST(`{id_col}` AS BIGINT) div {width} - "
                f"(CASE WHEN CAST(`{id_col}` AS BIGINT) % {width} < 0 "
                "THEN 1 ELSE 0 END)"
            ),
        )
        per_r = lvl.groupBy(*K, rem_col, "_rng").agg(
            F.sum("_w").alias("_rw")
        )
        w2 = (
            Window.partitionBy(*K)
            .orderBy(F.col("_rng").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum2 = per_r.withColumn(
            "_rbefore", F.coalesce(F.sum("_rw").over(w2), F.lit(0))
        )
        full_r = cum2.filter(
            F.col("_rbefore") + F.col("_rw") <= F.col(rem_col)
        ).select(*K, "_rng")
        next_rem = f"_rem{li}"
        bound_r = cum2.filter(
            (F.col("_rbefore") <= F.col(rem_col))  # <=: same zero-weight
            # exact-exhaustion case as level 1
            & (F.col("_rbefore") + F.col("_rw") > F.col(rem_col))
        ).select(
            *K, "_rng",
            (F.col(rem_col) - F.col("_rbefore")).alias(next_rem),
        )
        parts.append(
            nsjoin(lvl, full_r, [*K, "_rng"], "leftsemi").select(*out_cols)
        )
        cur = (
            nsjoin(lvl, bound_r, [*K, "_rng"], "inner")
            .drop("_rng", rem_col)
        )
        rem_col = next_rem

    # final: per-row cumsum inside the ONE boundary id_range bucket
    # per key (≤ id_range rows each by id uniqueness)
    w3 = (
        Window.partitionBy(*K)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep_tail = cur.withColumn(
        "_dbefore", F.coalesce(F.sum("_w").over(w3), F.lit(0))
    ).filter(F.col("_dbefore") + F.col("_w") <= F.col(rem_col))

    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.unionByName(keep_tail.select(*out_cols))


def _prefilter_top_n(keys: list[str], n: int, id_col: str):
    """mapInPandas kernel: per partition, per key, keep the n best
    rows by (skey_micro desc, id asc). Bounded state (≤ n rows per key
    in a dict of small frames) — the map-side prune that keeps the
    downstream salt/window levels bounded regardless of how many raw
    rows a hot key has in the partition (the _prefilter_min_k
    pattern of operators/sketch.py, for top-n instead of min-k)."""
    import pandas as pd

    def run(batches):
        state: dict[tuple, "pd.DataFrame"] = {}

        def fold(kt: tuple, g: "pd.DataFrame") -> None:
            prev = state.get(kt)
            if prev is not None:
                g = pd.concat([prev, g])
            state[kt] = g.sort_values(
                ["skey_micro", id_col],
                ascending=[False, True],
                kind="mergesort",
            ).head(n)

        for pdf in batches:
            if pdf.empty:
                continue
            if keys:
                for key, g in pdf.groupby(keys, sort=False, dropna=False):
                    fold(key if isinstance(key, tuple) else (key,), g)
            else:
                fold((), pdf)
        if state:
            yield pd.concat(state.values())

    return run


def topn_by_aes_key(
    df: DataFrame,
    keys: list[str],
    n: int,
    id_col: str,
    weight_col: str,
    extra_group: list[str] | None = None,
    dedup: bool = False,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group top-n of (keys…, id, weight, skey_micro) rows by
    (skey desc, id asc) as ONE partial-aggregable groupBy — the
    struct/sort/slice pipeline shared by weighted_sample's salted
    local-top level and the streaming reservoir's re-prune (one
    definition, so a tie-break or overflow fix can never drift between
    the batch and always-on lanes). ``extra_group`` adds transient
    group columns (the salt) that are dropped from the output;
    ``dedup=True`` collects a SET (the streaming merge path, where a
    replayed row's identical struct must vanish). ``payload_cols``
    ride INSIDE the sort struct after (_negk, id) — which is already a
    total order, so payloads never affect ranking — letting a
    reservoir carry row metadata (e.g. n_tok) that a downstream
    finalize needs when the stream is no longer joinable (the
    round-11 agenda-#8 mixing twin). A replayed id with a DIFFERENT
    payload violates the id-uniqueness contract exactly like a
    changed weight does (both structs would survive dedup)."""
    pcols = list(payload_cols or [])
    st = F.struct(
        (-F.col("skey_micro")).alias("_negk"),
        F.col(id_col).alias("_i"),
        F.col(weight_col).alias("_w"),
        *[F.col(c).alias(f"_p_{c}") for c in pcols],
    )
    coll = F.collect_set(st) if dedup else F.collect_list(st)
    return (
        df.groupBy(*keys, *(extra_group or []))
        .agg(F.slice(F.array_sort(coll), 1, n).alias("_m"))
        .select(*keys, F.inline("_m"))
        .select(
            *keys,
            F.col("_i").alias(id_col),
            F.col("_w").alias(weight_col),
            (-F.col("_negk")).alias("skey_micro"),
            *[F.col(f"_p_{c}").alias(c) for c in pcols],
        )
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    keys: list[str] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    salt_above_partitions: int = 64,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — per group
    (or globally with ``keys=[]``), pick ``n`` rows with inclusion
    probability proportional to ``weight_col`` via the
    Efraimidis–Spirakis A-ES scheme (IPL 2006, "Weighted random
    sampling with a reservoir"): each row gets the key u^(1/w) with
    u ~ U(0,1]; the n largest keys ARE a weight-proportional sample
    without replacement. The quality-weighted "pick 1M docs, better
    docs more likely" selection a curation pipeline wants when a hard
    top-n would collapse onto near-duplicate top scorers.

    Determinism (the house rule): u is md5-derived —
    u = (md5_48(id || ':' || seed) + 1) / 2^48 ∈ (0, 1] — and the sort
    key is FROZEN TO INTEGER MICRO-UNITS: round(1e6 · ln(u)/w) as a
    long (maximizing ln(u)/w ≡ maximizing u^(1/w); same integer-freeze
    as dsir_importance's micro-nats, so the DuckDB oracle lands on the
    identical longs and the rank order has no cross-engine float-ulp
    hazard). Ties break (key desc, id asc). Rows with NULL or
    non-positive weight are excluded (zero inclusion probability).

    Output: (keys…, id_col, weight_col, skey_micro[, payload_cols…],
    rn) — the sample with its rank; join back on ``id_col`` for heavy
    columns (ids travel, text doesn't), or name small metadata columns
    in ``payload_cols`` to carry them through (what the always-on
    reservoir does for n_tok — there is no stream left to join).

    100 TB shape: the sort key is row-local; grouped selection is one
    hash Exchange + bounded row_number window per key (the
    largest/cluster_balanced_sample shape) — and above
    ``salt_above_partitions`` input partitions a lossless salted
    local-top level runs first (the cms_rank_top argument: every
    global top-n member is top-n in its own md5 salt bucket), so a
    90%-hot key never funnels its full row set through one window
    task. The GLOBAL form never sorts globally — orderBy+limit plans
    as TakeOrderedAndProject (per-partition top-n, n-row merge).
    """
    if n < 1:
        raise ValueError("weighted_sample needs n >= 1")
    keys = list(keys or [])
    from ramen_spark.operators.sketch import md5_hash48

    h = md5_hash48(F.concat(F.col(id_col).cast("string"), F.lit(f":{int(seed)}")))
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    w = F.col(weight_col).cast("double")
    # clamp at -2^62 BEFORE the long cast: ln(u) ∈ [-33.3, 0], so a
    # weight below ~1e-13 (importance/probability weights) would
    # overflow the cast — a hard CAST_OVERFLOW error under Spark 4's
    # default ANSI mode. Clamped rows tie at the floor (all have
    # essentially zero inclusion probability) and break by id; the
    # headroom also keeps the salted level's -skey negation safe.
    skey = (
        F.greatest(
            F.round(F.log(u) / w * F.lit(1e6)), F.lit(float(-(1 << 62)))
        )
        .cast("long")
    )
    # NULL ids are ignored like NULL weights (the quantile_prune
    # convention: a sample must identify its rows) — a NULL id would
    # also make the (skey desc, id asc) tie-break engine-dependent
    # (Spark asc = NULLS FIRST, DuckDB asc = NULLS LAST).
    scored = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (w > 0)
        )
        .select(
            *keys, id_col, weight_col, skey.alias("skey_micro"),
            *(payload_cols or []),
        )
    )
    if keys:
        if df.rdd.getNumPartitions() > salt_above_partitions:
            # wide-scan guard, two bounded levels (the kmv_finalize
            # discipline): (1) map-side mapInPandas prefilter keeps the
            # n best rows per key per PARTITION — without it the salt
            # aggregation would buffer a hot key's entire row set in
            # one collect_list array; (2) salted local-top bounds the
            # final window's input at ~n·√P per key (lossless: every
            # global top-n member is top-n in its own salt bucket).
            scored = scored.mapInPandas(
                _prefilter_top_n(keys, n, id_col), scored.schema
            )
            s = 64
            scored = topn_by_aes_key(
                scored.withColumn(
                    "_salt", md5_hash48(F.col(id_col)) % s
                ),
                keys, n, id_col, weight_col, extra_group=["_salt"],
                payload_cols=payload_cols,
            )
        win = Window.partitionBy(*keys).orderBy(
            F.col("skey_micro").desc(), F.col(id_col).asc()
        )
        return scored.withColumn(
            "rn", F.row_number().over(win).cast("long")
        ).filter(F.col("rn") <= n)
    top = scored.orderBy(
        F.col("skey_micro").desc(), F.col(id_col).asc()
    ).limit(n)
    rn_win = Window.orderBy(F.col("skey_micro").desc(), F.col(id_col).asc())
    return top.withColumn("rn", F.row_number().over(rn_win).cast("long"))
