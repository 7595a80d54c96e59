"""Similarity search over embedding columns (array<float>).

Training-pipeline extension (no reference counterpart). Two tiers:

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (it is always the small side); each partition of the corpus scores
  its rows against every query map-side; a per-query window/rank picks
  k. The scored relation is shuffled on query_id — fine while
  |queries| is modest; for huge query sets switch to ``lsh_topk``.
- ``lsh_topk``: random-hyperplane LSH — bucket both sides on the
  hyperplane sign bits, only score within matching buckets (plus
  multi-probe neighbors), making the scan sublinear for high-recall
  workloads at 100 TB.

Dot/cosine are built-in higher-order functions (functions.vectors) —
JVM-evaluated, no Python in the scoring loop.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ramen_spark.functions import vectors as V


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast-join queries × corpus, score
    JVM-side, rank per query.

    Ties broken deterministically by (rounded sim desc, corpus id asc)
    so results are reproducible across engines and runs.

    ``exclude_self=True`` (the default) drops pairs whose corpus id
    equals the query id — correct when queries ⊆ corpus (self-search,
    the near-dup use). Pass ``exclude_self=False`` when the two sides
    are DIFFERENT populations that merely share an id space (bitext
    mining: parallel corpora routinely number both sides 0..n, and the
    true aligned pair (x_i, y_i) would otherwise be silently dropped).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            _as_double(vec_col).alias("_qvec"),
        ).withColumn("_qnorm", V.norm2(F.col("_qvec")))
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("_cvec")
    ).withColumn("_cnorm", V.norm2(F.col("_cvec")))
    scored = c.crossJoin(q)
    if exclude_self:
        scored = scored.filter(F.col("corpus_id") != F.col(query_id_col))
    scored = scored.withColumn(
        "sim", F.round(_sim_prenorm("_qvec", "_cvec", "_qnorm", "_cnorm"), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "corpus_id", "sim", "rank")
    )


def _as_double(vec_col: str):
    """Cast array<float> → array<double> ONCE per row per side, so the
    per-pair dot product runs cast-free (the cast inside zip_with would
    otherwise execute per pair — N×k times instead of N+k)."""
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _sim_prenorm(av: str, bv: str, an: str, bn: str):
    """Cosine from precomputed norms: per-pair work = 1 dot + 1 divide
    (the norms would otherwise be recomputed per pair — 3 array
    traversals instead of 1). Same expression shape as the oracle's
    ``dot/(sqrt(dot)*sqrt(dot))`` → bit-identical doubles."""
    d = F.col(an) * F.col(bn)
    return F.when(d > 0, V.dot(F.col(av), F.col(bv)) / d)


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for LSH bucketing."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane sign
    bits, equi-join on bucket, exact-score only within buckets.

    With b planes the corpus splits into 2^b buckets → expected
    N/2^b candidates per query instead of N. Recall tunes via
    ``n_planes`` (fewer planes = bigger buckets = higher recall) or
    multi-probing; at 100 TB the bucket column would also be the
    partition key of the stored corpus so the join is shuffle-free on
    the corpus side.
    """
    planes = make_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(vec_col).alias("_cvec"),
        V.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("_cnorm", V.norm2(F.col("_cvec")))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            _as_double(vec_col).alias("_qvec"),
            V.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        ).withColumn("_qnorm", V.norm2(F.col("_qvec")))
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("corpus_id") != F.col(query_id_col))
        .withColumn("sim", F.round(_sim_prenorm("_qvec", "_cvec", "_qnorm", "_cnorm"), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "corpus_id", "sim", "rank")
    )


def auto_n_planes(n_rows: int, target_occupancy: int = 50, floor: int = 6) -> int:
    """Plane count that keeps expected bucket occupancy ≈
    ``target_occupancy``: with b planes the corpus splits into 2^b
    buckets and the self-join does Σ occupancy² work — a FIXED b turns
    quadratic as the corpus grows (measured: 257 s at the 100× tier
    with b=6 → 64 buckets of ~3 k vectors; adaptive b=12 → ~12 s).
    Deterministic in the corpus size; at the oracle-checked SFs
    (200 / 2 k rows) the formula lands on the floor of 6, matching the
    plane literals baked into the SQL oracle."""
    if n_rows <= 1:
        return floor
    return max(floor, math.ceil(math.log2(max(n_rows / target_occupancy, 1.0))))


def auto_n_cells(n_rows: int | None, floor: int = 8) -> int:
    """Cell count for semantic_dedup that balances its two cost terms:
    assignment is n·c dots (every row scores every centroid literal)
    and within-cell pairing is ~n²/c dots, so c = √n minimizes the
    total at ~2·n^1.5 — a FIXED c turns the pair join quadratic as the
    corpus grows (the auto_n_planes lesson, same shuffle shape).
    Pinned to ``floor`` for n ≤ 1024 so the oracle-checked SFs (500
    embeddings at sf0.01) keep the 8-cell constant baked into the SQL;
    powers of two above that, like the simhash tier pins. None (no
    footer stats) falls back to the floor — the safe small-corpus
    default."""
    if n_rows is None or n_rows <= 1024:
        return floor
    return max(floor, 2 ** round(math.log2(math.sqrt(n_rows))))


def pairwise_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
    n_rows: int | None = None,
    n_seeds: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup tier): LSH-bucket
    self-join + exact cosine ≥ threshold. Same bucket-join shape as
    minhash dedup — candidate volume scales with true-duplicate
    density, not N². ``n_planes=None`` picks auto_n_planes(corpus
    size) so bucket occupancy — and with it the self-join volume —
    stays flat as the corpus grows (more planes → lower per-pair
    collision recall, the standard LSH trade).

    ``n_seeds`` > 1 is the OR-construction that buys the recall back:
    each vector buckets under ``n_seeds`` independent plane sets
    (seeds seed, seed+1, …) and a pair is a candidate if it collides
    under ANY of them — miss probability (1−(1−θ/π)^b)^s decays
    exponentially in s. Cost: the bucket self-join runs on an
    s×-exploded relation keyed by (seed_idx, bucket) — still an
    equi-join, with exact verification after a pair-level distinct so
    a pair colliding under several seeds scores once. This is the
    standard AND-OR LSH amplification (b-bit AND within a seed, s-way
    OR across seeds)."""
    if n_planes is None:
        if n_rows is None:
            # LAST resort: an eager action at plan-build time — pass
            # n_rows (catalog.table_num_rows footer stats / metastore
            # stats) so construction stays job-free, same contract as
            # simhash_near_dups
            n_rows = df.count()
        n_planes = auto_n_planes(n_rows)
    if n_seeds <= 1:
        planes = make_hyperplanes(dim, n_planes, seed)
        b = df.select(
            F.col(id_col),
            _as_double(vec_col).alias("_v"),
            V.lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        ).withColumn("_n", V.norm2(F.col("_v")))
        l, r = b.alias("l"), b.alias("r")
        return (
            l.join(r, "bucket")
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .withColumn(
                "sim", F.round(_sim_prenorm("l._v", "r._v", "l._n", "r._n"), 6)
            )
            .filter(F.col("sim") >= threshold)
            .select(
                F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                "sim",
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    # OR-construction: candidate ids from an s×-exploded (seed_idx,
    # bucket) self-join — ids + two ints only; the vectors re-attach
    # AFTER the pair-level distinct, so a pair colliding under several
    # seeds neither re-scores nor drags its vectors through the
    # distinct's shuffle (the minhash re-attach shape)
    vecs = df.select(
        F.col(id_col), _as_double(vec_col).alias("_v")
    ).withColumn("_n", V.norm2(F.col("_v")))
    buckets = F.array(
        *[
            V.lsh_bucket(F.col(vec_col), make_hyperplanes(dim, n_planes, seed + i))
            for i in range(int(n_seeds))
        ]
    )
    banded = df.select(
        F.col(id_col), F.posexplode(buckets).alias("_si", "bucket")
    )
    l, r = banded.alias("l"), banded.alias("r")
    id_pairs = (
        l.join(r, ["_si", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        id_pairs.join(
            vecs.select(
                F.col(id_col).alias("id_a"),
                F.col("_v").alias("_va"),
                F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("id_b"),
                F.col("_v").alias("_vb"),
                F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        .withColumn("sim", F.round(_sim_prenorm("_va", "_vb", "_na", "_nb"), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


# ------------------------------------------------------------------- IVF

def _centroid_literal(centroids: list[list[float]]):
    """Bake the (tiny) centroid table into the plan as a literal
    array<array<double>> — evaluated JVM-side, no UDF, no join. Built
    as ONE parsed SQL expression: the element-wise F.lit/F.array form
    costs thousands of py4j round trips (measured: the dominant cost
    of the whole k-means fit)."""
    inner = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
    )
    return F.expr(f"array({inner})")


def _nearest_cell(vec_col, centroids: list[list[float]]):
    """argmax_i <unit-centroid_i, vec> as a builtin expression (cosine
    order needs no vec normalization: norm is constant per row)."""
    cents = _centroid_literal(centroids)
    scores = F.transform(cents, lambda c: V.dot(c, vec_col))
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def kmeans_fit(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic spherical k-means for the IVF coarse quantizer.

    Seeds = the n_cells corpus vectors with the smallest md5(id) (a
    deterministic pseudo-random draw); each Lloyd iteration is one
    Spark job: assign rows to the nearest unit centroid (literal
    expression, no shuffle) → per-cell per-dimension means via
    posexplode + groupBy (one shuffle of n_cells×dim partials) →
    re-normalize driver-side. Only n_cells×dim doubles ever reach the
    driver — at 100 TB you fit on a sample (df.sample) with identical
    code."""
    # Work on RAW vectors + a per-row norm SCALAR, never a computed
    # unit-vector array: a per-element lambda that references the norm
    # (or an exists() over the derived array) gets re-inlined by
    # CollapseProject and re-evaluates O(dim) work per element —
    # O(dim²) per row, measured 8–15 s of the sf10 fit vs sub-second
    # here. Nearest-cell assignment is scale-invariant (argmax over
    # dot(c, v)/|v| = argmax over dot(c, v) for |v| > 0), so only the
    # n_cells seed vectors are ever normalized — driver-side.
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            _as_double(vec_col).alias("_raw"),
            V.norm2(F.col(vec_col)).alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .filter(~F.exists(F.col("_raw"), lambda x: x.isNull()))
    )
    # every Lloyd job re-reads this small relation: cache it for the
    # fit, release before returning (fit input is a sample at scale);
    # a seeds-only fit (iters=0) reads it once — nothing to cache
    if iters > 0:
        base = base.cache()

    def _renorm(v: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else v

    seeds = (
        base.select(
            "_raw", "_n", F.md5(F.col("_id").cast("string")).alias("_h")
        )
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    centroids = [[x / r["_n"] for x in r["_raw"]] for r in seeds]

    try:
        for _ in range(iters):
            assigned = base.select(
                _nearest_cell(F.col("_raw"), centroids).alias("_cell"),
                "_raw",
                "_n",
            )
            # spherical update sums UNIT vectors: x/_n is plain scalar
            # arithmetic after the posexplode — no array lambda
            sums = (
                assigned.select(
                    "_cell",
                    "_n",
                    F.posexplode(F.col("_raw")).alias("_pos", "_x"),
                )
                .groupBy("_cell", "_pos")
                .agg(
                    F.sum(F.col("_x") / F.col("_n")).alias("_s"),
                    F.count(F.lit(1)).alias("_cnt"),
                )
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in sums:
                by_cell.setdefault(r["_cell"], {})[r["_pos"]] = (
                    r["_s"] / r["_cnt"]
                )
            centroids = [
                _renorm([by_cell[c][p] for p in sorted(by_cell[c])])
                if c in by_cell
                else centroids[c]  # empty cell keeps its centroid
                for c in range(len(centroids))
            ]
    finally:
        if iters > 0:
            base.unpersist()
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``n_probe`` closest cells and
    exact-scores only those rows.

    Scan fraction ≈ n_probe/n_cells (vs 1.0 brute force). The cell id
    is a pure expression over the stored vector, so at rest the corpus
    would be partitioned/bucketed by cell → the probe join prunes
    partitions and shuffles nothing on the corpus side; recall tunes
    with n_probe without touching stored data."""
    cents = _centroid_literal(centroids)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(vec_col).alias("_cvec"),
        _nearest_cell(_as_double(vec_col), centroids).alias("_cell"),
    ).withColumn("_cnorm", V.norm2(F.col("_cvec")))
    probe_cells = F.slice(
        F.array_sort(
            F.zip_with(
                F.transform(cents, lambda cc: -V.dot(cc, F.col("_qvec"))),
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda s, i: F.struct(s.alias("neg"), i.alias("cell")),
            )
        ),
        1,
        n_probe,
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), _as_double(vec_col).alias("_qvec")
        )
        .withColumn("_qnorm", V.norm2(F.col("_qvec")))
        .withColumn("_probe", F.explode(F.transform(probe_cells, lambda s: s.cell)))
    )
    scored = (
        c.join(q, c["_cell"] == q["_probe"])
        .filter(F.col("corpus_id") != F.col(query_id_col))
        .withColumn("sim", F.round(_sim_prenorm("_qvec", "_cvec", "_qnorm", "_cnorm"), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "corpus_id", "sim", "rank")
    )


# ------------------------------------------------------------------- IVF-PQ

def _unit(vec_col: str):
    """Unit-normalized double vector (NULL-free rows with norm > 0 are
    the caller's responsibility — see pq_fit's base filter)."""
    v = _as_double(vec_col)
    n = V.norm2(F.col(vec_col))
    return F.transform(v, lambda x: x / n)


def pq_fit(
    df: DataFrame,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the unit vector
    into ``m`` contiguous subspaces of dim/m and learn ``ks`` codewords
    per subspace. Returns codebooks[m][ks][dim//m].

    Seeding matches kmeans_fit: the ks corpus vectors with the
    smallest md5(id) contribute their subvectors to every subspace —
    deterministic and, at iters=0, exactly SQL-expressible for the
    oracle. ``iters`` Lloyd rounds refine all m subspaces in ONE Spark
    job each (subspace exploded into the rows, codeword update via a
    groupBy of m×ks×dsub per-dimension partials — the only driver
    collect, same footprint rationale as kmeans_fit). Codewords are
    plain L2 means (no renormalization — PQ approximates the vector,
    not its direction)."""
    dsub = dim // m
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            _as_double(vec_col).alias("_raw"),
            V.norm2(F.col(vec_col)).alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .filter(~F.exists(F.col("_raw"), lambda x: x.isNull()))
    )
    seeds = (
        base.select("_raw", "_n", F.md5(F.col("_id").cast("string")).alias("_h"))
        .orderBy("_h")
        .limit(ks)
        .collect()
    )
    units = [[x / r["_n"] for x in r["_raw"]] for r in seeds]
    books = [[u[s * dsub : (s + 1) * dsub] for u in units] for s in range(m)]
    if iters == 0:
        return books

    cb_rows = base.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(
                    F.transform(F.col("_raw"), lambda x: x / F.col("_n")),
                    s * dsub + 1,
                    dsub,
                ),
            )
        ).alias("_s", "_sub")
    )
    if iters > 0:
        cb_rows = cb_rows.cache()
    try:
        for _ in range(iters):
            cbs = F.element_at(_pq_codebook_literal(books), F.col("_s") + 1)
            dists = F.transform(
                cbs, lambda cw: V.dot(cw, cw) - 2 * V.dot(cw, F.col("_sub"))
            )
            assigned = cb_rows.select(
                "_s",
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int")
                .alias("_code"),
                "_sub",
            )
            sums = (
                assigned.select(
                    "_s", "_code", F.posexplode(F.col("_sub")).alias("_pos", "_x")
                )
                .groupBy("_s", "_code", "_pos")
                .agg(F.sum("_x").alias("_sum"), F.count(F.lit(1)).alias("_cnt"))
                .collect()
            )
            upd: dict[tuple[int, int], dict[int, float]] = {}
            for r in sums:
                upd.setdefault((r["_s"], r["_code"]), {})[r["_pos"]] = (
                    r["_sum"] / r["_cnt"]
                )
            books = [
                [
                    [upd[(s, j)][p] for p in sorted(upd[(s, j)])]
                    if (s, j) in upd
                    else books[s][j]
                    for j in range(ks)
                ]
                for s in range(m)
            ]
    finally:
        if iters > 0:
            cb_rows.unpersist()
    return books


def _pq_codebook_literal(books: list[list[list[float]]]):
    """codebooks[m][ks][dsub] as ONE parsed literal expression (same
    py4j-round-trip rationale as _centroid_literal)."""
    outer = ",".join(
        "array("
        + ",".join("array(" + ",".join(f"{float(x)!r}D" for x in cw) + ")" for cw in cbs)
        + ")"
        for cbs in books
    )
    return F.expr(f"array({outer})")


def _pq_codes(vec_unit, books: list[list[list[float]]]):
    """codes array<int>, one argmin-L2 codeword per subspace, as a
    row-local builtin expression. argmin via (|c|² − 2·<c,sub>) — the
    |sub|² term is constant per subspace; |c|² is baked as a literal
    (the codebook is driver-side). Ties take the first (lowest-index)
    codeword, matching the oracle's (dist ASC, j ASC) row_number."""
    m, dsub = len(books), len(books[0][0])
    cols = []
    for s, cbs in enumerate(books):
        sub = F.slice(vec_unit, s * dsub + 1, dsub)
        cc2 = [sum(x * x for x in cw) for cw in cbs]
        dists = F.zip_with(
            _centroid_literal(cbs),
            F.array(*[F.lit(float(c)) for c in cc2]),
            lambda cw, c2: c2 - 2 * V.dot(cw, sub),
        )
        cols.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return F.array(*cols)


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ asymmetric-distance top-k: corpus vectors are m small int
    codes; each broadcast query precomputes its m×ks lookup table once
    (T[s][j] = <q_sub_s, codeword_j>) and every candidate costs m
    TABLE LOOKUPS + m ADDS instead of a dim-length dot — the ADC
    speedup, here as pure Catalyst expressions (zip_with codes against
    T, element_at, left-fold sum: deterministic s-ascending order the
    oracle reproduces with list(contrib ORDER BY s)).

    With ``centroids`` the IVF coarse stage prunes candidates to
    n_probe cells first (corpus stored bucketed by cell → probe joins
    prune partitions); without, the ADC scan is corpus-wide. At rest a
    100 TB corpus stores ONLY (id, cell, codes) — m bytes of codes per
    vector instead of 4·dim — raw vectors stay in cold archive for
    optional exact re-ranking of the ADC top-k."""
    cv = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _pq_codes(_unit(vec_col), books).alias("_codes"),
        *(
            [_nearest_cell(_as_double(vec_col), centroids).alias("_cell")]
            if centroids is not None
            else []
        ),
    )
    qu = queries.select(
        F.col(id_col).alias(query_id_col), _unit(vec_col).alias("_qu")
    ).withColumn(
        "_t",
        F.transform(
            _pq_codebook_literal(books),
            lambda cbs, s: F.transform(
                cbs,
                lambda cw: V.dot(
                    cw, F.slice(F.col("_qu"), s * len(books[0][0]) + 1, len(books[0][0]))
                ),
            ),
        ),
    )
    if centroids is not None:
        cents = _centroid_literal(centroids)
        probe = F.slice(
            F.array_sort(
                F.zip_with(
                    F.transform(cents, lambda cc: -V.dot(cc, F.col("_qu"))),
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda s, i: F.struct(s.alias("neg"), i.alias("cell")),
                )
            ),
            1,
            n_probe,
        )
        qu = qu.withColumn(
            "_probe", F.explode(F.transform(probe, lambda s: s.cell))
        )
        scored = cv.join(F.broadcast(qu), cv["_cell"] == qu["_probe"])
    else:
        scored = cv.crossJoin(F.broadcast(qu))
    adc = F.aggregate(
        F.zip_with(
            F.col("_codes"), F.col("_t"), lambda cd, row: F.element_at(row, cd + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim_adc").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.filter(F.col("corpus_id") != F.col(query_id_col))
        .withColumn("sim_adc", F.round(adc, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "corpus_id", "sim_adc", "rank")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    centroids: list[list[float]] | None = None,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage retrieval: the ADC scan over 8-byte codes shortlists
    ``shortlist`` candidates per query, then ONLY those rows fetch
    their raw vectors for an exact cosine re-rank to ``k``. This is
    the production ANN read path at 100 TB: the hot store holds codes
    (32× smaller), the cold archive holds raw vectors, and the
    re-rank's vector fetch is a semi-join of |queries|·shortlist ids —
    independent of corpus size. Exactness of the final scores means
    recall losses come only from shortlist membership, tunable via
    ``shortlist`` without touching stored data."""
    cand = pq_adc_topk(
        corpus,
        queries,
        books,
        k=shortlist,
        centroids=centroids,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, "corpus_id")
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("_cvec")
    ).withColumn("_cnorm", V.norm2(F.col("_cvec")))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col), _as_double(vec_col).alias("_qvec")
        ).withColumn("_qnorm", V.norm2(F.col("_qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("corpus_id").asc()
    )
    return (
        cand.join(c, "corpus_id")
        .join(q, query_id_col)
        .withColumn(
            "sim", F.round(_sim_prenorm("_qvec", "_cvec", "_qnorm", "_cnorm"), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "corpus_id", "sim", "rank")
    )


# ------------------------------------------------------------------ SemDeDup

def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    tau: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space with the coarse
    quantizer, compute pairwise cosine only WITHIN each cluster, and
    for every pair above ``tau`` keep the member with the LOWER
    similarity to its cluster centroid (the paper's keep-the-outlier
    rule — it preserves the diverse example and drops the redundant
    one near the cluster core).

    Output: one row per corpus vector — (id, cell, centsim, keep).
    ``keep`` is false iff some same-cell vector is ``tau``-similar and
    wins the (centsim asc, id asc) priority, i.e. the one-shot greedy
    prune of the paper (NOT transitive closure — that tier is
    neardup_clusters' connected components).

    100 TB shape: the only pairwise work is within a cell, so cost is
    Σ|cell|² — the caller scales n_cells with the corpus to hold the
    mean cell size constant (the paper runs 50k clusters on 5B
    embeddings; cells here come from the same kmeans_fit as IVF, so a
    corpus stored bucketed by cell id makes the self-join shuffle-free
    and each bucket prunes independently). The removal decision is an
    aggregation over pair rows keyed by the int id — vectors never
    ride a shuffle key; the pair relation carries ids + two rounded
    doubles only.

    ``planes``: the measured scale path. Even at the √n-optimal cell
    count the EXACT variant's cost floor is ~2·n^1.5 interpreted
    64-dim dots — measured 175 s at the 100× tier (500 k vectors,
    c=512). Passing seeded hyperplanes restricts candidate pairs to
    same (cell, LSH bucket) — the pairwise_near_dups trick, flat
    occupancy at sf100 — so pair volume tracks n·occupancy instead of
    n²/c. Collision probability for a pair at angle θ is (1−θ/π)^b:
    recall → 1 as tau → 1, which is exactly the regime SemDeDup prunes
    in (the candidate restriction is a documented approximation of the
    paper's full within-cluster scan; the keep rule is unchanged).
    """
    cents = _centroid_literal(centroids)
    base = corpus.select(
        F.col(id_col),
        _as_double(vec_col).alias("_v"),
        _nearest_cell(_as_double(vec_col), centroids).alias("cell"),
        V.norm2(F.col(vec_col)).alias("_n"),
    ).withColumn(
        "centsim",
        F.round(
            V.dot(F.element_at(cents, F.col("cell") + 1), F.col("_v"))
            / F.col("_n"),
            6,
        ),
    )
    if planes is not None:
        # _v is the already-cast double array; lsh_bucket's per-element
        # cast is a no-op on it, so the projections match the raw-vec
        # buckets of pairwise_near_dups (and the oracle's v::DOUBLE[])
        base = base.withColumn("_bk", V.lsh_bucket(F.col("_v"), planes))
    a = base.select(
        F.col(id_col).alias("_aid"),
        F.col("cell").alias("_acell"),
        F.col("centsim").alias("_acs"),
        F.col("_v").alias("_av"),
        F.col("_n").alias("_an"),
        *([F.col("_bk").alias("_abk")] if planes is not None else []),
    )
    b = base.select(
        F.col(id_col).alias("_bid"),
        F.col("cell").alias("_bcell"),
        F.col("centsim").alias("_bcs"),
        F.col("_v").alias("_bv"),
        F.col("_n").alias("_bn"),
        *([F.col("_bk").alias("_bbk")] if planes is not None else []),
    )
    cond = (
        (F.col("_acell") == F.col("_bcell"))
        & (F.col("_aid") != F.col("_bid"))
        & (
            (F.col("_bcs") < F.col("_acs"))
            | ((F.col("_bcs") == F.col("_acs")) & (F.col("_bid") < F.col("_aid")))
        )
    )
    if planes is not None:
        cond = (F.col("_abk") == F.col("_bbk")) & cond
    # pair rows where b outranks a (keeps the priority comparison in
    # the join condition, halving the pair relation vs a<>b + filter)
    losers = (
        a.join(b, cond)
        .filter(
            F.round(_sim_prenorm("_av", "_bv", "_an", "_bn"), 6) >= F.lit(tau)
        )
        .select(F.col("_aid").alias(id_col))
        .distinct()
    )
    return (
        base.join(losers.withColumn("_lost", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cell",
            "centsim",
            F.coalesce(~F.col("_lost"), F.lit(True)).alias("keep"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/ANCE
    data-prep step): for every query, the k most-similar corpus
    vectors whose ``label_col`` DIFFERS from the query's — the
    near-miss examples a contrastive objective learns the most from
    (easy random negatives are already far away; same-label hits are
    positives, not negatives).

    Same broadcast + JVM-dot + per-query-window shape as
    brute_force_topk with the label inequality pushed into the join
    condition, so disqualified pairs never materialize. The exact
    scan is the baseline; at 100 TB swap the candidate stage for any
    ANN tier (lsh/ivf/pq — they share this module's conventions) and
    keep the label filter + re-rank.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id_col),
            _as_double(vec_col).alias("_qvec"),
            F.col(label_col).alias("_qlab"),
        ).withColumn("_qnorm", V.norm2(F.col("_qvec")))
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(vec_col).alias("_cvec"),
        F.col(label_col).alias("neg_label"),
    ).withColumn("_cnorm", V.norm2(F.col("_cvec")))
    scored = c.join(
        q, (F.col("neg_label") != F.col("_qlab")), "inner"
    ).withColumn(
        "sim", F.round(_sim_prenorm("_qvec", "_cvec", "_qnorm", "_cnorm"), 6)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "corpus_id", "neg_label", "sim", "rank")
    )


def semantic_dedup_arrow(
    corpus: DataFrame,
    centroids: list[list[float]],
    tau: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The vectorized engine for EXACT SemDeDup — same contract as
    ``semantic_dedup`` (full within-cell scan, keep-the-outlier), with
    both heavy stages as Arrow-batched numpy instead of interpreted
    per-element lambdas: assignment is one (batch × cells) BLAS matmul
    per Arrow batch, and the within-cell scan is one blocked
    (cell × cell) matmul per cell group — the SemDeDup paper's own
    within-cluster computation. Measured 175 s → see SCALE §4d for the
    SQL engine at the 100× tier; this path exists because the exact
    tier's cost floor is pure dot products, which BLAS does ~100×
    faster than interpreted higher-order functions.

    Numerics: sims and centroid similarities round to 6dp like the SQL
    engine, but BLAS accumulates in a different order — a pair sitting
    EXACTLY on the tau/rounding boundary can flip (last-ulp effects);
    for the oracle-exact answer use the SQL engine. Zero-norm vectors
    score 0 against everything (kept, cell 0).

    100 TB shape: one Arrow pass for assignment (no shuffle), ONE
    shuffle grouping unit vectors by cell — the same volume the SQL
    self-join exchanges — then cell-local matmuls; with the corpus
    stored bucketed by cell even that shuffle disappears. Per-cell
    memory is blocked: B×|cell| doubles at a time, never |cell|².
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    id_field = corpus.schema[id_col]
    id_ddl = f"{id_col} {id_field.dataType.simpleString()}"
    assign_schema = f"{id_ddl}, cell int, centsim double, _u array<double>"

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n = np.linalg.norm(V, axis=1)
            safe = np.where(n > 0, n, 1.0)
            U = V / safe[:, None]
            U[n == 0] = 0.0
            S = U @ C.T
            cell = S.argmax(axis=1)  # ties → first (smallest cell), like
            # array_position(max) in the SQL engine
            centsim = np.round(S[np.arange(len(U)), cell], 6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cell.astype("int32"),
                    "centsim": centsim,
                    "_u": list(U),
                }
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign, assign_schema
    )
    out_schema = f"{id_ddl}, cell int, centsim double, keep boolean"

    def prune(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["centsim", id_col]).reset_index(drop=True)
        U = np.stack([np.asarray(u) for u in pdf["_u"]])
        m = len(pdf)
        keep = np.ones(m, dtype=bool)
        B = 2048
        cols = np.arange(m)
        for s in range(0, m, B):
            e = min(s + B, m)
            sims = np.round(U[s:e] @ U.T, 6)
            # row at global index g loses iff any STRICTLY-prior row
            # (priority rank < g, i.e. lower centsim / smaller id) is
            # tau-similar — the keep-the-outlier rule
            prior = cols[None, :] < np.arange(s, e)[:, None]
            keep[s:e] = ~((sims >= tau) & prior).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cell": pdf["cell"],
                "centsim": pdf["centsim"],
                "keep": keep,
            }
        )

    return assigned.groupBy("cell").applyInPandas(prune, out_schema)


def margin_mining(
    xs: DataFrame,
    ys: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based bitext/pair mining (Artetxe & Schwenk 2019 — the
    CCMatrix/LASER alignment criterion): for the best candidate y of
    each x, score margin(x, y) = cos(x, y) / ((avg_k(x) + avg_k(y))/2)
    where avg_k(v) is the mean cosine of v's k nearest neighbours on
    the OTHER side. Raw cosine top-1 retrieves hubs (vectors close to
    everything); the ratio margin normalizes each side by its local
    density, which is why it's the standard mined-parallel-corpus
    filter. Output: (x_id, y_id, sim, avg_x, avg_y, margin), one row
    per x that has candidates, margin descending-ready (round(…,6)
    determinism like every similarity score here).

    100 TB shape: composes the existing retrieval engines — this form
    runs the exact brute top-k twice (once per direction; the oracle
    baseline), and the IVF / LSH / PQ-rerank tiers slot in wherever a
    brute pass appears (same (query_id, corpus_id, sim, rank) shape),
    which is how CCMatrix actually runs at billions of vectors. The
    margin arithmetic itself is two tiny per-id aggregates + one
    equi-join — nothing beyond the kNN passes moves.
    """
    # exclude_self=False: xs and ys are different populations that may
    # share an id space (parallel corpora both numbered 0..n) — the
    # self-match filter would drop the true aligned pair (x_i, y_i).
    fwd = brute_force_topk(
        ys, xs, k=k, id_col=id_col, vec_col=vec_col, query_id_col="x_id",
        exclude_self=False,
    ).withColumnRenamed("corpus_id", "y_id")
    bwd = brute_force_topk(
        xs, ys, k=k, id_col=id_col, vec_col=vec_col, query_id_col="yq_id",
        exclude_self=False,
    )
    avg_x = fwd.groupBy("x_id").agg(F.round(F.avg("sim"), 6).alias("avg_x"))
    avg_y = bwd.groupBy("yq_id").agg(F.round(F.avg("sim"), 6).alias("avg_y"))
    best = fwd.filter(F.col("rank") == 1).select("x_id", "y_id", "sim")
    return (
        best.join(avg_x, "x_id")
        .join(avg_y, best["y_id"] == avg_y["yq_id"])
        .select(
            "x_id",
            "y_id",
            "sim",
            "avg_x",
            "avg_y",
            F.round(
                F.col("sim")
                / ((F.col("avg_x") + F.col("avg_y")) / F.lit(2.0)),
                6,
            ).alias("margin"),
        )
    )
