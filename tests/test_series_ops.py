"""Stateful series operators (operators.series) — semantics pinned
against hand-computed expectations mirroring the reference's
definitions (doc/raql/expr.ml sections 05/07)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.operators import series as Ser
from ramen_spark.operators import topk as TopK


@pytest.fixture(scope="module")
def ts(spark):
    rows = [("a", float(i), v) for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0])]
    rows += [("b", float(i), v) for i, v in enumerate([5.0, 5.0, 5.0])]
    return spark.createDataFrame(rows, "k string, t double, v double")


def test_lag(ts):
    out = ts.select("k", "t", Ser.lag("v", 1, ["k"], "t").alias("l")).collect()
    m = {(r["k"], r["t"]): r["l"] for r in out}
    assert m[("a", 0.0)] is None and m[("a", 1.0)] == 10.0 and m[("a", 4.0)] == 40.0


def test_moveavg(ts):
    out = ts.select("k", "t", Ser.moveavg("v", 3, ["k"], "t").alias("ma")).collect()
    m = {(r["k"], r["t"]): r["ma"] for r in out}
    assert m[("a", 0.0)] == 10.0  # partial window
    assert m[("a", 2.0)] == 20.0
    assert m[("a", 4.0)] == 40.0


def test_derive(ts):
    out = ts.select("k", "t", Ser.derive("v", "t", ["k"], "t").alias("d")).collect()
    m = {(r["k"], r["t"]): r["d"] for r in out}
    assert m[("a", 0.0)] is None and m[("a", 1.0)] == 10.0


def test_season_moveavg(spark):
    # SEASON-MOVEAVG(2,2): mean of v(t-2), v(t-4) — tests/func/season.ramen shape
    rows = [("a", float(i), float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = df.select("t", Ser.season_moveavg("v", 2, 2, ["k"], "t").alias("s")).collect()
    m = {r["t"]: r["s"] for r in out}
    assert m[0.0] is None  # no lags yet
    assert m[2.0] == 0.0  # only lag(2)=v0
    assert m[4.0] == 1.0  # mean(v2, v0) = (2+0)/2
    assert m[5.0] == 2.0  # mean(v3, v1)


def test_one_out_of(ts):
    out = ts.select("k", "t", Ser.one_out_of("v", 2, ["k"], "t").alias("o")).collect()
    a = [r["o"] for r in sorted(out, key=lambda r: (r["k"], r["t"])) if r["k"] == "a"]
    assert a == [10.0, None, 30.0, None, 50.0]


def test_distinct_flag(spark):
    rows = [("a", 0.0, "x"), ("a", 1.0, "y"), ("a", 2.0, "x"), ("a", 3.0, "z")]
    df = spark.createDataFrame(rows, "k string, t double, s string")
    out = df.select("t", Ser.distinct_flag("s", ["k"], "t").alias("d")).collect()
    m = {r["t"]: r["d"] for r in out}
    assert m == {0.0: True, 1.0: True, 2.0: False, 3.0: True}


def test_smooth_ewma(spark, ts):
    out = Ser.smooth(ts, "v", 0.5, ["k"], "t").collect()
    a = [r["smoothed"] for r in sorted(out, key=lambda r: (r["k"], r["t"])) if r["k"] == "a"]
    # s0=10; s1=.5*20+.5*10=15; s2=.5*30+.5*15=22.5 ...
    assert a[:3] == [10.0, 15.0, 22.5]


def test_hysteresis(spark):
    # accept=5, max=10 (rising): ok until v>10, back when v<=5
    rows = [("a", float(i), v) for i, v in enumerate([3.0, 11.0, 7.0, 4.0, 8.0])]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = Ser.hysteresis(df, "v", accept=5.0, maximum=10.0, keys=["k"], order_col="t").collect()
    flags = [r["in_range"] for r in sorted(out, key=lambda r: r["t"])]
    assert flags == [True, False, False, True, True]


def test_remember_refresh_vs_recall(spark):
    # value 'x' at t=0, 5, 9 with duration 6:
    # REMEMBER (refresh): t5 seen (5-0<=6), t9 seen (9-5<=6)
    # RECALL (no refresh): t5 seen, t9 NOT seen (9-0>6)
    rows = [("a", 0.0, "x"), ("a", 5.0, "x"), ("a", 9.0, "x")]
    df = spark.createDataFrame(rows, "k string, t double, s string")
    rem = Ser.remember(df, "s", "t", 6.0, ["k"], refresh=True).collect()
    rec = Ser.remember(df, "s", "t", 6.0, ["k"], refresh=False).collect()
    rem_flags = [r["seen_before"] for r in sorted(rem, key=lambda r: r["t"])]
    rec_flags = [r["seen_before"] for r in sorted(rec, key=lambda r: r["t"])]
    assert rem_flags == [False, True, True]
    assert rec_flags == [False, True, False]


def test_reservoir_sample_size_and_determinism(spark):
    rows = [("a", i) for i in range(100)] + [("b", i) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, i long")
    s1 = {(r["k"], r["i"]) for r in Ser.reservoir_sample(df, 10, ["k"]).collect()}
    s2 = {(r["k"], r["i"]) for r in Ser.reservoir_sample(df, 10, ["k"]).collect()}
    assert s1 == s2  # deterministic
    assert sum(1 for k, _ in s1 if k == "a") == 10
    assert sum(1 for k, _ in s1 if k == "b") == 3  # group smaller than n


def test_past_values(spark):
    rows = [("a", float(t), float(t)) for t in [0, 1, 2, 5, 6]]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = df.select("t", Ser.past_values("v", 2.0, "t", ["k"]).alias("p")).collect()
    m = {r["t"]: sorted(r["p"]) for r in out}
    assert m[2.0] == [0.0, 1.0, 2.0]
    assert m[5.0] == [5.0]
    assert m[6.0] == [5.0, 6.0]


def test_damped_holt_runs(spark, ts):
    out = Ser.damped_holt(ts, "v", 0.5, 0.3, 0.9, ["k"], "t")
    assert out.count() == 8 and "holt" in out.columns


def test_largest(spark):
    rows = [("a", i, float(100 - i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, i long, w double")
    top = TopK.largest(df, 3, by=["w"], keys=["k"])
    assert sorted(r["i"] for r in top.collect()) == [0, 1, 2]
    bottom = TopK.largest(df, 2, by=["w"], keys=["k"], smallest=True)
    assert sorted(r["i"] for r in bottom.collect()) == [8, 9]
    but = TopK.largest(df, 2, by=["w"], keys=["k"], but=1)
    assert sorted(r["i"] for r in but.collect()) == [1, 2]


def test_top_list_and_rank(spark):
    rows = [("u%d" % (i % 3), 1.0) for i in range(12)]  # u0 x4, u1 x4, u2 x4
    rows += [("u0", 5.0)]  # u0 pulls ahead
    df = spark.createDataFrame(rows, "item string, w double")
    top = TopK.top_list(df, ["item"], 2, weight=F.col("w"))
    got = [(r["item"], r["weight"], r["rank"]) for r in top.orderBy("rank").collect()]
    assert got[0] == ("u0", 9.0, 1)
    assert got[1][2] == 2
    ranked = TopK.rank_in_top(df, ["item"], 1, weight=F.col("w"))
    m = {r["item"]: r["top_rank"] for r in ranked.collect()}
    assert m["u0"] == 1 and m["u1"] is None


def test_ivf_topk_exact_when_probing_all_cells(spark):
    """n_probe = n_cells ⇒ every pair is scored ⇒ IVF must equal the
    brute-force result exactly (same rounding + tie-break)."""
    from ramen_spark.catalog import load_table
    from ramen_spark.operators import similarity as Sim

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = Sim.kmeans_fit(emb, n_cells=4, iters=1)
    ivf = Sim.ivf_topk(emb, q, cents, k=5, n_probe=4)
    bf = Sim.brute_force_topk(emb, q, k=5)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, ivf.collect()), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, bf.collect()), key=lambda t: (t[0], t[3])
    )


def test_ivf_topk_recall_and_pruning(spark):
    from ramen_spark.catalog import load_table
    from ramen_spark.operators import similarity as Sim

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    cents = Sim.kmeans_fit(emb, n_cells=8, iters=2)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    # centroids are unit vectors
    for c in cents:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9
    ivf = Sim.ivf_topk(emb, q, cents, k=5, n_probe=4)
    bf = Sim.brute_force_topk(emb, q, k=5)
    got = {(r["query_id"], r["corpus_id"]) for r in ivf.collect()}
    want = {(r["query_id"], r["corpus_id"]) for r in bf.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.6, f"recall {recall} too low for half-corpus probe"
    # scale shape: the probe join is an equi-join, never a cartesian
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pq_fit_shapes_and_lloyd_refinement(spark):
    """pq_fit returns codebooks[m][ks][dim/m]; Lloyd rounds must not
    increase the corpus quantization error (mean L2 to the assigned
    codeword, summed over subspaces)."""
    import math

    from ramen_spark.catalog import load_table
    from ramen_spark.operators import similarity as Sim

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = [
        [float(x) for x in r["embedding"]]
        for r in emb.select("embedding").collect()
    ]
    units = []
    for v in rows:
        n = math.sqrt(sum(x * x for x in v))
        units.append([x / n for x in v])

    def qerr(books):
        m, dsub = len(books), len(books[0][0])
        tot = 0.0
        for u in units:
            for s in range(m):
                sub = u[s * dsub : (s + 1) * dsub]
                tot += min(
                    sum((a - b) ** 2 for a, b in zip(sub, cw))
                    for cw in books[s]
                )
        return tot / len(units)

    b0 = Sim.pq_fit(emb, m=8, ks=16, dim=64, iters=0)
    assert len(b0) == 8 and all(len(cbs) == 16 for cbs in b0)
    assert all(len(cw) == 8 for cbs in b0 for cw in cbs)
    b2 = Sim.pq_fit(emb, m=8, ks=16, dim=64, iters=2)
    assert b2 != b0  # refinement moved codewords
    assert qerr(b2) <= qerr(b0) + 1e-12


def test_pq_adc_recall_on_planted_neighbors(spark):
    """The meaningful ANN metric: each query has ONE true strong
    neighbor (cos ≈ 0.999) planted in an otherwise-random corpus
    (typical cos ≈ 1/√dim ≈ 0.18); ADC over 8-byte codes must surface
    it in the top-10 for nearly every query. (Noise-rank overlap with
    brute force is NOT asserted — quantization cannot and need not
    preserve the ordering of ~0-similarity random pairs.)"""
    import numpy as np

    from ramen_spark.operators import similarity as Sim

    rng = np.random.default_rng(11)
    dim, n_base, n_q = 32, 1000, 10
    base = rng.normal(size=(n_base, dim))
    corpus = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(n_base)],
        "vec_id long, embedding array<double>",
    )
    qrows = []
    for j in range(n_q):
        src = j * 97 % n_base
        noisy = base[src] + rng.normal(scale=0.02, size=dim)
        qrows.append((n_base + j, src, noisy.tolist()))
    queries = spark.createDataFrame(
        [(qid, v) for qid, _, v in qrows], "vec_id long, embedding array<double>"
    )
    books = Sim.pq_fit(corpus, m=8, ks=16, dim=dim, iters=2)
    adc = Sim.pq_adc_topk(corpus, queries, books, k=10)
    got = {(r["query_id"], r["corpus_id"]) for r in adc.collect()}
    found = sum(1 for qid, src, _ in qrows if (qid, src) in got)
    assert found >= 9, f"planted-neighbor recall {found}/{n_q}"

    # IVF-PQ with n_probe = n_cells scores every pair → identical to the
    # corpus-wide ADC scan (same codes, same rounding, same tie-break);
    # the probe join must stay an equi-join (partition-pruning at scale)
    cents = Sim.kmeans_fit(corpus, n_cells=4, iters=1)
    ivfpq = Sim.pq_adc_topk(
        corpus, queries, books, k=10, centroids=cents, n_probe=4
    )
    assert sorted(map(tuple, ivfpq.collect())) == sorted(map(tuple, adc.collect()))
    plan = ivfpq._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pq_rerank_equals_bruteforce_at_full_shortlist(spark):
    """shortlist ≥ corpus ⇒ the exact re-rank sees every candidate, so
    the two-stage result must equal brute force exactly (same rounding,
    same tie-break) — quantization only ever prunes, never rescores."""
    from ramen_spark.catalog import load_table
    from ramen_spark.operators import similarity as Sim

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    books = Sim.pq_fit(emb, m=8, ks=16, dim=64, iters=1)
    rr = Sim.pq_rerank_topk(emb, q, books, k=5, shortlist=600)
    bf = Sim.brute_force_topk(emb, q, k=5)
    assert sorted(map(tuple, rr.collect())) == sorted(map(tuple, bf.collect()))


def test_top_above_sigmas_filters_noise(spark):
    """TOP … ABOVE s SIGMAS (raql_expr.type:328-346): entries whose
    aggregated weight is within s stddevs of the mean are dropped even
    when n would admit them; sigmas=0 keeps everything."""
    # 20 noise items of weight ~1, one heavy hitter of weight 50
    rows = [(f"n{i}", 1.0) for i in range(20)] + [("hot", 50.0)]
    df = spark.createDataFrame(rows, "item string, w double")

    noisy = TopK.top_list(df, ["item"], 5, weight=F.col("w"))
    assert noisy.count() == 5  # no filter: noise fills the top

    clean = TopK.top_list(df, ["item"], 5, weight=F.col("w"), sigmas=2.0)
    got = [(r["item"], r["rank"]) for r in clean.collect()]
    assert got == [("hot", 1)]  # only the >2σ outlier survives

    # grouped form: per-key stats, parallel window (no global funnel)
    rows2 = [("a", f"n{i}", 1.0) for i in range(20)] + [("a", "hot", 50.0)]
    rows2 += [("b", f"m{i}", 1.0) for i in range(10)]  # b: all noise, σ=0
    df2 = spark.createDataFrame(rows2, "k string, item string, w double")
    g = TopK.top_list(df2, ["item"], 5, weight=F.col("w"), by=["k"], sigmas=2.0)
    by_k = {(r["k"], r["item"]) for r in g.collect()}
    assert ("a", "hot") in by_k and not any(k == "a" and i != "hot" for k, i in by_k)
    # σ=0 group: threshold = mean, all-equal weights survive (w >= mean)
    assert sum(1 for k, _ in by_k if k == "b") == 5


def test_connected_components_multihop(spark):
    """Chains longer than one hop collapse to one component (min id),
    disjoint edges stay separate, direction is irrelevant
    (operators.dedup.connected_components)."""
    from ramen_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r["v"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}
