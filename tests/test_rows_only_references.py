"""One-command proof for every REGISTRY query without a DuckDB oracle
(round-7 verdict #6): the six rows-only entries each get a test here
that pins the REGISTRY CALLABLE ITSELF (not just its operator) against
an independently-computed reference at sf0.01 — pure-Python
recurrences, numpy linear algebra, or the value-exact SQL twin.

    python -m pytest tests/test_rows_only_references.py -q

`test_registry_rows_only_set_is_covered` fails if a new rows-only
query is registered without adding its reference test here, so this
file cannot silently rot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

# the set this module claims to cover — asserted against the live
# registry below
COVERED = {
    "bpe_learn_merges",
    "ffd_sequence_packing",
    "holt_winters_smoothing",
    "multilinreg_fit",
    "prepare_training_corpus_classifier",
    "quality_classifier_scores",
    "semantic_dedup_exact_arrow",
    "zlib_compressibility",
}


def test_registry_rows_only_set_is_covered():
    from ramen_spark.queries import ORACLES, QUERIES

    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == COVERED, (
        "rows-only registry changed; update tests/test_rows_only_references.py: "
        f"missing={sorted(rows_only - COVERED)} stale={sorted(COVERED - rows_only)}"
    )


def _events(spark):
    from ramen_spark.catalog import load_table

    return load_table(spark, SF_ORACLE, "events")


def test_rows_only_reference_holt_winters_smoothing(spark):
    """The registry entry vs a plain-Python recurrence over collected
    rows: per event_type sorted by ts, damped Holt-Winters with the
    same (α, β, γ, φ, p) — pins the grouped-fold plumbing (grouping,
    ordering, seasonal indexing) that the rows-only driver check
    never sees."""
    from ramen_spark.queries import QUERIES

    rows = _events(spark).select("event_id", "event_type", "ts", "value").collect()
    # reference ordering must be total: no (event_type, ts) ties
    keys = [(r["event_type"], r["ts"]) for r in rows]
    assert len(keys) == len(set(keys)), "tied timestamps — reference undefined"

    alpha, beta, gamma, phi, period = 0.5, 0.3, 0.2, 0.9, 24
    expect: dict[int, float] = {}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for grp in by_type.values():
        grp.sort(key=lambda r: r["ts"])
        season = [0.0] * period
        level, trend = (float(grp[0]["value"]) if grp else 0.0), 0.0
        for i, r in enumerate(grp):
            x = float(r["value"])
            s = i % period
            prev = level
            level = alpha * (x - season[s]) + (1 - alpha) * (level + phi * trend)
            trend = beta * (level - prev) + (1 - beta) * phi * trend
            season[s] = gamma * (x - level) + (1 - gamma) * season[s]
            expect[r["event_id"]] = round(
                level + phi * trend + season[(i + 1) % period], 6
            )

    got = {
        r["event_id"]: r["hw"]
        for r in QUERIES["holt_winters_smoothing"](spark, SF_ORACLE).collect()
    }
    assert got.keys() == expect.keys()
    bad = [k for k in got if abs(got[k] - expect[k]) > 1e-6]
    assert not bad, (len(bad), bad[:5])


def test_rows_only_reference_multilinreg_fit(spark):
    """The registry entry vs numpy NORMAL EQUATIONS (a different
    solver than the operator's lstsq) per event_type: fitted values
    must agree to the query's 6dp rounding."""
    import numpy as np

    from ramen_spark.queries import QUERIES

    rows = _events(spark).select(
        "event_id",
        "event_type",
        ((F.unix_micros("ts") - F.lit(1704067200000000)) / F.lit(86400000000.0)).alias(
            "t_day"
        ),
        "user_id",
        "value",
    ).collect()
    expect: dict[int, float] = {}
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for grp in by_type.values():
        X = np.column_stack(
            [
                np.array([r["t_day"] for r in grp], dtype=float),
                np.array([r["user_id"] for r in grp], dtype=float),
                np.ones(len(grp)),
            ]
        )
        y = np.array([r["value"] for r in grp], dtype=float)
        coef = np.linalg.solve(X.T @ X, X.T @ y)
        fit = X @ coef
        for r, v in zip(grp, fit):
            expect[r["event_id"]] = v

    got = {
        r["event_id"]: r["fitted"]
        for r in QUERIES["multilinreg_fit"](spark, SF_ORACLE).collect()
    }
    assert got.keys() == expect.keys()
    bad = [k for k in got if abs(got[k] - round(expect[k], 6)) > 1e-5]
    assert not bad, (len(bad), bad[:5])


def test_rows_only_reference_bpe_learn_merges(spark):
    """The registry entry vs the classic sequential BPE algorithm in
    pure Python over the collected corpus text — same tokenization
    (whitespace), same pair stats, same tie-break."""
    from collections import Counter

    from ramen_spark.catalog import load_table
    from ramen_spark.queries import QUERIES

    texts = [
        r["text"]
        for r in load_table(spark, SF_ORACLE, "documents").select("text").collect()
    ]
    vocab = Counter(w for t in texts for w in t.split())
    syms = {w: list(w) for w in vocab}
    expect = []
    for _ in range(8):
        pc: Counter = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (l, r), c = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        expect.append((l, r, c))
        for w in syms:
            s, ns = syms[w], []
            for x in s:
                if ns and ns[-1] == l and x == r:
                    ns[-1] = l + r
                else:
                    ns.append(x)
            syms[w] = ns

    got = [
        (r["left"], r["right"], r["weight"])
        for r in QUERIES["bpe_learn_merges"](spark, SF_ORACLE)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_rows_only_reference_semantic_dedup_exact_arrow(spark):
    """The Arrow/BLAS registry entry vs its value-exact SQL twin
    (`semantic_dedup`, which IS oracle-checked): identical (cell,
    keep) per vector and centroid similarities equal to float noise."""
    from ramen_spark.queries import QUERIES

    sql_rows = {
        r["vec_id"]: (r["cell"], r["centsim"], r["keep"])
        for r in QUERIES["semantic_dedup"](spark, SF_ORACLE).collect()
    }
    arr_rows = {
        r["vec_id"]: (r["cell"], r["centsim"], r["keep"])
        for r in QUERIES["semantic_dedup_exact_arrow"](spark, SF_ORACLE).collect()
    }
    assert sql_rows.keys() == arr_rows.keys() and len(sql_rows) > 0
    for k in sql_rows:
        sc, ss, sk = sql_rows[k]
        ac, as_, ak = arr_rows[k]
        assert (sc, sk) == (ac, ak), k
        assert abs(ss - as_) <= 1e-9, (k, ss, as_)


def _numpy_irls_weights(spark):
    """numpy IRLS over the sf0.01 documents' feature matrix — the
    independent twin of train_quality_classifier on the REAL corpus."""
    import numpy as np

    from ramen_spark.catalog import load_table
    from ramen_spark.operators.classify import default_quality_features

    docs = load_table(spark, SF_ORACLE, "documents")
    feats = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("y"),
        *[
            f.alias(f"f{i}")
            for i, f in enumerate(default_quality_features(F.col("text")))
        ],
    ).collect()
    y = np.array([r["y"] for r in feats])
    X = np.column_stack(
        [np.ones(len(feats))]
        + [np.array([r[f"f{i}"] for r in feats]) for i in range(6)]
    )
    beta = np.zeros(X.shape[1])
    for _ in range(6):
        p = 1.0 / (1.0 + np.exp(-X @ beta))
        wt = p * (1 - p)
        H = X.T @ (X * wt[:, None]) + np.eye(X.shape[1]) * 1e-6
        beta = beta + np.linalg.solve(H, X.T @ (y - p))
    probs = 1.0 / (1.0 + np.exp(-X @ beta))
    return beta, {r["doc_id"]: pr for r, pr in zip(feats, probs)}


def test_rows_only_reference_quality_classifier_scores(spark):
    """The registry entry vs numpy IRLS on the real corpus: every
    document's sigmoid score agrees to float-accumulation noise."""
    from ramen_spark.queries import QUERIES

    _beta, expect = _numpy_irls_weights(spark)
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in QUERIES["quality_classifier_scores"](spark, SF_ORACLE).collect()
    }
    assert got.keys() == expect.keys()
    bad = [k for k in got if abs(got[k] - expect[k]) > 1e-6]
    assert not bad, (len(bad), bad[:5])


def test_rows_only_reference_prepare_training_corpus_classifier(spark):
    """The classifier-gated pipeline vs the SAME pipeline driven by an
    INDEPENDENTLY computed gate: numpy-IRLS scores decide the keep set
    (prob ≥ 0.5), injected via _prepare_corpus's gate_keep hook —
    every other stage is the oracle-checked machinery, so end-to-end
    equality pins the one non-oracle stage in its composed position."""
    from ramen_spark.queries import QUERIES, _prepare_corpus

    _beta, probs = _numpy_irls_weights(spark)
    keep_ids = sorted(k for k, p in probs.items() if p >= 0.5)
    assert 0 < len(keep_ids) < len(probs)  # the gate actually gates
    gate_df = spark.createDataFrame(
        [(i,) for i in keep_ids], "doc_id long"
    )
    expect = {
        tuple(r)
        for r in _prepare_corpus(
            spark, SF_ORACLE, gate="classifier", gate_keep=gate_df
        ).collect()
    }
    got = {
        tuple(r)
        for r in QUERIES["prepare_training_corpus_classifier"](
            spark, SF_ORACLE
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_rows_only_reference_zlib_compressibility(spark):
    """The registry entry vs direct zlib calls over the same parquet:
    every doc's ratio must equal len(zlib.compress(utf8, 6)) /
    len(utf8) exactly (deterministic for a fixed zlib/level), and the
    low_ratio flag must match < 0.10 on the raw ratio. Also pins
    non-vacuity: the sf0.01 corpus has both flagged and unflagged
    docs only if a planted redundant doc exists — assert at least
    the unflagged side is populated and the flag agrees everywhere."""
    import zlib
    from decimal import ROUND_HALF_UP, Decimal

    from ramen_spark.catalog import load_table
    from ramen_spark.queries import QUERIES

    got = {
        r["doc_id"]: r
        for r in QUERIES["zlib_compressibility"](spark, SF_ORACLE).collect()
    }
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    checked = 0
    for r in docs:
        if r["text"] is None or len(r["text"]) == 0:
            assert r["doc_id"] not in got
            continue
        b = r["text"].encode("utf-8")
        ratio = len(zlib.compress(b, 6)) / len(b)
        g = got[r["doc_id"]]
        # Spark's ROUND is HALF_UP on the double's exact value;
        # Python's round() is banker's — emulate Spark's
        assert g["zlib_ratio"] == float(
            Decimal(ratio).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        assert g["low_ratio"] == (ratio < 0.10)
        checked += 1
    assert checked == len(got) > 0


def test_rows_only_reference_ffd_sequence_packing(spark):
    """The FFD packer vs a pure-Python first-fit-decreasing replay:
    identical (doc_id -> shard, pack_seq) assignment, and the
    discipline demonstrably pays — total pad must be <= the oracle-
    checked stream-order packer's on the same corpus/budget."""
    from ramen_spark.catalog import load_table
    from ramen_spark.functions import text as Tx
    from ramen_spark.queries import QUERIES

    got = {
        r["doc_id"]: (r["shard"], r["pack_seq"], r["n_tok"])
        for r in QUERIES["ffd_sequence_packing"](spark, SF_ORACLE).collect()
    }

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", Tx.token_count(F.col("text")).cast("long").alias("n_tok")
    ).collect()
    budget = 512
    by_shard: dict[int, list] = {}
    for r in docs:
        by_shard.setdefault(int(r["doc_id"]) % 8, []).append(
            (int(r["doc_id"]), int(r["n_tok"]))
        )
    expect = {}
    pad_ffd = 0
    for shard, rows in by_shard.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        loads: list[int] = []
        for did, n in rows:
            for i, ld in enumerate(loads):
                if ld + n <= budget:
                    loads[i] = ld + n
                    expect[did] = (shard, i, n)
                    break
            else:
                loads.append(n)
                expect[did] = (shard, len(loads) - 1, n)
        pad_ffd += sum(max(budget - ld, 0) for ld in loads)
    assert got == expect

    # FFD actually reduces waste vs the stream-order packer
    eff = {
        r["strategy"]: r["total_pad"]
        for r in QUERIES["packing_efficiency"](spark, SF_ORACLE).collect()
    }
    assert pad_ffd <= eff["id"], (pad_ffd, eff)
