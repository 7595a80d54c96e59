"""Trained quality classification — the GPT-3/LLaMA data-pipeline
stage that LEARNS its quality filter instead of hard-coding one: fit
a logistic regression separating a high-quality reference slice from
the rest of the corpus, then score every document with the trained
model (GPT-3 trained such a classifier against WebText; LLaMA against
Wikipedia-referenced pages; here the reference slice is any boolean
predicate over the corpus).

Training-pipeline extension (no reference counterpart; the nearest
surface is MULTILINREG, the reference's closed-form linear fit —
operators/series.py). Distributed Newton/IRLS with the same shape as
kmeans_fit: the features are a FIXED small set of row-local JVM
expressions (d ≈ 7), so each Newton step is ONE aggregate job
computing the d×d weighted Gram moments and d gradient sums — ~60
partial-aggregated doubles reach the driver per step, the d×d solve
runs in numpy, and the updated weights re-enter the next step's plan
as literals. No shuffle beyond the aggregate's partials; scoring is a
pure row-local sigmoid — zero-shuffle, embarrassingly parallel at any
corpus size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ramen_spark.functions import text as Tx


def default_quality_features(text_col: Column) -> list[Column]:
    """The engineered per-document features (all row-local JVM
    expressions; each roughly centered/scaled to O(1) so the Newton
    steps stay well-conditioned without a standardization pass):
    log token count, mean word length, stopword ratio, punctuation
    density, uppercase-start ratio, type-token ratio."""
    w = Tx.tokens(text_col)
    nw = F.size(w).cast("double")
    safe_nw = F.greatest(nw, F.lit(1.0))
    mean_wl = (
        F.aggregate(
            F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        ).cast("double")
        / safe_nw
    )
    stop = F.size(
        F.filter(
            w,
            lambda x: F.lower(x).isin(
                "the", "a", "an", "of", "to", "and", "in", "is", "it", "that"
            ),
        )
    ).cast("double")
    punct = (
        F.length(F.regexp_replace(text_col, r"[^.,;:!?]", "")).cast("double")
        / F.greatest(F.length(text_col).cast("double"), F.lit(1.0))
    )
    upper = F.size(
        F.filter(w, lambda x: x.rlike("^[A-Z]"))
    ).cast("double")
    ttr = F.size(F.array_distinct(w)).cast("double") / safe_nw
    return [
        F.log(safe_nw + 1.0),
        mean_wl,
        stop / safe_nw,
        punct,
        upper / safe_nw,
        ttr,
    ]


def train_quality_classifier(
    docs: DataFrame,
    label_pred: Column,
    text_col: str = "text",
    features: list[Column] | None = None,
    iters: int = 8,
    ridge: float = 1e-6,
) -> list[float]:
    """Fit logistic weights (bias first) by Newton/IRLS; returns the
    weight vector. ``label_pred`` marks the high-quality reference
    slice (y=1). ``ridge`` keeps the d×d solve nonsingular on
    degenerate corpora. Determinism caveat: the moment sums are float
    aggregations, so weights are stable only to accumulation order —
    the rows-only registry tier (like multilinreg_fit)."""
    import numpy as np

    feats = features if features is not None else default_quality_features(
        F.col(text_col)
    )
    d = len(feats) + 1  # bias
    # materialize features ONCE: every Newton step re-reads this
    # relation, and the feature expressions (tokenize + array folds)
    # are the expensive part — without the cache the corpus would be
    # re-tokenized per iteration (measured: the whole fit is ~1 scan
    # plus d²-column aggregates instead of `iters` scans)
    base = docs.select(
        label_pred.cast("double").alias("_y"),
        *[f.alias(f"_f{i}") for i, f in enumerate(feats)],
    ).cache()
    xs = [F.lit(1.0)] + [F.col(f"_f{i}") for i in range(len(feats))]
    beta = np.zeros(d)
    for _ in range(int(iters)):
        blit = [F.lit(float(b)) for b in beta]
        eta = sum(b * x for b, x in zip(blit, xs))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        wgt = p * (F.lit(1.0) - p)
        aggs = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(F.sum(wgt * xs[i] * xs[j]).alias(f"h_{i}_{j}"))
        for i in range(d):
            aggs.append(F.sum((F.col("_y") - p) * xs[i]).alias(f"g_{i}"))
        row = base.agg(*aggs).collect()[0]
        H = np.zeros((d, d))
        g = np.zeros(d)
        for i in range(d):
            for j in range(i, d):
                H[i, j] = H[j, i] = row[f"h_{i}_{j}"] or 0.0
            g[i] = row[f"g_{i}"] or 0.0
        H += np.eye(d) * ridge
        beta = beta + np.linalg.solve(H, g)
        if not np.all(np.isfinite(beta)):  # pragma: no cover — guard
            base.unpersist()
            raise ValueError("IRLS diverged; scale the features")
    base.unpersist()
    return [float(b) for b in beta]


def score_quality(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    features: list[Column] | None = None,
) -> DataFrame:
    """Apply trained weights: (id, quality_prob) — one row-local
    sigmoid, no shuffle, no Python per row."""
    feats = features if features is not None else default_quality_features(
        F.col(text_col)
    )
    xs = [F.lit(1.0)] + feats
    eta = sum(F.lit(float(b)) * x for b, x in zip(weights, xs))
    return docs.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)), 6).alias(
            "quality_prob"
        ),
    )
