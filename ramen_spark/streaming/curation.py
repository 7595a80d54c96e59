"""Always-on curation lane — the stateless front half of the training
pipeline (PII redaction → domain blocklist → line-quality correction →
Gopher repetition gate) as ONE transformation that runs identically on
a batch DataFrame and a Structured Streaming source.

Every rule here is row-local (array HOFs / regexes) or a stream-static
broadcast anti-join (the blocklist), so the streaming twin needs no
state store and no watermark: the emission over any batch split equals
the batch run row-for-row — the same parity contract as the dedup
lanes in streaming/dedup.py, pinned by
test_streaming_curation_equals_batch.

100 TB shape: zero shuffle per micro-batch (the blocklist broadcasts
once); throughput is bounded by the scan, exactly like the batch form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import ramen_spark.functions.text as Tx


def _sum_lengths(arr: Column) -> Column:
    return F.aggregate(
        F.transform(arr, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )


def curate(
    docs: DataFrame,
    blocklist: list[str] | None = None,
    url_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_retained_frac: float = 0.5,
) -> DataFrame:
    """The composed stateless curation stage. Steps, in pipeline
    order:

    1. domain blocklist (optional — needs ``url_col``): broadcast
       equi-anti-joins via functions.text.filter_blocked_domains;
    2. PII redaction (typed placeholders);
    3. line-quality correction: drop bullet/ellipsis/short lines,
       keep the doc only if ≥ ``min_retained_frac`` of its characters
       survive (RefinedWeb rule);
    4. Gopher repetition gate on the corrected text: duplicate-line
       fraction < 0.3, duplicate-line-char fraction < 0.2,
       symbol-to-word ratio < 0.1, alpha-word fraction > 0.8
       (published thresholds — queries.repetition_signals is the
       oracle-checked twin of these signals).

    Output: (id, cleaned, n_lines, n_kept, retained_char_frac) for
    surviving documents. Works unchanged on a readStream DataFrame."""
    out = docs
    if blocklist and url_col:
        out = Tx.filter_blocked_domains(out, list(blocklist), url_col)
    red = out.select(
        F.col(id_col),
        Tx.redact_pii(F.col(text_col)).alias("_t"),
    )
    staged = red.select(
        id_col, "_t", Tx.doc_lines(F.col("_t")).alias("_ls")
    ).filter(F.size("_ls") > 0)
    kept = F.filter(
        F.col("_ls"),
        lambda x: ~(
            x.startswith("-")
            | x.startswith("*")
            | x.startswith("•")
            | x.endswith("...")
            | (F.size(Tx.tokens(x)) < 3)
        ),
    )
    k = staged.select(id_col, "_ls", kept.alias("_kept")).filter(
        F.size("_kept") > 0
    )
    frac = _sum_lengths(F.col("_kept")).cast("double") / _sum_lengths(
        F.col("_ls")
    )
    corrected = k.select(
        id_col,
        F.size("_ls").cast("bigint").alias("n_lines"),
        F.size("_kept").cast("bigint").alias("n_kept"),
        F.round(frac, 6).alias("retained_char_frac"),
        F.array_join("_kept", "\n").alias("cleaned"),
    ).filter(F.col("retained_char_frac") >= float(min_retained_frac))
    # repetition gate over the CORRECTED text (staged attributes — the
    # Catalyst re-evaluation rule from functions.text applies)
    g = corrected.select(
        "*",
        Tx.doc_lines(F.col("cleaned")).alias("_gl"),
        Tx.tokens(F.col("cleaned")).alias("_gw"),
    ).filter((F.size("_gl") > 0) & (F.size("_gw") > 0))
    gl, gw, gt = F.col("_gl"), F.col("_gw"), F.col("cleaned")
    n_lines, n_words = F.size(gl), F.size(gw)
    dup_lines = 1.0 - F.size(F.array_distinct(gl)).cast("double") / n_lines
    dup_chars = (
        _sum_lengths(gl) - _sum_lengths(F.array_distinct(gl))
    ).cast("double") / _sum_lengths(gl)
    n_hash = F.length(gt) - F.length(F.replace(gt, F.lit("#"), F.lit("")))
    n_ell = F.length(gt) - F.length(F.replace(gt, F.lit("..."), F.lit("")))
    symbol_ratio = (n_hash + n_ell / 3) / n_words
    alpha = (
        F.size(F.filter(gw, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words
    )
    keep = (
        (dup_lines < 0.3)
        & (dup_chars < 0.2)
        & (symbol_ratio < 0.1)
        & (alpha > 0.8)
    )
    return g.filter(keep).select(
        id_col, "cleaned", "n_lines", "n_kept", "retained_char_frac"
    )


def curation_stream(
    doc_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    blocklist: list[str] | None = None,
    url_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Run ``curate`` as an always-on ingestion stage: micro-batches
    of raw documents in, curated documents appended to ``out_dir``.
    Stateless end to end — no state store, no watermark; returns the
    started StreamingQuery."""
    cleaned = curate(
        doc_stream,
        blocklist=blocklist,
        url_col=url_col,
        text_col=text_col,
        id_col=id_col,
    )
    return (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
