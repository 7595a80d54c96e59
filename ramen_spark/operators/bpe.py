"""BPE merge learning — tokenizer vocabulary induction (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"). Training-pipeline extension: the tokenizer a 100 TB corpus
will be encoded with is itself learned FROM the corpus.

The classic efficiency trick shapes the whole plan: BPE statistics
are a function of the WORD-FREQUENCY TABLE, not the raw text — one
corpus pass aggregates (word, count), and every merge round then runs
over that small, Zipf-shrunk relation (vocabulary size grows
sub-linearly with corpus size; at 100 TB one would also cap learning
to the top-K words or a corpus sample, both one filter here). Each
round is: explode adjacent symbol pairs weighted by word count →
groupBy(pair) sum → argmax (one collected row — the only thing that
ever reaches the driver) → row-local fold applying the merge →
localCheckpoint (the connected-components lesson: iterative plans
must cut lineage per round or AQE recomputes the history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ramen_spark.functions import text as Tx


def _symbolize(word):
    """word → array of single-character symbols (split on the empty
    pattern; Spark yields no empty edge strings for '')."""
    return F.split(word, "")


def _pairs(syms):
    """Adjacent symbol pairs as structs, weighted by the caller."""
    return F.transform(
        Tx.window_starts(F.size(syms), 2),
        lambda i: F.struct(
            F.element_at(syms, i).alias("l"),
            F.element_at(syms, i + 1).alias("r"),
        ),
    )


def _apply_merge(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge fold: append each
    symbol, except when the accumulator's last element is ``left`` and
    the incoming symbol is ``right`` — then replace the last element
    with the concatenation (classic BPE application order: 'aaa' under
    (a,a) → [aa, a])."""
    merged = F.concat(F.lit(left), F.lit(right))
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass → (word, n) — the relation BPE learns on."""
    return (
        docs.select(F.explode(Tx.tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    max_vocab: int | None = None,
) -> list[tuple[str, str, int]]:
    """Learn the top ``n_merges`` BPE merges from the corpus; returns
    [(left, right, weighted_count), …] in merge order. Deterministic:
    the argmax tie-break is (count desc, left asc, right asc).

    ``max_vocab`` caps learning to the most frequent words (count
    desc, word asc) — the standard 100 TB move; None learns on the
    full vocabulary."""
    vocab = word_frequency_table(docs, text_col)
    if max_vocab is not None:
        vocab = (
            vocab.orderBy(F.col("n").desc(), F.col("word").asc())
            .limit(int(max_vocab))
        )
    state = vocab.select(
        _symbolize(F.col("word")).alias("syms"), F.col("n")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        top = (
            state.select(F.explode(_pairs(F.col("syms"))).alias("p"), "n")
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((l, r, c))
        nxt = state.select(
            _apply_merge(F.col("syms"), l, r).alias("syms"), F.col("n")
        ).localCheckpoint(eager=True)
        state.unpersist()
        state = nxt
    state.unpersist()
    return merges


def bpe_encode(text_col, merges: list[tuple[str, str, int]]):
    """Column expression tokenizing each whitespace word of ``text_col``
    with the learned merges applied in rank order — the encode side,
    all row-local JVM folds (no Python per row). Returns
    array<string> of subword symbols."""
    def encode_word(w):
        syms = _symbolize(w)
        for l, r, _ in merges:
            syms = _apply_merge(syms, l, r)
        return syms

    return F.flatten(
        F.transform(Tx.tokens(text_col), lambda w: encode_word(w))
    )
