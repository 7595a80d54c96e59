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


def _learn_merges_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """The classic heap-based BPE learner (Sennrich et al. 2016, the
    incremental-update variant) over an in-memory word-frequency
    table. Merge-for-merge identical to the distributed round loop in
    ``learn_bpe_merges`` — same pair statistics (adjacent positions,
    overlaps counted), same greedy left-to-right non-overlapping
    application, same (count desc, left asc, right asc) tie-break
    (encoded directly in the heap key ``(-count, l, r)``) — but each
    merge costs O(affected words) locally instead of a full Spark job,
    which is what makes a real 32k-merge vocabulary reachable:
    sequential-job latency alone would be ~hours for 32k rounds, and
    the table the rounds iterate on is Zipf-shrunk + ``max_vocab``
    capped — it FITS on the driver by construction."""
    import heapq

    words: list[list[str]] = [list(w) for w, _ in word_counts]
    counts: list[int] = [int(n) for _, n in word_counts]
    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, c) in enumerate(zip(words, counts)):
        for p in zip(syms, syms[1:]):
            stats[p] = stats.get(p, 0) + c
            where.setdefault(p, set()).add(i)
    heap = [(-c, l, r) for (l, r), c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, l, r = heapq.heappop(heap)
        cur = stats.get((l, r), 0)
        if cur <= 0:
            continue
        if -negc != cur:
            # stale entry (count changed since push): lazy re-insert
            # the true count and keep popping
            heapq.heappush(heap, (-cur, l, r))
            continue
        merges.append((l, r, cur))
        new_sym = l + r
        changed: set[tuple[str, str]] = set()
        # iteration order is irrelevant: stat updates are additive
        for i in where.get((l, r), ()):
            old = words[i]
            out: list[str] = []
            j, hit = 0, False
            while j < len(old):
                if j + 1 < len(old) and old[j] == l and old[j + 1] == r:
                    out.append(new_sym)
                    j += 2
                    hit = True
                else:
                    out.append(old[j])
                    j += 1
            if not hit:
                continue  # stale index: pair already merged away here
            c = counts[i]
            for p in zip(old, old[1:]):
                stats[p] = stats.get(p, 0) - c
                changed.add(p)
            for p in zip(out, out[1:]):
                stats[p] = stats.get(p, 0) + c
                where.setdefault(p, set()).add(i)
                changed.add(p)
            words[i] = out
        for p in changed:
            c = stats.get(p, 0)
            if c <= 0:
                stats.pop(p, None)
                where.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def learn_bpe_merges_local(
    docs: DataFrame,
    n_merges: int = 32_000,
    text_col: str = "text",
    max_vocab: int | None = 1_000_000,
) -> list[tuple[str, str, int]]:
    """The SCALE path for vocabulary induction: ONE distributed corpus
    pass builds the word-frequency table; the merge rounds then run
    locally over the collected table (``_learn_merges_from_counts``).
    Result is merge-for-merge equal to ``learn_bpe_merges`` (pinned by
    test) — only the execution locus differs, because the per-round
    relation is driver-sized by construction while the number of
    rounds (32k-100k for a real tokenizer) is NOT Spark-job-sized.

    ``max_vocab`` bounds the collect (1M (word, n) rows ≈ tens of MB
    of driver traffic — the one collect in this operator); None is for
    small corpora only. Character split is Python iteration (code
    points), matching Spark's ``split(word, '')`` for all
    basic-multilingual-plane text."""
    vocab = word_frequency_table(docs, text_col)
    if max_vocab is not None:
        vocab = vocab.orderBy(
            F.col("n").desc(), F.col("word").asc()
        ).limit(int(max_vocab))
    rows = vocab.collect()
    return _learn_merges_from_counts(
        [(r["word"], r["n"]) for r in rows], int(n_merges)
    )


def make_bpe_encoder(merges: list[tuple[str, str, int]]):
    """The SCALE path for encoding: an Arrow-batched pandas_udf over
    the tokenized words, applying merges by RANK PRIORITY (repeatedly
    merge the lowest-ranked pair present — the GPT-2/subword-nmt
    encode algorithm) with a per-word memo cache (Zipf → the cache
    absorbs almost every lookup). Equivalent to the sequential
    rank-order application of ``bpe_encode`` for any merge list
    produced by BPE learning (each merge's constituents exist only
    via earlier merges), and pinned equal by test — but O(word_len ×
    merges_hit) per UNIQUE word instead of a 32k-deep Catalyst fold
    expression per row, which the analyzer cannot even hold.

    The merge-ranks dict rides the UDF closure (broadcast once per
    executor by Spark's task serialization); returns a function usable
    as a column expression: ``encoder(Tx.tokens(F.col('text')))``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks: dict[tuple[str, str], int] = {
        (l, r): i for i, (l, r, *_rest) in enumerate(merges)
    }

    def encode_word(w: str, _cache: dict = {}) -> list[str]:
        out = _cache.get(w)
        if out is not None:
            return out
        syms = list(w)
        while len(syms) > 1:
            best, best_rank = None, None
            for p in zip(syms, syms[1:]):
                rk = ranks.get(p)
                if rk is not None and (best_rank is None or rk < best_rank):
                    best, best_rank = p, rk
            if best is None:
                break
            l, r = best
            ns: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    ns.append(l + r)
                    j += 2
                else:
                    ns.append(syms[j])
                    j += 1
            syms = ns
        if len(_cache) < 1_000_000:  # bound executor memory
            _cache[w] = syms
        return syms

    # NB: runtime annotations — `from __future__ import annotations`
    # turns inline hints into strings pandas_udf can't resolve here
    def _encode(words):
        return words.map(
            lambda ws: [t for w in ws for t in encode_word(w)]
        )

    _encode.__annotations__ = {"words": pd.Series, "return": pd.Series}
    return pandas_udf(_encode, "array<string>")


def bpe_encode_arrow(text_col, merges: list[tuple[str, str, int]]):
    """Column expression: tokenize with the SAME JVM tokenizer as
    ``bpe_encode`` (Tx.tokens — parity by construction), then encode
    the word array in one Arrow batch hop. This is the path a 100 TB
    encode job takes; ``bpe_encode``'s nested JVM folds stay the
    oracle-friendly twin for short merge lists."""
    return make_bpe_encoder(merges)(Tx.tokens(text_col))


def bpe_encode(text_col, merges: list[tuple[str, str, int]]):
    """Column expression tokenizing each whitespace word of ``text_col``
    with the learned merges applied in rank order — all row-local JVM
    folds (no Python per row). Returns array<string> of subword
    symbols. SHORT merge lists only: each merge adds one nested
    ``aggregate()`` fold, so a real 32k-merge vocabulary would build a
    32k-deep Catalyst expression (analyzer-fatal) — that job belongs
    to ``bpe_encode_arrow``; this twin stays for oracle-checkable
    few-merge paths and as the equality reference."""
    def encode_word(w):
        syms = _symbolize(w)
        for l, r, _ in merges:
            syms = _apply_merge(syms, l, r)
        return syms

    return F.flatten(
        F.transform(Tx.tokens(text_col), lambda w: encode_word(w))
    )
