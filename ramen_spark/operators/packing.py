"""Sequence packing — the batch-assembly stage of an LLM training
pipeline.

Not in the reference's surface (training-pipeline extension, like
operators.dedup): documents are greedily packed into fixed
token-budget training rows. Packing is inherently a sequential
recurrence (each doc's pack depends on the running total), so the
100 TB shape is SHARD-parallel greedy packing: documents hash into
``shards`` independent streams, each shard packs its own docs in a
deterministic order with one Arrow-batched fold — no global order, no
driver loop, and the pack quality loss vs a global bin-packer is
bounded (next-fit within a shard wastes < 1 doc per pack boundary).
Deterministic by construction: (shard, doc order) fixes every pack id,
so re-runs and the DuckDB oracle reproduce it exactly.

Two knobs a real pipeline turns (round 11):

* ``order`` — ``"id"`` (stream order), ``"length_desc"``
  (next-fit-decreasing), or ``"ffd"`` (FIRST-fit-decreasing: longest
  docs first, each placed into the first open pack with room — the
  classic 11/9·OPT bin-packer, per shard). Intuition is a poor guide
  here, which is why ``packing_efficiency`` measures instead: on the
  test corpus next-fit-DECREASING is WORSE than stream order (0.144
  vs 0.116 pad at budget 512 — with only one open pack, a long doc
  closes it on a large gap), while true FFD wins (0.053). FFD's pack
  order no longer follows document order (irrelevant when the loader
  shuffles packs) and its fold keeps all open-pack loads as state
  (bounded by the pack count of one shard).
* ``group_cols`` — pack ONLY within matching groups (e.g. per
  language or per source): many recipes forbid cross-domain
  attention inside one training row. The fold is keyed by
  (shard, groups), so grouping ADDS fold parallelism while each
  fold's state stays one counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ramen_spark.functions import text as Tx


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
    order: str = "id",
    group_cols: list[str] | None = None,
    n_tok_col: str | None = None,
) -> DataFrame:
    """→ (group_cols…, doc_id, shard, pack_seq, n_tok): greedy
    next-fit packing of whitespace-token counts into ``budget``-token
    packs, independent per hash shard (and per group when
    ``group_cols`` is given — pack ids restart per (shard, groups)).
    A doc longer than the budget gets its own pack (standard oversize
    handling). One shuffle (by shard + groups), one Arrow-batched
    sequential fold per fold key. ``order``: see module docstring.

    ``n_tok_col`` (round 13): a PRECOMPUTED whitespace-token-count
    column to pack by, instead of tokenizing ``text_col`` here. The
    composed pipelines already tokenize every surviving document for
    the quality score — passing that count through means packing
    never decodes text at all (guide §1.2: one pass, not two). The
    caller owns the contract that the column equals
    ``functions.text.token_count(text)`` of the same rows."""
    if order not in ("id", "length_desc", "ffd"):
        raise ValueError(
            f"order must be 'id', 'length_desc' or 'ffd', got {order!r}"
        )
    gcols = list(group_cols or [])
    clash = {c for c in gcols} & {"doc_id", "shard", "pack_seq", "n_tok"}
    if clash:
        raise ValueError(f"group_cols collide with output columns: {clash}")
    gtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in gcols if c not in gtypes]
    if missing:
        raise ValueError(f"group_cols not in df: {missing}")
    n_tok = (
        F.col(n_tok_col)
        if n_tok_col is not None
        else Tx.token_count(F.col(text_col))
    )
    base = df.select(
        *gcols,
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        n_tok.cast("long").alias("n_tok"),
    )
    by, asc = (
        (["doc_id"], [True])
        if order == "id"
        else (["n_tok", "doc_id"], [False, True])
    )

    def pack(pdf):
        pdf = pdf.sort_values(by, ascending=asc, kind="mergesort").reset_index(
            drop=True
        )
        seqs = []
        if order == "ffd":
            # first-fit-decreasing: loads[i] = tokens in open pack i;
            # place each doc in the FIRST pack with room, else open a
            # new one. O(docs x packs) per fold — fine at shard grain
            # (a shard's pack count, not the corpus's)
            loads: list[int] = []
            for n in pdf["n_tok"]:
                n = int(n)
                for i, ld in enumerate(loads):
                    if ld + n <= budget:
                        loads[i] = ld + n
                        seqs.append(i)
                        break
                else:
                    loads.append(n)
                    seqs.append(len(loads) - 1)
        else:
            seq, cum = 0, 0
            for i, n in enumerate(pdf["n_tok"]):
                n = int(n)
                if i == 0:
                    cum = n
                elif cum + n > budget:
                    seq += 1
                    cum = n
                else:
                    cum += n
                seqs.append(seq)
        pdf["pack_seq"] = seqs
        return pdf[[*gcols, "doc_id", "shard", "pack_seq", "n_tok"]]

    schema = ", ".join(
        [*(f"{c} {gtypes[c]}" for c in gcols),
         "doc_id bigint", "shard int", "pack_seq bigint", "n_tok bigint"]
    )
    return base.groupBy("shard", *gcols).applyInPandas(pack, schema)
