"""Sequence packing — the batch-assembly stage of an LLM training
pipeline.

Not in the reference's surface (training-pipeline extension, like
operators.dedup): documents are greedily packed into fixed
token-budget training rows. Packing is inherently a sequential
recurrence (each doc's pack depends on the running total), so the
100 TB shape is SHARD-parallel greedy packing: documents hash into
``shards`` independent streams, each shard packs its own docs in
doc-id order with one Arrow-batched fold — no global order, no
driver loop, and the pack quality loss vs a global bin-packer is
bounded (first-fit within a shard wastes < 1 doc per pack boundary).
Deterministic by construction: (shard, doc order) fixes every pack id,
so re-runs and the DuckDB oracle reproduce it exactly.
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
) -> DataFrame:
    """→ (doc_id, shard, pack_seq, n_tok): greedy first-fit packing of
    whitespace-token counts into ``budget``-token packs, independent
    per hash shard. A doc longer than the budget gets its own pack
    (standard oversize handling). One shuffle (by shard), one
    Arrow-batched sequential fold per shard."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
        Tx.token_count(F.col(text_col)).cast("long").alias("n_tok"),
    )

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs = []
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
        return pdf[["doc_id", "shard", "pack_seq", "n_tok"]]

    return base.groupBy("shard").applyInPandas(
        pack, "doc_id bigint, shard int, pack_seq bigint, n_tok bigint"
    )
