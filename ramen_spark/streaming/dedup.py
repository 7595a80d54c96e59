"""Always-on incremental near-dup detection.

The reference runs every operator as a long-lived worker
(``/root/reference/src/RamenSupervisor.ml`` — programs are supervised
processes consuming unbounded streams); this lane gives the
MinHash/LSH dedup family the same always-on mode on Structured
Streaming: documents arrive in micro-batches, a PERSISTED banded
index accretes one append per batch, and every batch emits its
near-dup pairs against everything that arrived before it (plus any
seeded retained corpus).

Exactness: per batch we append the batch's bands/signatures to the
index FIRST, then probe the batch against the full index, keeping a
candidate unless its partner sits in the same batch with the larger
id (same-batch pairs emit once, pairs against anything indexed
earlier always emit — ids carry no arrival-order guarantee). Over any
batch split of a corpus the union of emissions equals the BATCH
operator ``minhash_lsh_pairs`` on the whole corpus as an unordered
pair set, hash for hash; seeded with a retained corpus, it equals
``minhash_lsh_pairs_between(stream, seed)`` plus the stream's own
self-pairs. The parity test (tests/test_streaming_dedup.py) checks
both set equalities.

100 TB shape: the index carries (bucket, doc_id) postings and
(doc_id, sig) signatures — never text. Each probe is a band-bucket
equi-join of the SMALL batch against the index; on a real deployment
the index lives bucket-partitioned (or as a bucketed table,
sources/bucketed.py) so the probe prunes to the buckets the batch
touches instead of re-scanning the index — the append-only layout
here keeps files immutable, so partition pruning composes with it.
Signature re-attach joins are id-keyed; the batch side is broadcast-
sized by construction (one micro-batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ramen_spark.operators.dedup import minhash_signatures
from ramen_spark.functions import text as Tx


def _banded(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    return sigs.select(
        F.col(id_col),
        F.explode(Tx.lsh_bands(F.col("sig"), bands, rows_per_band)).alias(
            "bucket"
        ),
    )


class IncrementalDedupIndex:
    """The persisted banded index: ``<dir>/bands`` (bucket, doc_id)
    and ``<dir>/sigs`` (doc_id, sig) as append-only parquet. Seed it
    with a retained corpus via :meth:`append`, then let the streaming
    lane append each micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        shingle_k: int = 3,
        num_hashes: int = 16,
        bands: int = 8,
    ) -> None:
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        self.spark = spark
        self.index_dir = index_dir
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self._bands_dir = os.path.join(index_dir, "bands")
        self._sigs_dir = os.path.join(index_dir, "sigs")

    def _signatures(self, docs: DataFrame) -> DataFrame:
        return minhash_signatures(
            docs,
            self.text_col,
            self.id_col,
            self.shingle_k,
            self.num_hashes,
        )

    def append(self, docs: DataFrame) -> DataFrame:
        """Index ``docs`` (seed corpus or one micro-batch): append
        their bands and signatures. Returns the batch's signature
        relation (materialized) so the caller can reuse it for the
        probe without recomputing shingles."""
        # materialize ONCE: the signatures feed the bands write, the
        # sigs write, and the caller's probe — without the checkpoint
        # the shingle+minhash computation would run three times
        sigs = self._signatures(docs).localCheckpoint(eager=True)
        _banded(sigs, self.id_col, self.bands, self.rows_per_band).write.mode(
            "append"
        ).parquet(self._bands_dir)
        sigs.write.mode("append").parquet(self._sigs_dir)
        return sigs

    def probe(self, batch_sigs: DataFrame, min_sig_agreement: float) -> DataFrame:
        """Near-dup pairs of the batch against the WHOLE index (which
        already includes the batch). Single-emission rule: a candidate
        is kept unless its partner is in the SAME batch with
        ``id_old >= id_new`` — same-batch unordered pairs emit exactly
        once (and self-pairs never), while pairs against earlier
        arrivals always emit, regardless of id order (doc ids carry no
        arrival-order guarantee — a seeded retained corpus can hold
        ids above the stream's)."""
        idx_bands = self.spark.read.parquet(self._bands_dir)
        idx_sigs = self.spark.read.parquet(self._sigs_dir)
        batch_bands = _banded(
            batch_sigs, self.id_col, self.bands, self.rows_per_band
        ).select(F.col(self.id_col).alias("id_new"), "bucket")
        in_batch = batch_sigs.select(
            F.col(self.id_col).alias("id_old"), F.lit(True).alias("_in_batch")
        )
        cand = (
            batch_bands.join(
                idx_bands.select(
                    F.col(self.id_col).alias("id_old"), "bucket"
                ),
                "bucket",
            )
            .select("id_new", "id_old")
            .dropDuplicates(["id_new", "id_old"])
            .join(in_batch, "id_old", "left")
            .filter(
                ~(
                    F.coalesce(F.col("_in_batch"), F.lit(False))
                    & (F.col("id_old") >= F.col("id_new"))
                )
            )
            .select("id_new", "id_old")
        )
        pairs = cand.join(
            batch_sigs.select(
                F.col(self.id_col).alias("id_new"),
                F.col("sig").alias("sig_new"),
            ),
            "id_new",
        ).join(
            idx_sigs.select(
                F.col(self.id_col).alias("id_old"),
                F.col("sig").alias("sig_old"),
            ),
            "id_old",
        )
        agree = F.size(
            F.filter(
                F.zip_with(
                    F.col("sig_new"),
                    F.col("sig_old"),
                    lambda x, y: (x == y).cast("int"),
                ),
                lambda v: v == 1,
            )
        )
        return (
            pairs.withColumn(
                "est_jaccard",
                agree.cast("double") / F.lit(float(self.num_hashes)),
            )
            .filter(F.col("est_jaccard") >= min_sig_agreement)
            .select("id_new", "id_old", "est_jaccard")
        )


def exact_dedup_stream(
    doc_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Always-on EXACT dedup: first-arrival doc per content
    fingerprint, as a native stateful streaming operator —
    ``dropDuplicates`` on the 32-byte md5 fingerprint, backed by the
    session's RocksDB state store (off-heap, so fingerprint state
    survives high cardinality; the batch twin is
    ``operators.dedup.exact_dedup``).

    Semantics delta vs batch, stated: batch keeps the LOWEST id per
    fingerprint; a stream cannot know a lower id arrives later, so
    this keeps the FIRST ARRIVAL — identical keep-sets whenever
    arrival order follows id order (the parity test's setup), the
    honest streaming semantics otherwise. State grows with distinct
    fingerprints — for bounded retention swap in
    ``dropDuplicatesWithinWatermark`` once an event-time column and
    dedup horizon exist; global exact dedup inherently remembers
    everything it has kept."""
    return doc_stream.select(
        F.col(id_col), Tx.fingerprint(F.col(text_col)).alias("fp")
    ).dropDuplicates(["fp"])


def decontaminate_stream(
    doc_stream: DataFrame,
    eval_df: DataFrame,
    pairs_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    min_overlap: int = 1,
):
    """Always-on train/eval decontamination: each micro-batch of
    training documents is flagged against the eval corpus and the
    per-doc report appended to ``pairs_dir``. The eval side's distinct
    shingle set is computed and materialized ONCE at query start (it
    is static), so per-batch cost is the batch's own shingling plus
    the broadcast-able shingle join — not a re-shingle of the eval
    corpus per trigger. Returns the started StreamingQuery.

    Per-doc rows are independent, so the emission over any batch split
    equals the batch operator row-for-row (parity test)."""
    from ramen_spark.operators.dedup import decontaminate

    # precompute once; localCheckpoint pins it on the executors for
    # every micro-batch's join
    toks = eval_df.select(
        F.split(Tx.normalized_text(F.col(text_col)), " ").alias("_toks")
    )
    eval_shingles = (
        toks.select(
            F.explode(
                Tx.word_shingles_of_tokens(F.col("_toks"), shingle_k)
            ).alias("_s")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        decontaminate(
            batch_df,
            eval_df=None,
            text_col=text_col,
            id_col=id_col,
            shingle_k=shingle_k,
            min_overlap=min_overlap,
            eval_shingles=eval_shingles,
        ).write.mode("append").parquet(pairs_dir)

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def incremental_dedup_stream(
    doc_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    min_sig_agreement: float = 0.5,
):
    """Run the incremental dedup always-on: each micro-batch of
    ``doc_stream`` is indexed, probed, and its near-dup pairs appended
    to ``pairs_dir``. Returns the started StreamingQuery.

    foreachBatch rather than a stateful operator on purpose: the
    banded index must outlive the query (it IS the product — the
    snapshot index the batch operators join against), must be readable
    by concurrent batch jobs, and grows unbounded — none of which fits
    the state store. The checkpoint makes batch replays idempotent
    only if the sink dedupes; parquet append does not, so a crashed
    batch can re-emit its pairs on restart — downstream consumers of
    ``pairs_dir`` should read with dropDuplicates([id_new, id_old])
    (exactly-once needs a transactional table format underneath)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        index = IncrementalDedupIndex(
            spark,
            index_dir,
            text_col=text_col,
            id_col=id_col,
            shingle_k=shingle_k,
            num_hashes=num_hashes,
            bands=bands,
        )
        sigs = index.append(batch_df)  # materialized inside append
        index.probe(sigs, min_sig_agreement).write.mode("append").parquet(
            pairs_dir
        )

    return (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


class IncrementalVectorIndex:
    """The embedding twin of :class:`IncrementalDedupIndex`: a
    persisted hyperplane-bucket index — ``<dir>/buckets``
    (bucket, vec_id) and ``<dir>/vecs`` (vec_id, _v, _n) as
    append-only parquet. The planes are seeded at construction and
    must stay FIXED for the index lifetime (a re-seeded probe would
    bucket the same vector differently); occupancy therefore can't
    adapt to corpus growth the way batch pairwise_near_dups does —
    pick ``n_planes`` for the corpus you expect, or re-index.

    100 TB shape: identical to the text lane — the index carries ids,
    buckets, and (dim+1) doubles per vector, never anything bigger;
    each probe is a bucket equi-join of the SMALL batch against the
    index, partition-prunable when the index is stored bucketed."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        dim: int = 64,
        n_planes: int = 6,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        from ramen_spark.operators.similarity import make_hyperplanes

        self.spark = spark
        self.index_dir = index_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.planes = make_hyperplanes(dim, n_planes, seed)
        self._buckets_dir = os.path.join(index_dir, "buckets")
        self._vecs_dir = os.path.join(index_dir, "vecs")

    def _prepared(self, vecs: DataFrame) -> DataFrame:
        from ramen_spark.functions import vectors as V
        from ramen_spark.operators.similarity import _as_double

        return vecs.select(
            F.col(self.id_col),
            _as_double(self.vec_col).alias("_v"),
            V.lsh_bucket(F.col(self.vec_col), self.planes).alias("bucket"),
        ).withColumn("_n", V.norm2(F.col("_v")))

    def append(self, vecs: DataFrame) -> DataFrame:
        """Index ``vecs`` (seed corpus or one micro-batch); returns
        the prepared batch relation (materialized once — it feeds
        both index writes and the caller's probe)."""
        prepared = self._prepared(vecs).localCheckpoint(eager=True)
        prepared.select("bucket", self.id_col).write.mode("append").parquet(
            self._buckets_dir
        )
        prepared.select(self.id_col, "_v", "_n").write.mode("append").parquet(
            self._vecs_dir
        )
        return prepared

    def probe(self, batch: DataFrame, threshold: float) -> DataFrame:
        """Exact-cosine near-dup pairs of the batch against the whole
        index (which already includes the batch), same single-emission
        rule as the text lane: same-batch partners emit only from the
        smaller id's perspective; earlier arrivals always emit."""
        from ramen_spark.operators.similarity import _sim_prenorm

        idx_b = self.spark.read.parquet(self._buckets_dir)
        idx_v = self.spark.read.parquet(self._vecs_dir)
        in_batch = batch.select(
            F.col(self.id_col).alias("id_old"), F.lit(True).alias("_in_batch")
        )
        cand = (
            batch.select(F.col(self.id_col).alias("id_new"), "bucket")
            .join(
                idx_b.select(F.col(self.id_col).alias("id_old"), "bucket"),
                "bucket",
            )
            .select("id_new", "id_old")
            .dropDuplicates(["id_new", "id_old"])
            .join(in_batch, "id_old", "left")
            .filter(
                ~(
                    F.coalesce(F.col("_in_batch"), F.lit(False))
                    & (F.col("id_old") >= F.col("id_new"))
                )
            )
            .select("id_new", "id_old")
        )
        pairs = cand.join(
            batch.select(
                F.col(self.id_col).alias("id_new"),
                F.col("_v").alias("_nv"),
                F.col("_n").alias("_nn"),
            ),
            "id_new",
        ).join(
            idx_v.select(
                F.col(self.id_col).alias("id_old"),
                F.col("_v").alias("_ov"),
                F.col("_n").alias("_on"),
            ),
            "id_old",
        )
        return (
            pairs.withColumn(
                "sim", F.round(_sim_prenorm("_nv", "_ov", "_nn", "_on"), 6)
            )
            .filter(F.col("sim") >= threshold)
            .select("id_new", "id_old", "sim")
        )


class IncrementalSemanticIndex:
    """The SemDeDup twin of :class:`IncrementalVectorIndex` (round-7
    verdict #9): a persisted (cell, bucket) index keyed exactly like
    ``semantic_dedup``'s scale path — coarse-quantizer cell from FIXED
    centroids plus the hyperplane LSH bucket — so the always-on lane
    makes the same candidate restriction as the batch operator and
    inherits its parity. Centroids and planes are pinned at
    construction (the ``IncrementalVectorIndex`` rule: a re-seeded or
    re-fit probe would assign the same vector differently; re-index to
    change them — at 100 TB the quantizer is versioned corpus
    metadata, not per-batch state).

    ``<dir>/buckets`` holds (cell, bucket, vec_id); ``<dir>/vecs``
    holds (vec_id, cell, centsim, _v, _n). Each probe is a
    (cell, bucket) equi-join of the SMALL batch against the index —
    partition-prunable when the index is stored bucketed by cell."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        centroids: list[list[float]],
        dim: int = 64,
        n_planes: int = 6,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        from ramen_spark.operators.similarity import make_hyperplanes

        self.spark = spark
        self.index_dir = index_dir
        self.centroids = centroids
        self.planes = make_hyperplanes(dim, n_planes, seed)
        self.id_col = id_col
        self.vec_col = vec_col
        self._buckets_dir = os.path.join(index_dir, "buckets")
        self._vecs_dir = os.path.join(index_dir, "vecs")

    def _prepared(self, vecs: DataFrame) -> DataFrame:
        from ramen_spark.functions import vectors as V
        from ramen_spark.operators.similarity import (
            _as_double,
            _centroid_literal,
            _nearest_cell,
        )

        cents = _centroid_literal(self.centroids)
        return (
            vecs.select(
                F.col(self.id_col),
                _as_double(self.vec_col).alias("_v"),
                _nearest_cell(_as_double(self.vec_col), self.centroids).alias(
                    "cell"
                ),
                V.norm2(F.col(self.vec_col)).alias("_n"),
                V.lsh_bucket(F.col(self.vec_col), self.planes).alias(
                    "bucket"
                ),
            )
            .withColumn(
                "centsim",
                F.round(
                    V.dot(F.element_at(cents, F.col("cell") + 1), F.col("_v"))
                    / F.col("_n"),
                    6,
                ),
            )
        )

    def append(self, vecs: DataFrame) -> DataFrame:
        prepared = self._prepared(vecs).localCheckpoint(eager=True)
        prepared.select("cell", "bucket", self.id_col).write.mode(
            "append"
        ).parquet(self._buckets_dir)
        prepared.select(
            self.id_col, "cell", "centsim", "_v", "_n"
        ).write.mode("append").parquet(self._vecs_dir)
        return prepared

    def probe(self, batch: DataFrame, tau: float) -> DataFrame:
        """Same-(cell, bucket) cosine ≥ tau pairs of the batch against
        the whole index (which already includes the batch), with the
        single-emission rule of the other lanes. Emits BOTH centroid
        similarities so the SemDeDup keep rule can be evaluated over
        the cumulative pair set (``semantic_keep_from_pairs``)."""
        from ramen_spark.operators.similarity import _sim_prenorm

        idx_b = self.spark.read.parquet(self._buckets_dir)
        idx_v = self.spark.read.parquet(self._vecs_dir)
        in_batch = batch.select(
            F.col(self.id_col).alias("id_old"), F.lit(True).alias("_in_batch")
        )
        cand = (
            batch.select(F.col(self.id_col).alias("id_new"), "cell", "bucket")
            .join(
                idx_b.select(
                    F.col(self.id_col).alias("id_old"), "cell", "bucket"
                ),
                ["cell", "bucket"],
            )
            .select("id_new", "id_old", "cell")
            .dropDuplicates(["id_new", "id_old"])
            .join(in_batch, "id_old", "left")
            .filter(
                ~(
                    F.coalesce(F.col("_in_batch"), F.lit(False))
                    & (F.col("id_old") >= F.col("id_new"))
                )
            )
            .select("id_new", "id_old", "cell")
        )
        pairs = cand.join(
            batch.select(
                F.col(self.id_col).alias("id_new"),
                F.col("centsim").alias("cs_new"),
                F.col("_v").alias("_nv"),
                F.col("_n").alias("_nn"),
            ),
            "id_new",
        ).join(
            idx_v.select(
                F.col(self.id_col).alias("id_old"),
                F.col("centsim").alias("cs_old"),
                F.col("_v").alias("_ov"),
                F.col("_n").alias("_on"),
            ),
            "id_old",
        )
        return (
            pairs.withColumn(
                "sim", F.round(_sim_prenorm("_nv", "_ov", "_nn", "_on"), 6)
            )
            .filter(F.col("sim") >= tau)
            .select("id_new", "id_old", "cell", "sim", "cs_new", "cs_old")
        )


def semantic_keep_from_pairs(
    index_vecs: DataFrame, pairs: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Evaluate SemDeDup's keep-the-outlier rule over the CUMULATIVE
    streamed pair set: a vector loses iff some tau-partner has
    (centsim asc, id asc) priority over it — exactly
    ``semantic_dedup``'s one-shot greedy prune, so on the same
    centroids/planes/tau the result matches the batch operator row
    for row (the parity test's contract). ``index_vecs`` is the
    lane's ``<dir>/vecs`` relation; only ids and two rounded doubles
    ride the shuffle."""
    both = pairs.select(
        F.col("id_new").alias("_id"),
        F.col("cs_new").alias("_cs"),
        F.col("id_old").alias("_pid"),
        F.col("cs_old").alias("_pcs"),
    ).unionByName(
        pairs.select(
            F.col("id_old").alias("_id"),
            F.col("cs_old").alias("_cs"),
            F.col("id_new").alias("_pid"),
            F.col("cs_new").alias("_pcs"),
        )
    )
    losers = (
        both.filter(
            (F.col("_pcs") < F.col("_cs"))
            | ((F.col("_pcs") == F.col("_cs")) & (F.col("_pid") < F.col("_id")))
        )
        .select(F.col("_id").alias(id_col))
        .distinct()
        .withColumn("_lost", F.lit(True))
    )
    return index_vecs.select(id_col, "cell", "centsim").join(
        losers, id_col, "left"
    ).select(
        id_col,
        "cell",
        "centsim",
        F.coalesce(~F.col("_lost"), F.lit(True)).alias("keep"),
    )


def incremental_semantic_dedup_stream(
    vec_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    tau: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Always-on SemDeDup: each micro-batch of embeddings is assigned
    to its (fixed-quantizer) cell, indexed, probed against everything
    that arrived before it, and its tau-pairs appended to
    ``pairs_dir``; ``semantic_keep_from_pairs`` over the accumulated
    pairs + index reproduces the batch ``semantic_dedup`` keep set on
    the same centroids/planes (pinned by
    test_streaming_semantic_dedup_equals_batch). Same foreachBatch /
    idempotence caveats as the other lanes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index = IncrementalSemanticIndex(
            batch_df.sparkSession,
            index_dir,
            centroids,
            dim=dim,
            n_planes=n_planes,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
        prepared = index.append(batch_df)
        index.probe(prepared, tau).write.mode("append").parquet(pairs_dir)

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def incremental_vector_dedup_stream(
    vec_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    dim: int = 64,
    n_planes: int = 6,
    seed: int = 42,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Always-on embedding near-dup detection: each micro-batch of
    vectors is indexed, probed against everything that arrived before
    it, and its pairs appended to ``pairs_dir``. Union of emissions
    over any batch split == batch ``pairwise_near_dups`` with the same
    planes, value for value (the parity test's contract). Same
    foreachBatch/idempotence caveats as incremental_dedup_stream."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        index = IncrementalVectorIndex(
            batch_df.sparkSession,
            index_dir,
            dim=dim,
            n_planes=n_planes,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
        prepared = index.append(batch_df)
        index.probe(prepared, threshold).write.mode("append").parquet(
            pairs_dir
        )

    return (
        vec_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
