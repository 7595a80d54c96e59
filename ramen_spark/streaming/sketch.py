"""Always-on sketch maintenance — the streaming twins of
operators/sketch.py, on the same contract as the incremental dedup
lanes (streaming/dedup.py): a persisted, batch-readable artifact that
each micro-batch folds into, with N-batch ≡ batch parity pinned by
test.

Both sketches are BOUNDED state (KMV: ≤ k rows per key; CMS: ≤
depth × width cells), so unlike the dedup indexes — which grow with
the corpus and must live in parquet partitions — the whole state
comfortably round-trips through the driver per micro-batch
(collect + atomic overwrite). That makes the merge trivially
transactional: the new state parquet replaces the old one only after
the merged snapshot is fully computed.

Replay semantics differ per sketch and are enforced here:
- KMV is IDEMPOTENT under batch replay (min-k of a multiset ignores
  duplicates) — a crashed-and-replayed micro-batch cannot corrupt it.
- CMS is NOT (cell-wise sums double-count a replayed batch), so the
  CMS state carries the last applied ``batch_id`` and ``update``
  skips batches it has already folded in — exactly-once as long as
  foreachBatch replays keep their batch ids (Spark's contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ramen_spark.operators.sketch import (
    count_min_build,
    kmv_finalize,
    kmv_prune,
)


def _dir_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the Hadoop FileSystem API, not os.path — the
    state dir of an always-on lane lives wherever the cluster's
    storage is (s3://, hdfs://, …); a local-only check would return
    False there and silently RESET the accumulated sketch every
    micro-batch."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


class IncrementalKmvSketch:
    """Persisted KMV distinct sketch: ``state_dir`` holds the pruned
    (keys…, _h) rows — ≤ k per key. ``update`` merges a micro-batch
    (min-k is associative + commutative + idempotent, so any batch
    split and any replay yields the state of the concatenated input);
    ``estimate`` finalizes to (keys…, n_kept, kth_min, est_distinct),
    identical to batch ``kmv_distinct`` over everything seen."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        k: int = 64,
    ) -> None:
        if k < 2:
            raise ValueError("IncrementalKmvSketch needs k >= 2")
        self.spark = spark
        self.state_dir = state_dir
        self.keys = list(keys)
        self.value_col = value_col
        self.k = k

    def _state(self) -> DataFrame | None:
        if not _dir_exists(self.spark, self.state_dir):
            return None
        return self.spark.read.parquet(self.state_dir)

    def update(self, batch_df: DataFrame) -> None:
        pruned = kmv_prune(batch_df, self.keys, self.value_col, self.k)
        state = self._state()
        merged = pruned if state is None else state.unionByName(pruned)
        # re-prune the union to ≤ k per key, then swap the state
        # atomically: the merged snapshot is materialized (bounded:
        # k rows per key) BEFORE the old parquet is replaced
        top = (
            merged.groupBy(*self.keys)
            .agg(
                F.slice(
                    F.array_sort(F.collect_set("_h")), 1, self.k
                ).alias("_mins")
            )
            .select(*self.keys, F.explode("_mins").alias("_h"))
        )
        rows = top.collect()
        self.spark.createDataFrame(rows, top.schema).write.mode(
            "overwrite"
        ).parquet(self.state_dir)

    def estimate(self) -> DataFrame:
        state = self._state()
        if state is None:
            raise ValueError(f"no sketch state at {self.state_dir}")
        return kmv_finalize(state, self.keys, self.k)


class IncrementalCmsSketch:
    """Persisted count-min sketch: ``state_dir`` holds (row, col, cnt,
    _b) cells, ``_b`` = the last batch id folded in. ``update``
    cell-wise-sums a micro-batch's sketch; replayed batch ids are
    skipped (sums are not idempotent). Bounded state: ≤ depth × width
    cells regardless of stream volume."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        value_col: str,
        depth: int = 4,
        width: int = 2048,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.value_col = value_col
        self.depth = depth
        self.width = width

    def _state(self) -> DataFrame | None:
        if not _dir_exists(self.spark, self.state_dir):
            return None
        return self.spark.read.parquet(self.state_dir)

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        state = self._state()
        if state is not None:
            last = state.agg(F.max("_b")).collect()[0][0]
            if last is not None and batch_id <= last:
                return  # replayed micro-batch: already folded in
        batch_cells = count_min_build(
            batch_df, self.value_col, self.depth, self.width
        )
        if state is None:
            merged = batch_cells
        else:
            merged = (
                state.select("row", "col", "cnt")
                .unionByName(batch_cells)
                .groupBy("row", "col")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        out = merged.withColumn("_b", F.lit(batch_id).cast("long"))
        rows = out.collect()
        self.spark.createDataFrame(rows, out.schema).write.mode(
            "overwrite"
        ).parquet(self.state_dir)

    def cells(self) -> DataFrame:
        state = self._state()
        if state is None:
            raise ValueError(f"no sketch state at {self.state_dir}")
        return state.select("row", "col", "cnt")


def kmv_sketch_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    k: int = 64,
):
    """Maintain a KMV distinct sketch always-on: every micro-batch is
    pruned and merged into ``state_dir``; any batch job (or
    ``IncrementalKmvSketch.estimate``) can read the live cardinality
    off it. Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalKmvSketch(
            batch_df.sparkSession, state_dir, keys, value_col, k
        ).update(batch_df)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def cms_sketch_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
):
    """Maintain a count-min sketch always-on (the streaming frequency
    monitor: which tokens/URLs/users are suddenly hot). Batch-id
    guarded — replays fold in exactly once."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalCmsSketch(
            batch_df.sparkSession, state_dir, value_col, depth, width
        ).update(batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
