"""Always-on sketch maintenance — the streaming twins of
operators/sketch.py, on the same contract as the incremental dedup
lanes (streaming/dedup.py): a persisted, batch-readable artifact that
each micro-batch folds into, with N-batch ≡ batch parity pinned by
test.

State persistence (round-10 protocol — ``_SnapshotStore``):
every lane's state lives as VERSIONED parquet snapshots
``<root>/v1, v2, …`` with "highest version bearing Spark's _SUCCESS
marker wins". A commit writes v(n+1) executor-side while v(n) is
still being read (different directories — no overwrite-while-read
hazard, no collect anywhere, exactly ONE job per commit), then
best-effort-GCs older versions. There are NO renames and NO
delete-then-rename swaps, so the protocol is crash-safe on object
stores too (S3A rename is per-file copy+delete — any swap-based
protocol has a corruption window there; a version directory either
has its _SUCCESS marker or is ignored). Crash matrix: die mid-write
→ v(n+1) has no _SUCCESS, v(n) stands, foreachBatch replays the
batch; die after write, before GC → v(n+1) complete and adopted,
the replayed batch is a no-op (min-k idempotence) or batch-id-
skipped (CMS); die mid-GC → orphan old versions, removed at the
next commit. The pre-round-10 flat layout (parquet directly under
<root>) is read as the initial snapshot and cleaned after the first
new commit.

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
    quantile_finalize,
    quantile_prune,
)


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for `path` — not os.path: the state dir of an
    always-on lane lives wherever the cluster's storage is (s3://,
    hdfs://, …); a local-only check would return False there and
    silently RESET the accumulated sketch every micro-batch."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _dir_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs(spark, path)
    return bool(fs.exists(hpath))


class _SnapshotStore:
    """Versioned-snapshot persistence shared by every always-on
    sketch lane (see module docstring for the crash matrix): commit =
    one executor-side parquet write of ``<root>/v{n+1}`` + best-effort
    GC; read = highest _SUCCESS-bearing version (legacy flat parquet
    under ``<root>`` reads as the initial snapshot)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root.rstrip("/")

    def _versions(self) -> list[int]:
        fs, rp = _fs(self.spark, self.root)
        if not fs.exists(rp):
            return []
        out = []
        for st in fs.listStatus(rp):
            nm = st.getPath().getName()
            if st.isDirectory() and nm.startswith("v") and nm[1:].isdigit():
                out.append(int(nm[1:]))
        return sorted(out)

    def _complete(self, n: int) -> bool:
        return _dir_exists(self.spark, f"{self.root}/v{n}/_SUCCESS")

    def current_version(self) -> int | None:
        for n in reversed(self._versions()):
            if self._complete(n):
                return n
        return None

    def read(self) -> DataFrame | None:
        n = self.current_version()
        if n is not None:
            return self.spark.read.parquet(f"{self.root}/v{n}")
        if _dir_exists(self.spark, self.root + "/_SUCCESS"):
            # legacy flat layout — the initial snapshot
            return self.spark.read.parquet(self.root)
        return None

    def commit(self, df: DataFrame) -> str:
        cur = self.current_version()
        nxt = (cur + 1) if cur is not None else 1
        # the write plan may read v{cur} (or the legacy flat files);
        # the target is a DIFFERENT directory, so the source is never
        # touched before the job completes
        df.write.mode("overwrite").parquet(f"{self.root}/v{nxt}")
        self._gc(keep=nxt)
        return f"v{nxt}"

    def _gc(self, keep: int) -> None:
        try:
            fs, rp = _fs(self.spark, self.root)
            jvm = self.spark._jvm
            for n in self._versions():
                if n != keep:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(f"{self.root}/v{n}"),
                        True,
                    )
            # legacy flat files (pre-versioned layout) under the root
            for st in fs.listStatus(rp):
                if not st.isDirectory():
                    fs.delete(st.getPath(), False)
        except Exception:  # pragma: no cover — GC is best-effort
            pass


def _merged_kmv_k() -> F.Column:
    """Merged build-k of a state ∪ batch union. A NULL ``_kmv_k``
    marks pre-round-11 'unchecked legacy' rows whose build k is
    UNKNOWN; ``F.min`` alone would skip the NULLs and stamp the merged
    sketch as checked at the batch k even though the legacy portion
    may have been built with a smaller k (round-11 advice). Any NULL
    in the group ⇒ the merged ``_kmv_k`` stays NULL — the sketch
    remains in documented pass-unchecked mode until a fresh rebuild."""
    return F.when(
        F.count(F.lit(1)) == F.count("_kmv_k"), F.min("_kmv_k")
    ).alias("_kmv_k")


class _IncrementalMinKBase:
    """Shared fold machinery for min-k-shaped persisted sketches
    (KMV distinct, bottom-k quantile sample): a micro-batch is pruned,
    unioned with the persisted state, re-pruned to the bound, and
    committed as the next snapshot. Min-k over a multiset/set is
    associative, commutative, and IDEMPOTENT — any batch split and
    any replay yields the state of the concatenated input.

    Persistence is the versioned _SnapshotStore: one executor-side
    write per commit, NO collect at any state size (state is ≤ k rows
    per key but the number of KEYS is unbounded — a per-URL-host
    sketch at 10M hosts × k=64 must never visit the driver).
    ``driver_state_max_rows`` is accepted for API compatibility and
    ignored: the old small-state driver round-trip had a crash window
    (overwrite deletes the only copy before rewriting it) that the
    snapshot protocol closes for every size at the same cost.

    Subclasses provide ``_prune_batch`` (micro-batch → sketch rows)
    and ``_reprune`` (merged sketch rows → re-bounded sketch rows)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        driver_state_max_rows: int = 100_000,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.store = _SnapshotStore(spark, state_dir)
        # instrumentation: always 'distributed' under the snapshot
        # protocol (kept because operators/tests read it)
        self.last_commit_path: str | None = None

    def _prune_batch(self, batch_df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _reprune(self, merged: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _state(self) -> DataFrame | None:
        return self.store.read()

    def _check_state_compat(self, state: DataFrame) -> None:
        """Hook: subclasses veto resuming from an incompatible
        persisted state (loudly, before any union)."""

    def update(self, batch_df: DataFrame) -> None:
        pruned = self._prune_batch(batch_df)
        state = self._state()
        if state is not None:
            self._check_state_compat(state)
        # allowMissingColumns: a pre-round-11 persisted state has no
        # _kmv_k metadata column — it unions as NULL (the k guard
        # treats NULL as unchecked-legacy) instead of failing resume
        merged = (
            pruned
            if state is None
            else state.unionByName(pruned, allowMissingColumns=True)
        )
        self.store.commit(self._reprune(merged))
        self.last_commit_path = "distributed"


class IncrementalKmvSketch(_IncrementalMinKBase):
    """Persisted KMV distinct sketch: ``state_dir`` holds the pruned
    (keys…, _h) rows — ≤ k per key. ``estimate`` finalizes to
    (keys…, n_kept, kth_min, est_distinct), identical to batch
    ``kmv_distinct`` over everything seen. Commit regimes: see
    :class:`_IncrementalMinKBase`."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        k: int = 64,
        driver_state_max_rows: int = 100_000,
    ) -> None:
        if k < 2:
            raise ValueError("IncrementalKmvSketch needs k >= 2")
        super().__init__(spark, state_dir, driver_state_max_rows)
        self.keys = list(keys)
        self.value_col = value_col
        self.k = k

    def _prune_batch(self, batch_df: DataFrame) -> DataFrame:
        return kmv_prune(batch_df, self.keys, self.value_col, self.k)

    def _reprune(self, merged: DataFrame) -> DataFrame:
        # min(_kmv_k) survives the re-prune: a union of heterogeneous-k
        # sketches is only valid at the SMALLEST k, and the batch
        # finalizers' k-fidelity guard reads this column
        has_k = "_kmv_k" in merged.columns
        aggs = [
            F.slice(F.array_sort(F.collect_set("_h")), 1, self.k)
            .alias("_mins")
        ]
        if has_k:
            aggs.append(_merged_kmv_k())
        return (
            merged.groupBy(*self.keys)
            .agg(*aggs)
            .select(
                *self.keys,
                F.explode("_mins").alias("_h"),
                *(["_kmv_k"] if has_k else []),
            )
        )

    def estimate(self) -> DataFrame:
        state = self._state()
        if state is None:
            raise ValueError(f"no sketch state at {self.state_dir}")
        return kmv_finalize(state, self.keys, self.k)

    def overlap_with(self, other: "DataFrame | IncrementalKmvSketch") -> DataFrame:
        """Live set-overlap report (|A|, |B|, union, intersection,
        Jaccard per key) between THIS sketch's accumulated state and
        ``other`` — another incremental sketch (same keys and k) or
        any kmv_prune-shaped relation (e.g. a static eval corpus's
        persisted sketch). The always-on contamination-rate monitor:
        a dashboard reads the live crawl-vs-benchmark overlap off two
        few-KB sketch states while both lanes keep folding."""
        from ramen_spark.operators.sketch import kmv_overlap_pruned

        state = self._state()
        if state is None:
            raise ValueError(f"no sketch state at {self.state_dir}")
        if isinstance(other, IncrementalKmvSketch):
            if other.keys != self.keys or other.k != self.k:
                raise ValueError(
                    "overlap_with needs matching keys and k: "
                    f"{self.keys}/k={self.k} vs {other.keys}/k={other.k}"
                )
            ostate = other._state()
            if ostate is None:
                raise ValueError(f"no sketch state at {other.state_dir}")
            other = ostate
        return kmv_overlap_pruned(state, other, self.keys, self.k)


class IncrementalQuantileSketch(_IncrementalMinKBase):
    """Persisted bottom-k quantile sample: ``state_dir`` holds the
    pruned (keys…, _h, _v) pairs — ≤ k per key, the k smallest row-id
    hashes seen so far with their values. Replay-idempotent like KMV
    (multiset min-k over (_h, _v) pairs ignores re-folded batches
    because a row's (hash, value) pair is identical on replay).
    ``estimate(ps)`` equals batch ``quantile_sketch`` over everything
    seen. Commit regimes: see :class:`_IncrementalMinKBase`."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        id_col: str,
        k: int = 1024,
        driver_state_max_rows: int = 100_000,
    ) -> None:
        if k < 2:
            raise ValueError("IncrementalQuantileSketch needs k >= 2")
        super().__init__(spark, state_dir, driver_state_max_rows)
        self.keys = list(keys)
        self.value_col = value_col
        self.id_col = id_col
        self.k = k

    def _prune_batch(self, batch_df: DataFrame) -> DataFrame:
        return quantile_prune(
            batch_df, self.keys, self.value_col, self.id_col, self.k
        )

    def _reprune(self, merged: DataFrame) -> DataFrame:
        pair = F.struct(F.col("_h").alias("_h"), F.col("_v").alias("_v"))
        has_k = "_kmv_k" in merged.columns
        aggs = [
            F.slice(F.array_sort(F.collect_set(pair)), 1, self.k)
            .alias("_mins")
        ]
        if has_k:
            aggs.append(_merged_kmv_k())
        return (
            merged.groupBy(*self.keys)
            .agg(*aggs)
            .select(
                *self.keys,
                F.explode("_mins").alias("_p"),
                *(["_kmv_k"] if has_k else []),
            )
            .select(
                *self.keys,
                F.col("_p._h").alias("_h"),
                F.col("_p._v").alias("_v"),
                *(["_kmv_k"] if has_k else []),
            )
        )

    def estimate(self, ps: list[float]) -> DataFrame:
        state = self._state()
        if state is None:
            raise ValueError(f"no sketch state at {self.state_dir}")
        return quantile_finalize(state, self.keys, ps, self.k)


class IncrementalWeightedSample(_IncrementalMinKBase):
    """Persisted A-ES weighted reservoir — the always-on twin of
    ``operators.sampling.weighted_sample`` (Efraimidis–Spirakis 2006
    §4 explicitly frames A-ES as a one-pass RESERVOIR scheme; this is
    that reservoir, distributed): ``state_dir`` holds the current
    weight-proportional sample of everything seen — ≤ n rows per key,
    (keys…, id, weight, skey_micro). Top-n by the deterministic A-ES
    key is set max-n: associative, commutative, replay-IDEMPOTENT
    (a replayed row reproduces its exact (skey, id, weight) struct and
    set-dedups away), so any batch split and any replay yields the
    sample of the concatenated input — parity with the batch operator
    is pinned by test.

    Contract inherited from the batch twin: ``id_col`` must identify
    rows uniquely ACROSS THE WHOLE STREAM. A re-sent id with an
    identical row is replay-safe; a re-sent id with a DIFFERENT weight
    violates the contract (both (skey, id) structs would be eligible
    and one id could appear twice).

    Commit regimes: see :class:`_IncrementalMinKBase` (versioned
    snapshots, one executor-side write, no collect at any state
    size)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        n: int,
        weight_col: str,
        id_col: str,
        seed: int = 42,
        driver_state_max_rows: int = 100_000,
        payload_cols: list[str] | None = None,
    ) -> None:
        if n < 1:
            raise ValueError("IncrementalWeightedSample needs n >= 1")
        super().__init__(spark, state_dir, driver_state_max_rows)
        self.keys = list(keys)
        self.n = n
        self.weight_col = weight_col
        self.id_col = id_col
        self.seed = seed
        # metadata columns carried INSIDE the reservoir rows (e.g.
        # n_tok) — a finalize stage can't join back to a stream that
        # is gone; see topn_by_aes_key's payload contract
        self.payload_cols = list(payload_cols or [])

    def _check_state_compat(self, state: DataFrame) -> None:
        # the _kmv_k NULL-as-legacy treatment does NOT extend to
        # payloads: allowMissingColumns would union a pre-payload
        # state as NULL payloads, which (a) defeats the collect_set
        # replay dedup (a replayed row's real-payload struct differs
        # from the state's NULL-payload one — same id twice) and
        # (b) feeds NULL-as-0 costs into downstream budget stages
        # (review finding). Resuming a payload-less state under
        # payload_cols must fail loudly instead.
        missing = [c for c in self.payload_cols if c not in state.columns]
        if missing:
            raise ValueError(
                f"persisted sample state at {self.state_dir} lacks "
                f"payload column(s) {missing} — it was built without "
                "payload_cols; rebuild the reservoir (or drop "
                "payload_cols) instead of silently unioning NULLs"
            )

    def _prune_batch(self, batch_df: DataFrame) -> DataFrame:
        from ramen_spark.operators.sampling import weighted_sample

        return weighted_sample(
            batch_df, self.n, self.weight_col, self.keys, self.id_col,
            self.seed, payload_cols=self.payload_cols,
        ).drop("rn")

    def _reprune(self, merged: DataFrame) -> DataFrame:
        # the shared top-n pipeline (ONE definition with the batch
        # operator's salted level — a tie-break or overflow fix can
        # never drift between lanes); dedup=True because the merge of
        # state ∪ replayed batch carries identical structs twice
        from ramen_spark.operators.sampling import topn_by_aes_key

        return topn_by_aes_key(
            merged, self.keys, self.n, self.id_col, self.weight_col,
            dedup=True, payload_cols=self.payload_cols,
        )

    def sample(self) -> DataFrame:
        """The current sample with its rank — identical to batch
        ``weighted_sample`` over everything seen. The rank window runs
        on the persisted state (≤ n rows per key), never the stream."""
        state = self._state()
        if state is None:
            raise ValueError(f"no sample state at {self.state_dir}")
        from pyspark.sql import Window

        win = Window.partitionBy(*self.keys).orderBy(
            F.col("skey_micro").desc(), F.col(self.id_col).asc()
        )
        return state.withColumn("rn", F.row_number().over(win).cast("long"))


def weighted_sample_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    n: int,
    weight_col: str,
    id_col: str,
    seed: int = 42,
):
    """Maintain a weight-proportional sample always-on (the live
    "n best-weighted docs per language so far" a curation dashboard
    reads); any batch job or ``IncrementalWeightedSample.sample()``
    reads it off ``state_dir``. Replay-idempotent (set max-n of
    deterministic keys). Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalWeightedSample(
            batch_df.sparkSession, state_dir, keys, n, weight_col, id_col,
            seed,
        ).update(batch_df)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


class IncrementalCorpusMix:
    """Always-on twin of the v2 MIXING stage (round-11 agenda #8) —
    the one composed lane that was still batch-only: per-key A-ES
    weighted reservoir (quality-proportional, capped at n docs/key)
    feeding a keyed token-budget prefix. The batch chain is
    ``weighted_sample → token_budget_select`` as composed by
    queries._prepare_corpus_v2; this class maintains the SAME result
    incrementally: the reservoir folds micro-batches (replay-
    idempotent set max-n, versioned snapshots), carrying the budget
    column (n_tok) as reservoir payload — the stream is gone by
    finalize time, so metadata must ride the state. ``mixed(budget)``
    then runs the keyed budget prefix on the ≤ n-rows-per-key state:
    stream ≡ batch whenever the same rows were folded, pinned by the
    parity test (3 batches + restart + replay).

    100 TB shape: everything the corpus's size touches is the
    reservoir fold (bounded state, one executor-side snapshot write
    per batch); the finalize runs on ≤ n·|keys| rows."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        n: int,
        weight_col: str,
        id_col: str,
        budget_col: str,
        seed: int = 42,
    ) -> None:
        self.keys = list(keys)
        self.id_col = id_col
        self.budget_col = budget_col
        self.sample = IncrementalWeightedSample(
            spark, state_dir, keys, n, weight_col, id_col, seed,
            payload_cols=[budget_col],
        )

    def update(self, batch_df: DataFrame) -> None:
        self.sample.update(batch_df)

    def mixed(self, budget: int) -> DataFrame:
        """The current mixture selection: per key, the A-ES-ordered
        prefix of the reservoir whose ``budget_col`` sum fits
        ``budget`` — identical to the batch chain over everything
        seen. → (keys…, id, weight, skey_micro, budget_col)."""
        from ramen_spark.operators.sampling import token_budget_select

        state = self.sample._state()
        if state is None:
            raise ValueError(f"no sample state at {self.sample.state_dir}")
        return token_budget_select(
            state, budget, self.budget_col, "skey_micro", self.id_col,
            keys=self.keys,
        )


def corpus_mix_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    n: int,
    weight_col: str,
    id_col: str,
    budget_col: str,
    seed: int = 42,
):
    """Maintain the v2 mixing stage always-on; any batch job (or
    ``IncrementalCorpusMix.mixed(budget)``) reads the live mixture
    off ``state_dir``. Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalCorpusMix(
            batch_df.sparkSession, state_dir, keys, n, weight_col, id_col,
            budget_col, seed,
        ).update(batch_df)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


class IncrementalCmsSketch:
    """Persisted count-min sketch: the state snapshot holds (row, col,
    cnt, _b) cells, ``_b`` = the last batch id folded in. ``update``
    cell-wise-sums a micro-batch's sketch; replayed batch ids are
    skipped (sums are not idempotent). Bounded state: ≤ depth × width
    cells regardless of stream volume; persisted via the versioned
    _SnapshotStore (one executor-side write, no collect, crash-safe —
    see module docstring)."""

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
        self.store = _SnapshotStore(spark, state_dir)
        self.value_col = value_col
        self.depth = depth
        self.width = width

    def _state(self) -> DataFrame | None:
        return self.store.read()

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
        self.store.commit(merged.withColumn("_b", F.lit(batch_id).cast("long")))

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
    driver_state_max_rows: int = 100_000,
):
    """Maintain a KMV distinct sketch always-on: every micro-batch is
    pruned and merged into ``state_dir``; any batch job (or
    ``IncrementalKmvSketch.estimate``) can read the live cardinality
    off it. Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalKmvSketch(
            batch_df.sparkSession, state_dir, keys, value_col, k,
            driver_state_max_rows=driver_state_max_rows,
        ).update(batch_df)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def quantile_sketch_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    id_col: str,
    k: int = 1024,
    driver_state_max_rows: int = 100_000,
):
    """Maintain a bottom-k quantile sample always-on (live latency /
    token-length / quality percentiles without a global sort); any
    batch job or ``IncrementalQuantileSketch.estimate`` reads the live
    distribution off ``state_dir``. Replay-idempotent (set min-k).
    Returns the started StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalQuantileSketch(
            batch_df.sparkSession, state_dir, keys, value_col, id_col, k,
            driver_state_max_rows=driver_state_max_rows,
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


class IncrementalCmsTop:
    """Persisted CMS heavy hitters — the always-on twin of
    ``operators.sketch.cms_top`` and the true streaming shape of the
    reference's ``TOP n OVER m`` aggregate (raql_expr.type `Top`,
    whose max_size m bounds the tracked candidates exactly as
    ``max_candidates`` does here).

    State = two artifacts under ``state_dir``:
    - ``cells/``: per-key CMS cells (keys…, row, col, cnt, _b) —
      ≤ depth × width per key REGARDLESS of stream volume; ``_b`` is
      the last folded batch id (cell sums are not replay-idempotent,
      so replays are skipped — the IncrementalCmsSketch contract).
    - ``cands/``: the tracked candidate values (keys…, _v) — ≤
      ``max_candidates`` per key, re-ranked by the merged cells after
      every fold, worst evicted.

    Why this beats the unbounded alternative at 100 TB: an exact
    streaming TOP needs a per-(key, value) count table — unbounded in
    the value domain (every URL, every token). Here the count state
    is the FIXED cell grid and only m candidate VALUES ride along.
    The inherent accuracy trade (also the reference's): a value
    evicted from the candidate list keeps counting in the cells but
    cannot re-enter the list until seen again — choose m ≫ n (the
    reference's `n OVER m` knob; with m ≥ distinct values the result
    is exactly batch cms_top, pinned by parity test).

    Commit order is cands FIRST, then cells-with-batch-id: a crash
    between the two replays the batch (id not yet recorded), and the
    candidate union is idempotent — mixed state self-heals. Both
    artifacts persist via their own versioned _SnapshotStore (one
    executor-side write each, no collect, crash-safe on object stores
    — module docstring); ``driver_state_max_rows`` is accepted for
    API compatibility and ignored, like _IncrementalMinKBase."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        max_candidates: int = 256,
        depth: int = 4,
        width: int = 2048,
        weight_col: str | None = None,
        driver_state_max_rows: int = 100_000,
    ) -> None:
        if max_candidates < 1:
            raise ValueError("IncrementalCmsTop needs max_candidates >= 1")
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.keys = list(keys)
        self.value_col = value_col
        self.m = max_candidates
        self.depth = depth
        self.width = width
        self.weight_col = weight_col
        self.last_commit_path: str | None = None
        self.cells_store = _SnapshotStore(spark, self.state_dir + "/cells")
        self.cands_store = _SnapshotStore(spark, self.state_dir + "/cands")

    def _check_geometry(self, cells: DataFrame) -> None:
        """Cell estimates are only comparable at ONE (depth, width) —
        folding or querying a state at a different geometry silently
        yields wrong estimates (wrong-width hashes miss every cell →
        all-zero). States stamp their build geometry since round 12;
        pre-stamp states pass unchecked (documented legacy mode, like
        the KMV _kmv_k column)."""
        if "_geo_depth" not in cells.columns:
            return
        row = cells.select("_geo_depth", "_geo_width").first()
        if row is not None and (row[0], row[1]) != (self.depth, self.width):
            raise ValueError(
                f"CMS state at {self.state_dir} was built at "
                f"depth={row[0]} width={row[1]}, not the requested "
                f"depth={self.depth} width={self.width}"
            )

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        from ramen_spark.operators.sketch import (
            cms_build_keyed,
            cms_estimate_candidates,
        )

        cells = self.cells_store.read()
        if cells is not None:
            self._check_geometry(cells)
            last = cells.agg(F.max("_b")).collect()[0][0]
            if last is not None and batch_id <= last:
                return  # replayed micro-batch: already folded in
        batch_cells = cms_build_keyed(
            batch_df, self.keys, self.value_col, self.depth, self.width,
            self.weight_col,
        )
        if cells is None:
            merged_cells = batch_cells
        else:
            merged_cells = (
                cells.select(*self.keys, "row", "col", "cnt")
                .unionByName(batch_cells)
                .groupBy(*self.keys, "row", "col")
                .agg(F.sum("cnt").alias("cnt"))
            )
        # localCheckpoint: the merged cells feed BOTH the candidate
        # re-rank and the cells commit — one materialization instead
        # of two executions of the prune+union+sum plan
        merged_cells = merged_cells.localCheckpoint(eager=True)

        new_cand = (
            batch_df.filter(F.col(self.value_col).isNotNull())
            .select(*self.keys, F.col(self.value_col).alias("_v"))
            .distinct()
        )
        old_cand = self.cands_store.read()
        pool = (
            new_cand
            if old_cand is None
            else old_cand.unionByName(new_cand).distinct()
        )
        est = cms_estimate_candidates(
            merged_cells, pool, self.keys, self.depth, self.width
        )
        rank = F.struct((-F.col("_est")).alias("_negw"), F.col("_v").alias("v"))
        kept = (
            est.groupBy(*self.keys)
            .agg(
                F.slice(F.array_sort(F.collect_list(rank)), 1, self.m).alias("_m")
            )
            .select(*self.keys, F.inline("_m"))
            .select(*self.keys, F.col("v").alias("_v"))
        )
        # cands first, then cells-with-batch-id (see class docstring);
        # the geometry stamp makes a depth/width mismatch on resume or
        # drift a loud error instead of an all-zero report
        self.cands_store.commit(kept)
        self.cells_store.commit(
            merged_cells.withColumn("_b", F.lit(batch_id).cast("long"))
            .withColumn("_geo_depth", F.lit(self.depth))
            .withColumn("_geo_width", F.lit(self.width))
        )
        self.last_commit_path = "distributed"

    def top(self, n: int) -> DataFrame:
        """Current heavy hitters: (keys…, top = array of the n tracked
        values with the largest CMS estimate, (est desc, value asc)) —
        identical to batch cms_top over everything seen whenever
        max_candidates covered the distinct values (parity-pinned)."""
        from ramen_spark.operators.sketch import (
            cms_estimate_candidates,
            cms_rank_top,
        )

        cells = self.cells_store.read()
        cands = self.cands_store.read()
        if cells is None or cands is None:
            raise ValueError(f"no sketch state at {self.state_dir}")
        self._check_geometry(cells)
        est = cms_estimate_candidates(
            cells.select(*self.keys, "row", "col", "cnt"),
            cands, self.keys, self.depth, self.width,
        )
        return cms_rank_top(est, self.keys, n, "top")

    def drift_vs(self, other: "IncrementalCmsTop", n: int) -> DataFrame:
        """Heavy-hitter churn report between THIS state (snapshot A)
        and ``other`` (snapshot B) — ``operators.sketch.cms_drift``
        over the two persisted (cells, cands) pairs: which values
        entered/left the per-key top-n, with estimate deltas. Both
        corpora stay unread; geometries must match (estimates at
        different (depth, width) are not comparable)."""
        from ramen_spark.operators.sketch import cms_drift

        if (self.keys, self.depth, self.width) != (
            other.keys, other.depth, other.width
        ):
            raise ValueError(
                "cms drift needs matching keys and sketch geometry: "
                f"{self.keys}/{self.depth}x{self.width} vs "
                f"{other.keys}/{other.depth}x{other.width}"
            )
        pairs = []
        for side in (self, other):
            cells = side.cells_store.read()
            cands = side.cands_store.read()
            if cells is None or cands is None:
                raise ValueError(f"no sketch state at {side.state_dir}")
            side._check_geometry(cells)
            pairs += [cells, cands]
        return cms_drift(*pairs, self.keys, n, self.depth, self.width)


def cms_top_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    max_candidates: int = 256,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
):
    """Maintain CMS heavy hitters always-on (which URLs/tokens/users
    are hot right now, per key, in bounded state); any batch job or
    ``IncrementalCmsTop.top(n)`` reads the live ranking off
    ``state_dir``. Batch-id guarded like the plain CMS lane."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        IncrementalCmsTop(
            batch_df.sparkSession, state_dir, keys, value_col,
            max_candidates, depth, width, weight_col,
        ).update(batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
