"""Jar-free live Kafka source — READ FROM KAFKA against any reachable
broker with NO spark-sql-kafka package (reference: the Kafka consumer
wired in /root/reference/src/CodeGenLib_IO.ml:176-210).

Round-11 verdict #1: every layer below this module is already real
and tested — the wire protocol (Produce v8 / Fetch v11,
``sources/kafka_wire.py``), the TCP dial (``connect_kafka``, exercised
over real loopback sockets), and the RecordBatch decoder
(``sources/binary.decode_kafka_segment``, shared verbatim with the
offline log-segment lane). This module only COMPOSES them into a
micro-batch polling source with checkpointed offsets, which makes the
"no jar / no broker environment" block moot: any TCP-reachable broker
(the loopback test broker included) is now a live source.

Execution model — the incremental-sketch lanes' micro-batch shape,
not a Structured Streaming Source (the public Python data-source API
for that is the jar-gated path this module exists to avoid):

* ``poll()`` runs ONE Spark job whose tasks each dial the broker from
  the EXECUTOR (``connect_kafka`` inside ``mapInPandas``), fetch their
  assigned (topic, partition) from the last committed offset to the
  current high watermark, and stream decoded records straight into a
  parquet SPOOL batch — records never visit the driver.
* Offsets are checkpointed in a versioned ``_SnapshotStore``
  (``<root>/offsets``) AFTER the spool write succeeds. Crash between
  spool write and offset commit ⇒ the next poll finds the offsets
  version unchanged, DELETES the orphan batch dir and re-fetches:
  at-least-once against the broker, duplicate-free in the spool (the
  batch dir is named by the offsets version it advances from, so an
  orphan is self-identifying).
* ``spool()`` reads the accumulated batches back as one DataFrame —
  the replayable durable log, same contract as ``UdpSpool``.

100 TB shape: one task per (topic, partition) — Kafka's own unit of
parallelism; a 1000-partition topic fans out to 1000 concurrent
fetch tasks, each holding one fetch response in memory at a time
(``max_records`` bounds the batch). The driver traffic is one
``len(assignments)``-row seed and one equally tiny offsets commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_LIVE_SCHEMA = (
    "topic string, partition int, base_offset long, offset long, "
    "timestamp_ms long, key binary, value binary"
)


class KafkaLiveSource:
    """Micro-batch Kafka consumer over the tested wire client.

    ``assignments`` is an explicit (topic, partition) list — the shape
    the reference's kafka reader uses (no consumer groups; see
    kafka_wire's scope note). ``starting_offsets`` maps (topic,
    partition) → first offset for partitions with no committed state
    (default 0 = earliest; pass a high watermark for latest-style
    semantics). ``max_records`` bounds ONE poll per partition so a
    deep backlog drains across several bounded batches instead of one
    unbounded task."""

    def __init__(
        self,
        spark: SparkSession,
        host: str,
        port: int,
        assignments: list[tuple[str, int]],
        root_dir: str,
        starting_offsets: dict[tuple[str, int], int] | None = None,
        max_records: int = 1_000_000,
        client_id: str = "ramen-spark",
        timeout_s: float = 10.0,
    ) -> None:
        from ramen_spark.streaming.sketch import _SnapshotStore

        if not assignments:
            raise ValueError("KafkaLiveSource needs at least one assignment")
        if len(set(assignments)) != len(assignments):
            raise ValueError(f"duplicate assignments: {assignments}")
        if max_records < 1:
            raise ValueError("max_records must be >= 1")
        self.spark = spark
        self.host = host
        self.port = port
        self.assignments = [(str(t), int(p)) for t, p in assignments]
        self.root_dir = root_dir.rstrip("/")
        self.starting = dict(starting_offsets or {})
        self.max_records = max_records
        self.client_id = client_id
        self.timeout_s = timeout_s
        self.offsets_store = _SnapshotStore(spark, self.root_dir + "/offsets")

    # -- offsets ----------------------------------------------------------

    def committed_offsets(self) -> dict[tuple[str, int], int]:
        """{(topic, partition): next offset to fetch} from the
        checkpoint — empty before the first successful poll."""
        state = self.offsets_store.read()
        if state is None:
            return {}
        return {
            (r["topic"], r["partition"]): r["next_offset"]
            for r in state.collect()  # bounded: one row per assignment
        }

    def _start_offsets(self) -> dict[tuple[str, int], int]:
        committed = self.committed_offsets()
        return {
            tp: committed.get(tp, self.starting.get(tp, 0))
            for tp in self.assignments
        }

    # -- the poll ---------------------------------------------------------

    def poll(self) -> DataFrame:
        """Fetch everything new on every assignment into one durable
        spool batch; commit offsets; return the batch (read back off
        the spool — stable, re-scannable, never re-dials)."""
        import pandas as pd

        version = self.offsets_store.current_version() or 0
        batch_dir = f"{self.root_dir}/spool/from-v{version}"
        # an existing dir at OUR version is an orphan of a poll that
        # crashed after the spool write but before the offset commit —
        # drop and re-fetch so the spool never holds duplicates
        self._delete_dir(batch_dir)

        starts = self._start_offsets()
        seed = self.spark.createDataFrame(
            [(t, p, off) for (t, p), off in sorted(starts.items())],
            "topic string, partition int, start long",
        ).repartition(len(starts))

        host, port = self.host, self.port
        client_id, timeout_s = self.client_id, self.timeout_s
        max_records = self.max_records
        cols = [
            "topic", "partition", "base_offset", "offset", "timestamp_ms",
            "key", "value",
        ]

        def fetch(batches):
            from ramen_spark.sources.kafka_wire import connect_kafka

            for pdf in batches:
                for t, p, start in zip(
                    pdf["topic"], pdf["partition"], pdf["start"]
                ):
                    t, p, off = str(t), int(p), int(start)
                    client = connect_kafka(
                        host, port, client_id=client_id, timeout_s=timeout_s
                    )
                    try:
                        remaining = max_records
                        while remaining > 0:
                            recs, hwm = client.fetch_records(t, p, off)
                            if not recs:
                                break  # caught up (or hwm gap — retry
                                # next poll rather than spin here)
                            recs = recs[:remaining]
                            yield pd.DataFrame(
                                [(t, p, *rec) for rec in recs], columns=cols
                            )
                            remaining -= len(recs)
                            off = recs[-1][1] + 1
                            if off >= hwm:
                                break
                    finally:
                        client.close()

        rows = seed.mapInPandas(fetch, KAFKA_LIVE_SCHEMA)
        # durable FIRST (executor-side parquet write), offsets AFTER —
        # the delivery contract is broker → spool; a crash in between
        # re-fetches into the same (reaped) batch dir
        rows.write.mode("overwrite").parquet(batch_dir)
        batch = self.spark.read.parquet(batch_dir)

        if version > 0 and batch.limit(1).isEmpty():
            # idle poll on an established checkpoint: nothing moved, so
            # don't churn an offsets version + empty spool dir per poll
            # (an always-on 1 s cadence would mint 86k/day). The FIRST
            # poll always commits, pinning the starting offsets.
            self._delete_dir(batch_dir)
            return self.spark.createDataFrame([], KAFKA_LIVE_SCHEMA)

        ends = {
            (r["topic"], r["partition"]): r["m"] + 1
            for r in batch.groupBy("topic", "partition")
            .agg(F.max("offset").alias("m"))
            .collect()  # bounded: one row per assignment
        }
        # MERGE with the full committed map, not just current
        # assignments: a partition absent from this source's assignment
        # list must keep its committed offset — rebuilding the snapshot
        # from assignments alone would erase it, and a later re-added
        # assignment would re-fetch from scratch and duplicate the
        # spool (review finding)
        next_offsets = dict(self.committed_offsets())
        next_offsets.update(
            {tp: ends.get(tp, off) for tp, off in starts.items()}
        )
        self.offsets_store.commit(
            self.spark.createDataFrame(
                [(t, p, off) for (t, p), off in sorted(next_offsets.items())],
                "topic string, partition int, next_offset long",
            ).coalesce(1)
        )
        return batch

    # -- the durable log --------------------------------------------------

    def spool(self) -> DataFrame:
        """Every polled batch as one DataFrame — the replayable
        durable log (what downstream decode lanes and replays read;
        any committed record survives source restarts)."""
        dirs = self._spool_dirs()
        if not dirs:
            return self.spark.createDataFrame([], KAFKA_LIVE_SCHEMA)
        return self.spark.read.parquet(*dirs)

    def compact_spool(self) -> int:
        """Merge the STABLE spool batches (everything below the
        current offsets version — a dir at the current version can
        still be reaped by a crashed-poll retry) into one span dir.
        An always-on cadence mints one small parquet dir per non-idle
        poll; unmerged, a day of 1 s polls is ~86k directories whose
        listing alone dominates ``spool()`` at scale.

        Crash-safe by PUBLISH-THEN-SHADOW, the write_webdataset
        generation discipline adapted to an append-only log: the
        merged data is written to an unlisted ``compacting-*`` staging
        dir, renamed to ``span-v{a}-v{b}-*`` in ONE step, and only
        then are the covered dirs best-effort deleted. Readers treat
        a span as superseding every ``from-v{n}`` with a ≤ n ≤ b and
        any span it fully contains, so every crash point reads
        duplicate-free: before the rename only the originals are
        listed; after it only the span is. Returns the number of dirs
        merged (0 = nothing to do)."""
        cur = self.offsets_store.current_version() or 0
        # reap crash leftovers first: unlisted compacting-* staging
        # dirs, and anything a live span already shadows (a compact
        # that crashed between publish and cleanup)
        from ramen_spark.streaming.sketch import _fs

        fs, rp = _fs(self.spark, self.root_dir + "/spool")
        if fs.exists(rp):
            effective = set(self._spool_dirs())
            for st in fs.listStatus(rp):
                nm = st.getPath().getName()
                path = f"{self.root_dir}/spool/{nm}"
                if st.isDirectory() and (
                    nm.startswith("compacting-")
                    or (
                        nm.startswith(("from-v", "span-v"))
                        and path not in effective
                    )
                ):
                    self._delete_dir(path)
        spans, plains = self._spool_entries()
        stable_spans = [e for e in spans if e[1] < cur]
        stable_plains = [e for e in plains if e[0] < cur]
        merged = [(a, b, p) for a, b, p in stable_spans] + [
            (n, n, p) for n, p in stable_plains
        ]
        if len(merged) < 2:
            return 0
        lo = min(a for a, _b, _p in merged)
        hi = max(b for _a, b, _p in merged)
        import uuid as _uuid

        token = _uuid.uuid4().hex[:12]
        staging = f"{self.root_dir}/spool/compacting-{token}"
        self.spark.read.parquet(*[p for _a, _b, p in merged]).coalesce(
            max(1, min(len(merged) // 8, 32))
        ).write.mode("overwrite").parquet(staging)
        _fs2, sp = _fs(self.spark, staging)
        ok = _fs2.rename(
            sp,
            self.spark._jvm.org.apache.hadoop.fs.Path(
                f"{self.root_dir}/spool/span-v{lo}-v{hi}-{token}"
            ),
        )  # ← the publish: from here on the originals are shadowed
        if not ok:
            self._delete_dir(staging)
            raise OSError(
                f"spool compaction publish rename failed under "
                f"{self.root_dir}/spool"
            )
        for _a, _b, p in merged:
            self._delete_dir(p)  # best-effort; leftovers stay shadowed
        return len(merged)

    def _spool_entries(
        self,
    ) -> tuple[list[tuple[int, int, str]], list[tuple[int, str]]]:
        """Raw spool listing → (spans [(a, b, path)], plains
        [(version, path)]). ``compacting-*`` staging dirs are invisible
        by design (crash leftovers; reaped by the next compact)."""
        from ramen_spark.streaming.sketch import _fs

        fs, rp = _fs(self.spark, self.root_dir + "/spool")
        spans: list[tuple[int, int, str]] = []
        plains: list[tuple[int, str]] = []
        if not fs.exists(rp):
            return spans, plains
        for st in fs.listStatus(rp):
            nm = st.getPath().getName()
            path = f"{self.root_dir}/spool/{nm}"
            if not st.isDirectory():
                continue
            if nm.startswith("from-v") and nm[6:].isdigit():
                plains.append((int(nm[6:]), path))
            elif nm.startswith("span-v"):
                body = nm[5:].split("-")
                if (
                    len(body) >= 2
                    and body[0][1:].isdigit()
                    and body[1][1:].isdigit()
                ):
                    spans.append((int(body[0][1:]), int(body[1][1:]), path))
        return spans, plains

    def _spool_dirs(self) -> list[str]:
        spans, plains = self._spool_entries()
        return _effective_spool(spans, plains)

    def _delete_dir(self, path: str) -> None:
        from ramen_spark.streaming.sketch import _fs

        fs, p = _fs(self.spark, path)
        if fs.exists(p):
            fs.delete(p, True)


def _effective_spool(
    spans: list[tuple[int, int, str]], plains: list[tuple[int, str]]
) -> list[str]:
    """The EFFECTIVE spool dirs: spans supersede the plain batch dirs
    they cover and any span they fully contain — so a crash between a
    compaction's publish rename and its cleanup deletes never
    double-reads. Pure function (property-tested against simulated
    compaction/crash histories): ties between identical ranges (two
    crashed compacts of the same window) break by path so exactly one
    wins."""
    live_spans = [
        (a, b, p)
        for a, b, p in spans
        if not any(
            (a2 <= a and b <= b2)
            and (a2, b2, p2) != (a, b, p)
            and ((a2, b2) != (a, b) or p2 > p)
            for a2, b2, p2 in spans
        )
    ]

    def covered(n: int) -> bool:
        return any(a <= n <= b for a, b, _p in live_spans)

    out = [p for _a, _b, p in live_spans]
    out += [p for n, p in plains if not covered(n)]
    return sorted(out)
