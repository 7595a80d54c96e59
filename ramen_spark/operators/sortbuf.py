"""SORT LAST n [OR UNTIL cond] BY key… — the bounded reorder buffer.

Reference semantics (src/RamenSortBuf.ml:1-109, integration
src/CodeGenLib_Skeletons.ml:896-921, parser
src/RamenOperation.ml:1278-1293): a worker buffers up to n input
tuples; each incoming tuple is inserted, then — when the buffer holds
≥ n tuples OR the UNTIL condition fires — the smallest tuple by the
sort key(s) is popped and processed. It repairs bounded
out-of-orderness without sorting the whole stream. The buffer exposes
a ``sort`` namespace to the UNTIL condition (and key exprs):
``sort.count`` (tuples buffered, incl. the one just inserted),
``sort.first`` (oldest buffered, FIFO), ``sort.smallest`` /
``sort.greatest`` (by sort key / running max by tuple value).

Spark-first mapping (SURVEY §2.2 SORT row):

- The *purpose* (event-time order repair) is served natively by
  watermarks in streaming and by sort in batch — when downstream only
  needs order, use ``df.sortWithinPartitions`` (no shuffle) or a
  window over event time.
- The *exact* pop-when-full/until semantics matter only when the
  bound itself is observable (late tuples beyond n stay out of
  order). ``sort_last`` reproduces them: a per-partition heap fold
  via ``mapInPandas`` — O(rows log n) per partition, streaming
  through Arrow batches, never materializing more than the batch +
  n-element heap. Partition-local by design: the reference's buffer
  is also local to one worker's input stream, so parallelism ≡ many
  workers; global exactness requires a single input partition (tests
  use one; at scale you want the watermark path anyway).
"""

from __future__ import annotations

import heapq
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame

__all__ = ["sort_last"]

# UNTIL callback: (in_row, sort_vars) -> bool, where sort_vars maps
# "count" -> int and "first"/"smallest"/"greatest" -> row dicts
UntilFn = Callable[[dict, dict], bool]


def sort_last(
    df: DataFrame,
    n: int,
    by: str | Column | list,
    until: UntilFn | None = None,
) -> DataFrame:
    """Bounded reorder: emit rows in the order the reference's
    ``SORT LAST n [OR UNTIL cond] BY keys`` buffer would pop them
    (per partition). Multiple keys compare lexicographically
    (RamenSortBuf cmp on key tuples).

    The output keeps the input schema; downstream operators consume it
    as the (repaired) input stream.
    """
    if n <= 0:
        raise ValueError("SORT LAST n requires n > 0")
    by_list = by if isinstance(by, list) else [by]
    schema = df.schema
    in_cols = df.columns
    # materialize key expressions as temporary columns so the heap
    # compares precomputed values (supports arbitrary exprs like -n)
    key_names = [f"_sortkey_{i}" for i in range(len(by_list))]
    work = df
    for kn, k in zip(key_names, by_list):
        work = work.withColumn(kn, df[k] if isinstance(k, str) else k)
    key_idxs = [len(in_cols) + i for i in range(len(by_list))]
    width = len(in_cols)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heap: list[tuple] = []  # (key-tuple, seq, row-tuple)
        fifo: dict[int, tuple] = {}  # seq -> row (insertion = FIFO order)
        greatest: tuple | None = None  # running max by tuple value
        seq = 0

        def row_dict(row: tuple) -> dict:
            return dict(zip(in_cols, row[:width]))

        def pop() -> tuple:
            nonlocal greatest
            _, s, row = heapq.heappop(heap)
            del fifo[s]
            if not heap:
                greatest = None  # buffer drained → greatest resets
            return row

        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False, name=None):
                key = tuple(row[i] for i in key_idxs)
                heapq.heappush(heap, (key, seq, row))
                fifo[seq] = row
                seq += 1
                if greatest is None or row[:width] > greatest[:width]:
                    greatest = row
                fire = len(heap) >= n
                if not fire and until is not None:
                    sort_vars = {
                        "count": len(heap),
                        "first": row_dict(fifo[next(iter(fifo))]),
                        "smallest": row_dict(heap[0][2]),
                        "greatest": row_dict(greatest),
                    }
                    fire = bool(until(row_dict(row), sort_vars))
                if fire:
                    out.append(pop()[:width])
            if out:
                yield pd.DataFrame(out, columns=in_cols)
        if heap:
            drained = [pop()[:width] for _ in range(len(heap))]
            yield pd.DataFrame(drained, columns=in_cols)

    return work.mapInPandas(fold, schema=schema)
