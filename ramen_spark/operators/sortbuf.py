"""SORT LAST n [OR UNTIL cond] BY key — the bounded reorder buffer.

Reference semantics (src/RamenSortBuf.ml:1-109, parser
src/RamenOperation.ml:1278-1293): a worker buffers up to n input
tuples; when the buffer is full (or an UNTIL condition fires on the
newly-inserted tuple) the smallest tuple by the sort key is popped and
processed. It repairs bounded out-of-orderness without sorting the
whole stream.

Spark-first mapping (SURVEY §2.2 SORT row):

- The *purpose* (event-time order repair) is served natively by
  watermarks in streaming and by sort in batch — when downstream only
  needs order, use ``df.sortWithinPartitions`` (no shuffle) or a
  window over event time.
- The *exact* pop-when-full semantics matter only when the buffer
  bound itself is observable (late tuples beyond n stay out of
  order). ``sort_last`` reproduces that: a per-partition heap fold
  via ``mapInPandas`` — O(rows log n) per partition, streaming
  through Arrow batches, never materializing more than the batch +
  n-element heap. Partition-local by design: the reference's buffer
  is also local to one worker's input stream, so parallelism ≡ many
  workers; global exactness requires a single input partition (tests
  use one; at scale you want the watermark path anyway).
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["sort_last"]


def sort_last(df: DataFrame, n: int, by: str) -> DataFrame:
    """Bounded reorder: emit rows in the order the reference's
    SORT LAST n BY <by> buffer would pop them (per partition).

    The output keeps the input schema; downstream operators consume it
    as the (repaired) input stream.
    """
    if n <= 0:
        raise ValueError("SORT LAST n requires n > 0")
    schema = df.schema
    key_idx = df.columns.index(by)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        heap: list[tuple] = []  # (key, seq, row-tuple) — seq breaks ties FIFO
        seq = 0
        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False, name=None):
                heapq.heappush(heap, (row[key_idx], seq, row))
                seq += 1
                # buffer holds ≤ n tuples: reaching n pops the smallest
                # (src/RamenSortBuf.ml pop-on-full)
                if len(heap) >= n:
                    out.append(heapq.heappop(heap)[2])
            if out:
                yield pd.DataFrame(out, columns=list(pdf.columns))
        if heap:
            drained = [heapq.heappop(heap)[2] for _ in range(len(heap))]
            yield pd.DataFrame(drained, columns=[f.name for f in schema.fields])

    return df.mapInPandas(fold, schema=schema)
