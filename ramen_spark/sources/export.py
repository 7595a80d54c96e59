"""Sharded training-corpus export with a verifiable manifest — the
final mile of the pipeline: the packed rows a training job streams
must land as size-balanced, individually-addressable shards with a
manifest the loader (and a re-run) can verify (the WebDataset /
streaming-dataset contract, re-expressed on parquet).

Training-pipeline extension (no reference counterpart; the nearest
surface is the archive writer, sources/archive.py).

100 TB shape: one write partitioned by the shard key (the caller's
shard assignment — sequence_packing already emits one), each shard a
self-contained parquet directory a loader opens independently; the
manifest aggregates per-shard row counts and an order-independent
content hash in ONE pass over ids (xor/sum of per-row md5 halves —
commutative, so partition order and parallelism don't change it),
tiny enough to live as a single JSON beside the data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _shard_stats(df: DataFrame, shard_col: str, id_col: str) -> DataFrame:
    # commutative content hash: sum of 48-bit id hashes, accumulated as
    # decimal(38,0) (headroom for ~2^78 rows), reduced mod the Mersenne
    # prime 2^61-1 so the stored value fits a signed long. A plain
    # long sum overflows at ~2^15 rows/shard and THROWS under Spark 4's
    # default ANSI mode — it must never appear here. Multiset-sensitive
    # (unlike xor, a row counted twice changes the hash) and
    # deterministic under any row order / partitioning.
    h1 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("decimal(38,0)")
    return df.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum(h1), F.lit(2305843009213693951).cast("decimal(38,0)"))
        .cast("long")
        .alias("content_sum"),
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    id_col: str = "doc_id",
) -> dict:
    """Write ``df`` partitioned by ``shard_col`` under
    ``out_dir/data`` and a ``manifest.json`` beside it:
    {shards: {shard: {n_rows, content_sum}}, total_rows}. Returns the
    manifest dict."""
    df.write.mode("overwrite").partitionBy(shard_col).parquet(
        os.path.join(out_dir, "data")
    )
    stats = _shard_stats(df, shard_col, id_col).collect()
    manifest = {
        "id_col": id_col,
        "shard_col": shard_col,
        "shards": {
            str(r[shard_col]): {
                "n_rows": r["n_rows"],
                "content_sum": r["content_sum"],
            }
            for r in stats
        },
        "total_rows": int(sum(r["n_rows"] for r in stats)),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_export(spark: SparkSession, out_dir: str) -> list[str]:
    """Re-derive the manifest from the written data and diff: returns
    a list of human-readable discrepancies (empty = verified). What a
    loader runs before trusting a snapshot, and what a re-run uses to
    prove a deterministic pipeline reproduced the corpus."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    got = {
        str(r[manifest["shard_col"]]): (r["n_rows"], r["content_sum"])
        for r in _shard_stats(
            df, manifest["shard_col"], manifest["id_col"]
        ).collect()
    }
    errs: list[str] = []
    want = manifest["shards"]
    for shard in sorted(set(want) | set(got)):
        if shard not in got:
            errs.append(f"shard {shard}: missing from data")
        elif shard not in want:
            errs.append(f"shard {shard}: not in manifest")
        elif (want[shard]["n_rows"], want[shard]["content_sum"]) != got[shard]:
            errs.append(
                f"shard {shard}: manifest {want[shard]} != data "
                f"{{'n_rows': {got[shard][0]}, 'content_sum': {got[shard][1]}}}"
            )
    total = sum(v[0] for v in got.values())
    if total != manifest["total_rows"]:
        errs.append(f"total_rows: manifest {manifest['total_rows']} != {total}")
    return errs
