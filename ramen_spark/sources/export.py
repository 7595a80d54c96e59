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


# ---------------------------------------------------------------------------
# WebDataset tar shards — the multimodal training-loader format
# ---------------------------------------------------------------------------


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    member_cols: dict[str, str],
    n_shards: int = 8,
) -> dict:
    """Export samples as WebDataset-style tar shards (the POSIX-tar
    convention the WebDataset/torchdata loaders stream: each sample's
    members are contiguous entries named ``{key}.{ext}``; shards are
    independently addressable ``shard-NNNNNN.tar`` files). The
    multimodal counterpart of :func:`export_shards` — binary payloads
    (image/audio/video columns) plus their typed metadata land in ONE
    sequentially-readable file per shard, which is what a data loader
    wants at training time (parquet row groups are columnar; a sample
    loader wants row-contiguous bytes).

    ``member_cols`` maps column → member extension, e.g.
    ``{"payload": "wav", "meta": "json"}``. Binary columns write
    as-is; strings write UTF-8; anything else JSON-encodes.

    DETERMINISTIC BYTES: shard assignment is md5(key) mod n_shards,
    samples sort by key within the shard, and tar headers are
    normalized (mtime 0, uid/gid 0) — so a re-run reproduces every
    shard BYTE-IDENTICALLY and the manifest's per-shard tar md5 is a
    content hash a loader (or verify_webdataset) can trust.

    100 TB shape: one hash Exchange on the shard id, then each shard
    streams through ONE applyInPandas task that writes its tar
    executor-side — no driver materialization; the returned manifest
    rows are n_shards tiny tuples. Size shards via ``n_shards`` to the
    loader convention (~100 MB–1 GB each); a shard must fit one task's
    memory. ``out_dir`` must be a path every executor can write and
    the driver can list (local/NFS here; the snapshot-store pattern
    covers object stores).
    """
    import hashlib
    import io
    import tarfile

    if not member_cols:
        raise ValueError("member_cols must map at least one column")
    missing = [c for c in {key_col, *member_cols} if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in df: {missing}")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    # purge stale shards: a re-export with fewer shards (or with empty
    # shards, which write no file) must not leave old tars that
    # read_webdataset's glob would silently mix into the new corpus
    for old in os.listdir(data_dir):
        if old.startswith("shard-") and old.endswith(".tar"):
            os.remove(os.path.join(data_dir, old))
    binary_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "binary"
    }
    string_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    }
    cols = sorted(member_cols)
    exts = dict(member_cols)

    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("long"),
        F.lit(n_shards),
    ).alias("_shard")
    data = df.select(shard, F.col(key_col).cast("string").alias("_key"), *cols)

    def write_shard(pdf):
        import pandas as pd

        # contract checks where they're cheap (the data is already in
        # hand): NULL keys can't name a member (and NULL-shard the
        # whole row); duplicate keys would collide on '{key}.{ext}'
        # member names AND make member order partition-dependent,
        # breaking the byte-determinism promise. Duplicates of a key
        # always land in the SAME shard (shard = md5(key) mod n), so
        # the per-shard check is complete.
        if pdf["_key"].isna().any():
            raise ValueError(
                f"write_webdataset: NULL {key_col!r} keys cannot name "
                "tar members — filter or synthesize keys first"
            )
        dup = pdf["_key"].duplicated()
        if dup.any():
            raise ValueError(
                "write_webdataset: duplicate sample keys "
                f"{sorted(pdf['_key'][dup].unique())[:5]} — keys must be "
                "unique (one sample per key)"
            )
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_key", kind="mergesort")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                wrote_any = False
                for c in cols:
                    v = row[c]
                    if v is None:
                        continue
                    wrote_any = True
                    if c in binary_cols:
                        payload = bytes(v)
                    elif c in string_cols:
                        payload = str(v).encode("utf-8")
                    else:
                        payload = json.dumps(
                            v, sort_keys=True, default=str
                        ).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{row['_key']}.{exts[c]}")
                    info.size = len(payload)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(payload))
                if not wrote_any:
                    raise ValueError(
                        "write_webdataset: sample "
                        f"{row['_key']!r} has every member column NULL "
                        "— a memberless sample is invisible to the "
                        "loader and would desync the manifest's "
                        "n_samples from the tar contents"
                    )
        blob = buf.getvalue()
        path = os.path.join(out_dir, "data", f"shard-{sid:06d}.tar")
        tmp = path + ".inprogress"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame(
            [
                {
                    "shard": sid,
                    "n_samples": len(pdf),
                    "tar_bytes": len(blob),
                    "tar_md5": hashlib.md5(blob).hexdigest(),
                }
            ]
        )

    stats = (
        data.groupBy("_shard")
        .applyInPandas(
            write_shard,
            "shard int, n_samples long, tar_bytes long, tar_md5 string",
        )
        .collect()
    )
    manifest = {
        "format": "webdataset",
        "key_col": key_col,
        "member_cols": exts,
        "n_shards": n_shards,
        "shards": {
            f"shard-{r['shard']:06d}.tar": {
                "n_samples": r["n_samples"],
                "tar_bytes": r["tar_bytes"],
                "tar_md5": r["tar_md5"],
            }
            for r in stats
        },
        "total_samples": int(sum(r["n_samples"] for r in stats)),
    }
    with open(os.path.join(out_dir, "webdataset_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_webdataset(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read WebDataset tar shards back as (shard, key, ext, data) —
    one row per member, binary payloads intact. The inverse of
    :func:`write_webdataset` (roundtrip pinned by test), and the
    ingest path for externally-produced WebDataset corpora.

    100 TB shape: binaryFile gives file-level parallelism (one shard =
    one task, the WARC-reader pattern); the tar walk is a stdlib pass
    over the in-memory shard inside Arrow-batched mapInPandas. Member
    rows compose with the multimodal lanes (audio_stats/image_headers
    take the binary column directly)."""
    import io
    import tarfile

    files = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "data", "shard-*.tar")
    )

    def walk(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        data = tar.extractfile(m).read()
                        rows.append(
                            (name, stem if dot else m.name,
                             ext if dot else "", data)
                        )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["shard_file", "key", "ext", "data"]
                )

    return files.select("path", "content").mapInPandas(
        walk, "shard_file string, key string, ext string, data binary"
    )


def verify_webdataset(spark: SparkSession, out_dir: str) -> list[str]:
    """Diff the written shards against ``webdataset_manifest.json``:
    byte-level tar md5 + sample counts (distinct keys per shard).
    Returns human-readable discrepancies (empty = verified) — the
    loader's trust check, and byte-determinism makes it double as the
    re-run's reproducibility proof."""
    import hashlib

    with open(os.path.join(out_dir, "webdataset_manifest.json")) as f:
        manifest = json.load(f)
    errs: list[str] = []
    data_dir = os.path.join(out_dir, "data")
    found = {n for n in os.listdir(data_dir) if n.endswith(".tar")}
    want = manifest["shards"]
    for name in sorted(set(want) | found):
        if name not in found:
            errs.append(f"{name}: missing from data")
            continue
        if name not in want:
            errs.append(f"{name}: not in manifest")
            continue
        with open(os.path.join(data_dir, name), "rb") as fh:
            blob = fh.read()
        if hashlib.md5(blob).hexdigest() != want[name]["tar_md5"]:
            errs.append(f"{name}: tar md5 mismatch")
        if len(blob) != want[name]["tar_bytes"]:
            errs.append(f"{name}: size {len(blob)} != {want[name]['tar_bytes']}")
    got_samples = (
        read_webdataset(spark, out_dir)
        .select("shard_file", "key")
        .distinct()
        .groupBy("shard_file")
        .count()
        .collect()
    )
    for r in got_samples:
        w = want.get(r["shard_file"])
        if w is not None and w["n_samples"] != r["count"]:
            errs.append(
                f"{r['shard_file']}: {r['count']} samples != "
                f"{w['n_samples']} in manifest"
            )
    return errs
