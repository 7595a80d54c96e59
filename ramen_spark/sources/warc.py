"""WARC / JSONL crawl-corpus sources — where a training-data pipeline
actually starts (Common Crawl ships WARC; curated dumps ship JSONL).

Training-pipeline extension (no reference counterpart; the nearest
reference surface is the external-format readers,
/root/reference/src/raql_operation.type:54-138). Dependency-free:
WARC (ISO 28500) is plain \\r\\n-delimited headers + a counted
payload, parsed here with stdlib only.

100 TB shape: WARC files are the parallel unit — Common Crawl ships
~64 k files of ~1 GB per snapshot, so file-level parallelism saturates
any cluster (the standard practice: WARC is not splittable mid-file,
and gzip members make even record-level splitting moot; Spark's
``binaryFile`` source distributes whole files). Record splitting and
header parsing run inside an Arrow-batched ``mapInPandas`` — one pass
per file, emitting one row per record with the payload as a binary
column (the multimodal column convention, operators/multimodal.py).
JSONL is Spark's native json source — splittable, pushdown-friendly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "file string, record_offset long, warc_type string, url string, "
    "warc_date string, content_type string, payload binary, n_bytes long"
)


def _parse_warc_bytes(
    name: str, blob: bytes
) -> Iterator[tuple[str, int, str, str, str, str, bytes, int]]:
    """Walk one (uncompressed or gzip) WARC file: yield one tuple per
    record. Tolerant of trailing garbage and truncated tails — a crawl
    pipeline must skip a bad record, not fail the file."""
    import gzip
    import io

    if blob[:2] == b"\x1f\x8b":
        # gzip (possibly multi-member, the Common Crawl layout);
        # GzipFile reads across members transparently
        try:
            blob = gzip.GzipFile(fileobj=io.BytesIO(blob)).read()
        except OSError:
            return
    pos = 0
    n = len(blob)
    while pos < n:
        head_start = blob.find(b"WARC/", pos)
        if head_start < 0:
            return
        head_end = blob.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # unparseable record: resync at the next header
            pos = head_end + 4
            continue
        body_start = head_end + 4
        if body_start + length > n:
            # truncated tail: the declared length overruns the file —
            # partial content is worse than none, drop the record
            return
        payload = blob[body_start : body_start + length]
        yield (
            name,
            head_start,
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            headers.get("content-type", ""),
            payload,
            len(payload),
        )
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → one row per record
    (file, record_offset, warc_type, url, warc_date, content_type,
    payload, n_bytes). Files distribute via ``binaryFile``; parsing is
    an Arrow-batched mapInPandas over whole files."""
    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "file",
            "record_offset",
            "warc_type",
            "url",
            "warc_date",
            "content_type",
            "payload",
            "n_bytes",
        ]
        for pdf in batches:
            rows = [
                rec
                for name, blob in zip(pdf["path"], pdf["content"])
                for rec in _parse_warc_bytes(name, bytes(blob))
            ]
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_to_documents(warc: DataFrame, id_offset: int = 0) -> DataFrame:
    """HTTP response records → the documents-table shape
    (doc_id, text, lang, source, n_chars): strip the HTTP header
    block, decode utf-8 (errors replaced), crude-strip markup. The
    doc_id is a deterministic function of (file, record_offset) — the
    stable identity a re-crawl diff keys on; language detection and
    quality scoring compose downstream (functions.text), exactly like
    the synthetic documents table. All row-local JVM expressions
    after the decode — no shuffle."""
    staged = warc.filter(
        (F.col("warc_type") == "response")
        | F.col("content_type").startswith("text/")
    ).select(
        "file",
        "record_offset",
        "url",
        # decode ONCE per row; downstream expressions reference the
        # staged attribute (the CollapseProject rule — an inlined
        # decode would re-run per consumer expression). NOT F.decode:
        # Spark 4's decode THROWS on malformed UTF-8
        # (MALFORMED_CHARACTER_CODING) and real crawls are full of it
        # — a binary→string cast reinterprets without validating, and
        # make_valid_utf8 replaces invalid sequences with U+FFFD, so a
        # bad byte degrades one document instead of failing the job
        F.expr("make_valid_utf8(CAST(payload AS STRING))").alias("_txt"),
    )
    # payload of a response record = HTTP headers \r\n\r\n entity body
    loc = F.locate("\r\n\r\n", F.col("_txt"))
    entity = F.when(
        loc > 0, F.col("_txt").substr(loc + 4, F.length("_txt"))
    ).otherwise(F.col("_txt"))
    stripped = F.trim(
        F.regexp_replace(
            F.regexp_replace(entity, r"<[^>]*>", " "), r"\s+", " "
        )
    )
    return (
        staged.select(
            (
                F.abs(F.xxhash64("file", "record_offset")) + F.lit(id_offset)
            ).alias("doc_id"),
            stripped.alias("text"),
            F.lit(None).cast("string").alias("lang"),
            F.col("url").alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .filter(F.col("n_chars") > 0)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSONL corpus source: Spark's native, splittable json reader —
    schema mandatory in production paths (inference scans the data
    twice), permissive mode with a corrupt-record column so a bad
    line degrades to one null row, never a failed file."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
