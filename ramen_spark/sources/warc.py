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

Per-task memory ceiling: ``binaryFile`` materializes the COMPRESSED
file bytes in the task (~1 GB for a Common Crawl shard); decompression
and record walking are streaming (``_iter_warc_records`` holds
O(largest record + 1 MiB chunk) beyond that — measured by the
tracemalloc assertion in tests/test_sources.py, ~2 MiB peak while
walking a 200 MB uncompressed stream). So resident ≈ compressed size
+ largest record, NOT compressed + fully-decompressed (a 4-5× blowup
that, at 32 concurrent 1 GB tasks, would exceed executor memory).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "file string, record_offset long, warc_type string, url string, "
    "warc_date string, content_type string, payload binary, n_bytes long"
)

_CHUNK = 1 << 20  # streaming read granularity
_MAX_HEADER = 64 << 10  # resync past anything claiming a bigger header block
# Largest Content-Length this walker will buffer. Real crawl records top
# out well under this (Common Crawl caps page payloads at 1 MiB; the
# largest records are the rare media responses). A corrupt or hostile
# header claiming more would otherwise make the fill loop buffer the
# whole remaining uncompressed stream — an executor-OOM vector at
# crawl scale — so anything above the cap is treated like an
# unparseable header: resync past the magic and keep walking, which
# also preserves every valid record after the bad one.
_MAX_RECORD = 256 << 20


def _iter_warc_records(
    name: str, fobj
) -> Iterator[tuple[str, int, str, str, str, str, bytes, int]]:
    """Walk a WARC byte stream (any binary file-like, e.g. a streaming
    ``gzip.GzipFile``): yield one tuple per record. Resident memory is
    O(largest record + chunk) — the stream is NEVER fully buffered.
    Tolerant of leading/trailing garbage, unparseable records, corrupt
    gzip tails, truncation, and hostile Content-Length headers (capped
    at ``_MAX_RECORD`` — an over-cap claim resyncs past the magic
    instead of buffering the rest of the stream) — a crawl pipeline
    must skip a bad record (keeping everything parsed before AND after
    it), not fail the file.
    ``record_offset`` is the byte offset of the record header in the
    (uncompressed) stream, the stable replay coordinate."""
    buf = bytearray()
    base = 0  # absolute stream offset of buf[0]
    eof = False

    def fill() -> None:
        nonlocal eof
        try:
            chunk = fobj.read(_CHUNK)
        except OSError:
            # corrupt gzip mid-stream: keep the records already walked
            chunk = b""
        if chunk:
            buf.extend(chunk)
        else:
            eof = True

    while True:
        start = buf.find(b"WARC/")
        while start < 0 and not eof:
            if len(buf) > 4:
                # "WARC/" may straddle a chunk edge — keep 4 bytes
                base += len(buf) - 4
                del buf[: len(buf) - 4]
            fill()
            start = buf.find(b"WARC/")
        if start < 0:
            return
        if start:
            base += start
            del buf[:start]
        head_end = buf.find(b"\r\n\r\n")
        while head_end < 0 and not eof and len(buf) <= _MAX_HEADER:
            fill()
            head_end = buf.find(b"\r\n\r\n")
        if head_end < 0:
            if eof:
                return
            # oversized garbage "header": resync past the magic
            base += 5
            del buf[:5]
            continue
        headers: dict[str, str] = {}
        for line in bytes(buf[:head_end]).split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # unparseable record: resync at the next header
            base += head_end + 4
            del buf[: head_end + 4]
            continue
        if length > _MAX_RECORD:
            # hostile/corrupt Content-Length: buffering it would defeat
            # the O(largest record) bound. Resync past THIS record's
            # magic (not past the header — the "header" itself is
            # suspect) so records after the bad one still parse.
            base += 5
            del buf[:5]
            continue
        body_start = head_end + 4
        while len(buf) < body_start + length and not eof:
            fill()
        if len(buf) < body_start + length:
            # truncated tail: the declared length overruns the stream —
            # partial content is worse than none, drop the record
            return
        payload = bytes(buf[body_start : body_start + length])
        yield (
            name,
            base,
            headers.get("warc-type", ""),
            headers.get("warc-target-uri", ""),
            headers.get("warc-date", ""),
            headers.get("content-type", ""),
            payload,
            len(payload),
        )
        base += body_start + length
        del buf[: body_start + length]


def _parse_warc_bytes(
    name: str, blob: bytes
) -> Iterator[tuple[str, int, str, str, str, str, bytes, int]]:
    """One (uncompressed or gzip) WARC file held as bytes → record
    tuples. Decompression is streaming (``GzipFile`` reads member by
    member across the Common Crawl multi-member layout), so resident
    memory beyond the compressed blob is O(record), never the full
    uncompressed size."""
    import gzip
    import io

    raw = io.BytesIO(blob)
    fobj = gzip.GzipFile(fileobj=raw) if blob[:2] == b"\x1f\x8b" else raw
    yield from _iter_warc_records(name, fobj)


def _records_of(files: DataFrame) -> DataFrame:
    """(path, content) rows → WARC record rows via the Arrow-batched
    record walk. Shared by the batch and streaming readers — the
    mapInPandas stage is source-agnostic."""
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

    return files.mapInPandas(parse, WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → one row per record
    (file, record_offset, warc_type, url, warc_date, content_type,
    payload, n_bytes). Files distribute via ``binaryFile``; parsing is
    an Arrow-batched mapInPandas over whole files."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _records_of(files)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """The always-on twin of read_warc: watch ``path`` (a directory or
    glob) as a Structured Streaming ``binaryFile`` source — each newly
    arriving crawl file becomes a micro-batch of WARC records through
    the SAME record-walk mapInPandas (_records_of is source-agnostic).
    Record rows are independent and doc ids are content-addressed
    (xxhash64 of file+offset), so the streamed output equals the batch
    read of the same files row-for-row
    (test_warc_stream_equals_batch); downstream, warc_to_documents and
    the curation lane (streaming/curation.py) compose unchanged — the
    complete always-on crawl front door."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .load(path)
        .select("path", "content")
    )
    return _records_of(files)


# <script>/<style> elements' CONTENTS are code, not text — they must be
# removed as whole blocks (with comments) BEFORE the tag strip, or the
# "extracted text" of any real crawl page is full of JavaScript/CSS
# that poisons every downstream operator (quality score, language id,
# shingles, the classifier's features). Case-insensitive, dotall,
# non-greedy to the matching close tag.
_BLOCK_STRIP = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->"


def warc_to_documents(warc: DataFrame, id_offset: int = 0) -> DataFrame:
    """Content records → the documents-table shape
    (doc_id, text, lang, source, n_chars). Keeps ``response`` records
    (raw HTTP captures: strip the HTTP header block, then drop
    script/style/comment BLOCKS, then tags) and ``conversion`` records
    (pre-extracted text, the Common Crawl WET layout: no HTTP header
    block to strip — stripping is gated on warc_type). Other record
    types (warcinfo, request, resource, metadata) are not documents
    regardless of their content type. The doc_id is the full signed
    64-bit xxhash64 of (file, record_offset, id_offset) — no abs():
    halving the hash space to 63 bits yields expected collisions at
    Common Crawl scale (~10^10 records), and abs(Long.MIN_VALUE)
    throws under ANSI. ``id_offset`` salts the hash to separate
    ingest generations (residual cross-generation collision odds are
    the birthday bound at 64 bits, ~3·10^-9 per pair of 10^10-record
    snapshots). Language detection and quality scoring compose
    downstream (functions.text), exactly like the synthetic documents
    table. All row-local JVM expressions after the decode — no
    shuffle."""
    staged = warc.filter(
        F.col("warc_type").isin("response", "conversion")
    ).select(
        "file",
        "record_offset",
        "warc_type",
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
    # response payload = HTTP headers \r\n\r\n entity body; conversion
    # payload is already the text — no header block to cut
    loc = F.locate("\r\n\r\n", F.col("_txt"))
    entity = F.when(
        (F.col("warc_type") == "response") & (loc > 0),
        F.col("_txt").substr(loc + 4, F.length("_txt")),
    ).otherwise(F.col("_txt"))
    stripped = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(entity, _BLOCK_STRIP, " "),
                r"<[^>]*>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    return (
        staged.select(
            F.xxhash64("file", "record_offset", F.lit(id_offset)).alias(
                "doc_id"
            ),
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
