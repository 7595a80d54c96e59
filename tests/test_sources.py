"""CSV option surface + archive/replay/retention round-trips."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ramen_spark.sources.archive import archive, enforce_retention, replay
from ramen_spark.sources.csv import parse_clickhouse_array, read_csv


def test_read_csv_raql_defaults(spark, tmp_path):
    # RaQL defaults: comma sep, empty string = NULL, no quoting
    p = tmp_path / "in.csv"
    p.write_text('1,alice,3.5\n2,,4.25\n3,"quoted",0\n')
    df = read_csv(spark, str(p), "id long, name string, score double")
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows[1] == ("alice", 3.5)
    assert rows[2] == (None, 4.25)  # empty → NULL
    assert rows[3][0] == '"quoted"'  # quoting off by default


def test_read_csv_custom_separator_and_quotes(spark, tmp_path):
    p = tmp_path / "in.tsv"
    p.write_text('1\t"a\tb"\n2\tplain\n')
    df = read_csv(spark, str(p), "id long, s string", separator="\t", may_quote=True)
    rows = {r["id"]: r["s"] for r in df.collect()}
    assert rows[1] == "a\tb" and rows[2] == "plain"


def test_clickhouse_array_cells(spark, tmp_path):
    # ClickHouse emits arrays in TSV (bracket cells would collide with
    # a comma separator)
    p = tmp_path / "arr.tsv"
    p.write_text("1\t[1,2,3]\n2\t[]\n")
    df = read_csv(spark, str(p), "id long, xs string", separator="\t", clickhouse_syntax=True)
    out = df.select("id", parse_clickhouse_array(F.col("xs")).alias("xs")).collect()
    m = {r["id"]: r["xs"] for r in out}
    assert m[1] == [1, 2, 3] and m[2] == []


def test_archive_replay_retention(spark, tmp_path):
    path = str(tmp_path / "arch")
    # 10 days of hourly events
    df = spark.range(240).select(
        (F.col("id") * 3600.0).alias("start"),
        (F.col("id") % 3).cast("string").alias("factor"),
        F.col("id").cast("double").alias("v"),
    )
    archive(df, path, time_col="start", factors=["factor"])

    # replay a 1-day slice
    sl = replay(spark, path, 86400.0, 2 * 86400.0, time_col="start")
    assert sl.count() == 24
    assert sl.agg(F.min("start")).collect()[0][0] == 86400.0

    # partition pruning visible in the plan
    plan = sl._jdf.queryExecution().executedPlan().toString()
    assert "dt" in plan

    # retention: keep last 3 days from t=10d
    removed = enforce_retention(path, 3 * 86400, 10 * 86400.0)
    assert len(removed) == 7
    left = spark.read.parquet(path)
    assert left.agg(F.min("dt")).collect()[0][0] == 7


def test_archive_orc_roundtrip(spark, tmp_path):
    """format="orc" (src/RamenOrc.ml — the reference's archive format):
    same partition layout, retention, replay, and schema fidelity as
    Parquet; replay auto-detects the format from the data files."""
    path = str(tmp_path / "arch_orc")
    df = spark.range(240).select(
        (F.col("id") * 3600.0).alias("start"),
        (F.col("id") % 3).cast("string").alias("factor"),
        F.col("id").cast("double").alias("v"),
        F.array(F.col("id").cast("int")).alias("vec"),
        F.struct(F.col("id").alias("a"), F.lit("s").alias("b")).alias("rec"),
    )
    archive(df, path, time_col="start", factors=["factor"], format="orc")

    sl = replay(spark, path, 86400.0, 2 * 86400.0, time_col="start")
    assert sl.count() == 24
    assert sl.agg(F.min("start")).collect()[0][0] == 86400.0
    # compound types round-trip
    row = sl.orderBy("start").limit(1).collect()[0]
    assert row["vec"] == [24] and row["rec"]["b"] == "s"

    removed = enforce_retention(path, 3 * 86400, 10 * 86400.0)
    assert len(removed) == 7
    left = spark.read.orc(path)
    assert left.agg(F.min("dt")).collect()[0][0] == 7


def _warc_record(wtype, url, body: bytes, content_type="application/http") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def test_warc_source_parses_records_and_documents(spark, tmp_path):
    """WARC fixture (warcinfo + request + response + one TRUNCATED
    tail record) through read_warc → one row per intact record with
    the right payloads — and warc_to_documents keeps only the
    response, strips the HTTP header block + markup, and derives a
    deterministic id. The gzip twin of the same file parses
    identically (the Common Crawl layout)."""
    import gzip

    from ramen_spark.sources.warc import read_warc, warc_to_documents

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><body>Hello <b>crawl</b> world</body></html>"
    )
    blob = (
        _warc_record("warcinfo", "", b"robots: classic\r\n")
        + _warc_record("request", "http://x.test/", b"GET / HTTP/1.1\r\n")
        + _warc_record("response", "http://x.test/", http)
        + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\ntrunc"
    )
    plain = tmp_path / "a.warc"
    plain.write_bytes(blob)
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(gzip.compress(blob))

    recs = read_warc(spark, str(plain)).collect()
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2]["url"] == "http://x.test/"
    assert bytes(recs[2]["payload"]) == http
    # the truncated tail record parses as a short payload, not a crash
    assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in recs)

    docs = warc_to_documents(read_warc(spark, str(plain))).collect()
    assert len(docs) == 1
    assert docs[0]["text"] == "Hello crawl world"
    assert docs[0]["source"] == "http://x.test/"
    assert docs[0]["n_chars"] == 17  # full signed-64 doc_id, any sign

    gz_recs = read_warc(spark, str(gz)).collect()
    assert [bytes(r["payload"]) for r in gz_recs] == [
        bytes(r["payload"]) for r in recs
    ]


def test_warc_documents_strip_script_style_blocks(spark, tmp_path):
    """A real crawl page is mostly <script>/<style>/<!-- --> by bytes;
    their CONTENTS are code, not text. warc_to_documents must remove
    those blocks wholesale BEFORE the tag strip — tag-only stripping
    leaves the JavaScript/CSS in the 'text' and poisons every
    downstream operator (quality score, language id, shingles)."""
    from ramen_spark.sources.warc import read_warc, warc_to_documents

    page = (
        b"<!DOCTYPE html><html><head>\n"
        b"<title>Example Domain</title>\n"
        b"<STYLE type='text/css'>\nbody { background: #fafafa;\n"
        b"font-family: sans-serif; }\n.hidden { display: none }\n</STYLE>\n"
        b'<script src="/a.js"></script>\n'
        b"<script>\nvar gaq = window.gaq || [];\n"
        b"function track(ev) { console.log(ev); }\ntrack('pv');\n</script>\n"
        b"</head><body>\n<!-- nav boilerplate\nspanning lines -->\n"
        b"<h1>Example Domain</h1>\n"
        b"<p>This domain is for use in <b>illustrative</b> examples.</p>\n"
        b"<script>\nwindow.onload = function() { track('load'); };\n"
        b"</script>\n</body></html>"
    )
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + page
    f = tmp_path / "page.warc"
    f.write_bytes(_warc_record("response", "http://ex.test/", http))

    [doc] = warc_to_documents(read_warc(spark, str(f))).collect()
    text = doc["text"]
    # every fragment of JS/CSS/comment must be gone…
    for noise in (
        "background",
        "font-family",
        "display: none",
        "gaq",
        "function",
        "console.log",
        "track",
        "window.onload",
        "boilerplate",
    ):
        assert noise not in text, (noise, text)
    # …and the human text must survive
    assert "Example Domain" in text
    assert "This domain is for use in illustrative examples." in text


def test_warc_documents_record_type_filter(spark, tmp_path):
    """Only response (raw HTTP) and conversion (pre-extracted text, the
    WET layout) records are documents. A warcinfo record with a text/*
    content type must NOT leak through, and a conversion record must
    not have its leading text mangled by the HTTP-header strip (it has
    no HTTP header block)."""
    from ramen_spark.sources.warc import read_warc, warc_to_documents

    # conversion payload that CONTAINS \r\n\r\n — a header-strip
    # misapplied here would delete the first paragraph
    wet = b"First paragraph of extracted text.\r\n\r\nSecond paragraph."
    blob = (
        _warc_record("warcinfo", "", b"software: test\r\n", "text/plain")
        + _warc_record("metadata", "http://x.test/", b"notes", "text/plain")
        + _warc_record("conversion", "http://x.test/wet", wet, "text/plain")
    )
    f = tmp_path / "wet.warc"
    f.write_bytes(blob)

    docs = warc_to_documents(read_warc(spark, str(f))).collect()
    assert len(docs) == 1
    assert docs[0]["source"] == "http://x.test/wet"
    assert docs[0]["text"].startswith("First paragraph")
    assert "Second paragraph." in docs[0]["text"]


def test_warc_streaming_parse_bounded_memory():
    """The record walk must hold O(record), not O(file): a 200 MB
    uncompressed stream (gzip'd ~1000:1, highly compressible on
    purpose) is parsed with a tracemalloc peak under 16 MiB — the
    whole-file gunzip it replaces would allocate the full 200 MB.
    At Common Crawl scale (1 GB .gz ≈ 4-5 GB text, 32 concurrent
    tasks) that difference is the executor's life."""
    import gzip
    import io
    import tracemalloc

    from ramen_spark.sources.warc import _parse_warc_bytes

    n_rec, body_len = 200, 1_000_000  # 200 MB uncompressed
    body = b"a" * body_len
    chunks = []
    for i in range(n_rec):
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: http://m.test/{i}\r\n"
            f"Content-Length: {body_len}\r\n\r\n"
        ).encode()
        chunks.append(head + body + b"\r\n\r\n")
    blob = gzip.compress(b"".join(chunks), compresslevel=1)
    assert len(blob) < 5_000_000  # the compressed blob itself is small

    tracemalloc.start()
    seen = 0
    for rec in _parse_warc_bytes("m.warc.gz", blob):
        assert rec[7] == body_len
        seen += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert seen == n_rec
    assert peak < 16 * 1024 * 1024, f"peak {peak/1e6:.1f} MB — not streaming"


def test_warc_hostile_content_length_is_skipped_and_bounded():
    """A corrupt/hostile Content-Length (petabyte claim) must NOT make
    the walker buffer the rest of the stream before giving up — it
    resyncs past the bad record's magic with O(chunk) memory — and the
    VALID records after the bad one must survive (a fill-to-EOF bail
    would silently drop them all)."""
    import tracemalloc

    from ramen_spark.sources.warc import _parse_warc_bytes

    good_before = _warc_record("response", "http://ok.test/1", b"before" * 10)
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://evil.test/\r\n"
        b"Content-Length: 1000000000000000\r\n\r\n"
        + b"x" * 100_000  # "payload" far short of the claim
        + b"\r\n\r\n"
    )
    good_after = [
        _warc_record("response", f"http://ok.test/{i}", b"after" * 10)
        for i in range(2, 52)
    ]
    blob = good_before + bad + b"".join(good_after)

    tracemalloc.start()
    recs = list(_parse_warc_bytes("h.warc", blob))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    urls = [r[3] for r in recs]
    assert "http://evil.test/" not in urls
    assert "http://ok.test/1" in urls
    # every record AFTER the hostile one survives the resync
    assert all(f"http://ok.test/{i}" in urls for i in range(2, 52))
    # and nothing resembling a petabyte was buffered
    assert peak < 16 * 1024 * 1024, f"peak {peak/1e6:.1f} MB"


def test_jsonl_source_permissive(spark, tmp_path):
    """JSONL reader: schema-mandatory path, one corrupt line degrades
    to a row with the corrupt column set — never a failed file."""
    from ramen_spark.sources.warc import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "beta"}\n'
    )
    df = read_jsonl(
        spark, str(p), "doc_id long, text string, _corrupt string"
    )
    rows = df.collect()
    assert len(rows) == 3
    good = {r["doc_id"]: r["text"] for r in rows if r["_corrupt"] is None}
    assert good == {1: "alpha", 2: "beta"}
    assert sum(1 for r in rows if r["_corrupt"] is not None) == 1


def test_warc_documents_compose_with_text_pipeline(spark, tmp_path):
    """The crawl entry point composes: read_warc → warc_to_documents
    rows run straight through the text operators (language id, quality
    score, gopher flags) — the documents-table contract (doc_id, text,
    lang, source, n_chars) is honored end-to-end, so a user points the
    pipeline at WARC instead of parquet and nothing else changes."""
    from pyspark.sql import functions as F

    from ramen_spark.functions.text import detect_language, quality_score
    from ramen_spark.sources.warc import read_warc, warc_to_documents

    body = (
        "<p>"
        + " ".join("the quick brown fox jumps over the lazy dog" for _ in range(12))
        + "</p>"
    ).encode()
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    blob = _warc_record("response", "http://en.test/a", http) + _warc_record(
        "response", "http://en.test/b", http + b" extra tail words here"
    )
    f = tmp_path / "c.warc"
    f.write_bytes(blob)

    docs = warc_to_documents(read_warc(spark, str(f)))
    scored = docs.select(
        "doc_id",
        "source",
        detect_language(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        "n_chars",
    ).collect()
    assert len(scored) == 2
    assert {r["source"] for r in scored} == {
        "http://en.test/a",
        "http://en.test/b",
    }
    assert all(r["lang"] == "en" for r in scored)
    assert all(0.0 <= r["q"] <= 1.0 for r in scored)
    assert len({r["doc_id"] for r in scored}) == 2  # distinct stable ids


def test_export_shards_manifest_roundtrip_and_tamper(spark, tmp_path):
    """Final-mile export: packed rows land partitioned by shard with a
    manifest whose per-shard counts + order-independent content hashes
    verify clean on readback — and a tampered copy (one shard's rows
    dropped) is caught by verify_export."""
    import shutil

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    from ramen_spark.catalog import load_table
    from ramen_spark.operators.packing import pack_sequences
    from ramen_spark.sources.export import export_shards, verify_export

    docs = load_table(spark, SF_SMALL, "documents")
    packed = pack_sequences(docs, budget=512, shards=4)
    out = str(tmp_path / "corpus")
    manifest = export_shards(packed, out, shard_col="shard")
    assert manifest["total_rows"] == packed.count()
    assert len(manifest["shards"]) == 4
    assert verify_export(spark, out) == []

    # tamper: drop one shard's files entirely
    victim = sorted(manifest["shards"])[0]
    shutil.rmtree(str(tmp_path / "corpus" / "data" / f"shard={victim}"))
    errs = verify_export(spark, out)
    assert any(victim in e for e in errs), errs


def test_export_content_hash_no_ansi_overflow_at_scale(spark):
    """A realistic shard is >>2^15 rows; the manifest's content hash
    must not overflow a signed long mid-sum (Spark 4 ANSI mode throws
    ARITHMETIC_OVERFLOW, observed empirically at 200k rows with a
    plain long sum). The decimal(38,0) accumulator + mod-2^61-1
    reduction stays exact, fits a long, and is partition-order
    independent."""
    from pyspark.sql import functions as F

    from ramen_spark.sources.export import _shard_stats

    df = spark.range(300_000).select(
        F.lit(0).alias("shard"), F.col("id").alias("doc_id")
    )
    row = _shard_stats(df, "shard", "doc_id").collect()[0]
    assert row["n_rows"] == 300_000
    assert 0 <= row["content_sum"] < (1 << 61) - 1
    # same multiset under a different partitioning → same hash
    row2 = _shard_stats(df.repartition(17), "shard", "doc_id").collect()[0]
    assert row2["content_sum"] == row["content_sum"]


def test_warc_documents_survive_malformed_utf8(spark, tmp_path):
    """Real crawls carry broken encodings: a response whose body has
    invalid UTF-8 bytes must degrade to replacement characters in that
    ONE document (never fail the job — Spark 4's decode() throws
    MALFORMED_CHARACTER_CODING, which is why warc_to_documents uses
    cast + make_valid_utf8 instead)."""
    from ramen_spark.sources.warc import read_warc, warc_to_documents

    bad = (
        b"HTTP/1.1 200 OK\r\n\r\nok text "
        + bytes([0xFF, 0xFE, 0x80])
        + b" more"
    )
    good = b"HTTP/1.1 200 OK\r\n\r\nclean body here"
    blob = _warc_record("response", "http://a.test/", bad) + _warc_record(
        "response", "http://b.test/", good
    )
    f = tmp_path / "bad.warc"
    f.write_bytes(blob)
    docs = {
        r["source"]: r["text"]
        for r in warc_to_documents(read_warc(spark, str(f))).collect()
    }
    assert docs["http://b.test/"] == "clean body here"
    assert "ok text" in docs["http://a.test/"]
    assert "more" in docs["http://a.test/"]


def test_warc_stream_equals_batch(spark, tmp_path):
    """read_warc_stream: three crawl files arriving as separate
    micro-batches through the binaryFile streaming source +
    warc_to_documents must equal the batch read of the same directory
    row-for-row — the always-on crawl front door's parity contract."""
    from ramen_spark.sources.warc import (
        read_warc,
        read_warc_stream,
        warc_to_documents,
    )

    src = tmp_path / "crawl"
    src.mkdir()
    for i in range(3):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body>Page body number %d with enough words"
            b" to survive</body></html>" % i
        )
        blob = _warc_record("response", f"http://s{i}.test/", http)
        (src / f"f{i}.warc").write_bytes(blob)

    batch = {
        tuple(r)
        for r in warc_to_documents(
            read_warc(spark, str(src) + "/*.warc")
        ).collect()
    }
    assert len(batch) == 3

    stream = read_warc_stream(spark, str(src) + "/*.warc")
    assert stream.isStreaming
    out = tmp_path / "docs_out"
    q = (
        warc_to_documents(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("maxFilesPerTrigger", "1")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.read.parquet(str(out)).collect()}
    assert got == batch


# ---------------------------------------------------------------------------
# WebDataset tar shards
# ---------------------------------------------------------------------------


def _wds_fixture(spark):
    from ramen_spark.operators.multimodal import synthetic_wav_bytes

    rows = [
        (
            f"doc{i:04d}",
            synthetic_wav_bytes(seconds=0.02, freq=200.0 + 10 * i),
            f'{{"lang": "l{i % 3}", "idx": {i}}}',
        )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "key string, payload binary, meta string"
    )


def test_webdataset_roundtrip_and_byte_determinism(spark, tmp_path):
    """write → read reproduces every member byte-for-byte; a re-run
    writes BYTE-IDENTICAL shards (normalized tar headers + key-sorted
    members + md5 shard assignment), so the manifest's tar md5 is a
    trustworthy content hash."""
    from ramen_spark.sources.export import (
        read_webdataset,
        verify_webdataset,
        write_webdataset,
    )

    df = _wds_fixture(spark)
    out = str(tmp_path / "wds")
    man = write_webdataset(
        df, out, "key", {"payload": "wav", "meta": "json"}, n_shards=4
    )
    assert man["total_samples"] == 40
    assert len(man["shards"]) <= 4 and sum(
        s["n_samples"] for s in man["shards"].values()
    ) == 40

    back = read_webdataset(spark, out)
    got = {
        (r["key"], r["ext"]): bytes(r["data"]) for r in back.collect()
    }
    for r in df.collect():
        assert got[(r["key"], "wav")] == bytes(r["payload"])
        assert got[(r["key"], "json")] == r["meta"].encode()
    assert verify_webdataset(spark, out) == []

    # re-run (different partitioning) → byte-identical shards
    out2 = str(tmp_path / "wds2")
    man2 = write_webdataset(
        df.repartition(13), out2, "key",
        {"payload": "wav", "meta": "json"}, n_shards=4,
    )
    assert {k: v["tar_md5"] for k, v in man2["shards"].items()} == {
        k: v["tar_md5"] for k, v in man["shards"].items()
    }


def test_webdataset_verify_detects_tamper(spark, tmp_path):
    from ramen_spark.sources.export import verify_webdataset, write_webdataset

    df = _wds_fixture(spark)
    out = str(tmp_path / "wds")
    write_webdataset(df, out, "key", {"payload": "wav"}, n_shards=2)
    assert verify_webdataset(spark, out) == []
    import os

    data = os.path.join(out, "data")
    victim = sorted(n for n in os.listdir(data) if n.endswith(".tar"))[0]
    with open(os.path.join(data, victim), "r+b") as fh:
        fh.seek(600)
        fh.write(b"XX")
    errs = verify_webdataset(spark, out)
    assert any("md5 mismatch" in e for e in errs)


def test_webdataset_validates_inputs(spark, tmp_path):
    from ramen_spark.sources.export import write_webdataset

    df = _wds_fixture(spark)
    with pytest.raises(ValueError, match="member_cols"):
        write_webdataset(df, str(tmp_path / "x"), "key", {})
    with pytest.raises(ValueError, match="not in df"):
        write_webdataset(df, str(tmp_path / "x"), "key", {"nope": "bin"})
    with pytest.raises(ValueError, match="n_shards"):
        write_webdataset(df, str(tmp_path / "x"), "key", {"payload": "wav"},
                         n_shards=0)


def test_webdataset_rejects_null_dup_and_memberless_keys(spark, tmp_path):
    from ramen_spark.sources.export import write_webdataset

    base = _wds_fixture(spark)
    null_key = base.unionByName(
        base.limit(1).selectExpr(
            "CAST(NULL AS STRING) AS key", "payload", "meta"
        )
    )
    with pytest.raises(Exception, match="NULL"):
        write_webdataset(null_key, str(tmp_path / "a"), "key",
                         {"payload": "wav"}, n_shards=2)
    dup = base.unionByName(base.limit(1))
    with pytest.raises(Exception, match="duplicate"):
        write_webdataset(dup, str(tmp_path / "b"), "key",
                         {"payload": "wav"}, n_shards=2)
    memberless = base.unionByName(
        base.limit(1).selectExpr(
            "'zzz-hollow' AS key", "CAST(NULL AS BINARY) AS payload",
            "CAST(NULL AS STRING) AS meta",
        )
    )
    with pytest.raises(Exception, match="member column NULL"):
        write_webdataset(memberless, str(tmp_path / "c"), "key",
                         {"payload": "wav", "meta": "json"}, n_shards=2)


def test_webdataset_reexport_purges_stale_shards(spark, tmp_path):
    """Re-exporting into the same directory with fewer shards must not
    leave stale tars for read_webdataset's glob to silently mix in
    (review fix)."""
    import os

    from ramen_spark.sources.export import (
        read_webdataset,
        verify_webdataset,
        write_webdataset,
    )

    df = _wds_fixture(spark)
    out = str(tmp_path / "wds")
    write_webdataset(df, out, "key", {"payload": "wav"}, n_shards=8)
    half = df.filter("key < 'doc0020'")
    man = write_webdataset(half, out, "key", {"payload": "wav"}, n_shards=2)
    on_disk = {
        n for n in os.listdir(os.path.join(out, "data")) if n.endswith(".tar")
    }
    assert on_disk == set(man["shards"])
    assert read_webdataset(spark, out).select("key").distinct().count() == 20
    assert verify_webdataset(spark, out) == []


def test_webdataset_streaming_writer_matches_bytesio(spark, tmp_path):
    """The round-11 streaming tar writer (incremental md5, no
    whole-shard BytesIO) must produce BYTE-IDENTICAL tars to the
    straightforward in-memory construction — same member order, same
    normalized headers."""
    import hashlib
    import io
    import json as _json
    import tarfile

    from ramen_spark.sources.export import write_webdataset

    df = _wds_fixture(spark)
    out = str(tmp_path / "wds")
    man = write_webdataset(
        df, out, "key", {"payload": "wav", "meta": "json"}, n_shards=1
    )
    # reference construction: the pre-round-11 whole-shard BytesIO
    rows = sorted(df.collect(), key=lambda r: r["key"])
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for r in rows:
            for col, ext in (("meta", "json"), ("payload", "wav")):
                payload = (
                    bytes(r[col]) if col == "payload"
                    else r[col].encode("utf-8")
                )
                info = tarfile.TarInfo(name=f"{r['key']}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(payload))
    blob = buf.getvalue()
    (stats,) = man["shards"].values()
    assert stats["tar_bytes"] == len(blob)
    assert stats["tar_md5"] == hashlib.md5(blob).hexdigest()


def test_webdataset_crash_safe_reexport(spark, tmp_path):
    """A failed re-export must leave the PREVIOUS generation (data +
    manifest) fully intact and readable (round-10 advisory: the old
    writer deleted shards before the job ran)."""
    import os

    from ramen_spark.sources.export import (
        verify_webdataset,
        write_webdataset,
    )

    df = _wds_fixture(spark)
    out = str(tmp_path / "wds")
    man = write_webdataset(df, out, "key", {"payload": "wav"}, n_shards=4)

    # a re-export that fails MID-JOB (duplicate keys raise in-task)
    dup = df.unionByName(df.limit(1))
    with pytest.raises(Exception, match="duplicate"):
        write_webdataset(dup, out, "key", {"payload": "wav"}, n_shards=2)

    # old generation untouched, manifest still the old one, verify green
    import json as _json

    with open(os.path.join(out, "webdataset_manifest.json")) as f:
        assert _json.load(f)["shards"] == man["shards"]
    assert verify_webdataset(spark, out) == []

    # a later successful export reaps any crash leftovers
    write_webdataset(df, out, "key", {"payload": "wav"}, n_shards=2)
    leftovers = [n for n in os.listdir(out) if n.startswith(("data.next-",
                                                             "data.old-"))]
    assert leftovers == []
    assert verify_webdataset(spark, out) == []


def test_webdataset_rejects_dotted_extension(spark, tmp_path):
    """'.' in a member extension breaks the last-dot (key, ext) split
    convention — rejected at write time (round-10 advisory)."""
    from ramen_spark.sources.export import write_webdataset

    df = _wds_fixture(spark)
    with pytest.raises(ValueError, match="json.gz"):
        write_webdataset(df, str(tmp_path / "x"), "key",
                         {"meta": "json.gz"}, n_shards=2)
    with pytest.raises(ValueError, match="no '.' or '/'"):
        write_webdataset(df, str(tmp_path / "x"), "key",
                         {"meta": "a/b"}, n_shards=2)


def test_webdataset_dotted_keys_roundtrip(spark, tmp_path):
    """Sample keys containing dots (common: URLs, versioned ids) must
    survive the (key, ext) split — read_webdataset consults the
    manifest's known extensions instead of blindly splitting at the
    last dot."""
    from ramen_spark.sources.export import read_webdataset, write_webdataset

    rows = [(f"site.example.com/page.{i}", f"body {i}", '{"v": 1}')
            for i in range(6)]
    df = spark.createDataFrame(rows, "key string, body string, meta string")
    out = str(tmp_path / "wds")
    write_webdataset(df, out, "key", {"body": "txt", "meta": "json"},
                     n_shards=2)
    back = read_webdataset(spark, out).collect()
    keys = {r["key"] for r in back}
    assert keys == {r[0] for r in rows}
    assert {r["ext"] for r in back} == {"txt", "json"}


def test_export_shards_payload_tamper_detected(spark, tmp_path):
    """The manifest's payload_sum covers row VALUES: swapping two
    rows' text while keeping every id (which the id-only content_sum
    cannot see — round-10 'What's wrong' #2) must fail verification."""
    import os

    from pyspark.sql import functions as F

    from ramen_spark.sources.export import export_shards, verify_export

    df = spark.createDataFrame(
        [(i, i % 2, f"text-{i}") for i in range(100)],
        "doc_id long, shard int, text string",
    )
    out = str(tmp_path / "corpus")
    manifest = export_shards(df, out, shard_col="shard", id_col="doc_id")
    assert all("payload_sum" in s for s in manifest["shards"].values())
    assert verify_export(spark, out) == []

    # tamper: swap the text of two rows IN THE SAME SHARD, ids intact
    swapped = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("text-2"))
        .when(F.col("doc_id") == 2, F.lit("text-0"))
        .otherwise(F.col("text")),
    )
    swapped.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out, "data")
    )
    errs = verify_export(spark, out)
    assert errs, "content swap with intact ids must be detected"
    assert any("payload_sum" in e for e in errs), errs


def test_prepare_training_corpus_v2_export_integration(spark, tmp_path):
    """The v2 flagship's final mile is REAL: export_shards over the
    packed v2 corpus writes shards whose manifest (n_rows +
    content_sum + payload_sum per shard) equals the registered
    prepare_training_corpus_v2 rows exactly, and verify_export reads
    it back green — the integration seam between the composed
    pipeline and the verifiable-snapshot contract."""
    from tests.conftest import SF_SMALL

    from ramen_spark.queries import QUERIES, _prepare_corpus_v2
    from ramen_spark.sources.export import export_shards, verify_export

    _, packed = _prepare_corpus_v2(spark, SF_SMALL)
    out = str(tmp_path / "v2corpus")
    man = export_shards(
        packed, out, shard_col="shard", id_col="doc_id",
        content_cols=[c for c in packed.columns if c != "shard"],
    )
    assert verify_export(spark, out) == []

    reg = {
        str(r["shard"]): (r["n_rows"], r["content_sum"], r["payload_sum"])
        for r in QUERIES["prepare_training_corpus_v2"](
            spark, SF_SMALL
        ).collect()
    }
    wrote = {
        s: (v["n_rows"], v["content_sum"], v["payload_sum"])
        for s, v in man["shards"].items()
    }
    assert reg == wrote


def test_export_payload_repr_is_injective(spark, tmp_path):
    """Round-11 review: the old separator+sentinel row encoding
    collided on (a) a cell spelling the NULL sentinel and (b) a
    separator character inside a value. The length-prefixed netstring
    encoding is injective — both tamper shapes must now fail
    verification."""
    import os

    from ramen_spark.sources.export import export_shards, verify_export

    # (b) separator-shuffle: ('a\x1fb', 'c') vs ('a', 'b\x1fc')
    df = spark.createDataFrame(
        [(1, 0, "a\x1fb", "c"), (2, 0, "x", "y")],
        "doc_id long, shard int, s1 string, s2 string",
    )
    out = str(tmp_path / "sep")
    export_shards(df, out, shard_col="shard", id_col="doc_id")
    tampered = spark.createDataFrame(
        [(1, 0, "a", "b\x1fc"), (2, 0, "x", "y")],
        "doc_id long, shard int, s1 string, s2 string",
    )
    tampered.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out, "data")
    )
    assert any("payload_sum" in e for e in verify_export(spark, out))

    # (a) NULL vs a value spelling any sentinel-ish token
    df2 = spark.createDataFrame(
        [(1, 0, "\x00NULL\x00"), (2, 0, "z")],
        "doc_id long, shard int, s1 string",
    )
    out2 = str(tmp_path / "nul")
    export_shards(df2, out2, shard_col="shard", id_col="doc_id")
    t2 = spark.createDataFrame(
        [(1, 0, None), (2, 0, "z")],
        "doc_id long, shard int, s1 string",
    )
    t2.write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out2, "data")
    )
    assert any("payload_sum" in e for e in verify_export(spark, out2))

    # explicit empty content_cols fails BEFORE any data is written
    with pytest.raises(ValueError, match="content_cols"):
        export_shards(df2, str(tmp_path / "e"), shard_col="shard",
                      id_col="doc_id", content_cols=[])
    assert not (tmp_path / "e").exists()


def test_webdataset_swap_crash_window_recovers(spark, tmp_path):
    """Round-11 review: a kill between the two swap renames leaves no
    live 'data' dir; readers and the next writer must restore the
    surviving old generation instead of deleting it."""
    import os
    import shutil

    from ramen_spark.sources.export import (
        read_webdataset,
        verify_webdataset,
        write_webdataset,
    )

    df = _wds_fixture(spark)
    out = str(tmp_path / "wds")
    man = write_webdataset(df, out, "key", {"payload": "wav"}, n_shards=2)

    # simulate the crash window: data renamed aside, next staged
    os.rename(os.path.join(out, "data"), os.path.join(out, "data.old-dead"))
    os.makedirs(os.path.join(out, "data.next-dead"))
    with open(os.path.join(out, "webdataset_manifest.json.next-dead"),
              "w") as f:
        f.write("{}")

    # readers fall back to the surviving generation IN PLACE — no
    # rename in a read path (round-11 advice: renames fail on
    # read-only mounts and race concurrent readers); repair is the
    # next writer's job
    assert verify_webdataset(spark, out) == []
    assert read_webdataset(spark, out).count() > 0
    assert not os.path.isdir(os.path.join(out, "data"))
    assert os.path.isdir(os.path.join(out, "data.old-dead"))

    # ...and a writer starting from the same crashed state keeps the
    # old generation through its own failed job
    dup = df.unionByName(df.limit(1))
    with pytest.raises(Exception, match="duplicate"):
        write_webdataset(dup, out, "key", {"payload": "wav"}, n_shards=2)
    assert verify_webdataset(spark, out) == []
    import json as _json

    with open(os.path.join(out, "webdataset_manifest.json")) as f:
        assert _json.load(f)["shards"] == man["shards"]
    # staged leftovers were reaped
    assert not [n for n in os.listdir(out) if ".next-dead" in n]


def test_webdataset_target_shard_bytes_derives_count(spark, tmp_path):
    """Round-11 agenda #6: loaders specify shard BYTES — the shard
    count is derived from one pre-write agg over estimated member tar
    footprints, recorded in the manifest, and deterministic across
    re-runs (byte-identical tars)."""
    import math

    from ramen_spark.sources.export import (
        verify_webdataset,
        write_webdataset,
    )

    df = _wds_fixture(spark)
    # estimated footprint: per non-NULL member 512 header + payload
    # padded to 512 — recompute the expectation independently
    est = sum(
        512 + 512 * math.ceil(max(n, 1) / 512) if n else 512
        for r in df.collect()
        for n in (len(bytes(r["payload"])), len(r["meta"].encode()))
    )
    target = 4096
    out = str(tmp_path / "wds")
    man = write_webdataset(
        df, out, "key", {"payload": "wav", "meta": "json"},
        target_shard_bytes=target,
    )
    assert man["target_shard_bytes"] == target
    assert man["n_shards"] == math.ceil(est / target) > 1
    assert len(man["shards"]) <= man["n_shards"]  # md5 may leave gaps
    assert verify_webdataset(spark, out) == []
    # realized shard sizes track the target within hash-balance
    # spread plus tarfile's 10 KiB record blocking (each archive pads
    # to a RECORDSIZE multiple — dominant at toy targets like this)
    sizes = [s["tar_bytes"] for s in man["shards"].values()]
    assert max(sizes) < 4 * target + 20480
    # deterministic: a re-run derives the same count and bytes
    man2 = write_webdataset(
        df, str(tmp_path / "wds2"), "key",
        {"payload": "wav", "meta": "json"}, target_shard_bytes=target,
    )
    assert man2["n_shards"] == man["n_shards"]
    assert man2["shards"] == man["shards"]

    with pytest.raises(ValueError, match="target_shard_bytes"):
        write_webdataset(df, str(tmp_path / "x"), "key",
                         {"payload": "wav"}, target_shard_bytes=0)


def test_webdataset_streaming_read_chunked_flush(spark, tmp_path):
    """The round-12 streaming reader opens tars in 'r|' mode (one
    member in memory) and flushes output rows every ``batch_bytes`` —
    a tiny threshold must force many flushes and still return every
    member byte-exactly, including a FOREIGN tar not produced by
    write_webdataset (no manifest: last-dot split convention)."""
    import os
    import tarfile

    from ramen_spark.sources.export import read_webdataset

    out = tmp_path / "foreign"
    ddir = out / "data"
    os.makedirs(ddir)
    members = {f"sample.{i:03d}.bin": bytes([i % 251]) * (1000 + i)
               for i in range(50)}
    with tarfile.open(ddir / "shard-000000.tar", "w") as tar:
        for name, payload in sorted(members.items()):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            import io as _io

            tar.addfile(info, _io.BytesIO(payload))

    back = read_webdataset(spark, str(out), batch_bytes=2048).collect()
    got = {f"{r['key']}.{r['ext']}": bytes(r["data"]) for r in back}
    assert got == members
    # foreign tar, no manifest: last-dot convention splits the ext
    assert {r["ext"] for r in back} == {"bin"}
