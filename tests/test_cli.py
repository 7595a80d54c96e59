"""`python -m ramen_spark` CLI (ramen_spark/cli.py): the reference's
`ramen <cmd>` surface (src/RamenCliCmd.ml) driven end-to-end — compile,
run (deploy+archive+catalog manifest), tables, tail, replay,
timeseries, test — with state between invocations living only in the
archive root, like the reference's separate CLI processes."""

from __future__ import annotations

import os

import pytest

from ramen_spark.cli import main
from ramen_spark.sources.archive import DT_SECONDS

DAY = float(DT_SECONDS)
DAY0 = 100 * DAY

PROGRAM = """
DEFINE reader AS
  READ FROM FILE "traffic.csv" AS CSV (
    start float,
    stop float,
    iface string,
    bytes float);

-- 30000d: the fixture's event times sit near the epoch; anything
-- shorter and `run`'s retention (real wall-clock now) deletes them
DEFINE PERSIST FOR 30000d traffic AS
  SELECT start, stop, iface, sum bytes AS bytes
  FROM reader
  GROUP BY iface, start // 3600
  COMMIT AFTER in.start > out.stop
  FACTORS iface;
"""


@pytest.fixture(scope="module")
def deployed(spark, tmp_path_factory):
    """One `run` invocation; the read commands exercise the manifest."""
    src = tmp_path_factory.mktemp("cli_src")
    root = str(tmp_path_factory.mktemp("cli_archive"))
    (src / "traffic.ramen").write_text(PROGRAM)
    rows = [
        (DAY0 + d * DAY + h * 3600.0,
         DAY0 + d * DAY + (h + 1) * 3600.0, iface, 100.0 * d + h)
        for d in range(3)
        for h in (0, 6)
        for iface in ("eth0", "eth1")
    ]
    (src / "traffic.csv").write_text(
        "\n".join(f"{a},{b},{i},{v}" for a, b, i, v in rows) + "\n"
    )
    assert main(["run", str(src / "traffic.ramen"),
                 "--archive-root", root]) == 0
    return root


def test_cli_compile(spark, tmp_path, capsys):
    (tmp_path / "p.ramen").write_text(PROGRAM)
    assert main(["compile", str(tmp_path / "p.ramen")]) == 0
    out = capsys.readouterr().out
    assert "p/traffic: public persist=" in out
    assert "p/reader: public" in out


def test_cli_compile_error(tmp_path, capsys):
    (tmp_path / "bad.ramen").write_text("DEFINE f AS FLURB;")
    assert main(["compile", str(tmp_path / "bad.ramen")]) == 1


def test_cli_run_writes_archive_and_manifest(deployed, capsys):
    assert os.path.exists(os.path.join(deployed, "_catalog.json"))
    dts = os.listdir(os.path.join(deployed, "traffic", "traffic"))
    assert any(p.startswith("dt=") for p in dts)


def test_cli_tables(deployed, capsys):
    assert main(["tables", "--archive-root", deployed]) == 0
    out = capsys.readouterr().out
    assert "traffic/traffic" in out and "iface" in out


def test_cli_tail(deployed, capsys):
    assert main(["tail", "traffic/traffic", "--archive-root", deployed,
                 "--last", "3", "--where", "iface=eth0"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # FACTORS are partition columns, so iface reads back last
    assert set(out[0].split("\t")) == {"start", "stop", "bytes", "iface"}
    assert len(out) == 4  # header + 3 rows
    assert all("eth0" in ln for ln in out[1:])


def test_cli_replay_slices_time(deployed, capsys):
    # day 1 only: 4 groups (2 ifaces × h0/h6)
    assert main([
        "replay", "traffic/traffic", "--archive-root", deployed,
        "--since", str(DAY0 + DAY), "--until", str(DAY0 + 2 * DAY),
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5
    starts = [float(ln.split("\t")[0]) for ln in out[1:]]
    assert all(DAY0 + DAY <= s < DAY0 + 2 * DAY for s in starts)


def test_cli_timeseries(deployed, capsys):
    assert main([
        "timeseries", "traffic/traffic", "bytes",
        "--archive-root", deployed,
        "--since", str(DAY0), "--until", str(DAY0 + DAY),
        "--num-points", "4", "--consolidation", "sum",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # per-iface series (factor glob *) on a 4-point grid
    labels = {ln.split("\t")[0] for ln in out}
    assert labels == {"eth0", "eth1"}
    assert len(out) == 8


def test_cli_test_spec(spark, capsys):
    spec = "/root/reference/tests/func/basename.test"
    if not os.path.exists(spec):
        pytest.skip("reference checkout absent")
    assert main(["test", spec]) == 0
    assert ": ok" in capsys.readouterr().out


def test_cli_archivist(tmp_path, capsys):
    """`archivist` solves the storage allocation from a stats JSON —
    the raw→agg→report chain from test_archivist: budget fits the
    aggregate's history, not the raw stream's."""
    import json

    stats = {
        "p/raw": {"bytes_per_sec": 1000.0, "cpu_per_sec": 0.0},
        "p/agg": {"bytes_per_sec": 10.0, "cpu_per_sec": 1e-4,
                  "parents": ["p/raw"]},
        "p/report": {"bytes_per_sec": 1.0, "cpu_per_sec": 1e-5,
                     "parents": ["p/agg"]},
    }
    (tmp_path / "stats.json").write_text(json.dumps(stats))
    assert main([
        "archivist", "--stats", str(tmp_path / "stats.json"),
        "--budget", "100000", "--retention", "p/report=86400",
    ]) == 0
    alloc = json.loads(capsys.readouterr().out)
    # report's day of history is served by archiving report itself
    # (1 B/s fits); raw at 1 kB/s for a day would need 86.4 MB
    assert alloc["p/report"] == 86400.0
    assert alloc["p/raw"] == 0.0


def test_cli_archivist_apply_requires_root(tmp_path):
    """--apply without --archive-root is a clean usage error, not a
    TypeError from os.path.join(None, ...)."""
    import json

    (tmp_path / "stats.json").write_text(json.dumps(
        {"p/raw": {"bytes_per_sec": 1.0}}))
    with pytest.raises(SystemExit, match="--apply requires"):
        main(["archivist", "--stats", str(tmp_path / "stats.json"),
              "--budget", "10", "--apply"])


def test_catalog_load_corrupt_manifest_names_path(tmp_path):
    """A truncated _catalog.json surfaces as a diagnosable error that
    names the manifest, not a bare JSONDecodeError traceback."""
    from ramen_spark.api import ArchiveCatalog

    bad = tmp_path / "_catalog.json"
    bad.write_text('[{"fq": "p/f", "path"')
    with pytest.raises(ValueError, match=str(bad)):
        ArchiveCatalog.load(str(bad))


def test_cli_info(tmp_path, capsys):
    """`info` prints per-function operation metadata (ramen info
    analogue) from the compiled plan, no source data needed."""
    src = tmp_path / "p.ramen"
    src.write_text(
        "DEFINE f PERSIST FOR 1h AS\n"
        "  SELECT start, sum value AS total\n"
        "  FROM other/src\n"
        "  GROUP BY value\n"
        "  COMMIT AFTER sum 1 >= 3\n"
        "  FACTORS start;\n"
    )
    assert main(["info", str(src)]) == 0
    out = capsys.readouterr().out
    assert "program p" in out
    assert "function f: public" in out
    assert "from: other/src" in out
    assert "factors: start" in out
    assert "persist for: 3600.0s" in out
    assert "select: start, total" in out
    assert "commit after <cond>" in out


def test_cli_notify(capsys):
    """`notify` runs the alerter FSM end-to-end: fire, debounce,
    deliver via the stdout contact, journal."""
    assert main(["notify", "cpu_high", "-p", "host=web1",
                 "--debounce", "5"]) == 0
    out = capsys.readouterr().out
    assert "START cpu_high via stdout [host=web1]" in out
    assert "Sent 1st message" in out


def test_cli_links(tmp_path, capsys):
    """`links` prints one parent -> prog/func line per FROM edge."""
    src = tmp_path / "p.ramen"
    src.write_text(
        "DEFINE a AS SELECT 1 AS x FROM other/src;\n"
        "DEFINE b AS SELECT x FROM a;\n"
    )
    assert main(["links", str(src)]) == 0
    out = capsys.readouterr().out
    assert "other/src\t->\tp/a" in out
    assert "a\t->\tp/b" in out


def test_cli_ingest_warc(spark, tmp_path, capsys):
    """`ramen ingest-warc <warc> <out>`: crawl file in, documents
    parquet out — the CLI entry point of the training pipeline."""
    http = b"HTTP/1.1 200 OK\r\n\r\n<p>cli crawl text</p>"
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://cli.test/\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    (tmp_path / "a.warc").write_bytes(head + http + b"\r\n\r\n")
    out = str(tmp_path / "docs")
    assert main(["ingest-warc", str(tmp_path / "a.warc"), out]) == 0
    assert "1 documents" in capsys.readouterr().out
    row = spark.read.parquet(out).collect()[0]
    assert row["text"] == "cli crawl text"
    assert row["source"] == "http://cli.test/"


def test_cli_datacard(spark, capsys):
    """`ramen datacard <dir>`: per-(lang, source) report to stdout."""
    assert main(["datacard", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    hdr = out[0].split("\t")
    assert hdr[:4] == ["lang", "source", "n_docs", "n_unique"]
    assert len(out) > 1  # at least one (lang, source) group


def test_cli_corpus_diff(spark, tmp_path, capsys):
    """`ramen corpus-diff old new --out d`: status counts on stdout,
    delta parquet written."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    docs.filter("doc_id % 2 = 0").write.parquet(old_p)
    docs.filter("doc_id % 3 = 0").write.parquet(new_p)
    out_p = str(tmp_path / "delta")
    assert main(["corpus-diff", old_p, new_p, "--out", out_p]) == 0
    lines = dict(
        ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()
    )
    assert set(lines) == {"added", "removed", "changed"}
    assert int(lines["added"]) > 0 and int(lines["removed"]) > 0
    assert int(lines["changed"]) == 0  # same text both sides
    delta = spark.read.parquet(out_p)
    assert delta.count() == int(lines["added"]) + int(lines["removed"])


def test_cli_curate(spark, tmp_path, capsys):
    """`ramen curate <docs> <out>`: cleaned survivors written, count
    line printed."""
    src = str(tmp_path / "docs")
    (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .write.parquet(src)
    )
    out = str(tmp_path / "curated")
    assert main(["curate", src, out]) == 0
    line = capsys.readouterr().out.strip()
    assert "survived curation" in line
    curated = spark.read.parquet(out)
    assert curated.count() > 0
    assert "cleaned" in curated.columns


def test_cli_sketch(spark, tmp_path, capsys):
    """`ramen sketch <table> <col> --by k`: KMV table + CMS top list;
    KMV values match the operator, CMS never underestimates."""
    from ramen_spark.operators.sketch import kmv_distinct

    src = str(tmp_path / "ev")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    ev.write.parquet(src)
    assert main(
        ["sketch", src, "user_id", "--by", "event_type", "--k", "16",
         "--top", "3", "--width", "256"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "event_type", "n_kept", "kth_min", "est_distinct"
    ]
    got = {
        ln.split("\t")[0]: int(ln.split("\t")[3])
        for ln in out[1 : 1 + 5]
    }
    exp = {
        r["event_type"]: r["est_distinct"]
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=16).collect()
    }
    assert got == exp
    # CMS section: "value exact est" rows, est >= exact
    cms_rows = [ln.split("\t") for ln in out if len(ln.split("\t")) == 3
                and ln.split("\t")[1].isdigit()]
    assert len(cms_rows) == 3
    assert all(int(e) >= int(x) for _, x, e in cms_rows)

    # the default (no --by) form is the GLOBAL sketch — one row
    assert main(["sketch", src, "user_id", "--k", "16", "--top", "0"]) == 0
    out2 = capsys.readouterr().out.strip().splitlines()
    assert out2[0].split("\t") == ["n_kept", "kth_min", "est_distinct"]
    assert len(out2) == 2


def test_cli_sketch_quantiles(spark, tmp_path, capsys):
    """`ramen sketch … --quantiles 0.5,0.9 --id-col e`: the bottom-k
    quantile section matches the operator; --quantiles without
    --id-col is a usage error."""
    from ramen_spark.operators.sketch import quantile_sketch

    src = str(tmp_path / "evq")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "value"
    )
    ev.write.parquet(src)
    assert main(
        ["sketch", src, "value", "--by", "event_type", "--top", "0",
         "--quantiles", "0.5,0.9", "--id-col", "event_id"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    qi = next(i for i, ln in enumerate(out) if ln.startswith("quantiles"))
    assert out[qi + 1].split("\t") == [
        "event_type", "n_sample", "p50", "p90"
    ]
    got = {
        ln.split("\t")[0]: tuple(ln.split("\t")[1:])
        for ln in out[qi + 2 :]
    }
    exp = {
        r["event_type"]: (str(r["n_sample"]), str(r["p50"]), str(r["p90"]))
        for r in quantile_sketch(
            ev, ["event_type"], "value", "event_id", [0.5, 0.9], k=256
        ).collect()
    }
    assert got == exp and len(got) > 0
    assert main(
        ["sketch", src, "value", "--top", "0", "--quantiles", "0.5"]
    ) == 2
    assert "--id-col" in capsys.readouterr().out


def test_cli_overlap(spark, tmp_path, capsys):
    """`ramen overlap <a> <b> <col> --by k`: KMV set-algebra report;
    values match the operator run directly."""
    from ramen_spark.operators.sketch import kmv_overlap

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "user_id"
    )
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ev.filter("event_type = 'click'").write.parquet(a)
    ev.filter("event_type = 'purchase'").write.parquet(b)
    assert main(["overlap", a, b, "user_id", "--k", "32"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "n_a", "n_b", "est_a", "est_b", "n_union_kept", "est_union",
        "est_intersection", "jaccard", "containment_b_in_a",
        "containment_a_in_b",
    ]
    got = out[1].split("\t")
    [exp] = kmv_overlap(
        ev.filter("event_type = 'click'"),
        ev.filter("event_type = 'purchase'"),
        [], "user_id", k=32,
    ).collect()
    assert [str(exp[c]) for c in out[0].split("\t")] == got


def test_cli_sample(spark, tmp_path, capsys):
    """`ramen sample <table> n --weight-col w --by k`: the printed
    sample matches weighted_sample; --out writes parquet instead."""
    from ramen_spark.operators.sampling import weighted_sample

    src = str(tmp_path / "docs")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("lang", "doc_id", "n_chars")
    docs.write.parquet(src)
    assert main(
        ["sample", src, "5", "--weight-col", "n_chars", "--by", "lang"]
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "lang", "doc_id", "n_chars", "skey_micro", "rn"
    ]
    exp = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in weighted_sample(
            docs, 5, "n_chars", ["lang"], "doc_id"
        ).collect()
    }
    got = {
        (p[0], int(p[1]), int(p[4]))
        for p in (ln.split("\t") for ln in out[1:])
    }
    assert got == exp

    dst = str(tmp_path / "sample_out")
    assert main(
        ["sample", src, "5", "--weight-col", "n_chars", "--by", "lang",
         "--out", dst]
    ) == 0
    assert spark.read.parquet(dst).count() == len(exp)


def test_cli_export_and_verify_wds(spark, tmp_path, capsys):
    """`ramen export-wds` + `ramen verify-wds`: tar shards + manifest
    out, trust check green; a tampered shard flips verify to exit 1."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).selectExpr("CAST(doc_id AS STRING) AS k", "text", "lang")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "wds")
    assert main(
        ["export-wds", src, out, "--key-col", "k",
         "--member", "text=txt", "--member", "lang=lang", "--shards", "3"]
    ) == 0
    assert "samples in" in capsys.readouterr().out
    assert main(["verify-wds", out]) == 0
    assert "verified" in capsys.readouterr().out

    data = os.path.join(out, "data")
    victim = sorted(n for n in os.listdir(data) if n.endswith(".tar"))[0]
    with open(os.path.join(data, victim), "r+b") as fh:
        fh.seek(700)
        fh.write(b"??")
    assert main(["verify-wds", out]) == 1
    assert "mismatch" in capsys.readouterr().out

    # bad --member spec is a usage error
    assert main(
        ["export-wds", src, out, "--key-col", "k", "--member", "text"]
    ) == 2


def test_cli_pack_reports_pad_and_writes(spark, tmp_path, capsys):
    """`ramen pack TABLE --order ffd --by lang --out DIR` — the
    packing final mile from the CLI: pad report printed, parquet
    written, group constraint honored (no pack mixes languages)."""
    from ramen_spark.cli import main

    rows = [(i, f"l{i % 2}", "tok " * (5 + i % 37)) for i in range(80)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.parquet(src)
    out = str(tmp_path / "packed")
    assert main([
        "pack", src, "--order", "ffd", "--by", "lang",
        "--budget", "64", "--shards", "2", "--out", out,
    ]) == 0
    rep = capsys.readouterr().out
    assert "order=ffd" in rep and "pad_pct=" in rep
    back = spark.read.parquet(out)
    assert back.count() == 80
    # group constraint: one lang per (shard, lang, pack_seq) is
    # trivially true — the real check is that pack ids restart per
    # group (both langs have a pack 0 in some shard)
    langs_with_p0 = {
        r["lang"]
        for r in back.filter("pack_seq = 0").select("lang").distinct()
        .collect()
    }
    assert langs_with_p0 == {"l0", "l1"}
