

def test_tfidf_df_via_join_equals_window(spark):
    """The skew-proof df_via_join form must produce the identical
    result as the default df window (same tf/df/scores/ranks)."""
    from ramen_spark.functions.text import tfidf_top_terms

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    a = {
        tuple(r)
        for r in tfidf_top_terms(docs, k=3, df_via_join=False).collect()
    }
    b = {
        tuple(r)
        for r in tfidf_top_terms(docs, k=3, df_via_join=True).collect()
    }
    assert a == b and len(a) > 0


def test_script_counts_arrow_equals_jvm(spark):
    """The Arrow script-count engine must be bit-identical to the four
    JVM regex counts (integers — unlike the BLAS engine there is no
    accumulation-order caveat), including empty and non-BMP-free
    unicode rows."""
    from ramen_spark.functions.text import (
        SCRIPT_RANGES,
        script_counts,
        script_counts_arrow,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "hello world ABC xyz"),
        (2, "привет мир"),
        (3, "你好世界 test"),
        (4, "مرحبا بالعالم"),
        (5, ""),
        (6, "mixed: abc привет 你好 مرحبا 123 !?"),
        (7, "Àéîõü ǍǏ"),  # Latin-1 supplement / extended
    ]
    docs = spark.createDataFrame(rows, ["id", "t"])
    jvm = docs.select(
        "id",
        *[
            script_counts(F.col("t"))[n].alias(n)
            for n in SCRIPT_RANGES
        ],
    ).collect()
    arrow = docs.select(
        "id", script_counts_arrow(F.col("t")).alias("c")
    ).collect()
    a = {r["id"]: list(r["c"]) for r in arrow}
    j = {r["id"]: [r[n] for n in SCRIPT_RANGES] for r in jvm}
    assert a == j


def test_bm25_from_index_equals_inflight(spark, tmp_path):
    """Scoring from the prebuilt keyword index must equal the
    in-flight bm25_topk exactly — INCLUDING through a parquet
    round-trip of the index (the production deployment: build once,
    write term-partitionable postings, query many times)."""
    from ramen_spark.functions.text import (
        bm25_topk,
        bm25_topk_from_index,
        build_keyword_index,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    terms = ["spark", "merge", "window"]
    exp = {tuple(r) for r in bm25_topk(docs, terms, k=15).collect()}

    postings, stats = build_keyword_index(docs)
    postings.write.parquet(str(tmp_path / "postings"))
    stats.write.parquet(str(tmp_path / "stats"))
    p2 = spark.read.parquet(str(tmp_path / "postings"))
    s2 = spark.read.parquet(str(tmp_path / "stats"))
    got = {
        tuple(r) for r in bm25_topk_from_index(p2, s2, terms, k=15).collect()
    }
    assert got == exp and len(got) == 15


def test_corpus_diff_null_text_presence(spark):
    """Presence must key on the JOINED ID (per-side markers), not on
    fingerprint NULL-ness: a doc present in BOTH snapshots whose text
    is NULL on one side is 'changed' (null-safe fingerprint compare),
    never misreported as 'added'/'removed'; NULL-text on both sides
    is unchanged (excluded)."""
    from ramen_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, None), (3, "x"), (4, None), (5, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "now text"), (3, None), (4, None), (6, "fresh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "changed", 5: "removed", 6: "added"}
