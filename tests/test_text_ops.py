

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


def test_entropy_and_zlib_signals(spark):
    """functions.text entropy/compressibility lanes vs tiny hand
    references: H = log2(n) − (Σ c·log2 c)/n over char-3-grams and
    token unigrams; zlib_ratio = compressed/raw bytes."""
    import math
    import zlib

    from pyspark.sql import functions as F

    from ramen_spark.functions.text import (
        char_trigram_entropy,
        tokens,
        unigram_entropy,
        zlib_ratio,
    )

    df = spark.createDataFrame(
        [(1, "abcabcabc"), (2, "aa"), (3, None), (4, "x y x y x")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["tri"], r["uni"], r["zr"])
        for r in df.select(
            "doc_id",
            char_trigram_entropy(F.col("text")).alias("tri"),
            unigram_entropy(tokens(F.col("text"))).alias("uni"),
            zlib_ratio(F.col("text")).alias("zr"),
        ).collect()
    }

    def h(counts):
        n = sum(counts)
        return math.log2(n) - sum(c * math.log2(c) for c in counts) / n

    # "abcabcabc": grams abc×3 bca×2 cab×2
    assert abs(out[1][0] - h([3, 2, 2])) < 1e-12
    assert out[1][1] == 0.0  # one token repeated... single token "abcabcabc" → H=0
    assert out[2][0] is None  # < 3 chars
    assert out[3] == (None, None, None)
    # "x y x y x": tokens x×3 y×2
    assert abs(out[4][1] - h([3, 2])) < 1e-12
    b = "abcabcabc".encode()
    assert abs(out[1][2] - len(zlib.compress(b, 6)) / len(b)) < 1e-12


def test_entropy_keep_flip_on_planted_spam(spark):
    """The near-zero-entropy tier catches what the Gopher word rules
    miss: a planted doc of 60 distinct-ish all-'a' words (so word
    count, mean word length, and dup-word-3gram all PASS) collapses
    to 4 char trigrams → trigram entropy < 2.0 bits → keep=false;
    a normal-prose doc keeps. Pins the flag's non-vacuity the sf0.01
    corpus can't (its minimum trigram entropy is ~4.9)."""
    import random

    from ramen_spark.queries import _gopher_flags

    rng = random.Random(11)
    # 60 runs of 'a' with lengths drawn from 3..10; resample until the
    # sliding length-triples are distinct enough for dup3 < 0.2
    while True:
        lens = [rng.randint(3, 10) for _ in range(60)]
        trips = [tuple(lens[i : i + 3]) for i in range(len(lens) - 2)]
        if 1.0 - len(set(trips)) / len(trips) < 0.2:
            break
    spam = " ".join("a" * n for n in lens)
    prose = (
        "the quick brown fox jumps over the lazy dog while seven wizards "
        "brew quartz potions beside a frozen lake and sixty jovial "
        "miners exchange bright gems for warm bread under the autumn "
        "sky as travelers from distant villages arrive carrying maps "
        "spices letters and stories about mountains rivers harbors "
        "and the small markets they visited along the way home"
    )
    docs = spark.createDataFrame(
        [(1, spam), (2, prose)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in _gopher_flags(docs, entropy=True).collect()}
    s, p = got[1], got[2]
    # the spam doc passes every word-statistics rule…
    assert 50 <= s["n_words"] <= 100000
    assert 3 <= s["mean_word_len"] <= 10
    assert s["frac_dup_3gram"] < 0.2
    # …and only the entropy tier rejects it
    assert s["trigram_entropy"] < 2.0 and not s["keep"]
    assert p["trigram_entropy"] > 2.0 and p["keep"]
