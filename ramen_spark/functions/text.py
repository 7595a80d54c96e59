"""Text-analysis primitives for large-scale document pipelines.

These are the column-level building blocks the dedup / quality /
language-id operators (ramen_spark.operators.dedup, __spark_entry__
queries) compose. Everything is built-in pyspark functions — the hash
primitives intentionally use ``md5`` (available verbatim in DuckDB too)
so every operator built on them has an exact cross-engine oracle.

Scale notes: all helpers are row-local expressions → embarrassingly
parallel, no shuffle, stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization & counting
# ---------------------------------------------------------------------------

# BPE-ish word/number/punct splitter: letters+digits runs, or single
# non-space symbol — a reasonable proxy for subword token count.
TOKEN_REGEX = r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"


def tokens(text: Column) -> Column:
    """Whitespace-and-punctuation tokenizer → array<string>."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (cheap, exact in SQL oracles)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Regex token count approximating a BPE tokenizer's granularity."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(F.lower(text))
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


# the ASCII punctuation classes [!-/], [:-@], [\[-`], [{-~] spelled out
_PUNCT_CHARS = (
    "!\"#$%&'()*+,-./" ":;<=>?@" "[\\]^_`" "{|}~"
)


def punct_ratio(text: Column) -> Column:
    """Punctuation byte fraction. Counted as
    octet_length(text) − octet_length(translate(text, punct, "")) —
    ``translate`` is a plain char map; the regexp_replace form
    (`[^!-/:-@\\[-`{-~]` → "") computes the identical count but costs
    a per-character regex engine pass (measured 30 s vs 1 s over the
    100× documents tier). The DuckDB oracle keeps its regex form —
    values are equal."""
    n = F.octet_length(text)
    p = n - F.octet_length(F.translate(text, _PUNCT_CHARS, ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite heuristic quality in [0,1]: rewards moderate length,
    presence of stopwords, sane word lengths; punishes punctuation
    spam. Deterministic and SQL-expressible (oracle-checkable).

    One tokenization, not two (round 12): the stopword ratio used to
    split tokens(lower(text)) while the word-length ratio split
    tokens(text) — two full regex \\s+ passes per document. Lowercase
    never adds or removes whitespace, so the k-th token of
    lower(text) IS lower(k-th token of text): filtering on lower(t)
    over the single raw token array gives the identical stopword
    count (values oracle-checked unchanged; the SQL oracles keep
    their original two-split form)."""
    ln = F.octet_length(text).cast("double")
    len_score = F.least(ln / F.lit(200.0), F.lit(1.0))
    toks = tokens(text)
    n = F.size(toks)
    sw = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS_EN))
    )
    swr = F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))
    sw_score = F.least(swr * 4, F.lit(1.0))
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    wl = F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))
    wl_score = F.when((wl >= 3) & (wl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 3)
    return F.round((len_score + sw_score + wl_score + punct_pen) / 4, 6)


# ---------------------------------------------------------------------------
# language id (n-gram / marker-word heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    # marker words chosen to be mutually exclusive across the langs the
    # synthetic corpus carries (en/de/fr/es + whatever else appears).
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es": ("el", "los", "las", "es", "una", "para", "con", "por"),
    "en": ("the", "a", "and", "is", "of", "to", "in", "it"),
}


def lang_marker_hits(text: Column, lang: str) -> Column:
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def detect_language(text: Column, default: str = "en") -> Column:
    """Pick the language whose marker set hits most; ties broken by
    the fixed order de>fr>es>en, default when nothing hits."""
    hits = {lang: lang_marker_hits(text, lang) for lang in LANG_MARKERS}
    best = F.lit(default)
    best_n = F.lit(0)
    # evaluate in reverse priority so earlier langs win ties via >
    for lang in reversed(list(LANG_MARKERS)):
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return best


# ---------------------------------------------------------------------------
# fingerprints & hashing (md5-based → DuckDB-oracle-exact)
# ---------------------------------------------------------------------------


def normalized_text(text: Column) -> Column:
    """Canonical form for exact/near dedup: lowercase, collapse
    whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def doc_lines(text: Column) -> Column:
    """Trimmed non-empty lines of a document → array<string>.

    The unit the Gopher/RefinedWeb repetition and line-quality rules
    operate on. Mirrors DuckDB
    ``list_filter(list_transform(string_split(t, chr(10)), trim), <> '')``
    so line-level signals stay oracle-exact."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (hex string).

    md5 (not xxhash64) so DuckDB computes the identical value — the
    cross-engine correctness gate hashes actual values.
    """
    return F.md5(normalized_text(text))


def window_starts(n: Column, k: int) -> Column:
    """1-based start indices of the k-wide rolling windows over a
    length-``n`` sequence — EMPTY when n < k.

    The naive bound ``F.sequence(1, greatest(n - k + 1, 0))`` is a
    trap: Spark's ``sequence(1, 0)`` counts DOWN — ``[1, 0]`` — unlike
    SQL ``generate_series``, so inputs shorter than the window both
    diverge from the DuckDB oracles (which correctly produce no rows)
    and crash ``element_at`` with INVALID_INDEX_OF_ZERO /
    INVALID_ARRAY_INDEX. Found by review; every rolling-window site
    (shingles, char n-grams, spans, raw 3-grams) goes through here."""
    return F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.slice(F.array(F.lit(1)), 1, 0)
    )


def word_shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token-array COLUMN.

    IMPORTANT: pass a projected attribute (a column materialized by a
    previous select), not an inline expression — the lambda below
    references ``toks`` k times, and Catalyst inlines (re-evaluates)
    complex argument expressions per array element. Staging the
    tokens first makes shingle construction O(1) per shingle instead
    of re-splitting the document (measured ~10× on sf0.1 documents).
    """
    n = F.size(toks)
    sh = F.transform(
        window_starts(n, k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.array_distinct(sh)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text → array<string>.
    Row-local convenience form; prefer staging tokens via
    ``word_shingles_of_tokens`` in hot paths (see its docstring)."""
    return word_shingles_of_tokens(F.split(normalized_text(text), " "), k)


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams → array<string>."""
    s = normalized_text(text)
    ln = F.length(s)
    return F.array_distinct(
        F.transform(window_starts(ln, n), lambda i: s.substr(i, F.lit(n)))
    )


def md5_hash_pair(s: Column) -> tuple[Column, Column]:
    """Two independent 48-bit hashes from ONE md5: hex chars 1-12 and
    21-32 parsed as integers. 48 bits so ``h1 + k*h2`` stays < 2^53
    for k ≤ 16 (exact in long AND double, no overflow either engine).
    DuckDB mirror: ``('0x' || substring(md5(s), 1, 12))::BIGINT``."""
    md = F.md5(s)
    h1 = F.conv(F.substring(md, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(md, 21, 12), 16, 10).cast("long")
    return h1, h2


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as array<long>: element i = min over shingles
    of (h1 + i*h2), Kirsch-Mitzenmacher double hashing over a single
    md5 per shingle (16× less hashing than salted-md5-per-permutation;
    measured 5.8× faster end-to-end at sf0.1). Same MinHash guarantee
    (P[minhash_i equal] = Jaccard), still exactly reproducible in
    DuckDB SQL for the oracle. Row-local → no shuffle.
    """
    h1h2 = F.transform(shingles, lambda s: F.struct(*_pair_struct(s)))
    return F.array(
        *[
            F.array_min(
                F.transform(h1h2, lambda p: p.getField("h1") + i * p.getField("h2"))
            )
            for i in range(num_hashes)
        ]
    )


def _pair_struct(s: Column) -> list[Column]:
    h1, h2 = md5_hash_pair(s)
    return [h1.alias("h1"), h2.alias("h2")]


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH: array of 'band_idx:md5(joined rows)'
    bucket keys. Docs sharing any bucket key are near-dup candidates."""
    return F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ),
            )
            for b in range(bands)
        ]
    )


def simhash(shingles: Column, bits: int = 48) -> Column:
    """SimHash of a shingle/token set (default 48-bit, fits a signed
    long exactly), via md5-derived bits.

    For each bit position, count shingles whose md5 nibble has that bit
    set; majority vote → bit set in the signature. Built entirely from
    higher-order functions; md5 keeps it DuckDB-reproducible.

    NOTE: convenience/reference form only — Catalyst re-evaluates the
    md5 array once per bit here (48×). Hot paths must use the
    row-based pipeline in operators.dedup.simhash_near_dups (explode →
    one md5 per shingle → per-bit sums), which computes the identical
    signature ~80× faster.
    """
    hexdig = "0123456789abcdef"

    def bit_of(h: Column, bit: int) -> Column:
        ch = F.substring(h, bit // 4 + 1, 1)
        nib = F.instr(F.lit(hexdig), ch) - 1
        return F.when(nib.bitwiseAND(F.lit(8 >> (bit % 4))) > 0, F.lit(1)).otherwise(F.lit(-1))

    hashes = F.transform(shingles, lambda s: F.md5(s))

    def make_merge(b: int):
        return lambda a, h: a + bit_of(h, b)

    acc = F.lit(0).cast("long")
    for bit in range(bits):
        votes = F.aggregate(hashes, F.lit(0), make_merge(bit))
        acc = acc + F.when(votes > 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return acc


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string arrays (assumed distinct)."""
    inter = F.size(F.array_intersect(a, b))
    un = F.size(F.array_union(a, b))
    return F.when(un > 0, inter.cast("double") / un).otherwise(F.lit(0.0))


def bm25_topk(
    docs,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 keyword retrieval (Robertson/Spärck Jones) — the sparse
    complement to the ANN tiers in operators.similarity: curation
    pipelines mine a corpus by keyword (domain bootstrapping, eval-set
    sourcing) before any embedding exists. Scores the classic
    Okapi form: idf(t) = ln(1 + (N − df + ½)/(df + ½)),
    tf-part = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).

    Determinism: every (doc, term) contribution FREEZES to an integer
    micro-score before the per-document sum (the dsir/ccnet rule —
    Spark combines group partials in arbitrary order; integer sums
    make that order irrelevant), and the top-k rank carries a
    (score desc, id asc) total order.

    100 TB shape: the token explode filters to the query-term set
    IMMEDIATELY (a tiny isin literal — Catalyst pushes it into the
    generate), so everything downstream is proportional to matching
    postings, not corpus tokens; df/N/avgdl are one ≤|terms|-row and
    one 1-row aggregate, both broadcast back; one groupBy on the doc
    id; one global top-k (TakeOrdered, no full sort).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    terms = [str(t) for t in query_terms]
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_w")
    ).select(
        id_col,
        F.size("_w").alias("_dl"),
        F.explode("_w").alias("_tok"),
    )
    hits = toks.filter(F.col("_tok").isin(terms))
    tf = hits.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    stats = docs.select(
        token_count(F.col(text_col)).alias("_dl0")
    ).agg(
        F.count(F.lit(1)).alias("_N"),
        (F.sum("_dl0").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
    )
    df_t = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    contrib = (
        tf.join(df_t, "_tok")
        .crossJoin(stats)
        .select(
            id_col,
            F.round(
                F.log(
                    1.0
                    + (F.col("_N") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * (F.col("_tf") * (k1 + 1.0))
                / (
                    F.col("_tf")
                    + k1
                    * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
                * 1e6
            )
            .cast("long")
            .alias("_c"),
        )
    )
    topk = (
        contrib.groupBy(id_col)
        .agg(F.sum("_c").cast("bigint").alias("score_micro"))
        # orderBy+limit lowers to TakeOrderedAndProject: per-partition
        # k-row heaps + one tiny merge — the rank window then runs
        # over the ≤k-row result, never the full keyset
        .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w)).withColumn(
        "score", F.round(F.col("score_micro").cast("double") / 1e6, 6)
    )


# ---------------------------------------------------------------------------
# PII scrubbing & URL/domain hygiene (training-pipeline extension — the
# C4/RefinedWeb curation stages the reference has no counterpart for)
# ---------------------------------------------------------------------------

# Patterns stay inside the Java-regex ∩ RE2 common subset (no
# backrefs/lookaround) so the DuckDB oracle evaluates the IDENTICAL
# expression — cross-engine agreement is part of the test surface.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{9,15}\b"

_PII_ORDER = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (measured BEFORE redaction — the
    audit metric a curation run reports)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)),
        "n_ips": F.size(F.regexp_extract_all(text, F.lit(PII_IPV4_RE), 0)),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0)),
    }


def redact_pii(text: Column) -> Column:
    """Replace emails, then IPv4 literals, then international phone
    numbers with typed placeholder tokens — the standard pre-training
    scrub (order matters and is fixed: an email's host part must not
    be half-eaten by the IP pass first). Row-local JVM regexes — no
    shuffle, no Python."""
    out = text
    for pat, tok in _PII_ORDER:
        out = F.regexp_replace(out, pat, tok)
    return out


# URL → host → registrable domain. One regex, shared with the oracle:
# scheme://[userinfo@]HOST[:port][/…]. Registrable domain is the last
# two labels — the no-PSL approximation (co.uk-style suffixes would
# need the Public Suffix List shipped as a broadcast table; documented
# delta, same join shape).
URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+).*"
REG_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, URL_HOST_RE, 1))


def registrable_domain(host: Column) -> Column:
    return F.regexp_extract(host, REG_DOMAIN_RE, 1)


# URL canonicalization — the crawl-dedup front line. Re-crawls of the
# same page differ by tracking params, fragments, case of scheme/host,
# explicit default ports, and trailing slashes; canonicalizing before
# the exact-dedup fingerprint collapses them WITHOUT touching content
# (the cheap dedup tier that runs before any text hashing). Every step
# is a regex in the Java ∩ RE2 common subset (no lookarounds — RE2
# lacks them) so the DuckDB oracle computes identical strings.
# NOT included: bare `ref` — unlike utm_*/fbclid/gclid/msclkid it is
# widely CONTENT-significant (?ref=<branch> on code hosts selects
# different file contents), and at the dedup tier over-merging LOSES
# a document where under-merging only costs one extra fingerprint
# comparison downstream.
_TRACKING = r"(?:utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)"
_URL_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL, as a fixed regex cascade:

    1. strip the fragment (``#…``);
    2. lowercase scheme+authority (path/query case is significant);
    3. drop explicit default ports (``http…:80``, ``https…:443``);
    4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
       ``msclkid`` — deliberately NOT bare ``ref``, see _TRACKING),
       wherever they sit in the query string, dropping the ``?``
       itself when nothing else remains;
    5. strip trailing slashes off the path.

    Deliberately NOT done (documented deltas from e.g. the w3lib /
    url-normalize libraries): percent-encoding normalization and
    query-param reordering — both need char-by-char rewriting that a
    regex cascade can't express; at the dedup tier a missed alias
    only costs a second content-fingerprint comparison downstream.
    Row-local JVM expressions — no shuffle, codegen-friendly."""
    # 1. fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase scheme://host[:port] only (scheme-less strings pass
    # through unchanged — regexp_extract would blank them otherwise)
    u = F.when(
        u.rlike(_URL_PREFIX_RE),
        F.concat(
            F.lower(F.regexp_extract(u, _URL_PREFIX_RE, 1)),
            F.regexp_extract(u, _URL_PREFIX_RE, 2),
        ),
    ).otherwise(u)
    # 3. default ports (group 2 may be unmatched at end-of-string —
    # both engines substitute empty for an unparticipating group)
    u = F.regexp_replace(u, r"^(http://[^/?#]*?):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*?):443([/?#].*)?$", r"$1$2")
    # 4. tracking params: non-leading ones drop with their '&'; then a
    # leading one hands '?' to the next param; then a lone one drops
    # with its '?'
    u = F.regexp_replace(u, r"&" + _TRACKING + r"=[^&#]*", "")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?" + _TRACKING + r"=[^&#]*$", "")
    # 5. trailing slash(es) on the path, query preserved
    u = F.regexp_replace(u, r"(://[^/?#]*/[^?#]*?)/+(\?[^#]*)?$", r"$1$2")
    return u


def canonical_url_sql(expr: str) -> str:
    """The DuckDB twin of ``canonical_url`` over SQL expression
    ``expr`` — same cascade, RE2 spelling (\\1 backrefs, explicit 'g'
    flag: DuckDB's regexp_replace is first-match by default where
    Spark's is global)."""
    u = f"regexp_replace({expr}, '#.*$', '', 'g')"
    pre = "'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$'"
    u = (
        f"(CASE WHEN regexp_matches({u}, {pre}) THEN "
        f"lower(regexp_extract({u}, {pre}, 1)) || "
        f"regexp_extract({u}, {pre}, 2) ELSE {u} END)"
    )
    u = f"regexp_replace({u}, '^(http://[^/?#]*?):80([/?#].*)?$', '\\1\\2', 'g')"
    u = f"regexp_replace({u}, '^(https://[^/?#]*?):443([/?#].*)?$', '\\1\\2', 'g')"
    trk = "(?:utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)"
    u = f"regexp_replace({u}, '&{trk}=[^&#]*', '', 'g')"
    u = f"regexp_replace({u}, '\\?{trk}=[^&#]*&', '?', 'g')"
    u = f"regexp_replace({u}, '\\?{trk}=[^&#]*$', '', 'g')"
    u = f"regexp_replace({u}, '(://[^/?#]*/[^?#]*?)/+(\\?[^#]*)?$', '\\1\\2', 'g')"
    return u


def filter_blocked_domains(
    docs, blocklist: list[str], url_col: str = "source"
):
    """Drop documents whose URL host falls under a blocked registrable
    domain (the UT1/RefinedWeb blocklist stage): exact-host OR
    any-subdomain match, implemented as ONE broadcast anti-join on the
    registrable domain plus an exact-host disjunct — at 100 TB the
    blocklist (UT1 is ~4M lines ≈ tens of MB) broadcasts whole, the
    corpus never shuffles, and the match is an equi-join, not a
    per-row LIKE scan over the list."""
    spark = docs.sparkSession
    bl = spark.createDataFrame(
        [(d.lower(),) for d in blocklist], "blocked string"
    )
    with_host = docs.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_rdom", registrable_domain(F.col("_host"))
    )
    # an OR across the two match columns would force a nested-loop
    # join; two broadcast EQUI-anti-joins keep the probe hash-based
    out = with_host
    for col in ("_rdom", "_host"):
        out = out.join(
            F.broadcast(bl),
            F.col(col) == F.col("blocked"),
            "left_anti",
        )
    return out.drop("_host", "_rdom")


# ---------------------------------------------------------------------------
# tf-idf keyword extraction & Unicode-script profiling (training-pipeline
# extensions — corpus indexing / multilingual routing stages)
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    docs,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_via_join: bool | None = None,
):
    """Per-document top-k terms by tf-idf — the keyword-extraction /
    corpus-indexing stage (domain tagging, dedup-cluster naming,
    search-index bootstrapping). idf(t) = ln((N + 1)/(df + 1)); each
    (doc, term) score FREEZES to an integer micro-score before ranking
    (the bm25 determinism rule), and the rank carries a
    (score desc, term asc) total order.

    100 TB shape: tf = one partial-combined groupBy on (doc, term);
    the default df path (df_via_join=True) localCheckpoints the tf
    relation (so the token explode is NOT recomputed for the df
    branch — Spark shares no subtrees), partial-combine aggregates df
    by term, and re-attaches it with an AQE skew-handled equi-join;
    N is a 1-row aggregate broadcast back via crossJoin; the final
    top-k is a per-doc window.

    df_via_join=False is the lazy single-plan alternative — df as a
    COUNT WINDOW over the tf relation partitioned by term. Measured
    A/B at the 100× tiers (min-of-2): join 5.5 s vs window 8.5 s on
    the uniform corpus, and 9.4 s vs 13.2 s on the adversarial-skew
    tier — the window loses everywhere because a window does no
    partial aggregation (every row of a hot term lands in ONE task;
    a term in every document makes that task O(n_docs) — a cliff at
    billions of docs), which is why the skew-proof join form is the
    default despite its eager materialization. Equality pinned by
    test_tfidf_df_via_join_equals_window.

    EAGER SIDE EFFECT + fault-tolerance tradeoff of the default path:
    ``localCheckpoint`` fires a Spark job at DataFrame-CONSTRUCTION
    time (not at the first action) and stores the tf blocks WITHOUT
    lineage — if an executor holding blocks is lost or decommissioned
    mid-job, the result is unrecoverable and the job fails (no
    recompute path). On long multi-hour 100 TB runs where executor
    churn is expected, prefer ``df_via_join=False`` (pure lazy plan,
    full lineage, recomputable) unless the corpus is term-skewed, or
    persist the tf relation to a replicated store yourself and pass
    the joined form explicitly. ``df_via_join=None`` (the default)
    resolves to the join path for batch inputs and FALLS BACK to the
    window path for streaming DataFrames, where checkpointing a
    construction-time job is impossible.
    """
    from pyspark.sql import Window

    if df_via_join is None:
        df_via_join = not docs.isStreaming

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    if df_via_join:
        tf = tf.localCheckpoint()
        df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        tf = tf.join(df_t, "term")
    else:
        tf = tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = tf.crossJoin(n_docs).select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf")
            * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
            * 1e6
        )
        .cast("bigint")
        .alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score_micro",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# Script character classes as LITERAL code-point ranges (not \p{...}
# properties and not \uXXXX escapes): Java spells properties
# \p{IsLatin} where RE2 wants \p{Latin}, and RE2 rejects \uXXXX
# entirely — literal characters inside a class are the only spelling
# both engines read identically, and they also dodge Unicode-version
# drift between the JVM and RE2.
SCRIPT_RANGES = {
    "latin": f"A-Za-z{chr(0xC0)}-{chr(0x24F)}",
    "cyrillic": f"{chr(0x400)}-{chr(0x4FF)}",
    "han": f"{chr(0x4E00)}-{chr(0x9FFF)}",
    "arabic": f"{chr(0x600)}-{chr(0x6FF)}",
}


def script_counts(text: Column) -> dict[str, Column]:
    """Characters per Unicode script (explicit code-point ranges) —
    the multilingual routing signal: language-ID above is marker-word
    based and Latin-biased; script counts catch what it can't."""
    return {
        name: F.length(
            F.regexp_replace(text, f"[^{rng}]", "")
        )
        for name, rng in SCRIPT_RANGES.items()
    }


def dominant_script(counts: dict[str, Column]) -> Column:
    """Argmax script with a FIXED precedence on ties
    (latin > cyrillic > han > arabic — the dict order), so the result
    is deterministic and oracle-expressible as a CASE chain."""
    m = F.greatest(*counts.values())
    out = None
    names = list(counts)
    for name in names[:-1]:
        cond = counts[name] == m
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    return out.otherwise(F.lit(names[-1]))


# Code-point bounds per script, numerically (for the Arrow engine —
# MUST stay in lockstep with SCRIPT_RANGES above).
_SCRIPT_BOUNDS = {
    "latin": ((65, 90), (97, 122), (0xC0, 0x24F)),
    "cyrillic": ((0x400, 0x4FF),),
    "han": ((0x4E00, 0x9FFF),),
    "arabic": ((0x600, 0x6FF),),
}


def script_counts_arrow(text: Column) -> Column:
    """Arrow engine for script_counts: ONE pass over the code points
    (utf-32 decode + vectorized numpy range masks) instead of four
    JVM regex scans per document → array<bigint> of per-script counts
    in SCRIPT_RANGES order.

    Same SCALE §4d lesson as the SemDeDup Arrow engine, measured at
    the true 100× tier (500 k docs): the 4-regex JVM form costs
    49.1 s (each regexp_replace is a full regex-engine pass over the
    document); this engine does the identical counting arithmetic in
    one numpy pass. Counts are INTEGERS, so unlike the BLAS engine
    the results are bit-identical to the JVM form (equality-pinned by
    test_script_counts_arrow_equals_jvm) and the DuckDB oracle still
    verifies the same values."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bounds = tuple(_SCRIPT_BOUNDS[name] for name in SCRIPT_RANGES)

    def _count(s):
        out = []
        for x in s:
            if not x:
                out.append([0] * len(bounds))
                continue
            cp = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32)
            row = []
            for rngs in bounds:
                m = np.zeros(len(cp), dtype=bool)
                for lo, hi in rngs:
                    m |= (cp >= lo) & (cp <= hi)
                row.append(int(m.sum()))
            out.append(row)
        return pd.Series(out)

    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "array<bigint>")(text)


def build_keyword_index(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Offline inverted-index build — the production half of BM25
    mining: curation pipelines query a corpus repeatedly (domain
    bootstrapping, eval sourcing), and re-exploding the token stream
    per query (bm25_topk's in-flight form) re-pays the dominant cost
    every time. Returns (postings, stats):

    - postings: (term, doc_id, tf, dl) — one row per distinct
      (term, doc); at scale, WRITE THIS partitioned/bucketed by term
      (sources/bucketed.py) so a query's isin() prunes to its terms'
      buckets and the df/score joins are shuffle-free;
    - stats: one row (n_docs, avgdl) — the corpus constants.

    Scoring from the index is value-identical to the in-flight form
    (test_bm25_from_index_equals_inflight): df(t) is the posting count
    of t either way."""
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_w")
    ).select(
        id_col,
        F.size("_w").alias("dl"),
        F.explode("_w").alias("term"),
    )
    postings = toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    stats = docs.select(token_count(F.col(text_col)).alias("_dl0")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("_dl0").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    return postings, stats


def bm25_topk_from_index(
    postings,
    stats,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 top-k over a prebuilt keyword index (build_keyword_index):
    identical Okapi scoring and integer micro-score determinism as
    bm25_topk, but the per-query cost is an isin() prune of the
    postings (partition-pruned when the index is stored
    term-partitioned) instead of a full token explode."""
    from pyspark.sql import Window

    terms = [str(t) for t in query_terms]
    hits = postings.filter(F.col("term").isin(terms))
    df_t = hits.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    contrib = (
        hits.join(df_t, "term")
        .crossJoin(stats)
        .select(
            id_col,
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
                * 1e6
            )
            .cast("long")
            .alias("_c"),
        )
    )
    topk = (
        contrib.groupBy(id_col)
        .agg(F.sum("_c").cast("bigint").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w)).withColumn(
        "score", F.round(F.col("score_micro").cast("double") / 1e6, 6)
    )


# ---------------------------------------------------------------------------
# Entropy / compressibility — the near-zero-entropy spam tier
# ---------------------------------------------------------------------------


def char_trigram_entropy(text: Column) -> Column:
    """Shannon entropy (bits) of the sliding character-3-gram
    distribution of a document — the cheap near-zero-entropy junk
    detector the Gopher word-statistics battery lacks (keyboard mash,
    repeated boilerplate, and template spam all collapse to a handful
    of trigrams; natural prose sits around 6–9 bits). The published
    cousin is RedPajama-Data-v2's ``rps_doc_unigram_entropy`` signal
    (entropy of the token distribution) — this is the
    sub-word-resolution variant that also fires on single-"word"
    repetition like ``aaaaaaaa…``.

    Arrow lane (SCALE §4d engine lesson): one vectorized numpy pass
    per batch — code points → windowed 3-gram codes → np.unique
    counts — instead of a quadratic JVM HOF (counting each distinct
    gram with a filter() scan is O(L²) per doc). Computed as
    H = log2(n) − (Σ c·log2 c)/n over integer counts c, the exact
    expression a DuckDB oracle states over unnested substrings —
    cross-engine float agreement to well under the 6dp rounding the
    registry convention uses. NULL for NULL/too-short (< 3 chars)
    input."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _h(s):
        out = []
        for x in s:
            if x is None or len(x) < 3:
                out.append(None)
                continue
            cp = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            # pack each 3-gram into one u64 (21 bits/code point spans
            # all of Unicode) — unique on a scalar beats unique on str
            g = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
            c = np.unique(g, return_counts=True)[1].astype(np.float64)
            n = float(c.sum())
            out.append(float(np.log2(n) - (c * np.log2(c)).sum() / n))
        return pd.Series(out, dtype="float64")

    _h.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_h, "double")(text)


def unigram_entropy(toks: Column) -> Column:
    """Shannon entropy (bits) of the token-unigram distribution —
    RedPajama-Data-v2's ``rps_doc_unigram_entropy`` signal (theirs is
    stated in nats; bits = nats / ln 2, same ordering). Takes the
    already-tokenized array so Spark and the oracle share ONE token
    definition (functions.text.tokens ≡ the registry's _WORDS_SQL).
    Same H = log2(n) − (Σ c·log2 c)/n form as char_trigram_entropy;
    NULL for NULL/empty token arrays."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _h(s):
        out = []
        for x in s:
            if x is None or len(x) == 0:
                out.append(None)
                continue
            c = pd.Series(x).value_counts().to_numpy(dtype=np.float64)
            n = float(c.sum())
            out.append(float(np.log2(n) - (c * np.log2(c)).sum() / n))
        return pd.Series(out, dtype="float64")

    _h.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_h, "double")(toks)


def zlib_ratio(text: Column, level: int = 6) -> Column:
    """zlib-compressed size over raw UTF-8 size — the classic
    compressibility junk signal (repetitive spam compresses toward 0;
    natural prose lands ~0.3–0.6; the flag direction is LOW ratio =
    suspect, complementary to entropy which needs no compressor).
    Deterministic for a fixed zlib version/level but NOT
    SQL-expressible — the registry entry is rows-only, pinned by the
    direct-zlib reference test instead. NULL for NULL/empty text."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _r(s):
        import zlib

        out = []
        for x in s:
            if not x:
                out.append(None)
                continue
            b = x.encode("utf-8")
            out.append(len(zlib.compress(b, level)) / len(b))
        return pd.Series(out, dtype="float64")

    _r.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_r, "double")(text)
