"""Cross-family dedup evaluation: plant known near-duplicate pairs,
run every text-dedup family on the same corpus, report recall and
candidate volume side by side.

The per-operator recall tests (test_plan_quality) each pin one
family; this harness answers the user's question — "which tier do I
run, and what does its approximation cost?" — with one measured
table (results recorded in SCALE.md §4e).

Usage: python tools/dedup_eval.py [sf_dir] (default sf0.01 docs as
the clean background).
"""

from __future__ import annotations

import random
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def build_corpus(spark, sf_dir: str, n_pairs: int = 60):
    """Background corpus + planted pairs at TWO severities: NEAR
    (1 substituted token — the re-crawl/boilerplate-shift regime) and
    MODERATE (~10% substitutions + one deletion — the paraphrase-ish
    regime). Each family's useful range shows up as which severity it
    recovers. Plant ids: near = 10M+j, moderate = 20M+j."""
    from ramen_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {r["doc_id"]: r["text"] for r in docs.limit(2 * n_pairs).collect()}
    rng = random.Random(13)
    rows = []
    truth = {"near": set(), "moderate": set()}
    for j, (did, text) in enumerate(sorted(base.items())[:n_pairs]):
        toks = text.split()
        if len(toks) < 20:
            continue
        near = list(toks)
        near[rng.randrange(len(near))] = f"perturb{rng.randrange(999)}"
        rows.append((10_000_000 + j, " ".join(near)))
        truth["near"].add((did, 10_000_000 + j))
        mod = list(toks)
        for _ in range(max(1, len(mod) // 10)):
            mod[rng.randrange(len(mod))] = f"perturb{rng.randrange(999)}"
        del mod[rng.randrange(len(mod))]
        rows.append((20_000_000 + j, " ".join(mod)))
        truth["moderate"].add((did, 20_000_000 + j))
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    return docs.unionByName(planted), truth


def main() -> None:
    from pyspark.sql import functions as F

    from ramen_spark import get_spark
    from ramen_spark.operators import dedup as D

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dedup_eval")
    corpus, truth = build_corpus(spark, sf_dir)
    print(
        f"corpus: {corpus.count()} docs, "
        f"{len(truth['near'])} near + {len(truth['moderate'])} moderate plants"
    )

    def norm_pairs(df, a, b):
        return {
            (min(r[a], r[b]), max(r[a], r[b])) for r in df.collect()
        }

    families = {
        "minhash_lsh (16 hashes, 8 bands, agree>=0.5)": lambda: D.minhash_lsh_pairs(
            corpus, num_hashes=16, bands=8, min_sig_agreement=0.5
        ).select("id_a", "id_b"),
        "ngram_jaccard exact (t=0.5)": lambda: D.ngram_jaccard_pairs(
            corpus, threshold=0.5
        ).select("id_a", "id_b"),
        "simhash (hamming band)": lambda: D.simhash_near_dups(corpus).select(
            "id_a", "id_b"
        ),
    }
    print(f"{'family':48s} {'pairs':>7s} {'near':>7s} {'moder.':>7s}")
    for name, fn in families.items():
        got = norm_pairs(fn(), "id_a", "id_b")
        recs = {
            sev: sum(1 for p in t if p in got) / max(len(t), 1)
            for sev, t in truth.items()
        }
        print(
            f"{name:48s} {len(got):7d} "
            f"{recs['near']:7.2%} {recs['moderate']:7.2%}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
