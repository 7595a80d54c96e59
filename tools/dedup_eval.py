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
    """Background corpus + planted near-dup pairs: each plant copies a
    base doc and perturbs ~10% of tokens (substitutions + one small
    deletion) — true Jaccard stays high but not 1.0, the regime every
    approximate family must catch. Plant ids start at 10_000_000."""
    from pyspark.sql import functions as F

    from ramen_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {r["doc_id"]: r["text"] for r in docs.limit(2 * n_pairs).collect()}
    rng = random.Random(13)
    rows, truth = [], set()
    for j, (did, text) in enumerate(sorted(base.items())[:n_pairs]):
        toks = text.split()
        if len(toks) < 20:
            continue
        out = list(toks)
        for _ in range(max(1, len(out) // 10)):
            out[rng.randrange(len(out))] = f"perturb{rng.randrange(999)}"
        del out[rng.randrange(len(out))]
        pid = 10_000_000 + j
        rows.append((pid, " ".join(out)))
        truth.add((did, pid))
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    return docs.unionByName(planted), truth


def main() -> None:
    from pyspark.sql import functions as F

    from ramen_spark import get_spark
    from ramen_spark.operators import dedup as D

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dedup_eval")
    corpus, truth = build_corpus(spark, sf_dir)
    n_true = len(truth)
    print(f"corpus: {corpus.count()} docs, {n_true} planted pairs")

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
    print(f"{'family':48s} {'pairs':>8s} {'recall':>7s}")
    lines = []
    for name, fn in families.items():
        got = norm_pairs(fn(), "id_a", "id_b")
        rec = sum(1 for p in truth if p in got) / n_true
        lines.append((name, len(got), rec))
        print(f"{name:48s} {len(got):8d} {rec:7.2%}")
    spark.stop()


if __name__ == "__main__":
    main()
