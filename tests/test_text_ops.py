

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
