

def test_repetition_stats(spark):
    import pytest
    from data_validation_spark.functions.text import repetition_stats_exprs
    df = spark.createDataFrame(
        [(1, "a b c d"),            # all distinct
         (2, "a a a a"),            # fully repetitive
         (3, "x y x y x y"),        # repeating bigram
         (4, ""),                   # empty
         (5, "one")],               # single word, no bigrams
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *repetition_stats_exprs("text")).collect()}
    assert out[1]["dup_word_frac"] == 0.0
    assert out[2]["dup_word_frac"] == 0.75          # 3 of 4 beyond first
    assert out[2]["dup_2gram_frac"] == pytest.approx(2 / 3)
    assert out[3]["dup_word_frac"] == pytest.approx(4 / 6)
    # bigrams: xy yx xy yx xy -> 2 distinct of 5 -> 3/5 duplicated
    assert out[3]["dup_2gram_frac"] == pytest.approx(3 / 5)
    assert out[4]["dup_word_frac"] == 0.0 and out[4]["dup_2gram_frac"] == 0.0
    assert out[5]["dup_2gram_frac"] == 0.0
