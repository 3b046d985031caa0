"""Bucketed-table seam: co-located joins/aggs with ZERO Exchange
(sources/table_provider.py write_bucketed/read_bucketed)."""

import pyspark.sql.functions as F
import pytest

from data_validation_spark.sources.table_provider import TableProvider


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def provider(spark, tmp_path):
    p = TableProvider(spark, str(tmp_path))
    yield p
    for t in ("b_seq", "b_labels"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, provider, sequences):
    # fixture contains intentional duplicate doc_ids (dedup-test rows);
    # bucket over the distinct keyset so the join is 1:1
    uniq = sequences.dropDuplicates(["doc_id"])
    n = uniq.count()
    labels = uniq.select("doc_id", (F.col("n_tok") % 5).alias("label"))
    provider.write_bucketed(uniq.select("doc_id", "n_tok", "source"),
                            "b_seq", ["doc_id"], 8, sort_cols=["doc_id"])
    provider.write_bucketed(labels, "b_labels", ["doc_id"], 8,
                            sort_cols=["doc_id"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = provider.read_bucketed("b_seq")
        b = provider.read_bucketed("b_labels")
        joined = a.join(b, "doc_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # control: the same join over PATH reads (no bucket metadata)
        # must shuffle — proves the assertion above is meaningful
        ap = spark.read.parquet(str(provider.root) + "/b_seq")
        bp = spark.read.parquet(str(provider.root) + "/b_labels")
        assert "Exchange" in _plan(ap.join(bp, "doc_id"))
        # correctness: identical result either way
        assert joined.count() == ap.join(bp, "doc_id").count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, provider, sequences):
    provider.write_bucketed(sequences.select("doc_id", "n_tok"),
                            "b_seq", ["doc_id"], 8)
    agg = (provider.read_bucketed("b_seq")
           .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")))
    assert "Exchange" not in _plan(agg), _plan(agg)
    # the doc_id-keyed uniqueness check is exactly this shape: over a
    # bucket(doc_id) table the whole pass is shuffle-free
    assert agg.filter(F.col("n") > 1).count() >= 0


def test_bucketed_read_column_prunes(spark, provider, sequences):
    provider.write_bucketed(sequences.select("doc_id", "n_tok", "source"),
                            "b_seq", ["doc_id"], 4)
    df = provider.read_bucketed("b_seq", columns=["doc_id"])
    assert df.columns == ["doc_id"]
    plan = _plan(df)
    assert "n_tok" not in plan.split("ReadSchema")[-1][:200]


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path,
                                                  sequences):
    p = TableProvider(spark, str(tmp_path))
    small = sequences.select("doc_id", "n_tok").limit(500)
    # simulate 6 micro-batch appends → many small files
    for _ in range(6):
        p.append(small.repartition(4), "acc")
    before = p.read("acc").count()
    stats = p.compact("acc", sort_cols=["doc_id"],
                      target_rows_per_file=2000)
    assert stats["n_rows"] == before == 3000
    assert stats["files_before"] >= 24
    assert stats["files_after"] == 2          # ceil(3000/2000)
    after = p.read("acc")
    assert after.count() == before
    # range clustering: each file's doc_id span must not overlap
    import pyspark.sql.functions as F
    spans = (after.groupBy(F.input_file_name().alias("f"))
             .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
             .collect())
    spans = sorted([(r.lo, r.hi) for r in spans])
    assert all(spans[i][1] <= spans[i + 1][0]
               for i in range(len(spans) - 1))


def test_compact_no_sort_cols(spark, tmp_path, sequences):
    p = TableProvider(spark, str(tmp_path))
    p.append(sequences.select("doc_id").limit(100).repartition(8), "acc2")
    stats = p.compact("acc2", n_files=1)
    assert stats["files_after"] == 1 and stats["n_rows"] == 100


def test_delete_keys_purges_exactly_and_audits(spark, tmp_path):
    """GDPR targeted delete: exactly the listed keys disappear, the
    audit counts reconcile, and the table survives atomically."""
    from data_validation_spark.sources.table_provider import TableProvider
    from pyspark.sql import functions as F
    tp = TableProvider(spark, str(tmp_path))
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("text"), F.col("id").cast("string")).alias("text"))
    tp.overwrite(df, "corpus")
    keys = spark.createDataFrame([(k,) for k in (3, 500, 999, 123456)],
                                 "doc_id long")
    report = tp.delete_keys("corpus", keys, ["doc_id"])
    assert report == {"n_rows_before": 1000, "n_deleted": 3,
                      "n_rows_after": 997}  # 123456 never existed
    left = tp.read("corpus")
    assert left.filter(F.col("doc_id").isin(3, 500, 999)).count() == 0
    assert left.count() == 997
    # survivors untouched (spot check content column)
    assert left.filter("doc_id = 4").collect()[0].text == "text4"
    # second purge of the same keys is a no-op with clean audit
    again = tp.delete_keys("corpus", keys, ["doc_id"])
    assert again == {"n_rows_before": 997, "n_deleted": 0,
                     "n_rows_after": 997}


def test_compact_refuses_bucketed_table(spark, provider, sequences):
    """ADVICE r3: a plain-repartition compaction of a bucketed table
    would orphan the catalog bucket spec — compact() must refuse."""
    uniq = sequences.dropDuplicates(["doc_id"]).limit(100)
    provider.write_bucketed(uniq.select("doc_id", "n_tok"),
                            "b_seq", ["doc_id"], 4)
    with pytest.raises(ValueError, match="bucket spec"):
        provider.compact("b_seq")
