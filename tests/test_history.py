"""SCD2 interval builder: collapse semantics, interval chaining,
determinism, point-in-time reconstruction, single-Exchange plan."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.history import (
    as_of_snapshot, scd2_intervals)


@pytest.fixture(scope="module")
def stream(spark):
    # (key, ts, seq, status, tier) — restatements, a revert, NULLs
    rows = [
        ("k1", 10, 1, "A", "gold"),
        ("k1", 20, 2, "A", "gold"),     # restated → collapses
        ("k1", 30, 3, "B", "gold"),     # status change → v2
        ("k1", 40, 4, "B", "gold"),     # restated → collapses
        ("k1", 50, 5, "A", "gold"),     # REVERT → v3 (not deduped)
        ("k2", 15, 6, "A", "silver"),   # single-record key
        ("k3", 10, 7, None, "gold"),    # NULL attr opens history
        ("k3", 20, 8, None, "gold"),    # NULL == NULL → collapses
        ("k3", 30, 9, "X", None),       # both attrs flip → v2
        ("k3", 40, 10, None, "gold"),   # flip back to NULLs → v3
    ]
    return spark.createDataFrame(
        rows, "key string, ts long, seq long, status string, "
              "tier string")


def _hist(stream):
    return scd2_intervals(stream, ["key"], "ts", ["status", "tier"],
                          order_cols=("seq",))


def test_collapse_and_versions(stream):
    out = {(r.key, r.version): r for r in _hist(stream).collect()}
    assert len(out) == 7                      # 3 + 1 + 3 versions
    k1 = [out[("k1", v)] for v in (1, 2, 3)]
    assert [r.status for r in k1] == ["A", "B", "A"]
    assert [r.valid_from for r in k1] == [10, 30, 50]
    assert [r.valid_to for r in k1] == [30, 50, None]
    assert [r.is_current for r in k1] == [False, False, True]
    k2 = out[("k2", 1)]
    assert (k2.valid_from, k2.valid_to, k2.is_current) == (15, None,
                                                           True)
    k3 = [out[("k3", v)] for v in (1, 2, 3)]
    assert [(r.status, r.tier) for r in k3] == [
        (None, "gold"), ("X", None), (None, "gold")]
    assert [r.valid_to for r in k3] == [30, 40, None]


def test_intervals_chain_exactly(stream):
    """Every non-final valid_to equals the next version's valid_from —
    no gaps, no overlaps."""
    rows = sorted(_hist(stream).collect(),
                  key=lambda r: (r.key, r.version))
    for a, b in zip(rows, rows[1:]):
        if a.key == b.key:
            assert a.valid_to == b.valid_from


def test_duplicate_ts_deterministic(spark):
    """Same-instant rows order by order_cols: the LAST by seq wins the
    instant, and reruns agree."""
    df = spark.createDataFrame(
        [("k", 10, 2, "B"), ("k", 10, 1, "A"), ("k", 20, 3, "C")],
        "key string, ts long, seq long, status string")
    out = scd2_intervals(df, ["key"], "ts", ["status"],
                         order_cols=("seq",))
    got = [(r.version, r.status, r.valid_from, r.valid_to)
           for r in sorted(out.collect(), key=lambda r: r.version)]
    assert got == [(1, "A", 10, 10), (2, "B", 10, 20),
                   (3, "C", 20, None)]


def test_as_of_snapshot(stream):
    hist = _hist(stream)
    # at t=35: k1 is B (v2), k2 is A, k3 is X (v2)
    snap = {r.key: r for r in as_of_snapshot(hist, 35).collect()}
    assert snap["k1"].status == "B" and snap["k1"].version == 2
    assert snap["k2"].status == "A"
    assert snap["k3"].status == "X"
    # at t=5: before every interval → empty
    assert as_of_snapshot(hist, 5).count() == 0
    # boundary: at == valid_from matches the NEW version
    assert as_of_snapshot(hist, 30).where("key='k1'") \
        .collect()[0].status == "B"


def test_single_exchange(stream):
    plan = _hist(stream)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_requires_attrs(stream):
    with pytest.raises(ValueError):
        scd2_intervals(stream, ["key"], "ts", [])


# -- incremental fold (scd2_apply_batch / streaming_scd2) ----------------

def _fold(spark, batches, schema):
    """Fold batches through scd2_apply_batch, tracking current/history
    as plain lists — the table-free replay of streaming_scd2."""
    from data_validation_spark.operators.history import scd2_apply_batch
    cur_schema = ("key string, status string, tier string, "
                  "version int, valid_from long")
    cur_rows, hist_rows, late_rows = [], [], []
    for batch in batches:
        bdf = spark.createDataFrame(batch, schema)
        cdf = spark.createDataFrame(cur_rows, cur_schema)
        hist, new_cur, late = scd2_apply_batch(
            bdf, cdf, ["key"], "ts", ["status", "tier"],
            order_cols=("seq",))
        hist_rows += [tuple(r) for r in hist.collect()]
        late_rows += [tuple(r) for r in late.collect()]
        touched = {r[0] for r in new_cur.collect()}
        cur_rows = ([r for r in cur_rows if r[0] not in touched]
                    + [(r.key, r.status, r.tier, r.version, r.valid_from)
                       for r in new_cur.collect()])
    return cur_rows, hist_rows, late_rows


def test_incremental_fold_equals_batch_rebuild(spark):
    """The streaming invariant: folding batches one at a time must
    reproduce scd2_intervals over the concatenated stream exactly —
    versions, intervals, open rows."""
    from data_validation_spark.operators.history import scd2_intervals
    schema = "key string, ts long, seq long, status string, tier string"
    batches = [
        [("k1", 10, 1, "A", "g"), ("k1", 20, 2, "A", "g"),   # restate
         ("k2", 10, 3, "X", None)],
        [("k1", 30, 4, "B", "g"),                            # change
         ("k2", 40, 5, "X", None),                           # restate @ boundary
         ("k3", 35, 6, "Q", "s")],                           # new key
        [("k1", 50, 7, "A", "g"),                            # revert
         ("k1", 60, 8, "A", "s"),                            # tier flip
         ("k3", 55, 9, "Q", "s")],                           # restate
    ]
    cur_rows, hist_rows, _ = _fold(spark, batches, schema)

    all_df = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    want = scd2_intervals(all_df, ["key"], "ts", ["status", "tier"],
                          order_cols=("seq",))
    want_hist = {tuple(r) for r in
                 want.where("valid_to IS NOT NULL").collect()}
    want_cur = {(r.key, r.status, r.tier, r.version, r.valid_from)
                for r in want.where("valid_to IS NULL").collect()}
    assert set(hist_rows) == want_hist
    assert set(cur_rows) == want_cur


def test_fold_quarantines_late_rows(spark):
    """A record older than its key's open valid_from is returned as
    late, not folded; everything else proceeds."""
    schema = "key string, ts long, seq long, status string, tier string"
    batches = [
        [("k1", 10, 1, "A", "g"), ("k1", 30, 2, "B", "g")],
        [("k1", 20, 3, "C", "g"),                            # LATE (<30)
         ("k1", 40, 4, "D", "g")],
    ]
    cur_rows, hist_rows, late_rows = _fold(spark, batches, schema)
    assert late_rows == [("k1", 20, 3, "C", "g")]
    assert {(r[0], r[1], r[2]) for r in cur_rows} == {("k1", "D", "g")}
    versions = sorted((r[5], r[1]) for r in hist_rows)  # (version, status)
    assert versions == [(1, "A"), (2, "B")]


def test_streaming_scd2_end_to_end(spark, tmp_path):
    """Two drains of a file source maintain current/history/late
    tables that match the batch rebuild of the on-time stream."""
    from data_validation_spark.operators.history import scd2_intervals
    from data_validation_spark.sources.table_provider import TableProvider
    from data_validation_spark.streaming.validate import (
        SCD2_CURRENT_TABLE, SCD2_HISTORY_TABLE, SCD2_LATE_TABLE,
        SCD2_REPORT_TABLE, streaming_scd2)

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = TableProvider(spark, str(tmp_path / "out"))
    schema = "key string, ts long, seq long, status string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = streaming_scd2(stream, sink, ["key"], "ts", ["status"],
                           order_cols=("seq",), checkpoint_dir=ckpt)
        q.awaitTermination(120)

    b1 = [("u1", 10, 1, "new"), ("u1", 20, 2, "new"),
          ("u2", 15, 3, "trial")]
    b2 = [("u1", 30, 4, "paid"), ("u2", 25, 5, "trial"),
          ("u2", 5, 6, "stale"),                       # LATE
          ("u3", 40, 7, "new")]
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    drain()
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    drain()

    on_time = [r for r in b1 + b2 if r[:3] != ("u2", 5, 6)]
    want = scd2_intervals(
        spark.createDataFrame(on_time, schema), ["key"], "ts",
        ["status"], order_cols=("seq",))
    want_cur = {(r.key, r.status, r.version, r.valid_from)
                for r in want.where("valid_to IS NULL").collect()}
    want_hist = {(r.key, r.status, r.version, r.valid_from, r.valid_to)
                 for r in want.where("valid_to IS NOT NULL").collect()}
    got_cur = {(r.key, r.status, r.version, r.valid_from)
               for r in sink.read(SCD2_CURRENT_TABLE).collect()}
    got_hist = {(r.key, r.status, r.version, r.valid_from, r.valid_to)
                for r in sink.read(SCD2_HISTORY_TABLE).collect()}
    assert got_cur == want_cur
    assert got_hist == want_hist
    assert [tuple(r) for r in sink.read(SCD2_LATE_TABLE).collect()] \
        == [("u2", 5, 6, "stale")]
    reports = sorted((r.n_batch, r.n_late, r.n_open) for r in
                     sink.read(SCD2_REPORT_TABLE).collect())
    assert reports == [(3, 0, 2), (4, 1, 3)]


# -- cdc_apply (SCD1 latest-wins merge) ---------------------------------------

def test_cdc_apply_upsert_delete_insert(spark):
    from data_validation_spark.operators.history import cdc_apply
    base = spark.createDataFrame(
        [("k1", 10, "a"), ("k2", 10, "b"), ("k3", 10, "c")],
        "key string, ts long, val string")
    changes = spark.createDataFrame(
        [("k1", 20, "a2", "U"),      # update
         ("k2", 20, None, "D"),      # delete
         ("k4", 20, "d", "I"),       # insert
         ("k3", 5, "stale", "U")],   # OLDER than base -> base wins
        "key string, ts long, val string, op string")
    out = {r.key: r for r in
           cdc_apply(base, changes, ["key"], "ts", op_col="op")
           .collect()}
    assert set(out) == {"k1", "k3", "k4"}
    assert out["k1"].val == "a2"
    assert out["k3"].val == "c"        # stale change lost
    assert "op" not in cdc_apply(base, changes, ["key"], "ts",
                                 op_col="op").columns


def test_cdc_apply_change_wins_exact_tie(spark):
    from data_validation_spark.operators.history import cdc_apply
    base = spark.createDataFrame([("k", 10, "old")],
                                 "key string, ts long, val string")
    changes = spark.createDataFrame([("k", 10, "new", "U")],
                                    "key string, ts long, val string, "
                                    "op string")
    out = cdc_apply(base, changes, ["key"], "ts", op_col="op").collect()
    assert out[0].val == "new"


def test_cdc_apply_delete_then_reinsert_in_one_batch(spark):
    from data_validation_spark.operators.history import cdc_apply
    base = spark.createDataFrame([("k", 10, "old")],
                                 "key string, ts long, val string")
    changes = spark.createDataFrame(
        [("k", 20, None, "D"), ("k", 30, "back", "I")],
        "key string, ts long, val string, op string")
    out = cdc_apply(base, changes, ["key"], "ts", op_col="op").collect()
    assert [r.val for r in out] == ["back"]


def test_cdc_apply_single_exchange(spark):
    from data_validation_spark.operators.history import cdc_apply
    base = spark.range(100).select(
        F.col("id").alias("key"), F.lit(1).alias("ts"))
    ch = spark.range(50).select(
        F.col("id").alias("key"), F.lit(2).alias("ts"))
    plan = cdc_apply(base, ch, ["key"], "ts")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_provider_upsert_fold_equals_single_shot(spark, tmp_path):
    """Folding CDC batches through TableProvider.upsert == ONE
    cdc_apply over the concatenated changes, when (ts, batch_seq)
    totally orders each key's records — the CI gate for incremental
    snapshot maintenance."""
    from data_validation_spark.operators.history import cdc_apply
    from data_validation_spark.sources.table_provider import TableProvider

    schema = "key long, ts long, val string, op string, batch int"
    b1 = spark.createDataFrame(
        [(k, 10, f"v{k}", "U", 1) for k in range(20)], schema)
    b2 = spark.createDataFrame(
        [(5, 20, "v5b", "U", 2), (6, 20, None, "D", 2),
         (99, 20, "new", "I", 2)], schema)
    b3 = spark.createDataFrame(
        [(5, 20, "v5c", "U", 3),      # same ts as b2 -> batch wins
         (6, 30, "back", "I", 3)], schema)

    tp = TableProvider(spark, str(tmp_path))
    for b in (b1, b2, b3):
        rep = tp.upsert("snap", b, ["key"], "ts", op_col="op",
                        order_cols=("batch",))
    assert rep["n_rows_after"] == 21    # 20 + insert 99; 6 deleted+back

    folded = {r.key: r for r in tp.read("snap").collect()}
    empty = b1.drop("op").limit(0)
    single = {r.key: r for r in
              cdc_apply(empty, b1.unionByName(b2).unionByName(b3),
                        ["key"], "ts", op_col="op",
                        order_cols=("batch",)).collect()}
    assert set(folded) == set(single)
    for k in folded:
        assert folded[k].val == single[k].val, k
    assert folded[5].val == "v5c" and folded[6].val == "back"


def test_provider_upsert_bootstrap_and_report(spark, tmp_path):
    from data_validation_spark.sources.table_provider import TableProvider
    tp = TableProvider(spark, str(tmp_path))
    b = spark.createDataFrame(
        [(1, 10, "a", "U"), (2, 10, None, "D")],
        "key long, ts long, val string, op string")
    rep = tp.upsert("t", b, ["key"], "ts", op_col="op")
    # bootstrap: delete of a never-seen key is a no-op
    assert rep == {"n_rows_before": 0, "n_changes": 2,
                   "n_rows_after": 1}
    assert tp.read("t").collect()[0].val == "a"
    assert "op" not in tp.read("t").columns
