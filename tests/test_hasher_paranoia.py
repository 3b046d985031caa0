"""Driver-hasher paranoia sweep (VERDICT r3 #8): every oracle-backed
``queries()`` entry must match its DuckDB oracle at sf0.01 under THREE
normalizers — check_entry's lenient one, full ``repr`` (typed values),
and type-name-prefixed cells — so a `sessionize`-class representation
flake (Decimal vs int, rounded double at a 6-dp boundary) is caught
here before the driver's unknown hasher sees it.

One module-scoped sweep job; per-query results asserted in a single
test with a full failure listing (parametrizing 104 Spark jobs would
hide the shared-session economy).

Fourth check (VERDICT r4 #2): ``fetchall()`` launders DuckDB HUGEINT
into plain Python ints, so none of the three value normalizers can see
what an Arrow-fetching driver sees (``decimal128(38,0)`` cells that
hash-mismatch Spark's int64).  We therefore also fetch every oracle via
``.arrow()`` and assert NO column — at any nesting depth — materializes
as an Arrow decimal type.  Oracles must cast integer window/sum results
to BIGINT explicitly (this check flags the exact `sessionize.session_seq`
red that survived three driver rounds).
"""

import sys

import duckdb
import pytest


def _decimal_paths(dtype, path):
    """Yield dotted paths of decimal-typed fields anywhere in dtype."""
    import pyarrow.types as pat

    if pat.is_decimal(dtype):
        yield path
    elif pat.is_list(dtype) or pat.is_large_list(dtype):
        yield from _decimal_paths(dtype.value_type, path + "[]")
    elif pat.is_struct(dtype):
        for i in range(dtype.num_fields):
            f = dtype.field(i)
            yield from _decimal_paths(f.type, f"{path}.{f.name}")
    elif pat.is_map(dtype):
        yield from _decimal_paths(dtype.key_type, path + "<key>")
        yield from _decimal_paths(dtype.item_type, path + "<val>")

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.mark.slow
def test_all_oracle_pairs_under_three_normalizers(spark):
    import __spark_entry__ as e
    from tools.normalizers import compare_rows, first_diff, NORMALIZERS

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    problems = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        sdf = fn(spark, SF_DIR)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        oschema = con.sql(oracles[name]).arrow().schema
        for field in oschema:
            for where in _decimal_paths(field.type, field.name):
                problems.append(
                    f"{name}[arrow-schema]: column {where} is "
                    f"{field.type} — an Arrow-fetching driver hasher "
                    f"sees Decimal cells vs Spark's int64; cast the "
                    f"oracle column to BIGINT/DOUBLE explicitly")
        odf = con.sql(oracles[name])
        ocols, orows = [d[0] for d in odf.description], odf.fetchall()
        if sorted(scols) != sorted(ocols):
            problems.append(f"{name}: columns {sorted(scols)} vs "
                            f"{sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            problems.append(f"{name}: rows {len(srows)} vs {len(orows)}")
            continue
        verdicts = compare_rows(srows, scols, orows, ocols)
        for norm_name, ok in verdicts.items():
            if not ok:
                s_only, o_only = first_diff(
                    srows, scols, orows, ocols, NORMALIZERS[norm_name])
                problems.append(
                    f"{name}[{norm_name}]: spark-only={s_only} "
                    f"oracle-only={o_only}")
    assert not problems, (
        f"{len(problems)} normalizer mismatches:\n  " +
        "\n  ".join(problems))
