"""Fuzzy duplicate strings (operators/fuzzy.py): completeness vs an
exact all-pairs reference (the pigeonhole guarantee), edge lengths,
and the no-cartesian plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.fuzzy import fuzzy_duplicate_strings


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _exact(strings, d):
    return sorted((min(a, b), max(a, b), _lev(a, b))
                  for a, b in itertools.combinations(sorted(set(strings)), 2)
                  if _lev(a, b) <= d)


def _corpus():
    # deterministic mutations of a seed set: substitutions, deletes,
    # inserts, plus short strings exercising the <= d path
    base = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
            "golf", "hotel", "india", "juliett"]
    out = list(base)
    for i, s in enumerate(base):
        out.append(s[:-1])                        # delete
        out.append(s + chr(97 + i % 26))          # insert
        out.append(("z" + s[1:]) if i % 2 else (s[:2] + "q" + s[3:]))
    out += ["a", "b", "ab", "ba", "abc", "", "xy"]
    return [s for s in out if s != ""] + [""] * 0


@pytest.mark.parametrize("d", [1, 2])
def test_output_equals_exact_all_pairs(spark, d):
    strings = _corpus()
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = sorted((r.s_a, r.s_b, r.dist) for r in
                 fuzzy_duplicate_strings(df, "s", d).collect())
    assert got == _exact(strings, d)


def test_duplicate_rows_collapse_to_values(spark):
    df = spark.createDataFrame([("cat",)] * 50 + [("cap",)] * 50
                               + [("dog",)], "s string")
    out = [(r.s_a, r.s_b, r.dist) for r in
           fuzzy_duplicate_strings(df, "s", 1).collect()]
    assert out == [("cap", "cat", 1)]


def test_nulls_ignored_and_validation(spark):
    df = spark.createDataFrame([("cat",), (None,), ("cot",)], "s string")
    assert fuzzy_duplicate_strings(df, "s", 1).count() == 1
    with pytest.raises(ValueError):
        fuzzy_duplicate_strings(df, "s", 0)


def test_every_join_is_an_equi_join(spark):
    df = spark.createDataFrame([(f"name{i:04d}",) for i in range(100)],
                               "s string")
    plan = (fuzzy_duplicate_strings(df, "s", 1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
