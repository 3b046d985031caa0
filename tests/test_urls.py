"""URL canonicalization (functions/urls.py) — every normalization step
pinned, plus group-level dedup and plan shape (pure projection)."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.functions.urls import (
    canonical_url_col,
    url_duplicate_groups,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in
            df.select(canonical_url_col("url").alias("c")).collect()]


CASES = [
    # fragment dropped
    ("https://site.com/a#sec", "https://site.com/a"),
    # authority lowercased, path case preserved
    ("HTTPS://Site.COM/Path/File", "https://site.com/Path/File"),
    # www. stripped
    ("https://www.site.com/a", "https://site.com/a"),
    # default ports
    ("http://site.com:80/a", "http://site.com/a"),
    ("https://site.com:443/a", "https://site.com/a"),
    # non-default port kept
    ("https://site.com:8443/a", "https://site.com:8443/a"),
    # :443 on http is NOT default — kept
    ("http://site.com:443/a", "http://site.com:443/a"),
    # tracking params dropped, rest byte-sorted
    ("https://s.com/p?utm_source=x&b=2&a=1", "https://s.com/p?a=1&b=2"),
    ("https://s.com/p?gclid=1&fbclid=2&msclkid=3&ref=r",
     "https://s.com/p"),
    # ref is exact-name: refresh survives
    ("https://s.com/p?refresh=1", "https://s.com/p?refresh=1"),
    # trailing slash (incl. root), multiple
    ("https://site.com/", "https://site.com"),
    ("https://site.com/a///", "https://site.com/a"),
    # whitespace trim
    ("  https://site.com/a  ", "https://site.com/a"),
    # everything at once
    ("  HTTP://WWW.Ex-Site.COM:80/Docs/?utm_campaign=c&z=9&a=1#top ",
     "http://ex-site.com/Docs?a=1&z=9"),
    # query case preserved
    ("https://s.com/p?Key=Val", "https://s.com/p?Key=Val"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_cases(spark, raw, want):
    assert _canon(spark, [raw]) == [want]


def test_canonical_is_idempotent(spark):
    once = _canon(spark, [r for r, _ in CASES])
    twice = _canon(
        spark, once)
    assert once == twice


def test_url_duplicate_groups(spark):
    rows = [
        (1, "https://www.site.com/a?utm_source=x"),
        (2, "HTTPS://site.com/a"),
        (3, "https://site.com/a/"),
        (4, "https://site.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_duplicate_groups(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.canonical_url, r.n_docs, r.keep_id) \
        == ("https://site.com/a", 3, 1)


def test_canonicalization_is_shuffle_free(spark):
    df = spark.createDataFrame([("https://x.com/a",)], "url string")
    plan = (df.select(canonical_url_col("url").alias("c"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_canonical_idempotent_property(spark):
    """Hypothesis: canonicalization is idempotent on arbitrary
    URL-shaped strings (canonical(canonical(u)) == canonical(u)) —
    the defining property of a dedup key function."""
    from hypothesis import given, settings, strategies as st

    part = st.text(
        alphabet="abcXYZ09-._~%&=?/#:", min_size=0, max_size=12)
    urls = st.builds(
        lambda scheme, host, rest: f"{scheme}://{host}/{rest}",
        st.sampled_from(["http", "HTTPS", "ftp"]),
        st.sampled_from(["www.Ex.com", "ex.com:8080", "EX.COM:80",
                         "a.b.co:443"]),
        part)

    collected = []

    @settings(max_examples=30, deadline=None)
    @given(urls)
    def gen(u):
        collected.append(u)

    gen()
    df = spark.createDataFrame([(u,) for u in collected], "url string")
    once = [r.c for r in
            df.select(canonical_url_col("url").alias("c")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r.c for r in
             df2.select(canonical_url_col("url").alias("c")).collect()]
    assert once == twice
