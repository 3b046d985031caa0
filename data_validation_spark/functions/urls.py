"""URL canonicalization — pure Catalyst, engine-portable.

Web-crawl pipelines dedup by URL before they ever fetch or compare
content: the same page is seen as ``HTTP://WWW.Site.com:80/a/?utm_...``
and ``http://site.com/a``.  Canonicalization is a pure string
normalization, so it belongs in whole-stage codegen — one projection,
no UDF, no shuffle — and must be bit-reproducible across engines
(the canonical form IS the dedup key; an engine disagreement silently
splits or merges URL groups).  Every step below is replayed in DuckDB
by the ``url_canonical`` oracle.

Normalization applied (conservative, RFC 3986 §6 syntax-based subset +
the standard tracking-param strip):

1. trim; drop the ``#fragment``,
2. lowercase the ``scheme://host:port`` authority prefix (path and
   query case are significant and preserved),
3. drop a leading ``www.`` host label,
4. drop default ports (``http...:80``, ``https...:443``),
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), sort the surviving params byte-wise (param
   order is not semantic), drop the ``?`` if none survive,
6. strip trailing ``/`` from the path (root ``host/`` → ``host``).

RE2-compatible regexes only (no lookaround, no backrefs) so the same
patterns run on Spark (Java regex), DuckDB/RE2, and Hyperscan-class
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["canonical_url_col", "url_duplicate_groups"]

#: query params that never identify content
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref")

# one alternation, anchored at param start: utm_ is a prefix match, the
# rest must be exact names (ref=x strips, refresh=x survives)
_TRACK_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=.*)?$"


def canonical_url_col(url: str | Column = "url") -> Column:
    c = F.col(url) if isinstance(url, str) else url
    u = F.trim(c)
    # 1. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme://host:port, preserve the rest
    pre = F.regexp_extract(u, r"^([^/?#]*//[^/?#]*)", 1)
    u = F.concat(F.lower(pre), F.substring(u, F.length(pre) + 1,
                                           F.length(u)))
    # 3. leading www. label
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    # 4. default ports (optional tail group → empty when absent)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?].*)?$", "$1$2")
    # 5. query: filter tracking params, byte-sort the rest
    base = F.regexp_replace(u, r"\?.*$", "")
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(F.split(q, "&"),
                      lambda p: (p != "") &
                      ~p.rlike(_TRACK_RE))
    query = F.array_join(F.array_sort(params), "&")
    # 6. trailing slashes on the path part only
    base = F.regexp_replace(base, r"/+$", "")
    return F.when(query == "", base).otherwise(
        F.concat(base, F.lit("?"), query))


def url_duplicate_groups(df, url_col: str = "url",
                         id_col: str = "doc_id"):
    """URL-level dedup groups: ``(canonical_url, n_docs, keep_id)`` for
    every canonical URL seen more than once.  Same plan as the content
    exact-dedup: one projection (the canonicalization above) + one
    hash-groupBy shuffle keyed by the canonical string, partials
    map-side."""
    return (df.select(canonical_url_col(url_col).alias("canonical_url"),
                      F.col(id_col))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_docs") > 1))
