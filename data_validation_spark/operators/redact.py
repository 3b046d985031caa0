"""PII detection and redaction over document text — the pre-training
scrub pass (emails, phone numbers, IP addresses, SSN-shaped ids).

Pure Catalyst ``regexp_count`` / ``regexp_replace`` — JVM-side,
whole-stage codegen, no UDF, no shuffle: a projection that fuses into
whatever scan or pipeline surrounds it, so redaction at 100 TB costs
one pass over the text bytes.

Pattern design constraints (deliberate):

* portable regex subset — character classes, bounded quantifiers and
  ``\\b`` only (no lookaround, no backrefs), so Java's engine (Spark),
  RE2 (DuckDB/Go tooling) and Python ``re`` all agree — which is what
  lets the driver oracle replay redaction byte-for-byte in DuckDB;
* conservative recall over precision — this is the SCRUB pass of a
  data pipeline, not a PII classifier; patterns favor simple shapes
  that never catastrophically backtrack;
* replacement order is the dict order of ``PII_PATTERNS`` and
  sentinels are angle-bracket tokens that no pattern can re-match, so
  chained replacement is confluent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: class -> (regex, sentinel).  Order matters: earlier classes are
#: redacted first (e.g. SSN before generic phone shapes).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\+\d[\d \-]{7,}\d", "<PHONE>"),
}


def pii_count_cols(text: str | Column = "text") -> list[Column]:
    """One ``n_<class>`` count column per PII class."""
    c = F.col(text) if isinstance(text, str) else text
    return [F.regexp_count(c, F.lit(rx)).alias(f"n_{name}")
            for name, (rx, _) in PII_PATTERNS.items()]


def redacted_col(text: str | Column = "text",
                 classes: list[str] | None = None) -> Column:
    """The text with every selected PII class replaced by its sentinel
    (chained ``regexp_replace`` in ``PII_PATTERNS`` order)."""
    c = F.col(text) if isinstance(text, str) else text
    for name, (rx, sentinel) in PII_PATTERNS.items():
        if classes is None or name in classes:
            c = F.regexp_replace(c, rx, sentinel)
    return c


def pii_report(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts — the audit pass a pipeline runs before
    deciding to scrub vs drop."""
    return df.select(F.col(id_col), *pii_count_cols(text_col))


def redact_pii(df: DataFrame, text_col: str = "text",
               classes: list[str] | None = None) -> DataFrame:
    """``df`` with ``text_col`` scrubbed in place."""
    return df.withColumn(text_col, redacted_col(text_col, classes))


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int, sensitive_col: str | None = None
                       ) -> DataFrame:
    """Re-identification risk audit — the release-side complement of
    the PII scrub: after direct identifiers are redacted, a row is
    still re-identifiable when its QUASI-identifier combination
    (zip × age × gender …) is shared by fewer than ``k`` rows.  One
    summary row:

    ``n_rows, n_groups, k, n_groups_below_k, n_rows_below_k`` (the
    rows an adversary can pin to < k candidates), ``min_group_size``,
    and with ``sensitive_col`` the l-diversity tail: ``min_l`` (the
    smallest number of distinct sensitive values inside any quasi
    group) and ``n_groups_l1`` (groups where the sensitive value is
    CONSTANT — k-anonymity holds but the attribute still leaks).

    Scale shape: value-collapse first — ``(quasi…, sensitive)`` groups,
    map-side combinable, shuffle carries group cardinality — then a
    per-quasi-group integer agg and one summary agg; no distinct, no
    window, all-integer output.  NULL quasi/sensitive values count as
    values (a NULL zip code still buckets people together)."""
    if sensitive_col is None:
        groups = (df.groupBy(*quasi_cols)
                  .agg(F.count(F.lit(1)).alias("g"))
                  .withColumn("l", F.lit(None).cast("long")))
    else:
        pairs = (df.groupBy(*quasi_cols, sensitive_col)
                 .agg(F.count(F.lit(1)).alias("c")))
        groups = (pairs.groupBy(*quasi_cols)
                  .agg(F.sum("c").alias("g"),
                       F.count(F.lit(1)).alias("l")))
    kk = F.lit(int(k))
    agg = [
        F.sum("g").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        kk.cast("int").alias("k"),
        F.sum(F.when(F.col("g") < kk, 1).otherwise(0))
        .alias("n_groups_below_k"),
        F.coalesce(F.sum(F.when(F.col("g") < kk, F.col("g"))), F.lit(0))
        .alias("n_rows_below_k"),
        F.min("g").alias("min_group_size"),
    ]
    if sensitive_col is not None:
        agg += [F.min("l").alias("min_l"),
                F.sum(F.when(F.col("l") == 1, 1).otherwise(0))
                .alias("n_groups_l1")]
    return groups.agg(*agg)


def k_anonymity_violating_groups(df: DataFrame, quasi_cols: list[str],
                                 k: int) -> DataFrame:
    """The quasi-identifier combinations below ``k`` with their sizes
    — the rows to generalize/suppress before release.  Same collapse
    as the report; output is group-scale (only violators)."""
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("group_size"))
            .filter(F.col("group_size") < int(k)))


def pseudonymize(df: DataFrame, cols: list[str], salt: str,
                 length: int = 16) -> DataFrame:
    """Deterministic keyed pseudonymization — the middle ground
    between redaction (destroys joins) and plaintext (leaks): each
    listed column becomes ``sha2(salt || value, 256)`` truncated to
    ``length`` hex chars, so equal values map to equal tokens (joins,
    group-bys and frequency analysis still work downstream) while the
    original is unrecoverable without the salt.  NULL stays NULL (a
    missing value must not gain a token that joins with other
    missing values).  Pure projection — fuses into any surrounding
    scan, no shuffle, no UDF.

    The salt is the SECRET: rotate it per release, store it beside
    the key material, never beside the data.  Truncation trades
    collision resistance for storage — 16 hex chars = 64 bits keeps
    birthday collisions negligible below ~10⁹ distinct values; pass
    ``length=64`` for the full digest at 10¹²-key scale."""
    out = df
    for c in cols:
        tok = F.sha2(F.concat(F.lit(salt), F.col(c).cast("string")),
                     256).substr(1, int(length))
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out
