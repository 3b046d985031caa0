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
