"""PII detection / redaction over text columns.

Training-data hygiene: count and strip personally-identifying strings
(emails, IPv4 addresses, SSN-shaped ids, phone-shaped digit runs)
before a corpus ships.  Everything here is JVM-side ``regexp_count`` /
``regexp_replace`` — codegen'd, zero Python, a pure projection (no
shuffle), so it runs at scan speed on 10^12 rows and composes with any
filter pushdown.

The default patterns deliberately use the portable regex subset
(character classes, bounded repetition, ``\\b``, non-capturing
groups — no lookaround, no backreferences) that Java's engine, RE2
(DuckDB/Go), and PCRE all interpret identically, so the DuckDB oracle
can run the VERY SAME pattern strings.  They are recall-oriented
screens, not validators (an IPv4 octet > 255 still matches — curation
wants the flag either way).

For a pass/fail gate, feed the scan into the validation layer::

    from datatest_spark import validate
    counts = pii_scan(df, "text", id_col="doc_id")
    validate(counts.where("pii_total > 0"), ...)  # or accepted.count(N)
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["DEFAULT_PII_PATTERNS", "pii_scan", "pii_redact"]

#: name -> portable regex (identical semantics in Java regex and RE2)
DEFAULT_PII_PATTERNS: Mapping[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b\+?[0-9][0-9()\- ]{6,}[0-9]\b",
}


def pii_scan(df: DataFrame, column: str, id_col: Optional[str] = None,
             patterns: Optional[Mapping[str, str]] = None) -> DataFrame:
    """Per-row PII match counts: one ``n_<name>`` column per pattern
    plus ``pii_total``.  Keeps ``id_col`` (or all input columns when
    ``id_col`` is None) so the result joins back or feeds a filter.
    Null text counts zero everywhere (the row is kept)."""
    pats = dict(DEFAULT_PII_PATTERNS if patterns is None else patterns)
    if not pats:
        raise ValueError("patterns must not be empty")
    text = F.coalesce(F.col(column), F.lit(""))
    counts = [
        F.regexp_count(text, F.lit(p)).alias(f"n_{name}")
        for name, p in pats.items()
    ]
    base = df.select(id_col, *counts) if id_col else df.select("*", *counts)
    total = None
    for name in pats:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return base.withColumn("pii_total", total)


def pii_redact(df: DataFrame, column: str,
               patterns: Optional[Mapping[str, str]] = None,
               replacement: str = "[PII]",
               out_col: Optional[str] = None) -> DataFrame:
    """Replace every PII match with ``replacement`` (in ``out_col``,
    default: overwrite ``column``).  Patterns apply in iteration
    order; each is a separate JVM ``regexp_replace`` in one fused
    projection — still scan-speed."""
    pats = dict(DEFAULT_PII_PATTERNS if patterns is None else patterns)
    expr = F.col(column)
    for p in pats.values():
        expr = F.regexp_replace(expr, F.lit(p), F.lit(replacement))
    return df.withColumn(out_col or column, expr)
