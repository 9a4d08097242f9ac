"""PII redaction for web-text corpora: emails, IPv4 addresses, and
phone numbers replaced by typed placeholder tokens, with per-type
match counts for the audit trail.

This is the regex-scrub stage every published web-corpus pipeline runs
before training (e.g. the BigScience ROOTS / BigCode StarCoder PII
pipelines use exactly this email/IP shape for the rule-based tier).
No reference-crawler analog (SURVEY.md has no PII row) — part of the
training-data family the brief adds.

Engine notes:

- Pure ``regexp_replace`` / ``regexp_count`` Catalyst expressions —
  codegen'd, zero Python, trivially map-side at any scale.
- The patterns deliberately use only syntax with IDENTICAL semantics
  in Java regex (Spark) and RE2 (DuckDB): character classes, bounded
  repetition, alternation, ``\\b`` word boundaries. No lookaround, no
  backreferences — so the DuckDB oracle recomputes redaction from
  scratch, byte-for-byte, with the same pattern strings.
- Counts are computed on the ORIGINAL text per type; replacement is
  applied sequentially (email → IPv4 → phone). Email runs before
  phone so a digit run inside a local-part is already collapsed into
  ``<EMAIL>`` and cannot double-count; both engines apply the same
  order. Matches are leftmost-first non-overlapping in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: One regex per PII type, applied (and counted) in this order.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = (
    r"\b(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    r"(\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}\b"
)
#: International +prefixed digit runs, or US-style 555-123-4567 /
#: 555.123.4567. Separator is a single literal - or . (no spaces:
#: whitespace-tolerant phone regexes false-positive on numeric prose).
PHONE_RE = r"\+[0-9]{7,15}\b|\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def pii_counts(text: Column) -> list[tuple[str, Column]]:
    """``[(type, count-column), ...]`` — matches of each pattern in the
    original text (audit columns ``n_<type>``)."""
    return [
        (name, F.regexp_count(text, F.lit(pat)))
        for name, pat, _ in PII_PATTERNS
    ]


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder,
    applied in PII_PATTERNS order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_documents(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Corpus-level redaction: replaces ``text_col`` (or writes
    ``out_col``) and appends ``n_email / n_ipv4 / n_phone`` counters.
    One codegen'd projection — no shuffle, no Python."""
    t = F.col(text_col)
    out = df
    for name, cnt in pii_counts(t):
        out = out.withColumn(f"n_{name}", cnt)
    return out.withColumn(out_col or text_col, redact_pii(t))
