"""PII redaction: per-type counts, placeholder substitution,
sequential-order interactions, Java/RE2 cross-engine agreement (the
DuckDB re-run IS the oracle; here we pin the semantics)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.pii import (
    PII_PATTERNS,
    redact_documents,
    redact_pii,
)

CASES = [
    ("contact bob.smith+x@mail.example.co.uk today", 1, 0, 0,
     "contact <EMAIL> today"),
    ("server at 10.0.255.7 and 192.168.1.300", 0, 1, 0,
     "server at <IP> and 192.168.1.300"),  # .300 is not an octet
    ("call +4915112345678 or 555-123-4567", 0, 0, 2,
     "call <PHONE> or <PHONE>"),
    # \b keeps v1.2.3.4 (version string) unmatched: '1' sits inside a word
    ("v1.2.3.4 release", 0, 0, 0, "v1.2.3.4 release"),
    ("nothing here", 0, 0, 0, "nothing here"),
    ("a@b.io 1.2.3.4 555.123.4567", 1, 1, 1, "<EMAIL> <IP> <PHONE>"),
]


@pytest.fixture(scope="module")
def redacted(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(CASES)], "id long, text string"
    )
    rows = redact_documents(df, out_col="clean").orderBy("id").collect()
    return rows


def test_counts_and_text(redacted):
    for row, (text, n_e, n_i, n_p, clean) in zip(redacted, CASES):
        assert (row.n_email, row.n_ipv4, row.n_phone) == (n_e, n_i, n_p), text
        if clean is not None:
            assert row.clean == clean, text


def test_email_wins_over_phone_digits(spark):
    # digits inside an email local part must not double-count as phone
    r = redact_documents(
        spark.createDataFrame([(1, "x5551234567@mail.com")],
                              "id long, text string")
    ).first()
    assert (r.n_email, r.n_phone) == (1, 0)
    assert r.text == "<EMAIL>"


def test_duckdb_agreement(redacted):
    """Same patterns, same order, byte-identical output in RE2."""
    con = duckdb.connect()
    for row, (text, *_rest) in zip(redacted, CASES):
        expr, params = "?", [text]
        for _, pat, repl in PII_PATTERNS:
            expr = f"regexp_replace({expr}, ?, ?, 'g')"
            params += [pat, repl]
        duck = con.execute(f"select {expr}", params).fetchone()[0]
        assert duck == row.clean, text
        for (name, pat, _), got in zip(
            PII_PATTERNS, (row.n_email, row.n_ipv4, row.n_phone)
        ):
            n = con.execute(
                "select len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()[0]
            assert n == got, (name, text)


def test_null_text(spark):
    r = redact_documents(
        spark.createDataFrame([(1, None)], "id long, text string")
    ).first()
    assert r.text is None and r.n_email is None
