"""HTML → text extraction (operators/htmltext.py): contract unit
cases, three-way engine parity (Spark expr ≡ DuckDB oracle SQL ≡
pure-python twin, byte-for-byte), a deterministic fuzz sweep, and the
pipeline-closure test — text derived from html feeds the curation
gates exactly like a stored ``text`` column."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.htmltext import (
    HTML_ENTITY_STEPS,
    HTML_TEXT_REGEX_STEPS,
    html_text_expr,
    html_text_python,
    html_text_sql,
    pages_extract_text,
)


def _spark_one(spark, html: str | bytes | None) -> str | None:
    payload = html.encode("utf-8") if isinstance(html, str) else html
    df = spark.createDataFrame([(payload,)], "html binary")
    return df.select(html_text_expr(F.col("html")).alias("t")).collect()[0]["t"]


@pytest.mark.parametrize(
    "html,expect",
    [
        # tags become spaces; whitespace collapses; ends trimmed
        ("<b>bold</b> and <i>italic</i>", "bold and italic"),
        # comments vanish, dotall across lines
        ("a<!-- x\ny -->b", "a b"),
        # script/style containers vanish WITH their bodies
        ('<script type="x">var a = 1 < 2;</script>keep', "keep"),
        ("<style>p{color:red}</style>keep", "keep"),
        ("<SCRIPT>\nUPPER\n</SCRIPT  >keep", "keep"),
        # unterminated container: spelling falls through to tag strip,
        # body survives (documented)
        ("<script>never closed", "never closed"),
        # block closers and <br> are paragraph boundaries
        ("<p>one</p><p>two</p>", "one\ntwo"),
        ("line1<br>line2<BR/>line3<br   />line4", "line1\nline2\nline3\nline4"),
        ("<h1>H</h1><div>d</div><li>i</li>", "H\nd\ni"),
        # >=3 newlines collapse to a paragraph break (exactly 2)
        ("<p>x</p>\n\n\n\n<p>y</p>", "x\n\ny"),
        ("a\n\n\n\n\nb", "a\n\nb"),
        # entity decode, &amp; LAST: double-encoded stays encoded
        ("a &amp;amp; b", "a &amp; b"),
        ("&lt;i&gt; &quot;q&quot; &#39;s&apos; &nbsp;x", "<i> \"q\" 's' x"),
        # bare '<' eats to the next '>' (scan contract, documented)
        ("a < b and c > d", "a d"),
        # unterminated '<' with no '>' survives verbatim
        ("unterminated <tag with no close", "unterminated <tag with no close"),
        # \x0B is NOT whitespace in the shared dialect
        ("<p>one\x0btwo</p>", "one\x0btwo"),
        ("", ""),
        ("   \t \r\n  ", ""),
    ],
)
def test_contract_cases(spark, html, expect):
    assert html_text_python(html) == expect  # twin states the contract
    assert _spark_one(spark, html) == expect


def test_null_and_invalid_utf8(spark):
    assert _spark_one(spark, None) is None
    # invalid bytes become U+FFFD deterministically, never raise
    out = _spark_one(spark, b"\xff\xfe<p>x</p>")
    assert out == "�� x"


def test_entity_order_amp_last():
    # &amp; must be the final literal step or double-encoding breaks
    assert HTML_ENTITY_STEPS[-1][0] == "&amp;"


_FRAGMENTS = [
    "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<br/>",
    "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
    "<h2>", "</h2>", "<li>", "</li>", "<a href='/x'>", "</a>",
    "&amp;", "&lt;", "&gt;", "&nbsp;", "&#39;", "&amp;amp;",
    "word", "two words", "  spaced  ", "\n", "\r\n", "\t", "<",
    ">", "a<b", "x > y", "CAPS text", "unicode é 漢字", "\x0b",
    "1 &lt; 2", "<p", "p>", "<PONY>", "</TABLE >", "<tr>", "</tr>",
]


def _gen(rng: random.Random) -> str:
    return "".join(rng.choice(_FRAGMENTS) for _ in range(rng.randint(0, 40)))


def test_fuzz_three_way_parity(spark):
    """1000 generated documents: Spark ≡ DuckDB ≡ python twin,
    byte-for-byte (seeded — deterministic)."""
    rng = random.Random(20260819)
    docs = [_gen(rng) for _ in range(1000)]
    py = [html_text_python(d) for d in docs]

    con = duckdb.connect()
    sql = html_text_sql("s")
    db = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS s)", [d]).fetchone()[0]
        for d in docs
    ]
    assert db == py

    df = spark.createDataFrame(
        [(i, d.encode("utf-8")) for i, d in enumerate(docs)],
        "i int, html binary",
    )
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", html_text_expr(F.col("html")).alias("t")
        ).collect()
    }
    assert [got[i] for i in range(len(docs))] == py


def test_pages_extract_text_passthrough_and_bytes(spark):
    df = spark.createDataFrame(
        [("u1", "<p>héllo</p>".encode("utf-8"), "x")],
        "url string, html binary, lang string",
    )
    out = pages_extract_text(df)
    assert out.columns == ["url", "html", "lang", "text", "text_bytes"]
    row = out.collect()[0]
    assert row["text"] == "héllo"
    assert row["text_bytes"] == len("héllo".encode("utf-8"))  # octet, not char


def test_replaces_existing_text_column(spark):
    df = spark.createDataFrame(
        [("u1", b"<p>real</p>", "stale")],
        "url string, html binary, text string",
    )
    row = pages_extract_text(df).collect()[0]
    assert row["text"] == "real"


def test_plan_no_shuffle_single_codegen(spark):
    df = spark.createDataFrame([("u", b"<p>x</p>")], "url string, html binary")
    plan = pages_extract_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_sql_builder_patterns_quote_free():
    for pat, repl in HTML_TEXT_REGEX_STEPS:
        assert "'" not in pat and "'" not in repl
