"""HTML → text extraction from the ``html:binary`` column of the
pages table — the derivation of the input_hint's ``text`` column that
the fetch loop implies: fetch (J3) → **strip markup/boilerplate** →
``text`` → lang-ID / quality / dedup (the whole curation family
already operates on ``text``). Together with
``operators/htmllinks.links_from_pages`` (frontier side) this closes
the last derived column of the (url, warc_ts, html, text, lang) table:
every downstream operator can now run from raw fetched bytes alone.

The reference's parsers consume WoS export records, not web HTML
(SURVEY.md §2.4); a Common-Crawl-style corpus (BASELINE.json
north_rule / input_hint) needs a deterministic markup stripper, so the
contract here is a pinned, documented subset of HTML — a SCAN, not a
DOM parse — chosen so every step lives in the Java∩RE2 common regex
dialect (same discipline as the PII redactor and htmllinks):

- no ``\\s`` (Java's ASCII ``\\s`` includes ``\\x0B``, RE2's does
  not): explicit ``[ \\t\\r\\n\\f]`` classes;
- no ``(?i)`` (RE2 Unicode simple folding vs Java ASCII default):
  explicit ``[Ss][Cc]...`` classes;
- no lookaround, no backreferences (RE2 has neither).

The ordered step list below IS the contract; the Spark expression,
the DuckDB oracle SQL, and the pure-python twin are all generated
from it, so the three can never diverge silently.

Pipeline (order matters and is part of the contract):

1. comments ``<!-- ... -->`` → one space (dotall; non-greedy);
2. ``<script ...>...</script>`` and ``<style ...>...</style>``
   containers → one space (dotall; non-greedy; an unterminated
   container keeps its spelling and falls through to the generic tag
   strip — its BODY then survives as text, documented);
3. paragraph-boundary tags → newline: ``<br>``/``<br/>`` and the
   CLOSING tags of p, div, h1–h6, li, tr, table (the boundaries the
   C4-style per-line dedup and Gopher line rules key on);
4. every remaining tag ``<[^>]*>`` → one space (an unterminated
   ``<`` with no ``>`` survives verbatim — a scan cannot know it was
   markup);
5. entity decode — LITERAL replaces (engine-identical), most-specific
   first and ``&amp;`` LAST, so double-encoded markup stays encoded
   (``&amp;lt;`` → ``&lt;``, never ``<``): nbsp, lt, gt, quot,
   #39, apos, amp. Numeric entities beyond ``&#39;`` are left
   verbatim — neither engine's regexp_replace can compute chr(NN)
   in a replacement;
6. whitespace normalization: runs of ``[ \\t\\f\\r]`` → one space;
   spaces hugging a newline are absorbed into it; runs of 3+
   newlines → exactly 2 (paragraph break); leading/trailing
   whitespace trimmed.

Invalid UTF-8 payloads: decoded via ``cast(string)`` +
``make_valid_utf8`` — invalid sequences become U+FFFD
deterministically and the scan never throws (Spark 4's ANSI
``decode`` raises MALFORMED_CHARACTER_CODING; htmllinks has the same
note). Binary payloads should be gated out first with
``operators.sniff.is_binary_payload``. NULL html → NULL text.

Plan shape: one projection, zero shuffles, zero joins — the payload
is consumed inside the scan's codegen span and only the extracted
text leaves it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Java∩RE2 stand-in for \s (see module docstring).
_WS = " \\t\\r\\n\\f"


def _ci(word: str) -> str:
    """Case-insensitive literal as explicit classes (no (?i))."""
    return "".join(
        f"[{c.upper()}{c.lower()}]" if c.isalpha() else c for c in word
    )


def _container(tag: str) -> str:
    """Dotall non-greedy ``<tag ...> ... </tag ...>`` container."""
    t = _ci(tag)
    return f"(?s)<{t}([{_WS}][^>]*)?>.*?</{t}[{_WS}]*>"


#: boundary tags whose CLOSE becomes a newline (step 3).
_BLOCK_CLOSERS = ["p", "div", "li", "tr", "table"]

#: (pattern, replacement) — regex steps, applied in order with
#: global replacement in every engine. Replacements contain no
#: ``$`` / ``\\`` so Java-replacement and RE2-replacement agree.
HTML_TEXT_REGEX_STEPS: list[tuple[str, str]] = [
    ("(?s)<!--.*?-->", " "),
    (_container("script"), " "),
    (_container("style"), " "),
    (
        f"<{_ci('br')}[{_WS}]*/?>|"
        + "|".join(f"</{_ci(t)}[{_WS}]*>" for t in _BLOCK_CLOSERS)
        + f"|</[Hh][1-6][{_WS}]*>",
        "\n",
    ),
    ("<[^>]*>", " "),
]

#: (needle, replacement) — LITERAL replaces (step 5); order is part
#: of the contract (&amp; last).
HTML_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

#: (pattern, replacement) — whitespace normalization (step 6). The
#: final trim is btrim(TRIM_CHARS), not a ^/$ regex — Java, RE2 and
#: python disagree on whether ``$`` can match before a final newline,
#: so anchors are banned from the shared dialect entirely.
WHITESPACE_STEPS: list[tuple[str, str]] = [
    ("[ \\t\\f\\r]+", " "),
    (" *\\n *", "\n"),
    ("\\n{3,}", "\n\n"),
]

#: characters stripped from both ends after normalization.
TRIM_CHARS = " \n"


def html_text_expr(html: Column) -> Column:
    """Extracted text for one ``html:binary`` column — the step list
    above compiled to chained ``regexp_replace`` / ``replace`` exprs.
    Pure codegen; NULL html → NULL."""
    out = F.make_valid_utf8(html.cast("string"))
    for pat, repl in HTML_TEXT_REGEX_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for needle, repl in HTML_ENTITY_STEPS:
        out = F.replace(out, F.lit(needle), F.lit(repl))
    for pat, repl in WHITESPACE_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return F.btrim(out, F.lit(TRIM_CHARS))


def html_text_sql(expr: str) -> str:
    """The SAME step chain as DuckDB SQL over an input expression —
    the oracle twin (generated from the shared lists, byte-identical
    by construction). Patterns are injected as single-quoted SQL
    literals; none of them contains a quote character (asserted)."""
    out = expr
    for pat, repl in HTML_TEXT_REGEX_STEPS:
        assert "'" not in pat and "'" not in repl
        # dotall is in-pattern ((?s)) — the one spelling Java and RE2
        # share — so the only DuckDB option needed is 'g'.
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    for needle, repl in HTML_ENTITY_STEPS:
        r = repl.replace("'", "''")
        out = f"replace({out}, '{needle}', '{r}')"
    for pat, repl in WHITESPACE_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return f"trim({out}, ' ' || chr(10))"


def html_text_python(html: str | None) -> str | None:
    """Pure-python twin (``re`` is also missing \\x0B from \\s? no —
    python's \\s INCLUDES \\x0B, which is exactly why the shared
    patterns never use \\s). Used by the fuzz tests as the
    independent third implementation."""
    import re

    if html is None:
        return None
    out = html
    for pat, repl in HTML_TEXT_REGEX_STEPS:
        out = re.sub(pat, repl, out)
    for needle, repl in HTML_ENTITY_STEPS:
        out = out.replace(needle, repl)
    for pat, repl in WHITESPACE_STEPS:
        out = re.sub(pat, repl, out)
    return out.strip(TRIM_CHARS)


def pages_extract_text(
    pages: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Drop-in derivation of the input_hint ``text`` column: the
    input DataFrame with ``text`` replaced/added from ``html`` plus
    ``text_bytes`` (octet length — CJK-correct, same rule as the
    crawl metrics). Columns other than ``text``/``text_bytes`` pass
    through untouched."""
    passthrough = [
        c for c in pages.columns if c not in ("text", "text_bytes")
    ]
    return pages.select(
        *[F.col(c) for c in passthrough],
        html_text_expr(F.col(html_col)).alias("text"),
    ).withColumn("text_bytes", F.octet_length("text"))
