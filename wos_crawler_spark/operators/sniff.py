"""Content sniffing for raw fetched payloads (the ``html:binary``
column of the pages table): BOM detection and a null-byte binary/text
heuristic — the gate a crawler runs BEFORE handing bytes to a parser
(the reference trusts WoS to serve well-formed text; a Common-Crawl
fetch stream does not get that luxury: PDFs, images and truncated
gzip bodies arrive on text endpoints all the time).

All pure Catalyst expressions over ``binary`` — hex-string pair
scanning instead of decode: decoding is where engines diverge (JVM
CharsetDecoder substitutes U+FFFD, DuckDB's decode ERRORS on invalid
UTF-8), while ``hex()`` is byte-faithful and identical everywhere, so
every verdict here is recomputable from scratch by the SQL oracle.
Costs are map-side over a bounded prefix (default 256 bytes) — the
payload itself never leaves the scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BOM hex prefixes, checked longest-first (UTF-32LE's FFFE0000 must
#: win over UTF-16LE's FFFE).
_BOMS: list[tuple[str, str]] = [
    ("utf-32be", "0000FEFF"),
    ("utf-32le", "FFFE0000"),
    ("utf-8", "EFBBBF"),
    ("utf-16be", "FEFF"),
    ("utf-16le", "FFFE"),
]


def sniff_bom(payload: Column) -> Column:
    """Encoding name from the byte-order mark, or NULL when none."""
    hx = F.hex(F.substring(payload, 1, 4))
    out = F.lit(None).cast("string")
    for name, prefix in reversed(_BOMS):
        out = F.when(hx.startswith(prefix), F.lit(name)).otherwise(out)
    # reversed + otherwise-chaining ⇒ the FIRST (longest) match wins
    return out


def null_bytes_in_prefix(payload: Column, prefix: int = 256) -> Column:
    """Count of 0x00 bytes in the first ``prefix`` bytes, via aligned
    hex-pair extraction (regexp_extract_all('..') consumes the hex
    string in non-overlapping order, so pairs stay byte-aligned —
    counting '00' substrings directly would also match the seam
    between 0x30 0x0A)."""
    hx = F.hex(F.substring(payload, 1, prefix))
    pairs = F.regexp_extract_all(hx, F.lit(".."), 0)
    return F.size(F.filter(pairs, lambda p: p == "00"))


def prefix_len(payload: Column, prefix: int = 256) -> Column:
    """Bytes actually inspected (min(len, prefix))."""
    return F.least(F.length(payload), F.lit(prefix))


def is_binary_payload(
    payload: Column, prefix: int = 256, num: int = 1, den: int = 16
) -> Column:
    """True when more than ``num/den`` of the inspected prefix is NUL
    (UTF-16/32 text is excluded first by its BOM — its even bytes are
    legitimately NUL). Integer cross-multiplication, no float ratio —
    the same oracle-exact threshold idiom as the Gopher rules."""
    nulls = null_bytes_in_prefix(payload, prefix)
    utf1632 = sniff_bom(payload).isin(
        "utf-16le", "utf-16be", "utf-32le", "utf-32be"
    )
    return ~F.coalesce(utf1632, F.lit(False)) & (
        nulls * den > prefix_len(payload, prefix) * num
    )


def sniff_payloads(
    df: DataFrame, payload_col: str = "html", prefix: int = 256
) -> DataFrame:
    """Annotate a pages frame with ``bom_encoding``, ``n_null_prefix``,
    ``payload_binary`` — one codegen'd projection."""
    p = F.col(payload_col)
    return df.select(
        "*",
        sniff_bom(p).alias("bom_encoding"),
        null_bytes_in_prefix(p, prefix).cast("long").alias("n_null_prefix"),
        is_binary_payload(p, prefix).alias("payload_binary"),
    )
