"""WET source — Common Crawl's text-conversion sibling of WARC
(ISO 28500 record framing, ``WARC-Type: conversion``). The round's
input_hint is an Iceberg table of Common-Crawl-style pages; WET files
are how that text actually arrives from a crawl, so this module is
the ingest seam: WET bytes → the engine's page-table shape
``(url, warc_ts, text, n_bytes)``.

Reference seam: the single-node crawler reads exported result files
from a directory (SURVEY §2.1 S7 — txt/tab/bib scans); WET is the
web-scale analog of those export serializations, parsed with the same
discipline (header block + length-framed payload, byte-exact text).

Format (public spec): each record is ``WARC/1.0\\r\\n``, header lines
``Name: value\\r\\n``, blank line, then EXACTLY ``Content-Length``
bytes of payload, then ``\\r\\n\\r\\n``. Payload text may itself
contain ``WARC/1.0`` lines — records MUST be walked by
Content-Length, never split on the magic (the classic WET-parsing
bug; test-pinned here). Files lead with a ``warcinfo`` record.

Scale shape: files are the parallelism unit — a Common Crawl segment
is ~10^5 WET files, and ``read_wet`` maps one task per file via the
binaryFile source (one Arrow pass per file, zero shuffles), which is
exactly how production Spark jobs walk CC dumps. Malformed records
degrade gracefully: the parser resyncs to the next record magic and
keeps going (one corrupt record cannot kill a 400 MB file's task,
mirroring parse_xml's per-file try/except contract).

Determinism: serialization sorts records by url within each group;
parsing preserves file order; text survives byte-identical (the
Content-Length framing is computed on UTF-8 octets, not characters).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"WARC/1.0\r\n"
_HDR_END = b"\r\n\r\n"


# ------------------------------------------------------------ builders


def wet_record_bytes(url: str, date: str, text: str) -> bytes:
    """One ``conversion`` record. ``date`` is the WARC-Date string
    (``yyyy-MM-ddTHH:mm:ssZ``); ``text`` is framed by its UTF-8 octet
    length."""
    body = (text or "").encode("utf-8")
    head = (
        f"WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("utf-8")
    return _MAGIC + head + b"\r\n" + body + b"\r\n\r\n"


def wet_file_bytes(records: Iterable[tuple[str, str, str]]) -> bytes:
    """A whole WET file: leading ``warcinfo`` record, then one
    ``conversion`` record per ``(url, date, text)``."""
    info_body = b"software: wos_crawler_spark\r\nformat: WET\r\n"
    info = (
        _MAGIC
        + (
            f"WARC-Type: warcinfo\r\n"
            f"Content-Type: application/warc-fields\r\n"
            f"Content-Length: {len(info_body)}\r\n"
        ).encode("utf-8")
        + b"\r\n"
        + info_body
        + b"\r\n\r\n"
    )
    return info + b"".join(
        wet_record_bytes(u, d, t) for (u, d, t) in records
    )


# -------------------------------------------------------------- parser


def parse_wet_bytes(
    blob: bytes,
) -> Iterator[tuple[str, str, str, int]]:
    """Walk one WET blob by Content-Length, yielding
    ``(url, warc_date, text, n_bytes)`` for every well-formed
    ``conversion`` record. Malformed records (missing/invalid
    Content-Length, truncated payload, undecodable header) resync to
    the next record magic instead of raising."""
    pos = 0
    n = len(blob)
    while True:
        pos = blob.find(_MAGIC, pos)
        if pos < 0:
            return
        hdr_start = pos + len(_MAGIC)
        hdr_end = blob.find(_HDR_END, hdr_start)
        if hdr_end < 0:
            return
        try:
            headers = {}
            for line in blob[hdr_start:hdr_end].decode("utf-8").split(
                "\r\n"
            ):
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError(length)
        except (KeyError, ValueError, UnicodeDecodeError):
            pos = hdr_start  # resync past this magic
            continue
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + length
        if body_end > n:
            pos = hdr_start  # truncated payload — resync
            continue
        if headers.get("warc-type") == "conversion":
            try:
                text = blob[body_start:body_end].decode("utf-8")
            except UnicodeDecodeError:
                pos = hdr_start
                continue
            yield (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                text,
                length,
            )
        pos = body_end


# ---------------------------------------------------- DataFrame plumbing

_PARSED_SCHEMA = "url string, warc_date string, text string, n_bytes long"


def parse_wet(df: DataFrame, bytes_col: str = "content") -> DataFrame:
    """Parse a binary WET-blob column into records — one Arrow pass,
    zero shuffles; each input row (file) fans out to its records."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, texts, sizes = [], [], [], []
            for blob in pdf[bytes_col]:
                if blob is None:
                    continue
                for u, d, t, nb in parse_wet_bytes(bytes(blob)):
                    urls.append(u)
                    dates.append(d)
                    texts.append(t)
                    sizes.append(nb)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_date": dates,
                    "text": texts,
                    "n_bytes": sizes,
                }
            )

    return df.mapInPandas(_parse, _PARSED_SCHEMA)


def with_warc_ts(parsed: DataFrame) -> DataFrame:
    """Attach the page-table timestamp: ``warc_ts`` parsed from the
    WARC-Date string (NULL if malformed — try_, never a task kill)."""
    return parsed.withColumn(
        "warc_ts",
        F.try_to_timestamp(
            F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
        ),
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET directory → page table ``(url, warc_ts, text, n_bytes)``.
    One task per file (binaryFile source; files ARE the parallelism
    unit over a crawl dump), column-pruned to the blob."""
    files = spark.read.format("binaryFile").load(path).select("content")
    return with_warc_ts(parse_wet(files)).select(
        "url", "warc_ts", "text", "n_bytes"
    )


def serialize_wet(
    df: DataFrame,
    group_col: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    text_col: str = "text",
) -> DataFrame:
    """Inverse plumbing (and fixture builder): one WET blob per
    ``group_col`` value — ``(group, wet binary)``. Records sort by
    url within the group so the blob is deterministic regardless of
    upstream partitioning."""

    gname = group_col

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        blob = wet_file_bytes(
            zip(pdf[url_col], pdf[date_col], pdf[text_col].fillna(""))
        )
        return pd.DataFrame({gname: [key[0]], "wet": [blob]})

    gtype = df.schema[group_col].dataType.simpleString()
    return df.groupBy(group_col).applyInPandas(
        _build, f"{gname} {gtype}, wet binary"
    )


# ------------------------------------------- WARC response records
#
# The raw sibling of WET: ``WARC-Type: response`` records carry the
# full HTTP response (status line, headers, blank line, body bytes) as
# the Content-Length-framed payload. This is how the input_hint's
# ``html:binary`` column actually arrives from a crawl — WET delivers
# the text side, this delivers the raw side that htmltext/htmllinks
# consume. Same framing walk, same resync-on-malformed discipline;
# the HTTP body is NEVER decoded (html is binary by contract —
# make_valid_utf8 happens downstream, per htmllinks' rules).


def warc_response_record_bytes(
    url: str, date: str, status: int, ctype: str, body: bytes
) -> bytes:
    """One ``response`` record wrapping an HTTP/1.1 response. The
    WARC Content-Length frames the WHOLE HTTP message (status line +
    headers + CRLFCRLF + body) — the spec's block, and the classic
    off-by-headers bug when people frame only the body."""
    http_head = (
        f"HTTP/1.1 {status} X\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("utf-8")
    http = http_head + b"\r\n" + body
    head = (
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode("utf-8")
    return _MAGIC + head + b"\r\n" + http + b"\r\n\r\n"


def warc_file_bytes(
    records: Iterable[tuple[str, str, int, str, bytes]],
) -> bytes:
    """A whole WARC file: warcinfo, then one ``response`` record per
    ``(url, date, status, content_type, body_bytes)``."""
    info_body = b"software: wos_crawler_spark\r\nformat: WARC\r\n"
    info = (
        _MAGIC
        + (
            f"WARC-Type: warcinfo\r\n"
            f"Content-Type: application/warc-fields\r\n"
            f"Content-Length: {len(info_body)}\r\n"
        ).encode("utf-8")
        + b"\r\n"
        + info_body
        + b"\r\n\r\n"
    )
    return info + b"".join(
        warc_response_record_bytes(u, d, s, c, b)
        for (u, d, s, c, b) in records
    )


def parse_warc_bytes(
    blob: bytes,
) -> Iterator[tuple[str, str, object, object, bytes, int]]:
    """Walk one WARC blob by Content-Length, yielding ``(url,
    warc_date, status, content_type, html, n_bytes)`` for every
    ``response`` record. The HTTP envelope is parsed leniently: a
    payload with no header terminator or an unparseable status line
    yields (None, None, whole payload) — a fetched page is never
    dropped for a mangled envelope, mirroring the crawl loop's
    never-lose-a-fetch contract; only record-level malformation
    (bad/missing WARC Content-Length, truncation) resyncs."""
    pos = 0
    n = len(blob)
    while True:
        pos = blob.find(_MAGIC, pos)
        if pos < 0:
            return
        hdr_start = pos + len(_MAGIC)
        hdr_end = blob.find(_HDR_END, hdr_start)
        if hdr_end < 0:
            return
        try:
            headers = {}
            for line in blob[hdr_start:hdr_end].decode("utf-8").split(
                "\r\n"
            ):
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError(length)
        except (KeyError, ValueError, UnicodeDecodeError):
            pos = hdr_start
            continue
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + length
        if body_end > n:
            pos = hdr_start
            continue
        if headers.get("warc-type") == "response":
            payload = blob[body_start:body_end]
            status: object = None
            ctype: object = None
            body = payload
            he = payload.find(_HDR_END)
            if he >= 0:
                body = payload[he + len(_HDR_END):]
                try:
                    lines = payload[:he].decode("latin-1").split("\r\n")
                    parts = lines[0].split(" ")
                    if parts[0].startswith("HTTP/") and len(parts) >= 2:
                        status = int(parts[1])
                    for line in lines[1:]:
                        k, _, v = line.partition(":")
                        if k.strip().lower() == "content-type":
                            ctype = v.strip()
                except (ValueError, IndexError):
                    status = None
            yield (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                status,
                ctype,
                body,
                len(body),
            )
        pos = body_end


_WARC_SCHEMA = (
    "url string, warc_date string, status int, content_type string, "
    "html binary, n_bytes long"
)


def parse_warc(df: DataFrame, bytes_col: str = "content") -> DataFrame:
    """Binary WARC-blob column → response records; one Arrow pass,
    zero shuffles, html stays binary."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "url": [], "warc_date": [], "status": [],
                "content_type": [], "html": [], "n_bytes": [],
            }
            for blob in pdf[bytes_col]:
                if blob is None:
                    continue
                for u, d, s, c, b, nb in parse_warc_bytes(bytes(blob)):
                    cols["url"].append(u)
                    cols["warc_date"].append(d)
                    cols["status"].append(s)
                    cols["content_type"].append(c)
                    cols["html"].append(b)
                    cols["n_bytes"].append(nb)
            yield pd.DataFrame(cols)

    return df.mapInPandas(_parse, _WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC directory → raw page table ``(url, warc_ts, status,
    content_type, html, n_bytes)`` — the input_hint shape with html
    binary. One task per file."""
    files = spark.read.format("binaryFile").load(path).select("content")
    return with_warc_ts(parse_warc(files)).select(
        "url", "warc_ts", "status", "content_type", "html", "n_bytes"
    )


def serialize_warc(
    df: DataFrame,
    group_col: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    status_col: str = "status",
    ctype_col: str = "content_type",
    html_col: str = "html",
) -> DataFrame:
    """Inverse plumbing / fixture builder: one WARC blob per group,
    records url-sorted for partitioning-invariant bytes."""
    gname = group_col

    def _build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        blob = warc_file_bytes(
            zip(
                pdf[url_col],
                pdf[date_col],
                pdf[status_col],
                pdf[ctype_col],
                (bytes(b) if b is not None else b"" for b in pdf[html_col]),
            )
        )
        return pd.DataFrame({gname: [key[0]], "warc": [blob]})

    gtype = df.schema[group_col].dataType.simpleString()
    return df.groupBy(group_col).applyInPandas(
        _build, f"{gname} {gtype}, warc binary"
    )
