"""Synthetic engine-input tables (FIXTURES.md §1–§2), Spark-side.

``pages`` matches the BASELINE.json ``input_hint`` shape exactly:
``(url string, warc_ts timestamp, html binary, text string, lang
string)``. Generation is distributed (mapInPandas over ``spark.range``)
and keyed purely on the row id, so it scales to bench sizes (10⁶ rows
locally, same formula at 10¹⁰) with zero driver involvement and
identical bytes under any partitioning.

Iceberg production spec (jars not in this sandbox — parquet stands in):
``CREATE TABLE pages (...) USING iceberg
PARTITIONED BY (days(warc_ts), bucket(256, url))``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wos_crawler_spark.fixtures import wosgen

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_EPOCH = pd.Timestamp("2024-01-01T00:00:00")
_LANG_CODES = ["en", "zh", "de", "es"]


def gen_pages_pdf(
    ids: list[int],
    n_total: int,
    payload_fn=None,
    html_wrap: bool = True,
) -> pd.DataFrame:
    """Pure-pandas pages rows for the given ids (tests + oracle sim).
    ``payload_fn(i, n_total) -> str`` swaps the export serialization
    (plaintext default; tab/XML twins pass theirs) — url/warc_ts/lang
    derivations live HERE only, so every variant shares the exact row
    identity the shared snapshot oracles depend on."""
    payload_fn = payload_fn or wosgen.export_payload
    texts = [payload_fn(i, n_total) for i in ids]
    return pd.DataFrame(
        {
            "url": [wosgen.url_of(i) for i in ids],
            "warc_ts": [_EPOCH + pd.Timedelta(seconds=i % 86400) for i in ids],
            "html": [
                b"<html><body>" + t.encode("utf-8") + b"</body></html>"
                for t in texts
            ]
            if html_wrap
            else [None] * len(ids),
            "text": texts,
            "lang": [_LANG_CODES[i % 4] for i in ids],
        }
    )


def pages_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed pages table of n rows."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_pages_pdf(pdf["id"].tolist(), n)

    return rng.mapInPandas(_gen, PAGES_SCHEMA)


def _variant_pages_table(spark: SparkSession, n: int, partitions, payload_fn) -> DataFrame:
    """pages-shaped table with the same urls/records as pages_table but
    an alternative export serialization per page — so
    parse_*_pages(variant(n)) ≡ parse_pages(pages_table(n)) row for
    row (the shared-oracle property across export formats)."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            if ids:
                yield gen_pages_pdf(
                    ids, n,
                    payload_fn=lambda i, nt: payload_fn([i], nt),
                    html_wrap=False,
                )

    return rng.mapInPandas(_gen, PAGES_SCHEMA)


def tab_pages_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Tab-delimited export twin of :func:`pages_table`."""
    return _variant_pages_table(spark, n, partitions, wosgen.tab_export_payload)


def xml_pages_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """XML export twin of :func:`pages_table`."""
    return _variant_pages_table(spark, n, partitions, wosgen.xml_export_payload)


def seeds_table(spark: SparkSession, terms: list[tuple[str, int]] | None = None) -> DataFrame:
    """seeds(query_id, query, priority) — one advanced query per row
    (reference: one query per seed-file line, SURVEY.md S1)."""
    if terms is None:
        terms = [("frontier", 100), ("bloom", 50), ("shuffle", 10)]
    rows = [(i, f"TS=({t})", t, p) for i, (t, p) in enumerate(terms)]
    return spark.createDataFrame(
        rows, "query_id long, query string, term string, priority int"
    )


def robots_table(spark: SparkSession, rules: list[tuple[str, str, bool]] | None = None) -> DataFrame:
    """robots(host, rule_prefix, allow, rule_len) — longest-prefix-match
    rules (SURVEY.md F3). Default: deny a slice of the hot host."""
    if rules is None:
        rules = [
            (wosgen.HOT_HOST, "/rec/000001", False),
            (wosgen.HOT_HOST, "/", True),
        ]
    rows = [(h, p, a, len(p)) for h, p, a in rules]
    return spark.createDataFrame(
        rows, "host string, rule_prefix string, allow boolean, rule_len int"
    )


def links_table(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """links(src_url, dst_url): url i → (i*7+1) % n and (i*13+5) % n
    (FIXTURES.md §2), generated with pure exprs — no Python."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    dsts = F.array(
        (F.col("id") * 7 + 1) % n,
        (F.col("id") * 13 + 5) % n,
    )
    return (
        rng.select(F.col("id"), F.explode(dsts).alias("dst"))
        .select(_url_expr("id").alias("src_url"), _url_expr("dst").alias("dst_url"))
    )


def _anchor_markup(i: int, n: int) -> str:
    """HTML anchors encoding EXACTLY the links_table edges of url i
    (d1 = i*7+1, d2 = i*13+5 mod n), rotating through the quote styles
    and URL forms operators/htmllinks.py recognizes, plus always-on
    junk anchors it must drop — so
    ``links_from_pages(linked_pages_table(n)) ≡ links_table(n)``."""
    d1, d2 = (i * 7 + 1) % n, (i * 13 + 5) % n
    u1, u2 = wosgen.url_of(d1), wosgen.url_of(d2)
    s1 = i % 4
    if s1 == 0:
        a1 = f'<a href="{u1}">one</a>'
    elif s1 == 1:
        a1 = f"<a href='{u1}'>one</a>"
    elif s1 == 2:
        a1 = f"<a id=p href={u1[len('https:'):]}>one</a>"  # //host/…
    else:
        a1 = f'<A HREF="{u1}">one</A>'
    s2 = i % 3
    if s2 == 0:
        a2 = f'<a class=x href="  {u2}#sec ">two</a>'
    elif s2 == 1:
        a2 = f"<a href='{u2}#frag'>two</a>"
    else:
        a2 = f"<a href={u2}>two</a>"
    junk = (
        '<a href="#top">t</a><a href="mailto:x@example.org">m</a>'
        "<a href='javascript:void(0)'>j</a>"
    )
    return a1 + a2 + junk


def linked_pages_pdf(ids: list[int], n_total: int) -> pd.DataFrame:
    """pages rows identical to :func:`gen_pages_pdf` except html holds
    real anchor markup for the links_table edges (outlink-discovery
    fixture; the seed-matched ``text`` column is unchanged)."""
    pdf = gen_pages_pdf(ids, n_total)
    pdf["html"] = [
        (
            "<html><body>" + _anchor_markup(i, n_total) + "<p>text</p></body></html>"
        ).encode("utf-8")
        for i in ids
    ]
    return pdf


def linked_pages_table(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Distributed pages table whose html column encodes the
    links_table edges as ``<a href>`` anchors."""
    rng = spark.range(0, n, 1, partitions) if partitions else spark.range(n)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield linked_pages_pdf(pdf["id"].tolist(), n)

    return rng.mapInPandas(_gen, PAGES_SCHEMA)


def _url_expr(id_col: str):
    """Column expr mirror of wosgen.url_of / host_of (pure Catalyst)."""
    i = F.col(id_col)
    host = F.when(i % 10 < 3, F.lit(wosgen.HOT_HOST)).otherwise(
        F.concat(
            F.lit("h"),
            ((i * 2654435761) % wosgen.N_HOSTS).cast("string"),
            F.lit(".example.org"),
        )
    )
    return F.concat(
        F.lit("https://"), host, F.lit("/rec/"), F.lpad(i.cast("string"), 8, "0")
    )
