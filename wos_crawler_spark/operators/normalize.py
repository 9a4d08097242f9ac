"""Normalization of parsed documents into relational tables.

Reference behavior: SQLAlchemy ORM object graph committed to SQLite —
``ref:wos_crawler/model/wos_document.py`` declarative models with FK
children Author/Affiliation/Keyword/KeywordPlus/Category/ResearchArea/
Funding/Reference † (SURVEY.md D4/S8).

Spark-first: the parser emits ONE nested DataFrame; each child table is
an ``explode`` projection — no shuffle at all (narrow transforms), and
each write is an independent columnar append. Idempotency vs the ORM's
per-record session.add: ``dropDuplicates('unique_id')`` before write
(A5), or Iceberg ``MERGE INTO`` in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALAR_COLS = [
    "url",
    "unique_id",
    "title",
    "abstract",
    "journal",
    "journal_iso",
    "publisher",
    "volume",
    "issue",
    "start_page",
    "end_page",
    "pub_year",
    "pub_month_day",
    "document_type",
    "doi",
    "issn",
    "eissn",
    "language",
    "funding_text",
    "reference_num",
    "cited_times",
    "usage_count",
    "extracted_text",
]


def documents_table(parsed: DataFrame) -> DataFrame:
    return parsed.select(*_SCALAR_COLS)


def authors_table(parsed: DataFrame) -> DataFrame:
    a = parsed.select("unique_id", F.explode("authors").alias("a"))
    return a.select(
        "unique_id",
        F.col("a.rank").alias("rank"),
        F.col("a.first_name").alias("first_name"),
        F.col("a.last_name").alias("last_name"),
        F.col("a.full_name").alias("full_name"),
        F.col("a.is_reprint").alias("is_reprint"),
    )


def affiliations_table(parsed: DataFrame) -> DataFrame:
    a = parsed.select("unique_id", F.explode("authors").alias("a"))
    return a.select(
        "unique_id",
        F.col("a.rank").alias("author_rank"),
        F.explode("a.affiliations").alias("address"),
    )


def _string_list_table(parsed: DataFrame, col: str, out: str) -> DataFrame:
    return parsed.select("unique_id", F.explode(col).alias(out))


def keywords_table(parsed: DataFrame) -> DataFrame:
    return _string_list_table(parsed, "keywords", "keyword")


def keywords_plus_table(parsed: DataFrame) -> DataFrame:
    return _string_list_table(parsed, "keywords_plus", "keyword")


def categories_table(parsed: DataFrame) -> DataFrame:
    return _string_list_table(parsed, "categories", "category")


def research_areas_table(parsed: DataFrame) -> DataFrame:
    return _string_list_table(parsed, "research_areas", "research_area")


def fundings_table(parsed: DataFrame) -> DataFrame:
    f = parsed.select("unique_id", F.explode("fundings").alias("f"))
    return f.select(
        "unique_id",
        F.col("f.agent").alias("agent"),
        F.explode_outer("f.numbers").alias("number"),
    )


def references_table(parsed: DataFrame) -> DataFrame:
    r = parsed.select("unique_id", F.explode("references").alias("r"))
    return r.select(
        "unique_id",
        F.col("r.first_author").alias("first_author"),
        F.col("r.pub_year").alias("pub_year"),
        F.col("r.journal").alias("journal"),
        F.col("r.volume").alias("volume"),
        F.col("r.start_page").alias("start_page"),
        F.col("r.doi").alias("doi"),
    )


def normalize_all(parsed: DataFrame) -> dict[str, DataFrame]:
    """All eight normalized tables from one parsed DataFrame. Cache the
    parsed input first if materializing several."""
    return {
        "documents": documents_table(parsed),
        "authors": authors_table(parsed),
        "affiliations": affiliations_table(parsed),
        "keywords": keywords_table(parsed),
        "keywords_plus": keywords_plus_table(parsed),
        "categories": categories_table(parsed),
        "research_areas": research_areas_table(parsed),
        "fundings": fundings_table(parsed),
        "references_": references_table(parsed),
    }


def citation_links(parsed: DataFrame) -> DataFrame:
    """J6: self-join references_ ⋈ documents on DOI — citation edges the
    normalized schema exists for (SURVEY.md §2.3). DOIs are
    case-insensitive by spec and WoS CR lines routinely carry uppercase
    variants of a lowercase DI — the join key is lowercased on both
    sides (the emitted ``doi`` keeps the reference's original bytes)."""
    refs = references_table(parsed).filter(F.col("doi").isNotNull())
    docs = documents_table(parsed).select(
        F.col("unique_id").alias("cited_uid"), F.col("doi").alias("cited_doi")
    )
    return refs.join(
        docs, F.lower(refs.doi) == F.lower(docs.cited_doi), "inner"
    ).select(F.col("unique_id").alias("citing_uid"), "cited_uid", "doi")
