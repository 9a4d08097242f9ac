"""Parser golden tests — SURVEY.md §5.2(1): byte-identity of
``extracted_text`` plus field-level assertions for every edge fixture."""

import glob
import os

import pytest

from wos_crawler_spark.fixtures import wosgen
from wos_crawler_spark.operators import normalize
from wos_crawler_spark.operators.parse_plaintext import parse_export_text, parse_pages

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "plaintext")


def _load(name):
    with open(os.path.join(FIXDIR, name), encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(FIXDIR, "*.txt")))
)
def test_extracted_text_byte_identity(path):
    """The canonical serialization must match the pinned bytes exactly."""
    with open(path, encoding="utf-8") as f:
        recs = parse_export_text(f.read())
    with open(path[:-4] + ".extracted.bytes", "rb") as f:
        expected = f.read()
    got = "\n\x1e".join(r["extracted_text"] for r in recs).encode("utf-8")
    assert got == expected


def test_basic_fields():
    recs = parse_export_text(_load("basic.txt"))
    assert len(recs) == 1
    r = recs[0]
    assert r["unique_id"] == "000123456700001"  # P11: WOS: prefix stripped
    assert r["title"].endswith("continuation line")  # P2 join with space
    assert r["abstract"] == "This is the abstract. It also wraps across lines."
    assert r["journal"] == "JOURNAL OF EXAMPLES"
    assert r["pub_year"] == 2018 and r["cited_times"] == 5
    assert r["reference_num"] == 2 and r["usage_count"] == 3
    assert r["keywords"] == ["keyword one", "keyword two"]
    assert r["keywords_plus"] == ["KEYWORD PLUS ONE", "KEYWORD PLUS TWO"]
    assert r["categories"] == [
        "Computer Science, Information Systems",
        "Information Science",
    ]
    # P3/P4/P5: authors, bracketed C1, reprint flag
    a1, a2 = r["authors"]
    assert (a1["last_name"], a1["first_name"], a1["rank"]) == ("Leung", "Tom", 1)
    assert a1["affiliations"] == ["Univ Example, Dept CS, City, Country."]
    assert a1["is_reprint"] and not a2["is_reprint"]
    assert a2["affiliations"] == ["Other Univ, Dept IS, Town, Nation."]
    # P8 funding
    assert r["fundings"] == [
        {"agent": "Funding Agency One", "numbers": ["GRANT-1", "GRANT-2"]},
        {"agent": "Agency Two", "numbers": ["G3"]},
    ]
    # P9 cited refs
    ref1, ref2 = r["references"]
    assert ref1 == {
        "first_author": "Author A",
        "pub_year": 2010,
        "journal": "J EXAMPLE",
        "volume": "12",
        "start_page": "345",
        "doi": "10.1000/xyz123",
    }
    assert ref2["doi"] is None and ref2["volume"] == "3"


def test_missing_optional_tags():
    r = parse_export_text(_load("missing_tags.txt"))[0]
    assert r["abstract"] is None and r["keywords"] == []
    assert r["fundings"] == [] and r["references"] == []
    assert r["authors"][0]["full_name"] == "Solo, Han"


def test_unbracketed_c1_applies_to_all():
    r = parse_export_text(_load("unbracketed_c1.txt"))[0]
    for a in r["authors"]:
        assert a["affiliations"] == ["Shared Univ, Dept X, City, Country."]


def test_two_records_one_file():
    recs = parse_export_text(_load("two_records.txt"))
    assert [r["unique_id"] for r in recs] == [
        "000000000000004",
        "000000000000005",
    ]


def test_bom_header_skipped():
    r = parse_export_text(_load("bom.txt"))[0]
    assert r["unique_id"] == "000000000000007"


def test_unicode_passthrough():
    r = parse_export_text(_load("unicode.txt"))[0]
    assert r["title"] == "Unicode names: café, naïve, 北京"
    assert r["authors"][0]["full_name"] == "Müller, Hänsel"


def test_cr_reference_single_token_journal_not_eaten_by_vp_slots():
    """Journals starting with V/P (PEDIATRICS, VACCINE, ...) must not
    be mis-parsed as volume/page — the V/P slots need a digit."""
    rec = (
        "PT J\nTI t\nCR Smith J, 1997, PEDIATRICS, V99, P93, "
        "DOI 10.1000/ped\n   Jones K, 2001, VACCINE, V50, P1\n"
        "UT WOS:000000000000042\nER"
    )
    refs = parse_export_text(rec)[0]["references"]
    assert refs[0] == {
        "first_author": "Smith J",
        "pub_year": 1997,
        "journal": "PEDIATRICS",
        "volume": "99",
        "start_page": "93",
        "doi": "10.1000/ped",
    }
    assert refs[1]["journal"] == "VACCINE"
    assert refs[1]["volume"] == "50" and refs[1]["start_page"] == "1"


def test_malformed_continuation_indent_not_chopped():
    """A wrapped line indented with 2 spaces (malformed export) keeps
    its content — the parser must not chop 3 chars off real data."""
    rec = "PT J\nTI first part\n  second part\nUT WOS:1\nER"
    r = parse_export_text(rec)[0]
    assert r["title"] == "first part second part"


def test_embedded_bom_is_data_leading_bom_is_not():
    rec = "﻿PT J\nTI has﻿mark\nUT WOS:2\nER"
    r = parse_export_text(rec)[0]
    assert r["title"] == "has﻿mark"  # embedded U+FEFF survives
    assert r["unique_id"] == "2"          # leading BOM stripped


def test_usage_count_u2_zero_not_falsy():
    """A legitimate ``U2 0`` must yield usage_count=0, NOT fall back to
    U1 (regression: `or` treated 0 as missing)."""
    r = parse_export_text(_load("usage_u2_zero.txt"))[0]
    assert r["usage_count"] == 0


def test_usage_count_prefers_u2_over_u1():
    r = parse_export_text(_load("basic.txt"))[0]
    assert r["usage_count"] == 3  # basic.txt: U1 1, U2 3 — U2 wins


def test_pg_derivable():
    r = parse_export_text(_load("pg_absent.txt"))[0]
    assert int(r["end_page"]) - int(r["start_page"]) + 1 == 10  # P13


# -------------------------------------------------- tab-delimited twin


def test_tab_parse_equals_plaintext_parse():
    """A record exported as tab-delimited parses to the IDENTICAL
    normalized record — including byte-identical extracted_text — as
    its plaintext-export twin (shared _assemble_record contract)."""
    n = 40
    tab_recs = wosgen.tab_export_payload(list(range(n)), n)
    from wos_crawler_spark.operators.parse_tab import parse_tab_text

    got = parse_tab_text(tab_recs)
    assert len(got) == n
    for i, rec in enumerate(got):
        exp = parse_export_text(wosgen.export_payload(i, n))[0]
        for key in exp:
            if key == "url":
                continue
            assert rec[key] == exp[key], (i, key)


def test_tab_parse_empty_cells_and_blank_lines():
    from wos_crawler_spark.operators.parse_tab import parse_tab_text

    payload = "PT\tAU\tTI\tPY\tUT\nJ\tSolo, H\tMinimal tab\t2020\tWOS:42\n\n"
    r = parse_tab_text(payload)[0]
    assert r["unique_id"] == "42" and r["pub_year"] == 2020
    assert r["authors"][0]["last_name"] == "Solo"
    assert r["abstract"] is None and r["references"] == []


def test_tab_dir_scan_feeds_tab_parser(spark, tmp_path):
    from wos_crawler_spark.operators.parse_tab import parse_tab_pages
    from wos_crawler_spark.sources import read_tab_dir

    exp = tmp_path / "tabs"
    exp.mkdir()
    (exp / "1.tab.txt").write_text(
        wosgen.tab_export_payload([0, 1, 2], 10), encoding="utf-8"
    )
    (exp / "2.tab.txt").write_text(
        wosgen.tab_export_payload([3, 4], 10), encoding="utf-8"
    )
    parsed = parse_tab_pages(read_tab_dir(spark, str(exp)))
    uids = sorted(r["unique_id"] for r in parsed.select("unique_id").collect())
    assert uids == [f"{i:015d}" for i in range(5)]


def test_xml_parse_equals_plaintext_parse():
    """XML-exported records parse to identical normalized rows incl.
    extracted_text bytes (third serialization, one record contract)."""
    from wos_crawler_spark.operators.parse_xml import parse_xml_text

    n = 40
    got = parse_xml_text(wosgen.xml_export_payload(list(range(n)), n))
    assert len(got) == n
    for i, rec in enumerate(got):
        exp = parse_export_text(wosgen.export_payload(i, n))[0]
        for key in exp:
            if key == "url":
                continue
            assert rec[key] == exp[key], (i, key)


def test_xml_parse_malformed_degrades():
    """Truncated/junk XML yields [] instead of raising ParseError —
    one bad page must not abort a whole mapInPandas batch."""
    from wos_crawler_spark.operators.parse_xml import parse_xml_text

    good = wosgen.xml_export_payload([0, 1], 2)
    assert parse_xml_text(good[: len(good) // 2]) == []  # truncated
    assert parse_xml_text("not xml at all <<<") == []
    assert parse_xml_text("") == []
    # and a good payload still parses after the guard
    assert len(parse_xml_text(good)) == 2


# ----------------------------------------------------- Spark operator


def test_parse_pages_matches_pure_python(spark):
    """mapInPandas result == pure-python parse, row for row."""
    from wos_crawler_spark.fixtures.synth import pages_table

    n = 64
    pages = pages_table(spark, n, partitions=4)
    parsed = parse_pages(pages).orderBy("unique_id")
    rows = parsed.collect()
    assert len(rows) == n
    expected = {
        wosgen.url_of(i): parse_export_text(wosgen.export_payload(i, n))[0]
        for i in range(n)
    }
    for row in rows:
        exp = expected[row["url"]]
        assert row["extracted_text"] == exp["extracted_text"]
        assert row["unique_id"] == exp["unique_id"]
        assert row["pub_year"] == exp["pub_year"]
        assert [a["full_name"] for a in row["authors"]] == [
            a["full_name"] for a in exp["authors"]
        ]


def test_normalize_tables(spark):
    from wos_crawler_spark.fixtures.synth import pages_table

    parsed = parse_pages(pages_table(spark, 32, partitions=2)).cache()
    tables = normalize.normalize_all(parsed)
    assert tables["documents"].count() == 32
    n_authors = tables["authors"].count()
    assert n_authors >= 32
    assert tables["affiliations"].count() == n_authors  # 1 addr per author
    assert tables["keywords"].count() > 0
    assert tables["references_"].count() > 0
    # J6 citation linking: synthetic CR DOIs point at real record DOIs
    links = normalize.citation_links(parsed)
    assert links.count() > 0
    parsed.unpersist()
