"""P14 BibTeX parser tests: field mapping, LaTeX de-escape byte
contract, multi-entry files, Spark operator parity."""

from wos_crawler_spark.operators.parse_bibtex import (
    latex_unescape,
    parse_bib_text,
    parse_bibtex_entries,
)

BIB = r"""@article{ ISI:000123456700001,
Author = {Leung, Tom and M{\"u}ller, Hans},
Title = {{A study of caf{\'e} data --- with dashes}},
Journal = {{Journal of Examples}},
Year = {{2018}},
Volume = {{12}},
Number = {{2}},
Pages = {{100--110}},
Abstract = {{This is the abstract.}},
Keywords = {{keyword one; keyword two}},
Times-Cited = {{5}},
Usage-Count-Since-2013 = {{3}},
DOI = {{10.1000/abc456}},
Unique-ID = {{ISI:000123456700001}},
}

@article{ ISI:000123456700002,
Author = {Solo, Han},
Title = {{Second entry}},
Year = {{2019}},
Unique-ID = {{ISI:000123456700002}},
}
"""


def test_latex_unescape_pinned_bytes():
    assert latex_unescape(r"caf{\'e} na{\"i}ve --- x -- y \& z") in (
        'café na{\\"i}ve — x – y & z',  # ï not in table (documented subset)
    )
    assert latex_unescape(r"M{\"u}ller Garc{\'i}a") == "Müller García"


def test_tokenizer_balanced_braces():
    entries = parse_bibtex_entries(BIB)
    assert len(entries) == 2
    assert entries[0]["citekey"] == "ISI:000123456700001"
    assert entries[0]["fields"]["pages"] == "{100--110}"


def test_field_mapping():
    recs = parse_bib_text(BIB)
    assert len(recs) == 2
    r = recs[0]
    assert r["unique_id"] == "000123456700001"
    assert r["title"] == "A study of café data — with dashes"
    assert r["journal"] == "JOURNAL OF EXAMPLES"
    assert (r["volume"], r["issue"]) == ("12", "2")
    assert (r["start_page"], r["end_page"]) == ("100", "110")
    assert r["pub_year"] == 2018 and r["cited_times"] == 5
    assert r["usage_count"] == 3
    assert [a["full_name"] for a in r["authors"]] == ["Leung, Tom", "Müller, Hans"]
    assert r["keywords"] == ["keyword one", "keyword two"]
    assert recs[1]["unique_id"] == "000123456700002"


def test_spark_bib_operator(spark):
    from wos_crawler_spark.operators.parse_bibtex import parse_bib_pages

    df = spark.createDataFrame(
        [("https://x/a.bib", BIB)], "url string, text string"
    )
    rows = parse_bib_pages(df).orderBy("unique_id").collect()
    assert [r["unique_id"] for r in rows] == [
        "000123456700001",
        "000123456700002",
    ]
    assert rows[0]["title"] == "A study of café data — with dashes"


def test_brace_protected_tokens_not_corrupted():
    """`{{DNA} sequencing with {RNA}}`: the outer pair strips, but the
    non-matching inner first/last braces must survive."""
    bib = (
        "@article{ x1,\nTitle = {{DNA} sequencing with {RNA}},\n"
        "Year = {2020},\nUnique-ID = {WOS:111}}"
    )
    r = parse_bib_text(bib)[0]
    assert r["title"] == "{DNA} sequencing with {RNA}"


def test_wrapped_author_field_has_no_newlines():
    bib = (
        "@article{ x2,\nAuthor = {Smith,\n   John and Jones, K.},\n"
        "Year = {2020},\nUnique-ID = {WOS:222}}"
    )
    r = parse_bib_text(bib)[0]
    names = [a["full_name"] for a in r["authors"]]
    assert names == ["Smith, John", "Jones, K."]
    assert all("\n" not in n for n in names)
    assert "\n" not in r["extracted_text"].split("AU ", 1)[1].split("\n", 1)[0]


def test_entry_head_inside_braced_value_is_content():
    bib = (
        "@article{ x3,\nAbstract = {mentions @misc{note, a fake head} here},\n"
        "Year = {2020},\nUnique-ID = {WOS:333}}\n"
        "@article{ x4,\nYear = {2021},\nUnique-ID = {WOS:444}}"
    )
    recs = parse_bib_text(bib)
    assert [r["unique_id"] for r in recs] == ["333", "444"]
    assert "@misc{note" in recs[0]["abstract"]
