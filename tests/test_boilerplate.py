"""Host-boilerplate removal: chrome detection thresholds (integer
boundaries), within-page repetition counting once, host scoping,
order-preserving reassembly, pure-chrome pages, empty-line immunity,
python-twin property, guards."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.boilerplate import (
    boilerplate_lines,
    host_line_stats,
    strip_boilerplate,
)

PAGES = [
    # host a: 4 pages, "NAV" on all 4, "FOOT" on 2 (50%), "rare" on 1
    ("https://a/1", "a", "NAV\nalpha one\nFOOT"),
    ("https://a/2", "a", "NAV\nbeta two\nNAV"),          # NAV twice: 1 page
    ("https://a/3", "a", "NAV\n\nrare line\nFOOT"),
    ("https://a/4", "a", "NAV\ngamma"),
    # host b: 2 pages; "NAV" here too but host-scoped thresholds apply
    ("https://b/1", "b", "NAV\ndelta"),
    ("https://b/2", "b", "epsilon\nzeta"),
    # host c: one page of pure chrome? (single page -> nothing qualifies)
    ("https://c/1", "c", "solo chrome"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        PAGES, "url string, host string, text string"
    )


def test_stats_count_pages_not_occurrences(pages):
    s = {
        (r.host, r.line_digest): (r.n_pages, r.host_pages)
        for r in host_line_stats(pages).collect()
    }
    import hashlib

    d = lambda x: hashlib.md5(x.encode()).hexdigest()
    assert s[("a", d("NAV"))] == (4, 4)      # twice on page 2 → once
    assert s[("a", d("FOOT"))] == (2, 4)
    assert s[("a", d("rare line"))] == (1, 4)
    assert s[("b", d("NAV"))] == (1, 2)
    assert ("a", d("")) not in s             # empty lines never counted


def test_chrome_thresholds_integer_boundary(spark, pages):
    got = {
        (r.host, r.line_digest)
        for r in boilerplate_lines(pages, min_pages=2, min_frac_pct=50)
        .collect()
    }
    import hashlib

    d = lambda x: hashlib.md5(x.encode()).hexdigest()
    # FOOT: 2*100 >= 50*4 exactly — boundary is chrome
    assert got == {("a", d("NAV")), ("a", d("FOOT"))}
    # raising the bar past the boundary drops FOOT
    got51 = {
        r.line_digest
        for r in boilerplate_lines(pages, min_pages=2, min_frac_pct=51)
        .collect()
    }
    assert got51 == {d("NAV")}


def test_strip_preserves_order_and_host_scope(spark, pages):
    chrome = boilerplate_lines(pages, min_pages=2, min_frac_pct=50)
    out = {
        r.url: (r.text, r.n_lines_in, r.n_lines_kept)
        for r in strip_boilerplate(pages, chrome).collect()
    }
    assert out["https://a/1"] == ("alpha one", 3, 1)
    assert out["https://a/2"] == ("beta two", 3, 1)
    # empty line survives; order preserved
    assert out["https://a/3"] == ("\nrare line", 4, 2)
    assert out["https://a/4"] == ("gamma", 2, 1)
    # host b keeps its NAV (not chrome there)
    assert out["https://b/1"] == ("NAV\ndelta", 2, 2)
    assert out["https://c/1"] == ("solo chrome", 1, 1)
    assert len(out) == len(PAGES)


def test_pure_chrome_page_survives_empty(spark):
    rows = [
        ("u1", "h", "CHROME"),
        ("u2", "h", "CHROME"),
        ("u3", "h", "CHROME\ncontent"),
    ]
    df = spark.createDataFrame(rows, "url string, host string, text string")
    chrome = boilerplate_lines(df, min_pages=2, min_frac_pct=50)
    out = {
        r.url: (r.text, r.n_lines_kept)
        for r in strip_boilerplate(df, chrome).collect()
    }
    assert out["u1"] == ("", 0)
    assert out["u3"] == ("content", 1)


def test_python_twin_property(spark):
    import hashlib
    import random

    rng = random.Random(11)
    lines = [f"line{i}" for i in range(12)]
    rows = []
    for h in ("x", "y"):
        for p in range(8):
            body = "\n".join(
                rng.choice(lines) for _ in range(rng.randint(2, 6))
            )
            rows.append((f"https://{h}/{p}", h, body))
    df = spark.createDataFrame(rows, "url string, host string, text string")
    mp, fp = 3, 40
    # twin
    page_lines = {
        (h, u): t.split("\n") for u, h, t in rows
    }
    per_host_pages = Counter(h for _, h, _ in rows)
    cnt: Counter = Counter()
    for (h, u), ls in page_lines.items():
        for line in set(ls):
            if line:
                cnt[(h, line)] += 1
    chrome_t = {
        (h, line)
        for (h, line), n in cnt.items()
        if n >= mp and n * 100 >= fp * per_host_pages[h]
    }
    want = {}
    for u, h, t in rows:
        keep = [
            l for l in t.split("\n") if (h, l) not in chrome_t or l == ""
        ]
        want[u] = "\n".join(keep)
    chrome = boilerplate_lines(df, min_pages=mp, min_frac_pct=fp)
    got = {
        r.url: r.text for r in strip_boilerplate(df, chrome).collect()
    }
    assert got == want
    assert any((h, l) in chrome_t for h, l in cnt)  # chrome existed


def test_guards(spark, pages):
    with pytest.raises(ValueError):
        boilerplate_lines(pages, min_pages=1)
    with pytest.raises(ValueError):
        boilerplate_lines(pages, min_frac_pct=0)


def test_null_text_page_keeps_miss_marker(spark):
    rows = [
        ("u1", "h", "CHROME"),
        ("u2", "h", "CHROME"),
        ("u3", "h", None),
    ]
    df = spark.createDataFrame(rows, "url string, host string, text string")
    chrome = boilerplate_lines(df, min_pages=2, min_frac_pct=50)
    out = {
        r.url: (r.text, r.n_lines_in, r.n_lines_kept, r.host)
        for r in strip_boilerplate(df, chrome).collect()
    }
    # NULL text stays NULL with NULL counts — not a fake chrome page
    assert out["u3"] == (None, None, None, "h")
    # real pure-chrome pages still come back empty-with-zero
    assert out["u1"] == ("", 1, 0, "h")
