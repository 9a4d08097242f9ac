"""F2 canonicalization: Catalyst expr path vs pure-Python twin must be
byte-identical (the twin feeds the determinism oracle), plus pinned
canonical-form cases."""

import pytest

from wos_crawler_spark.functions.urlnorm import (
    canonicalize_url_py,
    with_url_canon,
)

CASES = [
    # (input, canonical)
    ("https://Example.COM/path?b=2&a=1#frag", "https://example.com/path?a=1&b=2"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("HTTP://EXAMPLE.com", "http://example.com/"),
    ("https://h1.example.org/rec/00000001", "https://h1.example.org/rec/00000001"),
    ("https://example.com/p?z=9&a=1&m=5", "https://example.com/p?a=1&m=5&z=9"),
    ("https://example.com/p?", "https://example.com/p"),
    ("https://example.com/CaseSensitive/Path", "https://example.com/CaseSensitive/Path"),
]


@pytest.mark.parametrize("url,expected", CASES)
def test_python_twin_pinned(url, expected):
    assert canonicalize_url_py(url) == expected


def test_expr_matches_python_twin(spark):
    urls = [u for u, _ in CASES] + [
        f"https://H{i}.Example.org:443/p{i}?q={i}&a=0#f{i}" for i in range(50)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = with_url_canon(df).select("url", "url_canon", "host").collect()
    for row in out:
        assert row["url_canon"] == canonicalize_url_py(row["url"]), row["url"]
        canon = row["url_canon"]
        host = canon.split("://", 1)[1].split("/", 1)[0].split(":")[0]
        assert row["host"] == host


def test_canonical_equivalence_class_dedups(spark):
    """Dedup property (SURVEY §5.2-3): URL variants that canonicalize
    identically must yield ONE url_hash."""
    variants = [
        "https://example.com/p?a=1&b=2",
        "https://EXAMPLE.com/p?b=2&a=1",
        "https://example.com:443/p?a=1&b=2#x",
    ]
    df = with_url_canon(
        spark.createDataFrame([(u,) for u in variants], "url string")
    )
    assert df.select("url_hash").distinct().count() == 1
