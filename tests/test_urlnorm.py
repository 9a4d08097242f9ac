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


#: Malformed/hostile inputs — the twin contract holds over ARBITRARY
#: strings, not just well-formed URLs (a dirty link must not make the
#: engine and the determinism oracle disagree about the seen set).
MESSY = [
    "http://example.com:8o80/x",      # non-digit "port" kept verbatim
    "http://h:1:2/",                  # multi-colon authority
    "http://[::1]/p",                 # IPv6 literal
    "http://[::1]:443/p",             # IPv6 + default port (https only)
    "https://[::1]:443/p",            # IPv6 + droppable default port
    "example.com/p?b=2&a=1",          # scheme-less
    "",                               # empty
    "http://",                        # authority-less
    "http://?a=1",                    # query only
    "://x/y",                         # bare separator
    "http://h#frag?notquery",         # fragment before '?'
    "HTTP://H:80:80/x",               # repeated port-ish suffix
]


def test_expr_matches_python_twin(spark):
    urls = [u for u, _ in CASES] + MESSY + [
        f"https://H{i}.Example.org:443/p{i}?q={i}&a=0#f{i}" for i in range(50)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = with_url_canon(df).select("url", "url_canon", "host").collect()
    for row in out:
        assert row["url_canon"] == canonicalize_url_py(row["url"]), row["url"]


def test_expr_matches_python_twin_fuzz(spark):
    """Deterministic fuzz over a URL-ish alphabet (plus separators in
    pathological positions): Catalyst ≡ python twin byte-for-byte."""
    from wos_crawler_spark.fixtures.wosgen import splitmix64

    alphabet = "abcXYZ019:/?#&=.%[]@~ -_é中"
    urls = []
    for i in range(400):
        n = 1 + splitmix64(i) % 40
        s = "".join(
            alphabet[splitmix64(i * 1000 + j) % len(alphabet)]
            for j in range(n)
        )
        if i % 3 == 0:
            s = "http://" + s
        elif i % 3 == 1:
            s = "HTTPS://host" + s
        urls.append(s)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for row in with_url_canon(df).select("url", "url_canon").collect():
        assert row["url_canon"] == canonicalize_url_py(row["url"]), repr(
            row["url"]
        )


def test_robots_rule_matches_into_query(spark):
    """A Disallow prefix reaching into the query string (`/search?q=`)
    must match — robots LPM evaluates path+query, like the simulator."""
    from wos_crawler_spark.operators.robots import robots_filter

    frontier = with_url_canon(
        spark.createDataFrame(
            [
                ("https://h.com/search?q=x",),
                ("https://h.com/search",),
                ("https://h.com/other?q=x",),
            ],
            "url string",
        )
    )
    rules = [("h.com", "/search?q=", False), ("h.com", "/", True)]
    robots = spark.createDataFrame(
        [(h, p, a, len(p)) for h, p, a in rules],
        "host string, rule_prefix string, allow boolean, rule_len int",
    )
    kept = {r["url"] for r in robots_filter(frontier, robots).collect()}
    assert kept == {"https://h.com/search", "https://h.com/other?q=x"}


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
