"""WoS advanced-query compiler: grammar/precedence pins, python-eval
twin property over randomized queries, Spark ≡ DuckDB cross-engine
equality from the same AST, NULL semantics, error cases."""

import duckdb
import pytest

from wos_crawler_spark.functions.wosquery import (
    And,
    Near,
    Not,
    Or,
    QuerySyntaxError,
    Term,
    YearRange,
    parse_query,
    query_filter,
    to_column,
    to_sql,
)

FM = {"TS": "text", "LA": "lang", "PY": "py"}


def test_precedence_not_and_or():
    # a OR b AND c == a OR (b AND c); NOT binds tightest
    ast = parse_query("a OR b AND NOT c", FM)
    assert ast == Or(
        Term("TS", "a"), And(Term("TS", "b"), Not(Term("TS", "c")))
    )


def test_infix_not_desugars():
    assert parse_query("a NOT b", FM) == And(
        Term("TS", "a"), Not(Term("TS", "b"))
    )


def test_tag_distributes_over_group():
    ast = parse_query('LA=(en OR "de at")', FM)
    assert ast == Or(Term("LA", "en"), Term("LA", "de at"))


def test_nested_tags_and_ranges():
    ast = parse_query("TS=(x AND LA=(en)) AND PY=2010-2015", FM)
    assert ast == And(
        And(Term("TS", "x"), Term("LA", "en")),
        YearRange("PY", 2010, 2015),
    )
    assert parse_query("PY=2012", FM) == YearRange("PY", 2012, 2012)


def test_wildcard_and_phrase():
    assert parse_query('"neural network*"', FM) == Term(
        "TS", "neural network", True
    )
    assert parse_query("graphen*", FM) == Term("TS", "graphen", True)


def test_errors():
    for bad in (
        "a AND",          # dangling operator
        "(a",             # unbalanced
        "a ) b",          # stray paren
        "PY=20x5",        # bad range
        "PY=2015-2010",   # empty range
        "a * b",          # bare star
        "in*fix",         # inner wildcard
        "",               # empty
        'TS=(ca$ino)',    # charset
    ):
        with pytest.raises(QuerySyntaxError):
            parse_query(bad, FM)


def _py_eval(node, row):
    if isinstance(node, Near):
        col = FM[node.left.tag]
        v = row.get(col)
        if v is None:
            return False
        ws = [w for w in v.lower().split() if w]

        def pos(t):
            return [
                i for i, w in enumerate(ws)
                if (w.startswith(t.value) if t.prefix else w == t.value)
            ]

        return any(
            abs(i - j) <= node.dist and i != j
            for i in pos(node.left)
            for j in pos(node.right)
        )
    if isinstance(node, Term):
        col = FM[node.tag]
        v = row.get(col)
        return node.value in v.lower() if v is not None else False
    if isinstance(node, YearRange):
        v = row.get(FM.get(node.tag, node.tag.lower()))
        return v is not None and node.lo <= v <= node.hi
    if isinstance(node, Not):
        return not _py_eval(node.child, row)
    if isinstance(node, And):
        return _py_eval(node.left, row) and _py_eval(node.right, row)
    if isinstance(node, Or):
        return _py_eval(node.left, row) or _py_eval(node.right, row)
    raise TypeError


ROWS = [
    (0, "machine learning survey", "en", 2012),
    (1, "Neural Network analysis", "en", 2016),
    (2, "graphene transistors", "de", 2015),
    (3, "machine translation neural", "fr", 2010),
    (4, None, "en", 2014),
    (5, "survey of neural networks", None, None),
]

QUERIES = [
    'TS=(machine AND learning)',
    'TS=(neural OR graphene) NOT survey',
    '"neural network*" AND LA=(en)',
    'NOT LA=(en OR de)',
    'PY=2012-2015 AND TS=(machine OR graphene)',
    'machine NOT PY=2010',
    '(machine OR neural) AND NOT (LA=(fr) OR PY=2016)',
    'machine NEAR/1 learning',
    'machine NEAR/2 neural*',
    'TS=(neural NEAR/1 network*) AND PY=2010-2020',
    'survey NEAR/3 neural OR graphene',
]


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        ROWS, "id long, text string, lang string, py long"
    )


def test_cross_engine_and_twin_equality(spark, table):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, %s, %s, %s)"
            % (
                i,
                "NULL" if t is None else "'%s'" % t,
                "NULL" if la is None else "'%s'" % la,
                "NULL" if y is None else y,
            )
            for i, t, la, y in ROWS
        )
        + ") v(id, text, lang, py)"
    )
    for q in QUERIES:
        ast = parse_query(q, FM)
        got = {r.id for r in query_filter(table, q, FM).collect()}
        duck = {
            r[0]
            for r in con.execute(
                f"SELECT id FROM t WHERE {to_sql(ast, FM)}"
            ).fetchall()
        }
        twin = {
            i
            for i, t, la, y in ROWS
            if _py_eval(ast, {"text": t, "lang": la, "py": y})
        }
        assert got == duck == twin, q
        assert twin or q == "impossible", q  # queries chosen to match


def test_near_parse_and_guards():
    ast = parse_query("fox NEAR/3 dog", FM)
    assert ast == Near(Term("TS", "fox"), Term("TS", "dog"), 3)
    for bad in (
        "(a AND b) NEAR/3 c",      # non-term operand
        '"two words" NEAR/2 x',    # phrase operand
        "a NEAR/1 b NEAR/1 c",     # chain
    ):
        with pytest.raises(QuerySyntaxError):
            parse_query(bad, FM)
    with pytest.raises(QuerySyntaxError):
        to_sql(parse_query("TS=(a) AND LA=(b)", FM) and
               Near(Term("TS", "a"), Term("LA", "b"), 2), FM)


def test_near_same_word_needs_two_occurrences(spark):
    df = spark.createDataFrame(
        [(0, "echo once"), (1, "echo and echo")], "id long, text string"
    )
    got = {r.id for r in query_filter(df, "echo NEAR/5 echo", FM).collect()}
    assert got == {1}


def test_unmapped_tag_raises(table):
    ast = parse_query("XX", {"XX": "nope_col"})
    with pytest.raises(Exception):
        to_column(ast, {"YY": "text"})


def test_init_frontier_advanced_consistency(spark):
    """For plain single-term queries the advanced seed path must
    reproduce init_frontier's classic contains() matches exactly
    (url, query_id, priority triples)."""
    from wos_crawler_spark.fixtures.synth import pages_table, seeds_table
    from wos_crawler_spark.plans.crawl import (
        init_frontier,
        init_frontier_advanced,
    )

    pages = pages_table(spark, 80, partitions=2)
    seeds = seeds_table(spark)
    seed_rows = [
        (r.query_id, r.term, r.priority) for r in seeds.collect()
    ]
    classic = {
        (r.url, r.query_id, r.priority)
        for r in init_frontier(seeds, pages).collect()
    }
    # a bare term is a valid advanced query; quoting preserves spaces.
    # NOTE classic matching is raw contains(); the advanced language
    # lowercases terms and matches case-insensitively, so restrict the
    # consistency check to the fixture's lowercase terms.
    adv = {
        (r.url, r.query_id, r.priority)
        for r in init_frontier_advanced(
            [(q, f'"{t}"', p) for q, t, p in seed_rows], pages
        ).collect()
    }
    assert adv == classic and classic


def test_trailing_whitespace_accepted():
    assert parse_query("TS=(graphene) ", FM) == parse_query(
        "TS=(graphene)", FM
    )
    assert parse_query("a AND b\n", FM) == parse_query("a AND b", FM)
