"""WoS advanced-query compiler (SURVEY S3 — "advanced-query eval"):
the reference crawler submits advanced-search strings like

    TS=(machine AND (learning OR "neural network*")) NOT TS=(survey)
    TI=(graphene) AND PY=2015-2020 AND LA=(English)

to the WoS endpoint; the Spark engine evaluates the SAME query
language as a distributed predicate over its local corpus tables.
This module parses the query to an AST and compiles it twice:

- :func:`to_column` — a pure-Catalyst boolean ``Column`` (codegen'd,
  map-side; a filter that pushes into the scan where possible);
- :func:`to_sql` — the equivalent ANSI-SQL predicate string, built
  from the SAME AST, so the DuckDB oracle evaluates the identical
  logic from scratch (no pins).

Grammar (case-insensitive keywords, left-associative, standard WoS
precedence NOT > AND > OR; AND/OR/NOT must be explicit — WoS rejects
bare juxtaposition and so do we):

    query   := or
    or      := and (OR and)*
    and     := not ((AND | NOT) not)*      # 'a NOT b' = a AND NOT b
    not     := NOT not | atom
    atom    := TAG = ( or ) | TAG = term | TAG = lo-hi | ( or ) | term
    term    := bareword | "quoted phrase"  # trailing * = prefix wildcard

Matching semantics (both engines, by construction):

- text tags (TS/TI/AU/...): case-insensitive SUBSTRING containment of
  the term in the mapped column; ``*`` only as a trailing wildcard
  (it truncates the term — containment of the stem). This mirrors
  WoS's lemmatization-free quoted semantics, which is the only
  variant expressible identically in two engines.
- range tags (PY): ``PY=2015`` is equality, ``PY=2010-2015`` an
  inclusive BETWEEN on an integer column.
- a field tag distributes over its parenthesized group:
  ``TS=(a AND b)`` means ``contains(ts,a) AND contains(ts,b)``.
- NULL columns never match (both engines: NULL-safe coalesce to '').

Terms are restricted to ``[A-Za-z0-9_*' -]`` (the WoS charset plus
apostrophe/hyphen) — enforced at parse time, which also makes the
generated SQL literal-injection-free by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default tag → column mapping for the engine's documents-shaped
#: tables; callers pass their own for parsed WoS records
#: (title/authors/journal columns).
DEFAULT_FIELD_MAP = {
    "TS": "text",     # topic → full text
    "LA": "lang",
    "SO": "source",
}

#: tags whose operand is an integer (range-capable)
RANGE_TAGS = {"PY"}

_TERM_RE = re.compile(r"[A-Za-z0-9_'\- ]+\*?\Z")
_TOKEN_RE = re.compile(
    r"\s*(\(|\)|=|\"[^\"]*\"|[Nn][Ee][Aa][Rr]/\d+|[A-Za-z0-9_'\-*]+)"
)


# ----------------------------------------------------------------- AST
@dataclass(frozen=True)
class Term:
    tag: str
    value: str          # lowercased; trailing * stripped
    prefix: bool = False  # True when the term carried a trailing *


@dataclass(frozen=True)
class Near:
    """WoS proximity: both WORDS occur within ``dist`` word positions
    (word-token semantics over a whitespace split, both engines).
    Operands are restricted to single-word terms of the same field —
    the variant expressible identically in two engines."""

    left: "Term"
    right: "Term"
    dist: int


@dataclass(frozen=True)
class YearRange:
    tag: str
    lo: int
    hi: int


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    left: object
    right: object


@dataclass(frozen=True)
class Or:
    left: object
    right: object


class QuerySyntaxError(ValueError):
    pass


# -------------------------------------------------------------- parser
class _Parser:
    def __init__(
        self,
        s: str,
        field_map: dict[str, str],
        range_tags: set[str] | None = None,
    ):
        self.range_tags = RANGE_TAGS | (range_tags or set())
        self.toks: list[str] = []
        s = s.rstrip()  # a trailing-whitespace tail is not a token
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m:
                raise QuerySyntaxError(f"bad character at {s[pos:pos+10]!r}")
            self.toks.append(m.group(1))
            pos = m.end()
        self.i = 0
        self.field_map = field_map
        self.default_tag = next(iter(field_map))

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        t = self.peek()
        if t is None:
            raise QuerySyntaxError("unexpected end of query")
        self.i += 1
        return t

    def parse(self):
        node = self.or_()
        if self.peek() is not None:
            raise QuerySyntaxError(f"trailing input at {self.peek()!r}")
        return node

    def or_(self):
        node = self.and_()
        while (p := self.peek()) and p.upper() == "OR":
            self.take()
            node = Or(node, self.and_())
        return node

    def and_(self):
        node = self.not_()
        while (p := self.peek()) and p.upper() in ("AND", "NOT"):
            op = self.take().upper()
            rhs = self.not_()
            node = And(node, Not(rhs) if op == "NOT" else rhs)
        return node

    def not_(self):
        if (p := self.peek()) and p.upper() == "NOT":
            self.take()
            return Not(self.not_())
        return self.near_()

    def near_(self):
        # NEAR binds tightest (WoS precedence NEAR > NOT > AND > OR)
        node = self.atom(self.default_tag)
        if (p := self.peek()) and re.fullmatch(
            r"[Nn][Ee][Aa][Rr]/\d+", p
        ):
            dist = int(self.take().split("/")[1])
            rhs = self.atom(self.default_tag)
            if not isinstance(node, Term) or not isinstance(rhs, Term):
                raise QuerySyntaxError(
                    "NEAR operands must be single terms"
                )
            if " " in node.value or " " in rhs.value:
                raise QuerySyntaxError(
                    "NEAR operands must be single words"
                )
            node = Near(node, rhs, dist)
            if (p := self.peek()) and re.fullmatch(
                r"[Nn][Ee][Aa][Rr]/\d+", p
            ):
                raise QuerySyntaxError("NEAR cannot chain")
        return node

    def atom(self, tag: str):
        t = self.take()
        if t == "(":
            node = self.or_()
            if self.take() != ")":
                raise QuerySyntaxError("expected )")
            return node
        up = t.upper()
        if up in ("AND", "OR", "NOT", ")", "="):
            raise QuerySyntaxError(f"unexpected {t!r}")
        if (
            self.peek() == "="
            and (up in self.field_map or up in self.range_tags)
        ):
            self.take()  # '='
            return self.tagged(up)
        return self.term(tag, t)

    def tagged(self, tag: str):
        t = self.take()
        if t == "(":
            # the tag distributes over the whole group: re-parse the
            # group with this tag as the default for bare terms
            saved = self.default_tag
            self.default_tag = tag
            node = self.or_()
            self.default_tag = saved
            if self.take() != ")":
                raise QuerySyntaxError("expected )")
            return node
        if tag in self.range_tags:
            m = re.fullmatch(r"(\d{1,9})(?:-(\d{1,9}))?", t)
            if not m:
                raise QuerySyntaxError(f"bad {tag} range {t!r}")
            lo = int(m.group(1))
            hi = int(m.group(2) or lo)
            if hi < lo:
                raise QuerySyntaxError(f"empty {tag} range {t!r}")
            return YearRange(tag, lo, hi)
        return self.term(tag, t)

    def term(self, tag: str, tok: str):
        if tok.startswith('"'):
            tok = tok[1:-1]
        if not tok or not _TERM_RE.fullmatch(tok):
            raise QuerySyntaxError(f"bad term {tok!r}")
        if "*" in tok[:-1]:
            raise QuerySyntaxError("only a trailing * wildcard is allowed")
        return Term(tag, tok.rstrip("*").lower(), tok.endswith("*"))


def parse_query(
    s: str,
    field_map: dict[str, str] | None = None,
    range_tags: set[str] | None = None,
):
    """Query string → AST. ``field_map`` maps tags to column names;
    the FIRST entry is the default tag for untagged terms;
    ``range_tags`` extends the built-in integer-range tags (PY)."""
    return _Parser(s, field_map or DEFAULT_FIELD_MAP, range_tags).parse()


# ------------------------------------------------------------ compilers
def _term_col(node: Term, field_map: dict[str, str]) -> Column:
    col = field_map.get(node.tag)
    if col is None:
        raise QuerySyntaxError(f"unmapped tag {node.tag}")
    return F.lower(F.coalesce(F.col(col), F.lit(""))).contains(
        F.lit(node.value)
    )


def _near_common(node: "Near", fm: dict[str, str]) -> str:
    la, lb = fm.get(node.left.tag), fm.get(node.right.tag)
    if la is None or lb is None:
        raise QuerySyntaxError("unmapped tag in NEAR")
    if la != lb:
        raise QuerySyntaxError("NEAR operands must share a field")
    return la


def _near_col(node: "Near", fm: dict[str, str]) -> Column:
    col = _near_common(node, fm)
    ws = F.filter(
        F.split(
            F.lower(F.coalesce(F.col(col), F.lit(""))), r"\s+"
        ),
        lambda w: w != F.lit(""),
    )

    def positions(t: Term) -> Column:
        def match(w: Column) -> Column:
            return (
                w.startswith(t.value) if t.prefix else w == F.lit(t.value)
            )

        idx = F.transform(
            ws,
            lambda w, i: F.when(match(w), i).otherwise(F.lit(-1)),
        )
        return F.filter(idx, lambda p: p >= 0)

    pa, pb = positions(node.left), positions(node.right)
    d = F.lit(node.dist)
    return F.exists(
        pa,
        lambda i: F.exists(
            pb, lambda j: (F.abs(i - j) <= d) & (i != j)
        ),
    )


def to_column(node, field_map: dict[str, str] | None = None) -> Column:
    """AST → Catalyst boolean Column (codegen'd, map-side)."""
    fm = field_map or DEFAULT_FIELD_MAP
    if isinstance(node, Near):
        return _near_col(node, fm)
    if isinstance(node, Term):
        return _term_col(node, fm)
    if isinstance(node, YearRange):
        c = F.col(fm.get(node.tag, node.tag.lower()))
        return c.isNotNull() & c.between(node.lo, node.hi)
    if isinstance(node, Not):
        return ~to_column(node.child, fm)
    if isinstance(node, And):
        return to_column(node.left, fm) & to_column(node.right, fm)
    if isinstance(node, Or):
        return to_column(node.left, fm) | to_column(node.right, fm)
    raise TypeError(f"unknown node {node!r}")


def to_sql(node, field_map: dict[str, str] | None = None) -> str:
    """AST → the equivalent ANSI-SQL predicate (DuckDB oracle).
    Terms were charset-restricted at parse time, so embedding them in
    single-quoted literals is injection-free; apostrophes are doubled
    anyway."""
    fm = field_map or DEFAULT_FIELD_MAP
    if isinstance(node, Near):
        col = _near_common(node, fm)
        ws = (
            "list_filter(string_split_regex(lower(coalesce("
            f"{col}, '')), '\\s+'), w -> w <> '')"
        )

        def pos(t: Term, v: str) -> str:
            lit = t.value.replace("'", "''")
            cmp = (
                f"starts_with(({ws})[{v}], '{lit}')"
                if t.prefix
                else f"({ws})[{v}] = '{lit}'"
            )
            return f"[{v} FOR {v} IN range(1, len({ws})+1) IF {cmp}]"

        return (
            "(len(flatten([[1 FOR j IN "
            + pos(node.right, "j")
            + f" IF abs(i - j) <= {node.dist} AND i <> j] FOR i IN "
            + pos(node.left, "i")
            + "])) > 0)"
        )
    if isinstance(node, Term):
        col = fm.get(node.tag)
        if col is None:
            raise QuerySyntaxError(f"unmapped tag {node.tag}")
        lit = node.value.replace("'", "''")
        return (
            f"(position('{lit}' IN lower(coalesce({col}, ''))) > 0)"
        )
    if isinstance(node, YearRange):
        col = fm.get(node.tag, node.tag.lower())
        return (
            f"({col} IS NOT NULL AND {col} BETWEEN {node.lo} AND {node.hi})"
        )
    if isinstance(node, Not):
        return f"(NOT {to_sql(node.child, fm)})"
    if isinstance(node, And):
        return f"({to_sql(node.left, fm)} AND {to_sql(node.right, fm)})"
    if isinstance(node, Or):
        return f"({to_sql(node.left, fm)} OR {to_sql(node.right, fm)})"
    raise TypeError(f"unknown node {node!r}")


def query_filter(
    df, query: str, field_map: dict[str, str] | None = None
):
    """One-call surface: ``df.filter(compiled query)``."""
    return df.filter(to_column(parse_query(query, field_map), field_map))
