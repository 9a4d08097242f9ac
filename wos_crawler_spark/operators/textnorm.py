"""Unicode text normalization for web-text corpora: NFC composition
plus removal of control and invisible-formatting characters, with an
audit flag per document.

Every published web-corpus pipeline runs a normalization pass before
dedup/quality (CCNet normalizes before LM scoring; C4 strips control
chars; OSCAR/RefinedWeb normalize to a canonical Unicode form) because
byte-level dedup and hashing are meaningless when ``Café`` can be
serialized two ways (U+00E9 vs U+0065 U+0301) and zero-width joiners
hide inside otherwise-identical text. No reference-crawler analog
(SURVEY.md has no normalization row) — part of the training-data
family the brief adds.

Engine notes:

- **NFC, not NFKC, is the oracle form.** DuckDB ships
  ``nfc_normalize`` and Python's ``unicodedata`` implements the same
  Unicode normalization spec, so the DuckDB oracle recomputes the
  composition from scratch — verified bit-identical on composed
  accents (U+0301 runs), singleton replacements (U+212B → U+00C5) and
  ligature NON-changes (NFC leaves U+FB01 alone; NFKC would not, and
  has no DuckDB twin, so ``form='NFKC'`` is offered Spark-side but
  pinned only by the python-twin test, never the SQL oracle).
- NFC itself has no Catalyst builtin, so it is the one Arrow hop: a
  ``pandas_udf`` over string batches using ``pandas.Series.str.
  normalize`` — the sanctioned vectorized boundary (input_hint: no
  per-row Python UDFs). Everything else is codegen'd
  ``regexp_replace``.
- The strip patterns use only Java-regex∩RE2-identical syntax
  (character classes of literal code points — the :mod:`pii`
  protocol), so the oracle applies the SAME pattern strings in
  DuckDB. ``\\t \\n \\r`` are deliberately NOT stripped — they are
  payload whitespace, and the Gopher/paragraph operators key on them.
- Order is fixed and engine-identical: NFC first, then control strip,
  then invisible strip, then (optional) horizontal-whitespace
  collapse. NFC first matters: composition can only merge combining
  marks that the strips never touch, and stripping first could change
  what NFC sees (e.g. a soft hyphen between base and combining mark).
- Scale shape: one Arrow projection + one codegen'd projection, ZERO
  shuffles — a pure map-side stage at any corpus size.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0 controls minus \t\n\r, plus DEL. Kept in sync with the oracle —
#: the pattern string itself is shared verbatim.
CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

#: Invisible formatting characters NFC does not remove: zero-width
#: space/non-joiner/joiner, BOM/zero-width-no-break-space, soft hyphen.
#: Literal code points in a character class — identical in RE2.
INVISIBLE_RE = "[\u200b\u200c\u200d\ufeff\u00ad]"

#: Horizontal whitespace runs (space + tab only — newlines are
#: paragraph structure and never collapsed).
HSPACE_RE = "[ \\t]{2,}"


def nfc_column(text: Column, form: str = "NFC") -> Column:
    """Unicode-normalized text via one Arrow-batched ``pandas_udf``.

    ``form`` is captured at plan-build time; NULLs pass through.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if x is not None
            else None
        )

    return _norm(text)


def strip_invisible(text: Column, collapse_ws: bool = False) -> Column:
    """Control + invisible-char strip (and optional horizontal-space
    collapse) as pure codegen'd ``regexp_replace`` — no Python."""
    out = F.regexp_replace(text, CONTROL_RE, "")
    out = F.regexp_replace(out, INVISIBLE_RE, "")
    if collapse_ws:
        out = F.regexp_replace(out, HSPACE_RE, " ")
    return out


def normalize_documents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    collapse_ws: bool = False,
) -> DataFrame:
    """Corpus-level normalization: NFC → control strip → invisible
    strip → optional hspace collapse, writing ``out_col`` (default:
    in place) plus a ``norm_changed`` audit flag.

    Two chained projections (one Arrow, one codegen), zero shuffles.
    """
    t = F.col(text_col)
    cleaned = strip_invisible(nfc_column(t, form), collapse_ws)
    dst = out_col or text_col
    # Stage through a temp column so the change flag compares against
    # the ORIGINAL text even when dst == text_col (in-place), and the
    # Arrow hop evaluates once.
    tmp = "_textnorm_out"
    out = df.withColumn(tmp, cleaned)
    out = out.withColumn(
        "norm_changed",
        F.when(t.isNull(), F.lit(False)).otherwise(
            ~F.col(tmp).eqNullSafe(t)
        ),
    )
    return out.withColumn(dst, F.col(tmp)).drop(tmp)
