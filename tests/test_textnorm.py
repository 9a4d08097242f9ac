"""Unicode normalization: NFC python-twin equality, DuckDB
nfc_normalize cross-engine agreement (the oracle's from-scratch
recomputation), invisible/control strips, in-place change flag,
NULL semantics, NFKC python-twin (no SQL oracle by design)."""

import unicodedata

import duckdb
import pytest

from wos_crawler_spark.operators.textnorm import (
    CONTROL_RE,
    INVISIBLE_RE,
    normalize_documents,
)

CASES = [
    # (raw, expected-after-NFC+strips) — built from \u escapes so the
    # decomposed inputs are unambiguous in source
    ("Café crowd", "Café crowd"),   # combining acute composes
    ("Ångström", "Ångström"),  # singleton + umlaut
    ("plain ascii", "plain ascii"),            # untouched
    ("zero​width‍ here", "zerowidth here"),  # ZWSP/ZWJ strip
    ("bom﻿ and soft­hyphen", "bom and softhyphen"),
    ("bell\x07 del\x7f tab\tkeeps\nnewline", "bell del tab\tkeeps\nnewline"),
    ("ﬁsh ligature stays", "ﬁsh ligature stays"),  # NFC keeps FB01
    (None, None),
]


@pytest.fixture(scope="module")
def normed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "id long, text string"
    )
    return normalize_documents(df, out_col="clean").orderBy("id").collect()


def test_expected_outputs(normed):
    for row, (raw, want) in zip(normed, CASES):
        assert row.clean == want, repr(raw)


def test_change_flag(normed):
    for row, (raw, want) in zip(normed, CASES):
        if raw is None:
            assert row.norm_changed is False
        else:
            assert row.norm_changed == (raw != want), repr(raw)


def test_in_place_overwrite_keeps_flag(spark):
    # dst == text_col: the flag must still compare against the ORIGINAL
    df = spark.createDataFrame([(1, "Café")], "id long, text string")
    row = normalize_documents(df).collect()[0]
    assert row.text == "Café" and row.norm_changed is True


def test_python_twin_property(spark):
    # a mixed corpus of base letters, combining marks, invisibles and
    # controls — everything the twin can express
    raws = [
        "".join(chr(c) for c in (0x61 + (i * 7) % 26, 0x301, 0x20,
                                 0x200B, 0x41 + (i * 11) % 26, 0x7F))
        for i in range(64)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raws)], "id long, text string"
    )
    got = {
        r.id: r.clean
        for r in normalize_documents(df, out_col="clean").collect()
    }
    import re
    ctrl, invis = re.compile(CONTROL_RE), re.compile(INVISIBLE_RE)
    for i, raw in enumerate(raws):
        want = invis.sub("", ctrl.sub("", unicodedata.normalize("NFC", raw)))
        assert got[i] == want, repr(raw)


def test_duckdb_agreement(spark):
    # the oracle's exact recomputation: nfc_normalize + same patterns
    raws = [t for t, _ in CASES if t is not None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raws)], "id long, text string"
    )
    got = {
        r.id: r.clean
        for r in normalize_documents(df, out_col="clean").collect()
    }
    con = duckdb.connect()
    for i, raw in enumerate(raws):
        want = con.execute(
            "SELECT regexp_replace(regexp_replace(nfc_normalize(?),"
            " ?, '', 'g'), ?, '', 'g')",
            [raw, CONTROL_RE, INVISIBLE_RE],
        ).fetchone()[0]
        assert got[i] == want, repr(raw)


def test_nfkc_python_twin(spark):
    raw = "ﬁsh ①"  # ligature fi + circled one
    df = spark.createDataFrame([(1, raw)], "id long, text string")
    row = normalize_documents(df, out_col="clean", form="NFKC").collect()[0]
    assert row.clean == unicodedata.normalize("NFKC", raw)
    assert row.clean == "fish 1"


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        normalize_documents(df, form="NFX")


def test_collapse_ws(spark):
    df = spark.createDataFrame(
        [(1, "a  b\t\tc \t d\n  e")], "id long, text string"
    )
    row = normalize_documents(df, out_col="c", collapse_ws=True).collect()[0]
    assert row.c == "a b c d\n e"
