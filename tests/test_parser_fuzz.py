"""Grammar-fuzz property test (SURVEY §2.4 P15, §5.2-1): randomized
WoS export payloads — random tag order, continuation depth, BOM/CRLF,
garbage lines, empty fields, unicode (CJK/emoji/combining/embedded
FEFF), missing trailing ER — must parse IDENTICALLY through

- the Spark ``parse_pages`` operator (many files batched per
  ``_segment_fields`` call, Arrow round-trip of every nested struct),
- the pure-python ``parse_export_text`` twin (one file at a time).

Seeded ``random.Random`` → deterministic; ≥1000 records per run. A
divergence here means the cross-file record numbering or the Arrow
type coercion changed behavior — the two failure modes the shared
per-record assembly code cannot catch by construction.
"""

import json
import random

import pandas as pd
import pytest

from wos_crawler_spark.operators.parse_plaintext import (
    _OUT_COLS,
    parse_export_text,
    parse_pages,
)

SEED = 20260818
N_FILES = 150
MIN_RECORDS = 1000

# single-item tags (incl. every numeric field) + multi-item tags; the
# junk pool exercises unknown-but-grammatical tags (must round-trip as
# ordinary fields, not crash)
TAGS_SINGLE = [
    "TI", "SO", "DT", "LA", "AB", "RP", "EM", "FX", "NR", "TC", "U1",
    "U2", "PU", "SN", "J9", "PY", "VL", "IS", "BP", "EP", "DI", "UT",
    "GA", "PT",
]
TAGS_MULTI = ["AU", "AF", "DE", "ID", "C1", "CR", "WC", "SC", "FU"]
TAGS_JUNK = ["Z9", "QQ", "X7", "KK"]

# content alphabet: ascii + punctuation + CJK + emoji + combining mark
# + EMBEDDED BOM (data when not leading) — never \n (line grammar) and
# never \r (trailing-\r is applied as a whole-line mutation below)
_CHARS = (
    "abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789 ,;.()[]{}&/-_'\"=+*:%$#@!?<>|~^"
    "ßüéñØ中文漢字価値🙂😀́﻿\t"
)


def _text(rng: random.Random, lo: int = 0, hi: int = 60) -> str:
    return "".join(rng.choice(_CHARS) for _ in range(rng.randint(lo, hi)))


def _gen_record(rng: random.Random) -> list[str]:
    lines: list[str] = []
    singles = rng.sample(TAGS_SINGLE, rng.randint(2, len(TAGS_SINGLE)))
    multis = rng.sample(TAGS_MULTI, rng.randint(0, len(TAGS_MULTI)))
    junk = rng.sample(TAGS_JUNK, rng.randint(0, 2))
    tags = singles + multis + junk
    rng.shuffle(tags)  # random tag ORDER — assembly must not care
    for tg in tags:
        n_items = 1 if tg in TAGS_SINGLE else rng.randint(1, 5)
        for k in range(n_items):
            body = _text(rng)  # may be EMPTY (empty-field case)
            lines.append(f"{tg} {body}" if k == 0 else f"   {body}")
        # extra continuation depth on any field
        for _ in range(rng.randint(0, 2) if rng.random() < 0.3 else 0):
            lines.append("   " + _text(rng, 1, 40))
        # garbage between fields: blank lines, malformed continuations
        # (2-space / tab / flush-left lowercase — not valid tag lines)
        r = rng.random()
        if r < 0.06:
            lines.append("")
        elif r < 0.10:
            lines.append(rng.choice(["  ", "\t"]) + _text(rng, 1, 20))
        elif r < 0.13:
            lines.append(rng.choice("abcxyz") + _text(rng, 0, 20))
    lines.append("ER")
    lines.append("")
    return lines


def _gen_file(rng: random.Random, n_records: int) -> str:
    lines: list[str] = []
    if rng.random() < 0.5:  # FN/VR header (skipped tags)
        lines += ["FN Clarivate Analytics Web of Science", "VR 1.0"]
    for _ in range(n_records):
        lines.extend(_gen_record(rng))
    if rng.random() < 0.10 and lines and lines[-2:] == ["ER", ""]:
        del lines[-2:]  # truncated final record: NO trailing ER
    if rng.random() < 0.5:
        lines.append("EF")
    # whole-line CRLF mutation on a random subset
    lines = [
        (s + "\r") if rng.random() < 0.15 else s for s in lines
    ]
    text = "\n".join(lines)
    if rng.random() < 0.3:
        text = "﻿" + text  # leading BOM (stripped)
    return text


def _canon(rec: dict) -> str:
    return json.dumps(
        {c: rec.get(c) for c in _OUT_COLS if c != "url"},
        sort_keys=True,
        ensure_ascii=False,
        default=repr,
    )


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(SEED)
    files = []
    total = 0
    for i in range(N_FILES):
        n = rng.randint(4, 10)
        files.append((f"fuzz://{i:04d}", _gen_file(rng, n)))
        total += n
    assert total >= MIN_RECORDS
    return files


def test_fuzz_spark_parse_equals_python_twin(spark, corpus):
    expected: list[str] = []
    for url, text in corpus:
        for rec in parse_export_text(text, url):
            expected.append(_canon(rec))

    pdf = pd.DataFrame(corpus, columns=["url", "text"])
    got_rows = (
        parse_pages(spark.createDataFrame(pdf).repartition(8))
        .collect()
    )
    got = [_canon(r.asDict(recursive=True)) for r in got_rows]

    assert len(got) == len(expected) >= MIN_RECORDS
    # multiset equality (partition order is arbitrary); byte-identical
    # extracted_text is inside the canonical JSON
    assert sorted(got) == sorted(expected)


def test_fuzz_extracted_text_never_empty_for_real_records(corpus):
    """Sanity on the generator itself: the fuzz corpus exercises
    non-trivial records (guards against a silently degenerate fuzzer
    making the equality test vacuous)."""
    n_nonempty = 0
    n_unicode = 0
    for url, text in corpus:
        for rec in parse_export_text(text, url):
            if rec["extracted_text"]:
                n_nonempty += 1
                if any(ord(ch) > 0x2E80 for ch in rec["extracted_text"]):
                    n_unicode += 1
    assert n_nonempty >= MIN_RECORDS * 0.9
    assert n_unicode >= MIN_RECORDS * 0.5
