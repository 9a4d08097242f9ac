"""Exact-substring span dedup (Lee et al. 2022 ExactSubstr, restated
as hash-rank-merge over L-token windows): manifest semantics, the
keep-first contract, interval merging, the Arrow twin's bit-equality,
apply()'s token conservation, and partitioning invariance."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.textdedup import (
    span_dedup_apply,
    span_dedup_manifest,
    span_hashes,
    span_hashes_arrow,
)

L = 5


def _mk(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(parts)


def _words(n, base=0):
    return " ".join(f"w{base + i}" for i in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    """doc 0: 12 unique tokens. doc 1: repeats doc 0's tokens 2..9
    (one 8-token duplicated run) inside its own vocabulary.
    doc 2: shorter than L. doc 3: internal self-repetition of one
    L-token phrase. doc 4: empty. doc 5: exact copy of doc 0."""
    d0 = _words(12)
    mid = " ".join(f"w{i}" for i in range(2, 10))
    d1 = f"a0 a1 {mid} a2 a3 a4 a5"
    d2 = _words(L - 1, base=500)
    phrase = _words(L, base=600)
    d3 = f"{phrase} x0 x1 {phrase}"
    return _mk(
        spark,
        [(0, d0), (1, d1), (2, d2), (3, d3), (4, ""), (5, d0)],
    ).cache()


def test_short_and_empty_docs_emit_no_spans(spark, planted):
    s = span_hashes(planted, span_len=L)
    assert s.filter(F.col("doc_id").isin(2, 4)).count() == 0


def test_keep_first_and_cross_doc_removal(spark, planted):
    m = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_tokens"])
        for r in span_dedup_manifest(planted, span_len=L).collect()
    }
    # doc 0 is the global keeper (smallest id): untouched.
    assert 0 not in m
    # doc 5 (exact copy) loses all 12 tokens: windows 0..7 merge.
    assert m[5] == (0, 12, 12)
    # doc 1: the 8-token run sits at token positions 2..9; its
    # L-windows at pos 2..5 are dups of doc 0's windows → merged
    # interval [2, 10).
    assert m[1] == (2, 10, 8)
    # doc 3: second occurrence of the phrase starts at L + 2.
    assert m[3] == (L + 2, 2 * L + 2, L)


def test_arrow_twin_bit_equal(spark, planted):
    e = sorted(map(tuple, span_hashes(planted, span_len=L).collect()))
    a = sorted(
        map(tuple, span_hashes_arrow(planted, span_len=L).collect())
    )
    assert a == e
    me = sorted(
        map(tuple, span_dedup_manifest(planted, span_len=L).collect())
    )
    ma = sorted(
        map(
            tuple,
            span_dedup_manifest(
                planted, span_len=L, use_arrow=True
            ).collect(),
        )
    )
    assert ma == me


def test_apply_token_conservation(spark, planted):
    m = span_dedup_manifest(planted, span_len=L)
    out = {
        r["doc_id"]: r for r in span_dedup_apply(planted, m).collect()
    }
    # untouched docs pass through in canonical (single-space) form
    assert out[0]["dedup_text"] == _words(12)
    assert out[0]["n_tokens_kept"] == 12
    # doc 5 fully removed
    assert out[5]["dedup_text"] == ""
    assert out[5]["n_tokens_kept"] == 0
    # doc 1 keeps its frame tokens
    assert out[1]["dedup_text"] == "a0 a1 a2 a3 a4 a5"
    # doc 3 keeps the first phrase + the two x tokens
    assert (
        out[3]["dedup_text"] == _words(L, base=600) + " x0 x1"
    )
    # global conservation: kept + removed == total windsable tokens
    removed = (
        m.agg(F.sum("n_tokens")).first()[0] or 0
    )
    kept = sum(r["n_tokens_kept"] for r in out.values())
    total = sum(
        len(r["text"].split()) if r["text"] else 1
        for r in planted.collect()
    )
    assert kept + removed == total


def test_partitioning_invariance(spark, planted):
    a = sorted(
        map(
            tuple,
            span_dedup_manifest(
                planted.repartition(1), span_len=L
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            span_dedup_manifest(
                planted.repartition(13), span_len=L
            ).collect(),
        )
    )
    assert a == b


def test_overlapping_runs_merge_to_one_interval(spark):
    """Two duplicated runs overlapping in the victim doc merge into a
    single maximal interval (the interval-union contract)."""
    run_a = _words(L + 2)  # tokens w0..w{L+1}
    run_b = _words(L + 2, base=3)  # tokens w3..w{L+4}, overlaps run_a
    victim = _words(L + 5)  # w0..w{L+4} — contains both runs
    df = _mk(
        spark,
        [(0, run_a), (1, run_b), (2, victim)],
        parts=2,
    )
    m = span_dedup_manifest(df, span_len=L).collect()
    mine = [r for r in m if r["doc_id"] == 2]
    assert len(mine) == 1
    assert (mine[0]["span_start"], mine[0]["span_end"]) == (0, L + 5)


def test_span_len_guard(spark, planted):
    with pytest.raises(ValueError):
        span_hashes(planted, span_len=1)
    with pytest.raises(ValueError):
        span_hashes_arrow(planted, span_len=0)


def test_fuzz_matches_bruteforce_twin(spark):
    """Seeded randomized corpus (small vocab → organic collisions,
    plus planted clones and self-repeats) vs a brute-force python
    ExactSubstr twin: hash every window into a dict, keep-first by
    (id, pos), merge intervals. 200 docs, L=4."""
    import random

    L4 = 4
    rng = random.Random(99)
    docs = []
    for i in range(200):
        n = rng.randrange(0, 18)
        toks = [f"v{rng.randrange(12)}" for _ in range(n)]
        if i % 7 == 3 and docs:
            # clone a prefix of an earlier doc
            prev = docs[rng.randrange(len(docs))][1].split()
            toks = prev[: rng.randrange(len(prev) + 1)] + toks
        if i % 11 == 5 and len(toks) >= L4:
            toks = toks + toks[:L4]  # self-repeat
        docs.append((i, " ".join(toks)))

    # brute-force twin
    first: dict[tuple, tuple] = {}
    occ = []
    for i, t in docs:
        w = t.split()
        for p in range(len(w) - L4 + 1):
            key = tuple(w[p : p + L4])
            occ.append((i, p, key))
            if key not in first or (i, p) < first[key]:
                first[key] = (i, p)
    rem: dict[int, list] = {}
    for i, p, key in occ:
        if first[key] != (i, p):
            rem.setdefault(i, []).append((p, p + L4))
    expected = []
    for i, spans in rem.items():
        spans.sort()
        cur_s, cur_e = spans[0]
        for s, e in spans[1:]:
            if s > cur_e:
                expected.append((i, cur_s, cur_e, cur_e - cur_s))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        expected.append((i, cur_s, cur_e, cur_e - cur_s))

    df = spark.createDataFrame(
        docs, "doc_id long, text string"
    ).repartition(6)
    for arrow in (False, True):
        got = sorted(
            map(
                tuple,
                span_dedup_manifest(
                    df, span_len=L4, use_arrow=arrow
                ).collect(),
            )
        )
        assert got == sorted(expected), f"arrow={arrow}"
