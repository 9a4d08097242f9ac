"""BM25 top-k retrieval (operators/bm25.py): ranking semantics,
python-twin parity under the nano-quantization protocol, determinism
under repartitioning, and edge cases (empty docs/queries)."""

import math

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.bm25 import (
    bm25_topk,
    corpus_postings,
    doc_lengths,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cat cat cat everywhere cat"),
    (4, "a completely unrelated sentence about spark"),
    (5, "the the the the the the the the the the the the"),
    (6, ""),
    (7, None),
]
QUERIES = [(0, "cat"), (1, "the dog"), (2, "zzz_absent"), (3, "")]


def _bm25_python(docs, queries, k=10, k1=1.2, b=0.75):
    """Independent twin with the same tokenization + quantization."""
    import re

    def words(t):
        t = re.sub(r"\s+", " ", (t or "").lower()).strip()
        return [w for w in t.split(" ") if w]

    dls = {d: len(words(t)) for d, t in docs}
    n = len(docs)
    avgdl = sum(dls.values()) / float(n)
    tfs = {}
    for d, t in docs:
        for w in words(t):
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
    out = {}
    for qid, qt in queries:
        scores = {}
        for term in sorted(set(words(qt))):
            df = sum(1 for (d, w) in tfs if w == term)
            if df == 0:
                continue
            idf = math.log(1.0 + (float(n) - float(df) + 0.5) / (float(df) + 0.5))
            for (d, w), tf in tfs.items():
                if w != term:
                    continue
                tfp = (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * dls[d] / avgdl)
                )
                c = math.floor(idf * tfp * 1e9)
                nt, s = scores.get(d, (0, 0))
                scores[d] = (nt + 1, s + int(c))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
        out[qid] = [
            (d, nt, s, r + 1) for r, (d, (nt, s)) in enumerate(ranked[:k])
        ]
    return out


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "q_id long, q_text string")
    rows = bm25_topk(docs, qs, k=10).collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["q_id"], r["rank"])):
        by_q.setdefault(r["q_id"], []).append(
            (r["doc_id"], r["n_terms"], r["score_nano"], r["rank"])
        )
    return by_q


def test_python_twin_parity(result):
    assert result == {
        k: v for k, v in _bm25_python(DOCS, QUERIES).items() if v
    }


def test_ranking_semantics(result):
    # q0 "cat": tf-heavy doc 3 beats doc 1
    assert [d for d, *_ in result[0]] == [3, 1]
    # q1 "the dog": doc 2 has both terms and tops; the "the"-spam doc 5
    # is length-penalized below doc 2
    assert result[1][0][0] == 2
    docs_q1 = [d for d, *_ in result[1]]
    assert set(docs_q1) == {1, 2, 5}
    assert result[1][0][1] == 2  # n_terms: both query terms matched
    # absent term and empty query produce no rows
    assert 2 not in result and 3 not in result


def test_empty_docs_never_match(result):
    for rows in result.values():
        assert all(d not in (6, 7) for d, *_ in rows)


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "q_id long, q_text string")
    a = sorted(map(tuple, bm25_topk(docs.repartition(1), qs, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(7), qs, k=10).collect()))
    assert a == b


def test_k_truncation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(9, "the sat on")], "q_id long, q_text string")
    out = bm25_topk(docs, qs, k=2).collect()
    assert len(out) == 2 and {r["rank"] for r in out} == {1, 2}


def test_postings_and_lengths(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    posts = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in corpus_postings(docs).collect()
    }
    assert posts[(3, "cat")] == 4 and posts[(1, "the")] == 2
    dls = {r["doc_id"]: r["dl"] for r in doc_lengths(docs).collect()}
    assert dls[1] == 6 and dls[6] == 0 and dls[7] == 0


def test_containment_join_exact_and_edges(spark):
    """Boolean-AND retrieval: brute-force parity over a planted
    corpus; duplicate query tokens collapse; empty queries match
    nothing; partitioning invariance."""
    from wos_crawler_spark.operators.bm25 import containment_join

    docs = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta"),
        (2, "beta gamma alpha zz alpha"),  # dup tokens in doc
        (3, "unrelated words entirely"),
        (4, ""),
    ]
    queries = [
        (10, "alpha beta"),          # ⊆ docs 0, 1, 2
        (11, "alpha alpha beta"),    # dup q tokens collapse → same
        (12, "gamma delta"),         # ⊆ doc 0 only
        (13, "alpha zz zz"),         # ⊆ doc 2 only
        (14, ""),                    # empty → nothing
        (15, "   "),                 # whitespace → nothing
        (16, "absent token"),        # no match
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    q = spark.createDataFrame(queries, "q_id long, q_text string")
    got = sorted(
        (r["q_id"], r["doc_id"])
        for r in containment_join(d, q).collect()
    )
    expect = []
    for qid, qt in queries:
        qs = set(qt.lower().split())
        if not qs:
            continue
        for did, dt in docs:
            if qs <= set(dt.lower().split()):
                expect.append((qid, did))
    assert got == sorted(expect)
    assert (10, 0) in got and (11, 1) in got and (13, 2) in got
    assert not any(q_ in (14, 15, 16) for q_, _ in got)
    again = sorted(
        (r["q_id"], r["doc_id"])
        for r in containment_join(d.repartition(11), q).collect()
    )
    assert again == got


# ---------------------------------------------------------------- TF-IDF


def test_tfidf_topk_matches_python_twin(spark):
    import math

    from wos_crawler_spark.operators.bm25 import tfidf_topk_terms

    rows = [
        (1, "apple banana apple cherry common common"),
        (2, "banana date common common date date"),
        (3, "elder common fig fig"),
        (4, ""),  # no postings, no keywords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["rank"], r["term"], r["tf"], r["df"], r["score_nano"])
        for r in tfidf_topk_terms(df, k=2).collect()
    )
    # python twin
    import collections
    tf = {i: collections.Counter(t.split()) for i, t in rows}
    docs_with = collections.Counter(
        w for i, t in rows for w in set(t.split())
    )
    n = len([i for i, t in rows if t.split()])
    want = []
    for i, c in tf.items():
        scored = sorted(
            (
                -math.floor(c[w] * (math.log((1 + n) / (1 + docs_with[w])) + 1.0) * 1e9),
                w,
            )
            for w in c
        )
        for r, (neg, w) in enumerate(scored[:2], start=1):
            want.append((i, r, w, c[w], docs_with[w], -neg))
    assert got == sorted(want)
    # doc 4 emits nothing
    assert not any(g[0] == 4 for g in got)


def test_tfidf_max_df_drops_boilerplate_and_guards(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.bm25 import tfidf_topk_terms

    rows = [
        (1, "boiler rare1 x y"),
        (2, "boiler rare2 x z"),
        (3, "boiler rare3 w v"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # boiler is in 3/3 docs; max_df 2/3 drops it before ranking
    out = tfidf_topk_terms(df, k=10, max_df_num=2, max_df_den=3)
    assert "boiler" not in {r["term"] for r in out.collect()}
    # partitioning invariance
    a = sorted(map(tuple, tfidf_topk_terms(df.repartition(1), k=2).collect()))
    b = sorted(map(tuple, tfidf_topk_terms(df.repartition(7), k=2).collect()))
    assert a == b
    with _pytest.raises(ValueError):
        tfidf_topk_terms(df, k=0)
    with _pytest.raises(ValueError):
        tfidf_topk_terms(df, min_df=0)
