"""Decontamination: n-gram overlap flags, short-doc shingles,
min_overlap thresholds, xxhash64/md5 digest parity, keep split."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.decontam import (
    benchmark_ngram_set,
    decontaminate,
    decontaminate_keep,
    ngram_digest_table,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # d1 contains the benchmark sentence verbatim (n=4 hit)
        (1, "alpha beta gamma delta epsilon zeta"),
        # d2 shares no 4-gram with any benchmark text
        (2, "one two three four five six seven"),
        # d3 short doc (< n words) equal to a short benchmark answer
        (3, "short answer"),
        # d4 case/whitespace-mangled copy of the benchmark sentence
        (4, "  ALPHA   beta GAMMA delta  "),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "short answer")],
        "doc_id long, text string",
    )


def test_flags(spark, corpus, bench):
    out = decontaminate(corpus, bench, n=4).select(
        "doc_id", "n_contaminated", "contaminated"
    )
    got = {r.doc_id: (r.n_contaminated, r.contaminated) for r in out.collect()}
    assert got[1] == (1, True)       # exact 4-gram
    assert got[2] == (0, False)
    assert got[3] == (1, True)       # short-shingle fallback
    assert got[4] == (1, True)       # normalization catches the mangle
    assert got[5] == (0, False)      # NULL text never contaminates


def test_min_overlap(spark):
    # the 5-word benchmark text has two 4-grams; the doc contains both
    bench5 = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    one = decontaminate(docs, bench5, n=4, min_overlap=2).first()
    assert one.n_contaminated == 2 and one.contaminated
    two = decontaminate(docs, bench5, n=4, min_overlap=3).first()
    assert not two.contaminated


def test_keep_split(spark, corpus, bench):
    kept = decontaminate_keep(corpus, bench, n=4)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [2, 5]
    assert kept.columns == corpus.columns


def test_digest_parity(spark, corpus, bench):
    """The xxhash64 scale path selects exactly the same documents as
    the oracle-checkable md5 path."""
    a = decontaminate(corpus, bench, n=4, digest="md5")
    b = decontaminate(corpus, bench, n=4, digest="xxhash64")
    cols = ["doc_id", "n_contaminated", "contaminated"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )
    with pytest.raises(ValueError):
        ngram_digest_table(corpus, "doc_id", digest="sha1")


def test_bench_set_distinct(spark, bench):
    s = benchmark_ngram_set(bench, n=4)
    assert s.columns == ["ng_digest"]
    assert s.count() == s.distinct().count()


def test_overlap_counts_distinct_ngrams(spark, bench):
    # the same benchmark 4-gram occurring twice in a doc counts once
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta alpha beta gamma delta")],
        "doc_id long, text string",
    )
    out = decontaminate(docs, bench, n=4).first()
    # distinct doc 4-grams overlapping bench: the repeated phrase's
    # unique grams — 'alpha beta gamma delta' (plus no others in bench)
    assert out.n_contaminated == 1
