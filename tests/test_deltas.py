"""Corpus delta: classification matrix incl. NULL-text transitions,
unchanged filtering, partitioning invariance."""

from wos_crawler_spark.operators.deltas import corpus_delta

ROWS_OLD = [
    ("u1", "same"),
    ("u2", "before"),
    ("u3", "gone"),
    ("u4", None),
    ("u5", None),
]
ROWS_NEW = [
    ("u1", "same"),
    ("u2", "after"),
    ("u4", None),         # NULL -> NULL: unchanged
    ("u5", "now text"),   # NULL -> text: changed
    ("u6", "fresh"),
]


def _mk(spark, rows, parts=1):
    return spark.createDataFrame(
        rows, "url string, text string"
    ).repartition(parts)


def test_classification(spark):
    got = {
        r.key: r.status
        for r in corpus_delta(
            _mk(spark, ROWS_OLD), _mk(spark, ROWS_NEW)
        ).collect()
    }
    assert got == {
        "u2": "changed",
        "u3": "removed",
        "u5": "changed",
        "u6": "added",
    }


def test_include_unchanged_and_digests(spark):
    rows = {
        r.key: r
        for r in corpus_delta(
            _mk(spark, ROWS_OLD), _mk(spark, ROWS_NEW),
            include_unchanged=True,
        ).collect()
    }
    assert rows["u1"].status == "unchanged"
    assert rows["u4"].status == "unchanged"
    assert rows["u4"].old_digest is None and rows["u4"].new_digest is None
    assert rows["u6"].old_digest is None and rows["u6"].new_digest
    assert len(rows) == 6


def test_partitioning_invariance(spark):
    a = sorted(
        (r.key, r.status)
        for r in corpus_delta(
            _mk(spark, ROWS_OLD, 1), _mk(spark, ROWS_NEW, 1)
        ).collect()
    )
    b = sorted(
        (r.key, r.status)
        for r in corpus_delta(
            _mk(spark, ROWS_OLD, 7), _mk(spark, ROWS_NEW, 3)
        ).collect()
    )
    assert a == b
