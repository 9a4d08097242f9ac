"""Persisted MinHash dedup index (operators/dedupindex.py): query
correctness vs an independent verification rule, save/load round-trip
with param drift refusal by construction, the no-standing-text-scan
property (the index's whole point), extend-then-find, broadcast plan
shape, guards."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.dedupindex import (
    dedup_index_build,
    dedup_index_extend,
    dedup_index_load,
    dedup_index_query,
    dedup_index_save,
)


def _corpora(spark):
    base = [" ".join(f"t{i * 50 + j}" for j in range(40)) for i in range(30)]
    standing = spark.createDataFrame(
        list(enumerate(base)), "doc_id long, text string"
    )
    near7 = base[7].split()
    near7[3] = "edited"
    query = spark.createDataFrame(
        [
            (100, base[5]),                 # exact dup of standing 5
            (101, " ".join(near7)),         # 39/41-word near-dup of 7
            (102, " ".join(f"q{j}" for j in range(40))),  # fresh
            (103, ""),                      # empty — no bands, no sets
        ],
        "doc_id long, text string",
    )
    return standing, query


def _py_jaccard_words(a, b):
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return None
    return len(sa & sb), len(sa | sb)


def test_query_finds_dups_with_exact_verification(spark):
    standing, query = _corpora(spark)
    idx = dedup_index_build(standing, shingle_n=1, k=32, n_bands=8)
    out = {
        (r["id_new"], r["id_idx"]): (r["n_inter"], r["n_union"])
        for r in dedup_index_query(idx, query, t_num=1, t_den=2).collect()
    }
    # the exact dup is found deterministically (identical signature →
    # every band collides) with n_inter == n_union
    assert out[(100, 5)][0] == out[(100, 5)][1] == 40
    # the near-dup's counts equal the python word-set truth
    base = {r["doc_id"]: r["text"] for r in standing.collect()}
    qtxt = {r["doc_id"]: r["text"] for r in query.collect()}
    assert out[(101, 7)] == _py_jaccard_words(qtxt[101], base[7])
    # fresh and empty docs match nothing; no sub-threshold pair leaks
    ids_new = {k[0] for k in out}
    assert 102 not in ids_new and 103 not in ids_new
    for (n, x), (ni, nu) in out.items():
        assert ni * 2 >= nu * 1


def test_save_load_roundtrip_and_no_standing_text_scan(spark, tmp_path):
    standing, query = _corpora(spark)
    docs_path = str(tmp_path / "standing_docs")
    standing.write.parquet(docs_path)
    standing_pq = spark.read.parquet(docs_path)

    idx = dedup_index_build(standing_pq, shingle_n=1, k=32, n_bands=8)
    live = sorted(
        map(tuple, dedup_index_query(idx, query).collect())
    )
    ipath = str(tmp_path / "dedup_index")
    dedup_index_save(idx, ipath)
    loaded = dedup_index_load(spark, ipath)
    assert (loaded.shingle_n, loaded.k, loaded.n_bands) == (1, 32, 8)
    q = dedup_index_query(loaded, query)
    assert sorted(map(tuple, q.collect())) == live and len(live) >= 2
    # the index's whole point: querying the LOADED index never touches
    # the standing corpus's text files (formatted explain keeps full
    # scan Locations; the plain plan string truncates them)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "standing_docs" not in plan
    assert "dedup_index" in plan
    # the increment side is broadcast: the band probe is a BHJ and the
    # standing band table never shuffles
    assert "BroadcastHashJoin" in plan


def test_extend_then_find(spark, tmp_path):
    standing, query = _corpora(spark)
    ipath = str(tmp_path / "idx")
    idx = dedup_index_build(standing, shingle_n=1, k=32, n_bands=8)
    dedup_index_save(idx, ipath)
    loaded = dedup_index_load(spark, ipath)
    # admit the fresh doc 102, then a later copy of it must be caught
    fresh = query.filter(F.col("doc_id") == 102)
    dedup_index_extend(loaded, ipath, fresh)
    re = dedup_index_load(spark, ipath)
    copy = spark.createDataFrame(
        [(200, query.filter(F.col("doc_id") == 102).first()["text"])],
        "doc_id long, text string",
    )
    hits = dedup_index_query(re, copy).collect()
    assert [(r["id_new"], r["id_idx"]) for r in hits] == [(200, 102)]


def test_guards(spark):
    standing, query = _corpora(spark)
    with pytest.raises(ValueError):
        dedup_index_build(standing, k=32, n_bands=7)
    idx = dedup_index_build(standing, shingle_n=1, k=32, n_bands=8)
    with pytest.raises(ValueError):
        dedup_index_query(idx, query, t_num=3, t_den=2)
