"""Sequence packing (operators/packing.py): manifest semantics vs a
python twin, the full-blocks invariant, partition-count independence
(the distributed prefix sum must equal a single-node cumsum), and
block assembly with separator slots."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators.packing import (
    gather_blocks,
    pack_manifest,
    pack_stats,
)

DOCS = [(1, 5), (2, 3), (3, 9), (4, 1), (5, 0), (6, None), (7, 4)]
B = 8
SEP = 1


def _manifest_python(docs, block_size, sep):
    out = []
    end = 0
    for d, n in sorted(docs):
        if n is None or n <= 0:
            continue
        L = n + sep
        start, end = end, end + L
        for blk in range(start // block_size, (end - 1) // block_size + 1):
            ps = max(start, blk * block_size)
            pe = min(end, (blk + 1) * block_size)
            out.append((d, blk, ps - start, ps - blk * block_size, pe - ps))
    return sorted(out)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, n_tokens long")


def test_manifest_matches_python_twin(spark, docs_df):
    got = sorted(
        map(tuple, pack_manifest(docs_df, B, sep_tokens=SEP).collect())
    )
    assert got == _manifest_python(DOCS, B, SEP)


def test_zero_and_null_docs_dropped(spark, docs_df):
    ids = {r["doc_id"] for r in pack_manifest(docs_df, B).collect()}
    assert 5 not in ids and 6 not in ids


def test_partition_count_independence(spark, docs_df):
    a = sorted(map(tuple, pack_manifest(
        docs_df, B, sep_tokens=SEP, num_partitions=1).collect()))
    b = sorted(map(tuple, pack_manifest(
        docs_df.repartition(5), B, sep_tokens=SEP,
        num_partitions=7).collect()))
    assert a == b


def test_full_blocks_invariant(spark):
    # 300 docs, varied lengths: every non-last block exactly full
    rows = [(i, 1 + (i * 7) % 23) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    m = pack_manifest(docs, 64, sep_tokens=1, num_partitions=8)
    stats = pack_stats(m, 64).collect()[0]
    total = sum(n + 1 for _, n in rows)
    assert stats["non_last_fill_defect"] == 0
    assert stats["n_blocks"] == (total + 63) // 64
    assert stats["fill_last"] == total - (stats["n_blocks"] - 1) * 64
    # straddling docs appear in exactly their covered blocks
    per_doc = m.groupBy("doc_id").agg(
        F.sum("piece_len").alias("s")).collect()
    assert all(r["s"] == dict(rows)[r["doc_id"]] + 1 for r in per_doc)


def test_gather_blocks_with_separator_slots(spark):
    docs = spark.createDataFrame(
        [(1, [10, 11, 12]), (2, [20, 21]), (3, [30, 31, 32, 33])],
        "doc_id long, tokens array<bigint>",
    )
    counted = docs.withColumn("n_tokens", F.size("tokens"))
    m = pack_manifest(counted, 4, sep_tokens=1)
    blocks = {
        r["block_id"]: r["tokens"]
        for r in gather_blocks(m, docs).collect()
    }
    # stream: 10 11 12 ∅ | 20 21 ∅ 30 | 31 32 33 ∅   (∅ = separator)
    assert blocks[0] == [10, 11, 12, None]
    assert blocks[1] == [20, 21, None, 30]
    assert blocks[2] == [31, 32, 33, None]


def test_block_size_validation(spark, docs_df):
    with pytest.raises(ValueError):
        pack_manifest(docs_df, 0)


# ------------------------------------------------------------ shard packing


def _py_serpentine(sizes, s):
    # sizes: list of (doc_id, n_tokens); returns {doc_id: shard}
    ranked = sorted(sizes, key=lambda t: (-t[1], t[0]))
    out = {}
    for r, (i, _) in enumerate(ranked):
        q, m = divmod(r, s)
        out[i] = m if q % 2 == 0 else s - 1 - m
    return out


def test_assign_shards_matches_python_twin_and_partition_invariance(spark):
    from wos_crawler_spark.operators.packing import assign_shards

    # heavy ties (sizes collide mod 17) make the doc_id tie-break
    # load-bearing; a power-law head stresses balance
    rows = [(i, (1000 if i < 5 else (i * 7) % 17 + 1)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    want = _py_serpentine(rows, 8)
    for parts in (2, 7):
        got = {
            r["doc_id"]: r["shard"]
            for r in assign_shards(
                df.repartition(5), 8, num_partitions=parts
            ).collect()
        }
        assert got == want, f"num_partitions={parts}"


def test_assign_shards_balance_and_exhaustiveness(spark):
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.packing import assign_shards, shard_stats

    rows = [(i, (i * 13) % 97 + 3) for i in range(1000)] + [(1000, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = assign_shards(df, 8)
    # exhaustive: every doc sharded exactly once, NULL tokens kept as 0
    assert a.count() == 1001
    assert a.filter(F.col("doc_id") == 1000).first()["n_tokens"] == 0
    st = {r["shard"]: r["tokens_total"] for r in shard_stats(a).collect()}
    assert set(st) == set(range(8))
    # serpentine balance: spread within one max item of perfect
    assert max(st.values()) - min(st.values()) <= 100


def test_assign_shards_guard_and_single_shard(spark):
    import pytest as _pytest

    from wos_crawler_spark.operators.packing import assign_shards

    df = spark.createDataFrame([(1, 5), (2, 3)], "doc_id long, n_tokens long")
    assert {r["shard"] for r in assign_shards(df, 1).collect()} == {0}
    with _pytest.raises(ValueError):
        assign_shards(df, 0)


# ------------------------------------------------------- sliding chunks


def _py_chunks(n, w, s):
    if n <= 0:
        return []
    k = 1 if n <= w else 1 + -(-(n - w) // s)
    return [(c, c * s, min(w, n - c * s)) for c in range(k)]


def test_chunk_manifest_matches_python_twin(spark):
    from wos_crawler_spark.operators.packing import chunk_manifest

    rows = [(i, n) for i, n in enumerate([1, 7, 8, 9, 16, 17, 100, 0, None])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    for w, s in [(8, 4), (8, 8), (4, 6)]:  # overlap, tiling, gaps
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["start"], r["piece_len"])
            for r in chunk_manifest(df, w, s).collect()
        )
        want = sorted(
            (i, c, st, ln)
            for i, n in rows
            if n
            for c, st, ln in _py_chunks(n, w, s)
        )
        assert got == want, (w, s)
    # no chunk is ever empty, none overruns its doc
    m = chunk_manifest(df, 8, 4)
    from pyspark.sql import functions as F
    bad = m.filter(
        (F.col("piece_len") <= 0) | (F.col("start") < 0)
    ).count()
    assert bad == 0


def test_chunk_manifest_no_redundant_tail_and_coverage(spark):
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.packing import chunk_manifest

    # n=10, w=8, s=4: chunk 0 covers [0,8), chunk 1 covers [4,10) and
    # REACHES the end — a chunk 2 at start 8 would be fully contained
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    got = [
        (r["chunk_id"], r["start"], r["piece_len"])
        for r in chunk_manifest(df, 8, 4).orderBy("chunk_id").collect()
    ]
    assert got == [(0, 0, 8), (1, 4, 6)]
    # with stride < window every token position is covered
    df2 = spark.createDataFrame([(1, 37)], "doc_id long, n_tokens long")
    m = chunk_manifest(df2, 8, 5)
    covered = set()
    for r in m.collect():
        covered |= set(range(r["start"], r["start"] + r["piece_len"]))
    assert covered == set(range(37))


def test_gather_chunks_slices(spark):
    from pyspark.sql import functions as F

    from wos_crawler_spark.operators.packing import chunk_manifest, gather_chunks

    docs = spark.createDataFrame([(1, list(range(10)))], "doc_id long, tokens array<int>")
    sized = docs.select("doc_id", F.size("tokens").cast("long").alias("n_tokens"))
    out = {
        r["chunk_id"]: r["tokens"]
        for r in gather_chunks(chunk_manifest(sized, 8, 4), docs).collect()
    }
    assert out == {0: list(range(8)), 1: list(range(4, 10))}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_manifest(sized, 0, 4)
