"""Seen-set compaction: snapshot+tail equality vs the full union,
CDC-eviction interplay on both sides of the snapshot boundary,
resume-point isolation (newer snapshots ignored), and the fast path
actually reading the snapshot instead of the folded wave dirs."""

import os

from wos_crawler_spark.operators import checkpoint as ckpt


def _write(spark, path, rows):
    spark.createDataFrame(rows, "url_hash long, wave int").write.parquet(path)


def _mk_wave(spark, d, w, deltas, evicts=None):
    wd = os.path.join(d, f"wave={w}")
    _write(spark, os.path.join(wd, "seen_delta"), [(h, w) for h in deltas])
    if evicts is not None:
        _write(spark, os.path.join(wd, "seen_evict"), [(h, w) for h in evicts])
    with open(os.path.join(wd, "_COMMITTED"), "w") as f:
        f.write("")


def _world(spark, tmp_path, name):
    """w0 {1,2}, w1 {3}, w2 evicts {2,3} (empty delta), w3 refetches
    {3}. Seen@3 = {1, 3}; 2 stays evicted."""
    d = str(tmp_path / name)
    _mk_wave(spark, d, 0, [1, 2])
    _mk_wave(spark, d, 1, [3])
    _mk_wave(spark, d, 2, [], evicts=[2, 3])
    _mk_wave(spark, d, 3, [3])
    return d


def _seen(spark, d, upto):
    return {r.url_hash for r in ckpt.read_seen(spark, d, upto).collect()}


def test_cdc_baseline_no_compaction(spark, tmp_path):
    d = _world(spark, tmp_path, "a")
    assert _seen(spark, d, 3) == {1, 3}
    assert _seen(spark, d, 2) == {1}
    assert _seen(spark, d, 1) == {1, 2, 3}


def test_compaction_equality_at_every_boundary(spark, tmp_path):
    for k in range(4):
        d = _world(spark, tmp_path, f"b{k}")
        want = {u: _seen(spark, d, u) for u in range(4)}
        ckpt.compact_seen(spark, d, k, buckets=4)
        # every resume point >= k reads snapshot+tail and must agree;
        # resume points < k must ignore the newer snapshot
        for u in range(4):
            assert _seen(spark, d, u) == want[u], (k, u)


def test_snapshot_fast_path_reads_snapshot_not_waves(spark, tmp_path):
    d = _world(spark, tmp_path, "c")
    ckpt.compact_seen(spark, d, 3, buckets=4)
    files = ckpt.read_seen(spark, d, 3).inputFiles()
    assert files and all("compact=3" in f for f in files)
    # and the snapshot itself holds the CDC-merged set
    assert _seen(spark, d, 3) == {1, 3}


def test_chained_compactions(spark, tmp_path):
    # compacting on top of an earlier compaction folds snapshot+tail
    d = _world(spark, tmp_path, "d")
    ckpt.compact_seen(spark, d, 1, buckets=2)
    ckpt.compact_seen(spark, d, 3, buckets=2)
    assert ckpt.latest_compaction(d, 3) == 3
    assert ckpt.latest_compaction(d, 2) == 1
    assert _seen(spark, d, 3) == {1, 3}


def test_post_snapshot_eviction_cancels_base_keys(spark, tmp_path):
    # snapshot at wave 1 (before the eviction wave): the eviction at
    # wave 2 must still cancel snapshot keys 2 and 3; wave-3 refetch
    # of 3 must win over the eviction
    d = _world(spark, tmp_path, "e")
    ckpt.compact_seen(spark, d, 1, buckets=2)
    assert _seen(spark, d, 2) == {1}
    assert _seen(spark, d, 3) == {1, 3}


def test_torn_compaction_invisible(spark, tmp_path):
    d = _world(spark, tmp_path, "f")
    ckpt.compact_seen(spark, d, 3, buckets=2)
    os.remove(os.path.join(ckpt.compact_dir(d, 3), "_COMMITTED"))
    assert ckpt.latest_compaction(d, 3) is None
    assert _seen(spark, d, 3) == {1, 3}  # falls back to wave union
