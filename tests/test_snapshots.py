"""Committed-snapshot drift guard — the parquet files under
wos_crawler_spark/fixtures/data/ back the DuckDB oracles for the
mapInPandas/iterative driver entries (tools/make_snapshots.py). If the
parser, crawl loop, or featurizer changes behavior, this fails BEFORE
the driver's correctness gate does; regenerate the snapshots only for
intentional behavior changes."""

import os
import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from make_snapshots import DATA_DIR, build_frames, canon  # noqa: E402


@pytest.fixture(scope="module")
def live_frames(spark):
    return build_frames(spark)


SNAPSHOT_NAMES = [
    "parsed_docs",
    "parsed_authors",
    "parsed_affs",
    "parsed_refs",
    "parsed_bib",
    "crawl_fetch_log",
    "media_feats",
    "simhash_sigs_sf001",
    "minhash_bands_sf001",
    "minhash_edges_sf001",
    "lsh_cand_sf001",
    "cos_near_dup_sf001",
    "ivf_cand_sf001",
    "pq_codebooks_sf001",
]


@pytest.mark.parametrize("name", SNAPSHOT_NAMES)
def test_snapshot_matches_live(name, live_frames):
    pdf, keys = live_frames[name]
    live = canon(pdf, keys)
    committed = pd.read_parquet(os.path.join(DATA_DIR, f"{name}.parquet"))
    pd.testing.assert_frame_equal(live, committed, check_exact=True)
