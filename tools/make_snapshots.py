"""Generate the committed parquet snapshots that back the DuckDB
oracles for the non-SQL-expressible driver entries (parse family,
crawl loop, multimodal).

Rationale (VERDICT r1 "Next round #1"): the parser / normalization
family is the engine's flagship surface but DuckDB cannot run
mapInPandas, so those entries only got the driver's weak rows-only
check. These snapshots pin the parse output of the DETERMINISTIC
fixture corpus (wosgen is pure hash-derived — identical bytes on any
partitioning) to committed parquet; oracle_sql() then recomputes the
joins/aggregations over the snapshots in plain SQL, giving the driver
a full rows+schema+hash gate:

- ``parsed_docs``       flat scalar projection of parse_pages(pages_table(200))
- ``parsed_authors``    normalize.authors_table of the same parse
- ``parsed_affs``       normalize.affiliations_table
- ``parsed_refs``       normalize.references_table (unique_id, ref_doi)
- ``parsed_bib``        parse_bib_pages over the fixture bib corpus
- ``crawl_fetch_log``   q_crawl_end_to_end output (3-wave loop, n=300)
- ``media_feats``       q_multimodal_features output (fake featurizer)

Files are single deterministic parquet files (collected, sorted,
written via pandas/pyarrow). Re-run this tool ONLY when the parser /
fixtures intentionally change behavior; tests/test_snapshots.py fails
on any unintended drift.

Usage: python tools/make_snapshots.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DATA_DIR = os.path.join(
    Path(__file__).resolve().parents[1],
    "wos_crawler_spark", "fixtures", "data",
)


def build_frames(spark) -> dict:
    """All snapshot frames as (pandas_df, sort_keys) — shared with
    tests/test_snapshots.py so the drift check and the generator can
    never disagree about what is being pinned."""
    import __spark_entry__ as entrymod

    frames = {}

    parsed = entrymod._parsed(spark)  # parse_pages(pages_table(200))
    frames["parsed_docs"] = (
        entrymod._parsed_flat(parsed).toPandas(),
        ["unique_id"],
    )
    from wos_crawler_spark.operators import normalize
    from pyspark.sql import functions as F

    frames["parsed_authors"] = (
        normalize.authors_table(parsed)
        .select("unique_id", F.col("rank").cast("long").alias("rank"), "full_name")
        .toPandas(),
        ["unique_id", "rank"],
    )
    frames["parsed_affs"] = (
        normalize.affiliations_table(parsed)
        .select(
            "unique_id",
            F.col("author_rank").cast("long").alias("author_rank"),
            "address",
        )
        .toPandas(),
        ["unique_id", "author_rank", "address"],
    )
    frames["parsed_refs"] = (
        normalize.references_table(parsed)
        .select("unique_id", F.col("doi").alias("ref_doi"))
        .toPandas(),
        ["unique_id", "ref_doi"],
    )
    frames["parsed_bib"] = (
        entrymod.q_parse_bibtex(spark, "").toPandas(),
        ["url"],
    )
    frames["crawl_fetch_log"] = (
        entrymod.q_crawl_end_to_end(spark, "").toPandas(),
        ["wave", "host"],
    )
    frames["media_feats"] = (
        entrymod.q_multimodal_features(spark, "").toPandas(),
        ["asset_id"],
    )
    return frames


def canon(pdf, sort_keys):
    return (
        pdf.sort_values(sort_keys, kind="mergesort", na_position="last")
        .reset_index(drop=True)
    )


def main() -> int:
    from wos_crawler_spark.session import get_spark

    os.makedirs(DATA_DIR, exist_ok=True)
    spark = get_spark("make-snapshots")
    for name, (pdf, keys) in build_frames(spark).items():
        out = canon(pdf, keys)
        path = os.path.join(DATA_DIR, f"{name}.parquet")
        out.to_parquet(path, index=False)
        print(f"wrote {path}: {len(out)} rows, cols={list(out.columns)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
