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

Plus the sf0.01-pinned intermediates for the hash-based dedup/ANN
family (the driver's oracle compare runs at sf0.01 ONLY, and
/root/testdata is seeded + read-only per TESTDATA.md, so pinning is
sound). For these the snapshot carries just the non-SQL step
(xxhash64 signatures / LSH buckets / candidate ids) and oracle_sql()
recomputes the whole downstream — brute-force Hamming, exact Jaccard,
recursive-CTE connected components, cosine ranking — independently in
DuckDB over the live documents/embeddings views:

- ``simhash_sigs_sf001``   (doc_id, simhash) over sf0.01 documents
- ``minhash_bands_sf001``  (doc_id, band_id, band_hash) LSH front-end
- ``minhash_edges_sf001``  (src, dst) star edges per bucket
- ``lsh_cand_sf001``       (q_id, vec_id) ANN candidates
- ``cos_near_dup_sf001``   (id_a, id_b) blocked near-dup output pin
- ``semdedup_assign_sf001`` (vec_id, cluster, cent_sim) k-means cells
- ``semdedup_pairs_sf001``  (id_a, id_b) within-cell threshold pairs

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

    # ---- sf0.01-pinned hash intermediates (dedup/ANN family) --------
    sf = "/root/testdata/sf0.01"
    from wos_crawler_spark.operators import similarity as sim
    from wos_crawler_spark.operators import textdedup as td

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    frames["simhash_sigs_sf001"] = (
        td.simhash(docs, id_col="doc_id", text_col="text").toPandas(),
        ["doc_id"],
    )
    banded = td._banded(
        docs, id_col="doc_id", text_col="text", shingle_n=1, k=32, bands=8
    )
    frames["minhash_bands_sf001"] = (
        banded.withColumnRenamed("_id", "doc_id").toPandas(),
        ["doc_id", "band_id"],
    )
    frames["minhash_edges_sf001"] = (
        td.minhash_star_edges(banded).toPandas(),
        ["src", "dst"],
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    frames["lsh_cand_sf001"] = (
        sim.lsh_candidates(
            emb, queries, dim=64, n_planes=6, n_tables=2, probe_hamming=1
        ).toPandas(),
        ["q_id", "vec_id"],
    )
    frames["cos_near_dup_sf001"] = (
        entrymod.q_sim_cosine_near_dup(spark, sf).toPandas(),
        ["id_a", "id_b"],
    )
    frames["ivf_cand_sf001"] = (
        sim.ivf_candidates(
            emb, queries, n_centroids=16, n_probe=4, n_iter=3
        ).toPandas(),
        ["q_id", "vec_id"],
    )
    # SemDeDup: pin the k-means assignment (+cent_sim, the keep key)
    # and the within-cell threshold pairs; the oracle recomputes
    # components + keeper independently (recursive CTE + window).
    from wos_crawler_spark.operators import semdedup as sd

    cent = sim.ivf_train_centroids(emb, n_centroids=16, n_iter=2)
    asn = sd.assign_with_sim(emb, cent)
    frames["semdedup_assign_sf001"] = (
        asn.select(
            "vec_id",
            F.col("_cluster").alias("cluster"),
            F.col("_cent_sim").alias("cent_sim"),
        ).toPandas(),
        ["vec_id"],
    )
    frames["semdedup_pairs_sf001"] = (
        sd.semdedup_pairs(asn, 0.3).select("id_a", "id_b").toPandas(),
        ["id_a", "id_b"],
    )
    # PQ: pin ONLY the trained codebooks (training is the one
    # non-reproducible-in-SQL step — numpy Lloyd on the hash sample);
    # the oracle recomputes encoding (argmin over the generated
    # left-assoc distance chains), ADC LUTs, scores and ranking from
    # scratch over the live embeddings.
    from wos_crawler_spark.operators import pq as pqm

    books = pqm.pq_train(emb, m_sub=8, k=16, n_iter=5, sample=500)
    frames["pq_codebooks_sf001"] = (
        pqm.codebooks_df(spark, books).toPandas(),
        ["sub", "code"],
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
