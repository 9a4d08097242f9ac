"""Physical-plan audit: evidence that the headline queries produce the
plans we designed for — filters pushed into the parquet scan, columns
pruned, small sides broadcast, whole-stage codegen spanning the hot
expressions (SURVEY.md §4).

Writes PLANS.md with, per audited query:
  - PushedFilters / ReadSchema lines from every scan node
  - join strategies chosen (BroadcastHashJoin / SortMergeJoin / BNLJ)
  - WholeStageCodegen span count
  - exchange (shuffle) count — the number we minimize

Usage: python tools/explain_audit.py [--sf DIR] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

AUDIT = [
    "tpch_q1_pricing",
    "tpch_q3_top_orders",
    "j1_customers_without_orders",
    "j2_dim_rollup",
    "events_hourly",
    "w_events_sessionize",
    "f1_frontier_dedup",
    "f4_politeness_schedule",
    "w1_priority_quota",
    "dedup_exact",
    "text_quality",
    "sim_bruteforce_topk",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "sim_lsh_topk",
    "parse_tab",
    "j7_asof_join",
    "f1_frontier_dedup_cuckoo",
    "recrawl_readmit",
    "pipeline_curation",
    "f4_crawl_delay",
    "sim_cosine_clusters",
    "sim_index_ivf_topk",
    "text_gopher_quality",
    "text_gopher_repetition",
    "decontam_ngram_overlap",
    "f_blocklist_gate",
    "pii_redact",
    "graph_pagerank_hosts",
    "dedup_winnow",
    "pipeline_curation_v2",
    "f_content_sniff",
    "f_extract_links",
    "text_quality_classifier",
    "s_sitemap_discovery",
    "recrawl_change_schedule",
    "f_html_to_text",
    "f_trap_guard",
    "text_bm25_topk",
    "pack_sequences",
    "dsir_select",
    "dedup_spans",
    "dedup_spans_apply",
    "f_resolve_redirects",
    "s_wet_roundtrip",
    "text_lm_perplexity",
    "sample_mixture",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "pipeline_curation_v3",
    "a_hll_host_cardinality",
    "a_cms_url_frequency",
    "dedup_jaccard_exact_join",
    "text_containment_join",
    "dedup_jaccard_cross_join",
    "sample_upsample",
    "sample_host_cap",
    "pack_shards",
    "chunk_sliding_windows",
    "f_anchor_corpus",
    "dedup_index_query",
    "stats_length_quantiles",
    "text_tfidf_keywords",
    "f_mirror_hosts",
    "s_warc_roundtrip",
    "f_url_gate",
    "f_registrable_domain",
    "text_normalize_nfc",
    "bpe_encode",
    "a_heavy_hitter_keys",
    "pipeline_curation_v4",
    "s3_advanced_query",
    "s_sitemap_stale",
    "j4_seed_match_advanced",
    "text_strip_boilerplate",
    "stats_corpus_datacard",
    "graph_hits_hosts",
    "text_script_profile",
    "corpus_delta",
    "graph_opic_hosts",
    "pipeline_seed_discovery",
    "text_classifier_train_score",
    "multimodal_decode_real",
    "multimodal_image_neardup",
    "pipeline_curation_v5",
    "multimodal_image_neardup16",
    "multimodal_image_neardup_capped",
    "multimodal_decode_audio",
    "multimodal_resize_real",
    "multimodal_video_frames",
    "w1_opic_priority",
    "f_registrable_domain_psl",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, plan: str) -> str:
    scans = re.findall(r"\(\d+\) Scan parquet.*?(?=\n\(\d+\)|\Z)", plan, re.S)
    lines = [f"## {name}", ""]
    n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    joins = sorted(
        set(re.findall(r"\(\d+\) (\w*(?:HashJoin|MergeJoin|NestedLoopJoin)\w*)", plan))
    )
    lines.append(
        f"- whole-stage-codegen spans: **{n_codegen}**, "
        f"exchanges (shuffles): **{n_exchange}**, "
        f"joins: {', '.join(joins) if joins else 'none'}"
    )
    for s in scans:
        loc = re.search(r"Location:.*?\[(.*?)\]", s)
        table = Path(loc.group(1)).stem if loc else "?"
        pushed = re.search(r"PushedFilters: \[(.*?)\]", s)
        schema = re.search(r"ReadSchema: (.*)", s)
        lines.append(
            f"- scan `{table}`: PushedFilters=`{pushed.group(1) if pushed else ''}` "
            f"ReadSchema=`{(schema.group(1).strip() if schema else '')[:120]}`"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from wos_crawler_spark.session import get_spark

    # AQE off for the audit only: unexecuted adaptive plans hide
    # codegen ids / final join picks; static plans show the full
    # pipeline (AQE can only improve on these at runtime).
    spark = get_spark(
        "explain-audit", cores=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qmap = entrymod.queries()
    sections = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by tools/explain_audit.py at sf dir `{args.sf}`. "
        "What to look for: filters reaching the scan (PushedFilters), "
        "narrow ReadSchema (column pruning), BroadcastHashJoin on small "
        "dims, few exchanges, wide codegen spans.",
        "",
    ]
    for name in AUDIT:
        df = qmap[name](spark, args.sf)
        sections.append(audit_one(name, formatted_plan(df)))
    Path(args.out).write_text("\n".join(sections), encoding="utf-8")
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
