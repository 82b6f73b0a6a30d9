"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The KG end-to-end job (the BASELINE.json metric: triples/sec) runs on
deterministically generated transcripts sized by SPARK_GRAFT_BENCH_TURNS
(default ~160k turns) — same generator, any parallelism, same rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))

    from batch_import_spark.session import build_session

    spark = build_session(
        app_name="batch-import-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- KG end-to-end throughput (the headline metric) ---
    from batch_import_spark.pipeline.kg import run_kg_pipeline
    from batch_import_spark.sources.transcripts import alias_dict_df, generate_transcripts

    t = generate_transcripts(spark, n_convs=n_convs, median_turns=16, hot_factor=100)
    t = t.localCheckpoint(eager=True)  # materialize input; time the pipeline only
    n_turns = t.count()

    n_triples = None
    for kernel in ("pandas", "expr"):
        best, n_edges = None, 0
        # best-of-3 (run 1 warms codegen/python workers): this sandbox's
        # ambient steal swings single runs 2-5x (BENCH/BASELINE.md)
        for _ in range(3):
            t0 = time.time()
            res = run_kg_pipeline(t, alias_dict_df(spark), extraction=kernel)
            n_edges = res.edges.count()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        timings[f"kg_pipeline_{kernel}"] = round(best, 3)
        if n_triples is None:
            n_triples = int(res.edges.agg(F.sum("n_occurrences")).collect()[0][0])
        extras[f"turns_per_sec_{kernel}"] = round(n_turns / best, 1)
        # triples/sec = resolved mention occurrences per second (the
        # unit the reference's rels/sec maps to: one emitted edge)
        extras[f"triples_per_sec_{kernel}"] = round(n_triples / best, 1)
    extras["kg_turns"] = n_turns
    extras["kg_edges"] = n_edges
    extras["kg_triple_occurrences"] = n_triples

    # --- representative operator queries at sf ---
    qs = entry_mod.queries()
    # NOTE: the set grew in round 2 (simhash, spatial) — compare
    # per-query timings across rounds, not the total
    bench_queries = [
        "q1_pricing_summary",
        "q3_revenue_topk",
        "j1_index_lookup",
        "w1_window_running",
        "cc_components",
        "dedup_exact",
        "minhash_near_dups",
        "simhash_near_dups",
        "ann_cosine_topk",
        "ivf_ann_topk",
        "corpus_curation",
        "asof_last_click",
        "range_window_join",
        "kmv_distinct_users",
        "time_rollup",
        "spatial_bbox_lookup",
        "text_fingerprint",
        "kg_extract_canonicalize",
        # round 3
        "triangle_counts",
        "tfidf_terms",
        "near_dup_resolution",
        "corpus_sample",
        "a4_rel_index",
        "pagerank",
        "contamination",
        "seq_packing",
        "conv_stats",
        "hll_distinct_users",
        "communities",
        "kcore",
        "doc_chunks",
        "fuzzy_name_match",
        "cooccurrence_lift",
        "quote_containment",
        "weighted_pagerank",
        # round 4
        "kg_pagerank",
        "kg_bfs_hops",
        "quantile_sketch",
        "seq_packing_global",
        "modularity",
        "bpe_tokenize",
        "media_decode_jpeg",
        "lm_bigram_score",
        "cms_heavy_hitters",
        "bloom_membership",
        "kg_incremental",
        "split_leakage_audit",
        "kg_link_prediction",
        "winnowing_sketch",
        "context_token_budget",
        "cdc_chunks",
        "rolling_fingerprint",
        "mad_outliers",
        # round 5
        "repetition_screen",
        "pii_redact",
        "crossdoc_substring_removal",
        "kg_communities_louvain",
        "ivf_pq_topk",
        "theta_set_ops",
        "sft_pairs",
        "semantic_dedup",
        "temperature_mixture",
        "quality_gate",
        "wordpiece_tokenize",
        "vocab_growth",
        # round 6
        "repetition_screen_para",
        "domain_filter",
        "unigram_tokenize",
        "ivf_pq_incremental",
        "dsir_select",
        "kmeans_clusters",
        "cluster_balanced_sample",
        "tokenizer_fertility",
        "unimax_budget",
        "kg_temporal_activity",
        "pq_code_dedup",
        "hard_negatives",
        "curriculum_order",
        "zorder_layout",
    ]
    for name in bench_queries:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg_construct_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **extras,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
