"""Driver-contract query registry.

Each module exposes ``QUERIES: dict[name, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB SQL over the pre-registered fixture
views). Names absent from ORACLES get the driver's weaker rows-only check.
"""

from __future__ import annotations


def all_queries():
    from filodb_spark.driver_queries import (downsample_queries,
                                             export_queries,
                                             histogram_queries, mm_ops,
                                             pipeline_ops, promql_events,
                                             promql_path, text_ops,
                                             timeseries_ops, tpch,
                                             vector_ops)
    q: dict = {}
    o: dict = {}
    for mod in (tpch, text_ops, vector_ops, mm_ops, downsample_queries,
                timeseries_ops, promql_path, histogram_queries,
                promql_events, pipeline_ops, export_queries):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    # Registration order is the driver's gating order: its CORRECTNESS gate
    # covers the first 50 registered queries per round. Round 7's window
    # (scripts/gate_hygiene.py computes the never-gated list):
    #   1-2   the two round-7 additions — ts_rate_fine (r6 verdict item 3:
    #         the query that FORCES the tiled two-level window kernel,
    #         exact oracle) and ts_export_remote_write (item 6: exporter
    #         cascade -> remote-write wire round trip); both pre-verified
    #         exact at sf0.001/0.01/0.1 via scripts/check_oracle.py,
    #   3-50  regression canaries per r6 verdict item 2, oldest gate
    #         round first: ALL 25 r3-once-gated (incl. the 4 rows-only
    #         approximate ops) + the 23 alphabetically-first of the 30
    #         r4-once-gated. The remaining 7 r4 + 6 r5 + 2 r6 once-gated
    #         queries are the r8 canary backlog.
    window = [
        # round-7 additions (r6 verdict items 3, 6)
        "ts_rate_fine", "ts_export_remote_write",
        # canaries: r3-gated (gated exactly once, in round 3)
        "ann_ivf", "ann_ivf_kmeans", "ann_recall", "doc_minhash_lsh",
        "doc_simhash", "pl_dataset_card", "pl_manifest",
        "pl_mix_sources", "pl_repetition", "pl_strat_sample",
        "pl_strat_topk", "pq_absent", "pq_binary_user_ratio",
        "pq_count_by_metric", "pq_hist_struct_quantile",
        "pq_hist_to_prom", "pq_instant_chain", "pq_label_join",
        "pq_label_replace", "pq_offset", "pq_quantile_last",
        "pq_set_unless", "pq_topk", "ts_exp_hist_quantile",
        "ts_hist_mixed_sum",
        # canaries: r4-gated (gated exactly once, in round 4)
        "ann_filtered", "ann_pq_recall", "ann_pq_topk",
        "ann_recall_curve", "doc_bigram_lp", "doc_chunks",
        "doc_dedup_keep", "doc_lsh_verify", "doc_split_leakage",
        "doc_tokenizer_fertility", "doc_unigram_lp", "emb_kmeans",
        "emb_kmeans_summary", "emb_outliers", "emb_pq", "ev_anomalies",
        "ev_cohort_retention", "ev_funnel", "ev_funnel_summary",
        "ev_rfm", "ev_rolling", "ev_transitions", "pl_dataset_diff",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
