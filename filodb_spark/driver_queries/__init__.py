"""Driver-contract query registry.

Each module exposes ``QUERIES: dict[name, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB SQL over the pre-registered fixture
views). Names absent from ORACLES get the driver's weaker rows-only check.
"""

from __future__ import annotations


def all_queries():
    from filodb_spark.driver_queries import (downsample_queries,
                                             histogram_queries, mm_ops,
                                             pipeline_ops, promql_events,
                                             promql_path, text_ops,
                                             timeseries_ops, tpch,
                                             vector_ops)
    q: dict = {}
    o: dict = {}
    for mod in (tpch, text_ops, vector_ops, mm_ops, downsample_queries,
                timeseries_ops, promql_path, histogram_queries,
                promql_events, pipeline_ops):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    # Registration order is the driver's gating order: its CORRECTNESS gate
    # covers the first 50 registered queries per round. Round 4's window
    # (scripts/gate_hygiene.py computes the never-gated list):
    #   1-30  every query with no driver CORRECTNESS row in any round
    #         (the round-3 late additions; all exact oracles, all passing
    #         scripts/check_oracle.py at sf0.001 and sf0.01),
    #   31    emb_quantize re-gated after the r3 array-output contract fix
    #         (codes array<int> -> codes_csv; same fix applied to emb_pq
    #         and pl_url_filter above before their first gating),
    #   32-50 regression canaries: the six displaced in r3 plus
    #         one-per-family picks (each already driver-green in r1-r3).
    window = [
        # never-gated (round-3 late additions)
        "doc_split_leakage", "doc_chunks", "doc_unigram_lp",
        "doc_bigram_lp", "doc_lsh_verify", "doc_dedup_keep",
        "doc_tokenizer_fertility",
        "emb_pq", "ann_pq_topk", "ann_pq_recall",
        "emb_kmeans", "emb_kmeans_summary", "ann_filtered",
        "ann_recall_curve", "emb_outliers",
        "ev_anomalies", "ev_rolling", "ev_rfm", "ev_funnel",
        "ev_funnel_summary", "ev_cohort_retention", "ev_transitions",
        "pq_trig", "ts_remote_write_roundtrip",
        "pl_token_budget", "pl_dedup_incremental", "pl_dataset_diff",
        "pl_url_filter", "pl_source_divergence", "pl_length_quantiles",
        # re-gate after the array-output contract fix (r3 verdict item 1)
        "emb_quantize",
        # canaries displaced by the r3 six-swap
        "ev_gap_fill", "doc_dedup_exact", "doc_minhash_portable",
        "ann_ivf_portable", "emb_near_dup", "ds_cascade",
        # one-per-family canaries
        "ts_rate", "ts_agg_sum_rate", "ts_hist_quantile",
        "tpch_q1", "tpch_q5", "tpch_q12",
        "ev_sessions", "ev_asof_join",
        "doc_dedup_clusters", "doc_tfidf_topk",
        "ann_bruteforce", "mm_image_features", "ds_rollup",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
