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
    # covers the first 50 registered queries per round. Round 12's
    # window (rotation rule: head = new queries + forced re-gates +
    # once-gated, then the canary backlog strictly OLDEST-LAST-GATED
    # first — scripts/gate_hygiene.py + the CORRECTNESS_r* history
    # compute the groups):
    #   1-2   NEW r12: doc_bpe_pairs (BPE tokenizer-training pair
    #         statistics) and doc_winnow_pairs (winnowing/MOSS
    #         near-dup candidate pairs) — both pre-verified exact at
    #         sf0.001/0.01/0.1,
    #   3-5   once-gated at r11: ts_ds_schema_route (now exercising
    #         the STAMPED dual mount), ts_ds_presence,
    #         ts_ds_window_aggs (the r11 fn-matrix closures get their
    #         second gate),
    #   6-23  the 18 last-gated-r7 leftovers, alphabetical
    #         (pl_mix_sources ... ts_hist_mixed_sum),
    #   24-50 the last-gated-r8 backlog (45 queries), alphabetical —
    #         27 fit; the remaining 18 (ts_deriv, ts_export_columns,
    #         ts_export_rules ...) lead the r13 backlog.
    window = [
        # new in round 12
        "doc_bpe_pairs", "doc_winnow_pairs",
        # once-gated head (new in r11)
        "ts_ds_schema_route", "ts_ds_presence", "ts_ds_window_aggs",
        # canaries last gated r7 (the 18 leftovers), alphabetical
        "pl_mix_sources", "pl_repetition", "pl_strat_sample",
        "pl_strat_topk", "pq_absent", "pq_binary_user_ratio",
        "pq_count_by_metric", "pq_hist_struct_quantile",
        "pq_hist_to_prom", "pq_instant_chain", "pq_label_join",
        "pq_label_replace", "pq_offset", "pq_quantile_last",
        "pq_set_unless", "pq_topk", "ts_exp_hist_quantile",
        "ts_hist_mixed_sum",
        # canaries last gated r8, alphabetical (29 of 45)
        "ann_ivf_portable", "ann_ivfpq_kmeans", "ann_ivfpq_kmeans_recall",
        "ann_ivfpq_recall", "ann_ivfpq_stored", "ann_ivfpq_topk",
        "doc_dedup_exact", "doc_minhash_portable", "emb_near_dup",
        "emb_quantize", "ev_gap_fill", "ev_label_churn",
        "mm_y4m_frames", "pl_dedup_incremental", "pl_length_quantiles",
        "pl_source_divergence", "pl_token_budget", "pl_url_filter",
        "pq_hist_scale_quantile", "pq_label_replace_groups",
        "pq_prefix_compare", "pq_set_and", "pq_set_or", "pq_trig",
        "ts_absent", "ts_agg_topk", "ts_changes",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
