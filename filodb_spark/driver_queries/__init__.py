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
    # covers the first 50 registered queries per round. Round 8's window
    # (scripts/gate_hygiene.py computes the never-gated list; the r7
    # verdict fixed the head order):
    #   1-6   the six never-driver-gated queries (late-r7 additions +
    #         pq_set_and/pq_set_or) — all pre-verified exact at
    #         sf0.001/0.01/0.1 via scripts/check_oracle.py,
    #   next  any round-8 additions (inserted here as they land,
    #         displacing tail fills),
    #   then  the 15 once-gated canary backlog (r4 -> r5 -> r6),
    #   then  ts_label_values + ts_series_cardinality — re-gated
    #         explicitly because round 8 reroutes them through the
    #         materialized part-key table (r7 verdict item 1),
    #   tail  oldest twice-gated canaries: the rest of the [r1,r5]
    #         group, the [r2,r4] group, emb_quantize [r3,r4], then the
    #         alphabetically-first [r2,r5] queries to fill 50.
    window = [
        # never driver-gated (r7 verdict item 2 — window head)
        "pq_set_and", "pq_set_or", "ev_label_churn",
        "pq_prefix_compare", "pq_label_replace_groups",
        "pq_hist_scale_quantile",
        # round-8 additions (r7 verdict items 1, 4 + the raw/DS split
        # fix found by porting LongTimeRangePlannerSpec)
        "ts_label_values_pk", "ts_series_cardinality_pk",
        "ts_cardbuster", "ts_raw_ds_split",
        # canary backlog: once-gated, oldest gate round first
        "pl_dedup_incremental", "pl_length_quantiles",
        "pl_source_divergence", "pl_token_budget", "pl_url_filter",
        "pq_trig", "ts_remote_write_roundtrip",
        "ann_ivfpq_kmeans", "ann_ivfpq_kmeans_recall",
        "ann_ivfpq_recall", "ann_ivfpq_stored", "ann_ivfpq_topk",
        "mm_y4m_frames", "ts_export_columns", "ts_export_rules",
        # re-gated on the new part-key-table metadata path
        "ts_label_values", "ts_series_cardinality",
        # canaries: twice-gated [r1, r5]
        "ts_absent", "ts_agg_topk", "ts_changes", "ts_deriv",
        "ts_holt_winters", "ts_increase", "ts_irate",
        "ts_join_group_left", "ts_join_ratio", "ts_mad_over_time",
        "ts_predict_linear", "ts_quantile_over_time", "ts_resets",
        "ts_salted_sum", "ts_set_and", "ts_zscore",
        # canaries: twice-gated [r2, r4]
        "ann_ivf_portable", "doc_dedup_exact", "doc_minhash_portable",
        "ds_cascade", "emb_near_dup", "ev_gap_fill",
        # canaries: [r3, r4]
        "emb_quantize",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
