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
    # covers the first 50 registered queries per round. Round 11's
    # window (rotation rule: head = new queries + forced re-gates +
    # once-gated, then the canary backlog strictly OLDEST-LAST-GATED
    # first — scripts/gate_hygiene.py + the CORRECTNESS_r* history
    # compute the groups):
    #   1-3   NEW r11: ts_ds_schema_route (per-metric-schema DS routing
    #         with BOTH ds-gauge and ds-counter tables mounted,
    #         TsStore.ds_schema_of + metric-less schema fan-out),
    #         ts_ds_presence (present/absent_over_time + timestamp()
    #         across the split), and ts_ds_window_aggs (gauge window
    #         aggregates over retained counter marker rows) — the r11
    #         fn-matrix audit closures, all pre-verified exact at
    #         sf0.001/0.01/0.1,
    #   4-11  once-gated at r10: ts_ds_counter, ts_ds_hist,
    #         ts_ds_delta_counter, ts_raw_ds_split_rate,
    #         ts_gateway_hist_assembly, ts_ds_metadata, ts_repair_copy,
    #         ts_ds_eligibility,
    #   12-20 the nine last-gated-r6 leftovers, alphabetical,
    #   21-50 the last-gated-r7 backlog (48 queries), alphabetical —
    #         30 fit; the remaining 18 (pl_mix_sources ...
    #         ts_hist_mixed_sum) lead the r12 backlog.
    window = [
        # new in round 11
        "ts_ds_schema_route", "ts_ds_presence", "ts_ds_window_aggs",
        # once-gated head (new in r10)
        "ts_ds_counter", "ts_ds_hist", "ts_ds_delta_counter",
        "ts_raw_ds_split_rate", "ts_gateway_hist_assembly",
        "ts_ds_metadata", "ts_repair_copy", "ts_ds_eligibility",
        # canaries last gated r6 (the 9 leftovers), alphabetical
        "ts_max_over_time", "ts_min_over_time", "ts_present_over_time",
        "ts_set_or", "ts_set_unless", "ts_stddev_over_time",
        "ts_stdvar_over_time", "ts_sum_over_time", "ts_timestamp",
        # canaries last gated r7, alphabetical (32 of 48)
        "ann_filtered", "ann_ivf", "ann_ivf_kmeans", "ann_pq_recall",
        "ann_pq_topk", "ann_recall", "ann_recall_curve",
        "doc_bigram_lp", "doc_chunks", "doc_dedup_keep",
        "doc_lsh_verify", "doc_minhash_lsh", "doc_simhash",
        "doc_split_leakage", "doc_tokenizer_fertility",
        "doc_unigram_lp", "emb_kmeans", "emb_kmeans_summary",
        "emb_outliers", "emb_pq", "ev_anomalies",
        "ev_cohort_retention", "ev_funnel", "ev_funnel_summary",
        "ev_rfm", "ev_rolling", "ev_transitions", "pl_dataset_card",
        "pl_dataset_diff", "pl_manifest",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
