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
    # covers the first 50 registered queries per round. Round 13's
    # window (rotation rule: head = new queries + forced re-gates +
    # once-gated, then the canary backlog strictly OLDEST-LAST-GATED
    # first — scripts/gate_hygiene.py + the CORRECTNESS_r* history
    # compute the groups):
    #   1-7   NEW r13: pl_c4_clean (C4 line-level cleaning) and
    #         pl_c4_span_dedup (C4 repeated-span global dedup), both
    #         Raffel et al. 2020; pl_ccnet_buckets (CCNet per-language
    #         perplexity thirds, Wenzek et al. 2020); pl_gopher_rules
    #         + pl_gopher_repetition (the Gopher quality and
    #         repetition rule panels, Rae et al. 2021);
    #         pl_temperature_mix (T5 temperature mixing, Raffel et
    #         al. 2020 §3.4.2); pl_web_pipeline (the flagship
    #         composition: C4 clean -> span dedup -> both Gopher
    #         panels -> temperature mix) — all pre-verified exact at
    #         sf0.001/0.01/0.1,
    #   8-25  the 18 last-gated-r8 leftovers, alphabetical
    #         (ts_deriv ... ts_zscore),
    #   26-50 the last-gated-r9 backlog (45 queries), alphabetical —
    #         25 fit (ann_bruteforce ... pq_sum_rate); the remaining
    #         20 (tpch_q1 ... ts_series_cardinality_pk) lead the r14
    #         backlog.
    window = [
        # new in round 13
        "pl_c4_clean", "pl_c4_span_dedup", "pl_ccnet_buckets",
        "pl_gopher_repetition", "pl_gopher_rules",
        "pl_temperature_mix", "pl_web_pipeline",
        # canaries last gated r8 (the 18 leftovers), alphabetical
        "ts_deriv", "ts_export_columns", "ts_export_rules",
        "ts_holt_winters", "ts_increase", "ts_irate",
        "ts_join_group_left", "ts_join_ratio", "ts_label_values",
        "ts_mad_over_time", "ts_predict_linear", "ts_quantile_over_time",
        "ts_remote_write_roundtrip", "ts_resets", "ts_salted_sum",
        "ts_series_cardinality", "ts_set_and", "ts_zscore",
        # canaries last gated r9, alphabetical (25 of 45)
        "ann_bruteforce", "doc_dedup_clusters", "doc_fingerprint",
        "doc_langid", "doc_ngram_jaccard", "doc_segment_dedup",
        "doc_simhash_portable", "doc_tfidf_topk", "doc_token_count",
        "emb_norm_stats", "emb_semantic_dedup", "ev_asof_join",
        "ev_sessions", "mm_frame_sample", "mm_image_features",
        "pl_contamination", "pl_pack_sequences", "pl_pii_scrub",
        "pl_quality_filter", "pq_bool_compare", "pq_hist_fraction",
        "pq_preagg_route", "pq_raw_matrix", "pq_subquery",
        "pq_sum_rate",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
