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
    # covers the first 50 registered queries per round. Round 9's window
    # (r8 verdict item 2; rotation rule: head = once-gated + new
    # queries, then the canary backlog strictly OLDEST-LAST-GATED first
    # — scripts/gate_hygiene.py + the CORRECTNESS_r* history compute
    # the groups):
    #   1-2   once-gated at r7: ts_rate_fine (post de-flake: round_to
    #         9 -> 6 on both sides) and ts_export_remote_write,
    #   3-4   NEW r9: ts_hist_metadata_pk (hist-scoped metadata on the
    #         part-key index) and ts_rate_reset_marker (NaN
    #         end-of-series reset-marker semantics in counter windows)
    #         — both pre-verified exact at sf0.001/0.01/0.1,
    #   5-8   the four r8 additions (once-gated; ts_raw_ds_split and
    #         the _pk pair re-gated after the r9 partkey/select changes),
    #   9-21  last gated in r4: the [r3,r4] pair, the [r1,r3,r4] trio
    #         (ts_rate re-gated after the rate-kernel NaN change) and
    #         the [r2,r3,r4] eight,
    #   22-47 last gated in r5: the [r2,r5] sixteen + [r3,r5] ten
    #         (pq_preagg_route re-gates the count_over_time
    #         level-move fix),
    #   48-50 fills from the [r1,r6] group, alphabetical.
    window = [
        # once-gated head
        "ts_rate_fine", "ts_export_remote_write",
        # new in round 9
        "ts_hist_metadata_pk", "ts_rate_reset_marker",
        # r8 additions, once-gated
        "ts_label_values_pk", "ts_series_cardinality_pk",
        "ts_cardbuster", "ts_raw_ds_split",
        # canaries last gated r4
        "ev_sessions", "tpch_q12",
        "ts_agg_sum_rate", "ts_hist_quantile", "ts_rate",
        "ann_bruteforce", "doc_dedup_clusters", "doc_tfidf_topk",
        "ds_rollup", "ev_asof_join", "mm_image_features",
        "tpch_q1", "tpch_q5",
        # canaries last gated r5: [r2,r5]
        "doc_fingerprint", "doc_langid", "doc_ngram_jaccard",
        "doc_simhash_portable", "doc_token_count", "ds_avg_rewrite",
        "emb_norm_stats", "mm_frame_sample", "tpch_q13", "tpch_q17",
        "tpch_q18", "tpch_q2", "tpch_q21", "tpch_q3", "tpch_q6",
        "tpch_q9",
        # canaries last gated r5: [r3,r5]
        "doc_segment_dedup", "emb_semantic_dedup", "pl_contamination",
        "pl_pack_sequences", "pl_pii_scrub", "pl_quality_filter",
        "pq_hist_fraction", "pq_preagg_route", "pq_subquery",
        "pq_sum_rate",
        # fills: [r1,r6], alphabetical
        "pq_bool_compare", "pq_raw_matrix", "ts_agg_avg_by",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
