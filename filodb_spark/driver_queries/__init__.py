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
    # covers the first 50 registered queries per round. Round 10's
    # window (rotation rule: head = new queries + forced re-gates +
    # once-gated, then the canary backlog strictly OLDEST-LAST-GATED
    # first — scripts/gate_hygiene.py + the CORRECTNESS_r* history
    # compute the groups):
    #   1-8   NEW r10: ts_ds_counter / ts_ds_hist / ts_ds_delta_counter
    #         (counter/histogram downsamplers, dip-preserving marker),
    #         ts_raw_ds_split_rate (boundary-crossing rate on the DS
    #         counter table), ts_gateway_hist_assembly (remote-write
    #         bucket-series -> histogram records), ts_ds_metadata
    #         (pre-retention /series spans served from the DS tables),
    #         ts_repair_copy (ChunkCopier band restore + validator),
    #         and ts_ds_eligibility (downsampler allow/block gate)
    #         — all pre-verified exact at sf0.001/0.01/0.1,
    #   9-12  re-gates forced by the end-inclusive downsample-period
    #         flip (outputs changed on both engine and oracle sides):
    #         ds_rollup, ds_avg_rewrite, ds_cascade, ts_raw_ds_split,
    #   13-14 once-gated at r9: ts_hist_metadata_pk,
    #         ts_rate_reset_marker,
    #   15-50 the last-gated-r6 backlog (45 queries), alphabetical —
    #         36 fit; the final nine (ts_max_over_time,
    #         ts_min_over_time, ts_present_over_time, ts_set_or,
    #         ts_set_unless, ts_stddev_over_time, ts_stdvar_over_time,
    #         ts_sum_over_time, ts_timestamp) lead the r11 backlog.
    window = [
        # new in round 10
        "ts_ds_counter", "ts_ds_hist", "ts_ds_delta_counter",
        "ts_raw_ds_split_rate", "ts_gateway_hist_assembly",
        "ts_ds_metadata", "ts_repair_copy", "ts_ds_eligibility",
        # re-gates: end-inclusive downsample periods
        "ds_rollup", "ds_avg_rewrite", "ds_cascade", "ts_raw_ds_split",
        # once-gated head
        "ts_hist_metadata_pk", "ts_rate_reset_marker",
        # canaries last gated r6, alphabetical (41 of 45)
        "doc_dedup_summary", "doc_rolling_fp", "doc_split",
        "doc_stats", "doc_subword_count", "pq_at_modifier",
        "pq_hist_bucket_quantile", "pq_scalar_vector", "tpch_q10",
        "tpch_q11", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q19",
        "tpch_q20", "tpch_q22", "tpch_q4", "tpch_q7", "tpch_q8",
        "ts_agg_bottomk", "ts_agg_count_values", "ts_agg_quantile",
        "ts_avg_over_time", "ts_count_over_time", "ts_csv_roundtrip",
        "ts_day_of_week", "ts_delta", "ts_hist_bucket",
        "ts_hist_fraction", "ts_hist_sum_quantile", "ts_idelta",
        "ts_influx_roundtrip", "ts_instant_last", "ts_instant_math",
        "ts_join_group_right", "ts_mad_outlier",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
