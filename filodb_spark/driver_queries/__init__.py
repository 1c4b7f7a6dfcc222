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
    # covers the first 50 registered queries per round. Round 6's window
    # (scripts/gate_hygiene.py computes the never-gated list):
    #   1-2   the two round-6 additions — the r5-staged BatchExporter
    #         cascade query (r5 verdict item 1) + the labelColumnMapping
    #         sibling (r5 verdict item 8); both pre-verified exact at
    #         sf0.001/0.01/0.1 via scripts/check_oracle.py,
    #   3-50  regression canaries rotated per r5 verdict item 3: every
    #         query driver-gated exactly once whose gate round is 1 or 2
    #         (oldest first — all 29 r1-once-gated + all 18
    #         r2-once-gated), plus one r3-once-gated to fill the window.
    window = [
        # round-6 additions (r5 verdict items 1, 2, 8)
        "ts_export_rules", "ts_export_columns",
        # canaries: r1-gated (gated exactly once, in round 1)
        "pq_bool_compare", "pq_raw_matrix", "ts_agg_avg_by",
        "ts_agg_bottomk", "ts_agg_count_values", "ts_agg_quantile",
        "ts_avg_over_time", "ts_count_over_time", "ts_csv_roundtrip",
        "ts_day_of_week", "ts_delta", "ts_hist_bucket",
        "ts_hist_fraction", "ts_hist_sum_quantile", "ts_idelta",
        "ts_influx_roundtrip", "ts_instant_last", "ts_instant_math",
        "ts_join_group_right", "ts_mad_outlier", "ts_max_over_time",
        "ts_min_over_time", "ts_present_over_time", "ts_set_or",
        "ts_set_unless", "ts_stddev_over_time", "ts_stdvar_over_time",
        "ts_sum_over_time", "ts_timestamp",
        # canaries: r2-gated (gated exactly once, in round 2)
        "doc_dedup_summary", "doc_rolling_fp", "doc_split", "doc_stats",
        "doc_subword_count", "pq_hist_bucket_quantile",
        "pq_scalar_vector", "tpch_q4", "tpch_q7", "tpch_q8",
        "tpch_q10", "tpch_q11", "tpch_q14", "tpch_q15", "tpch_q16",
        "tpch_q19", "tpch_q20", "tpch_q22",
        # canary: r3-gated filler to round the window to 50
        "pq_at_modifier",
    ]
    missing = [k for k in window if k not in q]
    assert not missing, f"gate window names drifted: {missing}"
    ordered = {k: q[k] for k in window}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered, o
