"""Driver-contract query registry.

Each module exposes ``QUERIES: dict[name, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB SQL over the pre-registered fixture
views). Names absent from ORACLES get the driver's weaker rows-only check.
"""

from __future__ import annotations


def all_queries():
    from filodb_spark.driver_queries import (downsample_queries,
                                             histogram_queries, mm_ops,
                                             promql_events, promql_path,
                                             text_ops, timeseries_ops, tpch,
                                             vector_ops)
    q: dict = {}
    o: dict = {}
    # Registration order is the driver's gating order: its CORRECTNESS gate
    # covers the first 50 registered queries per round. Round 1 gated the 44
    # promql_events + 4 histogram + 2 promql_path entries, so round 2 rotates
    # the never-gated families (tpch 22, text 10, vector 5, mm 2, downsample 3
    # = 42, plus the first 8 ungated promql_path entries) into the window.
    # Rotate again next round until every family has a green driver row.
    for mod in (tpch, text_ops, vector_ops, mm_ops, downsample_queries,
                timeseries_ops, promql_path, histogram_queries,
                promql_events):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    # rows-only entries (no oracle -> weaker driver check) register last
    # so the gate window spends every slot on exact-verifiable queries;
    # their exact portable twins stay in the window
    ordered = {k: v for k, v in q.items() if k in o}
    ordered.update({k: v for k, v in q.items() if k not in o})
    return ordered, o
