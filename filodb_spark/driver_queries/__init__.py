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
                                             text_ops, tpch, vector_ops)
    q: dict = {}
    o: dict = {}
    for mod in (promql_events, histogram_queries, promql_path, tpch, text_ops,
                vector_ops, mm_ops, downsample_queries):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
