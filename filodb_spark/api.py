"""Prometheus HTTP API result shapes.

The reference renders QueryResult to Prometheus JSON
(prometheus/.../query/PrometheusModel.scala:1-256; routes
http/src/main/scala/filodb/http/PrometheusApiRoute.scala:49,68). These
helpers produce the same response dicts from engine result DataFrames —
the serving layer a REST front-end would return verbatim.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame


def _fmt(v: float) -> str:
    # Prometheus sample values are strings; integral floats render bare,
    # infinities as +Inf/-Inf (PrometheusModel value rendering)
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def to_matrix_response(df: DataFrame) -> dict:
    """Range-query response: resultType=matrix. NaN points are dropped
    (stale/absent), empty series omitted."""
    series: dict = defaultdict(list)
    keys: dict = {}
    for row in df.collect():
        labels = dict(row["labels"] or {})
        v = row["value"]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        k = tuple(sorted(labels.items()))
        keys[k] = labels
        series[k].append((row["t"] / 1000.0, _fmt(v)))
    result = [{"metric": keys[k], "values": sorted(vs)}
              for k, vs in series.items()]
    result.sort(key=lambda r: sorted(r["metric"].items()))
    return {"status": "success",
            "data": {"resultType": "matrix", "result": result}}


def to_vector_response(df: DataFrame) -> dict:
    """Instant-query response: resultType=vector (single timestep)."""
    out = []
    for row in df.collect():
        v = row["value"]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        out.append({"metric": dict(row["labels"] or {}),
                    "value": (row["t"] / 1000.0, _fmt(v))})
    out.sort(key=lambda r: sorted(r["metric"].items()))
    return {"status": "success",
            "data": {"resultType": "vector", "result": out}}


def query_range_api(engine, query: str, start_s: float, end_s: float,
                    step_s: float) -> dict:
    """GET /api/v1/query_range equivalent."""
    df = engine.query_range(query, int(start_s * 1000), int(end_s * 1000),
                            int(step_s * 1000))
    return to_matrix_response(df)


def query_api(engine, query: str, time_s: float) -> dict:
    """GET /api/v1/query equivalent."""
    df = engine.query_instant(query, int(time_s * 1000))
    return to_vector_response(df)
