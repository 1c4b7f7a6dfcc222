"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (sum(rate(events[24h])) on the 6h step
  grid) at sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  training-data pipeline ops) — see filodb_spark.driver_queries.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted only for
  genuinely approximate ops: MinHash-LSH, SimHash, both IVF-ANN
  variants).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine-required session settings to a driver-provided session."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; tsdf handles timestamp input too
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from filodb_spark.driver_queries.promql_events import q_agg_sum_rate
    return q_agg_sum_rate(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from filodb_spark.driver_queries import all_queries
    qs, _ = all_queries()

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {name: wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    from filodb_spark.driver_queries import all_queries
    _, oracles = all_queries()
    return dict(oracles)
