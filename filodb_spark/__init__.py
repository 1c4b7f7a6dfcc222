"""filodb_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
filodb/FiloDB (reference: /root/reference) on top of Apache Spark:

- PromQL query surface (parser -> logical plan -> DataFrame compiler)
- Range functions (rate/increase/*_over_time) with Prometheus-compatible
  extrapolation semantics (reference: query/.../rangefn/RateFunctions.scala)
- Cross-series aggregations with by/without grouping
- Binary operators and set operators with PromQL label-matching rules
- Histogram type + histogram_quantile
- Structured Streaming ingestion + downsampling
- Training-data pipeline operators (dedup, similarity search, text analysis)

Everything is expressed Spark-first: declarative DataFrame plans that
Catalyst/Tungsten optimize (predicate pushdown, partial aggregation,
whole-stage codegen); Python UDFs only where a sequential recurrence
genuinely forces it.
"""

__version__ = "0.1.0"

from filodb_spark.session import get_spark  # noqa: F401
