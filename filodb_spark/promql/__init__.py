"""PromQL query surface: parser -> AST -> DataFrame compiler.

Mirrors the reference pipeline (prometheus/src/main/scala/filodb/prometheus:
Parser.queryRangeToLogicalPlan -> filodb.query.LogicalPlan ->
SingleClusterPlanner.materialize), except the "planner" emits Spark
DataFrame expressions and Catalyst does the physical planning.
"""

from filodb_spark.promql.parser import parse  # noqa: F401
from filodb_spark.promql.compiler import PromQLEngine  # noqa: F401
