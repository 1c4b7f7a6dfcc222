"""PromQL instant (scalar math) functions — pure column expressions.

Reference: ``InstantVectorFunctionMapper`` applying ``InstantFunctionId``
(``query/.../RangeVectorTransformer.scala:61-199``; impls
``rangefn/InstantFunction.scala:74-454``). All are 1:1 with built-in
``pyspark.sql.functions`` — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def NAN() -> Column:
    return F.lit(float("nan"))


def _ts_utc(t_ms: Column):
    return F.timestamp_millis(t_ms.cast("long"))


def instant_fn_expr(fn: str, v: Column, params: tuple = (),
                    t_ms: Column | None = None) -> Column:
    """Expression for instant function `fn` over value column `v`.

    Date functions operate on the sample value interpreted as seconds
    since epoch UTC (InstantFunction.scala:300-454).
    """
    if fn == "abs":
        return F.abs(v)
    if fn == "ceil":
        return F.ceil(v).cast("double")
    if fn == "floor":
        return F.floor(v).cast("double")
    if fn == "exp":
        return F.exp(v)
    if fn == "ln":
        return F.log(v)
    if fn == "log2":
        return F.log2(v)
    if fn == "log10":
        return F.log10(v)
    if fn == "sqrt":
        return F.sqrt(v)
    if fn == "sgn":
        return F.signum(v)
    if fn == "round":
        # round(v, to_nearest): nearest multiple, ties toward +Inf
        # (InstantFunction.scala round impl follows Prometheus)
        nearest = float(params[0]) if params else 1.0
        return F.floor(v / F.lit(nearest) + 0.5) * F.lit(nearest)
    if fn == "clamp_max":
        return F.least(v, F.lit(float(params[0])))
    if fn == "clamp_min":
        return F.greatest(v, F.lit(float(params[0])))
    if fn == "clamp":
        lo, hi = float(params[0]), float(params[1])
        if lo > hi:
            return NAN()
        return F.least(F.greatest(v, F.lit(lo)), F.lit(hi))
    if fn == "or_vector":
        # FiloDB extension: NaN -> default (InstantFunction.scala:151-156)
        return F.when(F.isnan(v), F.lit(float(params[0]))).otherwise(v)
    if fn in _TRIG:
        return _TRIG[fn](v)
    if fn in ("day_of_month", "day_of_week", "days_in_month", "hour",
              "minute", "month", "year"):
        ts = F.timestamp_seconds(v)
        if fn == "day_of_month":
            return F.dayofmonth(ts).cast("double")
        if fn == "day_of_week":
            return (F.dayofweek(ts) - 1).cast("double")  # Prom: 0=Sunday
        if fn == "days_in_month":
            return F.dayofmonth(F.last_day(ts)).cast("double")
        if fn == "hour":
            return F.hour(ts).cast("double")
        if fn == "minute":
            return F.minute(ts).cast("double")
        if fn == "month":
            return F.month(ts).cast("double")
        if fn == "year":
            return F.year(ts).cast("double")
    raise ValueError(f"unknown instant function: {fn}")


# Prometheus 2.31+ trigonometric functions (promql/functions.go) — the
# reference predates them; included for dialect completeness. All are
# built-in JVM expressions.
_TRIG = {
    "sin": F.sin, "cos": F.cos, "tan": F.tan,
    "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "deg": F.degrees, "rad": F.radians,
}

INSTANT_FUNCTIONS = (
    "abs ceil floor exp ln log2 log10 sqrt sgn round clamp clamp_max clamp_min "
    "or_vector day_of_month day_of_week days_in_month hour minute month year "
    "sin cos tan asin acos atan sinh cosh tanh deg rad"
).split()


def apply_instant_fn(df: DataFrame, fn: str, params: tuple = (),
                     value_col: str = "value") -> DataFrame:
    return df.withColumn(value_col, instant_fn_expr(fn, F.col(value_col), params))
