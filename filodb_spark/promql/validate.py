"""Parse-time PromQL validation, mirroring the reference's AST checks.

Reference sources:
- function-name + range-function param specs:
  prometheus/src/main/scala/filodb/prometheus/ast/Functions.scala:8-86,
  query/src/main/scala/filodb/query/PlanEnums.scala:55-83 (paramSpec)
- binary-expression rules:
  prometheus/src/main/scala/filodb/prometheus/ast/Expressions.scala:36-47
  (scalar set ops, scalar comparisons without bool) and
  prometheus/src/main/scala/filodb/prometheus/ast/Vectors.scala:96-116
  (vector matching with scalars, grouping with set ops, ON/GROUP overlap)

All violations raise SyntaxError so the HTTP layer renders them as
400-class parse errors, like the reference's IllegalArgumentException
out of the Parser.
"""

from __future__ import annotations

import re

from filodb_spark.kernels.instant_fns import INSTANT_FUNCTIONS
from filodb_spark.promql.ast import (Aggregation, BinaryOp, Expr,
                                     FunctionCall, MatrixSelector,
                                     NumberLiteral, Paren, StringLiteral,
                                     Subquery, Unary, VectorSelector)

LABEL_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*$")

COMPARISON_OPS = {"==", "!=", "<", ">", "<=", ">="}
SET_OPS = {"and", "or", "unless"}

# no-arg scalar generators double as 1-arg instant functions
# (ScalarFunctionId + InstantFunctionId, PlanEnums.scala:28-34,201-209)
_TIME_COMPONENT_FNS = {"days_in_month", "day_of_month", "day_of_week",
                       "hour", "minute", "month", "year"}

# --- expression result kinds ------------------------------------------------

SCALAR, STRING, RANGE, INSTANT = "scalar", "string", "range", "instant"


def expr_kind(e: Expr) -> str:
    """Result type of an expression: scalar | string | range | instant.
    Matches the reference's ScalarExpression / Series classification used
    by BinaryExpression.validate and the Function param specs."""
    if isinstance(e, NumberLiteral):
        return SCALAR
    if isinstance(e, StringLiteral):
        return STRING
    if isinstance(e, (MatrixSelector, Subquery)):
        return RANGE
    if isinstance(e, VectorSelector):
        return INSTANT
    if isinstance(e, (Paren, Unary)):
        return expr_kind(e.expr)
    if isinstance(e, BinaryOp):
        if expr_kind(e.lhs) == SCALAR and expr_kind(e.rhs) == SCALAR:
            return SCALAR
        return INSTANT
    if isinstance(e, FunctionCall):
        # functions are Series in the reference AST regardless of their
        # runtime result type — scalar(m)/time() are accepted wherever an
        # instant vector is, and rejected where a LITERAL scalar is
        # required (ScalarExpression covers literals only,
        # Functions.scala:61-64)
        return INSTANT
    return INSTANT      # Aggregation and anything vector-shaped


def is_scalar_literal(e: Expr) -> bool:
    """The reference's ScalarExpression covers NUMBER LITERALS only
    (optionally signed) — compound scalar arithmetic like 1 + 2 is a
    BinaryExpression and passes the binary checks (LogicalPlanParserSpec
    round-trips `1 + 2 < Inf` while ParserSpec rejects `1 == 1`)."""
    if isinstance(e, NumberLiteral):
        return True
    if isinstance(e, Unary):
        return is_scalar_literal(e.expr)
    return False


def is_scalarish(e: Expr) -> bool:
    """Acceptable where the reference's function otherParams accept a
    'string, number or scalar function' (Functions.scala:115-126):
    literal scalar arithmetic, or a scalar-producing function call."""
    if expr_kind(e) == SCALAR:
        return True
    if isinstance(e, (Paren, Unary)):
        return is_scalarish(e.expr)
    if isinstance(e, FunctionCall):
        return e.name in ("scalar", "time", "pi") or \
            (e.name in _TIME_COMPONENT_FNS and not e.args)
    return False


def const_value(e: Expr) -> float | None:
    """Fold a literal scalar expression; None when not a foldable literal."""
    if isinstance(e, NumberLiteral):
        return e.value
    if isinstance(e, Paren):
        return const_value(e.expr)
    if isinstance(e, Unary):
        v = const_value(e.expr)
        return None if v is None else (-v if e.op == "-" else v)
    if isinstance(e, BinaryOp):
        l, r = const_value(e.lhs), const_value(e.rhs)
        if l is None or r is None:
            return None
        try:
            return {"+": l + r, "-": l - r, "*": l * r,
                    "/": l / r if r else float("inf") * (l or float("nan")),
                    "%": l % r if r else float("nan"),
                    "^": l ** r}.get(e.op)
        except (ValueError, OverflowError, ZeroDivisionError):
            return None
    return None


# --- function signatures -----------------------------------------------------
# spec atoms: 'range' | 'instant' | 'scalar' | 'scalar01' (literal in (0,1))
# | 'string' | 'any'

_ONE_RANGE = ("range",)
FUNCTION_SPECS: dict[str, tuple[tuple[str, ...], ...]] = {
    # RangeFunctionId paramSpec (PlanEnums.scala:55-83) — strict
    **{name: (_ONE_RANGE,) for name in (
        "rate increase delta idelta irate resets changes deriv "
        "sum_over_time avg_over_time count_over_time min_over_time "
        "max_over_time stddev_over_time stdvar_over_time last_over_time "
        "last present_over_time absent_over_time mad_over_time z_score"
    ).split()},
    "quantile_over_time": (("scalar", "range"),),
    "predict_linear": (("range", "scalar"),),
    "holt_winters": (("range", "scalar01", "scalar01"),),
    "last_over_time_is_mad_outlier": (("scalar", "scalar", "range"),),
    "timestamp": (("instant",),),
    # misc / presentation — non-range functions take scalar-producing
    # function calls wherever a scalar is wanted (Functions.scala:115-126
    # otherParams), hence "scalarish"
    "absent": (("instant",),),
    "scalar": (("any",),),      # scalar(scalar) is identity; compiler checks
    "vector": (("any",),),                      # ignoreChecks in reference
    "time": ((),),
    "pi": ((),),
    "sort": (("instant",),), "sort_desc": (("instant",),),
    "limit": (("scalarish", "instant"),),
    "label_replace": (("instant", "string", "string", "string", "string"),),
    # label_join(v, dst, sep, src...) — variadic sources
    "label_join": ("label_join",),
    "hist_to_prom_vectors": (("instant",),),
    "histogram_quantile": (("scalarish", "instant"),),
    "histogram_max_quantile": (("scalarish", "instant"),),
    "histogram_max_quantile_even": (("scalarish", "instant"),),
    "histogram_fraction": (("scalarish", "scalarish", "instant"),),
    "histogram_bucket": (("scalarish", "instant"),),
    "optimize_with_agg": (("instant",),), "no_optimize": (("instant",),),
    "_filodb_chunkmeta_all": (("instant",),),
    # instant math functions: 1 vector + trailing scalars.  The reference
    # accepts extra scalar params at parse time (they flow into
    # otherParams, Functions.scala:115-126) and validates the COUNT only
    # at execution (InstantFunction impls) — log2(m, 5) parses, floor(1)
    # and floor(m, m2) do not.  "scalar*" mirrors that split; our
    # compiler raises at eval for a wrong count like the reference's
    # executor does.
    **{name: (("instant", "scalarish*"),) for name in INSTANT_FUNCTIONS},
    # time components double as no-arg scalar generators
    **{name: ((), ("instant",)) for name in _TIME_COMPONENT_FNS},
}

PARAM_AGGS = {"topk", "bottomk", "quantile", "count_values"}


def _arg_matches(atom: str, arg: Expr) -> bool:
    kind = expr_kind(arg)
    if atom == "any":
        return True
    if atom == "scalar":
        return kind == SCALAR
    if atom == "scalarish":
        return is_scalarish(arg)
    if atom == "scalar01":
        v = const_value(arg)
        return kind == SCALAR and v is not None and 0 < v < 1
    if atom == "string":
        return kind == STRING
    if atom == "range":
        return kind == RANGE
    if atom == "instant":
        return kind == INSTANT
    raise AssertionError(atom)


def validate_function(name: str, args: tuple[Expr, ...]) -> None:
    specs = FUNCTION_SPECS.get(name)
    if specs is None:
        raise SyntaxError(f"Invalid function name [{name}]")
    if specs == ("label_join",):
        if len(args) < 3 or expr_kind(args[0]) != INSTANT or \
                any(expr_kind(a) != STRING for a in args[1:]):
            raise SyntaxError(
                "label_join expects (vector, dst, separator, src...) with "
                f"string arguments, got {len(args)} argument(s)")
        return
    for spec in specs:
        if spec and spec[-1].endswith("*"):
            fixed, star = spec[:-1], spec[-1][:-1]
            if len(args) >= len(fixed) and \
                    all(_arg_matches(a, arg)
                        for a, arg in zip(fixed, args)) and \
                    all(_arg_matches(star, arg)
                        for arg in args[len(fixed):]):
                return
        elif len(spec) == len(args) and \
                all(_arg_matches(a, arg) for a, arg in zip(spec, args)):
            return
    expected = " or ".join(str(len(s)) for s in specs)
    raise SyntaxError(
        f"Expected {expected} argument(s) in call to function {name}, "
        f"got {len(args)} with types ({', '.join(expr_kind(a) for a in args)})")


def validate_aggregation(op: str, expr: Expr, param: Expr | None,
                         extra_args: int = 0) -> None:
    if extra_args:
        raise SyntaxError(f"wrong number of arguments in call to {op}")
    if op in PARAM_AGGS:
        if param is None:
            raise SyntaxError(f"aggregation {op} requires a parameter")
        want = STRING if op == "count_values" else SCALAR
        if expr_kind(param) != want:
            raise SyntaxError(
                f"aggregation {op} parameter must be a {want}, "
                f"got {expr_kind(param)}")
    elif param is not None:
        raise SyntaxError(f"aggregation {op} takes no parameter")


def validate_binary(op: str, lhs: Expr, rhs: Expr, bool_modifier: bool,
                    on, ignoring, group_left: bool, group_right: bool,
                    include) -> None:
    lk, rk = expr_kind(lhs), expr_kind(rhs)
    lhs_lit, rhs_lit = is_scalar_literal(lhs), is_scalar_literal(rhs)
    if STRING in (lk, rk):
        raise SyntaxError("string literals are not allowed in binary "
                          "expressions")
    if RANGE in (lk, rk):
        raise SyntaxError("range vectors are not allowed in binary "
                          "expressions")
    if bool_modifier and op not in COMPARISON_OPS:
        raise SyntaxError(
            "bool modifier can only be used on comparison operators")
    if op in SET_OPS:
        # Expressions.scala:39-41 — literal operands only, like the
        # reference's isInstanceOf[ScalarExpression]
        if lhs_lit or rhs_lit:
            raise SyntaxError(
                "set operators not allowed in binary scalar expression")
        # Vectors.scala:100-102
        if group_left or group_right:
            raise SyntaxError(
                "no grouping allowed for and, or, unless operations")
    if op in COMPARISON_OPS and not bool_modifier and lhs_lit and rhs_lit:
        # Expressions.scala:43-44
        raise SyntaxError("comparisons between scalars must use BOOL modifier")
    if (on is not None or ignoring) and (lhs_lit or rhs_lit):
        # Vectors.scala:97-99
        raise SyntaxError("vector matching only allowed between instant "
                          "vectors")
    if (group_left or group_right) and on is None and not ignoring:
        # grammar: grouping = (on|ignoring) (group_left|group_right)?
        raise SyntaxError("grouping modifier requires on or ignoring")
    if include and on is not None:
        # Vectors.scala:106-115
        overlap = set(include) & set(on)
        if overlap:
            raise SyntaxError(
                "Labels must not occur in ON and GROUP clause at once: "
                + ", ".join(sorted(overlap)))


def validate_label_name(name: str, context: str) -> None:
    if not LABEL_RE.match(name):
        raise SyntaxError(f"invalid label name {name!r} in {context}")
