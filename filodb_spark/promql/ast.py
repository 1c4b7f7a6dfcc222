"""PromQL AST node types.

Thin dataclasses mirroring the reference's LogicalPlan node set
(query/src/main/scala/filodb/query/LogicalPlan.scala:12-163) and AST
(prometheus/src/main/scala/filodb/prometheus/ast/). Time units: ms.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LabelMatcher:
    name: str
    op: str          # = != =~ !~
    value: str


@dataclass(frozen=True)
class VectorSelector:
    metric: str | None
    matchers: tuple[LabelMatcher, ...] = ()
    offset_ms: int = 0
    # @ modifier: epoch ms, or the sentinels "start"/"end" (resolved
    # against the query range by the compiler)
    at_ms: int | str | None = None
    limit: int | None = None     # FiloDB ext: `selector limit N`


@dataclass(frozen=True)
class MatrixSelector:
    base: VectorSelector
    range_ms: int
    # step-multiple notation m[3i]: window = range_ms * eval step
    # (PeriodicSeriesWithWindowing.stepMultipleNotationUsed,
    #  LogicalPlan.scala:554-563)
    step_multiple: bool = False


@dataclass(frozen=True)
class Subquery:
    expr: "Expr"
    range_ms: int
    step_ms: int | None          # None -> default eval interval
    offset_ms: int = 0
    at_ms: int | str | None = None


@dataclass(frozen=True)
class NumberLiteral:
    value: float


@dataclass(frozen=True)
class StringLiteral:
    value: str


@dataclass(frozen=True)
class FunctionCall:
    name: str
    args: tuple["Expr", ...]


@dataclass(frozen=True)
class Aggregation:
    op: str                       # sum avg min max count stddev stdvar
    expr: "Expr"                  # topk bottomk quantile count_values group
    param: "Expr | None" = None
    by: tuple[str, ...] | None = None        # by (...)
    without: tuple[str, ...] | None = None   # without (...)


@dataclass(frozen=True)
class BinaryOp:
    op: str
    lhs: "Expr"
    rhs: "Expr"
    bool_modifier: bool = False
    on: tuple[str, ...] | None = None
    ignoring: tuple[str, ...] = ()
    group_left: bool = False
    group_right: bool = False
    include: tuple[str, ...] = ()


@dataclass(frozen=True)
class Paren:
    expr: "Expr"


@dataclass(frozen=True)
class Unary:
    op: str   # + -
    expr: "Expr"


Expr = (VectorSelector | MatrixSelector | Subquery | NumberLiteral
        | StringLiteral | FunctionCall | Aggregation | BinaryOp | Paren | Unary)
