"""Hand-written PromQL lexer + recursive-descent parser.

Grammar follows the reference ANTLR grammar
(prometheus/src/main/java/filodb/prometheus/antlr/PromQL.g4) and the
upstream PromQL spec. Precedence (low to high):
  or | and,unless | comparisons | +,- | *,/,% | ^ (right-assoc) | unary.
"""

from __future__ import annotations

import re

from filodb_spark.promql.ast import (Aggregation, BinaryOp, Expr, FunctionCall,
                                     LabelMatcher, MatrixSelector,
                                     NumberLiteral, Paren, StringLiteral,
                                     Subquery, Unary, VectorSelector)
from filodb_spark.promql import validate as V

AGG_OPS = {"sum", "avg", "min", "max", "count", "stddev", "stdvar", "group",
           "topk", "bottomk", "quantile", "count_values"}
SET_OPS = {"and", "or", "unless"}

_TOKEN_RE = re.compile(r"""
    (?P<WS>\s+)
  | (?P<DURATION>[0-9]+(?:\.[0-9]+)?(?:ms|s|m|h|d|w|y)(?:[0-9]+(?:\.[0-9]+)?(?:ms|s|m|h|d|w|y))*)
  | (?P<NUMBER>
        0x[0-9a-fA-F]+
      | (?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?
      | (?:[iI][nN][fF]|[nN][aA][nN])(?![a-zA-Z0-9_:]))
  | (?P<STRING>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<IDENT_EXT>[_:]*[a-zA-Z][a-zA-Z0-9_:.\-]*|[a-zA-Z_][a-zA-Z0-9_:]*)
  | (?P<OP>=~|!~|==|!=|<=|>=|<|>|=|\+|-|\*|/|%|\^|\(|\)|\{|\}|\[|\]|,|@|:)
""", re.VERBOSE)

_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
            "d": 86_400_000, "w": 604_800_000, "y": 31_536_000_000}

_DUR_PART = re.compile(r"([0-9]+(?:\.[0-9]+)?)(ms|s|m|h|d|w|y)")


def duration_ms(text: str) -> int:
    total = 0.0
    for num, unit in _DUR_PART.findall(text):
        total += float(num) * _UNIT_MS[unit]
    return int(total)


class Token:
    __slots__ = ("kind", "text", "kw")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text
        # keyword view: the grammar's keyword tokens are case-insensitive
        # (PromQL.g4:166-196 fragment-letter "magic"), while identifiers
        # used as metric/label NAMES keep their case — so keyword
        # comparisons go through .kw and name extraction through .text
        self.kw = text.lower() if kind == "IDENT" else text

    def __repr__(self):
        return f"{self.kind}:{self.text}"


def tokenize(query: str) -> list[Token]:
    out = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if not m:
            raise SyntaxError(f"PromQL lex error at {pos}: {query[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        text = m.group()
        if kind == "IDENT_EXT" and "-" not in text and "." not in text:
            # plain identifier — extended form is reserved for
            # graphite-style metric names (PromQL.g4 IDENTIFIER_EXTENDED)
            kind = "IDENT"
        out.append(Token(kind, text))
    out.append(Token("EOF", ""))
    return out


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        if self.i >= len(self.toks):
            # a production consumed the EOF sentinel and asked for more
            # — truncated input (found by the grammar fuzz battery)
            raise SyntaxError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"expected {text!r}, got {t.text!r}")
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.i += 1
            return True
        return False

    # --- precedence climbing --------------------------------------------

    def parse_expr(self) -> Expr:
        return self.parse_or()

    def _binary_tail(self, sub, ops) -> Expr:
        lhs = sub()
        while self.peek().kw in ops:
            op = self.next().kw
            bool_mod = False
            if self.peek().kw == "bool":
                self.next()
                bool_mod = True
            on = ignoring = None
            include: tuple[str, ...] = ()
            gl = gr = False
            if self.peek().kw in ("on", "ignoring"):
                kw = self.next().kw
                labels = self._label_list()
                if kw == "on":
                    on = labels
                else:
                    ignoring = labels
            if self.peek().kw in ("group_left", "group_right"):
                kw = self.next().kw
                gl, gr = kw == "group_left", kw == "group_right"
                if self.peek().text == "(":
                    include = self._label_list()
            rhs = sub()
            V.validate_binary(op, lhs, rhs, bool_mod, on, ignoring or (),
                              gl, gr, include)
            lhs = BinaryOp(op, lhs, rhs, bool_modifier=bool_mod, on=on,
                           ignoring=ignoring or (), group_left=gl,
                           group_right=gr, include=include)
        return lhs

    def parse_or(self) -> Expr:
        return self._binary_tail(self.parse_and, {"or"})

    def parse_and(self) -> Expr:
        return self._binary_tail(self.parse_cmp, {"and", "unless"})

    def parse_cmp(self) -> Expr:
        return self._binary_tail(self.parse_add,
                                 {"==", "!=", "<", ">", "<=", ">="})

    def parse_add(self) -> Expr:
        return self._binary_tail(self.parse_mul, {"+", "-"})

    def parse_mul(self) -> Expr:
        return self._binary_tail(self.parse_pow, {"*", "/", "%", "atan2"})

    def parse_pow(self) -> Expr:
        lhs = self.parse_unary()
        if self.peek().text == "^":
            self.next()
            rhs = self.parse_pow()   # right associative
            return BinaryOp("^", lhs, rhs)
        return lhs

    def parse_unary(self) -> Expr:
        if self.peek().text in ("+", "-"):
            op = self.next().text
            operand = self.parse_unary()
            # unary +/- applies to scalars and instant vectors only
            # (ParserSpec: -"string", -test[5m] are errors)
            if isinstance(operand, (StringLiteral, MatrixSelector, Subquery)):
                raise SyntaxError(f"unary {op!r} not allowed here")
            return Unary(op, operand)
        return self.parse_postfix()

    # --- postfix: [range], [range:step], offset, @ ----------------------

    def parse_postfix(self) -> Expr:
        e = self.parse_atom()
        modified = False     # offset/@ seen — a later [range] is an error
        while True:
            t = self.peek()
            if t.text == "[":
                if modified:
                    # grammar: offset/@ come AFTER the range selector
                    # (PromQL.g4 instantOrRangeSelector; ParserSpec
                    # rejects `m OFFSET 1m[5m]`)
                    raise SyntaxError(
                        "range selector must precede offset/@ modifiers")
                self.next()
                rng = self.next()
                # step-multiple notation [3i]
                if rng.kind == "NUMBER" and self.peek().text == "i":
                    self.next()
                    self.expect("]")
                    if not isinstance(e, VectorSelector):
                        raise SyntaxError("range selector on non-selector")
                    e = MatrixSelector(e, int(float(rng.text)),
                                       step_multiple=True)
                    continue
                if rng.kind != "DURATION":
                    raise SyntaxError(f"expected duration, got {rng.text!r}")
                if duration_ms(rng.text) <= 0:
                    raise SyntaxError("duration must be greater than 0")
                if self.accept(":"):
                    step = None
                    if self.peek().kind == "DURATION":
                        step = duration_ms(self.next().text)
                        if step <= 0:
                            raise SyntaxError(
                                "subquery step must be greater than 0")
                    self.expect("]")
                    e = Subquery(e, duration_ms(rng.text), step)
                else:
                    self.expect("]")
                    if not isinstance(e, VectorSelector):
                        raise SyntaxError("range selector on non-selector")
                    e = MatrixSelector(e, duration_ms(rng.text))
            elif t.kw == "limit" and self.peek(1).kind == "NUMBER":
                # FiloDB extension: `expr limit N` (PromQL.g4 limitOperation).
                # Selectors push the limit into the scan; any other vector
                # expression desugars to limit(N, expr) like the reference
                # (AntlrParser.visitLimitOperation:244-249)
                import dataclasses
                self.next()
                k = int(float(self.next().text))
                if isinstance(e, VectorSelector):
                    e = dataclasses.replace(e, limit=k)
                else:
                    e = FunctionCall("limit",
                                     (NumberLiteral(float(k)), e))
            elif t.kw == "offset":
                self.next()
                neg = self.accept("-")
                d = self.next()
                if d.kind != "DURATION":
                    raise SyntaxError(f"expected duration after offset, "
                                      f"got {d.text!r}")
                off = duration_ms(d.text) * (-1 if neg else 1)
                e = self._with_offset(e, off)
                modified = True
            elif t.text == "@":
                self.next()
                at = self.next()
                if at.kw in ("start", "end"):
                    # @ start() / @ end() (PromQL.g4:60,178-179): resolved
                    # against the query range at evaluation time
                    self.expect("(")
                    self.expect(")")
                    e = self._with_at(e, at.kw)
                else:
                    at_ms = int(float(at.text) * 1000)
                    e = self._with_at(e, at_ms)
                modified = True
            else:
                return e

    @staticmethod
    def _with_offset(e: Expr, off: int) -> Expr:
        import dataclasses
        if isinstance(e, VectorSelector):
            return dataclasses.replace(e, offset_ms=off)
        if isinstance(e, MatrixSelector):
            return dataclasses.replace(e, base=dataclasses.replace(e.base, offset_ms=off))
        if isinstance(e, Subquery):
            return dataclasses.replace(e, offset_ms=off)
        raise SyntaxError("offset modifier on non-selector")

    @staticmethod
    def _with_at(e: Expr, at_ms: int) -> Expr:
        import dataclasses
        if isinstance(e, VectorSelector):
            return dataclasses.replace(e, at_ms=at_ms)
        if isinstance(e, MatrixSelector):
            return dataclasses.replace(e, base=dataclasses.replace(e.base, at_ms=at_ms))
        if isinstance(e, Subquery):
            return dataclasses.replace(e, at_ms=at_ms)
        raise SyntaxError("@ modifier on non-selector")

    # --- atoms ----------------------------------------------------------

    def parse_atom(self) -> Expr:
        t = self.peek()
        if t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return Paren(e)
        if t.kind == "NUMBER":
            self.next()
            return NumberLiteral(_parse_number(t.text))
        if t.kind == "STRING":
            self.next()
            return StringLiteral(_unquote(t.text))
        if t.kind == "DURATION":
            # bare durations are numbers of seconds in some contexts; reject
            raise SyntaxError(f"unexpected duration {t.text!r}")
        if t.kind == "IDENT":
            name = t.kw
            if name in AGG_OPS:
                # aggregation only when called; otherwise the keyword is
                # a metric name (PromQL.g4 metricKeyword: AGGREGATION_OP)
                if self.peek(1).text == "(" or \
                        self.peek(1).kw in ("by", "without"):
                    return self.parse_aggregation()
                return self.parse_selector()
            if self.peek(1).text == "(" and name not in SET_OPS:
                return self.parse_function()
            return self.parse_selector()
        if t.kind == "IDENT_EXT":
            # graphite-style metric name (foo:ba-r:a.b) — selector only
            return self.parse_selector()
        if t.text == "{":
            return self.parse_selector()
        raise SyntaxError(f"unexpected token {t.text!r}")

    def parse_function(self) -> Expr:
        name = self.next().text
        self.expect("(")
        args: list[Expr] = []
        if self.peek().text != ")":
            args.append(self.parse_expr())
            while self.accept(","):
                args.append(self.parse_expr())
        self.expect(")")
        V.validate_function(name, tuple(args))
        return FunctionCall(name, tuple(args))

    def parse_aggregation(self) -> Expr:
        op = self.next().kw
        by = without = None
        if self.peek().kw in ("by", "without"):
            kw = self.next().kw
            labels = self._label_list()
            if kw == "by":
                by = labels
            else:
                without = labels
        self.expect("(")
        first = self.parse_expr()
        param = None
        expr = first
        extra = 0
        if self.accept(","):
            param = first
            expr = self.parse_expr()
            while self.accept(","):   # 2 args max; extras are an error
                extra += 1
                expr = self.parse_expr()
        self.expect(")")
        if by is None and without is None and \
                self.peek().kw in ("by", "without"):
            kw = self.next().kw
            labels = self._label_list()
            if kw == "by":
                by = labels
            else:
                without = labels
        V.validate_aggregation(op, expr, param, extra_args=extra)
        return Aggregation(op, expr, param=param, by=by, without=without)

    def parse_selector(self) -> Expr:
        metric = None
        if self.peek().kind in ("IDENT", "IDENT_EXT"):
            metric = self.next().text
        matchers: list[LabelMatcher] = []
        if self.peek().text == "{":
            self.next()
            while self.peek().text != "}":
                lname = self.next().text
                V.validate_label_name(lname, "label matcher")
                opt = self.next().text
                if opt not in ("=", "!=", "=~", "!~"):
                    raise SyntaxError(f"bad matcher op {opt!r}")
                val = self.next()
                if val.kind != "STRING":
                    raise SyntaxError("matcher value must be a string")
                matchers.append(LabelMatcher(lname, opt, _unquote(val.text)))
                if not self.accept(","):
                    break
            self.expect("}")
        if metric is None and not matchers:
            raise SyntaxError("empty selector")
        if metric is not None and any(m.name == "__name__" for m in matchers):
            # ParserSpec:59 — metric name and __name__ matcher conflict
            raise SyntaxError("metric name must not be set twice")
        name_eq = [m for m in matchers if m.name == "__name__"]
        if metric is None and len(name_eq) == 1 and name_eq[0].op == "=":
            # {__name__="m", ...} IS a metric selector: the reference
            # turns the _metric_ Equals filter into the metric, which
            # drives schema resolution (MultiSchemaPartitionsExec) —
            # also the only way to select metric names that are not
            # PromQL identifiers (e.g. "request-latency")
            metric = name_eq[0].value
            matchers = [m for m in matchers if m.name != "__name__"]
        return VectorSelector(metric, tuple(matchers))

    def _label_list(self) -> tuple[str, ...]:
        self.expect("(")
        labels: list[str] = []
        while self.peek().text != ")":
            name = self.next().text
            V.validate_label_name(name, "label list")
            labels.append(name)
            if not self.accept(","):
                break
        self.expect(")")
        return tuple(labels)


def _parse_number(text: str) -> float:
    tl = text.lower()
    if tl.startswith("0x"):
        return float(int(text, 16))
    if tl == "inf":
        return float("inf")
    if tl == "nan":
        return float("nan")
    return float(text)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return (body.replace("\\\\", "\x00").replace("\\\"", "\"")
                .replace("\\'", "'").replace("\\n", "\n").replace("\\t", "\t")
                .replace("\x00", "\\"))


def parse(query: str) -> Expr:
    p = Parser(tokenize(query))
    e = p.parse_expr()
    if p.peek().kind != "EOF":
        raise SyntaxError(f"trailing input: {p.peek().text!r}")
    return e
