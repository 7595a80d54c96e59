"""RaQL front-end: parse RaQL expressions/operations → Spark plans.

Hand-rolled tokenizer + Pratt parser (no parser libs in the
container) for the RaQL surface documented in the reference
(site/language_reference.php; expression grammar src/RamenExpr.ml,
operation grammar src/RamenOperation.ml — grammar studied, code not
ported; this is a fresh implementation against the documented
language).

Round-1 subset (widened per round):
- expressions: literals (ints w/ scale suffixes k/M/G/Ki/Mi/Gi, floats,
  strings, booleans, NULL), field refs (bare, ``in.x``/``out.x``),
  arithmetic ``+ - * / // % ^``, comparisons ``= <> != < <= > >=``,
  ``AND OR NOT``, ``||`` concat, ``LIKE``, ``x IN (…)``, ``IS [NOT]
  NULL``, ``IF c THEN a [ELSE b]``, ``CASE WHEN … END``, function
  calls (stateless library + aggregates), ``p PERCENTILE x``,
  unary aggregate keywords (``SUM x``, ``MIN x`` …).
- operations: ``SELECT e [AS n] | * [- f]…, … [FROM f1, f2…]
  [WHERE c] [GROUP BY k,…] [COMMIT AFTER c]``. Star expands to all
  input fields not already named; later select fields may reference
  earlier out-fields (``out.x`` or bare alias). Batch compilation:
  full-window semantics — the COMMIT condition selects the windowing
  shape; the canonical ``in.t > out.t + d`` tumbling pattern is a
  no-op in batch (groups run to completion) and becomes
  watermark+window in streaming.
- programs: ``PARAMETERS p DEFAULTS TO v, …; DEFINE [LAZY] f
  [PERSIST FOR d] AS SELECT …;`` → plans.program.Program DAG
  (compile_program); multi-parent FROM = unionByName.

Null-semantics, / vs //, etc. delegate to functions.scalar so parser
output and hand-built plans share one implementation.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ramen_spark.functions import scalar as S

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_SCALES = {
    "k": 1e3, "M": 1e6, "G": 1e9, "T": 1e12, "P": 1e15,
    "Ki": 2**10, "Mi": 2**20, "Gi": 2**30, "Ti": 2**40, "Pi": 2**50,
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*)
  | (?P<float>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>0x[0-9a-fA-F]+|\d+)(?P<intsuf>(?:[ui](?:8|16|24|32|40|48|56|64|128))|Ki|Mi|Gi|Ti|Pi|[kMGTP])?
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<op><=|>=|<>|!=|\|\||//|[-+*/%^=<>(),;\[\]])
  | (?P<name>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "from", "where", "when", "group", "by", "commit", "after",
    "before", "flush", "keep", "and", "or", "not", "in", "like", "is",
    "null", "true", "false", "if", "then", "else", "end", "case", "as",
    "percentile", "starts", "ends", "with", "distinct", "globally",
    "define", "parameters", "defaults", "to", "persist", "for", "lazy",
}


@dataclass
class Tok:
    kind: str  # 'num' 'str' 'name' 'kw' 'op' 'eof'
    value: Any
    pos: int


def tokenize(text: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SyntaxError(f"RaQL: cannot tokenize at {text[i:i+20]!r}")
        i = m.end()
        if m.lastgroup in ("ws", "comment") or (m.lastgroup == "intsuf"):
            if m.group("int"):
                pass  # handled below
            else:
                continue
        if m.group("float"):
            out.append(Tok("num", float(m.group("float")), m.start()))
        elif m.group("int"):
            raw = m.group("int")
            val: float | int = int(raw, 16) if raw.startswith("0x") else int(raw)
            suf = m.group("intsuf")
            if suf in _SCALES:
                scaled = val * _SCALES[suf]
                val = int(scaled) if float(scaled).is_integer() else scaled
            out.append(Tok("num", val, m.start()))
        elif m.group("string"):
            body = m.group("string")[1:-1]
            body = body.encode().decode("unicode_escape")
            out.append(Tok("str", body, m.start()))
        elif m.group("op"):
            out.append(Tok("op", m.group("op"), m.start()))
        elif m.group("name"):
            name = m.group("name")
            low = name.lower()
            if low in _KEYWORDS and "." not in name:
                out.append(Tok("kw", low, m.start()))
            else:
                out.append(Tok("name", name, m.start()))
    out.append(Tok("eof", None, len(text)))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: Any


@dataclass
class Field:
    path: str  # 'x' or 'in.x' / 'out.x' / 'param.x'


@dataclass
class Unop:
    op: str
    e: Any


@dataclass
class Binop:
    op: str
    a: Any
    b: Any


@dataclass
class Call:
    fn: str
    args: list


@dataclass
class CaseWhen:
    branches: list[tuple[Any, Any]]
    otherwise: Any | None


# aggregate function names (unary keyword style: `SUM x`) — stateful
AGGS = {
    "sum", "avg", "min", "max", "count", "first", "last", "group",
    "and_all", "or_all", "count_distinct",
}

# stateless functions by name → Column builder
def _fn_registry() -> dict[str, Any]:
    return {
        "abs": lambda a: F.abs(a),
        "age": lambda a: S.age(a),
        "exp": lambda a: F.exp(a),
        "log": lambda a: S.log(a),
        "log10": lambda a: S.log10(a),
        "sqrt": lambda a: S.sqrt(a),
        "sq": lambda a: S.sq(a),
        "ceil": lambda a: F.ceil(a),
        "floor": lambda a: F.floor(a),
        "round": lambda *a: F.round(*a),
        "cos": F.cos, "sin": F.sin, "tan": F.tan,
        "acos": F.acos, "asin": F.asin, "atan": F.atan,
        "cosh": F.cosh, "sinh": F.sinh, "tanh": F.tanh,
        "lower": F.lower, "upper": F.upper,
        "length": lambda a: S.length(a),
        "basename": lambda a: S.basename(a),
        "hash": lambda a: S.hash64(a),
        "coalesce": lambda *a: F.coalesce(*a),
        "truncate": lambda a, m=None: S.truncate(a, m if m is not None else 1.0),
        "reldiff": lambda a, b: S.reldiff(a, b),
        "substring": lambda s, a, b: S.substring(s, a, b),
        "now": S.now,
        "random": S.random,
        "pi": S.pi,
        "format_time": None,  # handled specially (const fmt)
        "min": lambda *a: S.min_of(*a),  # variadic stateless form
        "max": lambda *a: S.max_of(*a),
    }


# ---------------------------------------------------------------------------
# Pratt parser
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers
    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, value: Any = None) -> Tok | None:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            return self.next()
        return None

    def expect(self, kind: str, value: Any = None) -> Tok:
        t = self.accept(kind, value)
        if t is None:
            got = self.peek()
            raise SyntaxError(f"RaQL: expected {value or kind}, got {got.value!r} at {got.pos}")
        return t

    # -- expression grammar (precedence climbing)
    def parse_expr(self) -> Any:
        return self.parse_or()

    def parse_or(self) -> Any:
        e = self.parse_and()
        while self.accept("kw", "or"):
            e = Binop("or", e, self.parse_and())
        return e

    def parse_and(self) -> Any:
        e = self.parse_not()
        while self.accept("kw", "and"):
            e = Binop("and", e, self.parse_not())
        return e

    def parse_not(self) -> Any:
        if self.accept("kw", "not"):
            return Unop("not", self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self) -> Any:
        e = self.parse_concat()
        t = self.peek()
        if t.kind == "op" and t.value in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.next()
            return Binop(t.value, e, self.parse_concat())
        if t.kind == "kw" and t.value == "like":
            self.next()
            pat = self.expect("str")
            return Binop("like", e, Lit(pat.value))
        if t.kind == "kw" and t.value == "not":
            # NOT LIKE / NOT IN
            save = self.i
            self.next()
            if self.accept("kw", "like"):
                pat = self.expect("str")
                return Unop("not", Binop("like", e, Lit(pat.value)))
            if self.accept("kw", "in"):
                return Unop("not", Binop("in", e, self.parse_in_list()))
            self.i = save
        if t.kind == "kw" and t.value == "in":
            self.next()
            return Binop("in", e, self.parse_in_list())
        if t.kind == "kw" and t.value == "is":
            self.next()
            neg = bool(self.accept("kw", "not"))
            self.expect("kw", "null")
            node = Unop("is_null", e)
            return Unop("not", node) if neg else node
        if t.kind == "kw" and t.value == "starts":
            self.next()
            self.expect("kw", "with")
            return Binop("starts_with", e, self.parse_concat())
        if t.kind == "kw" and t.value == "ends":
            self.next()
            self.expect("kw", "with")
            return Binop("ends_with", e, self.parse_concat())
        if t.kind == "kw" and t.value == "percentile":
            # `p PERCENTILE v` — e is the percentile value
            self.next()
            return Call("percentile_of", [e, self.parse_concat()])
        return e

    def parse_in_list(self) -> Any:
        self.expect("op", "(")
        items = [self.parse_expr()]
        while self.accept("op", ","):
            items.append(self.parse_expr())
        self.expect("op", ")")
        return Call("_list", items)

    def parse_concat(self) -> Any:
        e = self.parse_add()
        while True:
            t = self.peek()
            if t.kind == "op" and t.value == "||":
                self.next()
                e = Binop("||", e, self.parse_add())
            else:
                return e

    def parse_add(self) -> Any:
        e = self.parse_mul()
        while True:
            t = self.peek()
            if t.kind == "op" and t.value in ("+", "-"):
                self.next()
                e = Binop(t.value, e, self.parse_mul())
            else:
                return e

    def parse_mul(self) -> Any:
        e = self.parse_pow()
        while True:
            t = self.peek()
            if t.kind == "op" and t.value in ("*", "/", "//", "%"):
                self.next()
                e = Binop(t.value, e, self.parse_pow())
            else:
                return e

    def parse_pow(self) -> Any:
        e = self.parse_unary()
        t = self.peek()
        if t.kind == "op" and t.value == "^":
            self.next()
            return Binop("^", e, self.parse_pow())  # right assoc
        return e

    def parse_unary(self) -> Any:
        t = self.peek()
        if t.kind == "op" and t.value == "-":
            self.next()
            return Unop("neg", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self) -> Any:
        e = self.parse_atom()
        while True:
            if self.accept("op", "["):
                idx = self.parse_expr()
                self.expect("op", "]")
                e = Binop("index", e, idx)
            else:
                return e

    def parse_atom(self) -> Any:
        t = self.next()
        if t.kind == "num":
            return Lit(t.value)
        if t.kind == "str":
            return Lit(t.value)
        if t.kind == "kw":
            if t.value == "true":
                return Lit(True)
            if t.value == "false":
                return Lit(False)
            if t.value == "null":
                return Lit(None)
            if t.value == "if":
                cond = self.parse_expr()
                self.expect("kw", "then")
                then = self.parse_expr()
                els = self.parse_expr() if self.accept("kw", "else") else None
                return CaseWhen([(cond, then)], els)
            if t.value == "case":
                branches = []
                while self.accept("kw", "when"):
                    c = self.parse_expr()
                    self.expect("kw", "then")
                    v = self.parse_expr()
                    branches.append((c, v))
                els = self.parse_expr() if self.accept("kw", "else") else None
                self.expect("kw", "end")
                return CaseWhen(branches, els)
            if t.value == "distinct":
                # COUNT-DISTINCT-ish: `DISTINCT x` as aggregate
                return Call("count_distinct", [self.parse_unary()])
            raise SyntaxError(f"RaQL: unexpected keyword {t.value!r} at {t.pos}")
        if t.kind == "op" and t.value == "(":
            e = self.parse_expr()
            # tuple literal (a; b; …) → struct
            if self.accept("op", ";"):
                items = [e, self.parse_expr()]
                while self.accept("op", ";"):
                    items.append(self.parse_expr())
                self.expect("op", ")")
                return Call("_tuple", items)
            self.expect("op", ")")
            return e
        if t.kind == "op" and t.value == "[":
            items = []
            if not self.accept("op", "]"):
                items.append(self.parse_expr())
                while self.accept("op", ";"):
                    items.append(self.parse_expr())
                self.expect("op", "]")
            return Call("_array", items)
        if t.kind == "name":
            name = t.value
            low = name.lower()
            # function call with parens
            if self.peek().kind == "op" and self.peek().value == "(":
                self.next()
                args = []
                if not (self.peek().kind == "op" and self.peek().value == ")"):
                    args.append(self.parse_expr())
                    while self.accept("op", ","):
                        args.append(self.parse_expr())
                self.expect("op", ")")
                return Call(low, args)
            # unary keyword aggregates / functions: `SUM x`, `ABS y`
            if low in AGGS or low in _fn_registry():
                nxt = self.peek()
                if nxt.kind in ("name", "num", "str") or (
                    nxt.kind == "op" and nxt.value in ("(", "[", "-")
                ):
                    # greedy unary application at tightest precedence
                    return Call(low, [self.parse_unary()])
            return Field(name)
        raise SyntaxError(f"RaQL: unexpected token {t.value!r} at {t.pos}")


def parse_expr(text: str):
    p = Parser(tokenize(text))
    e = p.parse_expr()
    p.expect("eof")
    return e


# ---------------------------------------------------------------------------
# AST → Column
# ---------------------------------------------------------------------------


def _strip_ns(path: str) -> str:
    # in./out. namespaces resolve to plain columns in batch compilation
    for ns in ("in.", "out.", "param."):
        if path.startswith(ns):
            return path[len(ns):]
    return path


class Compiler:
    def __init__(self, params: dict[str, Any] | None = None):
        self.params = params or {}
        self.fns = _fn_registry()
        self.has_aggregate = False

    def col(self, node) -> Column:
        if isinstance(node, Lit):
            return F.lit(node.value)
        if isinstance(node, Field):
            if node.path.startswith("param."):
                key = node.path[len("param."):]
                return F.lit(self.params[key])
            return F.col(_strip_ns(node.path))
        if isinstance(node, Unop):
            c = self.col(node.e)
            if node.op == "not":
                return ~c
            if node.op == "neg":
                return -c
            if node.op == "is_null":
                return c.isNull()
            raise ValueError(f"unknown unop {node.op}")
        if isinstance(node, Binop):
            if node.op == "like":
                return self.col(node.a).like(node.b.value)
            if node.op == "in":
                items = [self.col(x) for x in node.b.args]
                return self.col(node.a).isin(*items)
            if node.op == "index":
                return F.element_at(self.col(node.a), self.col(node.b) + 1)
            a, b = self.col(node.a), self.col(node.b)
            return {
                "+": lambda: a + b,
                "-": lambda: a - b,
                "*": lambda: a * b,
                "/": lambda: S.div(a, b),
                "//": lambda: S.idiv(a, b),
                "%": lambda: S.mod(a, b),
                "^": lambda: F.pow(a, b),
                "=": lambda: a == b,
                "<>": lambda: a != b,
                "!=": lambda: a != b,
                "<": lambda: a < b,
                "<=": lambda: a <= b,
                ">": lambda: a > b,
                ">=": lambda: a >= b,
                "and": lambda: a & b,
                "or": lambda: a | b,
                "||": lambda: F.concat(a, b),
                "starts_with": lambda: a.startswith(b),
                "ends_with": lambda: a.endswith(b),
            }[node.op]()
        if isinstance(node, CaseWhen):
            c = None
            for cond, val in node.branches:
                w = F.when(self.col(cond), self.col(val))
                c = w if c is None else c.when(self.col(cond), self.col(val))
            return c.otherwise(self.col(node.otherwise)) if node.otherwise is not None else c
        if isinstance(node, Call):
            return self.call(node)
        raise ValueError(f"unknown node {node!r}")

    def call(self, node: Call) -> Column:
        fn = node.fn
        if fn == "_array":
            return F.array(*[self.col(a) for a in node.args])
        if fn == "_tuple":
            return F.struct(*[self.col(a) for a in node.args])
        if fn == "percentile_of":
            p_node, arr = node.args
            if not isinstance(p_node, Lit):
                raise ValueError("PERCENTILE requires a constant percentile")
            return S.percentile_of_array(self.col(arr), float(p_node.value))
        # MIN/MAX: ≥2 args = stateless least/greatest (doc:404-423);
        # 1 arg = the aggregate — resolve before the generic AGGS path
        if fn in ("min", "max") and len(node.args) >= 2:
            args = [self.col(a) for a in node.args]
            return S.min_of(*args) if fn == "min" else S.max_of(*args)
        if fn in AGGS:
            self.has_aggregate = True
            arg = self.col(node.args[0]) if node.args else None
            return {
                "sum": lambda: F.sum(arg),
                "avg": lambda: F.avg(arg),
                "min": lambda: F.min(arg),
                "max": lambda: F.max(arg),
                "count": lambda: F.count(arg if arg is not None else F.lit(1)),
                "first": lambda: F.first(arg),
                "last": lambda: F.last(arg),
                "group": lambda: F.collect_list(arg),
                "count_distinct": lambda: F.countDistinct(arg),
            }[fn]()
        if fn == "format_time":
            fmt = node.args[0]
            if not isinstance(fmt, Lit):
                raise ValueError("FORMAT_TIME requires a constant format")
            return S.format_time(fmt.value, self.col(node.args[1]))
        builder = self.fns.get(fn)
        if builder is None:
            raise ValueError(f"unknown RaQL function {fn!r}")
        args = [self.col(a) for a in node.args]
        # MIN/MAX: 1 arg = aggregate, ≥2 args = stateless least/greatest
        if fn in ("min", "max") and len(args) == 1:
            self.has_aggregate = True
            return F.min(args[0]) if fn == "min" else F.max(args[0])
        return builder(*args)


def compile_expr(text: str, params: dict[str, Any] | None = None) -> Column:
    return Compiler(params).col(parse_expr(text))


# ---------------------------------------------------------------------------
# operation: SELECT … FROM … WHERE … GROUP BY … COMMIT …
# ---------------------------------------------------------------------------


@dataclass
class Star:
    """``*`` in a select list — all input fields not already named —
    optionally minus explicit exclusions: ``* - f1 - f2``
    (src/raql_operation.type:9-10, parser RamenOperation.ml:1254-1271)."""

    exclude: list[str]


@dataclass
class SelectField:
    expr: Any
    alias: str | None


@dataclass
class Operation:
    fields: list[SelectField]
    sources: list[str]
    where: Any | None
    group_by: list
    commit_after: Any | None
    commit_before: bool = False
    flush: bool = True


def _parse_operation_body(p: Parser) -> Operation:
    p.expect("kw", "select")
    fields = []
    while True:
        if p.accept("op", "*"):
            exclude: list[str] = []
            while p.accept("op", "-"):
                exclude.append(p.expect("name").value)
            fields.append(SelectField(Star(exclude), None))
        else:
            e = p.parse_expr()
            alias = None
            if p.accept("kw", "as"):
                alias = p.expect("name").value
            fields.append(SelectField(e, alias))
        if not p.accept("op", ","):
            break
    sources: list[str] = []
    if p.accept("kw", "from"):
        sources.append(p.expect("name").value)
        while p.accept("op", ","):
            sources.append(p.expect("name").value)
    where = None
    if p.accept("kw", "where") or p.accept("kw", "when"):
        where = p.parse_expr()
    group_by: list = []
    if p.accept("kw", "group"):
        p.expect("kw", "by")
        group_by.append(p.parse_expr())
        while p.accept("op", ","):
            group_by.append(p.parse_expr())
    commit_after = None
    commit_before = False
    flush = True
    if p.accept("kw", "commit"):
        if p.accept("kw", "keep"):
            flush = False
        elif p.accept("kw", "flush"):
            flush = True
        if p.accept("kw", "before"):
            commit_before = True
        else:
            p.expect("kw", "after")
        commit_after = p.parse_expr()
    return Operation(fields, sources, where, group_by, commit_after, commit_before, flush)


def parse_operation(text: str) -> Operation:
    p = Parser(tokenize(text))
    op = _parse_operation_body(p)
    p.expect("eof")
    return op


def _default_name(node, i: int) -> str:
    if isinstance(node, Field):
        return _strip_ns(node.path)
    if isinstance(node, Call) and node.args and isinstance(node.args[0], Field):
        return f"{node.fn}_{_strip_ns(node.args[0].path)}"
    return f"_{i}"


def compile_operation(
    op: Operation | str,
    source_df: DataFrame,
    params: dict[str, Any] | None = None,
) -> DataFrame:
    """Compile a RaQL SELECT operation onto a source DataFrame (batch).

    Batch semantics = run-to-completion windows: the COMMIT condition's
    event-time tumbling pattern (``in.t > out.t + d``) is subsumed by
    the GROUP BY time bucket; other conditions need the general COMMIT
    engine (operators.aggregate.commit_aggregate) — raised as
    unsupported here to keep the fast path honest.
    """
    if isinstance(op, str):
        op = parse_operation(op)

    df = source_df
    if op.where is not None:
        where_c = Compiler(params)
        cond = where_c.col(op.where)
        if where_c.has_aggregate:
            raise NotImplementedError("stateful WHERE needs the general COMMIT engine")
        df = df.filter(cond)

    # star expansion: `*` = all input fields not already named by the
    # select list (reference star rules, RamenOperation.ml:1254-1271)
    named = {
        f_.alias or _default_name(f_.expr, i)
        for i, f_ in enumerate(op.fields)
        if not isinstance(f_.expr, Star)
    }
    fields: list[SelectField] = []
    for f_ in op.fields:
        if isinstance(f_.expr, Star):
            skip = named | set(f_.expr.exclude)
            fields.extend(
                SelectField(Field(c_), c_) for c_ in df.columns if c_ not in skip
            )
        else:
            fields.append(f_)

    # private fields (leading underscore) are dropped from the output
    out_names: list[str] = []
    cols: list[Column] = []
    agg_flags: list[bool] = []
    for i, f_ in enumerate(fields):
        sub = Compiler(params)
        col = sub.col(f_.expr)
        name = f_.alias or _default_name(f_.expr, i)
        out_names.append(name)
        cols.append(col.alias(name))
        agg_flags.append(sub.has_aggregate)

    op = replace(op, fields=fields)
    if op.group_by or any(agg_flags):
        keys = [Compiler(params).col(k) for k in op.group_by]
        key_aliases = [k.alias(f"_k{i}") for i, k in enumerate(keys)]
        gdf = df.groupBy(*key_aliases) if keys else df.groupBy()
        agg_cols = [c_ for c_, is_a in zip(cols, agg_flags) if is_a]
        passthrough = [n for n, is_a in zip(out_names, agg_flags) if not is_a]
        res = gdf.agg(*agg_cols)
        # non-aggregate select fields must be group-key expressions:
        # re-alias the key columns to their select names positionally
        for n, is_a, f_ in zip(out_names, agg_flags, op.fields):
            if not is_a:
                sub = Compiler(params)
                # match the key by structural equality of compiled SQL
                target = sub.col(f_.expr)
                matched = None
                for i, k in enumerate(keys):
                    if str(target) == str(k):
                        matched = f"_k{i}"
                        break
                if matched is None:
                    raise ValueError(
                        f"non-aggregate select field {n!r} is not a GROUP BY key"
                    )
                res = res.withColumnRenamed(matched, n)
        drop = [c_ for c_ in res.columns if c_.startswith("_k")]
        res = res.drop(*drop)
        out = res
    else:
        # chained withColumn so later select fields may reference
        # earlier out-fields by alias (`out.total / out.duration`,
        # SURVEY §2.2 SELECT semantics) — Catalyst collapses the chain
        # into a single Project, so this costs nothing physically
        out = df
        for name, col in zip(out_names, cols):
            out = out.withColumn(name, col)

    public = [n for n in out_names if not n.startswith("_")]
    return out.select(*public)


# ---------------------------------------------------------------------------
# program: PARAMETERS …; DEFINE f AS SELECT …; DEFINE g AS … FROM f;
# ---------------------------------------------------------------------------


@dataclass
class DefineStmt:
    name: str
    op: Operation
    lazy: bool = False
    persist_for: float | None = None


@dataclass
class ProgramAST:
    parameters: dict[str, Any]
    defines: list[DefineStmt]


def parse_program(text: str) -> ProgramAST:
    """Parse a full RaQL program (SURVEY §3.1 entry point A):

        PARAMETERS p DEFAULTS TO 10, q DEFAULTS TO "x";
        DEFINE [LAZY] f [PERSIST FOR 3600] AS SELECT … FROM src;
        DEFINE g AS SELECT … FROM f;

    Statements separated by ``;`` (trailing ``;`` optional). Grammar
    per src/RamenProgram.ml:29-120 (structure only — fresh parser)."""
    p = Parser(tokenize(text))
    parameters: dict[str, Any] = {}
    defines: list[DefineStmt] = []
    while p.peek().kind != "eof":
        if p.accept("kw", "parameters"):
            while True:
                pname = p.expect("name").value
                p.expect("kw", "defaults")
                p.expect("kw", "to")
                t = p.next()
                if t.kind not in ("num", "str") and not (
                    t.kind == "kw" and t.value in ("true", "false", "null")
                ):
                    raise SyntaxError(f"RaQL: parameter default must be a literal, got {t.value!r}")
                parameters[pname] = (
                    {"true": True, "false": False, "null": None}[t.value]
                    if t.kind == "kw"
                    else t.value
                )
                if not p.accept("op", ","):
                    break
        elif p.accept("kw", "define"):
            lazy = bool(p.accept("kw", "lazy"))
            fname = p.expect("name").value
            persist: float | None = None
            if p.accept("kw", "persist"):
                p.expect("kw", "for")
                persist = float(p.expect("num").value)
            p.expect("kw", "as")
            defines.append(DefineStmt(fname, _parse_operation_body(p), lazy, persist))
        else:
            got = p.peek()
            raise SyntaxError(f"RaQL: expected DEFINE or PARAMETERS, got {got.value!r} at {got.pos}")
        if not p.accept("op", ";"):
            break
    p.expect("eof")
    return ProgramAST(parameters, defines)


def compile_program(text: str, name: str = "raql"):
    """RaQL program text → plans.program.Program with one Function per
    DEFINE, parents wired from the FROM clauses. Multi-parent FROM =
    unionByName (the reference's interleaved-stream model,
    src/RingBuf.ml:4-6). Materialize with externals supplying the
    source tables:

        prog = compile_program(txt)
        dfs = prog.materialize(spark, externals={"events": ev_df})
    """
    from ramen_spark.plans.program import Program

    ast = parse_program(text)
    prog = Program(name, parameters=ast.parameters)

    def make_body(op: Operation):
        def body(spark, params, *parent_dfs):
            if not parent_dfs:
                raise ValueError("RaQL function needs at least one FROM parent")
            src = parent_dfs[0]
            for extra in parent_dfs[1:]:
                src = src.unionByName(extra)
            return compile_operation(op, src, params)

        return body

    for d in ast.defines:
        prog.define(d.name, parents=list(d.op.sources), persist_for=d.persist_for)(
            make_body(d.op)
        )
    return prog
