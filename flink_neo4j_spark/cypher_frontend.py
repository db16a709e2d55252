"""Mini-Cypher front end: the reference's query surface, executed natively.

The reference never parses Cypher — it ships opaque strings to Neo4j
(`Neo4jFormatBase.java:48,60`). For a user to switch engines without
rewriting queries, this module parses and executes the exact Cypher shapes
the reference exercises (README + tests, SURVEY.md §2.B):

- ``MATCH (n:Label) RETURN id(n), n.prop, ...``             (B1/B3, README.md:20)
- ``MATCH (a:L)-[e]->(b:L) RETURN id(e), id(a), id(b), e.p`` (B2, InTest:46)
- ``... WHERE n.p = x OR n.p = y`` (equality/comparison, AND/OR — B4)
- ``UNWIND $rows AS i CREATE (n:Label {k: i.k, ...})``       (B6, README.md:45)
- ``UNWIND $rows AS u MATCH (p) WHERE p.k = u.k SET p.a = u.a, ...`` (B7/B8)
- multi-pattern ``CREATE (v:L {..literals..}), (v1)-[:T {..}]->(v2)``
  — the test-fixture construction shape (B9, FmtTest:14-19)
- read-side extensions beyond the reference's surface: ``RETURN n``
  (whole node/relationship as a struct column), general ``NOT <cond>``
  (three-valued), ``RETURN DISTINCT``,
  aggregations (``count(*)``, ``count/sum/avg/min/max(n.prop)`` with
  implicit grouping on the non-aggregated items, Cypher-style),
  ``ORDER BY <alias> [ASC|DESC], ... [SKIP n] [LIMIT m]`` — translated to
  groupBy/agg, distinct, Offset, and TakeOrderedAndProject respectively;
  ``OPTIONAL MATCH`` (one edge hop off a bound variable -> left equi-join,
  optional-side WHERE applied pre-join), relationship-property ``WHERE``
  (``e.p > x``), incoming patterns ``(a)<-[e]-(b)`` (parse-time endpoint
  swap — works in every clause that accepts a pattern), undirected
  patterns ``(a)-[e]-(b)`` (union of both orientations, self-loops
  matched once; single-hop MATCH/chains and pattern predicates),
  ``ORDER BY n.prop`` / ``ORDER BY count(*)`` (sort by a projected
  expression), and variable-length paths: bounded ``-[:T*lo..hi]->``
  (union of fixed-length edge-join chains with relationship-isomorphism
  filters, capped at ``MAX_VAR_HOPS``) and UNBOUNDED ``-[:T*]->`` /
  ``*lo..`` / ``*..hi`` (iterative frontier expansion carrying per-path
  edge-id arrays — drain-or-raise under ``VAR_UNBOUNDED_MAX_ROUNDS`` /
  ``VAR_UNBOUNDED_MAX_FRONTIER``);
  ``WITH`` pipeline stages (openCypher clause order ``WITH items
  [ORDER BY/LIMIT] [WHERE]``, chainable) — projection aliases re-scope the
  row, so HAVING-style filters on aggregates, top-k-then-continue, and
  aggregate-of-aggregate pipelines all execute as ordinary Catalyst
  projection/agg stages; pattern variables end at the WITH horizon

Reads translate to the PropertyGraph scan/expand surface (Catalyst plans
them: label filters push down, endpoint joins broadcast). Writes translate
to ``create_nodes`` / ``update_nodes`` / ``from_rows`` semantics and return
a NEW PropertyGraph (graphs are immutable values here).

  multi-clause ``MATCH ... MATCH ...`` chains unify on shared node
  variables (name-based joins; clauses sharing no variable are rejected
  rather than silently cross-joined). Single-pattern chains
  ``(a)-[e1]->(b)-[e2]->(c)`` and comma-separated parts ``MATCH (a)-[]->(b),
  (b)-[]->(c)`` desugar to the same machinery, with openCypher's
  relationship isomorphism (pairwise-distinct edges) enforced WITHIN each
  MATCH clause. Inline property maps ``(n:L {k: v})`` / ``-[e:T {k: v}]->``
  desugar to WHERE equality conjuncts in every read clause (incl. the
  OPTIONAL MATCH optional side). Bare boolean references are predicates
  (``WHERE n.trust``, ``WHERE NOT n.flag``) with three-valued semantics.

This is intentionally a SUBSET: whole path VALUES (beyond the
length/nodes/relationships accessors) are served by the native DataFrame
surface. Unsupported syntax raises
``CypherSyntaxError`` with the offending token, never a silent wrong
answer. Like openCypher, MERGE/DETACH/DELETE (any case) are reserved
words — a property or label spelled `delete` is rejected rather than
parsed ambiguously.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from dataclasses import replace as dc_replace
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_neo4j_spark.graph import (
    EXTRA_LABELS,
    PropertyGraph,
    label_cond,
    rel_type_cond,
)

__all__ = ["CypherSyntaxError", "cypher_read", "cypher_write", "cypher_create_graph"]


class CypherSyntaxError(ValueError):
    pass


# -- tokenizer -------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<arrow><-\[|-\[|\]->|\]-)
  | (?P<number>-?\d+\.\d+|-?\d+)
  | (?P<op><>|<=|>=|=~|=|<|>|\+|-|/|%|\^)
  | (?P<punct>[(){}:,.\$*\[\]|])
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
""",
    re.VERBOSE,
)

_KEYWORDS = {"MATCH", "RETURN", "WHERE", "UNWIND", "AS", "CREATE", "SET", "AND", "OR",
             "TRUE", "FALSE", "NULL", "ID", "WITH", "MERGE", "DETACH", "DELETE",
             "REMOVE"}


@dataclass
class _Tok:
    kind: str  # 'kw', 'word', 'op', 'punct', 'arrow', 'string', 'number'
    text: str


def _tokenize(query: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if not m:
            raise CypherSyntaxError(f"cannot tokenize at: {query[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "word" and text.upper() in _KEYWORDS:
            out.append(_Tok("kw", text.upper()))
        else:
            out.append(_Tok(kind, text))
    return out


# -- AST -------------------------------------------------------------------


@dataclass
class NodePat:
    var: str | None
    label: str | None
    props: dict[str, Any] = field(default_factory=dict)  # literal or (param_var, key)


@dataclass
class EdgePat:
    var: str | None
    rel_type: str | None
    src: NodePat
    dst: NodePat
    props: dict[str, Any] = field(default_factory=dict)
    #: variable-length spec (lo, hi) from ``-[:T*lo..hi]->``; None = single hop
    hops: tuple[int, int] | None = None
    #: ``(a)-[e]-(b)``: match the edge in either orientation. Incoming
    #: patterns ``(a)<-[e]-(b)`` never reach the AST — the parser swaps the
    #: endpoints into the equivalent outgoing form.
    undirected: bool = False


@dataclass
class PropRef:
    var: str
    prop: str | None  # None => id(var)


@dataclass
class BareRef:
    """A bare projected-column reference, legal only AFTER a ``WITH`` stage
    (where the row is no longer pattern variables but named scalars)."""

    name: str


@dataclass
class Cond:
    left: PropRef
    op: str
    right: Any  # literal or PropRef
    #: ``NOT <cond>`` — compiled as Spark's ``~``, which preserves
    #: openCypher's three-valued logic (NOT null is null)
    negated: bool = False


@dataclass
class PatternCond:
    """A pattern predicate in WHERE: ``[NOT] (v)-[:TYPE]->(()|(:Label))`` —
    Cypher's existential subquery shorthand. Compiles to a semi-join
    (positive) or anti-join (NOT) against the edge endpoints."""

    var: str
    rel_type: str | None
    dst_label: str | None
    negated: bool
    #: which endpoint ``var`` occupies: "out" ``(v)-[]->()``, "in"
    #: ``(v)<-[]-()``, or "undirected" ``(v)-[]-()``
    direction: str = "out"
    #: block forms only (``EXISTS { }`` / ``COUNT { }``): an edge/far-node
    #: variable binding plus an inner WHERE over them. The shorthand
    #: ``(v)-[:T]->()`` never sets these, so its semi-join fast path is
    #: untouched.
    edge_var: str | None = None
    dst_var: str | None = None
    pred: Any = None


@dataclass
class Star:
    """``RETURN *`` — expanded to one whole-variable item per in-scope
    pattern variable (or per projected name after a WITH horizon) in
    sorted order, before projection."""


@dataclass
class WholeVar:
    """``RETURN n`` — a whole pattern variable as a RETURN/WITH item.
    Projects the entity as ONE struct column (id + label + properties for
    nodes; id + src + dst + rel_type + properties for relationships),
    the tabular analogue of Neo4j returning the node/relationship
    object."""

    var: str


@dataclass
class FieldAccess:
    """Postfix ``.name`` on a computed expression — ``date(s).year``,
    ``duration.between(a, b).days``, nested struct access ``m.a.b``.
    Dispatches at compile time on the base dtype: temporal component on
    date/timestamp, struct field (missing → null, the map-access
    contract) on structs; anything else raises."""

    base: Any
    name: str


@dataclass
class ListExpr:
    """A list constructor with expression elements — ``[n.name, 'x']`` —
    compiled to one JVM ``array()``. Pure-literal lists stay plain Python
    lists (the UNWIND/IN machinery consumes those directly)."""

    items: tuple


@dataclass
class MapProj:
    """``n {.name, .born}`` / ``n {.*}`` — a Cypher map projection as a
    RETURN/WITH item: the selected properties of a pattern variable (or a
    whole variable carried through WITH) as one struct column. ``.*``
    selects every property (meta fields excluded). A projected property
    no write ever created reads null, like any other property access."""

    var: str
    props: tuple  # property names, or ("*",) for .*
    #: computed entries ``{.name, yr: n.born + 1}`` — (key, expr) pairs
    #: evaluated in the enclosing scope (Neo4j's map-projection extras)
    extras: tuple = ()


@dataclass
class CaseExpr:
    """``CASE WHEN <pred> THEN <expr> [...] [ELSE <expr>] END`` in a
    RETURN/WITH item (the simple form ``CASE x WHEN v THEN ...`` is
    desugared to equality predicates at parse time). Compiles to a
    chained ``F.when``; an unmatched row without ELSE is null, as in
    Cypher."""

    whens: tuple  # ((disj, result_expr), ...)
    default: Any = None


@dataclass
class FuncCall:
    """A scalar function in RETURN/WITH: the openCypher string functions
    (``toLower``/``toUpper``/``trim``), the graph-model accessors
    (``labels``/``type`` — parsed into rewritten property refs on the
    label/rel_type columns; ``keys``/``properties`` — whole-variable
    accessors over the clause's var_props annotation), ``size``, and
    variadic ``coalesce`` (further
    operands, refs or literals, in ``extra``)."""

    fn: str
    arg: "PropRef | BareRef | Any"
    extra: tuple = ()


@dataclass
class AggCall:
    fn: str  # COUNT / SUM / AVG / MIN / MAX / COLLECT / STDEV(P) / PERCENTILE*
    arg: PropRef | None  # None => count(*) or count(var)
    distinct: bool = False  # count(DISTINCT x) / collect(DISTINCT x) / ...
    #: extra literal arguments (the percentile for percentileCont/Disc)
    extra: tuple = ()


@dataclass
class BinOp:
    """Arithmetic in RETURN/WITH: ``n.a + n.b``, ``s / c`` over WITH
    columns, ``n.price * 2``. Operands are refs, literals, scalar function
    calls, or nested BinOps — never aggregates (compute those in a WITH
    stage first; the parser rejects the mix, keeping implicit-grouping
    analysis trivially correct)."""

    op: str  # + - * / %
    left: Any
    right: Any


@dataclass
class ListComp:
    """List comprehension ``[x IN <list> [WHERE <pred>] [| <expr>]]`` —
    compiled to Spark's higher-order ``filter``/``transform`` (JVM
    lambdas, zero Python). ``pred`` is a parse_where disjunction over the
    loop variable (bare) and outer scope; ``expr`` None = identity."""

    var: str
    source: Any
    pred: Any = None
    expr: Any = None


@dataclass
class CountPattern:
    """``COUNT { (v)-[:T]->(:L) }`` — Neo4j 5's count subquery (the
    per-row degree idiom). Bound pre-projection as ONE left-joined
    partial-aggregated edge count per distinct subquery (never a per-match
    row explosion); reuses the pattern-predicate AST."""

    pattern: "PatternCond"


@dataclass
class PatternComp:
    """``[(v)-[e:T]->(m[:L]) [WHERE cond] | expr]`` — Cypher pattern
    comprehension: the inline one-to-many projection idiom (per-row list
    of values off the adjacent matches). Bound pre-projection as ONE
    left-joined per-node collected list over the matched edges — the
    outer frame never row-multiplies — with no-match rows reading ``[]``
    per Cypher. The list is value-sorted (nulls kept, like Neo4j's
    pattern comprehension and unlike collect()) so the result is a
    layout-independent VALUE; Neo4j leaves the order unspecified, so the
    sorted list is a valid member of its semantics. The inner scope is
    the pattern's own variables only (edge + far endpoint) — outer
    references raise, like COUNT { }."""

    var: str
    edge_var: str | None
    rel_type: str | None
    #: "out" ``(v)-[]->(m)``, "in" ``(v)<-[]-(m)``, or "undirected"
    direction: str
    dst_var: str | None
    dst_label: str | None
    pred: Any  # parsed WHERE disjunction over the inner scope, or None
    expr: Any  # the mapped projection (required: ``| expr``)


@dataclass
class MapLit:
    """``{name: n.name, age: n.born + 1}`` — a literal map in expression
    position (Neo4j's inline record-construction idiom). Compiled to ONE
    ``struct()`` with the keys as field names — the same modeling as
    whole-variable and map-projection results (Cypher maps are
    heterogeneous; Spark's map type is not), zero shuffle."""

    entries: tuple  # ((key, expr), ...)


@dataclass
class RawCol:
    """Internal marker: a projection expression already bound to a real
    column of the working frame (pattern-count joins); resolves as a bare
    F.col, bypassing the scope colmap."""

    name: str


@dataclass
class ReduceExpr:
    """``reduce(acc = init, x IN list | expr)`` — Cypher's list fold,
    compiled to Spark's higher-order ``aggregate`` (JVM lambda, zero
    Python). The init expression doubles as the accumulator's type-probe
    twin for size() dispatch inside the lambda."""

    acc: str
    init: Any
    var: str
    source: Any
    expr: Any


@dataclass
class IsNullExpr:
    """``expr IS [NOT] NULL`` in expression position (RETURN/WITH items) —
    the null-flag projection idiom. WHERE keeps its own Cond path (which
    pushes the predicate into the scan); this node only exists where the
    result is a projected boolean VALUE."""

    arg: Any
    negated: bool


@dataclass
class IndexExpr:
    """``list[i]`` — Cypher 0-based element access; negative indices count
    from the end; out-of-range reads null (try_element_at)."""

    base: Any
    index: Any


@dataclass
class SliceExpr:
    """``list[from..to]`` — Cypher half-open 0-based slice; either bound
    optional, negative bounds count from the end, out-of-range clamps."""

    base: Any
    lo: Any  # None = 0
    hi: Any  # None = size


@dataclass
class ReturnItem:
    expr: PropRef | AggCall
    alias: str | None


#: aggregate function names recognized contextually (NOT keywords, so a
#: property may still be named `count`)
_AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "COLLECT", "STDEV",
            "STDEVP", "PERCENTILECONT", "PERCENTILEDISC"}

#: openCypher scalar functions: name -> (min_args, max_args); recognized
#: contextually (word followed by "("), translated in _scalar_fn_column.
#: max_args None = variadic.
_FN_ARITY = {
    "toLower": (1, 1), "toUpper": (1, 1), "trim": (1, 1), "ltrim": (1, 1),
    "rtrim": (1, 1), "reverse": (1, 1), "toInteger": (1, 1),
    "toFloat": (1, 1), "toString": (1, 1), "toBoolean": (1, 1),
    "abs": (1, 1), "sign": (1, 1), "sqrt": (1, 1), "exp": (1, 1),
    "log": (1, 1), "log10": (1, 1), "sin": (1, 1), "cos": (1, 1),
    "tan": (1, 1), "asin": (1, 1), "acos": (1, 1), "atan": (1, 1),
    "atan2": (2, 2), "degrees": (1, 1), "radians": (1, 1),
    "pi": (0, 0), "e": (0, 0), "isEmpty": (1, 1),
    "ceil": (1, 1), "floor": (1, 1), "round": (1, 2), "head": (1, 1),
    "last": (1, 1), "size": (1, 1), "left": (2, 2), "right": (2, 2),
    "split": (2, 2), "substring": (2, 3), "replace": (3, 3),
    "coalesce": (1, None), "range": (2, 3), "tail": (1, 1),
    # temporal constructors: a NO-argument date()/datetime() is "now" in
    # Neo4j — nondeterministic, rejected by the min-arity (determinism is
    # the engine contract); pass the clock in as a parameter instead
    "date": (1, 1), "datetime": (1, 1),
    # spatial constructor: point({x, y}) / point({longitude, latitude})
    "point": (1, 1),
}

#: hard ceiling on BOUNDED variable-length path expansion: each extra hop
#: is one more edge join in the unioned plan, and path counts can grow
#: combinatorially — the bound keeps the operator cluster-safe by
#: construction (raise consciously, not by data surprise). Unbounded forms
#: (``*`` / ``*lo..``) take the iterative frontier path instead, governed
#: by the two guards below.
MAX_VAR_HOPS = 6

#: unbounded expansion guards: relationship isomorphism terminates every
#: path at ≤|E| hops mathematically, but a graph whose paths outlive the
#: round ceiling (or whose per-round partial-path frontier outgrows the
#: row cap) raises LOUDLY instead of grinding toward an OOM — the same
#: drain-or-raise contract as the SCC peel and the Brandes BFS. Both are
#: module-level so a test (or an operator that knows its graph) can widen
#: them consciously.
VAR_UNBOUNDED_MAX_ROUNDS = 32
VAR_UNBOUNDED_MAX_FRONTIER = 50_000_000

#: iter_kernel row target for path-expansion states (guide §2.2's ~100 MB
#: per partition): path rows carry node/edge-id ARRAYS (≤ rounds longs
#: each), ~10× the bytes of the narrow per-vertex states the default
#: ITER_ROWS_PER_PARTITION assumes.
PATH_STATE_ROWS_PER_PARTITION = 200_000

#: ``nodes(p)``/``relationships(p)`` over allShortestPaths enumerate the
#: tied paths per pair — bounded state (≤ cap+1 paths per settled pair,
#: the σ-count already proves the multiplicity); a pair whose tie count
#: exceeds the cap raises at execution (σ is monotone along the BFS DAG,
#: so any capped intermediate implies the output pair's own count also
#: exceeds the cap — the raise can never miss a silent undercount).
ALL_PATHS_TIE_CAP = 8


# -- parser ----------------------------------------------------------------


class _Parser:
    def __init__(
        self, tokens: list[_Tok], params: dict[str, Any] | None = None
    ):
        self.toks = tokens
        self.i = 0
        #: query parameters ($name) — resolved to their literal values at
        #: parse time, so a parameterized query plans exactly like its
        #: literal twin and values can never act as syntax (no injection)
        self.params = params
        #: aggregates are illegal in predicate position (WHERE) but legal
        #: inside CASE WHEN conditions of a PROJECTION item (``RETURN CASE
        #: WHEN count(*) > 2 THEN …``) — the CASE parser flips this around
        #: its condition parse; _parse_single_cond consults it
        self._agg_ok = False

    def peek(self, k: int = 0) -> _Tok | None:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def next(self) -> _Tok:
        tok = self.peek()
        if tok is None:
            raise CypherSyntaxError("unexpected end of query")
        self.i += 1
        return tok

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        tok = self.next()
        if tok.kind != kind or (text is not None and tok.text != text):
            raise CypherSyntaxError(f"expected {text or kind}, got {tok.text!r}")
        return tok

    def at(self, kind: str, text: str | None = None) -> bool:
        tok = self.peek()
        return tok is not None and tok.kind == kind and (text is None or tok.text == text)

    def expect_end(self) -> None:
        """Reject trailing tokens. Every cypher_write form must call this
        before executing: a clause the grammar does not support (e.g. a SET
        after a relationship MERGE) must be a loud syntax error, never a
        silently-dropped write."""
        tok = self.peek()
        if tok is not None:
            raise CypherSyntaxError(
                f"unsupported trailing clause at {tok.text!r}"
            )

    # values ----------------------------------------------------------------

    def parse_value(self, unwind_var: str | None):
        tok = self.next()
        if tok.kind == "punct" and tok.text == "$":
            name = self.expect("word").text
            if self.params is None or name not in self.params:
                raise CypherSyntaxError(f"missing parameter ${name}")
            return self.params[name]
        if tok.kind == "string":
            return tok.text[1:-1].replace("\\'", "'")
        if tok.kind == "number":
            return float(tok.text) if "." in tok.text else int(tok.text)
        if tok.kind == "kw" and tok.text in ("TRUE", "FALSE"):
            return tok.text == "TRUE"
        if tok.kind == "kw" and tok.text == "NULL":
            return None
        if tok.kind == "word" and unwind_var and tok.text == unwind_var:
            self.expect("punct", ".")
            key = self.expect("word").text
            return ("__param__", key)
        if tok.kind == "punct" and tok.text == "{":
            # literal map value {k: <literal>, ...} — the inline-batch
            # idiom ``UNWIND [{a: 1}, {a: 2}] AS row`` (same dict shape
            # as a $param row)
            out: dict[str, Any] = {}
            if not self.at("punct", "}"):
                while True:
                    k = self.expect("word").text
                    self.expect("punct", ":")
                    out[k] = self.parse_value(unwind_var)
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
            self.expect("punct", "}")
            return out
        raise CypherSyntaxError(f"unsupported value: {tok.text!r}")

    def parse_props(self, unwind_var: str | None) -> dict[str, Any]:
        props: dict[str, Any] = {}
        if not self.at("punct", "{"):
            return props
        self.next()
        while True:
            key = self.expect("word").text
            self.expect("punct", ":")
            props[key] = self.parse_value(unwind_var)
            if self.at("punct", ","):
                self.next()
                continue
            self.expect("punct", "}")
            return props

    # patterns --------------------------------------------------------------

    def parse_node(self, unwind_var: str | None = None) -> NodePat:
        self.expect("punct", "(")
        var = label = None
        if self.at("word"):
            var = self.next().text
        if self.at("punct", ":"):
            self.next()
            label = self.expect("word").text
        props = self.parse_props(unwind_var)
        self.expect("punct", ")")
        return NodePat(var, label, props)

    def parse_hops(self) -> tuple[int, int | None] | None:
        """Variable-length spec after the relationship type — the full
        Neo4j surface: ``*`` (1..∞), ``*n``, ``*lo..hi``, ``*lo..``
        (lo..∞), ``*..hi`` (1..hi). Unbounded forms return ``hi=None``
        and compile to the iterative frontier expansion (drain-or-raise —
        see ``_varlength_paths_unbounded``); bounded forms keep the
        union-of-chains plan and the MAX_VAR_HOPS ceiling."""
        if not self.at("punct", "*"):
            return None
        self.next()
        lo = 1
        if self.at("number"):
            lo = int(self.expect("number").text)
            if not self.at("punct", "."):
                return self._check_hops(lo, lo)
        elif not self.at("punct", "."):
            return (1, None)  # bare '*'
        self.expect("punct", ".")
        self.expect("punct", ".")
        if not self.at("number"):
            return self._check_hops(lo, None)  # '*lo..' / '*..'
        hi = int(self.expect("number").text)
        return self._check_hops(lo, hi)

    def _check_hops(self, lo: int, hi: int | None) -> tuple[int, int | None]:
        # lo=0 is legal Cypher: the ZERO-LENGTH path, where both pattern
        # endpoints bind the SAME node (labels of both sides apply) and
        # the rel type is ignored — nodes(p)=[n], relationships(p)=[]
        if lo < 0 or (hi is not None and hi < lo):
            raise CypherSyntaxError(
                f"invalid variable-length bounds *{lo}..{hi}"
            )
        if hi is not None and hi > MAX_VAR_HOPS:
            raise CypherSyntaxError(
                f"variable-length upper bound {hi} exceeds MAX_VAR_HOPS="
                f"{MAX_VAR_HOPS}; drop the bound (*{lo}..) for the "
                "iterative drain-or-raise expansion"
            )
        return (lo, hi)

    def parse_pattern(
        self,
        unwind_var: str | None = None,
    ) -> NodePat | EdgePat:
        src = self.parse_node(unwind_var)
        if not (self.at("arrow", "-[") or self.at("arrow", "<-[")):
            return src
        pat, _ = self._parse_one_hop(src, unwind_var)
        return pat

    def _parse_rel_type_alts(self) -> str | tuple[str, ...]:
        """``:T`` or Cypher's multi-type alternation ``:A|B|C`` — a single
        name stays a plain string (the write paths require one type); the
        alternation form returns a dedup'd tuple and compiles to ONE
        ``isin`` filter on the edge scan."""
        first = self.expect("word").text
        alts = [first]
        while self.at("punct", "|"):
            self.next()
            alts.append(self.expect("word").text)
        uniq = tuple(dict.fromkeys(alts))
        return uniq[0] if len(uniq) == 1 else uniq

    def parse_pattern_seq(
        self, unwind_var: str | None = None
    ) -> list[NodePat | EdgePat]:
        """Comma-separated pattern parts, each a possibly multi-hop chain:
        ``(a)-[e1]->(b)-[e2]->(c), (b)-[:T]-(d)``. Returned as a flat list
        of single-hop patterns — chain continuation REUSES the shared
        NodePat object, so the multi-clause unification machinery joins the
        segments on its variable name exactly like ``MATCH ... MATCH ...``
        (anonymous continuation nodes get a synthetic variable later)."""
        out: list[NodePat | EdgePat] = []
        while True:
            src = self.parse_node(unwind_var)
            if not (self.at("arrow", "-[") or self.at("arrow", "<-[")):
                out.append(src)
            else:
                while self.at("arrow", "-[") or self.at("arrow", "<-["):
                    pat, src = self._parse_one_hop(src, unwind_var)
                    out.append(pat)
            if self.at("punct", ","):
                self.next()
                continue
            return out

    def _parse_one_hop(
        self,
        src: NodePat,
        unwind_var: str | None,
    ) -> tuple[EdgePat, NodePat]:
        """One edge segment continuing from ``src``. Returns the normalized
        (outgoing-form) EdgePat plus the SURFACE destination node — the
        chain continuation point, which after an incoming-arrow swap is the
        pattern's src."""
        incoming = self.at("arrow", "<-[")
        self.next()
        evar = rtype = None
        if self.at("word"):
            evar = self.next().text
        if self.at("punct", ":"):
            self.next()
            rtype = self._parse_rel_type_alts()
        hops = self.parse_hops()
        props = self.parse_props(unwind_var)
        undirected = False
        if incoming:
            # ``(a)<-[e]-(b)``: the only legal close is ``]-`` (a pattern
            # with arrowheads on both ends is invalid Cypher)
            if not self.at("arrow", "]-"):
                raise CypherSyntaxError(
                    "incoming pattern must close with ]- (\"<-[...]-\"); "
                    "\"<-[...]->\" is not a valid pattern"
                )
            self.next()
        elif self.at("arrow", "]->"):
            self.next()
        elif self.at("arrow", "]-"):
            # ``(a)-[e]-(b)``: undirected — match either orientation
            self.next()
            undirected = True
        else:
            raise CypherSyntaxError("expected ]-> or ]- to close the pattern")
        dst = self.parse_node(unwind_var)
        surface_dst = dst
        if incoming:
            # normalize to the outgoing form: (a)<-[e]-(b) == (b)-[e]->(a).
            # Every downstream stage (expand, chains, OPTIONAL MATCH,
            # var-length, shortestPath) keys on variable NAMES, so the swap
            # is semantics-complete and incoming needs no execution support.
            src, dst = dst, src
        if hops is not None and evar is not None:
            raise CypherSyntaxError(
                "variable-length patterns cannot bind a relationship variable"
            )
        # undirected variable-length hops are legal everywhere: both the
        # shortestPath BFS and the general expansion run over the
        # symmetrized edge frame (see _sym_edges)
        return EdgePat(evar, rtype, src, dst, props, hops, undirected), surface_dst

    # expressions -----------------------------------------------------------

    def parse_prop_ref(self, allow_bare: bool = False) -> PropRef | BareRef:
        if self.at("kw", "ID"):
            self.next()
            self.expect("punct", "(")
            if (
                self.at("word")
                and self.peek().text in ("startNode", "endNode")
                and self.peek(1) is not None
                and self.peek(1).text == "("
            ):
                # id(startNode(e)) / id(endNode(e)) — the endpoint-id
                # idiom: reads the edge's src/dst column directly (no
                # vertex join). Bare startNode(e) outside id() stays
                # rejected — materializing the full node entity needs
                # the pattern to bind the endpoint instead.
                which = self.next().text
                self.next()
                var = self.expect("word").text
                self.expect("punct", ")")
                self.expect("punct", ")")
                return PropRef(var, "src" if which == "startNode" else "dst")
            var = self.expect("word").text
            self.expect("punct", ")")
            return PropRef(var, None)
        var = self.expect("word").text
        if allow_bare and not self.at("punct", "."):
            return BareRef(var)
        self.expect("punct", ".")
        return PropRef(var, self.expect("word").text)

    def _parse_scalar_arg(self, allow_bare: bool):
        """One scalar-function argument: a full RETURN-expression (refs,
        literals, arithmetic, nested function calls — ``head(split(n.name,
        ' '))``), but never an aggregate."""
        # aggregates ARE legal here in projection position (``round(avg(x),
        # 2)`` — Neo4j's composite aggregate expressions); WHERE/SET/UNWIND
        # positions reject them with a deep _contains_agg check instead.
        return self.parse_return_expr(allow_bare)

    def _at_scalar_fn(self) -> bool:
        tok = self.peek()
        return (
            tok is not None
            and tok.kind == "word"
            and (
                tok.text in _FN_ARITY
                or tok.text in ("labels", "type", "keys", "properties", "length")
            )
            and self.peek(1) is not None
            and self.peek(1).text == "("
        )

    def parse_operand(self, unwind_var: str | None):
        tok = self.peek()
        if tok is None:
            raise CypherSyntaxError("unexpected end of query")
        if unwind_var is None and self._at_scalar_fn():
            # scalar functions as comparison operands (read context only;
            # write templates keep the literal/param contract)
            return self._parse_primary_expr()
        is_ref = (tok.kind == "kw" and tok.text == "ID") or (
            tok.kind == "word"
            and tok.text != unwind_var
            and self.peek(1) is not None
            and self.peek(1).kind == "punct"
            and self.peek(1).text == "."
        )
        if is_ref:
            return self.parse_prop_ref()
        return self.parse_value(unwind_var)

    def parse_where(
        self, unwind_var: str | None = None, allow_bare: bool = False
    ) -> list[list[Cond]]:
        """Boolean WHERE grammar -> disjunctive normal form.

        Precedence (Neo4j): OR < XOR < AND < NOT < factor. Parenthesized
        boolean groups recurse and DISTRIBUTE into the DNF the rest of
        the machinery speaks (``(a OR b) AND c`` -> ``a∧c ∨ b∧c``);
        NOT over a group / XOR applies De Morgan (Kleene 3VL preserves
        both laws, so null propagation is unchanged by the rewrite). The
        DNF size is capped — a pathological nest raises loudly instead
        of exploding."""
        return self._parse_where_or(unwind_var, allow_bare)

    _DNF_CAP = 128

    def _dnf_guard(self, dnf: list[list[Cond]]) -> list[list[Cond]]:
        if len(dnf) > self._DNF_CAP:
            raise CypherSyntaxError(
                "WHERE clause is too complex to normalize (DNF exceeds "
                f"{self._DNF_CAP} branches); simplify the boolean nesting"
            )
        return dnf

    def _parse_where_or(self, unwind_var, allow_bare) -> list[list[Cond]]:
        branches = self._parse_where_xor(unwind_var, allow_bare)
        while self.at("kw", "OR"):
            self.next()
            branches = branches + self._parse_where_xor(unwind_var, allow_bare)
        return self._dnf_guard(branches)

    def _parse_where_xor(self, unwind_var, allow_bare) -> list[list[Cond]]:
        left = self._parse_where_and(unwind_var, allow_bare)
        while self._at_word_ci("XOR"):
            # a XOR b = (A ∧ ¬B) ∨ (¬A ∧ B) over DNFs — left-associative,
            # so chained XOR folds naturally; 3VL survives the identity
            # (null XOR x is null on both forms).
            self.next()
            right = self._parse_where_and(unwind_var, allow_bare)
            ln = self._negate_dnf(left)
            rn = self._negate_dnf(right)
            left = self._dnf_guard(
                [a + b for a in left for b in rn]
                + [a + b for a in ln for b in right]
            )
        return left

    def _parse_where_and(self, unwind_var, allow_bare) -> list[list[Cond]]:
        cur = self._parse_where_factor(unwind_var, allow_bare)
        while self.at("kw", "AND"):
            self.next()
            nxt = self._parse_where_factor(unwind_var, allow_bare)
            # DNF product: (A1 ∨ A2) ∧ (B1 ∨ B2) = ∨ (Ai ∧ Bj)
            cur = self._dnf_guard([a + b for a in cur for b in nxt])
        return cur

    @staticmethod
    def _negate_cond(c: Cond) -> Cond:
        return dc_replace(c, negated=not c.negated)

    def _negate_dnf(self, dnf: list[list[Cond]]) -> list[list[Cond]]:
        """De Morgan over a DNF: ¬(C1 ∨ …) = ∧ ¬Ci; ¬(c1 ∧ c2) = ¬c1 ∨ ¬c2
        — the product re-normalizes to DNF. Valid in Kleene 3VL, so null
        propagation matches Neo4j's NOT."""
        result: list[list[Cond]] = [[]]
        for conj in dnf:
            result = self._dnf_guard(
                [r + [self._negate_cond(c)] for r in result for c in conj]
            )
        return result

    def _parse_where_factor(
        self, unwind_var, allow_bare
    ) -> list[list[Cond]]:
        """One boolean factor as a DNF: NOT factor, a parenthesized
        group, a pattern predicate, an EXISTS form, or a single
        condition. ``(`` is three-way ambiguous — pattern predicate
        ``(n)-[:T]->()``, value grouping ``(n.born + 1) > 1984``, or a
        boolean group ``(a OR b)`` — disambiguated by backtracking in
        that order (token position is the only parser state)."""
        if self._at_word_ci("NOT"):
            save = self.i
            self.next()
            if self.at("punct", "(") or self._at_word_ci("NOT"):
                try:
                    pc = self.parse_pattern_predicate()
                    pc.negated = not pc.negated
                    return [[pc]]
                except CypherSyntaxError:
                    self.i = save
                    self.next()
                # NOT over a single condition that starts with a value
                # paren, or over a boolean group
                try:
                    save2 = self.i
                    conds = self._parse_single_cond(
                        unwind_var, allow_bare, negated=True
                    )
                    return [conds]
                except CypherSyntaxError:
                    self.i = save2
                self.expect("punct", "(")
                grp = self._parse_where_or(unwind_var, allow_bare)
                self.expect("punct", ")")
                return self._negate_dnf(grp)
            if self._at_exists():
                return [[self._parse_exists_cond(allow_bare, negated=True)]]
            return [
                self._parse_single_cond(unwind_var, allow_bare, negated=True)
            ]
        if self.at("punct", "("):
            save = self.i
            try:
                return [[self.parse_pattern_predicate()]]
            except CypherSyntaxError:
                self.i = save
            try:
                return [
                    self._parse_single_cond(
                        unwind_var, allow_bare, negated=False
                    )
                ]
            except CypherSyntaxError:
                self.i = save
            self.expect("punct", "(")
            grp = self._parse_where_or(unwind_var, allow_bare)
            self.expect("punct", ")")
            return grp
        if self._at_exists():
            return [[self._parse_exists_cond(allow_bare, negated=False)]]
        return [self._parse_single_cond(unwind_var, allow_bare, negated=False)]

    def _at_exists(self) -> bool:
        return self._at_word_ci("EXISTS") and (
            self.peek(1) is not None and self.peek(1).text in ("(", "{")
        )

    def _parse_exists_cond(self, allow_bare: bool, negated: bool) -> Cond:
        """exists(n.prop) == n.prop IS NOT NULL (classic Neo4j);
        exists((v)-[:T]->()) == the pattern existential;
        EXISTS { (v)-[:T]->(:L) } == the modern (Neo4j 5)
        existential-subquery block, sugar for the same semi/anti-join
        pattern predicate (an optional leading MATCH keyword inside the
        block is accepted)."""
        self.next()
        if self.at("punct", "{"):
            self.next()
            if self.at("kw", "MATCH"):
                self.next()
            pc = self.parse_pattern_predicate(block=True)
            self.expect("punct", "}")
            if negated:
                pc.negated = not pc.negated
            return pc
        self.expect("punct", "(")
        if self.at("punct", "("):
            pc = self.parse_pattern_predicate()
            self.expect("punct", ")")
            if negated:
                pc.negated = not pc.negated
            return pc
        ref = self.parse_prop_ref(allow_bare)
        self.expect("punct", ")")
        return Cond(ref, "IS NOT NULL", None, negated=negated)

    def _parse_single_cond(
        self, unwind_var, allow_bare: bool, negated: bool
    ) -> list[Cond]:
        """One comparison/predicate condition (chained comparisons may
        expand to several ANDed conds). Returns the conjunct list."""
        out: list[Cond] = []
        if unwind_var is None:
            # read context: a full arithmetic expression may appear on
            # either side of the comparison (``WHERE x % 3 = 0``,
            # ``WHERE y > x * 10`` inside comprehensions). Arithmetic
            # parsing never consumes comparison ops or AND/OR, so the
            # condition structure is unchanged; aggregates stay
            # rejected (filter on a WITH alias instead).
            left = self.parse_return_expr(allow_bare)
        elif self._at_scalar_fn():
            left = self._parse_primary_expr(allow_bare)
        else:
            left = self.parse_prop_ref(allow_bare)
        if self._at_word_ci("IN"):
            self.next()
            if self.at("punct", "$"):
                # IN $param — the parameterized membership idiom
                vals = self.parse_value(unwind_var)
                if not isinstance(vals, list):
                    raise CypherSyntaxError("IN $param requires a list value")
                out.append(Cond(left, "IN", vals))
            elif self.at("punct", "["):
                self.expect("punct", "[")
                vals: list[Any] = []
                if not self.at("punct", "]"):
                    while True:
                        vals.append(self.parse_value(unwind_var))
                        if self.at("punct", ","):
                            self.next()
                            continue
                        break
                self.expect("punct", "]")
                out.append(Cond(left, "IN", vals))
            elif unwind_var is None:
                # IN <expression> — membership in a list-valued
                # expression (``x IN split(s, ',')``, ``y IN n.tags``):
                # compiles to array_contains, 3VL-preserving
                expr = self.parse_return_expr(allow_bare)
                out.append(Cond(left, "IN_EXPR", expr))
            else:
                raise CypherSyntaxError(
                    "IN requires a list literal or $param here"
                )
        elif self._at_word_ci("STARTS") or self._at_word_ci("ENDS"):
            kw = self.next().text.upper()
            self.expect("kw", "WITH")
            out.append(
                Cond(left, f"{kw} WITH", self.parse_value(unwind_var))
            )
        elif self._at_word_ci("CONTAINS"):
            self.next()
            out.append(
                Cond(left, "CONTAINS", self.parse_value(unwind_var))
            )
        elif self._at_word_ci("IS"):
            # n.prop IS [NOT] NULL — Neo4j's missing-property predicate
            # (B5: absent properties read as null)
            self.next()
            if self._at_word_ci("NOT"):
                self.next()
                self.expect("kw", "NULL")
                out.append(Cond(left, "IS NOT NULL", None))
            else:
                self.expect("kw", "NULL")
                out.append(Cond(left, "IS NULL", None))
        elif not self.at("op"):
            # bare boolean reference as a predicate: ``WHERE n.trust``
            # / ``WHERE x = 1 OR NOT n.flag`` — openCypher truthiness.
            # Compiled as ``col = true`` so three-valued logic holds: a
            # null (or missing) property never passes, and NOT of it
            # stays null.
            out.append(Cond(left, "TRUTHY", None))
        else:
            op = self.expect("op").text
            if unwind_var is None:
                right = self.parse_return_expr(allow_bare)
            else:
                right = self.parse_operand(unwind_var)
            if op == "=~" and not isinstance(right, str):
                raise CypherSyntaxError(
                    "=~ requires a string regex literal on the right"
                )
            out.append(Cond(left, op, right))
            # Cypher chained comparisons: a < b <= c desugars to
            # a < b AND b <= c (the shared operand's AST is reused,
            # not re-evaluated differently)
            chain_ops = ("<", "<=", ">", ">=", "=", "<>")
            while (
                unwind_var is None
                and op in chain_ops
                and self.at("op")
                and self.peek().text in chain_ops
            ):
                if negated:
                    raise CypherSyntaxError(
                        "NOT over a chained comparison is ambiguous; "
                        "parenthesize or split with AND"
                    )
                mid = right
                op = self.next().text
                right = self.parse_return_expr(allow_bare)
                out.append(Cond(mid, op, right))
        if negated:
            out[-1] = dc_replace(out[-1], negated=not out[-1].negated)
        # predicate position rejects aggregates WHEREVER they nest
        # (``WHERE sum(x) + 1 > 2``) — Neo4j's "invalid use of aggregating
        # function"; filter on a WITH alias instead. One deep check at the
        # single exit covers every operand branch above (the parser's
        # expression grammar is shared with projection position, where
        # aggregates ARE legal). CASE WHEN conditions inside a projection
        # item set _agg_ok — there the aggregate is over the implicit
        # group, not a per-row filter.
        if not self._agg_ok:
            for cond in out:
                if _contains_agg(cond.left) or _contains_agg(cond.right):
                    raise CypherSyntaxError(
                        "aggregates are not allowed in WHERE; compute the "
                        "aggregate in a WITH stage and filter on its alias"
                    )
        return out

    def _parse_pattern_comp(self) -> PatternComp:
        """Body of a pattern comprehension, after the opening ``[`` (the
        caller's lookahead already saw ``( word )`` + arrow). The far
        endpoint may bind a variable and/or a label; the projection
        ``| expr`` is mandatory (Neo4j grammar)."""
        self.expect("punct", "(")
        var = self.expect("word").text
        self.expect("punct", ")")
        incoming = self.at("arrow", "<-[")
        if incoming:
            self.next()
        else:
            self.expect("arrow", "-[")
        edge_var = None
        if self.at("word"):
            edge_var = self.next().text
        rel_type = None
        if self.at("punct", ":"):
            self.next()
            rel_type = self._parse_rel_type_alts()
        if incoming:
            if not self.at("arrow", "]-"):
                raise CypherSyntaxError(
                    "incoming pattern comprehension must close with ]-"
                )
            self.next()
            direction = "in"
        elif self.at("arrow", "]->"):
            self.next()
            direction = "out"
        elif self.at("arrow", "]-"):
            self.next()
            direction = "undirected"
        else:
            raise CypherSyntaxError(
                "expected ]-> or ]- in the pattern comprehension"
            )
        self.expect("punct", "(")
        dst_var = None
        dst_label = None
        if self.at("word"):
            dst_var = self.next().text
        if self.at("punct", ":"):
            self.next()
            dst_label = self.expect("word").text
        self.expect("punct", ")")
        pred = None
        if self.at("kw", "WHERE"):
            self.next()
            pred = self.parse_where(allow_bare=True)
        if not self.at("punct", "|"):
            raise CypherSyntaxError(
                "pattern comprehension requires a projection: "
                "[(v)-[:T]->(m) | expr]"
            )
        self.next()
        mapped = self.parse_return_expr(allow_bare=True)
        if isinstance(mapped, AggCall):
            raise CypherSyntaxError(
                "aggregates are not allowed inside a pattern comprehension"
            )
        self.expect("punct", "]")
        return PatternComp(
            var, edge_var, rel_type, direction, dst_var, dst_label,
            pred, mapped,
        )

    def parse_pattern_predicate(self, block: bool = False) -> PatternCond:
        """``[NOT] (v)-[:TYPE]->(target)``, ``(v)<-[:TYPE]-(target)``, or
        ``(v)-[:TYPE]-(target)`` where target is ``()`` (any) or
        ``(:Label)`` — Cypher's existential subquery shorthand in all
        three orientations. ``block=True`` (the ``EXISTS { }`` /
        ``COUNT { }`` forms) additionally accepts an edge variable
        ``-[e:T]->``, a far-endpoint variable ``(m[:L])``, and a trailing
        inner ``WHERE`` over those variables."""
        negated = False
        if self._at_word_ci("NOT"):
            self.next()
            negated = True
        self.expect("punct", "(")
        var = self.expect("word").text
        self.expect("punct", ")")
        incoming = self.at("arrow", "<-[")
        if incoming:
            self.next()
        else:
            self.expect("arrow", "-[")
        edge_var = None
        if block and self.at("word"):
            edge_var = self.next().text
        rel_type = None
        if self.at("punct", ":"):
            self.next()
            rel_type = self._parse_rel_type_alts()
        if incoming:
            if not self.at("arrow", "]-"):
                raise CypherSyntaxError(
                    "incoming pattern predicate must close with ]-"
                )
            self.next()
            direction = "in"
        elif self.at("arrow", "]->"):
            self.next()
            direction = "out"
        elif self.at("arrow", "]-"):
            self.next()
            direction = "undirected"
        else:
            raise CypherSyntaxError(
                "expected ]-> or ]- to close the pattern predicate"
            )
        self.expect("punct", "(")
        dst_var = None
        dst_label = None
        if block and self.at("word"):
            dst_var = self.next().text
        if self.at("punct", ":"):
            self.next()
            dst_label = self.expect("word").text
        self.expect("punct", ")")
        pred = None
        if block and self.at("kw", "WHERE"):
            self.next()
            pred = self.parse_where(allow_bare=True)
        return PatternCond(
            var, rel_type, dst_label, negated, direction,
            edge_var=edge_var, dst_var=dst_var, pred=pred,
        )

    def _at_word_ci(self, upper_text: str) -> bool:
        tok = self.peek()
        return tok is not None and tok.kind == "word" and tok.text.upper() == upper_text

    def _at_negative_number(self) -> bool:
        # `n.born-1` lexes "-1" as one NUMBER token (the lexer can't know
        # a binary context); the additive loop re-reads it as minus + 1 so
        # glued subtraction parses exactly like the spaced form.
        tok = self.peek()
        return (
            tok is not None and tok.kind == "number" and tok.text.startswith("-")
        )

    def parse_return_expr(self, allow_bare: bool = False):
        """RETURN/WITH item: additive arithmetic over terms. Aggregates
        may appear alone but never as arithmetic operands."""
        node = self._parse_arith_term(allow_bare)
        while self.at("op", "+") or self.at("op", "-") or self._at_negative_number():
            if self._at_negative_number():
                # split "-1" in place into minus + "1" so the remainder
                # (e.g. the "*2" in "n.a-1*2") parses with normal
                # precedence
                self.toks[self.i] = _Tok("number", self.peek().text[1:])
                op = "-"
            else:
                op = self.next().text
            right = self._parse_arith_term(allow_bare)
            node = self._binop(op, node, right)
        return node

    def _parse_arith_term(self, allow_bare: bool):
        node = self._parse_arith_power(allow_bare)
        while (
            self.at("op", "/") or self.at("op", "%") or self.at("punct", "*")
        ):
            op = self.next().text
            right = self._parse_arith_power(allow_bare)
            node = self._binop(op, node, right)
        return node

    def _parse_arith_power(self, allow_bare: bool):
        # ^ binds tighter than * and is RIGHT-associative (2^3^2 = 512),
        # per Cypher
        node = self._parse_arith_factor(allow_bare)
        if self.at("op", "^"):
            self.next()
            return self._binop("^", node, self._parse_arith_power(allow_bare))
        return node

    @staticmethod
    def _binop(op: str, left, right) -> BinOp:
        # aggregates may appear as operands (``sum(x) / count(*)`` —
        # Neo4j's implicit-grouping composite projection); the projection
        # compiler splits them out (_decompose_agg_expr)
        return BinOp(op, left, right)

    def _parse_arith_factor(self, allow_bare: bool):
        node = self._parse_arith_atom(allow_bare)
        # postfix accessors — chainable and legal on any computed
        # expression: subscripts list[i] / list[from..to], and .field
        # (temporal components on date(x), nested struct fields)
        while (
            self.at("punct", "[")
            and not isinstance(node, (int, float, str, bool))
        ) or (
            self.at("punct", ".")
            and isinstance(node, (FuncCall, FieldAccess, IndexExpr, PropRef))
        ):
            if self.at("punct", "."):
                self.next()
                node = FieldAccess(node, self.expect("word").text)
                continue
            self.next()
            lo = None
            if not (self.at("punct", ".") or self.at("punct", "]")):
                lo = self.parse_return_expr(allow_bare)
            if self.at("punct", "."):
                self.next()
                self.expect("punct", ".")
                hi = None
                if not self.at("punct", "]"):
                    hi = self.parse_return_expr(allow_bare)
                self.expect("punct", "]")
                node = SliceExpr(node, lo, hi)
            else:
                if lo is None:
                    raise CypherSyntaxError("empty [] subscript")
                self.expect("punct", "]")
                node = IndexExpr(node, lo)
        return node

    def _parse_arith_atom(self, allow_bare: bool):
        if self.at("punct", "("):
            self.next()
            node = self.parse_return_expr(allow_bare)
            self.expect("punct", ")")
            return node
        if self.at("punct", "["):
            return self._parse_list_expr(allow_bare)
        if self.at("punct", "{"):
            # literal map {k: expr, ...} in expression position (map
            # PROJECTIONS n {.k} parse after their variable, not here)
            self.next()
            entries: list[tuple[str, Any]] = []
            if not self.at("punct", "}"):
                while True:
                    ktok = self.peek()
                    if ktok is None or ktok.kind not in ("word", "string"):
                        raise CypherSyntaxError(
                            "map literal keys must be identifiers or "
                            "strings"
                        )
                    self.next()
                    key = (
                        ktok.text[1:-1].replace("\\'", "'")
                        if ktok.kind == "string"
                        else ktok.text
                    )
                    self.expect("punct", ":")
                    # a map value MAY aggregate ({n: count(*)}) — the
                    # composite-projection decomposition handles it
                    entries.append((key, self.parse_return_expr(allow_bare)))
                    if self.at("punct", ","):
                        self.next()
                        continue
                    break
            self.expect("punct", "}")
            if len({k for k, _ in entries}) != len(entries):
                raise CypherSyntaxError("duplicate key in map literal")
            return MapLit(tuple(entries))
        tok = self.peek()
        if tok is not None and tok.kind == "number":
            self.next()
            return float(tok.text) if "." in tok.text else int(tok.text)
        if tok is not None and (
            tok.kind == "string"
            or (tok.kind == "punct" and tok.text == "$")
            or (tok.kind == "kw" and tok.text in ("TRUE", "FALSE", "NULL"))
        ):
            return self.parse_value(None)
        return self._parse_primary_expr(allow_bare)

    def _parse_list_expr(self, allow_bare: bool):
        """``[`` in expression position: a pattern comprehension
        ``[(v)-[e:T]->(m) [WHERE pred] | expr]`` (lookahead: ``( word )``
        then an arrow token — unambiguous, arithmetic after ``(v)`` never
        lexes as an arrow), a list comprehension ``[x IN <expr> [WHERE
        pred] [| expr]]`` (lookahead: word IN), or a literal list
        ``[1, 2, 3]`` (homogeneous scalars, as in UNWIND)."""
        self.expect("punct", "[")
        if (
            self.at("punct", "(")
            and self.peek(1) is not None
            and self.peek(1).kind == "word"
            and self.peek(2) is not None
            and self.peek(2).kind == "punct"
            and self.peek(2).text == ")"
            and self.peek(3) is not None
            and self.peek(3).kind == "arrow"
        ):
            return self._parse_pattern_comp()
        if (
            self.at("word")
            and self.peek(1) is not None
            and self.peek(1).kind == "word"
            and self.peek(1).text.upper() == "IN"
        ):
            var = self.next().text
            self.next()  # IN
            # the source MAY aggregate ([x IN collect(y) | x * 2]) — the
            # composite-projection decomposition splits it out
            source = self.parse_return_expr(allow_bare)
            pred = None
            if self.at("kw", "WHERE"):
                self.next()
                pred = self.parse_where(allow_bare=True)
            mapped = None
            if self.at("punct", "|"):
                self.next()
                mapped = self.parse_return_expr(allow_bare=True)
                if isinstance(mapped, AggCall):
                    raise CypherSyntaxError(
                        "aggregates are not allowed inside a comprehension"
                    )
            self.expect("punct", "]")
            return ListComp(var, source, pred, mapped)
        vals: list[Any] = []
        if not self.at("punct", "]"):
            while True:
                vals.append(self.parse_return_expr(allow_bare))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        self.expect("punct", "]")
        if any(
            not (v is None or isinstance(v, (int, float, str, bool)))
            for v in vals
        ):
            # an element is an EXPRESSION (ref, function, arithmetic,
            # possibly an aggregate — [min(x), max(x)] decomposes in the
            # projection): a list constructor, compiled to F.array
            return ListExpr(tuple(vals))
        kinds = {
            "boolean" if isinstance(v, bool)
            else "number" if isinstance(v, (int, float))
            else "string" if isinstance(v, str)
            else type(v).__name__
            for v in vals
            if v is not None
        }
        if len(kinds) > 1:
            raise CypherSyntaxError(
                "list literal must be homogeneous; got mixed "
                + "/".join(sorted(kinds))
            )
        if kinds == {"number"} and any(isinstance(v, float) for v in vals):
            vals = [None if v is None else float(v) for v in vals]
        return vals

    def parse_case(self, allow_bare: bool = False) -> CaseExpr:
        """``CASE [x] WHEN ... THEN ... [ELSE ...] END`` — the generic form
        takes full WHERE predicates; the simple form desugars ``CASE x
        WHEN v`` into ``x = v`` conditions."""
        simple_left = None
        if not self._at_word_ci("WHEN"):
            simple_left = self.parse_prop_ref(allow_bare)
        whens = []
        while self._at_word_ci("WHEN"):
            self.next()
            if simple_left is not None:
                disj = [[Cond(simple_left, "=", self.parse_value(None))]]
            else:
                # a projection-position CASE may test aggregates in its
                # conditions (``CASE WHEN count(*) > 2 THEN …``) — flip
                # the predicate-position rejection for this parse only.
                # If the CASE itself sits in WHERE, the enclosing
                # condition's own deep check still rejects the aggregate.
                saved_agg_ok = self._agg_ok
                self._agg_ok = True
                try:
                    disj = self.parse_where(allow_bare=allow_bare)
                finally:
                    self._agg_ok = saved_agg_ok
            if not self._at_word_ci("THEN"):
                raise CypherSyntaxError("expected THEN after WHEN condition")
            self.next()
            # branch results may aggregate (CASE … THEN count(*) END)
            whens.append((disj, self.parse_return_expr(allow_bare)))
        if not whens:
            raise CypherSyntaxError("CASE requires at least one WHEN branch")
        default = None
        if self._at_word_ci("ELSE"):
            self.next()
            default = self.parse_return_expr(allow_bare)
        if not self._at_word_ci("END"):
            raise CypherSyntaxError("expected END to close CASE")
        self.next()
        return CaseExpr(tuple(whens), default)

    def _parse_primary_expr(
        self, allow_bare: bool = False
    ) -> PropRef | BareRef | AggCall | FuncCall:
        tok = self.peek()
        if tok is not None and tok.kind == "word" and tok.text.upper() == "CASE":
            self.next()
            return self.parse_case(allow_bare)
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text.upper() == "COUNT"
            and self.peek(1) is not None
            and self.peek(1).text == "{"
        ):
            # COUNT { (v)-[:T]->(:L) } — Neo4j 5 count subquery (an
            # optional leading MATCH inside the block is accepted)
            self.next()
            self.expect("punct", "{")
            if self.at("kw", "MATCH"):
                self.next()
            pc = self.parse_pattern_predicate(block=True)
            self.expect("punct", "}")
            if pc.negated:
                raise CypherSyntaxError(
                    "NOT inside COUNT { } is not meaningful; compare the "
                    "count instead"
                )
            return CountPattern(pc)
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text == "exists"
            and self.peek(1) is not None
            and self.peek(1).text == "("
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).text == "."
        ):
            # legacy exists(n.prop) (pre-Neo4j-5 property-presence test)
            # — desugared to the IS NOT NULL expression; the pattern form
            # exists((n)-[:R]->()) stays rejected toward EXISTS { }
            self.next()
            self.expect("punct", "(")
            ref = self.parse_prop_ref(allow_bare)
            self.expect("punct", ")")
            if not isinstance(ref, PropRef) or ref.prop is None:
                raise CypherSyntaxError(
                    "exists() takes a property reference (n.prop)"
                )
            return IsNullExpr(ref, negated=True)
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text.upper() == "EXISTS"
            and self.peek(1) is not None
            and self.peek(1).text == "{"
        ):
            # EXISTS { pattern [WHERE …] } as a boolean EXPRESSION in
            # RETURN/WITH items (Neo4j 5) — desugared to the count
            # subquery's per-node bind compared against zero, so it
            # shares COUNT { }'s one-left-join plan shape
            self.next()
            self.expect("punct", "{")
            if self.at("kw", "MATCH"):
                self.next()
            pc = self.parse_pattern_predicate(block=True)
            self.expect("punct", "}")
            if pc.negated:
                raise CypherSyntaxError(
                    "NOT inside EXISTS { } is not supported in expression "
                    "position; compare with = false instead"
                )
            return BinOp(">", CountPattern(pc), 0)
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text == "reduce"
            and self.peek(1) is not None
            and self.peek(1).text == "("
        ):
            # reduce(acc = init, x IN list | expr) — the Cypher list fold
            self.next()
            self.expect("punct", "(")
            acc = self.expect("word").text
            self.expect("op", "=")
            init = self.parse_return_expr(allow_bare)
            self.expect("punct", ",")
            var = self.expect("word").text
            if not self._at_word_ci("IN"):
                raise CypherSyntaxError("expected IN in reduce()")
            self.next()
            source = self.parse_return_expr(allow_bare)
            self.expect("punct", "|")
            body = self.parse_return_expr(allow_bare=True)
            self.expect("punct", ")")
            # the LIST may aggregate (reduce(s = 0, x IN collect(y) | s + x));
            # init/body run inside the fold lambda, where an aggregate has
            # no group to aggregate over
            for part, what in ((init, "init"), (body, "body")):
                if _contains_agg(part):
                    raise CypherSyntaxError(
                        f"aggregates are not allowed in a reduce() {what}; "
                        "compute them in a WITH stage first"
                    )
            return ReduceExpr(acc, init, var, source, body)
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text.lower() in ("any", "all", "none", "single")
            and self.peek(1) is not None
            and self.peek(1).text == "("
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).kind == "word"
            and self.peek(3).text.upper() == "IN"
        ):
            # any/all/none/single(x IN list WHERE pred) — openCypher's
            # list quantifier predicates. Desugared onto the ListComp
            # machinery (JVM filter lambda, zero Python) as a size()
            # comparison over the filtered list:
            #   any    -> size([x IN L WHERE p]) > 0
            #   none   -> size([x IN L WHERE p]) = 0
            #   single -> size([x IN L WHERE p]) = 1
            #   all    -> size([x IN L WHERE p]) = size(L)
            # A null list nulls size() and the comparison — Neo4j's
            # quantifier-over-null semantics. Element-level three-valued
            # logic diverges deliberately: a null predicate evaluation
            # counts as false (the comprehension WHERE contract), where
            # Neo4j may answer null; the filter-based two-valued read is
            # the documented engine-wide comprehension semantics.
            fn = self.next().text.lower()
            self.expect("punct", "(")
            var = self.expect("word").text
            self.next()  # IN
            source = self.parse_return_expr(allow_bare)
            if not self.at("kw", "WHERE"):
                raise CypherSyntaxError(
                    f"{fn}(x IN list WHERE pred) requires a WHERE clause"
                )
            self.next()
            pred = self.parse_where(allow_bare=True)
            self.expect("punct", ")")
            filtered = FuncCall("size", ListComp(var, source, pred, None))
            if fn == "any":
                return BinOp(">", filtered, 0)
            if fn == "none":
                return BinOp("=", filtered, 0)
            if fn == "single":
                return BinOp("=", filtered, 1)
            return BinOp("=", filtered, FuncCall("size", source))
        # length(p) / nodes(p) / relationships(p) — the path accessors
        # for named-path variables; modeled as PropRef(p, sentinel) so
        # the path-aware colmaps resolve them and every other context
        # rejects the unknown variable. The accessor sentinels are
        # dunder-prefixed so they can never collide with a real property.
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text in ("length", "nodes", "relationships")
            and self.peek(1) is not None
            and self.peek(1).text == "("
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).text == ")"
        ):
            fn = self.next().text
            self.next()
            var = self.next().text
            self.next()
            prop = {
                "length": "length",
                "nodes": "__nodes",
                "relationships": "__rels",
            }[fn]
            return PropRef(var, prop)
        # labels(n) / type(r) — graph-model accessors over a bare pattern
        # variable; rewritten at parse time into refs on the model's
        # label / rel_type columns so the normal colmap machinery resolves
        # them (reference data model: Neo4jFormatTest.java:14-19).
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text in ("labels", "type", "keys", "properties")
            and self.peek(1) is not None
            and self.peek(1).text == "("
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).text == ")"
        ):
            fn = self.next().text
            self.next()  # (
            var = self.next().text
            self.next()  # )
            if fn in ("keys", "properties"):
                # whole-variable accessors: resolved against the clause's
                # var_props annotation (see _scalar_fn_column)
                return FuncCall(fn, PropRef(var, None))
            return FuncCall(
                fn, PropRef(var, "label" if fn == "labels" else "rel_type")
            )
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text == "point"
            and self.peek(1) is not None
            and self.peek(1).text == "."
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).text == "("
        ):
            # point.distance(a, b) / point.withinBBox(p, ll, ur) — the
            # Neo4j 5 spatial function namespace
            sub = self.peek(2).text
            if sub not in ("distance", "withinBBox"):
                raise CypherSyntaxError(
                    f"unknown spatial function point.{sub}"
                )
            self.next(), self.next(), self.next()
            self.expect("punct", "(")
            args = [self._parse_scalar_arg(allow_bare)]
            while self.at("punct", ","):
                self.next()
                args.append(self._parse_scalar_arg(allow_bare))
            self.expect("punct", ")")
            want = 2 if sub == "distance" else 3
            if len(args) != want:
                raise CypherSyntaxError(
                    f"point.{sub}() takes {want} arguments, got {len(args)}"
                )
            return FuncCall(f"point.{sub}", args[0], tuple(args[1:]))
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text == "duration"
            and self.peek(1) is not None
            and self.peek(1).text == "("
            and self.peek(2) is not None
            and self.peek(2).text == "{"
        ):
            # duration({years, months, weeks, days}) — the calendar-
            # duration constructor consumed by date ± duration arithmetic
            self.next()
            self.expect("punct", "(")
            m = self._parse_arith_atom(allow_bare)
            self.expect("punct", ")")
            if not isinstance(m, MapLit):
                raise CypherSyntaxError(
                    "duration() takes a component map, e.g. "
                    "duration({days: 3})"
                )
            return FuncCall("duration", m)
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text == "duration"
            and self.peek(1) is not None
            and self.peek(1).text == "."
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).text == "("
        ):
            # duration.between(a, b) / duration.inDays / duration.inSeconds
            # — the Cypher temporal-difference constructors
            sub = self.peek(2).text
            if sub not in ("between", "inDays", "inSeconds"):
                raise CypherSyntaxError(
                    f"unknown duration function duration.{sub}"
                )
            self.next(), self.next(), self.next()
            self.expect("punct", "(")
            a = self.parse_return_expr(allow_bare)
            self.expect("punct", ",")
            b = self.parse_return_expr(allow_bare)
            self.expect("punct", ")")
            return FuncCall(f"duration.{sub}", a, (b,))
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text in ("date", "datetime")
            and self.peek(1) is not None
            and self.peek(1).text == "."
            and self.peek(2) is not None
            and self.peek(2).kind == "word"
            and self.peek(3) is not None
            and self.peek(3).text == "("
        ):
            # date.truncate('month', d) / datetime.truncate('hour', dt) —
            # Neo4j's calendar-bucketing constructors
            base, sub = tok.text, self.peek(2).text
            if sub != "truncate":
                raise CypherSyntaxError(
                    f"unknown temporal function {base}.{sub}"
                )
            self.next(), self.next(), self.next()
            self.expect("punct", "(")
            unit = self.parse_value(None)
            if not isinstance(unit, str):
                raise CypherSyntaxError(
                    f"{base}.truncate unit must be a string literal"
                )
            self.expect("punct", ",")
            a = self.parse_return_expr(allow_bare)
            self.expect("punct", ")")
            return FuncCall(f"{base}.truncate", a, (unit,))
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text in _FN_ARITY
            and self.peek(1) is not None
            and self.peek(1).text == "("
        ):
            fn = self.next().text
            self.expect("punct", "(")
            lo, hi = _FN_ARITY[fn]
            args = []
            if not self.at("punct", ")"):
                args.append(self._parse_scalar_arg(allow_bare))
                while self.at("punct", ","):
                    self.next()
                    args.append(self._parse_scalar_arg(allow_bare))
            self.expect("punct", ")")
            if len(args) < lo or (hi is not None and len(args) > hi):
                span = str(lo) if hi == lo else f"{lo}..{hi or 'n'}"
                raise CypherSyntaxError(
                    f"{fn}() takes {span} argument(s), got {len(args)}"
                )
            if not args:  # zero-arg constants: pi() / e()
                return FuncCall(fn, None)
            return FuncCall(fn, args[0], tuple(args[1:]))
        if (
            tok is not None
            and tok.kind == "word"
            and tok.text.upper() in _AGG_FNS
            and self.peek(1) is not None
            and self.peek(1).kind == "punct"
            and self.peek(1).text == "("
        ):
            fn = self.next().text.upper()
            self.expect("punct", "(")
            distinct = False
            if self._at_word_ci("DISTINCT"):
                self.next()
                distinct = True
            arg: PropRef | BareRef | None
            if self.at("punct", "*"):
                self.next()
                arg = None
            elif (
                not allow_bare
                and self.at("word")
                and self.peek(1) is not None
                and self.peek(1).text == ")"
            ):
                # count(n) counts NON-NULL bindings of n (distinct from
                # count(*) under OPTIONAL MATCH, where a failed optional
                # pattern null-extends n); count(DISTINCT n) counts
                # distinct matched entities — both over the internal id
                var = self.next().text
                if fn not in ("COUNT", "COLLECT"):
                    raise CypherSyntaxError(
                        f"{fn} over a whole pattern variable is not "
                        "supported; aggregate a property"
                    )
                # count(n): non-null internal-id bindings. collect(n):
                # the SAME full struct RETURN n projects (id + meta +
                # properties) — never the bare engine-internal id list,
                # mirroring Neo4j's collect of node maps.
                arg = WholeVar(var) if fn == "COLLECT" else PropRef(var, None)
            else:
                # the argument is a full expression — ``sum(l.price * (1 -
                # l.disc))`` (TPC-H Q1's shape), ``sum(CASE WHEN … THEN 1
                # ELSE 0 END)`` (conditional counting), ``collect([n.a,
                # n.b])``. Nested aggregates are not a thing (Neo4j
                # rejects them too).
                arg = self.parse_return_expr(allow_bare)
                if _contains_agg(arg):
                    raise CypherSyntaxError(
                        f"aggregates cannot nest inside {fn}()"
                    )
            if arg is None and fn != "COUNT":
                raise CypherSyntaxError(f"{fn} requires a property argument")
            extra: tuple = ()
            if self.at("punct", ","):
                # percentileCont(n.x, 0.5) — the percentile is a literal
                self.next()
                pval = self.parse_value(None)
                if fn not in ("PERCENTILECONT", "PERCENTILEDISC"):
                    raise CypherSyntaxError(
                        f"{fn} takes a single argument"
                    )
                if not isinstance(pval, (int, float)) or isinstance(
                    pval, bool
                ) or not (0 <= pval <= 1):
                    raise CypherSyntaxError(
                        "percentile must be a number in [0, 1]"
                    )
                extra = (pval,)
            if fn in ("PERCENTILECONT", "PERCENTILEDISC") and not extra:
                raise CypherSyntaxError(
                    f"{fn} requires a percentile argument: {fn}(n.x, 0.5)"
                )
            if fn in ("STDEV", "STDEVP", "PERCENTILECONT", "PERCENTILEDISC") and distinct:
                raise CypherSyntaxError(
                    f"DISTINCT is not supported inside {fn}"
                )
            self.expect("punct", ")")
            return AggCall(fn, arg, distinct, extra)
        if (
            tok is not None
            and tok.kind == "word"
            and self.peek(1) is not None
            and self.peek(1).text == "{"
        ):
            # n {.name, .born} / n {.*} — Cypher map projection (literal
            # keys and variable entries are rejected, not mis-parsed)
            var = self.next().text
            self.expect("punct", "{")
            props: list[str] = []
            extras: list[tuple[str, Any]] = []
            while True:
                if self.at("punct", "."):
                    self.next()
                    if self.at("punct", "*"):
                        self.next()
                        props.append("*")
                    else:
                        props.append(self.expect("word").text)
                elif (
                    self.at("word")
                    and self.peek(1) is not None
                    and self.peek(1).text == ":"
                ):
                    # computed entry {key: expr} — Neo4j's map-projection
                    # extras, evaluated in the enclosing scope
                    key = self.next().text
                    self.next()
                    extras.append((key, self.parse_return_expr(allow_bare)))
                else:
                    raise CypherSyntaxError(
                        "map projection entries must be .prop, .*, or "
                        "key: expr"
                    )
                if self.at("punct", ","):
                    self.next()
                    continue
                break
            self.expect("punct", "}")
            if "*" in props and len(props) > 1:
                raise CypherSyntaxError(
                    ".* selects every property; combine it with nothing"
                )
            keys = [k for k, _ in extras]
            if len(set(keys) | set(p for p in props if p != "*")) != len(
                keys
            ) + len([p for p in props if p != "*"]):
                raise CypherSyntaxError("duplicate key in map projection")
            return MapProj(var, tuple(props), tuple(extras))
        if (
            not allow_bare
            and tok is not None
            and tok.kind == "word"
            and (self.peek(1) is None or self.peek(1).text != ".")
        ):
            # RETURN n — the whole pattern variable (in a WITH-scoped row,
            # allow_bare instead resolves bare words as projected aliases)
            return WholeVar(self.next().text)
        return self.parse_prop_ref(allow_bare)

    def parse_return(self, allow_bare: bool = False) -> tuple[bool, list[ReturnItem]]:
        distinct = False
        if self._at_word_ci("DISTINCT"):
            self.next()
            distinct = True
        items: list[ReturnItem] = []
        while True:
            if self.at("punct", "*"):
                # RETURN * — expanded against the clause scope later
                self.next()
                items.append(ReturnItem(Star(), None))
            else:
                expr = self.parse_return_expr(allow_bare)
                if self._at_word_ci("IS"):
                    # expr IS [NOT] NULL as a projected boolean value
                    self.next()
                    neg = False
                    if self._at_word_ci("NOT"):
                        self.next()
                        neg = True
                    self.expect("kw", "NULL")
                    if isinstance(expr, AggCall):
                        raise CypherSyntaxError(
                            "IS NULL over an aggregate is never null; "
                            "test the aliased value in a WITH stage"
                        )
                    expr = IsNullExpr(expr, neg)
                alias = None
                if self.at("kw", "AS"):
                    self.next()
                    alias = self.expect("word").text
                items.append(ReturnItem(expr, alias))
            if self.at("punct", ","):
                self.next()
                continue
            return distinct, items

    def parse_tail(
        self, require_end: bool = True, allow_bare: bool = False
    ) -> tuple[list[tuple], int | None, int | None]:
        """``ORDER BY <name> [ASC|DESC], ... [SKIP n] [LIMIT m]`` — names
        refer to RETURN aliases (or default output names), SKIP/LIMIT in
        openCypher clause order. With ``require_end=False`` (inside a
        ``WITH`` stage) trailing tokens are left for the caller."""
        order: list[tuple] = []
        if self._at_word_ci("ORDER"):
            self.next()
            if not self._at_word_ci("BY"):
                raise CypherSyntaxError("expected BY after ORDER")
            self.next()
            while True:
                # a projected-column alias, or the Cypher
                # sort-by-projected-expression idioms `ORDER BY n.prop` /
                # `ORDER BY count(*)` — an expression that must match a
                # projected item (resolved in _order_columns)
                # full expression parse: alias words, n.prop, aggregates,
                # scalar fns, AND arithmetic (``ORDER BY born - 1``) all
                # come out of the one grammar; a bare word collapses back
                # to the string-alias form _order_columns resolves first
                key: "str | PropRef | AggCall" = self.parse_return_expr(
                    allow_bare=True
                )
                if isinstance(key, BareRef):
                    key = key.name
                if not isinstance(
                    key, (str, PropRef, AggCall, FuncCall, BinOp, CaseExpr)
                ):
                    raise CypherSyntaxError(
                        "ORDER BY key must be a column, expression, or "
                        "aggregate — not a literal"
                    )
                asc = True
                if self._at_word_ci("ASC"):
                    self.next()
                elif self._at_word_ci("DESC"):
                    self.next()
                    asc = False
                order.append((key, asc))
                if self.at("punct", ","):
                    self.next()
                    continue
                break
        def int_or_param(what: str) -> int:
            # SKIP/LIMIT take a literal integer or a $param resolved at
            # parse time (the pagination idiom every client parameterizes)
            if self.at("punct", "$"):
                val = self.parse_value(None)
                if isinstance(val, bool) or not isinstance(val, int):
                    raise CypherSyntaxError(f"{what} must be an integer")
                return val
            tok = self.expect("number")
            if "." in tok.text:
                raise CypherSyntaxError(f"{what} must be an integer")
            return int(tok.text)

        skip = None
        if self._at_word_ci("SKIP"):
            self.next()
            skip = int_or_param("SKIP")
        limit = None
        if self._at_word_ci("LIMIT"):
            self.next()
            limit = int_or_param("LIMIT")
        if require_end and self.peek() is not None:
            raise CypherSyntaxError(f"unexpected token {self.peek().text!r}")
        return order, skip, limit


# -- translation: reads ----------------------------------------------------


#: single-column openCypher scalar functions -> Spark translations.
#: Multi-arg forms (round/left/right/split/substring/replace) and the
#: type-dispatching ones (size/coalesce/graph accessors) live in
#: _scalar_fn_column's body. Casts use try_cast where Cypher returns null
#: on unconvertible input (toInteger('x') is null, never an error —
#: Spark's default ANSI cast would throw). ceil/floor/round return Float
#: in Cypher regardless of input, sign() returns Integer.
_SCALAR_FNS = {
    "toLower": F.lower, "toUpper": F.upper, "trim": F.trim,
    "ltrim": F.ltrim, "rtrim": F.rtrim, "reverse": F.reverse,
    "abs": F.abs, "sqrt": F.sqrt, "exp": F.exp,
    "sign": lambda c: F.signum(c).cast("long"),
    "toInteger": lambda c: c.try_cast("long"),
    "toFloat": lambda c: c.try_cast("double"),
    "toString": lambda c: c.cast("string"),
    "toBoolean": lambda c: c.try_cast("boolean"),
    # Cypher temporal constructors from ISO strings (date('2024-01-15'),
    # datetime('2024-01-15T10:30:00')); unparseable input is null via
    # try_cast, mirroring the other conversion functions. date(datetime)
    # truncates to the calendar date, as in Neo4j.
    "date": lambda c: c.try_cast("date"),
    "datetime": lambda c: c.try_cast("timestamp"),
    "ceil": lambda c: F.ceil(c).cast("double"),
    "floor": lambda c: F.floor(c).cast("double"),
    "head": lambda c: F.try_element_at(c, F.lit(1)),
    "last": lambda c: F.try_element_at(c, F.lit(-1)),
    # Cypher math surface (all FLOAT-returning, like Neo4j): natural log,
    # log10, trig + inverses, degree/radian conversion. rand() is
    # deliberately absent (nondeterminism breaks the engine's
    # reproducible-answer contract); cot/haversin omitted until their
    # division-by-zero edge semantics are pinned against Neo4j.
    "log": F.log, "log10": F.log10, "sin": F.sin, "cos": F.cos,
    "tan": F.tan, "asin": F.asin, "acos": F.acos, "atan": F.atan,
    "degrees": F.degrees, "radians": F.radians,
}


def _scalar_fn_column(call: FuncCall, colmap, df: DataFrame) -> Column:
    """Translate one RETURN/WITH scalar function call against ``df``.

    The frame is needed for two things plain colmaps can't answer:
    missing-property operands (``coalesce(n.nickname, n.name)`` where no
    write ever created ``nickname`` — Neo4j reads null, so the operand
    becomes a null literal rather than an analysis error) and ``size``'s
    type dispatch (list length for arrays, character length for strings,
    per openCypher). Arguments are full expressions (nested calls,
    arithmetic) resolved through _expr_column."""

    def resolve(a) -> Column:
        return _expr_column(a, colmap, df)

    if call.fn == "point":
        # Neo4j's spatial point: a (x, y, crs) struct value. Cartesian
        # {x, y} or geographic {longitude, latitude} (stored as x=lon,
        # y=lat with crs='wgs-84', matching Neo4j's p.x == p.longitude).
        # A struct column — codegen-native, groupable, carryable through
        # WITH like any value; no UDT, no Python.
        if not isinstance(call.arg, MapLit):
            raise CypherSyntaxError(
                "point() takes a map: point({x: …, y: …}) or "
                "point({longitude: …, latitude: …})"
            )
        entries = dict(call.arg.entries)
        keys = set(entries)
        if keys == {"x", "y"}:
            crs, kx, ky = "cartesian", "x", "y"
        elif keys == {"longitude", "latitude"}:
            crs, kx, ky = "wgs-84", "longitude", "latitude"
        else:
            raise CypherSyntaxError(
                "point() map must be exactly {x, y} or "
                "{longitude, latitude}; got {"
                + ", ".join(sorted(keys)) + "}"
            )
        return F.struct(
            resolve(entries[kx]).cast("double").alias("x"),
            resolve(entries[ky]).cast("double").alias("y"),
            F.lit(crs).alias("crs"),
        )
    if call.fn == "point.distance":
        # cartesian: Euclidean; wgs-84: haversine meters on the
        # mean-radius sphere (R=6371000 — the oracle states the SAME
        # formula, so conformance is formula-exact; trig ulp differences
        # vanish under the ROUND discipline). Mixed-CRS distance is null,
        # per Neo4j 5 — the when() chain nulls it for free.
        a, b = resolve(call.arg), resolve(call.extra[0])
        ax, ay, bx, by = a["x"], a["y"], b["x"], b["y"]
        euclid = F.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
        rad = 3.141592653589793 / 180.0
        dlat, dlon = (by - ay) * rad, (bx - ax) * rad
        half_lat, half_lon = F.sin(dlat / 2), F.sin(dlon / 2)
        h = half_lat * half_lat + (
            F.cos(ay * rad) * F.cos(by * rad) * half_lon * half_lon
        )
        hav = 2.0 * 6371000.0 * F.asin(F.sqrt(h))
        return F.when(
            a["crs"] == b["crs"],
            F.when(a["crs"] == F.lit("wgs-84"), hav).otherwise(euclid),
        )
    if call.fn == "point.withinBBox":
        p = resolve(call.arg)
        lo, hi = resolve(call.extra[0]), resolve(call.extra[1])
        return (
            (p["x"] >= lo["x"]) & (p["x"] <= hi["x"])
            & (p["y"] >= lo["y"]) & (p["y"] <= hi["y"])
        )
    if call.fn in ("date", "datetime") and isinstance(call.arg, MapLit):
        # Neo4j's component map constructors: date({year, month, day}) /
        # datetime({year … second}) — year required, month/day default 1,
        # time parts default 0. Compiles to make_date/make_timestamp
        # (session UTC); out-of-range components raise at runtime under
        # ANSI, matching Neo4j's invalid-component error rather than
        # silently nulling.
        comp_order = (
            ("year", "month", "day")
            if call.fn == "date"
            else ("year", "month", "day", "hour", "minute", "second")
        )
        entries = dict(call.arg.entries)
        unknown = set(entries) - set(comp_order)
        if unknown:
            raise CypherSyntaxError(
                f"{call.fn}() map constructor got unsupported "
                f"component(s): {', '.join(sorted(unknown))}"
            )
        if "year" not in entries:
            raise CypherSyntaxError(
                f"{call.fn}() map constructor requires a year component"
            )
        defaults = {"month": 1, "day": 1, "hour": 0, "minute": 0, "second": 0}
        comps = [
            resolve(entries[k]).cast("int")
            if k in entries
            else F.lit(defaults[k])
            for k in comp_order
        ]
        if call.fn == "date":
            return F.make_date(*comps)
        return F.make_timestamp(*comps[:5], comps[5].cast("decimal(16,6)"))

    if call.fn in ("date.truncate", "datetime.truncate"):
        # calendar bucketing; units follow Neo4j's names (week truncates
        # to the ISO Monday on both engines). date.truncate keeps DATE,
        # datetime.truncate keeps TIMESTAMP; sub-day units on a plain
        # date are rejected like the temporal accessors.
        unit = call.extra[0].lower()
        a = resolve(call.arg)
        if call.fn == "date.truncate":
            fmts = {"year": "year", "quarter": "quarter",
                    "month": "month", "week": "week"}
            if unit == "day":
                return a.cast("date")
            if unit not in fmts:
                raise CypherSyntaxError(
                    f"date.truncate does not support unit {unit!r}"
                )
            return F.trunc(a, fmts[unit])
        units = {"year", "quarter", "month", "week", "day", "hour",
                 "minute", "second"}
        if unit not in units:
            raise CypherSyntaxError(
                f"datetime.truncate does not support unit {unit!r}"
            )
        return F.date_trunc(unit, a)

    if call.fn.startswith("duration."):
        # duration.between / duration.inDays / duration.inSeconds — the
        # Cypher temporal-difference constructors, as component structs
        # consumed by .months/.days/.seconds accessors. between() carries
        # Neo4j's calendar semantics (whole months first, then leftover
        # days: Jan 31 → Mar 10 is P1M10D) and is DATE-level — timestamp
        # operands are rejected toward inSeconds rather than silently
        # mis-rounding time-of-day carry.
        a, b = resolve(call.arg), resolve(call.extra[0])
        sub = call.fn.split(".", 1)[1]
        if sub == "inDays":
            return F.struct(
                F.datediff(b, a).cast("long").alias("days"), _DUR_TAG_COL()
            )
        if sub == "inSeconds":
            return F.struct(
                (F.unix_timestamp(b) - F.unix_timestamp(a)).alias("seconds"),
                _DUR_TAG_COL(),
            )
        from pyspark.sql.types import DateType

        for side in (a, b):
            if not isinstance(_datatype_of(side, df), DateType):
                raise CypherSyntaxError(
                    "duration.between supports date operands; use "
                    "duration.inSeconds for datetimes"
                )
        # whole calendar months with Neo4j's contract: the largest m such
        # that a + m months does not pass b (toward-zero for negatives).
        # months_between's /31-day fraction UNDERCOUNTS clamp cases
        # (Jan 30 → Feb 28 is a whole month, 0.935 by fraction) — one
        # conditional add_months probe corrects it exactly.
        m0 = F.months_between(b, a).cast("long")
        months = (
            F.when((m0 >= 0) & (F.add_months(a, m0 + 1) <= b), m0 + 1)
            .when((m0 <= 0) & (F.add_months(a, m0 - 1) >= b), m0 - 1)
            .otherwise(m0)
        )
        days = F.datediff(b, F.add_months(a, months)).cast("long")
        return F.struct(
            months.alias("months"), days.alias("days"), _DUR_TAG_COL()
        )
    if call.fn in ("keys", "properties"):
        # keys(n): the property names present (non-null) on the row, sorted
        # for determinism (Neo4j leaves order unspecified). properties(n):
        # the property map — Spark maps are monomorphic in the value type,
        # so heterogeneous Neo4j property maps are surfaced as a canonical
        # JSON string (sorted fields, nulls omitted — matching keys()).
        ref = call.arg
        var_props = getattr(colmap, "var_props", None)
        structs = getattr(colmap, "structs", {})
        if var_props is not None and ref.var in var_props:
            props = sorted(var_props[ref.var])
        elif ref.var in structs:
            # WITH-carried node/edge struct: its property fields minus
            # the meta columns — same inventory a pattern scope serves
            meta = {"id", "label", EXTRA_LABELS, "src", "dst", "rel_type"}
            props = sorted(f for f in structs[ref.var] if f not in meta)
        else:
            raise CypherSyntaxError(
                f"{call.fn}({ref.var}) is not supported in this clause "
                "position (pattern variable not in scope)"
            )
        cols = [(p, colmap(PropRef(ref.var, p))) for p in props]
        if call.fn == "keys":
            if not cols:
                return F.lit([]).cast("array<string>")
            return F.array_compact(
                F.array(*[F.when(c.isNotNull(), F.lit(p)) for p, c in cols])
            )
        if not cols:
            return F.lit("{}")
        return F.to_json(F.struct(*[c.alias(p) for p, c in cols]))
    if call.fn == "labels":
        # primary + extra-label model (SURVEY §1.1): labels(n) reads the
        # primary label then any SET-added extras, in addition order;
        # array_compact collapses a REMOVEd (null) primary so a fully
        # unlabeled vertex reads Neo4j's []. Graphs that were never
        # label-mutated have no extras column and read the one-element
        # list as before.
        prim = F.array(resolve(call.arg))
        if isinstance(call.arg, PropRef) and _has_extra_labels(df):
            try:
                extra = resolve(PropRef(call.arg.var, EXTRA_LABELS))
                df.select(extra)  # analysis probe: column exists?
            except Exception:
                extra = None
            if extra is not None:
                return F.array_compact(
                    F.concat(
                        prim,
                        F.coalesce(extra, F.array().cast("array<string>")),
                    )
                )
        return F.array_compact(prim)
    if call.fn == "type":
        return resolve(call.arg)
    if call.fn == "coalesce":
        return F.coalesce(*[resolve(a) for a in (call.arg, *call.extra)])
    if call.fn == "size":
        col = resolve(call.arg)
        # analysis-only probe (no job) — computed args (size(split(...)))
        # dispatch on their resolved type, not just plain column names.
        # Inside a comprehension lambda the arg column itself cannot be
        # analyzed against df (lambda variables are scope-local), so the
        # colmap supplies a same-typed probe twin built on real columns.
        probe_map = getattr(colmap, "probe", None)
        probe_col = (
            _expr_column(call.arg, probe_map, df) if probe_map is not None else col
        )
        dtype = (
            df.select(probe_col.alias("__sz")).schema[0].dataType.simpleString()
        )
        return F.size(col) if dtype.startswith("array") else F.length(col)
    if call.fn == "tail":
        # tail(list): everything after the head; tail(null) = null,
        # tail([]) = [] (greatest clamps the negative length; slice of a
        # null list nulls through)
        col = resolve(call.arg)
        return F.slice(
            col, F.lit(2), F.greatest(F.size(col) - 1, F.lit(0))
        )
    if call.fn == "duration":
        # duration({years, months, weeks, days}) → the same (months,
        # days) component struct duration.between yields, normalized at
        # compile time (12·years + months, 7·weeks + days). Time
        # components are rejected loudly: date arithmetic would silently
        # truncate them, and raising beats mis-answering.
        ml = call.arg
        entries = dict(ml.entries)
        bad = sorted(set(entries) - {"years", "months", "weeks", "days"})
        if bad:
            raise CypherSyntaxError(
                f"duration() supports calendar components "
                f"years/months/weeks/days; got {bad}"
            )
        if not entries:
            raise CypherSyntaxError("duration() needs at least one component")

        def comp(key: str) -> Column:
            e = entries.get(key)
            if e is None:
                return F.lit(0).cast("long")
            return _expr_column(e, colmap, df).cast("long")

        return F.struct(
            (comp("years") * 12 + comp("months")).alias("months"),
            (comp("weeks") * 7 + comp("days")).alias("days"),
            _DUR_TAG_COL(),
        )
    if call.fn == "isEmpty":
        # isEmpty(string | list | map) — type-dispatched like size();
        # null input nulls through (Neo4j: isEmpty(null) = null)
        col = resolve(call.arg)
        probe_map = getattr(colmap, "probe", None)
        probe_col = (
            _expr_column(call.arg, probe_map, df) if probe_map is not None else col
        )
        dtype = (
            df.select(probe_col.alias("__ie")).schema[0].dataType.simpleString()
        )
        if dtype.startswith(("array", "map")):
            return F.size(col) == 0
        if dtype == "string":
            return F.length(col) == 0
        if dtype == "void":
            # isEmpty(null) = null (Neo4j) — a literal null has no type
            return F.lit(None).cast("boolean")
        # Neo4j raises a type error on e.g. isEmpty(42); falling through
        # to length() would implicitly cast and silently answer false
        raise CypherSyntaxError(
            f"isEmpty() expects a string, list or map; got {dtype}"
        )
    if call.fn in ("pi", "e"):
        return F.lit(math.pi if call.fn == "pi" else math.e)
    if call.fn == "atan2":
        return F.atan2(
            resolve(call.arg).cast("double"),
            resolve(call.extra[0]).cast("double"),
        )
    if call.fn == "range":
        # Cypher range(lo, hi[, step]): INCLUSIVE bounds, default step 1,
        # empty when the step points away from hi. Compiles to Spark's
        # sequence() guarded by the direction check (sequence raises on a
        # mismatched direction where Cypher returns []); literal step 0
        # is rejected at compile time like Neo4j's runtime error, and a
        # NON-literal step is guarded at runtime (a dynamic zero must
        # raise like Neo4j, not silently return [] — the loud-error
        # contract). A null step still nulls through to [] like before.
        if len(call.extra) > 1 and isinstance(call.extra[1], (int, float)):
            if call.extra[1] == 0:
                raise CypherSyntaxError("range() step must be non-zero")
        args = [resolve(a).cast("long") for a in (call.arg, *call.extra)]
        lo, hi = args[0], args[1]
        step = args[2] if len(args) > 2 else F.lit(1).cast("long")
        if len(args) > 2 and not isinstance(call.extra[1], (int, float)):
            step = F.when(
                step == 0,
                F.assert_true(
                    F.lit(False), F.lit("range() step must be non-zero")
                ).cast("long"),
            ).otherwise(step)
        nonempty = ((step > 0) & (hi >= lo)) | ((step < 0) & (hi <= lo))
        return F.when(nonempty, F.sequence(lo, hi, step)).otherwise(
            F.lit([]).cast("array<bigint>")
        )
    args = [resolve(a) for a in (call.arg, *call.extra)]
    if call.fn == "round":
        if len(args) == 1:
            return F.round(args[0], 0).cast("double")
        if not isinstance(call.extra[0], int):
            raise CypherSyntaxError(
                "round() precision must be an integer literal"
            )
        return F.round(args[0], call.extra[0]).cast("double")
    if call.fn == "left":
        return F.left(args[0], args[1])
    if call.fn == "right":
        return F.right(args[0], args[1])
    if call.fn == "split":
        # Cypher splits on a LITERAL delimiter; Spark's split takes a
        # regex, so the literal is escaped (non-literal delimiters would
        # need runtime escaping — rejected, not mis-answered)
        if not isinstance(call.extra[0], str):
            raise CypherSyntaxError(
                "split() delimiter must be a string literal"
            )
        return F.split(args[0], re.escape(call.extra[0]))
    if call.fn == "substring":
        # Cypher substring(s, start[, length]) is 0-based; Spark is 1-based
        length = args[2] if len(args) > 2 else F.length(args[0])
        return F.substring(args[0], args[1] + 1, length)
    if call.fn == "replace":
        return F.replace(args[0], args[1], args[2])
    return _SCALAR_FNS[call.fn](args[0])


def _is_integral(expr, colmap, df: DataFrame) -> bool:
    """Conservative static typing for Cypher's integer-division rule:
    True only when the operand is provably integer-typed."""
    if isinstance(expr, bool):
        return False
    if isinstance(expr, int):
        return True
    if isinstance(expr, BinOp):
        return _is_integral(expr.left, colmap, df) and _is_integral(
            expr.right, colmap, df
        )
    if isinstance(expr, FuncCall):
        if expr.fn in ("size", "toInteger", "sign"):
            return True  # integer-valued by definition
        if expr.fn == "abs":
            return _is_integral(expr.arg, colmap, df)
        if expr.fn == "coalesce":
            # integral iff every operand is (Cypher's integer-division
            # rule must survive the canonical coalesce-default pattern)
            return all(
                _is_integral(a, colmap, df)
                for a in (expr.arg, *expr.extra)
            )
        return False
    if isinstance(expr, (PropRef, BareRef)):
        name = _plain_name(colmap(expr))
        dtype = dict(df.dtypes).get(name) if name else None
        return dtype in ("tinyint", "smallint", "int", "bigint")
    return False


def _datatype_of(col: Column, df: DataFrame):
    """Spark DataType of ``col`` against ``df`` via a driver-side analysis
    of a one-column projection (resolves the expression tree, executes
    nothing). None when the Column cannot be analyzed against this frame
    (e.g. a higher-order-function lambda argument)."""
    try:
        return df.select(col).schema[0].dataType
    except Exception:
        return None


def _dtype_of(col: Column, df: DataFrame) -> str | None:
    """Spark dtype string of ``col`` against ``df``: plain-name lookup when
    the Column is a bare reference, else an analysis probe."""
    name = _plain_name(col)
    if name is not None:
        dtype = dict(df.dtypes).get(name)
        if dtype is not None:
            return dtype
    dt = _datatype_of(col, df)
    return dt.simpleString() if dt is not None else None


#: scalar functions whose result type is known statically — enough for
#: `+`'s concat-vs-arithmetic dispatch without analyzing the frame
_STRING_FNS = frozenset({
    "toLower", "toUpper", "trim", "ltrim", "rtrim", "toString", "left",
    "right", "substring", "replace", "type",
})
_ARRAY_FNS = frozenset({"split", "range", "keys", "labels"})
_NUMERIC_FNS = frozenset({
    "toInteger", "toFloat", "abs", "sign", "sqrt", "exp", "ceil", "floor",
    "round", "size", "length", "id",
})


def _operand_kind(expr, colmap, df: DataFrame) -> str | None:
    """Coarse static type of a ``+`` operand — "string" / "array" /
    "numeric" / "other" / None (unknown). Drives Cypher's overloaded
    ``+``: concatenation when either side is a string or a list,
    arithmetic otherwise. Conservative: unknown falls through to
    arithmetic, where a genuinely mis-typed operand still fails loudly in
    Spark's analyzer."""
    if isinstance(expr, bool):
        return "other"
    if isinstance(expr, (int, float)):
        return "numeric"
    if isinstance(expr, str):
        return "string"
    if isinstance(expr, list):
        return "array"
    if isinstance(expr, (ListComp, SliceExpr, ListExpr)):
        return "array"
    if isinstance(expr, BinOp):
        if expr.op == "+":
            return _operand_kind(expr.left, colmap, df) or _operand_kind(
                expr.right, colmap, df
            )
        return "numeric"
    if isinstance(expr, FuncCall):
        if expr.fn in _STRING_FNS:
            return "string"
        if expr.fn in _ARRAY_FNS:
            return "array"
        if expr.fn in _NUMERIC_FNS:
            return "numeric"
        if expr.fn in ("coalesce", "head", "last", "reverse"):
            for a in (expr.arg, *getattr(expr, "extra", ())):
                k = _operand_kind(a, colmap, df)
                if k is not None:
                    # head/last yield an ELEMENT of their list operand —
                    # kind unknowable without element types; only pass
                    # through non-array kinds (reverse preserves its kind)
                    if expr.fn in ("head", "last") and k == "array":
                        return None
                    return k
            return None
        return None
    if isinstance(expr, (PropRef, BareRef)):
        try:
            probe = getattr(colmap, "probe", colmap)
            col = probe(expr)
        except Exception:
            return None
        dtype = _dtype_of(col, df)
        if dtype is None:
            return None
        if dtype == "string":
            return "string"
        if dtype.startswith("array"):
            return "array"
        if dtype in ("tinyint", "smallint", "int", "bigint", "float",
                     "double") or dtype.startswith("decimal"):
            return "numeric"
        return "other"
    return None


def _lambda_colmap(outer, bindings: dict, probes: dict):
    """colmap for a higher-order-function lambda body: ``bindings`` maps
    lambda variable names to their (scope-local, unanalyzable) argument
    Columns, ``probes`` to df-resolvable same-typed twins used only for
    size()'s type dispatch. Everything else falls through to the
    enclosing scope's colmap (Cypher closure semantics)."""

    def _name(ref):
        if isinstance(ref, BareRef):
            return ref.name
        if isinstance(ref, PropRef):
            return ref.var
        return None

    def sub(ref):
        name = _name(ref)
        if name in bindings:
            if isinstance(ref, PropRef) and ref.prop is not None:
                raise CypherSyntaxError(
                    f"lambda variable {name!r} is a scalar; it has no "
                    f"property {ref.prop!r}"
                )
            return bindings[name]
        return outer(ref)

    def probe(ref):
        name = _name(ref)
        if name in probes and not (
            isinstance(ref, PropRef) and ref.prop is not None
        ):
            return probes[name]
        return outer(ref)

    probe.lambda_vars = tuple(bindings)
    sub.probe = probe
    sub.lambda_vars = tuple(bindings)
    return sub


#: sentinel field every compiler-produced duration struct carries —
#: ``_dur_fields`` requires it, so a user map literal / map projection that
#: happens to spell {days: 2} can never duck-type into duration arithmetic
#: (Neo4j raises a type error for plain maps; inferring from the field
#: names alone silently field-wise-summed them).
DUR_TAG = "__dur"


def _DUR_TAG_COL() -> Column:
    return F.lit(True).alias(DUR_TAG)


def _dur_fields(dtype: str | None) -> set[str] | None:
    """Component field set when ``dtype`` is a compiler-produced duration
    struct (flat, tagged with ``DUR_TAG``, components ⊆ {months, days,
    seconds}), else None. Point structs (x, y, crs) and user maps never
    qualify — only the duration()/duration.* constructors and duration
    sums emit the tag."""
    if dtype is None:
        return None
    mo = re.fullmatch(r"struct<([^<>]*)>", dtype)
    if mo is None:
        return None
    fields = {f.split(":", 1)[0] for f in mo.group(1).split(",") if f}
    comps = fields - {DUR_TAG}
    if DUR_TAG in fields and comps and comps <= {"months", "days", "seconds"}:
        return comps
    return None


def _duration_binop(
    expr: "BinOp", left: Column, right: Column, df: DataFrame
) -> Column | None:
    """``date ± duration`` / ``duration + date`` / ``duration ± duration``
    — Cypher temporal arithmetic over the (months, days) component
    structs duration()/duration.between produce. Calendar components
    apply as add_months + date_add (exactly Neo4j's order: months first,
    then days). Seconds-bearing durations and timestamp operands raise
    typed errors rather than silently truncating. Returns None when
    neither operand is a duration (normal arithmetic proceeds)."""
    ld, rd = _dtype_of(left, df), _dtype_of(right, df)
    lf, rf = _dur_fields(ld), _dur_fields(rd)
    if lf is None and rf is None:
        return None
    if lf is not None and rf is not None:
        if expr.op == "-" or lf != rf:
            raise CypherSyntaxError(
                "duration difference/mixed-component arithmetic is not "
                "supported; normalize components first"
            )
        return F.struct(
            *(
                (left[f] + right[f]).alias(f)
                for f in ("months", "days", "seconds")
                if f in lf
            ),
            _DUR_TAG_COL(),
        )
    # exactly one side is a duration: orient date on the left
    dcol, durcol, durf, dkind = (
        (left, right, rf, ld) if rf is not None else (right, left, lf, rd)
    )
    if rf is None and expr.op == "-":
        raise CypherSyntaxError("duration - date is not defined")
    if "seconds" in durf or dkind != "date":
        raise CypherSyntaxError(
            "temporal arithmetic supports date ± duration with calendar "
            "components (months/days); seconds-durations and timestamp "
            "operands are not supported"
        )
    months = durcol["months"] if "months" in durf else F.lit(0)
    days = durcol["days"] if "days" in durf else F.lit(0)
    if expr.op == "-":
        months, days = -months, -days
    return F.date_add(F.add_months(dcol, months), days.cast("int"))


def _expr_column(expr, colmap, df: DataFrame) -> Column:
    """RETURN/WITH expression → Column: refs, literals, scalar functions,
    and arithmetic. openCypher's integer division truncates (``1 / 2 = 0``)
    — applied when BOTH operands are provably integer-typed (Spark's ``/``
    is always float); the toward-zero LongType cast matches Java/Neo4j
    truncation for either sign."""
    if isinstance(expr, BinOp):
        left = _expr_column(expr.left, colmap, df)
        right = _expr_column(expr.right, colmap, df)
        if expr.op in ("+", "-") and df is not None:
            dur = _duration_binop(expr, left, right, df)
            if dur is not None:
                return dur
        kl = _operand_kind(expr.left, colmap, df)
        kr = _operand_kind(expr.right, colmap, df)
        if "string" in (kl, kr) or "array" in (kl, kr):
            if expr.op != "+":
                # Cypher defines only + on strings/lists; -,*,/,% on them
                # is a type error in Neo4j — raise OUR error, not Spark's
                raise CypherSyntaxError(
                    f"operator {expr.op!r} is not defined on "
                    "string or list operands"
                )
            if "array" in (kl, kr):
                # list + list concatenates; list + element appends,
                # element + list prepends (Neo4j's list +)
                if kl == "array" and kr == "array":
                    return F.concat(left, right)
                if kl == "array":
                    return F.concat(left, F.array(right))
                return F.concat(F.array(left), right)
            # string concatenation; a non-string side is stringified
            # (Neo4j: 'a' + 1 = 'a1', 1.5 + 'a' = '1.5a')
            return F.concat(
                left if kl == "string" else left.cast("string"),
                right if kr == "string" else right.cast("string"),
            )
        if expr.op == "+":
            return left + right
        if expr.op == "-":
            return left - right
        if expr.op == "*":
            return left * right
        if expr.op == "%":
            return left % right
        if expr.op == "^":
            # Cypher exponentiation always yields a FLOAT (2^2 = 4.0)
            return F.pow(left, right)
        if expr.op in (">", ">=", "<", "<=", "=", "<>"):
            # comparison in expression position (today only the EXISTS {}
            # boolean-expression desugar produces these) — a boolean column
            return {
                ">": left > right, ">=": left >= right,
                "<": left < right, "<=": left <= right,
                "=": left == right, "<>": left != right,
            }[expr.op]
        if _is_integral(expr.left, colmap, df) and _is_integral(
            expr.right, colmap, df
        ):
            return (left / right).cast("long")
        return left / right
    if isinstance(expr, WholeVar):
        var_props = getattr(colmap, "var_props", None)
        if var_props is None or expr.var not in var_props:
            raise CypherSyntaxError(
                f"whole-variable item {expr.var!r} is not supported in "
                "this clause position (pattern variable not in scope)"
            )
        kind = getattr(colmap, "var_kinds", {}).get(expr.var, "node")
        meta = ["label"] if kind == "node" else ["src", "dst", "rel_type"]
        fields = [colmap(PropRef(expr.var, None)).alias("id")]
        fields += [colmap(PropRef(expr.var, m)).alias(m) for m in meta]
        if kind == "node" and df is not None and _has_extra_labels(df):
            # carry the extra-label set so labels(n) stays correct after
            # the WITH horizon (multi-label model); absent on graphs that
            # were never label-mutated
            try:
                xc = colmap(PropRef(expr.var, EXTRA_LABELS))
                df.select(xc)  # analysis probe: column exists?
                fields.append(xc.alias(EXTRA_LABELS))
            except Exception:
                pass
        fields += [
            colmap(PropRef(expr.var, p)).alias(p)
            for p in sorted(var_props[expr.var])
        ]
        # a failed OPTIONAL binding is a NULL variable, not a struct of
        # nulls (Neo4j); a bound node/edge id is never null, so gating
        # on it is exact and free for non-optional scopes
        return F.when(
            colmap(PropRef(expr.var, None)).isNotNull(), F.struct(*fields)
        )
    if isinstance(expr, FieldAccess):
        from pyspark.sql.types import DateType, StructType, TimestampType

        base = _expr_column(expr.base, colmap, df)
        dt = _datatype_of(base, df)
        if isinstance(dt, StructType):
            if expr.name in dt.names:
                return base.getField(expr.name)
            if "crs" in dt.names and expr.name in ("longitude", "latitude"):
                # spatial point accessors: p.longitude == p.x, p.latitude
                # == p.y (Neo4j aliasing on geographic points)
                return base.getField(
                    "x" if expr.name == "longitude" else "y"
                )
            return F.lit(None)  # map-access-on-missing-key reads null
        if expr.name in _TEMPORAL_ACCESSORS and dt is not None:
            is_ts = isinstance(dt, TimestampType) or dt.typeName().startswith(
                "timestamp"
            )
            if is_ts or isinstance(dt, DateType):
                if isinstance(dt, DateType) and expr.name not in _DATE_PARTS:
                    raise CypherSyntaxError(
                        f"{expr.name!r} is a time component; the operand "
                        "is a date (no time of day)"
                    )
                return _TEMPORAL_ACCESSORS[expr.name](base)
        raise CypherSyntaxError(
            f".{expr.name} is not an accessor of this expression's type"
            + (f" ({dt.simpleString()})" if dt is not None else "")
        )
    if isinstance(expr, ListExpr):
        return F.array(*[_expr_column(e, colmap, df) for e in expr.items])
    if isinstance(expr, MapProj):
        var_props = getattr(colmap, "var_props", None)
        structs = getattr(colmap, "structs", {})
        if var_props is not None and expr.var in var_props:
            avail = sorted(var_props[expr.var])
        elif expr.var in structs:
            meta = {"id", "label", EXTRA_LABELS, "src", "dst", "rel_type"}
            avail = [f for f in structs[expr.var] if f not in meta]
        else:
            raise CypherSyntaxError(
                f"map projection over unknown variable {expr.var!r}"
            )
        props = avail if expr.props == ("*",) else list(expr.props)
        if not props and not expr.extras:
            raise CypherSyntaxError(
                f"map projection over {expr.var!r} selects no properties"
            )
        fields = [
            _resolve_ref(PropRef(expr.var, p), colmap, df).alias(p)
            for p in props
        ]
        fields += [
            _expr_column(e, colmap, df).alias(k) for k, e in expr.extras
        ]
        return F.struct(*fields)
    if isinstance(expr, CaseExpr):
        col: Column | None = None
        have = set(df.columns)
        for disj, res in expr.whens:
            pred = _where_to_column(disj, colmap, have, df)
            rescol = _expr_column(res, colmap, df)
            col = F.when(pred, rescol) if col is None else col.when(pred, rescol)
        if expr.default is not None:
            col = col.otherwise(_expr_column(expr.default, colmap, df))
        return col
    if isinstance(expr, IsNullExpr):
        col = _expr_column(expr.arg, colmap, df)
        return col.isNotNull() if expr.negated else col.isNull()
    if isinstance(expr, ListComp):
        # [x IN src WHERE pred | mapped] → filter/transform higher-order
        # functions: the lambdas run inside codegen'd JVM expressions (no
        # Python, no explode/re-group shuffle). Loop-variable references
        # resolve to the lambda argument; everything else falls through to
        # the enclosing scope's colmap, so outer columns are usable inside
        # the comprehension (Cypher closure semantics).
        src = _expr_column(expr.source, colmap, df)
        # Cypher: a comprehension over a null (or missing-property) list
        # is null — an UNTYPED null source can't even type the lambda,
        # so short-circuit it instead of failing analysis
        if _dtype_of(src, df) == "void":
            return F.lit(None)
        probe_elem = F.try_element_at(src, F.lit(1))
        sub_of = lambda c: _lambda_colmap(  # noqa: E731
            colmap, {expr.var: c}, {expr.var: probe_elem}
        )
        out = src
        if expr.pred is not None:
            out = F.filter(
                out,
                lambda c: F.coalesce(
                    _where_to_column(expr.pred, sub_of(c), None, df),
                    F.lit(False),
                ),
            )
        if expr.expr is not None:
            out = F.transform(
                out, lambda c: _expr_column(expr.expr, sub_of(c), df)
            )
        return out
    if isinstance(expr, ReduceExpr):
        # reduce(acc = init, x IN src | body) → Spark aggregate(): one
        # JVM fold, no Python. The merge lambda's type probes: the init
        # expression stands in for the accumulator, the source's first
        # element for the loop variable. Spark requires the body's type
        # to equal the accumulator's; Cypher coerces int↔float — a probe
        # twin detects the numeric-widening case and casts the narrow
        # side to double (``reduce(acc = 0, x IN … | acc + x ^ 2)``),
        # and any other mismatch raises OUR typed error instead of a raw
        # analysis exception.
        src = _expr_column(expr.source, colmap, df)
        init = _expr_column(expr.init, colmap, df)
        probe_elem = F.try_element_at(src, F.lit(1))

        def merge(acc, x, init=None):
            sub = _lambda_colmap(
                colmap,
                {expr.acc: acc, expr.var: x},
                {expr.acc: init, expr.var: probe_elem},
            )
            return _expr_column(expr.expr, sub, df)

        ints = {"tinyint", "smallint", "int", "bigint"}
        widen_body = False
        widen_body_int = False
        try:
            init_t = (
                df.select(init.alias("__t")).schema[0].dataType.simpleString()
            )
            body_t = (
                df.select(merge(init, probe_elem, init=init).alias("__t"))
                .schema[0]
                .dataType.simpleString()
            )
        except Exception:
            init_t = body_t = None
        if init_t is not None and body_t is not None and init_t != body_t:
            if init_t in ints and body_t == "double":
                init = init.cast("double")
            elif init_t == "double" and body_t in ints:
                widen_body = True
            elif init_t in ints and body_t in ints:
                # integer-width mismatch (``reduce(s = 0, x IN <bigint
                # list> | s + x)`` — the literal 0 types int, the body
                # bigint): widen both sides, Cypher integers are 64-bit
                init = init.cast("bigint")
                widen_body_int = True
            else:
                raise CypherSyntaxError(
                    f"reduce() body type {body_t} does not match the "
                    f"accumulator's {init_t}; make the init and body the "
                    "same type"
                )

        def merge2(acc, x):
            out = merge(acc, x, init=init)
            if widen_body:
                return out.cast("double")
            if widen_body_int:
                return out.cast("bigint")
            return out

        return F.aggregate(src, init, merge2)
    if isinstance(expr, IndexExpr):
        # list[i]: 0-based, negative-from-end, null when out of range —
        # try_element_at is 1-based with native negative support
        src = _expr_column(expr.base, colmap, df)
        if isinstance(expr.index, int):
            i = expr.index
            return F.try_element_at(src, F.lit(i + 1 if i >= 0 else i))
        idx = _expr_column(expr.index, colmap, df).cast("int")
        return F.when(
            idx >= 0, F.try_element_at(src, idx + F.lit(1))
        ).otherwise(F.try_element_at(src, idx))
    if isinstance(expr, SliceExpr):
        # list[from..to]: half-open, 0-based, negative-from-end, clamped
        # to the list bounds (Neo4j's contract) — pure column arithmetic
        # over size(), one JVM slice()
        src = _expr_column(expr.base, colmap, df)
        size = F.size(src)

        def norm(bound, default):
            if bound is None:
                return default
            b = _expr_column(bound, colmap, df).cast("int")
            b = F.when(b >= 0, b).otherwise(size + b)
            return F.greatest(F.lit(0), F.least(size, b))

        lo = norm(expr.lo, F.lit(0))
        hi = norm(expr.hi, size)
        return F.slice(src, lo + F.lit(1), F.greatest(F.lit(0), hi - lo))
    if isinstance(expr, RawCol):
        return F.col(expr.name)
    if isinstance(expr, MapLit):
        if not expr.entries:
            raise CypherSyntaxError(
                "empty map literals are not supported; give the map at "
                "least one key"
            )
        return F.struct(
            *[
                _expr_column(v, colmap, df).alias(k)
                for k, v in expr.entries
            ]
        )
    if isinstance(expr, AggCall):
        # safety net: an aggregate that escaped both the parser's
        # predicate-position rejection and the projection decomposition
        # must never compile silently
        raise CypherSyntaxError(
            "aggregates are not valid in this clause position; compute "
            "the aggregate in a WITH stage first"
        )
    if isinstance(expr, CountPattern):
        raise CypherSyntaxError(
            "COUNT { } subqueries are only supported in RETURN/WITH "
            "items and WHERE over a MATCHed or WITH-carried node"
        )
    if isinstance(expr, PatternComp):
        raise CypherSyntaxError(
            "pattern comprehensions are only supported in RETURN/WITH "
            "items and WHERE over a MATCHed or WITH-carried node; "
            "compute the list in a WITH stage first"
        )
    if isinstance(expr, FuncCall):
        return _scalar_fn_column(expr, colmap, df)
    if isinstance(expr, (PropRef, BareRef)):
        # same missing-property-reads-null contract as WHERE and the
        # scalar-function operands: `RETURN n.nickname` on a property no
        # write ever created is a null column, not an analysis error
        return _resolve_ref(expr, colmap, df)
    return F.lit(expr)


def _order_columns(
    order: list[tuple],
    items: list[ReturnItem],
    clause: str,
    df: DataFrame | None = None,
) -> list[Column]:
    """Resolve ORDER BY keys against a projection: a string key is a
    projected alias/default name; a PropRef/AggCall key (``ORDER BY
    n.prop`` / ``ORDER BY count(*)``) must equal a projected item's
    expression and sorts by that item's output column (Neo4j's
    sort-by-projected-expression idiom). A scalar-function key (``ORDER
    BY toLower(name)``) sorts by its projected twin when one exists, else
    computes the expression over the projected frame's output names."""
    names = {_out_name(i) for i in items}
    cols: list[Column] = []
    for key, asc in order:
        if isinstance(key, (FuncCall, BinOp, CaseExpr)):
            match = next((i for i in items if i.expr == key), None)
            if match is not None:
                cols.append(_order_dir(F.col(_out_name(match)), asc))
                continue
            if df is None:
                raise CypherSyntaxError(
                    f"computed ORDER BY keys are not supported in this "
                    f"{clause} position"
                )
            col = _expr_column(
                key, _bare_colmap(names, _struct_outputs(df), df), df
            )
            cols.append(_order_dir(col, asc))
            continue
        if isinstance(key, (PropRef, AggCall)):
            match = next((i for i in items if i.expr == key), None)
            if match is None and isinstance(key, PropRef) and df is not None:
                # ORDER BY n.prop where the projection carries the WHOLE
                # variable (``WITH n ORDER BY n.born``) — sorts by the
                # struct field; a field no write ever created sorts as
                # null (Cypher's missing-property contract)
                base = next(
                    (
                        i
                        for i in items
                        if (
                            isinstance(i.expr, (WholeVar, MapProj))
                            and i.expr.var == key.var
                        )
                        or _out_name(i) == key.var
                    ),
                    None,
                )
                if base is not None:
                    fields = _struct_outputs(df).get(_out_name(base))
                    if fields is not None:
                        if key.prop not in fields and isinstance(
                            base.expr, MapProj
                        ):
                            # a map projection DROPPED the sort property —
                            # sorting by null here would silently diverge
                            # from Neo4j (which still sees the variable)
                            raise CypherSyntaxError(
                                f"ORDER BY {key.var}.{key.prop}: add "
                                f".{key.prop} to the map projection (the "
                                "projected map does not carry it)"
                            )
                        col = (
                            F.col(_out_name(base)).getField(key.prop)
                            if key.prop in fields
                            else F.lit(None)
                        )
                        cols.append(_order_dir(col, asc))
                        continue
            if match is None:
                desc = (
                    f"{key.var}.{key.prop}"
                    if isinstance(key, PropRef)
                    else f"{key.fn.lower()}(...)"
                )
                raise CypherSyntaxError(
                    f"ORDER BY {desc} must reference a {clause} column"
                )
            name = _out_name(match)
        else:
            if key not in names:
                raise CypherSyntaxError(
                    f"ORDER BY {key!r} must reference a {clause} column"
                )
            name = key
        cols.append(_order_dir(F.col(name), asc))
    return cols


def _order_dir(col: Column, asc: bool) -> Column:
    """Cypher ORDER BY direction: null sorts as the LARGEST value (asc →
    nulls last, desc → nulls first) — Neo4j's contract; Spark's bare
    asc()/desc() default the other way around."""
    return col.asc_nulls_last() if asc else col.desc_nulls_first()


def _order_specs(order: list[tuple], items: list[ReturnItem]) -> list[tuple]:
    """Rewrite a WITH stage's ORDER BY keys into specs resolvable AGAINST
    THE STAGE'S OUTPUT scope — the row-order metadata a later ``collect()``
    consumes (Neo4j: collect after ``WITH ... ORDER BY`` observes the
    sorted row order; Spark's groupBy does not, so collect must re-sort by
    these keys). A key matching a projected item becomes that item's
    output name; ``ORDER BY n.prop`` over a carried whole variable becomes
    a struct-field ref; computed keys already read output names."""
    specs: list[tuple] = []
    for key, asc in order:
        if isinstance(key, str):
            specs.append((BareRef(key), asc))
            continue
        match = next((i for i in items if i.expr == key), None)
        if match is not None:
            specs.append((BareRef(_out_name(match)), asc))
            continue
        if isinstance(key, PropRef):
            base = next(
                (
                    i
                    for i in items
                    if (
                        isinstance(i.expr, (WholeVar, MapProj))
                        and i.expr.var == key.var
                    )
                    or _out_name(i) == key.var
                ),
                None,
            )
            if base is not None:
                specs.append((PropRef(_out_name(base), key.prop), asc))
                continue
        specs.append((key, asc))
    return specs


def _specs_columns(specs: list[tuple], colmap, df: DataFrame) -> list[Column]:
    """Materialize row-order specs as sort Columns against the current
    scope — the physical form of a deferred WITH ... ORDER BY."""
    return [
        _order_dir(_expr_column(ast, colmap, df), asc) for ast, asc in specs
    ]


def _remap_specs(
    specs: list[tuple], items: list[ReturnItem]
) -> list[tuple] | None:
    """Carry row-order metadata across a plain (non-aggregating,
    non-DISTINCT) WITH projection: each key must survive into the new
    scope — as a projected item (renamed to its output name) or as a
    property of a carried struct. Any key falling out of scope drops the
    metadata entirely (order no longer provable — collect falls back to
    the sorted-by-value determinism contract, never a silent wrong
    order)."""
    out: list[tuple] = []
    for ast, asc in specs:
        match = next((i for i in items if i.expr == ast), None)
        if match is not None:
            out.append((BareRef(_out_name(match)), asc))
            continue
        if isinstance(ast, PropRef):
            base = next(
                (
                    i
                    for i in items
                    if isinstance(i.expr, BareRef) and i.expr.name == ast.var
                ),
                None,
            )
            if base is not None:
                out.append((PropRef(_out_name(base), ast.prop), asc))
                continue
        return None
    return out


def _default_name(ref: PropRef | BareRef | AggCall | FuncCall) -> str:
    if isinstance(ref, BinOp):
        raise CypherSyntaxError(
            "an arithmetic RETURN/WITH item needs an AS alias"
        )
    if isinstance(ref, CaseExpr):
        raise CypherSyntaxError("a CASE RETURN/WITH item needs an AS alias")
    if isinstance(ref, (WholeVar, MapProj)):
        return ref.var
    if not isinstance(ref, (PropRef, BareRef, AggCall, FuncCall)):
        raise CypherSyntaxError("a literal RETURN/WITH item needs an AS alias")
    if isinstance(ref, FuncCall):
        if not isinstance(ref.arg, (PropRef, BareRef, AggCall, FuncCall)):
            return ref.fn  # literal first operand (e.g. coalesce('x', ...))
        return f"{ref.fn}_{_default_name(ref.arg)}"
    if isinstance(ref, AggCall):
        if ref.arg is None:
            return "count"
        if isinstance(ref.arg, BareRef):
            return f"{ref.fn.lower()}_{ref.arg.name}"
        if isinstance(ref.arg, WholeVar):
            return f"{ref.fn.lower()}_{ref.arg.var}"
        if not isinstance(ref.arg, PropRef):
            # sum(<computed expression>) has no derivable column name
            raise CypherSyntaxError(
                f"{ref.fn.lower()}() over a computed expression needs "
                "an AS alias"
            )
        return f"{ref.fn.lower()}_{ref.arg.var}_{ref.arg.prop or 'id'}"
    if isinstance(ref, BareRef):
        return ref.name
    return f"id_{ref.var}" if ref.prop is None else f"{ref.var}_{ref.prop}"


# collect() materializes the group's values as a list. openCypher leaves
# element order unspecified; emitting it SORTED makes the result a value
# (layout-independent) rather than an accident of partition order — the
# same determinism contract the rest of the engine keeps.
_AGG_FN_MAP = {
    "COUNT": F.count,
    "SUM": F.sum,
    "AVG": F.avg,
    "MIN": F.min,
    "MAX": F.max,
    "COLLECT": lambda c: F.array_sort(F.collect_list(c)),
    # Neo4j stdev() is the sample form, stdevp() the population form
    "STDEV": F.stddev_samp,
    "STDEVP": F.stddev_pop,
}

#: DISTINCT inside an aggregate (count(DISTINCT x), collect(DISTINCT x),
#: ...). AVG has no *_distinct builtin: exact sum_distinct/count_distinct
#: quotient. MIN/MAX are distinct-invariant. collect_set + array_sort keeps
#: the sorted-list determinism contract.
_AGG_FN_DISTINCT_MAP = {
    "COUNT": F.count_distinct,
    "SUM": F.sum_distinct,
    "AVG": lambda c: F.sum_distinct(c) / F.count_distinct(c),
    "MIN": F.min,
    "MAX": F.max,
    "COLLECT": lambda c: F.array_sort(F.collect_set(c)),
}


def _ordered_collect(
    value: Column, specs: list[tuple], colmap, df: DataFrame, distinct: bool
) -> Column:
    """collect() under a preceding ``WITH ... ORDER BY``: Neo4j's list
    follows the sorted row order, but Spark's groupBy forgets it — so the
    keys ride along in a struct and an ``array_sort`` comparator restores
    them post-aggregation (pure JVM; no extra shuffle). Null keys sort
    largest (Neo4j), null VALUES are skipped (Cypher collect), and the
    value itself is the final tiebreaker so the result stays a
    layout-independent VALUE even when keys tie."""
    keys = [(_expr_column(ast, colmap, df), asc) for ast, asc in specs]
    fields = [k.alias(f"__k{i}") for i, (k, _) in enumerate(keys)]
    fields.append(value.alias("__v"))
    arr = F.collect_list(F.when(value.isNotNull(), F.struct(*fields)))

    def cmp(left: Column, right: Column) -> Column:
        lv, rv = left["__v"], right["__v"]
        res = (
            F.when(lv < rv, F.lit(-1)).when(lv > rv, F.lit(1)).otherwise(F.lit(0))
        )
        for i in range(len(keys) - 1, -1, -1):
            asc = keys[i][1]
            lk, rk = left[f"__k{i}"], right[f"__k{i}"]
            res = (
                F.when(lk.isNull() & rk.isNull(), res)
                .when(lk.isNull(), F.lit(1 if asc else -1))
                .when(rk.isNull(), F.lit(-1 if asc else 1))
                .when(lk < rk, F.lit(-1 if asc else 1))
                .when(lk > rk, F.lit(1 if asc else -1))
                .otherwise(res)
            )
        return res

    out = F.transform(F.array_sort(arr, cmp), lambda x: x["__v"])
    # collect(DISTINCT x) after ORDER BY: duplicates are adjacent in the
    # sorted list, and array_distinct keeps first occurrences — so the
    # distinct list stays in key order
    return F.array_distinct(out) if distinct else out


def _agg_column(call: AggCall, colmap, df: DataFrame) -> Column:
    if call.arg is None:
        return F.count(F.lit(1))
    row_order = getattr(colmap, "row_order", None)
    if call.fn == "COLLECT" and row_order:
        if isinstance(call.arg, WholeVar):
            idcol = colmap(PropRef(call.arg.var, None))
            value = F.when(
                idcol.isNotNull(), _expr_column(call.arg, colmap, df)
            )
            return _ordered_collect(value, row_order, colmap, df, call.distinct)
        if len(row_order) == 1 and row_order[0][0] == call.arg:
            # collect(k) under ``WITH … ORDER BY k`` — the canonical
            # "collect the ordering key" idiom. The general comparator is
            # (key dir, nulls largest, value-asc tiebreak) evaluated as an
            # INTERPRETED lambda per comparison; with key ≡ value the null
            # branches are dead (null values never enter the list — the
            # same pre-collect gate both paths apply) and ties are equal
            # elements, so plain sort_array in the key direction is
            # provably the identical list and sorts through codegen'd
            # binary comparisons instead (measured 3x on a 60k-member
            # group).
            value = _expr_column(call.arg, colmap, df)
            out = F.sort_array(F.collect_list(value), asc=row_order[0][1])
            return F.array_distinct(out) if call.distinct else out
        value = _expr_column(call.arg, colmap, df)
        return _ordered_collect(value, row_order, colmap, df, call.distinct)
    if isinstance(call.arg, WholeVar):
        # collect(n): the whole-variable struct, null where the binding
        # itself is null (failed OPTIONAL MATCH) so collect skips it like
        # Neo4j — a struct of null fields is not itself null, hence the
        # explicit id-null gate.
        idcol = colmap(PropRef(call.arg.var, None))
        col = F.when(idcol.isNotNull(), _expr_column(call.arg, colmap, df))
        fns = _AGG_FN_DISTINCT_MAP if call.distinct else _AGG_FN_MAP
        return fns[call.fn](col)
    # _expr_column resolves refs with the missing-property-reads-null
    # contract AND compiles computed arguments (``sum(l.price * (1 -
    # l.disc))``, ``sum(CASE … END)``) — same expression grammar as a
    # projection item, evaluated per pre-aggregation row
    col = _expr_column(call.arg, colmap, df)
    if call.fn == "PERCENTILECONT":
        # exact linear-interpolated percentile (Neo4j percentileCont)
        return F.percentile(col, F.lit(call.extra[0]))
    if call.fn == "PERCENTILEDISC":
        # nearest actual value (Neo4j percentileDisc): percentile_approx
        # at maximum accuracy is exact and returns a data element
        return F.percentile_approx(col, F.lit(call.extra[0]), F.lit(2147483647))
    fns = _AGG_FN_DISTINCT_MAP if call.distinct else _AGG_FN_MAP
    return fns[call.fn](col)


#: a colmap output that is a bare column reference (every node/edge colmap
#: returns plain ``F.col(name)``; computed columns never match this shape)
_PLAIN_COL_RE = re.compile(r"Column<'([A-Za-z_][A-Za-z0-9_]*)'>")


def _plain_name(col: Column) -> str | None:
    """The underlying column name iff ``col`` is a bare reference."""
    m = _PLAIN_COL_RE.fullmatch(str(col))
    return m.group(1) if m else None


def _ref_is_missing(ref, colmap, have: set[str]) -> bool:
    """Neo4j semantics: reading a property that no write ever created
    yields null, NOT an error (openCypher §"property access on missing
    keys"). Our vertex frame only has columns some write created, so a
    resolved-but-absent plain column reference means "property never set
    on any node" — detectable pre-analysis. WITH-stage colmaps validate
    names themselves and raise first, so they never reach this check."""
    if not isinstance(ref, (PropRef, BareRef)):
        return False
    lam = getattr(colmap, "lambda_vars", ())
    if (isinstance(ref, BareRef) and ref.name in lam) or (
        isinstance(ref, PropRef) and ref.var in lam
    ):
        return False  # comprehension loop variable — always bound
    name = _plain_name(colmap(ref))
    return name is not None and name not in have


def _resolve_ref(ref, colmap, df: DataFrame) -> Column:
    """Column for one RETURN/WITH ref with missing-property-reads-null
    semantics — the single resolution point every projection path shares
    (WHERE has its own tri-state handling in :func:`_where_to_column`)."""
    if _ref_is_missing(ref, colmap, set(df.columns)):
        return F.lit(None)
    return colmap(ref)


def _where_to_column(
    disj: list[list[Cond]],
    colmap,
    have: set[str] | None = None,
    df: DataFrame | None = None,
) -> Column:
    ops = {
        "=": lambda c, v: c == v,
        "<>": lambda c, v: c != v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
    }
    string_ops = {
        "STARTS WITH": lambda c, v: c.startswith(v),
        "ENDS WITH": lambda c, v: c.endswith(v),
        "CONTAINS": lambda c, v: c.contains(v),
        # Neo4j =~ matches the ENTIRE string (java.util.regex.matches),
        # where Spark rlike is an unanchored search — anchor it
        "=~": lambda c, v: c.rlike(f"^(?:{v})$"),
    }
    null_ops = {
        "IS NULL": lambda c: c.isNull(),
        "IS NOT NULL": lambda c: c.isNotNull(),
    }

    def missing(ref) -> bool:
        return have is not None and _ref_is_missing(ref, colmap, have)

    def opcol(x) -> Column:
        # computed operands (scalar functions, arithmetic, CASE) need the
        # frame for type dispatch; WHERE positions without one keep the
        # plain-reference contract
        if isinstance(x, (PropRef, BareRef)):
            return colmap(x)
        if df is None:
            raise CypherSyntaxError(
                "computed operands are not supported in this WHERE position"
            )
        return _expr_column(x, colmap, df)

    out: Column | None = None
    for conj in disj:
        cc: Column | None = None
        for cond in conj:
            if isinstance(cond, PatternCond):
                raise CypherSyntaxError(
                    "pattern predicates are only supported in the WHERE of "
                    "a single-MATCH node query"
                )
            right = (
                opcol(cond.right)
                if isinstance(
                    cond.right,
                    (
                        PropRef, BareRef, FuncCall, BinOp, CaseExpr,
                        FieldAccess, IndexExpr, SliceExpr, ListComp,
                        ReduceExpr, CountPattern, PatternComp,
                    ),
                )
                else cond.right
            )
            if isinstance(right, list) and cond.op != "IN":
                # list-literal comparison against a list-valued column
                # (``WHERE xs = ['a', 'b']``): an array literal, so the
                # comparison stays a JVM expression
                right = F.array(*[F.lit(v) for v in right])
            if cond.op in null_ops and missing(cond.left):
                one = F.lit(cond.op == "IS NULL")
            elif cond.op not in null_ops and (
                missing(cond.left) or missing(cond.right)
            ):
                # any comparison/IN/string op on an always-null operand is
                # null in Cypher: the row never passes the WHERE
                one = F.lit(None).cast("boolean")
            elif cond.op == "IN":
                # empty list literal: openCypher `x IN []` is never true
                one = (
                    opcol(cond.left).isin(*cond.right)
                    if cond.right
                    else F.lit(False)
                )
            elif cond.op == "IN_EXPR":
                # membership in a list-valued expression: null list or
                # null element stays null (3VL), like Cypher's IN. A
                # non-list operand is a Neo4j type error — probe and
                # raise typed (use CONTAINS for substring tests)
                if df is not None:
                    try:
                        rt = (
                            df.select(right.alias("__t"))
                            .schema[0]
                            .dataType.simpleString()
                        )
                    except Exception:
                        rt = None
                    if rt is not None and not rt.startswith("array"):
                        raise CypherSyntaxError(
                            f"IN requires a list operand; got {rt} — "
                            "use CONTAINS for substring tests"
                        )
                one = F.array_contains(right, opcol(cond.left))
            elif cond.op in string_ops:
                one = string_ops[cond.op](opcol(cond.left), right)
            elif cond.op == "TRUTHY":
                c = opcol(cond.left)
                if df is not None:
                    # Neo4j raises a type error on a non-boolean bare
                    # predicate (WHERE n.count); Spark's implicit cast
                    # would silently match value-1 rows instead — probe
                    # the operand dtype (analysis only, no job) and keep
                    # the raises-rather-than-mis-answers contract. Lambda
                    # variables (comprehension WHERE) cannot be analyzed
                    # against the frame — skip the probe there.
                    try:
                        dtype = (
                            df.select(c.alias("__t"))
                            .schema[0]
                            .dataType.simpleString()
                        )
                    except Exception:
                        dtype = None
                    if dtype is not None and dtype != "boolean":
                        raise CypherSyntaxError(
                            "bare predicate must be boolean; got "
                            f"{dtype} — write an explicit comparison"
                        )
                one = c == F.lit(True)
            elif cond.op in null_ops:
                one = null_ops[cond.op](opcol(cond.left))
            else:
                one = ops[cond.op](opcol(cond.left), right)
            if cond.negated:
                one = ~one  # three-valued: NOT null stays null
            cc = one if cc is None else (cc & one)
        out = cc if out is None else (out | cc)
    assert out is not None
    return out


def _common_single_var_conds(
    disj: "list[list[Cond]] | None", var: str | None
) -> list[Cond] | None:
    """Conjuncts referencing ONLY ``var`` that appear in EVERY OR branch
    of a DNF WHERE — the subset that is IMPLIED by the full predicate and
    therefore safe to push ahead of an iterative translation (frontier
    BFS, unbounded expansion). Catalyst pushes filters through lazy
    relational plans on its own, but it cannot see through the
    per-round ``localCheckpoint``/count boundaries of the iterative
    operators — without this manual pushdown, ``shortestPath((a:L {k: v})
    -[*]->(b))`` BFSes from EVERY a-label node and filters at the end,
    which is the difference between one source and 10^8 sources at scale.
    The full WHERE still applies after translation (idempotent)."""
    if disj is None or var is None:
        return None
    common: dict[str, Cond] = {}
    for i, conj in enumerate(disj):
        keys: dict[str, Cond] = {}
        for cond in conj:
            if not isinstance(cond, Cond):
                continue
            refs: set[str] = set()
            _expr_vars(cond.left, refs)
            _expr_vars(getattr(cond, "right", None), refs)
            if refs == {var}:
                keys[repr(cond)] = cond
        if i == 0:
            common = keys
        else:
            common = {k: v for k, v in common.items() if k in keys}
        if not common:
            return None
    return list(common.values())


def _src_prefilter(df: DataFrame, var: str, conds: list[Cond]) -> DataFrame:
    """Apply pushed-down single-variable conjuncts to a vertex frame
    (3VL: null predicates do not match, same as the post-translation
    WHERE)."""

    def colmap(ref: PropRef) -> Column:
        if ref.var != var:  # pragma: no cover - guarded by extraction
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")
        return F.col("id" if ref.prop is None else ref.prop)

    return df.filter(
        F.coalesce(
            _where_to_column([list(conds)], colmap, set(df.columns), df),
            F.lit(False),
        )
    )


def _sym_edges(e: DataFrame) -> DataFrame:
    """Symmetrize an edge frame (any schema with src/dst) for undirected
    traversal: union the reversed orientation, dropping reversed
    self-loops (an undirected self-loop matches ONCE, exactly like the
    single-hop undirected expand). Edge ids and properties are preserved,
    so the downstream relationship-isomorphism filters (pairwise id
    inequality / the array_contains visited check) keep holding: one
    relationship is used at most once per path REGARDLESS of traversal
    direction — openCypher's rule. Pure narrow union: no shuffle, 2× the
    scan, the same plan shape the single-hop undirected form already
    pays."""
    back = e.filter(F.col("src") != F.col("dst")).select(
        *[
            F.col("dst").alias("src")
            if c == "src"
            else F.col("src").alias("dst")
            if c == "dst"
            else F.col(c)
            for c in e.columns
        ]
    )
    return e.unionByName(back)


def _varlength_paths(
    graph: PropertyGraph,
    pat: EdgePat,
    carry_paths: bool = False,
    src_conds: list[Cond] | None = None,
) -> DataFrame:
    """``(a)-[:T*lo..hi]->(b)`` as a union of fixed-length edge-join chains.

    One chain per path length L: ``e1.src = a.id``, ``e_{k+1}.src =
    e_k.dst``, ``b.id = e_L.dst`` — all equi-joins Catalyst can broadcast /
    AQE-plan. Cypher's relationship-isomorphism (no edge repeats within a
    path) is enforced with pairwise edge-id inequality filters, exact for
    the bounded hop counts this front end admits (MAX_VAR_HOPS). Row
    multiplicity = number of distinct paths, matching Cypher.

    ``carry_paths`` adds ``__path_nodes`` / ``__path_rels`` id arrays for
    ``nodes(p)`` / ``relationships(p)`` on a named path — free here: the
    hop columns already exist per chain, the arrays are pure projection.

    Unbounded specs (``hi=None`` from ``*`` / ``*lo..``) dispatch to the
    iterative frontier expansion — same output contract, drain-or-raise.
    """
    lo, hi = pat.hops
    if hi is None:
        return _varlength_paths_unbounded(
            graph, pat, lo, carry_paths, src_conds=src_conds
        )
    # bounded chains are fully lazy relational plans: Catalyst pushes the
    # post-translation WHERE into the a-side scan itself, so no manual
    # prefilter is needed here (src_conds is consumed by the ITERATIVE
    # forms, where per-round actions block that pushdown)
    e = graph.edges
    if pat.rel_type is not None:
        e = e.filter(rel_type_cond(pat.rel_type))
    e = e.select("id", "src", "dst")
    if pat.undirected:
        e = _sym_edges(e)
    a = graph.nodes(pat.src.label).select(
        *[F.col(c).alias(f"a_{c}") for c in graph.vertices.columns]
    )
    b = graph.nodes(pat.dst.label).select(
        *[F.col(c).alias(f"b_{c}") for c in graph.vertices.columns]
    )
    out: DataFrame | None = None
    for length in range(lo, hi + 1):
        if length == 0:
            # zero-length path: both endpoints are the SAME node, which
            # must satisfy BOTH sides' labels; the rel type is ignored
            # (openCypher). One equi-join on id — label scans broadcast.
            chain = a.join(b, F.col("a_id") == F.col("b_id"))
            zextra = []
            if carry_paths:
                zextra = [
                    F.array(F.col("a_id")).alias("__path_nodes"),
                    F.array().cast("array<bigint>").alias("__path_rels"),
                ]
            chain = chain.select(
                *[f"a_{c}" for c in graph.vertices.columns],
                *[f"b_{c}" for c in graph.vertices.columns],
                F.lit(0).alias("__path_len"),
                *zextra,
            )
            out = chain if out is None else out.unionByName(chain)
            continue
        hops = [
            e.select(
                F.col("id").alias(f"__h{k}_id"),
                F.col("src").alias(f"__h{k}_src"),
                F.col("dst").alias(f"__h{k}_dst"),
            )
            for k in range(length)
        ]
        chain = a.join(hops[0], F.col("a_id") == F.col("__h0_src"))
        for k in range(1, length):
            chain = chain.join(
                hops[k], F.col(f"__h{k - 1}_dst") == F.col(f"__h{k}_src")
            )
        for i in range(length):  # relationship-isomorphism
            for j in range(i + 1, length):
                chain = chain.filter(F.col(f"__h{i}_id") != F.col(f"__h{j}_id"))
        chain = chain.join(b, F.col(f"__h{length - 1}_dst") == F.col("b_id"))
        extra = []
        if carry_paths:
            extra = [
                F.array(
                    F.col("a_id"),
                    *[F.col(f"__h{k}_dst") for k in range(length)],
                ).alias("__path_nodes"),
                F.array(
                    *[F.col(f"__h{k}_id") for k in range(length)]
                ).alias("__path_rels"),
            ]
        chain = chain.select(
            *[f"a_{c}" for c in graph.vertices.columns],
            *[f"b_{c}" for c in graph.vertices.columns],
            F.lit(length).alias("__path_len"),
            *extra,
        )
        out = chain if out is None else out.unionByName(chain)
    return out


def _varlength_paths_unbounded(
    graph: PropertyGraph,
    pat: EdgePat,
    lo: int,
    carry_paths: bool,
    src_conds: list[Cond] | None = None,
) -> DataFrame:
    """``(a)-[:T*]->(b)`` / ``*lo..`` — the reachability idiom every Neo4j
    user types — as an ITERATIVE frontier expansion (the g6/g31 frontier
    machinery applied to path enumeration; round-6 verdict ask #3).

    Semantics match Cypher exactly: one row per distinct path, no edge
    repeated within a path (relationship isomorphism — which is also the
    mathematical termination guarantee: a path holds ≤|E| edges). State is
    one row per LIVE partial path carrying its edge-id array; each round is
    ONE equi-join of the frontier head against the edge list plus a JVM
    ``array_contains`` filter — no Python, no driver-side path handling.
    Lineage truncates with ``localCheckpoint`` per round, and the per-round
    driver scalar is the frontier count (the SCC/k-core one-scalar
    discipline), doubling as the loud guard: a frontier past
    ``VAR_UNBOUNDED_MAX_FRONTIER`` rows or a graph whose paths outlive
    ``VAR_UNBOUNDED_MAX_ROUNDS`` raises instead of OOMing — dense
    components make path COUNTS exponential, and that is a property of the
    query, not the engine; the guard converts it from a data surprise into
    a conscious limit.

    Output contract is identical to the bounded union-of-chains frame:
    ``a_*`` / ``b_*`` vertex columns, ``__path_len``, plus
    ``__path_nodes`` / ``__path_rels`` when ``carry_paths``.
    """
    e = graph.edges
    if pat.rel_type is not None:
        e = e.filter(rel_type_cond(pat.rel_type))
    e = e.select("id", "src", "dst")
    if pat.undirected:
        e = _sym_edges(e)
    vcols = graph.vertices.columns
    a_src = graph.nodes(pat.src.label)
    if src_conds and pat.src.var is not None:
        # pushed-down source predicate: the expansion starts from the
        # MATCHED sources only (see _common_single_var_conds)
        a_src = _src_prefilter(a_src, pat.src.var, src_conds)
    a_ids = a_src.select(F.col("id").alias("__a"))
    first = a_ids.join(e, F.col("__a") == F.col("src")).select(
        "__a",
        F.col("dst").alias("__cur"),
        F.array("id").alias("__rels"),
        F.array("__a", "dst").alias("__nodes"),
        F.lit(1).alias("__len"),
    )
    frontier = first
    parts: list[DataFrame] = []
    drained = False
    # iter_kernel sizing (guide §2.2), the betweenness discipline: the
    # edge list is checkpointed ONCE (each round previously re-derived
    # the filter+union lineage from the graph checkpoint), the kernel is
    # sized by max(|e|, frontier) so a tiny frontier on a huge graph can
    # never force the edge shuffle narrow, and each round's own frontier
    # count feeds k.resize — a frontier that explodes gets its width
    # (and AQE) back before the next round. Rows carry node/edge-id
    # arrays, so the per-partition row target is
    # PATH_STATE_ROWS_PER_PARTITION (wider rows than the narrow-state
    # default). Lazy checkpoint + count: ONE job per round materializes
    # the level AND answers the guard (the eager-checkpoint + count pair
    # was two).
    from flink_neo4j_spark.tuning import iter_kernel

    e = e.localCheckpoint()
    n_e = e.count()
    kernel = iter_kernel(
        e.sparkSession, n_e, rows_per_partition=PATH_STATE_ROWS_PER_PARTITION
    )
    k = kernel.__enter__()
    try:
        for rnd in range(VAR_UNBOUNDED_MAX_ROUNDS + 1):
            frontier = frontier.localCheckpoint(eager=False)
            n = frontier.count()
            if n == 0:
                drained = True
                break
            if n > VAR_UNBOUNDED_MAX_FRONTIER:
                raise RuntimeError(
                    f"unbounded variable-length expansion frontier hit {n} "
                    f"partial paths (cap {VAR_UNBOUNDED_MAX_FRONTIER}) at hop "
                    f"{rnd + 1} — the pattern enumerates exponentially many "
                    "paths on this graph; bound it (*lo..hi) or use "
                    "shortestPath()"
                )
            k.resize(max(n, n_e))
            parts.append(frontier)
            if rnd == VAR_UNBOUNDED_MAX_ROUNDS:
                break
            frontier = (
                frontier.join(k.bc(e), F.col("__cur") == F.col("src"))
                .filter(~F.array_contains("__rels", F.col("id")))
                .select(
                    "__a",
                    F.col("dst").alias("__cur"),
                    F.concat("__rels", F.array("id")).alias("__rels"),
                    F.concat("__nodes", F.array("dst")).alias("__nodes"),
                    (F.col("__len") + 1).alias("__len"),
                )
            )
    finally:
        kernel.__exit__(None, None, None)
    if not drained:
        raise RuntimeError(
            "unbounded variable-length expansion did not drain within "
            f"{VAR_UNBOUNDED_MAX_ROUNDS} hops; bound the pattern "
            "(*lo..hi) or raise VAR_UNBOUNDED_MAX_ROUNDS consciously"
        )
    if not parts:  # no a-labeled node has an outgoing edge: empty result
        parts = [first.limit(0)]
    if lo == 0:
        # *0..: the zero-length path binds both endpoints to the same
        # node (dst label enforced by the final b-join, per openCypher)
        parts.append(
            a_src.select(
                F.col("id").alias("__a"),
                F.col("id").alias("__cur"),
                F.array().cast("array<bigint>").alias("__rels"),
                F.array("id").alias("__nodes"),
                F.lit(0).alias("__len"),
            )
        )
    paths = parts[0]
    for part in parts[1:]:
        paths = paths.unionByName(part)
    if lo > 1:
        paths = paths.filter(F.col("__len") >= lo)
    a = graph.nodes(pat.src.label).select(
        *[F.col(c).alias(f"a_{c}") for c in vcols]
    )
    b = graph.nodes(pat.dst.label).select(
        *[F.col(c).alias(f"b_{c}") for c in vcols]
    )
    extra = (
        [F.col("__nodes").alias("__path_nodes"),
         F.col("__rels").alias("__path_rels")]
        if carry_paths
        else []
    )
    return (
        paths.join(a, F.col("__a") == F.col("a_id"))
        .join(b, F.col("__cur") == F.col("b_id"))
        .select(
            *[f"a_{c}" for c in vcols],
            *[f"b_{c}" for c in vcols],
            F.col("__len").alias("__path_len"),
            *extra,
        )
    )


def _optional_match(
    graph: PropertyGraph,
    base: NodePat,
    opt_clauses: list[
        tuple["NodePat | EdgePat", "list[list[Cond]] | None", "list[Cond]"]
    ],
    base_disj: list[list[Cond]] | None,
):
    """``MATCH (a[:L]) [WHERE ...] (OPTIONAL MATCH (a)-[e:T]->(b[:L2])
    [WHERE ...])+`` -> base LEFT JOIN each optional side, null-extended.

    The anchor may be either endpoint of each clause, and may be the
    base variable OR a node variable bound by an EARLIER optional clause
    (chained optionals — a failed earlier binding has a null id, which
    never equi-joins, so the chain null-extends transitively, per
    Neo4j). An optional WHERE referencing only its own side's variables
    filters that side before the join (semantics-preserving pushdown); a
    WHERE referencing the base or earlier clauses rides the LEFT-join
    condition, so failing rows null-extend instead of dropping (Neo4j's
    OPTIONAL WHERE contract). Stacked clauses multiply per Neo4j: every
    OPTIONAL MATCH left-joins independently, so a base row with m and n
    matches in two clauses yields m*n rows (1 where a side is empty).
    Plan shape: one left equi-join per clause; each optional side's
    endpoint join broadcasts when its label restricts it to a
    dimension-sized set.
    """
    base_df = graph.nodes(base.label)

    def base_colmap(ref: PropRef) -> Column:
        if ref.var != base.var:
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")
        return F.col("id" if ref.prop is None else ref.prop)

    if base_disj is not None:
        base_df = base_df.filter(
            _where_to_column(base_disj, base_colmap, set(base_df.columns), base_df)
        )

    vertex_props = [c for c in graph.vertices.columns
                 if c not in ("id", "label", EXTRA_LABELS)]
    edge_props = [
        c for c in graph.edges.columns
        if c not in ("id", "src", "dst", "rel_type")
    ]
    #: var -> (prefix, kind) for every optional-clause variable
    prefixes: dict[str, tuple[str, str]] = {}
    df = base_df
    for i, (opt, opt_disj, bound_conds) in enumerate(opt_clauses):
        if not isinstance(opt, EdgePat) or opt.hops is not None:
            raise CypherSyntaxError(
                "OPTIONAL MATCH supports a single-hop edge pattern (a)-[e]->(b)"
            )
        if opt.props or opt.src.props or opt.dst.props:
            # parse-level desugar clears every map (free/edge side into the
            # clause WHERE, bound side into ``bound_conds``) — defensive
            raise CypherSyntaxError(
                "inline property match not supported in MATCH; use WHERE"
            )
        # the anchor endpoint may be the base variable OR a node variable
        # bound by an EARLIER optional clause (round 8: ``OPTIONAL MATCH
        # (n)-[:A]->(f) OPTIONAL MATCH (f)-[:B]->(g)`` — chaining off an
        # optional binding; a failed earlier binding has a null id, which
        # never equi-joins, so the chained clause null-extends too)
        bound_node_vars = {base.var} | {
            v for v, (_, kind) in prefixes.items() if kind == "node"
        }
        if opt.src.var in bound_node_vars:
            bound_end, other, anchor = "src", opt.dst, opt.src.var
        elif opt.dst.var in bound_node_vars:
            bound_end, other, anchor = "dst", opt.src, opt.dst.var
        else:
            raise CypherSyntaxError(
                "OPTIONAL MATCH pattern must reference a bound node variable "
                f"(one of {sorted(bound_node_vars)!r})"
            )
        if other.label is None and other.var is None:
            raise CypherSyntaxError("optional pattern's free endpoint needs a variable")
        for v in (opt.var, other.var):
            if v is None:
                continue
            if v == base.var or v in prefixes:
                raise CypherSyntaxError(
                    f"variable {v!r} is already bound; a repeated variable "
                    "across OPTIONAL MATCH clauses is not supported"
                )
        ep, op = f"__e{i}_", f"__o{i}_"
        e = graph.edges
        if opt.rel_type is not None:
            e = e.filter(rel_type_cond(opt.rel_type))
        if opt.undirected:
            # (n)-[e]-(m): the optional side matches either orientation —
            # same symmetrized frame as every other undirected form
            e = _sym_edges(e)
        e = e.select(*[F.col(c).alias(f"{ep}{c}") for c in graph.edges.columns])
        other_df = graph.nodes(other.label).select(
            *[F.col(c).alias(f"{op}{c}") for c in graph.vertices.columns]
        )
        free_end = "dst" if bound_end == "src" else "src"
        opt_side = e.join(other_df, F.col(f"{ep}{free_end}") == F.col(f"{op}id"))

        def opt_colmap(ref, opt=opt, other=other, ep=ep, op=op) -> Column:
            if ref.var == opt.var:
                return F.col(f"{ep}{ref.prop or 'id'}")
            if ref.var == other.var:
                return F.col(f"{op}{ref.prop or 'id'}")
            raise CypherSyntaxError(
                f"OPTIONAL MATCH WHERE may only reference {opt.var!r}/{other.var!r}"
            )

        if opt_disj is not None:
            # side-only WHERE pre-filters (semantics-preserving pushdown);
            # a WHERE referencing the base or an earlier optional clause
            # (round 8: ``OPTIONAL MATCH (n)-[e]->(m) WHERE m.x > n.y``,
            # Neo4j's cross-variable form) is part of the OPTIONAL pattern
            # — it rides the LEFT-join condition below, so failing rows
            # null-extend instead of dropping
            refs: set[str] = set()
            _disj_vars(opt_disj, refs)
            if refs <= {v for v in (opt.var, other.var) if v is not None}:
                opt_side = opt_side.filter(
                    _where_to_column(
                        opt_disj, opt_colmap, set(opt_side.columns), opt_side
                    )
                )
                opt_disj = None

        anchor_id = (
            base_df["id"]
            if anchor == base.var
            else F.col(f"{prefixes[anchor][0]}id")
        )
        join_cond = anchor_id == F.col(f"{ep}{bound_end}")
        if opt_disj is not None:

            def xcolmap(
                ref, opt=opt, other=other, ep=ep, op=op
            ) -> Column:
                if ref.var == opt.var:
                    return F.col(f"{ep}{ref.prop or 'id'}")
                if ref.var == other.var:
                    return F.col(f"{op}{ref.prop or 'id'}")
                if ref.var == base.var:
                    if ref.prop is None:
                        return base_df["id"]
                    if ref.prop not in base_df.columns:
                        return F.lit(None)  # missing property reads null
                    return base_df[ref.prop]
                hit = prefixes.get(ref.var)
                if hit is not None:
                    return F.col(f"{hit[0]}{ref.prop or 'id'}")
                raise CypherSyntaxError(f"unknown variable {ref.var!r}")

            # the cross join is a SCHEMA PROBE only (never executed):
            # _where_to_column needs a frame carrying both sides' columns
            # to type computed operands (``WHERE f.born + 1 > n.born``);
            # the compiled Column then rides the real left join
            probe = df.crossJoin(opt_side)
            join_cond = join_cond & F.coalesce(
                _where_to_column(
                    opt_disj, xcolmap, set(probe.columns), probe
                ),
                F.lit(False),
            )
        if bound_conds:
            # inline map on the BOUND endpoint: part of the OPTIONAL
            # pattern, so a base row that fails it null-extends instead of
            # dropping — expressed by ANDing it into the LEFT-join
            # condition (coalesced: a null comparison never matches)
            def bjcolmap(ref: PropRef) -> Column:
                if ref.var != anchor:
                    raise CypherSyntaxError(f"unknown variable {ref.var!r}")
                if anchor != base.var:
                    # anchored on an earlier optional clause's endpoint:
                    # its columns are prefixed on the accumulated frame
                    return F.col(f"{prefixes[anchor][0]}{ref.prop or 'id'}")
                if ref.prop is None:
                    return base_df["id"]
                if ref.prop not in base_df.columns:
                    # missing property reads null — never matches (3VL)
                    return F.lit(None)
                return base_df[ref.prop]

            join_cond = join_cond & F.coalesce(
                _where_to_column(
                    [list(bound_conds)],
                    bjcolmap,
                    set(base_df.columns),
                    base_df,
                ),
                F.lit(False),
            )
        df = df.join(opt_side, join_cond, "left")
        if other.var is not None:
            prefixes[other.var] = (op, "node")
        if opt.var is not None:
            prefixes[opt.var] = (ep, "edge")

    def colmap(ref: PropRef) -> Column:
        if ref.var == base.var:
            return base_df["id"] if ref.prop is None else F.col(ref.prop)
        hit = prefixes.get(ref.var)
        if hit is None:
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")
        return F.col(f"{hit[0]}{ref.prop or 'id'}")

    colmap.var_props = {base.var: vertex_props}
    colmap.var_kinds = {base.var: "node"}
    for v, (_, kind) in prefixes.items():
        colmap.var_props[v] = vertex_props if kind == "node" else edge_props
        colmap.var_kinds[v] = kind
    colmap.scope_graph = graph
    return df, colmap


def _prefixed_clause(
    graph: PropertyGraph, pat: NodePat | EdgePat, idx: int
) -> tuple[DataFrame, dict[str, list[str]]]:
    """One MATCH clause as a DataFrame with every column prefixed by its
    variable (``<var>_<col>``), plus the var -> column-list map. Node
    clauses are a label scan; edge clauses are ``expand`` (two equi-joins
    Catalyst broadcasts when a label restricts an endpoint)."""
    if isinstance(pat, NodePat):
        if pat.var is None:
            raise CypherSyntaxError("chained MATCH patterns need node variables")
        cols = [f"{pat.var}_{c}" for c in graph.vertices.columns]
        df = graph.nodes(pat.label).select(
            *[F.col(c).alias(f"{pat.var}_{c}") for c in graph.vertices.columns]
        )
        return df, {pat.var: cols}
    if pat.src.var is None or pat.dst.var is None or pat.src.var == pat.dst.var:
        raise CypherSyntaxError(
            "chained edge patterns need distinct variables on both endpoints"
        )
    if pat.hops is not None:
        # variable-length segment inside a chain (round-8 verdict ask #5):
        # the ordinary expansion frame (one row per distinct path), with
        # its endpoint columns renamed to the chain's variable prefixes so
        # the name-based unification joins it like any clause. The path's
        # edge-id array rides along as __vlr{idx} for the SAME-clause
        # relationship-isomorphism filters in _match_chain, and is dropped
        # before the frame reaches user scope.
        vl = _varlength_paths(graph, pat, carry_paths=True)
        vcols = graph.vertices.columns
        sv, dv = pat.src.var, pat.dst.var
        df = vl.select(
            *[F.col(f"a_{c}").alias(f"{sv}_{c}") for c in vcols],
            *[F.col(f"b_{c}").alias(f"{dv}_{c}") for c in vcols],
            F.col("__path_rels").alias(f"__vlr{idx}"),
        )
        return df, {
            sv: [f"{sv}_{c}" for c in vcols],
            dv: [f"{dv}_{c}" for c in vcols],
        }
    evar = pat.var or f"__e{idx}"
    df = graph.expand(
        pat.src.label,
        pat.rel_type,
        pat.dst.label,
        src_prefix=f"{pat.src.var}_",
        dst_prefix=f"{pat.dst.var}_",
    )
    if pat.undirected:
        # either-orientation clause inside a chain: union the reversed
        # frame (swapped labels + swapped prefixes), minus self-loops
        # (matched once, by the forward frame)
        back = graph.expand(
            pat.dst.label,
            pat.rel_type,
            pat.src.label,
            src_prefix=f"{pat.dst.var}_",
            dst_prefix=f"{pat.src.var}_",
        ).filter(F.col("src") != F.col("dst"))
        df = df.unionByName(back.select(*df.columns))
    varmap = {
        evar: [f"{evar}_{c}" for c in graph.edges.columns],
        pat.src.var: [f"{pat.src.var}_{c}" for c in graph.vertices.columns],
        pat.dst.var: [f"{pat.dst.var}_{c}" for c in graph.vertices.columns],
    }
    df = df.select(
        *[F.col(c).alias(f"{evar}_{c}") for c in graph.edges.columns],
        *varmap[pat.src.var],
        *varmap[pat.dst.var],
    )
    return df, varmap


def _rel_types_overlap(t1, t2) -> bool:
    """Could two relationship-type restrictions bind the same edge?
    ``None`` means untyped (matches every type), a tuple is Cypher's
    multi-type ``[:A|B]`` form."""
    if t1 is None or t2 is None:
        return True
    s1 = set(t1) if isinstance(t1, tuple) else {t1}
    s2 = set(t2) if isinstance(t2, tuple) else {t2}
    return bool(s1 & s2)


def _match_chain(
    graph: PropertyGraph,
    pats: list[NodePat | EdgePat],
    groups: "list[list[NodePat | EdgePat]] | None" = None,
    seed: "tuple[DataFrame, dict[str, list[str]]] | None" = None,
):
    """Multi-clause ``MATCH ... MATCH ...`` translation: each clause becomes
    a var-prefixed DataFrame; consecutive clauses join on the node ids of
    their shared variables (Cypher's name-based unification). Every clause
    must share at least one variable with the accumulated pattern — a
    clause that shares none would be a cartesian product, which this front
    end refuses by contract (the native crossJoin is available to users who
    really mean it). Re-binding a relationship variable is rejected, as in
    Cypher. Plan shape: a chain of equi-joins on vertex ids — exactly what
    Catalyst reorders/broadcasts; label filters stay pushed at each
    clause's own scan.

    ``groups`` (per-MATCH-clause pattern lists) drives openCypher's
    relationship isomorphism: edges bound WITHIN one MATCH clause are
    pairwise distinct — including the edges inside a variable-length
    segment (its ``__vlr{idx}`` id array vs sibling single-hop edge ids
    vs other segments' arrays), never across clauses.

    ``seed`` (round 9) starts the chain from an EXISTING var-prefixed
    frame instead of ``pats[0]`` — the shortestPath composition path: the
    counting-BFS result (endpoint columns renamed to the chain
    convention) becomes the accumulated frame, and every pattern in
    ``pats`` joins onto it by the same name-based unification."""
    if seed is None:
        acc, varmap = _prefixed_clause(graph, pats[0], 0)
        indexed = [(0, pats[0]), *enumerate(pats[1:], start=1)]
        to_join = indexed[1:]
    else:
        acc, varmap = seed
        varmap = dict(varmap)
        indexed = list(enumerate(pats, start=1))
        to_join = indexed

    # greedy connectivity ordering (round 9): join each pattern once it
    # shares a node variable with the accumulated frame, regardless of
    # clause ORDER — ``MATCH p = shortestPath((c)-[*..3]->(r)) MATCH
    # (s)-[:A]->(n)-[:B]->(r)`` binds through the SECOND hop. Inner
    # equi-joins commute, so reordering never changes row semantics; a
    # pattern that never connects is the same cartesian-product error as
    # before.
    def _node_vars(pp) -> set:
        vs = {pp.var} if isinstance(pp, NodePat) else {pp.src.var, pp.dst.var}
        return vs - {None}

    bound = set(varmap)
    pending = list(to_join)
    ordered: list = []
    while pending:
        for k, (idx_k, pp_k) in enumerate(pending):
            if _node_vars(pp_k) & bound:
                bound |= _node_vars(pp_k)
                ordered.append(pending.pop(k))
                break
        else:
            raise CypherSyntaxError(
                "each MATCH clause must share a variable with an earlier clause"
            )
    to_join = ordered
    for idx, pat in to_join:
        df, vm = _prefixed_clause(graph, pat, idx)
        edge_vars = (
            {pat.var}
            if isinstance(pat, EdgePat) and pat.var is not None
            else set()
        )
        if edge_vars & varmap.keys():
            raise CypherSyntaxError(
                f"relationship variable {pat.var!r} already bound"
            )
        shared = sorted(set(vm) & set(varmap) - edge_vars)
        if not shared:
            raise CypherSyntaxError(
                "each MATCH clause must share a variable with an earlier clause"
            )
        renames = {}
        for v in shared:
            for c in vm[v]:
                renames[c] = f"__dup_{c}"
        df = df.select(
            *[F.col(c).alias(renames.get(c, c)) for c in df.columns]
        )
        cond = None
        for v in shared:
            eq = F.col(f"{v}_id") == F.col(f"__dup_{v}_id")
            cond = eq if cond is None else (cond & eq)
        acc = acc.join(df, cond).drop(*renames.values())
        for v, cols in vm.items():
            if v not in varmap:
                varmap[v] = cols
    if groups:
        idx_of = {id(pp): i for i, pp in indexed}
        for grp in groups:
            evars = [
                cp.var
                for cp in grp
                if isinstance(cp, EdgePat) and cp.hops is None
            ]
            vlcols = [
                f"__vlr{idx_of[id(cp)]}"
                for cp in grp
                if isinstance(cp, EdgePat) and cp.hops is not None
            ]
            for i in range(len(evars)):
                for j in range(i + 1, len(evars)):
                    acc = acc.filter(
                        F.col(f"{evars[i]}_id") != F.col(f"{evars[j]}_id")
                    )
            for rc in vlcols:
                for ev in evars:
                    acc = acc.filter(
                        ~F.array_contains(F.col(rc), F.col(f"{ev}_id"))
                    )
            for i in range(len(vlcols)):
                for j in range(i + 1, len(vlcols)):
                    acc = acc.filter(
                        ~F.arrays_overlap(F.col(vlcols[i]), F.col(vlcols[j]))
                    )
    drop_vl = [c for c in acc.columns if c.startswith("__vlr")]
    if drop_vl:
        acc = acc.drop(*drop_vl)
    known = {c for cols in varmap.values() for c in cols}

    def colmap(ref: PropRef) -> Column:
        name = f"{ref.var}_{'id' if ref.prop is None else ref.prop}"
        if name not in known:
            raise CypherSyntaxError(
                f"unknown variable or property {ref.var}.{ref.prop or 'id'}"
            )
        return F.col(name)

    internal = {"id", "label", EXTRA_LABELS, "src", "dst", "rel_type"}
    colmap.var_props = {
        v: [
            c[len(v) + 1:]
            for c in cols
            if c[len(v) + 1:] not in internal
        ]
        for v, cols in varmap.items()
    }
    colmap.var_kinds = {
        v: "node" if f"{v}_label" in known else "edge" for v in varmap
    }
    colmap.scope_graph = graph
    return acc, colmap


def _optional_join_prefixed(
    graph: PropertyGraph,
    df: DataFrame,
    colmap,
    opt: "NodePat | EdgePat",
    opt_disj,
    i: int,
    bound_conds: "list[Cond] | None" = None,
):
    """OPTIONAL MATCH onto a var-prefixed chain frame (round-8 verdict ask
    #5): ONE left equi-join per clause, anchored on whichever chain node
    variable the pattern binds. The optional side's columns land under the
    new variables' own prefixes (``{var}_{col}``), so the chain colmap
    contract extends unchanged; a failed binding leaves them null and the
    whole-variable projection null-gates on the id. Undirected patterns
    run over the symmetrized edge frame. Plan: edge scan ⋈ free-endpoint
    label scan (broadcast when dimension-sized), then one left equi-join
    on the anchor id — the same shape the first-stage OPTIONAL costs."""
    kinds = dict(getattr(colmap, "var_kinds", {}))
    props_map = dict(getattr(colmap, "var_props", {}))
    if not isinstance(opt, EdgePat) or opt.hops is not None:
        raise CypherSyntaxError(
            "OPTIONAL MATCH supports a single-hop edge pattern (a)-[e]->(b)"
        )
    bound_src = opt.src.var in kinds
    bound_dst = opt.dst.var in kinds
    if bound_src and bound_dst:
        raise CypherSyntaxError(
            "OPTIONAL MATCH after a MATCH chain must leave one endpoint "
            "free (both are already bound)"
        )
    if not (bound_src or bound_dst):
        raise CypherSyntaxError(
            "OPTIONAL MATCH pattern must reference a variable bound by "
            "the MATCH chain"
        )
    bv = opt.src.var if bound_src else opt.dst.var
    if kinds.get(bv) != "node":
        raise CypherSyntaxError(f"{bv!r} is not a node variable")
    bound_end = "src" if bound_src else "dst"
    other = opt.dst if bound_src else opt.src
    if other.var is None:
        raise CypherSyntaxError(
            "optional pattern's free endpoint needs a variable"
        )
    for v in (opt.var, other.var):
        if v is not None and v in kinds:
            raise CypherSyntaxError(
                f"variable {v!r} is already bound in this scope"
            )
    e = graph.edges
    if opt.rel_type is not None:
        e = e.filter(rel_type_cond(opt.rel_type))
    if opt.undirected:
        e = _sym_edges(e)
    evar = opt.var or f"__oe{i}"
    ecols = graph.edges.columns
    vcols = graph.vertices.columns
    eframe = e.select(*[F.col(c).alias(f"{evar}_{c}") for c in ecols])
    oframe = graph.nodes(other.label).select(
        *[F.col(c).alias(f"{other.var}_{c}") for c in vcols]
    )
    free_end = "dst" if bound_end == "src" else "src"
    opt_side = eframe.join(
        oframe, F.col(f"{evar}_{free_end}") == F.col(f"{other.var}_id")
    )
    if opt_disj is not None:
        side_known = set(opt_side.columns)

        def ocolmap(ref: PropRef) -> Column:
            name = f"{ref.var}_{'id' if ref.prop is None else ref.prop}"
            if ref.var in (evar, other.var) and name in side_known:
                return F.col(name)
            raise CypherSyntaxError(
                "OPTIONAL MATCH WHERE may only reference the optional "
                f"pattern's own variables ({evar!r}/{other.var!r})"
            )

        # side-only WHERE pre-filters; cross-variable WHERE (chain/outer
        # variables — round 8) rides the LEFT-join condition so failing
        # rows null-extend (Neo4j's OPTIONAL WHERE contract)
        refs: set[str] = set()
        _disj_vars(opt_disj, refs)
        if refs <= {v for v in (opt.var, other.var) if v is not None}:
            opt_side = opt_side.filter(
                _where_to_column(opt_disj, ocolmap, side_known, opt_side)
            )
            opt_disj = None
    # anchor through the scope colmap (chain scopes name it ``{bv}_id``,
    # shortest-path scopes ``a_id``/``b_id`` — the colmap knows)
    join_cond = colmap(PropRef(bv, None)) == F.col(f"{evar}_{bound_end}")
    if opt_disj is not None:
        side_known = set(opt_side.columns)

        def xcolmap(ref: PropRef) -> Column:
            name = f"{ref.var}_{'id' if ref.prop is None else ref.prop}"
            if ref.var in (evar, other.var):
                # missing property on the optional side reads null
                return F.col(name) if name in side_known else F.lit(None)
            return colmap(ref)  # chain/outer scope

        # schema-probe cross join (never executed) so computed operands
        # type-check against both sides' columns
        probe = df.crossJoin(opt_side)
        join_cond = join_cond & F.coalesce(
            _where_to_column(opt_disj, xcolmap, set(probe.columns), probe),
            F.lit(False),
        )
    if bound_conds:
        # inline map on a chain-bound endpoint: a predicate of the OPTIONAL
        # pattern — failing rows null-extend, so it rides the LEFT-join
        # condition resolved through the chain colmap (never a pre-filter)
        join_cond = join_cond & F.coalesce(
            _where_to_column([list(bound_conds)], colmap, set(df.columns), df),
            F.lit(False),
        )
    df = df.join(opt_side, join_cond, "left")
    prev = colmap
    add_known = {f"{evar}_{c}" for c in ecols} | {
        f"{other.var}_{c}" for c in vcols
    }

    def new_colmap(ref: PropRef) -> Column:
        name = f"{ref.var}_{'id' if ref.prop is None else ref.prop}"
        if name in add_known:
            return F.col(name)
        return prev(ref)

    internal = {"id", "label", EXTRA_LABELS, "src", "dst", "rel_type"}
    props_map[other.var] = [c for c in vcols if c not in internal]
    props_map[evar] = [c for c in ecols if c not in internal]
    kinds[other.var] = "node"
    kinds[evar] = "edge"
    new_colmap.var_props = props_map
    new_colmap.var_kinds = kinds
    new_colmap.scope_graph = graph
    return df, new_colmap


def _out_name(item: ReturnItem) -> str:
    return item.alias or _default_name(item.expr)


def _desugar_inline_props(
    pats: list["NodePat | EdgePat"], taken: set[str]
) -> list[Cond]:
    """Inline property maps in MATCH — ``(n:L {k: v})`` / ``-[e:T {s:
    2001}]->`` — desugared to equality conditions on the owning variable
    (openCypher: the map is an implicit conjunct of the clause's WHERE, so
    a null-valued entry never matches, exactly like ``n.k = null``).
    Anonymous elements carrying a map get a synthetic dunder variable so
    the ordinary colmap machinery resolves the conditions; ``taken``
    guards against (pathological) user variables with the same spelling.
    The caller must AND the result into EVERY disjunct of the clause's
    WHERE — property maps distribute over OR."""
    conds: list[Cond] = []
    counter = 0

    def varname(el) -> str:
        nonlocal counter
        if el.var is None:
            while f"__p{counter}" in taken:
                counter += 1
            el.var = f"__p{counter}"
            taken.add(el.var)
        return el.var

    for pat in pats:
        for nd in [pat] if isinstance(pat, NodePat) else [pat.src, pat.dst]:
            for k, v in (nd.props or {}).items():
                conds.append(Cond(PropRef(varname(nd), k), "=", v))
            nd.props = {}
        if isinstance(pat, EdgePat) and pat.props:
            if pat.hops is not None:
                raise CypherSyntaxError(
                    "inline property maps are not supported on "
                    "variable-length relationships"
                )
            for k, v in pat.props.items():
                conds.append(Cond(PropRef(varname(pat), k), "=", v))
            pat.props = {}
    return conds


def _and_into(
    disj: list[list[Cond]] | None, conds: list[Cond]
) -> list[list[Cond]] | None:
    """AND ``conds`` into every disjunct of an OR-of-ANDs WHERE (the
    inline-property-map merge — maps distribute over OR)."""
    if not conds:
        return disj
    if disj is None:
        return [list(conds)]
    for conj in disj:
        conj.extend(conds)
    return disj


def _assign_anon_vars(pats: list["NodePat | EdgePat"], taken: set[str]) -> None:
    """Chain execution keys every join on variable names, so anonymous
    elements get synthetic dunder names pre-translation. A chain's shared
    continuation NodePat is one object, so it is named exactly once and
    both adjacent segments unify on it."""
    counter = 0
    for pat in pats:
        els = [pat] if isinstance(pat, NodePat) else [pat.src, pat.dst, pat]
        for el in els:
            if el.var is None:
                while f"__a{counter}" in taken:
                    counter += 1
                el.var = f"__a{counter}"
                taken.add(el.var)


def _pattern_vars(pats: list["NodePat | EdgePat"]) -> set[str]:
    out: set[str] = set()
    for pat in pats:
        if isinstance(pat, NodePat):
            if pat.var:
                out.add(pat.var)
        else:
            for v in (pat.var, pat.src.var, pat.dst.var):
                if v:
                    out.add(v)
    return out


def _shortest_path(
    graph: PropertyGraph,
    pat: EdgePat,
    pathvar: str,
    all_paths: bool = False,
    carry_paths: bool = False,
    src_conds: "list[Cond] | None" = None,
):
    """``p = shortestPath((a:L1)-[:T*lo..hi]->(b:L2))`` and its
    ``allShortestPaths`` sibling — level-synchronous frontier BFS with
    shortest-path COUNTING (NOT the path-enumeration union
    ``_varlength_paths`` uses: per-pair state is one (dist, count) row —
    |V|·|sources| — where path enumeration is exponential on dense
    graphs). Each round expands only the NEW frontier (anti-join against
    settled pairs), so a pair's count is finalized exactly at its BFS
    level: count(v, k) = Σ count(u, k-1) over predecessors u — the
    textbook #shortest-paths recurrence (the σ of Brandes' betweenness).

    shortestPath returns ONE row per (a, b) pair; allShortestPaths
    multiplies each pair by its path count (one row per distinct
    shortest path, matching Neo4j's row semantics) via an explode over
    ``sequence(1, count)`` — counts stay bounded because ties only
    accumulate within the hop bound. ``length(p)`` resolves to the hop
    count in both forms. Undirected patterns BFS over the symmetrized
    edge list. The one driver-side scalar per round is the frontier
    count (the g22 early-exit discipline). WHERE predicates apply after
    translation; at scale a source-selective query should prefilter the
    anchor label (the frontier starts from every a-label node)."""
    carry_rep = carry_paths and not all_paths
    carry_all = carry_paths and all_paths
    lo, hi = pat.hops
    # unbounded spec (shortestPath((a)-[:T*]->(b)) — the textbook form):
    # per-pair BFS state is |pairs| rows regardless of the bound, so the
    # only change is the round budget — levels stop at the graph diameter
    # (frontier drains); a diameter past the ceiling raises loudly like
    # the unbounded enumeration (drain-or-raise).
    unbounded = hi is None
    if unbounded:
        hi = VAR_UNBOUNDED_MAX_ROUNDS
    e = graph.edges
    if pat.rel_type is not None:
        e = e.filter(rel_type_cond(pat.rel_type))
    ecols = [F.col("src").alias("__s"), F.col("dst").alias("__d")]
    if carry_paths:
        ecols.append(F.col("id").alias("__eid"))
    e = e.select(*ecols)
    if pat.undirected:
        rcols = [F.col("__d").alias("__s"), F.col("__s").alias("__d")]
        if carry_paths:
            rcols.append(F.col("__eid"))
        e = e.unionByName(e.select(*rcols))
    vcols = graph.vertices.columns
    a_nodes = graph.nodes(pat.src.label)
    if src_conds and pat.src.var is not None:
        # pushed-down source predicate (see _common_single_var_conds):
        # the BFS frontier starts from the MATCHED anchors only — at
        # scale this is the difference between one source and every
        # a-label node; the full WHERE still applies post-translation
        a_nodes = _src_prefilter(a_nodes, pat.src.var, src_conds)
    init_cols = [
        F.col("id").alias("__a"),
        F.col("id").alias("__v"),
        F.lit(0).alias("__len"),
        F.lit(1).cast("long").alias("__cnt"),
    ]
    if carry_rep:
        # representative-path state: ONE deterministic path per settled
        # pair (the lexicographically-least node-id sequence, edge ids as
        # tiebreak) — arrays of ≤ hi+1 ids per row, so the BFS state stays
        # O(|pairs| · hops), never the tied-path product
        init_cols.append(F.array(F.col("id")).alias("__nodes"))
        init_cols.append(F.array().cast("array<bigint>").alias("__rels"))
    if carry_all:
        # capped tie-enumeration state (round-6 verdict ask #5): up to
        # ALL_PATHS_TIE_CAP+1 (n, r) paths per settled pair, canonically
        # array_sorted so the capped slice is deterministic regardless of
        # collect_list order — O(|pairs| · cap · hops) state, bounded by
        # construction; enumeration is EXACT whenever the query returns
        # (see the σ-monotonicity note on ALL_PATHS_TIE_CAP)
        init_cols.append(
            F.array(
                F.struct(
                    F.array(F.col("id")).alias("n"),
                    F.array().cast("array<bigint>").alias("r"),
                )
            ).alias("__paths")
        )
    # iter_kernel sizing (guide §2.2), the betweenness discipline: edges
    # checkpointed once (each level previously re-derived the
    # filter+union lineage), kernel sized by max(|e|, |settled pairs|)
    # with the path-state row target, per-level width re-derived from the
    # frontier count (k.resize). Lazy checkpoint + count folds the
    # materialize + isEmpty job pair into one job per level.
    from flink_neo4j_spark.tuning import iter_kernel

    e = e.localCheckpoint()
    n_e = e.count()
    kernel = iter_kernel(
        e.sparkSession, n_e, rows_per_partition=PATH_STATE_ROWS_PER_PARTITION
    )
    k = kernel.__enter__()
    try:
        dist = a_nodes.select(*init_cols).localCheckpoint()
        frontier = dist
        return _shortest_path_bfs(
            e, n_e, k, dist, frontier, graph, pat, pathvar, vcols, a_nodes,
            lo, hi, unbounded, carry_rep, carry_all, carry_paths, all_paths,
        )
    finally:
        kernel.__exit__(None, None, None)


def _shortest_path_bfs(
    e, n_e, k, dist, frontier, graph, pat, pathvar, vcols, a_nodes,
    lo, hi, unbounded, carry_rep, carry_all, carry_paths, all_paths,
):
    for i in range(hi):
        aggs = [F.sum("__cnt").alias("__cnt")]
        if carry_rep:
            aggs.append(
                F.min(
                    F.struct(
                        F.concat("__nodes", F.array(F.col("__d"))).alias("n"),
                        F.concat("__rels", F.array(F.col("__eid"))).alias("r"),
                    )
                ).alias("__rep")
            )
        if carry_all:
            aggs.append(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("__ext"))),
                    1,
                    ALL_PATHS_TIE_CAP + 1,
                ).alias("__paths")
            )
        joined = frontier.join(k.bc(e), F.col("__v") == F.col("__s"))
        if carry_all:
            joined = joined.withColumn(
                "__ext",
                F.transform(
                    F.col("__paths"),
                    lambda pp: F.struct(
                        F.concat(pp["n"], F.array(F.col("__d"))).alias("n"),
                        F.concat(pp["r"], F.array(F.col("__eid"))).alias("r"),
                    ),
                ),
            )
        nxt = (
            joined.groupBy("__a", F.col("__d").alias("__v"))
            .agg(*aggs)
            .withColumn("__len", F.lit(i + 1))
        )
        if carry_rep:
            nxt = nxt.select(
                "__a",
                "__v",
                "__len",
                "__cnt",
                F.col("__rep")["n"].alias("__nodes"),
                F.col("__rep")["r"].alias("__rels"),
            )
        if carry_all:
            nxt = nxt.select("__a", "__v", "__len", "__cnt", "__paths")
        # lazy checkpoint + count: ONE job materializes the level AND
        # answers the drain check (the eager-checkpoint + isEmpty pair
        # was two jobs per level)
        frontier = nxt.join(
            dist.select("__a", "__v"), ["__a", "__v"], "left_anti"
        ).localCheckpoint(eager=False)
        n_front = frontier.count()
        if n_front == 0:
            break
        k.resize(max(n_front, n_e))
        dist = dist.unionByName(frontier.select(*dist.columns))
        if (i + 1) % 3 == 0 or i == hi - 1:
            dist = dist.localCheckpoint(eager=False)
    else:
        if unbounded and frontier.count() != 0:
            raise RuntimeError(
                "unbounded shortestPath BFS did not drain within "
                f"{VAR_UNBOUNDED_MAX_ROUNDS} levels (graph diameter "
                "exceeds the ceiling); bound the pattern or raise "
                "VAR_UNBOUNDED_MAX_ROUNDS consciously"
            )
    # lo=0 admits the zero-length self-pair (settled at BFS level 0);
    # every lo>=1 keeps excluding it, as before
    paths = dist.filter(F.col("__len") >= lo)
    a = a_nodes.select(*[F.col(c).alias(f"a_{c}") for c in vcols])
    b = graph.nodes(pat.dst.label).select(
        *[F.col(c).alias(f"b_{c}") for c in vcols]
    )
    df = (
        paths.join(a, F.col("__a") == F.col("a_id"))
        .join(b, F.col("__v") == F.col("b_id"))
        .withColumnRenamed("__len", "__path_len")
        .drop("__a", "__v")
    )
    if carry_all:
        # one row PER ENUMERATED PATH — exact whenever the tie cap holds;
        # a pair with more ties than the cap raises at execution (loud,
        # never a silent undercount)
        checked = F.when(
            F.assert_true(
                F.col("__cnt") <= ALL_PATHS_TIE_CAP,
                F.concat(
                    F.lit(
                        "allShortestPaths tie enumeration: a pair has "
                    ),
                    F.col("__cnt").cast("string"),
                    F.lit(
                        f" tied paths (cap {ALL_PATHS_TIE_CAP}); raise "
                        "ALL_PATHS_TIE_CAP consciously or drop the "
                        "nodes()/relationships() accessor"
                    ),
                ),
            ).isNull(),
            F.col("__paths"),
        )
        df = (
            df.withColumn("__p", F.explode(checked))
            .withColumn("__nodes", F.col("__p")["n"])
            .withColumn("__rels", F.col("__p")["r"])
            .drop("__p", "__paths", "__cnt")
        )
    elif all_paths:
        df = df.withColumn(
            "__path_no", F.explode(F.sequence(F.lit(1), F.col("__cnt")))
        ).drop("__path_no", "__cnt")
    else:
        df = df.drop("__cnt")
    names = {pat.src.var: "a_", pat.dst.var: "b_"}

    def colmap(ref: PropRef) -> Column:
        if ref.var == pathvar:
            if ref.prop == "length":
                return F.col("__path_len")
            if carry_paths and ref.prop == "__nodes":
                return F.col("__nodes")
            if carry_paths and ref.prop == "__rels":
                return F.col("__rels")
            raise CypherSyntaxError(
                f"only length({pathvar}), nodes({pathvar}) and "
                f"relationships({pathvar}) are defined for a path variable"
            )
        prefix = names.get(ref.var)
        if prefix is None:
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")
        return F.col(f"{prefix}{'id' if ref.prop is None else ref.prop}")

    # scope metadata: the path's endpoints are ordinary node variables —
    # OPTIONAL MATCH composition, COUNT { } / pattern-comprehension
    # binding and pattern predicates all anchor on them through the
    # shared var_kinds/scope_graph contract (round 8)
    vertex_props = [
        c for c in graph.vertices.columns
        if c not in ("id", "label", EXTRA_LABELS)
    ]
    colmap.var_props = {
        v: vertex_props
        for v in (pat.src.var, pat.dst.var)
        if v is not None
    }
    colmap.var_kinds = {v: "node" for v in colmap.var_props}
    colmap.scope_graph = graph
    return df, colmap


def _pattern_scope_colmap(
    what: str,
    edge_var,
    dst_var,
    eprefix,
    nprefix,
    vertex_props: "list[str] | None" = None,
    edge_props: "list[str] | None" = None,
):
    """Colmap for the INNER scope of a pattern subquery (EXISTS/COUNT
    block WHERE, pattern-comprehension WHERE/projection, correlated CALL):
    the pattern's own edge/far-endpoint variables only — outer-scope
    references raise loudly rather than silently correlating. Passing
    ``vertex_props``/``edge_props`` additionally enables WHOLE-variable
    projection (``RETURN m`` inside a CALL): bare references resolve to
    the id column and ``var_props``/``var_kinds`` let the shared WholeVar
    struct builder assemble the full node/edge value."""
    whole_ok = vertex_props is not None or edge_props is not None

    def icolmap(ref) -> Column:
        v = ref.var if isinstance(ref, PropRef) else getattr(ref, "name", None)
        prop = ref.prop if isinstance(ref, PropRef) else None
        if edge_var is not None and v == edge_var:
            if prop is None:
                if whole_ok:
                    return F.col(f"{eprefix}id")
                raise CypherSyntaxError(
                    f"project a property inside {what} (e.g. {v}.prop), "
                    "not the bare variable"
                )
            return F.col(f"{eprefix}{prop}")
        if dst_var is not None and v == dst_var:
            if prop is None:
                if whole_ok:
                    return F.col(f"{nprefix}id")
                raise CypherSyntaxError(
                    f"project a property inside {what} (e.g. {v}.prop), "
                    "not the bare variable"
                )
            return F.col(f"{nprefix}{prop}")
        scope = ", ".join(x for x in (edge_var, dst_var) if x is not None)
        raise CypherSyntaxError(
            f"{what} may only reference its own pattern variables "
            f"({scope or 'none bound'}); got {v!r}"
        )

    if whole_ok:
        icolmap.var_props = {}
        icolmap.var_kinds = {}
        if edge_var is not None:
            icolmap.var_props[edge_var] = sorted(edge_props or [])
            icolmap.var_kinds[edge_var] = "edge"
        if dst_var is not None:
            icolmap.var_props[dst_var] = sorted(vertex_props or [])
            icolmap.var_kinds[dst_var] = "node"
    return icolmap


def _bind_pattern_subqueries(
    df: DataFrame,
    colmap,
    items: list[ReturnItem] | None,
    where_disj: list[list[Cond]] | None = None,
) -> DataFrame:
    """Bind every ``COUNT { pattern }`` subquery and ``[pattern | expr]``
    pattern comprehension in ``items`` (or, when ``items`` is None, in
    the operands of ``where_disj``'s conditions) to a real column: one
    partial-aggregated per-node row (count, or collected value list) per
    distinct subquery, left-joined on the bound variable's id (coalesced
    to 0 / ``[]`` — a node with no matches counts zero / reads an empty
    list, per Cypher). The subquery side is ONE row per node, so the join
    never multiplies rows, and at scale it is the same shuffle a degree
    computation costs anyway. Mutates the exprs in place
    (CountPattern/PatternComp → RawCol) and returns the joined frame; the
    bound helper columns ride along until the next projection drops
    them."""
    ctx = getattr(colmap, "pattern_count_ctx", None)
    stage_graph = getattr(colmap, "stage_graph", None)
    scope_structs = getattr(colmap, "structs", {})
    bound: dict[tuple, str] = {}
    state = {"df": df, "n": 0}

    def resolve_ctx(v: str, what: str):
        """(graph, outer-id column) for the subquery's bound variable —
        the pattern scope's plain ``id``, any NODE variable of a
        multi-variable pattern scope (edge patterns, chains — round 8),
        or a WITH-carried node struct's id field (post-WITH
        degree/adjacency subqueries)."""
        if ctx is not None and v == ctx[1]:
            return ctx[0], F.col("id")
        kinds = getattr(colmap, "var_kinds", None)
        sg = getattr(colmap, "scope_graph", None) or stage_graph
        if sg is not None and kinds and kinds.get(v) == "node":
            return sg, colmap(PropRef(v, None))
        if (
            stage_graph is not None
            and v in scope_structs
            and "id" in scope_structs[v]
        ):
            return stage_graph, F.col(v)["id"]
        raise CypherSyntaxError(
            f"{what} are only supported over a MATCHed node or a "
            f"WITH-carried node; {v!r} is neither in this scope"
        )

    def bind(cp: CountPattern) -> RawCol:
        pc = cp.pattern
        graph, outer_id = resolve_ctx(pc.var, "COUNT { } subqueries")
        key = (
            pc.var, pc.rel_type, pc.dst_label, pc.direction,
            pc.edge_var, pc.dst_var, repr(pc.pred),
        )
        if key in bound:
            return RawCol(bound[key])
        name = f"__pcnt_{state['n']}"
        state["n"] += 1
        edges = graph.edges
        if pc.rel_type is not None:
            edges = edges.filter(rel_type_cond(pc.rel_type))

        def counted(bound_end: str) -> DataFrame:
            other = "dst" if bound_end == "src" else "src"
            if pc.pred is None:
                # unfiltered form: label restriction as a pure semi-join
                e = edges
                if pc.dst_label is not None:
                    lbl = graph.nodes(pc.dst_label).select(
                        F.col("id").alias("__pc_l")
                    )
                    e = e.join(
                        lbl, F.col(other) == F.col("__pc_l"), "left_semi"
                    )
                return e.select(F.col(bound_end).alias("__pc_id"))
            # inner-WHERE form (COUNT { (v)-[e:T]->(m:L) WHERE … }):
            # prefix the edge (and, when observable, far-node) columns,
            # filter, then project the bound endpoint — still one row per
            # match, never a row multiplication of the outer frame
            e = edges.select(
                F.col(bound_end).alias("__pc_id"),
                F.col(other).alias("__pc_other"),
                *[
                    F.col(c).alias(f"__pce_{c}")
                    for c in graph.edges.columns
                ],
            )
            if pc.dst_label is not None or pc.dst_var is not None:
                nodes = (
                    graph.nodes(pc.dst_label)
                    if pc.dst_label is not None
                    else graph.vertices
                )
                n = nodes.select(
                    *[
                        F.col(c).alias(f"__pcn_{c}")
                        for c in graph.vertices.columns
                    ]
                )
                e = e.join(n, F.col("__pc_other") == F.col("__pcn_id"))
            icolmap = _pattern_scope_colmap(
                "a COUNT { } subquery", pc.edge_var, pc.dst_var,
                "__pce_", "__pcn_",
            )
            e = e.filter(
                _where_to_column(pc.pred, icolmap, set(e.columns), e)
            )
            return e.select("__pc_id")

        if pc.direction == "out":
            ep = counted("src")
        elif pc.direction == "in":
            ep = counted("dst")
        else:
            ep = counted("src").unionByName(counted("dst"))
        cnt = ep.groupBy("__pc_id").agg(F.count("*").alias(name))
        state["df"] = (
            state["df"]
            .join(cnt, outer_id == F.col("__pc_id"), "left")
            .drop("__pc_id")
            .withColumn(name, F.coalesce(F.col(name), F.lit(0)))
        )
        bound[key] = name
        return RawCol(name)

    def bind_comp(pc: PatternComp) -> RawCol:
        graph, outer_id = resolve_ctx(pc.var, "pattern comprehensions")
        key = (
            "comp", pc.var, pc.rel_type, pc.direction, pc.edge_var,
            pc.dst_var, pc.dst_label, repr(pc.pred), repr(pc.expr),
        )
        if key in bound:
            return RawCol(bound[key])
        name = f"__pcomp_{state['n']}"
        state["n"] += 1
        edges = graph.edges
        if pc.rel_type is not None:
            edges = edges.filter(rel_type_cond(pc.rel_type))
        # the far-endpoint node join is only needed when the comprehension
        # can observe the node (a label restriction or a bound variable);
        # `[(v)-[e:T]->() | e.w]` stays a pure edge-table aggregate
        needs_nodes = pc.dst_label is not None or pc.dst_var is not None

        def side(bound_end: str) -> DataFrame:
            other = "dst" if bound_end == "src" else "src"
            e = edges.select(
                F.col(bound_end).alias("__pc_id"),
                F.col(other).alias("__pc_other"),
                *[
                    F.col(c).alias(f"__pce_{c}")
                    for c in graph.edges.columns
                ],
            )
            if not needs_nodes:
                return e
            nodes = (
                graph.nodes(pc.dst_label)
                if pc.dst_label is not None
                else graph.vertices
            )
            n = nodes.select(
                *[
                    F.col(c).alias(f"__pcn_{c}")
                    for c in graph.vertices.columns
                ]
            )
            return e.join(n, F.col("__pc_other") == F.col("__pcn_id"))

        inner_colmap = _pattern_scope_colmap(
            "a pattern comprehension", pc.edge_var, pc.dst_var,
            "__pce_", "__pcn_",
            # whole-variable projection ([(v)-[e:T]->(m:L) | m]): the full
            # node/edge struct collects per anchor, like RETURN m in a CALL
            vertex_props=[
                c for c in graph.vertices.columns
                if c not in ("id", "label", EXTRA_LABELS)
            ],
            edge_props=[
                c for c in graph.edges.columns
                if c not in ("id", "src", "dst", "rel_type")
            ],
        )

        if pc.direction == "out":
            side_df = side("src")
        elif pc.direction == "in":
            side_df = side("dst")
        else:
            side_df = side("src").unionByName(side("dst"))
        if pc.pred is not None:
            side_df = side_df.filter(
                _where_to_column(
                    pc.pred, inner_colmap, set(side_df.columns), side_df
                )
            )
        comp_expr = pc.expr
        if (
            isinstance(comp_expr, BareRef)
            and comp_expr.name in (pc.edge_var, pc.dst_var)
        ):
            # bare `| b` projection: the WHOLE node/edge value (the
            # comprehension body parses bare words as refs, not WholeVar)
            comp_expr = WholeVar(comp_expr.name)
        val = _expr_column(comp_expr, inner_colmap, side_df)
        # collect via a struct wrapper so null projected values SURVIVE
        # (Neo4j keeps them in a pattern comprehension; bare collect_list
        # would silently drop them), then unwrap — one hash aggregate
        lists = (
            side_df.select(F.col("__pc_id"), val.alias("__pc_val"))
            .groupBy("__pc_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pc_val").alias("v")))
                    ),
                    lambda x: x["v"],
                ).alias(name)
            )
        )
        dtype = lists.schema[name].dataType.simpleString()
        state["df"] = (
            state["df"]
            .join(lists, outer_id == F.col("__pc_id"), "left")
            .drop("__pc_id")
            .withColumn(
                name,
                F.coalesce(F.col(name), F.array().cast(dtype)),
            )
        )
        bound[key] = name
        return RawCol(name)

    def rewrite(expr):
        if isinstance(expr, CountPattern):
            return bind(expr)
        if isinstance(expr, PatternComp):
            return bind_comp(expr)
        if isinstance(expr, BinOp):
            return BinOp(expr.op, rewrite(expr.left), rewrite(expr.right))
        if isinstance(expr, FuncCall):
            return FuncCall(
                expr.fn, rewrite(expr.arg), tuple(rewrite(a) for a in expr.extra)
            )
        return expr

    if items is not None:
        for i in items:
            i.expr = rewrite(i.expr)
        return state["df"]
    # WHERE-position binding (the Neo4j 5 degree-filter idiom
    # ``WHERE COUNT { (n)-[:T]->() } >= 2`` and size-of-comprehension
    # filters): rewrite every cond operand in place. Pattern PREDICATES
    # (semi/anti-joins) were already consumed by the caller; literal
    # operands pass through rewrite unchanged.
    for conj in where_disj:
        for cond in conj:
            if isinstance(cond, PatternCond):
                continue
            cond.left = rewrite(cond.left)
            cond.right = rewrite(cond.right)
    return state["df"]


def _contains_agg(x) -> bool:
    """Deep test: does expression tree ``x`` contain an :class:`AggCall`
    anywhere — including inside CASE branches, comprehension sources,
    map/list constructors, and condition operands? The parser's top-level
    ``isinstance`` checks miss nested aggregates now that composite
    aggregate expressions parse; every clause that must REJECT aggregates
    (WHERE, SET values, UNWIND) and every branch that must DETECT an
    aggregating projection (implicit grouping, row-order carry) uses this
    instead."""
    if isinstance(x, AggCall):
        return True
    if isinstance(x, BinOp):
        return _contains_agg(x.left) or _contains_agg(x.right)
    if isinstance(x, FuncCall):
        return _contains_agg(x.arg) or any(_contains_agg(a) for a in x.extra)
    if isinstance(x, CaseExpr):
        return (
            any(
                _disj_contains_agg(disj) or _contains_agg(res)
                for disj, res in x.whens
            )
            or _contains_agg(x.default)
        )
    if isinstance(x, (IsNullExpr,)):
        return _contains_agg(x.arg)
    if isinstance(x, FieldAccess):
        return _contains_agg(x.base)
    if isinstance(x, IndexExpr):
        return _contains_agg(x.base) or _contains_agg(x.index)
    if isinstance(x, SliceExpr):
        return _contains_agg(x.base) or _contains_agg(x.lo) or _contains_agg(x.hi)
    if isinstance(x, ListComp):
        return (
            _contains_agg(x.source)
            or (x.pred is not None and _disj_contains_agg(x.pred))
            or _contains_agg(x.expr)
        )
    if isinstance(x, ReduceExpr):
        return (
            _contains_agg(x.init)
            or _contains_agg(x.source)
            or _contains_agg(x.expr)
        )
    if isinstance(x, MapLit):
        return any(_contains_agg(v) for _, v in x.entries)
    if isinstance(x, ListExpr):
        return any(_contains_agg(v) for v in x.items)
    if isinstance(x, MapProj):
        return any(_contains_agg(v) for _, v in x.extras)
    if isinstance(x, Cond):
        return _contains_agg(x.left) or _contains_agg(x.right)
    return False


def _disj_contains_agg(disj) -> bool:
    return any(
        _contains_agg(cond)
        for conj in disj
        for cond in conj
        if not isinstance(cond, PatternCond)
    )


def _is_literal_leaf(x) -> bool:
    return x is None or isinstance(x, (int, float, str, bool))


def _decompose_agg_expr(expr, agg_reg: list, key_reg: list, key_items):
    """Split a COMPOSITE aggregate expression (``sum(x) / count(*)``,
    ``round(avg(x), 2)``, ``CASE WHEN … THEN count(*) END``) into

    - aggregate subtrees, registered in ``agg_reg`` as (AggCall, alias)
      pairs (deduplicated by AST equality, so ``count(*)`` appearing twice
      computes once), and
    - maximal aggregate-free variable-referencing subtrees, which become
      IMPLICIT GROUPING KEYS (Neo4j: in ``RETURN n.x + count(*)`` the
      ``n.x`` part groups), registered in ``key_reg`` — unless an equal
      expression is already projected as a key item, in which case its
      output column is reused,

    returning the residual tree over :class:`BareRef` placeholders, to be
    evaluated as a POST-AGGREGATION projection. Literals stay in place.
    """
    if isinstance(expr, AggCall):
        for call, alias in agg_reg:
            if call == expr:
                return BareRef(alias)
        alias = f"__agg{len(agg_reg)}"
        agg_reg.append((expr, alias))
        return BareRef(alias)
    if not _contains_agg(expr):
        if _is_literal_leaf(expr):
            return expr
        # aggregate-free subtree referencing scope: an implicit grouping
        # key. Reuse a projected key item with the same AST if one exists
        # (``RETURN n.x AS x, n.x + count(*) AS y`` groups once on x).
        for item in key_items:
            if item.expr == expr:
                return BareRef(_out_name(item))
        for e, alias in key_reg:
            if e == expr:
                return BareRef(alias)
        alias = f"__gkey{len(key_reg)}"
        key_reg.append((expr, alias))
        return BareRef(alias)
    # mixed: recurse structurally
    rec = lambda e: _decompose_agg_expr(e, agg_reg, key_reg, key_items)
    if isinstance(expr, BinOp):
        return BinOp(expr.op, rec(expr.left), rec(expr.right))
    if isinstance(expr, FuncCall):
        return FuncCall(expr.fn, rec(expr.arg), tuple(rec(a) for a in expr.extra))
    if isinstance(expr, CaseExpr):
        # WHEN-condition operands may carry aggregates in projection
        # position (the parser's _agg_ok flag permits them there) and are
        # decomposed like any other operand; their aggregate-free variable
        # references register as implicit grouping keys. Raw non-AST
        # operands (the IN compiler's list literals / pre-substituted
        # $param lists) must stay verbatim: the IN compiler star-expands
        # ``cond.right`` and a constant can never be a grouping key.
        rec_op = lambda o: o if isinstance(o, (list, tuple)) else rec(o)
        whens = []
        for disj, res in expr.whens:
            new_disj = [
                [
                    dc_replace(c, left=rec_op(c.left), right=rec_op(c.right))
                    if isinstance(c, Cond)
                    else c
                    for c in conj
                ]
                for conj in disj
            ]
            whens.append((new_disj, rec(res)))
        return CaseExpr(tuple(whens), rec(expr.default))
    if isinstance(expr, IsNullExpr):
        return IsNullExpr(rec(expr.arg), expr.negated)
    if isinstance(expr, FieldAccess):
        return FieldAccess(rec(expr.base), expr.name)
    if isinstance(expr, IndexExpr):
        return IndexExpr(rec(expr.base), rec(expr.index))
    if isinstance(expr, SliceExpr):
        return SliceExpr(rec(expr.base), rec(expr.lo), rec(expr.hi))
    if isinstance(expr, ListComp):
        # only the SOURCE may aggregate (``[x IN collect(y) | x * 2]``);
        # pred/expr reference the lambda variable and stay put
        return ListComp(expr.var, rec(expr.source), expr.pred, expr.expr)
    if isinstance(expr, ReduceExpr):
        return ReduceExpr(
            expr.acc, expr.init, expr.var, rec(expr.source), expr.expr
        )
    if isinstance(expr, MapLit):
        return MapLit(tuple((k, rec(v)) for k, v in expr.entries))
    if isinstance(expr, ListExpr):
        return ListExpr(tuple(rec(v) for v in expr.items))
    raise CypherSyntaxError(
        "aggregates are not supported inside this expression form; "
        "compute the aggregate in a WITH stage first"
    )


def _apply_projection(
    df: DataFrame, colmap, distinct: bool, items: list[ReturnItem]
) -> DataFrame:
    """One RETURN/WITH projection: Cypher's implicit grouping (non-aggregated
    items become keys when any aggregate is present), column order restored
    to clause order, optional DISTINCT.

    COMPOSITE aggregate items (an expression tree containing aggregates —
    ``sum(x) * 1.0 / count(*)``, ``round(avg(x), 2)``, ``CASE WHEN … THEN
    count(*) … END``, ``collect(x)[0]``) compile as TWO stages in one
    plan: the aggregate subtrees and implicit grouping keys feed the hash
    aggregate under hidden aliases, and the residual expression evaluates
    as a post-aggregation projection — Catalyst fuses both into the same
    whole-stage-codegen span, so this costs nothing over a hand-split
    WITH + RETURN."""
    def col_of(expr) -> Column:
        return _expr_column(expr, colmap, df)

    aggs = [i for i in items if isinstance(i.expr, AggCall)]
    composite = [
        i
        for i in items
        if not isinstance(i.expr, AggCall) and _contains_agg(i.expr)
    ]
    if aggs or composite:
        keys = [
            i for i in items if i not in aggs and i not in composite
        ]
        agg_reg: list = []
        key_reg: list = []
        residuals: dict[int, Any] = {}
        for i in composite:
            residuals[id(i)] = _decompose_agg_expr(
                i.expr, agg_reg, key_reg, keys
            )
        key_cols = [col_of(i.expr).alias(_out_name(i)) for i in keys]
        key_cols += [col_of(e).alias(alias) for e, alias in key_reg]
        agg_cols = [
            _agg_column(i.expr, colmap, df).alias(_out_name(i)) for i in aggs
        ]
        agg_cols += [
            _agg_column(call, colmap, df).alias(alias)
            for call, alias in agg_reg
        ]
        grouped = df.groupBy(*key_cols).agg(*agg_cols)
        if composite:
            post = _bare_colmap(
                set(grouped.columns), _struct_outputs(grouped), grouped
            )
            df = grouped.select(
                *[
                    _expr_column(residuals[id(i)], post, grouped).alias(
                        _out_name(i)
                    )
                    if id(i) in residuals
                    else F.col(_out_name(i))
                    for i in items
                ]
            )
        else:
            df = grouped.select(*[_out_name(i) for i in items])
    else:
        df = df.select(*[col_of(i.expr).alias(_out_name(i)) for i in items])
    if distinct:
        df = df.distinct()
    return df


#: Neo4j temporal-component accessors (``d.year`` on a date/datetime
#: value). dayOfWeek is ISO (Monday=1) like Neo4j — Spark's weekday() is
#: 0-based Monday. Time-of-day parts only apply to datetimes.
_TEMPORAL_ACCESSORS = {
    "year": F.year,
    "quarter": F.quarter,
    "month": F.month,
    "week": F.weekofyear,
    "day": F.day,
    "ordinalDay": F.dayofyear,
    "dayOfWeek": lambda c: F.weekday(c) + F.lit(1),
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "epochSeconds": F.unix_timestamp,
    "epochMillis": F.unix_millis,
}
_DATE_PARTS = frozenset(
    {"year", "quarter", "month", "week", "day", "ordinalDay", "dayOfWeek"}
)


def _bare_colmap(
    names: set[str],
    structs: dict[str, tuple[str, ...]] | None = None,
    frame: DataFrame | None = None,
):
    """colmap over a WITH stage's output: the row is named scalar columns,
    so only bare alias references resolve — pattern variables are out of
    scope past the WITH horizon (Cypher's scoping rule). ``structs`` maps
    struct-typed output names (a whole variable carried through WITH, a
    map projection) to their field names: ``n.born`` after ``WITH n``
    resolves to the struct field, and a field no write ever created reads
    null (the same missing-property contract as pattern scopes / Cypher's
    map access on a missing key)."""
    structs = structs or {}

    def colmap(ref) -> Column:
        if isinstance(ref, BareRef):
            if ref.name not in names:
                raise CypherSyntaxError(f"unknown name {ref.name!r} after WITH")
            return F.col(ref.name)
        if isinstance(ref, PropRef) and ref.var in structs:
            if ref.prop is None:
                # id(n) / the whole-variable null gate: the struct's id
                # field (only a carried whole variable has one)
                if "id" not in structs[ref.var]:
                    raise CypherSyntaxError(
                        f"{ref.var!r} is not a node or relationship "
                        "variable in this scope"
                    )
                return F.col(ref.var).getField("id")
            if ref.prop in structs[ref.var]:
                return F.col(ref.var).getField(ref.prop)
            return F.lit(None)
        if (
            isinstance(ref, PropRef)
            and ref.var in names
            and frame is not None
            and ref.prop in _TEMPORAL_ACCESSORS
        ):
            # d.year / d.month / ... — temporal-component access on a
            # projected date/datetime column (Neo4j accessor semantics);
            # time-of-day parts require a datetime
            dtype = _dtype_of(F.col(ref.var), frame) or ""
            if dtype.startswith("timestamp") or (
                dtype == "date" and ref.prop in _DATE_PARTS
            ):
                return _TEMPORAL_ACCESSORS[ref.prop](F.col(ref.var))
            if dtype == "date":
                raise CypherSyntaxError(
                    f"{ref.prop!r} is a time component; {ref.var!r} is a "
                    "date (no time of day)"
                )
        raise CypherSyntaxError(
            "references after WITH must use the WITH output names"
        )

    colmap.star_names = set(names)
    colmap.structs = dict(structs)
    return colmap


def _struct_outputs(df: DataFrame) -> dict[str, tuple[str, ...]]:
    """Struct-typed columns of a projected frame → their field names (the
    dot-access scope ``_bare_colmap`` serves after a WITH horizon)."""
    from pyspark.sql.types import StructType

    return {
        f.name: tuple(f.dataType.names)
        for f in df.schema.fields
        if isinstance(f.dataType, StructType)
    }


def _expand_star(items: list[ReturnItem], colmap, clause: str) -> list[ReturnItem]:
    """Expand ``*`` items against the clause scope: whole-variable items in
    a pattern scope (sorted; synthetic ``__``-prefixed variables hidden),
    bare projected names after a WITH horizon."""
    if not any(isinstance(i.expr, Star) for i in items):
        return items
    out: list[ReturnItem] = []
    for i in items:
        if not isinstance(i.expr, Star):
            out.append(i)
            continue
        var_props = getattr(colmap, "var_props", None)
        if var_props is not None:
            names = sorted(
                v for v in var_props if v is not None and not v.startswith("__")
            )
            if not names:
                raise CypherSyntaxError(f"{clause} * found no named variables")
            out.extend(ReturnItem(WholeVar(v), None) for v in names)
            continue
        star_names = getattr(colmap, "star_names", None)
        if star_names:
            out.extend(
                ReturnItem(BareRef(n), None)
                for n in sorted(star_names)
                if not n.startswith("__")
            )
            continue
        raise CypherSyntaxError(
            f"{clause} * is not supported in this clause position"
        )
    return out


def _path_accessors_ahead(p: "_Parser", var: str) -> bool:
    """Token lookahead: does the remaining query read ``nodes(var)`` or
    ``relationships(var)``? Decides whether the path compile must carry
    id arrays — carrying them unconditionally would widen the BFS /
    chain state for every named-path query that never asks."""
    toks = p.toks
    for k in range(p.i, len(toks) - 3):
        if (
            toks[k].kind == "word"
            and toks[k].text in ("nodes", "relationships")
            and toks[k + 1].text == "("
            and toks[k + 2].kind == "word"
            and toks[k + 2].text == var
            and toks[k + 3].text == ")"
        ):
            return True
    return False


def _read_single(graph: PropertyGraph, p: "_Parser") -> DataFrame:
    """One single-query (MATCH ... RETURN ...) starting at the parser's
    current position; trailing tokens (e.g. a following UNION) are left
    for the caller. See :func:`cypher_read` for the supported surface:

    ``MATCH <pattern> [WHERE ...] [OPTIONAL MATCH <edge-pattern>
    [WHERE ...]] RETURN ...``

    Column names follow aliases when given, else ``id_<var>`` /
    ``<var>_<prop>`` (Cypher's positional results have no canonical names;
    DataFrames need them). The OPTIONAL MATCH clause requires a plain MATCH
    node pattern whose variable appears as one endpoint of the optional
    edge pattern; its WHERE conditions filter the optional side BEFORE the
    left join (Cypher semantics: a failed optional pattern yields nulls,
    never drops the base row).
    """
    if p.at("kw", "RETURN") or p.at("kw", "WITH"):
        # standalone RETURN / WITH ... RETURN — expression evaluation over
        # one empty row (``RETURN 1 + 1 AS x``, ``WITH date($d) AS d
        # RETURN d.year``): the calculator / connectivity-probe idiom
        # every Neo4j client supports. One local row, no scan.
        spark = graph.vertices.sparkSession
        cm = _bare_colmap(set())
        cm.stage_graph = graph
        return _finish_read(spark.range(1).drop("id"), cm, p, bare=True)
    if p._at_word_ci("CALL") and p.peek(1) is not None and p.peek(1).text == "{":
        # CALL { <query> [UNION <query>]* } <pipeline> — the Neo4j 5
        # subquery block. Its headline use is POST-UNION processing
        # (aggregate/sort over a union — inexpressible with a bare UNION
        # chain); the inner chain compiles exactly like a top-level read
        # and its output columns become a bare scope for the tail
        # pipeline. Correlated (importing ``WITH``) forms are rejected at
        # the inner parse (unknown variable), not mis-answered.
        p.next()
        p.next()
        df = _read_union(graph, p)
        p.expect("punct", "}")
        return _finish_read(
            df,
            _bare_colmap(set(df.columns), _struct_outputs(df), df),
            p,
            bare=True,
        )
    if p.at("kw", "UNWIND"):
        # standalone UNWIND: a literal list as the row source —
        # ``UNWIND [1, 2, 3] AS x RETURN x * 2 AS y``. Planned as a
        # one-row local relation exploded driver-side (no scan).
        p.next()
        if (
            p.at("word")
            and p.peek().text == "range"
            and p.peek(1) is not None
            and p.peek(1).text == "("
        ):
            # UNWIND range(lo, hi[, step]) AS x — THE Cypher batch-row
            # generator (`UNWIND range(1, n)`). Compiled to spark.range:
            # a distributed, lazily-generated row source (splits across
            # executors) — never a driver-side literal array, so
            # range(1, 10^9) behaves like any other scan at scale.
            p.next()
            p.expect("punct", "(")
            rargs: list[int] = []
            while True:
                v = p.parse_value(None)
                if isinstance(v, bool) or not isinstance(v, int):
                    raise CypherSyntaxError(
                        "range() bounds in UNWIND must be integer "
                        "literals or integer parameters"
                    )
                rargs.append(v)
                if p.at("punct", ","):
                    p.next()
                    continue
                break
            p.expect("punct", ")")
            if len(rargs) not in (2, 3):
                raise CypherSyntaxError("range() takes 2 or 3 arguments")
            lo, hi = rargs[0], rargs[1]
            step = rargs[2] if len(rargs) > 2 else 1
            if step == 0:
                raise CypherSyntaxError("range() step must be non-zero")
            p.expect("kw", "AS")
            alias = p.expect("word").text
            spark = graph.vertices.sparkSession
            # inclusive hi → exclusive end, stepping toward the bound;
            # a step pointing away yields the empty relation, as in Cypher
            df = spark.range(lo, hi + (1 if step > 0 else -1), step).select(
                F.col("id").alias(alias)
            )
            cm = _bare_colmap({alias}, None, df)
            cm.stage_graph = graph
            return _finish_read(df, cm, p, bare=True)
        if p.at("punct", "$"):
            vals = p.parse_value(None)
            if not isinstance(vals, list):
                raise CypherSyntaxError("UNWIND $param requires a list value")
        else:
            p.expect("punct", "[")
            vals: list[Any] = []
            if not p.at("punct", "]"):
                while True:
                    vals.append(p.parse_value(None))
                    if p.at("punct", ","):
                        p.next()
                        continue
                    break
            p.expect("punct", "]")
        p.expect("kw", "AS")
        alias = p.expect("word").text
        # homogeneity check at parse time — a mixed list would otherwise
        # surface as a Spark cast error at execution (array literals are
        # monomorphic); int+float promote to float, as in Cypher
        kinds = set()
        for v in vals:
            if v is None:
                continue
            if isinstance(v, bool):
                kinds.add("boolean")
            elif isinstance(v, (int, float)):
                kinds.add("number")
            elif isinstance(v, str):
                kinds.add("string")
            elif isinstance(v, dict):
                kinds.add("map")
            else:
                kinds.add(type(v).__name__)
        if len(kinds) > 1:
            raise CypherSyntaxError(
                "UNWIND list must be homogeneous; got mixed "
                + "/".join(sorted(kinds))
            )
        spark = graph.vertices.sparkSession
        if kinds == {"map"}:
            # list of literal maps — the inline-batch idiom ``UNWIND
            # [{a: 1}, {a: 2}] AS r`` (same row shape as UNWIND $rows);
            # each map becomes one struct row, missing keys read null,
            # and a null list element yields one row with a null value
            # (openCypher — matching the scalar literal-list path, where
            # explode keeps null array elements)
            allkeys = sorted({k for v in vals if v is not None for k in v})
            rows = [
                {
                    "__isnull__": v is None,
                    **{k: (None if v is None else v.get(k)) for k in allkeys},
                }
                for v in vals
            ]
            try:
                flat = spark.createDataFrame(rows)
            except Exception:
                raise CypherSyntaxError(
                    "UNWIND map-list values must be type-consistent "
                    "per key (and no key may be null in every map)"
                ) from None
            df = flat.select(
                F.when(
                    ~F.col("__isnull__"),
                    F.struct(*[F.col(k) for k in allkeys]),
                ).alias(alias)
            )
            cm = _bare_colmap({alias}, _struct_outputs(df), df)
            cm.stage_graph = graph
            return _finish_read(df, cm, p, bare=True)
        if kinds == {"number"} and any(isinstance(v, float) for v in vals):
            vals = [None if v is None else float(v) for v in vals]
        if vals:
            df = spark.range(1).select(F.explode(F.lit(vals)).alias(alias))
        else:
            df = spark.range(0).select(F.lit(None).alias(alias))
        cm = _bare_colmap({alias}, None, df)
        cm.stage_graph = graph
        return _finish_read(df, cm, p, bare=True)
    p.expect("kw", "MATCH")
    sp_var = None
    sp_all = False
    path_var = None
    if (
        p.at("word")
        and p.peek(1) is not None
        and p.peek(1).text == "="
        and p.peek(2) is not None
        and p.peek(2).kind == "word"
        and p.peek(2).text in ("shortestPath", "allShortestPaths")
    ):
        sp_var = p.next().text
        p.next()  # =
        sp_all = p.next().text == "allShortestPaths"
        p.expect("punct", "(")
        pat = p.parse_pattern()
        p.expect("punct", ")")
        if not isinstance(pat, EdgePat) or pat.hops is None:
            raise CypherSyntaxError(
                "shortestPath requires a bounded variable-length pattern "
                "(a)-[:T*lo..hi]->(b)"
            )
        # comma siblings in the same MATCH clause (round 9): the path
        # composes with them as a chain seeded by the BFS frame
        seq = [pat]
        if p.at("punct", ","):
            p.next()
            seq = [pat, *p.parse_pattern_seq()]
    elif (
        p.at("word")
        and p.peek(1) is not None
        and p.peek(1).text == "="
        and p.peek(2) is not None
        and p.peek(2).kind == "punct"
        and p.peek(2).text == "("
    ):
        # MATCH p = (a)-[:T*lo..hi]->(b): a named path over a plain
        # variable-length pattern; length(p) reads the per-chain length,
        # nodes(p)/relationships(p) read the per-chain id arrays.
        path_var = p.next().text
        p.next()  # =
        pat = p.parse_pattern()
        if not isinstance(pat, EdgePat) or pat.hops is None:
            raise CypherSyntaxError(
                "a path variable requires a variable-length pattern "
                "(a)-[:T*lo..hi]->(b) or shortestPath()/allShortestPaths()"
            )
        seq = [pat]
    else:
        seq = p.parse_pattern_seq()
        pat = seq[0]
    disj = None
    if p.at("kw", "WHERE"):
        p.next()
        disj = p.parse_where()
    # inline property maps desugar to WHERE conjuncts per clause (ANDed
    # into every disjunct — maps distribute over OR); synthetic variables
    # must avoid every user variable across all clauses, so collect first
    chain_pats, chain_disjs = list(seq), ([disj] if disj is not None else [])
    #: per-MATCH-clause pattern groups — openCypher's relationship
    #: isomorphism (distinct edges) holds WITHIN one MATCH clause, not
    #: across clauses
    groups: list[list[NodePat | EdgePat]] = [list(seq)]
    while p.at("kw", "MATCH"):  # multi-clause MATCH chain
        p.next()
        g = p.parse_pattern_seq()
        chain_pats.extend(g)
        groups.append(g)
        if p.at("kw", "WHERE"):
            p.next()
            chain_disjs.append(p.parse_where())
    taken = _pattern_vars(chain_pats)
    prop_conds = _desugar_inline_props(chain_pats, taken)
    if len(chain_pats) == 1:
        disj = _and_into(disj, prop_conds)
        if chain_disjs:
            chain_disjs[0] = disj
        elif disj is not None:
            chain_disjs.append(disj)
    elif prop_conds:
        # chains filter post-join, so the maps become one extra conjunct
        chain_disjs.append([list(prop_conds)])
    opt_clauses: list = []
    while p._at_word_ci("OPTIONAL"):
        p.next()
        p.expect("kw", "MATCH")
        opt_pat = p.parse_pattern()
        opt_disj = None
        if p.at("kw", "WHERE"):
            p.next()
            opt_disj = p.parse_where()
        bound_conds_i: list[Cond] = []
        if isinstance(opt_pat, EdgePat):
            # optional-side inline maps filter the optional side pre-join
            # (same contract as the optional WHERE). A map on the BOUND
            # endpoint is a predicate of the OPTIONAL pattern: rows that
            # fail it null-extend rather than drop, so it is carried into
            # the LEFT-join condition (never a pre-filter on the base).
            for nd in (opt_pat.src, opt_pat.dst):
                if nd.var is not None and nd.var in taken and nd.props:
                    bound_conds_i.extend(
                        Cond(PropRef(nd.var, k), "=", v)
                        for k, v in nd.props.items()
                    )
                    nd.props = {}
        opt_disj = _and_into(
            opt_disj, _desugar_inline_props([opt_pat], taken)
        )
        opt_clauses.append((opt_pat, opt_disj, bound_conds_i))
    if sp_var is not None:
        extra = chain_pats[1:]
        df, colmap = _shortest_path(
            graph,
            pat,
            sp_var,
            all_paths=sp_all,
            carry_paths=_path_accessors_ahead(p, sp_var),
            src_conds=_common_single_var_conds(disj, pat.src.var),
        )
        if extra:
            # chain composition (round 9): the counting-BFS frame seeds
            # _match_chain — its endpoint columns rename to the chain's
            # ``<var>_<col>`` convention and every remaining pattern
            # (comma siblings + later MATCH clauses) joins on by
            # name-based unification, exactly the X240 var-length-segment
            # path. Same-clause relationship uniqueness between the
            # path's internal edges and a sibling relationship is only
            # vacuously satisfiable when their type sets cannot overlap —
            # Neo4j re-selects among TIED shortest paths in the
            # overlapping case, so silently filtering our one
            # representative path would mis-answer; that case stays a
            # loud typed error (workaround: a separate MATCH clause,
            # where openCypher scopes uniqueness per clause).
            for sib in groups[0][1:]:
                if isinstance(sib, EdgePat) and _rel_types_overlap(
                    pat.rel_type, sib.rel_type
                ):
                    raise CypherSyntaxError(
                        "a relationship sharing a MATCH clause with "
                        "shortestPath() needs a relationship type "
                        "disjoint from the path's; move it to its own "
                        "MATCH clause"
                    )
            src_v, dst_v = pat.src.var, pat.dst.var
            if src_v is None or dst_v is None or src_v == dst_v:
                raise CypherSyntaxError(
                    "shortestPath endpoints need distinct variables to "
                    "compose with additional patterns"
                )
            ren = {}
            for c in df.columns:
                if c.startswith("a_"):
                    ren[c] = f"{src_v}_{c[2:]}"
                elif c.startswith("b_"):
                    ren[c] = f"{dst_v}_{c[2:]}"
            df = df.select(
                *[F.col(c).alias(ren.get(c, c)) for c in df.columns]
            )
            vcols = graph.vertices.columns
            seed_vm = {
                v: [f"{v}_{c}" for c in vcols] for v in (src_v, dst_v)
            }
            _assign_anon_vars(extra, taken)
            chain_groups = [g for g in [groups[0][1:], *groups[1:]] if g]
            df, chain_cm = _match_chain(
                graph, extra, chain_groups, seed=(df, seed_vm)
            )
            sp_cm = colmap

            def composed_cm(ref: PropRef) -> Column:
                if ref.var == sp_var:
                    return sp_cm(ref)
                return chain_cm(ref)

            composed_cm.var_props = dict(chain_cm.var_props)
            composed_cm.var_kinds = dict(chain_cm.var_kinds)
            composed_cm.scope_graph = graph
            colmap = composed_cm
            for dd in chain_disjs:
                df = _apply_scope_where(df, colmap, graph, dd)
            disj = None
        # OPTIONAL MATCH after a shortestPath base (round 8): the path's
        # endpoints are ordinary node variables of the scope — one left
        # equi-join per clause, exactly the chain composition
        for i, (opt_pat_i, opt_disj_i, bound_conds_i) in enumerate(
            opt_clauses
        ):
            if disj is not None:
                # apply the base WHERE before any null-extension (the
                # optional clauses must see only surviving path rows)
                df = df.filter(
                    _where_to_column(disj, colmap, set(df.columns), df)
                )
                disj = None
            df, colmap = _optional_join_prefixed(
                graph, df, colmap, opt_pat_i, opt_disj_i, i, bound_conds_i
            )
        opt_clauses = []
    elif len(chain_pats) > 1 or (
        opt_clauses and not isinstance(pat, NodePat)
    ):
        # a single-EDGE base with OPTIONAL MATCH clauses runs as a
        # one-clause chain: same prefixed frame, same left-join-per-clause
        # optional composition (MATCH (a)-[e]->(b) OPTIONAL MATCH …)
        _assign_anon_vars(chain_pats, taken)
        # relationship isomorphism (incl. var-length segments) is applied
        # inside _match_chain, per MATCH-clause group
        df, colmap = _match_chain(graph, chain_pats, groups)
        # each clause's WHERE is a conjunct over the joined pattern (all
        # clauses are inner joins, so post-join filtering is equivalent);
        # the shared helper gives chain WHEREs the full operand machinery
        # (pattern predicates, COUNT { } / comprehension operands) too
        for d in chain_disjs:
            df = _apply_scope_where(df, colmap, graph, d)
        disj = None
        # OPTIONAL MATCH after a multi-clause chain (round-8 verdict ask
        # #5): one left equi-join per clause onto the var-prefixed frame,
        # anchored on whichever chain node variable the pattern binds
        for i, (opt_pat_i, opt_disj_i, bound_conds_i) in enumerate(
            opt_clauses
        ):
            df, colmap = _optional_join_prefixed(
                graph, df, colmap, opt_pat_i, opt_disj_i, i, bound_conds_i
            )
        opt_clauses = []
    elif opt_clauses:
        if not isinstance(pat, NodePat):
            raise CypherSyntaxError(
                "OPTIONAL MATCH requires a plain MATCH (n[:Label]) base pattern"
            )
        df, colmap = _optional_match(graph, pat, opt_clauses, disj)
        disj = None  # base WHERE already applied pre-join inside the helper
    elif isinstance(pat, NodePat):
        var = pat.var
        df = graph.nodes(pat.label)
        if disj is not None and any(
            isinstance(c, PatternCond) for conj in disj for c in conj
        ):
            if len(disj) > 1:
                raise CypherSyntaxError(
                    "pattern predicates cannot be OR-combined"
                )
            pattern_conds = [c for c in disj[0] if isinstance(c, PatternCond)]
            rest = [c for c in disj[0] if not isinstance(c, PatternCond)]
            disj = [rest] if rest else None
            # each pattern predicate is one semi-join (positive) or
            # anti-join (NOT) against the distinct qualifying edge sources
            # — the scale-correct existential form (never materializes the
            # per-node match multiplicity)
            for pc in pattern_conds:
                if pc.var != var:
                    raise CypherSyntaxError(f"unknown variable {pc.var!r}")
                df = df.join(
                    _pattern_qualifying_ids(graph, pc),
                    F.col("id") == F.col("__pp_id"),
                    "left_anti" if pc.negated else "left_semi",
                )

        def colmap(ref: PropRef) -> Column:
            if ref.var != var:
                raise CypherSyntaxError(f"unknown variable {ref.var!r}")
            return F.col("id" if ref.prop is None else ref.prop)

        colmap.var_props = {
            var: [c for c in graph.vertices.columns
                 if c not in ("id", "label", EXTRA_LABELS)]
        }
        colmap.var_kinds = {var: "node"}
        colmap.pattern_count_ctx = (graph, var)

    elif pat.hops is not None:
        carry_vl = path_var is not None and _path_accessors_ahead(p, path_var)
        df = _varlength_paths(
            graph,
            pat,
            carry_paths=carry_vl,
            src_conds=_common_single_var_conds(disj, pat.src.var),
        )
        names = {pat.src.var: "a_", pat.dst.var: "b_"}

        def colmap(ref: PropRef) -> Column:
            if path_var is not None and ref.var == path_var:
                if ref.prop == "length":
                    return F.col("__path_len")
                if carry_vl and ref.prop == "__nodes":
                    return F.col("__path_nodes")
                if carry_vl and ref.prop == "__rels":
                    return F.col("__path_rels")
                raise CypherSyntaxError(
                    f"only length({path_var}), nodes({path_var}) and "
                    f"relationships({path_var}) are supported on a path "
                    "variable; bind the endpoints for their properties"
                )
            prefix = names.get(ref.var)
            if prefix is None:
                raise CypherSyntaxError(f"unknown variable {ref.var!r}")
            return F.col(f"{prefix}{'id' if ref.prop is None else ref.prop}")

        # scope metadata (round 8): the var-length endpoints are ordinary
        # node variables — COUNT { } / comprehension binding and pattern
        # predicates anchor on them like any scope
        _vl_vprops = [
            c for c in graph.vertices.columns
            if c not in ("id", "label", EXTRA_LABELS)
        ]
        colmap.var_props = {
            v: _vl_vprops
            for v in (pat.src.var, pat.dst.var)
            if v is not None
        }
        colmap.var_kinds = {v: "node" for v in colmap.var_props}
        colmap.scope_graph = graph

    else:
        df = graph.expand(pat.src.label, pat.rel_type, pat.dst.label)
        if pat.undirected:
            # (a)-[e]-(b): union the reversed orientation (pattern src
            # bound to the edge's dst side — expand with swapped labels
            # and swapped prefixes so both frames share one naming).
            # Self-loops match the pattern once, so the reversed frame
            # drops them; rows stay distinct because orientations differ
            # on (edge id, binding side).
            back = graph.expand(
                pat.dst.label,
                pat.rel_type,
                pat.src.label,
                src_prefix="b_",
                dst_prefix="a_",
            ).filter(F.col("src") != F.col("dst"))
            df = df.unionByName(back.select(*df.columns))
        names = {pat.src.var: "a_", pat.dst.var: "b_"}

        def colmap(ref: PropRef) -> Column:
            if ref.var == pat.var:  # the edge variable
                return F.col("id" if ref.prop is None else ref.prop)
            prefix = names.get(ref.var)
            if prefix is None:
                raise CypherSyntaxError(f"unknown variable {ref.var!r}")
            return F.col(f"{prefix}{'id' if ref.prop is None else ref.prop}")

        vertex_props = [
            c for c in graph.vertices.columns
                 if c not in ("id", "label", EXTRA_LABELS)
        ]
        colmap.var_props = {
            v: vertex_props for v in (pat.src.var, pat.dst.var) if v is not None
        }
        colmap.var_kinds = {v: "node" for v in colmap.var_props}
        colmap.scope_graph = graph
        if pat.var is not None:
            colmap.var_props[pat.var] = [
                c
                for c in graph.edges.columns
                if c not in ("id", "src", "dst", "rel_type")
            ]
            colmap.var_kinds[pat.var] = "edge"

    if disj is not None:
        df = _apply_scope_where(df, colmap, graph, disj)

    colmap.stage_graph = graph
    return _finish_read(df, colmap, p, bare=False)


def _apply_scope_where(
    df: DataFrame, colmap, graph: PropertyGraph, disj
) -> DataFrame:
    """One MATCH-scope WHERE, with the full operand machinery: pattern
    predicates over any NODE variable of the scope compile to one
    semi/anti-join each against the distinct qualifying ids (never the
    per-node match multiplicity); WHERE-position COUNT { } /
    pattern-comprehension operands bind per-node helper columns via left
    joins; the residue filters through ``_where_to_column``. Shared by
    the single-pattern path, MATCH chains, and shortestPath-chain
    composition — queries outside the supported scope raise the same
    typed errors everywhere."""
    if disj is None:
        return df
    if any(isinstance(c, PatternCond) for conj in disj for c in conj):
        if len(disj) > 1:
            raise CypherSyntaxError(
                "pattern predicates cannot be OR-combined"
            )
        kinds = getattr(colmap, "var_kinds", {})
        pattern_conds = [c for c in disj[0] if isinstance(c, PatternCond)]
        rest = [c for c in disj[0] if not isinstance(c, PatternCond)]
        disj = [rest] if rest else None
        for pc in pattern_conds:
            if kinds.get(pc.var) != "node":
                raise CypherSyntaxError(
                    f"pattern predicate on {pc.var!r} requires a "
                    "node variable of this MATCH"
                )
            df = df.join(
                _pattern_qualifying_ids(graph, pc),
                colmap(PropRef(pc.var, None)) == F.col("__pp_id"),
                "left_anti" if pc.negated else "left_semi",
            )
    if disj is not None and any(
        isinstance(c.left, (CountPattern, PatternComp))
        or isinstance(c.right, (CountPattern, PatternComp))
        or isinstance(c.left, (BinOp, FuncCall))
        or isinstance(c.right, (BinOp, FuncCall))
        for conj in disj
        for c in conj
    ):
        df = _bind_pattern_subqueries(df, colmap, None, disj)
    if disj is not None:
        df = df.filter(_where_to_column(disj, colmap, set(df.columns), df))
    return df


def _pattern_qualifying_ids(graph: PropertyGraph, pc: PatternCond) -> DataFrame:
    """ids satisfying one pattern predicate at its bound end(s) — the
    semi/anti-join side (``__pp_id``). The target label (if any)
    constrains the OTHER endpoint as a semi-join, and the block form's
    inner WHERE filters a column-prefixed edge(+far-node) frame — per-node
    match multiplicity never materializes either way."""
    edges = graph.edges
    if pc.rel_type is not None:
        edges = edges.filter(rel_type_cond(pc.rel_type))

    def qualifying(bound_end: str) -> DataFrame:
        other_end = "dst" if bound_end == "src" else "src"
        if pc.pred is None:
            e = edges
            if pc.dst_label is not None:
                lbl = graph.nodes(pc.dst_label).select(
                    F.col("id").alias("__pp_l")
                )
                e = e.join(
                    lbl, F.col(other_end) == F.col("__pp_l"), "left_semi"
                )
            return e.select(F.col(bound_end).alias("__pp_id"))
        e = edges.select(
            F.col(bound_end).alias("__pp_id"),
            F.col(other_end).alias("__pp_other"),
            *[F.col(c).alias(f"__ppe_{c}") for c in graph.edges.columns],
        )
        if pc.dst_label is not None or pc.dst_var is not None:
            nodes = (
                graph.nodes(pc.dst_label)
                if pc.dst_label is not None
                else graph.vertices
            )
            nn = nodes.select(
                *[F.col(c).alias(f"__ppn_{c}") for c in graph.vertices.columns]
            )
            e = e.join(nn, F.col("__pp_other") == F.col("__ppn_id"))
        icolmap = _pattern_scope_colmap(
            "an EXISTS { } subquery", pc.edge_var, pc.dst_var,
            "__ppe_", "__ppn_",
        )
        e = e.filter(_where_to_column(pc.pred, icolmap, set(e.columns), e))
        return e.select("__pp_id")

    if pc.direction == "out":
        return qualifying("src")
    if pc.direction == "in":
        return qualifying("dst")
    return qualifying("src").unionByName(qualifying("dst"))


def _expr_vars(x, out: set[str]) -> None:
    """Collect every variable/alias name referenced by expression ``x``
    (PropRef vars and bare names) into ``out`` — used to validate that an
    unanchored pipeline-MATCH WHERE actually correlates the new pattern
    variable with the outer scope."""
    if isinstance(x, PropRef):
        out.add(x.var)
    elif isinstance(x, BareRef):
        out.add(x.name)
    elif isinstance(x, (BinOp,)):
        _expr_vars(x.left, out)
        _expr_vars(x.right, out)
    elif isinstance(x, FuncCall):
        _expr_vars(x.arg, out)
        for a in x.extra:
            _expr_vars(a, out)
    elif isinstance(x, IsNullExpr):
        _expr_vars(x.arg, out)
    elif isinstance(x, (IndexExpr, SliceExpr)):
        _expr_vars(x.base, out)
        for a in (getattr(x, "index", None), getattr(x, "lo", None),
                  getattr(x, "hi", None)):
            _expr_vars(a, out)
    elif isinstance(x, FieldAccess):
        _expr_vars(x.base, out)
    elif isinstance(x, ListComp):
        _expr_vars(x.source, out)
        # the lambda body can reference OUTER variables too (e.g.
        # ``[x IN a.tags WHERE x = b.name]`` references b) — collect them,
        # minus the comprehension-bound name, so single-var classification
        # (_common_single_var_conds) never pushes a two-var conjunct into a
        # one-var prefilter
        inner: set[str] = set()
        if x.pred is not None:
            _disj_vars(x.pred, inner)
        _expr_vars(x.expr, inner)
        inner.discard(x.var)
        out |= inner
    elif isinstance(x, ReduceExpr):
        _expr_vars(x.init, out)
        _expr_vars(x.source, out)
        inner = set()
        _expr_vars(x.expr, inner)
        inner.discard(x.var)
        inner.discard(x.acc)
        out |= inner
    elif isinstance(x, CaseExpr):
        for disj, res in x.whens:
            _disj_vars(disj, out)
            _expr_vars(res, out)
        _expr_vars(x.default, out)
    elif isinstance(x, MapLit):
        for _, v in x.entries:
            _expr_vars(v, out)
    elif isinstance(x, ListExpr):
        for v in x.items:
            _expr_vars(v, out)


def _disj_vars(disj, out: set[str]) -> None:
    for conj in disj:
        for cond in conj:
            if hasattr(cond, "left"):
                _expr_vars(cond.left, out)
                _expr_vars(getattr(cond, "right", None), out)


def _finish_read(df: DataFrame, colmap, p: "_Parser", bare: bool) -> DataFrame:
    """Shared tail of every read form: ``[WITH ... | UNWIND x AS y]*
    RETURN items [ORDER BY ...] [SKIP n] [LIMIT m]`` — parsed and executed
    stage by stage (openCypher clause order ``WITH items [ORDER BY/LIMIT]
    [WHERE]``). ``bare`` is True when the incoming row scope is named
    scalar columns (a standalone UNWIND source) rather than pattern
    variables; every WITH horizon flips the scope to bare."""
    graph = getattr(colmap, "stage_graph", None)
    wopt_n = 0
    while (
        p.at("kw", "WITH")
        or p.at("kw", "UNWIND")
        or (
            p._at_word_ci("OPTIONAL")
            or p.at("kw", "MATCH")
            or (
                p._at_word_ci("CALL")
                and p.peek(1) is not None
                and p.peek(1).text == "{"
            )
        )
    ):
        if not bare and not (p.at("kw", "WITH") or p.at("kw", "UNWIND")):
            # MATCH/CALL directly after a pattern clause (no interposed
            # WITH) — openCypher allows it; desugar by injecting an
            # implicit ``WITH *`` so the pattern scope flips to the bare
            # carried-variable scope every stage form already speaks.
            # (The first-stage OPTIONAL MATCH special form was consumed
            # by _read_single before this loop ever runs.)
            p.toks[p.i:p.i] = [_Tok("kw", "WITH"), _Tok("punct", "*")]
            continue
        if p._at_word_ci("CALL"):
            # correlated CALL subquery (Neo4j 5 importing WITH):
            # ``WITH n CALL { WITH n MATCH (n)-[e:T]->(m[:L]) [WHERE …]
            # RETURN items ORDER BY … LIMIT k }`` — the per-anchor-row
            # subquery whose canonical use is TOP-K-PER-KEY: ORDER BY +
            # LIMIT apply PER anchor (a row_number window over the
            # anchor's edge endpoint), never globally — and the window
            # runs on the expansion side BEFORE the join, so the k-cap
            # prunes the fan-out ahead of the outer row multiplication.
            # Plain CALL inner-joins (anchors with no inner rows drop,
            # per Neo4j). Aggregating inner RETURNs are rejected toward
            # COUNT { } / pattern comprehensions, which already compile
            # to the non-multiplying left-join forms.
            if graph is None:
                raise CypherSyntaxError(
                    "CALL after WITH requires a graph scope"
                )
            p.next()
            p.next()  # {
            if not p.at("kw", "WITH"):
                raise CypherSyntaxError(
                    "CALL { } mid-pipeline must import its anchor "
                    "(CALL { WITH n MATCH (n)-[e:T]->(m) … }); the "
                    "uncorrelated form is only valid at the start of a "
                    "query"
                )
            p.next()
            ivar = p.expect("word").text
            structs = dict(getattr(colmap, "structs", {}))
            names = set(getattr(colmap, "star_names", set()))
            if ivar not in structs or "id" not in structs[ivar]:
                raise CypherSyntaxError(
                    f"CALL imports {ivar!r}, which is not a carried node "
                    "in scope (WITH n CALL { WITH n … })"
                )
            p.expect("kw", "MATCH")
            cpat = p.parse_pattern()
            if not isinstance(cpat, EdgePat) or cpat.hops is not None:
                raise CypherSyntaxError(
                    "correlated CALL supports a single-hop pattern "
                    "anchored on the imported node"
                )
            c_is_src = cpat.src.var == ivar
            c_is_dst = cpat.dst.var == ivar
            if c_is_src == c_is_dst:
                raise CypherSyntaxError(
                    "the imported variable must be exactly one endpoint "
                    "of the CALL pattern"
                )
            c_other = cpat.dst if c_is_src else cpat.src
            for v in (cpat.var, c_other.var):
                if v is not None and (v in structs or v in names):
                    raise CypherSyntaxError(
                        f"variable {v!r} is already bound in this scope"
                    )
            c_disj = None
            if p.at("kw", "WHERE"):
                p.next()
                c_disj = p.parse_where()
            # inline property maps (round-8 verdict ask #6): the imported
            # endpoint's map filters the CURRENT rows (CALL inner-joins,
            # so pre-join == post-join); edge / free-endpoint maps desugar
            # into the inner WHERE like every first-stage clause
            c_bound_nd = cpat.src if c_is_src else cpat.dst
            if c_bound_nd.props:
                bconds = [
                    Cond(PropRef(ivar, k), "=", v)
                    for k, v in c_bound_nd.props.items()
                ]
                c_bound_nd.props = {}
                df = df.filter(
                    F.coalesce(
                        _where_to_column(
                            [bconds], colmap, set(df.columns), df
                        ),
                        F.lit(False),
                    )
                )
            call_taken = set(structs) | names | {
                v for v in (cpat.var, c_other.var) if v is not None
            }
            c_disj = _and_into(
                c_disj, _desugar_inline_props([cpat], call_taken)
            )
            p.expect("kw", "RETURN")
            c_distinct, c_items = p.parse_return(allow_bare=False)
            c_order, c_skip, c_limit = p.parse_tail(
                require_end=False, allow_bare=False
            )
            p.expect("punct", "}")
            if c_skip is not None and not c_order:
                raise CypherSyntaxError(
                    "SKIP inside a correlated CALL requires ORDER BY "
                    "(an unordered per-anchor cut would be "
                    "nondeterministic)"
                )
            if c_limit is not None and not c_order:
                raise CypherSyntaxError(
                    "LIMIT inside a correlated CALL requires ORDER BY "
                    "(an unordered per-anchor cut would be "
                    "nondeterministic)"
                )
            c_has_agg = any(_contains_agg(i.expr) for i in c_items)
            if c_has_agg and any(
                _contains_agg(i.expr) and not isinstance(i.expr, AggCall)
                for i in c_items
            ):
                # the per-anchor groupBy below splits items shallowly;
                # composite aggregate expressions would land on the key
                # side and mis-group — reject loudly until supported
                raise CypherSyntaxError(
                    "composite aggregate expressions are not supported "
                    "inside CALL { }; RETURN the plain aggregate and "
                    "compute the expression outside"
                )
            # DISTINCT over an aggregating RETURN is a no-op (grouping
            # already yields one row per distinct key tuple) — openCypher
            # accepts it, so we do too
            if c_has_agg and c_distinct:
                c_distinct = False
            # (aggregating ORDER BY keys validate where the sort builds:
            # aliases, expressions equal to a projected item, or
            # expressions computed over aliases — Neo4j's post-aggregation
            # ORDER BY scope)
            ep, op = f"__we{wopt_n}_", f"__wo{wopt_n}_"
            wopt_n += 1
            e = graph.edges
            if cpat.rel_type is not None:
                e = e.filter(rel_type_cond(cpat.rel_type))
            if cpat.undirected:
                # either-orientation CALL pattern: the symmetrized frame,
                # anchored on whichever side the imported variable names
                e = _sym_edges(e)
            e = e.select(
                *[F.col(c).alias(f"{ep}{c}") for c in graph.edges.columns]
            )
            other_df = graph.nodes(c_other.label).select(
                *[F.col(c).alias(f"{op}{c}") for c in graph.vertices.columns]
            )
            bound_end = "src" if c_is_src else "dst"
            free_end = "dst" if c_is_src else "src"
            side = e.join(
                other_df, F.col(f"{ep}{free_end}") == F.col(f"{op}id")
            )
            icolmap = _pattern_scope_colmap(
                "a CALL subquery",
                cpat.var,
                c_other.var,
                ep,
                op,
                vertex_props=[
                    c for c in graph.vertices.columns
                    if c not in ("id", "label", EXTRA_LABELS)
                ],
                edge_props=[
                    c for c in graph.edges.columns
                    if c not in ("id", "src", "dst", "rel_type")
                ],
            )
            if c_disj is not None:
                side = side.filter(
                    _where_to_column(c_disj, icolmap, set(side.columns), side)
                )
            anchor = F.col(f"{ep}{bound_end}")
            out_names = [_out_name(i) for i in c_items]
            for nm in out_names:
                if nm in names or nm in structs:
                    raise CypherSyntaxError(
                        f"CALL output {nm!r} collides with a variable "
                        "already in scope; alias it"
                    )
            if c_has_agg:
                # per-anchor aggregation (round-8 verdict ask #7): ONE
                # partial-aggregated groupBy on the expansion side BEFORE
                # the join — the COUNT { } shape generalized to any
                # aggregate. Aggregate-only RETURNs keep every anchor
                # (aggregation over zero rows still yields a row: count 0,
                # sum/min/max null, collect []) via a left join; a RETURN
                # that mixes grouping keys drops empty anchors, exactly
                # the plain-CALL inner-join contract.
                key_cols = [
                    _expr_column(i.expr, icolmap, side).alias(nm)
                    for i, nm in zip(c_items, out_names)
                    if not isinstance(i.expr, AggCall)
                ]
                agg_cols = [
                    _agg_column(i.expr, icolmap, side).alias(nm)
                    for i, nm in zip(c_items, out_names)
                    if isinstance(i.expr, AggCall)
                ]
                side = side.groupBy(
                    anchor.alias("__call_anchor"), *key_cols
                ).agg(*agg_cols)
                side = side.select("__call_anchor", *out_names)
                if (
                    c_skip is not None or c_limit is not None
                ) and not key_cols:
                    # one (possibly fabricated count-0) row per anchor: a
                    # SKIP/LIMIT cut would have to apply to rows the left
                    # join fabricates AFTER this point — reject loudly
                    raise CypherSyntaxError(
                        "SKIP/LIMIT on an aggregate-only CALL RETURN is "
                        "not supported (each anchor yields exactly one "
                        "row); drop the SKIP/LIMIT"
                    )
                def agg_sort_col(key) -> Column:
                    # post-aggregation key resolution (round 9): a RETURN
                    # alias, an expression EQUAL to a projected item's AST
                    # (Neo4j lets ORDER BY restate a grouping key or
                    # aggregate — ``RETURN m.born AS born, count(*) AS c
                    # ORDER BY m.born``), or an expression over aliases
                    # (``ORDER BY toLower(friend)``)
                    if isinstance(key, str):
                        if key not in out_names:
                            raise CypherSyntaxError(
                                f"ORDER BY key {key!r} is not a CALL "
                                "RETURN alias"
                            )
                        return F.col(key)
                    for i, nm in zip(c_items, out_names):
                        if i.expr == key:
                            return F.col(nm)

                    def acolmap(ref) -> Column:
                        v = (
                            ref.var
                            if isinstance(ref, PropRef)
                            else getattr(ref, "name", None)
                        )
                        prop = ref.prop if isinstance(ref, PropRef) else None
                        if v in out_names and prop is None:
                            return F.col(v)
                        raise CypherSyntaxError(
                            "ORDER BY inside an aggregating CALL may only "
                            "reference RETURN items or expressions over "
                            "them (the post-aggregation scope)"
                        )

                    return _expr_column(key, acolmap, side)

                if c_order and key_cols:
                    # per-anchor ORDER BY / SKIP / LIMIT over the grouped
                    # rows (top-k groups per anchor): one window cut; the
                    # full projection tiebreaks deterministically
                    sort_cols = [
                        _order_dir(agg_sort_col(key), asc)
                        for key, asc in c_order
                    ]
                    w = Window.partitionBy("__call_anchor").orderBy(
                        *sort_cols, *[F.col(n) for n in out_names]
                    )
                    side = side.withColumn(
                        "__call_rn", F.row_number().over(w)
                    )
                    if c_skip is not None:
                        side = side.filter(F.col("__call_rn") > c_skip)
                    if c_limit is not None:
                        side = side.filter(
                            F.col("__call_rn") <= (c_skip or 0) + c_limit
                        )
                    side = side.drop("__call_rn")
                elif c_order:
                    # aggregate-only: exactly one row per anchor, so the
                    # inner ORDER BY cannot change anything — validate the
                    # keys and move on
                    for key, _asc in c_order:
                        agg_sort_col(key)
                df = df.join(
                    side,
                    F.col(ivar)["id"] == F.col("__call_anchor"),
                    "inner" if key_cols else "left",
                ).drop("__call_anchor")
                if not key_cols:
                    side_types = dict(side.dtypes)
                    for i, nm in zip(c_items, out_names):
                        if i.expr.fn == "COUNT":
                            df = df.withColumn(
                                nm,
                                F.coalesce(
                                    F.col(nm), F.lit(0).cast("long")
                                ),
                            )
                        elif i.expr.fn == "COLLECT":
                            df = df.withColumn(
                                nm,
                                F.coalesce(
                                    F.col(nm),
                                    F.array().cast(side_types[nm]),
                                ),
                            )
            else:
                if c_distinct:
                    # dedup the PROJECTED inner rows (anchor included)
                    # before any per-anchor ranking — openCypher's
                    # DISTINCT-then-ORDER BY-then-LIMIT order
                    side = side.select(
                        anchor.alias("__call_anchor"),
                        *[
                            _expr_column(i.expr, icolmap, side).alias(nm)
                            for i, nm in zip(c_items, out_names)
                        ],
                    ).dropDuplicates()
                    if c_order:
                        # post-DISTINCT scope: the projected aliases only.
                        # Plain keys name an alias; expression keys may
                        # compute over aliases (ORDER BY toLower(nm) after
                        # RETURN DISTINCT x.name AS nm)
                        def acolmap(ref) -> Column:
                            v = (
                                ref.var
                                if isinstance(ref, PropRef)
                                else getattr(ref, "name", None)
                            )
                            prop = (
                                ref.prop if isinstance(ref, PropRef) else None
                            )
                            if v in out_names and prop is None:
                                return F.col(v)
                            raise CypherSyntaxError(
                                "ORDER BY inside CALL { RETURN DISTINCT } "
                                "may only reference the RETURN aliases"
                            )

                        sort_cols = []
                        for key, asc in c_order:
                            if isinstance(key, str):
                                if key not in out_names:
                                    raise CypherSyntaxError(
                                        f"ORDER BY key {key!r} is not a "
                                        "CALL RETURN alias"
                                    )
                                kc = F.col(key)
                            else:
                                kc = _expr_column(key, acolmap, side)
                            sort_cols.append(_order_dir(kc, asc))
                        # rows are distinct, so the full projection is a
                        # deterministic tiebreak
                        w = Window.partitionBy("__call_anchor").orderBy(
                            *sort_cols, *[F.col(n) for n in out_names]
                        )
                        side = side.withColumn(
                            "__call_rn", F.row_number().over(w)
                        )
                else:
                    if c_order:
                        alias_map = {
                            nm: i.expr
                            for nm, i in zip(out_names, c_items)
                        }
                        sort_cols = []
                        for key, asc in c_order:
                            if isinstance(key, str):
                                if key not in alias_map:
                                    raise CypherSyntaxError(
                                        f"ORDER BY key {key!r} is not a "
                                        "CALL RETURN alias"
                                    )
                                key = alias_map[key]
                            sort_cols.append(
                                _order_dir(
                                    _expr_column(key, icolmap, side), asc
                                )
                            )
                        w = Window.partitionBy(anchor).orderBy(
                            *sort_cols, F.col(f"{ep}id")
                        )
                        side = side.withColumn(
                            "__call_rn", F.row_number().over(w)
                        )
                    proj = [anchor.alias("__call_anchor")] + [
                        _expr_column(i.expr, icolmap, side).alias(nm)
                        for i, nm in zip(c_items, out_names)
                    ]
                    if c_order:
                        # inner declared order survives into the joined
                        # frame as a sortable column, so a later ORDER BY
                        # can restate it
                        proj.append(F.col("__call_rn"))
                    side = side.select(*proj)
                if c_order and c_skip is not None:
                    side = side.filter(F.col("__call_rn") > c_skip)
                if c_order and c_limit is not None:
                    side = side.filter(
                        F.col("__call_rn") <= (c_skip or 0) + c_limit
                    )
                df = df.join(
                    side,
                    F.col(ivar)["id"] == F.col("__call_anchor"),
                    "inner",
                ).drop("__call_anchor")
                if c_order:
                    df = df.drop("__call_rn")
            pend = getattr(colmap, "row_order", None)
            colmap = _bare_colmap(
                names | set(structs) | set(out_names),
                _struct_outputs(df),
                df,
            )
            colmap.stage_graph = graph
            if pend:
                colmap.row_order = pend
            continue
        if p._at_word_ci("OPTIONAL") or p.at("kw", "MATCH"):
            # pipeline [OPTIONAL] MATCH: re-expand off a WITH-carried node
            # (``MATCH … WITH n, … [OPTIONAL] MATCH (n)-[e:T]->(m) …``) —
            # one equi-join on the carried struct's id (left for OPTIONAL,
            # inner for plain MATCH), exactly the first-stage shape
            optional = p._at_word_ci("OPTIONAL")
            if graph is None:
                raise CypherSyntaxError(
                    "MATCH after WITH requires a graph scope"
                )
            if optional:
                p.next()
            p.expect("kw", "MATCH")
            opt = p.parse_pattern()
            if p.at("arrow", "-[") or p.at("arrow", "<-["):
                raise CypherSyntaxError(
                    "OPTIONAL MATCH supports a single-hop edge pattern "
                    "(a)-[e]->(b); chain a second OPTIONAL MATCH instead"
                )
            opt_disj = None
            if p.at("kw", "WHERE"):
                p.next()
                opt_disj = p.parse_where(allow_bare=True)
            if isinstance(opt, NodePat) and not optional:
                # unanchored pipeline MATCH — the parameter-batch lookup
                # idiom ``UNWIND $ids AS uid MATCH (n:User) WHERE
                # id(n) = uid``: a fresh node scan joined to the current
                # rows. The clause REQUIRES a WHERE correlating the new
                # variable with the outer scope; the plan is a crossJoin
                # + correlated filter that Catalyst rewrites into an
                # equi-join when the correlation is an equality — the
                # scale-correct shape — while an uncorrelated pattern
                # (a true cartesian) is rejected loudly, matching the
                # first-stage shared-variable contract.
                structs = dict(getattr(colmap, "structs", {}))
                names = set(getattr(colmap, "star_names", set()))
                if opt.var is None:
                    raise CypherSyntaxError(
                        "pipeline MATCH node pattern needs a variable"
                    )
                if opt.var in structs or opt.var in names:
                    raise CypherSyntaxError(
                        f"variable {opt.var!r} is already bound in this "
                        "scope"
                    )
                if opt.props:
                    # inline property map = implicit WHERE conjuncts on
                    # the fresh variable (round-8 verdict ask #6); they
                    # AND into every disjunct (maps distribute over OR)
                    # and cannot themselves correlate, so the top-level
                    # equality requirement below still applies unchanged
                    pconds = [
                        Cond(PropRef(opt.var, k), "=", v)
                        for k, v in opt.props.items()
                    ]
                    opt.props = {}
                    opt_disj = _and_into(opt_disj, pconds)
                outer_scope = set(structs) | names

                def _equi_key(cond) -> tuple | None:
                    # canonical key of a conjunct that is an EQUALITY
                    # between an expression over ONLY the fresh variable
                    # and an expression over ONLY outer-scope variables —
                    # the exact shape Catalyst rewrites from
                    # crossJoin+filter into an equi-join. Anything weaker
                    # (correlation inside an OR branch only, a
                    # non-equality correlation, variables mixed on one
                    # side) still plans a true nested-loop cartesian.
                    if (
                        not isinstance(cond, Cond)
                        or cond.negated
                        or cond.op != "="
                    ):
                        return None
                    lv: set[str] = set()
                    rv: set[str] = set()
                    _expr_vars(cond.left, lv)
                    _expr_vars(cond.right, rv)
                    if lv == {opt.var} and rv and rv <= outer_scope:
                        return (repr(cond.left), repr(cond.right))
                    if rv == {opt.var} and lv and lv <= outer_scope:
                        return (repr(cond.right), repr(cond.left))
                    return None

                # the correlating equality must be a TOP-LEVEL conjunct:
                # in DNF that means one canonical equality present in
                # EVERY branch ('n.born = 1 OR y = 2' has a branch with
                # none; 'id(n)=uid OR id(n)=uid2' correlates each branch
                # on a different key — both stay nested-loop cartesians
                # and are rejected loudly per the scale contract).
                common: set[tuple] | None = None
                for conj in opt_disj or []:
                    keys = {k for k in map(_equi_key, conj) if k is not None}
                    common = keys if common is None else (common & keys)
                if not common:
                    raise CypherSyntaxError(
                        "MATCH with a fresh node pattern after "
                        "WITH/UNWIND needs a WHERE with a top-level "
                        "equality conjunct correlating it to the current "
                        "rows (e.g. WHERE id(n) = uid) — anything weaker "
                        "would be a cartesian product"
                    )
                op = f"__wo{wopt_n}_"
                wopt_n += 1
                other_df = graph.nodes(opt.label).select(
                    *[
                        F.col(c).alias(f"{op}{c}")
                        for c in graph.vertices.columns
                    ]
                )
                df = df.crossJoin(other_df)
                vertex_props = sorted(
                    c for c in graph.vertices.columns
                    if c not in ("id", "label", EXTRA_LABELS)
                )
                meta = ["label"]
                if EXTRA_LABELS in graph.vertices.columns:
                    meta = meta + [EXTRA_LABELS]
                st = F.struct(
                    F.col(f"{op}id").alias("id"),
                    *[F.col(f"{op}{m}").alias(m) for m in meta],
                    *[F.col(f"{op}{pr}").alias(pr) for pr in vertex_props],
                )
                df = df.withColumn(opt.var, st).drop(
                    *[c for c in df.columns if c.startswith(op)]
                )
                pend = getattr(colmap, "row_order", None)
                colmap = _bare_colmap(
                    names | set(structs) | {opt.var},
                    _struct_outputs(df),
                    df,
                )
                colmap.stage_graph = graph
                if pend:
                    colmap.row_order = pend
                df = df.filter(
                    _where_to_column(
                        opt_disj, colmap, set(df.columns), df
                    )
                )
                continue
            if not isinstance(opt, EdgePat) or opt.hops is not None:
                raise CypherSyntaxError(
                    "OPTIONAL MATCH supports a single-hop edge pattern "
                    "(a)-[e]->(b)"
                )
            structs = dict(getattr(colmap, "structs", {}))
            names = set(getattr(colmap, "star_names", set()))
            bound_is_src = (
                opt.src.var in structs and "id" in structs[opt.src.var]
            )
            bound_is_dst = (
                opt.dst.var in structs and "id" in structs[opt.dst.var]
            )
            if bound_is_src == bound_is_dst:
                raise CypherSyntaxError(
                    "MATCH after WITH must bind exactly one endpoint to "
                    "a carried node (WITH n MATCH (n)-[e:T]->(m))"
                )
            bound_end = "src" if bound_is_src else "dst"
            bound_var = opt.src.var if bound_is_src else opt.dst.var
            other = opt.dst if bound_is_src else opt.src
            if other.label is None and other.var is None:
                raise CypherSyntaxError(
                    "optional pattern's free endpoint needs a variable"
                )
            for v in (opt.var, other.var):
                if v is not None and (v in structs or v in names):
                    raise CypherSyntaxError(
                        f"variable {v!r} is already bound in this scope"
                    )
            # inline property maps desugar to WHERE equality conjuncts
            # exactly like first-stage clauses (round-8 verdict ask #6).
            # A map on the BOUND endpoint filters the CURRENT rows for a
            # plain MATCH (inner join: pre-join == post-join); on an
            # OPTIONAL it is a predicate of the optional pattern — failing
            # rows null-extend, so it rides the LEFT-join condition.
            bound_nd = opt.src if bound_is_src else opt.dst
            bound_jcol: Column | None = None
            if bound_nd.props:
                bconds = [
                    Cond(PropRef(bound_var, k), "=", v)
                    for k, v in bound_nd.props.items()
                ]
                bound_nd.props = {}
                bcol = F.coalesce(
                    _where_to_column([bconds], colmap, set(df.columns), df),
                    F.lit(False),
                )
                if optional:
                    bound_jcol = bcol
                else:
                    df = df.filter(bcol)
            side_taken = set(structs) | names | {
                v for v in (opt.var, other.var) if v is not None
            }
            opt_disj = _and_into(
                opt_disj, _desugar_inline_props([opt], side_taken)
            )
            ep, op = f"__we{wopt_n}_", f"__wo{wopt_n}_"
            wopt_n += 1
            e = graph.edges
            if opt.rel_type is not None:
                e = e.filter(rel_type_cond(opt.rel_type))
            if opt.undirected:
                # either-orientation pipeline [OPTIONAL] MATCH: the same
                # symmetrized frame every other undirected form uses
                e = _sym_edges(e)
            e = e.select(
                *[F.col(c).alias(f"{ep}{c}") for c in graph.edges.columns]
            )
            other_df = graph.nodes(other.label).select(
                *[F.col(c).alias(f"{op}{c}") for c in graph.vertices.columns]
            )
            free_end = "dst" if bound_end == "src" else "src"
            opt_side = e.join(
                other_df, F.col(f"{ep}{free_end}") == F.col(f"{op}id")
            )
            if opt_disj is not None:
                icolmap = _pattern_scope_colmap(
                    "an OPTIONAL MATCH WHERE", opt.var, other.var, ep, op
                )
                opt_side = opt_side.filter(
                    _where_to_column(
                        opt_disj, icolmap, set(opt_side.columns), opt_side
                    )
                )
            pipe_jc = F.col(bound_var)["id"] == F.col(f"{ep}{bound_end}")
            if bound_jcol is not None:
                pipe_jc = pipe_jc & bound_jcol
            df = df.join(opt_side, pipe_jc, "left" if optional else "inner")
            # materialize each new variable as ONE null-gated struct
            # column (a failed OPTIONAL binding is a NULL variable, not a
            # struct of nulls) — the scope then IS a plain WITH-carry
            # scope, so _bare_colmap serves m.prop/collect(m)/id(m) with
            # the same semantics as a carried node, no special casing
            vertex_props = sorted(
                c for c in graph.vertices.columns
                 if c not in ("id", "label", EXTRA_LABELS)
            )
            edge_props = sorted(
                c for c in graph.edges.columns
                if c not in ("id", "src", "dst", "rel_type")
            )
            added = {}
            if other.var is not None:
                added[other.var] = (op, "node")
            if opt.var is not None:
                added[opt.var] = (ep, "edge")
            for v, (pref, kind) in added.items():
                meta = (
                    ["label"] if kind == "node" else ["src", "dst", "rel_type"]
                )
                if kind == "node" and EXTRA_LABELS in graph.vertices.columns:
                    meta = meta + [EXTRA_LABELS]
                props = vertex_props if kind == "node" else edge_props
                idc = F.col(f"{pref}id")
                st = F.struct(
                    idc.alias("id"),
                    *[F.col(f"{pref}{m}").alias(m) for m in meta],
                    *[F.col(f"{pref}{p}").alias(p) for p in props],
                )
                df = df.withColumn(v, F.when(idc.isNotNull(), st))
            df = df.drop(
                *[
                    c
                    for c in df.columns
                    if c.startswith(ep) or c.startswith(op)
                ]
            )
            pend = getattr(colmap, "row_order", None)
            colmap = _bare_colmap(
                names | set(added), _struct_outputs(df), df
            )
            colmap.stage_graph = graph
            if pend:
                colmap.row_order = pend
            continue
        if p.at("kw", "UNWIND"):
            # pipeline UNWIND: explode a projected list into one row per
            # element, keeping the other columns (openCypher: null and
            # empty lists produce no rows — exactly Spark's explode).
            # Pattern scopes must project the list through WITH first
            # (pattern variables end at the horizon).
            if not bare:
                raise CypherSyntaxError(
                    "UNWIND over a pattern scope needs a preceding WITH "
                    "(project the list first: WITH n.tags AS tags "
                    "UNWIND tags AS tag)"
                )
            p.next()
            src = p.parse_return_expr(allow_bare=True)
            if _contains_agg(src):
                raise CypherSyntaxError(
                    "UNWIND over an aggregate needs a WITH stage first"
                )
            p.expect("kw", "AS")
            alias = p.expect("word").text
            # UNWIND over a pattern comprehension off a carried node
            # (``WITH n UNWIND [(n)-[:T]->(m) | m.x] AS v``): bind the
            # per-node list first, then explode it like any list source
            pseudo = [ReturnItem(src, alias)]
            df = _bind_pattern_subqueries(df, colmap, pseudo)
            src = pseudo[0].expr
            pend = getattr(colmap, "row_order", None)
            if pend:
                # a pending (deferred) sort must materialize before the
                # explode: UNWIND preserves row order in Neo4j, and the
                # exploded rows are no longer coverable by the keys
                df = df.orderBy(*_specs_columns(pend, colmap, df))
            df = df.withColumn(alias, F.explode(_expr_column(src, colmap, df)))
            names = set(getattr(colmap, "star_names", set())) | {alias}
            # struct scopes survive the explode (their columns do); any
            # row-order metadata does NOT (element order within a row is
            # not covered by the WITH-stage keys)
            structs = {
                k: v
                for k, v in getattr(colmap, "structs", {}).items()
                if k != alias
            }
            colmap = _bare_colmap(names, structs, df)
            colmap.stage_graph = graph
            continue
        p.next()
        w_distinct, w_items = p.parse_return(allow_bare=bare)
        w_order, w_skip, w_limit = p.parse_tail(
            require_end=False, allow_bare=bare
        )
        w_disj = None
        if p.at("kw", "WHERE"):
            p.next()
            w_disj = p.parse_where(allow_bare=True)
        w_items = _expand_star(w_items, colmap, "WITH")
        df = _bind_pattern_subqueries(df, colmap, w_items)
        prev_specs = getattr(colmap, "row_order", None)
        carry_items = list(w_items)
        next_specs = None
        if (
            not w_order
            and prev_specs
            and not w_distinct
            and not any(_contains_agg(i.expr) for i in w_items)
        ):
            # Neo4j: row order persists through a plain projection. Remap
            # each key to the new scope; keys falling out of the
            # projection ride along as hidden __ord columns (dropped
            # implicitly at the next aggregate/RETURN projection).
            next_specs = _remap_specs(prev_specs, w_items)
            if next_specs is None:
                carry_items = w_items + [
                    ReturnItem(ast, f"__ord{i}")
                    for i, (ast, _) in enumerate(prev_specs)
                ]
                next_specs = [
                    (BareRef(f"__ord{i}"), asc)
                    for i, (_, asc) in enumerate(prev_specs)
                ]
        df = _apply_projection(df, colmap, w_distinct, carry_items)
        colmap = _bare_colmap(
            {_out_name(i) for i in carry_items}, _struct_outputs(df), df
        )
        colmap.stage_graph = graph
        if w_order:
            # row-order metadata, NOT a physical sort: a later collect()
            # re-sorts per group from these keys (_ordered_collect), so
            # the global sort only materializes where row order is
            # OBSERVABLE — SKIP/LIMIT here, UNWIND, or a plain final
            # RETURN. At scale this turns Cypher's ordered-collect idiom
            # into one hash aggregate instead of a total sort + aggregate
            # (Catalyst cannot elide the sort itself: collect_list is
            # order-sensitive to it). Keys are still VALIDATED eagerly —
            # a bad ORDER BY raises here, deferred or not.
            _order_columns(w_order, w_items, "WITH", df)
            colmap.row_order = _order_specs(w_order, w_items)
        elif next_specs:
            colmap.row_order = next_specs
        if w_skip is not None or w_limit is not None:
            pend = getattr(colmap, "row_order", None)
            if pend:
                df = df.orderBy(*_specs_columns(pend, colmap, df))
            if w_skip is not None:
                df = df.offset(w_skip)
            if w_limit is not None:
                df = df.limit(w_limit)
        if w_disj is not None:
            # stage-WHERE COUNT { } / comprehension operands bind first
            # (the post-WITH degree-filter idiom), same as the
            # first-scope WHERE site
            if any(
                isinstance(c.left, (CountPattern, PatternComp, BinOp, FuncCall))
                or isinstance(
                    c.right, (CountPattern, PatternComp, BinOp, FuncCall)
                )
                for conj in w_disj
                for c in conj
                if not isinstance(c, PatternCond)
            ):
                df = _bind_pattern_subqueries(df, colmap, None, w_disj)
            # stage-WHERE pattern predicates (``WITH n, count(x) AS c
            # WHERE c > 1 AND (n)-[:T]->()`` / EXISTS blocks): semi/anti-
            # join on the carried node struct's id, exactly the
            # first-scope compile
            pcs = [
                c for conj in w_disj for c in conj
                if isinstance(c, PatternCond)
            ]
            if pcs:
                if graph is None:
                    raise CypherSyntaxError(
                        "pattern predicates after WITH require a graph "
                        "scope"
                    )
                if len(w_disj) > 1:
                    raise CypherSyntaxError(
                        "pattern predicates cannot be OR-combined"
                    )
                structs = getattr(colmap, "structs", {})
                for pc in pcs:
                    if pc.var not in structs or "id" not in structs[pc.var]:
                        raise CypherSyntaxError(
                            f"pattern predicate on {pc.var!r} requires a "
                            "carried node (WITH n … WHERE (n)-[:T]->())"
                        )
                    df = df.join(
                        _pattern_qualifying_ids(graph, pc),
                        F.col(pc.var)["id"] == F.col("__pp_id"),
                        "left_anti" if pc.negated else "left_semi",
                    )
                rest = [
                    c for c in w_disj[0] if not isinstance(c, PatternCond)
                ]
                w_disj = [rest] if rest else None
            if w_disj is not None:
                df = df.filter(_where_to_column(w_disj, colmap, None, df))
        bare = True
    p.expect("kw", "RETURN")
    distinct, items = p.parse_return(allow_bare=bare)
    order, skip, limit = p.parse_tail(require_end=False, allow_bare=bare)
    items = _expand_star(items, colmap, "RETURN")
    df = _bind_pattern_subqueries(df, colmap, items)
    pending = getattr(colmap, "row_order", None)
    pre_scope = None
    if (
        pending
        and not order
        and not any(_contains_agg(i.expr) for i in items)
    ):
        # final RETURN after a WITH ... ORDER BY: the deferred sort
        # defines the result order. Sort after the projection when every
        # key survives into it (narrower sort input), else before (a
        # Project preserves row order). DISTINCT is order-OBSERVABLE
        # (Neo4j: ``WITH v ORDER BY v DESC RETURN DISTINCT v LIMIT 2``
        # returns the top values in order) and ``.distinct()`` destroys
        # row order, so the sort must re-apply AFTER the dedup — possible
        # only when every sort key survives the projection; a key that
        # falls out of scope would make the post-dedup order unprovable,
        # so that combination raises rather than mis-answering.
        remapped = _remap_specs(pending, items)
        if remapped is None:
            if distinct:
                raise CypherSyntaxError(
                    "RETURN DISTINCT after WITH ... ORDER BY requires "
                    "every ORDER BY key to appear among the RETURN items "
                    "(DISTINCT re-sorts after dedup; a dropped key would "
                    "leave the declared order unrecoverable)"
                )
            df = df.orderBy(*_specs_columns(pending, colmap, df))
            df = _apply_projection(df, colmap, distinct, items)
        else:
            df = _apply_projection(df, colmap, distinct, items)
            post = _bare_colmap(
                {_out_name(i) for i in items}, _struct_outputs(df), df
            )
            df = df.orderBy(*_specs_columns(remapped, post, df))
    else:
        pre_scope = (df, colmap)
        df = _apply_projection(df, colmap, distinct, items)
    if order:
        try:
            df = df.orderBy(*_order_columns(order, items, "RETURN", df))
        except CypherSyntaxError:
            # Neo4j: RETURN ... ORDER BY may sort by ANY expression over
            # variables still in scope, not only projected columns
            # (``RETURN properties(n) AS p ORDER BY n.name``). Re-project
            # with hidden __ord columns computed in the PRE-projection
            # scope, sort, drop. Not reachable for DISTINCT (dedup
            # destroys hidden keys — Neo4j rejects this too) or
            # aggregating projections (a non-grouped sort key is
            # meaningless; the original error stands).
            if (
                pre_scope is None
                or distinct
                or any(_contains_agg(i.expr) for i in items)
                or any(_contains_agg(k) for k, _ in order)
            ):
                raise
            pdf, pcolmap = pre_scope
            pseudo = list(items)
            specs: list[tuple[str, bool]] = []
            for i, (k, asc) in enumerate(order):
                if isinstance(k, str):
                    match = next(
                        (it for it in items if _out_name(it) == k), None
                    )
                    if match is None:
                        raise
                    k = match.expr
                pseudo.append(ReturnItem(k, f"__ord{i}"))
                specs.append((f"__ord{i}", asc))
            df = _apply_projection(pdf, pcolmap, False, pseudo)
            df = df.orderBy(
                *[_order_dir(F.col(n), asc) for n, asc in specs]
            ).drop(*[n for n, _ in specs])
    if skip is not None:
        # openCypher SKIP: drop the first n rows of the (ordered) result —
        # Catalyst plans Offset; without an ORDER BY the dropped prefix is
        # engine-dependent, exactly as in Neo4j.
        df = df.offset(skip)
    if limit is not None:
        df = df.limit(limit)
    return _strip_dur_tag(df)


def _strip_dur_tag(df: DataFrame) -> DataFrame:
    """Final-RETURN cleanup: the ``__dur`` sentinel is a compiler-internal
    type tag (see ``DUR_TAG``) that must survive every intermediate WITH
    horizon — duration arithmetic dispatches on it — but is NOT part of
    Neo4j's duration value, so a whole duration projected by the final
    RETURN sheds it here (top-level structs and collect()ed lists of
    durations, the two shapes the surface can produce). Pure projection:
    no shuffle, row order preserved."""
    for name, dtype in df.dtypes:
        if _dur_fields(dtype) is not None:
            df = df.withColumn(name, F.col(name).dropFields(DUR_TAG))
        else:
            mo = re.fullmatch(r"array<(struct<[^<>]*>)>", dtype)
            if mo is not None and _dur_fields(mo.group(1)) is not None:
                df = df.withColumn(
                    name,
                    F.transform(F.col(name), lambda x: x.dropFields(DUR_TAG)),
                )
    return df


def _has_extra_labels(df: DataFrame) -> bool:
    """Cheap schema scan: does any column (or struct field) carry the
    multi-label extras? Gates the extra-labels resolution probes so
    graphs that were never label-mutated — the vast majority — never even
    attempt the analysis (the failed probe would log a spurious Spark
    ERROR line per labels() call)."""
    from pyspark.sql.types import StructType

    for f in df.schema.fields:
        if f.name == EXTRA_LABELS or f.name.endswith(EXTRA_LABELS):
            return True
        if isinstance(f.dataType, StructType) and EXTRA_LABELS in f.dataType.names:
            return True
    return False


def _typed_analysis_errors(fn):
    """API-boundary guard: Spark ANALYSIS errors from unsupported type
    combinations (size() of a map, toInteger() of a struct, subscripting
    with a non-integer, …) surface as OUR typed error — the loud-error
    contract — instead of a raw AnalysisException. Runtime errors (ANSI
    cast failures during execution) still fail the job loudly at the
    action; they never mis-answer."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from pyspark.errors import AnalysisException

        try:
            return fn(*args, **kwargs)
        except AnalysisException as e:
            raise CypherSyntaxError(
                "unsupported type combination in query: "
                + str(e).splitlines()[0][:220]
            ) from e

    return wrapped


@_typed_analysis_errors
def cypher_read(
    graph: PropertyGraph,
    query: str,
    params: dict[str, Any] | None = None,
) -> DataFrame:
    """Execute a read-only query — one single-query (see
    :func:`_read_single` for the clause surface) or several combined with
    ``UNION`` / ``UNION ALL``.

    openCypher UNION rules enforced: every part must return the SAME
    column names, and plain UNION deduplicates the combined rows (one
    ``distinct()`` over the union — for an all-UNION chain Spark collapses
    the repeated dedups into one aggregate). ``unionByName`` keeps the
    match positional-independent, mirroring Cypher's by-name semantics.

    ``params`` resolves ``$name`` references (WHERE operands, inline
    maps, IN lists, UNWIND sources, RETURN literals) to their values at
    parse time — a parameterized query plans exactly like its literal
    twin, and values can never act as syntax (the reference ships
    parameters the same way: `Neo4jOutputFormat` sends them out-of-band
    next to the statement, never spliced into it).
    """
    p = _Parser(_tokenize(query), params)
    df = _read_union(graph, p)
    if p.peek() is not None:
        raise CypherSyntaxError(f"unexpected token {p.peek().text!r}")
    return df


def _read_union(graph: PropertyGraph, p: "_Parser") -> DataFrame:
    """A single-query chain combined with ``UNION`` / ``UNION ALL`` —
    the shared body of a top-level read and a ``CALL { … }`` block."""
    df = _read_single(graph, p)
    while p._at_word_ci("UNION"):
        p.next()
        dedup = True
        if p._at_word_ci("ALL"):
            p.next()
            dedup = False
        rhs = _read_single(graph, p)
        if df.columns != rhs.columns:
            raise CypherSyntaxError(
                "all parts of a UNION must return the same column names: "
                f"{df.columns} vs {rhs.columns}"
            )
        df = df.unionByName(rhs)
        if dedup:
            df = df.distinct()
    return df


# -- translation: writes ---------------------------------------------------


def _resolve(value: Any, row: dict[str, Any]) -> Any:
    if isinstance(value, tuple) and len(value) == 2 and value[0] == "__param__":
        return row.get(value[1])
    return value


@_typed_analysis_errors
def cypher_write(
    graph: PropertyGraph,
    query: str,
    params: dict[str, list[dict[str, Any]]] | None = None,
) -> PropertyGraph:
    """Execute ``UNWIND $param AS v CREATE ...`` or ``UNWIND $param AS v
    MATCH ... WHERE ... SET ...`` against the graph; returns the new graph.

    The parameter batch semantics mirror the sink (`Neo4jOutputFormat`):
    ``params[name]`` is the list of row dicts the reference would send as
    one UNWIND batch.

    Non-UNWIND statements are also accepted: the bare interactive writes
    ``MATCH (n[:L]) [WHERE ...] [DETACH] DELETE n`` (Neo4j's most common
    ad-hoc cleanup), ``... SET n.p = <literal>, ...``, and
    ``... REMOVE n.p, ...`` — no parameter batch needed; the match set
    comes from the WHERE predicate, not a key list.
    """
    p = _Parser(_tokenize(query), params)
    if p.at("kw", "MATCH"):
        return _bare_write(graph, p)
    if p.at("word") and p.peek().text.upper() == "FOREACH":
        return _foreach_write(graph, p)
    p.expect("kw", "UNWIND")
    params = params or {}
    if p.at("punct", "$"):  # $rows — modern; {rows} legacy
        p.next()
        pname = p.expect("word").text
    else:
        p.expect("punct", "{")
        pname = p.expect("word").text
        p.expect("punct", "}")
    p.expect("kw", "AS")
    uvar = p.expect("word").text
    if pname not in params:
        raise CypherSyntaxError(f"missing parameter {pname!r}")
    rows = params[pname]

    if p.at("kw", "CREATE"):
        p.next()
        node = p.parse_node(unwind_var=uvar)
        if node.label is None:
            raise CypherSyntaxError("CREATE requires a label")
        p.expect_end()
        spark = graph.vertices.sparkSession
        data = [
            {k: _resolve(v, row) for k, v in node.props.items()} for row in rows
        ]
        batch = spark.createDataFrame(data) if data else None
        if batch is None:
            return graph
        return graph.create_nodes(batch, node.label)

    if p.at("kw", "MERGE"):
        # UNWIND $rows AS r MERGE (n:L {k: r.k})
        #   [ON CREATE SET n.a = ..., ...] [ON MATCH SET n.b = ..., ...]
        #   [SET n.c = ..., ...]
        # — the idempotent upsert the sink generates
        # (unwind_merge_template). Plain SET applies on match AND create,
        # as in Cypher; ON CREATE SET fires only for rows that insert a new
        # vertex, ON MATCH SET only for rows that matched an existing one —
        # Neo4j's canonical conditional-upsert idiom. The two arms may set
        # the SAME property to DIFFERENT values (ON CREATE SET n.v = 'new'
        # ON MATCH SET n.v = 'seen'): each arm's values travel in their own
        # batch column (`__oc_*` / `__om_*`), mapped per-arm by
        # :meth:`PropertyGraph.merge_nodes`. Assigning one property twice
        # WITHIN reach of a single arm (e.g. in plain SET and again in
        # ON MATCH SET) is rejected loudly rather than silently picking a
        # winner.
        p.next()
        node = p.parse_node(unwind_var=uvar)
        if node.label is None:
            raise CypherSyntaxError("MERGE requires a label")
        if len(node.props) != 1:
            raise CypherSyntaxError(
                "MERGE pattern needs exactly one key property"
            )
        ((key, key_val),) = node.props.items()

        def _set_items() -> dict[str, Any]:
            items: dict[str, Any] = {}
            while True:
                ref = p.parse_prop_ref()
                if ref.var != node.var:
                    raise CypherSyntaxError(f"SET target must be {node.var!r}")
                if ref.prop == key:
                    raise CypherSyntaxError(
                        f"cannot SET the MERGE key property {key!r}"
                    )
                if ref.prop in items:
                    raise CypherSyntaxError(
                        f"property {ref.prop!r} assigned twice in one SET"
                    )
                p.expect("op", "=")
                items[ref.prop] = p.parse_value(unwind_var=uvar)
                if p.at("punct", ","):
                    p.next()
                    continue
                break
            return items

        both: dict[str, Any] = {}
        arm_create: dict[str, Any] = {}
        arm_match: dict[str, Any] = {}
        while True:
            if p.at("word") and p.peek().text.upper() == "ON":
                p.next()
                arm_tok = p.next()
                if arm_tok.kind != "kw" or arm_tok.text not in ("CREATE", "MATCH"):
                    raise CypherSyntaxError(
                        f"expected CREATE or MATCH after ON, got {arm_tok.text!r}"
                    )
                p.expect("kw", "SET")
                arm = arm_create if arm_tok.text == "CREATE" else arm_match
                if arm:
                    raise CypherSyntaxError(
                        f"duplicate ON {arm_tok.text} SET clause"
                    )
                arm.update(_set_items())
            elif p.at("kw", "SET"):
                if both:
                    raise CypherSyntaxError("duplicate SET clause")
                p.next()
                both.update(_set_items())
            else:
                break
        for arm in (arm_create, arm_match):
            for prop in arm:
                if prop in both:
                    raise CypherSyntaxError(
                        f"property {prop!r} assigned in both SET and an "
                        "ON CREATE/ON MATCH arm"
                    )
        p.expect_end()
        spark = graph.vertices.sparkSession
        data = [
            {
                key: _resolve(key_val, row),
                **{c: _resolve(v, row) for c, v in both.items()},
                **{f"__oc_{c}": _resolve(v, row) for c, v in arm_create.items()},
                **{f"__om_{c}": _resolve(v, row) for c, v in arm_match.items()},
            }
            for row in rows
        ]
        if not data:
            return graph
        if not arm_create and not arm_match:
            return graph.merge_nodes(
                spark.createDataFrame(data), node.label, key
            )
        create_map = {c: c for c in both} | {c: f"__oc_{c}" for c in arm_create}
        match_map = {c: c for c in both} | {c: f"__om_{c}" for c in arm_match}
        return graph.merge_nodes(
            spark.createDataFrame(data),
            node.label,
            key,
            on_create=create_map,
            on_match=match_map,
        )

    p.expect("kw", "MATCH")
    target = p.parse_node(unwind_var=uvar)

    if p.at("punct", ","):
        # UNWIND $rows AS r MATCH (a:LA {k: r.x}), (b:LB {k: r.y})
        #   MERGE|CREATE (a)-[:T]->(b) — the relationship batch-write form
        # (endpoints matched by key, edge inserted; MERGE is idempotent on
        # the (src, dst, rel_type) pair, CREATE inserts unconditionally).
        p.next()
        target_b = p.parse_node(unwind_var=uvar)
        if p.at("kw", "MERGE"):
            idempotent = True
        elif p.at("kw", "CREATE"):
            idempotent = False
        else:
            raise CypherSyntaxError(
                "two-node MATCH must be followed by MERGE or CREATE"
            )
        p.next()
        pat = p.parse_pattern(unwind_var=uvar)
        if not isinstance(pat, EdgePat) or pat.hops is not None:
            raise CypherSyntaxError(
                "relationship write needs a single-hop edge pattern"
            )
        if pat.undirected:
            raise CypherSyntaxError(
                "relationship write requires a direction (-[:T]-> or <-[:T]-)"
            )
        if pat.rel_type is None:
            raise CypherSyntaxError("relationship write requires a type")
        if isinstance(pat.rel_type, tuple):
            raise CypherSyntaxError(
                "a relationship write needs exactly ONE type; "
                "[:A|B] alternation is read-only syntax"
            )
        # the parser normalizes (a)<-[:T]-(b) to src=b, dst=a, so the
        # stored direction always follows pat.src -> pat.dst; the two
        # endpoints just have to be the two MATCHed variables
        if (pat.src.var, pat.dst.var) == (target.var, target_b.var):
            src_node, dst_node = target, target_b
        elif (pat.src.var, pat.dst.var) == (target_b.var, target.var):
            src_node, dst_node = target_b, target
        else:
            raise CypherSyntaxError(
                "edge endpoints must be the two MATCHed variables"
            )
        for node in (target, target_b):
            if node.label is None or len(node.props) != 1:
                raise CypherSyntaxError(
                    "each endpoint needs a label and exactly one key property"
                )
        # MERGE (a)-[e:T]->(b) ON CREATE SET e.p = … ON MATCH SET e.q = …
        # — the conditional-upsert arms on the EDGE (the twin of the node
        # MERGE arms, X183): ON CREATE fires only for rows that insert the
        # edge, ON MATCH only for rows that matched an existing one. The
        # same property may take different values per arm (each arm's
        # values travel in their own batch column, `__oc_*` / `__om_*`).
        arm_create: dict[str, Any] = {}
        arm_match: dict[str, Any] = {}
        while p.at("word") and p.peek().text.upper() == "ON":
            if not idempotent:
                raise CypherSyntaxError(
                    "ON CREATE/ON MATCH arms require MERGE"
                )
            if pat.var is None:
                raise CypherSyntaxError(
                    "ON CREATE/ON MATCH SET needs an edge variable: "
                    "MERGE (a)-[e:T]->(b) ON CREATE SET e.p = …"
                )
            p.next()
            arm_tok = p.next()
            if arm_tok.kind != "kw" or arm_tok.text not in ("CREATE", "MATCH"):
                raise CypherSyntaxError(
                    f"expected CREATE or MATCH after ON, got {arm_tok.text!r}"
                )
            p.expect("kw", "SET")
            arm = arm_create if arm_tok.text == "CREATE" else arm_match
            if arm:
                raise CypherSyntaxError(
                    f"duplicate ON {arm_tok.text} SET clause"
                )
            while True:
                ref = p.parse_prop_ref()
                if ref.var != pat.var or ref.prop is None:
                    raise CypherSyntaxError(
                        f"arm SET target must be {pat.var!r}.<property>"
                    )
                if ref.prop in ("src", "dst", "id", "rel_type"):
                    raise CypherSyntaxError(
                        f"reserved edge property name {ref.prop!r}"
                    )
                if ref.prop in pat.props:
                    raise CypherSyntaxError(
                        f"property {ref.prop!r} is part of the MERGE "
                        "match map; arms cannot reassign it"
                    )
                if ref.prop in arm:
                    raise CypherSyntaxError(
                        f"property {ref.prop!r} assigned twice in one SET"
                    )
                p.expect("op", "=")
                arm[ref.prop] = p.parse_value(unwind_var=uvar)
                if p.at("punct", ","):
                    p.next()
                    continue
                break
        p.expect_end()
        ((akey, aval),) = src_node.props.items()
        ((bkey, bval),) = dst_node.props.items()
        for ep in pat.props:
            if ep in ("__a", "__b", "src", "dst", "id", "rel_type"):
                raise CypherSyntaxError(
                    f"reserved edge property name {ep!r}"
                )
        data = [
            {
                "__a": _resolve(aval, row),
                "__b": _resolve(bval, row),
                # edge property map — values per row (r.w) or literals;
                # for MERGE these join the match key (Cypher semantics),
                # for CREATE they are simply written
                **{ep: _resolve(v, row) for ep, v in pat.props.items()},
                **{
                    f"__oc_{c}": _resolve(v, row)
                    for c, v in arm_create.items()
                },
                **{
                    f"__om_{c}": _resolve(v, row)
                    for c, v in arm_match.items()
                },
            }
            for row in rows
        ]
        if not data:
            return graph
        spark = graph.vertices.sparkSession
        eps = graph._resolve_endpoints(
            spark.createDataFrame(data),
            src_node.label, akey, "__a",
            dst_node.label, bkey, "__b",
        )
        if idempotent:
            return graph.merge_relationships(
                eps,
                pat.rel_type,
                on_create={c: f"__oc_{c}" for c in arm_create} or None,
                on_match={c: f"__om_{c}" for c in arm_match} or None,
            )
        return graph.create_relationships(eps, pat.rel_type)

    if p.at("kw", "DETACH") or p.at("kw", "DELETE"):
        # UNWIND $rows AS r MATCH (n:L {k: r.k}) [DETACH] DELETE n —
        # key-addressed batch delete; plain DELETE keeps Neo4j's contract
        # (refuses when a matched vertex still has relationships).
        detach = False
        if p.at("kw", "DETACH"):
            detach = True
            p.next()
        p.expect("kw", "DELETE")
        var = p.expect("word").text
        if var != target.var:
            raise CypherSyntaxError(f"DELETE target must be {target.var!r}")
        if target.label is None or len(target.props) != 1:
            raise CypherSyntaxError(
                "DELETE MATCH needs a label and exactly one key property"
            )
        p.expect_end()
        ((key, val),) = target.props.items()
        data = [{"__k": _resolve(val, row)} for row in rows]
        if not data:
            return graph
        spark = graph.vertices.sparkSession
        batch = spark.createDataFrame(data)
        ids = (
            graph.vertices.filter(label_cond(graph.vertices, target.label))
            .join(batch, graph.vertices[key] == batch["__k"], "left_semi")
            .select("id")
        )
        return graph.delete_nodes(ids, detach=detach)

    p.expect("kw", "WHERE")
    disj = p.parse_where(unwind_var=uvar)
    p.expect("kw", "SET")

    # key condition: p.key = u.key (exactly one, equality, across all ORs)
    if len(disj) != 1 or len(disj[0]) != 1:
        raise CypherSyntaxError("UNWIND..MATCH..SET supports a single key equality")
    cond = disj[0][0]
    if (
        cond.op != "="
        or cond.negated
        or cond.left.var != target.var
        or not isinstance(cond.right, tuple)
    ):
        raise CypherSyntaxError("WHERE must be <node>.<key> = <unwind>.<key>")
    key = cond.left.prop

    updates: dict[str, Any] = {}
    while True:
        ref = p.parse_prop_ref()
        if ref.var != target.var:
            raise CypherSyntaxError(f"SET target must be {target.var!r}")
        p.expect("op", "=")
        updates[ref.prop] = p.parse_value(unwind_var=uvar)
        if p.at("punct", ","):
            p.next()
            continue
        break

    p.expect_end()
    spark = graph.vertices.sparkSession
    data = [
        {key: _resolve(("__param__", cond.right[1]), row),
         **{c: _resolve(v, row) for c, v in updates.items()}}
        for row in rows
    ]
    if not data:
        return graph
    if target.label is not None:
        raise CypherSyntaxError("labeled MATCH in update not supported (B8 is unlabeled)")
    return graph.update_nodes(spark.createDataFrame(data), key)


def _foreach_write(graph: PropertyGraph, p: _Parser) -> PropertyGraph:
    """``FOREACH (x IN range(lo, hi[, step]) | CREATE (:L {k: <expr(x)>,
    ...}))`` (and literal-list / ``$param``-list sources) — Neo4j's batch
    row-generation idiom. The range source compiles to ``spark.range``,
    so the batch is a DISTRIBUTED lazily-generated relation and property
    expressions are JVM column arithmetic over it: ``FOREACH (i IN
    range(1, 10^9) | CREATE ...)`` inserts a billion vertices without a
    driver-side list. Only the CREATE body is supported — FOREACH's
    SET/MERGE/DELETE bodies raise loudly (use the UNWIND..MATCH forms)."""
    p.next()  # FOREACH
    p.expect("punct", "(")
    var = p.expect("word").text
    if not p._at_word_ci("IN"):
        raise CypherSyntaxError("expected IN in FOREACH")
    p.next()
    spark = graph.vertices.sparkSession
    if p.at("word") and p.peek().text == "range":
        p.next()
        p.expect("punct", "(")
        rargs: list[int] = []
        while True:
            v = p.parse_value(None)
            if isinstance(v, bool) or not isinstance(v, int):
                raise CypherSyntaxError(
                    "FOREACH range() bounds must be integer literals or "
                    "integer parameters"
                )
            rargs.append(v)
            if p.at("punct", ","):
                p.next()
                continue
            break
        p.expect("punct", ")")
        if len(rargs) not in (2, 3):
            raise CypherSyntaxError("range() takes 2 or 3 arguments")
        lo, hi = rargs[0], rargs[1]
        step = rargs[2] if len(rargs) > 2 else 1
        if step == 0:
            raise CypherSyntaxError("range() step must be non-zero")
        src = spark.range(lo, hi + (1 if step > 0 else -1), step).select(
            F.col("id").alias("__x")
        )
    else:
        if p.at("punct", "$"):
            vals = p.parse_value(None)
            if not isinstance(vals, list):
                raise CypherSyntaxError("FOREACH $param requires a list value")
        else:
            p.expect("punct", "[")
            vals = []
            if not p.at("punct", "]"):
                while True:
                    vals.append(p.parse_value(None))
                    if p.at("punct", ","):
                        p.next()
                        continue
                    break
            p.expect("punct", "]")
        if not vals:
            # empty source: FOREACH over nothing is a no-op, as in Cypher
            src = None
        else:
            src = spark.createDataFrame([(v,) for v in vals], ["__x"])
    p.expect("punct", "|")
    if not p.at("kw", "CREATE"):
        raise CypherSyntaxError(
            "only CREATE is supported inside FOREACH; use UNWIND..MATCH "
            "forms for SET/MERGE/DELETE"
        )
    p.next()
    # node pattern with EXPRESSION-valued properties over the loop var:
    # ( [v] :Label { k: <expr>, ... } )
    p.expect("punct", "(")
    if p.at("word") and p.peek(1) is not None and p.peek(1).text == ":":
        p.next()  # optional node variable, unused
    p.expect("punct", ":")
    label = p.expect("word").text
    props: list[tuple[str, Any]] = []
    if p.at("punct", "{"):
        p.next()
        while True:
            key = p.expect("word").text
            p.expect("punct", ":")
            expr = p.parse_return_expr(allow_bare=True)
            if _contains_agg(expr):
                raise CypherSyntaxError("aggregates not allowed in FOREACH")
            props.append((key, expr))
            if p.at("punct", ","):
                p.next()
                continue
            break
        p.expect("punct", "}")
    p.expect("punct", ")")
    p.expect("punct", ")")
    p.expect_end()
    if not props:
        raise CypherSyntaxError("FOREACH CREATE needs at least one property")
    if src is None:
        return graph

    def colmap(ref) -> Column:
        name = ref.name if isinstance(ref, BareRef) else getattr(ref, "var", None)
        if name == var and not (isinstance(ref, PropRef) and ref.prop is not None):
            return F.col("__x")
        raise CypherSyntaxError(
            f"only the FOREACH variable {var!r} is in scope; got {ref!r}"
        )

    batch = src.select(
        *[_expr_column(e, colmap, src).alias(k) for k, e in props]
    )
    return graph.create_nodes(batch, label)


def _bare_write(graph: PropertyGraph, p: _Parser) -> PropertyGraph:
    """Predicate-addressed interactive writes (no UNWIND batch):

    - ``MATCH (n[:L]) [WHERE ...] [DETACH] DELETE n`` — filtered id
      projection fed to :meth:`PropertyGraph.delete_nodes`, so plain
      DELETE keeps Neo4j's still-has-relationships refusal and DETACH
      cascades to incident edges.
    - ``MATCH (n[:L]) [WHERE ...] SET n.p = <literal>, ...`` — ONE
      conditional projection over the vertex frame (no join, no shuffle:
      the match set is a predicate over the same rows being updated);
      ``SET n.p = null`` removes the property, per Neo4j.
    - ``MATCH (n[:L]) [WHERE ...] REMOVE n.p, ...`` — sugar for SET-null.
    """
    p.expect("kw", "MATCH")
    target = p.parse_pattern()
    if isinstance(target, EdgePat):
        return _bare_edge_write(graph, p, target)
    if target.props and target.var is None:
        raise CypherSyntaxError(
            "a bare-write pattern with a property map needs a variable "
            "(the SET/DELETE clause must reference it)"
        )
    disj = None
    if p.at("kw", "WHERE"):
        p.next()
        disj = p.parse_where()
    # inline map — same desugar contract as reads: (n:L {k: v}) SET ...
    # is (n:L) WHERE n.k = v SET ...
    disj = _and_into(disj, _desugar_inline_props([target], {target.var}))

    def colmap(ref: PropRef) -> Column:
        if ref.var != target.var:
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")
        return F.col("id" if ref.prop is None else ref.prop)

    if p.at("kw", "SET") or p.at("kw", "REMOVE"):
        removing = p.next().text.upper() == "REMOVE"
        values: dict[str, Any] = {}
        set_labels: list[str] = []
        remove_labels: list[str] = []
        replace_props = False
        while True:
            # `n:Label[:Label2...]` item — label mutation (SET n:Archived
            # / REMOVE n:Archived). Multi-label model (SURVEY §1.1):
            # SET ADDS the label (Neo4j semantics) — the vertex keeps its
            # primary ``label`` and grows the ``extra_labels`` set;
            # REMOVE drops the label wherever it appears (nulls the
            # primary, removes from extras), and labels(n) then reads
            # whatever remains — [] when nothing does.
            if (
                p.at("word")
                and p.peek(1) is not None
                and p.peek(1).kind == "punct"
                and p.peek(1).text == ":"
            ):
                lvar = p.next().text
                if lvar != target.var:
                    raise CypherSyntaxError(
                        f"SET/REMOVE target must be {target.var!r}"
                    )
                while p.at("punct", ":"):
                    p.next()  # ':'
                    lbl = p.expect("word").text
                    (remove_labels if removing else set_labels).append(lbl)
            elif (
                not removing
                and p.at("word")
                and p.peek(1) is not None
                and p.peek(1).kind == "op"
                and (
                    (
                        p.peek(1).text == "+"
                        and p.peek(2) is not None
                        and p.peek(2).kind == "op"
                        and p.peek(2).text == "="
                    )
                    or (
                        p.peek(1).text == "="
                        and p.peek(2) is not None
                        and p.peek(2).text in ("{", "$")
                    )
                )
            ):
                # SET n += {k: v, ...} / SET n += $props — Cypher's map
                # merge: listed properties overwrite (null removes, per
                # the SET-null contract), everything else is untouched —
                # exactly a multi-property SET, so it folds into the same
                # values dict / single conditional projection.
                # SET n = {map} / SET n = $props — property REPLACEMENT:
                # additionally every user property NOT listed is removed
                # (nulled) on the matched rows, same single projection.
                mvar = p.next().text
                if p.peek().text == "+":
                    p.next()  # +
                else:
                    replace_props = True
                p.next()  # =
                if mvar != target.var:
                    raise CypherSyntaxError(
                        f"SET/REMOVE target must be {target.var!r}"
                    )
                if p.at("punct", "$"):
                    m = p.parse_value(None)
                    if not isinstance(m, dict):
                        raise CypherSyntaxError(
                            "SET += $param requires a map value"
                        )
                    entries = list(m.items())
                else:
                    p.expect("punct", "{")
                    entries = []
                    while True:
                        k = p.expect("word").text
                        p.expect("punct", ":")
                        val = p.parse_return_expr()
                        if _contains_agg(val):
                            raise CypherSyntaxError(
                                "aggregates are not allowed in SET values"
                            )
                        entries.append((k, val))
                        if p.at("punct", ","):
                            p.next()
                            continue
                        break
                    p.expect("punct", "}")
                for k, val in entries:
                    if k == "label":
                        raise CypherSyntaxError(
                            "the label is set with SET n:Label, not as a "
                            "property"
                        )
                    values[k] = val
            else:
                ref = p.parse_prop_ref()
                if ref.var != target.var or ref.prop is None:
                    raise CypherSyntaxError(
                        f"SET/REMOVE target must be {target.var!r}.<property>"
                    )
                if ref.prop == "label":
                    raise CypherSyntaxError(
                        "the label is set with SET n:Label, not as a property"
                    )
                if removing:
                    values[ref.prop] = None
                else:
                    p.expect("op", "=")
                    # full expressions over the matched node's own
                    # properties — the counter idiom ``SET n.visits =
                    # n.visits + 1`` and computed updates ``SET n.name =
                    # toUpper(n.name)``; literals keep the old fast path
                    val = p.parse_return_expr()
                    if _contains_agg(val):
                        raise CypherSyntaxError(
                            "aggregates are not allowed in SET values"
                        )
                    values[ref.prop] = val
            if p.at("punct", ","):
                p.next()
                continue
            break
        p.expect_end()
        v = graph.vertices
        have = set(v.columns)
        matched = F.lit(True)
        if target.label is not None:
            matched = label_cond(v, target.label)
        if disj is not None:
            # 3VL: a null predicate does not match, as in MATCH..WHERE
            matched = matched & F.coalesce(
                _where_to_column(disj, colmap, have, v), F.lit(False)
            )
        def _valcol(val) -> Column:
            # AST values compile over the SAME projection input, so an
            # expression reads the node's pre-update property values
            # (Cypher: all SET right-hand sides evaluate before any
            # assignment applies)
            if isinstance(
                val,
                (
                    PropRef, BareRef, BinOp, FuncCall, CaseExpr,
                    ListComp, ReduceExpr, IndexExpr, SliceExpr,
                    FieldAccess, ListExpr,
                ),
            ):
                return _expr_column(val, colmap, v)
            return F.lit(val)

        empty_arr = F.array().cast("array<string>")
        extras_in = (
            F.col(EXTRA_LABELS) if EXTRA_LABELS in have
            else F.lit(None).cast("array<string>")
        )

        def _label_out() -> Column:
            # REMOVE nulls the primary where it names it; SET never
            # touches the primary (additive model — extras carry growth)
            col = F.col("label")
            if remove_labels:
                col = F.when(
                    matched & col.isin(*remove_labels),
                    F.lit(None).cast("string"),
                ).otherwise(col)
            return col.alias("label")

        def _extras_out() -> Column:
            # SET appends each label not already carried (primary or
            # extras); REMOVE drops from the extras set. Both arms
            # evaluate against the PRE-update state, like SET values.
            col = extras_in
            if set_labels:
                additions = F.array_compact(
                    F.array(
                        *[
                            F.when(
                                ~F.coalesce(
                                    (F.col("label") == F.lit(lbl))
                                    | F.array_contains(extras_in, lbl),
                                    F.lit(False),
                                ),
                                F.lit(lbl),
                            )
                            for lbl in set_labels
                        ]
                    )
                )
                col = F.when(
                    matched,
                    F.concat(F.coalesce(extras_in, empty_arr), additions),
                ).otherwise(col)
            if remove_labels:
                base = col
                cleaned = F.coalesce(base, empty_arr)
                for lbl in remove_labels:
                    cleaned = F.array_remove(cleaned, lbl)
                col = F.when(matched, cleaned).otherwise(base)
            return col.alias(EXTRA_LABELS)

        out: list[Column] = []
        for c in v.columns:
            if c in values:
                out.append(
                    F.when(matched, _valcol(values[c])).otherwise(F.col(c)).alias(c)
                )
            elif c == "label" and (set_labels or remove_labels):
                out.append(_label_out())
            elif c == EXTRA_LABELS and (set_labels or remove_labels):
                out.append(_extras_out())
            elif replace_props and c not in ("id", "label", EXTRA_LABELS):
                # SET n = {map}: unlisted user properties are REMOVED on
                # the matched rows (nulled; type preserved elsewhere)
                out.append(
                    F.when(matched, F.lit(None)).otherwise(F.col(c)).alias(c)
                )
            else:
                out.append(F.col(c))
        if EXTRA_LABELS not in have and (set_labels or remove_labels):
            out.append(_extras_out())
        for prop, val in values.items():
            # a brand-new property column: matched rows take the value,
            # everyone else reads null (B5 missing-property semantics).
            # REMOVE of a property that never existed is a no-op.
            if prop not in have and val is not None:
                out.append(F.when(matched, _valcol(val)).alias(prop))
        return PropertyGraph(v.select(*out), graph.edges)

    detach = False
    if p.at("kw", "DETACH"):
        detach = True
        p.next()
    p.expect("kw", "DELETE")
    var = p.expect("word").text
    if var != target.var:
        raise CypherSyntaxError(f"DELETE target must be {target.var!r}")
    p.expect_end()

    df = graph.nodes(target.label)
    if disj is not None:
        df = df.filter(_where_to_column(disj, colmap, set(df.columns), df))
    return graph.delete_nodes(df.select("id"), detach=detach)


#: edge columns a SET/REMOVE may never target (structure, not properties)
_EDGE_RESERVED = ("id", "src", "dst", "rel_type")


def _bare_edge_write(graph: PropertyGraph, p: _Parser, pat: EdgePat) -> PropertyGraph:
    """Relationship-property writes through the front end (round-6 verdict
    ask #4 — ``MATCH (a)-[e:T]->(b) SET e.w = 1`` previously had no path;
    edge properties were writable only at CREATE/MERGE):

    - ``MATCH (a[:L1])-[e:T]->(b[:L2]) [WHERE …] SET e.p = <expr>, …``
    - ``SET e += {map}`` (merge) / ``SET e = {map}`` (replace: unlisted
      user properties null out, per Neo4j)
    - ``… REMOVE e.p, …`` — sugar for SET-null
    - ``… DELETE e`` — one anti-join on edge id (:meth:`delete_edges`)

    Mirrors the bare node SET contract (X176). Two plans:

    - FAST PATH (no endpoint labels, WHERE over the edge variable only):
      ONE conditional projection over the edge frame — no join, no
      shuffle, exactly the node-SET shape.
    - endpoint-constrained (a label or an a/b reference in WHERE): the
      matched edge-id set comes from the expand frame (two equi-joins
      Catalyst broadcasts on label-restricted sides), marked back onto
      the edge frame by ONE equi-join on edge id; the update itself is
      still a single conditional projection — at 100 TB this is the same
      shuffle any edge-predicate read costs.

    SET right-hand sides evaluate against the edge's PRE-update
    properties (``SET e.w = e.w + 1``); endpoint properties in SET
    values raise loudly (match them in WHERE, or carry values via an
    UNWIND batch). Relationships have exactly ONE type, so ``SET
    e:Label`` is rejected (Neo4j errors there too).
    """
    if pat.hops is not None:
        raise CypherSyntaxError(
            "variable-length patterns cannot be written to; bind a "
            "single-hop edge variable"
        )
    if pat.undirected:
        raise CypherSyntaxError(
            "edge writes need a directed pattern (-[e:T]-> or <-[e:T]-)"
        )
    evar = pat.var
    if evar is None:
        raise CypherSyntaxError("the edge write pattern needs an edge variable")
    avar, bvar = pat.src.var, pat.dst.var
    disj = None
    if p.at("kw", "WHERE"):
        p.next()
        disj = p.parse_where()
    taken = {v for v in (evar, avar, bvar) if v is not None}
    disj = _and_into(disj, _desugar_inline_props([pat], taken))
    avar, bvar = pat.src.var, pat.dst.var  # desugar names anonymous endpoints

    refs: set[str] = set()
    if disj is not None:
        _disj_vars(disj, refs)
    unknown = refs - {evar, avar, bvar}
    if unknown:
        raise CypherSyntaxError(f"unknown variable {sorted(unknown)[0]!r}")

    # ---- parse the write clause ------------------------------------------
    if p.at("kw", "DELETE") or p.at("kw", "DETACH"):
        if p.at("kw", "DETACH"):
            raise CypherSyntaxError(
                "DETACH applies to nodes; a relationship DELETE is plain "
                "DELETE e"
            )
        p.next()
        var = p.expect("word").text
        if var != evar:
            raise CypherSyntaxError(f"DELETE target must be {evar!r}")
        p.expect_end()
        values: dict[str, Any] | None = None
        removing = replace_props = False
    else:
        if not (p.at("kw", "SET") or p.at("kw", "REMOVE")):
            raise CypherSyntaxError(
                "expected SET, REMOVE or DELETE after the edge pattern"
            )
        removing = p.next().text.upper() == "REMOVE"
        values = {}
        replace_props = False
        while True:
            if (
                p.at("word")
                and p.peek(1) is not None
                and p.peek(1).kind == "punct"
                and p.peek(1).text == ":"
            ):
                raise CypherSyntaxError(
                    "relationships have exactly one type; SET e:Label is "
                    "not defined (Neo4j errors here too)"
                )
            if (
                not removing
                and p.at("word")
                and p.peek(1) is not None
                and p.peek(1).kind == "op"
                and (
                    (
                        p.peek(1).text == "+"
                        and p.peek(2) is not None
                        and p.peek(2).kind == "op"
                        and p.peek(2).text == "="
                    )
                    or (
                        p.peek(1).text == "="
                        and p.peek(2) is not None
                        and p.peek(2).text in ("{", "$")
                    )
                )
            ):
                # SET e += {map} (merge) / SET e = {map} (replace) — the
                # node-SET map contract verbatim, minus label keys
                mvar = p.next().text
                if p.peek().text == "+":
                    p.next()
                else:
                    replace_props = True
                p.next()  # =
                if mvar != evar:
                    raise CypherSyntaxError(
                        f"SET/REMOVE target must be {evar!r}"
                    )
                if p.at("punct", "$"):
                    m = p.parse_value(None)
                    if not isinstance(m, dict):
                        raise CypherSyntaxError(
                            "SET += $param requires a map value"
                        )
                    entries = list(m.items())
                else:
                    p.expect("punct", "{")
                    entries = []
                    while True:
                        k = p.expect("word").text
                        p.expect("punct", ":")
                        val = p.parse_return_expr()
                        if _contains_agg(val):
                            raise CypherSyntaxError(
                                "aggregates are not allowed in SET values"
                            )
                        entries.append((k, val))
                        if p.at("punct", ","):
                            p.next()
                            continue
                        break
                    p.expect("punct", "}")
                for k, val in entries:
                    if k in _EDGE_RESERVED:
                        raise CypherSyntaxError(
                            f"reserved edge property name {k!r}"
                        )
                    values[k] = val
            else:
                ref = p.parse_prop_ref()
                if ref.var != evar or ref.prop is None:
                    raise CypherSyntaxError(
                        f"SET/REMOVE target must be {evar!r}.<property>"
                    )
                if ref.prop in _EDGE_RESERVED:
                    raise CypherSyntaxError(
                        f"reserved edge property name {ref.prop!r}"
                    )
                if removing:
                    values[ref.prop] = None
                else:
                    p.expect("op", "=")
                    val = p.parse_return_expr()
                    if _contains_agg(val):
                        raise CypherSyntaxError(
                            "aggregates are not allowed in SET values"
                        )
                    values[ref.prop] = val
            if p.at("punct", ","):
                p.next()
                continue
            break
        p.expect_end()
        # SET values read the edge's own pre-update state only
        for val in values.values():
            vrefs: set[str] = set()
            _expr_vars(val, vrefs)
            if vrefs - {evar}:
                raise CypherSyntaxError(
                    "SET values may reference the edge's own properties "
                    f"only ({evar!r}); endpoint values need an UNWIND batch"
                )

    # ---- build the matched predicate --------------------------------------
    e = graph.edges
    have = set(e.columns)
    fast = (
        pat.src.label is None
        and pat.dst.label is None
        and refs <= {evar}
    )

    def edge_col(ref: PropRef, prefix: str = "") -> Column:
        return F.col(f"{prefix}{'id' if ref.prop is None else ref.prop}")

    if fast:
        matched = (
            rel_type_cond(pat.rel_type)
            if pat.rel_type is not None
            else F.lit(True)
        )

        def fcolmap(ref: PropRef) -> Column:
            if ref.var != evar:
                raise CypherSyntaxError(f"unknown variable {ref.var!r}")
            return edge_col(ref)

        if disj is not None:
            # pass the edge frame so computed WHERE operands (e.w % 2 = 0)
            # resolve here exactly as they do on the expand path
            matched = matched & F.coalesce(
                _where_to_column(disj, fcolmap, have, e), F.lit(False)
            )
        frame = e
    else:
        exp = graph.expand(pat.src.label, pat.rel_type, pat.dst.label)

        def xcolmap(ref: PropRef) -> Column:
            if ref.var == evar:
                return edge_col(ref)
            if avar is not None and ref.var == avar:
                return edge_col(ref, "a_")
            if bvar is not None and ref.var == bvar:
                return edge_col(ref, "b_")
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")

        if disj is not None:
            exp = exp.filter(
                _where_to_column(disj, xcolmap, set(exp.columns), exp)
            )
        ids = exp.select(F.col("id").alias("__mid")).distinct()
        frame = e.join(ids, e["id"] == F.col("__mid"), "left")
        matched = F.col("__mid").isNotNull()

    if values is None:  # DELETE e
        doomed = frame.filter(matched).select("id")
        return graph.delete_edges(doomed)

    def ecolmap(ref: PropRef) -> Column:
        if ref.var != evar:
            raise CypherSyntaxError(f"unknown variable {ref.var!r}")
        return edge_col(ref)

    def _valcol(val) -> Column:
        # pre-update reads, like the node SET (all RHS evaluate first)
        if isinstance(
            val,
            (
                PropRef, BareRef, BinOp, FuncCall, CaseExpr,
                ListComp, ReduceExpr, IndexExpr, SliceExpr,
                FieldAccess, ListExpr,
            ),
        ):
            return _expr_column(val, ecolmap, e)
        return F.lit(val)

    out: list[Column] = []
    for c in e.columns:
        if c in values:
            out.append(
                F.when(matched, _valcol(values[c])).otherwise(F.col(c)).alias(c)
            )
        elif replace_props and c not in _EDGE_RESERVED:
            out.append(
                F.when(matched, F.lit(None)).otherwise(F.col(c)).alias(c)
            )
        else:
            out.append(F.col(c))
    for prop, val in values.items():
        # brand-new property column: matched rows take the value, the
        # rest read null (missing-property semantics); REMOVE of a
        # property that never existed is a no-op
        if prop not in have and val is not None:
            out.append(F.when(matched, _valcol(val)).alias(prop))
    return PropertyGraph(graph.vertices, frame.select(*out))


@_typed_analysis_errors
def cypher_create_graph(spark, query: str) -> PropertyGraph:
    """Execute a fixture-construction ``CREATE (v:L {..}), ..,
    (v1)-[:T {..}]->(v2)`` statement into a fresh PropertyGraph
    (B9 — `Neo4jFormatTest.java:14-19`)."""
    p = _Parser(_tokenize(query))
    p.expect("kw", "CREATE")
    pats = p.parse_pattern_seq()
    if p.peek() is not None:
        raise CypherSyntaxError(f"unexpected token {p.peek().text!r}")

    # Cypher CREATE declaration rules: a named node is declared at its
    # FIRST occurrence (possibly inline in an edge or chain); later
    # occurrences are references and must not re-declare a label or
    # property map. Anonymous nodes are each a fresh node — identity is
    # per pattern object, so `CREATE (:A {x:1}), (:B {y:2})` creates two
    # nodes (never id-colliding) and chain continuations reuse theirs.
    nodes: list[NodePat] = []
    index: dict[int, int] = {}  # id(NodePat object) -> node index
    byvar: dict[str, NodePat] = {}

    def declare(nd: NodePat) -> NodePat:
        if nd.var is not None:
            prev = byvar.get(nd.var)
            if prev is not None and prev is not nd:
                if nd.props or nd.label:
                    raise CypherSyntaxError(
                        f"variable {nd.var!r} already declared; a "
                        "reference cannot carry a label or property map"
                    )
                return prev
            byvar[nd.var] = nd
        if id(nd) not in index:
            index[id(nd)] = len(nodes)
            nodes.append(nd)
        return nd

    edges: list[tuple[NodePat, NodePat, EdgePat]] = []
    for pat in pats:
        if isinstance(pat, NodePat):
            declare(pat)
            continue
        if pat.undirected:
            raise CypherSyntaxError(
                "CREATE requires a direction (-[:T]-> or <-[:T]-)"
            )
        if pat.hops is not None:
            raise CypherSyntaxError(
                "CREATE cannot use a variable-length pattern"
            )
        edges.append((declare(pat.src), declare(pat.dst), pat))

    vcols = sorted({k for n in nodes for k in n.props})
    vrows = [
        {"id": i, "label": n.label or "Node",
         **{c: n.props.get(c) for c in vcols}}
        for i, n in enumerate(nodes)
    ]
    ecols = sorted({k for _, _, e in edges for k in e.props})
    for _, _, e in edges:
        if isinstance(e.rel_type, tuple):
            raise CypherSyntaxError(
                "CREATE needs exactly ONE relationship type; "
                "[:A|B] alternation is read-only syntax"
            )
    erows = [
        {"id": i, "src": index[id(s)], "dst": index[id(d)],
         "rel_type": e.rel_type or "REL", **{c: e.props.get(c) for c in ecols}}
        for i, (s, d, e) in enumerate(edges)
    ]
    v = spark.createDataFrame(vrows)
    e = (
        spark.createDataFrame(erows)
        if erows
        else spark.createDataFrame([], "id long, src long, dst long, rel_type string")
    )
    return PropertyGraph(v, e)
