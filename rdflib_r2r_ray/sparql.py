"""SPARQL front end: parse a SELECT query string and compile it onto the
Dataset operator layer.

The reference accepts SPARQL end-to-end (``rdflib_r2r/r2r_store.py:59-93``,
dispatcher ``query_conversions.py:388-419``) via rdflib's parser; this
module provides the same surface for the Ray engine over a MATERIALIZED
triples Dataset, without rdflib: a tokenizer + recursive-descent parser
builds a small algebra (dataclasses below), and ``execute`` lowers it:

- BGP patterns (+ ``/`` sequence, ``|`` alternative, ``^`` inverse property
  paths) → ``bgp.execute_bgp`` (pattern filters fused with the scan, shared
  variables joined through the broadcast-vs-shuffle planner)
- ``<p>+`` transitive paths → ``bgp.transitive_closure`` fixpoint
- FILTER comparisons / && / || / ! → vectorized Arrow masks; numeric
  comparisons decode typed-literal lexical forms per batch
- initBindings (``r2r_store.py:62-75``) → inline VALUES Dataset joined on
  the bound variables before anything else touches the data
- SELECT [DISTINCT] / ORDER BY / LIMIT / OFFSET → project, hash-distinct,
  partial-top-k sort, bounded offset drop

Supported subset: SELECT queries, basic graph patterns with constant or
variable terms, property paths (seq/alt/inverse/one-or-more on constant
predicates), conjunctive FILTER over comparisons, OPTIONAL blocks (→
left-outer join on shared variables), MINUS blocks (→ anti-join on shared
variables), top-level ``{A} UNION {B}`` groups (→ null-padded union),
solution modifiers.  Not supported (raises): GROUP BY / aggregates in the
STRING syntax — compose those through the relational operator layer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .bgp import execute_bgp, transitive_closure
from .paths import Alt, Inv, Seq, Var
from .relational import topk, topk_offset
from .stages.dedup import distinct_on

XSD = "http://www.w3.org/2001/XMLSchema#"


# ---------------------------------------------------------------------------
# algebra
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Comparison:
    var: str
    op: str            # == != < <= > >=
    value: object      # python str/int/float
    numeric: bool


@dataclass(frozen=True)
class BoolExpr:
    """Conjunction/disjunction tree over comparisons."""

    kind: str          # 'cmp' | 'and' | 'or' | 'not'
    cmp: Optional[Comparison] = None
    args: Tuple["BoolExpr", ...] = ()


@dataclass(frozen=True)
class Aggregate:
    fn: str        # count | sum | min | max | sample
    var: Optional[str]  # None = COUNT(*)
    alias: str


@dataclass(frozen=True)
class SelectQuery:
    variables: Tuple[str, ...]   # () = SELECT *
    patterns: Tuple[Tuple, ...]  # triple patterns (terms: Var | str | Path)
    filters: Tuple[BoolExpr, ...]
    distinct: bool = False
    order_by: Tuple[Tuple[str, bool], ...] = ()  # (var, descending)
    limit: Optional[int] = None
    offset: int = 0
    # OPTIONAL { ... } blocks: each is a pattern group left-joined on the
    # variables it shares with the required part
    optionals: Tuple[Tuple[Tuple, ...], ...] = ()
    # MINUS { ... } blocks: anti-joined on shared variables
    minuses: Tuple[Tuple[Tuple, ...], ...] = ()
    # { A } UNION { B }: the group bodies of each branch (patterns, filters)
    union_branches: Tuple[Tuple[Tuple[Tuple, ...], Tuple[BoolExpr, ...]], ...] = ()
    # (COUNT(?y) AS ?n)-style projections + GROUP BY keys
    aggregates: Tuple[Aggregate, ...] = ()
    group_by: Tuple[str, ...] = ()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_SP_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>\s]*>)
    | (?P<var>\?[A-Za-z_][\w]*)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>-?\d+(?:\.\d+)?)
    | (?P<kw>(?i:PREFIX|SELECT|DISTINCT|WHERE|FILTER|ORDER|BY|ASC|DESC|LIMIT|OFFSET|VALUES)\b)
    | (?P<pname>[A-Za-z_][\w-]*)?:(?P<lname>[\w-]*)
    | (?P<word>[A-Za-z_][\w]*)
    | (?P<punct>&&|\|\||!=|<=|>=|[{}().;,*+|/^!=<>])
    | (?P<ws>\s+)
    """,
    re.X,
)


class SparqlParser:
    def __init__(self, text: str):
        self.toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _SP_TOKEN.match(text, pos)
            if not m:
                raise ValueError(f"SPARQL parse error at {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            if kind == "lname":
                self.toks.append(("pname", (m.group("pname") or "") + ":" + m.group("lname")))
            elif kind == "kw":
                self.toks.append(("kw", m.group(0).upper()))
            else:
                self.toks.append((kind, m.group(0)))
        self.i = 0
        self.prefixes: Dict[str, str] = {}

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val):
        k, v = self._next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    # --- terms -------------------------------------------------------------

    def _iri(self, tok: Tuple[str, str]) -> str:
        k, v = tok
        if k == "iri":
            return v  # keep <...> form — terms are stored N3-encoded
        if k == "pname":
            pfx, local = v.split(":", 1)
            if pfx not in self.prefixes:
                raise ValueError(f"unknown prefix {pfx!r}")
            return f"<{self.prefixes[pfx]}{local}>"
        raise ValueError(f"expected IRI, got {v!r}")

    def _term(self):
        k, v = self._next()
        if k == "var":
            return Var(v[1:])
        if k in ("iri", "pname"):
            return self._iri((k, v))
        if k == "word" and v == "a":
            return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
        if k == "string":
            return v[1:-1].replace('\\"', '"')  # plain literals are stored bare
        if k == "number":
            # typed-literal N3 encoding used by the emit layer
            if "." in v:
                return f'"{v}"^^<{XSD}double>'
            return f'"{v}"^^<{XSD}integer>'
        raise ValueError(f"unexpected term {v!r}")

    def _path(self):
        """Property path over constant IRIs: atom (/ atom)* with | ^ +."""

        def atom():
            k, v = self._peek()
            if v == "^":
                self._next()
                return Inv(self._iri(self._next()))
            if v == "(":
                self._next()
                p = alt()
                self._expect(")")
                return p
            if k == "var":
                self._next()
                return Var(v[1:])
            if k == "word" and v == "a":
                self._next()
                return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
            p = self._iri(self._next())
            k2, v2 = self._peek()
            if v2 == "+":
                self._next()
                return ("transitive", p)
            return p

        def seq():
            parts = [atom()]
            while self._peek()[1] == "/":
                self._next()
                parts.append(atom())
            return parts[0] if len(parts) == 1 else Seq(*parts)

        def alt():
            parts = [seq()]
            while self._peek()[1] == "|":
                self._next()
                parts.append(seq())
            return parts[0] if len(parts) == 1 else Alt(*parts)

        return alt()

    # --- filters -----------------------------------------------------------

    def _filter_expr(self) -> BoolExpr:
        def primary():
            k, v = self._peek()
            if v == "!":
                self._next()
                return BoolExpr("not", args=(primary(),))
            if v == "(":
                self._next()
                e = or_expr()
                self._expect(")")
                return e
            # comparison: ?var op value   (or value op ?var)
            k, v = self._next()
            if k != "var":
                raise ValueError(f"filter must compare a variable, got {v!r}")
            var = v[1:]
            _, op = self._next()
            opmap = {"=": "==", "!=": "!=", "<": "<", "<=": "<=", ">": ">", ">=": ">="}
            if op not in opmap:
                raise ValueError(f"unsupported filter operator {op!r}")
            vk, vv = self._next()
            if vk == "number":
                val = float(vv) if "." in vv else int(vv)
                return BoolExpr("cmp", Comparison(var, opmap[op], val, numeric=True))
            if vk == "string":
                return BoolExpr("cmp", Comparison(var, opmap[op], vv[1:-1], numeric=False))
            if vk in ("iri", "pname"):
                return BoolExpr("cmp", Comparison(var, opmap[op], self._iri((vk, vv)), numeric=False))
            raise ValueError(f"unsupported filter value {vv!r}")

        def and_expr():
            parts = [primary()]
            while self._peek()[1] == "&&":
                self._next()
                parts.append(primary())
            return parts[0] if len(parts) == 1 else BoolExpr("and", args=tuple(parts))

        def or_expr():
            parts = [and_expr()]
            while self._peek()[1] == "||":
                self._next()
                parts.append(and_expr())
            return parts[0] if len(parts) == 1 else BoolExpr("or", args=tuple(parts))

        return or_expr()

    # --- query -------------------------------------------------------------

    def parse(self) -> SelectQuery:
        while self._peek()[1] == "PREFIX":
            self._next()
            pk, pv = self._next()
            if pk != "pname" or not pv.endswith(":"):
                raise ValueError(f"bad PREFIX name {pv!r}")
            iv = self._next()
            self.prefixes[pv[:-1]] = iv[1][1:-1]
        self._expect("SELECT")
        distinct = False
        if self._peek()[1] == "DISTINCT":
            self._next()
            distinct = True
        variables: List[str] = []
        aggregates: List[Aggregate] = []
        while True:
            k, v = self._peek()
            if v == "*":
                self._next()
                break
            if k == "var":
                self._next()
                variables.append(v[1:])
                continue
            if v == "(":
                # (COUNT(?y) AS ?n) | (SUM/MIN/MAX/SAMPLE(?y) AS ?n)
                self._next()
                fk, fv = self._next()
                fn = str(fv).lower()
                if fn not in ("count", "sum", "min", "max", "sample"):
                    raise NotImplementedError(f"aggregate {fv!r} not supported")
                self._expect("(")
                ak, av = self._next()
                agg_var = None if av == "*" else av[1:]
                self._expect(")")
                wk, wv = self._next()
                if str(wv).upper() != "AS":
                    raise ValueError(f"expected AS in aggregate projection, got {wv!r}")
                _, alias_v = self._next()
                self._expect(")")
                aggregates.append(Aggregate(fn=fn, var=agg_var, alias=alias_v[1:]))
                continue
            break
        if self._peek()[1] == "WHERE":
            self._next()
        self._expect("{")
        patterns: List[Tuple] = []
        filters: List[BoolExpr] = []
        optionals: List[Tuple[Tuple, ...]] = []
        minuses: List[Tuple[Tuple, ...]] = []
        union_branches: List = []

        def parse_simple_group():
            """{ triples + filters } — the body of a UNION branch."""
            pats: List[Tuple] = []
            fils: List[BoolExpr] = []
            self._expect("{")
            while True:
                k2, v2 = self._peek()
                if v2 == "}":
                    self._next()
                    return tuple(pats), tuple(fils)
                if v2 == ".":
                    self._next()
                    continue
                if v2 == "FILTER":
                    self._next()
                    self._expect("(")
                    fils.append(self._filter_expr())
                    self._expect(")")
                    continue
                pats.append((self._term(), self._path(), self._term()))

        while True:
            k, v = self._peek()
            if v == "}":
                self._next()
                break
            if v == ".":
                self._next()
                continue
            if v == "FILTER":
                self._next()
                self._expect("(")
                filters.append(self._filter_expr())
                self._expect(")")
                continue
            if k == "word" and v.upper() == "OPTIONAL":
                self._next()
                pats, fils = parse_simple_group()
                if fils:
                    raise NotImplementedError("FILTER inside OPTIONAL is not supported")
                optionals.append(pats)
                continue
            if k == "word" and v.upper() == "MINUS":
                self._next()
                pats, fils = parse_simple_group()
                if fils:
                    raise NotImplementedError("FILTER inside MINUS is not supported")
                minuses.append(pats)
                continue
            if v == "{":
                # { A } UNION { B } [UNION { C } ...]
                branches = [parse_simple_group()]
                while self._peek()[1] is not None and str(self._peek()[1]).upper() == "UNION":
                    self._next()
                    branches.append(parse_simple_group())
                if len(branches) < 2:
                    raise ValueError("a braced group must be part of a UNION")
                union_branches.extend(branches)
                continue
            if k == "word" and v.upper() == "UNION":
                raise NotImplementedError(
                    f"{v} is not supported in the string front end — compose it "
                    "through the relational operator layer instead"
                )
            s = self._term()
            p = self._path()
            o = self._term()
            patterns.append((s, p, o))
        order: List[Tuple[str, bool]] = []
        group_by: List[str] = []
        limit = None
        offset = 0
        while True:
            k, v = self._peek()
            if k == "word" and v.upper() == "GROUP":
                self._next()
                self._expect("BY")
                while self._peek()[0] == "var":
                    _, gv = self._next()
                    group_by.append(gv[1:])
                continue
            if v == "ORDER":
                self._next()
                self._expect("BY")
                while True:
                    k2, v2 = self._peek()
                    if v2 in ("ASC", "DESC"):
                        self._next()
                        desc = v2 == "DESC"
                        self._expect("(")
                        _, vv = self._next()
                        self._expect(")")
                        order.append((vv[1:], desc))
                    elif k2 == "var":
                        self._next()
                        order.append((v2[1:], False))
                    else:
                        break
            elif v == "LIMIT":
                self._next()
                limit = int(self._next()[1])
            elif v == "OFFSET":
                self._next()
                offset = int(self._next()[1])
            elif k is None:
                break
            else:
                raise ValueError(f"unexpected trailing token {v!r}")
        if union_branches and (patterns or optionals or minuses):
            raise NotImplementedError(
                "UNION mixed with other group elements is not supported — "
                "use a single { A } UNION { B } group"
            )
        return SelectQuery(
            variables=tuple(variables),
            patterns=tuple(patterns),
            filters=tuple(filters),
            distinct=distinct,
            order_by=tuple(order),
            limit=limit,
            offset=offset,
            optionals=tuple(optionals),
            minuses=tuple(minuses),
            union_branches=tuple(union_branches),
            aggregates=tuple(aggregates),
            group_by=tuple(group_by),
        )


# ---------------------------------------------------------------------------
# compiler / executor
# ---------------------------------------------------------------------------

_LEX_RE = r'^"(?P<lex>[^"]*)"'


def _numeric_col(batch: pa.Table, var: str) -> pa.Array:
    """Decode a term column to float64 for numeric comparison: typed
    literals ("5"^^<xsd:integer>) take their lexical form; bare numeric
    strings cast directly; anything non-numeric becomes NULL (comparison
    false — SPARQL type-error semantics)."""
    col = batch[var]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lex = pc.extract_regex(col, _LEX_RE)
    lex_vals = pc.if_else(
        pc.is_valid(lex), pc.struct_field(lex, "lex"), col
    )
    # cast with errors → null: pre-filter to numeric-looking strings
    is_num = pc.match_substring_regex(lex_vals, r"^-?\d+(\.\d+)?$")
    safe = pc.if_else(is_num, lex_vals, pa.scalar(None, pa.string()))
    return pc.cast(safe, pa.float64())


def _compile_filter(expr: BoolExpr, batch: pa.Table) -> pa.Array:
    if expr.kind == "cmp":
        c = expr.cmp
        if c.numeric:
            col = _numeric_col(batch, c.var)
            val = pa.scalar(float(c.value), pa.float64())
        else:
            col = batch[c.var]
            val = pa.scalar(c.value, pa.string())
        fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
              ">": pc.greater, ">=": pc.greater_equal}[c.op]
        return pc.fill_null(fn(col, val), False)
    if expr.kind == "and":
        out = _compile_filter(expr.args[0], batch)
        for a in expr.args[1:]:
            out = pc.and_(out, _compile_filter(a, batch))
        return out
    if expr.kind == "or":
        out = _compile_filter(expr.args[0], batch)
        for a in expr.args[1:]:
            out = pc.or_(out, _compile_filter(a, batch))
        return out
    if expr.kind == "not":
        return pc.invert(_compile_filter(expr.args[0], batch))
    raise ValueError(expr.kind)


def _expand_transitive(in_patterns, triples: rd.Dataset):
    """Rewrite ``(s, ('transitive', p), o)`` patterns: the closure pairs
    become an auxiliary predicate in an augmented triples Dataset."""
    patterns = []
    aug = triples
    n = 0
    for s, p, o in in_patterns:
        if isinstance(p, tuple) and p and p[0] == "transitive":
            n += 1
            closure_pred = f"<urn:closure:{n}>"
            clos = transitive_closure(triples, p[1])
            clos_triples = clos.map_batches(
                lambda b, _cp=closure_pred: pa.table(
                    {"subj": b["s"], "pred": pa.array([_cp] * len(b), pa.string()),
                     "obj": b["o"]}
                ),
                batch_format="pyarrow",
            )
            aug = aug.select_columns(["subj", "pred", "obj"]).union(clos_triples)
            patterns.append((s, closure_pred, o))
        else:
            patterns.append((s, p, o))
    return patterns, aug


def execute(
    triples: rd.Dataset,
    query: str,
    init_bindings: Optional[Dict[str, str]] = None,
    broadcast_threshold: int = 100_000,
) -> rd.Dataset:
    """Run a SPARQL SELECT string over a triples Dataset.

    ``init_bindings`` (reference ``r2r_store.py:62-75``): variable → term
    pre-bindings, applied as an inline single-row VALUES join — the
    restriction reaches the BGP before any data moves."""
    q = SparqlParser(query).parse()

    def bind(pats):
        if not init_bindings:
            return list(pats)
        bound = dict(init_bindings)
        return [
            tuple(bound.get(t.name, t) if isinstance(t, Var) else t for t in pat)
            for pat in pats
        ]

    def exec_group(pats, fils) -> rd.Dataset:
        pats2, aug = _expand_transitive(bind(pats), triples)
        g = execute_bgp(aug, pats2, broadcast_threshold=broadcast_threshold)
        for f in fils:
            g = g.map_batches(
                lambda b, _f=f: b.filter(_compile_filter(_f, b)), batch_format="pyarrow"
            )
        return g

    if q.union_branches:
        # { A } UNION { B }: branches execute independently, results align
        # with null padding (reference results_union semantics)
        from .relational import union_pad

        out = union_pad(*[exec_group(p, f) for p, f in q.union_branches])
        for f in q.filters:
            out = out.map_batches(
                lambda b, _f=f: b.filter(_compile_filter(_f, b)), batch_format="pyarrow"
            )
    else:
        out = exec_group(q.patterns, ())
        # OPTIONAL blocks: left-outer join on the shared variables
        # (reference OPTIONAL → LEFT JOIN, query_conversions.py:349-374)
        from .relational import planned_join

        for opt in q.optionals:
            opt_pats, aug = _expand_transitive(bind(opt), triples)
            opt_out = execute_bgp(aug, opt_pats, broadcast_threshold=broadcast_threshold)
            left_vars = set(out.schema().names)
            shared = [v for v in opt_out.schema().names if v in left_vars]
            if not shared:
                raise NotImplementedError("OPTIONAL sharing no variable with the required part")
            out = planned_join(out, opt_out, on=shared, join_type="left_outer")
        # MINUS blocks: anti-join on shared variables (reference MINUS →
        # NOT EXISTS, query_conversions.py:403-406; exact because BGP
        # solutions always bind their variables)
        for mns in q.minuses:
            m_pats, aug = _expand_transitive(bind(mns), triples)
            m_out = execute_bgp(aug, m_pats, broadcast_threshold=broadcast_threshold)
            left_vars = set(out.schema().names)
            shared = [v for v in m_out.schema().names if v in left_vars]
            if not shared:
                raise NotImplementedError("MINUS sharing no variable with the required part")
            out = planned_join(out, m_out.select_columns(shared), on=shared,
                               join_type="left_anti")
        for f in q.filters:
            out = out.map_batches(
                lambda b, _f=f: b.filter(_compile_filter(_f, b)), batch_format="pyarrow"
            )

    if q.aggregates:
        # GROUP BY + aggregates (reference F11 family,
        # ``query_conversions.py:57-81``) via the map-side-combined
        # grouped_agg; SAMPLE = deterministic min witness; SUM decodes
        # typed-literal lexical forms to float64 per batch.
        from .relational import extend, grouped_agg

        keys = list(q.group_by)
        if not keys:
            raise NotImplementedError("aggregates require GROUP BY in this front end")
        mins, maxs, sums = [], [], []
        count_alias = None
        prep_cols = {}
        for a in q.aggregates:
            if a.fn == "count":
                if count_alias is not None:
                    raise NotImplementedError("multiple COUNTs in one query")
                count_alias = a.alias
            elif a.fn in ("min", "sample"):
                prep_cols[a.alias] = a.var
                mins.append(a.alias)
            elif a.fn == "max":
                prep_cols[a.alias] = a.var
                maxs.append(a.alias)
            elif a.fn == "sum":
                prep_cols[a.alias] = ("num", a.var)
                sums.append(a.alias)
        if prep_cols:
            out = extend(out, **{
                alias: (
                    (lambda b, _v=spec[1]: _numeric_col(b, _v))
                    if isinstance(spec, tuple)
                    else (lambda b, _v=spec: b[_v])
                )
                for alias, spec in prep_cols.items()
            })
        out = grouped_agg(
            out.select_columns(keys + list(prep_cols)),
            keys, sums=sums, mins=mins, maxs=maxs, count_as=count_alias,
        )
        proj = keys + [a.alias for a in q.aggregates]
        out = out.select_columns([c for c in proj])
    elif q.variables:
        out = out.select_columns(list(q.variables))
    if q.distinct:
        out = distinct_on(out, list(q.variables) if q.variables else out.schema().names)
    if q.order_by:
        keys = [v for v, _ in q.order_by]
        desc = [d for _, d in q.order_by]
        if q.limit is not None:
            if q.offset:
                out = topk_offset(out, keys, q.limit, q.offset, descending=desc)
            else:
                out = topk(out, keys, q.limit, descending=desc)
        else:
            out = out.sort(keys, descending=desc)
            if q.offset:
                raise NotImplementedError("OFFSET without LIMIT needs a LIMIT bound")
    elif q.limit is not None:
        out = out.limit(q.limit + q.offset)
        if q.offset:
            import ray

            mat = out.materialize()
            tables = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
            if tables:
                out = rd.from_arrow(pa.concat_tables(tables).slice(q.offset, q.limit))
            else:
                s = mat.schema()
                out = rd.from_arrow(pa.schema(list(zip(s.names, s.types))).empty_table())
    return out
