"""R2RML mapping loader: parse a Turtle (.ttl) mapping document into the
engine's :class:`~rdflib_r2r_ray.mapping.Mapping` dataclasses.

The reference consumes R2RML TTL via rdflib (``r2r_mapping.py:28-40``;
``sql_converter.py:246-267``; fixture ``tests/northwind/NorthwindR2RML.ttl``).
This environment has no rdflib, so a self-contained parser covers the Turtle
subset R2RML documents actually use — prefixes, IRIs, prefixed names, quoted
literals (with ``^^``/``@`` suffixes), nested blank-node property lists,
``;``/``,`` continuation, ``a`` — and an interpreter maps the rr: vocabulary
onto the dataclass model:

- ``rr:logicalTable [rr:tableName|rr:sqlQuery]`` → table name or named view
- ``rr:subjectMap [rr:template|rr:column|rr:constant, rr:class*, rr:termType,
  rr:graph]`` (+ ``rr:subject`` shortcut)
- ``rr:predicateObjectMap [rr:predicate|rr:predicateMap, rr:object|
  rr:objectMap [...]]`` with ``rr:column/rr:template/rr:constant``,
  ``rr:datatype``, ``rr:language``, ``rr:termType``
- ``rr:parentTriplesMap`` + ``rr:joinCondition [rr:child; rr:parent]`` →
  ``ref`` term maps (folded to child templates when derivable, real join
  via ``pipelines.kg.ref_join_triples`` otherwise)

SQL-view logical tables (``rr:sqlQuery``) are returned as a ``views`` dict
(name → SQL); the pipeline builder materializes each view as an upstream
Dataset (see ``driver_api.q_kg_r2rml_view``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from .mapping import Mapping, PredicateObjectMap, TermMap, TriplesMap

RR = "http://www.w3.org/ns/r2rml#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


# ---------------------------------------------------------------------------
# Turtle tokenizer + parser (subset)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<literal3>"{3}(?:[^"\\]|\\.|"(?!""))*"{3})
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<dtype>\^\^)
    | (?P<kw_prefix2>@prefix|@base)
    | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<bool>\b(?:true|false)\b)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<lname>[\w.-]*)
    | (?P<kw_a>\ba\b)
    | (?P<number>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<punct>[;,.\[\]()])
    | (?P<ws>\s+)
    """,
    re.X,
)

_UESC = re.compile(r"\\u([0-9a-fA-F]{4})|\\U([0-9a-fA-F]{8})")


def _unescape(body: str) -> str:
    """Turtle string unescapes (incl. \\uXXXX — ``unicode_escape`` would
    mangle non-ASCII text, so escapes resolve individually)."""
    body = _UESC.sub(lambda m: chr(int(m.group(1) or m.group(2), 16)), body)
    return (body.replace("\\\\", "\x00").replace('\\"', '"')
                .replace("\\n", "\n").replace("\\t", "\t")
                .replace("\\r", "\r").replace("\x00", "\\"))


@dataclass
class _Node:
    """Parsed RDF term: ('iri', value) | ('literal', value, dtype, lang) |
    ('bnode', id)."""

    kind: str
    value: str
    dtype: Optional[str] = None
    lang: Optional[str] = None


class TurtleParser:
    def __init__(self, text: str):
        self.toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m:
                raise ValueError(f"turtle parse error at {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            if kind == "kw_prefix2":
                kind = "kw_prefix"
            if kind == "lname":  # pname:lname pair
                val = (m.group("pname") or "") + ":" + m.group("lname")
                # Turtle locals may contain dots but not END with one — a
                # trailing dot is the statement terminator
                while val.endswith("."):
                    val = val[:-1]
                    pos -= 1
                self.toks.append(("pname", val))
            else:
                self.toks.append((kind, m.group(0)))
        self.i = 0
        self.prefixes: Dict[str, str] = {}
        self.base = ""
        self.bnode_n = 0
        # triples: subject-key -> list[(pred_iri, _Node)]
        self.spo: Dict[str, List[Tuple[str, _Node]]] = {}

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, val: str):
        k, v = self._next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")

    def _resolve_pname(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"unknown prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def _term(self) -> _Node:
        k, v = self._next()
        if k == "iri":
            iri = v[1:-1]
            if iri and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = self.base + iri  # relative IRI
            return _Node("iri", iri)
        if k == "pname":
            if v.startswith("_:"):
                return _Node("bnode", v)  # labelled blank node
            return _Node("iri", self._resolve_pname(v))
        if k == "kw_a":
            return _Node("iri", RDF + "type")
        if k == "bool":
            return _Node("literal", v, XSD + "boolean", None)
        if k == "number":
            if "e" in v.lower():
                dt = XSD + "double"
            elif "." in v:
                dt = XSD + "decimal"
            else:
                dt = XSD + "integer"
            return _Node("literal", v, dt, None)
        if k in ("literal", "literal3"):
            body = _unescape(v[3:-3] if k == "literal3" else v[1:-1])
            dtype = lang = None
            nk, nv = self._peek()
            if nk == "dtype":
                self._next()
                dtype = self._term().value
            elif nk == "lang":
                self._next()
                lang = nv[1:]
            return _Node("literal", body, dtype, lang)
        if v == "[":
            self.bnode_n += 1
            bid = f"_:__anon{self.bnode_n}"  # avoid colliding with document _:labels
            self._predicate_object_list(bid, stop="]")
            self._expect("]")
            return _Node("bnode", bid)
        raise ValueError(f"unexpected term token {k}:{v!r}")

    def _predicate_object_list(self, subj_key: str, stop: str):
        while True:
            k, v = self._peek()
            if v == stop or k is None:
                return
            pred = self._term()
            if pred.kind != "iri":
                raise ValueError("predicate must be an IRI")
            while True:
                obj = self._term()
                self.spo.setdefault(subj_key, []).append((pred.value, obj))
                k, v = self._peek()
                if v == ",":
                    self._next()
                    continue
                break
            k, v = self._peek()
            if v == ";":
                self._next()
                continue
            return

    def parse(self) -> "TurtleParser":
        while self.i < len(self.toks):
            k, v = self._peek()
            if k == "kw_prefix":
                self._next()
                if v == "@prefix":
                    pk, pv = self._next()  # pname with empty local, e.g. "rr:"
                    if pk != "pname" or not pv.endswith(":"):
                        raise ValueError(f"bad @prefix name {pv!r}")
                    ik, iv = self._next()
                    if ik != "iri":
                        raise ValueError("@prefix needs an IRI")
                    self.prefixes[pv[:-1]] = iv[1:-1]
                else:  # @base
                    ik, iv = self._next()
                    self.base = iv[1:-1]
                self._expect(".")
                continue
            subj = self._term()
            key = subj.value if subj.kind != "bnode" else subj.value
            self._predicate_object_list(key, stop=".")
            self._expect(".")
        return self


# ---------------------------------------------------------------------------
# R2RML interpreter
# ---------------------------------------------------------------------------

def _one(props: List[Tuple[str, _Node]], pred: str) -> Optional[_Node]:
    for p, o in props:
        if p == pred:
            return o
    return None


def _all(props: List[Tuple[str, _Node]], pred: str) -> List[_Node]:
    return [o for p, o in props if p == pred]


def _ident(name: str) -> str:
    """Strip SQL identifier delimiters: R2RML column references may be
    delimited (``rr:column "\\"amount\\""``, suite D012) while the reflected
    Arrow schema holds the bare name."""
    if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
        return name[1:-1].replace('""', '"')
    return name


def _encode_constant(node: _Node) -> TermMap:
    if node.kind == "iri":
        return TermMap.iri_constant(node.value)
    if node.lang:
        lex = node.value.replace("\\", "\\\\").replace('"', '\\"')
        return TermMap.literal_constant(f'"{lex}"@{node.lang}')
    if node.dtype and node.dtype != XSD + "string":
        lex = node.value.replace("\\", "\\\\").replace('"', '\\"')
        return TermMap.literal_constant(f'"{lex}"^^<{node.dtype}>')
    # plain literal: the engine's storage form is the BARE lexical
    # (terms.py wire format; quoting it would emit a quoted string value)
    return TermMap.literal_constant(node.value)


# BCP47-shaped language tag with an ISO-639 primary subtag (1-3 alpha).
# R2RML requires a VALID language tag (spec §10.2); the W3C suite's negative
# case R2RMLTC0015b uses "english" (7-letter primary subtag) and expects
# rejection.
_LANG_RE = re.compile(r"^[A-Za-z]{1,3}(-[A-Za-z0-9]{1,8})*$")


def _graph_term(parser: TurtleParser, props: List[Tuple[str, _Node]]) -> Optional[TermMap]:
    """rr:graph <iri> shorthand or rr:graphMap term map → IRI-typed TermMap;
    ``rr:defaultGraph`` (or absence) → None.  Graph terms must be IRIs
    (R2RML spec §9; suite negative case R2RMLTC0007h)."""
    g = _one(props, RR + "graph")
    if g is not None:
        if g.kind != "iri":
            raise ValueError("rr:graph must be an IRI")
        return None if g.value == RR + "defaultGraph" else TermMap.iri_constant(g.value)
    gm = _one(props, RR + "graphMap")
    if gm is None:
        return None
    t = _parse_term_map(parser, gm, "g", {}, {})
    if t.term_type in ("literal", "bnode"):
        raise ValueError("rr:graphMap term must be an IRI")
    if t.kind == "constant":
        if not (t.constant or "").startswith("<"):
            raise ValueError("rr:graphMap constant must be an IRI")
        return None if t.constant == f"<{RR}defaultGraph>" else t
    from dataclasses import replace as _replace

    return _replace(t, term_type="iri")


def _parse_term_map(parser: TurtleParser, node: _Node, position: str,
                    subj_maps: Dict[str, TermMap], tm_tables: Dict[str, str]) -> TermMap:
    """One rr:subjectMap / rr:predicateMap / rr:objectMap property list."""
    props = parser.spo.get(node.value, [])
    tt_node = _one(props, RR + "termType")
    term_type = None
    if tt_node is not None:
        term_type = {RR + "IRI": "iri", RR + "BlankNode": "bnode",
                     RR + "Literal": "literal"}[tt_node.value]
    dt_node = _one(props, RR + "datatype")
    lang_node = _one(props, RR + "language")
    dtype = dt_node.value if dt_node is not None else None
    lang = lang_node.value if lang_node is not None else None
    if lang is not None and not _LANG_RE.match(lang):
        raise ValueError(f"invalid rr:language tag {lang!r}")

    const = _one(props, RR + "constant")
    if const is not None:
        base = _encode_constant(const)
        return base
    col = _one(props, RR + "column")
    if col is not None:
        return TermMap(kind="column", column=_ident(col.value),
                       term_type=term_type, datatype=dtype, language=lang)
    tpl = _one(props, RR + "template")
    if tpl is not None:
        return TermMap(kind="template", template=tpl.value, term_type=term_type,
                       datatype=dtype, language=lang)
    parent = _one(props, RR + "parentTriplesMap")
    if parent is not None:
        joins = []
        for jc in _all(props, RR + "joinCondition"):
            jprops = parser.spo.get(jc.value, [])
            child = _one(jprops, RR + "child")
            par = _one(jprops, RR + "parent")
            if child is None or par is None:
                raise ValueError("joinCondition needs rr:child and rr:parent")
            joins.append((_ident(child.value), _ident(par.value)))
        return TermMap(
            kind="ref",
            parent_table=tm_tables[parent.value],
            parent_subject=subj_maps[parent.value],
            join=tuple(joins),
        )
    raise ValueError(f"term map {node.value} has no constant/column/template/parent")


def load_r2rml(text: str, base: str = "") -> Tuple[Mapping, Dict[str, str]]:
    """Parse an R2RML Turtle document → (Mapping, views).

    ``views`` maps synthetic table names (``view:<n>``) to their
    ``rr:sqlQuery`` SQL strings; TriplesMaps over plain ``rr:tableName``
    reference the table name directly."""
    parser = TurtleParser(text).parse()
    base = base or parser.base

    # a TriplesMap = any subject with rr:logicalTable (the logical-table
    # BNODE itself carries rr:tableName/rr:sqlQuery and is not a TriplesMap)
    tm_subjects: List[str] = [
        subj for subj, props in parser.spo.items()
        if _one(props, RR + "logicalTable") is not None
    ]

    views: Dict[str, str] = {}
    tm_tables: Dict[str, str] = {}
    for subj in tm_subjects:
        props = parser.spo[subj]
        lt = _one(props, RR + "logicalTable")
        lt_props = parser.spo.get(lt.value, []) if lt is not None else props
        sv = _one(lt_props, RR + "sqlVersion")
        if sv is not None and sv.value != RR + "SQL2008":
            # only the Core SQL 2008 identifier is defined (R2RML spec §5.2;
            # W3C negative case R2RMLTC0003a uses an undefined rr:SQL1979)
            raise ValueError(f"undefined rr:sqlVersion {sv.value!r}")
        tn = _one(lt_props, RR + "tableName")
        if tn is not None:
            tm_tables[subj] = _ident(tn.value)
        else:
            sq = _one(lt_props, RR + "sqlQuery")
            if sq is None:
                raise ValueError(f"TriplesMap {subj}: no tableName or sqlQuery")
            vname = f"view:{len(views) + 1}"
            views[vname] = sq.value
            tm_tables[subj] = vname

    # first pass: subject maps (ref object maps need them)
    subj_maps: Dict[str, TermMap] = {}
    classes: Dict[str, Tuple[str, ...]] = {}
    graphs: Dict[str, Optional[str]] = {}
    for subj in tm_subjects:
        props = parser.spo[subj]
        sm = _one(props, RR + "subjectMap")
        if sm is not None:
            if len(_all(props, RR + "subjectMap")) > 1:
                # R2RML: exactly one subject map (suite negative R2RMLTC0012d)
                raise ValueError(f"TriplesMap {subj}: multiple subjectMaps")
            smap = _parse_term_map(parser, sm, "s", {}, {})
            if smap.term_type == "literal" or (
                smap.kind == "constant" and not (smap.constant or "").startswith(("<", "_:"))
            ):
                # subjects must be IRIs or blank nodes (negative R2RMLTC0004b)
                raise ValueError(f"TriplesMap {subj}: subject cannot be a literal")
            sprops = parser.spo.get(sm.value, [])
            classes[subj] = tuple(n.value for n in _all(sprops, RR + "class"))
            graphs[subj] = _graph_term(parser, sprops)
        else:
            const = _one(props, RR + "subject")
            if const is None:
                raise ValueError(f"TriplesMap {subj}: no subjectMap/subject")
            smap = _encode_constant(const)
            classes[subj] = ()
            graphs[subj] = None
        if smap.kind == "template" and smap.term_type is None:
            smap = TermMap(kind="template", template=smap.template, term_type="iri")
        subj_maps[subj] = smap

    tmaps: List[TriplesMap] = []
    for subj in tm_subjects:
        props = parser.spo[subj]
        pomaps: List[PredicateObjectMap] = []
        for pom in _all(props, RR + "predicateObjectMap"):
            pprops = parser.spo.get(pom.value, [])
            preds: List[TermMap] = [
                TermMap.iri_constant(n.value) for n in _all(pprops, RR + "predicate")
            ]
            for pm_node in _all(pprops, RR + "predicateMap"):
                preds.append(_parse_term_map(parser, pm_node, "p", subj_maps, tm_tables))
            objs: List[TermMap] = [
                _encode_constant(n) for n in _all(pprops, RR + "object")
            ]
            for om_node in _all(pprops, RR + "objectMap"):
                objs.append(_parse_term_map(parser, om_node, "o", subj_maps, tm_tables))
            pom_graph = _graph_term(parser, pprops)
            for p in preds:
                for o in objs:
                    pomaps.append(PredicateObjectMap(predicate=p, object=o,
                                                     graph=pom_graph))
        tmaps.append(
            TriplesMap(
                name=subj,
                table=tm_tables[subj],
                subject=subj_maps[subj],
                pomaps=tuple(pomaps),
                classes=classes[subj],
                graph=graphs[subj],
            )
        )
    return Mapping(triples_maps=tuple(tmaps), base=base), views
