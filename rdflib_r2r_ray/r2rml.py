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
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<dtype>\^\^)
    | (?P<kw_prefix2>@prefix|@base)
    | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<lname>[\w.-]*)
    | (?P<kw_a>\ba\b)
    | (?P<punct>[;,.\[\]()])
    | (?P<ws>\s+)
    """,
    re.X,
)


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
            return _Node("iri", self._resolve_pname(v))
        if k == "kw_a":
            return _Node("iri", RDF + "type")
        if k == "literal":
            body = v[1:-1]
            # unescape the Turtle string escapes R2RML documents use
            # (unicode_escape would mangle non-ASCII text)
            body = (body.replace("\\\\", "\x00").replace('\\"', '"')
                        .replace("\\n", "\n").replace("\\t", "\t")
                        .replace("\x00", "\\"))
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
            bid = f"_:b{self.bnode_n}"
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


def _encode_constant(node: _Node) -> TermMap:
    if node.kind == "iri":
        return TermMap.iri_constant(node.value)
    # literal constant, N3-encoded like terms.decorate_literal_array
    lex = node.value.replace("\\", "\\\\").replace('"', '\\"')
    enc = f'"{lex}"'
    if node.lang:
        enc += f"@{node.lang}"
    elif node.dtype and node.dtype != XSD + "string":
        enc += f"^^<{node.dtype}>"
    return TermMap.literal_constant(enc)


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

    const = _one(props, RR + "constant")
    if const is not None:
        base = _encode_constant(const)
        return base
    col = _one(props, RR + "column")
    if col is not None:
        return TermMap(kind="column", column=col.value, term_type=term_type,
                       datatype=dtype, language=lang)
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
            joins.append((child.value, par.value))
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
        tn = _one(lt_props, RR + "tableName")
        if tn is not None:
            tm_tables[subj] = tn.value.strip('"')
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
            smap = _parse_term_map(parser, sm, "s", {}, {})
            sprops = parser.spo.get(sm.value, [])
            classes[subj] = tuple(n.value for n in _all(sprops, RR + "class"))
            g = _one(sprops, RR + "graph")
            graphs[subj] = g.value if g is not None else None
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
            for p in preds:
                for o in objs:
                    pomaps.append(PredicateObjectMap(predicate=p, object=o))
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
