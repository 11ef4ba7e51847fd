"""Declarative mapping-rule model — the R2RML TriplesMap/term-map semantics
re-expressed as plain dataclasses compiled once on the driver and shipped to
Ray tasks inside closures (read-only, like the reference's
``pomaps_by_predicate`` index built at ``sql_converter.py:249-261``).

Term-map kinds mirror the reference's matcher (``sql_converter.py:117-176``):

- ``constant`` — fixed IRI / literal (``rr:constant``)
- ``column``   — row's column value, literal by default (``rr:column``)
- ``template`` — ``rr:template "http://…/{Col}"`` string template; IRI unless
  ``term_type`` overrides (``sql_converter.py:144``)
- ``ref``      — referencing object map (``rr:parentTriplesMap`` +
  ``rr:joinCondition``): object = parent row's subject, minted directly from
  the child row's FK columns when the parent subject is template-derivable
  (the shortcut the reference exploits via chain maps,
  ``sql_converter.py:369-425``)

Modifiers: ``term_type`` (iri | bnode | literal), ``datatype``, ``language``,
``classes`` (rr:class on subject), ``graph``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from .terms import RDF_TYPE, iri_safe, natural_datatype
from .template import split_template, template_columns


@dataclass(frozen=True)
class TermMap:
    kind: str  # constant | column | template | ref
    # constant: the fully-encoded N3 form ("<iri>" or literal encoding)
    constant: Optional[str] = None
    column: Optional[str] = None
    template: Optional[str] = None
    term_type: Optional[str] = None  # iri | bnode | literal (None = positional default)
    datatype: Optional[str] = None
    language: Optional[str] = None
    # ref kind: parent table's subject map + child->parent join columns
    parent_table: Optional[str] = None
    parent_subject: Optional["TermMap"] = None
    join: Tuple[Tuple[str, str], ...] = ()  # (child_col, parent_col)

    @staticmethod
    def iri_constant(iri: str) -> "TermMap":
        return TermMap(kind="constant", constant=f"<{iri}>", term_type="iri")

    @staticmethod
    def literal_constant(encoded: str) -> "TermMap":
        return TermMap(kind="constant", constant=encoded, term_type="literal")

    def columns(self) -> List[str]:
        """Input columns this term map reads."""
        if self.kind == "column":
            return [self.column]  # type: ignore[list-item]
        if self.kind == "template":
            return template_columns(self.template or "")
        if self.kind == "ref":
            return [c for c, _ in self.join]
        return []


@dataclass(frozen=True)
class PredicateObjectMap:
    predicate: TermMap  # constant in all reference-supported cases (sql_converter.py:261)
    object: TermMap
    # rr:graphMap as a term map (constant/template/column, always IRI-typed);
    # None = default graph
    graph: Optional[TermMap] = None


@dataclass(frozen=True)
class TriplesMap:
    """One mapping rule set over one logical table.

    ``table`` names a logical table; a SQL-view logical table
    (reference ``r2r_mapping.py:33-40``, ``sql_view.py``) becomes an upstream
    Dataset transform registered under ``table`` by the pipeline builder.
    """

    name: str
    table: str
    subject: TermMap
    pomaps: Tuple[PredicateObjectMap, ...]
    classes: Tuple[str, ...] = ()  # rr:class IRIs -> rdf:type triples
    graph: Optional[TermMap] = None  # subject-level rr:graphMap (None = default graph)

    def columns(self) -> List[str]:
        cols: List[str] = list(self.subject.columns())
        for pm in self.pomaps:
            for c in pm.predicate.columns() + pm.object.columns():
                if c not in cols:
                    cols.append(c)
        seen = set()
        out = []
        for c in cols:
            if c not in seen:
                seen.add(c)
                out.append(c)
        return out


@dataclass(frozen=True)
class Mapping:
    """A full mapping: list of TriplesMaps + base IRI."""

    triples_maps: Tuple[TriplesMap, ...]
    base: str = "http://example.com/base/"

    def by_table(self) -> Dict[str, List[TriplesMap]]:
        out: Dict[str, List[TriplesMap]] = {}
        for tm in self.triples_maps:
            out.setdefault(tm.table, []).append(tm)
        return out

    def by_predicate(self) -> Dict[str, List[Tuple[TriplesMap, PredicateObjectMap]]]:
        """Predicate-IRI index, the analogue of the reference's
        ``pomaps_by_predicate`` (``sql_converter.py:249-261``)."""
        out: Dict[str, List[Tuple[TriplesMap, PredicateObjectMap]]] = {}
        for tm in self.triples_maps:
            for pm in tm.pomaps:
                if pm.predicate.kind == "constant" and pm.predicate.constant:
                    iri = pm.predicate.constant.strip("<>")
                    out.setdefault(iri, []).append((tm, pm))
        return out


# ---------------------------------------------------------------------------
# Direct mapping: auto-generate a Mapping from Arrow schemas + declared keys.
# Mirrors the reference's ``mapping_from_db`` (``r2r_mapping.py:50-147``):
# per table a TriplesMap; subject template ``Table/pk1=…;pk2=…`` from primary
# keys (percent-encoded names), bnode subject if no PK; per column a pomap
# with natural datatype; per FK a ref pomap ``Table#ref-col``.
# ---------------------------------------------------------------------------

def direct_mapping(
    schemas: Dict[str, pa.Schema],
    primary_keys: Dict[str, Sequence[str]],
    foreign_keys: Optional[Dict[str, Sequence[Tuple[Sequence[str], str, Sequence[str]]]]] = None,
    base: str = "http://example.com/base/",
) -> Mapping:
    """``foreign_keys[table] = [(child_cols, parent_table, parent_cols), ...]``."""
    foreign_keys = foreign_keys or {}
    subj_maps: Dict[str, TermMap] = {}
    # first pass: subject maps (needed by ref pomaps)
    for tname, schema in schemas.items():
        pks = list(primary_keys.get(tname) or [])
        if pks:
            parts = ["%s={%s}" % (iri_safe(c), c) for c in pks]
            template = iri_safe(tname) + "/" + ";".join(parts)
            subj_maps[tname] = TermMap(kind="template", template=template, term_type="iri")
        else:
            # bnode minted per row (reference: ``_:Table#rowid``,
            # DirectGraphTC0014.md:12); our id is content-derived, see emit.
            subj_maps[tname] = TermMap(kind="template", template=tname + "#", term_type="bnode")

    tmaps: List[TriplesMap] = []
    for tname, schema in schemas.items():
        pomaps: List[PredicateObjectMap] = []
        for f in schema:
            pred = TermMap.iri_constant(base + f"{iri_safe(tname)}#{iri_safe(f.name)}")
            dt = natural_datatype(f.type)
            pomaps.append(
                PredicateObjectMap(
                    predicate=pred,
                    object=TermMap(kind="column", column=f.name, datatype=dt),
                )
            )
        for child_cols, parent_table, parent_cols in foreign_keys.get(tname, []):
            pname = f"{iri_safe(tname)}#ref-" + ";".join(iri_safe(c) for c in child_cols)
            pomaps.append(
                PredicateObjectMap(
                    predicate=TermMap.iri_constant(base + pname),
                    object=TermMap(
                        kind="ref",
                        parent_table=parent_table,
                        parent_subject=subj_maps[parent_table],
                        join=tuple(zip(child_cols, parent_cols)),
                    ),
                )
            )
        tmaps.append(
            TriplesMap(
                name=tname,
                table=tname,
                subject=subj_maps[tname],
                pomaps=tuple(pomaps),
                classes=(base + iri_safe(tname),),
            )
        )
    return Mapping(triples_maps=tuple(tmaps), base=base)


def retarget_ref_to_template(obj: TermMap) -> Optional[TermMap]:
    """Fold a ref object map into a template on CHILD columns when the parent
    subject is template-derivable and the join covers all its slots — the
    no-join shortcut (reference chain-map optimization,
    ``sql_converter.py:369-425``; shortcut form ``NorthwindR2RML.ttl:73-74``).

    Returns None when a real join is required (parent subject is a bnode or
    uses non-joined columns)."""
    ps = obj.parent_subject
    if ps is None:
        return None
    if not obj.join:
        # no rr:joinCondition: the parent's logical table is the same as the
        # child's (R2RML spec §8) — the object is the parent subject minted
        # from the SAME row, whatever its term-map kind (W3C R2RMLTC0008b)
        return ps
    if ps.kind != "template" or (ps.term_type or "iri") != "iri":
        return None
    parent_to_child = {p: c for c, p in obj.join}
    slots = template_columns(ps.template or "")
    if not all(s in parent_to_child for s in slots):
        return None
    # rebuild from parsed parts, NOT string replace: the template's slot
    # spelling may be delimited ('{"ID"}') while template_columns strips the
    # quotes — a textual replace of '{ID}' would silently miss the slot and
    # leave the CHILD's same-named column in place (wrong object IRIs)
    parts = []
    for prefix, col in split_template(ps.template or ""):
        parts.append(prefix.replace("{", "\\{").replace("}", "\\}"))
        if col is not None:
            parts.append("{%s}" % parent_to_child[col])
    return TermMap(kind="template", template="".join(parts), term_type="iri")
