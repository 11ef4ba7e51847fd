"""Pure-Python per-row re-execution of the mapping semantics — the test
oracle, mirroring how the reference applies R2RML rules row by row
(the W3C-suite pattern of ``old_tests/test_rdb2rdf.py:155-217``).

Deliberately row-at-a-time and independent of the Arrow/Ray code paths so a
bug must be made twice to slip through.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Mapping as TMapping, Optional, Sequence, Tuple

from .mapping import Mapping, PredicateObjectMap, TermMap, TriplesMap, retarget_ref_to_template
from .template import is_absolute_iri, split_template
from .terms import RDF_TYPE, encode_literal, iri_safe, lexical_value, natural_datatype

Triple = Tuple[str, str, str, Optional[str]]


def _format_row(template: str, row: TMapping[str, Any], encode: bool, base: str) -> Optional[str]:
    out: List[str] = []
    first = True
    for prefix, col in split_template(template):
        if first:
            if base and not is_absolute_iri(template):
                prefix = base + prefix
            first = False
        out.append(prefix)
        if col is not None:
            v = row.get(col)
            if v is None:
                return None
            lex = lexical_value(v)
            out.append(iri_safe(lex) if encode else lex)
    return "".join(out)


def _term(tm: TermMap, row: TMapping[str, Any], base: str, position: str, table: str,
          dup_rank: int = 0) -> Optional[str]:
    if tm.kind == "constant":
        return tm.constant
    if tm.kind == "column":
        v = row.get(tm.column)
        if v is None:
            return None
        tt = tm.term_type or "literal"
        lex = lexical_value(v)
        if tt == "iri":
            return f"<{lex}>"
        import pyarrow as pa

        dt = tm.datatype
        if dt is None:
            dt = _python_natural_datatype(v)
        return encode_literal(lex, dt, tm.language)
    if tm.kind == "template":
        tt = tm.term_type or "iri"
        if tt == "bnode":
            key = repr(tuple(row[c] for c in sorted(row)))
            h = hashlib.sha1(f"_:{tm.template}|{key}|{dup_rank}".encode()).hexdigest()[:20]
            return f"_:{tm.template}{h}"
        body = _format_row(tm.template or "", row, encode=(tt != "literal"),
                           base=base if tt != "literal" else "")
        if body is None:
            return None
        if tt == "literal":
            return encode_literal(body, tm.datatype, tm.language)
        return f"<{body}>"
    if tm.kind == "ref":
        folded = retarget_ref_to_template(tm)
        if folded is None:
            raise NotImplementedError("join-requiring ref map in oracle")
        return _term(folded, row, base, position, table, dup_rank)
    raise ValueError(tm.kind)


def _python_natural_datatype(v: Any) -> Optional[str]:
    import datetime as dt

    XSD = "http://www.w3.org/2001/XMLSchema#"
    if isinstance(v, bool):
        return XSD + "boolean"
    if isinstance(v, int):
        return XSD + "integer"
    if isinstance(v, float):
        return XSD + "double"
    if isinstance(v, (bytes, bytearray)):
        return XSD + "hexBinary"
    if isinstance(v, dt.datetime):
        return XSD + "dateTime"
    if isinstance(v, dt.date):
        return XSD + "date"
    import decimal

    if isinstance(v, decimal.Decimal):
        return XSD + "decimal"
    return None


def oracle_triples(
    mapping: Mapping, tables: Dict[str, List[Dict[str, Any]]]
) -> List[Triple]:
    """Apply every TriplesMap row-by-row over plain dict rows."""
    out: List[Triple] = []
    for tm in mapping.triples_maps:
        rows = tables.get(tm.table, [])
        seen: Dict[str, int] = {}
        for row in rows:
            key = repr(tuple(row[c] for c in sorted(row)))
            rank = seen.get(key, 0)
            seen[key] = rank + 1
            subj = _term(tm.subject, row, mapping.base, "s", tm.table, rank)
            if subj is None:
                continue
            for cls in tm.classes:
                out.append((subj, f"<{RDF_TYPE}>", f"<{cls}>", tm.graph))
            for pm in tm.pomaps:
                pred = _term(pm.predicate, row, mapping.base, "p", tm.table, rank)
                obj = _term(pm.object, row, mapping.base, "o", tm.table, rank)
                if pred is None or obj is None:
                    continue
                out.append((subj, pred, obj, pm.graph or tm.graph))
    return out
