"""SHACL-lite validation over a triples Dataset — the data-quality gate a
KG-construction pipeline runs before publishing a graph version.

The reference has no validation surface (its graphs go straight to rdflib);
this module adds the core SHACL constraint kinds (W3C SHACL: sh:minCount,
sh:maxCount, sh:in, sh:pattern, sh:maxInclusive / sh:minInclusive) evaluated
DISTRIBUTED: target selection is one triple filter, per-focus cardinality is
one grouped-count exchange + a broadcast-planned left join (zero-count focus
nodes included), and every value constraint is a vectorized Arrow kernel
over the filtered value triples.  The violation report is itself a Dataset
— at 100 TB it is written like any other result, never driver-collected.

Constraint evaluation is deterministic and SQL-expressible, so validation
reports are oracle-gated like every other operator (`driver_api.
q_kg_shacl_report`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

_REPORT_SCHEMA = pa.schema([
    ("focus", pa.string()),
    ("path", pa.string()),
    ("constraint", pa.string()),
    ("value", pa.string()),
])


@dataclass(frozen=True)
class PropertyShape:
    """One sh:property block: constraints on the values of ``path`` at each
    focus node.  ``None`` disables a constraint."""
    path: str
    min_count: Optional[int] = None
    max_count: Optional[int] = None
    in_set: Optional[Tuple[str, ...]] = None
    pattern: Optional[str] = None          # RE2, applied to the lexical form
    min_inclusive: Optional[int] = None    # numeric, on typed-literal values
    max_inclusive: Optional[int] = None


@dataclass(frozen=True)
class NodeShape:
    """sh:targetClass + property shapes."""
    target_class: str
    properties: Tuple[PropertyShape, ...] = field(default_factory=tuple)


def _lexical(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Lexical form of a term column: strip the N3 decoration of typed
    (``"lex"^^<dt>``) AND language-tagged (``"lex"@tag``) literals —
    ``(?s)`` so a lexical form containing newlines still strips; bare
    literals and IRIs pass through."""
    pat = r'(?s)^"(.*)"(\^\^<[^>]*>|@[A-Za-z0-9\-]+)$'
    quoted = pc.match_substring_regex(col, pat)
    inner = pc.replace_substring_regex(col, pat, r"\1")
    return pc.if_else(quoted, inner, col)


def validate(triples: rd.Dataset, shapes: Sequence[NodeShape]) -> rd.Dataset:
    """Evaluate ``shapes`` over ``triples`` (subj/pred/obj); returns the
    violation report Dataset (focus, path, constraint, value)."""
    from .relational import grouped_agg, planned_join

    triples = triples.select_columns(["subj", "pred", "obj"]).materialize()
    reports: List[rd.Dataset] = []

    for shape in shapes:
        def is_target(t: pa.Table, _cls=shape.target_class) -> pa.Table:
            m = pc.and_(pc.equal(t["pred"], RDF_TYPE),
                        pc.equal(t["obj"], _cls))
            return pa.table({"focus": t.filter(m)["subj"]})

        targets = triples.map_batches(
            is_target, batch_format="pyarrow").materialize()

        # ONE pass + ONE semi-join collects the values of EVERY constrained
        # path (was: one join per property — pure fixed-latency waste);
        # per-property slices below are cheap filters over the
        # materialized result
        paths = tuple(ps.path for ps in shape.properties)

        def all_vals(t: pa.Table, _ps=paths) -> pa.Table:
            sel = t.filter(pc.is_in(t["pred"], value_set=pa.array(list(_ps))))
            return pa.table({"focus": sel["subj"], "pred": sel["pred"],
                             "value": sel["obj"]})

        vals_all = planned_join(
            triples.map_batches(all_vals, batch_format="pyarrow"),
            targets, on=["focus"], join_type="left_semi").materialize()

        for ps in shape.properties:
            def path_vals(t: pa.Table, _p=ps.path) -> pa.Table:
                sel = t.filter(pc.equal(t["pred"], _p))
                return pa.table({"focus": sel["focus"], "value": sel["value"]})

            vals = vals_all.map_batches(path_vals, batch_format="pyarrow")

            if ps.min_count is not None or ps.max_count is not None:
                counts = grouped_agg(
                    vals, ["focus"], count_as="n",
                    in_schema=pa.schema([("focus", pa.string()),
                                         ("value", pa.string())]))
                padded = planned_join(
                    targets, counts, on=["focus"], join_type="left_outer",
                    right_schema=pa.schema([("focus", pa.string()),
                                            ("n", pa.int64())]))

                def card(t: pa.Table, _ps=ps) -> pa.Table:
                    # one report row PER violated constraint (SHACL: each
                    # constraint component reports independently)
                    n = pc.fill_null(pc.cast(t["n"], pa.int64()), 0)
                    checks = []
                    if _ps.min_count is not None:
                        checks.append(("minCount", pc.less(
                            n, pa.scalar(_ps.min_count, pa.int64()))))
                    if _ps.max_count is not None:
                        checks.append(("maxCount", pc.greater(
                            n, pa.scalar(_ps.max_count, pa.int64()))))
                    outs = []
                    for kind, bad in checks:
                        sel = pa.table({"focus": t["focus"], "n": n}).filter(bad)
                        outs.append(pa.table({
                            "focus": sel["focus"],
                            "path": pa.array([_ps.path] * len(sel), pa.string()),
                            "constraint": pa.array([kind] * len(sel), pa.string()),
                            "value": pc.cast(sel["n"], pa.string()),
                        }, schema=_REPORT_SCHEMA))
                    return pa.concat_tables(outs) if outs \
                        else _REPORT_SCHEMA.empty_table()

                reports.append(padded.map_batches(card, batch_format="pyarrow"))

            def value_bad(t: pa.Table, _ps=ps) -> pa.Table:
                # one report row PER violated constraint component
                lex = _lexical(t["value"])
                checks = []
                if _ps.in_set is not None:
                    checks.append(("in", pc.invert(pc.is_in(
                        lex, value_set=pa.array(list(_ps.in_set))))))
                if _ps.pattern is not None:
                    checks.append(("pattern", pc.invert(
                        pc.match_substring_regex(lex, _ps.pattern))))
                if _ps.min_inclusive is not None or _ps.max_inclusive is not None:
                    # a non-numeric value cannot satisfy a numeric bound —
                    # report it as a violation instead of crashing the job
                    # on an unsafe cast (SHACL: value nodes that are not
                    # comparable fail the constraint)
                    numeric = pc.match_substring_regex(lex, r"^-?[0-9]+$")
                    num = pc.cast(
                        pc.if_else(numeric, lex, pa.scalar(None, pa.string())),
                        pa.int64())
                    if _ps.min_inclusive is not None:
                        checks.append(("minInclusive", pc.or_(
                            pc.invert(numeric),
                            pc.fill_null(pc.less(
                                num, pa.scalar(_ps.min_inclusive, pa.int64())),
                                False))))
                    if _ps.max_inclusive is not None:
                        checks.append(("maxInclusive", pc.or_(
                            pc.invert(numeric),
                            pc.fill_null(pc.greater(
                                num, pa.scalar(_ps.max_inclusive, pa.int64())),
                                False))))
                outs = []
                for kind, bad in checks:
                    sel = pa.table({"focus": t["focus"],
                                    "value": t["value"]}).filter(bad)
                    outs.append(pa.table({
                        "focus": sel["focus"],
                        "path": pa.array([_ps.path] * len(sel), pa.string()),
                        "constraint": pa.array([kind] * len(sel), pa.string()),
                        "value": sel["value"],
                    }, schema=_REPORT_SCHEMA))
                return pa.concat_tables(outs) if outs \
                    else _REPORT_SCHEMA.empty_table()

            if any(c is not None for c in (ps.in_set, ps.pattern,
                                           ps.min_inclusive, ps.max_inclusive)):
                reports.append(vals.map_batches(value_bad, batch_format="pyarrow"))

    if not reports:
        return rd.from_arrow(_REPORT_SCHEMA.empty_table())
    out = reports[0]
    for r in reports[1:]:
        out = out.union(r)
    return out
