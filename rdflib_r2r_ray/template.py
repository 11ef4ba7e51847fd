"""String-template kernel: format (IRI minting) and inverse parse.

Semantics mirror the reference's ``format_template`` / ``parse_with_template``
(``rdflib_r2r/conversion_utils.py:497-531``): templates are Python
``str.format``-style strings (``"http://ex/{Col1}/{Col2}"``); formatting
concatenates literal parts with column values; parsing builds a regex with one
``(.*)`` group per slot and ``fullmatch``-es.

The Arrow-vectorized formatter percent-encodes slot values for IRI terms with
``iri_safe`` (reference ``r2r_mapping.py:20-21``; the ``<ENCODE>`` regions of
``r2r_store.py:120-123``) and leaves literal-template slots raw.
"""

from __future__ import annotations

import re
from string import Formatter
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from .terms import iri_safe_array, lexical_array

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def split_template(template: str) -> List[Tuple[str, Optional[str]]]:
    """Parse a template into ``[(literal_prefix, slot_colname|None), ...]``.

    Column names may be double-quoted (direct mapping writes ``{"col"}``,
    reference ``r2r_mapping.py:101``); quotes are stripped.
    """
    # R2RML brace escapes are backslashed (``\{``/``\}``, spec §7.3) while
    # Python's Formatter doubles them — normalize before parsing
    template = template.replace("\\{", "{{").replace("\\}", "}}")
    out: List[Tuple[str, Optional[str]]] = []
    for prefix, colname, _, _ in Formatter().parse(template):
        if colname is not None:
            colname = colname.strip('"')
        out.append((prefix, colname))
    return out


def template_columns(template: str) -> List[str]:
    return [c for _, c in split_template(template) if c]


def is_absolute_iri(s: str) -> bool:
    return bool(_SCHEME_RE.match(s))


def format_template_array(
    template: str,
    batch: pa.Table,
    *,
    encode: bool,
    base: str = "",
) -> pa.Array:
    """Vectorized template expansion over a batch.

    Returns a string array; rows where ANY slot column is NULL yield NULL
    (R2RML: a term map with a NULL input produces no term — the emit stage
    drops those rows; the reference's dumps miss these guards, a documented
    bug per SURVEY.md §2.6).

    ``encode=True`` percent-encodes slot values (IRI/bnode terms);
    relative IRI templates are resolved against ``base``
    (reference resolves at decode: ``r2r_store.py:121-123`` URIRef base).
    """
    parts: List = []
    n = len(batch)
    first_prefix_done = False
    for prefix, colname in split_template(template):
        if not first_prefix_done:
            if base and not is_absolute_iri(template):
                prefix = base + prefix
            first_prefix_done = True
        if prefix:
            parts.append(prefix)
        if colname:
            col = batch[colname]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lex = lexical_array(col)
            if isinstance(lex, pa.ChunkedArray):
                lex = lex.combine_chunks()
            if encode:
                lex = iri_safe_array(lex)
            parts.append(lex)
    if not parts:
        return pa.nulls(n, pa.string())
    if all(isinstance(p, str) for p in parts):
        return pa.array(["".join(parts)] * n, type=pa.string())
    # binary_join_element_wise propagates NULL if any input is NULL (default
    # null_handling) — exactly the omit-on-NULL semantics we need.
    args = [pa.array([p] * n, type=pa.string()) if isinstance(p, str) else p for p in parts]
    return pc.binary_join_element_wise(*args, "")


def parse_with_template(s: str, template: str) -> Optional[Dict[str, str]]:
    """Inverse of formatting: match a concrete string against a template and
    recover slot values; parity with reference ``parse_with_template``
    (``conversion_utils.py:517-531``) — ``(.*)`` per slot, fullmatch, no
    percent-decoding (the reference compares encoded forms)."""
    pattern_parts: List[str] = []
    columns: List[str] = []
    for prefix, colname in split_template(template):
        if prefix:
            pattern_parts.append(re.escape(prefix))
        if colname:
            columns.append(colname)
            pattern_parts.append("(.*)")
    m = re.fullmatch("".join(pattern_parts), s)
    if not m:
        return None
    return {col: m.group(i + 1) for i, col in enumerate(columns)}
