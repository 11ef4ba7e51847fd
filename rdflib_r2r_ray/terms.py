"""RDF term kernel: N3-ish string encoding of RDF terms, matching the
reference engine's wire format.

The reference (rdflib-r2r) moves RDF terms through SQL as plain strings and
decodes them with ``R2RStore.make_node`` (reference ``rdflib_r2r/r2r_store.py:125-148``):

- ``"<iri>"``            -> IRI (template slot values percent-encoded)
- ``"_:name"``           -> blank node
- ``'"lex"^^<datatype>'``-> typed literal
- ``'"lex"@lang'``       -> language-tagged literal
- anything else          -> plain string literal (raw, unquoted)

We keep exactly that encoding as the ``subj``/``pred``/``obj`` string columns
of the triples Dataset, so a user of the reference sees identical lexical
forms.  Percent-encoding of IRI template slots uses
``urllib.parse.quote(v, safe="")`` — the reference's ``iri_safe``
(``rdflib_r2r/r2r_mapping.py:20-21``); its compiled SQL only encoded the
observed subset ``%20 %2F %28 %29 %2C %3A``
(``docs/test-results/sqlite-rdb2rdf/DirectGraphTC0014.md:32``) but the
Python-side decoder round-trips full quoting, which we adopt as canonical.
"""

from __future__ import annotations

import base64
import datetime as _dt
import re
import urllib.parse
from typing import Any, NamedTuple, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# characters that survive quote(v, safe="") unescaped: ALWAYS_SAFE of urllib
_UNRESERVED_RE = re.compile(r"[^A-Za-z0-9_.~\-]")


def iri_safe(v: str) -> str:
    """Percent-encode a template slot value; parity with reference
    ``iri_safe`` (``r2r_mapping.py:20-21``)."""
    return urllib.parse.quote(v, safe="")


def iri_unsafe(v: str) -> str:
    return urllib.parse.unquote(v)


def iri_safe_array(arr: pa.Array) -> pa.Array:
    """Vectorized ``iri_safe`` over an Arrow string array.

    Fast path: values containing only unreserved chars pass through zero-copy;
    only offending values round-trip through Python.  On web-scale key columns
    (ids, slugs) the slow path is a small minority.
    """
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(pa.string())
    needs = pc.match_substring_regex(arr, _UNRESERVED_RE.pattern)
    if not pc.any(needs).as_py():
        return arr
    py = arr.to_pylist()
    out = [None if v is None else (iri_safe(v) if _UNRESERVED_RE.search(v) else v) for v in py]
    return pa.array(out, type=pa.string())


# ---------------------------------------------------------------------------
# lexical forms for non-string columns (natural R2RML datatype mapping)
# ---------------------------------------------------------------------------

def natural_datatype(t: pa.DataType) -> Optional[str]:
    """XSD datatype IRI for an Arrow column type (R2RML natural mapping).

    Mirrors the reference's ``XSDToSQL`` table
    (``rdflib_r2r/conversion_utils.py:42-75``) in the reverse direction;
    strings map to plain literals (None)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return None
    if pa.types.is_boolean(t):
        return XSD + "boolean"
    if pa.types.is_integer(t):
        return XSD + "integer"
    if pa.types.is_floating(t):
        return XSD + "double"
    if pa.types.is_decimal(t):
        return XSD + "decimal"
    if pa.types.is_date(t):
        return XSD + "date"
    if pa.types.is_timestamp(t):
        return XSD + "dateTime"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return XSD + "hexBinary"
    return None


def lexical_array(arr: pa.Array) -> pa.Array:
    """Canonical lexical form of a column as an Arrow string array.

    Integer/decimal/string via Arrow cast; bool as true/false; binary as
    base16 (reference ``r2r_store.py:130-134``); timestamps ISO-8601."""
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return arr
    if pa.types.is_boolean(t):
        return pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
    if pa.types.is_integer(t) or pa.types.is_decimal(t):
        return pc.cast(arr, pa.string())
    if pa.types.is_floating(t):
        if t == pa.float32():
            # shortest round-trip form at FLOAT32 precision — repr(float(v))
            # would print the double-extended noise ('1.649999976158142'
            # instead of '1.65')
            return pa.array(
                [None if v is None
                 else np.format_float_positional(np.float32(v), unique=True, trim="0")
                 for v in arr.to_pylist()],
                type=pa.string(),
            )
        # Python repr-style shortest form, matching the pure-Python oracle
        return pa.array(
            [None if v is None else repr(float(v)) for v in arr.to_pylist()],
            type=pa.string(),
        )
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.array(
            [None if v is None else base64.b16encode(v).decode() for v in arr.to_pylist()],
            type=pa.string(),
        )
    if pa.types.is_date(t) or pa.types.is_timestamp(t):
        return pa.array(
            [None if v is None else _temporal_lex(v) for v in arr.to_pylist()],
            type=pa.string(),
        )
    return pc.cast(arr, pa.string())


def _temporal_lex(v: Any) -> str:
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep="T")
    return v.isoformat()


def lexical_value(v: Any) -> str:
    """Scalar twin of :func:`lexical_array` (used by the pure-Python oracle)."""
    if v is None:
        raise ValueError("NULL has no lexical form")
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b16encode(bytes(v)).decode()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return _temporal_lex(v)
    return str(v)


# ---------------------------------------------------------------------------
# N3-ish encode / decode (scalar; decode mirrors make_node)
# ---------------------------------------------------------------------------

class Term(NamedTuple):
    """Decoded RDF term: kind in {'iri', 'bnode', 'literal'}."""

    kind: str
    lex: str
    datatype: Optional[str] = None
    lang: Optional[str] = None


def encode_iri(iri: str) -> str:
    return f"<{iri}>"


def encode_bnode(name: str) -> str:
    return f"_:{name}"


def encode_literal(lex: str, datatype: Optional[str] = None, lang: Optional[str] = None) -> str:
    if lang:
        return f'"{lex}"@{lang}'
    if datatype:
        return f'"{lex}"^^<{datatype}>'
    return lex  # plain literal travels raw, cf. make_node


_TYPED_RE = re.compile(r'^"(.*)"\^\^<([^<>]*)>$', re.S)
_LANG_RE = re.compile(r'^"(.*)"@([A-Za-z0-9\-]+)$', re.S)


def decode(val: str) -> Term:
    """Decode an N3-ish string to a :class:`Term`; parity with reference
    ``make_node`` (``r2r_store.py:125-148``)."""
    if val.startswith("<") and val.endswith(">"):
        return Term("iri", val[1:-1])
    if val.startswith("_:"):
        return Term("bnode", val[2:])
    m = _TYPED_RE.match(val)
    if m:
        return Term("literal", m.group(1), datatype=m.group(2))
    m = _LANG_RE.match(val)
    if m:
        return Term("literal", m.group(1), lang=m.group(2))
    return Term("literal", val)


def decorate_literal_array(
    lex: pa.Array, datatype: Optional[str], lang: Optional[str]
) -> pa.Array:
    """Vectorized :func:`encode_literal` over an Arrow string array of
    lexical forms (NULLs propagate)."""
    if lang:
        return pc.binary_join_element_wise('"', lex, f'"@{lang}', "")
    if datatype:
        return pc.binary_join_element_wise('"', lex, f'"^^<{datatype}>', "")
    return lex
