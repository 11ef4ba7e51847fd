"""User-extension surface: named scalar-kernel registry.

The reference exposes arbitrary SQL functions through the
``http://daax.ai/sqlfunc/<NAME>`` IRI namespace
(``rdflib_r2r/query_conversions.py:115-120``, namespace
``conversion_utils.py:77``) — its only user extension hook for scalar
functions.  The Ray-native analogue is a registry of named Arrow-kernel
callables (``fn(batch: pa.Table, *cols) -> pa.Array``) usable inside any
``map_batches`` stage via :func:`apply`; built-ins cover the reference's
test surface (LOWER, UPPER, ...).

Registered functions ship by value with the task closure — workers never
import this module at runtime, so user registration on the driver is
enough (same rule as every other stage).
"""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

Kernel = Callable[..., pa.Array]

_REGISTRY: Dict[str, Kernel] = {}


def register(name: str, fn: Kernel, overwrite: bool = False) -> None:
    """Register a named scalar kernel (upper-cased, like SQL func names)."""
    key = name.upper()
    if key in _REGISTRY and not overwrite:
        raise ValueError(f"function {key!r} already registered")
    _REGISTRY[key] = fn


def get(name: str) -> Kernel:
    try:
        return _REGISTRY[name.upper()]
    except KeyError:
        raise KeyError(
            f"unknown function {name.upper()!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def apply(ds: rd.Dataset, out_col: str, name: str, *in_cols: str) -> rd.Dataset:
    """Extend a Dataset with ``out_col = NAME(in_cols...)`` — the pipeline
    surface of the registry (the reference's ``sqlf:NAME(args)`` call)."""
    fn = get(name)  # resolved on the driver; unknown names fail at plan time

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, fn(*[batch[c] for c in in_cols]))

    return ds.map_batches(add, batch_format="pyarrow")


# --- built-ins matching the reference's exercised surface -------------------

register("LOWER", lambda c: pc.utf8_lower(c))
register("UPPER", lambda c: pc.utf8_upper(c))
register("LENGTH", lambda c: pc.cast(pc.utf8_length(c), pa.int64()))
register("TRIM", lambda c: pc.utf8_trim_whitespace(c))
register("CONCAT", lambda *cs: pc.binary_join_element_wise(*cs, ""))
register("ABS", lambda c: pc.abs(c))
register("COALESCE", lambda *cs: pc.coalesce(*cs))
