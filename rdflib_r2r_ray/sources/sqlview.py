"""SQL-view logical tables (``rr:sqlQuery``, reference ``sql_view.py:12-108``
and ``r2r_mapping.py:33-40``) realized as Ray Datasets.

Two paths:

- :func:`translate_simple_select` — the common single-table
  ``SELECT cols FROM t [WHERE conjunctive comparisons]`` shape compiles to
  ``read_parquet(columns=…) + ds.filter(expr=…)``: column pruning happens
  at the read and the filter fuses with the scan, so the view STREAMS at
  any scale (never materialized).
- :func:`view_dataset` falls back to DuckDB on the driver for arbitrary SQL
  (joins, aggregates inside views).  The result is loaded into the object
  store as Arrow — correct but bounded by driver memory, so it is only the
  fallback; the reference has the same shape (it inlines the view SQL as a
  subquery and lets ONE database execute it, ``sql_view.py``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import ray.data as rd

_SIMPLE = re.compile(
    r"^\s*SELECT\s+(?P<cols>\*|[\w\s,\"]+?)\s+FROM\s+(?P<table>\"?\w+\"?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.I | re.S,
)

_COMPARISON = re.compile(
    r"^\s*\"?(?P<col>\w+)\"?\s*(?P<op>=|<>|!=|<=|>=|<|>)\s*(?P<val>'(?:[^'])*'|-?\d+(?:\.\d+)?)\s*$"
)


def translate_simple_select(sql: str) -> Optional[Tuple[str, Optional[List[str]], Optional[str]]]:
    """``SELECT cols FROM table WHERE a = 'x' AND b > 3`` →
    (table, columns|None, arrow_filter_expr|None); None if not this shape."""
    m = _SIMPLE.match(sql)
    if not m:
        return None
    table = m.group("table").strip('"')
    cols_raw = m.group("cols").strip()
    columns = None
    if cols_raw != "*":
        columns = [c.strip().strip('"') for c in cols_raw.split(",")]
        if not all(re.fullmatch(r"\w+", c) for c in columns):
            return None  # expressions/aliases -> not simple
    where = m.group("where")
    expr = None
    if where:
        parts = re.split(r"\bAND\b", where, flags=re.I)
        exprs = []
        for part in parts:
            c = _COMPARISON.match(part)
            if not c:
                return None
            op = {"=": "==", "<>": "!=", "!=": "!="}.get(c.group("op"), c.group("op"))
            val = c.group("val")
            if val.startswith("'"):
                val = repr(val[1:-1])
            exprs.append(f"({c.group('col')} {op} {val})")
        expr = " and ".join(exprs)
    return table, columns, expr


def view_dataset(sql: str, sf_dir: str, tables: Dict[str, str]) -> rd.Dataset:
    """Realize a SQL-view logical table over parquet files as a Dataset.

    ``tables`` maps table name → parquet path.  Simple selects stream;
    everything else executes once in DuckDB on the driver (fallback)."""
    simple = translate_simple_select(sql)
    if simple is not None:
        table, columns, expr = simple
        ds = rd.read_parquet(tables[table], columns=columns)
        if expr:
            ds = ds.filter(expr=expr)
        return ds
    import duckdb

    con = duckdb.connect()
    for name, path in tables.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return rd.from_arrow(con.execute(sql).arrow())
