"""SQL-view logical tables (``rr:sqlQuery``, reference ``sql_view.py:12-108``
and ``r2r_mapping.py:33-40``) realized as Ray Datasets.

Three paths, fastest first:

- :func:`translate_simple_select` — the common single-table
  ``SELECT cols FROM t [WHERE conjunctive comparisons]`` shape compiles to
  ``read_parquet(columns=…) + ds.filter(expr=…)``: column pruning happens
  at the read and the filter fuses with the scan, so the view STREAMS at
  any scale (never materialized).
- row-wise single-table SQL (expressions, functions, ``||`` concat, WHERE —
  but no join/aggregate/order/distinct) executes as DISTRIBUTED DuckDB
  fragments: an actor-pool ``map_batches`` stage runs the view SQL per
  Arrow batch with the table name bound to the batch (zero-copy register).
  Row-wise SQL is batch-decomposable by definition, so this also streams.
- :func:`view_dataset` falls back to DuckDB on the driver for genuinely
  global SQL (joins, aggregates inside views).  The result is loaded into
  the object store as Arrow — bounded by driver memory, so it is guarded: a
  COUNT(*) probe first, and any view beyond ``GRAFT_VIEW_FALLBACK_MAX_ROWS``
  (default 5M) raises LOUDLY instead of silently OOMing the driver.  The
  reference has the same single-engine shape (it inlines the view SQL as a
  subquery, ``sql_view.py``).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
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


# constructs that make a view GLOBAL (not decomposable per batch)
_NON_ROWWISE = re.compile(
    r"\b(JOIN|GROUP\s+BY|ORDER\s+BY|LIMIT|OFFSET|DISTINCT|UNION|INTERSECT|"
    r"EXCEPT|OVER|COUNT\s*\(|SUM\s*\(|AVG\s*\(|MIN\s*\(|MAX\s*\()", re.I)


class _DuckBatchView:
    """Actor-pool stage: run a row-wise single-table view SQL per Arrow
    batch in an embedded DuckDB, the batch zero-copy-registered under the
    view's table name.  Connection built once per actor (``__init__``)."""

    def __init__(self, sql: str, table: str):
        import duckdb

        from ..workerenv import cap_threads

        cap_threads()
        self._con = duckdb.connect()
        self._sql = sql.rstrip().rstrip(";")
        self._table = table

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        self._con.register("___batch", batch)
        self._con.execute(
            f'CREATE OR REPLACE VIEW "{self._table}" AS SELECT * FROM ___batch')
        return self._con.execute(self._sql).arrow()


def _single_rowwise_table(sql: str, tables: Dict[str, str]) -> Optional[str]:
    if _NON_ROWWISE.search(sql):
        return None
    refs = [name for name in tables
            if re.search(rf'"{re.escape(name)}"|\b{re.escape(name)}\b', sql)]
    return refs[0] if len(refs) == 1 else None


def view_dataset(sql: str, sf_dir: str, tables: Dict[str, str]) -> rd.Dataset:
    """Realize a SQL-view logical table over parquet files as a Dataset.

    ``tables`` maps table name → parquet path.  Simple selects stream as
    pruned scans; row-wise single-table SQL streams as distributed DuckDB
    batch fragments; genuinely global SQL executes once in DuckDB on the
    driver behind a loud row-count guard (GRAFT_VIEW_FALLBACK_MAX_ROWS)."""
    simple = translate_simple_select(sql)
    if simple is not None:
        table, columns, expr = simple
        ds = rd.read_parquet(tables[table], columns=columns)
        if expr:
            ds = ds.filter(expr=expr)
        return ds
    rowwise = _single_rowwise_table(sql, tables)
    if rowwise is not None:
        return rd.read_parquet(tables[rowwise]).map_batches(
            _DuckBatchView, fn_constructor_args=(sql, rowwise),
            batch_format="pyarrow", concurrency=(1, 8),
        )
    import duckdb

    con = duckdb.connect()
    for name, path in tables.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    cap = int(os.environ.get("GRAFT_VIEW_FALLBACK_MAX_ROWS", "5000000"))
    probe = sql.rstrip().rstrip(";")
    # Single execution with a bounded incremental fetch: the view runs ONCE
    # and the guard trips as soon as the result stream exceeds the cap (a
    # COUNT(*) probe would execute the whole view twice at real scale).
    reader = con.execute(probe).fetch_record_batch(65536)
    batches, n = [], 0
    for b in reader:
        n += b.num_rows
        if n > cap:
            raise ValueError(
                f"SQL-view fallback would materialize over {cap} rows on "
                f"the driver (cap {cap}; raise GRAFT_VIEW_FALLBACK_MAX_ROWS "
                "to override). Rewrite the view as a row-wise single-table "
                "query so it can stream, or pre-materialize it to parquet.")
        batches.append(b)
    return rd.from_arrow(pa.Table.from_batches(batches, schema=reader.schema))
