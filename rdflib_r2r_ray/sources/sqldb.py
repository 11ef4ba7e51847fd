"""Partitioned LIVE-DATABASE table source (reference S1: the engine reads
its relations straight from a SQLAlchemy database — ``r2r_store.py:150-154``
builds the store over a live engine, ``old_tests/util.py:6-35`` wires
sqlite/DuckDB engines; this repo otherwise reads parquet/CSV/JSON exports).

Design — the Spark-JDBC-style key-range fragmenter, Ray-Data-first:

- The driver runs ONE tiny probe query (``MIN(key), MAX(key), COUNT(*)``)
  and splits the key domain into ``num_fragments`` half-open ranges
  ``[lo, hi)`` (last range closed at max+1).  Only those three scalars ever
  reach the driver.
- The fragment specs become a tiny Dataset; a ``map_batches`` actor-pool
  stage opens a per-worker READ-ONLY connection in ``__init__`` (once per
  actor, not per fragment) and fetches ``SELECT <cols> FROM <table> WHERE
  key >= lo AND key < hi`` per fragment — so the table streams through the
  object store with backpressure like any other source, and a 256-node
  cluster fans the ranges out across workers.
- Column pruning happens in the fragment SQL (``columns=``), and an
  optional ``predicate`` string is pushed into every fragment's WHERE —
  the rows leave the database already filtered, mirroring how the parquet
  reads pass ``columns=``/row filters.

Uniform ranges assume a roughly dense integer key (a rowid/serial PK — the
usual case).  A skewed key makes fragments uneven, never wrong; pass a
larger ``num_fragments`` to re-balance.  No SQLAlchemy: URLs are parsed
directly to the stdlib ``sqlite3`` or the ``duckdb`` module (the two
file-database engines the reference's own test matrix uses).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pyarrow as pa
import ray.data as rd

_SQLITE_PREFIXES = ("sqlite:///", "sqlite://")
_DUCKDB_PREFIXES = ("duckdb:///", "duckdb://")


def _parse_url(url: str) -> Tuple[str, str]:
    """``sqlite:///path`` / ``duckdb:///path`` / bare path → (dialect, path)."""
    for p in _SQLITE_PREFIXES:
        if url.startswith(p):
            return "sqlite", url[len(p):]
    for p in _DUCKDB_PREFIXES:
        if url.startswith(p):
            return "duckdb", url[len(p):]
    if url.endswith((".duckdb", ".ddb")):
        return "duckdb", url
    return "sqlite", url


def _connect(dialect: str, path: str):
    if dialect == "duckdb":
        import duckdb

        return duckdb.connect(path, read_only=True)
    import sqlite3

    # read-only URI: fragment tasks must never lock or mutate the source.
    # check_same_thread=False — the connection is created in the actor's
    # main thread but Ray Data runs __call__ on a worker thread; access is
    # serialized per actor, so sharing across threads is safe.
    return sqlite3.connect(f"file:{path}?mode=ro", uri=True,
                           check_same_thread=False)


def _probe_schema(url: str, table: str,
                  columns: Sequence[str]) -> pa.Schema:
    """Canonical Arrow schema for the fragment tables, derived ONCE on the
    driver — per-fragment inference would give empty or all-NULL fragments
    null-typed columns and inconsistent block schemas downstream."""
    dialect, path = _parse_url(url)
    con = _connect(dialect, path)
    sel = ", ".join(f'"{c}"' for c in columns)
    try:
        if dialect == "duckdb":
            return con.execute(
                f'SELECT {sel} FROM "{table}" LIMIT 0').arrow().schema
        rows = con.execute(
            f'SELECT {sel} FROM "{table}" LIMIT 1024').fetchall()
        cols = list(zip(*rows)) if rows else [[] for _ in columns]
        fields = []
        for c, vals in zip(columns, cols):
            t = pa.array(list(vals)).type
            # no non-NULL probe value → string (sqlite types are dynamic)
            fields.append((c, pa.string() if pa.types.is_null(t) else t))
        return pa.schema(fields)
    finally:
        con.close()


def _fetch_arrow(con, dialect: str, sql: str, columns: Sequence[str],
                 schema: pa.Schema) -> pa.Table:
    if dialect == "duckdb":
        return con.execute(sql).arrow().cast(schema)
    cur = con.execute(sql)
    rows = cur.fetchall()
    cols = list(zip(*rows)) if rows else [[] for _ in columns]
    return pa.table({c: pa.array(list(v), type=schema.field(c).type)
                     for c, v in zip(columns, cols)})


class _FragmentReader:
    """Actor-pool stage: one read-only connection per actor (``__init__``),
    one fragment query per input row (``__call__``)."""

    def __init__(self, url: str, table: str, key_col: str,
                 columns: Sequence[str], predicate: Optional[str],
                 schema: pa.Schema):
        self._dialect, path = _parse_url(url)
        self._con = _connect(self._dialect, path)
        self._cols = list(columns)
        self._sel = ", ".join(f'"{c}"' for c in self._cols)
        self._table, self._key, self._pred = table, key_col, predicate
        self._schema = schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: List[pa.Table] = []
        for lo, hi, wn in zip(batch["lo"].to_pylist(),
                              batch["hi"].to_pylist(),
                              batch["with_nulls"].to_pylist()):
            rng = f'"{self._key}" >= {lo} AND "{self._key}" < {hi}'
            # NULL keys match NO range predicate — exactly one fragment
            # carries them, or they would silently vanish from the read
            where = f'(({rng}) OR "{self._key}" IS NULL)' if wn \
                else f"({rng})"
            if self._pred:
                where += f" AND ({self._pred})"
            sql = f'SELECT {self._sel} FROM "{self._table}" WHERE {where}'
            outs.append(_fetch_arrow(self._con, self._dialect, sql,
                                     self._cols, self._schema))
        return pa.concat_tables(outs)


def fragment_bounds(lo: int, hi: int, num_fragments: int):
    """Split the half-open key domain ``[lo, hi)`` into at most
    ``num_fragments`` disjoint, contiguous, exhaustive ranges."""
    k = max(1, min(int(num_fragments), hi - lo))
    step = (hi - lo + k - 1) // k
    return [(s, min(s + step, hi)) for s in range(lo, hi, step)]


# Auto-sizing target: one fragment per ~this many rows (COUNT(*) from the
# driver probe), capped so the spec table itself stays tiny.
ROWS_PER_FRAGMENT = 1_000_000
MAX_FRAGMENTS = 4096


def read_sql_table(
    url: str,
    table: str,
    key_col: str,
    *,
    columns: Optional[Sequence[str]] = None,
    predicate: Optional[str] = None,
    num_fragments: Optional[int] = None,
    concurrency: Tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """Read a live sqlite/DuckDB table as a Dataset of key-range fragments.

    ``columns=None`` reads the full schema (probed once on the driver).
    ``num_fragments=None`` auto-sizes from the probed row count (one
    fragment per ~``ROWS_PER_FRAGMENT`` rows, at least 8 so even a small
    table exercises the parallel path, capped at ``MAX_FRAGMENTS``).
    Returns an EMPTY typed dataset when the table has no rows.
    """
    dialect, path = _parse_url(url)
    con = _connect(dialect, path)
    try:
        if columns is None:
            cur = con.execute(f'SELECT * FROM "{table}" LIMIT 0')
            columns = [d[0] for d in cur.description]
        lo, hi, n = con.execute(
            f'SELECT MIN("{key_col}"), MAX("{key_col}"), COUNT(*) '
            f'FROM "{table}"').fetchone()
    finally:
        con.close()
    columns = list(columns)
    if not n:
        return rd.from_arrow(_probe_schema(url, table, columns).empty_table())
    if num_fragments is None:
        num_fragments = min(MAX_FRAGMENTS,
                            max(8, -(-int(n) // ROWS_PER_FRAGMENT)))
    if lo is None:
        # every key is NULL: one fragment with an empty range whose
        # with_nulls flag picks up the whole table
        bounds = [(0, 0)]
    else:
        bounds = fragment_bounds(int(lo), int(hi) + 1, int(num_fragments))
    frags = rd.from_arrow(pa.table({
        "lo": pa.array([b[0] for b in bounds], pa.int64()),
        "hi": pa.array([b[1] for b in bounds], pa.int64()),
        # NULL-key rows ride with the FIRST fragment
        "with_nulls": pa.array([i == 0 for i in range(len(bounds))],
                               pa.bool_()),
    }))
    # one BLOCK per fragment spec: from_arrow yields a single block, and
    # Ray dispatches map_batches per block (batch_size only slices within
    # a task) — without the repartition every fragment would execute
    # sequentially in ONE actor
    frags = frags.repartition(len(bounds))
    return frags.map_batches(
        _FragmentReader,
        fn_constructor_args=(url, table, key_col, columns, predicate,
                             _probe_schema(url, table, columns)),
        batch_format="pyarrow", batch_size=1, concurrency=concurrency,
    )
