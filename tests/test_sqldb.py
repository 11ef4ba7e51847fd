"""Partitioned live-database source: key-range fragmenting over sqlite and
DuckDB files, predicate/column pushdown, and the empty-table edge."""

import sqlite3

import duckdb
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def sqlite_db(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sqldb") / "t.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE items (id INTEGER PRIMARY KEY, grp TEXT, "
                "val INTEGER)")
    con.executemany("INSERT INTO items VALUES (?, ?, ?)",
                    [(i, f"g{i % 3}", i * 10) for i in range(100)])
    con.commit()
    con.close()
    return p


@pytest.fixture(scope="module")
def duckdb_db(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sqldb") / "t.duckdb")
    con = duckdb.connect(p)
    con.execute("CREATE TABLE items (id BIGINT, grp VARCHAR, val BIGINT)")
    con.execute("INSERT INTO items SELECT i, 'g' || (i % 3), i * 10 "
                "FROM range(100) t(i)")
    con.close()
    return p


def _rows(ds):
    return sorted((r["id"], r.get("grp"), r.get("val"))
                  for r in ds.take_all())


def test_sqlite_fragments_cover_table(ray_session, sqlite_db):
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    ds = read_sql_table(f"sqlite:///{sqlite_db}", "items", "id",
                        num_fragments=7)
    got = _rows(ds)
    assert len(got) == 100
    assert got[0] == (0, "g0", 0) and got[99] == (99, "g0", 990)


def test_duckdb_fragments_and_predicate(ray_session, duckdb_db):
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    ds = read_sql_table(f"duckdb:///{duckdb_db}", "items", "id",
                        columns=["id", "val"], predicate="val >= 500",
                        num_fragments=5)
    rows = sorted((r["id"], r["val"]) for r in ds.take_all())
    assert rows == [(i, i * 10) for i in range(50, 100)]
    # pruned: grp never leaves the database
    assert set(ds.schema().names) == {"id", "val"}


def test_sqlite_column_pruning_in_fragment_sql(ray_session, sqlite_db):
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    ds = read_sql_table(f"sqlite:///{sqlite_db}", "items", "id",
                        columns=["id"], num_fragments=3)
    assert ds.schema().names == ["id"]
    assert ds.count() == 100


def test_empty_table(ray_session, tmp_path):
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    p = str(tmp_path / "empty.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE emptytab (id INTEGER, x TEXT)")
    con.commit()
    con.close()
    ds = read_sql_table(f"sqlite:///{p}", "emptytab", "id")
    assert ds.count() == 0


def test_read_only_connection(ray_session, sqlite_db):
    """Fragment connections are read-only — a write through the reader's
    connection path must fail rather than mutate the source."""
    from rdflib_r2r_ray.sources.sqldb import _connect

    con = _connect("sqlite", sqlite_db)
    with pytest.raises(sqlite3.OperationalError):
        con.execute("INSERT INTO items VALUES (1000, 'x', 1)")
    con.close()


def test_null_keys_not_lost(ray_session, tmp_path):
    """Rows whose key is NULL match no range predicate — exactly one
    fragment must pick them up (and an all-NULL-key table still reads)."""
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    p = str(tmp_path / "nk.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE t (id INTEGER, v TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, f"v{i}") for i in range(20)]
                    + [(None, "orphan1"), (None, "orphan2")])
    con.commit()
    con.close()
    ds = read_sql_table(f"sqlite:///{p}", "t", "id", num_fragments=4)
    rows = sorted((r["id"], r["v"]) for r in ds.take_all()
                  if r["id"] is not None)
    nulls = sorted(r["v"] for r in ds.take_all() if r["id"] is None)
    assert len(rows) == 20 and nulls == ["orphan1", "orphan2"]

    p2 = str(tmp_path / "allnull.db")
    con = sqlite3.connect(p2)
    con.execute("CREATE TABLE t (id INTEGER, v TEXT)")
    con.executemany("INSERT INTO t VALUES (NULL, ?)", [("a",), ("b",)])
    con.commit()
    con.close()
    ds2 = read_sql_table(f"sqlite:///{p2}", "t", "id")
    assert sorted(r["v"] for r in ds2.take_all()) == ["a", "b"]


def test_fragments_fan_out_in_parallel_blocks(ray_session, sqlite_db):
    """Fragment specs occupy one BLOCK each, so Ray dispatches them as
    independent tasks (a single-block spec table would serialize every
    fragment through one actor)."""
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    ds = read_sql_table(f"sqlite:///{sqlite_db}", "items", "id",
                        num_fragments=7).materialize()
    assert ds.count() == 100
    assert ds.num_blocks() >= 7


def test_empty_fragments_keep_probed_schema(ray_session, sqlite_db):
    """A predicate that empties most fragments must not produce null-typed
    blocks — every fragment casts to the driver-probed schema."""
    from rdflib_r2r_ray.sources.sqldb import read_sql_table

    ds = read_sql_table(f"sqlite:///{sqlite_db}", "items", "id",
                        predicate="val = 990", num_fragments=8)
    rows = ds.take_all()
    assert [(r["id"], r["val"]) for r in rows] == [(99, 990)]
    sch = ds.schema()
    assert dict(zip(sch.names, [str(t) for t in sch.types]))["val"] == "int64"
