"""SQL-view logical tables: simple-select streaming, distributed row-wise
DuckDB fragments, and the guarded driver fallback (VERDICT r3 item 8 — a big
view must either stream or fail loudly, never OOM the driver silently)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pq_table(tmp_path_factory):
    d = tmp_path_factory.mktemp("sqlview")
    t = pa.table({
        "id": pa.array(range(200), pa.int64()),
        "a": pa.array([f"n{i}" for i in range(200)]),
        "b": pa.array([i % 7 for i in range(200)], pa.int64()),
    })
    path = str(d / "t.parquet")
    pq.write_table(t, path)
    return path


def test_rowwise_view_streams_distributed(ray_session, pq_table):
    """Single-table row-wise SQL (concat + function + WHERE) runs as
    per-batch DuckDB fragments and matches driver DuckDB exactly."""
    from rdflib_r2r_ray.sources.sqlview import _single_rowwise_table, view_dataset

    sql = """SELECT ('x' || a) AS xa, id * 2 AS twice FROM "t" WHERE b >= 3"""
    assert _single_rowwise_table(sql, {"t": pq_table}) == "t"
    ds = view_dataset(sql, "", {"t": pq_table})
    got = sorted((r["xa"], r["twice"]) for r in ds.take_all())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{pq_table}')")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want and len(got) > 0


def test_global_view_fallback_guard(ray_session, pq_table, monkeypatch):
    """A join/aggregate view beyond the row cap raises loudly instead of
    materializing on the driver."""
    from rdflib_r2r_ray.sources.sqlview import view_dataset

    sql = 'SELECT b, COUNT(*) AS c FROM "t" GROUP BY b'
    # under the cap: executes on the driver
    out = view_dataset(sql, "", {"t": pq_table}).take_all()
    assert len(out) == 7
    # over the (tiny) cap: loud failure
    monkeypatch.setenv("GRAFT_VIEW_FALLBACK_MAX_ROWS", "3")
    with pytest.raises(ValueError, match="materialize .* rows on the driver"):
        view_dataset(sql, "", {"t": pq_table})


def test_global_view_guard_counts_before_materializing(ray_session, pq_table, monkeypatch):
    """The guard bounds the RESULT, not the input — a small result under
    the cap passes even when the INPUT is larger than the cap."""
    from rdflib_r2r_ray.sources.sqlview import view_dataset

    monkeypatch.setenv("GRAFT_VIEW_FALLBACK_MAX_ROWS", "10")
    sql = 'SELECT MAX(id) AS m FROM "t" GROUP BY b'  # 7 rows from 200 inputs
    assert len(view_dataset(sql, "", {"t": pq_table}).take_all()) == 7


def test_global_view_fallback_executes_once(ray_session, pq_table, monkeypatch):
    """The driver fallback runs the view SQL exactly once (the old COUNT(*)
    guard probe executed it twice — 2× the cost at real scale)."""
    import duckdb

    from rdflib_r2r_ray.sources import sqlview

    sql = 'SELECT b, COUNT(*) AS c FROM "t" GROUP BY b'
    executed = []
    real_connect = duckdb.connect

    class ConProxy:
        def __init__(self, con):
            self._con = con

        def execute(self, stmt, *a, **k):
            executed.append(stmt)
            return self._con.execute(stmt, *a, **k)

        def __getattr__(self, name):
            return getattr(self._con, name)

    monkeypatch.setattr(duckdb, "connect",
                        lambda *a, **k: ConProxy(real_connect(*a, **k)))
    out = sqlview.view_dataset(sql, "", {"t": pq_table}).take_all()
    assert len(out) == 7
    assert sum("GROUP BY" in s for s in executed) == 1
