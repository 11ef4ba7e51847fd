"""Replicates the driver's correctness gate locally: run each ``queries()``
entry and its ``oracle_sql()`` twin over the same parquet tables, compare
row-count + schema + order-insensitive values."""

import os

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify (float rounding) then sort rows for order-insensitive compare
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == float:
            out[c] = out[c].round(6)
        out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _to_pandas(res):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", [])
def _noop(name):
    pass


def all_query_names():
    import __ray_entry__ as e

    return sorted(set(e.queries()) & set(e.oracle_sql()))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(name, sf_dir):
    import __ray_entry__ as e

    ray_df = _to_pandas(e.queries()[name](sf_dir))
    con = _duck(sf_dir)
    sql_df = con.execute(e.oracle_sql()[name]).df()
    con.close()

    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    if not a.equals(b):
        merged = a.merge(b, how="outer", indicator=True)
        diff = merged[merged._merge != "both"]
        raise AssertionError(f"{name}: value mismatch; sample diff:\n{diff.head(10)}")


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert {"subj", "pred", "obj"} <= set(df.columns)
