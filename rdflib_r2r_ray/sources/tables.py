"""Logical-table readers beyond Parquet (reference S1 reads any SQLAlchemy
database, ``sql_converter.py:265-267``; the Ray-native analogue is any
columnar file format Ray Data reads natively).

Column pruning happens AT THE READ where the format supports it: parquet
passes ``columns=`` (row-group projection), CSV passes
``include_columns`` through Arrow's CSV reader (parse-time projection);
JSON projects right after parse.  One Dataset per logical table, exactly
like the parquet path — every downstream stage (direct mapping, R2RML
emit, the relational layer) is format-agnostic.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import ray.data as rd

_EXT_FORMATS = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    try:
        return _EXT_FORMATS[ext]
    except KeyError:
        raise ValueError(
            f"cannot infer table format from {path!r}; pass format= "
            f"(one of {sorted(set(_EXT_FORMATS.values()))})"
        ) from None


def read_logical_table(
    path: str,
    columns: Optional[Sequence[str]] = None,
    format: Optional[str] = None,
) -> rd.Dataset:
    """Read one logical table as a Dataset, format inferred from the
    extension unless given; ``columns`` prunes at the read."""
    fmt = format or infer_format(path)
    cols: Optional[List[str]] = list(columns) if columns else None
    if fmt == "parquet":
        return rd.read_parquet(path, columns=cols)
    if fmt == "csv":
        if cols:
            from pyarrow import csv as pacsv

            return rd.read_csv(
                path, convert_options=pacsv.ConvertOptions(include_columns=cols)
            )
        return rd.read_csv(path)
    if fmt == "json":
        ds = rd.read_json(path)
        return ds.select_columns(cols) if cols else ds
    raise ValueError(f"unsupported table format {fmt!r}")
