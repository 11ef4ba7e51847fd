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


def read_ntriples(path: str) -> rd.Dataset:
    """Read N-Triples (a file, or a directory of ``part=*/data.nt`` shards
    from ``write_ntriples``) into the engine's (subj, pred, obj) storage
    form — the exact inverse of ``state.checkpoint._nt_term_array``: IRIs /
    bnodes / decorated literals pass through, plain ``"..."`` literals are
    unescaped to the BARE storage encoding.

    Parsing is one vectorized RE2 extraction + Arrow kernels per batch (no
    per-line Python).  Scale shape: ``read_text`` shards by file/block, so
    a partitioned export streams with the same parallelism it was written
    with."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.nt"), recursive=True))
        if not files:
            raise ValueError(f"no .nt files under {path!r}")
        ds = rd.read_text(files)
    else:
        ds = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        # whitespace-tolerant term separators (the N-Triples grammar allows
        # tabs / runs of spaces); blank lines and comments are skipped;
        # anything else unparseable raises LOUDLY — silent drops would turn
        # malformed input into wrong query answers
        m = pc.extract_regex(
            lines, r"^\s*(?P<s>\S+)\s+(?P<p>\S+)\s+(?P<o>.*?)\s*\.\s*$")
        mask = pc.is_valid(m)
        ignorable = pc.match_substring_regex(lines, r"^\s*(#|$)")
        bad = pc.and_(pc.invert(mask), pc.invert(pc.fill_null(ignorable, True)))
        n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        if n_bad:
            first = lines.filter(bad)[0].as_py()
            raise ValueError(
                f"{n_bad} unparseable N-Triples line(s), e.g. {first[:120]!r}")
        m = m.filter(mask)
        s = pc.struct_field(m, "s")
        p = pc.struct_field(m, "p")
        o = _decode_nt_objects(pc.struct_field(m, "o"))
        return pa.table({"subj": s, "pred": p, "obj": o})

    return ds.map_batches(parse, batch_format="pyarrow")


def _decode_nt_objects(o):
    """Unescape an N-Triples object-term column to the engine's storage
    form (inverse of ``state.checkpoint._nt_term_array``): plain quoted
    literals lose their quotes + full unescape to the BARE storage form;
    decorated literals keep delimiters but unescape control chars; the
    \\x00 sentinel makes the sequential unescape single-pass (documents
    with NUL bytes are out of scope for the text sink)."""
    import pyarrow.compute as pc

    plain = pc.match_substring_regex(o, r'(?s)^".*"$')
    quoted = pc.match_substring_regex(o, r'^"')
    inner = pc.replace_substring_regex(o, r'(?s)^"(.*)"$', r"\1")
    for a, b in (("\\\\", "\x00"), ('\\"', '"'), ("\\n", "\n"),
                 ("\\r", "\r"), ("\\t", "\t"), ("\x00", "\\")):
        inner = pc.replace_substring(inner, a, b)
    dec = o
    for a, b in (("\\\\", "\x00"), ("\\n", "\n"), ("\\r", "\r"),
                 ("\\t", "\t"), ("\x00", "\\")):
        dec = pc.replace_substring(dec, a, b)
    return pc.if_else(plain, inner, pc.if_else(quoted, dec, o))


def read_nquads(path: str) -> rd.Dataset:
    """Read N-Quads (a file, or a directory of ``part=*/data.nq`` shards
    from ``write_nquads``) into the (subj, pred, obj, graph) storage form —
    3-term default-graph lines parse with a NULL graph column.

    Two vectorized RE2 passes per batch: a strict 4-term extraction first
    (GREEDY object + a spaceless ``<iri>`` graph token, so an object
    literal containing ``<...>`` cannot be misread as a graph), then the
    3-term N-Triples grammar for the remainder; anything else raises
    LOUDLY."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "**", "*.nq"), recursive=True))
        if not files:
            raise ValueError(f"no .nq files under {path!r}")
        ds = rd.read_text(files)
    else:
        ds = rd.read_text(path)

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        m4 = pc.extract_regex(
            lines,
            r"^\s*(?P<s>\S+)\s+(?P<p>\S+)\s+(?P<o>.*\S)\s+(?P<g><[^<>\s]+>)\s*\.\s*$")
        m3 = pc.extract_regex(
            lines, r"^\s*(?P<s>\S+)\s+(?P<p>\S+)\s+(?P<o>.*?)\s*\.\s*$")
        ok4 = pc.is_valid(m4)
        ok3 = pc.is_valid(m3)
        ignorable = pc.match_substring_regex(lines, r"^\s*(#|$)")
        bad = pc.and_(pc.invert(pc.or_(ok4, ok3)),
                      pc.invert(pc.fill_null(ignorable, True)))
        n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
        if n_bad:
            first = lines.filter(bad)[0].as_py()
            raise ValueError(
                f"{n_bad} unparseable N-Quads line(s), e.g. {first[:120]!r}")

        def pick(field: str):
            return pc.if_else(ok4, pc.struct_field(m4, field),
                              pc.struct_field(m3, field))

        keep = pc.or_(ok4, ok3)
        s = pick("s").filter(keep)
        p = pick("p").filter(keep)
        o = _decode_nt_objects(pc.if_else(
            ok4, pc.struct_field(m4, "o"),
            pc.struct_field(m3, "o")).filter(keep))
        g = pc.if_else(ok4, pc.struct_field(m4, "g"),
                       pa.scalar(None, pa.string())).filter(keep)
        return pa.table({"subj": s, "pred": p, "obj": o, "graph": g})

    return ds.map_batches(parse, batch_format="pyarrow")
