"""Deterministic test fixtures (FIXTURES.md F1–F4): the Common-Crawl-style
``pages`` table, the alias dictionary, and the W3C-shaped relational
micro-tables.  All seeded — no external data, identical across runs.
"""

from __future__ import annotations

import datetime as dt
from typing import Dict, List

import numpy as np
import pyarrow as pa

from .aliases import ALIAS_ROWS
from .stages.extract import make_html

# filler words that are NOT aliases (so not every token links)
_FILLER = [
    "the", "a", "of", "with", "into", "over", "under", "very", "quite",
    "slow", "fast", "small", "big", "line", "part", "sort", "merge",
]


def _vocab() -> List[str]:
    """Sampling vocabulary: alias surface forms (single + multi word) plus
    filler, Zipf-weighted so head aliases dominate (skew exercise)."""
    aliases = sorted({a for a, _, _ in ALIAS_ROWS})
    return aliases + _FILLER


def pages_table(n: int = 500, seed: int = 7) -> pa.Table:
    """F1 ``pages`` fixture: (url, warc_ts, html, text, lang); ``text`` is the
    golden extraction target; ``html`` wraps it (stages.extract.make_html)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    # Zipf weights over the vocab: rank r gets 1/r^1.1
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    w = 1.0 / ranks**1.1
    w /= w.sum()
    langs = np.array(["en"] * 7 + ["es", "de", ""])  # "" -> null

    urls, tss, htmls, texts, lang_col = [], [], [], [], []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(n):
        url = f"http://ex.org/site{i % 97}/page/{i}"
        nw = int(rng.integers(20, 120))
        words = rng.choice(vocab, size=nw, p=w)
        text = " ".join(words)
        html = make_html(text, url, title=f"Page {i}")
        urls.append(url)
        tss.append(t0 + dt.timedelta(seconds=int(rng.integers(0, 10_000_000))))
        htmls.append(html)
        texts.append(text)
        lv = str(rng.choice(langs))
        lang_col.append(lv if lv else None)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang_col, pa.string()),
        }
    )


def alias_dict_table() -> pa.Table:
    from .aliases import alias_table

    rows = alias_table()
    return pa.table(
        {
            "alias": pa.array([r[0] for r in rows], pa.string()),
            "entity_iri": pa.array([r[1] for r in rows], pa.string()),
            "prior": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# F3: W3C rdb2rdf-shaped micro tables (as pyarrow tables + dict rows)
# ---------------------------------------------------------------------------

def micro_tables() -> Dict[str, pa.Table]:
    return {
        "t_empty": pa.table({"c": pa.array([], pa.string())}),
        "t_nopk": pa.table(
            {
                "name": ["Alice", "Bob", "Alice"],
                "city": ["NY", "SF", "NY"],
                "age": pa.array([30, 40, 30], pa.int64()),
            }
        ),
        "t_composite_pk": pa.table(
            {
                "k1": pa.array([1, 1, 2], pa.int64()),
                "k2": pa.array(["a", "b", "a"], pa.string()),
                "v": pa.array([10.5, 20.5, 30.5], pa.float64()),
            }
        ),
        "t_nulls": pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "x": pa.array(["p", None, "q"], pa.string()),
                "y": pa.array([None, 7, None], pa.int64()),
            }
        ),
        "t_types": pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "f": pa.array([1.5, -2.25], pa.float64()),
                "b": pa.array([True, False], pa.bool_()),
                "d": pa.array([dt.date(2020, 1, 2), dt.date(1999, 12, 31)], pa.date32()),
                "ts": pa.array(
                    [dt.datetime(2020, 1, 2, 3, 4, 5), dt.datetime(2021, 6, 7, 8, 9, 10)],
                    pa.timestamp("us"),
                ),
                "bin": pa.array([b"\x00\xff", b"ab"], pa.binary()),
                "s": pa.array(["hello", "world"], pa.string()),
            }
        ),
        "t_special_chars": pa.table(
            {
                "key": pa.array(["a b/c(d),e:f", "plain"], pa.string()),
                "v": pa.array([1, 2], pa.int64()),
            }
        ),
        "t_lang": pa.table(
            {
                "Code": ["BO", "BO", "IE", "IE"],
                "Name": [
                    "Bolivia, Plurinational State of",
                    "Estado Plurinacional de Bolivia",
                    "Ireland",
                    "Irlanda",
                ],
                "Lan": ["EN", "ES", "EN", "ES"],
            }
        ),
        "t_parent": pa.table(
            {"pid": pa.array([10, 20], pa.int64()), "pname": ["P10", "P20"]}
        ),
        "t_child": pa.table(
            {
                "cid": pa.array([1, 2, 3], pa.int64()),
                "fk": pa.array([10, 20, 10], pa.int64()),
            }
        ),
    }


def micro_primary_keys() -> Dict[str, List[str]]:
    return {
        "t_empty": ["c"],
        "t_nopk": [],
        "t_composite_pk": ["k1", "k2"],
        "t_nulls": ["id"],
        "t_types": ["id"],
        "t_special_chars": ["key"],
        "t_lang": ["Code"],
        "t_parent": ["pid"],
        "t_child": ["cid"],
    }


def rows_of(table: pa.Table) -> List[dict]:
    return table.to_pylist()
