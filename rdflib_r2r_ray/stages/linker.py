"""Entity mention detection + link scoring — the stateful actor-pool stage.

The reference holds its compiled mapping index in a long-lived converter
object (``sql_converter.py:246-267``); the Ray-native analogue is an actor
pool: the alias dictionary is ``ray.put`` ONCE on the driver and each actor
dereferences + compiles it ONCE in ``__init__`` (never per batch).

Match semantics (kept deliberately SQL-expressible for the correctness
oracle): each alias is matched independently with a word-bounded,
case-sensitive regex; a document links to the alias's best candidate entity
(argmax prior, tie → min IRI).  Counting is non-overlapping per alias —
identical in Python ``re``, Arrow RE2 and DuckDB RE2 for these alias shapes.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

MENTION_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),     # the page/document subject IRI (N3 <...>)
        pa.field("alias", pa.string()),
        pa.field("entity", pa.string()),   # linked entity IRI (pre-canonicalization)
        pa.field("n_mentions", pa.int64()),
        pa.field("prior", pa.float64()),
    ]
)


def alias_pattern(alias: str) -> str:
    return r"\b" + re.escape(alias) + r"\b"


class EntityLinker:
    """``map_batches`` actor: text column → long-format mention links.

    Parameters
    ----------
    alias_ref : ray.ObjectRef | list
        Broadcast handle (``ray.put``) to the ``(alias, entity_iri, prior)``
        rows, or the rows themselves (tests).
    subj_col : str
        Column holding the document's subject IRI in N3 ``<...>`` form
        (minted upstream by the mapping stage).
    """

    def __init__(self, alias_ref, subj_col: str = "subj", text_col: str = "text"):
        rows = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        # best candidate per alias: argmax prior, tie -> min IRI
        best = {}
        for a, iri, p in rows:
            cur = best.get(a)
            if cur is None or p > cur[1] or (p == cur[1] and iri < cur[0]):
                best[a] = (iri, p)
        self.aliases: List[Tuple[str, str, float, str]] = [
            (a, iri, p, alias_pattern(a)) for a, (iri, p) in sorted(best.items())
        ]
        self.subj_col = subj_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        subj = batch[self.subj_col]
        if isinstance(subj, pa.ChunkedArray):
            subj = subj.combine_chunks()
        outs = []
        n = len(batch)
        for alias, entity, prior, pat in self.aliases:
            counts = pc.count_substring_regex(text, pat)
            mask = pc.greater(pc.fill_null(counts, 0), 0)
            if not pc.any(mask).as_py():
                continue
            idx = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
            sel = pa.array(idx, pa.int64())
            k = len(idx)
            outs.append(
                pa.table(
                    {
                        "subj": subj.take(sel),
                        "alias": pa.array([alias] * k, pa.string()),
                        "entity": pa.array([entity] * k, pa.string()),
                        "n_mentions": pc.cast(counts.take(sel), pa.int64()),
                        "prior": pa.array([prior] * k, pa.float64()),
                    },
                    schema=MENTION_SCHEMA,
                )
            )
        if not outs:
            return MENTION_SCHEMA.empty_table()
        return pa.concat_tables(outs).combine_chunks()
