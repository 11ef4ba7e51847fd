"""User-facing graph handle — the reference's store surface re-expressed
over a triples Dataset (reference ``R2RStore``: ``triples()`` single-pattern
matching driven by rdflib Graph iteration, ``r2r_store.py:59-93``, and
``query()`` for SPARQL strings).

The reference virtualizes the graph over a SQL connection; here the graph
IS a Dataset — either freshly emitted from mapped tables or read back from
a materialized export (parquet partitions or N-Triples shards), and every
access streams:

- ``triples((s, p, o))`` — None = wildcard; constants filter vectorized
  per batch (no driver-side row loop).
- ``query(sparql_str, init_bindings=...)`` — the full SPARQL front end.
- ``iter_triples(pattern)`` — driver-side convenience generator over the
  streamed result (small results; big ones should stay Datasets).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_SPO = ["subj", "pred", "obj"]
Pattern = Tuple[Optional[str], Optional[str], Optional[str]]


class GraphStore:
    def __init__(self, triples: rd.Dataset):
        self._ds = triples.select_columns(_SPO)

    # --- constructors ------------------------------------------------------

    @classmethod
    def from_tables(cls, datasets: Dict[str, rd.Dataset], mapping) -> "GraphStore":
        """Emit the mapped graph (set semantics — rules may overlap)."""
        from .pipelines.kg import emit_graph
        from .stages.dedup import distinct_on

        out = emit_graph(datasets, mapping).select_columns(_SPO)
        return cls(distinct_on(out, _SPO))

    @classmethod
    def from_parquet(cls, out_dir: str) -> "GraphStore":
        """Open a ``materialize_graph`` export (already deduplicated) —
        through the manifest-checked reader, so partitions whose writer
        crashed mid-commit are excluded rather than read as data."""
        from .state.checkpoint import read_checkpointed

        return cls(read_checkpointed(out_dir))

    @classmethod
    def from_ntriples(cls, out_dir: str) -> "GraphStore":
        """Open a ``write_ntriples`` export (already deduplicated)."""
        from .sources.tables import read_ntriples

        return cls(read_ntriples(out_dir))

    # --- access ------------------------------------------------------------

    @property
    def dataset(self) -> rd.Dataset:
        return self._ds

    def triples(self, pattern: Pattern = (None, None, None)) -> rd.Dataset:
        """Single-pattern match (reference ``SPARQLStore.triples`` path):
        constants (N3-encoded terms) filter vectorized; None is a wildcard."""
        consts = [(c, t) for c, t in zip(_SPO, pattern) if t is not None]
        if not consts:
            return self._ds

        def flt(b: pa.Table, _c=tuple(consts)) -> pa.Table:
            mask = None
            for col, term in _c:
                m = pc.equal(b[col], term)
                mask = m if mask is None else pc.and_(mask, m)
            return b.filter(pc.fill_null(mask, False))

        return self._ds.map_batches(flt, batch_format="pyarrow")

    def query(self, sparql_str: str,
              init_bindings: Optional[Dict[str, str]] = None) -> rd.Dataset:
        from . import sparql

        return sparql.execute(self._ds, sparql_str, init_bindings=init_bindings)

    def iter_triples(self, pattern: Pattern = (None, None, None)
                     ) -> Iterator[Tuple[str, str, str]]:
        for row in self.triples(pattern).iter_rows():
            yield (row["subj"], row["pred"], row["obj"])

    def count(self, pattern: Pattern = (None, None, None)) -> int:
        return self.triples(pattern).count()
