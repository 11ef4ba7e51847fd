"""F4 fixture: the entity-linking alias dictionary, plus the deterministic
link / merge / canonicalization semantics built on it.

The dictionary is a small constant (the "model + alias dict" an actor pool
pins per worker, SURVEY.md §7.2).  Semantics:

- **link**: an alias occurring in a document's text (``\\b``-bounded,
  case-sensitive, per-alias independent match) links the document to the
  alias's best candidate entity = argmax ``prior`` (tie → lexicographic min
  IRI).
- **merge**: two entity IRIs are duplicates iff they share **≥ 2 distinct
  aliases** (one shared alias is mere ambiguity).  Duplicate components are
  found by union-find; the canonical representative is the lexicographic
  **min IRI** of the component (deterministic, retry-idempotent — BASELINE
  north_star).

Everything here is driver-side, tiny, and broadcast to tasks.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

E = "http://kg.ex/e/"

# (alias, entity_iri_slug, prior) — entities share aliases to exercise
# ambiguity (1 shared alias) and duplicate-merging (>=2 shared aliases).
ALIAS_ROWS: List[Tuple[str, str, float]] = [
    # duplicate pair: spark / spark-engine share 2 aliases -> merge
    ("spark", "spark", 0.90),
    ("spark", "spark-engine", 0.50),
    ("spark stream", "spark", 0.80),
    ("spark stream", "spark-engine", 0.60),
    # duplicate pair: hash-join / hash-join-op share 2 aliases -> merge
    ("hash join", "hash-join", 0.85),
    ("hash join", "hash-join-op", 0.45),
    ("join hash", "hash-join", 0.40),
    ("join hash", "hash-join-op", 0.70),
    # duplicate chain: sort-merge ~ merge-sort ~ mergesort (A-B, B-C) -> one component
    ("sort merge", "sort-merge", 0.80),
    ("sort merge", "merge-sort", 0.60),
    ("merge sort", "sort-merge", 0.55),
    ("merge sort", "merge-sort", 0.75),
    ("merge merge", "merge-sort", 0.50),
    ("merge merge", "mergesort", 0.65),
    ("sort sort", "merge-sort", 0.45),
    ("sort sort", "mergesort", 0.55),
    # ambiguity only (1 shared alias, no merge)
    ("table", "table-db", 0.70),
    ("table", "table-furniture", 0.30),
    ("window", "window-fn", 0.80),
    ("window", "window-glass", 0.20),
    # plain single-alias entities (head entities -> power-law skew)
    ("scan", "scan", 0.95),
    ("column", "column", 0.95),
    ("join", "join", 0.95),
    ("order", "order", 0.95),
    ("hash", "hash", 0.95),
    ("filter", "filter-op", 0.95),
    ("batch", "batch", 0.95),
    ("value", "value", 0.95),
    ("vector", "vector", 0.95),
    ("key", "key", 0.95),
    ("customer", "customer", 0.95),
    ("group", "group", 0.95),
    ("row", "row", 0.95),
    ("stream", "stream", 0.95),
    ("query", "query", 0.95),
    ("data", "data", 0.95),
    ("big data", "big-data", 0.90),
    ("dup", "dup", 0.95),
    ("agg", "agg", 0.95),
]


def alias_table() -> List[Tuple[str, str, float]]:
    """(alias, entity_iri, prior) rows."""
    return [(a, E + slug, p) for a, slug, p in ALIAS_ROWS]


def best_entity_per_alias() -> Dict[str, str]:
    """alias → linked entity IRI (argmax prior, tie → min IRI)."""
    best: Dict[str, Tuple[float, str]] = {}
    for a, iri, p in alias_table():
        cur = best.get(a)
        # higher prior wins; on equal prior the lexicographically smaller IRI
        if cur is None or p > cur[0] or (p == cur[0] and iri < cur[1]):
            best[a] = (p, iri)
    return {a: iri for a, (p, iri) in best.items()}


def merge_edges() -> List[Tuple[str, str]]:
    """Entity-IRI pairs sharing >= 2 distinct aliases."""
    by_pair: Dict[Tuple[str, str], set] = defaultdict(set)
    by_alias: Dict[str, List[str]] = defaultdict(list)
    for a, iri, _ in alias_table():
        by_alias[a].append(iri)
    for a, iris in by_alias.items():
        iris = sorted(set(iris))
        for i in range(len(iris)):
            for j in range(i + 1, len(iris)):
                by_pair[(iris[i], iris[j])].add(a)
    return sorted(p for p, shared in by_pair.items() if len(shared) >= 2)


class UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller IRI becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def canonical_map() -> Dict[str, str]:
    """entity IRI → canonical (min-IRI of its duplicate component).
    Identity entries are omitted."""
    uf = UnionFind()
    for a, b in merge_edges():
        uf.union(a, b)
    out: Dict[str, str] = {}
    for _, iri, _ in alias_table():
        root = uf.find(iri)
        # root is min of component because union always roots the smaller IRI
        if root != iri:
            out[iri] = root
    return out


def linked_canonical_per_alias() -> Dict[str, str]:
    """alias → canonical entity IRI after linking + merge rewrite."""
    canon = canonical_map()
    return {a: canon.get(iri, iri) for a, iri in best_entity_per_alias().items()}


def alias_values_sql() -> str:
    """DuckDB VALUES clause of (alias, canon_entity) for oracle SQL — the
    dictionary is a fixture constant, so inlining it is legitimate."""
    rows = sorted(linked_canonical_per_alias().items())
    vals = ", ".join("('%s', '%s')" % (a.replace("'", "''"), e) for a, e in rows)
    return f"(VALUES {vals}) AS alias_map(alias, entity)"
