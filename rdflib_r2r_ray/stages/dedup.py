"""Deduplication stages: exact first (used by the KG materializer), with
near-duplicate families (MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine) for the training-data pipeline surface.

Scale notes: every global dedup is (local per-batch combine) → (one keyed
shuffle).  The local pass removes within-block duplicates vectorized in
Arrow, so the shuffle moves only distinct rows per block; the global pass is
an aggregate (one vectorized reduction per partition), never a Python call
per group.
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def local_distinct(batch: pa.Table, keys: Sequence[str]) -> pa.Table:
    """Within-batch distinct-on-keys keeping the first row (vectorized)."""
    if len(batch) == 0:
        return batch
    idx = pa.table({k: batch[k] for k in keys}).append_column(
        "__i", pa.array(np.arange(len(batch)), pa.int64())
    )
    first = idx.group_by(list(keys)).aggregate([("__i", "min")])
    take = pc.sort_indices(first["__i_min"])
    rows = pc.take(first["__i_min"], take)
    return batch.take(rows)


def distinct_on(ds: rd.Dataset, keys: Sequence[str], payload_min: Sequence[str] = ()) -> rd.Dataset:
    """Global exact distinct on ``keys``.

    Local per-batch dedup, then ``groupby(keys)`` with a ``min`` aggregate per
    payload column (for pure key-only relations this is just the groupby).
    Output columns: ``keys + payload_min``.
    """
    keys = list(keys)
    payload_min = list(payload_min)
    pre = ds.map_batches(
        lambda b: local_distinct(b, keys), batch_format="pyarrow"
    )
    g = pre.groupby(keys)
    if payload_min:
        out = g.min(payload_min)
        # ray names aggregate outputs min(col); rename back
        renames = {f"min({c})": c for c in payload_min}
        out = out.map_batches(
            lambda b, _r=renames: b.rename_columns([_r.get(n, n) for n in b.column_names]),
            batch_format="pyarrow",
        )
        return out
    # keys-only distinct: count then drop the count
    out = g.count()
    return out.select_columns(keys)


def dedupe_triples(ds: rd.Dataset) -> rd.Dataset:
    """Exact (subj, pred, obj) dedup of a triples Dataset — the set semantics
    rdflib applies on top of the reference's UNION ALL dump
    (``old_tests/test_rdb2rdf.py:122-126``)."""
    return distinct_on(ds, ["subj", "pred", "obj"], payload_min=["graph"])


# ---------------------------------------------------------------------------
# content-hash exact dedup for documents
# ---------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, col: str, out: str = "content_hash") -> pa.Table:
    vals = batch[col].to_pylist()
    hs = pa.array(
        [None if v is None else hashlib.sha1(v.encode() if isinstance(v, str) else v).hexdigest() for v in vals],
        pa.string(),
    )
    return batch.append_column(out, hs)


def exact_dedup_documents(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep, per distinct text content, the row with the smallest id —
    hash-partitioned groupby, deterministic winner."""
    withh = ds.map_batches(lambda b: add_content_hash(b, text_col), batch_format="pyarrow")
    keyed = withh.select_columns(["content_hash", id_col])
    keeper = keyed.groupby("content_hash").min(id_col)
    out = keeper.map_batches(
        lambda b: b.rename_columns(["content_hash", id_col]), batch_format="pyarrow"
    )
    return out


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup: shingle → minhash → bands → bucket groupby
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\w+")

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 12345):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        shingles = {" ".join(toks)} if toks else {""}
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return np.fromiter(
        (int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big") for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )


class MinHasher:
    """Actor-pool stage: text → (doc_id, band_id, band_hash) rows.

    Permutation parameters are generated once per actor in ``__init__``
    (deterministic seed → retry-idempotent)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows_per_band = num_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, then min over shingles, per permutation
        x = h[:, None].astype(np.uint64)
        vals = (x * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id: List = []
        out_band: List[int] = []
        out_hash: List[str] = []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            sig = self.signature(t)
            for bidx in range(self.bands):
                chunk = sig[bidx * self.rows_per_band : (bidx + 1) * self.rows_per_band]
                bh = hashlib.sha1(chunk.tobytes()).hexdigest()[:16]
                out_id.append(i)
                out_band.append(bidx)
                out_hash.append(bh)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
            }
        )


def minhash_lsh_candidates(ds: rd.Dataset, *, num_perm: int = 64, bands: int = 16,
                           k: int = 3, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    Returns Dataset (id_a, id_b) with id_a < id_b, distinct."""
    bandrows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, k=k,
                                   id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=4,
    )

    def pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group[id_col].to_pylist())
        a: List = []
        b: List = []
        # bucket sizes are tiny by construction; cap pathological buckets
        ids = ids[:200]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    cand = bandrows.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pyarrow")
    return distinct_on(cand, ["id_a", "id_b"])


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(map(tuple, _ngrams(a, k)))
    sb = set(map(tuple, _ngrams(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _ngrams(text: str, k: int):
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        return [tuple(toks)] if toks else []
    return [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in _TOKEN_RE.findall(text.lower()):
        h = int.from_bytes(hashlib.sha1(tok.encode()).digest()[:8], "big")
        bits = (h >> np.arange(64)) & 1
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHashStage:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        hs = pa.array([None if t is None else np.uint64(simhash64(t)) for t in texts], pa.uint64())
        return pa.table({self.id_col: batch[self.id_col], "simhash": hs})


# ---------------------------------------------------------------------------
# embedding cosine near-dup (brute within LSH-ish buckets by sign bits)
# ---------------------------------------------------------------------------

def embedding_near_dup(ds: rd.Dataset, *, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       planes: int = 8, seed: int = 99) -> rd.Dataset:
    """Near-duplicate vector pairs (cosine >= threshold) via random-hyperplane
    bucketing + within-bucket exact cosine.  Bucket key = sign pattern of
    ``planes`` random projections; near-identical vectors collide w.h.p."""
    rng = np.random.default_rng(seed)
    proj: Optional[np.ndarray] = None

    def bucket(batch: pa.Table) -> pa.Table:
        nonlocal proj
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if proj is None:
            proj = np.random.default_rng(seed).standard_normal((vecs.shape[1], planes))
        signs = (vecs @ proj) >= 0
        keys = [("".join("1" if s else "0" for s in row)) for row in signs]
        return pa.table({id_col: batch[id_col], "bucket": pa.array(keys, pa.string()),
                         vec_col: batch[vec_col]})

    def pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        vecs = np.asarray(group[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sim = unit @ unit.T
        a_out, b_out, s_out = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sim[i, j] >= threshold:
                    lo, hi = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                    a_out.append(lo)
                    b_out.append(hi)
                    s_out.append(float(sim[i, j]))
        return pa.table({"id_a": pa.array(a_out), "id_b": pa.array(b_out),
                         "cosine": pa.array(s_out, pa.float64())})

    b = ds.map_batches(bucket, batch_format="pyarrow")
    return b.groupby("bucket").map_groups(pairs, batch_format="pyarrow")
