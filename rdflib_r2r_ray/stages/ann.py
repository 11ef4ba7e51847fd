"""Similarity search over an embedding column (``list<float>``).

Two paths, per the scale plan:

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast
  ONCE (``ray.put``); every batch does one numpy matmul (batch × queries)
  and keeps its local top-k per query; a tiny global reduce merges partials.
  Baseline and correctness oracle (DuckDB ``list_cosine_similarity``).
- ``lsh_bucketed_topk``: random-hyperplane LSH variant — candidates are
  restricted to vectors whose sign-pattern bucket is within ``max_hamming``
  of the query's bucket; the scale path when the corpus no longer fits a
  full scan (probes shrink the scanned fraction exponentially in planes).
- ``embedding_near_dup_exact``: all-pairs cosine ≥ threshold via block ×
  broadcast-matrix matmul (exact; the LSH-bucketed variant for the same job
  lives in ``stages/dedup.py::embedding_near_dup``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix, zero-copy per chunk
    where Arrow's layout allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    ds: rd.Dataset,
    queries: pa.Table,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """Exact cosine top-k of ``queries`` against the embedding Dataset.

    Output: (query_id, vec_id, rank) — rank 1..k by (cosine desc, vec_id
    asc); a query vector never matches itself (vec_id != query's source id
    when ids coincide).  Scale: one broadcast of the query matrix, one
    matmul per batch, partial top-k per batch → global reduce over
    (num_blocks × q × k) rows only."""
    qm = _unit(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[query_id_col].to_pylist())
    q_ref = ray.put((qids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]))
        sims = m @ _qm.T  # (n, q)
        out_q: List = []
        out_v: List = []
        out_s: List[float] = []
        kk = min(k, len(ids))
        for qi in range(len(_qids)):
            col = sims[:, qi]
            mask = ids != _qids[qi]
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            sub = col[cand_idx]
            take = min(kk, len(cand_idx))
            # partial selection then deterministic (sim desc, id asc) order
            part = cand_idx[np.argpartition(-sub, take - 1)[:take]]
            out_q.extend([_qids[qi]] * len(part))
            out_v.extend(ids[part].tolist())
            out_s.extend(col[part].tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q),
                id_col: pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        rank = pa.array(np.arange(1, len(g) + 1, dtype=np.int64))
        return pa.table(
            {
                query_id_col: g[query_id_col],
                id_col: g[id_col],
                "rank": rank,
            }
        )

    return partials.groupby(query_id_col).map_groups(final, batch_format="pyarrow")


def hard_negative_topk(
    ds: rd.Dataset,
    queries: pa.Table,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """Contrastive hard-negative mining: for each labeled query vector, the
    top-k most cosine-similar vectors whose label DIFFERS from the query's
    (the negatives that sit closest to the decision boundary — what
    contrastive/embedding training mines per anchor).

    Output: (query_id, vec_id, rank), rank 1..k by (cosine desc, vec_id
    asc).  Same scale shape as :func:`brute_force_topk` — one ``ray.put``
    of the (ids, labels, unit-matrix) triple, one matmul + a label-mask per
    batch, partial top-k per block, then a global reduce over only
    (num_blocks × q × k) rows."""
    qm = _unit(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[query_id_col].to_pylist())
    qlabels = np.asarray(queries[label_col].to_pylist())
    q_ref = ray.put((qids, qlabels, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qlabels, _qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        labels = np.asarray(batch[label_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]))
        sims = m @ _qm.T  # (n, q)
        out_q: List = []
        out_v: List = []
        out_s: List[float] = []
        for qi in range(len(_qids)):
            col = sims[:, qi]
            mask = (ids != _qids[qi]) & (labels != _qlabels[qi])
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            sub = col[cand_idx]
            take = min(k, len(cand_idx))
            part = cand_idx[np.argpartition(-sub, take - 1)[:take]]
            out_q.extend([_qids[qi]] * len(part))
            out_v.extend(ids[part].tolist())
            out_s.extend(col[part].tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        rank = pa.array(np.arange(1, len(g) + 1, dtype=np.int64))
        return pa.table(
            {
                query_id_col: g[query_id_col],
                id_col: g[id_col],
                "rank": rank,
            }
        )

    return partials.groupby(query_id_col).map_groups(final, batch_format="pyarrow")


def brute_force_range(
    ds: rd.Dataset,
    queries: pa.Table,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """Radius (range) similarity search: every (query, vector) pair with
    cosine >= ``threshold``, self-matches excluded.  Same scale shape as
    :func:`brute_force_topk` — one ``ray.put`` of the query matrix, one
    matmul + one ``np.nonzero`` per batch, NO reduce stage at all (the
    threshold filter is embarrassingly parallel), so the output streams
    straight to the consumer."""
    qm = _unit(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[query_id_col].to_pylist())
    q_ref = ray.put((qids, qm))

    def local_range(batch: pa.Table) -> pa.Table:
        _qids, _qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]))
        sims = m @ _qm.T  # (n, q)
        vi, qi = np.nonzero((sims >= threshold) & (ids[:, None] != _qids[None, :]))
        return pa.table({
            query_id_col: pa.array(_qids[qi], pa.int64()),
            id_col: pa.array(ids[vi], pa.int64()),
        })

    return ds.map_batches(local_range, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no ``bitwise_count``)."""
    out = np.zeros(x.shape, dtype=np.uint64)
    v = x.copy()
    one = np.uint64(1)
    for _ in range(64):
        out += v & one
        v >>= one
    return out


def _sign_bucket(m: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """(n, planes) bool sign pattern → uint64 bucket ids."""
    bits = (m @ proj) >= 0
    weights = (1 << np.arange(proj.shape[1], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1)


def lsh_bucketed_topk(
    ds: rd.Dataset,
    queries: pa.Table,
    k: int = 10,
    planes: int = 8,
    max_hamming: int = 2,
    tables: int = 4,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """Approximate top-k via multi-table random-hyperplane LSH: a vector is
    a candidate if its sign-pattern bucket is within ``max_hamming`` bits of
    the query's in ANY of ``tables`` independent projection tables
    (standard L-table LSH — recall compounds as 1-(1-p)^L while each table
    scans only its Hamming ball).  Same output schema as
    ``brute_force_topk``; recall < 1 by design (measured in tests against
    the brute-force oracle)."""
    qm = _unit(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[query_id_col].to_pylist())
    dim = qm.shape[1]
    rng = np.random.default_rng(seed)
    projs = [rng.standard_normal((dim, planes)) for _ in range(tables)]
    q_buckets = np.stack([_sign_bucket(qm, p) for p in projs])  # (L, q)
    q_ref = ray.put((qids, qm, q_buckets))

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm, _qb = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]))
        buckets = np.stack([_sign_bucket(m, p) for p in projs])  # (L, n)
        out_q: List = []
        out_v: List = []
        out_s: List[float] = []
        for qi in range(len(_qids)):
            mask = np.zeros(len(ids), dtype=bool)
            for li in range(len(projs)):
                ham = _popcount64((buckets[li] ^ _qb[li, qi]).astype(np.uint64))
                mask |= ham <= max_hamming
            mask &= ids != _qids[qi]
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            sims = m[cand] @ _qm[qi]
            take = min(k, len(cand))
            part = cand[np.argpartition(-sims, take - 1)[:take]]
            out_q.extend([_qids[qi]] * len(part))
            out_v.extend(ids[part].tolist())
            out_s.extend((m[part] @ _qm[qi]).tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q),
                id_col: pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        return pa.table(
            {
                query_id_col: g[query_id_col],
                id_col: g[id_col],
                "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
            }
        )

    return partials.groupby(query_id_col).map_groups(final, batch_format="pyarrow")


def train_ivf_centroids(
    ds: rd.Dataset,
    n_centroids: int = 16,
    sample_rows: int = 4096,
    iters: int = 5,
    seed: int = 7,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train IVF coarse centroids: deterministic seeded sample (first
    ``sample_rows`` by id order of the first blocks) + a few Lloyd
    iterations on the driver.  At cluster scale the sample is a push-down
    ``limit`` — centroid training never touches the full corpus."""
    sample = ds.limit(sample_rows).take_all()
    m = _unit(np.asarray([r[vec_col] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(
    ds: rd.Dataset,
    queries: pa.Table,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """IVF approximate top-k: vectors are assigned to their nearest coarse
    centroid (inverted lists); each query scores only vectors whose
    centroid is among its ``nprobe`` closest — scanned fraction ≈
    nprobe/n_centroids.  Same output schema as ``brute_force_topk``; recall
    measured in tests.  Centroids broadcast once (``ray.put``)."""
    cent = train_ivf_centroids(ds, n_centroids=n_centroids, vec_col=vec_col)
    qm = _unit(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[query_id_col].to_pylist())
    q_probe = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # (q, nprobe)
    ref = ray.put((qids, qm, cent, q_probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm, _cent, _probe = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]))
        assign = (m @ _cent.T).argmax(axis=1)
        out_q: List = []
        out_v: List = []
        out_s: List[float] = []
        for qi in range(len(_qids)):
            mask = np.isin(assign, _probe[qi]) & (ids != _qids[qi])
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            sims = m[cand] @ _qm[qi]
            take = min(k, len(cand))
            part = cand[np.argpartition(-sims, take - 1)[:take]]
            out_q.extend([_qids[qi]] * len(part))
            out_v.extend(ids[part].tolist())
            out_s.extend((m[part] @ _qm[qi]).tolist())
        return pa.table(
            {
                query_id_col: pa.array(out_q),
                id_col: pa.array(out_v),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")]).slice(0, k)
        return pa.table(
            {
                query_id_col: g[query_id_col],
                id_col: g[id_col],
                "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
            }
        )

    return partials.groupby(query_id_col).map_groups(final, batch_format="pyarrow")


def _block_pair_sims(threshold: float, id_col: str, vec_col: str,
                     ta: pa.Table, tb: Optional[pa.Table]) -> pa.Table:
    """One (block_i, block_j) tile of the exact all-pairs cosine grid.
    ``tb is None`` means the diagonal tile (ta × ta)."""
    ids_a = np.asarray(ta[id_col].to_pylist())
    m_a = _unit(_to_matrix(ta[vec_col]))
    if tb is None:
        ids_b, m_b = ids_a, m_a
    else:
        ids_b = np.asarray(tb[id_col].to_pylist())
        m_b = _unit(_to_matrix(tb[vec_col]))
    sims = m_a @ m_b.T
    ii, jj = np.nonzero(sims >= threshold)
    if tb is None:
        # diagonal tile: emit each unordered pair once
        keep = ids_a[ii] < ids_b[jj]
        lo, hi = ids_a[ii][keep], ids_b[jj][keep]
    else:
        # off-diagonal tile: the smaller id may be on EITHER side — normalize
        a, b = ids_a[ii], ids_b[jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi)})


def knn_classify(
    ds: rd.Dataset,
    queries: pa.Table,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """k-nearest-neighbour CLASSIFICATION of a bounded query panel against
    a labeled embedding corpus — the non-parametric baseline every
    embedding-quality audit starts with (label-propagation accuracy over
    the representation).  Same scale shape as :func:`brute_force_topk`:
    the query matrix is broadcast once, every train batch does one matmul
    and keeps its local (cosine desc, id asc) top-k per query with the
    neighbour LABEL attached, and the per-query reduce sees only
    (num_blocks × q × k) rows — then majority-votes (ties → smallest
    label).  Cosines are quantized to HALF-UP PERMILLE integers before any
    ranking (the ``ml_silhouette`` fixed-point protocol) and boundary ties
    break by ascending id, so the ranking is identical regardless of FP
    evaluation order — matmul here, ``list_cosine_similarity`` in the
    DuckDB oracle.  Output: (query_id, pred_label, n_votes)."""
    qm = _unit(_to_matrix(queries[vec_col]))
    qids = np.asarray(queries[query_id_col].to_pylist())
    q_ref = ray.put((qids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        _qids, _qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        if len(ids) == 0:
            # a block fully removed by an upstream filter (e.g. train_only)
            return pa.table({
                query_id_col: pa.array([], pa.int64()),
                id_col: batch[id_col],
                label_col: pa.array([], pa.int32()),
                "cosine": pa.array([], pa.int64()),
            })
        labs = np.asarray(batch[label_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]))
        simq = np.floor(1000.0 * (m @ _qm.T) + 0.5).astype(np.int64)
        out_q: List = []
        out_v: List = []
        out_l: List = []
        out_s: List[int] = []
        kk = min(k, len(ids))
        for qi in range(len(_qids)):
            col = simq[:, qi]
            # exact (permille desc, id asc) top-k without a full sort:
            # argpartition finds the k-th value, then only the candidate
            # set (top-k plus its boundary ties) is lexsorted — O(n + c
            # log c) instead of O(n log n) per query
            if len(col) > kk:
                thresh = np.partition(col, -kk)[-kk]
                cand = np.nonzero(col >= thresh)[0]
            else:
                cand = np.arange(len(col))
            part = cand[np.lexsort((ids[cand], -col[cand]))][:kk]
            out_q.extend([_qids[qi]] * len(part))
            out_v.extend(ids[part].tolist())
            out_l.extend(labs[part].tolist())
            out_s.extend(col[part].tolist())
        return pa.table({
            query_id_col: pa.array(out_q),
            id_col: pa.array(out_v),
            label_col: pa.array(out_l, pa.int32()),
            "cosine": pa.array(out_s, pa.int64()),
        })

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def vote(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"),
                           (id_col, "ascending")]).slice(0, k)
        labs = np.asarray(g[label_col].to_pylist(), dtype=np.int64)
        uniq, counts = np.unique(labs, return_counts=True)
        best = counts.max()
        pred = int(uniq[counts == best].min())  # tie → smallest label
        return pa.table({
            query_id_col: g[query_id_col].slice(0, 1),
            "pred_label": pa.array([pred], pa.int32()),
            "n_votes": pa.array([int(best)], pa.int64()),
        })

    return partials.groupby(query_id_col).map_groups(vote, batch_format="pyarrow")


def embedding_near_dup_exact(
    ds: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Exact all-pairs cosine ≥ threshold as a BLOCK-PAIR task grid: the
    dataset is materialized once (blocks stay in the object store), and one
    Ray task per (block_i, block_j) tile computes its sub-matmul — the
    driver holds only O(blocks²) refs, never the vectors.  O(n²) compute by
    definition of the operator (the correct exact baseline for low
    thresholds, where hyperplane-LSH recall collapses); the sub-quadratic
    scale path for HIGH thresholds is ``stages/dedup.py::embedding_near_dup``."""
    mat = ds.select_columns([id_col, vec_col]).materialize()
    refs = mat.to_arrow_refs()
    task = ray.remote(_block_pair_sims)
    out = []
    for i in range(len(refs)):
        out.append(task.remote(threshold, id_col, vec_col, refs[i], None))
        for j in range(i + 1, len(refs)):
            out.append(task.remote(threshold, id_col, vec_col, refs[i], refs[j]))
    return rd.from_arrow_refs(out)


def _tile_partial_topk(k: int, id_col: str, vec_col: str,
                       ta: pa.Table, tb: Optional[pa.Table]) -> pa.Table:
    """Partial top-k rows for one tile of the all-pairs grid: every row of
    ``ta`` keeps its k best candidates among ``tb``'s rows and (off-diagonal
    tiles) vice versa, so at most (|a|+|b|)·k rows leave the tile."""
    ids_a = np.asarray(ta[id_col].to_pylist())
    m_a = _unit(_to_matrix(ta[vec_col]))
    if tb is None:
        ids_b, m_b = ids_a, m_a
    else:
        ids_b = np.asarray(tb[id_col].to_pylist())
        m_b = _unit(_to_matrix(tb[vec_col]))
    sims = m_a @ m_b.T
    if tb is None:
        np.fill_diagonal(sims, -2.0)  # a vector is not its own neighbor

    def partial(ids_q: np.ndarray, ids_c: np.ndarray, s: np.ndarray):
        kk = min(k, s.shape[1])
        idx = np.argpartition(-s, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(ids_q, kk)
        cols = ids_c[idx.ravel()]
        vals = np.take_along_axis(s, idx, axis=1).ravel()
        keep = vals > -1.5  # drop the masked self cell of 1-row tiles
        return rows[keep], cols[keep], vals[keep]

    parts = [partial(ids_a, ids_b, sims)]
    if tb is not None:
        parts.append(partial(ids_b, ids_a, np.ascontiguousarray(sims.T)))
    return pa.table({
        "vec_id": pa.array(np.concatenate([p[0] for p in parts])),
        "nbr_id": pa.array(np.concatenate([p[1] for p in parts])),
        "cosine": pa.array(np.concatenate([p[2] for p in parts])),
    })


def knn_graph(
    ds: rd.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Exact cosine k-nearest-neighbor GRAPH (every vector → its k best
    neighbors, rank 1..k by cosine desc / id asc) — the clustering /
    diversity-sampling primitive.  Same block-pair task grid as
    :func:`embedding_near_dup_exact`, but each tile emits only PARTIAL
    top-k rows (≤ (|a|+|b|)·k per tile — never the full similarity matrix),
    and a vec_id-keyed hash exchange finishes with one vectorized
    sort + head + rank per partition.  O(n²) compute by definition of the
    exact operator; at corpus scale the same reduce runs over IVF/LSH
    bucket candidates instead of the full grid."""
    from .dedup import _pl, hash_group_exchange

    mat = ds.select_columns([id_col, vec_col]).materialize()
    refs = mat.to_arrow_refs()
    task = ray.remote(_tile_partial_topk)
    out = []
    for i in range(len(refs)):
        out.append(task.remote(k, id_col, vec_col, refs[i], None))
        for j in range(i + 1, len(refs)):
            out.append(task.remote(k, id_col, vec_col, refs[i], refs[j]))
    partials = rd.from_arrow_refs(out)

    out_schema = pa.schema([("vec_id", pa.int64()), ("nbr_id", pa.int64()),
                            ("rank", pa.int64())])

    def final(t: pa.Table) -> pa.Table:
        pl = _pl()
        df = (
            pl.from_arrow(t)
            .sort(["cosine", "nbr_id"], descending=[True, False])
            .with_columns(rank=pl.col("nbr_id").cum_count()
                          .over("vec_id").cast(pl.Int64))
            .filter(pl.col("rank") <= k)
            .select(["vec_id", "nbr_id", "rank"])
        )
        return df.to_arrow().cast(out_schema)

    return hash_group_exchange(partials, ["vec_id"], final, out_schema)


# ---------------------------------------------------------------------------
# distributed k-means + SemDeDup-style semantic dedup
# ---------------------------------------------------------------------------

def kmeans_distributed(
    ds: rd.Dataset,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd k-means over the FULL dataset (contrast
    ``train_ivf_centroids``, which fits on a driver-local sample): each
    iteration is ONE streaming ``map_batches`` pass emitting k partial
    (sum-vector, count) rows per block — the driver reduce is O(k·d·blocks),
    never O(rows).  Centroids are broadcast once per iteration (``ray.put``).

    Deterministic and oracle-replayable (``dataq.SQL_DD_SEMANTIC``): init
    centroids are the raw embeddings of the k LOWEST ids; assignment is
    cosine argmax with lowest-cluster tie-break; update is the dimension-wise
    float64 mean (empty clusters keep their previous centroid)."""
    # init: k lowest ids — per-block partial min-k, tiny driver reduce
    def low_k(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, vec_col]).sort_by(id_col)
        return t.slice(0, k)

    parts = ds.map_batches(low_k, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: r[id_col])
    cent = np.asarray([r[vec_col] for r in parts[:k]], dtype=np.float64)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial_stats(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _to_matrix(batch[vec_col])
            assign = (_unit(m) @ _unit(c).T).argmax(axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.table({
                "cluster": pa.array(np.arange(len(c)), pa.int32()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "cnt": pa.array(counts, pa.int64()),
            })

        stats = ds.map_batches(partial_stats, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cent)
        counts = np.zeros(k, dtype=np.int64)
        for r in stats:
            sums[r["cluster"]] += np.asarray(r["vsum"])
            counts[r["cluster"]] += r["cnt"]
        nonempty = counts > 0
        cent[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cent


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> rd.Dataset:
    """Final assignment pass: (id, cluster[, embedding])."""
    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _to_matrix(batch[vec_col])
        a = (_unit(m) @ _unit(c).T).argmax(axis=1)
        cols = {id_col: batch[id_col], "cluster": pa.array(a, pa.int32())}
        if keep_vec:
            cols[vec_col] = batch[vec_col]
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(
    ds: rd.Dataset,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means, then
    drop any vector whose cosine similarity to a LOWER-id vector in the SAME
    cluster is ≥ threshold.  The pairwise stage runs per cluster through the
    streaming hash exchange — O(Σ cᵢ²) instead of O(n²), the cost model that
    makes semantic dedup feasible at corpus scale (k scales with n to bound
    cᵢ).  Output: (id, cluster, kept)."""
    from .dedup import hash_group_exchange  # driver-side only (avoid cycle)

    cent = kmeans_distributed(ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(ds, cent, id_col=id_col, vec_col=vec_col, keep_vec=True)
    out_schema = pa.schema([
        pa.field(id_col, pa.int64()),
        pa.field("cluster", pa.int32()),
        pa.field("kept", pa.bool_()),
    ])

    def reduce_fn(tbl: pa.Table) -> pa.Table:
        ids_out: List[int] = []
        cl_out: List[int] = []
        kept_out: List[bool] = []
        for cl in pa.compute.unique(tbl["cluster"]).to_pylist():
            g = tbl.filter(pa.compute.equal(tbl["cluster"], cl)).sort_by(id_col)
            u = _unit(_to_matrix(g[vec_col]))
            sims = u @ u.T
            ids = g[id_col].to_pylist()
            for i in range(len(ids)):
                ids_out.append(ids[i])
                cl_out.append(cl)
                kept_out.append(bool(not (sims[i, :i] >= threshold).any()))
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "cluster": pa.array(cl_out, pa.int32()),
            "kept": pa.array(kept_out, pa.bool_()),
        })

    return hash_group_exchange(assigned, ["cluster"], reduce_fn, out_schema)


def pq_adc_topk(
    ds: rd.Dataset,
    queries: pa.Table,
    k: int = 10,
    subs: int = 8,
    kcent: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> rd.Dataset:
    """Product-quantization asymmetric-distance top-k (ADC; Jégou et al.
    2011) — the compressed-domain ANN path: vectors quantize to ``subs``
    codebook indices (here from deterministic codebooks = subvectors of the
    ``kcent`` lowest-id embeddings), and each query scans CODES ONLY via a
    per-query (subs × kcent) lookup table — at 100 TB the float vectors
    never leave storage after encoding; a batch scan touches 1 byte per
    subspace per vector.

    All vectors and queries are L2-normalized first, so squared-L2 ADC
    order ≈ cosine order and recall is measured against the cosine
    brute-force truth.  Same partial-top-k-per-block → per-query reduce
    shape as :func:`brute_force_topk`; ties break (distance asc, id asc)."""
    def low_k(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, vec_col]).sort_by(id_col).slice(0, kcent)

    parts = ds.map_batches(low_k, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: r[id_col])
    init = _unit(np.asarray([r[vec_col] for r in parts[:kcent]], np.float64))
    d = init.shape[1]
    sub = d // subs
    books = init.reshape(len(init), subs, sub).transpose(1, 0, 2).copy()
    qm = _unit(_to_matrix(queries[vec_col]).astype(np.float64))
    qids = np.asarray(queries[query_id_col].to_pylist())
    qs = qm.reshape(len(qids), subs, sub)
    # per-query lookup table: squared L2 to every centroid of every subspace
    lut = ((qs[:, :, None, :] - books[None, :, :, :]) ** 2).sum(axis=3)
    ref = ray.put((qids, books, lut))

    def local(batch: pa.Table) -> pa.Table:
        _qids, _books, _lut = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist())
        m = _unit(_to_matrix(batch[vec_col]).astype(np.float64))
        x = m.reshape(len(ids), subs, sub)
        d2 = ((x[:, :, None, :] - _books[None]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2)  # (n, subs)
        nq = len(_qids)
        adc = np.zeros((len(ids), nq))
        for s in range(subs):
            adc += _lut[:, s, codes[:, s]].T  # (n, q)
        out_q: list = []
        out_v: list = []
        out_d: list = []
        kk = min(k, len(ids))
        for qi in range(nq):
            col = adc[:, qi]
            cand = np.nonzero(ids != _qids[qi])[0]
            if len(cand) == 0:
                continue
            take = min(kk, len(cand))
            part = cand[np.argpartition(col[cand], take - 1)[:take]]
            out_q.extend([_qids[qi]] * len(part))
            out_v.extend(ids[part].tolist())
            out_d.extend(col[part].tolist())
        return pa.table({
            query_id_col: pa.array(out_q),
            id_col: pa.array(out_v),
            "dist": pa.array(out_d, pa.float64()),
        })

    partials = ds.map_batches(local, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        g = group.sort_by([("dist", "ascending"), (id_col, "ascending")]).slice(0, k)
        return pa.table({
            query_id_col: g[query_id_col],
            id_col: g[id_col],
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
        })

    return partials.groupby(query_id_col).map_groups(final, batch_format="pyarrow")
