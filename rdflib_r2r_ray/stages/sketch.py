"""Approximate-distinct sketch (HyperLogLog) — the cardinality primitive a
100 TB curation pipeline needs where an exact ``COUNT(DISTINCT)`` exchange
is not worth the shuffle (e.g. per-crawl URL/user cardinality dashboards).

Shape: one vectorized register fold per batch (polars xxhash + numpy
``maximum.at``) emitting ONE register row per block; the driver folds the
O(blocks) tiny register rows (m bytes each) — no shuffle at all, bounded
driver work.  Deterministic (seeded hash), so the relative error on a given
input is FIXED, not a random variable — the registered query's 5 % gate is
reproducible.

Standard HLL estimator (Flajolet et al. 2007) with the linear-counting
small-range correction; p=12 → m=4096 registers, ~1.6 % standard error.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .dedup import _pl


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 (no float log2 — exact for
    all 64 bits)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = cur >> np.uint64(s)
        has = m > 0
        bl[has] += s
        cur[has] = m[has]
    bl[x > 0] += 1
    return bl


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Fold a uint64 hash array into an m=2^p register array (uint8)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    rest = (values << np.uint64(p)) & np.uint64((1 << 64) - 1)
    # rank = leading zeros of rest + 1; rest's low p bits are always zero,
    # so a nonzero rest has bit_length in [p+1, 64] and rank in [1, 64-p]
    rank = (64 - _bit_length_u64(rest) + 1).astype(np.uint8)
    rank[rest == 0] = 64 - p + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)  # linear-counting small-range fix
    return float(est)


def hll_registers(ds: rd.Dataset, col: str, p: int = 12) -> np.ndarray:
    """Merged m=2^p HLL register array for ``col``: per-batch register fold
    (one tiny row per block moves), driver-side maximum-merge of O(blocks)
    m-byte rows.  Register arrays are the MERGEABLE form of the sketch —
    elementwise max of two columns' registers is the sketch of their set
    UNION, which makes |A∪B| / |A∩B| (inclusion–exclusion) estimable
    without re-reading either input."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        pl = _pl()
        c = batch[col]
        s = pl.from_arrow(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        h = s.drop_nulls().hash(seed=7).to_numpy()
        regs = hll_partial(h.astype(np.uint64), p)
        return pa.table({"reg": pa.array([regs.tolist()], pa.list_(pa.uint8()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(m, dtype=np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.asarray(r["reg"], dtype=np.uint8))
    return merged


def approx_count_distinct(ds: rd.Dataset, col: str, p: int = 12) -> float:
    """Approximate ``COUNT(DISTINCT col)`` off the merged registers."""
    return hll_estimate(hll_registers(ds, col, p))


def grouped_approx_count_distinct(
    ds: rd.Dataset, key: str, col: str, p: int = 12
) -> rd.Dataset:
    """Per-group approximate ``COUNT(DISTINCT col)``: each block emits ONE
    m-byte register row per group it contains (so the exchange moves
    O(groups × blocks) sketch rows, never values), a group-keyed exchange
    maximum-merges the registers and runs the estimator per complete group.
    Partitioning contract: the register fan-out is m bytes per (group,
    block) — right for low-to-mid-cardinality keys (crawls, languages,
    sources); for per-user cardinalities use the exact count-distinct
    exchange instead.  Returns Dataset ``(key, approx_distinct: float)``."""
    from .dedup import hash_group_exchange

    out_schema = pa.schema([(key, pa.string()), ("approx_distinct", pa.float64())])

    def partial(batch: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(batch.select([key, col])).drop_nulls()
        ks, regs = [], []
        for kt, g in df.group_by(key):  # bounded by per-block key cardinality
            h = g[col].hash(seed=7).to_numpy().astype(np.uint64)
            ks.append(kt[0])
            regs.append(hll_partial(h, p).tolist())
        return pa.table({key: pa.array(ks, pa.string()),
                         "reg": pa.array(regs, pa.list_(pa.uint8()))})

    def reduce_fn(part: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(part)
        ks, ests = [], []
        for kt, g in df.group_by(key):
            merged = np.maximum.reduce(
                np.asarray(g["reg"].to_list(), dtype=np.uint8))
            ks.append(kt[0])
            ests.append(hll_estimate(merged))
        return pa.table({key: pa.array(ks, pa.string()),
                         "approx_distinct": pa.array(ests, pa.float64())},
                        schema=out_schema)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return hash_group_exchange(parts, [key], reduce_fn, out_schema)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency primitive
# for heavy-hitter detection where an exact per-token groupby shuffle is not
# worth it (e.g. hot-URL / hot-token dashboards over a crawl).  d rows of w
# counters; point estimate = min over rows; always an OVERestimate, with
# P[err > e·N/w] < (1/2)^d for the standard constants.

CMS_MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)  # odd 64-bit mixers


def _cms_positions(h: np.ndarray, row: int, log2_w: int) -> np.ndarray:
    """Row-``row`` counter positions for pre-hashed uint64 keys: one
    multiply-shift (Dietzfelbinger) per row — vectorized, no rehash of the
    underlying values."""
    return ((h * np.uint64(CMS_MULTS[row]))
            >> np.uint64(64 - log2_w)).astype(np.int64)


def cms_partial(h: np.ndarray, log2_w: int, d: int = 4,
                weights: Optional[np.ndarray] = None) -> np.ndarray:
    """Fold pre-hashed uint64 keys into a (d, 2^log2_w) int64 counter
    block.  ``weights`` lets pre-aggregated (key, count) partials fold to
    the IDENTICAL sketch the raw stream would (counts are additive)."""
    w = 1 << log2_w
    counters = np.zeros((d, w), dtype=np.int64)
    for r in range(d):
        np.add.at(counters[r], _cms_positions(h, r, log2_w),
                  1 if weights is None else weights)
    return counters


def cms_estimate(counters: np.ndarray, h: np.ndarray, log2_w: int) -> np.ndarray:
    """Point-frequency estimates (min over rows) for pre-hashed keys."""
    d = counters.shape[0]
    est = counters[0][_cms_positions(h, 0, log2_w)]
    for r in range(1, d):
        est = np.minimum(est, counters[r][_cms_positions(h, r, log2_w)])
    return est


def cms_merge(ds: rd.Dataset, col: str, log2_w: int = 13, d: int = 4,
              seed: int = 7, weight_col: Optional[str] = None) -> np.ndarray:
    """Global count-min sketch of a string column: per-batch counter fold
    (ONE flattened d×w int64 row per block moves — 256 KB at the default
    width), driver-side SUM-merge of the O(blocks) sketch rows.  No shuffle:
    the merge is associative, exactly like the HLL register fold above.
    ``weight_col`` folds pre-aggregated (key, count) partial rows instead of
    a raw occurrence stream — same sketch, far fewer rows touched."""
    w = 1 << log2_w

    def partial(batch: pa.Table) -> pa.Table:
        pl = _pl()
        c = batch[col]
        s = pl.from_arrow(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        mask = s.is_not_null()
        h = s.filter(mask).hash(seed=seed).to_numpy().astype(np.uint64)
        wts = None
        if weight_col is not None:
            wts = pl.from_arrow(batch[weight_col].combine_chunks()
                                if isinstance(batch[weight_col], pa.ChunkedArray)
                                else batch[weight_col]).filter(mask).to_numpy()
        counters = cms_partial(h, log2_w, d, weights=wts)
        return pa.table({"cms": pa.array([counters.ravel().tolist()],
                                         pa.list_(pa.int64()))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(d * w, dtype=np.int64)
    for r in rows:
        merged += np.asarray(r["cms"], dtype=np.int64)
    return merged.reshape(d, w)


# ---------------------------------------------------------------------------
# Mergeable quantile summary (MRL-style; Manku, Rajagopalan & Lindsay 1998)
# — the bounded-state quantile primitive for CONTINUOUS columns at corpus
# scale, where the exact value-histogram path (relational.quantiles_disc)
# would put O(distinct values) = O(rows) on the driver.  Each block
# compresses its sorted values to k weighted points (value = segment
# median, weight = segment size ⇒ per-block rank error ≤ n_block/(2k));
# the driver merges the O(blocks × k) points EXACTLY (sort + cumulative
# weight walk, no further compression), so the total rank error is
# ≤ Σ n_i/(2k) = n/(2k).  Deterministic: even segment spacing, no RNG —
# the error on a given input is fixed, which is what lets the registered
# query gate it in-pipeline.
# ---------------------------------------------------------------------------

def quantile_summary_partial(v: np.ndarray, k: int) -> tuple:
    """Compress one block's values to ≤k (value, weight) points with rank
    error ≤ len(v)/(2k)."""
    v = np.sort(v[~np.isnan(v)])
    n = len(v)
    if n == 0:
        return v.astype(np.float64), np.zeros(0, dtype=np.int64)
    if n <= k:
        return v.astype(np.float64), np.ones(n, dtype=np.int64)
    bounds = np.round(np.arange(k + 1) * (n / k)).astype(np.int64)
    w = np.diff(bounds)
    keep = w > 0
    mids = np.minimum(bounds[:-1] + w // 2, n - 1)
    return v[mids[keep]].astype(np.float64), w[keep]


def approx_quantiles(
    ds: rd.Dataset, col: str, qs: List[float], k: int = 256
) -> tuple:
    """Approximate ``quantile_disc`` values (rank = ceil(q·n), 1-indexed)
    from per-block summaries.  Returns ``(estimates, n, max_rank_error)``
    where ``max_rank_error = ceil(n/(2k))`` is the deterministic bound the
    caller can gate against.  One bounded row (≤k doubles + ≤k ints) per
    block reaches the driver — no shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        arr = (c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
        v = np.asarray(pc.drop_null(arr).to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        vals, w = quantile_summary_partial(v, k)
        return pa.table({
            "vals": pa.array([vals.tolist()], pa.list_(pa.float64())),
            "weights": pa.array([w.tolist()], pa.list_(pa.int64())),
        })

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow").take_all()
    vals = np.concatenate([np.asarray(r["vals"], dtype=np.float64)
                           for r in rows]) if rows else np.zeros(0)
    wts = np.concatenate([np.asarray(r["weights"], dtype=np.int64)
                          for r in rows]) if rows else np.zeros(0, np.int64)
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    n = int(cum[-1]) if len(cum) else 0
    ests = []
    for q in qs:
        target = max(1, math.ceil(q * n))
        i = int(np.searchsorted(cum, target))
        ests.append(float(vals[min(i, len(vals) - 1)]) if n else float("nan"))
    return ests, n, math.ceil(n / (2 * k)) if n else 0
