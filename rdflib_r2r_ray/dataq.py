"""Training-data-pipeline query registry: deduplication, similarity search,
text analysis, multimodal plumbing (the large-scale data-curation operator
family, first-class alongside the KG/relational surface).

Queries with a DuckDB-expressible semantics carry an oracle; the rest
(minhash/simhash/langid/fingerprint/ANN-approx/multimodal) are registered
rows-only and verified in pytest against brute-force Python oracles.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .stages import ann as A
from .stages import dedup as D
from .stages import multimodal as MM
from .stages import text as T

DUP_OFFSET = 10_000_000


def _read(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _docs(sf_dir: str) -> rd.Dataset:
    return _read(sf_dir, "documents", columns=["doc_id", "text"])


def plant_exact_dups(batch: pa.Table) -> pa.Table:
    """Append an exact copy of every doc at doc_id+DUP_OFFSET — the dedup
    corpus used by dd_* queries (the base table has no duplicate texts)."""
    copy = batch.set_column(
        batch.column_names.index("doc_id"),
        "doc_id",
        pc.add(batch["doc_id"], pa.scalar(DUP_OFFSET, pa.int64())),
    )
    return pa.concat_tables([batch, copy])


def plant_near_dups(batch: pa.Table) -> pa.Table:
    """Append a NEAR-copy (one appended token) of every doc at
    doc_id+DUP_OFFSET: high-Jaccard pairs for minhash/simhash recall."""
    texts = [None if t is None else t + " zzztail" for t in batch["text"].to_pylist()]
    copy = pa.table(
        {
            "doc_id": pc.add(batch["doc_id"], pa.scalar(DUP_OFFSET, pa.int64())),
            "text": pa.array(texts, pa.string()),
        }
    ).select(batch.column_names)
    return pa.concat_tables([batch, copy])


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def q_dd_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup (hash-partition + per-group min id) over a corpus with
    planted exact duplicates; returns the keeper doc_ids."""
    ds = _docs(sf_dir).map_batches(plant_exact_dups, batch_format="pyarrow")
    return D.exact_dedup_documents(ds).select_columns(["doc_id"])


SQL_DD_EXACT = f"""
SELECT MIN(doc_id) AS doc_id FROM (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM documents
) GROUP BY text
"""


def q_dd_minhash_lsh(sf_dir: str) -> rd.Dataset:
    """MinHash+LSH near-dup candidates (shingle → minhash → band → bucket
    groupby) over a corpus with planted near-duplicates. Non-SQL; recall vs
    brute-force Jaccard is asserted in tests."""
    ds = _docs(sf_dir).map_batches(plant_near_dups, batch_format="pyarrow")
    return D.minhash_lsh_candidates(ds)


def q_dd_ngram_jaccard(sf_dir: str) -> rd.Dataset:
    """LSH candidates verified by true n-gram Jaccard ≥ 0.8: candidates are
    joined back to their texts via two broadcast lookups, then filtered —
    the standard candidate→verify near-dup pipeline."""
    import ray

    ds = _docs(sf_dir).map_batches(plant_near_dups, batch_format="pyarrow")
    cand = D.minhash_lsh_candidates(ds)
    texts = {}
    for t in ray.get(ds.to_arrow_refs()):
        texts.update(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    text_ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(text_ref)
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        jac = [D.ngram_jaccard(lookup.get(x) or "", lookup.get(y) or "") for x, y in zip(a, b)]
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], pa.scalar(0.8))).select(["id_a", "id_b"])

    return cand.map_batches(verify, batch_format="pyarrow")


def q_dd_simhash(sf_dir: str) -> rd.Dataset:
    """SimHash-64 per document (deterministic; near-dup = small Hamming
    distance, asserted in tests on planted pairs)."""
    return _docs(sf_dir).map_batches(
        D.SimHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )


def q_dd_embedding_neardup(sf_dir: str) -> rd.Dataset:
    """Exact embedding-cosine near-dup pairs (threshold 0.35): block ×
    broadcast matmul; DuckDB list_cosine_similarity oracle."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return A.embedding_near_dup_exact(ds, threshold=0.35)


SQL_DD_EMB_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
"""


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _query_vectors(sf_dir: str, n: int = 3) -> pa.Table:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    head = t.sort_by("vec_id").slice(0, n)
    return pa.table({"query_id": head["vec_id"], "embedding": head["embedding"]})


def q_ann_topk(sf_dir: str) -> rd.Dataset:
    """Brute-force cosine top-10 for 3 query vectors (numpy matmul per batch
    against the broadcast query matrix; partial top-k per block)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return A.brute_force_topk(ds, _query_vectors(sf_dir), k=10)


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings ORDER BY vec_id LIMIT 3),
sims AS (
  SELECT q.query_id, x.vec_id,
    list_cosine_similarity(q.embedding, x.embedding) AS sim
  FROM q JOIN embeddings x ON x.vec_id != q.query_id
)
SELECT query_id, vec_id,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
FROM sims
QUALIFY rank <= 10
"""


def q_ann_topk_ivf(sf_dir: str) -> rd.Dataset:
    """IVF approximate top-10 (coarse centroids + nprobe inverted lists —
    the second scale path besides LSH; recall asserted in tests)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return A.ivf_topk(ds, _query_vectors(sf_dir), k=10, n_centroids=16, nprobe=6)


def q_ann_topk_lsh(sf_dir: str) -> rd.Dataset:
    """LSH-bucketed approximate top-10 (scale path; recall vs brute force is
    asserted in tests)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return A.lsh_bucketed_topk(ds, _query_vectors(sf_dir), k=10, planes=8, max_hamming=2, tables=4)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_stats(sf_dir: str) -> rd.Dataset:
    """Integer text statistics per doc (token/alpha/digit/space counts)."""
    return _docs(sf_dir).map_batches(T.text_stats, batch_format="pyarrow")


SQL_TEXT_STATS = """
SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
  length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
  length(text) - length(replace(text, ' ', '')) AS n_spaces
FROM documents
"""


def q_text_tokens(sf_dir: str) -> rd.Dataset:
    """Whitespace + BPE-ish (GPT-2 pre-tokenizer regex) token counts via the
    actor-pool TokenCounter."""
    return _docs(sf_dir).map_batches(T.TokenCounter, batch_format="pyarrow", concurrency=(1, 4))


def q_text_quality(sf_dir: str) -> rd.Dataset:
    """Gopher/C4-style quality signals + composite score (deterministic)."""
    return _docs(sf_dir).map_batches(T.QualityScorer, batch_format="pyarrow", concurrency=(1, 4))


def q_text_langid(sf_dir: str) -> rd.Dataset:
    """Stopword-profile + Unicode-block language ID per document."""
    return _docs(sf_dir).map_batches(T.LanguageID, batch_format="pyarrow", concurrency=(1, 4))


def q_text_fingerprint(sf_dir: str) -> rd.Dataset:
    """Rolling-hash + winnowing document fingerprint (content-addressed)."""
    return _docs(sf_dir).map_batches(T.Fingerprinter, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# multimodal plumbing (stubbed codecs, real Ray plumbing)
# ---------------------------------------------------------------------------

def q_mm_image_meta(sf_dir: str) -> rd.Dataset:
    """Binary image column → typed metadata/features via the actor-pool
    decoder (small batch_size: binary payloads are the wide column)."""
    ds = _docs(sf_dir).map_batches(MM.synthesize_payloads, batch_format="pyarrow")
    return ds.map_batches(
        MM.ImageDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


def q_mm_audio_frames(sf_dir: str) -> rd.Dataset:
    """Binary audio column → frame-sampled RMS features (hop=1024)."""

    def synth_audio(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            n = 2048 + (i % 7) * 512
            t = np.arange(n, dtype=np.float64)
            pcm = (np.sin(t * (0.01 + (i % 13) * 0.001)) * 8191).astype(np.int16)
            payloads.append(MM.pack_payload("aud", 16000, 1, n, pcm.tobytes()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "payload": pa.array(payloads, pa.binary())})

    ds = _docs(sf_dir).map_batches(synth_audio, batch_format="pyarrow")
    return ds.map_batches(
        MM.AudioFrameSampler, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


def queries() -> Dict[str, Callable[[str], rd.Dataset]]:
    return {
        "dd_exact": q_dd_exact,
        "dd_minhash_lsh": q_dd_minhash_lsh,
        "dd_ngram_jaccard": q_dd_ngram_jaccard,
        "dd_simhash": q_dd_simhash,
        "dd_embedding_neardup": q_dd_embedding_neardup,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "text_stats": q_text_stats,
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "mm_image_meta": q_mm_image_meta,
        "mm_audio_frames": q_mm_audio_frames,
    }


def oracle_sql() -> Dict[str, str]:
    # only the SQL-expressible subset; the rest are rows-only by design
    return {
        "dd_exact": SQL_DD_EXACT,
        "dd_embedding_neardup": SQL_DD_EMB_NEARDUP,
        "ann_topk": SQL_ANN_TOPK,
        "text_stats": SQL_TEXT_STATS,
    }
