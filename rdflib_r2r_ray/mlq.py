"""Model-training / rule-mining query registry: the supervised-classifier,
KG-rule-discovery and corpus-reputation operators a training-data pipeline
layers on top of the curation surface (``dataq.py``).

Every query carries a DuckDB oracle.  Iterative / statistical operators are
made oracle-able the same way the graph family is (``dataq.py`` PageRank /
HITS): all decision-making arithmetic is **fixed-point integer** — log
probabilities quantized to 1e-6 (``_fxlog``), confidences in permille with
floor division — so argmax/threshold decisions are bit-exact against the
SQL replay, and the only floats ever compared are none at all.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .stages import text as T
from .stages.ann import _to_matrix


def _read(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# ml_nb_classify — multinomial Naive Bayes (train + score in one pipeline)
# ---------------------------------------------------------------------------

NB_VOCAB_CAP = 4096  # top-N tokens by corpus count (ties: token asc)
NB_SCALE = 1_000_000  # fixed-point log scale


def _fxlog(num, den) -> np.ndarray:
    """floor(1e6·ln(num/den) + 0.5) as int64 — the fixed-point log weight.

    ``floor(x + 0.5)`` (NOT banker's ``round``) so numpy and DuckDB agree;
    num/den are exact small integers, so the double division is identical
    on both sides and only a last-ulp ``ln`` difference could flip a
    weight — a ~1e-10 event per table entry."""
    x = np.asarray(num, np.float64) / np.asarray(den, np.float64)
    return np.floor(NB_SCALE * np.log(x) + 0.5).astype(np.int64)


_NB_STATS_SCHEMA = pa.schema(
    [("lang", pa.string()), ("tok", pa.string()), ("c", pa.int64())]
)


def q_ml_nb_classify(sf_dir: str) -> rd.Dataset:
    """Multinomial Naive Bayes language classifier, trained and applied in
    one distributed pipeline (the fasttext-style quality/domain-classifier
    shape every curation stack carries — cf. CCNet / Gopher filtering):

    - **split**: train = ``doc_id % 5 != 0``, test = the rest;
    - **train**: ONE pass over the train split — a per-block polars
      combiner emits local (lang, token) counts plus a class-count carrier
      row (``tok=''``, impossible as a real token), merged by the grouped
      exchange; vocabulary is capped to the ``NB_VOCAB_CAP`` most frequent
      tokens IN-PIPELINE (count desc, token asc) so the driver-side model
      is bounded at any corpus scale;
    - **model**: add-1-smoothed log P(token|class) and log prior, both
      fixed-point int64 (``_fxlog``) — scoring is pure integer addition,
      so argmax decisions replay bit-exact in SQL;
    - **score**: weights broadcast once (``ray.put``); each test batch is
      one polars explode → join → grouped-sum, then an integer argmax
      (ties → lexicographically smallest class, numpy ``argmax`` = first).

    Output: (doc_id, pred_lang, score) for every test doc with ≥1 token.
    """
    import ray

    from .relational import grouped_agg, topk
    from .stages.dedup import _pl

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def train_counts(b: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(b).filter(pl.col("doc_id") % 5 != 0)
        toks = (
            df.select("lang", pl.col("text").str.split(" ").alias("tok"))
            .explode("tok")
            .filter(pl.col("tok") != "")
            .group_by("lang", "tok")
            .len(name="c")
            .select("lang", "tok", pl.col("c").cast(pl.Int64))
        )
        dc = (
            df.group_by("lang")
            .len(name="c")
            .select("lang", pl.lit("").alias("tok"), pl.col("c").cast(pl.Int64))
        )
        return pl.concat([toks, dc]).to_arrow().cast(_NB_STATS_SCHEMA)

    stats = grouped_agg(
        docs.map_batches(train_counts, batch_format="pyarrow"),
        ["lang", "tok"], sums=["c"], in_schema=_NB_STATS_SCHEMA,
    ).materialize()  # reused: vocab cap + model rows (bounded: vocab×classes)

    def drop_carrier(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["tok"], ""))

    tok_tot = grouped_agg(
        stats.map_batches(drop_carrier, batch_format="pyarrow"),
        ["tok"], sums=["c"], in_schema=pa.schema([("tok", pa.string()),
                                                  ("c", pa.int64())]),
    )
    kept_rows = topk(tok_tot, ["c", "tok"], NB_VOCAB_CAP,
                     descending=[True, False]).take_all()
    kept = {r["tok"] for r in kept_rows}

    rows = stats.take_all()  # ≤ cap×classes + classes rows
    classes = sorted({r["lang"] for r in rows})
    cidx = {c: i for i, c in enumerate(classes)}
    vocab = sorted(kept)
    vidx = {t: i for i, t in enumerate(vocab)}
    V, C = len(vocab), len(classes)
    cnt = np.zeros((V, C), np.int64)
    ndocs = np.zeros(C, np.int64)
    for r in rows:
        if r["tok"] == "":
            ndocs[cidx[r["lang"]]] = r["c"]
        elif r["tok"] in vidx:
            cnt[vidx[r["tok"]], cidx[r["lang"]]] = r["c"]
    tot = cnt.sum(axis=0)  # kept-vocab token total per class
    W = _fxlog(cnt + 1, (tot + V)[None, :])  # (V, C)
    unk = _fxlog(np.ones(C, np.int64), tot + V)
    prior = _fxlog(ndocs, int(ndocs.sum()))

    wcols = {"tok": pa.array(vocab, pa.string())}
    for i in range(C):
        wcols[f"w{i}"] = pa.array(W[:, i], pa.int64())
    ref = ray.put((pa.table(wcols), unk, prior, classes))

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("pred_lang", pa.string()),
                            ("score", pa.int64())])

    def score(b: pa.Table, _r=ref) -> pa.Table:
        pl = _pl()
        wt, unk_v, prior_v, cls = ray.get(_r)
        nc = len(cls)
        df = pl.from_arrow(b).filter(pl.col("doc_id") % 5 == 0)
        t = (
            df.select("doc_id", pl.col("text").str.split(" ").alias("tok"))
            .explode("tok")
            .filter(pl.col("tok") != "")
        )
        if t.height == 0:
            return out_schema.empty_table()
        j = t.join(pl.from_arrow(wt), on="tok", how="left").with_columns(
            [pl.col(f"w{i}").fill_null(int(unk_v[i])) for i in range(nc)]
        )
        g = j.group_by("doc_id").agg(
            [pl.col(f"w{i}").sum() for i in range(nc)]
        ).sort("doc_id")
        S = g.select([f"w{i}" for i in range(nc)]).to_numpy().astype(np.int64)
        S = S + prior_v[None, :]
        pred = S.argmax(axis=1)  # first max = lexicographically least class
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64)),
            "pred_lang": pa.array(np.asarray(cls, object)[pred].tolist(),
                                  pa.string()),
            "score": pa.array(S[np.arange(len(S)), pred], pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


SQL_ML_NB_CLASSIFY = f"""
WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 != 0),
toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
  FROM train),
cnt AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
vocab AS (
  SELECT tok FROM (
    SELECT tok, SUM(c) AS tc FROM cnt GROUP BY tok
    ORDER BY tc DESC, tok LIMIT {NB_VOCAB_CAP})),
kcnt AS (SELECT c.* FROM cnt c JOIN vocab v USING (tok)),
cls AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nd FROM train GROUP BY 1),
tot AS (
  SELECT cls.lang, COALESCE(k.t, 0) AS t
  FROM cls LEFT JOIN (SELECT lang, SUM(c) AS t FROM kcnt GROUP BY 1) k
  USING (lang)),
vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
w AS (
  SELECT k.lang, k.tok,
    CAST(floor({NB_SCALE} * ln(CAST(k.c + 1 AS DOUBLE) / (tot.t + vs.v)) + 0.5)
         AS BIGINT) AS w
  FROM kcnt k JOIN tot USING (lang) CROSS JOIN vs),
unk AS (
  SELECT tot.lang,
    CAST(floor({NB_SCALE} * ln(1.0 / (tot.t + vs.v)) + 0.5) AS BIGINT) AS w
  FROM tot CROSS JOIN vs),
prior AS (
  SELECT cls.lang,
    CAST(floor({NB_SCALE} * ln(CAST(cls.nd AS DOUBLE)
                               / (SELECT COUNT(*) FROM train)) + 0.5)
         AS BIGINT) AS p
  FROM cls),
test AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
ttok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
  FROM test),
sc AS (
  SELECT tt.doc_id, u.lang, SUM(COALESCE(w.w, u.w)) + MIN(p.p) AS score
  FROM ttok tt
  CROSS JOIN unk u
  LEFT JOIN w ON w.lang = u.lang AND w.tok = tt.tok
  JOIN prior p ON p.lang = u.lang
  GROUP BY 1, 2)
SELECT doc_id, lang AS pred_lang, CAST(score AS BIGINT) AS score FROM (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM sc) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# kg_amie_rules — AMIE-style horn-rule mining over the constructed KG
# ---------------------------------------------------------------------------

_P_RAW = "<http://kg.ex/p/mentions_raw>"
_P_SAME = "<http://kg.ex/p/sameAs>"


def _variant_triples(m: rd.Dataset):
    """(raw-mention triples over variant IRIs, sameAs chain edges) — the
    same deterministic e/e2/e3 diversion protocol as ``kg_owl_sameas``
    (slug-length mod 3; e3→e2→e1 chains), emitted here as first-class
    predicates so the rule miner has something to discover."""
    from .stages.dedup import _pl, distinct_on

    def divert(b: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(b)
        slug = pl.col("obj").str.slice(16, pl.col("obj").str.len_chars() - 17)
        k = slug.str.len_chars().cast(pl.Int64) % 3
        obj = (pl.when(k == 1)
               .then(pl.lit("<http://kg.ex/e2/") + slug + pl.lit(">"))
               .when(k == 2)
               .then(pl.lit("<http://kg.ex/e3/") + slug + pl.lit(">"))
               .otherwise(pl.col("obj")))
        return df.select(
            pl.col("subj"), pl.lit(_P_RAW).alias("pred"), obj.alias("obj")
        ).to_arrow().cast(pa.schema([("subj", pa.string()),
                                     ("pred", pa.string()),
                                     ("obj", pa.string())]))

    def sameas_edges(b: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(b)
        slug = pl.col("obj").str.slice(16, pl.col("obj").str.len_chars() - 17)
        df = df.with_columns(s=slug,
                             k=slug.str.len_chars().cast(pl.Int64) % 3)
        e1 = pl.lit("<http://kg.ex/e/") + pl.col("s") + pl.lit(">")
        e2 = pl.lit("<http://kg.ex/e2/") + pl.col("s") + pl.lit(">")
        e3 = pl.lit("<http://kg.ex/e3/") + pl.col("s") + pl.lit(">")
        p = pl.lit(_P_SAME).alias("pred")
        lo = df.filter(pl.col("k") == 1).select(subj=e2, pred=p, obj=e1)
        hi = df.filter(pl.col("k") == 2)
        out = pl.concat([lo, hi.select(subj=e3, pred=p, obj=e2),
                         hi.select(subj=e2, pred=p, obj=e1)])
        return out.to_arrow().cast(pa.schema([("subj", pa.string()),
                                              ("pred", pa.string()),
                                              ("obj", pa.string())]))

    raw = m.map_batches(divert, batch_format="pyarrow")
    ents = distinct_on(m.select_columns(["obj"]), ["obj"])
    same = ents.map_batches(sameas_edges, batch_format="pyarrow")
    return raw, same


# Left-side frequency at which a body-join key counts as a hub and is
# broadcast-joined instead of exchanged.  Set to the measured comfortable
# exchange-partition size (~500k rows — see BASELINE.md perf findings): a
# key only needs special handling when its row set would overload ONE
# reduce partition, so below this the plain planned join is the better
# plan.  Tests lower it to force the hot path.
AMIE_HOT_KEY_COUNT = 500_000


def q_kg_amie_rules(sf_dir: str) -> rd.Dataset:
    """AMIE-style rule mining (Galárraga et al. 2013) over the constructed
    KG: score every length-2 closed horn rule p1(x,z) ∧ p2(z,y) ⇒ p3(x,y)
    by support, PCA-free standard confidence and head coverage.  The input
    graph carries raw mentions over variant IRIs, their sameAs chains and
    the canonicalized mentions, so the miner must *discover* that
    ``mentions_raw ∘ sameAs ⇒ mentions`` holds with high confidence while
    e.g. ``sameAs ∘ sameAs ⇒ sameAs`` has support but near-zero confidence
    (the chains are not transitive-closed).

    All-distributed: body instantiation is ONE self-join of the triple
    Dataset on z — routed through ``relational.skew_join`` because a hub
    entity in a power-law KG would serialize its whole row set through a
    single exchange bucket (keys whose left frequency reaches
    ``AMIE_HOT_KEY_COUNT`` join by broadcast instead; with no hub the
    planner degrades to the plain hash join) — deduplicated to distinct
    (p1,p2,x,y) bindings; the head check is a second join; per-rule
    counters are grouped-agg exchanges whose outputs are O(|predicates|³)
    — only those tiny aggregates ever reach the driver.
    Confidence/head-coverage are integer permille (floor), so the whole
    miner replays bit-exact in SQL."""
    from . import driver_api
    from .relational import grouped_agg, planned_join, skew_join
    from .stages.dedup import distinct_on

    m = driver_api.q_kg_mentions(sf_dir)
    m = m.materialize()  # reused three times (raw / sameAs / canonical)
    raw, same = _variant_triples(m)
    t = m.union(raw).union(same).materialize()  # reused: body join + head join

    left = t.map_batches(
        lambda b: pa.table({"x": b["subj"], "p1": b["pred"], "z": b["obj"]}),
        batch_format="pyarrow")
    right = t.map_batches(
        lambda b: pa.table({"z": b["subj"], "p2": b["pred"], "y": b["obj"]}),
        batch_format="pyarrow")
    body = skew_join(left, right, on=["z"], hot_count=AMIE_HOT_KEY_COUNT)
    bd = distinct_on(body, ["p1", "p2", "x", "y"])

    bp = grouped_agg(bd, ["p1", "p2"], count_as="body_pairs").take_all()
    head = t.map_batches(
        lambda b: pa.table({"hx": b["subj"], "p3": b["pred"], "hy": b["obj"]}),
        batch_format="pyarrow")
    sup = grouped_agg(
        planned_join(bd, head, on=["x", "y"], right_on=["hx", "hy"]),
        ["p1", "p2", "p3"], count_as="support",
    ).take_all()
    hp = grouped_agg(t, ["pred"], count_as="head_pairs").take_all()

    smap = {(r["p1"], r["p2"], r["p3"]): r["support"] for r in sup}
    out = {k: [] for k in ("p1", "p2", "p3", "body_pairs", "support",
                           "conf_permille", "hc_permille")}
    for b in sorted(bp, key=lambda r: (r["p1"], r["p2"])):
        for h in sorted(hp, key=lambda r: r["pred"]):
            s = smap.get((b["p1"], b["p2"], h["pred"]), 0)
            out["p1"].append(b["p1"])
            out["p2"].append(b["p2"])
            out["p3"].append(h["pred"])
            out["body_pairs"].append(b["body_pairs"])
            out["support"].append(s)
            out["conf_permille"].append(s * 1000 // b["body_pairs"])
            out["hc_permille"].append(s * 1000 // h["head_pairs"])
    return rd.from_arrow(pa.table({
        "p1": pa.array(out["p1"], pa.string()),
        "p2": pa.array(out["p2"], pa.string()),
        "p3": pa.array(out["p3"], pa.string()),
        "body_pairs": pa.array(out["body_pairs"], pa.int64()),
        "support": pa.array(out["support"], pa.int64()),
        "conf_permille": pa.array(out["conf_permille"], pa.int64()),
        "hc_permille": pa.array(out["hc_permille"], pa.int64()),
    }))


def _sql_kg_amie_rules() -> str:
    from .driver_api import _sql_kg_mentions

    return f"""
WITH m AS ({_sql_kg_mentions()}),
ds AS (
  SELECT subj, pred, obj,
         substr(obj, 17, length(obj) - 17) AS slug,
         length(substr(obj, 17, length(obj) - 17)) % 3 AS k
  FROM m),
raw AS (
  SELECT subj, '{_P_RAW}' AS pred,
    CASE k WHEN 1 THEN '<http://kg.ex/e2/' || slug || '>'
           WHEN 2 THEN '<http://kg.ex/e3/' || slug || '>'
           ELSE obj END AS obj
  FROM ds),
ents AS (SELECT DISTINCT obj, slug, k FROM ds),
same AS (
  SELECT '<http://kg.ex/e2/' || slug || '>' AS subj, '{_P_SAME}' AS pred,
         obj FROM ents WHERE k = 1
  UNION ALL
  SELECT '<http://kg.ex/e3/' || slug || '>', '{_P_SAME}',
         '<http://kg.ex/e2/' || slug || '>' FROM ents WHERE k = 2
  UNION ALL
  SELECT '<http://kg.ex/e2/' || slug || '>', '{_P_SAME}', obj
  FROM ents WHERE k = 2),
t AS (SELECT subj, pred, obj FROM m
      UNION ALL SELECT subj, pred, obj FROM raw
      UNION ALL SELECT subj, pred, obj FROM same),
bd AS (
  SELECT DISTINCT a.pred AS p1, b.pred AS p2, a.subj AS x, b.obj AS y
  FROM t a JOIN t b ON a.obj = b.subj),
bp AS (SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS body_pairs
       FROM bd GROUP BY 1, 2),
hp AS (SELECT pred AS p3, CAST(COUNT(*) AS BIGINT) AS head_pairs
       FROM t GROUP BY 1),
sp AS (
  SELECT bd.p1, bd.p2, h.pred AS p3, CAST(COUNT(*) AS BIGINT) AS support
  FROM bd JOIN t h ON h.subj = bd.x AND h.obj = bd.y
  GROUP BY 1, 2, 3)
SELECT bp.p1, bp.p2, hp.p3, bp.body_pairs,
  COALESCE(sp.support, 0) AS support,
  COALESCE(sp.support, 0) * 1000 // bp.body_pairs AS conf_permille,
  COALESCE(sp.support, 0) * 1000 // hp.head_pairs AS hc_permille
FROM bp CROSS JOIN hp
LEFT JOIN sp ON sp.p1 = bp.p1 AND sp.p2 = bp.p2 AND sp.p3 = hp.p3
"""


# ---------------------------------------------------------------------------
# text_source_filter — C4/RefinedWeb-style domain (source) reputation gate
# ---------------------------------------------------------------------------

def q_text_source_filter(sf_dir: str) -> rd.Dataset:
    """Source-level reputation filtering (the domain-blocklist step of
    C4/RefinedWeb): aggregate the integer Gopher quality score per source
    (ONE scoring pass + a tiny grouped exchange — O(sources) rows move),
    block every source whose mean quality is strictly below the corpus
    mean (compared as exact integer cross-products, no float division),
    and keep only documents from surviving sources.  The blocklist is
    broadcast once; the keep pass streams."""
    import ray

    from .relational import grouped_agg

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    scorer = T.QualityScorer()

    def score_rows(b: pa.Table, _s=scorer) -> pa.Table:
        sc = _s(b.select(["doc_id", "text"]))  # row-aligned with b
        return pa.table({"source": b["source"],
                         "q": pc.cast(sc["quality_score"], pa.int64())})

    rep = grouped_agg(
        docs.map_batches(score_rows, batch_format="pyarrow"),
        ["source"], sums=["q"], count_as="n",
        in_schema=pa.schema([("source", pa.string()), ("q", pa.int64())]),
    ).take_all()  # O(distinct sources)
    tot_q = sum(r["q"] for r in rep)
    tot_n = sum(r["n"] for r in rep)
    blocked = {r["source"] for r in rep if r["q"] * tot_n < tot_q * r["n"]}
    bref = ray.put(blocked)

    def keep(b: pa.Table, _r=bref) -> pa.Table:
        bl = ray.get(_r)
        mask = pc.invert(pc.is_in(b["source"],
                                  pa.array(sorted(bl), pa.string())))
        out = b.filter(mask)
        return pa.table({"doc_id": out["doc_id"], "source": out["source"]})

    return _read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        keep, batch_format="pyarrow")


def _sql_text_source_filter() -> str:
    from .dataq import SQL_TEXT_QUALITY

    return f"""
WITH q AS ({SQL_TEXT_QUALITY}),
src AS (SELECT doc_id, source FROM documents),
sc AS (SELECT src.source, q.quality_score AS qs
       FROM q JOIN src ON q.doc_id = src.doc_id),
rep AS (SELECT source, CAST(SUM(qs) AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS n
        FROM sc GROUP BY 1),
tot AS (SELECT CAST(SUM(q) AS BIGINT) AS tq, CAST(SUM(n) AS BIGINT) AS tn FROM rep),
blocked AS (SELECT source FROM rep, tot WHERE rep.q * tot.tn < tot.tq * rep.n)
SELECT d.doc_id, d.source FROM documents d
WHERE d.source NOT IN (SELECT source FROM blocked)
"""


# ---------------------------------------------------------------------------
# ml_prototype_prune — cluster-based hard-example data pruning
# ---------------------------------------------------------------------------

PRUNE_KEEP = 20


def q_ml_prototype_prune(sf_dir: str) -> rd.Dataset:
    """Prototypicality-based data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): cluster the embeddings with the same
    distributed k-means as ``dd_semantic`` (k=4, 2 Lloyd iterations, the
    SSL-prototypes protocol), score every vector by cosine similarity to
    its centroid, and keep the ``PRUNE_KEEP`` HARDEST (least prototypical)
    examples per cluster — the keep-hard regime that beats random pruning
    on large corpora.  Scoring is one broadcast-centroid matmul per batch
    (streams); selection is ``grouped_topk``'s combiner + exchange, so at
    most k rows per (cluster, block) ever move.  Scores are half-up
    permille integers, ranked with a vec_id tiebreak — deterministic and
    SQL-replayable (float64 on both sides; the only float surface is the
    last-ulp of the cosine, shared with the dd_semantic oracle)."""
    import ray

    from .relational import grouped_topk
    from .stages import ann as A

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = A.kmeans_distributed(ds, k=4, iters=2)
    ref = ray.put(cent)

    def assign_sim(b: pa.Table, _r=ref) -> pa.Table:
        c = ray.get(_r)
        m = A._to_matrix(b["embedding"])
        sims = A._unit(m) @ A._unit(c).T
        a = sims.argmax(axis=1)  # ties → lowest cluster (numpy argmax)
        s = sims[np.arange(len(a)), a]
        sp = np.floor(1000.0 * s + 0.5).astype(np.int64)
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster": pa.array(a.astype(np.int32), pa.int32()),
            "spermille": pa.array(sp, pa.int64()),
        })

    assigned = ds.map_batches(assign_sim, batch_format="pyarrow")
    return grouped_topk(assigned, ["cluster"],
                        [("spermille", False), ("vec_id", False)],
                        PRUNE_KEEP, keep=["vec_id"])


def _sql_ml_prototype_prune() -> str:
    from .dataq import _sql_kmeans_cte

    return f"""
WITH {_sql_kmeans_cte()},
sp AS (
  SELECT a.vec_id, CAST(a.c AS INTEGER) AS cluster,
    CAST(floor(1000.0 * list_cosine_similarity(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           i.embedding) + 0.5) AS BIGINT) AS spermille
  FROM a2 a JOIN c2 i ON i.c = a.c)
SELECT cluster, spermille, vec_id FROM (
  SELECT cluster, spermille, vec_id,
    row_number() OVER (PARTITION BY cluster
                       ORDER BY spermille, vec_id) AS rn
  FROM sp) WHERE rn <= {PRUNE_KEEP}
"""


# ---------------------------------------------------------------------------
# ml_knn_classify — k-NN label-propagation accuracy over the embeddings
# ---------------------------------------------------------------------------

KNN_CLS_MOD, KNN_CLS_K = 17, 5


def q_ml_knn_classify(sf_dir: str) -> rd.Dataset:
    """k-NN CLASSIFIER audit (the standard representation-quality probe —
    kNN accuracy over frozen embeddings, à la the SimCLR/DINO linear/knn
    eval): every ``vec_id ≡ 0 (mod {MOD})`` vector is held out as a query,
    the rest are the labeled train corpus, and each query takes the
    majority label of its 5 nearest train neighbours by cosine (ties →
    smallest label).  ``stages/ann.knn_classify``: broadcast query matrix,
    one matmul + local top-k per train block, per-query reduce over
    O(blocks × k) rows.  Output keeps the vote margin and a correctness
    flag per query so one flipped neighbour ranking fails the gate."""
    import pyarrow.parquet as pq

    panel = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    ids = np.asarray(panel["vec_id"].to_pylist(), dtype=np.int64)
    sel = ids % KNN_CLS_MOD == 0
    q = panel.filter(pa.array(sel)).rename_columns(
        ["query_id", "embedding", "label"])
    truth = {int(r["query_id"]): int(r["label"]) for r in q.to_pylist()}

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def train_only(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(v % KNN_CLS_MOD != 0))

    from .stages import ann as A

    pred = A.knn_classify(ds.map_batches(train_only, batch_format="pyarrow"),
                          q, k=KNN_CLS_K)

    def attach_truth(b: pa.Table) -> pa.Table:
        tl = pa.array([truth[int(x)] for x in b["query_id"].to_pylist()],
                      pa.int32())
        return pa.table({
            "vec_id": pc.cast(b["query_id"], pa.int64()),
            "pred_label": b["pred_label"],
            "true_label": tl,
            "n_votes": b["n_votes"],
            "correct": pc.equal(b["pred_label"], tl),
        })

    return pred.map_batches(attach_truth, batch_format="pyarrow")


SQL_ML_KNN_CLASSIFY = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qlab
           FROM embeddings WHERE vec_id % {KNN_CLS_MOD} = 0),
tr AS (SELECT vec_id, embedding, label FROM embeddings
       WHERE vec_id % {KNN_CLS_MOD} <> 0),
sims AS (
  SELECT q.qid, q.qlab, tr.vec_id, tr.label,
    CAST(floor(1000.0 * list_cosine_similarity(
      list_transform(tr.embedding, x -> CAST(x AS DOUBLE)),
      list_transform(q.qe, x -> CAST(x AS DOUBLE))) + 0.5) AS BIGINT) AS s
  FROM q CROSS JOIN tr),
top AS (SELECT qid, qlab, label FROM (
  SELECT qid, qlab, label,
    row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
  FROM sims) WHERE rn <= {KNN_CLS_K}),
vote AS (SELECT qid, qlab, label, COUNT(*) AS c
         FROM top GROUP BY qid, qlab, label),
pred AS (SELECT qid, qlab, label AS pred_label, c FROM (
  SELECT qid, qlab, label, c,
    row_number() OVER (PARTITION BY qid ORDER BY c DESC, label) AS rn
  FROM vote) WHERE rn = 1)
SELECT qid AS vec_id, CAST(pred_label AS INTEGER) AS pred_label,
       CAST(qlab AS INTEGER) AS true_label, CAST(c AS BIGINT) AS n_votes,
       pred_label = qlab AS correct
FROM pred
"""


# ---------------------------------------------------------------------------
# ml_silhouette — cluster-quality audit (centroid-simplified silhouette)
# ---------------------------------------------------------------------------

def q_ml_silhouette(sf_dir: str) -> rd.Dataset:
    """Per-vector SIMPLIFIED SILHOUETTE (Hruschka et al. 2004 — the
    centroid form of Rousseeuw's silhouette that large-scale libraries
    ship, because the exact coefficient needs all O(V²) pairwise
    distances): cluster with the shared distributed k-means (k=4, 2 Lloyd
    iterations — the ``dd_semantic`` protocol), then per vector a = cosine
    distance to OWN centroid, b = distance to the NEAREST OTHER centroid,
    s = (b-a)/max(a,b).  One broadcast-centroid matmul per batch (streams,
    no shuffle at all after training).  Similarities are half-up permille
    integers and s is scaled-integer division — the assignment makes
    a ≤ b, so the numerator is non-negative and ``//`` agrees between
    numpy and SQL.  Per-vector rows (not just means) so a single flipped
    assignment fails the gate."""
    import ray

    from .stages import ann as A

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = A.kmeans_distributed(ds, k=4, iters=2)
    ref = ray.put(cent)

    def score(b: pa.Table, _r=ref) -> pa.Table:
        c = ray.get(_r)
        m = _to_matrix(b["embedding"])
        sims = A._unit(m) @ A._unit(c).T
        a = sims.argmax(axis=1)  # ties → lowest cluster (numpy argmax)
        rows = np.arange(len(a))
        s_own = sims[rows, a]
        rest = sims.copy()
        rest[rows, a] = -np.inf
        s_oth = rest.max(axis=1)
        spo = np.floor(1000.0 * s_own + 0.5).astype(np.int64)
        spt = np.floor(1000.0 * s_oth + 0.5).astype(np.int64)
        silh = (spo - spt) * 1000 // np.maximum(1000 - spt, 1)
        return pa.table({
            "vec_id": b["vec_id"],
            "cluster": pa.array(a.astype(np.int32), pa.int32()),
            "silh_permille": pa.array(silh, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _sql_ml_silhouette() -> str:
    from .dataq import _sql_kmeans_cte

    return f"""
WITH {_sql_kmeans_cte()},
sims AS (
  SELECT a.vec_id, a.c, i.c AS cc,
    CAST(floor(1000.0 * list_cosine_similarity(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           i.embedding) + 0.5) AS BIGINT) AS sp
  FROM a2 a CROSS JOIN c2 i),
ab AS (
  SELECT vec_id, CAST(c AS INTEGER) AS cluster,
    MAX(CASE WHEN cc = c THEN sp END) AS spo,
    MAX(CASE WHEN cc <> c THEN sp END) AS spt
  FROM sims GROUP BY vec_id, c)
SELECT vec_id, cluster,
  (spo - spt) * 1000 // GREATEST(1000 - spt, 1) AS silh_permille
FROM ab
"""


# ---------------------------------------------------------------------------
# ml_linreg_moments — one-pass closed-form multivariate OLS
# ---------------------------------------------------------------------------

def q_ml_linreg_moments(sf_dir: str) -> rd.Dataset:
    """Two-feature ordinary least squares (n_chars ~ token count + distinct
    token count) in ONE streaming pass: each block emits a single row of
    exact int64 sufficient moments (n, Σx, Σxx, Σxy, Σyy — the classic
    distributed-regression sketch; communication is O(blocks), never
    O(rows)); the driver combines them with arbitrary-precision Python
    ints and solves the 2×2 centered normal equations in closed form.

    Every intermediate the float math sees is an EXACT integer on both
    sides (Python bigint here, HUGEINT in the oracle), and the double
    expressions are written identically, so β/R² agree to the last ulp —
    extends ``rel_regr_slope``'s 1-D protocol to the multivariate case."""
    from .stages.dedup import _pl

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    mom_schema = pa.schema([(c, pa.int64()) for c in
                            ("n", "sx1", "sx2", "sy", "sx11", "sx12",
                             "sx22", "sx1y", "sx2y", "syy")])

    def moments(b: pa.Table) -> pa.Table:
        pl = _pl()
        df = pl.from_arrow(b).select(
            pl.col("text").str.split(" ")
            .list.eval(pl.element().filter(pl.element() != ""))
            .alias("toks"),
            pl.col("n_chars").alias("y"),
        ).with_columns(
            x1=pl.col("toks").list.len().cast(pl.Int64),
            x2=pl.col("toks").list.n_unique().cast(pl.Int64),
        )
        agg = df.select(
            n=pl.len().cast(pl.Int64),
            sx1=pl.col("x1").sum(),
            sx2=pl.col("x2").sum(),
            sy=pl.col("y").sum(),
            sx11=(pl.col("x1") * pl.col("x1")).sum(),
            sx12=(pl.col("x1") * pl.col("x2")).sum(),
            sx22=(pl.col("x2") * pl.col("x2")).sum(),
            sx1y=(pl.col("x1") * pl.col("y")).sum(),
            sx2y=(pl.col("x2") * pl.col("y")).sum(),
            syy=(pl.col("y") * pl.col("y")).sum(),
        )
        return agg.to_arrow().cast(mom_schema)

    rows = docs.map_batches(moments, batch_format="pyarrow").take_all()
    m = {k: sum(int(r[k]) for r in rows if r["n"]) for k in mom_schema.names}
    n = m["n"]
    # n-scaled centered moments — exact bigints (HUGEINT in the oracle)
    a = n * m["sx11"] - m["sx1"] * m["sx1"]
    b = n * m["sx12"] - m["sx1"] * m["sx2"]
    c = n * m["sx22"] - m["sx2"] * m["sx2"]
    d = n * m["sx1y"] - m["sx1"] * m["sy"]
    e = n * m["sx2y"] - m["sx2"] * m["sy"]
    sst = n * m["syy"] - m["sy"] * m["sy"]
    det = a * c - b * b
    beta1 = float(c * d - b * e) / float(det)
    beta2 = float(a * e - b * d) / float(det)
    beta0 = (float(m["sy"]) - beta1 * float(m["sx1"])
             - beta2 * float(m["sx2"])) / float(n)
    r2 = (beta1 * float(d) + beta2 * float(e)) / float(sst)
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "beta0": pa.array([beta0], pa.float64()),
        "beta1": pa.array([beta1], pa.float64()),
        "beta2": pa.array([beta2], pa.float64()),
        "r2": pa.array([r2], pa.float64()),
    }))


SQL_ML_LINREG_MOMENTS = """
WITH f AS (
  SELECT len(list_filter(string_split(text, ' '), t -> t != '')) AS x1,
         len(list_distinct(list_filter(string_split(text, ' '), t -> t != ''))) AS x2,
         n_chars AS y
  FROM documents),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x1) AS HUGEINT) AS sx1, CAST(SUM(x2) AS HUGEINT) AS sx2,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x1 * x1) AS HUGEINT) AS sx11,
         CAST(SUM(x1 * x2) AS HUGEINT) AS sx12,
         CAST(SUM(x2 * x2) AS HUGEINT) AS sx22,
         CAST(SUM(x1 * y) AS HUGEINT) AS sx1y,
         CAST(SUM(x2 * y) AS HUGEINT) AS sx2y,
         CAST(SUM(y * y) AS HUGEINT) AS syy
  FROM f),
cm AS (
  SELECT n, sx1, sx2, sy,
         n * sx11 - sx1 * sx1 AS a, n * sx12 - sx1 * sx2 AS b,
         n * sx22 - sx2 * sx2 AS c, n * sx1y - sx1 * sy AS d,
         n * sx2y - sx2 * sy AS e, n * syy - sy * sy AS sst
  FROM m),
beta AS (
  SELECT n, sx1, sx2, sy, d, e, sst,
         CAST(c * d - b * e AS DOUBLE) / CAST(a * c - b * b AS DOUBLE) AS beta1,
         CAST(a * e - b * d AS DOUBLE) / CAST(a * c - b * b AS DOUBLE) AS beta2
  FROM cm)
SELECT CAST(n AS BIGINT) AS n,
  (CAST(sy AS DOUBLE) - beta1 * CAST(sx1 AS DOUBLE)
   - beta2 * CAST(sx2 AS DOUBLE)) / CAST(n AS DOUBLE) AS beta0,
  beta1, beta2,
  (beta1 * CAST(d AS DOUBLE) + beta2 * CAST(e AS DOUBLE))
    / CAST(sst AS DOUBLE) AS r2
FROM beta
"""


# ---------------------------------------------------------------------------
# shared embedding feature extraction (ml_auc / ml_calibration /
# ml_perceptron)
# ---------------------------------------------------------------------------

FEAT_DIMS = 4  # first-k embedding dims as the linear-model feature panel
FEAT_SCALE = 1000  # milli quantization


def _feat_batch(b: pa.Table) -> pa.Table:
    """(vec_id, q1..q4, y) — per-dim half-up milli quantization of the
    first ``FEAT_DIMS`` embedding dims (float32 → float64 exactly, then
    ``floor(x·1000 + 0.5)``, the shared numpy/DuckDB-deterministic
    protocol of ``_fxlog``) plus the ±1 parity label ``y``."""
    m = _to_matrix(b["embedding"]).astype(np.float64)[:, :FEAT_DIMS]
    q = np.floor(m * float(FEAT_SCALE) + 0.5).astype(np.int64)
    lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = np.where(lab % 2 == 1, 1, -1).astype(np.int64)
    cols = {"vec_id": pc.cast(b["vec_id"], pa.int64())}
    for k in range(FEAT_DIMS):
        cols[f"q{k + 1}"] = pa.array(q[:, k])
    cols["y"] = pa.array(y)
    return pa.table(cols)


_SQL_FEAT = f"""
feat AS (
  SELECT vec_id,
    {", ".join(
        f"CAST(floor(CAST(embedding[{k + 1}] AS DOUBLE) * {FEAT_SCALE}.0"
        f" + 0.5) AS BIGINT) AS q{k + 1}" for k in range(FEAT_DIMS))},
    CASE WHEN label % 2 = 1 THEN 1 ELSE -1 END AS y
  FROM embeddings)"""


def _features(sf_dir: str) -> rd.Dataset:
    return _read(sf_dir, "embeddings",
                 columns=["vec_id", "embedding", "label"]).map_batches(
        _feat_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ml_auc — exact ROC-AUC via the distributed Mann-Whitney rank-sum
# ---------------------------------------------------------------------------

def q_ml_auc(sf_dir: str) -> rd.Dataset:
    """Exact ROC-AUC of a linear scorer (Σ of the quantized feature dims)
    against the parity label — the model-evaluation pass every
    classifier-filtered curation stack runs, at corpus scale: NO global
    sort.  Scores collapse to a (score → count, positives) table via the
    grouped exchange (one row per DISTINCT score, not per example), then
    ONE task computes tie-aware average ranks by cumulative sum and the
    Mann-Whitney statistic — communication O(distinct scores), driver
    holds one row.  All integer (2·rank sums, micro-scaled floor
    division), so the value replays bit-exact in SQL window functions."""
    from .relational import grouped_agg

    def score(b: pa.Table) -> pa.Table:
        s = b[f"q1"].to_numpy(zero_copy_only=False).copy()
        for k in range(2, FEAT_DIMS + 1):
            s += b[f"q{k}"].to_numpy(zero_copy_only=False)
        pos = (b["y"].to_numpy(zero_copy_only=False) == 1).astype(np.int64)
        return pa.table({"score": pa.array(s), "cnt": pa.array(
            np.ones(len(s), np.int64)), "pos": pa.array(pos)})

    g = grouped_agg(
        _features(sf_dir).map_batches(score, batch_format="pyarrow"),
        ["score"], sums=["cnt", "pos"],
        in_schema=pa.schema([("score", pa.int64()), ("cnt", pa.int64()),
                             ("pos", pa.int64())]))

    def mann_whitney(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        o = np.argsort(s, kind="stable")
        cnt = t["cnt"].to_numpy(zero_copy_only=False)[o]
        pos = t["pos"].to_numpy(zero_copy_only=False)[o]
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        # 2·Σ(avg rank of positives): tie group spanning ranks
        # [cum+1, cum+cnt] has average rank cum + (cnt+1)/2.  Python-int
        # fold (object dtype) — rank sums reach n_pos·2N, which wraps
        # int64 at corpus scale while the SQL oracle stays exact.
        r2 = int((pos.astype(object)
                  * (2 * cum.astype(object) + cnt.astype(object) + 1)).sum())
        n_pos, n_neg = int(pos.sum()), int((cnt - pos).sum())
        auc = ((r2 - n_pos * (n_pos + 1)) * 1_000_000
               // (2 * n_pos * n_neg)) if n_pos and n_neg else 0
        return pa.table({"n_pos": pa.array([n_pos], pa.int64()),
                         "n_neg": pa.array([n_neg], pa.int64()),
                         "auc_micros": pa.array([auc], pa.int64())})

    return g.repartition(1).map_batches(
        mann_whitney, batch_format="pyarrow",
        batch_size=None)


SQL_ML_AUC = f"""
WITH {_SQL_FEAT},
sc AS (
  SELECT q1 + q2 + q3 + q4 AS score,
         CASE WHEN y = 1 THEN 1 ELSE 0 END AS pos
  FROM feat),
g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS pos
      FROM sc GROUP BY score),
c AS (
  SELECT score, cnt, pos,
    COALESCE(SUM(cnt) OVER (ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM g),
s AS (SELECT CAST(SUM(pos * (2 * cum + cnt + 1)) AS BIGINT) AS r2,
             CAST(SUM(pos) AS BIGINT) AS np,
             CAST(SUM(cnt - pos) AS BIGINT) AS nn
      FROM c)
SELECT np AS n_pos, nn AS n_neg,
  ((r2 - np * (np + 1)) * 1000000) // (2 * np * nn) AS auc_micros
FROM s
"""


# ---------------------------------------------------------------------------
# ml_calibration — reliability diagram bins
# ---------------------------------------------------------------------------

CALIB_BIN_W = 100  # milli-score units per bin


def q_ml_calibration(sf_dir: str) -> rd.Dataset:
    """Reliability-diagram bins for the linear scorer: fixed-width bins
    over the integer score (floor division — no global min/max pass), per
    bin the example count, positive count and empirical positive rate in
    permille.  One map-side combine + grouped exchange; output is one row
    per occupied bin.  The calibration table every scored-corpus release
    ships next to its classifier threshold."""
    from .relational import grouped_agg

    def binify(b: pa.Table) -> pa.Table:
        s = b["q1"].to_numpy(zero_copy_only=False).copy()
        for k in range(2, FEAT_DIMS + 1):
            s += b[f"q{k}"].to_numpy(zero_copy_only=False)
        bins = s // CALIB_BIN_W  # numpy floor div == SQL //
        pos = (b["y"].to_numpy(zero_copy_only=False) == 1).astype(np.int64)
        return pa.table({"bin": pa.array(bins), "n": pa.array(
            np.ones(len(s), np.int64)), "n_pos": pa.array(pos)})

    g = grouped_agg(
        _features(sf_dir).map_batches(binify, batch_format="pyarrow"),
        ["bin"], sums=["n", "n_pos"],
        in_schema=pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                             ("n_pos", pa.int64())]))

    def rate(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rate_permille",
            pc.divide(pc.multiply(t["n_pos"], pa.scalar(1000, pa.int64())),
                      t["n"]))

    return g.map_batches(rate, batch_format="pyarrow")


SQL_ML_CALIBRATION = f"""
WITH {_SQL_FEAT},
sc AS (
  SELECT q1 + q2 + q3 + q4 AS score,
         CASE WHEN y = 1 THEN 1 ELSE 0 END AS pos
  FROM feat)
SELECT CAST(floor(CAST(score AS DOUBLE) / {CALIB_BIN_W}.0) AS BIGINT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(pos) AS BIGINT) AS n_pos,
  (CAST(SUM(pos) AS BIGINT) * 1000) // CAST(COUNT(*) AS BIGINT)
    AS rate_permille
FROM sc GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ml_perceptron — batch (synchronous) perceptron training
# ---------------------------------------------------------------------------

PCT_EPOCHS = 4


def q_ml_perceptron(sf_dir: str) -> rd.Dataset:
    """Batch-synchronous perceptron training over the quantized feature
    panel — the distributed iterative-training shape (parameter broadcast
    → data-parallel gradient → tiny all-reduce → update) in its simplest
    bit-exact form.  Each of ``PCT_EPOCHS`` epochs: weights (5 ints)
    broadcast by closure; every block emits ONE partial row
    (Σ y·x over currently misclassified examples, margin y·(w·x+b) ≤ 0);
    the driver folds the partials and updates — communication per epoch is
    O(blocks), the feature Dataset is materialized once and re-read from
    the object store.  Pure integer recurrence ⇒ the whole trajectory
    (and the final misclassified count) replays in an unrolled-CTE SQL
    oracle."""
    feats = _features(sf_dir).materialize()
    part_schema = pa.schema(
        [(f"d{k + 1}", pa.int64()) for k in range(FEAT_DIMS)]
        + [("db", pa.int64()), ("mis", pa.int64())])

    w = [0] * FEAT_DIMS
    b0 = 0
    mis = 0
    for _ in range(PCT_EPOCHS + 1):  # last pass only counts
        wk, bk = list(w), b0

        def partial(t: pa.Table, wk=wk, bk=bk) -> pa.Table:
            y = t["y"].to_numpy(zero_copy_only=False)
            x = np.stack([t[f"q{k + 1}"].to_numpy(zero_copy_only=False)
                          for k in range(FEAT_DIMS)], axis=1)
            margin = y * (x @ np.asarray(wk, np.int64) + bk)
            m = margin <= 0
            ym = y[m]
            cols = {f"d{k + 1}": pa.array(
                [int(np.sum(ym * x[m, k]))], pa.int64())
                for k in range(FEAT_DIMS)}
            cols["db"] = pa.array([int(ym.sum())], pa.int64())
            cols["mis"] = pa.array([int(m.sum())], pa.int64())
            return pa.table(cols, schema=part_schema)

        rows = feats.map_batches(partial,
                                 batch_format="pyarrow").take_all()
        mis = sum(int(r["mis"]) for r in rows)
        d = [sum(int(r[f"d{k + 1}"]) for r in rows)
             for k in range(FEAT_DIMS)]
        db = sum(int(r["db"]) for r in rows)
        w = [w[k] + d[k] for k in range(FEAT_DIMS)]
        b0 += db
    # the loop ran EPOCHS updates + one extra partial pass; undo the last
    w = [w[k] - d[k] for k in range(FEAT_DIMS)]
    b0 -= db
    cols = {f"w{k + 1}": pa.array([w[k]], pa.int64())
            for k in range(FEAT_DIMS)}
    cols["bias"] = pa.array([b0], pa.int64())
    cols["n_mis"] = pa.array([mis], pa.int64())
    return rd.from_arrow(pa.table(cols))


def _sql_ml_perceptron() -> str:
    dims = range(1, FEAT_DIMS + 1)
    head = f"""
WITH {_SQL_FEAT},
w0 AS (SELECT {", ".join(f"CAST(0 AS BIGINT) AS w{k}" for k in dims)},
              CAST(0 AS BIGINT) AS b)"""
    its = ""
    for i in range(1, PCT_EPOCHS + 1):
        dot = " + ".join(f"w.w{k} * f.q{k}" for k in dims)
        deltas = ", ".join(
            f"CAST(w.w{k} + COALESCE(SUM(CASE WHEN f.y * ({dot} + w.b) <= 0 "
            f"THEN f.y * f.q{k} END), 0) AS BIGINT) AS w{k}" for k in dims)
        its += f""",
w{i} AS (
  SELECT {deltas},
    CAST(w.b + COALESCE(SUM(CASE WHEN f.y * ({dot} + w.b) <= 0
                        THEN f.y END), 0) AS BIGINT) AS b
  FROM feat f CROSS JOIN w{i - 1} w
  GROUP BY {", ".join(f"w.w{k}" for k in dims)}, w.b)"""
    dot_n = " + ".join(f"w.w{k} * f.q{k}" for k in dims)
    return f"""{head}{its}
SELECT {", ".join(f"w.w{k}" for k in dims)}, w.b AS bias,
  CAST(SUM(CASE WHEN f.y * ({dot_n} + w.b) <= 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_mis
FROM feat f CROSS JOIN w{PCT_EPOCHS} w
GROUP BY {", ".join(f"w.w{k}" for k in dims)}, w.b
"""


# ---------------------------------------------------------------------------
# ml_welch_ttest — two-sample Welch t-test from distributed integer moments
# ---------------------------------------------------------------------------

TT_A, TT_B = "src0", "src1"


def q_ml_welch_ttest(sf_dir: str) -> rd.Dataset:
    """Welch two-sample t-test (``n_chars`` of source ``src0`` vs ``src1``)
    — the A/B significance check run when comparing corpus slices or
    curation variants.  ONE streaming pass emits per-block exact int64
    moments (n, Σx, Σx²) per group; the driver folds them with Python
    bigints and evaluates the t statistic and Welch–Satterthwaite df as
    double expressions written IDENTICALLY in the SQL oracle (the
    ``ml_linreg_moments`` protocol: every value the float math sees is an
    exact integer on both sides)."""
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])
    mom_schema = pa.schema([("g", pa.string()), ("n", pa.int64()),
                            ("sx", pa.int64()), ("sxx", pa.int64())])

    def moments(t: pa.Table) -> pa.Table:
        rows = {"g": [], "n": [], "sx": [], "sxx": []}
        src = t["source"].to_numpy(zero_copy_only=False)
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        for g in (TT_A, TT_B):
            m = src == g
            xm = x[m]
            rows["g"].append(g)
            rows["n"].append(int(m.sum()))
            rows["sx"].append(int(xm.sum()))
            rows["sxx"].append(int((xm * xm).sum()))
        return pa.table(rows, schema=mom_schema)

    parts = docs.map_batches(moments, batch_format="pyarrow").take_all()
    m = {g: [0, 0, 0] for g in (TT_A, TT_B)}
    for r in parts:
        m[r["g"]][0] += int(r["n"])
        m[r["g"]][1] += int(r["sx"])
        m[r["g"]][2] += int(r["sxx"])
    (n1, sx1, sxx1), (n2, sx2, sxx2) = m[TT_A], m[TT_B]
    d1, d2 = n1 * sxx1 - sx1 * sx1, n2 * sxx2 - sx2 * sx2
    a = float(d1) / float(n1 * (n1 - 1) * n1)
    b = float(d2) / float(n2 * (n2 - 1) * n2)
    t_stat = (float(sx1) / float(n1) - float(sx2) / float(n2)) \
        / float(np.sqrt(a + b))
    df = (a + b) * (a + b) / (a * a / float(n1 - 1)
                              + b * b / float(n2 - 1))
    return rd.from_arrow(pa.table({
        "n1": pa.array([n1], pa.int64()), "n2": pa.array([n2], pa.int64()),
        "t_stat": pa.array([t_stat], pa.float64()),
        "df": pa.array([df], pa.float64()),
    }))


SQL_ML_WELCH_TTEST = f"""
WITH g AS (
  SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(n_chars) AS HUGEINT) AS sx,
    CAST(SUM(n_chars * n_chars) AS HUGEINT) AS sxx
  FROM documents WHERE source IN ('{TT_A}', '{TT_B}') GROUP BY source),
p AS (
  SELECT
    MAX(CASE WHEN source = '{TT_A}' THEN n END) AS n1,
    MAX(CASE WHEN source = '{TT_A}' THEN sx END) AS sx1,
    MAX(CASE WHEN source = '{TT_A}' THEN sxx END) AS sxx1,
    MAX(CASE WHEN source = '{TT_B}' THEN n END) AS n2,
    MAX(CASE WHEN source = '{TT_B}' THEN sx END) AS sx2,
    MAX(CASE WHEN source = '{TT_B}' THEN sxx END) AS sxx2
  FROM g),
ab AS (
  SELECT n1, n2,
    CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE)
      / CAST(n1 * (n1 - 1) * n1 AS DOUBLE) AS a,
    CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE)
      / CAST(n2 * (n2 - 1) * n2 AS DOUBLE) AS b,
    CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
    CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
  FROM p)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  (m1 - m2) / sqrt(a + b) AS t_stat,
  (a + b) * (a + b) / (a * a / CAST(n1 - 1 AS DOUBLE)
                       + b * b / CAST(n2 - 1 AS DOUBLE)) AS df
FROM ab
"""


# ---------------------------------------------------------------------------
# ml_pca_power — top principal component by integer power iteration
# ---------------------------------------------------------------------------

PCA_ITERS = 3


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division — DuckDB's BIGINT ``//`` semantics
    (Python ``//`` floors; the two differ on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def q_ml_pca_power(sf_dir: str) -> rd.Dataset:
    """Top principal component of the quantized feature panel by integer
    power iteration — the PCA/whitening primitive of embedding curation,
    in the one-pass-moments + tiny-driver-solve shape of
    ``ml_linreg_moments``: ONE streaming pass emits per-block exact int64
    moments (n, Σx, all ΣxᵢxⱼΤ pairs); the driver builds the n-scaled
    scatter matrix ``C = n·Σxxᵀ − (Σx)(Σx)ᵀ`` with Python bigints and
    runs ``PCA_ITERS`` rounds of ``v ← trunc(1000·Cv / max|Cv|)`` —
    every iterate is an exact integer (HUGEINT in the oracle, truncating
    division on both sides), so the direction replays bit-exact in an
    unrolled-CTE SQL oracle.  Output: the scaled eigenvector v1..v4,
    its max-|component| normalizer sign convention, and n."""
    feats = _features(sf_dir)
    pairs = [(i, j) for i in range(FEAT_DIMS) for j in range(i, FEAT_DIMS)]
    names = (["n"] + [f"s{i + 1}" for i in range(FEAT_DIMS)]
             + [f"s{i + 1}{j + 1}" for i, j in pairs])
    mom_schema = pa.schema([(c, pa.int64()) for c in names])

    def moments(t: pa.Table) -> pa.Table:
        x = np.stack([t[f"q{k + 1}"].to_numpy(zero_copy_only=False)
                      for k in range(FEAT_DIMS)], axis=1)
        cols = {"n": [x.shape[0]]}
        for i in range(FEAT_DIMS):
            cols[f"s{i + 1}"] = [int(x[:, i].sum())]
        for i, j in pairs:
            cols[f"s{i + 1}{j + 1}"] = [int((x[:, i] * x[:, j]).sum())]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()}, schema=mom_schema)

    rows = feats.map_batches(moments, batch_format="pyarrow").take_all()
    m = {k: sum(int(r[k]) for r in rows) for k in names}
    n = m["n"]
    C = [[0] * FEAT_DIMS for _ in range(FEAT_DIMS)]
    for i in range(FEAT_DIMS):
        for j in range(FEAT_DIMS):
            a, b = (i, j) if i <= j else (j, i)
            C[i][j] = (n * m[f"s{a + 1}{b + 1}"]
                       - m[f"s{i + 1}"] * m[f"s{j + 1}"])
    v = [1000] * FEAT_DIMS
    for _ in range(PCA_ITERS):
        w = [sum(C[k][l] * v[l] for l in range(FEAT_DIMS))
             for k in range(FEAT_DIMS)]
        mx = max(abs(x) for x in w)
        v = [_tdiv(x * 1000, mx) for x in w]
    cols = {f"v{k + 1}": pa.array([v[k]], pa.int64())
            for k in range(FEAT_DIMS)}
    cols["n"] = pa.array([n], pa.int64())
    return rd.from_arrow(pa.table(cols))


def _sql_ml_pca_power() -> str:
    dims = range(1, FEAT_DIMS + 1)
    pairs = [(i, j) for i in dims for j in dims if i <= j]
    moms = ", ".join(
        [f"CAST(COUNT(*) AS HUGEINT) AS n"]
        + [f"CAST(SUM(q{i}) AS HUGEINT) AS s{i}" for i in dims]
        + [f"CAST(SUM(q{i} * q{j}) AS HUGEINT) AS s{i}{j}"
           for i, j in pairs])
    cexprs = ", ".join(
        f"n * s{min(i, j)}{max(i, j)} - s{i} * s{j} AS c{i}{j}"
        for i in dims for j in dims)
    v0 = ", ".join(f"CAST(1000 AS HUGEINT) AS v{i}" for i in dims)
    its = ""
    for t in range(1, PCA_ITERS + 1):
        ws = ", ".join(
            f"{' + '.join(f'c.c{i}{j} * v.v{j}' for j in dims)} AS w{i}"
            for i in dims)
        mx = f"greatest({', '.join(f'abs(w{i})' for i in dims)})"
        vs = ", ".join(f"(w{i} * 1000) // {mx} AS v{i}" for i in dims)
        its += f""",
w{t} AS (SELECT {ws} FROM c CROSS JOIN v{t - 1} v),
v{t} AS (SELECT {vs} FROM w{t})"""
    return f"""
WITH {_SQL_FEAT},
m AS (SELECT {moms} FROM feat),
c AS (SELECT {cexprs}, n FROM m),
v0 AS (SELECT {v0}){its}
SELECT {", ".join(f"CAST(v{i} AS BIGINT) AS v{i}" for i in dims)},
  CAST(c.n AS BIGINT) AS n
FROM v{PCA_ITERS} CROSS JOIN c
"""


# ---------------------------------------------------------------------------
# ml_mutual_info — exact fixed-point mutual information (lang ; source)
# ---------------------------------------------------------------------------

def q_ml_mutual_info(sf_dir: str) -> rd.Dataset:
    """Mutual information between ``lang`` and ``source`` in micro-bits —
    the dependence measure behind feature selection and leakage checks,
    computed on the same contingency protocol as ``ml_chi2_independence``:
    one grouped-count exchange produces the cell table; the driver folds
    ``MI_micro = Σ ⌊1e6·(o/N)·log2(o·N/(rt·ct)) + 0.5⌋`` per occupied
    cell with exact integer operands (only the shared last-ulp log2
    surface is float).  Empty cells contribute 0 exactly."""
    from .relational import grouped_agg

    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"], "source": t["source"],
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    cells = grouped_agg(
        docs.map_batches(ones, batch_format="pyarrow"),
        ["lang", "source"], sums=["n"],
        in_schema=pa.schema([("lang", pa.string()), ("source", pa.string()),
                             ("n", pa.int64())])).take_all()
    rt: Dict[str, int] = {}
    ct: Dict[str, int] = {}
    for r in cells:
        rt[r["lang"]] = rt.get(r["lang"], 0) + int(r["n"])
        ct[r["source"]] = ct.get(r["source"], 0) + int(r["n"])
    n = sum(rt.values())
    mi = 0
    for r in cells:
        o = int(r["n"])
        ratio = (float(o) * float(n)) / (float(rt[r["lang"]])
                                         * float(ct[r["source"]]))
        mi += int(np.floor(1_000_000.0 * (float(o) / float(n))
                           * np.log2(ratio) + 0.5))
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "n_cells": pa.array([len(cells)], pa.int64()),
        "mi_micros": pa.array([mi], pa.int64()),
    }))


SQL_ML_MUTUAL_INFO = """
WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
           FROM documents GROUP BY lang, source),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rtot FROM g GROUP BY lang),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ctot FROM g GROUP BY source),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM g)
SELECT n.n AS n, CAST(COUNT(*) AS BIGINT) AS n_cells,
  CAST(SUM(CAST(floor(
    1000000.0 * (CAST(o AS DOUBLE) / CAST(n.n AS DOUBLE))
    * log2((CAST(o AS DOUBLE) * CAST(n.n AS DOUBLE))
           / (CAST(rt.rtot AS DOUBLE) * CAST(ct.ctot AS DOUBLE)))
    + 0.5) AS BIGINT)) AS BIGINT) AS mi_micros
FROM g JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
GROUP BY n.n
"""


# ---------------------------------------------------------------------------
# ml_confusion — classifier evaluation: confusion matrix of NB vs gold
# ---------------------------------------------------------------------------

def q_ml_confusion(sf_dir: str) -> rd.Dataset:
    """Confusion matrix of the Naive-Bayes language classifier against the
    gold ``lang`` column on the held-out split — the evaluation join every
    model-gated curation stage runs after scoring.  Predictions stream out
    of ``ml_nb_classify``; truth attaches via ONE planned join on doc_id
    (broadcast while small, hash exchange at scale); counts collapse
    map-side through the grouped exchange.  Output: (gold, pred, n)."""
    from .relational import grouped_agg, planned_join

    preds = q_ml_nb_classify(sf_dir)
    gold = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    j = planned_join(preds.select_columns(["doc_id", "pred_lang"]), gold,
                     on=["doc_id"])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"gold": pc.cast(t["lang"], pa.string()),
                         "pred": pc.cast(t["pred_lang"], pa.string()),
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    return grouped_agg(
        j.map_batches(ones, batch_format="pyarrow"), ["gold", "pred"],
        sums=["n"],
        in_schema=pa.schema([("gold", pa.string()), ("pred", pa.string()),
                             ("n", pa.int64())]))


def _sql_ml_confusion() -> str:
    return f"""
WITH nb AS ({SQL_ML_NB_CLASSIFY})
SELECT d.lang AS gold, nb.pred_lang AS pred, CAST(COUNT(*) AS BIGINT) AS n
FROM nb JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# ml_stump_split — decision-stump (CART root) split search
# ---------------------------------------------------------------------------

def q_ml_stump_split(sf_dir: str) -> rd.Dataset:
    """Decision-stump training (the CART root-split search — the first
    boosting round of every tree ensemble) over the quantized feature
    panel: for each feature, every distinct value is a candidate
    threshold; the best split maximizes the Gini gain surrogate
    ``score = ⌊1e6·(Σl_c²)/L⌋ + ⌊1e6·(Σr_c²)/R⌋`` (per-side floor —
    deterministic, replayable in SQL window cumsums).

    Distributed shape: one map-side combine collapses examples to
    (feature, value) → (count, positives) via the grouped exchange —
    O(distinct values) rows move, never examples; ONE task per output
    computes prefix sums and the argmax (ties → smaller feature id, then
    smaller threshold).  Output: one row (feature, threshold ≤, score,
    left/right counts)."""
    from .relational import grouped_agg

    def unpivot(b: pa.Table) -> pa.Table:
        pos = (b["y"].to_numpy(zero_copy_only=False) == 1).astype(np.int64)
        n = len(pos)
        feats, vals = [], []
        for k in range(FEAT_DIMS):
            feats.append(np.full(n, k + 1, np.int64))
            vals.append(b[f"q{k + 1}"].to_numpy(zero_copy_only=False))
        return pa.table({
            "feature": pa.array(np.concatenate(feats)),
            "val": pa.array(np.concatenate(vals)),
            "cnt": pa.array(np.ones(n * FEAT_DIMS, np.int64)),
            "pos": pa.array(np.tile(pos, FEAT_DIMS)),
        })

    g = grouped_agg(
        _features(sf_dir).map_batches(unpivot, batch_format="pyarrow"),
        ["feature", "val"], sums=["cnt", "pos"],
        in_schema=pa.schema([("feature", pa.int64()), ("val", pa.int64()),
                             ("cnt", pa.int64()), ("pos", pa.int64())]))

    def best(t: pa.Table) -> pa.Table:
        f = t["feature"].to_numpy(zero_copy_only=False)
        v = t["val"].to_numpy(zero_copy_only=False)
        o = np.lexsort((v, f))
        f, v = f[o], v[o]
        cnt = t["cnt"].to_numpy(zero_copy_only=False)[o]
        pos = t["pos"].to_numpy(zero_copy_only=False)[o]
        best_row = None
        for k in np.unique(f):
            m = f == k
            c, p = cnt[m], pos[m]
            tot, tot_p = int(c.sum()), int(p.sum())
            lc, lp = np.cumsum(c), np.cumsum(p)
            # last threshold keeps an empty right side — exclude it
            lc, lp, thr = lc[:-1], lp[:-1], v[m][:-1]
            rc, rp = tot - lc, tot_p - lp
            # object dtype → Python-int arithmetic: exact at any split
            # size (int64 would silently wrap once a side exceeds ~3M
            # rows, where the SQL oracle stays exact)
            lc, lp = lc.astype(object), lp.astype(object)
            rc, rp = rc.astype(object), rp.astype(object)
            score = (1_000_000 * (lp * lp + (lc - lp) ** 2) // lc
                     + 1_000_000 * (rp * rp + (rc - rp) ** 2) // rc)
            i = max(range(len(score)),
                    key=lambda j: score[j])  # first max → smallest threshold
            row = (int(score[i]), int(k), int(thr[i]),
                   int(lc[i]), int(rc[i]))
            if best_row is None or row[0] > best_row[0] or (
                    row[0] == best_row[0] and row[1:3] < best_row[1:3]):
                best_row = row
        s, k, thr, l, r = best_row
        return pa.table({"feature": pa.array([k], pa.int64()),
                         "threshold": pa.array([thr], pa.int64()),
                         "score": pa.array([s], pa.int64()),
                         "n_left": pa.array([l], pa.int64()),
                         "n_right": pa.array([r], pa.int64())})

    return g.repartition(1).map_batches(best, batch_format="pyarrow",
                                        batch_size=None)


def _sql_ml_stump_split() -> str:
    unions = " UNION ALL ".join(
        f"SELECT {k} AS feature, q{k} AS val, "
        "CASE WHEN y = 1 THEN 1 ELSE 0 END AS pos FROM feat"
        for k in range(1, FEAT_DIMS + 1))
    return f"""
WITH {_SQL_FEAT},
u AS ({unions}),
g AS (SELECT feature, val, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(pos) AS BIGINT) AS pos
      FROM u GROUP BY feature, val),
c AS (
  SELECT feature, val,
    SUM(cnt) OVER w AS lc, SUM(pos) OVER w AS lp,
    SUM(cnt) OVER (PARTITION BY feature) AS tot,
    SUM(pos) OVER (PARTITION BY feature) AS totp
  FROM g
  WINDOW w AS (PARTITION BY feature ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s AS (
  SELECT feature, val AS threshold, lc, tot - lc AS rc,
    CAST(1000000 * (lp * lp + (lc - lp) * (lc - lp)) // lc
       + 1000000 * ((totp - lp) * (totp - lp)
                    + ((tot - lc) - (totp - lp)) * ((tot - lc) - (totp - lp)))
         // (tot - lc) AS BIGINT) AS score
  FROM c WHERE lc < tot)
SELECT CAST(feature AS BIGINT) AS feature, threshold, score,
  CAST(lc AS BIGINT) AS n_left, CAST(rc AS BIGINT) AS n_right
FROM s ORDER BY score DESC, feature, threshold LIMIT 1
"""


# ---------------------------------------------------------------------------
# ml_chi2_independence — exact-integer chi-squared contingency test
# ---------------------------------------------------------------------------

def q_ml_chi2_independence(sf_dir: str) -> rd.Dataset:
    """Chi-squared independence test between ``lang`` and ``source`` (the
    corpus-composition drift check run before/after every curation stage):
    the contingency table is ONE grouped-count exchange (cells, not rows,
    move); the statistic uses the all-integer identity
    ``(o−e)²/e = (o·N − rt·ct)² / (N·rt·ct)`` with a per-cell micro floor,
    folded with Python bigints on the driver over the tiny cell table —
    no float ever crosses a worker boundary, so the value replays
    bit-exact in HUGEINT SQL."""
    from .relational import grouped_agg

    docs = _read(sf_dir, "documents", columns=["lang", "source"])

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"], "source": t["source"],
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    cells = grouped_agg(
        docs.map_batches(ones, batch_format="pyarrow"),
        ["lang", "source"], sums=["n"],
        in_schema=pa.schema([("lang", pa.string()), ("source", pa.string()),
                             ("n", pa.int64())])).take_all()
    rt: Dict[str, int] = {}
    ct: Dict[str, int] = {}
    for r in cells:
        rt[r["lang"]] = rt.get(r["lang"], 0) + int(r["n"])
        ct[r["source"]] = ct.get(r["source"], 0) + int(r["n"])
    n = sum(rt.values())
    chi2 = 0
    for lang, rtot in rt.items():
        for src, ctot in ct.items():
            o = next((int(r["n"]) for r in cells
                      if r["lang"] == lang and r["source"] == src), 0)
            chi2 += (1_000_000 * (o * n - rtot * ctot) ** 2
                     // (n * rtot * ctot))
    dof = (len(rt) - 1) * (len(ct) - 1)
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2_micros": pa.array([chi2], pa.int64()),
    }))


SQL_ML_CHI2 = """
WITH g AS (SELECT lang, source, CAST(COUNT(*) AS HUGEINT) AS o
           FROM documents GROUP BY lang, source),
rt AS (SELECT lang, SUM(o) AS rtot FROM g GROUP BY lang),
ct AS (SELECT source, SUM(o) AS ctot FROM g GROUP BY source),
n AS (SELECT SUM(o) AS n FROM g),
cells AS (
  SELECT rt.lang, ct.source, rt.rtot, ct.ctot,
         COALESCE(g.o, 0) AS o
  FROM rt CROSS JOIN ct
  LEFT JOIN g ON g.lang = rt.lang AND g.source = ct.source)
SELECT CAST(n.n AS BIGINT) AS n,
  CAST(((SELECT COUNT(*) FROM rt) - 1)
       * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof,
  CAST(SUM(1000000 * (o * n.n - rtot * ctot) * (o * n.n - rtot * ctot)
           // (n.n * rtot * ctot)) AS BIGINT) AS chi2_micros
FROM cells CROSS JOIN n
GROUP BY n.n
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> Dict[str, Callable[[str], rd.Dataset]]:
    return {
        "ml_nb_classify": q_ml_nb_classify,
        "kg_amie_rules": q_kg_amie_rules,
        "text_source_filter": q_text_source_filter,
        "ml_linreg_moments": q_ml_linreg_moments,
        "ml_prototype_prune": q_ml_prototype_prune,
        "ml_silhouette": q_ml_silhouette,
        "ml_knn_classify": q_ml_knn_classify,
        "ml_auc": q_ml_auc,
        "ml_calibration": q_ml_calibration,
        "ml_perceptron": q_ml_perceptron,
        "ml_stump_split": q_ml_stump_split,
        "ml_chi2_independence": q_ml_chi2_independence,
        "ml_confusion": q_ml_confusion,
        "ml_welch_ttest": q_ml_welch_ttest,
        "ml_mutual_info": q_ml_mutual_info,
        "ml_pca_power": q_ml_pca_power,
    }


def oracle_sql() -> Dict[str, str]:
    return {
        "ml_nb_classify": SQL_ML_NB_CLASSIFY,
        "kg_amie_rules": _sql_kg_amie_rules(),
        "text_source_filter": _sql_text_source_filter(),
        "ml_linreg_moments": SQL_ML_LINREG_MOMENTS,
        "ml_prototype_prune": _sql_ml_prototype_prune(),
        "ml_silhouette": _sql_ml_silhouette(),
        "ml_knn_classify": SQL_ML_KNN_CLASSIFY,
        "ml_auc": SQL_ML_AUC,
        "ml_calibration": SQL_ML_CALIBRATION,
        "ml_perceptron": _sql_ml_perceptron(),
        "ml_stump_split": _sql_ml_stump_split(),
        "ml_chi2_independence": SQL_ML_CHI2,
        "ml_confusion": _sql_ml_confusion(),
        "ml_welch_ttest": SQL_ML_WELCH_TTEST,
        "ml_mutual_info": SQL_ML_MUTUAL_INFO,
        "ml_pca_power": _sql_ml_pca_power(),
    }
