"""Python-oracle tests for the non-SQL-expressible training-data operators:
minhash/simhash recall on planted near-dups, LSH-ANN recall vs brute force,
language ID on real multilingual samples, fingerprints, multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def test_minhash_lsh_recall_on_planted_near_dups(ray_session):
    """Every planted (i, i+OFFSET) one-token-append pair must be recovered
    (Jaccard ≈ 1 ⇒ all bands collide)."""
    import ray.data as rd

    from rdflib_r2r_ray.dataq import DUP_OFFSET, plant_near_dups
    from rdflib_r2r_ray.stages.dedup import minhash_lsh_candidates

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).limit(120)
    base_ids = [r["doc_id"] for r in docs.take_all()]
    planted = docs.map_batches(plant_near_dups, batch_format="pyarrow")
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(planted).take_all()}
    expected = {(i, i + DUP_OFFSET) for i in base_ids}
    recall = len(pairs & expected) / len(expected)
    assert recall >= 0.95, f"minhash recall {recall}"


def test_minhash_no_false_high_jaccard():
    """Candidates must actually be similar: brute-force Jaccard of a planted
    pair ≈ 1; of two unrelated docs well below the 0.8 verify bar."""
    from rdflib_r2r_ray.stages.dedup import ngram_jaccard

    a = "the quick brown fox jumps over the lazy dog again and again"
    assert ngram_jaccard(a, a + " zzztail") > 0.8
    b = "completely different words in another sentence entirely here now"
    assert ngram_jaccard(a, b) < 0.2


def test_simhash_hamming_on_near_dups():
    from rdflib_r2r_ray.stages.dedup import simhash64

    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + " zzztail"
    c = "unrelated totally different content about ray data pipelines " * 5
    ham_ab = bin(simhash64(a) ^ simhash64(b)).count("1")
    ham_ac = bin(simhash64(a) ^ simhash64(c)).count("1")
    assert ham_ab <= 6
    assert ham_ac > 12


def test_embedding_neardup_lsh_vs_exact(ray_session):
    """The LSH-bucketed near-dup finder must agree with exact all-pairs on
    high-similarity planted vectors."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.ann import embedding_near_dup_exact
    from rdflib_r2r_ray.stages.dedup import embedding_near_dup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((50, 16))
    # plant 10 near-dup rows: tiny perturbation of rows 0-9
    near = base[:10] + rng.standard_normal((10, 16)) * 0.01
    vecs = np.vstack([base, near])
    ids = list(range(50)) + [100 + i for i in range(10)]
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    exact = {(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_exact(ds, threshold=0.95).take_all()}
    approx = {(r["id_a"], r["id_b"]) for r in
              embedding_near_dup(ds, threshold=0.95).take_all()}
    expected = {(i, 100 + i) for i in range(10)}
    assert expected <= exact
    assert len(approx & expected) / len(expected) >= 0.7  # LSH recall


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def test_lsh_topk_recall_vs_brute_force(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.dataq import _query_vectors
    from rdflib_r2r_ray.stages.ann import brute_force_topk, lsh_bucketed_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = _query_vectors(SF)
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(ds, q, k=10).take_all()}
    approx = {(r["query_id"], r["vec_id"])
              for r in lsh_bucketed_topk(ds, q, k=10, planes=8, max_hamming=2, tables=4).take_all()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH top-k recall {recall}"


def test_ivf_topk_recall_vs_brute_force(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.dataq import _query_vectors
    from rdflib_r2r_ray.stages.ann import brute_force_topk, ivf_topk

    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = _query_vectors(SF)
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(ds, q, k=10).take_all()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_topk(ds, q, k=10, n_centroids=16, nprobe=6).take_all()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF top-k recall {recall}"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_langid_on_real_samples():
    from rdflib_r2r_ray.stages.text import LanguageID

    lid = LanguageID()
    samples = {
        "en": "the cat sat on the mat and it was not very happy about this",
        "de": "der Hund ist nicht in dem Haus und sie werden auch nach Berlin fahren",
        "fr": "le chat est dans la maison et nous ne savons pas pour quoi il est venu",
        "es": "el perro está en la casa y no se puede saber por qué ha venido",
        "it": "il gatto è nella casa e non si può sapere perché sono venuti qui",
        "ru": "Это предложение написано по-русски и содержит кириллицу",
        "zh": "这是一个用中文写的句子，包含了很多汉字",
    }
    for lang, text in samples.items():
        assert lid.detect(text) == lang, (lang, text, lid.detect(text))
    assert lid.detect("") == "und"
    assert lid.detect("12345 67890 !!!") == "und"


def test_quality_scorer_ordering():
    from rdflib_r2r_ray.stages.text import QualityScorer

    qs = QualityScorer()
    good = qs.score_one("The quick brown fox jumps over the lazy dog. It was a fine day, and the fox was pleased with itself.")
    bad = qs.score_one("$$$ ###")
    assert good["quality_score"] > bad["quality_score"]
    # stopword ratio > 10%: 10·n_stop > n_words (all-integer signals)
    assert 10 * good["n_stop"] > good["n_words"]


def test_fingerprint_content_addressed():
    from rdflib_r2r_ray.stages.text import rolling_fingerprint

    a = "some document text " * 20
    assert rolling_fingerprint(a) == rolling_fingerprint(a)
    assert rolling_fingerprint(a) != rolling_fingerprint(a + "x")
    assert rolling_fingerprint("") == 0


def test_token_counter_bpeish():
    from rdflib_r2r_ray.stages.text import TokenCounter

    tc = TokenCounter()
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": ["I don't like it, really."]})
    out = tc(batch).to_pylist()[0]
    assert out["n_ws_tokens"] == 5
    assert out["n_bpe_tokens"] >= 7  # contractions + punctuation split off


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_image_roundtrip_and_resize():
    from rdflib_r2r_ray.stages.multimodal import (
        ImageDecoder, ImageResizer, pack_payload, unpack_header)

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    buf = pack_payload("img", 16, 16, 1, img.tobytes())
    hdr = unpack_header(buf)
    assert hdr == {"kind": "img", "width": 16, "height": 16, "frames": 1,
                   "payload_len": 16 * 16 * 3}

    batch = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "payload": pa.array([buf], pa.binary())})
    meta = ImageDecoder()(batch).to_pylist()[0]
    assert meta["width"] == 16 and meta["mean_luma"] > 0

    resized = ImageResizer(8, 8)(batch)
    hdr2 = unpack_header(resized["payload"][0].as_py())
    assert hdr2["width"] == 8 and hdr2["height"] == 8


def test_image_decoder_strict_raises_on_real_format():
    from rdflib_r2r_ray.stages.multimodal import ImageDecoder

    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([jpeg_ish], pa.binary())})
    with pytest.raises(NotImplementedError):
        ImageDecoder(strict=True)(batch)
    # non-strict: metadata still flows, features are sentinel
    out = ImageDecoder(strict=False)(batch).to_pylist()[0]
    assert out["kind"] == "unknown" and out["mean_luma"] == -1.0


def test_audio_frame_sampler():
    from rdflib_r2r_ray.stages.multimodal import AudioFrameSampler, pack_payload

    pcm = (np.sin(np.arange(4096) * 0.01) * 1000).astype(np.int16)
    buf = pack_payload("aud", 16000, 1, len(pcm), pcm.tobytes())
    batch = pa.table({"doc_id": pa.array([3], pa.int64()),
                      "payload": pa.array([buf], pa.binary())})
    out = AudioFrameSampler(hop=1024)(batch).to_pylist()
    assert len(out) == 4
    assert all(r["rms"] > 0 for r in out)


# ---------------------------------------------------------------------------
# skew-safe salted groupby
# ---------------------------------------------------------------------------

def test_salted_partial_salt_is_key_independent():
    """The salt must vary across batches for the SAME key — a key-derived
    salt sends every partial of a hot key to one reducer (no-op salting)."""
    from rdflib_r2r_ray.stages.canonicalize import _salted_partial

    hot = pa.table({"k": pa.array(["head"] * 100)})
    salts = {
        _salted_partial(hot, "k", "n", salt_buckets=8)["salt"][0].as_py()
        for _ in range(32)
    }
    assert len(salts) > 1, "salt must not be a function of the key"
    assert len(salts) == 8, f"expected all 8 salt buckets used, got {salts}"


def test_salted_groupby_count_head_key_distribution(ray_session):
    """Correct counts under a power-law key distribution: one head key with
    90% of rows plus a long tail."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.canonicalize import salted_groupby_count

    rows = [{"entity": "head"}] * 9000 + [{"entity": f"tail{i}"} for i in range(100)] * 10
    ds = rd.from_items(rows, override_num_blocks=40)
    out = {r["entity"]: r["n"] for r in salted_groupby_count(ds, "entity").take_all()}
    assert out["head"] == 9000
    assert all(out[f"tail{i}"] == 10 for i in range(100))
    assert len(out) == 101


def test_label_propagation_components_distributed(ray_session):
    """Min-label propagation over a 2-component graph; the fixpoint runs as
    keyed joins + grouped min — no driver-side label dict."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.canonicalize import label_propagation_components

    edges = rd.from_items(
        [
            {"a": "e2", "b": "e5"}, {"a": "e5", "b": "e9"}, {"a": "e9", "b": "e1"},
            {"a": "x3", "b": "x7"}, {"a": "x7", "b": "x4"},
        ],
        override_num_blocks=3,
    )
    want = {
        "e1": "e1", "e2": "e1", "e5": "e1", "e9": "e1",
        "x3": "x3", "x4": "x3", "x7": "x3",
    }
    # small input -> one-task union-find fast path
    labels = {r["node"]: r["label"] for r in label_propagation_components(edges).take_all()}
    assert labels == want
    # force the DISTRIBUTED propagation path and check parity
    from rdflib_r2r_ray.stages import canonicalize as C

    old = C._LOCAL_CC_MAX_EDGES
    C._LOCAL_CC_MAX_EDGES = 0
    try:
        labels2 = {r["node"]: r["label"]
                   for r in label_propagation_components(edges).take_all()}
    finally:
        C._LOCAL_CC_MAX_EDGES = old
    assert labels2 == want


def test_transitive_closure_chain(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.bgp import transitive_closure

    triples = rd.from_arrow(pa.table({
        "subj": ["<a>", "<b>", "<c>", "<x>"],
        "pred": ["<p>", "<p>", "<p>", "<q>"],
        "obj": ["<b>", "<c>", "<d>", "<y>"],
    }))
    pairs = {(r["s"], r["o"]) for r in transitive_closure(triples, "<p>").take_all()}
    assert pairs == {
        ("<a>", "<b>"), ("<b>", "<c>"), ("<c>", "<d>"),
        ("<a>", "<c>"), ("<b>", "<d>"), ("<a>", "<d>"),
    }


def test_streaming_exchange_cascade_bounds_refs(ray_session):
    """The two-level exchange: with a tiny group size and cascade width the
    driver's per-bucket part list stays bounded by cascade_width regardless
    of how many map groups ran, and the result is still the exact distinct
    set (VERDICT round-2 item 7)."""
    import ray
    import ray.data as rd
    from rdflib_r2r_ray.stages.dedup import _exchange_partitions

    tbl = pa.table({
        "k": [f"key{i % 200}" for i in range(4000)],
        "v": [i % 200 for i in range(4000)],
    })
    ds = rd.from_arrow(tbl).repartition(40)
    buckets, schema = _exchange_partitions(
        ds, ["k"], num_buckets=4, combine=True, cascade_width=2, group_rows=100
    )
    assert len(buckets) == 4
    # cascade keeps every bucket's outstanding part list bounded
    assert all(len(parts) <= 2 for parts in buckets)
    rows = []
    for parts in buckets:
        for t in ray.get(list(parts)):
            if t is not None and t.num_rows:
                rows.extend(zip(t["k"].to_pylist(), t["v"].to_pylist()))
    # per-bucket distinct + disjoint buckets ⇒ global distinct
    assert sorted(rows) == sorted({(f"key{i}", i) for i in range(200)})


def test_streaming_distinct_on_multigroup(ray_session, monkeypatch):
    """distinct_on through the streaming multi-mapper path (forced small
    exchange groups) matches the exact distinct set."""
    import ray.data as rd
    from rdflib_r2r_ray.stages.dedup import distinct_on

    monkeypatch.setenv("GRAFT_EXCHANGE_GROUP_ROWS", "128")
    tbl = pa.table({"a": [i % 97 for i in range(3000)],
                    "b": [f"s{i % 97}" for i in range(3000)]})
    out = distinct_on(rd.from_arrow(tbl).repartition(24), ["a", "b"])
    got = sorted((r["a"], r["b"]) for r in out.take_all())
    assert got == sorted({(i, f"s{i}") for i in range(97)})


def test_text_stage_batch_matches_scalar_reference():
    """The vectorized batch paths of QualityScorer/LanguageID equal the
    per-doc scalar reference implementations on a tricky corpus."""
    from rdflib_r2r_ray.stages.text import LanguageID, QualityScorer, TokenCounter

    texts = [
        "The quick brown fox jumps over the lazy dog. It was a fine day.",
        "der Hund ist nicht in dem Haus und sie werden auch nach Berlin fahren",
        "le chat est dans la maison et nous ne savons pas pour quoi il est venu",
        "这是一个用中文写的句子，包含了很多汉字",
        "Это предложение написано по-русски и содержит кириллицу",
        "",
        "12345 67890 !!!",
        "$$$ ###",
        "a\nb\na\nb\na\n\n  \n",
        "don't can't WON'T I'll  mixed CASE 42 lines\nlines\nlines",
        None,
        "the the the and and of of of to to in in is is",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})

    qs = QualityScorer()
    got = qs(batch).to_pylist()
    for row, t in zip(got, texts):
        ref = qs.score_one(t or "")
        for k, v in ref.items():
            assert row[k] == v, (t, k, row[k], v)

    lid = LanguageID()
    got = lid(batch).to_pylist()
    for row, t in zip(got, texts):
        assert row["lang_pred"] == lid.detect(t or ""), (t, row["lang_pred"])

    tc = TokenCounter()
    got = tc(batch).to_pylist()
    import re as _re
    for row, t in zip(got, texts):
        assert row["n_bpe_tokens"] == len(tc.pat.findall(t or "")), t


def test_fingerprint_column_is_int64():
    """Fingerprints travel as int64 (two's-complement view of the uint64
    hash) — uint64 values over 2^63 broke Ray's block coercion into pickled
    object columns (round-2 driver sweep instability)."""
    from rdflib_r2r_ray.stages.text import Fingerprinter

    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["some text that hashes high", "x"]})
    out = Fingerprinter()(batch)
    assert out.schema.field("fingerprint").type == pa.int64()


def test_linker_multipattern_matches_per_alias_reference():
    """The grouped alternation scans reproduce the per-alias independent
    match counts exactly, on a conflict-rich dictionary (containment +
    word-aligned borders), and the scan-group count stays flat when the
    dictionary grows 10x with non-conflicting aliases."""
    import re
    from rdflib_r2r_ray.stages.linker import EntityLinker, alias_pattern, plan_alias_groups

    rows = [
        ("new york", "ny", 0.9), ("york", "york-city", 0.8),
        ("big apple", "ny", 0.7), ("apple", "apple-inc", 0.95),
        ("apple pie", "pie", 0.6), ("pie chart", "chart", 0.5),
        ("spark", "spark", 0.9), ("spark stream", "spark", 0.8),
    ]
    texts = [
        "the new york big apple apple pie chart",
        "york and new york and york",
        "apple apple pie pie chart spark stream",
        "nothing here",
        None,
    ]
    batch = pa.table({
        "subj": pa.array([f"<d{i}>" for i in range(len(texts))], pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    lk = EntityLinker(rows)
    got = {(r["subj"], r["alias"]): r["n_mentions"] for r in lk(batch).to_pylist()}
    # per-alias independent reference counts
    want = {}
    for i, t in enumerate(texts):
        for a, _, _ in rows:
            c = len(re.findall(alias_pattern(a), t or ""))
            if c:
                want[(f"<d{i}>", a)] = c
    assert got == want

    # growth: 10x unique non-conflicting aliases add ZERO scan groups beyond
    # the conflict structure of the base dictionary
    base_groups = len(plan_alias_groups([a for a, _, _ in rows]))
    grown = [a for a, _, _ in rows] + [f"uniqueterm{i} xyz{i}" for i in range(80)]
    assert len(plan_alias_groups(grown)) == base_groups


def test_hll_accuracy_and_merge():
    """HLL estimate within 5% across cardinality regimes (linear-counting
    and raw-estimator ranges), and register merge == whole-input fold."""
    import numpy as np
    from rdflib_r2r_ray.stages.dedup import _pl
    from rdflib_r2r_ray.stages.sketch import hll_estimate, hll_partial

    pl = _pl()
    for n in (100, 3000, 50_000, 300_000):
        vals = pl.Series([f"item-{i}" for i in range(n)]).hash(seed=7).to_numpy()
        est = hll_estimate(hll_partial(vals.astype(np.uint64)))
        assert abs(est - n) / n <= 0.05, (n, est)
        # merge of two halves == fold of the whole
        a = hll_partial(vals[: n // 2].astype(np.uint64))
        b = hll_partial(vals[n // 2 :].astype(np.uint64))
        assert hll_estimate(np.maximum(a, b)) == est


def test_grouped_topk(ray_session):
    import ray.data as rd
    from rdflib_r2r_ray.relational import grouped_topk

    tbl = pa.table({
        "g": [f"g{i % 5}" for i in range(1000)] + [None] * 10,
        "v": list(range(1000)) + list(range(10)),
        "id": list(range(1010)),
    })
    out = grouped_topk(rd.from_arrow(tbl).repartition(8), ["g"],
                       [("v", True), ("id", False)], k=2)
    rows = sorted((r["g"] or "", r["v"]) for r in out.take_all())
    want = []
    for i in range(5):
        top = sorted([v for v in range(1000) if v % 5 == i], reverse=True)[:2]
        want.extend((f"g{i}", v) for v in top)
    want.extend(("", v) for v in (9, 8))  # null group keeps its own top-2
    assert rows == sorted(want)


def test_multiformat_sources(ray_session, tmp_path):
    """CSV/JSON logical tables read through sources.tables produce the same
    rows as the parquet path (format-agnostic downstream)."""
    import json as _json
    import pyarrow.csv as pacsv
    from rdflib_r2r_ray.sources.tables import infer_format, read_logical_table

    tbl = pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"], "extra": [9, 9, 9]})
    csv_p = str(tmp_path / "t.csv")
    json_p = str(tmp_path / "t.jsonl")
    pacsv.write_csv(tbl, csv_p)
    with open(json_p, "w") as f:
        for r in tbl.to_pylist():
            f.write(_json.dumps(r) + "\n")
    want = sorted((r["k"], r["name"]) for r in tbl.select(["k", "name"]).to_pylist())
    for p in (csv_p, json_p):
        ds = read_logical_table(p, columns=["k", "name"])
        assert sorted(ds.schema().names) == ["k", "name"]  # pruned at read
        got = sorted((r["k"], r["name"]) for r in ds.take_all())
        assert got == want
    assert infer_format("x.parquet") == "parquet"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        infer_format("x.unknownext")


def test_ntriples_roundtrip_escapes(ray_session, tmp_path):
    """nt sink → nt source inverts exactly, including literal escapes and
    decorated (typed/lang) literals."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.sources.tables import read_ntriples
    from rdflib_r2r_ray.state.checkpoint import write_ntriples

    rows = [
        ("<s1>", "<p>", 'line1\nline2\t"quoted" \\backslash'),
        ("<s2>", "<p>", '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<s3>", "<p>", '"bonjour"@fr'),
        ("<s4>", "<p>", "<http://ex/o>"),
        ("_:b0", "<p>", "plain value"),
    ]
    t = pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows],
    })
    out = str(tmp_path / "nt")
    write_ntriples(rd.from_arrow(t), out, num_partitions=2, resume=False)
    back = {(r["subj"], r["pred"], r["obj"])
            for r in read_ntriples(out).take_all()}
    assert back == set(rows)


def test_ntriples_decorated_literal_with_newline(ray_session, tmp_path):
    """A typed literal whose lexical form contains raw newlines/tabs must
    survive the nt sink→source round-trip (review fix: the writer used to
    emit it across two physical lines — invalid N-Triples, silently lost)."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.sources.tables import read_ntriples
    from rdflib_r2r_ray.state.checkpoint import write_ntriples

    rows = [
        ("<s1>", "<p>", '"li\nne\twith \\ stuff"^^<http://ex/dt>'),
        ("<s2>", "<p>", '"multi\nline"@en'),
    ]
    t = pa.table({"subj": [r[0] for r in rows], "pred": [r[1] for r in rows],
                  "obj": [r[2] for r in rows]})
    out = str(tmp_path / "nt")
    write_ntriples(rd.from_arrow(t), out, num_partitions=1, resume=False)
    data = open(str(tmp_path / "nt" / "part=00000" / "data.nt")).read()
    assert len([l for l in data.splitlines() if l.strip()]) == 2  # one line per triple
    back = {(r["subj"], r["pred"], r["obj"]) for r in read_ntriples(out).take_all()}
    assert back == set(rows)


def test_ntriples_reader_tolerates_whitespace_and_comments(ray_session, tmp_path):
    from rdflib_r2r_ray.sources.tables import read_ntriples

    p = tmp_path / "x.nt"
    p.write_text("# comment\n\n<a>\t<p>   <b> .\n  <c> <p> \"v\" .  \n")
    back = {(r["subj"], r["pred"], r["obj"])
            for r in read_ntriples(str(p)).take_all()}
    assert back == {("<a>", "<p>", "<b>"), ("<c>", "<p>", "v")}


def test_ntriples_reader_raises_on_garbage(ray_session, tmp_path):
    import pytest as _pytest

    from rdflib_r2r_ray.sources.tables import read_ntriples

    p = tmp_path / "bad.nt"
    p.write_text("<a> <p> <b> .\nthis is not a triple\n")
    with _pytest.raises(Exception, match="unparseable"):
        read_ntriples(str(p)).take_all()


def test_json_extract_missing_field(ray_session):
    """Props rows without the field yield null → excluded from n_with_k."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.relq import q_rel_json_extract  # noqa: F401 (shape ref)
    import pyarrow.compute as pc

    b = pa.table({"props": ['{"k": 3}', '{"other": 1}', None, '{"k": -2}']})
    m = pc.extract_regex(b["props"].combine_chunks(), r'"k":\s*(?P<v>-?\d+)')
    k = pc.cast(pc.struct_field(m, "v"), pa.int64())
    assert k.to_pylist() == [3, None, None, -2]


# ---------------------------------------------------------------------------
# temporal joins (as-of / range) over the co-partitioned exchange
# ---------------------------------------------------------------------------

def _tj_tables():
    import datetime as dt

    T = lambda d, h=0: dt.datetime(2024, 1, d, h)
    left = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([10, 10, 20, 30], pa.int64()),
        "t": pa.array([T(5), T(1), T(3), T(9)], pa.timestamp("us")),
    })
    right = pa.table({
        "rk": pa.array([10, 10, 20, 40], pa.int64()),
        "rt": pa.array([T(2), T(4), T(9), T(1)], pa.timestamp("us")),
        "val": pa.array([100, 200, 300, 400], pa.int64()),
    })
    return left, right


def test_asof_join_backward_inner(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import asof_join

    left, right = _tj_tables()
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "rk", "t", "rt",
        right_keep=["rt", "val"],
    ).to_pandas().sort_values("id").reset_index(drop=True)
    # id=1 (k=10, t=Jan5) -> rt=Jan4/200; id=2 (t=Jan1) -> no prior -> drop;
    # id=3 (k=20, t=Jan3) -> rt=Jan9 is after -> drop; id=4 (k=30) -> no key
    assert out["id"].tolist() == [1]
    assert out["val"].tolist() == [200]


def test_asof_join_forward(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import asof_join

    left, right = _tj_tables()
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "rk", "t", "rt",
        strategy="forward", right_keep=["val"],
    ).to_pandas().sort_values("id").reset_index(drop=True)
    # id=1 t=Jan5: no k=10 right at/after Jan5 -> drop; id=2 t=Jan1 -> Jan2/100
    # id=3 k=20 t=Jan3 -> Jan9/300; id=4 no key
    assert out["id"].tolist() == [2, 3]
    assert out["val"].tolist() == [100, 300]


def test_asof_join_empty_side(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import asof_join

    left, right = _tj_tables()
    empty_right = right.slice(0, 0)
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(empty_right), "k", "rk", "t", "rt",
    )
    assert out.count() == 0
    # schema survives the empty exchange
    assert set(out.schema().names) == {"id", "k", "t", "rt"}


def test_range_join_band(ray_session):
    import datetime as dt

    import ray.data as rd

    from rdflib_r2r_ray.relational import range_join

    left, right = _tj_tables()
    out = range_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "rk", "t", "rt",
        dt.timedelta(0), dt.timedelta(days=2),
    ).to_pandas().sort_values(["id", "val"]).reset_index(drop=True)
    # id=1 (k=10, t=Jan5): rt=Jan4 (d=1) -> 200; rt=Jan2 (d=3) out of band
    assert list(zip(out["id"], out["val"])) == [(1, 200)]


def test_range_join_shared_time_column_name(ray_session):
    """Both sides naming the time column identically (e.g. both 'ts') must
    not crash the band filter: right_on ships through the private __r_
    rename even when its name collides with a left column."""
    import datetime as dt

    import ray.data as rd

    from rdflib_r2r_ray.relational import range_join

    T = lambda d: dt.datetime(2024, 1, d)
    left = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "k": pa.array([10, 10], pa.int64()),
        "ts": pa.array([T(5), T(1)], pa.timestamp("us")),
    })
    right = pa.table({
        "rk": pa.array([10, 10], pa.int64()),
        "ts": pa.array([T(4), T(2)], pa.timestamp("us")),
        "val": pa.array([100, 200], pa.int64()),
    })
    out = range_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "rk", "ts", "ts",
        dt.timedelta(0), dt.timedelta(days=2),
    ).to_pandas().sort_values(["id", "val"]).reset_index(drop=True)
    # id=1 ts=Jan5: right Jan4 (d=1) -> 100; Jan2 (d=3) out of band
    # id=2 ts=Jan1: both right rows are after -> negative delta -> drop
    assert list(zip(out["id"], out["val"])) == [(1, 100)]
    assert "ts" in out.columns  # left's ts survives; right's is internal


def test_asof_join_colliding_right_keep_raises(ray_session):
    import ray.data as rd
    import pytest as _pytest

    from rdflib_r2r_ray.relational import asof_join

    left, right = _tj_tables()
    renamed = right.rename_columns(["rk", "rt", "t"])  # 't' collides with left
    with _pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_arrow(left), rd.from_arrow(renamed),
                  "k", "rk", "t", "rt", right_keep=["t"])


def test_bloom_semi_join_nullable_and_negative_keys(ray_session):
    """Nullable int probe keys must not round-trip through float64 (NaN
    backing loses >2^53 precision and negative keys hit undefined
    float→uint conversion) — result must equal the exact semi join."""
    import ray.data as rd

    from rdflib_r2r_ray.relational import bloom_semi_join, semi_join

    big = (1 << 60) + 7
    left = pa.table({
        "k": pa.array([big, big + 1, -5, -6, None, 42], pa.int64()),
        "tag": pa.array(list("abcdef")),
    })
    right = pa.table({"k": pa.array([big, -5, 42], pa.int64())})
    out = bloom_semi_join(rd.from_arrow(left), rd.from_arrow(right), ["k"])
    exact = semi_join(rd.from_arrow(left), rd.from_arrow(right), ["k"])
    assert sorted(out.to_pandas()["tag"]) == sorted(exact.to_pandas()["tag"]) == ["a", "c", "f"]


def test_quantiles_disc_empty_and_tiny(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import quantiles_disc

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert quantiles_disc(empty, "x", [0.5]).count() == 0
    tiny = rd.from_arrow(pa.table({"x": pa.array([10, 20, 30, 40], pa.int64())}))
    out = {r["q"]: r["value"] for r in quantiles_disc(tiny, "x", [0.25, 0.5, 0.9]).take_all()}
    # DuckDB quantile_disc rule: value at 1-indexed rank ceil(q*n)
    assert out == {0.25: 10, 0.5: 20, 0.9: 40}


def test_stratified_sample_deterministic(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import stratified_sample

    t = pa.table({
        "id": pa.array(list(range(100)), pa.int64()),
        "g": pa.array(["a" if i % 2 else "b" for i in range(100)]),
    })
    a = stratified_sample(rd.from_arrow(t), ["g"], 5, "id").to_pandas()
    b = stratified_sample(rd.from_arrow(t), ["g"], 5, "id").to_pandas()
    assert len(a) == 10 and set(a["g"]) == {"a", "b"}
    assert sorted(map(tuple, a.itertuples(index=False))) == sorted(map(tuple, b.itertuples(index=False)))


def test_bloom_semi_join_equals_exact(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import bloom_semi_join, semi_join

    left = pa.table({"k": pa.array(list(range(1000)), pa.int64()),
                     "v": pa.array([f"x{i}" for i in range(1000)])})
    right = pa.table({"rk": pa.array([2, 3, 5, 7, 11, 990], pa.int64())})
    got = bloom_semi_join(rd.from_arrow(left), rd.from_arrow(right),
                          on=["k"], right_on=["rk"]).to_pandas()
    assert sorted(got["k"]) == [2, 3, 5, 7, 11, 990]


def test_grouped_quantiles_matches_rank_rule(ray_session):
    import ray.data as rd

    from rdflib_r2r_ray.relational import grouped_quantiles_disc

    t = pa.table({
        "g": pa.array(["a"] * 4 + ["b"] * 5),
        "x": pa.array([10, 20, 30, 40, 1, 2, 3, 4, 5], pa.int64()),
    })
    out = {(r["g"], r["q"]): r["value"]
           for r in grouped_quantiles_disc(rd.from_arrow(t), ["g"], "x", [0.5, 0.9]).take_all()}
    # ceil(0.5*4)=2 -> 20; ceil(0.9*4)=4 -> 40; ceil(0.5*5)=3 -> 3; ceil(0.9*5)=5 -> 5
    assert out == {("a", 0.5): 20, ("a", 0.9): 40, ("b", 0.5): 3, ("b", 0.9): 5}


def test_pii_scrub_counts_and_redaction():
    import pyarrow as pa

    from rdflib_r2r_ray.stages.text import pii_redact, pii_scrub

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [
            "mail a.b+c@ex-ample.co.uk or d@e.io, call 212-555-0199",
            "server at 10.0.3.77 and 192.168.0.1; no mail",
            "nothing sensitive here",
        ],
    })
    out = pii_scrub(batch)
    assert out["n_email"].to_pylist() == [2, 0, 0]
    assert out["n_phone"].to_pylist() == [1, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0]
    red = pii_redact(batch["text"]).to_pylist()
    assert red[0] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert red[1] == "server at <IP> and <IP>; no mail"
    assert red[2] == "nothing sensitive here"
    # clean_len is the redacted length (codepoints), matching SQL length()
    assert out["clean_len"].to_pylist() == [len(r) for r in red]


def test_normalize_text_kernels(ray_session):
    import pyarrow as pa

    from rdflib_r2r_ray.stages.text import normalize_text

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["  Hello,   WORLD!! ", "á b", None]),
    })
    out = normalize_text(batch)
    assert out["norm_text"].to_pylist()[0] == "hello world"
    # NFC composes a + combining acute into á; punctuation stripped
    assert out["norm_text"].to_pylist()[1] == "á b"
    assert out["norm_text"].to_pylist()[2] is None
    assert out["n_tokens"].to_pylist() == [2, 2, 0]


def test_decontaminator_drops_snippet_hits(ray_session):
    import pyarrow as pa
    import ray

    from rdflib_r2r_ray.stages.text import Decontaminator

    ref = ray.put(["forbidden phrase", None])
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["clean doc", "has the forbidden phrase inside", None]),
    })
    out = Decontaminator(ref)(batch)
    assert out["doc_id"].to_pylist() == [1, 3]  # null text is kept


def test_pack_sequences_windows(ray_session):
    """Packing = floor(preceding token sum / budget) per language, doc_id
    order — packs never span languages, overflow goes to the NEXT pack."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray import dataq

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 10], pa.int64()),
        "text": pa.array(["w " * 300, "w " * 300, "w " * 300, "w " * 10, "x " * 600]),
        "lang": pa.array(["en", "en", "en", "en", "de"]),
    })
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="packtest_")
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r["pack_id"] for r in dataq.q_text_pack_sequences(d).take_all()}
    # en: prev sums 0,300,600,900 -> packs 0,0,1,1 (budget 512); de: 0
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 10: 0}


def test_repetition_stats_edge_cases():
    """Gopher repetition metrics: known small docs + the empty/one-word
    edge (split('') → [''] on both the polars and DuckDB sides)."""
    import pyarrow as pa
    from rdflib_r2r_ray.stages.text import RepetitionStats

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b a b a b",        # 6 words, 2 unique; bigrams: ab×3 ba×2 (all dup)
            "x y z",              # all unique; bigrams xy, yz (no dups)
            "w",                  # single word, no bigrams
            "",                   # split('') -> [''] : one empty word
        ], pa.string()),
    })
    out = RepetitionStats()(batch)
    d = {n: out[n].to_pylist() for n in out.schema.names}
    assert d["n_words"] == [6, 3, 1, 1]
    assert d["n_unique_words"] == [2, 3, 1, 1]
    assert d["dup_word_permille"] == [1000 * 4 // 6, 0, 0, 0]
    assert d["top_bigram_count"] == [3, 1, 0, 0]
    assert d["dup_bigram_permille"] == [1000, 0, 0, 0]


def test_semantic_dedup_controlled(ray_session):
    """Two well-separated directions; near-dup copies within each cluster.
    k-means must recover the grouping and SemDeDup must keep exactly the
    lowest-id member of each near-dup set."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rdflib_r2r_ray.stages.ann import kmeans_distributed, semantic_dedup

    rng = np.random.default_rng(3)
    dim = 14
    vecs, ids = [], []
    for i in range(12):
        v = np.zeros(dim)
        v[i % 2] = 1.0        # cluster direction (dim 0 or dim 1)
        v[2 + i] = 0.45       # distinct offset: cos(orig_i, orig_j) ≈ 0.83
        vecs.append(v)
        ids.append(i)
    for i in range(12):
        # (i, i+100) are near-identical copies: cos ≈ 1 > 0.9
        vecs.append(vecs[i] + 0.0005 * rng.normal(size=dim))
        ids.append(i + 100)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([v.tolist() for v in vecs],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl).repartition(4)
    cent = kmeans_distributed(ds, k=2, iters=2)
    assert cent.shape == (2, dim)
    out = semantic_dedup(ds, k=2, iters=2, threshold=0.9).to_pandas()
    assert len(out) == 24
    by_id = dict(zip(out.vec_id, out.kept))
    # every original id kept, every +100 copy dropped (same cluster, cos≈1)
    assert all(by_id[i] for i in range(12))
    assert not any(by_id[i + 100] for i in range(12))
    # clusters split by direction
    cl = dict(zip(out.vec_id, out.cluster))
    even = {cl[i] for i in range(0, 12, 2)}
    odd = {cl[i] for i in range(1, 12, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd


# ---------------------------------------------------------------------------
# round-4 curation operators: paragraph dedup, dup-span flagging, mixture
# sampling, epoch shuffle/sharding
# ---------------------------------------------------------------------------

def test_paragraph_dedup_keeps_first_occurrence(ray_session):
    """A planted exact copy must lose every paragraph; the original keeps
    all of its chunks (the sf0.001 base corpus has no duplicate texts, and
    full 10-token chunks of distinct texts do not collide here)."""
    from rdflib_r2r_ray.dataq import DUP_OFFSET, q_dd_paragraph

    rows = {r["doc_id"]: r for r in q_dd_paragraph(SF).take_all()}
    copies = [d for d in rows if d >= DUP_OFFSET]
    assert not copies, f"copies survived paragraph dedup: {copies[:5]}"
    assert rows  # originals with >=1 surviving paragraph exist
    # reassembly is in paragraph order: dedup_text must be a prefix-joined
    # subsequence of the source text's token stream
    import ray.data as rd
    src = {r["doc_id"]: r["text"] for r in
           rd.read_parquet(f"{SF}/documents.parquet").take_all()}
    did, r = next(iter(rows.items()))
    assert r["dedup_text"].split()[:3] == src[did].lower().split()[:3]


def test_dup_ngrams_permille(ray_session):
    """Planted one-token-append near-copies: every window of an original is
    shared with its copy (1000 permille); the copy has exactly one window of
    its own (the tail window)."""
    from rdflib_r2r_ray.dataq import DUP_OFFSET, q_dd_dup_ngrams

    rows = {r["doc_id"]: r for r in q_dd_dup_ngrams(SF).take_all()}
    orig = [r for d, r in rows.items() if d < DUP_OFFSET]
    assert orig and all(r["dup_permille"] == 1000 for r in orig)
    for d, r in rows.items():
        if d >= DUP_OFFSET:
            assert r["n_windows"] - r["n_dup"] == 1


def test_mixture_sample_deterministic_and_weighted(ray_session):
    from rdflib_r2r_ray.dataq import q_text_mixture_sample

    a = sorted(r["doc_id"] for r in q_text_mixture_sample(SF).take_all())
    b = sorted(r["doc_id"] for r in q_text_mixture_sample(SF).take_all())
    assert a == b and len(a) > 0
    rows = q_text_mixture_sample(SF).take_all()
    # kept rows respect the per-source weight formula
    for r in rows[:50]:
        n = int(r["source"][3:])
        assert r["weight_permille"] == 50 + 45 * (n % 20)


def test_shard_shuffle_dense_positions(ray_session):
    from collections import defaultdict

    from rdflib_r2r_ray.dataq import N_SHARDS, q_text_shard_shuffle

    rows = q_text_shard_shuffle(SF).take_all()
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r["shard"] < N_SHARDS
        by_shard[r["shard"]].append(r["pos"])
    # positions are dense 0..n-1 within every shard
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_chunk_windows_overlap_and_tail(ray_session):
    """Chunk k covers tokens [8k, 8k+12): full chunks are 12 tokens with a
    4-token overlap against the next chunk; the final chunk is the residue."""
    from rdflib_r2r_ray.dataq import CHUNK_STRIDE, CHUNK_W, q_text_chunk_windows

    rows = q_text_chunk_windows(SF).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, chunks in list(by_doc.items())[:20]:
        chunks.sort(key=lambda r: r["chunk_id"])
        toks = " ".join(c["chunk_text"] for c in chunks if True)
        # overlap: chunk k's last 4 tokens == chunk k+1's first 4 (when full)
        for a, b in zip(chunks, chunks[1:]):
            if a["n_tokens"] == CHUNK_W:
                assert (a["chunk_text"].split()[CHUNK_STRIDE:]
                        == b["chunk_text"].split()[:CHUNK_W - CHUNK_STRIDE])
        assert chunks[0]["chunk_id"] == 0


def test_quality_score_weights_are_token_local(ray_session):
    """Same token stream ⇒ same score: the scorer is a pure function of the
    tokens, so permuting docs or re-running is stable; and score equals the
    sum of per-token weights computed independently."""
    from rdflib_r2r_ray.dataq import QSCORE_A, q_text_quality_score
    import ray.data as rd

    rows = {r["doc_id"]: r for r in q_text_quality_score(SF).take_all()}
    src = {r["doc_id"]: r["text"] for r in
           rd.read_parquet(f"{SF}/documents.parquet").take_all()}
    import re
    for did in list(rows)[:20]:
        toks = re.findall(r"[a-z0-9_]+", (src[did] or "").lower())
        w = sum((((len(t) * 7 + ord(t[0]) * 31 + ord(t[-1])) * QSCORE_A)
                 % (1 << 32)) % 201 - 100 for t in toks)
        assert rows[did]["score"] == w
        assert rows[did]["keep"] == (1 if w >= 0 else 0)


def test_knn_graph_multiblock_vs_numpy(ray_session):
    """Tile-grid kNN over many small blocks equals the single-matrix numpy
    answer — partial top-k per tile loses nothing."""
    import ray.data as rd
    from rdflib_r2r_ray.stages.ann import knn_graph

    rng = np.random.default_rng(7)
    n, d, k = 60, 8, 5
    m = rng.normal(size=(n, d))
    rows = [{"vec_id": i, "embedding": m[i].astype(np.float32).tolist()}
            for i in range(n)]
    out = knn_graph(rd.from_items(rows, override_num_blocks=7), k=k).take_all()

    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    # float32 storage: replicate the pipeline's precision exactly
    u32 = m.astype(np.float32).astype(np.float64)
    u32 = u32 / np.linalg.norm(u32, axis=1, keepdims=True)
    sims = u32 @ u32.T
    np.fill_diagonal(sims, -2.0)
    want = set()
    for i in range(n):
        order = sorted(range(n), key=lambda j: (-sims[i, j], j))[:k]
        want |= {(i, j, r + 1) for r, j in enumerate(order)}
    got = {(r["vec_id"], r["nbr_id"], r["rank"]) for r in out}
    assert got == want


def test_tfidf_df_spans_blocks(ray_session):
    """df counts a term's docs across ALL blocks (the term-keyed exchange
    sees complete groups), and per-doc top-k is deterministic."""
    import ray.data as rd
    from rdflib_r2r_ray import dataq

    docs = [
        {"doc_id": 0, "text": "apple banana apple"},
        {"doc_id": 1, "text": "apple cherry"},
        {"doc_id": 2, "text": "banana banana date"},
        {"doc_id": 3, "text": "apple date date"},
    ]

    def fake_docs(sf_dir):
        return rd.from_items(docs, override_num_blocks=4)

    orig = dataq._docs
    dataq._docs = fake_docs
    try:
        rows = dataq.q_text_tfidf_top("ignored").take_all()
    finally:
        dataq._docs = orig
    by = {(r["doc_id"], r["term"]): r for r in rows}
    # apple appears in docs 0,1,3 -> df 3; date in 2,3 -> df 2
    assert by[(0, "apple")]["df"] == 3 and by[(0, "apple")]["tf"] == 2
    assert by[(3, "date")]["df"] == 2 and by[(3, "date")]["tf"] == 2
    assert by[(0, "apple")]["score"] == 2 * 1_000_000 // 3
    # doc 3: date (2*1e6//2=1e6) beats apple (1e6//3)
    d3 = sorted((r["score"], r["term"]) for r in rows if r["doc_id"] == 3)
    assert d3[-1][1] == "date"


def test_cms_overcount_only_and_weighted_merge():
    """CMS never undercounts; sum-merge of halves == whole-input fold; the
    weighted (key, count) fold equals the raw-occurrence-stream fold."""
    from rdflib_r2r_ray.stages.dedup import _pl
    from rdflib_r2r_ray.stages.sketch import cms_estimate, cms_partial

    pl = _pl()
    rng = np.random.default_rng(3)
    keys = [f"tok{i}" for i in range(2000)]
    counts = rng.integers(1, 50, len(keys))
    stream = np.repeat(np.arange(len(keys)), counts)
    h_all = pl.Series([keys[i] for i in stream]).hash(seed=7).to_numpy().astype(np.uint64)
    h_keys = pl.Series(keys).hash(seed=7).to_numpy().astype(np.uint64)

    whole = cms_partial(h_all, log2_w=10)
    half = len(h_all) // 2
    merged = cms_partial(h_all[:half], log2_w=10) + cms_partial(h_all[half:], log2_w=10)
    assert (whole == merged).all()
    weighted = cms_partial(h_keys, log2_w=10, weights=counts.astype(np.int64))
    assert (whole == weighted).all()

    est = cms_estimate(whole, h_keys, log2_w=10)
    assert (est >= counts).all()          # one-sided error, always
    assert int(whole[0].sum()) == len(h_all)


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_link_prediction_tiny_graph(ray_session, monkeypatch, path):
    """Square 1-2-3-4-1: each diagonal pair shares BOTH its neighbors
    (cn=2, ra=2*1000//2=1000) and is non-adjacent; adjacent pairs share
    none and must not appear."""
    import ray.data as rd

    from rdflib_r2r_ray.stages import graph as G
    from rdflib_r2r_ray.stages.graph import link_prediction

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)

    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    et = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                   "b": pa.array([e[1] for e in edges], pa.int64())})
    rows = {(r["u"], r["v"]): (r["cn"], r["ra"])
            for r in link_prediction(rd.from_arrow(et), min_common=2).take_all()}
    assert rows == {(1, 3): (2, 1000), (2, 4): (2, 1000)}


def test_quantile_summary_rank_bound(ray_session):
    """MRL summary: per-block compress + driver merge holds the deterministic
    rank-error contract (≤ ceil(n/2k) + 1) on a skewed multi-block input,
    and weights always sum to n exactly."""
    import math

    import numpy as np
    import ray.data as rd
    from rdflib_r2r_ray.stages.sketch import (approx_quantiles,
                                              quantile_summary_partial)

    # skewed deterministic values (lognormal-ish via squaring a hash walk)
    n = 120_000
    x = ((np.arange(n, dtype=np.int64) * 2654435761) % 100_000).astype(np.float64)
    v = (x / 1000.0) ** 2
    vals, w = quantile_summary_partial(v, 256)
    assert int(w.sum()) == n
    assert len(vals) <= 256

    ds = rd.from_arrow(pa.table({"value": v})).repartition(13)
    qs = [0.1, 0.5, 0.99]
    ests, n_out, eps = approx_quantiles(ds, "value", qs, k=256)
    assert n_out == n
    sv = np.sort(v)
    for q, est in zip(qs, ests):
        target = math.ceil(q * n)
        true_rank = int(np.searchsorted(sv, est, side="right"))
        assert abs(true_rank - target) <= eps + 1, (q, true_rank, target, eps)


def test_skew_join_both_paths(ray_session):
    """skew_join == plain inner join bit-for-bit, with hot keys broadcast
    and the cold tail hash-joined; the all-cold and hot-key-cap edges."""
    import numpy as np
    import ray.data as rd
    from rdflib_r2r_ray.relational import hash_join, skew_join

    n = 5000
    # key 'hot' on 70% of rows, the rest spread over 50 cold keys
    ks = np.where(np.arange(n) % 10 < 7, "hot",
                  np.char.add("k", (np.arange(n) % 50).astype(str)))
    left = rd.from_arrow(pa.table({"k": ks, "v": np.arange(n)})).repartition(8)
    right = rd.from_arrow(pa.table({
        "k": ["hot"] + [f"k{i}" for i in range(50)],
        "attr": list(range(51)),
    }))

    got = skew_join(left, right, on=["k"], hot_count=1000).to_pandas()
    want = hash_join(left, right, ["k"]).to_pandas()
    key = lambda df: df.sort_values(["k", "v"]).reset_index(drop=True)
    assert key(got).equals(key(want[got.columns]))

    # all-cold threshold: falls back to the pure hash join
    cold = skew_join(left, right, on=["k"], hot_count=10**9).to_pandas()
    assert key(cold).equals(key(want[cold.columns]))

    # loud failure when "hot" detection would broadcast unbounded state
    import rdflib_r2r_ray.relational as R
    import pytest
    old = R.SKEW_JOIN_MAX_HOT_KEYS
    R.SKEW_JOIN_MAX_HOT_KEYS = 10
    try:
        with pytest.raises(ValueError, match="hot keys"):
            skew_join(left, right, on=["k"], hot_count=1).to_pandas()
    finally:
        R.SKEW_JOIN_MAX_HOT_KEYS = old


def test_levenshtein_batch_exact():
    """Vectorized DP == DuckDB's levenshtein on random pairs, including
    empty strings and mixed-length shape groups."""
    import duckdb
    import numpy as np
    from rdflib_r2r_ray.stages.text import levenshtein_batch

    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abcdef"), size=rng.integers(0, 10)))
             for _ in range(300)]
    a = [words[i] for i in rng.integers(0, 300, 400)]
    b = [words[i] for i in rng.integers(0, 300, 400)]
    got = levenshtein_batch(a, b)
    con = duckdb.connect()
    want = [con.execute("SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
            for x, y in zip(a, b)]
    assert (got == np.asarray(want, dtype=np.int64)).all()


def test_bfs_hops_distributed_matches_local(ray_session):
    """The distributed Bellman-Ford loop (forced by local_max_edges=0) must
    agree exactly with the one-task vectorized path on a graph whose
    diameter exceeds the hop budget (unreached nodes absent from both)."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.graph import bfs_hops

    # chain 0-1-2-...-9 plus a separate triangle 100-101-102
    und = pa.table({
        "a": pa.array(list(range(9)) + [100, 100, 101], pa.int64()),
        "b": pa.array(list(range(1, 10)) + [101, 102, 102], pa.int64()),
    })
    seeds = pa.table({"node": pa.array([0, 100], pa.int64()),
                      "hop": pa.array([0, 0], pa.int64())})
    args = dict(iters=3)
    local = bfs_hops(rd.from_arrow(und), rd.from_arrow(seeds), **args)
    dist = bfs_hops(rd.from_arrow(und), rd.from_arrow(seeds),
                    local_max_edges=0, **args)
    key = lambda df: sorted(map(tuple, df.to_pandas().values.tolist()))
    got, want = key(dist), key(local)
    assert got == want
    # hop budget 3: chain nodes 4..9 unreachable; triangle fully covered
    assert want == [(0, 0), (1, 1), (2, 2), (3, 3),
                    (100, 0), (101, 1), (102, 1)]


def test_nt_nq_readers_skip_comment_lines_ending_in_period(ray_session, tmp_path):
    """'# generated by tool v1 .' must be ignored, not parsed as a triple."""
    from rdflib_r2r_ray.sources.tables import read_nquads, read_ntriples

    nt = tmp_path / "g.nt"
    nt.write_text("# generated by tool v1 .\n<a> <p> \"x\" .\n\n# <s> <p> \"y\" .\n")
    rows = sorted(map(tuple, read_ntriples(str(nt)).to_pandas().values.tolist()))
    assert rows == [("<a>", "<p>", "x")]

    nq = tmp_path / "g.nq"
    nq.write_text("# header .\n<a> <p> \"x\" <g> .\n<b> <p> \"y\" .\n")
    rows = sorted(map(tuple, read_nquads(str(nq)).to_pandas().values.tolist()))
    assert rows == [("<a>", "<p>", "x", "<g>"), ("<b>", "<p>", "y", None)]


def test_shacl_numeric_bound_on_non_numeric_value(ray_session):
    """A non-numeric value on a numerically-bounded path reports a
    violation instead of crashing the validation job."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray import shacl

    g = rd.from_arrow(pa.table({
        "subj": ["<a>", "<a>", "<b>", "<b>"],
        "pred": ["<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<v>",
                 "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "<v>"],
        "obj": ["<C>", '"5"^^<http://www.w3.org/2001/XMLSchema#integer>',
                "<C>", "<not-a-number>"],
    }))
    rep = shacl.validate(g, [shacl.NodeShape(
        target_class="<C>",
        properties=(shacl.PropertyShape("<v>", max_inclusive=10),))]).to_pandas()
    assert len(rep) == 1 and rep.iloc[0]["focus"] == "<b>"
    assert rep.iloc[0]["constraint"] == "maxInclusive"


def test_zlib_ratio_exact(ray_session):
    """text_zlib_ratio: every (raw, comp, permille, keep) recomputed with
    the same stdlib zlib must match bit-exactly — the exactness gate for
    the one registered query without a SQL oracle (DuckDB has no DEFLATE);
    edge rows (empty text -> permille 1000, keep 0) included."""
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.dataq import q_text_zlib_ratio
    from rdflib_r2r_ray.stages.text import ZLIB_SCHEMA, zlib_ratio

    out = q_text_zlib_ratio(SF)
    assert out.schema().names == ZLIB_SCHEMA.names
    rows = {r["doc_id"]: r for r in out.take_all()}
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).take_all()
    assert len(rows) == len(docs)
    for d in docs:
        b = (d["text"] or "").encode("utf-8")
        raw, comp = len(b), (len(zlib.compress(b, 6)) if b else 0)
        perm = comp * 1000 // raw if raw else 1000
        r = rows[d["doc_id"]]
        assert (r["raw_bytes"], r["comp_bytes"], r["zlib_permille"]) == (raw, comp, perm)
        assert r["keep"] == int(250 <= perm <= 900)

    # edge semantics: empty + whitespace + highly repetitive + random-ish
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["", " ", "spam " * 400, "kq9#zP!v1x" * 40],
    })
    got = zlib_ratio(tbl)
    assert got["raw_bytes"].to_pylist()[0] == 0
    assert got["zlib_permille"].to_pylist()[0] == 1000
    assert got["keep"].to_pylist()[0] == 0
    assert got["zlib_permille"].to_pylist()[2] < 50      # repetitive -> tiny
    assert got["keep"].to_pylist()[2] == 0


def test_sssp_weighted_distributed_matches_local(ray_session):
    """Weighted Bellman-Ford: the distributed loop (local_max_edges=0) must
    agree exactly with the one-task path, and weights must matter — the
    direct heavy edge loses to a longer-but-lighter detour."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.graph import bfs_hops

    # 0->3 direct weight 10; detour 0-1-2-3 weights 1+1+1 = 3
    und = pa.table({
        "a": pa.array([0, 0, 1, 2], pa.int64()),
        "b": pa.array([3, 1, 2, 3], pa.int64()),
        "w": pa.array([10, 1, 1, 1], pa.int64()),
    })
    seeds = pa.table({"node": pa.array([0], pa.int64()),
                      "cost": pa.array([0], pa.int64())})
    args = dict(iters=4, hop_col="cost", weight_col="w")
    local = bfs_hops(rd.from_arrow(und), rd.from_arrow(seeds), **args)
    dist = bfs_hops(rd.from_arrow(und), rd.from_arrow(seeds),
                    local_max_edges=0, **args)
    key = lambda ds: sorted(map(tuple, ds.to_pandas().values.tolist()))
    got, want = key(dist), key(local)
    assert got == want
    assert want == [(0, 0), (1, 1), (2, 2), (3, 3)]  # detour beats w=10 edge


def test_hard_negative_topk_label_mask(ray_session):
    """Hard-negative mining returns only cross-label neighbors, exactly k
    per query, and yields NOTHING when every vector shares the query's
    label (empty candidate set, not a crash)."""
    import ray.data as rd

    from rdflib_r2r_ray.stages.ann import hard_negative_topk

    rng = np.random.RandomState(0)
    vecs = rng.randn(30, 8)
    labels = [i % 3 for i in range(30)]
    t = pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vecs]),
        "label": pa.array(labels, pa.int64()),
    })
    q = pa.table({
        "query_id": pa.array([0, 1], pa.int64()),
        "embedding": t["embedding"].slice(0, 2),
        "label": pa.array([0, 1], pa.int64()),
    })
    out = hard_negative_topk(rd.from_arrow(t), q, k=5).to_pandas()
    for _, r in out.iterrows():
        assert labels[r["vec_id"]] != labels[r["query_id"]]
    assert set(out.groupby("query_id").size()) == {5}
    assert set(out["rank"]) == {1, 2, 3, 4, 5}

    t2 = t.set_column(2, "label", pa.array([7] * 30, pa.int64()))
    q2 = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "embedding": t["embedding"].slice(0, 1),
        "label": pa.array([7], pa.int64()),
    })
    out2 = hard_negative_topk(rd.from_arrow(t2), q2, k=5).to_pandas()
    assert len(out2) == 0


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_graph_closeness_paths(ray_session, monkeypatch, path):
    """Both execution paths of the per-seed closeness panel agree on
    sf0.001, and every seed reaches at least one node with sane sums
    (harmonic ≤ 1000·reached, sum_hops ≥ reached)."""
    from rdflib_r2r_ray import dataq
    from rdflib_r2r_ray.stages import graph as G

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)
    rows = {r["seed"]: (r["n_reached"], r["sum_hops"], r["harmonic_milli"])
            for r in dataq.q_graph_closeness("/root/testdata/sf0.001")
            .take_all()}
    assert rows
    for seed, (n, sh, hm) in rows.items():
        assert seed % dataq.CLOSE_SEED_MOD == 0
        assert n >= 1 and sh >= n and hm <= 1000 * n
    if path == "local":
        test_graph_closeness_paths._local = rows
    else:
        assert rows == test_graph_closeness_paths._local


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_graph_eccentricity_paths(ray_session, monkeypatch, path):
    """Both execution paths of the eccentricity panel agree on sf0.001;
    ecc is within the hop cap and positive whenever anything is reached."""
    from rdflib_r2r_ray import dataq
    from rdflib_r2r_ray.stages import graph as G

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)
    rows = {r["seed"]: (r["ecc"], r["n_reached"])
            for r in dataq.q_graph_eccentricity("/root/testdata/sf0.001")
            .take_all()}
    assert rows
    for seed, (ecc, n) in rows.items():
        assert seed % dataq.ECC_SEED_MOD == 0
        assert 1 <= ecc <= dataq.ECC_HOPS and n >= ecc
    if path == "local":
        test_graph_eccentricity_paths._local = rows
    else:
        assert rows == test_graph_eccentricity_paths._local


@pytest.mark.parametrize("path", ["local", "distributed"])
def test_graph_stress_paths(ray_session, monkeypatch, path):
    """Both execution paths of the stress-centrality panel agree on
    sf0.001; every stress value is a positive integer and seeds (d=0)
    never appear with through-traffic credited as interiors of their own
    trivial paths (hand property: stress > 0 only)."""
    from rdflib_r2r_ray import dataq
    from rdflib_r2r_ray.stages import graph as G

    if path == "distributed":
        monkeypatch.setattr(G, "_LOCAL_GRAPH_MAX_EDGES", 0)
    rows = {r["node"]: r["stress"]
            for r in dataq.q_graph_stress_centrality("/root/testdata/sf0.001")
            .take_all()}
    assert rows and all(v > 0 for v in rows.values())
    if path == "local":
        test_graph_stress_paths._local = rows
    else:
        assert rows == test_graph_stress_paths._local


def test_text_readability_edges(ray_session, tmp_path):
    """Hand-checked Flesch floors: empty text, vowel-less tokens, missing
    sentence punctuation all hit the documented max(1, ·) clamps."""
    import pyarrow.parquet as pq

    from rdflib_r2r_ray import dataq

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "bcd fgh", "Hi there. Go now!"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    rows = {r["doc_id"]: r for r in
            dataq.q_text_readability(str(tmp_path)).take_all()}
    # empty: all floors kick in
    assert (rows[1]["words"], rows[1]["sentences"], rows[1]["syllables"]) \
        == (1, 1, 1)
    # vowel-less: syllables = one per token
    assert (rows[2]["words"], rows[2]["sentences"], rows[2]["syllables"]) \
        == (2, 1, 2)
    # "Hi there. Go now!": 4 words, 2 sentence runs, vowel groups:
    # Hi(i) there(e,e) Go(o) now(o) = 5 groups, no vowel-less tokens
    r3 = rows[3]
    assert (r3["words"], r3["sentences"], r3["syllables"]) == (4, 2, 5)
    assert r3["flesch_milli"] == 206835 - (1015 * 4) // 2 - (84600 * 5) // 4


def test_amie_hub_key_skew(ray_session, tmp_path, monkeypatch, sf_dir):
    """Plant a hub entity (every document mentions 'scan') and assert the
    AMIE body self-join routes its key through skew_join's hot-key
    broadcast path — and that the mined rules are identical to the
    all-cold plain-hash-join plan."""
    import pyarrow.parquet as pq

    import rdflib_r2r_ray.relational as R
    from rdflib_r2r_ray import mlq

    src = pq.read_table(f"{sf_dir}/documents.parquet")
    text = pa.array([t + " scan" for t in src["text"].to_pylist()])
    planted = src.set_column(src.schema.get_field_index("text"), "text", text)
    sf = str(tmp_path)
    pq.write_table(planted, f"{sf}/documents.parquet")

    hub = "<http://kg.ex/e/scan>"
    calls = []
    orig_bj = R.broadcast_join

    def spy(left, small, on, **kw):
        calls.append(list(on))
        return orig_bj(left, small, on, **kw)

    monkeypatch.setattr(R, "broadcast_join", spy)
    monkeypatch.setattr(mlq, "AMIE_HOT_KEY_COUNT", 50)
    hot = mlq.q_kg_amie_rules(sf).to_pandas()
    assert hub in R.LAST_SKEW_JOIN_HOT_KEYS, \
        "planted hub entity not detected as a hot body-join key"
    assert ["z"] in calls, "hot keys never took the broadcast path"

    monkeypatch.setattr(mlq, "AMIE_HOT_KEY_COUNT", 10**9)
    cold = mlq.q_kg_amie_rules(sf).to_pandas()
    key = lambda df: df.sort_values(["p1", "p2", "p3"]).reset_index(drop=True)
    assert key(hot).equals(key(cold))


def test_text_stages_nasty_inputs():
    """Every text stage tolerates empty strings, nulls, emoji, control
    characters, mixed scripts, and 50k-char tokens without raising (the
    webtext reality)."""
    from rdflib_r2r_ray.stages import text as T

    nasty = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": ["", "🎉🎊🚀", "a" * 50000, "héllo wörld 中文 текст",
                 "word " * 3, "\x00\tmixed\nctrl\rchars"],
    })
    with_null = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["ok", None], pa.string()),
    })
    stages = [T.text_stats, T.TokenCounter(), T.QualityScorer(),
              T.LanguageID(), T.pii_scrub, T.normalize_text,
              T.RepetitionStats(), T.zlib_ratio]
    for fn in stages:
        for batch in (nasty, with_null):
            out = fn(batch)
            assert out.num_rows == batch.num_rows
    assert T.rolling_fingerprint("") is not None
    d = T.levenshtein_batch(
        pa.array(["héllo", ""]).to_numpy(zero_copy_only=False),
        pa.array(["hello", "中文"]).to_numpy(zero_copy_only=False))
    assert list(d) == [1, 2]
