"""Checkpointed partitioned write: commit, resume-skip, corrupt-partition
recompute, read-back equivalence."""

import json
import os
import shutil

import pyarrow as pa
import pytest


def _triples_ds(n=500):
    import ray.data as rd

    rows = [
        {"subj": f"<http://ex/s/{i % 97}>", "pred": f"<http://ex/p/{i % 7}>",
         "obj": f'"{i}"'}
        for i in range(n)
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_checkpoint_write_and_readback(ray_session, tmp_path):
    from rdflib_r2r_ray.state.checkpoint import (
        checkpointed_write, completed_partitions, read_checkpointed)

    out = str(tmp_path / "graph")
    ds = _triples_ds()
    res = checkpointed_write(ds, out, keys=["subj"], num_partitions=8,
                             lineage={"rule_version": "v1", "inputs": ["synthetic"]})
    assert res["written"] == 8 and res["rows"] == 500

    done = completed_partitions(out)
    assert len(done) == 8
    m = done[0]
    assert m["rule_version"] == "v1" and "sha1" in m and "wall_sec" in m

    back = read_checkpointed(out).take_all()
    assert len(back) == 500
    assert {r["subj"] for r in back} == {f"<http://ex/s/{i}>" for i in range(97)}
    # co-location invariant: each subject's rows live in exactly one partition
    subj_parts = {}
    for p in sorted(done):
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(out, f"part={p:05d}", "data.parquet"))
        for s in set(t["subj"].to_pylist()):
            assert subj_parts.setdefault(s, p) == p


def test_checkpoint_resume_skips_committed(ray_session, tmp_path):
    from rdflib_r2r_ray.state.checkpoint import checkpointed_write

    out = str(tmp_path / "graph")
    ds = _triples_ds()
    first = checkpointed_write(ds, out, keys=["subj"], num_partitions=8)
    assert first["written"] == 8

    # wipe two partitions (one fully, one manifest-only → "crashed mid-write")
    shutil.rmtree(os.path.join(out, "part=00003"))
    os.remove(os.path.join(out, "part=00005", "_manifest.json"))

    second = checkpointed_write(ds, out, keys=["subj"], num_partitions=8)
    assert second["written"] == 2 and second["skipped"] == 6
    assert second["rows"] == 500

    third = checkpointed_write(ds, out, keys=["subj"], num_partitions=8)
    assert third["written"] == 0 and third["skipped"] == 8


def test_checkpoint_deterministic_bytes(ray_session, tmp_path):
    """Same input ⇒ byte-identical partition files (retry idempotence)."""
    from rdflib_r2r_ray.state.checkpoint import checkpointed_write, completed_partitions

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    checkpointed_write(_triples_ds(), a, keys=["subj"], num_partitions=4)
    checkpointed_write(_triples_ds(), b, keys=["subj"], num_partitions=4)
    sa = {p: m["sha1"] for p, m in completed_partitions(a).items()}
    sb = {p: m["sha1"] for p, m in completed_partitions(b).items()}
    assert sa == sb


def test_ntriples_export(ray_session, tmp_path):
    """NT sink: bare plain literals get escaped+quoted, decorated terms pass
    through, (s,p,o) dedup + sorted deterministic lines + manifests."""
    import os
    import pyarrow as pa
    import ray.data as rd
    from rdflib_r2r_ray.state.checkpoint import completed_partitions, write_ntriples

    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    tbl = pa.table({
        "subj": ["<http://e/a>"] * 4 + ["<http://e/b>"],
        "pred": ["<http://e/p>"] * 5,
        "obj": ['plain "quoted" text\nline2', f'"5"^^<{XSD_INT}>', "<http://e/o>",
                'plain "quoted" text\nline2',  # duplicate -> deduped
                "hello@en tagged? no — bare"],
        "graph": pa.array([None] * 5, pa.string()),
    })
    out = str(tmp_path / "nt")
    res = write_ntriples(rd.from_arrow(tbl), out, num_partitions=2, resume=False)
    assert res["rows"] == 4  # one duplicate removed
    lines = []
    for p in completed_partitions(out):
        path = os.path.join(out, f"part={p:05d}", "data.nt")
        if os.path.exists(path):
            lines += open(path).read().splitlines()
    assert sorted(lines) == sorted([
        '<http://e/a> <http://e/p> "plain \\"quoted\\" text\\nline2" .',
        f'<http://e/a> <http://e/p> "5"^^<{XSD_INT}> .',
        "<http://e/a> <http://e/p> <http://e/o> .",
        '<http://e/b> <http://e/p> "hello@en tagged? no — bare" .',
    ])


def test_checkpoint_adaptive_partition_count(ray_session, tmp_path):
    """num_partitions=None sizes the layout from streamed metadata: a tiny
    output commits ONE partition (the round-3 regression was 64 fsyncs for
    a 6 MB output), and a resumed adaptive run reuses the recorded count."""
    from rdflib_r2r_ray.state.checkpoint import (
        _adaptive_partitions, checkpointed_write, completed_partitions)

    # sizing rule: tiny → 1; ~8 × target rows → 8 (power-of-two divisor of 64)
    assert _adaptive_partitions(500, 10_000) == 1
    assert _adaptive_partitions(3_980_040, 400 << 20) == 8
    assert _adaptive_partitions(10**12, 10**15) == 64  # adaptive cap

    out = str(tmp_path / "graph")
    res = checkpointed_write(_triples_ds(), out, keys=["subj"])
    assert res["written"] == 1 and res["rows"] == 500
    done = completed_partitions(out)
    assert set(done) == {0} and done[0]["num_partitions"] == 1

    # adaptive resume: layout read back from the manifest, nothing re-runs
    res2 = checkpointed_write(_triples_ds(), out, keys=["subj"])
    assert res2["written"] == 0 and res2["skipped"] == 1 and res2["rows"] == 500

    # lost partition re-runs under the recorded layout
    os.remove(os.path.join(out, "part=00000", "_manifest.json"))
    res3 = checkpointed_write(_triples_ds(), out, keys=["subj"])
    assert res3["written"] == 1 and res3["rows"] == 500


def test_checkpoint_per_partition_fsync_mode(ray_session, tmp_path, monkeypatch):
    """GRAFT_COMMIT_FSYNC=per-partition restores the strict in-task
    fsync+manifest protocol (multi-node local disks); results identical."""
    monkeypatch.setenv("GRAFT_COMMIT_FSYNC", "per-partition")
    from rdflib_r2r_ray.state.checkpoint import (
        checkpointed_write, completed_partitions, read_checkpointed)

    out = str(tmp_path / "graph")
    res = checkpointed_write(_triples_ds(), out, keys=["subj"], num_partitions=4)
    assert res["written"] == 4 and res["rows"] == 500
    assert len(completed_partitions(out)) == 4
    assert read_checkpointed(out).count() == 500


def test_checkpoint_detects_lost_data_rename(ray_session, tmp_path):
    """The single-fsync commit protocol's recovery invariant: a manifest
    whose data file is missing or size-mismatched (the crash window where
    the manifest rename persisted but the data rename didn't) is NOT
    treated as committed, and the partition re-runs."""
    from rdflib_r2r_ray.state.checkpoint import (
        checkpointed_write, completed_partitions)

    out = str(tmp_path / "graph")
    ds = _triples_ds()
    checkpointed_write(ds, out, keys=["subj"], num_partitions=8)

    # partition 2: data file vanished entirely (rename lost)
    os.remove(os.path.join(out, "part=00002", "data.parquet"))
    # partition 6: data file truncated (partial page-cache writeback)
    p6 = os.path.join(out, "part=00006", "data.parquet")
    with open(p6, "r+b") as f:
        f.truncate(os.path.getsize(p6) // 2)

    done = completed_partitions(out)
    assert 2 not in done and 6 not in done and len(done) == 6

    res = checkpointed_write(ds, out, keys=["subj"], num_partitions=8)
    assert res["written"] == 2 and res["skipped"] == 6 and res["rows"] == 500
    assert len(completed_partitions(out)) == 8


def test_compact_checkpoint(ray_session, tmp_path):
    """Compaction: many small partitions -> few big ones, identical rows,
    layout keys preserved in the new manifests, old layout removed."""
    import ray.data as rd

    from rdflib_r2r_ray.state.checkpoint import (
        checkpointed_write, compact_checkpoint, completed_partitions,
        read_checkpointed)

    out = str(tmp_path / "ck")
    tbl = pa.table({
        "subj": pa.array([f"<s{i}>" for i in range(2000)]),
        "pred": pa.array(["<p>"] * 2000),
        "obj": pa.array([str(i) for i in range(2000)]),
    })
    checkpointed_write(rd.from_arrow(tbl), out, keys=["subj"],
                       num_partitions=16, resume=False)
    assert len(completed_partitions(out)) == 16
    before = sorted(read_checkpointed(out).to_pandas().itertuples(index=False))

    rep = compact_checkpoint(out, num_partitions=2)
    assert rep["compacted_from"] == 16 and rep["written"] == 2
    done = completed_partitions(out)
    assert len(done) == 2
    assert next(iter(done.values()))["keys"] == ["subj"]
    after = sorted(read_checkpointed(out).to_pandas().itertuples(index=False))
    assert before == after
    import os as _os
    assert not _os.path.exists(out + ".old") and not _os.path.exists(out + ".compact")


def test_empty_graph_roundtrip(ray_session, tmp_path):
    """Writing an EMPTY graph commits a valid checkpoint, and reading it
    back yields an empty typed dataset — not a 'no files' error (a
    filtered shard can legitimately be empty)."""
    import pyarrow as pa
    import ray.data as rd

    from rdflib_r2r_ray.sources.tables import read_nquads, read_ntriples
    from rdflib_r2r_ray.state.checkpoint import write_nquads, write_ntriples

    sch = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                     ("obj", pa.string())])
    d = str(tmp_path / "empty_nt")
    rep = write_ntriples(rd.from_arrow(sch.empty_table()), d,
                         num_partitions=4, resume=False)
    assert rep["rows"] == 0
    ds = read_ntriples(d)
    assert ds.count() == 0 and ds.schema().names == ["subj", "pred", "obj"]

    qsch = pa.schema(list(sch) + [("graph", pa.string())])
    d2 = str(tmp_path / "empty_nq")
    write_nquads(rd.from_arrow(qsch.empty_table()), d2,
                 num_partitions=2, resume=False)
    ds2 = read_nquads(d2)
    assert ds2.count() == 0 and "graph" in ds2.schema().names

    # a genuinely wrong path (an existing dir with neither data nor
    # manifests) still fails loudly
    import os

    import pytest

    stray = str(tmp_path / "not_a_checkpoint")
    os.makedirs(stray)
    with pytest.raises(ValueError, match="no .nt files"):
        read_ntriples(stray)
