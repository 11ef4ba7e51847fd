"""Checkpointed, resumable partitioned output (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Layout (one directory per hash partition — never one giant file):

    out_dir/
      part=00042/
        data.parquet
        _manifest.json     ← written LAST; presence == partition committed

Each manifest records lineage (rule/pipeline version, input description),
metrics (rows, bytes, wall seconds) and a content checksum.  A re-run with
the same ``out_dir`` skips every partition whose manifest is complete, so a
failed 100 TB job resumes from where it stopped instead of recomputing.

Mechanics: rows are hash-partitioned on a key column via the same
map/reduce-style exchange as the dedup (uniform hash → no skew); each
partition is then committed by one Ray task with write-tmp → fsync →
atomic-rename ordering, making retries idempotent (a partition is either
absent or fully committed; a crashed task leaves only a tmp file that the
retry overwrites).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

# imported at module level: these run inside Ray workers, where the package
# ships by value (function-scope imports would raise ModuleNotFoundError)
from ..stages.dedup import _pl, _row_hash_bucket, local_distinct
from ..stages.emit import decode_triples
from ..workerenv import cap_threads

MANIFEST = "_manifest.json"


def _split_plain(tbl: pa.Table, keys: List[str], num_buckets: int):
    """Map side of the write exchange: partition one block into
    ``num_buckets`` sub-tables by uniform row hash of ``keys`` (no combiner
    — unlike the dedup exchange, every row is preserved)."""
    if tbl.num_rows == 0 or any(k not in tbl.column_names for k in keys):
        return tuple(None for _ in range(num_buckets)) if num_buckets > 1 else None
    # per-bucket take (compacted buffers) — a sorted zero-copy slice would
    # pickle with its full parent buffers (see dedup._split_task)
    bucket = _row_hash_bucket(tbl, keys, num_buckets).to_numpy(zero_copy_only=False)
    order = np.argsort(bucket, kind="stable")
    bucket_sorted = bucket[order]
    bounds = np.searchsorted(bucket_sorted, np.arange(num_buckets + 1))
    out = tuple(tbl.take(order[bounds[i] : bounds[i + 1]]) for i in range(num_buckets))
    return out if num_buckets > 1 else out[0]


def _split_plain_group(keys: List[str], num_buckets: int, *tbls: pa.Table):
    """Map task over a group of blocks (concat then split; all rows kept)."""
    cap_threads()
    live = [t for t in tbls if t is not None and t.num_rows]
    if not live:
        return tuple(None for _ in range(num_buckets)) if num_buckets > 1 else None
    merged = live[0] if len(live) == 1 else pa.concat_tables(live).combine_chunks()
    return _split_plain(merged, keys, num_buckets)


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def completed_partitions(out_dir: str) -> Dict[int, dict]:
    """Partitions already committed: manifest present, parseable, AND its
    data file exists with the recorded byte size — the data-file check is
    what lets the writer skip the manifest/directory fsyncs (a crash that
    persists the manifest rename but not the data rename is detected here
    and the partition re-runs)."""
    done: Dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        pdir = os.path.join(out_dir, name)
        mpath = os.path.join(pdir, MANIFEST)
        try:
            with open(mpath) as f:
                m = json.load(f)
            if m.get("rows", 0):
                if "fmt" in m:
                    candidates = [{"nt": "data.nt", "nq": "data.nq",
                                   "ttl": "data.ttl"}
                                  .get(m["fmt"], "data.parquet")]
                else:
                    # pre-'fmt' manifests (older nt checkpoints): accept
                    # whichever data file exists with the recorded size
                    candidates = ["data.parquet", "data.nt"]
                if not any(
                    os.path.exists(p) and os.path.getsize(p) == m.get("bytes")
                    for p in (os.path.join(pdir, c) for c in candidates)
                ):
                    continue  # data rename lost or truncated ⇒ recompute
            done[int(name.split("=", 1)[1])] = m
        except (OSError, ValueError, json.JSONDecodeError):
            continue  # missing/corrupt manifest ⇒ not committed ⇒ recompute
    return done


def _nt_term_array(col: pa.Array) -> pa.Array:
    """Serialize an N3-encoded term column to N-Triples term syntax:
    ``<iri>`` / ``_:bnode`` pass through; BARE plain literals (the engine's
    storage form) get fully escaped + quoted; decorated literals
    (``"lex"^^<dt>`` / ``"lex"@lang``) keep their delimiters but get
    control characters escaped — a raw newline in the lexical form would
    otherwise split the triple across two physical lines (invalid
    N-Triples, silently unreadable)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    is_node = pc.match_substring_regex(col, r"^<|^_:")
    is_decorated = pc.match_substring_regex(col, r'(?s)^".*"(\^\^<[^>]*>|@[A-Za-z0-9\-]+)$')
    esc = col
    for a, b in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        esc = pc.replace_substring(esc, a, b)
    quoted = pc.binary_join_element_wise('"', esc, '"', "")
    dec = col
    for a, b in (("\\", "\\\\"), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        dec = pc.replace_substring(dec, a, b)
    out = pc.if_else(pc.fill_null(is_decorated, False), dec, quoted)
    return pc.if_else(pc.fill_null(is_node, False), col, out)


def _nt_lines(tbl: pa.Table) -> bytes:
    import pyarrow.compute as pc

    lines = pc.binary_join_element_wise(
        _nt_term_array(tbl["subj"]), _nt_term_array(tbl["pred"]),
        _nt_term_array(tbl["obj"]), pa.scalar("."), " ",
    )
    return ("\n".join(lines.to_pylist()) + "\n").encode()


RDF_TYPE_IRI = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"

# conservative PN_LOCAL subset: compress only word-character locals, so the
# serialized prefixed name is unambiguously re-expandable (no '.'-final or
# slash-containing locals, which Turtle's grammar restricts)
_TTL_LOCAL = "[A-Za-z0-9_]+"


def _ttl_compress(col: pa.Array, prefixes: dict) -> pa.Array:
    """Apply prefix compression to a serialized term column: full-IRI terms
    ``<base+local>`` become ``pfx:local``; decorated-literal datatypes
    ``^^<base+local>`` become ``^^pfx:local``.  Terms that don't match any
    prefix (or whose local part is not a safe PN_LOCAL) stay as ``<...>``."""
    import re as _re

    import pyarrow.compute as pc

    for pfx, base in prefixes.items():
        b = _re.escape(base)
        col = pc.replace_substring_regex(
            col, f"^<{b}({_TTL_LOCAL})>$", f"{pfx}:\\1")
        col = pc.replace_substring_regex(
            col, f"\\^\\^<{b}({_TTL_LOCAL})>$", f"^^{pfx}:\\1")
    return col


def _ttl_lines(tbl: pa.Table, prefixes: dict) -> bytes:
    """Turtle serialization: an ``@prefix`` header per shard, prefix-
    compressed IRIs, ``a`` for rdf:type, and subject-grouped predicate
    lists (``;`` continuations) — the rows arrive SORTED by (s, p, o) from
    ``_write_partition``, so subject runs are contiguous and the grouping
    is one vectorized shift-compare, no per-row Python."""
    import numpy as np
    import pyarrow.compute as pc

    s = _ttl_compress(_nt_term_array(tbl["subj"]), prefixes)
    p = _nt_term_array(tbl["pred"])
    p = pc.if_else(pc.equal(p, RDF_TYPE_IRI), pa.scalar("a"),
                   _ttl_compress(p, prefixes))
    o = _ttl_compress(_nt_term_array(tbl["obj"]), prefixes)

    sv = s.to_numpy(zero_copy_only=False)
    new_s = np.ones(len(sv), dtype=bool)
    new_s[1:] = sv[1:] != sv[:-1]
    last_s = np.ones(len(sv), dtype=bool)
    last_s[:-1] = sv[:-1] != sv[1:]
    head = pc.if_else(pa.array(new_s),
                      pc.binary_join_element_wise(s, pa.scalar(""), " "),
                      pa.scalar("    "))
    body = pc.binary_join_element_wise(p, o, " ")
    tail = pa.array(np.where(last_s, " .", " ;"))
    lines = pc.binary_join_element_wise(head, body, tail, "")
    header = "".join(f"@prefix {pfx}: <{base}> .\n"
                     for pfx, base in sorted(prefixes.items()))
    return (header + "\n".join(lines.to_pylist()) + "\n").encode()


def _nq_lines(tbl: pa.Table) -> bytes:
    """N-Quads serialization: 4-term lines for named-graph rows, 3-term
    (default-graph) lines where the graph column is NULL — the standard
    N-Quads convention."""
    import pyarrow.compute as pc

    g = tbl["graph"]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    s = _nt_term_array(tbl["subj"])
    p = _nt_term_array(tbl["pred"])
    o = _nt_term_array(tbl["obj"])
    with_g = pc.binary_join_element_wise(
        s, p, o, pc.cast(g, pa.string()), pa.scalar("."), " ")
    no_g = pc.binary_join_element_wise(s, p, o, pa.scalar("."), " ")
    lines = pc.if_else(pc.is_valid(g), with_g, no_g)
    return ("\n".join(lines.to_pylist()) + "\n").encode()


def _commit_manifest(pdir: str, manifest: dict) -> None:
    """Write the manifest with tmp+rename (presence == committed).  The
    manifest itself is never fsynced — ``completed_partitions`` re-verifies
    the data file against it, so a lost manifest just re-runs the
    partition."""
    mtmp = os.path.join(pdir, MANIFEST + ".tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
    os.replace(mtmp, os.path.join(pdir, MANIFEST))


def _write_partition(
    out_dir: str,
    part: int,
    keys: List[str],
    lineage: dict,
    distinct_keys: Optional[List[str]],
    fmt: str,
    fmt_opts: Optional[dict],
    fsync_data: bool,
    *tables: pa.Table,
) -> dict:
    """One committed partition: concat its shuffled splits, optional exact
    dedup on ``distinct_keys`` (exact globally because the hash partitioning
    on ``keys`` co-locates every candidate duplicate), sort within the
    partition (deterministic bytes), write tmp, fsync, rename, manifest."""
    cap_threads()
    t0 = time.time()
    steps = {}
    parts = [t for t in tables if t is not None and len(t)]
    if parts:
        tbl = pa.concat_tables(parts).combine_chunks()
        steps["concat"] = round(time.time() - t0, 2)
        ts = time.time()
        tbl = decode_triples(tbl)
        steps["decode"] = round(time.time() - ts, 2)
        ts = time.time()
        # fused unique+sort in one polars pass (measured ~2× the separate
        # arrow distinct-then-sort on 500k-row partitions)
        pl = _pl()
        sort_cols = list(distinct_keys or keys)
        df = pl.from_arrow(tbl)
        if distinct_keys:
            df = df.unique(subset=list(distinct_keys), keep="any")
        out = df.sort(sort_cols).to_arrow()
        tbl = out.cast(tbl.schema) if out.schema != tbl.schema else out
        steps["distinct_sort"] = round(time.time() - ts, 2)
    else:
        tbl = None
    pdir = _part_dir(out_dir, part)
    os.makedirs(pdir, exist_ok=True)
    data_path = os.path.join(
        pdir, {"nt": "data.nt", "nq": "data.nq", "ttl": "data.ttl"}
        .get(fmt, "data.parquet"))
    tmp_path = data_path + ".tmp"
    n_rows, n_bytes, checksum = 0, 0, ""
    if tbl is not None:
        # encode + checksum IN MEMORY, then one write + fsync: re-reading
        # the file back for the sha1 doubled the data-file I/O ops, which
        # serialize at the device when the disk is contended (the write
        # phase is fsync/IOP-latency-bound, not byte-bound — sorted
        # dict-encoded triples compress to ~1 MB per 500k-row partition)
        if fmt == "nt":
            data = _nt_lines(tbl)
        elif fmt == "nq":
            data = _nq_lines(tbl)
        elif fmt == "ttl":
            data = _ttl_lines(tbl, (fmt_opts or {}).get("prefixes", {}))
        else:
            buf = pa.BufferOutputStream()
            pq.write_table(tbl, buf)
            data = buf.getvalue()
        checksum = hashlib.sha1(data).hexdigest()
        with open(tmp_path, "wb") as f:
            f.write(data)
            if fsync_data:
                f.flush()
                # per-partition fsync mode: the DATA file is durable before
                # the rename, so a committed manifest can never point at an
                # empty/partial data.parquet
                os.fsync(f.fileno())
        n_rows, n_bytes = len(tbl), len(data)
        os.replace(tmp_path, data_path)  # atomic commit of the data file
    manifest = {
        "partition": part,
        "rows": n_rows,
        "bytes": n_bytes,
        "sha1": checksum,
        "fmt": fmt,
        "wall_sec": round(time.time() - t0, 4),
        "steps": steps,
        "committed_at": time.time(),
        **lineage,
    }
    if fsync_data:
        # strict mode commits the manifest in-task (manifest last ⇒
        # committed); batched mode defers it to the driver, AFTER the single
        # global flush, so no manifest can exist before its data is durable
        _commit_manifest(pdir, manifest)
    # The manifest and directory are never fsynced: recovery makes that safe
    # — ``completed_partitions`` re-verifies the data file's existence and
    # byte size against the manifest, so a crash that loses either rename
    # (or persists the manifest without the data rename) just re-runs the
    # partition.  The write wave is fsync-LATENCY-bound on a contended
    # device (measured: a flat ~4.4 s floor at both 4 and 16 CPUs for 48
    # tiny partitions), which is why batched mode replaces per-partition
    # fsyncs with one ``os.sync()`` per write wave.
    return manifest


#: Fixed map-side fan-out for adaptive mode: split into this many buckets
#: while streaming (before the output size is known), then group contiguous
#: bucket ranges into the chosen number of write partitions after the drain.
SPLIT_BUCKETS = 64

#: Target rows per committed partition in adaptive mode — measured sweet
#: spot: the per-partition fused unique+sort degrades sharply once a
#: partition's working set outgrows cache over plasma-backed memory, and
#: below ~100k rows the fixed task + fsync cost dominates.
ADAPTIVE_TARGET_ROWS = 500_000
ADAPTIVE_TARGET_BYTES = 256 << 20  # in-memory Arrow bytes per partition


def _adaptive_partitions(total_rows: int, total_bytes: int) -> int:
    """Pick the write-partition count from streamed metadata: enough
    partitions that none exceeds the row/byte targets AND (for wall-clock)
    one partition per cluster CPU once there are ≥64k rows each, rounded UP
    to a power-of-two divisor of SPLIT_BUCKETS (so each partition owns a
    contiguous bucket range), capped at SPLIT_BUCKETS.  A tiny output
    commits ONE file instead of 64 (round-3 regression: 64 fsyncs for a
    6 MB sf0.1 output tripled the write phase); with the batched-sync
    commit, extra partitions cost only a task, so the per-partition
    distinct+sort — the write wave's critical path — shrinks with P."""
    import math

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    need = max(
        1,
        math.ceil(total_rows / ADAPTIVE_TARGET_ROWS),
        math.ceil(total_bytes / ADAPTIVE_TARGET_BYTES),
        min(cpus, math.ceil(total_rows / 64_000)),
    )
    p = 1
    while p < need and p < SPLIT_BUCKETS:
        p *= 2
    return p


def checkpointed_write(
    ds: rd.Dataset,
    out_dir: str,
    keys: Sequence[str],
    num_partitions: Optional[int] = None,
    lineage: Optional[dict] = None,
    resume: bool = True,
    distinct_keys: Optional[Sequence[str]] = None,
    fmt: str = "parquet",
    fmt_opts: Optional[dict] = None,
) -> dict:
    """Write ``ds`` as hash-partitioned parquet (partition = row-hash of
    ``keys`` % num_partitions) with a per-partition manifest; skip already
    committed partitions when resuming.

    ``num_partitions=None`` (default) sizes the partition count ADAPTIVELY
    from the streamed row/byte metadata (see ``_adaptive_partitions``); a
    resumed adaptive run reuses the count recorded in the existing
    manifests so the layout contract holds across runs.  Pass an explicit
    count for a fixed layout (e.g. thousands of partitions at 100 TB).

    ``distinct_keys``: exact-dedup rows on these columns during the write
    (one fused exchange for dedup + materialize — exact when ``keys`` is a
    prefix/subset of ``distinct_keys`` so duplicates co-locate).

    Commit protocol (default ``batched``): writers write+rename data files
    WITHOUT per-file fsync and return their manifests; the driver then
    issues ONE ``os.sync()`` for the whole wave and only afterwards writes
    the manifests — no manifest can exist before its data is durable, and
    the wave pays one device flush instead of one fsync per partition (the
    round-3 regression).  ``GRAFT_COMMIT_FSYNC=per-partition`` restores the
    strict per-file fsync + in-task manifest ordering — required when
    writer tasks run on OTHER nodes writing node-local disks (the driver's
    sync() only flushes its own node; shared filesystems with close-to-open
    semantics are fine either way).

    Returns summary metrics ``{written, skipped, rows, bytes}``.

    Scale: the exchange is map (split each block by partition) + one reduce
    task per partition; skipped partitions cost zero compute AND zero
    shuffle for their reduce (their splits are still produced by the map —
    at very large scale pair this with input-side pruning via the
    ``inputs`` lineage field)."""
    keys = list(keys)
    distinct_keys = list(distinct_keys) if distinct_keys else None
    lineage = dict(lineage or {})
    lineage.setdefault("keys", keys)
    per_part_fsync = os.environ.get("GRAFT_COMMIT_FSYNC", "batched") == "per-partition"

    done = completed_partitions(out_dir) if resume else {}
    P = num_partitions
    if P is None and done:
        # adaptive resume: the layout is already on disk — reuse it
        P = next(iter(done.values())).get("num_partitions") or SPLIT_BUCKETS
    if P is not None:
        todo = [p for p in range(P) if p not in done]
        if not todo:
            rows = sum(m.get("rows", 0) for m in done.values())
            return {"written": 0, "skipped": len(done), "rows": rows, "bytes": None}
    split_buckets = P if P is not None else SPLIT_BUCKETS

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    # STREAMING exchange: consume the upstream Dataset's blocks as they are
    # produced (iter_internal_ref_bundles) and launch a split task as soon
    # as a group of blocks accumulates — the hash-partition map runs
    # CONCURRENTLY with the emit stage instead of behind a materialize()
    # barrier (the barrier serialized emit against the exchange and capped
    # E2E scaling efficiency at ~0.7; only the per-partition reduce still
    # needs every map's output).
    mapper = ray.remote(num_returns=split_buckets)(_split_plain_group)
    split_refs: List = []
    pending: List = []
    pending_rows = 0
    total_rows = 0
    total_bytes = 0
    # rows per split task: chunky enough that (split tasks × partitions)
    # stays a modest object count — each task emits split_buckets returns,
    # and the per-partition writer concats one piece per split task
    group_rows = int(os.environ.get("GRAFT_SPLIT_GROUP_ROWS", "500000"))

    def _flush():
        nonlocal pending, pending_rows
        if pending:
            r = mapper.remote(keys, split_buckets, *pending)
            split_refs.append([r] if split_buckets == 1 else r)
            pending, pending_rows = [], 0

    # execute_to_iterator (not iter_internal_ref_bundles) so we hold the
    # EXECUTOR handle: Ray 2.49 does not release a fixed actor pool's CPUs
    # when the bundle iterator is exhausted (measured: 3 of 4 CPUs held
    # indefinitely → the write phase ran at concurrency 1).  An explicit
    # shutdown after the drain frees the pool before the reduce starts.
    bundle_iter, _, executor = ds._plan.execute_to_iterator()
    try:
        for bundle in bundle_iter:
            for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
                if not meta.num_rows:
                    continue
                pending.append(block_ref)
                pending_rows += meta.num_rows
                total_rows += meta.num_rows
                total_bytes += meta.size_bytes or 0
                if pending_rows >= group_rows or len(pending) >= 64:
                    _flush()
    finally:
        # ALL THREE steps are required to free the pool's CPUs before the
        # reduce: the exhausted iterator still holds the actor handles via a
        # reference CYCLE (a plain del leaves them alive — measured: 3 of 4
        # CPUs held and the write phase ran at concurrency 1), the explicit
        # shutdown stops the executor thread, and gc.collect() breaks the
        # cycle so the handles actually drop.
        del bundle_iter
        if executor is not None:
            executor.shutdown(force=False)
        import gc

        gc.collect()
    _flush()
    t_stream = time.time() - t0
    t1 = time.time()
    flat = [r for s in split_refs for r in s]
    if flat:
        ray.wait(flat, num_returns=len(flat), fetch_local=False)
    t_map = time.time() - t1
    t2 = time.time()
    if P is None:
        P = _adaptive_partitions(total_rows, total_bytes)
        todo = list(range(P))  # done was empty, else P came from its manifests
    lineage.setdefault("num_partitions", P)
    bucket_span = split_buckets // P  # contiguous buckets per write partition
    # NOTE: fractional-CPU writers (num_cpus=0.7) and 1M-row split groups
    # were both tried and measured SLOWER (write 2.4→5.0 s at 16 CPUs —
    # oversubscribed writers thrash; coarser splits lag the emit overlap)
    writer = ray.remote(_write_partition)
    manifests = ray.get(
        [
            writer.remote(
                out_dir, p, keys, lineage, distinct_keys, fmt, fmt_opts,
                per_part_fsync,
                *[
                    split_refs[m][p * bucket_span + j]
                    for m in range(len(split_refs))
                    for j in range(bucket_span)
                ],
            )
            for p in todo
        ]
    )
    if not per_part_fsync and manifests:
        # ONE flush for the whole wave (data content + renames), THEN the
        # manifests — a crash before this line re-runs every partition
        # (work loss, never data loss: no manifest exists yet)
        os.sync()
        for m in manifests:
            _commit_manifest(_part_dir(out_dir, m["partition"]), m)
    return {
        "written": len(manifests),
        "skipped": len(done),
        "rows": sum(m["rows"] for m in manifests) + sum(m.get("rows", 0) for m in done.values()),
        "bytes": sum(m["bytes"] for m in manifests),
        "phase_sec": {
            "stream_split": round(t_stream, 2),
            "map_drain": round(t_map, 2),
            "write": round(time.time() - t2, 2),
        },
    }


def write_ntriples(
    triples: rd.Dataset,
    out_dir: str,
    num_partitions: Optional[int] = None,
    lineage: Optional[dict] = None,
    resume: bool = True,
) -> dict:
    """N-Triples export sink — the reference's natural interchange form
    (its conformance harness diffs sorted N-Triples,
    ``old_tests/test_rdb2rdf.py:99-176``).  Same exchange + per-partition
    manifest + atomic-commit + resume machinery as the parquet sink; output
    is ``part=NNNNN/data.nt`` with exact (s,p,o) dedup and sorted lines
    (deterministic bytes)."""
    return checkpointed_write(
        triples, out_dir, keys=["subj"], num_partitions=num_partitions,
        lineage=dict(lineage or {}, pipeline="nt_export"), resume=resume,
        distinct_keys=["subj", "pred", "obj"], fmt="nt",
    )


def write_nquads(
    quads: rd.Dataset,
    out_dir: str,
    num_partitions: Optional[int] = None,
    lineage: Optional[dict] = None,
    resume: bool = True,
) -> dict:
    """N-Quads export sink — the named-graph interchange form (pairs with
    the rr:graph emit path and the SPARQL GRAPH clause).  Identical
    exchange / manifest / atomic-commit / resume machinery; rows with a
    NULL graph column serialize as 3-term default-graph lines, named-graph
    rows as 4-term lines; dedup is exact on the full quad."""
    return checkpointed_write(
        quads, out_dir, keys=["subj"], num_partitions=num_partitions,
        lineage=dict(lineage or {}, pipeline="nq_export"), resume=resume,
        distinct_keys=["subj", "pred", "obj", "graph"], fmt="nq",
    )


def write_turtle(
    triples: rd.Dataset,
    out_dir: str,
    prefixes: Optional[dict] = None,
    num_partitions: Optional[int] = None,
    lineage: Optional[dict] = None,
    resume: bool = True,
) -> dict:
    """Turtle export sink: prefix-compressed IRIs (``@prefix`` header per
    shard), ``a`` for rdf:type, subject-grouped predicate lists — the
    human-readable interchange form, typically 2-4× smaller than N-Triples
    on template-minted graphs (the subject IRI is written once per run and
    every in-prefix IRI shrinks to ``pfx:local``).  Identical exchange /
    manifest / atomic-commit / resume machinery; hash-partitioning on subj
    co-locates each subject's rows so predicate grouping is exact within a
    shard."""
    return checkpointed_write(
        triples, out_dir, keys=["subj"], num_partitions=num_partitions,
        lineage=dict(lineage or {}, pipeline="ttl_export",
                     prefixes=dict(prefixes or {})),
        resume=resume, distinct_keys=["subj", "pred", "obj"], fmt="ttl",
        fmt_opts={"prefixes": dict(prefixes or {})},
    )


def read_checkpointed(out_dir: str) -> rd.Dataset:
    """Read back a committed checkpoint directory (committed partitions
    only — uncommitted tmp files are ignored by construction)."""
    paths = [
        os.path.join(_part_dir(out_dir, p), "data.parquet")
        for p in sorted(completed_partitions(out_dir))
        if os.path.exists(os.path.join(_part_dir(out_dir, p), "data.parquet"))
    ]
    return rd.read_parquet(paths)


def compact_checkpoint(
    out_dir: str,
    num_partitions: Optional[int] = None,
    keys: Optional[Sequence[str]] = None,
) -> dict:
    """Compact a committed parquet checkpoint into a new partition layout —
    the small-file maintenance operation every long-lived 100 TB dataset
    needs (incremental runs accrete partitions; readers want few big files).

    Streams the committed partitions back through the SAME exchange +
    manifest + commit machinery into a sibling directory (adaptive count by
    default), then swaps directories and removes the old layout.  The swap
    is two renames — crash between them leaves either the old layout intact
    or the finished new one under ``out_dir`` plus a stale ``.old`` to
    garbage-collect; data files are never mutated in place.  Partition keys
    default to the ones recorded in the existing manifests, so the layout
    contract (co-location by key hash) survives compaction."""
    import shutil

    done = completed_partitions(out_dir)
    if not done:
        raise ValueError(f"no committed partitions under {out_dir!r}")
    m0 = next(iter(done.values()))
    if m0.get("fmt", "parquet") != "parquet":
        raise NotImplementedError("compact_checkpoint supports parquet checkpoints")
    keys = list(keys) if keys else list(m0.get("keys") or [])
    if not keys:
        raise ValueError("partition keys not recorded in manifests; pass keys=")
    ds = read_checkpointed(out_dir)
    tmp_dir = out_dir.rstrip("/") + ".compact"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    report = checkpointed_write(
        ds, tmp_dir, keys=keys, num_partitions=num_partitions,
        lineage={"pipeline": "compaction", "compacted_from": len(done)},
        resume=False,
    )
    bak = out_dir.rstrip("/") + ".old"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(out_dir, bak)
    os.rename(tmp_dir, out_dir)
    shutil.rmtree(bak)
    return {**report, "compacted_from": len(done)}
