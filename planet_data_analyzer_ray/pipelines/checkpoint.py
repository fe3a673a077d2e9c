"""Checkpoint/resume with per-partition lineage records.

Replaces the reference's idempotent-rerun resume model
(``ON CONFLICT DO NOTHING`` + conditional imports,
/root/reference/database/db.py:65-70, importer.py:31-37) with explicit
partition lineage (north rule: "resumable from checkpoint with
per-partition lineage + metrics"):

- The input is split into deterministic shards by key range
  (``l_orderkey`` ranges derived from file metadata only, so shard ids
  are stable across runs — SURVEY.md §7.5 'resume determinism').
- Each shard is processed as its own streaming pipeline and written to
  ``part-{i:05d}.parquet`` plus a lineage JSON: input fragment + key
  range, row count, content digest, wall time.
- On resume, shards whose lineage validates (file exists, row count
  matches) are skipped; partial/corrupt shards are recomputed.
- Metrics roll up from lineage records (reference analog: the 7
  count log lines, importer.py:41-54).

Storage assumption: shard tasks write part/lineage files via plain
paths, so ``out_dir`` must be on storage shared between driver and
workers (single node, NFS, or a fuse-mounted object store).  On a
multi-node cluster with node-local disks, point ``out_dir`` at a
shared/object-store URI-backed mount — the per-shard write protocol
(tmp + atomic rename, validate-on-resume) is already worker-local and
carries over unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray


def shard_ranges(sf_dir: str, num_shards: int) -> list[tuple[int, int]]:
    """Deterministic [lo, hi) l_orderkey ranges from parquet row-group
    STATISTICS only — no column data is read (at 100 TB a full
    l_orderkey scan just to plan shards would itself be a job)."""
    path = f"{sf_dir}/lineitem.parquet"
    md = pq.read_metadata(path)
    ci = md.schema.names.index("l_orderkey")
    mins, maxs = [], []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics
        if st is None or not st.has_min_max:
            mins, maxs = [], []
            break
        mins.append(st.min)
        maxs.append(st.max)
    if mins:
        lo, hi = int(min(mins)), int(max(maxs)) + 1
    else:  # stats absent: fall back to scanning the key column
        ok = pq.read_table(path, columns=["l_orderkey"]).column("l_orderkey")
        ok = ok.to_numpy(zero_copy_only=False)
        lo, hi = int(ok.min()), int(ok.max()) + 1
    bounds = np.linspace(lo, hi, num_shards + 1).astype(np.int64)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(num_shards)]


# bumped whenever the digest byte-encoding changes: a resume that sees a
# different version knows the mismatch is an encoding change, not data
# corruption, and can recompute without alarm
DIGEST_VERSION = 2


def _content_digest(table: pa.Table, key_col: str) -> str:
    """Order-independent digest of the shard's key column — no per-row
    Python.  v2 hashes a CANONICAL byte encoding (int64 value lengths +
    concatenated values of the sorted column) rather than raw Arrow
    buffers, so the digest depends only on the logical key sequence,
    not on Arrow buffer layout/padding across pyarrow versions."""
    col = table.column(key_col)
    sorted_col = pc.take(col, pc.sort_indices(col))
    arr = sorted_col.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=col.type)
    h = hashlib.sha256()
    n = len(arr)
    if n:
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        h.update(np.diff(offs).tobytes())
        h.update(data[offs[0] : offs[-1]].tobytes())
    return h.hexdigest()[:16]


def _lineage_path(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"part-{i:05d}.lineage.json")


def _part_path(out_dir: str, i: int) -> str:
    return os.path.join(out_dir, f"part-{i:05d}.parquet")


def _lineage_valid(out_dir: str, i: int, lo: int, hi: int) -> bool:
    """A shard is skippable only if its part + lineage exist, the row
    count matches, AND the recorded key range equals the range the
    current sharding plan expects — resuming with a different
    num_shards (or changed input bounds) must recompute, not silently
    reuse stale shards whose ranges no longer tile the input."""
    lp, pp = _lineage_path(out_dir, i), _part_path(out_dir, i)
    if not (os.path.exists(lp) and os.path.exists(pp)):
        return False
    try:
        rec = json.load(open(lp))
        return (
            pq.read_metadata(pp).num_rows == rec["n_rows"]
            and rec.get("orderkey_range") == [lo, hi]
        )
    except Exception:
        return False


@ray.remote
def _write_shard(sf_dir: str, out_dir: str, i: int, lo: int, hi: int) -> dict:
    """One shard, one task: scan its key range (parquet predicate
    pushdown), derive, write its own part + lineage.  No shard bytes
    ever pass through the driver."""
    from .. import corpus
    from ..sources.images import LINEITEM_COLS

    t0 = time.perf_counter()
    flt = (pads.field("l_orderkey") >= lo) & (pads.field("l_orderkey") < hi)
    tbl = pads.dataset(f"{sf_dir}/lineitem.parquet").to_table(
        columns=LINEITEM_COLS, filter=flt
    )
    table = corpus.derive_images(tbl)
    tmp = _part_path(out_dir, i) + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, _part_path(out_dir, i))  # atomic publish
    rec = {
        "shard": i,
        "input_fragment": f"{sf_dir}/lineitem.parquet",
        "orderkey_range": [lo, hi],
        "n_rows": table.num_rows,
        "digest": _content_digest(table, "image_id"),
        "digest_version": DIGEST_VERSION,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    with open(_lineage_path(out_dir, i), "w") as f:
        json.dump(rec, f)
    return rec


def run_clean_export(sf_dir: str, out_dir: str) -> dict:
    """Key-partitioned resumable sink for the cleaned corpus: the
    composed cleaning pipeline streams into a hive layout
    (``split=train/`` / ``split=val/`` / ``split=test/``) via Ray's
    distributed ``write_parquet(partition_cols=...)`` — workers write
    their own files, nothing transits the driver — plus a manifest with
    per-split row counts for resume: a re-run whose manifest validates
    (all split dirs present with matching counts) skips the write
    entirely (S11 idempotent-output rule at directory granularity).

    Storage note: like the shard sink above, paths assume a shared
    filesystem (or object-store URI) visible to driver and workers."""
    import pyarrow.dataset as pads

    from .queries import q_corpus_clean

    manifest_path = os.path.join(out_dir, "_split_manifest.json")
    if os.path.exists(manifest_path):
        try:
            man = json.load(open(manifest_path))
            live = {
                part: pads.dataset(
                    os.path.join(out_dir, f"split={part}"), format="parquet"
                ).count_rows()
                for part in man["rows_per_split"]
            }
            if live == man["rows_per_split"]:
                return {**man, "skipped": True}
        except Exception:
            pass  # corrupt manifest/dir -> rewrite below
    t0 = time.perf_counter()
    ds = q_corpus_clean(sf_dir)
    ds.write_parquet(out_dir, partition_cols=["split"], mode="overwrite")
    parts = pads.dataset(out_dir, format="parquet", partitioning="hive")
    import collections

    counts: dict[str, int] = collections.defaultdict(int)
    for frag in parts.get_fragments():
        # path .../split=train/xxx.parquet
        part = frag.path.split("split=")[1].split("/")[0]
        counts[part] += frag.count_rows()
    man = {
        "rows_per_split": dict(sorted(counts.items())),
        "total_rows": int(sum(counts.values())),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    with open(manifest_path, "w") as f:
        json.dump(man, f)
    return {**man, "skipped": False}


def _chunk_bucket_digest(table: pa.Table) -> str:
    """Order-independent digest of one chunk bucket's FULL content:
    rows sorted by the unique (doc_id, chunk_idx) key, then the key,
    n_tokens and chunk_text byte streams hashed in that canonical
    order."""
    doc = table.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    idx = table.column("chunk_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((idx, doc))
    h = hashlib.sha256()
    h.update(doc[order].tobytes())
    h.update(idx[order].tobytes())
    h.update(
        table.column("n_tokens")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)[order]
        .tobytes()
    )
    txt = pc.take(table.column("chunk_text"), pa.array(order)).combine_chunks()
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.chunk(0) if txt.num_chunks else pa.array([], pa.string())
    n = len(txt)
    if n:
        offs = np.frombuffer(txt.buffers()[1], dtype=np.int32)[
            txt.offset : txt.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
        h.update(np.diff(offs).tobytes())
        h.update(data[offs[0] : offs[-1]].tobytes())
    return h.hexdigest()[:16]


def run_checkpointed_shuffle(
    sf_dir: str,
    out_dir: str,
    num_buckets: int = 8,
    fail_after: int | None = None,
) -> dict:
    """Round-5 #5: checkpoint/resume for a MULTI-EXCHANGE pipeline.

    The flagship drill (run_checkpointed) shards a map-only derive by
    key range; this one checkpoints ``corpus_clean_chunks`` — the
    decontaminate + clean + dedup composition whose survivor semi-join
    crosses a doc_id-hash exchange — at its SINK: chunk rows
    hash-bucket by doc_id into ``num_buckets`` parts, each published
    atomically (tmp + rename) with a lineage record (row count +
    order-independent full-content digest).  On resume the
    deterministic pipeline re-runs (a shuffle's intermediate state
    dies with the cluster; its OUTPUT is what checkpoints), but valid
    buckets are neither rewritten nor re-verified-by-recompute — a
    killed run resumes to bit-identical parts.

    ``fail_after`` injects a crash after N newly-published buckets
    (buckets publish sequentially in that mode so the crash point is
    deterministic)."""
    from ..util import collect_table, hash_partition
    from .queries import q_corpus_clean_chunks

    os.makedirs(out_dir, exist_ok=True)

    def bpath(i: int) -> str:
        return os.path.join(out_dir, f"bucket-{i:05d}.parquet")

    def blineage(i: int) -> str:
        return os.path.join(out_dir, f"bucket-{i:05d}.lineage.json")

    def bucket_valid(i: int) -> bool:
        try:
            rec = json.load(open(blineage(i)))
            return (
                rec.get("digest_version") == DIGEST_VERSION
                and os.path.exists(bpath(i))
                and pq.read_metadata(bpath(i)).num_rows == rec["n_rows"]
            )
        except Exception:
            return False

    todo = [i for i in range(num_buckets) if not bucket_valid(i)]
    t0 = time.perf_counter()
    written = 0
    if todo:
        ds = q_corpus_clean_chunks(sf_dir)

        def tag(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.append_column(
                "__bucket", pa.array(hash_partition(ids, num_buckets))
            )

        tagged = collect_table(
            ds.map_batches(
                tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        )
        # bucket parts are output-sized (cleaned chunk text); at true
        # scale each bucket task would filter-and-write worker-side
        # (the run_clean_export partition_cols path) — the drill
        # publishes driver-side so the injected kill point is exact
        bcol = tagged.column("__bucket").to_numpy(zero_copy_only=False)
        for i in todo:
            part = tagged.filter(pa.array(bcol == i)).drop_columns(["__bucket"])
            t1 = time.perf_counter()
            tmp = bpath(i) + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, bpath(i))  # atomic publish
            rec = {
                "bucket": i,
                "pipeline": "corpus_clean_chunks",
                "n_rows": part.num_rows,
                "digest": _chunk_bucket_digest(part),
                "digest_version": DIGEST_VERSION,
                "wall_sec": round(time.perf_counter() - t1, 3),
            }
            with open(blineage(i), "w") as f:
                json.dump(rec, f)
            written += 1
            if fail_after is not None and written >= fail_after:
                raise RuntimeError(f"injected failure after {written} buckets")
    recs = [json.load(open(blineage(i))) for i in range(num_buckets)]
    return {
        "buckets": num_buckets,
        "written": written,
        "skipped": num_buckets - len(todo),
        "total_rows": sum(r["n_rows"] for r in recs),
        "total_wall_sec": round(time.perf_counter() - t0, 3),
        "lineage": recs,
    }


def run_checkpointed(
    sf_dir: str,
    out_dir: str,
    num_shards: int = 8,
    fail_after: int | None = None,
) -> dict:
    """Parallel per-shard export with lineage + resume: every invalid
    shard becomes its own Ray task (scan -> derive -> write), so output
    bytes never serialize through the driver and shards overlap.

    ``fail_after`` aborts after N newly-written shards (test hook
    simulating a mid-job crash); fault-injection runs shards
    sequentially so the crash point is deterministic."""
    os.makedirs(out_dir, exist_ok=True)
    ranges = shard_ranges(sf_dir, num_shards)
    todo = [
        (i, lo, hi)
        for i, (lo, hi) in enumerate(ranges)
        if not _lineage_valid(out_dir, i, lo, hi)
    ]
    skipped = num_shards - len(todo)
    written = 0
    t_start = time.perf_counter()
    if fail_after is not None:
        for i, lo, hi in todo:
            ray.get(_write_shard.remote(sf_dir, out_dir, i, lo, hi))
            written += 1
            if written >= fail_after:
                raise RuntimeError(f"injected failure after {written} shards")
    else:
        refs = [_write_shard.remote(sf_dir, out_dir, i, lo, hi) for i, lo, hi in todo]
        ray.get(refs)
        written = len(refs)
    recs = [json.load(open(_lineage_path(out_dir, i))) for i in range(num_shards)]
    return {
        "shards": num_shards,
        "written": written,
        "skipped": skipped,
        "total_rows": sum(r["n_rows"] for r in recs),
        "total_wall_sec": round(time.perf_counter() - t_start, 3),
        "lineage": recs,
    }
