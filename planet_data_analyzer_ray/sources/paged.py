"""Paginated live-source ``Datasource`` (SURVEY S1's one unmapped row).

The reference's Planet Data API client POSTs a quick-search with
server-side filters (date range, max cloud, item types) and then chases
``_links._next`` page by page, concatenating features and deduping by
id with a dict (LAST occurrence wins)
(/root/reference/api_importer/clients/data.py:104-203).

Ray-native re-expression: :meth:`PagedSearchDatasource.get_read_tasks`
partitions the PAGE CHAIN into contiguous ranges — each
:class:`ReadTask` chases its own sub-chain exactly like one ``_next``
loop and emits one Arrow block per page, so the "API" is consumed in
parallel while every page is still fetched sequentially inside its
task (real paginated endpoints hand out page cursors; here the cursor
is the deterministic page index over the corpus order).  Server-side
filters run inside the read task (rows that the API would never return
never enter the Dataset), and the cross-page duplicate features the
reference dedups (a ``key % DUP_EVERY == 0`` feature is re-returned on
the following page with a bumped ``clear_confidence_percent``) are
emitted faithfully — the id-dedup is a downstream hash-partitioned
last-wins stage (:func:`paged_dedup_last_wins`), NOT driver-side.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from .. import corpus, spec
from .images import LINEITEM_COLS

_OUT_COLS = (
    "image_id",
    "image_key",
    "item_type_id",
    "cloud_cover",
    "clear_confidence_percent",
    "time_acquired",
)


def _fetch_page_range(
    path: str, page_size: int, p0: int, p1: int, num_rows: int
):
    """One task's ``_next`` chase: rows [p0*ps, min(p1*ps, n)) sliced by
    row-group offsets (only overlapping row groups leave storage), then
    one vectorized derive + filter pass, then per-page block emission
    with the cross-page duplicate re-returns."""
    lo, hi = p0 * page_size, min(p1 * page_size, num_rows)
    if lo >= hi:
        return
    pf = pq.ParquetFile(path)
    starts = np.zeros(pf.num_row_groups + 1, dtype=np.int64)
    for g in range(pf.num_row_groups):
        starts[g + 1] = starts[g] + pf.metadata.row_group(g).num_rows
    g0 = int(np.searchsorted(starts, lo, side="right") - 1)
    g1 = int(np.searchsorted(starts, hi, side="left"))
    tbl = pf.read_row_groups(list(range(g0, g1)), columns=LINEITEM_COLS)
    tbl = tbl.slice(lo - int(starts[g0]), hi - lo)

    imgs = corpus.derive_images(tbl)
    # server-side search filters (reference _payload, data.py:54-99)
    cc = imgs.column("cloud_cover").to_numpy(zero_copy_only=False)
    ts = imgs.column("time_acquired").to_numpy(zero_copy_only=False)
    it = imgs.column("item_type_id").to_numpy(zero_copy_only=False)
    m = (
        (cc <= spec.PAGED_MAX_CLOUD)
        & (ts >= np.datetime64(spec.PAGED_DATE_LO, "us"))
        & (ts <= np.datetime64(spec.PAGED_DATE_HI, "us"))
        & np.isin(it, np.asarray(spec.PAGED_ITEM_TYPES))
    )
    pos = np.arange(lo, hi)  # global corpus positions of kept rows
    imgs = imgs.select(list(_OUT_COLS)).filter(pa.array(m))
    pos = pos[m]
    pages = pos // page_size
    for p in range(p0, p1):
        sel = pages == p
        page_tbl = imgs.filter(pa.array(sel))
        page_tbl = page_tbl.append_column(
            "page_idx", pa.array(np.full(page_tbl.num_rows, p, dtype=np.int64))
        )
        # duplicate re-returns "on the next page": same feature, clear
        # confidence bumped by 1 (corpus.synthesize_pages semantics)
        key = page_tbl.column("image_key").to_numpy(zero_copy_only=False)
        dup = page_tbl.filter(pa.array(key % spec.DUP_EVERY == 0))
        if dup.num_rows:
            clear = (
                dup.column("clear_confidence_percent").to_numpy(
                    zero_copy_only=False
                )
                + 1.0
            )
            i = dup.schema.get_field_index("clear_confidence_percent")
            dup = dup.set_column(i, "clear_confidence_percent", pa.array(clear))
            i = dup.schema.get_field_index("page_idx")
            dup = dup.set_column(
                i,
                "page_idx",
                pa.array(np.full(dup.num_rows, p + 1, dtype=np.int64)),
            )
            page_tbl = pa.concat_tables([page_tbl, dup])
        yield page_tbl


class PagedSearchDatasource(Datasource):
    """Quick-search over the image corpus as a paginated read."""

    def __init__(self, sf_dir: str, page_size: int = spec.PAGED_PAGE_SIZE):
        self._path = f"{sf_dir}/lineitem.parquet"
        self._page_size = int(page_size)
        self._num_rows = pq.read_metadata(self._path).num_rows
        self._num_pages = math.ceil(self._num_rows / self._page_size)

    @property
    def num_pages(self) -> int:
        return self._num_pages

    def get_name(self) -> str:
        return "PagedSearch"

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        n_tasks = max(1, min(parallelism, self._num_pages))
        chunks = np.array_split(np.arange(self._num_pages), n_tasks)
        path, ps, nrows = self._path, self._page_size, self._num_rows
        tasks = []
        for pages in chunks:
            if not len(pages):
                continue
            p0, p1 = int(pages[0]), int(pages[-1]) + 1

            def read_fn(p0=p0, p1=p1):
                return _fetch_page_range(path, ps, p0, p1, nrows)

            meta = BlockMetadata(
                num_rows=None,
                size_bytes=None,
                exec_stats=None,
                input_files=[path],
            )
            tasks.append(ReadTask(read_fn, meta))
        return tasks


def paged_dedup_last_wins(ds, num_partitions: int = 256):
    """Reference id-dedup (``{v['id']: v for v in features}`` — LAST
    occurrence wins, data.py:198) as a hash-partitioned vectorized
    stage: per-batch combiner keeps each key's max-page row, then one
    shuffle on the key hash and the same kernel per partition."""
    import ray.data  # noqa: F401

    def keep_last(batch: pa.Table) -> pa.Table:
        k = batch.column("image_key").to_numpy(zero_copy_only=False)
        p = batch.column("page_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, k))
        ks = k[order]
        uniq, start, counts = np.unique(
            ks, return_index=True, return_counts=True
        )
        last = order[start + counts - 1]
        return batch.take(pa.array(np.sort(last)))

    def with_part(batch: pa.Table) -> pa.Table:
        k = batch.column("image_key").to_numpy(zero_copy_only=False)
        part = (k * np.int64(2654435761)) % np.int64(num_partitions)
        return batch.append_column("__part", pa.array(part))

    pre = ds.map_batches(
        keep_last, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).map_batches(
        with_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return pre.groupby("__part").map_groups(
        lambda g: keep_last(g.drop_columns(["__part"])), batch_format="pyarrow"
    )
