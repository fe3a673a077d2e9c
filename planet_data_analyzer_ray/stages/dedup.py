"""Exact + near-duplicate elimination stages.

D1 exact first-wins dedup reproduces the reference's
``ON CONFLICT DO NOTHING`` insert rule (/root/reference/database/db.py:65-70);
D2 in-batch page dedup reproduces the API client's dict-comprehension
(data.py:198).  End-to-end winner: lowest ``order_col`` (page index),
ties broken deterministically — re-runs are bit-stable (SURVEY.md §7.5).

phash near-dup: 16-bit band LSH over the 62-bit hash + hamming refine;
pair emitted only at its *lowest* matching band, so no global distinct
shuffle is needed (each pair is produced exactly once).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import spec
from ..util import popcount64


def _dedup_batch(batch: pa.Table, key: str, order_col: str) -> pa.Table:
    """Within-batch first-wins combiner (D2 analog): keeps, per key, the
    row with the smallest order value.  Runs before the shuffle to cut
    duplicate volume; the groupby pass below makes it global."""
    keys = batch.column(key).to_numpy(zero_copy_only=False)
    order = batch.column(order_col).to_numpy(zero_copy_only=False)
    # stable lexsort: first occurrence per key after sorting by (key, order)
    perm = np.lexsort((order, keys))
    sk = keys[perm]
    first = np.ones(len(sk), dtype=bool)
    first[1:] = sk[1:] != sk[:-1]
    return batch.take(pa.array(np.sort(perm[first])))


def dedup_first_wins(
    ds: "ray.data.Dataset", key: str = "image_id", order_col: str = "page_idx"
) -> "ray.data.Dataset":
    """Global exact dedup: hash-partition on ``key`` via groupby, keep the
    first row per group ordered by ``order_col``."""

    def take_first(group: pa.Table) -> pa.Table:
        order = group.column(order_col).to_numpy(zero_copy_only=False)
        return group.take(pa.array([int(np.argmin(order))]))

    combined = ds.map_batches(
        lambda b: _dedup_batch(b, key, order_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return combined.groupby(key).map_groups(take_first, batch_format="pyarrow")


def dedup_audit(ds: "ray.data.Dataset", key: str = "image_id") -> "ray.data.Dataset":
    """Per-key duplicate report (keys with >1 copy): n_copies, winner
    page/clear — the observable contract of first-wins dedup."""

    def audit(group: pa.Table) -> pa.Table:
        page = group.column("page_idx").to_numpy(zero_copy_only=False)
        clear = group.column("clear_confidence_percent").to_numpy(zero_copy_only=False)
        if len(page) <= 1:
            return pa.table(
                {
                    key: pa.array([], type=group.schema.field(key).type),
                    "n_copies": pa.array([], type=pa.int64()),
                    "winner_page": pa.array([], type=pa.int64()),
                    "winner_clear": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                key: group.column(key).slice(0, 1),
                "n_copies": pa.array([len(page)]),
                "winner_page": pa.array([int(page.min())]),
                "winner_clear": pa.array([float(clear.min())]),
            }
        )

    return ds.groupby(key).map_groups(audit, batch_format="pyarrow")


# --- phash near-dup (LSH bands + hamming refine) ---------------------------

def explode_phash_bands(batch: pa.Table) -> pa.Table:
    """Image batch -> one row per (band_key, image).  band_key packs
    (band_idx, 16-bit band value) so a single groupby key co-locates each
    band bucket."""
    key = batch.column("image_key").to_numpy(zero_copy_only=False)
    ph = batch.column("phash").to_numpy(zero_copy_only=False)
    ids = batch.column("image_id").to_numpy(zero_copy_only=False)
    parts_k, parts_ph, parts_id, parts_band = [], [], [], []
    for b in range(spec.PHASH_BANDS):
        val = (ph >> np.int64(16 * b)) & np.int64(0xFFFF)
        parts_band.append(np.int64(b) * np.int64(1 << 16) + val)
        parts_k.append(key)
        parts_ph.append(ph)
        parts_id.append(ids)
    return pa.table(
        {
            "band_key": pa.array(np.concatenate(parts_band)),
            "image_key": pa.array(np.concatenate(parts_k)),
            "image_id": pa.array(np.concatenate(parts_id), type=pa.string()),
            "phash": pa.array(np.concatenate(parts_ph)),
        }
    )


def phash_bucket_pairs(group: pa.Table) -> pa.Table:
    """Within one band bucket: all (a<b) pairs with hamming <= max,
    emitted only if this band is the pair's lowest matching band."""
    empty = pa.table(
        {
            "image_a": pa.array([], type=pa.string()),
            "image_b": pa.array([], type=pa.string()),
            "hamming": pa.array([], type=pa.int64()),
        }
    )
    n = group.num_rows
    if n < 2:
        return empty
    band_key = int(group.column("band_key")[0].as_py())
    band_idx = band_key >> 16
    key = group.column("image_key").to_numpy(zero_copy_only=False)
    ph = group.column("phash").to_numpy(zero_copy_only=False)
    ids = group.column("image_id").to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")
    key, ph, ids = key[order], ph[order], ids[order]
    # collapse duplicate keys (identical corpus rows) — mirrors DISTINCT
    uniq = np.ones(n, dtype=bool)
    uniq[1:] = key[1:] != key[:-1]
    key, ph, ids = key[uniq], ph[uniq], ids[uniq]
    n = len(key)
    if n < 2:
        return empty
    ai, bi = np.triu_indices(n, k=1)
    x = ph[ai] ^ ph[bi]
    ham = popcount64(x)
    keep = ham <= spec.PHASH_HAMMING_MAX
    ai, bi, ham = ai[keep], bi[keep], ham[keep]
    if len(ai) == 0:
        return empty
    # lowest-matching-band rule: recompute band equality locally
    is_min = np.ones(len(ai), dtype=bool)
    for b in range(band_idx):
        ba = (ph[ai] >> np.int64(16 * b)) & np.int64(0xFFFF)
        bb = (ph[bi] >> np.int64(16 * b)) & np.int64(0xFFFF)
        is_min &= ba != bb
    ai, bi, ham = ai[is_min], bi[is_min], ham[is_min]
    return pa.table(
        {
            "image_a": pa.array(ids[ai], type=pa.string()),
            "image_b": pa.array(ids[bi], type=pa.string()),
            "hamming": pa.array(ham),
        }
    )


def phash_near_dup(images: "ray.data.Dataset") -> "ray.data.Dataset":
    return (
        images.map_batches(explode_phash_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band_key")
        .map_groups(phash_bucket_pairs, batch_format="pyarrow")
    )
