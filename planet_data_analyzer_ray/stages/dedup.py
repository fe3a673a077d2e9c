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
    duplicate volume; the groupby pass below makes it global.

    Grouping needs any consistent ordering, so the bijective int
    image_key substitutes for image_id strings in the sort."""
    if key == "image_id" and "image_key" in batch.column_names:
        keys = batch.column("image_key").to_numpy(zero_copy_only=False)
    else:
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
        from ..util import hash_partition

        k = batch.column("image_key").to_numpy(zero_copy_only=False)
        part = hash_partition(k, num_partitions)
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

    # __part is a precomputed uniform hash id -> raw-task map-side
    # shuffle (stages/rawshuffle.py) instead of Ray's sort-based
    # map_groups; the splitter drops __part before the kernel runs
    from .rawshuffle import part_map_groups

    def dedup_partition(group: pa.Table) -> pa.Table:
        return _dedup_batch(group, key, order_col)

    return part_map_groups(combined, "__part", dedup_partition, num_partitions)


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
        use_int = key == "image_id" and "image_key" in group.column_names
        keys = group.column("image_key" if use_int else key).to_numpy(
            zero_copy_only=False
        )
        page = group.column("page_idx").to_numpy(zero_copy_only=False)
        clear = group.column("clear_confidence_percent").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        uniq, start, counts = np.unique(ks, return_index=True, return_counts=True)
        min_page = np.minimum.reduceat(page[order], start)
        min_clear = np.minimum.reduceat(clear[order], start)
        m = counts > 1
        key_col = (
            _ids_from_keys(uniq[m])
            if use_int
            else pa.array(uniq[m].astype("U"), type=pa.string())
        )
        return pa.table(
            {
                key: key_col,
                "n_copies": pa.array(counts[m].astype(np.int64)),
                "winner_page": pa.array(min_page[m].astype(np.int64)),
                "winner_clear": pa.array(min_clear[m].astype(np.float64)),
            }
        )

    from .rawshuffle import part_map_groups

    return part_map_groups(parted, "__part", audit_partition, num_partitions)


# --- phash near-dup (LSH bands + hamming refine) ---------------------------

def explode_phash_bands(batch: pa.Table) -> pa.Table:
    """Image batch -> one row per (band_key, image).  band_key packs
    (band_idx, 16-bit band value) so a single groupby key co-locates each
    band bucket.  Only int64 columns enter the shuffle — image_id is
    bijective with image_key ("img-<key>") and is reconstructed for the
    (much smaller) pair output, not shipped 4x per image."""
    key = batch.column("image_key").to_numpy(zero_copy_only=False)
    ph = batch.column("phash").to_numpy(zero_copy_only=False)
    parts_k, parts_ph, parts_band = [], [], []
    for b in range(spec.PHASH_BANDS):
        val = (ph >> np.int64(16 * b)) & np.int64(0xFFFF)
        parts_band.append(np.int64(b) * np.int64(1 << 16) + val)
        parts_k.append(key)
        parts_ph.append(ph)
    return pa.table(
        {
            "band_key": pa.array(np.concatenate(parts_band)),
            "image_key": pa.array(np.concatenate(parts_k)),
            "phash": pa.array(np.concatenate(parts_ph)),
        }
    )


def _ids_from_keys(keys: np.ndarray) -> pa.Array:
    """image_key -> image_id strings ("img-<key>", the corpus bijection)
    via Arrow C kernels."""
    import pyarrow.compute as pc

    ks = pc.cast(pa.array(keys), pa.string())
    return pc.binary_join_element_wise("img-", ks, "")


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
    order = np.argsort(key, kind="stable")
    key, ph = key[order], ph[order]
    # collapse duplicate keys (identical corpus rows) — mirrors DISTINCT
    uniq = np.ones(n, dtype=bool)
    uniq[1:] = key[1:] != key[:-1]
    key, ph = key[uniq], ph[uniq]
    n = len(key)
    if n < 2:
        return empty
    if n > LSH_BUCKET_CAP:
        # skew guard: salt-split a hot band bucket into sub-buckets by a
        # secondary key hash; pairs across sub-buckets are dropped (the
        # cap is far above any bucket the test corpora produce, so
        # oracle-compared output is unaffected at test scale).
        n_sub = (n + LSH_BUCKET_CAP - 1) // LSH_BUCKET_CAP
        # take HIGH bits before the mod: the multiply alone preserves
        # key parity for even n_sub, so a single-parity hot bucket would
        # recurse onto itself forever
        sub = (
            key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)
        ) % np.uint64(n_sub)
        outs = []
        for s in np.unique(sub):
            m = sub == s
            sl = pa.table(
                {
                    "band_key": pa.array(np.full(int(m.sum()), np.int64(band_key))),
                    "image_key": pa.array(key[m]),
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
            "image_a": _ids_from_keys(key[ai]),
            "image_b": _ids_from_keys(key[bi]),
            "hamming": pa.array(ham),
        }
    )


_PHASH_PAIR_SCHEMA = pa.schema(
    [
        ("image_a", pa.string()),
        ("image_b", pa.string()),
        ("hamming", pa.int64()),
    ]
)


def _phash_partition_pairs(group: pa.Table) -> pa.Table:
    """All buckets of one hash partition in ONE vectorized kernel.

    Candidate (a<b) pairs for every bucket are generated with the
    diagonal trick — for offset d, rows (j, j+d) pair iff they share a
    bucket — so the per-bucket Python call of the round-1 version
    (~25 us x hundreds of thousands of small buckets) disappears;
    hamming, threshold and the lowest-matching-band rule are then one
    pass over the full candidate set.  Buckets over LSH_BUCKET_CAP fall
    back to the per-bucket kernel (which salt-splits)."""
    bk = group.column("band_key").to_numpy(zero_copy_only=False)
    key_all = group.column("image_key").to_numpy(zero_copy_only=False)
    ph_all = group.column("phash").to_numpy(zero_copy_only=False)
    order = np.lexsort((key_all, bk))
    bk, key_all, ph_all = bk[order], key_all[order], ph_all[order]
    # collapse duplicate (bucket, key) rows — mirrors DISTINCT
    keep = np.ones(len(bk), dtype=bool)
    keep[1:] = (bk[1:] != bk[:-1]) | (key_all[1:] != key_all[:-1])
    bk, key_all, ph_all = bk[keep], key_all[keep], ph_all[keep]
    n = len(bk)
    if n == 0:
        return _PHASH_PAIR_SCHEMA.empty_table()
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = bk[1:] != bk[:-1]
    seg = np.cumsum(new_seg) - 1
    counts = np.bincount(seg)
    outs = []
    over = counts > LSH_BUCKET_CAP
    if over.any():
        # rare hot buckets: per-bucket kernel (salt-split path)
        starts = np.nonzero(new_seg)[0]
        for i in np.nonzero(over)[0]:
            s, c = int(starts[i]), int(counts[i])
            sl = pa.table(
                {
                    "band_key": pa.array(bk[s : s + c]),
                    "image_key": pa.array(key_all[s : s + c]),
                    "phash": pa.array(ph_all[s : s + c]),
                }
            )
            t = phash_bucket_pairs(sl)
            if t.num_rows:
                outs.append(t)
        vec = ~over[seg]
        bk, key_all, ph_all, seg = bk[vec], key_all[vec], ph_all[vec], seg[vec]
        n = len(bk)
    max_c = int(counts[~over].max()) if (~over).any() else 0
    pa_idx, pb_idx = [], []
    for d in range(1, max_c):
        if d >= n:
            break
        m = seg[d:] == seg[:-d]
        j = np.nonzero(m)[0]
        if len(j):
            pa_idx.append(j)
            pb_idx.append(j + d)
    if pa_idx:
        ai = np.concatenate(pa_idx)
        bi = np.concatenate(pb_idx)
        ham = popcount64(ph_all[ai] ^ ph_all[bi])
        keepp = ham <= spec.PHASH_HAMMING_MAX
        ai, bi, ham = ai[keepp], bi[keepp], ham[keepp]
        if len(ai):
            # lowest-matching-band rule, vectorized over mixed band_idx
            band_idx = bk[ai] >> np.int64(16)
            is_min = np.ones(len(ai), dtype=bool)
            for b in range(spec.PHASH_BANDS - 1):
                ba = (ph_all[ai] >> np.int64(16 * b)) & np.int64(0xFFFF)
                bb = (ph_all[bi] >> np.int64(16 * b)) & np.int64(0xFFFF)
                is_min &= ~((band_idx > b) & (ba == bb))
            ai, bi, ham = ai[is_min], bi[is_min], ham[is_min]
            if len(ai):
                # a<b by image_key (rows are key-sorted within a bucket)
                outs.append(
                    pa.table(
                        {
                            "image_a": _ids_from_keys(key_all[ai]),
                            "image_b": _ids_from_keys(key_all[bi]),
                            "hamming": pa.array(ham),
                        }
                    )
                )
    if not outs:
        return _PHASH_PAIR_SCHEMA.empty_table()
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
    from .rawshuffle import part_map_groups

    return part_map_groups(parted, "__part", _phash_partition_pairs, num_partitions)
