"""Raster↔vector tile assignment, manifests, raster dissolve + coverage.

North-rule stage (reference analog: the unused DEU land-cover raster,
/root/reference/data/DEU_cov/DEU_cov.vrt:1-14, and the coverage SQL at
app/query.py:143-192): every image footprint is assigned to the 0.25°
fine-tile grid (res-9 analog); per-tile manifests aggregate image count
and payload bytes; land-cover dissolve (A6) and coverage % (A7) are
computed on the same rasterization so they compose with the tile sink.

Pixel bytes are never shuffled — only (image_id, tile_id) skeletons move
(SURVEY.md §7.5); the manifest aggregates byte *sizes* computed from
metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .. import spec
from ..geo import cells as cellmod


def explode_tiles(batch: pa.Table, keep_cols: tuple[str, ...] = ("image_id",)) -> pa.Table:
    rows, tiles = cellmod.tile_ids(
        batch.column("x0").to_numpy(zero_copy_only=False),
        batch.column("y0").to_numpy(zero_copy_only=False),
        batch.column("x1").to_numpy(zero_copy_only=False),
        batch.column("y1").to_numpy(zero_copy_only=False),
    )
    out = batch.select(list(keep_cols)).take(pa.array(rows))
    return out.append_column("tile_id", pa.array(tiles))


def tile_assignment(images: "ray.data.Dataset") -> "ray.data.Dataset":
    """(image_id, tile_id) pairs — the raster↔vector assignment."""
    return images.map_batches(
        lambda b: explode_tiles(b, ("image_id",)),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


def tile_manifest(images: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-tile manifest: image count + total payload bytes (w*h)."""

    def explode_with_bytes(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.append_column("n_bytes", pa.array(w * h))
        return explode_tiles(batch, ("image_id", "n_bytes"))

    exploded = images.map_batches(
        explode_with_bytes, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from .hashagg import count_sum_by_key

    agg = count_sum_by_key(
        exploded, "tile_id", sum_cols=("n_bytes",), count_name="n_images"
    )
    return agg.map_batches(
        lambda b: b.rename_columns(
            [{"n_bytes": "total_bytes"}.get(c, c) for c in b.column_names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


MAX_TILE = int(spec.TILE_STRIDE * (340 * 4 + 8))  # world-grid tile-id bound


def lc_tiles_table(lc: pa.Table) -> pa.Table:
    """Rasterize the land-cover layer to (lc_id, featureclass, tile_id)
    (driver-side: the layer is the small broadcast side)."""
    rows, tiles = cellmod.tile_ids(
        lc.column("x0").to_numpy(zero_copy_only=False),
        lc.column("y0").to_numpy(zero_copy_only=False),
        lc.column("x1").to_numpy(zero_copy_only=False),
        lc.column("y1").to_numpy(zero_copy_only=False),
    )
    out = lc.select(["lc_id", "featureclass"]).take(pa.array(rows))
    return out.append_column("tile_id", pa.array(tiles))


def _lc_class_tile_sets(lc: pa.Table):
    """Per-featureclass DISTINCT tile sets in one pass: class codes are
    packed with tile ids into a single int64 key and uniqued once — no
    per-class masking over the exploded (strings-free) stream."""
    rows, tiles = cellmod.tile_ids(
        lc.column("x0").to_numpy(zero_copy_only=False),
        lc.column("y0").to_numpy(zero_copy_only=False),
        lc.column("x1").to_numpy(zero_copy_only=False),
        lc.column("y1").to_numpy(zero_copy_only=False),
    )
    fc = lc.column("featureclass").to_numpy(zero_copy_only=False)
    classes, codes = np.unique(fc, return_inverse=True)
    combined = codes[rows].astype(np.int64) * np.int64(MAX_TILE) + tiles
    u = np.unique(combined)
    return classes, (u // MAX_TILE).astype(np.intp), u % MAX_TILE


def dissolve_raster_area(lc: pa.Table) -> pa.Table:
    """A6 analog on the raster grid: per featureclass, area of the union
    of its polygons = (#distinct covered tiles) × tile area."""
    classes, ucode, _ = _lc_class_tile_sets(lc)
    n_arr = np.bincount(ucode, minlength=len(classes)).astype(np.int64)
    return pa.table(
        {
            "featureclass": pa.array(classes.astype("U"), type=pa.string()),
            "n_tiles": pa.array(n_arr),
            "area_sqkm": pa.array(n_arr * spec.TILE_AREA_SQKM),
        }
    )


def coverage_pct(images: "ray.data.Dataset", lc: pa.Table) -> pa.Table:
    """A7 analog: % of each featureclass's tiles covered by ≥1 image.

    The image side streams: distinct covered tiles are computed with a
    groupby on tile_id, then collapsed into a compact bitset (≈0.4 MB
    for the whole world grid) that the small lc side is tested against
    driver-side.
    """
    from .hashagg import tree_distinct

    def tiles_only(batch: pa.Table) -> pa.Table:
        _, t = cellmod.tile_ids(
            batch.column("x0").to_numpy(zero_copy_only=False),
            batch.column("y0").to_numpy(zero_copy_only=False),
            batch.column("x1").to_numpy(zero_copy_only=False),
            batch.column("y1").to_numpy(zero_copy_only=False),
        )
        return pa.table({"tile_id": pa.array(t)})

    # only tile ids enter the distinct — no image-id strings are
    # exploded/shipped for a query that never reads them
    covered = tree_distinct(
        images.map_batches(
            tiles_only, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "tile_id",
    )
    cov = covered.column("tile_id").to_numpy(zero_copy_only=False)
    bitset = np.zeros(MAX_TILE, dtype=bool)
    bitset[cov] = True

    classes, ucode, utile = _lc_class_tile_sets(lc)
    total = np.bincount(ucode, minlength=len(classes)).astype(np.int64)
    covered_n = np.bincount(
        ucode, weights=bitset[utile].astype(np.float64), minlength=len(classes)
    ).astype(np.int64)
    return pa.table(
        {
            "featureclass": pa.array(classes.astype("U"), type=pa.string()),
            "total_tiles": pa.array(total),
            "covered_tiles": pa.array(covered_n),
            "coverage_pct": pa.array(100.0 * covered_n / total),
        }
    )


def export_tile_manifests(
    images: "ray.data.Dataset",
    out_dir: str,
    bucket_span: int = 200_000,
    max_driver_tiles: int = 2_000_000,
) -> dict:
    """Resumable output layout (north rule): per-tile manifests written
    as partitioned parquet, one file per tile-id key range — never one
    giant file.  A failed run re-writes only missing buckets.

    Sink strategy is picked by a keyspace-cardinality estimate: when the
    tile-id bound fits driver memory comfortably (``MAX_TILE`` ≤
    ``max_driver_tiles``) the manifest is tree-reduced and fanned out to
    per-bucket write tasks; an unbounded/large keyspace goes through
    :func:`export_manifest_partitioned`, where the manifest never
    becomes driver-resident.

    Returns {written, skipped, buckets}."""
    import os

    import pyarrow.parquet as pq

    from .hashagg import tree_count_sum_by_key

    def explode_with_bytes(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.append_column("n_bytes", pa.array(w * h))
        return explode_tiles(batch, ("image_id", "n_bytes"))

    if MAX_TILE > max_driver_tiles:
        exploded = images.map_batches(
            explode_with_bytes,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        return export_manifest_partitioned(exploded, out_dir, bucket_span)

    exploded = images.map_batches(
        explode_with_bytes, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    manifest = tree_count_sum_by_key(
        exploded, "tile_id", sum_cols=("n_bytes",), count_name="n_images"
    )
    tiles_arr = manifest.column("tile_id").to_numpy(zero_copy_only=False)
    buckets = tiles_arr // bucket_span
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_bucket(b: int, part: pa.Table) -> bool:
        """One bucket, one task: skip-if-complete check + atomic write
        happen in the worker, so bucket writes overlap and no output
        byte round-trips through the driver."""
        path = os.path.join(out_dir, f"tile_bucket={int(b)}")
        os.makedirs(path, exist_ok=True)
        f = os.path.join(path, "manifest.parquet")
        if os.path.exists(f) and pq.read_metadata(f).num_rows == part.num_rows:
            return False
        tmp = f + ".tmp"
        pq.write_table(part, tmp)
        os.replace(tmp, f)
        return True

    uniq = np.unique(buckets)
    flags = ray.get(
        [
            write_bucket.remote(int(b), manifest.filter(pa.array(buckets == b)))
            for b in uniq
        ]
    )
    written = int(sum(flags))
    return {
        "written": written,
        "skipped": int(len(uniq)) - written,
        "buckets": int(len(uniq)),
    }


def export_manifest_partitioned(
    rows: "ray.data.Dataset", out_dir: str, bucket_span: int = 200_000
) -> dict:
    """Unbounded-keyspace manifest sink: the per-tile aggregate is
    NEVER driver-resident.  ``rows`` carries (tile_id, n_bytes) facts;
    each batch partial-combines, rows hash-shuffle on their BUCKET
    (tile_id // bucket_span), and every bucket group reduces its own
    partials, sorts by tile_id, and writes its manifest file from the
    worker (skip-if-complete + atomic publish).  Only a one-row
    summary per bucket returns to the driver.

    The per-bucket resume probe validates a CONTENT digest stored in
    the parquet footer metadata (hash of the sorted manifest columns'
    canonical bytes), so a bucket whose per-tile counts/bytes changed
    but whose tile cardinality did not still recomputes rather than
    silently reusing a stale file."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from .hashagg import _partial_kernel, _reduce_partials
    from ..util import collect_table

    os.makedirs(out_dir, exist_ok=True)

    def partial(batch: pa.Table) -> pa.Table:
        out = _partial_kernel(batch, "tile_id", ("n_bytes",), "n_images")
        b = out.column("tile_id").to_numpy(zero_copy_only=False) // np.int64(
            bucket_span
        )
        return out.append_column("__bucket", pa.array(b))

    def manifest_digest(part: pa.Table) -> str:
        # canonical per-column bytes (int64 numpy views of the sorted
        # table) — layout-independent, cheap vs the write it guards
        h = hashlib.sha256()
        for name in part.column_names:
            h.update(
                part.column(name)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .tobytes()
            )
        return h.hexdigest()[:16]

    def write_group(group: pa.Table) -> pa.Table:
        b = int(group.column("__bucket")[0].as_py())
        part = _reduce_partials(
            [group.drop_columns(["__bucket"])], "tile_id", ("n_bytes",), "n_images"
        )
        part = part.sort_by("tile_id")
        path = os.path.join(out_dir, f"tile_bucket={b}")
        os.makedirs(path, exist_ok=True)
        f = os.path.join(path, "manifest.parquet")
        dig = manifest_digest(part)
        written = True
        if os.path.exists(f):
            try:
                md = pq.read_metadata(f).metadata or {}
                written = md.get(b"graft_manifest_digest", b"").decode() != dig
            except Exception:
                written = True  # unreadable footer -> rewrite
        if written:
            tmp = f + ".tmp"
            pq.write_table(
                part.replace_schema_metadata({"graft_manifest_digest": dig}), tmp
            )
            os.replace(tmp, f)
        return pa.table(
            {
                "bucket": pa.array([b], type=pa.int64()),
                "written": pa.array([written]),
                "n_tiles": pa.array([part.num_rows], type=pa.int64()),
            }
        )

    pre = rows.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    summary = collect_table(
        pre.groupby("__bucket").map_groups(write_group, batch_format="pyarrow"),
        schema=pa.schema(
            [("bucket", pa.int64()), ("written", pa.bool_()), ("n_tiles", pa.int64())]
        ),
    )
    written = int(pc.sum(pc.cast(summary.column("written"), pa.int64())).as_py() or 0)
    return {
        "written": written,
        "skipped": summary.num_rows - written,
        "buckets": summary.num_rows,
    }
