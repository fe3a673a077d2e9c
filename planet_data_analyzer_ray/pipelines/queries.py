"""Named query pipelines — one per operator family in SURVEY.md §2.

Each function takes ``sf_dir`` and returns a ``ray.data.Dataset`` /
``pyarrow.Table``; the driver compares each against the matching SQL in
:mod:`planet_data_analyzer_ray.oracle`.  All pipelines are streaming
Ray Data DAGs; only final small aggregates are materialized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from .. import spec
from .. import corpus as corpus_mod
from ..sources import images as src
from ..stages import ann as ann_stage
from ..stages import broadcast_join, dedup, decode, knn, spatial_join, text, tiles, timeseries


def _pm(ds, kernel, n: int = 128, col: str = "__part"):
    """``ds.groupby(col).map_groups(kernel)`` on the raw-task map-side
    hash shuffle (stages/rawshuffle.py): same kernel contract (the
    group keeps its partition column; empty partitions produce no
    group), no key sampling, no sort, no block coalescing.  Partition
    values are routed by ``% n`` — uniform for hash ids whatever the
    producer's modulus; ``n`` is the scale knob (reduce-task count).
    ONLY for hash-partition reducers whose output is independent of
    partition granularity (all hash exchanges here are); a kernel that
    assumes one distinct col value per group (e.g. one output file per
    bucket) must stay on groupby."""
    from ..stages.rawshuffle import part_map_groups

    return part_map_groups(ds, col, kernel, n, drop_col=False)


def _cached_text(cls):
    """Text-stage callable with per-worker construction (compiled
    regexes built once per worker process, full task-pool parallelism)."""
    from ..state.broadcast import cached

    name = f"text-stage-{cls.__name__}"

    def fn(batch):
        return cached(name, lambda _: cls())(batch)

    return fn


def _rename(ds: "ray.data.Dataset", mapping: dict[str, str]) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: b.rename_columns([mapping.get(c, c) for c in b.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


# --- metadata / dedup / filters -------------------------------------------

def q_images_metadata(sf_dir: str):
    """M1/M6-M8 metadata derivation THROUGH the D1 exact-dedup shuffle:
    the pre-dedup page stream (with synthetic duplicates) is globally
    deduplicated first-wins, then projected."""
    pages = src.image_pages_dataset(sf_dir)
    deduped = dedup.dedup_first_wins(pages, key="image_id", order_col="page_idx")
    return deduped.map_batches(
        lambda b: b.select(
            [
                "image_id",
                "sat_id",
                "cloud_cover",
                "clear_confidence_percent",
                "time_acquired",
                "centroid_lon",
                "centroid_lat",
                "area_sqkm",
                "w",
                "h",
                "fmt",
                "phash",
                "caption",
            ]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


def q_dedup_audit(sf_dir: str):
    return dedup.dedup_audit(src.image_pages_dataset(sf_dir), key="image_id")


def q_incremental_import(sf_dir: str):
    """S11 re-run story (reference ``ON CONFLICT DO NOTHING``,
    /root/reference/database/db.py:65-70; importer re-runs
    importer.py:31-37): a fresh page crawl lands on a store where ~2/3
    of the corpus (image_key % 3 != 0) is already imported.  Existing
    rows win every conflict; only genuinely-new ids survive from the
    incoming stream — observable via ``src`` (0 = pre-existing,
    1 = newly imported).

    Scale shape: this is an anti-join of a corpus-sized incoming stream
    against a corpus-sized existing key set — BOTH sides hash-partition
    on image_id through the shared first-wins dedup shuffle (no
    driver-side key set, no corpus-sized broadcast)."""

    def prep_prior(b: pa.Table) -> pa.Table:
        # light derive skips clear_confidence_percent; it is one mix
        # away from the key (exactly how the oracle recomputes it), so
        # the full string/list/phash derive is never paid for the prior
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        keep = k % 3 != 0
        t = b.filter(pa.array(keep)).select(["image_id", "image_key"])
        kk = k[keep]
        clear = (
            corpus_mod._mix(kk % np.int64(spec.MOD), spec.ST_CLEAR) % 101
        ).astype(np.float64)
        n = t.num_rows
        t = t.append_column("clear_confidence_percent", pa.array(clear))
        t = t.append_column("src", pa.array(np.zeros(n, np.int64)))
        return t.append_column("__ord", pa.array(np.full(n, -1, np.int64)))

    def prep_new(b: pa.Table) -> pa.Table:
        t = b.select(
            ["image_id", "image_key", "clear_confidence_percent", "page_idx"]
        )
        n = t.num_rows
        t = t.append_column("src", pa.array(np.ones(n, np.int64)))
        t = t.append_column("__ord", t.column("page_idx").combine_chunks())
        return t.drop_columns(["page_idx"])

    prior = src.images_dataset(sf_dir, light=True).map_batches(
        prep_prior, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    incoming = src.image_pages_dataset(sf_dir).map_batches(
        prep_new, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    merged = dedup.dedup_first_wins(
        prior.union(incoming), key="image_id", order_col="__ord"
    )
    return merged.map_batches(
        lambda b: b.select(["image_id", "src", "clear_confidence_percent"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def q_dataset_split(sf_dir: str):
    """Deterministic hash-based train/val/test split — the standard
    training-data-pipeline partitioning op.  Assignment is a pure
    function of the stable image key (spec.ST_SPLIT), so it is
    reproducible across re-runs, shard layouts and cluster sizes; no
    shuffle, no state — a single streaming map."""
    names = np.array(["test", "train", "val"], dtype="U")

    def assign(b: pa.Table) -> pa.Table:
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        bucket = corpus_mod._mix(k % np.int64(spec.MOD), spec.ST_SPLIT) % 100
        code = np.where(
            bucket < spec.SPLIT_TRAIN_PCT,
            1,
            np.where(bucket < spec.SPLIT_VAL_PCT, 2, 0),
        )
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "split": pa.array(names[code], type=pa.string()),
            }
        )

    return src.images_dataset(sf_dir, light=True).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _topk_per_sat(
    sat: np.ndarray, bucket: np.ndarray, key: np.ndarray, k: int
) -> np.ndarray:
    """Row indices of the k smallest (bucket, key) per satellite —
    one vectorized lexsort, no per-group Python."""
    order = np.lexsort((key, bucket, sat))
    ss = sat[order]
    start = np.zeros(len(ss), dtype=bool)
    if len(ss):
        start[0] = True
        start[1:] = ss[1:] != ss[:-1]
    group_start = np.maximum.accumulate(np.where(start, np.arange(len(ss)), 0))
    rank = np.arange(len(ss)) - group_start
    return np.sort(order[rank < k])


def q_sample_per_satellite(sf_dir: str):
    """Deterministic per-group uniform sample: per satellite, the
    SAMPLE_K rows with the smallest (hash, key).  Scale shape: a
    per-batch top-k combiner caps every block's contribution at
    k rows/satellite, so only #sats x k rows per block enter the
    final exchange — the classic partial-top-k pattern (same winners
    on any cluster size because the hash order is data-derived)."""
    k = spec.SAMPLE_K

    def partial(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        bucket = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_SAMPLE)
        keep = _topk_per_sat(sat, bucket, ik, k)
        t = b.select(["image_id", "sat_id", "image_key"]).take(pa.array(keep))
        return t.append_column("__bucket", pa.array(bucket[keep]))

    def final(group: pa.Table) -> pa.Table:
        sat = group.column("sat_id").to_numpy(zero_copy_only=False)
        bucket = group.column("__bucket").to_numpy(zero_copy_only=False)
        ik = group.column("image_key").to_numpy(zero_copy_only=False)
        keep = _topk_per_sat(sat, bucket, ik, k)
        return group.select(["image_id", "sat_id"]).take(pa.array(keep))

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    from ..util import hash_partition

    parted = pre.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(
                hash_partition(
                    b.column("sat_id").to_numpy(zero_copy_only=False), 64
                )
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return _pm(parted, lambda g: final(g.drop_columns(["__part"])))


def q_sat_cloud_quantiles(sf_dir: str):
    """Exact distributed PER-GROUP quantiles via bounded-histogram merge:
    cloud_cover takes 1001 discrete values (spec: mix % 1001 / 1000),
    so per-satellite histograms are exact sufficient statistics.  The
    shuffle carries only (sat, cloud_int) count partials (the
    count_sum_by_key combiner); the driver final reduces a
    #sats x 1001 bounded table.  Mirrors DuckDB ``quantile_disc``:
    1-based index ceil(q*n), computed in integer math."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        cint = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table({"code": pa.array(sat * np.int64(1001) + cint)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = collect_table(count_sum_by_key(enc, "code", count_name="n"))

    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")  # sorts by (sat, cint)
    code, n = code[order], n[order]
    sat = code // 1001
    cint = code % 1001
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))

    def pick(lo: int, hi: int, pct: int) -> float:
        cum = np.cumsum(n[lo:hi])
        total = int(cum[-1])
        target = (pct * total + 99) // 100  # ceil(q*n), 1-based
        j = int(np.searchsorted(cum, target))
        return float(cint[lo + j]) / 1000.0

    med = [pick(int(bounds[i]), int(bounds[i + 1]), 50) for i in range(len(uniq_sat))]
    p90 = [pick(int(bounds[i]), int(bounds[i + 1]), 90) for i in range(len(uniq_sat))]
    tot = np.add.reduceat(n, start)
    return pa.table(
        {
            "sat_id": pa.array(uniq_sat),
            "n_images": pa.array(tot.astype(np.int64)),
            "median_cloud": pa.array(np.asarray(med, dtype=np.float64)),
            "p90_cloud": pa.array(np.asarray(p90, dtype=np.float64)),
        }
    )


def q_filter_images(sf_dir: str):
    """F1/F2/F3/J5: cloud-cover + time-range filters + satellite
    semi-join.  The semi-join (sat_id IN selected set, reference
    app/query.py:91-92) is pushed down to the parquet scan as an
    ``isin`` filter on l_suppkey — predicate pushdown at the read."""
    import pyarrow.dataset as pads

    sats = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = sats.column("s_suppkey").to_numpy(zero_copy_only=False)
    selected = sk[sk % spec.FILTER_SAT_MOD == spec.FILTER_SAT_REM].tolist()
    flt = pads.field("l_suppkey").isin(selected)
    imgs = src.images_dataset(sf_dir, parquet_filter=flt)

    lo = np.datetime64(spec.FILTER_DATE_LO, "us")
    hi = np.datetime64(spec.FILTER_DATE_HI, "us")  # midnight, mirrors oracle

    def post_filter(batch: pa.Table) -> pa.Table:
        cc = batch.column("cloud_cover").to_numpy(zero_copy_only=False)
        ts = batch.column("time_acquired").to_numpy(zero_copy_only=False)
        m = (cc <= spec.FILTER_MAX_CLOUD) & (ts >= lo) & (ts <= hi)
        return batch.filter(pa.array(m)).select(
            ["image_id", "sat_id", "cloud_cover", "time_acquired"]
        )

    return imgs.map_batches(post_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _label_of(keys_tab: pa.Table, key_col: str, label_col: str):
    """Vectorized id->label lookup from a small broadcast-side table:
    returns a function mapping an int64 key array to a string Arrow
    array (the one shared implementation of the driver-side label
    attach used by every count query — strings never enter the
    distributed plan)."""
    ids = keys_tab.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    labels = np.asarray(keys_tab.column(label_col).to_numpy(zero_copy_only=False))
    order = np.argsort(ids, kind="stable")
    ids_s, labels_s = ids[order], labels[order]

    def attach(got: np.ndarray) -> pa.Array:
        if len(got) and not len(ids_s):
            raise KeyError(f"unknown {key_col} values in aggregate output")
        idx = np.searchsorted(ids_s, got.astype(np.int64))
        # clamp: a key above max(ids_s) searchsorts to len(ids_s); the
        # equality check below must see it as a miss, not an IndexError
        idx = np.minimum(idx, len(ids_s) - 1)
        if len(got) and not np.array_equal(ids_s[idx], got.astype(np.int64)):
            raise KeyError(f"unknown {key_col} values in aggregate output")
        return pa.array(labels_s[idx].astype("U"), type=pa.string())

    return attach


def q_count_per_satellite(sf_dir: str):
    """A1 + J1: count per satellite name.  The distributed plan counts
    int sat_ids shuffle-free (tree aggregate); the J1 name attach is a
    driver-side map over the 100-row dim table — no strings move."""
    from ..stages.hashagg import tree_count_sum_by_key

    imgs = src.images_dataset(sf_dir, light=True)
    counts = tree_count_sum_by_key(imgs, "sat_id", count_name="total_images")
    sats = src.satellites_table(sf_dir)
    got = counts.column("sat_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "sat_name": _label_of(sats, "sat_id", "sat_name")(got),
            "total_images": counts.column("total_images"),
        }
    )


# --- spatial joins ---------------------------------------------------------

def q_spatial_join_landcover(sf_dir: str):
    """J2 flagship: image ⋈ land-cover intersects pairs (broadcast
    STRtree actor-pool variant; the partitioned variant is
    equivalence-tested in tests/)."""
    return spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), src.land_cover_table(sf_dir), id_col="lc_id"
    )


def q_count_per_landcover(sf_dir: str):
    """A3: count per land-cover row.  Counts shuffle on the int lc_id
    only (hash-partitioned vectorized agg); the featureclass label is
    attached afterwards from the broadcast layer table — strings never
    enter the shuffle."""
    from ..stages.hashagg import tree_count_sum_by_key

    lc = src.land_cover_table(sf_dir)
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), lc, id_col="lc_id"
    )
    counts = tree_count_sum_by_key(pairs, "lc_id", count_name="total_images")
    got = counts.column("lc_id").to_numpy(zero_copy_only=False)
    return counts.append_column(
        "featureclass", _label_of(lc, "lc_id", "featureclass")(got)
    )


def q_count_per_featureclass(sf_dir: str):
    """A3: per-featureclass totals.  Only int lc_id pairs leave the
    join; counts tree-aggregate shuffle-free and the 5-row class rollup
    happens driver-side from the broadcast layer table — featureclass
    strings never enter the distributed plan."""
    from ..stages.hashagg import tree_count_sum_by_key

    lc = src.land_cover_table(sf_dir)
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), lc, id_col="lc_id"
    )
    counts = tree_count_sum_by_key(pairs, "lc_id", count_name="n")
    ids = lc.column("lc_id").to_numpy(zero_copy_only=False)
    fcs = lc.column("featureclass").to_numpy(zero_copy_only=False)
    classes, codes = np.unique(fcs, return_inverse=True)
    code_of = dict(zip(ids.tolist(), codes.tolist()))
    got = counts.column("lc_id").to_numpy(zero_copy_only=False)
    n = counts.column("n").to_numpy(zero_copy_only=False)
    totals = np.zeros(len(classes), dtype=np.int64)
    np.add.at(totals, [code_of[int(i)] for i in got.tolist()], n)
    # inner-join semantics (mirror the oracle): classes with zero
    # matching images emit NO row — at tiny/sparse scales a class can
    # genuinely be unmatched
    nz = totals > 0
    return pa.table(
        {
            "featureclass": pa.array(classes[nz].astype("U"), type=pa.string()),
            "total_images": pa.array(totals[nz]),
        }
    )


def q_city_image_counts(sf_dir: str):
    """J4 + A2: only int city_ids leave the join; the tree aggregate is
    shuffle-free and names come from the broadcast city table."""
    from ..stages.hashagg import tree_count_sum_by_key

    cities = src.cities_table(sf_dir)
    pairs = broadcast_join.city_buffer_join(
        src.images_dataset(sf_dir, light=True), cities
    )
    counts = tree_count_sum_by_key(pairs, "city_id", count_name="total_images")
    got = counts.column("city_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "city_id": counts.column("city_id"),
            "city_name": _label_of(cities, "city_id", "city_name")(got),
            "total_images": counts.column("total_images"),
        }
    )


def q_country_image_counts(sf_dir: str):
    """J3: image ⋈ country (broadcast variant — 25 polygons); int
    country indexes in the plan, iso labels attached driver-side."""
    from ..stages.hashagg import tree_count_sum_by_key

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), countries, id_col="lc_id"
    )
    counts = tree_count_sum_by_key(pairs, "lc_id", count_name="total_images")
    isos = countries.column("iso").to_numpy(zero_copy_only=False)
    got = counts.column("lc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "iso": pa.array(isos[got].astype("U"), type=pa.string()),
            "total_images": counts.column("total_images"),
        }
    )


def q_knn_city_scenes(sf_dir: str):
    cities = src.cities_table(sf_dir)
    sel = (
        cities.column("city_id").to_numpy(zero_copy_only=False) % spec.KNN_CITY_MOD == 0
    )
    cities = cities.filter(pa.array(sel))
    result = knn.knn_city_scenes(src.images_dataset(sf_dir, light=True), cities, k=spec.KNN_K)
    return result.select(["city_id", "image_id", "dist_sq", "rank"])


# --- time / tiles / coverage ----------------------------------------------

def _bucket_index(ts: np.ndarray, freq: str) -> np.ndarray:
    """Timestamp array -> integer bucket index since epoch for the
    user-selectable frequency (reference app/filters.py:27-30 exposes
    Month/Week/Day/Hour/Minute).  Weeks are Monday-aligned to mirror
    DuckDB's date_trunc('week')."""
    if freq == "month":
        return ts.astype("datetime64[M]").astype(np.int64)
    if freq == "week":
        d = ts.astype("datetime64[D]").astype(np.int64)
        return d - ((d + 3) % 7)  # 1970-01-01 was a Thursday
    if freq == "day":
        return ts.astype("datetime64[D]").astype(np.int64)
    if freq == "hour":
        return ts.astype("datetime64[h]").astype(np.int64)
    if freq == "minute":
        return ts.astype("datetime64[m]").astype(np.int64)
    raise ValueError(f"unknown heatmap frequency {freq!r}")


def _bucket_labels(idx: np.ndarray, freq: str) -> pa.Array:
    """Inverse of :func:`_bucket_index`: bucket index -> oracle-format
    label strings (vectorized numpy datetime formatting)."""
    if freq == "month":
        years = 1970 + idx // 12
        mons = idx % 12 + 1
        return pa.array(
            [f"{y:04d}-{m:02d}" for y, m in zip(years.tolist(), mons.tolist())],
            type=pa.string(),
        )
    if freq in ("week", "day"):
        return pa.array(
            np.datetime_as_string(idx.astype("datetime64[D]"), unit="D"),
            type=pa.string(),
        )
    if freq == "hour":
        s = np.datetime_as_string(idx.astype("datetime64[h]"), unit="h")
        return pa.array(np.char.replace(s, "T", " "), type=pa.string())
    if freq == "minute":
        s = np.datetime_as_string(idx.astype("datetime64[m]"), unit="m")
        return pa.array(np.char.replace(s, "T", " "), type=pa.string())
    raise ValueError(f"unknown heatmap frequency {freq!r}")


def q_time_heatmap_freq(sf_dir: str, freq: str = "month"):
    """A8 with a parameterized bucket frequency: (bucket, 1-deg grid)
    counts.  Scale path: pack (bucket index, grid) into one int64 key,
    tree-aggregate shuffle-free, reconstruct the label columns in the
    final (small) materialized table."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack_batch(batch: pa.Table) -> pa.Table:
        ts = batch.column("time_acquired").to_numpy(zero_copy_only=False)
        b = _bucket_index(ts, freq)
        lon = batch.column("centroid_lon").to_numpy(zero_copy_only=False)
        lat = batch.column("centroid_lat").to_numpy(zero_copy_only=False)
        gx = np.floor(lon).astype(np.int64)
        gy = np.floor(lat).astype(np.int64)
        key = (b << np.int64(22)) | ((gx + 180) << np.int64(11)) | (gy + 90)
        return pa.table({"hkey": pa.array(key)})

    packed = src.images_dataset(sf_dir).map_batches(
        pack_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="total_images")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    bidx = key >> np.int64(22)
    gx = ((key >> np.int64(11)) & np.int64(2047)) - 180
    gy = (key & np.int64(2047)) - 90
    return pa.table(
        {
            "bucket": _bucket_labels(bidx, freq),
            "grid_lon": pa.array(gx),
            "grid_lat": pa.array(gy),
            "total_images": agg.column("total_images"),
        }
    )


def q_time_heatmap(sf_dir: str):
    return q_time_heatmap_freq(sf_dir, "month")


def q_tile_assignment(sf_dir: str):
    return tiles.tile_assignment(src.images_dataset(sf_dir, light=True))


def q_tile_manifest(sf_dir: str):
    return tiles.tile_manifest(src.images_dataset(sf_dir, light=True))


def q_dissolve_raster_area(sf_dir: str):
    return tiles.dissolve_raster_area(src.land_cover_table(sf_dir))


def q_coverage_pct(sf_dir: str):
    return tiles.coverage_pct(src.images_dataset(sf_dir, light=True), src.land_cover_table(sf_dir))


# --- near-dup / sketches ---------------------------------------------------

def q_phash_near_dup(sf_dir: str):
    return dedup.phash_near_dup(src.images_dataset(sf_dir))


def q_image_nearest_city(sf_dir: str):
    """Nearest-facility attach (reverse kNN): each canonical image gets
    its nearest city (squared planar degrees; ties -> lowest city_id).
    The city table is broadcast once and scanned per row-chunk with a
    vectorized distance matrix (the exact baseline, same shape as
    ann_topk's broadcast matmul); the ring-pruned variant in stages/knn
    is the scale path when the facility table outgrows broadcast.
    Probe side is deduped first (one first-wins exchange) so key-
    collision duplicate rows emit once, mirroring the DISTINCT oracle."""
    from ..geo import cells as cellmod

    cities = src.cities_table(sf_dir)
    order = pc.sort_indices(cities, sort_keys=[("city_id", "ascending")])
    cities = cities.take(order)  # lexsort tiebreak == lowest city_id
    clon = cities.column("lon").to_numpy(zero_copy_only=False)
    clat = cities.column("lat").to_numpy(zero_copy_only=False)
    cid = cities.column("city_id").to_numpy(zero_copy_only=False)
    ref = ray.put((clon, clat, cid))

    class _CityIndex:
        """Per-worker state: city arrays + lazily-built ring CSR
        indexes (cell -> cities whose ring-r block contains it)."""

        def __init__(self, arrays):
            self.lon, self.lat, self.cid = arrays
            ccell_x, ccell_y = (
                np.floor((self.lon + spec.LON_OFF) / spec.CELL_DEG).astype(np.int64),
                np.floor((self.lat + spec.LAT_OFF) / spec.CELL_DEG).astype(np.int64),
            )
            self.cx, self.cy = ccell_x, ccell_y
            self.csr: dict[int, tuple] = {}

        def index(self, ring: int):
            if ring not in self.csr:
                offs = np.arange(-ring, ring + 1, dtype=np.int64)
                dx, dy = np.meshgrid(offs, offs, indexing="ij")
                dx, dy = dx.ravel(), dy.ravel()
                nb = len(dx)
                cells = cellmod.pack(
                    np.repeat(self.cx, nb) + np.tile(dx, len(self.cx)),
                    np.repeat(self.cy, nb) + np.tile(dy, len(self.cy)),
                )
                city_idx = np.repeat(np.arange(len(self.cx), dtype=np.int64), nb)
                o = np.argsort(cells, kind="stable")
                cells, city_idx = cells[o], city_idx[o]
                uniq, start = np.unique(cells, return_index=True)
                self.csr[ring] = (uniq, np.append(start, len(cells)), city_idx)
            return self.csr[ring]

    def nearest(b: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        ix = cached(ref, _CityIndex)
        ilon = b.column("centroid_lon").to_numpy(zero_copy_only=False)
        ilat = b.column("centroid_lat").to_numpy(zero_copy_only=False)
        icell = cellmod.cell_of(ilon, ilat)
        n = len(ilon)
        best_c = np.full(n, -1, dtype=np.int64)
        best_d = np.full(n, np.inf, dtype=np.float64)
        todo = np.arange(n, dtype=np.int64)
        for ring in (1, 2, 4):
            if not len(todo):
                break
            uniq, bounds, city_idx = ix.index(ring)
            pos = np.searchsorted(uniq, icell[todo])
            pos = np.minimum(pos, len(uniq) - 1) if len(uniq) else pos
            hit = len(uniq) > 0
            valid = (uniq[pos] == icell[todo]) if hit else np.zeros(len(todo), bool)
            cnt = np.where(valid, bounds[pos + 1] - bounds[pos], 0)
            img_flat = np.repeat(todo, cnt)
            starts = bounds[pos]
            # flatten candidate city indices per image (vectorized
            # ragged gather: base start per row + within-row offset)
            total = int(cnt.sum())
            if total:
                base = np.repeat(starts, cnt)
                off = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt
                )
                flat_idx = city_idx[base + off]
            else:
                flat_idx = np.empty(0, dtype=np.int64)
            if len(flat_idx):
                dxv = ix.lon[flat_idx] - ilon[img_flat]
                dyv = ix.lat[flat_idx] - ilat[img_flat]
                dv = dxv * dxv + dyv * dyv
                keep = _topk_per_sat(img_flat, dv, ix.cid[flat_idx], 1)
                bi, bd, bc = img_flat[keep], dv[keep], flat_idx[keep]
                best_d[bi] = bd
                best_c[bi] = bc
            bound = (ring * spec.CELL_DEG) ** 2
            todo = todo[~((best_c[todo] >= 0) & (best_d[todo] <= bound))]
        if len(todo):  # brute-force residue (sparse regions)
            CH = 512
            for s in range(0, len(todo), CH):
                t = todo[s : s + CH]
                dxm = ix.lon[None, :] - ilon[t, None]
                dym = ix.lat[None, :] - ilat[t, None]
                dm = dxm * dxm + dym * dym
                j = np.argmin(dm, axis=1)  # first min == lowest city_id
                best_c[t] = j
                best_d[t] = dm[np.arange(len(t)), j]
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "city_id": pa.array(ix.cid[best_c]),
                "dist_sq": pa.array(best_d),
            }
        )

    imgs = src.images_dataset(sf_dir, light=True).map_batches(
        lambda b: b.append_column(
            "__ord", pa.array(np.zeros(b.num_rows, np.int64))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    ded = dedup.dedup_first_wins(imgs, key="image_id", order_col="__ord")
    return ded.map_batches(
        nearest, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _lc_join_pair_skeleton(sf_dir: str) -> "ray.data.Dataset":
    """Memoized (image_key, lc_id, area_sqkm) pair skeleton of the
    image x land-cover broadcast join — the join compute runs once for
    the two join-sampling consumers (~24 B/pair in the object store)."""
    from .. import corpus
    from ..stages.spatial_join import _Layer, _join_batch
    from ..state.broadcast import cached
    from .pixel_fused import shared

    def build():
        layer_ref = ray.put(src.land_cover_table(sf_dir))

        def derive_join(batch: pa.Table) -> pa.Table:
            imgs = corpus.derive_images(batch, light=True)
            L = cached(layer_ref, lambda t: _Layer(t, "lc_id"))
            return _join_batch(
                imgs, L, img_cols=("image_key", "area_sqkm"),
                emit_image_id=False,
            )

        return (
            src.lineitem_dataset(sf_dir)
            .map_batches(
                derive_join, batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None,
            )
            .materialize()
        )

    return shared(sf_dir, "lc_join_pairs", build)


def _join_sample_impl(sf_dir: str, weighted: bool, k: int):
    """Shared scaffolding for join-result sampling: the memoized join
    pair skeleton -> per-batch top-k of the sample priority (k
    candidate rows per block; the full join result never transits the
    driver) -> driver final merge of #blocks x k rows."""
    from ..util import collect_table

    def priority(pairs: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        key = pairs.column("image_key").to_numpy(zero_copy_only=False)
        lc = pairs.column("lc_id").to_numpy(zero_copy_only=False)
        packed = ((key % np.int64(spec.MOD)) * np.int64(131071) + lc) % np.int64(
            spec.MOD
        )
        hv = corpus_mod._mix(packed, spec.ST_PAIR_SAMPLE)
        if weighted:
            area = pairs.column("area_sqkm").to_numpy(zero_copy_only=False)
            return key, lc, hv.astype(np.float64) / area
        return key, lc, hv

    def topk(key, lc, pv, kk):
        return np.sort(np.lexsort((lc, key, pv))[:kk])

    def join_sample(pairs: pa.Table) -> pa.Table:
        key, lc, pv = priority(pairs)
        keep = topk(key, lc, pv, k)
        return pa.table(
            {
                "image_key": pa.array(key[keep]),
                "lc_id": pa.array(lc[keep]),
                "pv": pa.array(pv[keep]),
            }
        )

    cand = _lc_join_pair_skeleton(sf_dir).map_batches(
        join_sample, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    pv_type = pa.float64() if weighted else pa.int64()
    tab = collect_table(
        cand,
        schema=pa.schema(
            [("image_key", pa.int64()), ("lc_id", pa.int64()), ("pv", pv_type)]
        ),
    )
    key = tab.column("image_key").to_numpy(zero_copy_only=False)
    lc = tab.column("lc_id").to_numpy(zero_copy_only=False)
    pv = tab.column("pv").to_numpy(zero_copy_only=False)
    keep = topk(key, lc, pv, k)
    return pa.table(
        {
            "image_id": pc.binary_join_element_wise(
                "img-", pc.cast(pa.array(key[keep]), pa.string()), ""
            ),
            "lc_id": pa.array(lc[keep]),
        }
    )


def q_spatial_join_sample(sf_dir: str, k: int = spec.JOIN_SAMPLE_K):
    """Uniform sample of the image x land-cover join RESULT without
    materializing it (cf. the sampling-over-joins line of work): the
    sample is the k pairs with the smallest deterministic pair hash —
    a streaming top-k over the join output."""
    return _join_sample_impl(sf_dir, weighted=False, k=k)


def q_spatial_join_sample_weighted(sf_dir: str, k: int = spec.JOIN_SAMPLE_K):
    """Weighted sample over the join result (cf. the weighted
    sampling-over-joins line of work): pair priority = hash / weight
    (weight = image footprint area), k smallest priorities win — larger
    footprints are proportionally likelier."""
    return _join_sample_impl(sf_dir, weighted=True, k=k)


def q_tile_best_image(sf_dir: str):
    """Mosaic compositing selection: per tile, the best (lowest cloud
    cover, then lowest key) covering image — the per-tile argmin that
    drives best-pixel composites.  Scale shape: a per-batch argmin
    combiner caps each block's contribution at one row per touched
    tile, the exchange carries (tile, key, cloud_mi) ints, and the
    per-partition final is one lexsort (no per-tile Python at 10^6+
    tiles).  cloud rides as integer milli-units so ordering is exact;
    the double renders once at the end (mirrors the oracle)."""
    from ..geo import cells as cellmod

    def best_of(tile: np.ndarray, key: np.ndarray, cmi: np.ndarray) -> np.ndarray:
        order = np.lexsort((key, cmi, tile))
        ts = tile[order]
        first = np.ones(len(ts), dtype=bool)
        first[1:] = ts[1:] != ts[:-1]
        return np.sort(order[first])

    def combiner(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        cmi = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        rows, tiles_arr = cellmod.tile_ids(
            b.column("x0").to_numpy(zero_copy_only=False),
            b.column("y0").to_numpy(zero_copy_only=False),
            b.column("x1").to_numpy(zero_copy_only=False),
            b.column("y1").to_numpy(zero_copy_only=False),
        )
        key_r, cmi_r = ik[rows], cmi[rows]
        keep = best_of(tiles_arr, key_r, cmi_r)
        t = pa.table(
            {
                "tile_id": pa.array(tiles_arr[keep]),
                "image_key": pa.array(key_r[keep]),
                "cloud_mi": pa.array(cmi_r[keep]),
            }
        )
        from ..util import hash_partition

        return t.append_column(
            "__part", pa.array(hash_partition(tiles_arr[keep], 1024))
        )

    def final(group: pa.Table) -> pa.Table:
        tile = group.column("tile_id").to_numpy(zero_copy_only=False)
        key = group.column("image_key").to_numpy(zero_copy_only=False)
        cmi = group.column("cloud_mi").to_numpy(zero_copy_only=False)
        keep = best_of(tile, key, cmi)
        image_id = pc.binary_join_element_wise(
            "img-", pc.cast(pa.array(key[keep]), pa.string()), ""
        )
        return pa.table(
            {
                "tile_id": pa.array(tile[keep]),
                "image_id": image_id,
                "cloud_cover": pa.array(cmi[keep] / 1000.0),
            }
        )

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        combiner, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(pre, lambda g: final(g.drop_columns(["__part"])))


def _phash_pair_keys(sf_dir: str) -> "ray.data.Dataset":
    """phash near-dup pairs with the 'img-<key>' ids parsed back to int
    keys (ka, kb) — shared by every cluster-family query.  Round 5:
    memoized + materialized per (session, sf_dir) — the pair discovery
    exchange runs once for the ~9 graph/dedup consumers (pairs are
    output-sized, ~24 B/edge with hamming in the object store); this
    view projects the key columns from the hamming-carrying memo."""
    from .pixel_fused import shared

    def build():
        return (
            _phash_pairs_ham(sf_dir)
            .select_columns(["ka", "kb"])
            .materialize()
        )

    return shared(sf_dir, "phash_pair_keys", build)


def _phash_pairs_ham(sf_dir: str) -> "ray.data.Dataset":
    """(ka, kb, hamming) near-dup pair table, memoized + materialized —
    the single run of the corpus-wide pair-discovery exchange."""
    from .pixel_fused import shared

    def build():
        return (
            q_phash_near_dup(sf_dir)
            .map_batches(
                lambda b: pa.table(
                    {
                        "ka": pc.cast(
                            pc.utf8_slice_codeunits(b.column("image_a"), 4),
                            pa.int64(),
                        ),
                        "kb": pc.cast(
                            pc.utf8_slice_codeunits(b.column("image_b"), 4),
                            pa.int64(),
                        ),
                        "ham": b.column("hamming"),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
            .materialize()
        )

    return shared(sf_dir, "phash_pairs_ham", build)


def _phash_cc(sf_dir: str) -> "ray.data.Dataset":
    """Connected components over the phash near-dup pairs (node, label)
    — memoized + materialized: the label-propagation exchange runs once
    for the cluster-family consumers (canonical pick, dedup filter,
    size histogram, audits)."""
    from ..stages import graph
    from .pixel_fused import shared

    return shared(
        sf_dir,
        "phash_cc",
        lambda: graph.connected_components(
            _phash_pair_keys(sf_dir), "ka", "kb"
        ).materialize(),
    )


def _canonical_row_strings(
    cl: np.ndarray, key: np.ndarray, clear: np.ndarray, n_members: np.ndarray
) -> pa.Table:
    return pa.table(
        {
            "cluster_id": pc.binary_join_element_wise(
                "img-", pc.cast(pa.array(cl), pa.string()), ""
            ),
            "keep_image_id": pc.binary_join_element_wise(
                "img-", pc.cast(pa.array(key), pa.string()), ""
            ),
            "keep_clear": pa.array(clear.astype(np.float64)),
            "n_members": pa.array(n_members.astype(np.int64)),
        }
    )


def q_phash_cluster_canonical(sf_dir: str):
    """Dedup canonical selection: per phash near-dup cluster, the
    member to KEEP — highest clear_confidence_percent, ties to lowest
    key.  Size-gated finalizer (see stages.dedup_finalize): below the
    gate the output-sized cluster map is broadcast once and probed per
    batch with searchsorted (the image stream emits one (cluster,
    clear, key) candidate per clustered image, a per-batch arg-best
    combiner caps block output at one row per cluster, and a
    hash-partitioned final reduces); above it the corpus co-partitions
    with the label table on image_key through a hash exchange
    (attach_labels) and a second cluster-hash exchange reduces — no
    driver-resident node->label table at 100 TB."""
    from ..stages import dedup_finalize as dfz
    from ..stages import graph
    from ..util import collect_table, hash_partition

    def arg_best(cl: np.ndarray, clear: np.ndarray, key: np.ndarray) -> np.ndarray:
        # best = max clear, then min key: lexsort on (key, -clear, cl)
        order = np.lexsort((key, -clear, cl))
        cs = cl[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        return np.sort(order[first])

    pairs = _phash_pair_keys(sf_dir)
    cc_ds = _phash_cc(sf_dir)
    if cc_ds.count() > dfz.DRIVER_THRESHOLD:
        att = dfz.attach_labels(
            src.images_dataset(sf_dir, light=True), "image_key", cc_ds
        )

        def cand_combine(b: pa.Table) -> pa.Table:
            # keeper candidates only (cnt=0): member counts come from
            # the CC map below, NOT from the stream — the stream may
            # carry duplicate keys (sf0.001 has one duplicate lineitem
            # key) and n_members counts unique cluster NODES
            ik = b.column("key").to_numpy(zero_copy_only=False)
            cl = b.column("label").to_numpy(zero_copy_only=False)
            if len(ik) == 0:
                e = pa.array(np.empty(0, np.int64))
                return pa.table(
                    {"cluster": e, "clear_mi": e, "key": e, "cnt": e, "__part": e}
                )
            clear = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLEAR) % 101
            keep = arg_best(cl, clear, ik)
            kcl = cl[keep]
            return pa.table(
                {
                    "cluster": pa.array(kcl),
                    "clear_mi": pa.array(clear[keep]),
                    "key": pa.array(ik[keep]),
                    "cnt": pa.array(np.zeros(len(kcl), np.int64)),
                    "__part": pa.array(hash_partition(kcl, 64)),
                }
            )

        def cc_count_partials(b: pa.Table) -> pa.Table:
            # per-block unique-node counts per cluster; clear_mi=-1 and
            # key=INT64_MAX so these rows can never win arg_best (every
            # real candidate has clear in [0, 100])
            lab = b.column("label").to_numpy(zero_copy_only=False)
            if len(lab) == 0:
                e = pa.array(np.empty(0, np.int64))
                return pa.table(
                    {"cluster": e, "clear_mi": e, "key": e, "cnt": e, "__part": e}
                )
            ucl, cnt = np.unique(lab, return_counts=True)
            return pa.table(
                {
                    "cluster": pa.array(ucl),
                    "clear_mi": pa.array(np.full(len(ucl), -1, np.int64)),
                    "key": pa.array(
                        np.full(len(ucl), np.iinfo(np.int64).max, np.int64)
                    ),
                    "cnt": pa.array(cnt),
                    "__part": pa.array(hash_partition(ucl, 64)),
                }
            )

        def final_group(group: pa.Table) -> pa.Table:
            cl = group.column("cluster").to_numpy(zero_copy_only=False)
            if len(cl) == 0:
                e = np.empty(0, np.int64)
                return _canonical_row_strings(e, e, e, e)
            clear = group.column("clear_mi").to_numpy(zero_copy_only=False)
            key = group.column("key").to_numpy(zero_copy_only=False)
            cnt = group.column("cnt").to_numpy(zero_copy_only=False)
            keep = arg_best(cl, clear, key)
            o = np.argsort(cl, kind="stable")
            ucl, start = np.unique(cl[o], return_index=True)
            tot = np.add.reduceat(cnt[o], start)
            kcl = cl[keep]
            return _canonical_row_strings(
                kcl, key[keep], clear[keep], tot[np.searchsorted(ucl, kcl)]
            )

        pre = att.map_batches(
            cand_combine,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ).union(
            cc_ds.map_batches(
                cc_count_partials,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            )
        )
        return _pm(pre, lambda g: final_group(g.drop_columns(["__part"])))

    cc = collect_table(
        cc_ds,
        schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
    )
    node = cc.column("node").to_numpy(zero_copy_only=False)
    label = cc.column("label").to_numpy(zero_copy_only=False)
    o = np.argsort(node, kind="stable")
    node, label = node[o], label[o]
    sizes_label, sizes = np.unique(label, return_counts=True)
    ref = ray.put((node, label))

    def candidates(b: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        from ..util import sorted_isin

        n_s, l_s = cached(ref, lambda t: t)
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        inset = sorted_isin(n_s, ik)
        ik = ik[inset]
        cl = l_s[np.searchsorted(n_s, ik)]
        clear = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLEAR) % 101
        keep = arg_best(cl, clear, ik)
        t = pa.table(
            {
                "cluster": pa.array(cl[keep]),
                "clear_mi": pa.array(clear[keep]),
                "key": pa.array(ik[keep]),
            }
        )
        return t.append_column(
            "__part", pa.array(hash_partition(cl[keep], 64))
        )

    def final(group: pa.Table) -> pa.Table:
        cl = group.column("cluster").to_numpy(zero_copy_only=False)
        clear = group.column("clear_mi").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        keep = arg_best(cl, clear, key)
        return pa.table(
            {
                "cluster": pa.array(cl[keep]),
                "clear_mi": pa.array(clear[keep]),
                "key": pa.array(key[keep]),
            }
        )

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    best = collect_table(
        _pm(pre, lambda g: final(g.drop_columns(["__part"]))),
        schema=pa.schema(
            [("cluster", pa.int64()), ("clear_mi", pa.int64()), ("key", pa.int64())]
        ),
    )
    cl = best.column("cluster").to_numpy(zero_copy_only=False)
    o = np.argsort(cl, kind="stable")
    cl = cl[o]
    clear = best.column("clear_mi").to_numpy(zero_copy_only=False)[o]
    key = best.column("key").to_numpy(zero_copy_only=False)[o]
    n_members = sizes[np.searchsorted(sizes_label, cl)]
    return _canonical_row_strings(cl, key, clear, n_members)


def q_zonal_pixel_stats(sf_dir: str):
    """ZONAL STATISTICS (the named GIS raster-vector op): per
    land-cover featureclass, image count, total decoded pixels and mean
    decoded pixel value over every intersecting image.  One fused stage
    derives metadata + payload, sums REAL pixel bytes (integer-exact),
    drops the bytes, and joins against the broadcast STRtree — pixels
    never leave the task; the shuffle carries (lc_id, n_px, pix_sum)
    partials only; the per-class rollup is #classes-sized.
    Round 5: (n_px, pix_sum) come from the FUSED pixel pass; footprints
    re-derive from image_key (geom_md_from_keys) — the join leg is now
    payload-free."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..stages.spatial_join import _Layer, _join_batch
    from ..state.broadcast import cached
    from .pixel_fused import attach_footprints, per_image

    lc = src.land_cover_table(sf_dir)
    layer_ref = ray.put(lc)

    def join_metrics(batch: pa.Table) -> pa.Table:
        imgs = attach_footprints(batch.select(["image_key", "n_px", "pix_sum"]))
        L = cached(layer_ref, lambda t: _Layer(t, "lc_id"))
        return _join_batch(
            imgs, L, img_cols=("n_px", "pix_sum"), emit_image_id=False
        )

    pairs = per_image(sf_dir).map_batches(
        join_metrics,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    counts = tree_count_sum_by_key(
        pairs, "lc_id", sum_cols=("n_px", "pix_sum"), count_name="n_images"
    )
    ids = lc.column("lc_id").to_numpy(zero_copy_only=False)
    fcs = lc.column("featureclass").to_numpy(zero_copy_only=False)
    classes, codes = np.unique(fcs, return_inverse=True)
    code_of = np.zeros(int(ids.max()) + 1, dtype=np.int64)
    code_of[ids] = codes
    got = counts.column("lc_id").to_numpy(zero_copy_only=False)
    n = counts.column("n_images").to_numpy(zero_copy_only=False)
    npx = counts.column("n_px").to_numpy(zero_copy_only=False)
    psum = counts.column("pix_sum").to_numpy(zero_copy_only=False)
    c = code_of[got]
    t_n = np.zeros(len(classes), dtype=np.int64)
    t_px = np.zeros(len(classes), dtype=np.int64)
    t_sum = np.zeros(len(classes), dtype=np.int64)
    np.add.at(t_n, c, n)
    np.add.at(t_px, c, npx)
    np.add.at(t_sum, c, psum)
    nz = t_n > 0
    return pa.table(
        {
            "featureclass": pa.array(classes[nz].astype("U"), type=pa.string()),
            "n_pairs": pa.array(t_n[nz]),
            "total_pixels": pa.array(t_px[nz]),
            "mean_pixel": pa.array(t_sum[nz] / t_px[nz].astype(np.float64)),
        }
    )


def q_images_dedup_near(sf_dir: str):
    """End of the near-dup arc: the corpus with non-canonical cluster
    members REMOVED (each phash cluster keeps its max-clear/min-key
    member; singletons pass through).  Size-gated finalizer (see
    stages.dedup_finalize): below the gate the output-sized drop set is
    broadcast once and the stream filter is a searchsorted probe per
    batch; above it the keeper rule runs as a label-hash exchange and
    the corpus anti-joins the drop set co-partitioned on image_key —
    nothing driver-resident at 100 TB."""
    from ..stages import dedup_finalize as dfz
    from ..stages import graph
    from ..util import collect_table

    pairs = _phash_pair_keys(sf_dir)
    cc_ds = _phash_cc(sf_dir)
    if cc_ds.count() > dfz.DRIVER_THRESHOLD:
        drop = dfz.drop_non_best_members(cc_ds)
        keys = dfz.anti_join_keys(
            src.images_dataset(sf_dir, light=True), "image_key", (), drop
        )
        return keys.map_batches(
            lambda b: pa.table(
                {
                    "image_id": pc.binary_join_element_wise(
                        "img-",
                        pc.cast(b.column("image_key"), pa.string()),
                        "",
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    cc = collect_table(
        cc_ds,
        schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
    )
    node = cc.column("node").to_numpy(zero_copy_only=False)
    label = cc.column("label").to_numpy(zero_copy_only=False)
    clear = corpus_mod._mix(node % np.int64(spec.MOD), spec.ST_CLEAR) % 101
    order = np.lexsort((node, -clear, label))
    ls = label[order]
    first = np.ones(len(ls), dtype=bool)
    if len(ls):
        first[1:] = ls[1:] != ls[:-1]
    keepers = node[order][first]
    drop = np.setdiff1d(node, keepers)  # sorted
    ref = ray.put(drop)

    def flt(b: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        from ..util import sorted_isin

        d = cached(ref, lambda t: t)
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        return b.select(["image_id"]).filter(pa.array(~sorted_isin(d, ik)))

    return src.images_dataset(sf_dir, light=True).map_batches(
        flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _slab_decompose(
    x0: np.ndarray, x1: np.ndarray, y0: np.ndarray, y1: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Canonical slab decomposition of a rect union (integer coords):
    x-cuts at every rect corner, y-intervals merged per slab — the
    exact decomposition the SQL slab sweep (_slab_union_cte) emits in
    its ``_segs`` stage, so slab ROWS compare bit-exactly."""
    xs = np.unique(np.concatenate([x0, x1]))
    # the segmented-cummax offset trick below multiplies slab indexes by
    # 2^40; past 2^23 cuts per class the product would wrap int64
    assert len(xs) < (1 << 23), (
        f"{len(xs)} x-cuts in one class overflow the slab offset trick; "
        "partition the sweep by x-range before raising this bound"
    )
    s_lo = np.searchsorted(xs, x0)
    s_hi = np.searchsorted(xs, x1)
    cnt = s_hi - s_lo
    total = int(cnt.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e
    base = np.repeat(s_lo, cnt)
    off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    slab = base + off
    ys0 = np.repeat(y0, cnt)
    ys1 = np.repeat(y1, cnt)
    order = np.lexsort((ys1, ys0, slab))
    slab, ys0, ys1 = slab[order], ys0[order], ys1[order]
    first = np.ones(total, dtype=bool)
    first[1:] = slab[1:] != slab[:-1]
    BIG = np.int64(1) << 40  # > any y coordinate span
    acc = np.maximum.accumulate(ys1 + slab * BIG) - slab * BIG
    pmax = np.empty(total, dtype=np.int64)
    pmax[0] = np.iinfo(np.int64).min
    pmax[1:] = acc[:-1]
    start = first | (ys0 > pmax)
    starts = np.nonzero(start)[0]
    lo = ys0[starts]  # sorted by y0 -> group start y0 == MIN(y0)
    ends = np.append(starts[1:], total)
    # group max == the slab cummax at the group's last row (earlier
    # groups in the slab ended strictly below this group's intervals)
    hi = acc[ends - 1]
    sl = slab[starts]
    return xs[sl], xs[sl + 1], lo, hi


def q_docs_dedup_near(sf_dir: str):
    """Text near-dup removal: documents minus non-canonical cluster
    members (canonical = min doc_id per minhash cluster at estimated
    Jaccard >= 0.5) — the text twin of images_dedup_near.

    Size-gated finalizer (see stages.dedup_finalize): the label map is
    output-sized, so below the gate it is collected and broadcast (one
    probe per batch); above it the corpus and the label table
    co-partition on doc_id through a hash exchange and each partition
    anti-joins locally — nothing driver-resident at 100 TB."""
    from ..stages import dedup_finalize as dfz
    from ..stages import graph
    from ..util import collect_table

    pairs = q_minhash_lsh_dups(sf_dir).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("est_jaccard"), 0.5)
        ).select(["doc_a", "doc_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    cc_ds = graph.connected_components(pairs, "doc_a", "doc_b")
    docs = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "n_chars"]
    )
    if cc_ds.count() > dfz.DRIVER_THRESHOLD:
        drop = dfz.drop_non_min_members(cc_ds)
        return dfz.anti_join_keys(docs, "doc_id", ("n_chars",), drop)
    cc = collect_table(
        cc_ds, schema=pa.schema([("node", pa.int64()), ("label", pa.int64())])
    )
    node = cc.column("node").to_numpy(zero_copy_only=False)
    label = cc.column("label").to_numpy(zero_copy_only=False)
    drop = np.sort(node[node != label])  # canonical = min id = label
    ref = ray.put(drop)

    def flt(b: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        from ..util import sorted_isin

        d = cached(ref, lambda t: t)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~sorted_isin(d, ids)))

    return docs.map_batches(
        flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_dissolve_geom_slabs(sf_dir: str):
    """A6 dissolve geometry in oracle-checkable form: the per-class
    union GEOMETRY as canonical slab rectangles (integer milli-degree),
    bit-comparable against the SQL slab sweep's segment stage — the
    rows-only WKB variant (dissolve_geom) gains an exact twin.  The
    layer is the broadcast-small side throughout the engine, so the
    sweep runs as one vectorized driver kernel (the corpus-sized
    dissolve is country_image_union, which stays cell-partitioned)."""
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    p = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    x0, x1, y0, y1 = corpus_mod.land_cover_md(p)
    fcs = np.asarray(spec.FEATURECLASSES)[(p % 5).astype(np.intp)]
    out_fc, out = [], []
    for fc in np.unique(fcs):
        m = fcs == fc
        xl, xr, lo, hi = _slab_decompose(x0[m], x1[m], y0[m], y1[m])
        out.append((xl, xr, lo, hi))
        out_fc.append(np.full(len(xl), fc, dtype=fcs.dtype))
    return pa.table(
        {
            "featureclass": pa.array(np.concatenate(out_fc).astype("U"), type=pa.string()),
            "xl": pa.array(np.concatenate([o[0] for o in out])),
            "xr": pa.array(np.concatenate([o[1] for o in out])),
            "lo": pa.array(np.concatenate([o[2] for o in out])),
            "hi": pa.array(np.concatenate([o[3] for o in out])),
        }
    )


def q_minhash_dup_clusters(sf_dir: str):
    """Text near-dup clusters: MinHash-LSH pairs with estimated
    Jaccard >= 0.5 contracted to components — the text analog of
    phash_dup_clusters (same graph machinery, third modality)."""
    from ..stages import graph

    pairs = q_minhash_lsh_dups(sf_dir).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("est_jaccard"), 0.5)
        ).select(["doc_a", "doc_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    cc = graph.connected_components(pairs, "doc_a", "doc_b")
    return cc.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def q_phash_dup_clusters(sf_dir: str):
    """Image near-dup CLUSTERS: the phash pair graph (per-order
    re-capture cliques) contracted to components, each labeled by its
    minimum image key — the canonical-image rule of an image dedup
    pass.  Pair ids parse to int keys vectorized; the component ids
    render back to image ids at the end."""
    from ..stages import graph

    pairs = _phash_pair_keys(sf_dir)
    cc = _phash_cc(sf_dir)
    return cc.map_batches(
        lambda b: pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(b.column("node"), pa.string()), ""
                ),
                "cluster_id": pc.binary_join_element_wise(
                    "img-", pc.cast(b.column("label"), pa.string()), ""
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def q_decode_stats(sf_dir: str):
    """Per-image decode stats (DecodeStats semantics: n_pixels checked
    against w*h, exact-integer mean).  Round 5: projected from the
    FUSED pixel pass; the DecodeStats actor class remains the
    general-codec path (unknown formats, PSNR tests)."""
    from .pixel_fused import per_image

    def project(batch: pa.Table) -> pa.Table:
        npx = batch.column("n_px").to_numpy(zero_copy_only=False)
        sums = batch.column("pix_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "n_pixels": pa.array(npx),
                "mean_pixel": pa.array(sums / npx.astype(np.float64)),
            }
        )

    return per_image(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_audio_energy_stats(sf_dir: str):
    """Audio-analog feature extraction: payload bytes as uint8 mono
    samples, exact integer energy (sum of squares) per clip.
    Round 5: energy comes from the FUSED pixel pass (vectorized
    payload_row_sumsq replaces the per-row np.dot loop)."""
    from .pixel_fused import per_image

    def project(batch: pa.Table) -> pa.Table:
        npx = batch.column("n_px").to_numpy(zero_copy_only=False)
        energy = batch.column("sumsq").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_samples": pa.array(npx),
                "energy": pa.array(energy),
                "mean_energy": pa.array(
                    energy.astype(np.float64) / npx.astype(np.float64)
                ),
            }
        )

    return per_image(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_frame_sample_stats(sf_dir: str):
    """Multimodal frame sampling (video analog): every K-th row of the
    payload as a sampled frame, per-image sampled sums/means over the
    real bytes.  Round 5: sampled sums come from the FUSED pixel pass
    (vectorized payload_row_frame_sums)."""
    from .pixel_fused import per_image

    def project(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        k = spec.FRAME_SAMPLE_K
        n_sampled = (h + k - 1) // k
        sampled_sum = batch.column("sampled_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_frames": pa.array(h),
                "n_sampled": pa.array(n_sampled),
                "sampled_sum": pa.array(sampled_sum),
                "sampled_mean": pa.array(
                    sampled_sum.astype(np.float64) / (n_sampled * w).astype(np.float64)
                ),
            }
        )

    return per_image(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


# --- documents -------------------------------------------------------------

def _docs(sf_dir: str):
    return src.table_dataset(sf_dir, "documents")


def q_docs_exact_dup(sf_dir: str):
    """Exact dedup flag via hash-partition + ONE lexsort per partition
    (not one Python call per mostly-singleton content_hash group)."""
    hashed = _docs(sf_dir).map_batches(
        text.content_hash_part_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return _pm(hashed, lambda g: text.exact_dup_partition(g.drop_columns(["__part"])))


def q_corpus_clean(sf_dir: str):
    """The composed training-corpus cleaning pipeline: quality gate
    (min tokens + max stopword ratio, integer-exact thresholds) ->
    exact dedup canonical (min doc_id per content hash) -> language tag
    -> deterministic split.  One fused derive pass + ONE hash exchange
    (quality-filtered fixed-width rows; text never shuffles — the gate
    commutes with dedup because identical texts share identical
    metrics)."""
    derived = _docs(sf_dir).map_batches(
        _cached_text(text.CorpusCleanDerive),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return _pm(derived, lambda g: text.corpus_clean_partition(g.drop_columns(["__part"])))


def q_docs_tfidf(sf_dir: str):
    """Top-3 TF-IDF terms per document (see stages/text.py tfidf_*):
    tf per batch -> term-partition df attach -> doc-partition score +
    top-k.  No term table ever transits the driver or a broadcast."""
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tf = _docs(sf_dir).map_batches(
        text.tfidf_tf_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    attached = _pm(
        tf, lambda g: text.tfidf_df_attach(g.drop_columns(["__tpart"])), col="__tpart"
    )
    return _pm(
        attached,
        lambda g: text.tfidf_topk_partition(g.drop_columns(["__dpart"]), n_docs),
        col="__dpart",
    )


def q_docs_bm25(sf_dir: str):
    """BM25 keyword search (top-k docs for spec.BM25_QUERY_TERMS):
    pass 1 streams per-batch O(|Q|) corpus-stat partials (df per query
    term, doc/token totals) to a driver reduce; pass 2 re-tokenizes and
    scores with the broadcast stats, emitting only batch-local top-k
    rows — the driver merge sees #batches x k rows.  No shuffle at all;
    the corpus is read twice (streaming both times), the scale-true
    trade vs pinning a corpus-sized tf table (the round-2 lesson).
    Per-(doc,term) contributions floor to integer micros before the
    per-doc sum, so the sum is order-free and bit-exact vs the oracle."""
    from ..util import collect_table

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    st = collect_table(
        docs.map_batches(
            text.bm25_stats_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema([("term", pa.string()), ("nd", pa.int64()), ("toks", pa.int64())]),
    )
    terms = np.asarray(st.column("term").to_pylist(), dtype=object)
    nd = st.column("nd").to_numpy(zero_copy_only=False)
    toks = st.column("toks").to_numpy(zero_copy_only=False)
    sent = terms == ""
    n_docs = int(nd[sent].sum())
    df_by_term = {t: int(nd[terms == t].sum()) for t in spec.BM25_QUERY_TERMS}
    avglen = float(int(toks[sent].sum())) / float(n_docs)
    scored = docs.map_batches(
        lambda b: text.bm25_score_batch(b, df_by_term, n_docs, avglen),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    tab = collect_table(
        scored,
        schema=pa.schema([("doc_id", pa.int64()), ("n_terms", pa.int64()), ("score_m", pa.int64())]),
    )
    doc_id = tab.column("doc_id").to_numpy(zero_copy_only=False)
    s = tab.column("score_m").to_numpy(zero_copy_only=False)
    nt = tab.column("n_terms").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc_id, -s))[: spec.BM25_TOPK]
    return pa.table(
        {
            "doc_id": pa.array(doc_id[order]),
            "n_terms": pa.array(nt[order]),
            "score_m": pa.array(s[order]),
        }
    )


def q_docs_bigram_pmi(sf_dir: str):
    """Bigram collocations by PMI: per-batch aggregated (bigram,
    unigram) count rows -> hash(a) exchange (global sums + na attach)
    -> hash(b) exchange (nb attach, score, partition-local top-k) ->
    driver merge.  Totals (t, tb) come from a one-row-per-batch pass;
    no vocab-sized table ever transits the driver or a broadcast."""
    from ..util import collect_table

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    tot = collect_table(
        docs.map_batches(
            text.pmi_totals_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema([("t", pa.int64()), ("tb", pa.int64())]),
    )
    t = int(tot.column("t").to_numpy(zero_copy_only=False).sum())
    tb = int(tot.column("tb").to_numpy(zero_copy_only=False).sum())
    counted = docs.map_batches(
        text.pmi_count_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    ex1 = _pm(counted, lambda g: text.pmi_attach_na(g.drop_columns(["__part"])))
    ex2 = _pm(
        ex1,
        lambda g: text.pmi_score_partition(g.drop_columns(["__part2"]), t, tb),
        col="__part2",
    )
    tab = collect_table(
        ex2,
        schema=pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("nab", pa.int64()), ("pmi_m", pa.int64())]
        ),
    )
    a = np.asarray(tab.column("a"), dtype=object)
    b = np.asarray(tab.column("b"), dtype=object)
    nab = tab.column("nab").to_numpy(zero_copy_only=False)
    pmi_m = tab.column("pmi_m").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a, -pmi_m))[: spec.PMI_TOPK]
    return pa.table(
        {
            "a": pa.array(a[order], type=pa.string()),
            "b": pa.array(b[order], type=pa.string()),
            "nab": pa.array(nab[order]),
            "pmi_m": pa.array(pmi_m[order]),
        }
    )


def q_docs_token_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        _cached_text(text.TokenStats), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_docs_token_bpe(sf_dir: str):
    """Whitespace + BPE-ish regex token counts (RE2 pattern shared
    verbatim with the DuckDB mirror)."""
    return _docs(sf_dir).map_batches(
        _cached_text(text.TokenStatsBPE), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_docs_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(
        _cached_text(text.QualityScore), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_docs_langid(sf_dir: str):
    return _docs(sf_dir).map_batches(
        _cached_text(text.LangId), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_minhash_lsh_dups(sf_dir: str):
    """MinHash-LSH near-dup pairs: vectorized signature matrix per
    batch, hash-partitioned band buckets, per-partition pair kernel
    with the distinct-member bucket cap (text.LSH_BUCKET_CAP).
    Round 5: memoized per (session, sf_dir) — the signature+band
    exchange runs once for its ~6 cluster/dedup/audit consumers
    (pairs are output-sized)."""
    from .pixel_fused import shared

    def build():
        banded = _docs(sf_dir).map_batches(
            _cached_text(text.MinHashLSH),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        return _pm(
            banded,
            lambda g: text.minhash_partition_pairs(g.drop_columns(["__part"])),
        ).materialize()

    return shared(sf_dir, "minhash_lsh_pairs", build)


def q_simhash_docs(sf_dir: str):
    return _docs(sf_dir).map_batches(
        _cached_text(text.SimHash), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_doc_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(
        _cached_text(text.Fingerprint), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_ngram_jaccard_dups(sf_dir: str):
    """Memoized view of the exact n-gram Jaccard pair pipeline (see
    _ngram_jaccard_dups_impl) — the multi-exchange chain runs once per
    session for its three consumers (this query, ngram_jaccard_hist,
    dedup_index_quality); the pair table is output-sized."""
    from .pixel_fused import shared

    def build():
        res = _ngram_jaccard_dups_impl(sf_dir)
        # the impl returns a driver-side Arrow table (pair set is
        # output-sized); Datasets would materialize here instead
        return res.materialize() if hasattr(res, "materialize") else res

    return shared(sf_dir, "ngram_jaccard_pairs", build)


def _ngram_jaccard_dups_impl(sf_dir: str):
    """EXACT n-gram Jaccard near-dup via AllPairs/PPJoin prefix
    filtering (see stages/text.py): shingle explode -> exact global DF
    per shingle partition -> rarest-first prefix emit per doc partition
    -> candidate pairs + shared-prefix counts per shingle partition ->
    count + positional (PPJoin) bound filters per pair partition ->
    exact verification IN PLACE on the shingle partitions (bucket
    co-occurrence counts for the surviving pairs only).

    Corpus-scale shape: every exchange row is a fixed-width integer
    tuple; doc text never shuffles; NOTHING is materialized — the
    shingle stage is a cheap one-pass vectorized map, so the verify
    pass recomputes it from the docs instead of pinning a corpus-sized
    table in the object store, and per-doc sizes ride the candidate /
    survivor rows so no per-doc size table ever exists.  The ONE
    broadcast is the survivor pair map, bounded by the filtered
    candidate set (output-proportional, not corpus-proportional).

    On the exchange count: the DF-attach (shingle-keyed) and
    prefix-emit (doc-keyed) stages cannot fold — an exact global DF
    needs shingle co-location and prefix selection needs doc
    co-location, and the only fold that avoids both is a DF-table
    broadcast (corpus-sized worst case, rejected).

    Exchange substrate: every stage already emits a uniform hash
    partition id inline, so the four exchanges run on the raw-task
    map-side hash shuffle (stages/rawshuffle.py) instead of Ray Data's
    sort-based ``groupby().map_groups`` — no key sampling, no global
    sort, no block coalescing, and the shingle partition splits are
    REUSED by the verify pass (the old formulation recomputed the
    shingle stage and paid a fifth sort exchange; measured 13.8 s →
    ~5 s warm at sf0.1/32 cpus)."""
    from ..state.broadcast import cached
    from ..stages.rawshuffle import run_stage, split_blocks
    from ..util import collect_block_refs

    shingle_ds = _docs(sf_dir).map_batches(
        _cached_text(text.NgramShingles),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    # one map-side split of the shingle rows, consumed by BOTH the
    # DF-attach stage and the verify pass (shingles are never recomputed
    # or re-shuffled; only fixed-width integer tuples move)
    sh_splits = split_blocks(
        collect_block_refs(shingle_ds), "__part", spec.NGRAM_SHINGLE_PARTS
    )

    def df_attach_k(t):
        return text.ngram_df_attach(t) if t is not None else text._NGRAM_DF_SCHEMA.empty_table()

    def prefix_k(t):
        return text.ngram_prefix_emit(t) if t is not None else text._NGRAM_PREFIX_SCHEMA.empty_table()

    def pairgen_k(t):
        return text.ngram_prefix_pair_partition(t) if t is not None else text._NGRAM_CAND_SCHEMA.empty_table()

    def bound_k(t):
        return text.ngram_bound_filter(t) if t is not None else text._NGRAM_SURV_SCHEMA.empty_table()

    with_df = run_stage(
        sh_splits, df_attach_k, spec.NGRAM_SHINGLE_PARTS,
        split_col="__dpart", n_out=spec.NGRAM_DOC_PARTS,
    )
    prefix = run_stage(
        with_df, prefix_k, spec.NGRAM_DOC_PARTS,
        split_col="__part", n_out=spec.NGRAM_PAIR_PARTS,
    )
    partials = run_stage(
        prefix, pairgen_k, spec.NGRAM_PAIR_PARTS,
        split_col="__ppart", n_out=spec.NGRAM_PAIR_PARTS,
    )
    surv_refs = run_stage(partials, bound_k, spec.NGRAM_PAIR_PARTS)
    surv_tabs = [t for t in ray.get(surv_refs) if t.num_rows]
    surv = (
        pa.concat_tables(surv_tabs, promote_options="default")
        if surv_tabs
        else text._NGRAM_SURV_SCHEMA.empty_table()
    )  # bounded by the filtered candidate set (output-proportional)
    pairs_ref = ray.put(surv)

    # exact verification IN PLACE: per shingle partition, count bucket
    # co-occurrences of each surviving pair (tiny survivor broadcast;
    # doc content is never re-shuffled — only (pair, partial) rows)
    def verify_k(t):
        if t is None:
            return pa.table(
                {"pair_key": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int64()),
                 "__fpart": pa.array([], pa.int64())}
            )
        return cached(pairs_ref, text.NgramPairCount)(t)

    counted_refs = run_stage(sh_splits, verify_k, spec.NGRAM_SHINGLE_PARTS)

    # final combine is a bounded aggregate (at most #survivors rows per
    # shingle partition): collect the partials and finalize driver-side
    # instead of paying one more all-to-all barrier
    ctabs = [t for t in ray.get(counted_refs) if t.num_rows]
    ctab = (
        pa.concat_tables(ctabs, promote_options="default")
        if ctabs
        else pa.table(
            {"pair_key": pa.array([], pa.int64()),
             "partial": pa.array([], pa.int64()),
             "__fpart": pa.array([], pa.int64())}
        )
    )
    return text.ngram_pair_finalize(ctab.drop_columns(["__fpart"]), surv)


def q_sat_distinct_days(sf_dir: str):
    """Distinct acquisition days per satellite: exact count AND the KMV
    (k-minimum-values) sketch estimate side by side.  Scale shape: the
    per-batch combiner reduces to (sat, day) partial counts (bounded by
    #sats x 2,922 days whatever the corpus size), one hash exchange via
    count_sum_by_key, bounded driver final.  The KMV hash is the
    deterministic spec mix, so the estimate itself is oracle-checked —
    at 100 TB the same sketch runs with k bounding state per group while
    the exact count's state grows with true cardinality."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    K = spec.KMV_K
    DAY_STRIDE = np.int64(4096)  # > TIME_SPAN_HOURS/24 = 2922

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        day = (
            corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME)
            % np.int64(spec.TIME_SPAN_HOURS)
        ) // 24
        return pa.table({"code": pa.array(sat * DAY_STRIDE + day)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = collect_table(count_sum_by_key(enc, "code", count_name="n"))
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code, n = code[order], n[order]
    sat = code // DAY_STRIDE
    day = code % DAY_STRIDE
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    n_images = np.add.reduceat(n, start).astype(np.int64)
    n_days = np.diff(bounds).astype(np.int64)
    est = np.empty(len(uniq_sat), dtype=np.float64)
    for i in range(len(uniq_sat)):
        d = day[bounds[i] : bounds[i + 1]]
        hv = np.unique(corpus_mod._mix(d, spec.ST_KMV))  # sorted ascending
        if len(hv) < K:
            est[i] = float(len(hv))
        else:
            est[i] = np.float64(K - 1) * np.float64(spec.MOD) / np.float64(hv[K - 1])
    return pa.table(
        {
            "sat_id": pa.array(uniq_sat),
            "n_images": pa.array(n_images),
            "n_distinct_days": pa.array(n_days),
            "kmv_estimate": pa.array(est),
        }
    )


def q_ann_filtered_topk(sf_dir: str):
    """Metadata-filtered vector search: exact cosine top-k over the
    corpus rows whose label meets the predicate (the filter composes
    with the scan — pruned BEFORE any similarity work, the standard
    pre-filter strategy for filtered ANN)."""
    emb = src.table_dataset(sf_dir, "embeddings")

    def flt(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False)
        return b.filter(
            pa.array(lab % spec.ANN_FILTER_MOD == spec.ANN_FILTER_REM)
        )

    emb = emb.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sel = qtab.column("vec_id").to_numpy(zero_copy_only=False) % spec.ANN_QUERY_MOD == 0
    qtab = qtab.filter(pa.array(sel))
    queries = pa.table(
        {"query_id": qtab.column("vec_id"), "qe": qtab.column("embedding")}
    )
    return ann_stage.ann_topk(emb, queries, k=spec.ANN_TOPK)


def _kmeans_lattice_centroids(sf_dir: str) -> np.ndarray:
    """The integer-lattice k-means iteration loop (shared by
    q_kmeans_embeddings and the IVF-lattice index): init = the K lowest
    vec_ids; each iteration one streaming O(K x D)-partial pass,
    floor-mean centroid update on the driver, re-broadcast."""
    from ..stages.ann import kmeans_partial_batch, _kmeans_quant
    from ..util import collect_table

    k, iters = spec.KMEANS_K, spec.KMEANS_ITERS
    init = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    cents = _kmeans_quant(init.column("embedding"))
    d = cents.shape[1]
    ds = src.table_dataset(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    schema = pa.schema(
        [("cid", pa.int64()), ("cnt", pa.int64()), ("sums", pa.list_(pa.int64(), d))]
    )
    for _ in range(iters):
        ref = ray.put(cents)
        tab = collect_table(
            ds.map_batches(
                lambda b: kmeans_partial_batch(b, ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            ),
            schema=schema,
        )
        cid = tab.column("cid").to_numpy(zero_copy_only=False)
        cnt = tab.column("cnt").to_numpy(zero_copy_only=False)
        srows = pc.list_flatten(tab.column("sums").combine_chunks()).to_numpy(
            zero_copy_only=False
        ).reshape(len(tab), d)
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, cid, srows)
        counts = np.bincount(cid, weights=cnt, minlength=k).astype(np.int64)
        nz = counts > 0
        new = cents.copy()
        new[nz] = np.floor(sums[nz].astype(np.float64) / counts[nz, None]).astype(np.int64)
        cents = new
    return cents


def q_kmeans_embeddings(sf_dir: str):
    """Distributed k-means over the embedding column, bit-exact via
    integer-lattice arithmetic (spec.KMEANS_*) — iterations in
    :func:`_kmeans_lattice_centroids` (iterative broadcast-refine; at
    real scale the ray.put centroid matrix is the only cross-round
    state, the corpus is never materialized).  Final pass labels every
    vector.  Oracle: generated chained-CTE mirror."""
    from ..stages.ann import kmeans_assign_batch

    cents = _kmeans_lattice_centroids(sf_dir)
    ds = src.table_dataset(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ref = ray.put(cents)
    return ds.map_batches(
        lambda b: kmeans_assign_batch(b, ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def q_ann_topk(sf_dir: str):
    emb = src.table_dataset(sf_dir, "embeddings")
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sel = qtab.column("vec_id").to_numpy(zero_copy_only=False) % spec.ANN_QUERY_MOD == 0
    qtab = qtab.filter(pa.array(sel))
    queries = pa.table(
        {
            "query_id": qtab.column("vec_id"),
            "qe": qtab.column("embedding"),
        }
    )
    return ann_stage.ann_topk(emb, queries, k=spec.ANN_TOPK)


def q_embedding_near_dup(sf_dir: str):
    emb = src.table_dataset(sf_dir, "embeddings")
    return ann_stage.embedding_near_dup(emb)


def q_embedding_dup_clusters(sf_dir: str):
    """Near-dup pairs -> duplicate CLUSTERS via distributed connected
    components (iterative min-label propagation, stages/graph.py):
    each node labeled with its component's minimum vec_id, the
    canonical-representative rule of a dedup pass.  Oracle: recursive
    transitive-closure CTE over the same pair SQL."""
    from ..stages import graph

    cc = graph.connected_components(
        q_embedding_near_dup(sf_dir), "vec_a", "vec_b"
    )
    return cc.map_batches(
        lambda b: b.rename_columns(["vec_id", "cluster_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


def q_semdedup_survivors(sf_dir: str):
    """SemDeDup (Abbas et al. 2023) semantic dedup: vectors bucket by
    the SAME integer-lattice k-means coarse quantizer the IVF index
    uses; within each cluster a vector drops when any earlier-id vector
    has rounded cosine >= spec.SEMDEDUP_SIM.  One cluster-hash exchange
    + a row-tiled per-cluster pair kernel — the pair work is bounded by
    the cluster size (at production K grows with the corpus, the
    IVF-list assumption).  Even this APPROXIMATE curation op is
    oracle-checked: the quantizer, the assignment tie-break, and the
    rounded cosine are all deterministic and mirrored in SQL."""
    from ..stages.ann import _kmeans_dists, _kmeans_quant, semdedup_partition
    from ..state.broadcast import cached

    cents = _kmeans_lattice_centroids(sf_dir)
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = cached(ref, lambda x: x)
        q = _kmeans_quant(batch.column("embedding"))
        a = np.argmin(_kmeans_dists(q, c), axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a),
                "embedding": batch.column("embedding"),
            }
        )

    ds = src.table_dataset(
        sf_dir, "embeddings", columns=["vec_id", "embedding"]
    )
    asg = ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return asg.groupby("cluster").map_groups(
        semdedup_partition, batch_format="pyarrow"
    )


# --- relational equi-joins (large x large, hash-shuffle) -------------------

def _join_partitions() -> int:
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, cpus)


def q_nation_order_revenue(sf_dir: str):
    """Revenue rollup per customer nation: orders JOIN customer on
    custkey (the reference resolves customer attributes relationally at
    query time — /root/reference/database/db.py:107-122), then a
    25-row nation dim attach, then count+sum.

    This is the repo's large x large equi-join shape: BOTH sides grow
    with corpus scale (every tasking order and every customer account),
    so neither fits a broadcast at 100 TB — we use Ray Data's native
    hash-shuffle ``Dataset.join`` (co-partitions both sides on the key,
    joins partition-locally in aggregator actors).  Revenue is summed
    as integer cents (floor(price*100)) so the distributed sum is
    order-independent and bit-exact vs the oracle.

    Round 5: the driver-sized rollup is memoized per (session, sf_dir)
    — nation_revenue_share is a window over this exact aggregate, so
    the large x large exchange runs once for the pair."""
    from .pixel_fused import shared

    return shared(sf_dir, "nation_order_revenue", lambda: _nation_order_revenue(sf_dir))


def _nation_order_revenue(sf_dir: str) -> pa.Table:
    parts = _join_partitions()
    od = src.table_dataset(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cu = src.table_dataset(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    j = od.join(cu, join_type="inner", num_partitions=parts, on=("o_custkey",), right_on=("c_custkey",))

    def cents(batch: pa.Table) -> pa.Table:
        tp = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_nationkey": pa.array(nk),
                "revenue_cents": pa.array(np.floor(tp * 100.0).astype(np.int64)),
            }
        )

    rows = j.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from ..stages.hashagg import tree_count_sum_by_key

    agg = tree_count_sum_by_key(rows, "c_nationkey", sum_cols=("revenue_cents",), count_name="n_orders")
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nm = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    order = np.argsort(nk)
    nk_s, nm_s = nk[order], nm[order]
    keys = agg.column("c_nationkey").to_numpy(zero_copy_only=False)
    idx = np.searchsorted(nk_s, keys)
    return pa.table(
        {
            "nation": pa.array(nm_s[idx], type=pa.string()),
            "n_orders": agg.column("n_orders"),
            "revenue_cents": agg.column("revenue_cents"),
        }
    )


def q_order_item_revenue(sf_dir: str):
    """Per (order year, priority) item revenue: lineitem JOIN orders on
    orderkey — the classic both-sides-unbounded fact x fact join (4:1
    at every SF; at 100 TB neither side is broadcastable).  The join is
    a PK lookup (orderkey -> year*10+priority_digit packed BEFORE the
    exchange, so only two int64 columns shuffle), run through the
    shared bucket lookup-join (stages/bucket_join.py — half the wall of
    the native ``Dataset.join`` it replaced: no aggregator-pool ramp);
    then a per-batch partial aggregate over the ~(years x 5 priorities)
    bounded key space, tree-reduced on the driver.  Priority labels
    re-attach from a bounded distinct over the orders read (5 rows).
    Revenue mirrors the oracle expression order exactly:
    floor(l_extendedprice * (1 - l_discount) * 100)."""
    from ..stages.bucket_join import lookup_join
    from ..util import collect_table

    def li_prep(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "cents": pa.array(np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)),
            }
        )

    def _ypd(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
        dt = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = dt.astype("datetime64[Y]").astype(np.int64) + 1970
        prcol = pc.cast(batch.column("o_orderpriority"), pa.string())
        # priority labels are '<digit>-NAME': the leading digit is a
        # total order, so (year, digit) is a sortable composite int key
        pdig = pc.cast(pc.utf8_slice_codeunits(prcol, 0, 1), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return year * 10 + pdig, prcol

    def od_prep(batch: pa.Table) -> pa.Table:
        ypd, _ = _ypd(batch)
        return pa.table(
            {"o_orderkey": batch.column("o_orderkey"), "ypd": pa.array(ypd)}
        )

    li = src.table_dataset(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    od_cols = src.table_dataset(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    od = od_cols.map_batches(
        od_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    j = lookup_join(li, "l_orderkey", ("cents",), od, "o_orderkey", "ypd")

    def partial(batch: pa.Table) -> pa.Table:
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        key = batch.column("ypd").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        uniq, start, counts = np.unique(ks, return_index=True, return_counts=True)
        return pa.table(
            {
                "ypd": pa.array(uniq),
                "n_items": pa.array(counts.astype(np.int64)),
                "revenue_cents": pa.array(np.add.reduceat(cents[order], start)),
            }
        )

    partials = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    tab = collect_table(
        partials,
        schema=pa.schema(
            [
                ("ypd", pa.int64()),
                ("n_items", pa.int64()),
                ("revenue_cents", pa.int64()),
            ]
        ),
    )
    # bounded (digit -> label) attach: per-batch distinct over a
    # SINGLE-COLUMN orders read (the digit is the label's first char,
    # so neither orderkey nor orderdate needs to leave storage; at most
    # 5 rows per batch leave the task)
    def label_partial(batch: pa.Table) -> pa.Table:
        prcol = pc.cast(batch.column("o_orderpriority"), pa.string())
        dig = pc.cast(pc.utf8_slice_codeunits(prcol, 0, 1), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(dig, kind="stable")
        _, start = np.unique(dig[order], return_index=True)
        first = pa.array(order[start])
        return pa.table(
            {
                "pdig": pa.array(dig[order][start]),
                "priority": pc.take(prcol, first),
            }
        )

    lab = collect_table(
        src.table_dataset(
            sf_dir, "orders", columns=["o_orderpriority"]
        ).map_batches(
            label_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema([("pdig", pa.int64()), ("priority", pa.string())]),
    )
    ld = lab.column("pdig").to_numpy(zero_copy_only=False)
    lm = np.asarray(lab.column("priority").to_pylist(), dtype=object)
    lo = np.argsort(ld, kind="stable")
    ld_s, lm_s = ld[lo], lm[lo]
    lfirst = np.ones(len(ld_s), dtype=bool)
    lfirst[1:] = ld_s[1:] != ld_s[:-1]
    ld_s, lm_s = ld_s[lfirst], lm_s[lfirst]

    key = tab.column("ypd").to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    uniq, start = np.unique(ks, return_index=True)
    n = tab.column("n_items").to_numpy(zero_copy_only=False)
    rc = tab.column("revenue_cents").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "order_year": pa.array(uniq // 10),
            "priority": pa.array(
                lm_s[np.searchsorted(ld_s, uniq % 10)], type=pa.string()
            ),
            "n_items": pa.array(np.add.reduceat(n[order], start)),
            "revenue_cents": pa.array(np.add.reduceat(rc[order], start)),
        }
    )


# --- events ----------------------------------------------------------------

def q_events_funnel(sf_dir: str):
    """Ordered funnel analysis (view -> click -> purchase): per user,
    the first view, the first click strictly after it, the first
    purchase strictly after that; output = users reaching each step.
    One user-hash exchange; the per-partition kernel handles every user
    with three segment scans (no per-user Python); per-partition step
    counts tree-reduce to a 3-row result."""
    from ..util import collect_table

    STEPS = ("view", "click", "purchase")
    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "ts", "event_type"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def funnel_partition(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        users = np.unique(uid)
        INF = np.iinfo(np.int64).max
        prev = np.full(len(users), np.iinfo(np.int64).min)
        counts = []
        reached = np.ones(len(users), dtype=bool)
        for step in STEPS:
            m = et == step
            u_s, t_s = uid[m], ts[m]
            # per user: min ts strictly greater than prev[user]
            upos = np.searchsorted(users, u_s)
            ok = reached[upos] & (t_s > prev[upos])
            u_ok, t_ok = upos[ok], t_s[ok]
            best = np.full(len(users), INF)
            np.minimum.at(best, u_ok, t_ok)
            reached = reached & (best < INF)
            prev = best
            counts.append(int(reached.sum()))
        return pa.table({"step": pa.array(np.arange(1, 4)), "n": pa.array(np.asarray(counts, dtype=np.int64))})

    partials = _pm(parted, funnel_partition)
    tab = collect_table(
        partials, schema=pa.schema([("step", pa.int64()), ("n", pa.int64())])
    )
    st = tab.column("step").to_numpy(zero_copy_only=False)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    totals = np.zeros(3, dtype=np.int64)
    np.add.at(totals, st - 1, n)
    return pa.table(
        {
            "step": pa.array(np.arange(1, 4)),
            "step_name": pa.array(list(STEPS), type=pa.string()),
            "n_users": pa.array(totals),
        }
    )


def q_events_retention(sf_dir: str):
    """Retention cohort analysis: users grouped by first-seen week
    (cohort), counted per weeks-since-cohort activity week — the
    classic product-analytics triangle.  Scale shape: per-batch
    distinct-(user, week) combiner -> user-hash exchange (cohort = min
    week per user needs user co-location) -> packed (cohort, delta)
    count exchange via count_sum_by_key -> bounded driver final."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table, hash_partition

    ev = src.table_dataset(sf_dir, "events", columns=["user_id", "ts"])
    PACK = np.int64(1024)  # > max weeks_since over the 8-year span

    def partial(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        week = _bucket_index(ts, "week")
        code = np.unique(uid * np.int64(1 << 20) | np.int64(week))
        u, w = code >> np.int64(20), code & np.int64((1 << 20) - 1)
        return pa.table(
            {
                "user": pa.array(u),
                "week": pa.array(w),
                "__part": pa.array(hash_partition(u, 64)),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        u = group.column("user").to_numpy(zero_copy_only=False)
        w = group.column("week").to_numpy(zero_copy_only=False)
        code = np.unique(u * np.int64(1 << 20) | w)  # re-distinct across batches
        u, w = code >> np.int64(20), code & np.int64((1 << 20) - 1)
        order = np.argsort(u, kind="stable")
        us, ws = u[order], w[order]
        uniq, start = np.unique(us, return_index=True)
        cw = np.minimum.reduceat(ws, start)  # cohort = min week per user
        cw_rep = np.repeat(cw, np.diff(np.append(start, len(us))))
        delta = (ws - cw_rep) // 7
        return pa.table({"code": pa.array(cw_rep * PACK + delta)})

    pre = ev.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    coded = _pm(pre, lambda g: per_user(g.drop_columns(["__part"])))
    counts = collect_table(count_sum_by_key(coded, "code", count_name="n_users"))
    code = counts.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code = code[order]
    n = counts.column("n_users").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "cohort_week": _bucket_labels(code // PACK, "week"),
            "weeks_since": pa.array(code % PACK),
            "n_users": pa.array(n.astype(np.int64)),
        }
    )


def q_events_sessionize(sf_dir: str):
    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "event_id", "ts"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(parted, lambda g: timeseries.sessionize_partition(g.drop_columns(["__part"])))


def q_events_hourly(sf_dir: str):
    ev = src.table_dataset(
        sf_dir, "events", columns=["ts", "event_type", "value"]
    )
    pre = ev.map_batches(
        timeseries.hourly_events_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = pre.groupby(["bucket", "event_type"]).aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Sum("value_cents")
    )
    return _rename(agg, {"count()": "n_events", "sum(value_cents)": "total_value_cents"})


ALL_QUERIES = {
    "images_metadata": q_images_metadata,
    "dedup_audit": q_dedup_audit,
    "incremental_import": q_incremental_import,
    "dataset_split": q_dataset_split,
    "sample_per_satellite": q_sample_per_satellite,
    "sat_cloud_quantiles": q_sat_cloud_quantiles,
    "filter_images": q_filter_images,
    "count_per_satellite": q_count_per_satellite,
    "spatial_join_landcover": q_spatial_join_landcover,
    "count_per_landcover": q_count_per_landcover,
    "count_per_featureclass": q_count_per_featureclass,
    "city_image_counts": q_city_image_counts,
    "country_image_counts": q_country_image_counts,
    "knn_city_scenes": q_knn_city_scenes,
    "time_heatmap": q_time_heatmap,
    "tile_assignment": q_tile_assignment,
    "tile_manifest": q_tile_manifest,
    "dissolve_raster_area": q_dissolve_raster_area,
    "coverage_pct": q_coverage_pct,
    "phash_near_dup": q_phash_near_dup,
    "decode_stats": q_decode_stats,
    "frame_sample_stats": q_frame_sample_stats,
    "audio_energy_stats": q_audio_energy_stats,
    "docs_exact_dup": q_docs_exact_dup,
    "docs_token_stats": q_docs_token_stats,
    "docs_tfidf": q_docs_tfidf,
    "corpus_clean": q_corpus_clean,
    "ann_filtered_topk": q_ann_filtered_topk,
    "sat_distinct_days": q_sat_distinct_days,
    "embedding_dup_clusters": q_embedding_dup_clusters,
    "phash_dup_clusters": q_phash_dup_clusters,
    "phash_cluster_canonical": q_phash_cluster_canonical,
    "minhash_dup_clusters": q_minhash_dup_clusters,
    "images_dedup_near": q_images_dedup_near,
    "dissolve_geom_slabs": q_dissolve_geom_slabs,
    "docs_dedup_near": q_docs_dedup_near,
    "zonal_pixel_stats": q_zonal_pixel_stats,
    "tile_best_image": q_tile_best_image,
    "image_nearest_city": q_image_nearest_city,
    "spatial_join_sample": q_spatial_join_sample,
    "spatial_join_sample_weighted": q_spatial_join_sample_weighted,
    "docs_token_bpe": q_docs_token_bpe,
    "docs_quality": q_docs_quality,
    "docs_langid": q_docs_langid,
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "simhash_docs": q_simhash_docs,
    "doc_fingerprint": q_doc_fingerprint,
    "ngram_jaccard_dups": q_ngram_jaccard_dups,
    "ann_topk": q_ann_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "events_sessionize": q_events_sessionize,
    "events_retention": q_events_retention,
    "events_funnel": q_events_funnel,
    "nation_order_revenue": q_nation_order_revenue,
    "order_item_revenue": q_order_item_revenue,
    "docs_bm25": q_docs_bm25,
    "kmeans_embeddings": q_kmeans_embeddings,
    "docs_bigram_pmi": q_docs_bigram_pmi,
    "events_hourly": q_events_hourly,
    "semdedup_survivors": q_semdedup_survivors,
}


# --- secondary reference operators (A4, A5, J6, D3, M13, F4, M10, A6, T5) --

def q_satellite_names(sf_dir: str):
    """A4/O1: sorted distinct satellite names."""
    sup = src.table_dataset(sf_dir, "supplier", columns=["s_name"])
    names = sorted(sup.unique("s_name"))
    return pa.table({"sat_name": pa.array(names, type=pa.string())})


def q_table_counts(sf_dir: str):
    """A5: logical-table row counts (the reference's import metrics,
    importer.py:41-54)."""
    names = ["images", "satellites", "land_cover", "cities", "countries"]
    counts = [
        src.images_dataset(sf_dir, light=True).count(),
        src.satellites_table(sf_dir).num_rows,
        src.land_cover_table(sf_dir).num_rows,
        src.cities_table(sf_dir).num_rows,
        src.countries_table(sf_dir).num_rows,
    ]
    return pa.table(
        {
            "table_name": pa.array(names, type=pa.string()),
            "n_rows": pa.array(np.asarray(counts, dtype=np.int64)),
        }
    )


def q_time_series_dense(sf_dir: str):
    """J6/O2: monthly counts with EMPTY buckets present (dense scaffold
    left-join, reference app/maps.py:58-68)."""
    from ..stages import extras
    from ..util import collect_table

    counts = _rename(
        src.images_dataset(sf_dir)
        .map_batches(
            lambda b: pa.table(
                {
                    "bucket": pc.strftime(
                        pc.floor_temporal(b.column("time_acquired"), unit="month"),
                        format="%Y-%m",
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("bucket")
        .count(),
        {"count()": "total_images"},
    )
    tbl = collect_table(
        counts, schema=pa.schema([("bucket", pa.string()), ("total_images", pa.int64())])
    )
    return extras.dense_month_series(tbl)


def q_landcover_union_counts(sf_dir: str):
    """D3/S8: union-all of two land-cover sources then grouped counts."""
    lc = src.land_cover_table(sf_dir)
    key = lc.column("lc_id").to_numpy(zero_copy_only=False)
    a = ray.data.from_arrow(lc.filter(pa.array(key % 2 == 0)))
    b = ray.data.from_arrow(lc.filter(pa.array(key % 2 == 1)))
    both = a.union(b)
    return _rename(both.groupby("featureclass").count(), {"count()": "n_polys"})


def q_image_landcover_lists(sf_dir: str):
    """M13/D4: per-image sorted-distinct land-cover list (the
    reference's land_cover_class list column, app/query.py:57-58,74-75)."""
    from functools import partial as _partial

    from ..stages import extras

    lc = src.land_cover_table(sf_dir)
    fcs = lc.column("featureclass").to_numpy(zero_copy_only=False)
    lc_ids = lc.column("lc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    classes, codes = np.unique(fcs, return_inverse=True)
    code_of_lc = np.zeros(int(lc_ids.max()) + 1, dtype=np.int8)
    code_of_lc[lc_ids] = codes
    # int-only shuffle: (image_key, lc_id) pairs, no strings
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        lc,
        id_col="lc_id",
        img_cols=("image_key",),
        emit_image_id=False,
    )

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("image_key").to_numpy(zero_copy_only=False)
        part = (
            k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)
        ) % np.uint64(64)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    parted = pairs.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    kernel = _partial(
        extras.landcover_list_partition_coded,
        classes=classes.astype("U"),
        code_of_lc=code_of_lc,
    )
    return _pm(parted, lambda g: kernel(g.drop_columns(["__part"])))


def q_aoi_filter(sf_dir: str):
    """F4/S9: images intersecting a fixed AOI polygon."""

    def flt(batch: pa.Table) -> pa.Table:
        x0 = batch.column("x0").to_numpy(zero_copy_only=False)
        y0 = batch.column("y0").to_numpy(zero_copy_only=False)
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)
        y1 = batch.column("y1").to_numpy(zero_copy_only=False)
        m = (
            (x0 <= spec.AOI_X1)
            & (spec.AOI_X0 <= x1)
            & (y0 <= spec.AOI_Y1)
            & (spec.AOI_Y0 <= y1)
        )
        return batch.filter(pa.array(m)).select(["image_id", "centroid_lon", "centroid_lat"])

    return src.images_dataset(sf_dir, light=True).map_batches(
        flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_geojson_export(sf_dir: str):
    """M10: GeoJSON Feature projection with the reference's FULL
    property set (db.py:160-177): satellite dims attached J1-style,
    land_cover_class lists probed from the broadcast layer inside the
    same batch (rows-only check; golden-value pytest covers content)."""
    import ray as _ray

    from ..state.broadcast import cached
    from ..stages import extras
    from ..stages.spatial_join import _Layer

    lc_ref = _ray.put(src.land_cover_table(sf_dir))
    with_dims = broadcast_join.attach_satellite(
        src.images_dataset(sf_dir), src.satellites_table(sf_dir)
    )

    def to_geojson(batch: pa.Table) -> pa.Table:
        L = cached(lc_ref, lambda t: _Layer(t, "lc_id", ("featureclass",)))
        return extras.geojson_batch(batch, lc_layer=L)

    return with_dims.map_batches(
        to_geojson, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_images_with_satellite(sf_dir: str):
    """J1 full projection: every image with its satellite dims
    (sat_name + pixel_res) attached from the broadcast table."""
    with_dims = broadcast_join.attach_satellite(
        src.images_dataset(sf_dir), src.satellites_table(sf_dir)
    )
    return with_dims.map_batches(
        lambda b: b.select(["image_id", "sat_id", "sat_name", "pixel_res"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


ALL_QUERIES["images_with_satellite"] = q_images_with_satellite


def q_dissolve_exact_area(sf_dir: str):
    """A6/J7: EXACT hierarchical dissolve — per-cell rectangle-union
    partials in integer md², additive merge per featureclass.
    Oracle-checked bit-exact against the DuckDB slab-sweep mirror
    (plus a pytest vs a driver-side single-shot union)."""
    from ..stages import extras

    lc_ds = ray.data.from_arrow(src.land_cover_table(sf_dir))
    partials = lc_ds.map_batches(
        extras.dissolve_cell_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = partials.groupby("featureclass").sum("partial_md2")

    def to_km2(batch: pa.Table) -> pa.Table:
        md2 = batch.column("sum(partial_md2)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "featureclass": batch.column("featureclass"),
                # the ONLY float op: one multiply, mirrored in the oracle
                "area_sqkm": pa.array(md2.astype(np.float64) * spec.KM2_PER_MD2),
            }
        )

    return agg.map_batches(to_km2, batch_format="pyarrow", batch_size=None)


def q_thumbnail_stats(sf_dir: str):
    """T5 extension: decode + nearest-neighbor 8x8 resize over the real
    payload bytes; mean of the thumbnail per image.  Round 5: thumbnail
    sums come from the FUSED pixel pass (payload_row_thumb_sums)."""
    from .pixel_fused import per_image

    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column("thumb_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "thumb_mean": pa.array(ts / float(spec.THUMB * spec.THUMB)),
            }
        )

    return per_image(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES.update(
    {
        "satellite_names": q_satellite_names,
        "table_counts": q_table_counts,
        "time_series_dense": q_time_series_dense,
        "landcover_union_counts": q_landcover_union_counts,
        "image_landcover_lists": q_image_landcover_lists,
        "aoi_filter": q_aoi_filter,
        "geojson_export": q_geojson_export,
        "dissolve_exact_area": q_dissolve_exact_area,
        "thumbnail_stats": q_thumbnail_stats,
    }
)


def _ann_queries_table(sf_dir: str) -> pa.Table:
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sel = qtab.column("vec_id").to_numpy(zero_copy_only=False) % spec.ANN_QUERY_MOD == 0
    qtab = qtab.filter(pa.array(sel))
    return pa.table({"query_id": qtab.column("vec_id"), "qe": qtab.column("embedding")})


def q_ann_lsh_topk(sf_dir: str):
    """ANN scale path: multi-probe sign-LSH bucketed top-k.  Approximate
    by design, yet ORACLE-CHECKED bit-exactly (deterministic plane
    constants + rounded-sign buckets, oracle.py); a recall pytest
    additionally bounds it against the exact baseline."""
    emb = src.table_dataset(sf_dir, "embeddings")
    return ann_stage.ann_lsh_topk(emb, _ann_queries_table(sf_dir), k=spec.ANN_TOPK)


ALL_QUERIES["ann_lsh_topk"] = q_ann_lsh_topk


def q_ann_ivf_topk(sf_dir: str):
    """ANN scale path #2: IVF coarse-quantizer top-k (approximate;
    rows-only check — pytest asserts recall vs the exact baseline).
    Centroids are trained on a deterministic bounded sample."""
    emb = src.table_dataset(sf_dir, "embeddings")
    # seed sample: stream row groups until the bounded sample size is
    # reached — never materialize the whole embedding column driver-side
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    batches = []
    n = 0
    for rb in pf.iter_batches(columns=["embedding"]):
        batches.append(rb)
        n += rb.num_rows
        if n >= ann_stage._IVF_SAMPLE:
            break
    sample = pa.Table.from_batches(batches, schema=pa.schema(batches[0].schema))
    return ann_stage.ann_ivf_topk(emb, _ann_queries_table(sf_dir), sample)


ALL_QUERIES["ann_ivf_topk"] = q_ann_ivf_topk


def q_spatial_join_landcover_partitioned(sf_dir: str):
    """J2 scale path: the cell-partitioned shuffle join (explode ->
    groupby(cell) -> per-cell STRtree -> canonical-cell pair dedup),
    checked against the same oracle as the broadcast variant."""
    lc_ds = ray.data.from_arrow(src.land_cover_table(sf_dir))
    return spatial_join.partitioned_spatial_join(src.images_dataset(sf_dir, light=True), lc_ds)


def q_events_props_parse(sf_dir: str):
    """Schema-on-read JSON normalizer (M1-analog for the events stream):
    extract props.k with one Arrow RE2 pass (vectorized; the per-row
    ``json.loads`` fallback handles any row the regex misses)."""
    import json as _json

    ev = src.table_dataset(sf_dir, "events", columns=["event_type", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        col = batch.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ext = pc.extract_regex(col, pattern=r'"k"\s*:\s*(?P<k>-?\d+)')
        ks_str = pc.struct_field(ext, "k")
        if ks_str.null_count == 0:
            ks = pc.cast(ks_str, pa.int64()).to_numpy(zero_copy_only=False)
        else:  # malformed/nested rows: exact JSON parse
            ks = np.asarray(
                [int(_json.loads(p)["k"]) for p in col.to_pylist()], dtype=np.int64
            )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "k_bucket": pa.array(ks // 10),
            }
        )

    agg = (
        ev.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(["event_type", "k_bucket"])
        .count()
    )
    return _rename(agg, {"count()": "n_events"})


ALL_QUERIES["spatial_join_landcover_partitioned"] = q_spatial_join_landcover_partitioned
ALL_QUERIES["events_props_parse"] = q_events_props_parse


def q_item_type_counts(sf_dir: str):
    """Reference ItemType dimension (db.py:188-200): images per item
    type.  item_type_id = 'it-' + (key % 4): counted as an int key in
    the plan (light derive), labelled driver-side."""
    from ..stages.hashagg import tree_count_sum_by_key

    def key_mod(batch: pa.Table) -> pa.Table:
        k = batch.column("image_key").to_numpy(zero_copy_only=False)
        return pa.table({"it": pa.array(k % np.int64(spec.ITEM_TYPE_MOD))})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        key_mod, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    counts = tree_count_sum_by_key(packed, "it", count_name="total_images")
    got = counts.column("it").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "item_type_id": pa.array(
                [f"it-{int(i)}" for i in got], type=pa.string()
            ),
            "total_images": counts.column("total_images"),
        }
    )


def q_asset_type_counts(sf_dir: str):
    """Reference AssetType M:N (db.py:180-205).  The list explode +
    string groupby collapses to THREE per-batch integers (presence-bit
    popcounts) summed in one tiny aggregate — the M13 explode pattern
    lives on in `image_landcover_lists`; this count never needs it."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("asset_types")
        chunks = col.chunks if hasattr(col, "chunks") else [col]
        counts = np.zeros(len(spec.ASSET_TYPES), dtype=np.int64)
        for c in chunks:
            flat = pc.list_flatten(c)
            vals, cnts = np.unique(
                flat.to_numpy(zero_copy_only=False), return_counts=True
            )
            for v, ct in zip(vals.tolist(), cnts.tolist()):
                counts[spec.ASSET_TYPES.index(v)] += ct
        return pa.table(
            {
                "asset_type": pa.array(list(spec.ASSET_TYPES), type=pa.string()),
                "partial": pa.array(counts),
            }
        )

    partials = src.images_dataset(sf_dir).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = partials.groupby("asset_type").sum("partial")
    return _rename(agg, {"sum(partial)": "total_images"})


ALL_QUERIES["item_type_counts"] = q_item_type_counts
ALL_QUERIES["asset_type_counts"] = q_asset_type_counts


def q_events_asof_join(sf_dir: str):
    """As-of join (custom operator the Dataset API lacks; SURVEY §2
    'custom operators' option a): per user, each purchase joined to the
    most recent prior view — groupby(user) + vectorized searchsorted.
    Partitioning assumption: event-time ordering only within a user."""
    import pyarrow.dataset as pads

    # only the two joined event types enter the shuffle (pushdown)
    flt = pads.field("event_type").isin(["view", "purchase"])
    ev = src.table_dataset(
        sf_dir, "events",
        columns=["user_id", "event_id", "ts", "event_type"],
        filter=flt,
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(parted, lambda g: timeseries.asof_partition(g.drop_columns(["__part"])))


ALL_QUERIES["events_asof_join"] = q_events_asof_join


def q_top_cloudy_images(sf_dir: str):
    """O-type sort/limit: global top-100 by cloud cover — Ray Data's
    range-partitioned sort + limit, deterministic via (cloud desc,
    image_key) tie-break."""
    imgs = src.images_dataset(sf_dir)
    top = imgs.sort(["cloud_cover", "image_key"], descending=[True, False]).limit(100)
    return top.map_batches(
        lambda b: b.select(["image_id", "cloud_cover"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


ALL_QUERIES["top_cloudy_images"] = q_top_cloudy_images


def q_events_sliding_3h(sf_dir: str):
    """Sliding-window aggregate: per event type, rolling 3-bucket sum
    over the present hourly buckets (tumbling buckets + small sorted
    driver-side frame merge — the sliding window is a sum of adjacent
    tumbling windows)."""
    hourly = q_events_hourly(sf_dir).to_pandas()
    hourly = hourly.sort_values(["event_type", "bucket"], kind="stable")
    hourly["sliding_events"] = (
        hourly.groupby("event_type")["n_events"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
        .astype("int64")
    )
    out = hourly[["bucket", "event_type", "sliding_events"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_cloud_quantiles(sf_dir: str):
    """Exact distributed quantiles of cloud_cover via per-block value
    histograms + tree merge (cloud_cover has 1001 discrete milli values,
    so the histogram IS the exact distribution — the engine's
    sketch-style aggregate with an exact answer)."""
    from ..stages.hashagg import tree_count_sum_by_key

    def to_milli(batch: pa.Table) -> pa.Table:
        cc = batch.column("cloud_cover").to_numpy(zero_copy_only=False)
        return pa.table({"cc_milli": pa.array(np.round(cc * 1000).astype(np.int64))})

    packed = src.images_dataset(sf_dir).map_batches(
        to_milli, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = tree_count_sum_by_key(packed, "cc_milli", count_name="n")
    v = hist.column("cc_milli").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(v)
    v, n = v[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1])
    ps = [0.25, 0.5, 0.75, 0.95]
    out_p, out_v = [], []
    for p in ps:
        thresh = int(np.ceil(p * total))
        idx = int(np.searchsorted(cum, thresh))
        out_p.append(p)
        out_v.append(v[idx] / 1000.0)
    return pa.table(
        {
            "p": pa.array(out_p, type=pa.float64()),
            "cloud_cover_q": pa.array(out_v, type=pa.float64()),
        }
    )


ALL_QUERIES["events_sliding_3h"] = q_events_sliding_3h
ALL_QUERIES["cloud_quantiles"] = q_cloud_quantiles


def _spatial_anti_join(sf_dir: str, layer: pa.Table, id_col: str):
    """Images intersecting NO layer polygon — broadcast STRtree probe,
    exact refinement honored for non-rect layers, keep the misses."""
    import ray as _ray

    from ..state.broadcast import cached
    from ..stages.spatial_join import _Layer, _refine_pairs

    layer_ref = _ray.put(layer)

    def anti(batch: pa.Table) -> pa.Table:
        L = cached(layer_ref, lambda t: _Layer(t, id_col))
        x0 = batch.column("x0").to_numpy(zero_copy_only=False)
        y0 = batch.column("y0").to_numpy(zero_copy_only=False)
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)
        y1 = batch.column("y1").to_numpy(zero_copy_only=False)
        qi, ti = L.tree.query_batch(x0, y0, x1, y1)
        if not L.is_boxes and len(qi):
            qi, ti = _refine_pairs(
                x0, y0, x1, y1, qi, ti, L.parts, L.rings_stack, L.parts_stack
            )
        matched = np.zeros(batch.num_rows, dtype=bool)
        matched[qi] = True
        return batch.filter(pa.array(~matched)).select(["image_id"])

    return src.images_dataset(sf_dir).map_batches(
        anti, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_images_without_landcover(sf_dir: str):
    """Anti-join: images intersecting NO land-cover polygon (the
    complement of the flagship join)."""
    return _spatial_anti_join(sf_dir, src.land_cover_table(sf_dir), "lc_id")


# --- non-rect zone layer: exact polygon refinement -------------------------

def q_zone_join_pairs(sf_dir: str):
    """J2 on the NON-RECT triangle layer: the raw refined join pairs —
    bbox candidates from the STRtree, exact box-vs-ring refinement
    (vectorized per polygon) deciding membership."""
    return spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), src.zones_table(sf_dir), id_col="zone_id"
    )


def q_zone_image_counts(sf_dir: str):
    """Counts per zone class through the exact-refinement join."""
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        src.zones_table(sf_dir),
        id_col="zone_id",
        extra_cols=("zone_class",),
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        zc = batch.column("zone_class").to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(zc, return_counts=True)
        return pa.table(
            {
                "zone_class": pa.array(vals.astype("U"), type=pa.string()),
                "partial": pa.array(cnts.astype(np.int64)),
            }
        )

    partial = pairs.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    final = partial.groupby("zone_class").sum("partial")
    return _rename(final, {"sum(partial)": "total_images"})


def _class_totals(
    counts: pa.Table, layer: pa.Table, id_col: str, label_col: str
) -> pa.Table:
    """(id, n) per-layer-row counts -> per-LABEL totals, vectorized:
    attach labels via the sorted-key searchsorted map, then a weighted
    bincount over the label codes (no Python dict loop)."""
    got = counts.column(id_col).to_numpy(zero_copy_only=False)
    n = counts.column("n").to_numpy(zero_copy_only=False)
    labels = (
        _label_of(layer, id_col, label_col)(got)
        .to_numpy(zero_copy_only=False)
        .astype("U")
    )
    vals, inv = np.unique(labels, return_inverse=True)
    totals = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
    return pa.table(
        {
            label_col: pa.array(vals.astype("U"), type=pa.string()),
            "total_images": pa.array(totals),
        }
    )


def q_zone_image_counts_partitioned(sf_dir: str):
    """Same result through the cell-partitioned shuffle join — the WKB
    geometry travels with the build side and each cell group refines its
    own candidates (scale path for a layer too big to broadcast)."""
    from ..stages.hashagg import tree_count_sum_by_key

    zones = src.zones_table(sf_dir)
    zone_ds = ray.data.from_arrow(zones)
    pairs = spatial_join.partitioned_spatial_join(
        src.images_dataset(sf_dir, light=True), zone_ds, id_col="zone_id"
    )
    counts = tree_count_sum_by_key(pairs, "zone_id", count_name="n")
    return _class_totals(counts, zones, "zone_id", "zone_class")


def q_images_without_zone(sf_dir: str):
    """Anti-join against the non-rect layer: refinement must run on the
    candidates, else bbox-only 'matches' wrongly exclude images that
    touch a triangle's bbox but not the triangle."""
    return _spatial_anti_join(sf_dir, src.zones_table(sf_dir), "zone_id")


ALL_QUERIES["zone_join_pairs"] = q_zone_join_pairs
ALL_QUERIES["zone_image_counts"] = q_zone_image_counts
ALL_QUERIES["zone_image_counts_partitioned"] = q_zone_image_counts_partitioned
ALL_QUERIES["images_without_zone"] = q_images_without_zone


# --- multi-part (MULTIPOLYGON) layer + rotated (non-rect) probes -----------
#
# The reference joins arbitrary image footprint polygons against Natural
# Earth MULTIPOLYGON countries (db.py:107-122, 208-224); these queries
# exercise both generalizations: a layer whose geometries have several
# parts (intersects iff ANY part does), and probe footprints that are
# rotated quads rather than axis-aligned boxes.


def q_mzone_join_pairs(sf_dir: str):
    """Image boxes x MULTIPOLYGON zones (two rect parts per zone): bbox
    candidates over the covering box, then any-part exact refinement."""
    return spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        src.mzones_table(sf_dir),
        id_col="mzone_id",
    )


def q_mzone_image_counts(sf_dir: str):
    """Counts per zone class through the multi-part refinement join."""
    from ..stages.hashagg import tree_count_sum_by_key

    mzones = src.mzones_table(sf_dir)
    pairs = q_mzone_join_pairs(sf_dir)
    counts = tree_count_sum_by_key(pairs, "mzone_id", count_name="n")
    return _class_totals(counts, mzones, "mzone_id", "zone_class")


def q_mzone_image_counts_partitioned(sf_dir: str):
    """Same result through the cell-partitioned join — MULTIPOLYGON WKB
    rides the build side; each cell group stacks the 2-part rings and
    refines its own candidates."""
    from ..stages.hashagg import tree_count_sum_by_key

    mzones = src.mzones_table(sf_dir)
    mzone_ds = ray.data.from_arrow(
        mzones.select(["mzone_id", "x0", "y0", "x1", "y1", "geom_wkb"])
    )
    pairs = spatial_join.partitioned_spatial_join(
        src.images_dataset(sf_dir, light=True), mzone_ds, id_col="mzone_id"
    )
    counts = tree_count_sum_by_key(pairs, "mzone_id", count_name="n")
    return _class_totals(counts, mzones, "mzone_id", "zone_class")


def q_rot_landcover_counts(sf_dir: str):
    """ROTATED-QUAD probe footprints x rect land-cover layer: bbox
    candidates, then probe-polygon-vs-box exact refinement (the
    pair-batched box-vs-ring kernel with roles swapped).  Counts per
    featureclass."""
    from ..stages.hashagg import tree_count_sum_by_key

    lc = src.land_cover_table(sf_dir)
    pairs = spatial_join.broadcast_spatial_join(
        src.rot_footprints_dataset(sf_dir), lc, id_col="lc_id"
    )
    counts = tree_count_sum_by_key(pairs, "lc_id", count_name="n")
    return _class_totals(counts, lc, "lc_id", "featureclass")


def q_rot_mzone_pairs(sf_dir: str):
    """ROTATED-QUAD probes x MULTIPOLYGON zones — the fully general
    case: paired polygon-vs-polygon kernel (crossing + containment),
    folded OR over the build geometry's parts."""
    return spatial_join.broadcast_spatial_join(
        src.rot_footprints_dataset(sf_dir),
        src.mzones_table(sf_dir),
        id_col="mzone_id",
    )


def q_rot_zone_pairs(sf_dir: str):
    """ROTATED-QUAD probes x TRIANGLE zones: both sides non-rect, single
    part — the homogeneous-stack polygon-pair kernel path."""
    return spatial_join.broadcast_spatial_join(
        src.rot_footprints_dataset(sf_dir),
        src.zones_table(sf_dir),
        id_col="zone_id",
    )


ALL_QUERIES["mzone_join_pairs"] = q_mzone_join_pairs
ALL_QUERIES["mzone_image_counts"] = q_mzone_image_counts
ALL_QUERIES["mzone_image_counts_partitioned"] = q_mzone_image_counts_partitioned
ALL_QUERIES["rot_landcover_counts"] = q_rot_landcover_counts
ALL_QUERIES["rot_mzone_pairs"] = q_rot_mzone_pairs
ALL_QUERIES["rot_zone_pairs"] = q_rot_zone_pairs


def q_paged_search_images(sf_dir: str):
    """S1: the paginated live-source Datasource end to end — a custom
    ``get_read_tasks`` partitions the page chain, each read task chases
    its sub-chain with the quick-search filters applied server-side,
    and the reference's dict LAST-wins id-dedup
    (api_importer/clients/data.py:198) runs as a hash-partitioned
    vectorized stage over the cross-page duplicate re-returns."""
    import ray.data as rd

    from ..sources.paged import PagedSearchDatasource, paged_dedup_last_wins

    source = PagedSearchDatasource(sf_dir)
    # block count = page count: without this Ray's default parallelism
    # (200) splits each page into dozens of 16-row blocks and every
    # downstream stage drowns in task-scheduling overhead
    ds = rd.read_datasource(source, override_num_blocks=source.num_pages)
    out = paged_dedup_last_wins(ds)
    return out.map_batches(
        lambda b: b.select(
            [
                "image_id",
                "item_type_id",
                "cloud_cover",
                "clear_confidence_percent",
                "time_acquired",
            ]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )


ALL_QUERIES["paged_search_images"] = q_paged_search_images


def q_city_image_counts_full(sf_dir: str):
    """LEFT OUTER variant of the city range join: every city appears,
    zero-match cities with total_images = 0 (dense-side fill like the
    J6 scaffold, applied to a join)."""
    cities = src.cities_table(sf_dir)
    pairs = broadcast_join.city_buffer_join(src.images_dataset(sf_dir, light=True), cities)
    from ..stages.hashagg import tree_count_sum_by_key

    counts = tree_count_sum_by_key(pairs, "city_id", count_name="total_images")
    all_ids = cities.column("city_id").to_numpy(zero_copy_only=False).astype(np.int64)
    names = cities.column("city_name").to_numpy(zero_copy_only=False)
    got = counts.column("city_id").to_numpy(zero_copy_only=False) if counts.num_rows else np.array([], dtype=np.int64)
    cnt = counts.column("total_images").to_numpy(zero_copy_only=False) if counts.num_rows else np.array([], dtype=np.int64)
    cmap = dict(zip(got.tolist(), cnt.tolist()))
    full = np.asarray([cmap.get(int(i), 0) for i in all_ids], dtype=np.int64)
    return pa.table(
        {
            "city_id": pa.array(all_ids),
            "city_name": pa.array(names.astype("U"), type=pa.string()),
            "total_images": pa.array(full),
        }
    )


def q_top_cloudy_per_satellite(sf_dir: str):
    """Per-group top-k (rank within partition): the 3 cloudiest images
    of each satellite — per-batch group-topk combiner + tree merge
    (reusing the kNN top-k machinery with sat_id as the group key)."""
    import ray as _ray

    from ..stages.knn import _topk_per_city

    K = 3

    def batch_topk(batch: pa.Table) -> pa.Table:
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False)
        key = batch.column("image_key").to_numpy(zero_copy_only=False)
        iid = batch.column("image_id").to_numpy(zero_copy_only=False)
        cc = batch.column("cloud_cover").to_numpy(zero_copy_only=False)
        # rank by cloud desc -> order key = -cloud; ties by image_key asc
        g, kk, ii, order_val, _ = _topk_per_city(sat, key, iid, -cc, K)
        return pa.table(
            {
                "sat_id": pa.array(g),
                "image_key": pa.array(kk),
                "image_id": pa.array(ii.astype("U"), type=pa.string()),
                "neg_cloud": pa.array(order_val),
            }
        )

    cand = src.images_dataset(sf_dir).map_batches(
        batch_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    @_ray.remote
    def merge(*tables):
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        t = pa.concat_tables(nonempty)
        g, kk, ii, nv, _ = _topk_per_city(
            t.column("sat_id").to_numpy(zero_copy_only=False),
            t.column("image_key").to_numpy(zero_copy_only=False),
            t.column("image_id").to_numpy(zero_copy_only=False),
            t.column("neg_cloud").to_numpy(zero_copy_only=False),
            K,
        )
        return pa.table(
            {
                "sat_id": pa.array(g),
                "image_key": pa.array(kk),
                "image_id": pa.array(ii.astype("U"), type=pa.string()),
                "neg_cloud": pa.array(nv),
            }
        )

    from ..util import collect_block_refs

    refs = collect_block_refs(cand)
    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    top = _ray.get(refs[0])
    g, kk, ii, nv, rank = _topk_per_city(
        top.column("sat_id").to_numpy(zero_copy_only=False),
        top.column("image_key").to_numpy(zero_copy_only=False),
        top.column("image_id").to_numpy(zero_copy_only=False),
        top.column("neg_cloud").to_numpy(zero_copy_only=False),
        K,
    )
    return pa.table(
        {
            "sat_id": pa.array(g),
            "image_id": pa.array(ii.astype("U"), type=pa.string()),
            "cloud_cover": pa.array(-nv),
            "rank": pa.array(rank.astype(np.int64)),
        }
    )


def _filtered_images(sf_dir: str):
    """The reference app's composed filter set (sat names + cloud <= cc
    + date range, /root/reference/app/query.py:42-51) fused into ONE
    scan: the satellite semi-join is pushed down as an isin parquet
    filter, cloud/time prune inside the same map_batches that derives
    the metadata the downstream join consumes."""
    import pyarrow.dataset as pads

    sats = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = sats.column("s_suppkey").to_numpy(zero_copy_only=False)
    selected = sk[sk % spec.FILTER_SAT_MOD == spec.FILTER_SAT_REM].tolist()
    flt = pads.field("l_suppkey").isin(selected)
    imgs = src.images_dataset(sf_dir, parquet_filter=flt)

    lo = np.datetime64(spec.FILTER_DATE_LO, "us")
    hi = np.datetime64(spec.FILTER_DATE_HI, "us")

    def post_filter(batch: pa.Table) -> pa.Table:
        cc = batch.column("cloud_cover").to_numpy(zero_copy_only=False)
        ts = batch.column("time_acquired").to_numpy(zero_copy_only=False)
        m = (cc <= spec.FILTER_MAX_CLOUD) & (ts >= lo) & (ts <= hi)
        return batch.filter(pa.array(m))

    return imgs.map_batches(
        post_filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_city_counts_filtered(sf_dir: str):
    """Composed app screen: the city-count map with ALL query filters
    applied jointly (reference app/query.py:77-105 — sat names + cloud
    + date feeding the city buffer join, counts out)."""
    from ..util import collect_table

    pairs = broadcast_join.city_buffer_join(
        _filtered_images(sf_dir), src.cities_table(sf_dir)
    )
    counts = pairs.groupby(["city_id", "city_name"]).count()
    # tiny result; collected with an explicit schema because the
    # filtered join can be empty at the smallest sf (schema-less blocks)
    return collect_table(
        _rename(counts, {"count()": "total_images"}),
        schema=pa.schema(
            [
                ("city_id", pa.int64()),
                ("city_name", pa.string()),
                ("total_images", pa.int64()),
            ]
        ),
    )


def q_landcover_counts_filtered(sf_dir: str):
    """Composed app screen: land-cover class counts with the joint
    filter set (reference app/query.py:124-141)."""
    pairs = spatial_join.broadcast_spatial_join(
        _filtered_images(sf_dir),
        src.land_cover_table(sf_dir),
        id_col="lc_id",
        extra_cols=("featureclass",),
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        fc = batch.column("featureclass").to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(fc, return_counts=True)
        return pa.table(
            {
                "featureclass": pa.array(vals.astype("U"), type=pa.string()),
                "partial": pa.array(cnts.astype(np.int64)),
            }
        )

    from ..util import collect_table

    partial = pairs.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    final = partial.groupby("featureclass").sum("partial")
    return collect_table(
        _rename(final, {"sum(partial)": "total_images"}),
        schema=pa.schema(
            [("featureclass", pa.string()), ("total_images", pa.int64())]
        ),
    )


ALL_QUERIES["city_counts_filtered"] = q_city_counts_filtered
ALL_QUERIES["landcover_counts_filtered"] = q_landcover_counts_filtered

def q_dissolve_geom(sf_dir: str):
    """A6/J7 geometry output: per featureclass the dissolved UNION
    GEOMETRY as MULTIPOLYGON WKB (disjoint slab rects assembled from
    per-cell partial unions), plus rect count and exact area.  Rows-only
    driver check; pytest verifies area == exact dissolve and point
    membership equals the original layer."""
    from ..geo import wkb as wkbmod
    from ..stages import extras
    from ..util import collect_table

    lc_ds = ray.data.from_arrow(src.land_cover_table(sf_dir))
    partials = lc_ds.map_batches(
        extras.dissolve_geom_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tbl = collect_table(
        partials,
        schema=pa.schema(
            [
                ("featureclass", pa.string()),
                ("rx0", pa.float64()),
                ("ry0", pa.float64()),
                ("rx1", pa.float64()),
                ("ry1", pa.float64()),
            ]
        ),
    )
    fc = tbl.column("featureclass").to_numpy(zero_copy_only=False)
    rx0 = tbl.column("rx0").to_numpy(zero_copy_only=False)
    ry0 = tbl.column("ry0").to_numpy(zero_copy_only=False)
    rx1 = tbl.column("rx1").to_numpy(zero_copy_only=False)
    ry1 = tbl.column("ry1").to_numpy(zero_copy_only=False)
    out_fc, out_geom, out_n, out_area = [], [], [], []
    for f in np.unique(fc):
        m = fc == f
        out_fc.append(f)
        out_geom.append(wkbmod.encode_multipolygon_rects(rx0[m], ry0[m], rx1[m], ry1[m]))
        out_n.append(int(m.sum()))
        out_area.append(
            float(((rx1[m] - rx0[m]) * (ry1[m] - ry0[m])).sum()) * spec.KM2_PER_DEG2
        )
    return pa.table(
        {
            "featureclass": pa.array(out_fc, type=pa.string()),
            "geom_wkb": pa.array([g.hex() for g in out_geom], type=pa.string()),
            "n_rects": pa.array(np.asarray(out_n, dtype=np.int64)),
            "area_sqkm": pa.array(np.asarray(out_area, dtype=np.float64)),
        }
    )


def q_coverage_pct_exact(sf_dir: str):
    """A7 EXACT semantics (reference app/query.py:152-182 sans buffer):
    coverage = area(union(lc_f) ∩ union(images)) / area(union(lc_f))
    per featureclass on exact rectangle geometry — the ``buf_md=0``
    case of :func:`q_coverage_pct_buffered` (same integer-md² clip /
    cell-split / additive-union machinery).  Oracle-checked bit-exact
    against the DuckDB slab-sweep mirror; pytest also compares to a
    single-shot brute-force union."""
    return q_coverage_pct_buffered(sf_dir, buf_md=0)


def _clip_union_partials(sf_dir: str, layer: pa.Table, codes: np.ndarray, buf_md: int, id_col: str):
    """Shared numerator stage of the exact-geometry family: images ∩
    layer-rects clip in integer milli-degrees (optional ``buf_md``
    dilation of the layer), cell split, per-(code, cell) union
    partials, collected as (fc_code, partial_md2) — the one
    implementation behind coverage and big-side dissolve."""
    import ray as _ray

    from ..state.broadcast import cached
    from ..stages import extras
    from ..stages.spatial_join import _Layer
    from ..util import collect_table

    layer_ref = _ray.put(layer)
    code_ref = _ray.put(pa.table({"code": pa.array(codes.astype(np.int64))}))
    buf = int(buf_md)
    pad = (buf + 1) / 1000.0  # probe dilation covers the dilated extent

    def build(t):
        L = _Layer(t, id_col)
        lmd = (
            np.rint(L.x0 * 1000.0).astype(np.int64) - buf,
            np.rint(L.y0 * 1000.0).astype(np.int64) - buf,
            np.rint(L.x1 * 1000.0).astype(np.int64) + buf,
            np.rint(L.y1 * 1000.0).astype(np.int64) + buf,
        )
        return L, lmd

    def clip_batch(batch: pa.Table) -> pa.Table:
        L, (lx0, ly0, lx1, ly1) = cached(layer_ref, build)
        code = cached(code_ref, lambda t: t.column("code").to_numpy(zero_copy_only=False))
        ix0 = batch.column("x0").to_numpy(zero_copy_only=False)
        iy0 = batch.column("y0").to_numpy(zero_copy_only=False)
        ix1 = batch.column("x1").to_numpy(zero_copy_only=False)
        iy1 = batch.column("y1").to_numpy(zero_copy_only=False)
        qi, ti = L.tree.query_batch(ix0 - pad, iy0 - pad, ix1 + pad, iy1 + pad)
        cx0 = np.maximum(np.rint(ix0[qi] * 1000.0).astype(np.int64), lx0[ti])
        cy0 = np.maximum(np.rint(iy0[qi] * 1000.0).astype(np.int64), ly0[ti])
        cx1 = np.minimum(np.rint(ix1[qi] * 1000.0).astype(np.int64), lx1[ti])
        cy1 = np.minimum(np.rint(iy1[qi] * 1000.0).astype(np.int64), ly1[ti])
        keep = (cx1 > cx0) & (cy1 > cy0)
        ti = ti[keep]
        cx0, cy0, cx1, cy1 = cx0[keep], cy0[keep], cx1[keep], cy1[keep]
        ridx, cell, sx0, sy0, sx1, sy1 = extras.split_rects_cells_md(
            cx0, cy0, cx1, cy1
        )
        part = (
            cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)
        ) % np.uint64(512)
        return pa.table(
            {
                "fc_code": pa.array(code[ti][ridx]),
                "cell": pa.array(cell),
                "cx0": pa.array(sx0.astype(np.int32)),
                "cy0": pa.array(sy0.astype(np.int32)),
                "cx1": pa.array(sx1.astype(np.int32)),
                "cy1": pa.array(sy1.astype(np.int32)),
                "__part": pa.array(part.astype(np.int64)),
            }
        )

    clipped = src.images_dataset(sf_dir, light=True).map_batches(
        clip_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    partials = _pm(clipped, lambda g: extras.coverage_clip_partition(g.drop_columns(["__part"])))
    return collect_table(
        partials,
        schema=pa.schema([("fc_code", pa.int64()), ("partial_md2", pa.int64())]),
    )


def q_coverage_pct_buffered(sf_dir: str, buf_md: int = 1):
    """A7 with the reference's buffer semantics (app/query.py:152-182
    buffers the dissolved layer by 1 m in EPSG:3035 before clipping):
    the layer rects are dilated by ``buf_md`` integer milli-degrees —
    the corpus lattice's smallest unit, the planar analog of the 1 m
    buffer — before the exact union/intersection.  Buffered rects can
    cross base cells, so every clipped piece is SPLIT at the cell grid
    (extras.split_rects_cells_md) to keep per-(class, cell) union
    partials additive.  Oracle: the same slab sweep over dilated rects."""
    from ..stages import extras

    lc = src.land_cover_table(sf_dir)
    fcs = lc.column("featureclass").to_numpy(zero_copy_only=False)
    all_classes, fc_codes = np.unique(fcs, return_inverse=True)
    buf = int(buf_md)

    inter = _clip_union_partials(sf_dir, lc, fc_codes, buf, id_col="lc_id")
    ifc = all_classes[inter.column("fc_code").to_numpy(zero_copy_only=False)]
    iarea = inter.column("partial_md2").to_numpy(zero_copy_only=False)

    # denominator: per-class union of the BUFFERED layer, driver-side —
    # same split-to-cells + per-cell union kernel
    bx0 = np.rint(lc.column("x0").to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64) - buf
    by0 = np.rint(lc.column("y0").to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64) - buf
    bx1 = np.rint(lc.column("x1").to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64) + buf
    by1 = np.rint(lc.column("y1").to_numpy(zero_copy_only=False) * 1000.0).astype(np.int64) + buf
    ridx, cell, sx0, sy0, sx1, sy1 = extras.split_rects_cells_md(bx0, by0, bx1, by1)
    den_tab = pa.table(
        {
            "fc_code": pa.array(fc_codes[ridx].astype(np.int64)),
            "cell": pa.array(cell),
            "cx0": pa.array(sx0.astype(np.int32)),
            "cy0": pa.array(sy0.astype(np.int32)),
            "cx1": pa.array(sx1.astype(np.int32)),
            "cy1": pa.array(sy1.astype(np.int32)),
        }
    )
    lc_part = extras.coverage_clip_partition(den_tab)
    lfc = all_classes[lc_part.column("fc_code").to_numpy(zero_copy_only=False)]
    larea = lc_part.column("partial_md2").to_numpy(zero_copy_only=False)

    out_fc, out_a, out_i, out_pct = [], [], [], []
    for f in np.unique(lfc):
        a = int(larea[lfc == f].sum())
        iv = int(iarea[ifc == f].sum()) if len(ifc) else 0
        out_fc.append(f)
        out_a.append(float(a) * spec.KM2_PER_MD2)
        out_i.append(float(iv) * spec.KM2_PER_MD2)
        out_pct.append(100.0 * float(iv) / float(a) if a > 0 else 0.0)
    return pa.table(
        {
            "featureclass": pa.array(out_fc, type=pa.string()),
            "lc_area_sqkm": pa.array(np.asarray(out_a, dtype=np.float64)),
            "covered_area_sqkm": pa.array(np.asarray(out_i, dtype=np.float64)),
            "coverage_pct": pa.array(np.asarray(out_pct, dtype=np.float64)),
        }
    )


ALL_QUERIES["coverage_pct_buffered"] = q_coverage_pct_buffered


def q_country_image_union(sf_dir: str):
    """A6/J7 over the BIG side: exact per-country union area of the
    image footprints (reference ST_UNION semantics, app/query.py:158-178,
    applied to the billion-row side instead of the broadcast layer).
    Shares the clip / cell-split / additive-union machinery of the
    coverage family (_clip_union_partials); the per-layer-row code is
    the country index itself.  Oracle: slab sweep over the
    country-clipped image rects."""
    countries = src.countries_table(sf_dir)
    countries = pa.table(
        {
            "ct_id": pa.array(np.arange(countries.num_rows, dtype=np.int64)),
            **{c: countries.column(c) for c in countries.column_names},
        }
    )
    inter = _clip_union_partials(
        sf_dir, countries, np.arange(countries.num_rows, dtype=np.int64), 0,
        id_col="ct_id",
    )
    codes = inter.column("fc_code").to_numpy(zero_copy_only=False)
    md2 = inter.column("partial_md2").to_numpy(zero_copy_only=False)
    isos = countries.column("iso").to_numpy(zero_copy_only=False)
    out_iso, out_a = [], []
    for c in np.unique(codes):
        out_iso.append(isos[int(c)])
        out_a.append(float(int(md2[codes == c].sum())) * spec.KM2_PER_MD2)
    return pa.table(
        {
            "country_iso": pa.array(np.asarray(out_iso, dtype="U"), type=pa.string()),
            "union_area_sqkm": pa.array(np.asarray(out_a, dtype=np.float64)),
        }
    )


ALL_QUERIES["country_image_union"] = q_country_image_union


ALL_QUERIES["dissolve_geom"] = q_dissolve_geom


def q_dissolve_geom_canonical(sf_dir: str):
    """Round-5 closure of the dissolve_geom oracle gap: decode the
    ACTUAL MULTIPOLYGON WKB bytes the dissolve emitted back into their
    rectangle parts, canonically re-decompose the represented region
    into slab rows (integer milli-degree; the _slab_decompose sweep),
    and emit (featureclass, xl, xr, lo, hi).  Two equal regions have
    equal canonical slab sets whatever their rect decomposition, so a
    bit-exact match against the SQL slab sweep proves the WKB output
    encodes EXACTLY the per-class union geometry — dissolve_geom's
    geometry content is now oracle-checked (only its byte framing
    remains pytest-checked, tests/test_dissolve_geom.py)."""
    from ..geo import wkb as wkbmod

    out = q_dissolve_geom(sf_dir)
    fcs = out.column("featureclass").to_pylist()
    hexes = out.column("geom_wkb").to_pylist()
    out_fc, parts = [], []
    for f, hx in zip(fcs, hexes):
        rings = wkbmod.decode_rings(bytes.fromhex(hx))
        x0 = np.rint(np.array([r[:, 0].min() for r in rings]) * 1000.0).astype(np.int64)
        x1 = np.rint(np.array([r[:, 0].max() for r in rings]) * 1000.0).astype(np.int64)
        y0 = np.rint(np.array([r[:, 1].min() for r in rings]) * 1000.0).astype(np.int64)
        y1 = np.rint(np.array([r[:, 1].max() for r in rings]) * 1000.0).astype(np.int64)
        for r in rings:
            if len(r) != 5:
                raise ValueError("dissolve_geom part is not a rectangle ring")
        xl, xr, lo, hi = _slab_decompose(x0, x1, y0, y1)
        parts.append((xl, xr, lo, hi))
        out_fc.append(np.full(len(xl), f, dtype=object))
    return pa.table(
        {
            "featureclass": pa.array(
                np.concatenate(out_fc).astype("U"), type=pa.string()
            ),
            "xl": pa.array(np.concatenate([p[0] for p in parts])),
            "xr": pa.array(np.concatenate([p[1] for p in parts])),
            "lo": pa.array(np.concatenate([p[2] for p in parts])),
            "hi": pa.array(np.concatenate([p[3] for p in parts])),
        }
    )


ALL_QUERIES["dissolve_geom_canonical"] = q_dissolve_geom_canonical
ALL_QUERIES["coverage_pct_exact"] = q_coverage_pct_exact

# user-selectable heatmap frequencies (reference app/filters.py:27-30)
ALL_QUERIES["time_heatmap_week"] = lambda sf: q_time_heatmap_freq(sf, "week")
ALL_QUERIES["time_heatmap_day"] = lambda sf: q_time_heatmap_freq(sf, "day")
ALL_QUERIES["time_heatmap_hour"] = lambda sf: q_time_heatmap_freq(sf, "hour")
ALL_QUERIES["time_heatmap_minute"] = lambda sf: q_time_heatmap_freq(sf, "minute")

ALL_QUERIES["images_without_landcover"] = q_images_without_landcover
ALL_QUERIES["city_image_counts_full"] = q_city_image_counts_full
ALL_QUERIES["top_cloudy_per_satellite"] = q_top_cloudy_per_satellite


# --- round-3 late additions: decontamination / chunking / repetition / rollup

def _decon_bench_ref(docs: "ray.data.Dataset"):
    """One streaming pass over the benchmark slice -> driver dedup ->
    ray.put broadcast of the distinct benchmark n-gram set (tiny — it
    is an eval set by construction)."""
    from ..util import collect_table

    def _bench_side(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(did % spec.DECON_BENCH_MOD == 0))

    bench_tab = collect_table(
        docs.map_batches(
            lambda b: text.decon_bench_batch(_bench_side(b)),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        ),
        schema=pa.schema([("ng", pa.string())]),
    )
    return ray.put(pc.unique(bench_tab.column("ng").combine_chunks()))


def q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination (the pre-training hygiene op): docs
    sharing any word 3-gram with the held-out benchmark slice
    (doc_id % DECON_BENCH_MOD == 0) are flagged with their distinct-hit
    count.  Benchmark set built once and broadcast; the probe pass is
    one Arrow is_in hash lookup per batch.  No shuffle at any scale:
    the big side is touched exactly once, map-only."""
    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    ref = _decon_bench_ref(docs)

    def _probe_side(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(did % spec.DECON_BENCH_MOD != 0))

    return docs.map_batches(
        lambda b: text.decon_probe_batch(_probe_side(b), ref),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def q_docs_chunks(sf_dir: str):
    """RAG/packing-style chunking: each doc's nonempty-token stream cut
    into fixed 32-token windows, chunk text space-joined.  Map-only
    (chunks derive from their own row), one join kernel per batch."""
    return _docs(sf_dir).map_batches(
        text.chunk_tokens_batch,
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def q_docs_repetition(sf_dir: str):
    """Gopher-style repetition quality metrics per doc (duplicate-token
    ppm, top-bigram ppm) — integer ppm arithmetic, map-only."""
    return _docs(sf_dir).map_batches(
        text.repetition_stats_batch,
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def q_nation_year_rollup(sf_dir: str):
    """Multi-level aggregation (GROUP BY ROLLUP): order revenue by
    (nation, order year) with per-nation subtotals and a grand total.
    The finest grain runs distributed (PK bucket lookup-join + combiner
    tree over a composite int key — stages/bucket_join.py, same
    restructure as order_item_revenue); coarser levels re-aggregate the
    finest RESULT (25 nations x ~7 years — driver-sized at any corpus
    scale), so the rollup costs one exchange, not three."""
    from ..stages.bucket_join import lookup_join

    def od_prep(batch: pa.Table) -> pa.Table:
        tp = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        dt = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = dt.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "cents": pa.array(np.floor(tp * 100.0).astype(np.int64)),
                "year": pa.array(year),
            }
        )

    od = src.table_dataset(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"]
    ).map_batches(od_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    cu = src.table_dataset(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    j = lookup_join(od, "o_custkey", ("cents", "year"), cu, "c_custkey", "c_nationkey")

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        year = batch.column("year").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(nk * np.int64(10000) + year),
                "revenue_cents": batch.column("cents"),
            }
        )

    rows = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from ..stages.hashagg import tree_count_sum_by_key

    agg = tree_count_sum_by_key(rows, "key", sum_cols=("revenue_cents",), count_name="n_orders")
    key = agg.column("key").to_numpy(zero_copy_only=False)
    nkey, year = key // 10000, key % 10000
    n = agg.column("n_orders").to_numpy(zero_copy_only=False)
    rev = agg.column("revenue_cents").to_numpy(zero_copy_only=False)
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk_d = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nm_d = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    order = np.argsort(nk_d)
    nk_s, nm_s = nk_d[order], nm_d[order]
    names = nm_s[np.searchsorted(nk_s, nkey)]

    # subtotal levels from the finest result (driver-sized)
    sub_order = np.argsort(nkey, kind="stable")
    uk, ust = np.unique(nkey[sub_order], return_index=True)
    sub_n = np.add.reduceat(n[sub_order], ust)
    sub_rev = np.add.reduceat(rev[sub_order], ust)
    sub_names = nm_s[np.searchsorted(nk_s, uk)]

    nation_col = pa.array(
        np.concatenate([names, sub_names, np.array([None], dtype=object)]),
        type=pa.string(),
    )
    year_col = pa.array(
        np.concatenate([year, np.full(len(uk), -1), [-1]]), type=pa.int64()
    )
    year_col = pc.if_else(pc.equal(year_col, -1), pa.scalar(None, pa.int64()), year_col)
    return pa.table(
        {
            "nation": nation_col,
            "order_year": year_col,
            "n_orders": pa.array(np.concatenate([n, sub_n, [n.sum()]])),
            "revenue_cents": pa.array(np.concatenate([rev, sub_rev, [rev.sum()]])),
        }
    )


ALL_QUERIES["docs_decontaminate"] = q_docs_decontaminate
ALL_QUERIES["docs_chunks"] = q_docs_chunks
ALL_QUERIES["docs_repetition"] = q_docs_repetition
ALL_QUERIES["nation_year_rollup"] = q_nation_year_rollup


def q_sat_daily_cumulative(sf_dir: str):
    """Running window aggregate: per-satellite cumulative image count by
    day.  Daily grain aggregates distributed (packed int key, combiner
    tree, no sort shuffle); the cumulative sum runs on the RESULT
    (sats x days — driver-sized at any corpus scale), one vectorized
    segmented cumsum."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        ts = batch.column("time_acquired").to_numpy(zero_copy_only=False)
        d = _bucket_index(ts, "day")
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"hkey": pa.array((sat << np.int64(20)) | d)})

    packed = src.images_dataset(sf_dir).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n_images")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    n = agg.column("n_images").to_numpy(zero_copy_only=False)
    sat, d = key >> np.int64(20), key & np.int64((1 << 20) - 1)
    order = np.lexsort((d, sat))
    sat, d, n = sat[order], d[order], n[order]
    cum = np.cumsum(n)
    starts = np.flatnonzero(np.r_[True, sat[1:] != sat[:-1]])
    base = np.repeat((cum - n)[starts], np.diff(np.r_[starts, len(sat)]))
    return pa.table(
        {
            "sat_id": pa.array(sat),
            "day": _bucket_labels(d, "day"),
            "n_images": pa.array(n),
            "cum_images": pa.array(cum - base),
        }
    )


def q_sat_month_pivot(sf_dir: str):
    """Pivot to wide: per-satellite image counts by calendar month as 12
    columns + total.  The long-form aggregate runs distributed over a
    packed (sat, month) key; the driver scatters the (sats x 12)-row
    result into the wide layout."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        ts = batch.column("time_acquired").to_numpy(zero_copy_only=False)
        mon = ts.astype("datetime64[M]").astype(np.int64) % 12 + 1
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"hkey": pa.array(sat * np.int64(16) + mon)})

    packed = src.images_dataset(sf_dir).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    sat, mon = key // 16, key % 16
    sats = np.unique(sat)
    wide = np.zeros((len(sats), 12), dtype=np.int64)
    wide[np.searchsorted(sats, sat), mon - 1] = n
    cols = {"sat_id": pa.array(sats)}
    for m in range(1, 13):
        cols[f"m{m:02d}"] = pa.array(wide[:, m - 1])
    cols["total"] = pa.array(wide.sum(axis=1))
    return pa.table(cols)


def q_events_latest_state(sf_dir: str):
    """Last-write-wins compaction (upsert view): each (user, event_type)
    keeps its latest event.  Per-batch argmax combiner first (the
    exchange carries at most one row per key per block), then a
    user-hash shuffle and the same associative kernel per partition."""
    ev = src.table_dataset(
        sf_dir, "events",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    )
    pre = ev.map_batches(
        timeseries.latest_state_kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    parted = pre.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(parted, lambda g: timeseries.latest_state_kernel(g.drop_columns(["__part"])))


ALL_QUERIES["sat_daily_cumulative"] = q_sat_daily_cumulative
ALL_QUERIES["sat_month_pivot"] = q_sat_month_pivot
ALL_QUERIES["events_latest_state"] = q_events_latest_state


def q_sat_pareto_frontier(sf_dir: str):
    """Pareto frontier per satellite on (cloud_cover asc, clear
    confidence desc) — multi-criteria selection.  Frontier-of-union ==
    frontier-of-frontiers, so a per-batch max-clear-per-(sat, cloud
    level) combiner is lossless; the bounded level table (sats x 1001
    discrete cloud values) aggregates via native groupby Max, the
    frontier is derived on that small result with one segmented
    running-max, and members are recovered by a broadcast-free stream
    filter (sorted searchsorted probe, same pattern as the dedup drop
    sets).  Duplicate corpus keys survive in both engines (identical
    rows dominate nothing)."""
    from ..util import sorted_isin

    def _lv(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        # light derive + the cloud/clear mixes directly (the full
        # string/timestamp derive was 2x the query's cost)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mk = ik % np.int64(spec.MOD)
        cmd = corpus_mod._mix(mk, spec.ST_CLOUD) % 1001
        clr = corpus_mod._mix(mk, spec.ST_CLEAR) % 101
        return sat * np.int64(2048) + cmd, cmd, clr

    def level_partial(batch: pa.Table) -> pa.Table:
        key, _, clr = _lv(batch)
        order = np.lexsort((clr, key))
        k_s, c_s = key[order], clr[order]
        last = np.ones(len(k_s), dtype=bool)
        last[:-1] = k_s[1:] != k_s[:-1]
        return pa.table({"key": pa.array(k_s[last]), "clear_i": pa.array(c_s[last])})

    from ..stages.hashagg import tree_max_by_key

    # per-key max via the combiner TREE (no sort shuffle: the level
    # table is bounded by sats x 1001 whatever the corpus size, exactly
    # the tree_count_sum_by_key contract)
    tab = tree_max_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            level_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ),
        "key",
        "clear_i",
    )
    key = tab.column("key").to_numpy(zero_copy_only=False)
    mc = tab.column("clear_i").to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")  # (sat, cloud_md) ascending
    key, mc = key[order], mc[order]
    sat = key // 2048
    starts = np.r_[True, sat[1:] != sat[:-1]]
    seg_id = np.cumsum(starts) - 1
    # strictly-previous running max of mc within each sat segment
    shifted = np.r_[np.int64(-1), mc[:-1]]
    shifted[np.flatnonzero(starts)] = -1
    prev = _segmented_cummax(shifted, seg_id)
    keep = mc > prev
    fkey, fmc = key[keep], mc[keep]

    def members(batch: pa.Table) -> pa.Table:
        k, cmd, clr = _lv(batch)
        pos = np.minimum(np.searchsorted(fkey, k), max(len(fkey) - 1, 0))
        hit = (
            (fkey[pos] == k) & (clr == fmc[pos])
            if len(fkey)
            else np.zeros(len(k), dtype=bool)
        )
        out = batch.filter(pa.array(hit))
        # attribute columns rebuilt from the mixes with the exact corpus
        # expressions (cloud = level/1000.0, clear = float(mix % 101))
        return pa.table(
            {
                "sat_id": out.column("sat_id"),
                "image_id": out.column("image_id"),
                "cloud_cover": pa.array(cmd[hit] / 1000.0),
                "clear_confidence_percent": pa.array(clr[hit].astype(np.float64)),
            }
        )

    return src.images_dataset(sf_dir, light=True).map_batches(
        members, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _segmented_cummax(vals: np.ndarray, seg_id: np.ndarray) -> np.ndarray:
    """Running max within each segment (segments = equal seg_id runs,
    ascending), vectorized: offset each segment into a disjoint value
    range (vals must fit in [-1, 1022] so a segment's max never reaches
    the next segment's floor), one global accumulate, then remove the
    offset."""
    if len(vals) == 0:
        return vals
    assert vals.min() >= -1 and vals.max() <= 1022, "value outside stride"
    off = seg_id.astype(np.int64) * np.int64(1024)
    return np.maximum.accumulate(vals.astype(np.int64) + off) - off


ALL_QUERIES["sat_pareto_frontier"] = q_sat_pareto_frontier


def q_sat_cloud_outliers(sf_dir: str):
    """Composed pipeline: distributed per-group quantile -> threshold
    broadcast -> stream filter.  Pass 1 reuses the exact bounded-
    histogram machinery (only (sat, cloud_int) count partials shuffle)
    to derive each satellite's p99 cloud level; pass 2 streams the
    corpus once more and keeps rows strictly above their satellite's
    threshold.  The comparison happens on the integer cloud level
    (cloud = k/1000 is strictly monotonic in k), so no float compare
    can drift from the oracle."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        cint = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table({"code": pa.array(sat * np.int64(1001) + cint)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = collect_table(count_sum_by_key(enc, "code", count_name="n"))
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code, n = code[order], n[order]
    sat, cint = code // 1001, code % 1001
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    thr = np.empty(len(uniq_sat), dtype=np.int64)
    for i in range(len(uniq_sat)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cum = np.cumsum(n[lo:hi])
        target = (99 * int(cum[-1]) + 99) // 100  # quantile_disc 0.99
        thr[i] = cint[lo + int(np.searchsorted(cum, target))]

    def keep_outliers(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        s = b.column("sat_id").to_numpy(zero_copy_only=False)
        cint_b = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        t = thr[np.searchsorted(uniq_sat, s)]
        out = b.filter(pa.array(cint_b > t))
        return out.select(["image_id", "sat_id", "cloud_cover"])

    return src.images_dataset(sf_dir).map_batches(
        keep_outliers, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["sat_cloud_outliers"] = q_sat_cloud_outliers


def q_tile_skew_stats(sf_dir: str):
    """Partition-skew diagnostics over the tile grid (the hot-cell story
    the salted spatial join exists for): distribution of per-tile
    assignment counts — n_tiles, totals, max, p50/p99 (quantile_disc
    integer rule), and the hot-tile share (ppm of assignments landing
    on tiles above p99).  The per-tile grain reuses the tile-manifest
    combiner (only (tile, count) partials move); the distribution math
    runs on that bounded result."""
    from ..util import collect_table

    manifest = collect_table(
        tiles.tile_manifest(src.images_dataset(sf_dir, light=True)),
        schema=pa.schema(
            [("tile_id", pa.int64()), ("n_images", pa.int64()), ("total_bytes", pa.int64())]
        ),
    )
    n = np.sort(manifest.column("n_images").to_numpy(zero_copy_only=False))
    total = int(n.sum())
    cnt = len(n)

    def qdisc(pct: int) -> int:
        return int(n[(pct * cnt + 99) // 100 - 1])  # 1-based ceil(q*n)

    p50, p99 = qdisc(50), qdisc(99)
    hot = int(n[n > p99].sum())
    return pa.table(
        {
            "n_tiles": pa.array([cnt], type=pa.int64()),
            "total_assignments": pa.array([total], type=pa.int64()),
            "max_per_tile": pa.array([int(n[-1])], type=pa.int64()),
            "p50_per_tile": pa.array([p50], type=pa.int64()),
            "p99_per_tile": pa.array([p99], type=pa.int64()),
            "hot_share_ppm": pa.array([hot * 1_000_000 // total], type=pa.int64()),
        }
    )


ALL_QUERIES["tile_skew_stats"] = q_tile_skew_stats


def _corpus_survivors(docs: "ray.data.Dataset"):
    """The shared decon+clean+dedup survivor pipeline (decon filter ->
    fused quality/langid/split derive -> one content-hash exchange,
    first-wins canonical).  Both corpus_clean_decon (metadata output)
    and corpus_clean_chunks (chunk export) compose over THIS — the two
    must never drift."""
    ref = _decon_bench_ref(docs)
    filtered = docs.map_batches(
        lambda b: text.decon_filter_batch(b, ref),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    derived = filtered.map_batches(
        _cached_text(text.CorpusCleanDerive),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    return _pm(derived, lambda g: text.corpus_clean_partition(g.drop_columns(["__part"])))


def _corpus_survivors_for(sf_dir: str) -> "ray.data.Dataset":
    """Memoized (session, sf_dir) survivor set — the decon+clean+dedup
    exchange runs once for its three consumers (corpus_clean_decon,
    corpus_clean_chunks, corpus_release)."""
    from .pixel_fused import shared

    def build():
        docs = src.table_dataset(
            sf_dir, "documents", columns=["doc_id", "text"]
        )
        return _corpus_survivors(docs).materialize()

    return shared(sf_dir, "corpus_survivors", build)


def q_corpus_clean_decon(sf_dir: str):
    """The FULL composed corpus-build pipeline: decontamination filter
    (drop the benchmark slice + every doc sharing a word 3-gram with
    it) -> fused quality/langid/split derive -> exact-dedup canonical.
    The decon filter commutes with dedup (identical texts share
    identical n-grams) and runs before any hashing, so contaminated
    text is never md5'd nor shuffled; the whole plan is the benchmark
    pass + ONE hash exchange of surviving fixed-width rows."""
    return _corpus_survivors_for(sf_dir)


ALL_QUERIES["corpus_clean_decon"] = q_corpus_clean_decon


def q_events_hourly_anomalies(sf_dir: str):
    """Streaming anomaly detection: hours whose event count exceeds the
    trailing-24h mean by >3 sigma.  The distributed part is the hourly
    count (combiner tree over hour indices); the rolling screen runs on
    that bucket table (grows with TIME, not data volume — driver-sized
    at any corpus scale).  The 3-sigma test is cross-multiplied into
    exact integers: flag iff d = 24n - S > 0 and d^2 > 9(24*SS - S^2),
    full windows only — no float, no sqrt, bit-exact vs the oracle."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = 24

    def pack(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        return pa.table({"hkey": pa.array(ts.astype("datetime64[h]").astype(np.int64))})

    ev = src.table_dataset(sf_dir, "events", columns=["ts"])
    packed = ev.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n")
    hkey = agg.column("hkey").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    lo, hi = int(hkey.min()), int(hkey.max())
    n = np.zeros(hi - lo + 1, dtype=np.int64)
    n[hkey - lo] = cnt
    c1 = np.r_[0, np.cumsum(n)]
    c2 = np.r_[0, np.cumsum(n * n)]
    idx = np.arange(W, len(n))  # full trailing windows only
    s = c1[idx] - c1[idx - W]
    ss = c2[idx] - c2[idx - W]
    d = n[idx] * W - s
    flag = (d > 0) & (d * d > 9 * (ss * W - s * s))
    hits = idx[flag]
    return pa.table(
        {
            "bucket": _bucket_labels(hits + lo, "hour"),
            "n_events": pa.array(n[hits]),
            "win_sum": pa.array(s[flag]),
        }
    )


ALL_QUERIES["events_hourly_anomalies"] = q_events_hourly_anomalies


def q_hybrid_search(sf_dir: str):
    """Hybrid retrieval (RAG-style): the distributed BM25 lexical pass
    produces the candidate top-k; those k ids pull their embeddings via
    a pushdown point-read and get re-ranked by rounded cosine to the
    query vector.  Everything past BM25 touches k rows — the re-rank is
    driver-sized by construction at any corpus scale."""
    from ..stages.ann import _emb_matrix, _norm_rows

    bm = q_docs_bm25(sf_dir)
    ids = bm.column("doc_id").to_numpy(zero_copy_only=False)
    emb_tab = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(map(int, ids)))],
    )
    qtab = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", spec.HYBRID_QUERY_VEC)],
    )
    qm = _emb_matrix(qtab.column("embedding"))
    em = _emb_matrix(emb_tab.column("embedding"))
    sims = qm @ em.T  # (1, k') — same expression shape as CosineTopK
    sims /= _norm_rows(qm)[:, None]
    sims /= _norm_rows(em)[None, :]
    sims = np.round(sims, spec.ANN_ROUND)[0]
    vid = emb_tab.column("vec_id").to_numpy(zero_copy_only=False)
    pos = {int(v): i for i, v in enumerate(vid)}
    keep = np.array([int(d) in pos for d in ids], dtype=bool)
    d_k = ids[keep]
    s_k = bm.column("score_m").to_numpy(zero_copy_only=False)[keep]
    sim_k = sims[[pos[int(d)] for d in d_k]]
    order = np.lexsort((d_k, -sim_k))
    return pa.table(
        {
            "doc_id": pa.array(d_k[order]),
            "score_m": pa.array(s_k[order]),
            "sim": pa.array(sim_k[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        }
    )


ALL_QUERIES["hybrid_search"] = q_hybrid_search


def q_image_pagerank(sf_dir: str):
    """Iterative link analysis: integer-lattice PageRank over the phash
    near-dup graph (re-capture cliques get rank mass proportional to
    how centrally they sit in their clique web).  The heavy, corpus-
    scale stage is the distributed pair generation (banded LSH +
    hamming refine); the rank iterations run in ``stages/graph.py`` with
    the SAME size gate as connected components — vectorized driver pass
    below the edge threshold, two hash exchanges per iteration above it
    (state never driver-resident), both paths bit-identical and
    equivalence-tested."""
    from ..stages import graph

    ranks = graph.pagerank(
        _phash_pair_keys(sf_dir), "ka", "kb",
        iters=spec.PAGERANK_ITERS, scale=spec.PAGERANK_SCALE,
    )
    return ranks.map_batches(
        lambda b: pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(b.column("node"), pa.string()), ""
                ),
                "rank_scaled": b.column("rank_scaled"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


ALL_QUERIES["image_pagerank"] = q_image_pagerank


def q_sat_bbox(sf_dir: str):
    """Extent aggregate (GIS envelope): per-satellite bounding box of
    all footprints + scene count.  Min/max are associative, so the
    per-batch combiner emits one row per touched satellite and a
    bounded driver reduce finishes — no shuffle.  Coordinates stay in
    exact integer millidegrees until the final projection to degrees
    (the corpus's own md->deg formula), so no float min/max drift."""
    from ..util import collect_table

    _empty = pa.schema(
        [("sat_id", pa.int64()), ("n", pa.int64()), ("minx", pa.int64()),
         ("maxx", pa.int64()), ("miny", pa.int64()), ("maxy", pa.int64())]
    ).empty_table()

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # reduceat rejects empty operands
            return _empty
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, hw_md = corpus_mod.geom_md_from_keys(ik)
        x0, x1 = lon_md - hw_md, lon_md + hw_md
        y0, y1 = lat_md - hw_md, lat_md + hw_md
        order = np.argsort(sat, kind="stable")
        s_s = sat[order]
        st = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
        return pa.table(
            {
                "sat_id": pa.array(s_s[st]),
                "n": pa.array(np.diff(np.r_[st, len(s_s)]).astype(np.int64)),
                "minx": pa.array(np.minimum.reduceat(x0[order], st)),
                "maxx": pa.array(np.maximum.reduceat(x1[order], st)),
                "miny": pa.array(np.minimum.reduceat(y0[order], st)),
                "maxy": pa.array(np.maximum.reduceat(y1[order], st)),
            }
        )

    parts = collect_table(
        src.images_dataset(sf_dir, light=True).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema(
            [("sat_id", pa.int64()), ("n", pa.int64()), ("minx", pa.int64()),
             ("maxx", pa.int64()), ("miny", pa.int64()), ("maxy", pa.int64())]
        ),
    )
    sat = parts.column("sat_id").to_numpy(zero_copy_only=False)
    order = np.argsort(sat, kind="stable")
    sat_s = sat[order]
    st = np.flatnonzero(np.r_[True, sat_s[1:] != sat_s[:-1]])

    def red(col, fn):
        return fn.reduceat(parts.column(col).to_numpy(zero_copy_only=False)[order], st)

    return pa.table(
        {
            "sat_id": pa.array(sat_s[st]),
            "n_images": pa.array(np.add.reduceat(
                parts.column("n").to_numpy(zero_copy_only=False)[order], st).astype(np.int64)),
            "min_x": pa.array(red("minx", np.minimum) / 1000.0 - spec.LON_OFF),
            "max_x": pa.array(red("maxx", np.maximum) / 1000.0 - spec.LON_OFF),
            "min_y": pa.array(red("miny", np.minimum) / 1000.0 - spec.LAT_OFF),
            "max_y": pa.array(red("maxy", np.maximum) / 1000.0 - spec.LAT_OFF),
        }
    )


def q_caption_suffix_counts(sf_dir: str):
    """Regex extraction + bounded aggregate: captions end in a 2-letter
    code ('img-<key>-AB'); extract it with the SAME RE2 pattern on both
    engines and count scenes per code (26x26 key space, combiner tree,
    no shuffle)."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        suf = pc.extract_regex(batch.column("caption"), pattern=r"-(?P<s>[A-Z]{2})$")
        s = pc.struct_field(suf, "s")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        arr = s.to_numpy(zero_copy_only=False).astype("U2")
        key = (arr.view(np.uint32).reshape(-1, 2)[:, 0] - 65) * 26 + (
            arr.view(np.uint32).reshape(-1, 2)[:, 1] - 65
        )
        return pa.table({"hkey": pa.array(key.astype(np.int64))})

    packed = src.images_dataset(sf_dir).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n_images")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    a = (key // 26 + 65).astype(np.uint32)
    b = (key % 26 + 65).astype(np.uint32)
    suffix = np.char.add(a.view("U1"), b.view("U1"))
    return pa.table(
        {"suffix": pa.array(suffix, type=pa.string()), "n_images": agg.column("n_images")}
    )


ALL_QUERIES["sat_bbox"] = q_sat_bbox
ALL_QUERIES["caption_suffix_counts"] = q_caption_suffix_counts


def q_nation_item_revenue(sf_dir: str):
    """Multi-join chain (TPC-H Q5 shape, no region filter): lineitem
    JOIN orders JOIN customer JOIN nation — TWO chained large x large
    hash-shuffle `Dataset.join`s (line items and orders both corpus-
    sized; customer accounts too), each join immediately followed by a
    projection to the few columns the next stage needs so the second
    exchange moves (custkey, cents) pairs only; the 25-row nation dim
    attaches at the end on the driver-sized aggregate.  Revenue in
    integer cents mirrors the oracle expression order.

    Round-4 restructure (closes the round-3 VERDICT item): the two
    ``Dataset.join``s and their required ``materialize()`` stage
    barrier are GONE — Ray 2.49 eagerly creates both joins' hash-
    shuffle aggregator-actor pools and deadlocks when they cannot
    co-schedule (reproduced at num_cpus=4 even with fractional-CPU
    aggregators; pinned in tests/test_ray_join_deadlock.py).  Both
    joins are PK lookups (orderkey->custkey, custkey->nationkey), so
    they run as two bucket lookup-joins over the shared hash exchange
    (stages/bucket_join.py): no actor pools, no barrier, streaming end
    to end, and the first exchange ships pre-projected (orderkey,
    cents) rows only."""
    from ..stages.bucket_join import lookup_join

    def cents(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "cents": pa.array(np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)),
            }
        )

    li = src.table_dataset(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(cents, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    od = src.table_dataset(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j1 = lookup_join(li, "l_orderkey", ("cents",), od, "o_orderkey", "o_custkey")
    cu = src.table_dataset(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    j2 = lookup_join(j1, "o_custkey", ("cents",), cu, "c_custkey", "c_nationkey")

    rows = j2.map_batches(
        lambda b: pa.table(
            {"key": b.column("c_nationkey"), "cents": b.column("cents")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    from ..stages.hashagg import tree_count_sum_by_key

    agg = tree_count_sum_by_key(rows, "key", sum_cols=("cents",), count_name="n_items")
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk_d = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nm_d = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    order = np.argsort(nk_d)
    keys = agg.column("key").to_numpy(zero_copy_only=False)
    idx = np.searchsorted(nk_d[order], keys)
    return pa.table(
        {
            "nation": pa.array(nm_d[order][idx], type=pa.string()),
            "n_items": agg.column("n_items"),
            "revenue_cents": agg.column("cents"),
        }
    )


ALL_QUERIES["nation_item_revenue"] = q_nation_item_revenue


def q_sat_cloud_clear_cov(sf_dir: str):
    """Second-moment aggregate: per-satellite covariance numerator
    between cloud level and clear confidence, kept in EXACT integers
    (cov_num = n*Sxy - Sx*Sy over integer-valued cloud_md and clear) —
    the sufficient statistics (n, Sx, Sy, Sxy) are associative sums, so
    one combiner-tree pass computes them shuffle-free.  At 10^12-row
    groups the statistics outgrow int64; the production variant widens
    to i128 (DuckDB's HUGEINT mirrors that side)."""
    from ..stages.hashagg import tree_count_sum_by_key

    def partial(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        y = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLEAR) % 101
        return pa.table(
            {
                "key": pa.array(sat),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
            }
        )

    rows = src.images_dataset(sf_dir, light=True).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(rows, "key", sum_cols=("sx", "sy", "sxy"), count_name="n")
    n = agg.column("n").to_numpy(zero_copy_only=False)
    sx = agg.column("sx").to_numpy(zero_copy_only=False)
    sy = agg.column("sy").to_numpy(zero_copy_only=False)
    sxy = agg.column("sxy").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "sat_id": agg.column("key"),
            "n": pa.array(n),
            "sx": pa.array(sx),
            "sy": pa.array(sy),
            "cov_num": pa.array(n * sxy - sx * sy),
        }
    )


def q_count_per_satellite_incremental(sf_dir: str):
    """Aggregate delta maintenance: the per-sat count is maintained by
    MERGING a base aggregate (the already-imported 2/3 slice,
    image_key % 3 != 0 — the incremental_import convention) with the
    delta slice's aggregate, never recomputing over the union.  Both
    aggregates run as independent combiner-tree passes; the merge is
    the associative vector add.  Oracle recomputes from scratch — equal
    results prove the maintenance identity."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table, want_base: bool) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = (ik % 3 != 0) if want_base else (ik % 3 == 0)
        return pa.table({"key": pa.array(sat[m])})

    def agg_for(want_base: bool):
        ds = src.images_dataset(sf_dir, light=True).map_batches(
            lambda b: pack(b, want_base),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        )
        t = tree_count_sum_by_key(ds, "key", count_name="n")
        k = t.column("key").to_numpy(zero_copy_only=False)
        v = t.column("n").to_numpy(zero_copy_only=False)
        o = np.argsort(k)
        return k[o], v[o]

    bk, bv = agg_for(True)
    dk, dv = agg_for(False)
    sats = np.union1d(bk, dk)
    nb = np.zeros(len(sats), dtype=np.int64)
    nd = np.zeros(len(sats), dtype=np.int64)
    nb[np.searchsorted(sats, bk)] = bv
    nd[np.searchsorted(sats, dk)] = dv
    return pa.table(
        {
            "sat_id": pa.array(sats),
            "n_base": pa.array(nb),
            "n_delta": pa.array(nd),
            "n_total": pa.array(nb + nd),
        }
    )


ALL_QUERIES["sat_cloud_clear_cov"] = q_sat_cloud_clear_cov
ALL_QUERIES["count_per_satellite_incremental"] = q_count_per_satellite_incremental


def q_user_features(sf_dir: str):
    """ML feature-table build over the event stream: one user-hash
    exchange, then every per-user feature computes in one segment-scan
    kernel per partition (the sessionize partitioning reused)."""
    ev = src.table_dataset(
        sf_dir, "events",
        columns=["user_id", "event_type", "ts", "value"],
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(parted, lambda g: timeseries.user_features_partition(g.drop_columns(["__part"])))


ALL_QUERIES["user_features"] = q_user_features


def q_corpus_clean_chunks(sf_dir: str):
    """Training-ready chunk EXPORT of the cleaned corpus: the composed
    decon+clean+dedup pipeline yields the surviving doc_ids, which are
    SEMI-JOINED back to their text by one doc_id-hash exchange (the
    survivor set is corpus-sized — half the corpus — so no broadcast;
    both sides co-partition through the same shuffle, the
    incremental_import pattern) and chunked into 32-token windows in
    the same partition kernel.  Text transits exactly one exchange."""
    from ..util import hash_partition

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    survivors = _corpus_survivors_for(sf_dir)

    def tag_surv(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": pa.array(np.full(len(ids), "", dtype=object), type=pa.string()),
                "kind": pa.array(np.zeros(len(ids), np.int8)),
                "__p": pa.array(hash_partition(ids, 64)),
            }
        )

    def tag_docs(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": b.column("text"),
                "kind": pa.array(np.ones(len(ids), np.int8)),
                "__p": pa.array(hash_partition(ids, 64)),
            }
        )

    merged = survivors.map_batches(
        tag_surv, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        docs.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    )
    return _pm(
        merged, lambda g: text.chunk_members_partition(g.drop_columns(["__p"])), col="__p"
    )


ALL_QUERIES["corpus_clean_chunks"] = q_corpus_clean_chunks


def q_pixel_histogram(sf_dir: str):
    """Decoded pixel-value distribution per format (multimodal ingest
    diagnostic): the engine bincounts REAL payload bytes (the
    decode_stats convention); the oracle mirrors with the ramp's
    closed-form per-value counts.  Round 5: the per-image histograms
    come from the FUSED pixel pass (pipelines/pixel_fused); only
    512-row (fmt, value, count) partials transit the combiner tree."""
    from .pixel_fused import fmt_hist

    agg = fmt_hist(sf_dir)
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    npx = agg.column("n_pixels").to_numpy(zero_copy_only=False)
    keep = npx > 0
    key, npx = key[keep], npx[keep]
    fmt = np.where(key // 256 == 1, "qraw8", "raw8").astype(object)
    return pa.table(
        {
            "fmt": pa.array(fmt, type=pa.string()),
            "value": pa.array(key % 256),
            "n_pixels": pa.array(npx),
        }
    )


ALL_QUERIES["pixel_histogram"] = q_pixel_histogram


def _label_centroid_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(labels, centroid matrix, counts) on the integer lattice — the
    shared distributed reduce behind q_label_centroids (long-form
    output) and q_label_inertia (second pass).  Empty corpus -> three
    empty arrays."""
    from ..stages.ann import _kmeans_quant
    from ..util import collect_table

    ds = src.table_dataset(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.list_(pa.int64())),
                }
            )
        q = _kmeans_quant(batch.column("embedding"))
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        ulab = np.unique(lab)
        idx = np.searchsorted(ulab, lab)
        sums = np.zeros((len(ulab), q.shape[1]), dtype=np.int64)
        np.add.at(sums, idx, q)
        cnt = np.bincount(idx, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(ulab),
                "cnt": pa.array(cnt),
                "sums": pa.array(list(sums), type=pa.list_(pa.int64())),
            }
        )

    tab = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema(
            [("label", pa.int64()), ("cnt", pa.int64()), ("sums", pa.list_(pa.int64()))]
        ),
    )
    if tab.num_rows == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.reshape(0, 0), e
    lab = tab.column("label").to_numpy(zero_copy_only=False)
    cnt = tab.column("cnt").to_numpy(zero_copy_only=False)
    sums_col = tab.column("sums").combine_chunks()
    d = len(sums_col[0])
    srows = pc.list_flatten(sums_col).to_numpy(zero_copy_only=False).reshape(len(tab), d)
    ulab = np.unique(lab)
    idx = np.searchsorted(ulab, lab)
    tot = np.zeros((len(ulab), d), dtype=np.int64)
    np.add.at(tot, idx, srows)
    n = np.zeros(len(ulab), dtype=np.int64)
    np.add.at(n, idx, cnt)
    cent = np.floor(tot.astype(np.float64) / n[:, None]).astype(np.int64)
    return ulab, cent, n


def q_label_centroids(sf_dir: str):
    """Per-label mean embedding on the integer lattice (class
    prototypes for retrieval / distillation): each batch scatter-adds
    its quantized vectors into an O(labels x D) partial — the kmeans
    update-step shape with ground-truth labels — and the driver reduce
    emits floor(sum/n) per (label, dim) in long form (the kmeans oracle
    float convention: FLOOR of the double division)."""
    ulab, cent, n = _label_centroid_matrix(sf_dir)
    d = cent.shape[1]
    return pa.table(
        {
            "label": pa.array(np.repeat(ulab, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ulab))),
            "n_vecs": pa.array(np.repeat(n, d)),
            "centroid_q": pa.array(cent.ravel()),
        }
    )


ALL_QUERIES["label_centroids"] = q_label_centroids


def q_label_inertia(sf_dir: str):
    """Composed cluster-quality metric: per-label inertia (sum of
    squared lattice distances of members to their label centroid) +
    mean.  Pass 1 is the label-centroid reduce; the tiny centroid
    matrix broadcasts back for pass 2's per-batch exact int64 partials
    (the kmeans assign-step shape with fixed assignment).  Everything
    cross-batch is an integer sum."""
    from ..stages.ann import _kmeans_quant
    from ..util import collect_table

    ulab, cents, _ = _label_centroid_matrix(sf_dir)
    ref = ray.put((ulab, cents))

    def partial(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        ul, cm = cached(ref, lambda x: x)
        if batch.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "n_vecs": pa.array([], pa.int64()),
                 "inertia": pa.array([], pa.int64())}
            )
        q = _kmeans_quant(batch.column("embedding"))
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ul, lab)
        diff = q - cm[idx]
        per_row = np.einsum("ij,ij->i", diff, diff)
        iner = np.zeros(len(ul), dtype=np.int64)
        np.add.at(iner, idx, per_row)
        cnt = np.bincount(idx, minlength=len(ul)).astype(np.int64)
        keep = cnt > 0
        return pa.table(
            {
                "label": pa.array(ul[keep]),
                "n_vecs": pa.array(cnt[keep]),
                "inertia": pa.array(iner[keep]),
            }
        )

    ds = src.table_dataset(sf_dir, "embeddings", columns=["label", "embedding"])
    tab = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema(
            [("label", pa.int64()), ("n_vecs", pa.int64()), ("inertia", pa.int64())]
        ),
    )
    lab = tab.column("label").to_numpy(zero_copy_only=False)
    cnt = tab.column("n_vecs").to_numpy(zero_copy_only=False)
    iner = tab.column("inertia").to_numpy(zero_copy_only=False)
    ul2 = np.unique(lab)
    i2 = np.searchsorted(ul2, lab)
    n = np.zeros(len(ul2), dtype=np.int64)
    s = np.zeros(len(ul2), dtype=np.int64)
    np.add.at(n, i2, cnt)
    np.add.at(s, i2, iner)
    return pa.table(
        {
            "label": pa.array(ul2),
            "n_vecs": pa.array(n),
            "inertia": pa.array(s),
            "mean_inertia": pa.array(s // n),
        }
    )


ALL_QUERIES["label_inertia"] = q_label_inertia


def q_grid_hotspots(sf_dir: str):
    """GIS hotspot detection (Getis-Ord-style): 1-degree cell counts
    aggregate distributed (bounded 360x180 grid, combiner tree); the
    3x3 neighborhood sums and the top-k ranking run on the dense grid
    array — 64k ints, driver-trivial at any corpus scale."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        lon = batch.column("centroid_lon").to_numpy(zero_copy_only=False)
        lat = batch.column("centroid_lat").to_numpy(zero_copy_only=False)
        gx = np.floor(lon).astype(np.int64) + 180
        gy = np.floor(lat).astype(np.int64) + 90
        return pa.table({"hkey": pa.array(gx * np.int64(180) + gy)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    grid = np.zeros((362, 182), dtype=np.int64)  # +1 halo each side
    grid[key // 180 + 1, key % 180 + 1] = n
    g9 = sum(
        grid[1 + dx : 361 + dx, 1 + dy : 181 + dy]
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    occupied = grid[1:361, 1:181] > 0
    gx, gy = np.nonzero(occupied)
    mass = g9[gx, gy]
    order = np.lexsort((gy, gx, -mass))[: spec.HOTSPOT_TOPK]
    gx, gy, mass = gx[order], gy[order], mass[order]
    return pa.table(
        {
            "grid_lon": pa.array(gx.astype(np.int64) - 180),
            "grid_lat": pa.array(gy.astype(np.int64) - 90),
            "n_images": pa.array(grid[1:361, 1:181][gx, gy]),
            "g9": pa.array(mass),
            "rank": pa.array(np.arange(1, len(gx) + 1, dtype=np.int64)),
        }
    )


ALL_QUERIES["grid_hotspots"] = q_grid_hotspots


def q_events_transitions(sf_dir: str):
    """Markov transition counts between consecutive event types per
    user (sequence mining): one user-hash exchange, adjacency scan per
    partition, then a tiny (types^2) driver merge of the per-partition
    counts."""
    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    per_part = _pm(parted, lambda g: timeseries.transitions_partition(g.drop_columns(["__part"])))
    from ..util import collect_table

    tab = collect_table(
        per_part,
        schema=pa.schema(
            [("from_type", pa.string()), ("to_type", pa.string()), ("n", pa.int64())]
        ),
    )
    a = np.asarray(tab.column("from_type"), dtype=object)
    b = np.asarray(tab.column("to_type"), dtype=object)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    if len(a) == 0:
        return tab
    order = np.lexsort((b, a))
    a, b, n = a[order], b[order], n[order]
    new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    st = np.flatnonzero(new)
    return pa.table(
        {
            "from_type": pa.array(a[st], type=pa.string()),
            "to_type": pa.array(b[st], type=pa.string()),
            "n": pa.array(np.add.reduceat(n, st)),
        }
    )


ALL_QUERIES["events_transitions"] = q_events_transitions


def q_sat_revisit_pairs(sf_dir: str):
    """Temporal self-join (revisit detection): same-satellite image
    pairs acquired <= 1 h apart.  Banded bucket join: each image emits
    to its (sat, hour) bucket and the next hour's, buckets hash-shuffle
    once, pairs generate bucket-locally with a canonical later-hour
    count rule — the quadratic blowup is bounded per bucket, never
    global (the standard interval-join decomposition)."""
    ev = src.images_dataset(sf_dir).map_batches(
        timeseries.revisit_emit_batch,
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    return _pm(ev, lambda g: timeseries.revisit_pairs_partition(g.drop_columns(["__part"])))


ALL_QUERIES["sat_revisit_pairs"] = q_sat_revisit_pairs


def q_sat_recapture_pairs(sf_dir: str):
    """Spatio-temporal join: revisit pairs whose footprints ALSO
    intersect — true re-capture detection.  Same banded (sat, hour)
    bucket exchange as sat_revisit_pairs; boxes ride the shuffle as
    exact integer millidegrees and refine bucket-locally."""
    from ..util import collect_table

    ev = src.images_dataset(sf_dir).map_batches(
        lambda b: timeseries.revisit_emit_batch(b, with_geom=True),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    pairs = _pm(ev, lambda g: timeseries.revisit_pairs_partition(
            g.drop_columns(["__part"]), require_overlap=True
        ))
    # the refined pair set is output-sized and can be globally EMPTY at
    # small SF — collect with an explicit schema (Ray's empty group
    # blocks are schema-less)
    return collect_table(
        pairs,
        schema=pa.schema(
            [("sat_id", pa.int64()), ("image_a", pa.string()),
             ("image_b", pa.string()), ("dt_us", pa.int64())]
        ),
    )


def q_nation_revenue_share(sf_dir: str):
    """Percent-of-total window: each nation's revenue share in exact
    integer ppm of the global total — the share divides the DRIVER-
    SIZED aggregate, so the 'window over everything' costs nothing
    extra beyond the nation_order_revenue plan."""
    base = q_nation_order_revenue(sf_dir)
    rev = base.column("revenue_cents").to_numpy(zero_copy_only=False)
    total = int(rev.sum())
    # python-int arithmetic: rev * 1e6 would wrap int64 near SF ~10+
    shares = [int(r) * 1_000_000 // total for r in rev.tolist()]
    return base.append_column("share_ppm", pa.array(shares, type=pa.int64()))


ALL_QUERIES["sat_recapture_pairs"] = q_sat_recapture_pairs
ALL_QUERIES["nation_revenue_share"] = q_nation_revenue_share


def q_country_coverage_centroid(sf_dir: str):
    """Spatial-join + moment aggregation: per country, the area-weighted
    centroid of all intersecting footprints (where does each country's
    coverage mass sit?).  The join emits only (lc_id, image_key) pairs;
    the moment sums (area, area*lon, area*lat) stay exact int64 through
    the combiner tree and convert to degrees with ONE mirrored float
    expression at the end."""
    from ..stages.hashagg import tree_count_sum_by_key

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), countries,
        id_col="lc_id", img_cols=("image_key",), emit_image_id=False,
    )

    def moments(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, hw_md = corpus_mod.geom_md_from_keys(ik)
        a = (2 * hw_md) * (2 * hw_md)
        return pa.table(
            {
                "lc_id": batch.column("lc_id"),
                "a_md2": pa.array(a),
                "wx": pa.array(a * lon_md),
                "wy": pa.array(a * lat_md),
            }
        )

    rows = pairs.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_count_sum_by_key(
        rows, "lc_id", sum_cols=("a_md2", "wx", "wy"), count_name="n_images"
    )
    isos = countries.column("iso").to_numpy(zero_copy_only=False)
    got = agg.column("lc_id").to_numpy(zero_copy_only=False)
    wa = agg.column("a_md2").to_numpy(zero_copy_only=False)
    wx = agg.column("wx").to_numpy(zero_copy_only=False)
    wy = agg.column("wy").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "iso": pa.array(isos[got].astype("U"), type=pa.string()),
            "n_images": agg.column("n_images"),
            "area_md2": pa.array(wa),
            "wx": pa.array(wx),
            "wy": pa.array(wy),
            "cx": pa.array((wx.astype(np.float64) / wa) / 1000.0 - spec.LON_OFF),
            "cy": pa.array((wy.astype(np.float64) / wa) / 1000.0 - spec.LAT_OFF),
        }
    )


ALL_QUERIES["country_coverage_centroid"] = q_country_coverage_centroid


def q_top_terms(sf_dir: str):
    """Exact heavy hitters: global top-k terms by count.  Per-batch
    combiner rows -> ONE term-hash exchange (global sums + local top-k
    per partition) -> driver merge of #partitions x k rows.  No vocab
    table transits the driver."""
    from ..util import collect_table

    counted = _docs(sf_dir).map_batches(
        text.term_count_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    per_part = _pm(counted, lambda g: text.term_topk_partition(g.drop_columns(["__part"])))
    tab = collect_table(
        per_part, schema=pa.schema([("term", pa.string()), ("n", pa.int64())])
    )
    t = np.asarray(tab.column("term"), dtype=object)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((t, -n))[: spec.TOP_TERMS_K]
    return pa.table(
        {"term": pa.array(t[order], type=pa.string()), "n": pa.array(n[order])}
    )


ALL_QUERIES["top_terms"] = q_top_terms


def q_cell_pyramid_counts(sf_dir: str):
    """Multi-resolution cell pyramid (the H3 res 5-9 covering of the
    north rule, aggregate form): per-centroid-cell image counts at
    res 5 / 7 / 9 in ONE streaming pass — each image emits one packed
    (res, cx, cy) key per level, the combiner tree reduces all levels
    together.  Cell indexes divide integer millidegrees (edge = 4000 //
    2^(r-5) md), so no float floor can drift from the oracle."""
    from ..stages.hashagg import tree_count_sum_by_key

    LEVELS = (5, 7, 9)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        keys = []
        for r in LEVELS:
            edge = np.int64(4000 // (2 ** (r - 5)))
            cx = lon_md // edge
            cy = lat_md // edge
            assert cx.max(initial=0) < 2048 and cy.max(initial=0) < 1024, (
                "cell index overflows the 11/10-bit key fields"
            )
            keys.append(((np.int64(r) << np.int64(11) | cx) << np.int64(10)) | cy)
        return pa.table({"hkey": pa.array(np.concatenate(keys))})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n_images")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "res": pa.array(key >> np.int64(21)),
            "cell_x": pa.array((key >> np.int64(10)) & np.int64(2047)),
            "cell_y": pa.array(key & np.int64(1023)),
            "n_images": agg.column("n_images"),
        }
    )


ALL_QUERIES["cell_pyramid_counts"] = q_cell_pyramid_counts


def q_ann_ivf_lattice_topk(sf_dir: str):
    """ORACLE-CHECKED approximate ANN: IVF built on the integer-lattice
    k-means centroids (deterministic coarse quantizer), n_probe nearest
    lists per query, exact rounded-cosine re-rank within the probed
    lists.  Unlike the float-kmeans ann_ivf_topk (recall-pytest only),
    every step here — centroid training, assignment, probe selection,
    re-rank — is bit-exactly mirrorable, so the APPROXIMATION itself is
    audited, not just bounded."""
    from ..stages.ann import (
        _emb_matrix, _kmeans_dists, _kmeans_quant, _merge_topk_factory, _norm_rows,
    )
    from ..state.broadcast import cached

    cents = _kmeans_lattice_centroids(sf_dir)
    qtab = _ann_queries_table(sf_dir)
    qid = qtab.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qq = _kmeans_quant(qtab.column("qe"))
    qd = _kmeans_dists(qq, cents)
    order = np.argsort(qd, axis=1, kind="stable")  # ties -> lowest cid
    k_cl = cents.shape[0]
    allowed = np.zeros((len(qid), k_cl), dtype=bool)
    np.put_along_axis(allowed, order[:, : spec.IVF_LAT_PROBE], True, axis=1)
    qm = _emb_matrix(qtab.column("qe"))
    qnorm = _norm_rows(qm)
    ref = ray.put((qid, qm, qnorm, allowed, cents))
    _empty = pa.schema(
        [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("sim", pa.float64())]
    ).empty_table()

    def scan(batch: pa.Table) -> pa.Table:
        qid_b, qm_b, qn_b, allow_b, cents_b = cached(ref, lambda x: x)
        if batch.num_rows == 0:
            return _empty
        emb = _emb_matrix(batch.column("embedding"))
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        enorm = _norm_rows(emb)
        assign = np.argmin(_kmeans_dists(_kmeans_quant(batch.column("embedding")), cents_b), axis=1)
        out_q, out_v, out_s = [], [], []
        for i in range(len(qid_b)):
            sel = np.nonzero(allow_b[i][assign])[0]
            if len(sel) == 0:
                continue
            # score ONLY the probed lists (the LshProbeTopK pattern):
            # ANN_ROUND rounding absorbs the matmul-order difference
            sims = (emb[sel] @ qm_b[i]) / qn_b[i] / enorm[sel]
            sims = np.round(sims, spec.ANN_ROUND)
            o = np.lexsort((vid[sel], -sims))[: spec.ANN_TOPK]
            out_q.append(np.full(len(o), qid_b[i]))
            out_v.append(vid[sel][o])
            out_s.append(sims[o])
        if not out_q:
            return _empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    emb_ds = src.table_dataset(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cand = emb_ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return cand.groupby("query_id").map_groups(
        _merge_topk_factory(spec.ANN_TOPK), batch_format="pyarrow"
    )


ALL_QUERIES["ann_ivf_lattice_topk"] = q_ann_ivf_lattice_topk


def q_split_token_stats(sf_dir: str):
    """Split-balance QC (the sanity report after a dataset split): per
    train/val/test bucket — doc count, total tokens, total chars.  One
    map-only pass emitting 3-row partials, driver reduce; the split
    hash is the shared ST_SPLIT stream, so this audits exactly the
    assignment dataset_split/corpus_clean export."""
    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = corpus_mod._mix(did % np.int64(spec.MOD), spec.ST_SPLIT) % 100
        code = np.where(
            bucket < spec.SPLIT_TRAIN_PCT, 0, np.where(bucket < spec.SPLIT_VAL_PCT, 1, 2)
        )
        ntok = pc.count_substring_regex(batch.column("text"), pattern=r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "code": pa.array(np.arange(3, dtype=np.int64)),
                "n_docs": pa.array(np.bincount(code, minlength=3).astype(np.int64)),
                "n_tokens": pa.array(
                    np.bincount(code, weights=ntok, minlength=3).astype(np.int64)
                ),
                "n_chars": pa.array(
                    np.bincount(code, weights=nch, minlength=3).astype(np.int64)
                ),
            }
        )

    docs = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "text", "n_chars"]
    )
    tab = collect_table(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema(
            [("code", pa.int64()), ("n_docs", pa.int64()),
             ("n_tokens", pa.int64()), ("n_chars", pa.int64())]
        ),
    )
    code = tab.column("code").to_numpy(zero_copy_only=False)
    acc = {c: np.zeros(3, dtype=np.int64) for c in ("n_docs", "n_tokens", "n_chars")}
    for c in acc:
        np.add.at(acc[c], code, tab.column(c).to_numpy(zero_copy_only=False))
    names = np.array(["train", "val", "test"], dtype=object)
    keep = acc["n_docs"] > 0
    return pa.table(
        {
            "split": pa.array(names[keep], type=pa.string()),
            "n_docs": pa.array(acc["n_docs"][keep]),
            "n_tokens": pa.array(acc["n_tokens"][keep]),
            "n_chars": pa.array(acc["n_chars"][keep]),
        }
    )


ALL_QUERIES["split_token_stats"] = q_split_token_stats


def q_docs_pack_bins(sf_dir: str):
    """Concat-then-chunk sequence packing (the standard LLM pretraining
    batching layout): documents concatenate in doc_id order and cut
    every spec.PACK_CAP whitespace tokens; each doc is assigned to the
    bin where it STARTS (bin = exclusive-prefix-token-count // CAP).

    The global prefix sum is two streaming passes over a cheap
    (doc_id, span, n_tokens) derivation (span = doc_id // PACK_SPAN):
    pass 1 tree-reduces per-span token totals (bounded collect — one
    row per span), the driver computes exclusive span offsets and
    broadcasts them; pass 2 hash-exchanges rows by span and each
    partition sorts its spans locally and adds its span offset.  Doc
    text never shuffles; only (doc_id, span, n_tokens) rows do."""
    from ..util import collect_table

    cap = np.int64(spec.PACK_CAP)
    span_w = np.int64(spec.PACK_SPAN)

    def tokens(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch.column("text"), pattern=r"\S+"),
            pa.int64(),
        )
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span": pa.array(d // span_w),
                "n_tokens": n,
            }
        )

    def toks():
        return src.table_dataset(
            sf_dir, "documents", columns=["doc_id", "text"]
        ).map_batches(
            tokens, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    from ..stages.hashagg import tree_count_sum_by_key

    totals = tree_count_sum_by_key(
        toks(), "span", sum_cols=("n_tokens",), count_name="n_docs"
    )
    sp = totals.column("span").to_numpy(zero_copy_only=False)
    tt = totals.column("n_tokens").to_numpy(zero_copy_only=False)
    o = np.argsort(sp, kind="stable")
    sp, tt = sp[o], tt[o]
    offsets = np.concatenate([[0], np.cumsum(tt)[:-1]]) if len(tt) else tt
    ref = ray.put((sp, offsets))

    def pack_group(group: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        sp_s, off_s = cached(ref, lambda t: t)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        nt = group.column("n_tokens").to_numpy(zero_copy_only=False)
        g = group.column("span").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        d, nt, g = d[order], nt[order], g[order]
        # exclusive cumsum with a reset at each span boundary + the
        # span's broadcast global offset
        cum = np.concatenate([[0], np.cumsum(nt)[:-1]]) if len(nt) else nt
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        base = np.repeat(cum[first], np.diff(np.append(np.nonzero(first)[0], len(g))))
        local = cum - base
        start = local + off_s[np.searchsorted(sp_s, g)]
        return pa.table(
            {
                "doc_id": pa.array(d),
                "n_tokens": pa.array(nt),
                "bin_id": pa.array(start // cap),
                "bin_pos": pa.array(start % cap),
            }
        )

    return toks().groupby("span").map_groups(pack_group, batch_format="pyarrow")


ALL_QUERIES["docs_pack_bins"] = q_docs_pack_bins


def q_docs_surprisal(sf_dir: str):
    """Unigram-LM surprisal per document (the CCNet-style quality
    signal, with the corpus itself as the LM): per (doc, term)
    contribution = tf * floor(-ln(cf / total) * 1e6) with cf = corpus
    term count — flooring each contribution to integer micros BEFORE
    the per-doc sum makes the sum order-free (the BM25/tfidf parity
    trick).  Shape: the tfidf exchanges reused verbatim — tf rows
    term-hash-partition (cf is exact and local per partition), score,
    re-key by doc hash, sum.  The term table is never driver-resident;
    the only broadcast is the total-token scalar."""
    from ..util import collect_table, hash_partition

    # scalar total tokens: one cheap streaming partial pass
    def tok_count(batch: pa.Table) -> pa.Table:
        n = pc.sum(
            pc.count_substring_regex(batch.column("text"), pattern=r"\S+")
        ).as_py()
        return pa.table({"n": pa.array([int(n or 0)], type=pa.int64())})

    tot_tab = collect_table(
        src.table_dataset(
            sf_dir, "documents", columns=["text"]
        ).map_batches(
            tok_count, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema([("n", pa.int64())]),
    )
    total = float(pc.sum(tot_tab.column("n")).as_py() or 0)

    tf_rows = _docs(sf_dir).map_batches(
        text.tfidf_tf_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def score_partition(group: pa.Table) -> pa.Table:
        terms = group.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        tf = group.column("tf").to_numpy(zero_copy_only=False)
        cf = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(cf, codes, tf)
        # float expression order mirrors the oracle exactly:
        # FLOOR(-LN(cf / total) * 1e6), then an integer tf multiply
        unit = np.floor(-np.log(cf.astype(np.float64) / total) * 1e6).astype(
            np.int64
        )
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "tf": group.column("tf"),
                "sm": pa.array(tf * unit[codes]),
                "__dpart": pa.array(hash_partition(doc, 64)),
            }
        )

    scored = _pm(
        tf_rows, lambda g: score_partition(g.drop_columns(["__tpart"])), col="__tpart"
    )

    def doc_sum(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        tf = group.column("tf").to_numpy(zero_copy_only=False)
        sm = group.column("sm").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        ds_, tfs, sms = doc[order], tf[order], sm[order]
        uniq, start = np.unique(ds_, return_index=True)
        if len(uniq) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "surprisal_micro": pa.array([], pa.int64()),
                    "mean_micro": pa.array([], pa.int64()),
                }
            )
        n_tok = np.add.reduceat(tfs, start)
        tot_sm = np.add.reduceat(sms, start)
        return pa.table(
            {
                "doc_id": pa.array(uniq),
                "n_tokens": pa.array(n_tok),
                "surprisal_micro": pa.array(tot_sm),
                "mean_micro": pa.array(tot_sm // n_tok),
            }
        )

    return _pm(scored, lambda g: doc_sum(g.drop_columns(["__dpart"])), col="__dpart")


ALL_QUERIES["docs_surprisal"] = q_docs_surprisal


def q_phash_cluster_sizes(sf_dir: str):
    """Dup-cluster size histogram — the standard dedup diagnostic
    (how much mass sits in how-big near-dup clusters).  Per-label
    counts hash-exchange once (never driver-resident); each partition
    emits bounded (cluster_size, n_clusters) partials; the final
    histogram is #distinct-sizes rows."""
    from ..stages import graph
    from ..util import collect_table, hash_partition

    cc = _phash_cc(sf_dir)

    def tag(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False)
        return pa.table(
            {"label": b.column("label"), "__part": pa.array(hash_partition(lab, 64))}
        )

    def size_hist(group: pa.Table) -> pa.Table:
        lab = group.column("label").to_numpy(zero_copy_only=False)
        if len(lab) == 0:
            return pa.table(
                {
                    "cluster_size": pa.array([], pa.int64()),
                    "n_clusters": pa.array([], pa.int64()),
                }
            )
        _, cnt = np.unique(lab, return_counts=True)
        usz, ncl = np.unique(cnt.astype(np.int64), return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(usz),
                "n_clusters": pa.array(ncl.astype(np.int64)),
            }
        )

    partials = collect_table(
        _pm(cc.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), lambda g: size_hist(g.drop_columns(["__part"]))),
        schema=pa.schema([("cluster_size", pa.int64()), ("n_clusters", pa.int64())]),
    )
    sz = partials.column("cluster_size").to_numpy(zero_copy_only=False)
    nc = partials.column("n_clusters").to_numpy(zero_copy_only=False)
    usz, inv = np.unique(sz, return_inverse=True)
    out = np.zeros(len(usz), dtype=np.int64)
    np.add.at(out, inv, nc)
    return pa.table(
        {"cluster_size": pa.array(usz), "n_clusters": pa.array(out)}
    )


ALL_QUERIES["phash_cluster_sizes"] = q_phash_cluster_sizes


def q_simhash_near_dup(sf_dir: str):
    """SimHash near-dup pairs: 4x16-bit band LSH over the 64-bit doc
    signatures (same index layout as the phash image index), candidates
    kept at hamming <= spec.SIMHASH_HAMMING_MAX with the
    lowest-matching-band rule so each pair emits exactly once.  One
    band-hash exchange; the per-partition kernel generates bucket pairs
    with the segmented diagonal machinery (no per-bucket Python).  The
    band-candidacy approximation is part of the op's definition and the
    oracle mirrors it exactly (the phash pattern)."""
    from ..util import hash_partition, popcount64

    def explode_bands(b: pa.Table) -> pa.Table:
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        sig = b.column("simhash").to_numpy(zero_copy_only=False)
        parts_d, parts_s, parts_b = [], [], []
        for band in range(spec.SIMHASH_BANDS):
            val = (sig >> np.int64(16 * band)) & np.int64(0xFFFF)
            parts_b.append(np.int64(band) * np.int64(1 << 16) + val)
            parts_d.append(doc)
            parts_s.append(sig)
        bk = np.concatenate(parts_b)
        return pa.table(
            {
                "band_key": pa.array(bk),
                "doc_id": pa.array(np.concatenate(parts_d)),
                "simhash": pa.array(np.concatenate(parts_s)),
                "__part": pa.array(hash_partition(bk, 64)),
            }
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        bk = group.column("band_key").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        sig = group.column("simhash").to_numpy(zero_copy_only=False)
        if len(bk) == 0:
            return empty
        order = np.lexsort((doc, bk))
        bk, doc, sig = bk[order], doc[order], sig[order]
        newb = np.ones(len(bk), dtype=bool)
        newb[1:] = bk[1:] != bk[:-1]
        starts = np.nonzero(newb)[0]
        bounds = np.append(starts, len(bk))
        counts = np.diff(bounds)
        c_row = np.repeat(counts, counts)
        li = np.arange(len(bk), dtype=np.int64) - np.repeat(starts, counts)
        pcn = c_row - 1 - li
        from ..stages.dedup import LSH_BUCKET_CAP

        # hot-bucket guard (a degenerate band value — e.g. the all-zero
        # band of near-empty docs — would otherwise allocate k^2/2
        # candidate indexes in one shot): hot buckets go through the
        # exact row-tiled path below, nothing is dropped
        hot = c_row > LSH_BUCKET_CAP
        pcn = np.where(hot, 0, pcn)

        def emit(ii: np.ndarray, jj: np.ndarray):
            ham = popcount64(sig[ii] ^ sig[jj])
            keep = ham <= spec.SIMHASH_HAMMING_MAX
            ii, jj, ham = ii[keep], jj[keep], ham[keep]
            if len(ii) == 0:
                return None
            # lowest-matching-band rule: drop a pair here if an earlier
            # band also matches (it emits from that band's bucket)
            band_idx = bk[ii] >> np.int64(16)
            is_min = np.ones(len(ii), dtype=bool)
            for b in range(spec.SIMHASH_BANDS - 1):
                ba = (sig[ii] >> np.int64(16 * b)) & np.int64(0xFFFF)
                bb = (sig[jj] >> np.int64(16 * b)) & np.int64(0xFFFF)
                is_min &= (ba != bb) | (band_idx <= b)
            return ii[is_min], jj[is_min], ham[is_min]

        outs = []
        total = int(pcn.sum())
        if total:
            ii = np.repeat(np.arange(len(bk), dtype=np.int64), pcn)
            cum = np.cumsum(pcn)
            jj = ii + 1 + (
                np.arange(total, dtype=np.int64) - np.repeat(cum - pcn, pcn)
            )
            r = emit(ii, jj)
            if r is not None:
                outs.append(r)
        for s in np.nonzero(counts > LSH_BUCKET_CAP)[0]:
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            c = hi - lo
            for t0 in range(0, c, LSH_BUCKET_CAP):
                t1 = min(t0 + LSH_BUCKET_CAP, c)
                ii, jj = np.nonzero(
                    np.arange(t0, t1)[:, None] < np.arange(c)[None, :]
                )
                r = emit(ii + lo + t0, jj + lo)
                if r is not None:
                    outs.append(r)
        if not outs:
            return empty
        ii = np.concatenate([o[0] for o in outs])
        jj = np.concatenate([o[1] for o in outs])
        ham = np.concatenate([o[2] for o in outs])
        return pa.table(
            {
                "doc_a": pa.array(doc[ii]),
                "doc_b": pa.array(doc[jj]),
                "hamming": pa.array(ham),
            }
        )

    bands = q_simhash_docs(sf_dir).map_batches(
        explode_bands, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(bands, lambda g: partition_pairs(g.drop_columns(["__part"])))


ALL_QUERIES["simhash_near_dup"] = q_simhash_near_dup


def q_country_monthly_coverage(sf_dir: str):
    """Geo-temporal rollup: images per (country, acquisition month) —
    the composed coverage dashboard query (country containment join x
    calendar-month bucket).  The join ships only (country_idx, month
    code) int pairs; month strings and iso labels attach driver-side on
    the bounded aggregate."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..stages.spatial_join import broadcast_spatial_join

    def add_ym(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        hours = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % np.int64(
            spec.TIME_SPAN_HOURS
        )
        ts = np.datetime64(spec.TIME_EPOCH) + hours.astype("timedelta64[h]")
        return batch.append_column(
            "ym", pa.array(ts.astype("datetime64[M]").astype(np.int64))
        )

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    imgs = src.images_dataset(sf_dir, light=True).map_batches(
        add_ym, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    pairs = broadcast_spatial_join(
        imgs, countries, id_col="lc_id", img_cols=("ym",), emit_image_id=False
    )

    def pack(batch: pa.Table) -> pa.Table:
        lc = batch.column("lc_id").to_numpy(zero_copy_only=False)
        ym = batch.column("ym").to_numpy(zero_copy_only=False)
        if len(ym):
            assert 0 <= int(ym.min()) and int(ym.max()) < 1024, (
                "country_monthly_coverage: month index outside [0, 1024) "
                "— widen the packing before extending TIME_EPOCH/SPAN"
            )
        return pa.table({"code": pa.array(lc * np.int64(1024) + ym)})

    counts = tree_count_sum_by_key(
        pairs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "code",
        count_name="total_images",
    )
    code = counts.column("code").to_numpy(zero_copy_only=False)
    isos = countries.column("iso").to_numpy(zero_copy_only=False)
    ym = code % 1024
    return pa.table(
        {
            "iso": pa.array(isos[code // 1024].astype("U"), type=pa.string()),
            "bucket": pa.array(
                [f"{1970 + m // 12}-{m % 12 + 1:02d}" for m in ym],
                type=pa.string(),
            ),
            "total_images": counts.column("total_images"),
        }
    )


ALL_QUERIES["country_monthly_coverage"] = q_country_monthly_coverage


def q_zonal_majority(sf_dir: str):
    """Zonal MAJORITY (the classic raster-vector zonal statistic next
    to zonal_pixel_stats' mean): per land-cover featureclass, the modal
    decoded pixel value over every intersecting image.  Fused
    derive -> per-image 256-bin decoded histogram (one flat bincount
    over the Arrow binary buffer per batch — bytes never leave the
    task) -> broadcast STRtree join -> per-batch (lc, value) partials;
    the exchange carries bounded packed (lc_id*256+value, count) rows
    only; the per-class argmax (ties -> lowest value) is driver-side on
    the #classes x 256 aggregate."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..stages.spatial_join import _Layer, _join_batch
    from ..state.broadcast import cached
    from .pixel_fused import attach_footprints, hist_matrix, per_image

    lc = src.land_cover_table(sf_dir)
    layer_ref = ray.put(lc)

    def derive_hist_join(batch: pa.Table) -> pa.Table:
        # round 5: per-image histograms come packed from the FUSED
        # pixel pass; footprints re-derive from image_key
        hist = hist_matrix(batch)
        imgs = attach_footprints(batch.select(["image_key"])).append_column(
            "__row", pa.array(np.arange(batch.num_rows, dtype=np.int64))
        )
        L = cached(layer_ref, lambda t: _Layer(t, "lc_id"))
        pairs = _join_batch(imgs, L, img_cols=("__row",), emit_image_id=False)
        plc = pairs.column("lc_id").to_numpy(zero_copy_only=False)
        prow = pairs.column("__row").to_numpy(zero_copy_only=False)
        # collapse lc_id -> FEATURECLASS code before summing: the final
        # grouping is per featureclass (a handful), so per-batch partials
        # shrink from (17k lc_ids x 256) ~4.4M rows to (|classes| x 256)
        # ~1k rows — the tree exchange was 95% of this query's wall time
        # when keyed by lc_id.  Per-class sum = sort pairs by class +
        # one contiguous reduceat over the sorted gather (the previous
        # np.add.at fancy-index accumulate is unbuffered and was 60 s
        # on its own at sf0.1).
        pfc = code_of[plc]
        order = np.argsort(pfc, kind="stable")
        ufc, start = np.unique(pfc[order], return_index=True)
        if len(ufc):
            # int32 segment sums are safe: a batch holds <=16384 images
            # x <=4 KB payload < 2^31 pixels even in one segment
            acc = np.add.reduceat(hist[prow[order]], start, axis=0).astype(np.int64)
        else:
            acc = np.zeros((0, 256), dtype=np.int64)
        nz_l, nz_v = np.nonzero(acc)
        return pa.table(
            {
                "code": pa.array(ufc[nz_l] * np.int64(256) + nz_v),
                "n_pixels": pa.array(acc[nz_l, nz_v]),
            }
        )

    ids = lc.column("lc_id").to_numpy(zero_copy_only=False)
    fcs = lc.column("featureclass").to_numpy(zero_copy_only=False)
    classes, lc_code = np.unique(fcs, return_inverse=True)
    code_of = np.zeros(int(ids.max()) + 1, dtype=np.int64)
    code_of[ids] = lc_code

    partials = per_image(sf_dir).map_batches(
        derive_hist_join,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    agg = tree_count_sum_by_key(
        partials, "code", sum_cols=("n_pixels",), count_name="__n"
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    npx = agg.column("n_pixels").to_numpy(zero_copy_only=False)
    cls = code // 256
    val = code % 256
    acc = np.zeros((len(classes), 256), dtype=np.int64)
    acc[cls, val] = npx  # (cls, val) pairs are unique post-aggregate
    nz = acc.sum(axis=1) > 0
    mode = np.argmax(acc, axis=1)  # first max -> lowest value on ties
    return pa.table(
        {
            "featureclass": pa.array(classes[nz].astype("U"), type=pa.string()),
            "mode_value": pa.array(mode[nz].astype(np.int64)),
            "n_pixels": pa.array(acc[np.arange(len(classes)), mode][nz]),
        }
    )


ALL_QUERIES["zonal_majority"] = q_zonal_majority


def q_split_leakage(sf_dir: str):
    """Cross-split contamination audit: NEAR-duplicate document pairs
    (MinHash est_jaccard >= 0.5, the docs_dedup_near threshold) that
    landed in different train/val/test splits — the leakage check every
    dataset release needs.  Map-only over the near-dup pair stream:
    each pair's splits derive from the doc ids (the ST_SPLIT hash — no
    join back to the docs), partials are bounded (6 rows per batch),
    the final rollup is driver-trivial."""
    from ..util import collect_table

    NAMES = np.array(["test", "train", "val"], dtype="U")

    def split_of(ids: np.ndarray) -> np.ndarray:
        b = corpus_mod._mix(ids % np.int64(spec.MOD), spec.ST_SPLIT) % 100
        # codes in NAMES (lexicographic) order: 0=test, 1=train, 2=val
        return np.where(
            b < spec.SPLIT_TRAIN_PCT, 1, np.where(b < spec.SPLIT_VAL_PCT, 2, 0)
        )

    def leak_partial(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("est_jaccard"), 0.5)
        batch = batch.filter(keep)
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        sa, sb = split_of(da), split_of(db)
        lo, hi = np.minimum(sa, sb), np.maximum(sa, sb)
        out = np.zeros((3, 3), dtype=np.int64)
        np.add.at(out, (lo, hi), 1)
        ai, bi = np.nonzero(out)
        return pa.table(
            {
                "split_a": pa.array(NAMES[ai].astype("U"), type=pa.string()),
                "split_b": pa.array(NAMES[bi].astype("U"), type=pa.string()),
                "n_pairs": pa.array(out[ai, bi]),
            }
        )

    partials = collect_table(
        q_minhash_lsh_dups(sf_dir).map_batches(
            leak_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema(
            [("split_a", pa.string()), ("split_b", pa.string()), ("n_pairs", pa.int64())]
        ),
    )
    import pandas as pd

    df = (
        partials.to_pandas()
        .groupby(["split_a", "split_b"], as_index=False)["n_pairs"]
        .sum()
    )
    return pa.Table.from_pandas(df, preserve_index=False)


ALL_QUERIES["split_leakage"] = q_split_leakage


def q_sat_track_stats(sf_dir: str):
    """Per-satellite TRACK statistics (trajectory construction): order
    each satellite's acquisitions by time, measure consecutive legs —
    leg count, max revisit gap (hours), max/total squared ground
    distance (exact integer md²).  One sat-hash exchange; each
    partition handles ALL its satellites with one lexsort + segment
    diffs (no per-sat Python).  Satellites with a single image have no
    legs and drop (mirrors the oracle's inner join)."""
    from ..util import collect_table, hash_partition

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % np.int64(
            spec.TIME_SPAN_HOURS
        )
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        return pa.table(
            {
                "sat": pa.array(sat),
                "key": pa.array(ik),
                "t": pa.array(t),
                "x": pa.array(lon_md),
                "y": pa.array(lat_md),
                "__part": pa.array(hash_partition(sat, 64)),
            }
        )

    def track_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sat_id": pa.array([], pa.int64()),
                "n_images": pa.array([], pa.int64()),
                "n_legs": pa.array([], pa.int64()),
                "max_gap_hours": pa.array([], pa.int64()),
                "max_leg_md2": pa.array([], pa.int64()),
                "sum_leg_md2": pa.array([], pa.int64()),
            }
        )
        sat = group.column("sat").to_numpy(zero_copy_only=False)
        if len(sat) == 0:
            return empty
        key = group.column("key").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, t, sat))
        sat, t, x, y = sat[order], t[order], x[order], y[order]
        newsat = np.ones(len(sat), dtype=bool)
        newsat[1:] = sat[1:] != sat[:-1]
        starts = np.nonzero(newsat)[0]
        n_img = np.diff(np.append(starts, len(sat)))
        # legs = consecutive-row diffs WITHIN a satellite segment
        dt = np.diff(t)
        dx, dy = np.diff(x), np.diff(y)
        d2 = dx * dx + dy * dy
        leg = np.ones(len(dt), dtype=bool)
        leg[starts[1:] - 1] = False  # boundary diffs cross satellites
        keep = n_img >= 2
        if not keep.any():
            return empty
        # per-segment reductions over the leg mask
        seg_of_leg = np.cumsum(newsat)[:-1] - 1  # segment index per diff row
        nseg = len(starts)
        max_gap = np.full(nseg, -1, dtype=np.int64)
        max_d2 = np.full(nseg, -1, dtype=np.int64)
        sum_d2 = np.zeros(nseg, dtype=np.int64)
        np.maximum.at(max_gap, seg_of_leg[leg], dt[leg])
        np.maximum.at(max_d2, seg_of_leg[leg], d2[leg])
        np.add.at(sum_d2, seg_of_leg[leg], d2[leg])
        return pa.table(
            {
                "sat_id": pa.array(sat[starts][keep]),
                "n_images": pa.array(n_img[keep]),
                "n_legs": pa.array((n_img - 1)[keep]),
                "max_gap_hours": pa.array(max_gap[keep]),
                "max_leg_md2": pa.array(max_d2[keep]),
                "sum_leg_md2": pa.array(sum_d2[keep]),
            }
        )

    rows = src.images_dataset(sf_dir, light=True).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(rows, lambda g: track_partition(g.drop_columns(["__part"])))


ALL_QUERIES["sat_track_stats"] = q_sat_track_stats


def q_cloud_percent_rank(sf_dir: str):
    """Feature normalization at scale: each image's exact PERCENT_RANK
    of its cloud level, as integer ppm — n_less * 1e6 // (N-1) where
    n_less counts strictly-lower levels.  The rank table is NOT a
    global sort: cloud levels are bounded (1001 values), so one bounded
    histogram exchange + a broadcast prefix turns ranking into a
    map-only pass (the percentile-normalization shape for any
    discretized feature at 100 TB)."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..state.broadcast import cached

    def levels(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lv = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table({"lv": pa.array(lv)})

    hist = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            levels, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "lv",
        count_name="c",
    )
    lvs = hist.column("lv").to_numpy(zero_copy_only=False)
    cs = hist.column("c").to_numpy(zero_copy_only=False)
    full = np.zeros(1001, dtype=np.int64)
    full[lvs] = cs
    n_less = np.concatenate([[0], np.cumsum(full)[:-1]])
    n_total = int(full.sum())
    ref = ray.put((n_less, max(n_total - 1, 1)))

    def rank_batch(batch: pa.Table) -> pa.Table:
        nl, denom = cached(ref, lambda t: t)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lv = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "cloud_md": pa.array(lv),
                "pct_ppm": pa.array(nl[lv] * np.int64(1_000_000) // np.int64(denom)),
            }
        )

    return src.images_dataset(sf_dir, light=True).map_batches(
        rank_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["cloud_percent_rank"] = q_cloud_percent_rank


def q_docs_shuffled_page(sf_dir: str):
    """Deterministic global shuffle for training export: every doc gets
    a hash rank (spec.ST_SHUFFLE) and the first spec.SHUFFLE_PAGE_K of
    the shuffled order are returned with positions — a reproducible
    shuffle whose page is a distributed TOP-K (per-batch partial top-k,
    bounded collect), identical on any cluster size or shard layout."""
    from ..util import collect_table

    K = spec.SHUFFLE_PAGE_K

    def topk_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        r = corpus_mod._mix(ids % np.int64(spec.MOD), spec.ST_SHUFFLE)
        if len(ids) > K:
            sel = np.lexsort((ids, r))[:K]
            ids, r = ids[sel], r[sel]
        return pa.table({"doc_id": pa.array(ids), "rank": pa.array(r)})

    part = collect_table(
        src.table_dataset(sf_dir, "documents", columns=["doc_id"]).map_batches(
            topk_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        schema=pa.schema([("doc_id", pa.int64()), ("rank", pa.int64())]),
    )
    ids = part.column("doc_id").to_numpy(zero_copy_only=False)
    r = part.column("rank").to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, r))[:K]
    return pa.table(
        {
            "pos": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[sel]),
            "rank": pa.array(r[sel]),
        }
    )


ALL_QUERIES["docs_shuffled_page"] = q_docs_shuffled_page


def q_country_revisit_gap(sf_dir: str):
    """Coverage-freshness audit: per country, the LONGEST gap (hours)
    between consecutive acquisitions intersecting it.  Broadcast
    containment join ships (country_idx, hour) int pairs only; a
    country-keyed exchange sorts each country's hours once and takes
    the max diff (gaps between equal timestamps are zero whatever the
    tie order, so the result is order-deterministic)."""
    from ..stages.spatial_join import broadcast_spatial_join
    from ..util import collect_table

    def add_hours(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        t = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % np.int64(
            spec.TIME_SPAN_HOURS
        )
        return batch.append_column("t", pa.array(t))

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    imgs = src.images_dataset(sf_dir, light=True).map_batches(
        add_hours, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    pairs = broadcast_spatial_join(
        imgs, countries, id_col="lc_id", img_cols=("t",), emit_image_id=False
    )

    def gap_group(group: pa.Table) -> pa.Table:
        cid = int(group.column("lc_id")[0].as_py())
        t = np.sort(group.column("t").to_numpy(zero_copy_only=False))
        gap = int(np.diff(t).max()) if len(t) >= 2 else None
        return pa.table(
            {
                "lc_id": pa.array([cid], type=pa.int64()),
                "n_images": pa.array([len(t)], type=pa.int64()),
                "max_gap_hours": pa.array([gap], type=pa.int64()),
            }
        )

    agg = collect_table(
        pairs.groupby("lc_id").map_groups(gap_group, batch_format="pyarrow"),
        schema=pa.schema(
            [("lc_id", pa.int64()), ("n_images", pa.int64()), ("max_gap_hours", pa.int64())]
        ),
    )
    isos = countries.column("iso").to_numpy(zero_copy_only=False)
    got = agg.column("lc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "iso": pa.array(isos[got].astype("U"), type=pa.string()),
            "n_images": agg.column("n_images"),
            "max_gap_hours": agg.column("max_gap_hours"),
        }
    )


ALL_QUERIES["country_revisit_gap"] = q_country_revisit_gap


def q_corpus_release(sf_dir: str):
    """THE composed training-data release pipeline, end to end:
    benchmark decontamination -> quality gate -> language ID -> exact
    dedup (one content-hash exchange, all via the shared
    _corpus_survivors) -> NEAR-dup removal (minhash clusters at
    est_jaccard >= 0.5, the docs_dedup_near rule, size-gated through
    stages/dedup_finalize) -> deterministic split -> per-split
    concat-then-chunk sequence packing.  Output: the release manifest
    (doc_id, pred_lang, split, n_tokens, bin_id).

    Scale shape: doc text is read once and never shuffles; every
    exchange carries fixed-width rows; the release set (narrow
    metadata, far smaller than the corpus) is materialized ONCE so the
    two packing passes don't recompute the cleaning chain; packing's
    global per-split prefix is bounded span totals + broadcast offsets
    (the docs_pack_bins machinery)."""
    from ..stages import dedup_finalize as dfz
    from ..stages import graph
    from ..util import collect_table, sorted_isin

    docs = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "text"]
    )
    surv = _corpus_survivors_for(sf_dir)

    # near-dup drop set: same pairs + keeper rule as docs_dedup_near
    pairs = q_minhash_lsh_dups(sf_dir).map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("est_jaccard"), 0.5)
        ).select(["doc_a", "doc_b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    cc_ds = graph.connected_components(pairs, "doc_a", "doc_b")

    LANGS = np.asarray(sorted(spec.LANG_PRIORITY + ["und"]), dtype=object)
    SPLITS = np.asarray(["test", "train", "val"], dtype=object)
    lang_set = pa.array(list(LANGS), type=pa.string())
    split_set = pa.array(list(SPLITS), type=pa.string())

    def encode(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang_c": pc.cast(
                    pc.index_in(b.column("pred_lang"), value_set=lang_set),
                    pa.int64(),
                ),
                "split_c": pc.cast(
                    pc.index_in(b.column("split"), value_set=split_set), pa.int64()
                ),
                "n_tokens": b.column("n_tokens"),
            }
        )

    enc = surv.map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    if cc_ds.count() > dfz.DRIVER_THRESHOLD:
        rel = dfz.anti_join_keys(
            enc,
            "doc_id",
            ("lang_c", "split_c", "n_tokens"),
            dfz.drop_non_min_members(cc_ds),
        )
    else:
        cc = collect_table(
            cc_ds, schema=pa.schema([("node", pa.int64()), ("label", pa.int64())])
        )
        node = cc.column("node").to_numpy(zero_copy_only=False)
        label = cc.column("label").to_numpy(zero_copy_only=False)
        drop = np.sort(node[node != label])
        dref = ray.put(drop)

        def flt(b: pa.Table) -> pa.Table:
            from ..state.broadcast import cached

            d = cached(dref, lambda t: t)
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(~sorted_isin(d, ids)))

        rel = enc.map_batches(
            flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    # fixed-width release set, materialized once for the two pack passes
    rel = rel.materialize()

    cap = np.int64(spec.PACK_CAP)
    span_w = np.int64(spec.PACK_SPAN)

    def with_gkey(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        sc = b.column("split_c").to_numpy(zero_copy_only=False)
        return b.append_column("gkey", pa.array((d // span_w) * np.int64(4) + sc))

    keyed = rel.map_batches(
        with_gkey, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    from ..stages.hashagg import tree_count_sum_by_key

    totals = tree_count_sum_by_key(
        keyed, "gkey", sum_cols=("n_tokens",), count_name="__n"
    )
    gk = totals.column("gkey").to_numpy(zero_copy_only=False)
    tt = totals.column("n_tokens").to_numpy(zero_copy_only=False)
    # exclusive prefix per SPLIT over ascending (span, split) group keys
    offs = np.zeros(len(gk), dtype=np.int64)
    o = np.argsort(gk, kind="stable")
    gk_s, tt_s = gk[o], tt[o]
    for s in range(3):
        m = gk_s % 4 == s
        c = tt_s[m]
        offs_s = np.concatenate([[0], np.cumsum(c)[:-1]]) if len(c) else c
        offs[o[m]] = offs_s
    ref = ray.put((np.sort(gk), offs[np.argsort(gk, kind="stable")]))

    def pack_group(group: pa.Table) -> pa.Table:
        from ..state.broadcast import cached

        gk_b, off_b = cached(ref, lambda t: t)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        nt = group.column("n_tokens").to_numpy(zero_copy_only=False)
        g = group.column("gkey").to_numpy(zero_copy_only=False)
        lc = group.column("lang_c").to_numpy(zero_copy_only=False)
        sc = group.column("split_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        d, nt, g, lc, sc = d[order], nt[order], g[order], lc[order], sc[order]
        cum = np.concatenate([[0], np.cumsum(nt)[:-1]]) if len(nt) else nt
        first = np.ones(len(g), dtype=bool)
        first[1:] = g[1:] != g[:-1]
        base = np.repeat(
            cum[first], np.diff(np.append(np.nonzero(first)[0], len(g)))
        )
        start = cum - base + off_b[np.searchsorted(gk_b, g)]
        return pa.table(
            {
                "doc_id": pa.array(d),
                "pred_lang": pa.array(LANGS[lc], type=pa.string()),
                "split": pa.array(SPLITS[sc], type=pa.string()),
                "n_tokens": pa.array(nt),
                "bin_id": pa.array(start // cap),
            }
        )

    return keyed.groupby("gkey").map_groups(pack_group, batch_format="pyarrow")


ALL_QUERIES["corpus_release"] = q_corpus_release


def q_country_overlap_area(sf_dir: str):
    """Areal interpolation (the classic GIS overlap-weighting step):
    per country, the EXACT total intersection area between the country
    box and every intersecting image footprint, in integer md² — plus
    the covered-area ratio.  The 25-row country table broadcasts as
    bare int arrays; each batch computes the 25 x batch overlap matrix
    vectorized and emits 25-row partials, so the exchange is bounded by
    #countries whatever the corpus size.

    Boundary note: this op joins in EXACT integer millidegrees, so an
    exact-touch pair (image edge == country edge) always counts (with
    zero area).  country_image_counts joins in the float-degree frame,
    where the same touch can fall a ulp either way — its n_images may
    differ by ±1 on such pairs (measured: one pair at sf0.01).  Each
    query is bit-consistent with its own oracle."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..state.broadcast import cached

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    # image lon_md/lat_md are UNSHIFTED (0..SPAN); keep the country
    # bounds in the same frame (no -170000/-66000 offset)
    cx0 = (nk % spec.CTRY_NX) * spec.CTRY_W_MD
    cy0 = (nk // spec.CTRY_NX) * spec.CTRY_H_MD
    ref = ray.put((cx0, cx0 + spec.CTRY_W_MD, cy0, cy0 + spec.CTRY_H_MD))

    def partial(batch: pa.Table) -> pa.Table:
        bx0, bx1, by0, by1 = cached(ref, lambda t: t)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon, lat, hw = corpus_mod.geom_md_from_keys(ik)
        ix0, ix1 = lon - hw, lon + hw
        iy0, iy1 = lat - hw, lat + hw
        k = len(bx0)
        n = np.zeros(k, dtype=np.int64)
        a = np.zeros(k, dtype=np.int64)
        for c in range(k):
            m = (ix0 <= bx1[c]) & (bx0[c] <= ix1) & (iy0 <= by1[c]) & (by0[c] <= iy1)
            if not m.any():
                continue
            iw = np.minimum(ix1[m], bx1[c]) - np.maximum(ix0[m], bx0[c])
            ih = np.minimum(iy1[m], by1[c]) - np.maximum(iy0[m], by0[c])
            n[c] = int(m.sum())
            a[c] = int((iw * ih).sum())
        nz = n > 0
        return pa.table(
            {
                "cid": pa.array(np.nonzero(nz)[0].astype(np.int64)),
                "n_images": pa.array(n[nz]),
                "overlap_md2": pa.array(a[nz]),
            }
        )

    agg = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "cid",
        sum_cols=("n_images", "overlap_md2"),
        count_name="__n",
    )
    cid = agg.column("cid").to_numpy(zero_copy_only=False)
    isos = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    ov = agg.column("overlap_md2").to_numpy(zero_copy_only=False)
    ctry_area = float(spec.CTRY_W_MD * spec.CTRY_H_MD)
    return pa.table(
        {
            "iso": pa.array(isos[cid], type=pa.string()),
            "n_images": agg.column("n_images"),
            "overlap_md2": pa.array(ov),
            # single double division mirrors the oracle expression
            "overlap_ratio": pa.array(ov.astype(np.float64) / ctry_area),
        }
    )


ALL_QUERIES["country_overlap_area"] = q_country_overlap_area


def q_image_density(sf_dir: str):
    """Spatial self-join DENSITY (the KDE-lite hotspot primitive): for
    every image, how many other images' centroids fall within
    spec.DENSITY_RADIUS_MD on both axes (exact integer Chebyshev box).
    Grid-bucketed self-join: cells of radius width, every image is a
    POINT in its own cell and a PROBE into its 3x3 neighborhood, one
    cell-hash exchange, per-cell candidates via the segmented
    cross-product — pair work scales with LOCAL density, never
    all-pairs.  Duplicate corpus keys dedup first (identical rows would
    double-count pairs); self-pairs are excluded by key."""
    from ..util import hash_partition

    R = np.int64(spec.DENSITY_RADIUS_MD)
    STRIDE = np.int64(1024)

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        x, y, _ = corpus_mod.geom_md_from_keys(ik)
        cx, cy = x // R, y // R
        parts_c, parts_k, parts_x, parts_y, parts_t = [], [], [], [], []
        # point row (kind 0) in its own cell, probe rows (kind 1) into
        # the 3x3 neighborhood
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                c = (cx + dx) * STRIDE + (cy + dy)
                parts_c.append(c)
                parts_k.append(ik)
                parts_x.append(x)
                parts_y.append(y)
                kind = np.full(len(ik), 1, np.int8)
                if dx == 0 and dy == 0:
                    kind = np.zeros(len(ik), np.int8)
                parts_t.append(kind)
        # own-cell probes: the dx==dy==0 rows double as point AND probe
        c = np.concatenate(parts_c)
        return pa.table(
            {
                "cell": pa.array(c),
                "key": pa.array(np.concatenate(parts_k)),
                "x": pa.array(np.concatenate(parts_x)),
                "y": pa.array(np.concatenate(parts_y)),
                "kind": pa.array(np.concatenate(parts_t)),
                "__part": pa.array(hash_partition(c, 64)),
            }
        )

    def count_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
        )
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        if len(cell) == 0:
            return empty
        # dedup identical corpus rows (same key -> same everything):
        # keep one copy per (cell, key, kind)
        order = np.lexsort((kind, key, cell))
        cell, key, x, y, kind = (
            cell[order], key[order], x[order], y[order], kind[order]
        )
        first = np.ones(len(cell), dtype=bool)
        first[1:] = (
            (cell[1:] != cell[:-1]) | (key[1:] != key[:-1]) | (kind[1:] != kind[:-1])
        )
        cell, key, x, y, kind = (
            cell[first], key[first], x[first], y[first], kind[first]
        )
        # the own-cell row is a point (kind 0) that must ALSO probe its
        # own cell: treat kind 0 as both; probes = all rows, points =
        # kind 0 rows
        is_pt = kind == 0
        # segment bounds per cell over the point subset and all rows
        # candidates: for each row r (probe), all points in r's cell
        pcell, pkey, px, py = cell[is_pt], key[is_pt], x[is_pt], y[is_pt]
        if len(pcell) == 0:
            return empty
        # counts of points per cell aligned to every row via searchsorted
        pstart = np.searchsorted(pcell, cell, side="left")
        pend = np.searchsorted(pcell, cell, side="right")
        cnt = pend - pstart
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        qi = np.repeat(np.arange(len(cell), dtype=np.int64), cnt)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        pi = np.repeat(pstart, cnt) + within
        ok = (
            (np.abs(x[qi] - px[pi]) <= R)
            & (np.abs(y[qi] - py[pi]) <= R)
            & (key[qi] != pkey[pi])
        )
        qk = key[qi][ok]
        uk, n = np.unique(qk, return_counts=True)
        return pa.table(
            {"key": pa.array(uk), "n_partial": pa.array(n.astype(np.int64))}
        )

    from ..stages.hashagg import tree_count_sum_by_key

    parts = (
        _pm(src.images_dataset(sf_dir, light=True)
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), lambda g: count_partition(g.drop_columns(["__part"])))
    )
    agg = tree_count_sum_by_key(
        parts, "key", sum_cols=("n_partial",), count_name="__n"
    )
    k = agg.column("key").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "image_id": pc.binary_join_element_wise(
                "img-", pc.cast(pa.array(k), pa.string()), ""
            ),
            "n_neighbors": agg.column("n_partial"),
        }
    )


ALL_QUERIES["image_density"] = q_image_density


# --- round-4 continuation: graph analytics, windowed ranks, robust stats ---


def q_image_triangles(sf_dir: str):
    """Per-image TRIANGLE counts on the phash near-dup graph — the
    cohesion/community primitive over a duplicate graph (how clique-like
    is each re-capture cluster).  Degree-ordered orientation (the
    Schank-Wagner / Latapy counting scheme): every edge points from its
    lower-(degree, key) endpoint to the higher one, so each triangle is
    closed exactly once, at its lowest-rank vertex, and per-source
    out-neighborhoods stay O(sqrt(m)) even under power-law skew —
    never an all-pairs pass.  All exchanges carry fixed-width int rows
    and are GRAPH-sized (pair table), not corpus-sized: degree count
    (1), two PK lookup-joins to attach endpoint degrees (2-3), a
    source-key exchange that emits wedges (4), a pair-hash exchange
    that verifies wedges against the oriented edge set via a tagged
    union (5), and the final per-node count (6)."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import count_sum_by_key
    from ..util import hash_partition, sorted_isin

    P = 64

    # the pair stream fans out to THREE consumers (degree count, the
    # lookup-join stream side, the oriented edge set) — materialize the
    # graph-sized tables ONCE so the corpus-wide pair derivation never
    # re-executes per consumer (pairs are output-sized: ~24 B/edge)
    edges = _phash_pair_keys(sf_dir).map_batches(
        lambda b: b.rename_columns(["a", "b"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    ).materialize()

    def both_ends(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, bb]))})

    deg = count_sum_by_key(
        edges.map_batches(
            both_ends, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "node",
        count_name="deg",
        num_partitions=P,
    ).materialize()  # consumed by both degree-attach paths

    def _orient_cols(a, b, da, db):
        fwd = (da < db) | ((da == db) & (a < b))
        u = np.where(fwd, a, b)
        v = np.where(fwd, b, a)
        dv = np.where(fwd, db, da)
        return pa.table(
            {
                "u": pa.array(u),
                "v": pa.array(v),
                "dv": pa.array(dv),
                "__part": pa.array(hash_partition(u, P)),
            }
        )

    # degree attach is size-gated like the dedup-arc finalizers
    # (stages/dedup_finalize.py): the degree table is NODE-count-sized
    # (16 B/node); below the gate it broadcasts once and orientation is
    # map-only, above it the two PK lookup-joins co-partition edge and
    # degree rows so nothing is ever driver-resident
    if deg.count() <= TRI_DEG_BROADCAST_MAX:
        from ..state.broadcast import cached
        from ..util import collect_table

        dt = collect_table(
            deg, schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())])
        )
        nodes = dt.column("node").to_numpy(zero_copy_only=False)
        degs = dt.column("deg").to_numpy(zero_copy_only=False)
        o = np.argsort(nodes, kind="stable")
        ref = ray.put((nodes[o], degs[o]))

        def orient_bcast(t: pa.Table) -> pa.Table:
            ns, ds = cached(ref, lambda x: x)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            return _orient_cols(a, b, ds[np.searchsorted(ns, a)], ds[np.searchsorted(ns, b)])

        oriented = edges.map_batches(
            orient_bcast, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()  # consumed by the wedge pass AND the edge tagger
    else:
        with_da = lookup_join(
            edges, key_col="a", payload_cols=("b",), table=deg,
            table_key="node", table_val="deg", out_val="deg_a", num_partitions=P,
        )
        with_db = lookup_join(
            with_da, key_col="b", payload_cols=("a", "deg_a"), table=deg,
            table_key="node", table_val="deg", out_val="deg_b", num_partitions=P,
        )

        def orient(t: pa.Table) -> pa.Table:
            return _orient_cols(
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
                t.column("deg_a").to_numpy(zero_copy_only=False),
                t.column("deg_b").to_numpy(zero_copy_only=False),
            )

        oriented = with_db.map_batches(
            orient, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()

    _PAIR_MIX = np.uint64(0x9E3779B97F4A7C15).astype(np.int64)

    def pair_part(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return hash_partition(x * _PAIR_MIX + y, P)

    _WEDGE_SCHEMA = pa.schema(
        [("x", pa.int64()), ("y", pa.int64()), ("apex", pa.int64()),
         ("__kind", pa.int8()), ("__part", pa.int64())]
    )

    def wedges(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if len(u) == 0:
            return _WEDGE_SCHEMA.empty_table()
        v = group.column("v").to_numpy(zero_copy_only=False)
        dv = group.column("dv").to_numpy(zero_copy_only=False)
        # per-source out-neighbors sorted by the SAME (deg, key) rank
        # used to orient edges, so wedge (x, y) always has rank(x) <
        # rank(y) and the closing edge is exactly the oriented (x -> y)
        order = np.lexsort((v, dv, u))
        u, v, dv = u[order], v[order], dv[order]
        new_seg = np.ones(len(u), dtype=bool)
        new_seg[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_seg) - 1
        counts = np.bincount(seg)
        xs, ys, ap = [], [], []
        for d in range(1, int(counts.max())):
            m = seg[d:] == seg[:-d]
            j = np.nonzero(m)[0]
            if len(j):
                xs.append(v[j])
                ys.append(v[j + d])
                ap.append(u[j])
        if not xs:
            return _WEDGE_SCHEMA.empty_table()
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        apex = np.concatenate(ap)
        return pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "apex": pa.array(apex),
                "__kind": pa.array(np.ones(len(x), np.int8)),
                "__part": pa.array(pair_part(x, y)),
            }
        )

    wedge_ds = _pm(oriented, lambda g: wedges(g.drop_columns(["__part"])))

    def tag_edges(t: pa.Table) -> pa.Table:
        x = t.column("u").to_numpy(zero_copy_only=False)
        y = t.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": pa.array(x),
                "y": pa.array(y),
                "apex": pa.array(np.zeros(len(x), np.int64)),
                "__kind": pa.array(np.zeros(len(x), np.int8)),
                "__part": pa.array(pair_part(x, y)),
            }
        )

    tagged = wedge_ds.union(
        oriented.map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def close_partition(group: pa.Table) -> pa.Table:
        kind = group.column("__kind").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        apex = group.column("apex").to_numpy(zero_copy_only=False)
        is_e = kind == 0
        # local-densify endpoints so a pair packs into ONE int64 code
        uniq = np.unique(np.concatenate([x, y]))
        code = np.searchsorted(uniq, x) * np.int64(len(uniq)) + np.searchsorted(uniq, y)
        ecode = np.sort(code[is_e])
        m = sorted_isin(ecode, code[~is_e])
        wx, wy, wa = x[~is_e][m], y[~is_e][m], apex[~is_e][m]
        # partial per-node counts BEFORE the final exchange (3 rows per
        # triangle -> <= unique nodes per partition)
        node = np.concatenate([wa, wx, wy])
        uniq, cnt = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(uniq), "n_partial": pa.array(cnt.astype(np.int64))})

    tri_nodes = _pm(tagged, close_partition)
    counts = count_sum_by_key(
        tri_nodes, "node", sum_cols=("n_partial",), count_name="__n", num_partitions=P
    )

    def finish(b: pa.Table) -> pa.Table:
        k = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(pa.array(k), pa.string()), ""
                ),
                "n_triangles": b.column("n_partial"),
            }
        )

    return counts.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


TRI_DEG_BROADCAST_MAX = 10_000_000  # same gate as graph.py / dedup_finalize


ALL_QUERIES["image_triangles"] = q_image_triangles


def q_sat_area_quartiles(sf_dir: str):
    """Exact NTILE(4) windowing per satellite over footprint size: each
    satellite's images rank by (hw_md, key) and split into 4 SQL-NTILE
    buckets (first n%4 buckets get the extra row); output is the
    per-(satellite, quartile) image count and exact integer footprint
    area (4*hw_md^2 summed).  ONE satellite-hash exchange; every
    partition ranks ALL its satellites with one lexsort + segment
    arithmetic — the same all-groups-per-partition shape as
    sat_track_stats (assumes one satellite's rows fit a partition,
    documented there)."""
    from ..util import hash_partition

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        _, _, hw = corpus_mod.geom_md_from_keys(ik)
        return pa.table(
            {
                "sat": pa.array(sat),
                "key": pa.array(ik),
                "hw": pa.array(hw),
                "__part": pa.array(hash_partition(sat, 64)),
            }
        )

    def ntile_partition(group: pa.Table) -> pa.Table:
        sat = group.column("sat").to_numpy(zero_copy_only=False)
        if len(sat) == 0:
            return pa.table(
                {
                    "sat_id": pa.array([], pa.int64()),
                    "quartile": pa.array([], pa.int64()),
                    "n_images": pa.array([], pa.int64()),
                    "area_md2": pa.array([], pa.int64()),
                }
            )
        key = group.column("key").to_numpy(zero_copy_only=False)
        hw = group.column("hw").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, hw, sat))
        sat, key, hw = sat[order], key[order], hw[order]
        new_seg = np.ones(len(sat), dtype=bool)
        new_seg[1:] = sat[1:] != sat[:-1]
        starts = np.nonzero(new_seg)[0]
        counts = np.diff(np.append(starts, len(sat)))
        n_row = np.repeat(counts, counts)
        r = np.arange(len(sat), dtype=np.int64) - np.repeat(starts, counts)
        base = n_row // 4
        extra = n_row % 4
        cut = extra * (base + 1)
        big = r < cut  # rows in the (base+1)-sized leading buckets
        q = np.where(
            big,
            r // (base + 1),
            extra + (r - cut) // np.maximum(base, 1),
        ) + 1
        area = 4 * hw * hw
        code = sat * np.int64(8) + q
        o2 = np.argsort(code, kind="stable")
        code_s, area_s = code[o2], area[o2]
        uniq, start = np.unique(code_s, return_index=True)
        cnt = np.diff(np.append(start, len(code_s)))
        return pa.table(
            {
                "sat_id": pa.array(uniq // 8),
                "quartile": pa.array(uniq % 8),
                "n_images": pa.array(cnt.astype(np.int64)),
                "area_md2": pa.array(np.add.reduceat(area_s, start)),
            }
        )

    rows = src.images_dataset(sf_dir, light=True).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(rows, lambda g: ntile_partition(g.drop_columns(["__part"])))


ALL_QUERIES["sat_area_quartiles"] = q_sat_area_quartiles


def q_sat_cloud_winsorized(sf_dir: str):
    """Robust per-group statistics: per satellite, the exact p10/p90
    cloud levels (quantile_disc convention: 1-based index ceil(q*n))
    and the WINSORIZED mean — every level clamped into [p10, p90]
    before averaging, reported as exact integer micro-units
    (sum*1000 // n).  Same bounded-histogram exchange as
    sat_cloud_quantiles: the shuffle carries only (sat*1001+level)
    count partials; the driver final reduces a #sats x 1001 table —
    outlier-robust normalization without any global sort."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cint = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table({"code": pa.array(sat * np.int64(1001) + cint)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = collect_table(count_sum_by_key(enc, "code", count_name="n"))
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code, n = code[order], n[order]
    sat = code // 1001
    lv = code % 1001
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    out_p10, out_p90, out_mean, out_n = [], [], [], []
    for i in range(len(uniq_sat)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cum = np.cumsum(n[lo:hi])
        total = int(cum[-1])

        def pick(pct: int) -> int:
            target = (pct * total + 99) // 100  # ceil(q*n), 1-based
            return int(lv[lo + int(np.searchsorted(cum, target))])

        p10, p90 = pick(10), pick(90)
        clamped = np.clip(lv[lo:hi], p10, p90)
        s = int(np.dot(clamped, n[lo:hi]))
        out_p10.append(p10)
        out_p90.append(p90)
        out_mean.append(s * 1000 // total)
        out_n.append(total)
    return pa.table(
        {
            "sat_id": pa.array(uniq_sat),
            "n_images": pa.array(np.asarray(out_n, dtype=np.int64)),
            "p10_md": pa.array(np.asarray(out_p10, dtype=np.int64)),
            "p90_md": pa.array(np.asarray(out_p90, dtype=np.int64)),
            "wins_mean_micro": pa.array(np.asarray(out_mean, dtype=np.int64)),
        }
    )


ALL_QUERIES["sat_cloud_winsorized"] = q_sat_cloud_winsorized


def q_docs_dup_shingles(sf_dir: str):
    """Per-document DUPLICATED-SHINGLE coverage — the exact-substring
    side of corpus contamination analysis: for every doc, how many of
    its distinct char-5-gram shingles also occur in at least one other
    doc (global document frequency >= 2), plus the coverage ratio in
    ppm.  Two bounded exchanges: (doc, shingle-hash) distinct rows hash
    on the SHINGLE so each partition owns whole shingles and computes
    exact df locally (emitting per-doc partials only), then partials
    hash on the DOC for the final sum.  Text never shuffles; every
    exchanged row is two int64s."""
    from ..stages.hashagg import count_sum_by_key
    from ..stages.text import _batch_shingles, _shingle_hashes
    from ..util import hash_partition

    P = 64

    def emit(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h, w_starts, short_idx = _batch_shingles(col)
        doc = np.repeat(ids, np.diff(w_starts))
        if len(short_idx):
            hs, ds = [h], [doc]
            col0 = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            for i in short_idx:
                sh = _shingle_hashes(col0[int(i)].as_py())
                hs.append(sh)
                ds.append(np.full(len(sh), ids[int(i)], dtype=np.int64))
            h, doc = np.concatenate(hs), np.concatenate(ds)
        hi = h.view(np.int64)
        # per-doc distinct (a doc lives in exactly one batch)
        order = np.lexsort((hi, doc))
        doc, hi = doc[order], hi[order]
        keep = np.ones(len(doc), dtype=bool)
        keep[1:] = (doc[1:] != doc[:-1]) | (hi[1:] != hi[:-1])
        doc, hi = doc[keep], hi[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "h": pa.array(hi),
                "__part": pa.array(hash_partition(hi, P)),
            }
        )

    def df_partition(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        if len(doc) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_sh": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        h = group.column("h").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        doc, h = doc[order], h[order]
        _, start, df = np.unique(h, return_index=True, return_counts=True)
        df_row = np.repeat(df, df)
        o2 = np.argsort(doc, kind="stable")
        doc, dup = doc[o2], (df_row >= 2)[o2]
        uniq, dstart, cnt = np.unique(doc, return_index=True, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq),
                "n_sh": pa.array(cnt.astype(np.int64)),
                "n_dup": pa.array(np.add.reduceat(dup.astype(np.int64), dstart)),
            }
        )

    rows = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    partials = _pm(rows, lambda g: df_partition(g.drop_columns(["__part"])))
    agg = count_sum_by_key(
        partials, "doc_id", sum_cols=("n_sh", "n_dup"), count_name="__c", num_partitions=P
    )

    def finish(b: pa.Table) -> pa.Table:
        ns = b.column("n_sh").to_numpy(zero_copy_only=False)
        nd = b.column("n_dup").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_shingles": pa.array(ns),
                "n_dup": pa.array(nd),
                "dup_ppm": pa.array(nd * np.int64(1_000_000) // ns),
            }
        )

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["docs_dup_shingles"] = q_docs_dup_shingles


def q_country_cooccurrence(sf_dir: str):
    """Basket-style co-occurrence mining over the spatial join: pairs
    of countries covered by the SAME image (market-basket pairs where
    the image is the basket), counted exactly.  The broadcast
    containment join ships (nationkey, image_key) int pairs; an
    image-key exchange groups each image's basket, dedups the key-
    collision duplicate rows (mirrors DISTINCT), and emits its sorted
    country pairs with the diagonal trick — per-image pair fan-out is
    bounded by the 25-country layer, never all-pairs across images.
    Pair partials tree-reduce to the driver (bounded by #country^2)."""
    from ..stages.spatial_join import broadcast_spatial_join
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    countries = corpus_mod.derive_countries(nat).append_column(
        "ck", pc.cast(nat.column("n_nationkey"), pa.int64())
    )
    imgs = src.images_dataset(sf_dir, light=True)
    pairs = broadcast_spatial_join(
        imgs, countries, id_col="ck", img_cols=("image_key",), emit_image_id=False
    )

    MULT = np.int64(1) << np.int64(20)

    def combos(group: pa.Table) -> pa.Table:
        k = group.column("image_key").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {"code": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
            )
        c = group.column("ck").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, k))
        k, c = k[order], c[order]
        keep = np.ones(len(k), dtype=bool)  # dedup duplicate (key, ck)
        keep[1:] = (k[1:] != k[:-1]) | (c[1:] != c[:-1])
        k, c = k[keep], c[keep]
        new_seg = np.ones(len(k), dtype=bool)
        new_seg[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new_seg) - 1
        counts = np.bincount(seg)
        codes = []
        for d in range(1, int(counts.max())):
            m = seg[d:] == seg[:-d]
            j = np.nonzero(m)[0]
            if len(j):  # c ascending within segment -> a < b by nationkey
                codes.append(c[j] * MULT + c[j + d])
        if not codes:
            return pa.table(
                {"code": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
            )
        code = np.concatenate(codes)
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(uniq), "n_partial": pa.array(cnt.astype(np.int64))})

    parted = pairs.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(
                hash_partition(b.column("image_key").to_numpy(zero_copy_only=False), 64)
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    partials = _pm(parted, lambda g: combos(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(partials, "code", sum_cols=("n_partial",), count_name="__n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    cks = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    isos = np.asarray(nat.column("n_name").to_numpy(zero_copy_only=False))
    o = np.argsort(cks, kind="stable")
    cks, isos = cks[o], isos[o]
    ia = isos[np.searchsorted(cks, code // MULT)]
    ib = isos[np.searchsorted(cks, code % MULT)]
    return pa.table(
        {
            "iso_a": pa.array(ia.astype("U"), type=pa.string()),
            "iso_b": pa.array(ib.astype("U"), type=pa.string()),
            "n_images": agg.column("n_partial"),
        }
    )


ALL_QUERIES["country_cooccurrence"] = q_country_cooccurrence


def q_langid_confusion(sf_dir: str):
    """Model-eval confusion matrix at corpus scale: actual ``lang``
    label vs the LangId heuristic's prediction, counted per (actual,
    predicted) cell.  Per-batch partials reduce the stream to <=
    #langs^2 rows per block BEFORE anything moves (classic combiner),
    so the collect is bounded by the label-space square, never the
    corpus.  Empty-after-trim docs drop, mirroring docs_langid."""
    from ..state.broadcast import cached
    from ..util import collect_table

    def conf(batch: pa.Table) -> pa.Table:
        lid = cached("text-stage-LangId", lambda _: text.LangId())
        pred_t = lid(batch)
        bid = batch.column("doc_id").to_numpy(zero_copy_only=False)
        kid = pred_t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(bid, kind="stable")
        pos = order[np.searchsorted(bid[order], kid)]
        actual = np.asarray(
            batch.column("lang").to_numpy(zero_copy_only=False), dtype="U8"
        )[pos]
        pred = np.asarray(
            pred_t.column("pred_lang").to_numpy(zero_copy_only=False), dtype="U8"
        )
        key = np.char.add(np.char.add(actual, "|"), pred)
        uniq, cnt = np.unique(key, return_counts=True)
        parts = np.char.partition(uniq, "|")
        return pa.table(
            {
                "lang": pa.array(parts[:, 0], type=pa.string()),
                "pred_lang": pa.array(parts[:, 2], type=pa.string()),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "text", "lang"]
    ).map_batches(conf, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    t = collect_table(
        partials,
        schema=pa.schema(
            [("lang", pa.string()), ("pred_lang", pa.string()), ("n_partial", pa.int64())]
        ),
    )
    lang = np.asarray(t.column("lang").to_numpy(zero_copy_only=False), dtype="U8")
    pred = np.asarray(t.column("pred_lang").to_numpy(zero_copy_only=False), dtype="U8")
    n = t.column("n_partial").to_numpy(zero_copy_only=False)
    key = np.char.add(np.char.add(lang, "|"), pred)
    uniq, inv = np.unique(key, return_inverse=True)
    tot = np.bincount(inv, weights=n).astype(np.int64)
    parts = np.char.partition(uniq, "|")
    return pa.table(
        {
            "lang": pa.array(parts[:, 0], type=pa.string()),
            "pred_lang": pa.array(parts[:, 2], type=pa.string()),
            "n_docs": pa.array(tot),
        }
    )


ALL_QUERIES["langid_confusion"] = q_langid_confusion


def q_sat_monthly_active_days(sf_dir: str):
    """Exact DISTINCT-per-2-key-group at scale: per (satellite, calendar
    month), the number of distinct ACTIVE days.  Two bounded integer
    exchanges: distinct (sat, day) codes first (one count_sum_by_key
    hash exchange dedups them), then the surviving day rows fold to
    (sat, month) with a tree combiner — the distinct-count never rides
    a global sort and the day code space is spec-bounded."""
    from ..stages.hashagg import count_sum_by_key, tree_count_sum_by_key

    NDAYS = np.int64(spec.TIME_SPAN_HOURS // 24 + 2)
    EPOCH_D = np.datetime64(spec.TIME_EPOCH.split(" ")[0], "D")
    EPOCH_M = EPOCH_D.astype("datetime64[M]")

    def emit(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % np.int64(
            spec.TIME_SPAN_HOURS
        )
        return pa.table({"code": pa.array(sat * NDAYS + t // 24)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    distinct = count_sum_by_key(enc, "code", count_name="__n")

    def to_month(b: pa.Table) -> pa.Table:
        code = b.column("code").to_numpy(zero_copy_only=False)
        sat = code // NDAYS
        day = code % NDAYS
        m_idx = (
            (EPOCH_D + day.astype("timedelta64[D]")).astype("datetime64[M]") - EPOCH_M
        ).astype(np.int64)
        return pa.table({"mcode": pa.array(sat * np.int64(4096) + m_idx)})

    agg = tree_count_sum_by_key(
        distinct.map_batches(
            to_month, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "mcode",
        count_name="n_days",
    )
    mcode = agg.column("mcode").to_numpy(zero_copy_only=False)
    months = np.datetime_as_string(EPOCH_M + (mcode % 4096), unit="M")
    return pa.table(
        {
            "sat_id": pa.array(mcode // 4096),
            "month": pa.array(months.astype("U"), type=pa.string()),
            "n_days": agg.column("n_days"),
        }
    )


ALL_QUERIES["sat_monthly_active_days"] = q_sat_monthly_active_days


def q_phash_cluster_density(sf_dir: str):
    """Dedup-QA metrics per near-dup cluster: member count, edge count,
    min / total pairwise hamming of the edges that formed it — how
    tight each re-capture clique really is (a loose cluster flags an
    over-eager LSH threshold).  Composition of existing distributed
    primitives: the pair stream re-derives with hamming attached, CC
    labels come from the size-gated graph stage, ONE PK lookup-join
    tags each edge with its cluster (edges are intra-cluster by
    definition), a cluster-hash exchange reduces edge stats, and a
    second lookup-join attaches member counts.  Everything after the
    pair stream is graph-sized."""
    from ..stages import graph
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import count_sum_by_key
    from ..util import hash_partition

    P = 64
    # the memoized pair table (graph-sized) feeds the edge-stat
    # stream, the CC stage, and both join sides — the corpus-wide pair
    # derivation runs once PER SESSION (round 5: _phash_pairs_ham)
    pairs3 = _phash_pairs_ham(sf_dir)
    pairs_h = pairs3.select_columns(["ka", "ham"])
    cc = _phash_cc(sf_dir)
    members = count_sum_by_key(cc, "label", count_name="n_members", num_partitions=P)
    tagged = lookup_join(
        pairs_h, key_col="ka", payload_cols=("ham",), table=cc,
        table_key="node", table_val="label", out_val="cluster", num_partitions=P,
    )

    def stats_partition(group: pa.Table) -> pa.Table:
        cl = group.column("cluster").to_numpy(zero_copy_only=False)
        if len(cl) == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n_edges": pa.array([], pa.int64()),
                    "min_hamming": pa.array([], pa.int64()),
                    "sum_hamming": pa.array([], pa.int64()),
                }
            )
        ham = group.column("ham").to_numpy(zero_copy_only=False)
        order = np.argsort(cl, kind="stable")
        cl, ham = cl[order], ham[order]
        uniq, start, cnt = np.unique(cl, return_index=True, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(uniq),
                "n_edges": pa.array(cnt.astype(np.int64)),
                "min_hamming": pa.array(np.minimum.reduceat(ham, start)),
                "sum_hamming": pa.array(np.add.reduceat(ham, start)),
            }
        )

    parted = tagged.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(hash_partition(b.column("cluster").to_numpy(zero_copy_only=False), P)),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    edge_stats = _pm(parted, lambda g: stats_partition(g.drop_columns(["__part"])))
    joined = lookup_join(
        edge_stats, key_col="cluster",
        payload_cols=("n_edges", "min_hamming", "sum_hamming"),
        table=members, table_key="label", table_val="n_members", num_partitions=P,
    )

    def finish(b: pa.Table) -> pa.Table:
        k = b.column("cluster").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cluster_id": pc.binary_join_element_wise(
                    "img-", pc.cast(pa.array(k), pa.string()), ""
                ),
                "n_members": b.column("n_members"),
                "n_edges": b.column("n_edges"),
                "min_hamming": b.column("min_hamming"),
                "sum_hamming": b.column("sum_hamming"),
            }
        )

    return joined.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["phash_cluster_density"] = q_phash_cluster_density


def q_tile_gaps(sf_dir: str):
    """Coverage-gap audit: the fine-grid tiles inside the fixed AOI box
    that NO image footprint touches (the complement of the raster
    coverage — where to task the next acquisition).  The covered side
    is the usual tile explode pruned to the AOI range and deduped with
    one bounded hash exchange; the dense AOI scaffold (bounded by the
    AOI, not the data) is enumerated driver-side and anti-joined with
    one vectorized setdiff — the same dense-scaffold shape as
    time_series_dense."""
    from ..stages.hashagg import count_sum_by_key
    from ..stages.tiles import explode_tiles
    from ..util import collect_table

    import math

    STRIDE = np.int64(spec.TILE_STRIDE)
    tx0 = math.floor((spec.AOI_X0 + spec.LON_OFF) * spec.TILE_PER_DEG)
    tx1 = math.floor((spec.AOI_X1 + spec.LON_OFF) * spec.TILE_PER_DEG)
    ty0 = math.floor((spec.AOI_Y0 + spec.LAT_OFF) * spec.TILE_PER_DEG)
    ty1 = math.floor((spec.AOI_Y1 + spec.LAT_OFF) * spec.TILE_PER_DEG)

    def covered(b: pa.Table) -> pa.Table:
        t = explode_tiles(b, ("image_id",)).column("tile_id").to_numpy(
            zero_copy_only=False
        )
        tx = t // STRIDE - 2
        ty = t % STRIDE - 2
        m = (tx >= tx0) & (tx <= tx1) & (ty >= ty0) & (ty <= ty1)
        return pa.table({"tile_id": pa.array(t[m])})

    cov = count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            covered, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "tile_id",
        count_name="__n",
    )
    cov_t = collect_table(cov, schema=pa.schema([("tile_id", pa.int64()), ("__n", pa.int64())]))
    txs = np.arange(tx0, tx1 + 1, dtype=np.int64)
    tys = np.arange(ty0, ty1 + 1, dtype=np.int64)
    scaffold = ((txs[:, None] + 2) * STRIDE + (tys[None, :] + 2)).ravel()
    gaps = np.setdiff1d(scaffold, cov_t.column("tile_id").to_numpy(zero_copy_only=False))
    return pa.table({"tile_id": pa.array(gaps)})


ALL_QUERIES["tile_gaps"] = q_tile_gaps


def q_ann_recall_eval(sf_dir: str):
    """Index-quality EVAL harness: per-query recall@k of the sign-LSH
    index against the exact brute-force baseline — the measurement a
    production ANN deployment runs before swapping indexes.  Both
    result streams (already-distributed pipelines) union under a side
    tag and ONE query-hash exchange counts the per-query intersection
    with a lexsort + adjacent-equality pass; recall reports as exact
    integer ppm of the brute-force hit count.  Exchange width is the
    top-k result size (#queries x k), never the embedding table."""
    from ..util import hash_partition

    P = 32

    def tag(kind: int):
        def fn(b: pa.Table) -> pa.Table:
            q = b.column("query_id").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "q": b.column("query_id"),
                    "nb": b.column("neighbor_id"),
                    "kind": pa.array(np.full(len(q), kind, dtype=np.int8)),
                    "__part": pa.array(hash_partition(q, P)),
                }
            )

        return fn

    tagged = q_ann_topk(sf_dir).map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        q_ann_lsh_topk(sf_dir).map_batches(
            tag(1), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def recall_partition(group: pa.Table) -> pa.Table:
        q = group.column("q").to_numpy(zero_copy_only=False)
        if len(q) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "n_brute": pa.array([], pa.int64()),
                    "n_lsh": pa.array([], pa.int64()),
                    "n_common": pa.array([], pa.int64()),
                    "recall_ppm": pa.array([], pa.int64()),
                }
            )
        nb = group.column("nb").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((kind, nb, q))
        q, nb, kind = q[order], nb[order], kind[order]
        uniq_q, qidx = np.unique(q, return_inverse=True)
        n_brute = np.bincount(qidx[kind == 0], minlength=len(uniq_q)).astype(np.int64)
        n_lsh = np.bincount(qidx[kind == 1], minlength=len(uniq_q)).astype(np.int64)
        # a neighbor shared by both sides sits adjacent (kind 0 then 1)
        both = (q[1:] == q[:-1]) & (nb[1:] == nb[:-1]) & (kind[1:] != kind[:-1])
        n_common = np.bincount(qidx[1:][both], minlength=len(uniq_q)).astype(np.int64)
        safe = np.maximum(n_brute, 1)
        return pa.table(
            {
                "query_id": pa.array(uniq_q),
                "n_brute": pa.array(n_brute),
                "n_lsh": pa.array(n_lsh),
                "n_common": pa.array(n_common),
                "recall_ppm": pa.array(n_common * np.int64(1_000_000) // safe),
            }
        )

    return _pm(tagged, lambda g: recall_partition(g.drop_columns(["__part"])))


ALL_QUERIES["ann_recall_eval"] = q_ann_recall_eval


def q_sat_cloud_mad(sf_dir: str):
    """Robust dispersion per group: the per-satellite MEDIAN ABSOLUTE
    DEVIATION of the cloud level, exact on the bounded level lattice.
    Same single (sat*1001+level) histogram exchange as
    sat_cloud_quantiles / sat_cloud_winsorized; the driver final
    re-bins each satellite's histogram around its median (quantile_disc
    convention: 1-based index ceil(q*n)) — two weighted medians, zero
    extra passes over the corpus."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cint = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table({"code": pa.array(sat * np.int64(1001) + cint)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = collect_table(count_sum_by_key(enc, "code", count_name="n"))
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code, n = code[order], n[order]
    sat = code // 1001
    lv = code % 1001
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))

    def wmedian(vals: np.ndarray, wts: np.ndarray) -> int:
        o = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[o])
        target = (50 * int(cum[-1]) + 99) // 100  # ceil(0.5*n), 1-based
        return int(vals[o][int(np.searchsorted(cum, target))])

    med_out, mad_out, n_out = [], [], []
    for i in range(len(uniq_sat)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        med = wmedian(lv[lo:hi], n[lo:hi])
        mad_out.append(wmedian(np.abs(lv[lo:hi] - med), n[lo:hi]))
        med_out.append(med)
        n_out.append(int(n[lo:hi].sum()))
    return pa.table(
        {
            "sat_id": pa.array(uniq_sat),
            "n_images": pa.array(np.asarray(n_out, dtype=np.int64)),
            "median_md": pa.array(np.asarray(med_out, dtype=np.int64)),
            "mad_md": pa.array(np.asarray(mad_out, dtype=np.int64)),
        }
    )


ALL_QUERIES["sat_cloud_mad"] = q_sat_cloud_mad


def q_dedup_rate_by_source(sf_dir: str):
    """Lineage QA for the near-dup pass: per ingestion ``source``, how
    many docs the minhash near-dup rule (est_jaccard >= 0.5, keep
    lowest id) would drop — the per-provider contamination report a
    corpus curator reads before blaming a feed.  The drop set is
    output-sized and flows through ONE doc-hash tagged-union exchange
    against the (doc_id, source-code) stream (the dedup_finalize
    shape, never a broadcast); source strings leave the driver only as
    small integer codes."""
    from ..stages import graph
    from ..stages.dedup_finalize import drop_non_min_members
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition, sorted_isin

    P = 64
    # bounded source vocabulary (one column scan of the dictionary)
    srcs = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source")
        .unique()
        .to_pylist()
    )
    vocab = pa.array(srcs, type=pa.string())

    pairs = q_minhash_lsh_dups(sf_dir).map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("est_jaccard"), 0.5)).select(
            ["doc_a", "doc_b"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    drops = drop_non_min_members(graph.connected_components(pairs, "doc_a", "doc_b"))

    def tag_drop(b: pa.Table) -> pa.Table:
        k = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__key": b.column("node"),
                "code": pa.array(np.full(len(k), -1, dtype=np.int64)),
                "__kind": pa.array(np.zeros(len(k), np.int8)),
                "__part": pa.array(hash_partition(k, P)),
            }
        )

    def tag_doc(b: pa.Table) -> pa.Table:
        k = b.column("doc_id").to_numpy(zero_copy_only=False)
        code = pc.cast(pc.index_in(b.column("source"), value_set=vocab), pa.int64())
        return pa.table(
            {
                "__key": b.column("doc_id"),
                "code": code,
                "__kind": pa.array(np.ones(len(k), np.int8)),
                "__part": pa.array(hash_partition(k, P)),
            }
        )

    tagged = drops.map_batches(
        tag_drop, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        src.table_dataset(
            sf_dir, "documents", columns=["doc_id", "source"]
        ).map_batches(tag_doc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    )

    def rate_partition(group: pa.Table) -> pa.Table:
        kind = group.column("__kind").to_numpy(zero_copy_only=False)
        key = group.column("__key").to_numpy(zero_copy_only=False)
        code = group.column("code").to_numpy(zero_copy_only=False)
        is_doc = kind == 1
        dset = np.sort(key[~is_doc])
        dk, dc = key[is_doc], code[is_doc]
        dropped = sorted_isin(dset, dk)
        n_tot = np.bincount(dc, minlength=len(vocab)).astype(np.int64)
        n_drop = np.bincount(dc[dropped], minlength=len(vocab)).astype(np.int64)
        nz = n_tot > 0
        return pa.table(
            {
                "code": pa.array(np.nonzero(nz)[0].astype(np.int64)),
                "n_docs": pa.array(n_tot[nz]),
                "n_dropped": pa.array(n_drop[nz]),
            }
        )

    partials = _pm(tagged, lambda g: rate_partition(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(
        partials, "code", sum_cols=("n_docs", "n_dropped"), count_name="__n"
    )
    c = agg.column("code").to_numpy(zero_copy_only=False)
    nd = agg.column("n_docs").to_numpy(zero_copy_only=False)
    dr = agg.column("n_dropped").to_numpy(zero_copy_only=False)
    names = np.asarray(srcs, dtype=object)[c]
    return pa.table(
        {
            "source": pa.array(names.astype("U"), type=pa.string()),
            "n_docs": pa.array(nd),
            "n_dropped": pa.array(dr),
            "drop_ppm": pa.array(dr * np.int64(1_000_000) // nd),
        }
    )


ALL_QUERIES["dedup_rate_by_source"] = q_dedup_rate_by_source


# --- relational classics (TPC-H shapes over the raw tables) ---------------
#
# The reference resolves every customer/order attribute relationally at
# query time (/root/reference/database/db.py:107-122, query.py); these
# six queries exercise the same relational surface at warehouse shape:
# scan-filter-aggregate, EXISTS semi-join, left-join distribution,
# dimension lookup-join, join + global top-k, and scalar-subquery +
# anti-join.  All money math is integer cents (floor(price*100), the
# convention of q_nation_order_revenue) so distributed sums are
# order-free and bit-exact vs DuckDB.


def _str_codes(col, mapping: dict) -> np.ndarray:
    """Vectorized small-vocabulary string -> int64 codes: dictionary
    encode (Arrow kernel), then map the tiny dictionary through numpy.
    No per-row Python on the values, only on the <=|vocab| dictionary."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    lut = np.asarray([mapping[v] for v in d.dictionary.to_pylist()], dtype=np.int64)
    return lut[idx]


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: pricing summary over shipped lineitems, grouped
    by (returnflag, linestatus) — 6 groups, so the whole aggregate is a
    shuffle-free tree of per-block partials (no sort exchange at any
    scale).  Sums are exact integers (quantity lattice + floor-cents);
    averages are one double division of those integers, mirrored
    verbatim in the oracle."""
    li = src.table_dataset(
        sf_dir, "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = np.datetime64("2001-09-01")
    RF = {"A": 0, "N": 1, "R": 2}
    LS = {"F": 0, "O": 1}

    def encode(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        m = ts <= cutoff
        rf = _str_codes(b.column("l_returnflag"), RF)[m]
        ls = _str_codes(b.column("l_linestatus"), LS)[m]
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)[m]
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)[m]
        tax = b.column("l_tax").to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "code": pa.array(rf * 2 + ls),
                "qty": pa.array(np.floor(qty).astype(np.int64)),
                "base_cents": pa.array(np.floor(ep * 100.0).astype(np.int64)),
                "disc_cents": pa.array(
                    np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
                ),
                "charge_cents": pa.array(
                    np.floor(ep * (1.0 - disc) * (1.0 + tax) * 100.0).astype(np.int64)
                ),
                "disc_pp": pa.array(np.floor(disc * 100.0).astype(np.int64)),
            }
        )

    from ..stages.hashagg import tree_count_sum_by_key

    enc = li.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_count_sum_by_key(
        enc, "code",
        sum_cols=("qty", "base_cents", "disc_cents", "charge_cents", "disc_pp"),
        count_name="n_items",
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code = code[order]
    n = agg.column("n_items").to_numpy(zero_copy_only=False)[order]
    qty = agg.column("qty").to_numpy(zero_copy_only=False)[order]
    base = agg.column("base_cents").to_numpy(zero_copy_only=False)[order]
    dpp = agg.column("disc_pp").to_numpy(zero_copy_only=False)[order]
    rf_names = np.asarray(["A", "N", "R"], dtype=object)
    ls_names = np.asarray(["F", "O"], dtype=object)
    return pa.table(
        {
            "l_returnflag": pa.array(rf_names[code // 2].astype("U"), type=pa.string()),
            "l_linestatus": pa.array(ls_names[code % 2].astype("U"), type=pa.string()),
            "sum_qty": pa.array(qty),
            "sum_base_cents": pa.array(base),
            "sum_disc_cents": pa.array(agg.column("disc_cents").to_numpy(zero_copy_only=False)[order]),
            "sum_charge_cents": pa.array(agg.column("charge_cents").to_numpy(zero_copy_only=False)[order]),
            "avg_qty": pa.array(qty / (1.0 * n)),
            "avg_price": pa.array(base / (100.0 * n)),
            "avg_disc": pa.array(dpp / (100.0 * n)),
            "n_items": pa.array(n),
        }
    )


ALL_QUERIES["pricing_summary"] = q_pricing_summary


def q_late_order_priorities(sf_dir: str):
    """TPC-H Q4 shape: per order priority, how many orders have at
    least one lineitem shipped after 2001-06-01 — an EXISTS semi-join.
    Distributed as distinct(l_orderkey) (per-batch combiner + one hash
    exchange) -> PK lookup-join against orders for the priority code
    (one more exchange, the bucket_join tagged-union shape) -> 5-key
    tree aggregate.  Neither side is ever broadcast or driver-resident."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import distinct_values, tree_count_sum_by_key

    li = src.table_dataset(
        sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]
    )
    cut = np.datetime64("2001-06-01")

    def late(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": pa.array(ok[ts > cut])})

    lk = distinct_values(
        li.map_batches(late, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "l_orderkey",
    )
    od = src.table_dataset(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    )
    PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pmap = {s: i for i, s in enumerate(PRIO)}

    def prio_code(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "prio": pa.array(_str_codes(b.column("o_orderpriority"), pmap)),
            }
        )

    odc = od.map_batches(prio_code, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    j = lookup_join(lk, "l_orderkey", (), odc, "o_orderkey", "prio")
    agg = tree_count_sum_by_key(j, "prio", count_name="n_orders")
    p = agg.column("prio").to_numpy(zero_copy_only=False)
    order = np.argsort(p)
    names = np.asarray(PRIO, dtype=object)[p[order]]
    return pa.table(
        {
            "o_orderpriority": pa.array(names.astype("U"), type=pa.string()),
            "n_orders": pa.array(agg.column("n_orders").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["late_order_priorities"] = q_late_order_priorities


def q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING customers with zero orders.  No left join is executed:
    counts-of-counts come from two bounded aggregates (orders -> per
    custkey count via one hash exchange; that count column -> histogram
    via the shuffle-free tree), and the zero bucket is
    |customer| - |distinct custkeys with orders|, with |customer| read
    from parquet metadata — the whole customer table never moves."""
    from ..stages.hashagg import count_sum_by_key, tree_count_sum_by_key

    od = src.table_dataset(sf_dir, "orders", columns=["o_custkey"])
    per_cust = count_sum_by_key(od, "o_custkey", count_name="n_orders")
    hist = tree_count_sum_by_key(per_cust, "n_orders", count_name="n_customers")
    total = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    k = hist.column("n_orders").to_numpy(zero_copy_only=False)
    v = hist.column("n_customers").to_numpy(zero_copy_only=False)
    zero = np.int64(total) - v.sum()
    if zero > 0:  # only emit the zero bucket when it is non-empty
        k = np.append(k, np.int64(0))
        v = np.append(v, zero)
    order = np.argsort(k)
    return pa.table(
        {"n_orders": pa.array(k[order]), "n_customers": pa.array(v[order])}
    )


ALL_QUERIES["customer_order_distribution"] = q_customer_order_distribution


def q_promo_revenue_monthly(sf_dir: str):
    """TPC-H Q14 shape: per ship month, the ppm share of revenue from
    PROMO-type parts.  lineitem is the stream, part is the keyed side of
    one PK lookup-join (partkey -> promo flag); the joined rows collapse
    into a (month x flag) key for the tree aggregate, so the only
    all-to-all is the single bucket_join exchange."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import tree_count_sum_by_key

    li = src.table_dataset(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def encode(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[M]").astype(np.int64)
        ym = (1970 + months // 12) * 100 + (months % 12 + 1)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "ym": pa.array(ym),
                "cents": pa.array(np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)),
            }
        )

    enc = li.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    pt = src.table_dataset(sf_dir, "part", columns=["p_partkey", "p_type"])

    def promo_flag(b: pa.Table) -> pa.Table:
        if isinstance(b.column("p_type"), pa.ChunkedArray):
            t = b.column("p_type").combine_chunks()
        else:
            t = b.column("p_type")
        eq = pc.equal(t, "PROMO").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p_partkey": b.column("p_partkey"), "promo": pa.array(eq)})

    ptf = pt.map_batches(promo_flag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    j = lookup_join(enc, "l_partkey", ("ym", "cents"), ptf, "p_partkey", "promo")

    def fold(b: pa.Table) -> pa.Table:
        ym = b.column("ym").to_numpy(zero_copy_only=False)
        fl = b.column("promo").to_numpy(zero_copy_only=False)
        return pa.table(
            {"code": pa.array(ym * 2 + fl), "cents": b.column("cents")}
        )

    folded = j.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_count_sum_by_key(folded, "code", sum_cols=("cents",), count_name="n_items")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    cents = agg.column("cents").to_numpy(zero_copy_only=False)
    ym = code // 2
    fl = code % 2
    uniq = np.unique(ym)
    promo = np.zeros(len(uniq), np.int64)
    tot = np.zeros(len(uniq), np.int64)
    pos = np.searchsorted(uniq, ym)
    np.add.at(tot, pos, cents)
    np.add.at(promo, pos[fl == 1], cents[fl == 1])
    return pa.table(
        {
            "ym": pa.array(uniq),
            "promo_cents": pa.array(promo),
            "total_cents": pa.array(tot),
            "promo_ppm": pa.array(promo * np.int64(1_000_000) // tot),
        }
    )


ALL_QUERIES["promo_revenue_monthly"] = q_promo_revenue_monthly


def q_returned_losses_topk(sf_dir: str):
    """TPC-H Q10 shape: the 20 customers with the highest revenue on
    RETURNED items (l_returnflag='R').  lineitem filters and folds to
    integer cents per batch, one PK lookup-join resolves orderkey ->
    custkey, one hash exchange aggregates per customer; the global
    top-20 is a per-block top-k combiner (ties broken by custkey, the
    same deterministic rule as the oracle's ORDER BY ... LIMIT), and
    only the 20 winners' names are point-read from customer.parquet
    with a pushed-down key filter."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    li = src.table_dataset(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def returned_cents(b: pa.Table) -> pa.Table:
        rf = b.column("l_returnflag")
        if isinstance(rf, pa.ChunkedArray):
            rf = rf.combine_chunks()
        m = pc.equal(rf, "R").to_numpy(zero_copy_only=False)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)[m]
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)[m]
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "cents": pa.array(np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)),
            }
        )

    enc = li.map_batches(returned_cents, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    od = src.table_dataset(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = lookup_join(enc, "l_orderkey", ("cents",), od, "o_orderkey", "o_custkey")
    per_cust = count_sum_by_key(j, "o_custkey", sum_cols=("cents",), count_name="n_items")

    K = 20

    def block_top(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = b.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -cents))[:K]
        return b.take(pa.array(order))

    top = collect_table(
        per_cust.map_batches(block_top, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    )
    ck = top.column("o_custkey").to_numpy(zero_copy_only=False)
    cents = top.column("cents").to_numpy(zero_copy_only=False)
    n = top.column("n_items").to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, -cents))[:K]
    ck, cents, n = ck[order], cents[order], n[order]
    names_t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", [int(x) for x in ck])],
    )
    nk = names_t.column("c_custkey").to_numpy(zero_copy_only=False)
    nm = np.asarray(names_t.column("c_name").to_pylist(), dtype=object)
    srt = np.argsort(nk)
    idx = srt[np.searchsorted(nk[srt], ck)]
    return pa.table(
        {
            "c_custkey": pa.array(ck),
            "c_name": pa.array(nm[idx].astype("U"), type=pa.string()),
            "revenue_cents": pa.array(cents),
            "n_items": pa.array(n),
        }
    )


ALL_QUERIES["returned_losses_topk"] = q_returned_losses_topk


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: per nation, customers whose balance exceeds the
    global mean positive balance AND who placed no order in the final
    year of the data (o_orderdate >= 2000-09-01; "never ordered at all"
    is vacuous below sf0.1 — zero such customers exist).  Pass 1 is
    a one-row tree aggregate (sum of positive floor-cents + count) that
    yields the threshold scalar; pass 2 streams customers through the
    threshold filter and ANTI-joins the distinct recent-order custkeys
    on one hash exchange (stages/dedup_finalize.anti_join_keys — the
    corpus side is never broadcast or driver-resident).  Balance sums
    are integer cents, the threshold compare is the same double in both
    systems."""
    from ..stages.dedup_finalize import anti_join_keys
    from ..stages.hashagg import distinct_values, tree_count_sum_by_key

    cu = src.table_dataset(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        m = bal > 0.0
        return pa.table(
            {
                "z": pa.array(np.zeros(1, np.int64)),
                "cents": pa.array(
                    np.array([np.floor(bal[m] * 100.0).astype(np.int64).sum()])
                ),
                "cnt": pa.array(np.array([int(m.sum())], dtype=np.int64)),
            }
        )

    g = tree_count_sum_by_key(
        cu.map_batches(pos_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "z", sum_cols=("cents", "cnt"), count_name="__n",
    )
    thr = g.column("cents").to_numpy(zero_copy_only=False)[0] / (
        100.0 * g.column("cnt").to_numpy(zero_copy_only=False)[0]
    )

    def rich(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        m = bal > thr
        return pa.table(
            {
                "c_custkey": pa.array(b.column("c_custkey").to_numpy(zero_copy_only=False)[m]),
                "c_nationkey": pa.array(
                    b.column("c_nationkey").to_numpy(zero_copy_only=False)[m].astype(np.int64)
                ),
                "bal_cents": pa.array(np.floor(bal[m] * 100.0).astype(np.int64)),
            }
        )

    stream = cu.map_batches(rich, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    recent_cut = np.datetime64("2000-09-01")

    def recent(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": pa.array(ck[ts >= recent_cut])})

    ordered = distinct_values(
        src.table_dataset(
            sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
        ).map_batches(recent, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "o_custkey",
    )
    idle = anti_join_keys(
        stream, "c_custkey", ("c_nationkey", "bal_cents"), ordered, drop_col="o_custkey"
    )
    agg = tree_count_sum_by_key(
        idle, "c_nationkey", sum_cols=("bal_cents",), count_name="n_customers"
    )
    if "c_nationkey" not in agg.column_names:  # no idle rich customers at all
        empty = np.zeros(0, np.int64)
        return pa.table(
            {"c_nationkey": pa.array(empty), "n_customers": pa.array(empty),
             "bal_cents": pa.array(empty)}
        )
    nk = agg.column("c_nationkey").to_numpy(zero_copy_only=False)
    order = np.argsort(nk)
    return pa.table(
        {
            "c_nationkey": pa.array(nk[order]),
            "n_customers": pa.array(agg.column("n_customers").to_numpy(zero_copy_only=False)[order]),
            "bal_cents": pa.array(agg.column("bal_cents").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["idle_rich_customers"] = q_idle_rich_customers


def q_events_daily_active_users(sf_dir: str):
    """Exact DAU: distinct users per UTC day.  (day, user) pairs pack
    into one int64 (day lattice is small, user ids fit 40 bits — both
    asserted), the distinct pass is the per-batch-pre-distinct + one
    hash exchange of stages/hashagg.distinct_values, and the per-day
    count is a tree aggregate over the bounded day key.  No
    COUNT(DISTINCT) state ever lives on one node."""
    from ..stages.hashagg import distinct_values, tree_count_sum_by_key

    ev = src.table_dataset(sf_dir, "events", columns=["ts", "user_id"])
    SHIFT = np.int64(1) << 40

    def enc(b: pa.Table) -> pa.Table:
        day = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        assert uid.max(initial=0) < SHIFT and uid.min(initial=0) >= 0
        return pa.table({"k": pa.array(day * SHIFT + uid)})

    pairs = distinct_values(
        ev.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), "k"
    )
    days = pairs.map_batches(
        lambda b: pa.table({"day": pa.array(b.column("k").to_numpy(zero_copy_only=False) // SHIFT)}),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    agg = tree_count_sum_by_key(days, "day", count_name="dau")
    d = agg.column("day").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "day": pa.array(d[order].astype("datetime64[D]").astype("datetime64[us]")),
            "dau": pa.array(agg.column("dau").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["events_daily_active_users"] = q_events_daily_active_users


def q_docs_hapax_ratio(sf_dir: str):
    """Lexical-richness QA per ingestion source: vocabulary size, hapax
    legomena count (terms occurring exactly once within the source) and
    the hapax share in ppm.  Same tokenizer as top_terms (whitespace
    split, nonempty).  One term-hash exchange: (source, term) keys
    co-locate by term, each partition finalizes its (source, term)
    totals and folds them to per-source (vocab, hapax) partials — the
    vocabulary never leaves the partitions."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import collect_table

    srcs = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").unique().to_pylist()
    )
    smap = {s: i for i, s in enumerate(srcs)}
    S = np.int64(len(srcs))

    def src_term_counts(b: pa.Table) -> pa.Table:
        pf, toks = text._nonempty_tokens(b)
        sc = _str_codes(b.column("source"), smap)
        if len(pf) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "src": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64()), "__part": pa.array([], pa.int64())}
            )
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        key = sc[pf] * V + codes
        uk, cnt = np.unique(key, return_counts=True)
        terms = enc.dictionary.take(pa.array(uk % V))
        return pa.table(
            {
                "term": terms,
                "src": pa.array(uk // V),
                "cnt": pa.array(cnt.astype(np.int64)),
                "__part": pa.array(text._pmi_hash_part(terms)),
            }
        )

    def fold_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "vocab": pa.array([], pa.int64()),
                 "hapax": pa.array([], pa.int64())}
            )
        terms = group.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        tcode = terms.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        src = group.column("src").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        key = tcode * S + src
        order = np.argsort(key, kind="stable")
        uk, start = np.unique(key[order], return_index=True)
        tot = np.add.reduceat(cnt[order], start)
        us = uk % S
        vocab = np.bincount(us, minlength=int(S)).astype(np.int64)
        hapax = np.bincount(us[tot == 1], minlength=int(S)).astype(np.int64)
        nz = np.flatnonzero(vocab)
        return pa.table(
            {"src": pa.array(nz.astype(np.int64)), "vocab": pa.array(vocab[nz]),
             "hapax": pa.array(hapax[nz])}
        )

    docs = src.table_dataset(sf_dir, "documents", columns=["source", "text"])
    counted = docs.map_batches(
        src_term_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    partials = _pm(counted, lambda g: fold_partition(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(partials, "src", sum_cols=("vocab", "hapax"), count_name="__n")
    sc = agg.column("src").to_numpy(zero_copy_only=False)
    order = np.argsort(sc)
    vocab = agg.column("vocab").to_numpy(zero_copy_only=False)[order]
    hapax = agg.column("hapax").to_numpy(zero_copy_only=False)[order]
    names = np.asarray(srcs, dtype=object)[sc[order]]
    return pa.table(
        {
            "source": pa.array(names.astype("U"), type=pa.string()),
            "vocab": pa.array(vocab),
            "hapax": pa.array(hapax),
            "hapax_ppm": pa.array(hapax * np.int64(1_000_000) // vocab),
        }
    )


ALL_QUERIES["docs_hapax_ratio"] = q_docs_hapax_ratio


def q_embedding_quantize_error(sf_dir: str):
    """Vector-compression QA: per label, the exact int8 symmetric
    quantization error (scale = max|x| / 127 per vector, round-half-up)
    of the embedding column — the report read before shipping a
    quantized ANN index.  Squared errors floor to an integer
    picos-lattice per ELEMENT before summing, so the distributed sum is
    order-free and bit-exact vs the oracle; one streaming pass, partials
    are 10 label rows per batch."""
    from ..stages.hashagg import tree_count_sum_by_key

    emb = src.table_dataset(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "sse_picos": pa.array([], pa.int64()),
                 "n_elems": pa.array([], pa.int64()), "n_vecs": pa.array([], pa.int64())}
            )
        M = ann_stage._emb_matrix(b.column("embedding"))  # (n, d) float64
        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        mx = np.abs(M).max(axis=1, keepdims=True)
        safe = np.where(mx == 0.0, 1.0, mx)
        q = np.floor(M * 127.0 / safe + 0.5)
        err = np.where(mx == 0.0, 0.0, M - q * safe / 127.0)
        mic = np.floor(err * err * 1e12).astype(np.int64)
        row_sse = mic.sum(axis=1)  # exact: int64 per-row fold
        order = np.argsort(lab, kind="stable")
        ul, start = np.unique(lab[order], return_index=True)
        n_vecs = np.diff(np.append(start, len(order))).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(ul),
                "sse_picos": pa.array(np.add.reduceat(row_sse[order], start)),
                "n_elems": pa.array(n_vecs * np.int64(M.shape[1])),
                "n_vecs": pa.array(n_vecs),
            }
        )

    agg = tree_count_sum_by_key(
        emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "label", sum_cols=("sse_picos", "n_elems", "n_vecs"), count_name="__n",
    )
    lb = agg.column("label").to_numpy(zero_copy_only=False)
    order = np.argsort(lb)
    sse = agg.column("sse_picos").to_numpy(zero_copy_only=False)[order]
    ne = agg.column("n_elems").to_numpy(zero_copy_only=False)[order]
    nv = agg.column("n_vecs").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "label": pa.array(lb[order]),
            "n_vecs": pa.array(nv),
            "n_elems": pa.array(ne),
            "sse_picos": pa.array(sse),
            "mean_err2": pa.array(sse / (1e12 * ne)),
        }
    )


ALL_QUERIES["embedding_quantize_error"] = q_embedding_quantize_error


def q_events_rfm_cells(sf_dir: str):
    """RFM segmentation (the classic CRM cube): per user recency /
    frequency / monetary, each scored 1-4 by exact quartile thresholds
    (quantile_disc convention: 1-based rank ceil(q*n)), then user counts
    per (r,f,m) cell.  Thresholds come from a span-bucketed two-pass
    exact selection — pass 1 tree-reduces per-span counts (bounded
    collect), pass 2 fetches only the spans containing the wanted ranks
    — so no dimension's value multiset is ever driver-resident (the
    docs_pack_bins prefix pattern applied to order statistics).
    Recency/frequency lattices are span width 1 (pass 1 IS the answer);
    monetary uses 65536-cent spans."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import collect_table

    ANCHOR = np.datetime64("2024-06-01", "D").astype(np.int64)

    feats = q_user_features(sf_dir)

    def rfm(b: pa.Table) -> pa.Table:
        last = b.column("last_ts").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        return pa.table(
            {
                "r": pa.array(ANCHOR - last),
                "f": b.column("n_events"),
                "m": b.column("value_cents"),
            }
        )

    rfm_ds = feats.map_batches(
        rfm, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()  # consumed 4x (3 threshold passes + scoring); user-sized

    def disc_quantiles(col: str, span_w: int) -> list[int]:
        sw = np.int64(span_w)

        def spans(b: pa.Table, c=col) -> pa.Table:
            return pa.table(
                {"s": pa.array(b.column(c).to_numpy(zero_copy_only=False) // sw)}
            )

        hist = tree_count_sum_by_key(
            rfm_ds.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
            "s", count_name="n",
        )
        s = hist.column("s").to_numpy(zero_copy_only=False)
        n = hist.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(s)
        s, n = s[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        ranks = [-(-total * k // 4) for k in (1, 2, 3)]  # ceil(k*n/4), 1-based
        idx = [int(np.searchsorted(cum, rk)) for rk in ranks]
        if span_w == 1:
            return [int(s[i]) for i in idx]
        wanted = np.unique(s[idx])

        def in_spans(b: pa.Table, c=col) -> pa.Table:
            v = b.column(c).to_numpy(zero_copy_only=False)
            keep = np.isin(v // sw, wanted)
            return pa.table({"v": pa.array(v[keep])})

        vals = collect_table(
            rfm_ds.map_batches(in_spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
            schema=pa.schema([("v", pa.int64())]),
        ).column("v").to_numpy(zero_copy_only=False)
        vals = np.sort(vals)
        vspan = vals // sw
        out = []
        for rk, i in zip(ranks, idx):
            below = int(cum[i - 1]) if i else 0  # rows in spans before s[idx]
            local = rk - below  # 1-based rank within span s[i]
            out.append(int(vals[np.searchsorted(vspan, s[i]) + local - 1]))
        return out

    rq = disc_quantiles("r", 1)
    fq = disc_quantiles("f", 1)
    mq = disc_quantiles("m", 65536)

    def score(b: pa.Table) -> pa.Table:
        def sc(v: np.ndarray, t: list[int]) -> np.ndarray:
            return 1 + (v > t[0]).astype(np.int64) + (v > t[1]) + (v > t[2])

        r = sc(b.column("r").to_numpy(zero_copy_only=False), rq)
        f = sc(b.column("f").to_numpy(zero_copy_only=False), fq)
        m = sc(b.column("m").to_numpy(zero_copy_only=False), mq)
        return pa.table({"code": pa.array(((r - 1) * 4 + (f - 1)) * 4 + (m - 1))})

    agg = tree_count_sum_by_key(
        rfm_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "code", count_name="n_users",
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code = code[order]
    return pa.table(
        {
            "r_score": pa.array(code // 16 + 1),
            "f_score": pa.array(code // 4 % 4 + 1),
            "m_score": pa.array(code % 4 + 1),
            "n_users": pa.array(agg.column("n_users").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["events_rfm_cells"] = q_events_rfm_cells


def q_events_weekly_active_users(sf_dir: str):
    """Rolling 7-day active users per day (WAU): each distinct
    (day, user) pair is fanned to the 7 window days it supports, then a
    second distinct pass and a bounded per-day tree count.  Both
    distinct passes are hash exchanges of packed int64 keys; the fan-out
    factor is the window length, never the event count."""
    from ..stages.hashagg import distinct_values, tree_count_sum_by_key

    ev = src.table_dataset(sf_dir, "events", columns=["ts", "user_id"])
    SHIFT = np.int64(1) << 40

    def enc(b: pa.Table) -> pa.Table:
        day = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        assert uid.max(initial=0) < SHIFT and uid.min(initial=0) >= 0
        return pa.table({"k": pa.array(day * SHIFT + uid)})

    pairs = distinct_values(
        ev.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), "k"
    )

    def fan(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        # adding o to the day field = adding o * SHIFT to the packed key
        return pa.table(
            {"k": pa.array((k[None, :] + (np.arange(7, dtype=np.int64) * SHIFT)[:, None]).ravel())}
        )

    win = distinct_values(
        pairs.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), "k"
    )
    days = win.map_batches(
        lambda b: pa.table({"day": pa.array(b.column("k").to_numpy(zero_copy_only=False) // SHIFT)}),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    agg = tree_count_sum_by_key(days, "day", count_name="wau")
    d = agg.column("day").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "day": pa.array(d[order].astype("datetime64[D]").astype("datetime64[us]")),
            "wau": pa.array(agg.column("wau").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["events_weekly_active_users"] = q_events_weekly_active_users


def q_sat_monthly_growth(sf_dir: str):
    """Month-over-month growth per satellite: image count per (sat,
    month) plus the LAG delta vs the satellite's previous OBSERVED
    month (first month's delta is its own count, the COALESCE(LAG,0)
    convention).  One bounded-key tree aggregate; the window function
    runs on the (sats x months) result, not the corpus."""
    from ..stages.hashagg import tree_count_sum_by_key

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        ts = (
            np.datetime64(spec.TIME_EPOCH, "us")
            + hrs.astype("timedelta64[h]").astype("timedelta64[us]")
        )
        months = ts.astype("datetime64[M]").astype(np.int64)
        ym = (1970 + months // 12) * 100 + (months % 12 + 1)
        return pa.table({"code": pa.array(sat * np.int64(1000000) + ym)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(enc, "code", count_name="n_images")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n_images").to_numpy(zero_copy_only=False)
    order = np.argsort(code)  # (sat, ym) ascending
    code, n = code[order], n[order]
    sat = code // 1000000
    ym = code % 1000000
    prev = np.r_[np.int64(0), n[:-1]]
    prev[np.r_[True, sat[1:] != sat[:-1]]] = 0  # first month per sat
    return pa.table(
        {
            "sat_id": pa.array(sat),
            "ym": pa.array(ym),
            "n_images": pa.array(n),
            "delta": pa.array(n - prev),
        }
    )


ALL_QUERIES["sat_monthly_growth"] = q_sat_monthly_growth


def q_part_price_size_stats(sf_dir: str):
    """Streaming sufficient statistics + Pearson correlation between
    part size and retail price: one pass of integer partials (sums,
    squares, cross products on the size / floor-cents lattices), one
    1-row tree reduce, correlation as ONE mirrored double expression of
    those integers.  (Integer bound: cents^2 sums stay < 2^63 through
    ~2e8 parts; beyond that the y lattice should drop to dollars.)"""
    from ..stages.hashagg import tree_count_sum_by_key

    pt = src.table_dataset(sf_dir, "part", columns=["p_size", "p_retailprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = b.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.floor(b.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table(
            {
                "z": pa.array(np.zeros(1, np.int64)),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
                "sxy": pa.array([(x * y).sum()]),
                "cnt": pa.array([np.int64(len(x))]),
            }
        )

    g = tree_count_sum_by_key(
        pt.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "z", sum_cols=("sx", "sy", "sxx", "syy", "sxy", "cnt"), count_name="__n",
    )
    n = g.column("cnt").to_numpy(zero_copy_only=False)[0]
    sx = g.column("sx").to_numpy(zero_copy_only=False)[0]
    sy = g.column("sy").to_numpy(zero_copy_only=False)[0]
    sxx = g.column("sxx").to_numpy(zero_copy_only=False)[0]
    syy = g.column("syy").to_numpy(zero_copy_only=False)[0]
    sxy = g.column("sxy").to_numpy(zero_copy_only=False)[0]
    corr = (n * 1.0 * sxy - 1.0 * sx * sy) / np.sqrt(
        (n * 1.0 * sxx - 1.0 * sx * sx) * (n * 1.0 * syy - 1.0 * sy * sy)
    )
    return pa.table(
        {
            "n": pa.array([n]), "sx": pa.array([sx]), "sy": pa.array([sy]),
            "sxx": pa.array([sxx]), "syy": pa.array([syy]), "sxy": pa.array([sxy]),
            "corr": pa.array([corr]),
        }
    )


ALL_QUERIES["part_price_size_stats"] = q_part_price_size_stats


def q_docs_ttr_buckets(sf_dir: str):
    """Type-token-ratio distribution: per document, distinct-term /
    token-count in ppm, bucketed by 10% bands — the lexical-diversity
    histogram a corpus curator reads next to docs_quality.  Entirely
    map-side (each doc's text lives in one row, so per-doc distincts
    are in-batch segment ops); only (bucket, count) partials reduce."""
    from ..stages.hashagg import tree_count_sum_by_key

    def partial(b: pa.Table) -> pa.Table:
        pf, toks = text._nonempty_tokens(b)
        if len(pf) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()), "n_docs": pa.array([], pa.int64())})
        codes = toks.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        updoc, start = np.unique(pf, return_index=True)
        ntok = np.diff(np.append(start, len(pf))).astype(np.int64)
        # distinct terms per doc: unique packed (doc, code) pairs, then a
        # bincount of each pair's doc — no per-doc Python loop
        V2 = np.int64(codes.max()) + 1
        dofp = np.unique(pf * V2 + codes) // V2
        ndist = np.bincount(dofp, minlength=int(pf.max()) + 1)[updoc].astype(np.int64)
        ppm = ndist * np.int64(1_000_000) // ntok
        bucket = ppm // np.int64(100_000)
        ub, cnt = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(ub), "n_docs": pa.array(cnt.astype(np.int64))})

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    agg = tree_count_sum_by_key(
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "bucket", sum_cols=("n_docs",), count_name="__n",
    )
    bk = agg.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(bk)
    return pa.table(
        {
            "bucket": pa.array(bk[order]),
            "n_docs": pa.array(agg.column("n_docs").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["docs_ttr_buckets"] = q_docs_ttr_buckets


def q_sat_brightness_quartiles(sf_dir: str):
    """Per-satellite quartiles of per-image mean DECODED brightness on
    the exact milli lattice (mean_milli = 1000*pixel_sum // n_pixels,
    0..255000).  The Ray side decodes the real payload bytes
    (buffer-level payload_sums — no per-row Python); the oracle mirrors
    through the ramp closed form.  One bounded (sat, mean_milli)
    histogram exchange, driver-side weighted quantile_disc picks
    (1-based rank ceil(q*n), the sat_cloud_quantiles convention)."""
    from .pixel_fused import per_image

    LAT = np.int64(255001)

    def enc(b: pa.Table) -> pa.Table:
        # round 5: per-image (pix_sum, n_px) from the FUSED pixel pass
        npx = b.column("n_px").to_numpy(zero_copy_only=False)
        sums = b.column("pix_sum").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        mm = np.int64(1000) * sums // npx
        return pa.table({"code": pa.array(sat * LAT + mm)})

    enc_ds = per_image(sf_dir).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # bounded key space (sats x 255001 milli values) -> shuffle-free
    # tree reduce, the tile-manifest pattern, instead of a sort exchange
    from ..stages.hashagg import tree_count_sum_by_key

    hist = tree_count_sum_by_key(enc_ds, "code", count_name="n")
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, n = code[order], n[order]
    sat = code // LAT
    mm = code % LAT
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    rows = {"sat_id": [], "n_images": [], "q1_milli": [], "q2_milli": [], "q3_milli": []}
    for i in range(len(uniq_sat)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cum = np.cumsum(n[lo:hi])
        total = int(cum[-1])
        qs = [int(mm[lo:hi][np.searchsorted(cum, -(-total * k // 4))]) for k in (1, 2, 3)]
        rows["sat_id"].append(int(uniq_sat[i]))
        rows["n_images"].append(total)
        rows["q1_milli"].append(qs[0])
        rows["q2_milli"].append(qs[1])
        rows["q3_milli"].append(qs[2])
    return pa.table({k: pa.array(np.asarray(v, dtype=np.int64)) for k, v in rows.items()})


ALL_QUERIES["sat_brightness_quartiles"] = q_sat_brightness_quartiles


def q_grid_morans_i(sf_dir: str):
    """Global spatial autocorrelation (Moran's I, queen contiguity) of
    image counts over the 4-degree cell grid: are acquisitions
    clustered, dispersed, or random?  The corpus pass is one bounded
    cell-count tree aggregate (the grid_hotspots shape); adjacency
    aggregates (S0 = #neighbor pairs, A = sum of x_i*x_j over
    neighbors, B = sum of (x_i+x_j) over neighbors) come from 8
    shifted adds on the dense <=3k-cell array — driver-trivial at any
    corpus scale — and the final statistic is ONE mirrored double
    expression of those integers."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX + 2, NY + 2), dtype=np.int64)  # +1 halo each side
    X[key // 1000 + 1, key % 1000 + 1] = cnt
    O = (X > 0).astype(np.int64)
    shifts = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    nbr_x = sum(X[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy] for dx, dy in shifts)
    deg = sum(O[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy] for dx, dy in shifts)
    Xc, Oc = X[1 : NX + 1, 1 : NY + 1], O[1 : NX + 1, 1 : NY + 1]
    n = int(Oc.sum())
    sx = int(Xc.sum())
    sxx = int((Xc * Xc).sum())
    s0 = int((deg * Oc).sum())
    a = int((Xc * nbr_x).sum())
    b = 2 * int((Xc * deg * Oc).sum())
    m = sx / (1.0 * n)
    morans_i = (1.0 * a - m * b + m * m * s0) * n / ((1.0 * sxx - m * sx) * s0)
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_cells": one(n), "s0": one(s0), "sx": one(sx), "sxx": one(sxx),
            "a": one(a), "b": one(b),
            "morans_i": pa.array(np.asarray([morans_i], dtype=np.float64)),
        }
    )


ALL_QUERIES["grid_morans_i"] = q_grid_morans_i


def q_cell_getis_gi(sf_dir: str):
    """Getis-Ord Gi* hotspot score per occupied 4-degree cell — the
    standard local companion to grid_morans_i's global statistic: for
    each cell, z = (sum of x over the 3x3 window incl. self - mean *
    window size) / (S * sqrt((n*w - w^2)/(n-1))), where the study
    area is the occupied-cell set.  Corpus pass = the same ONE bounded
    cell-count tree aggregate as grid_morans_i; window sums are 9
    shifted adds on the dense geometry-bounded grid; the z expression
    is mirrored operation-for-operation in the oracle (sqrt/div are
    IEEE-correctly-rounded in both numpy and DuckDB, so the doubles
    hash bit-equal, the grid_morans_i precedent).  Integer window
    aggregates (nbr_sum, n_nbrs) are also emitted exactly."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX + 2, NY + 2), dtype=np.int64)  # +1 halo each side
    X[key // 1000 + 1, key % 1000 + 1] = cnt
    O = (X > 0).astype(np.int64)
    shifts9 = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    nbr = sum(X[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy] for dx, dy in shifts9)
    wcnt = sum(O[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy] for dx, dy in shifts9)
    Xc = X[1 : NX + 1, 1 : NY + 1]
    occ = Xc > 0
    n = int(occ.sum())
    sx = int(Xc.sum())
    sxx = int((Xc * Xc).sum())
    xi, yi = np.nonzero(occ)
    x = Xc[occ]
    a = nbr[occ]
    w = wcnt[occ]
    # mirrored double expression (operation order == the SQL oracle's)
    num = 1.0 * a - (sx / (1.0 * n)) * w
    den = np.sqrt(sxx / (1.0 * n) - (sx / (1.0 * n)) * (sx / (1.0 * n))) * np.sqrt(
        (1.0 * n * w - 1.0 * w * w) / (n - 1.0)
    )
    return pa.table(
        {
            "cell_x": pa.array(xi.astype(np.int64)),
            "cell_y": pa.array(yi.astype(np.int64)),
            "n_images": pa.array(x),
            "nbr_sum": pa.array(a),
            "n_nbrs": pa.array(w),
            "gi_z": pa.array(num / den),
        }
    )


ALL_QUERIES["cell_getis_gi"] = q_cell_getis_gi


def q_monthly_mean_center(sf_dir: str):
    """Mean center + standard distance of the acquisition point
    pattern per calendar month — the classic centrographic drift
    report (is the tasking focus migrating?).  ONE corpus pass of
    bounded per-month partials (n, sum lon, sum lat, sum lon^2,
    sum lat^2 in milli-degree ints; the squared sums bound int64 up
    to ~7e7 images/month — beyond that the partial needs a two-limb
    accumulator, same as the oracle's BIGINT), then mirrored-double
    mean / standard-distance expressions on the tiny aggregate."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        key = ik % np.int64(spec.MOD)
        lon_md = corpus_mod._mix(key, spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(key, spec.ST_LAT) % spec.LAT_SPAN_MD
        hours = corpus_mod._mix(key, spec.ST_TIME) % spec.TIME_SPAN_HOURS
        epoch_us = np.datetime64(
            spec.TIME_EPOCH.replace(" ", "T"), "us"
        ).astype(np.int64)
        mon = (
            (epoch_us + hours * np.int64(3_600_000_000))
            .view("datetime64[us]")
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "mon": pa.array(mon),
                "sx": pa.array(lon_md),
                "sy": pa.array(lat_md),
                "sxx": pa.array(lon_md * lon_md),
                "syy": pa.array(lat_md * lat_md),
            }
        )

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(
        packed, "mon", sum_cols=("sx", "sy", "sxx", "syy"), count_name="n"
    )
    mon = agg.column("mon").to_numpy(zero_copy_only=False)
    order = np.argsort(mon)
    mon = mon[order]
    n = agg.column("n").to_numpy(zero_copy_only=False)[order]
    sx = agg.column("sx").to_numpy(zero_copy_only=False)[order]
    sy = agg.column("sy").to_numpy(zero_copy_only=False)[order]
    sxx = agg.column("sxx").to_numpy(zero_copy_only=False)[order]
    syy = agg.column("syy").to_numpy(zero_copy_only=False)[order]
    # mirrored double expressions (operation order == the oracle's)
    mean_lon = sx / (1.0 * n)
    mean_lat = sy / (1.0 * n)
    std_dist = np.sqrt(
        (sxx - sx * (sx / (1.0 * n)) + syy - sy * (sy / (1.0 * n))) / (1.0 * n)
    )
    y = 1970 + mon // 12
    m = mon % 12 + 1
    bucket = [f"{int(a):04d}-{int(b):02d}" for a, b in zip(y, m)]
    return pa.table(
        {
            "bucket": pa.array(bucket, type=pa.string()),
            "n_images": pa.array(n),
            "sum_lon_md": pa.array(sx),
            "sum_lat_md": pa.array(sy),
            "mean_lon_md": pa.array(mean_lon),
            "mean_lat_md": pa.array(mean_lat),
            "std_dist_md": pa.array(std_dist),
        }
    )


ALL_QUERIES["monthly_mean_center"] = q_monthly_mean_center


def q_grid_ripley_k(sf_dir: str):
    """Grid-censused Ripley's K at Chebyshev cell radii 1, 2, 4 — the
    multi-scale point-pattern clustering profile (how many neighbours
    does an average acquisition have within r cells vs CSR?).  ONE
    bounded cell-count tree aggregate (the grid_morans_i pass), then
    ordered-pair counts at each radius via shifted dot products on
    the dense geometry-bounded grid: n_pairs(r) = sum over |dx|<=r,
    |dy|<=r of <x, shift(x, dx, dy)> - N (self point-pairs removed)
    — all exact int64; khat = n_pairs / (1.0 * N) mirrored."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    R = 4
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX + 2 * R, NY + 2 * R), dtype=np.int64)  # +R halo
    X[key // 1000 + R, key % 1000 + R] = cnt
    Xc = X[R : NX + R, R : NY + R]
    N = int(Xc.sum())
    radii, pairs, khat = [], [], []
    for r in (1, 2, 4):
        conv = 0
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                conv += int(
                    (Xc * X[R + dx : NX + R + dx, R + dy : NY + R + dy]).sum()
                )
        np_r = conv - N
        radii.append(r)
        pairs.append(np_r)
        khat.append((1.0 * np_r) / (1.0 * N))
    return pa.table(
        {
            "radius": pa.array(np.asarray(radii, dtype=np.int64)),
            "n_pairs": pa.array(np.asarray(pairs, dtype=np.int64)),
            "n_points": pa.array(np.asarray([N] * 3, dtype=np.int64)),
            "khat": pa.array(np.asarray(khat, dtype=np.float64)),
        }
    )


ALL_QUERIES["grid_ripley_k"] = q_grid_ripley_k


def q_grid_semivariogram(sf_dir: str):
    """Directional empirical semivariogram of the cell-count surface:
    gamma(dir, h) = sum (x_i - x_j)^2 / (2 * n_pairs) over OCCUPIED
    cell pairs at lag h in the E-W and N-S directions (h = 1..4
    cells) — the anisotropic spatial-continuity profile geostatistics
    fits kriging models to.  Same ONE bounded cell-count aggregate as
    grid_morans_i; each (dir, lag) is a shifted masked squared-diff
    on the dense geometry-bounded grid (exact int64 sums), gamma is
    one mirrored double division."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    H = 4
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX + H, NY + H), dtype=np.int64)  # +H halo on the far side
    X[key // 1000, key % 1000] = cnt
    O = X > 0
    Xc, Oc = X[:NX, :NY], O[:NX, :NY]
    dirs, lags, nps, sss, gam = [], [], [], [], []
    for d, (sx, sy) in (("EW", (1, 0)), ("NS", (0, 1))):
        for h in range(1, H + 1):
            Xs = X[sx * h : NX + sx * h, sy * h : NY + sy * h]
            Os = O[sx * h : NX + sx * h, sy * h : NY + sy * h]
            mask = Oc & Os
            npair = int(mask.sum())
            diff = (Xc - Xs)[mask]
            ss = int((diff * diff).sum())
            dirs.append(d)
            lags.append(h)
            nps.append(npair)
            sss.append(ss)
            gam.append(ss / (2.0 * npair))
    return pa.table(
        {
            "dir": pa.array(dirs, type=pa.string()),
            "lag": pa.array(np.asarray(lags, dtype=np.int64)),
            "n_pairs": pa.array(np.asarray(nps, dtype=np.int64)),
            "sum_sq_diff": pa.array(np.asarray(sss, dtype=np.int64)),
            "gamma": pa.array(np.asarray(gam, dtype=np.float64)),
        }
    )


ALL_QUERIES["grid_semivariogram"] = q_grid_semivariogram


def q_grid_gearys_c(sf_dir: str):
    """Geary's C (queen contiguity) over 4-degree cell image counts —
    the difference-based global autocorrelation companion to
    grid_morans_i (sensitive to local rather than global structure):
    C = (n-1) * sum_pairs (x_i-x_j)^2 / (2*S0 * sum (x_i - mean)^2).
    Same ONE bounded cell-count tree aggregate; the pair squared-diff
    sum is 8 shifted masked adds on the dense <=3k-cell array (exact
    int64, pairs among OCCUPIED cells only, counted both directions
    like the oracle's self-join), and C is one mirrored double
    expression of the integer aggregates."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX + 2, NY + 2), dtype=np.int64)  # +1 halo each side
    X[key // 1000 + 1, key % 1000 + 1] = cnt
    O = X > 0
    Xc, Oc = X[1 : NX + 1, 1 : NY + 1], O[1 : NX + 1, 1 : NY + 1]
    shifts = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    s0 = 0
    d = 0
    for dx, dy in shifts:
        Xs = X[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy]
        Os = O[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy]
        mask = Oc & Os
        s0 += int(mask.sum())
        diff = (Xc - Xs)[mask]
        d += int((diff * diff).sum())
    n = int(Oc.sum())
    sx = int(Xc[Oc].sum())
    sxx = int((Xc[Oc] * Xc[Oc]).sum())
    # mirrored double expression (operation order == the SQL oracle's)
    gearys_c = (n - 1.0) * d / (2.0 * s0 * (1.0 * sxx - (sx / (1.0 * n)) * sx))
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_cells": one(n), "s0": one(s0), "sx": one(sx), "sxx": one(sxx),
            "sum_sq_diff": one(d),
            "gearys_c": pa.array(np.asarray([gearys_c], dtype=np.float64)),
        }
    )


ALL_QUERIES["grid_gearys_c"] = q_grid_gearys_c


def q_cell_local_moran(sf_dir: str):
    """Local Moran's I (Anselin LISA, queen contiguity, binary
    weights) per occupied 4-degree cell, plus the Moran-scatterplot
    quadrant label (HH/HL/LH/LL) — the per-cell decomposition of
    grid_morans_i that the hotspot/coldspot/outlier maps are drawn
    from.  Corpus pass = the same ONE bounded cell-count tree
    aggregate; neighbor sums are 8 shifted adds on the dense grid
    (self excluded, occupied neighbors only); the LISA double and the
    quadrant comparisons are mirrored operation-for-operation in the
    oracle so the doubles hash bit-equal (grid_morans_i precedent).
    Integer window aggregates (nbr_sum, n_nbrs) are emitted exactly."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX + 2, NY + 2), dtype=np.int64)  # +1 halo each side
    X[key // 1000 + 1, key % 1000 + 1] = cnt
    O = (X > 0).astype(np.int64)
    shifts = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    nbr_x = sum(X[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy] for dx, dy in shifts)
    deg = sum(O[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy] for dx, dy in shifts)
    Xc = X[1 : NX + 1, 1 : NY + 1]
    occ = Xc > 0
    n = int(occ.sum())
    sx = int(Xc[occ].sum())
    sxx = int((Xc[occ] * Xc[occ]).sum())
    xi, yi = np.nonzero(occ)
    x = Xc[occ]
    a = nbr_x[occ]
    w = deg[occ]
    # mirrored double expressions (operation order == the SQL oracle's)
    m = sx / (1.0 * n)
    lisa = (x - m) * (1.0 * a - m * w) / (sxx / (1.0 * n) - m * m)
    quad = np.where(x > m, "H", "L").astype(object) + np.where(
        1.0 * a > m * w, "H", "L"
    ).astype(object)
    return pa.table(
        {
            "cell_x": pa.array(xi.astype(np.int64)),
            "cell_y": pa.array(yi.astype(np.int64)),
            "n_images": pa.array(x),
            "nbr_sum": pa.array(a),
            "n_nbrs": pa.array(w),
            "lisa": pa.array(lisa),
            "quad": pa.array(quad.astype(str), type=pa.string()),
        }
    )


ALL_QUERIES["cell_local_moran"] = q_cell_local_moran


def q_grid_join_counts(sf_dir: str):
    """Binary join-count statistics (queen contiguity) over the FULL
    geometry-bounded grid — the presence/absence autocorrelation test:
    every cell of the ceil(span/W) lattice is Black (>=1 image) or
    White (empty); count ordered adjacent pairs BB / BW / WW exactly,
    plus the mirrored-double observed and binomial-expected BB rates.
    Corpus pass = the same ONE bounded cell-count tree aggregate; the
    pair census is 8 shifted boolean adds against an in-grid mask on
    the dense <=3k-cell array."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    # occupiable lattice: cells that can actually contain a point
    NX = int((spec.LON_SPAN_MD + W - 1) // W)
    NY = int((spec.LAT_SPAN_MD + W - 1) // W)
    B = np.zeros((NX + 2, NY + 2), dtype=bool)  # +1 halo each side
    B[key // 1000 + 1, key % 1000 + 1] = cnt > 0
    G = np.zeros((NX + 2, NY + 2), dtype=bool)  # in-grid mask
    G[1 : NX + 1, 1 : NY + 1] = True
    Bc = B[1 : NX + 1, 1 : NY + 1]
    shifts = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    bb = ww = s0 = 0
    for dx, dy in shifts:
        Bs = B[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy]
        Gs = G[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy]
        s0 += int(Gs.sum())
        bb += int((Bc & Bs & Gs).sum())
        ww += int((~Bc & ~Bs & Gs).sum())
    bw = s0 - bb - ww
    n = NX * NY
    n_black = int(Bc.sum())
    # mirrored double expressions (operation order == the SQL oracle's)
    bb_rate = (1.0 * bb) / (1.0 * s0)
    exp_bb_rate = (1.0 * n_black * n_black) / (1.0 * n * n)
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_cells": one(n), "n_black": one(n_black), "s0": one(s0),
            "bb": one(bb), "bw": one(bw), "ww": one(ww),
            "bb_rate": pa.array(np.asarray([bb_rate], dtype=np.float64)),
            "exp_bb_rate": pa.array(np.asarray([exp_bb_rate], dtype=np.float64)),
        }
    )


ALL_QUERIES["grid_join_counts"] = q_grid_join_counts


def q_grid_cross_k(sf_dir: str):
    """Bivariate (cross-type) Ripley's K, grid-censused: for Chebyshev
    cell radii r in {1, 2, 4}, the exact count of (image, city)
    pairs within r cells — does acquisition density concentrate
    around settlements beyond what global intensity predicts?  The
    corpus pass is the same ONE bounded image cell-count aggregate;
    the city surface is the broadcast-small dimension (customer-
    derived), rasterized driver-side; each radius is one exact-int
    windowed cross-correlation via 2-D prefix sums (no pair
    enumeration anywhere).  khat = pairs per image, mirrored double."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X = np.zeros((NX, NY), dtype=np.int64)
    X[key // 1000, key % 1000] = cnt
    cities = src.cities_table(sf_dir)
    cid = cities.column("city_id").to_numpy(zero_copy_only=False)
    ccx = (corpus_mod._mix(cid, spec.ST_CITY_LON) % spec.LON_SPAN_MD) // W
    ccy = (corpus_mod._mix(cid, spec.ST_CITY_LAT) % spec.LAT_SPAN_MD) // W
    Y = np.zeros((NX, NY), dtype=np.int64)
    np.add.at(Y, (ccx, ccy), 1)
    # 2-D prefix sum of the city surface (P[i,j] = sum of Y[:i,:j])
    P = np.zeros((NX + 1, NY + 1), dtype=np.int64)
    P[1:, 1:] = Y.cumsum(axis=0).cumsum(axis=1)
    n_images = int(X.sum())
    n_cities = int(Y.sum())
    ii, jj = np.nonzero(X)
    xv = X[ii, jj]
    radii, nps, khat = [], [], []
    for r in (1, 2, 4):
        x0 = np.clip(ii - r, 0, NX)
        x1 = np.clip(ii + r + 1, 0, NX)
        y0 = np.clip(jj - r, 0, NY)
        y1 = np.clip(jj + r + 1, 0, NY)
        wsum = P[x1, y1] - P[x0, y1] - P[x1, y0] + P[x0, y0]
        npair = int((xv * wsum).sum())
        radii.append(r)
        nps.append(npair)
        khat.append((1.0 * npair) / (1.0 * n_images))
    one = lambda a: pa.array(np.asarray(a, dtype=np.int64))
    return pa.table(
        {
            "radius": one(radii),
            "n_pairs": one(nps),
            "n_images": one([n_images] * 3),
            "n_cities": one([n_cities] * 3),
            "khat": pa.array(np.asarray(khat, dtype=np.float64)),
        }
    )


ALL_QUERIES["grid_cross_k"] = q_grid_cross_k


def q_small_qty_revenue(sf_dir: str):
    """Small-quantity-order revenue (the TPC-H Q17 shape): among
    lineitems of one part brand, total the revenue of rows whose
    quantity is below 20% of that PART's average quantity — the
    correlated-aggregate self-join (join a fact table against an
    aggregate of itself).  Brand parts semi-join through the shared
    bucket lookup-join (fact x 1/25-of-dim: neither side broadcast),
    then ONE partkey-hash exchange computes the per-part aggregate AND
    applies the correlated filter inside the same partition task (keys
    are co-located, so no second exchange to re-attach the average).
    The 20% test is exact integer math (5*qty*cnt < sum_qty); only the
    final yearly average is a mirrored double."""
    from ..stages.bucket_join import lookup_join
    from ..stages.rawshuffle import part_map_groups
    from ..util import collect_table, hash_partition

    BRAND = "Brand#13"
    P = 64

    def li_prep(batch: pa.Table) -> pa.Table:
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "qty": pa.array(qty.astype(np.int64)),
                "cents": pa.array(np.floor(ep * 100.0).astype(np.int64)),
            }
        )

    li = src.table_dataset(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def part_prep(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("p_brand"), BRAND)
        pk = batch.filter(keep).column("p_partkey")
        return pa.table({"p_partkey": pk, "one": pa.array(np.ones(len(pk), np.int64))})

    parts = src.table_dataset(
        sf_dir, "part", columns=["p_partkey", "p_brand"]
    ).map_batches(part_prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    j = lookup_join(li, "l_partkey", ("qty", "cents"), parts, "p_partkey", "one")

    def pid(batch: pa.Table) -> pa.Table:
        k = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        return batch.drop_columns(["one"]).append_column(
            "pid", pa.array(hash_partition(k, P))
        )

    keyed = j.map_batches(pid, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def kernel(tbl: pa.Table) -> pa.Table:
        pk = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = tbl.column("qty").to_numpy(zero_copy_only=False)
        cents = tbl.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk_s, qty_s, cents_s = pk[order], qty[order], cents[order]
        uniq, start, cnt = np.unique(pk_s, return_index=True, return_counts=True)
        sum_qty = np.add.reduceat(qty_s, start)
        row_grp = np.searchsorted(uniq, pk_s)
        small = 5 * qty_s * cnt[row_grp] < sum_qty[row_grp]
        return pa.table(
            {
                "n_small": pa.array(np.asarray([int(small.sum())], dtype=np.int64)),
                "sum_cents": pa.array(
                    np.asarray([int(cents_s[small].sum())], dtype=np.int64)
                ),
            }
        )

    partials = collect_table(
        part_map_groups(keyed, "pid", kernel, P),
        schema=pa.schema([("n_small", pa.int64()), ("sum_cents", pa.int64())]),
    )
    ns = int(pc.sum(partials.column("n_small")).as_py() or 0)
    sc = int(pc.sum(partials.column("sum_cents")).as_py() or 0)
    return pa.table(
        {
            "n_small": pa.array(np.asarray([ns], dtype=np.int64)),
            "sum_cents": pa.array(np.asarray([sc], dtype=np.int64)),
            "avg_yearly": pa.array(
                np.asarray([(sc / 100.0) / 7.0], dtype=np.float64)
            ),
        }
    )


ALL_QUERIES["small_qty_revenue"] = q_small_qty_revenue


def q_image_blob_stats(sf_dir: str):
    """Raster object extraction: per image, threshold the decoded
    h x w payload at >= 128 and count the 4-connected foreground
    components (blobs) with a REAL fused union-find over the actual
    bytes (stages/decode.py payload_blob_stats), plus the exact local
    censuses (foreground pixels, in-row / in-column adjacent pairs,
    2x2 blocks).  Map-only over the bytes — pixels never shuffle.  The
    oracle reproduces every column from the rotated-ramp closed form,
    using the Euler identity C = V - Eh - Ev + Q (exact because the
    stripe pattern is hole-free — verified by exhaustive sweep over
    the full (k0, w, h) spec space; the engine does NOT use the
    identity, so a mismatch would expose either kernel).
    Round 5: the union-find ran in the FUSED pixel pass; this query
    projects the per-image census columns."""
    from .pixel_fused import per_image

    def stats(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "n_fg": batch.column("n_fg"),
                "n_edges_h": batch.column("n_eh2"),
                "n_edges_v": batch.column("n_ev2"),
                "n_quads": batch.column("n_q"),
                "n_blobs": batch.column("n_blobs"),
            }
        )

    return per_image(sf_dir).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["image_blob_stats"] = q_image_blob_stats


def q_grid_knox_st(sf_dir: str):
    """Knox space-time interaction test, grid/day-censused: exact
    ordered pair counts of images that are close in space (Chebyshev
    cell radius 1), close in time (|day lag| <= 1), and close in BOTH,
    against the independence expectation n_space*n_time/n_tot — the
    epidemiology-style clustering screen for tasking bursts.  ONE
    corpus pass builds the bounded (cell, day) count table (keyspace
    <= grid x calendar days, saturating at any corpus scale); marginal
    pair counts are dense 2-D/1-D window convolutions and the joint
    count is 27 sorted-key neighbor probes on the sparse aggregate —
    no image-pair enumeration anywhere.  Self-point pairs removed
    exactly; only the expectation is a mirrored double."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)
    DPACK = np.int64(4096)  # day field width; days < 4096 for any span here

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        key = ik % np.int64(spec.MOD)
        lon_md = corpus_mod._mix(key, spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(key, spec.ST_LAT) % spec.LAT_SPAN_MD
        day = (corpus_mod._mix(key, spec.ST_TIME) % spec.TIME_SPAN_HOURS) // 24
        ck = ((lon_md // W) * np.int64(1000) + lat_md // W) * DPACK + day
        return pa.table({"ck": pa.array(ck)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    ck = agg.column("ck").to_numpy(zero_copy_only=False)
    x = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(ck)
    ck, x = ck[order], x[order]
    n = int(x.sum())
    cell = ck // DPACK
    day = ck % DPACK
    # space marginal: 2-D cell counts, 9-window weighted pair sum
    NX = int(spec.LON_SPAN_MD // W) + 1
    NY = int(spec.LAT_SPAN_MD // W) + 1
    X2 = np.zeros((NX + 2, NY + 2), dtype=np.int64)
    np.add.at(X2, (cell // 1000 + 1, cell % 1000 + 1), x)
    nbr = sum(
        X2[1 + dx : NX + 1 + dx, 1 + dy : NY + 1 + dy]
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    n_space = int((X2[1 : NX + 1, 1 : NY + 1] * nbr).sum()) - n
    # time marginal: 1-D day counts, [1,1,1] window
    nd = int(spec.TIME_SPAN_HOURS // 24) + 1
    T = np.zeros(nd + 2, dtype=np.int64)
    np.add.at(T, day + 1, x)
    n_time = int((T[1:-1] * (T[:-2] + T[1:-1] + T[2:])).sum()) - n
    # joint: 27 neighbor probes on the sorted sparse (cell, day) keys
    n_st = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dt in (-1, 0, 1):
                nk = ck + (np.int64(dx) * 1000 + dy) * DPACK + dt
                pos = np.searchsorted(ck, nk)
                pos_c = np.minimum(pos, len(ck) - 1)
                hit = ck[pos_c] == nk
                n_st += int((x[hit] * x[pos_c[hit]]).sum())
    n_st -= n
    n_tot = n * n - n
    knox_expected = (1.0 * n_space) * n_time / (1.0 * n_tot)
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n": one(n), "n_space": one(n_space), "n_time": one(n_time),
            "n_st": one(n_st), "n_tot": one(n_tot),
            "knox_expected": pa.array(
                np.asarray([knox_expected], dtype=np.float64)
            ),
        }
    )


ALL_QUERIES["grid_knox_st"] = q_grid_knox_st


def q_cell_nearest_neighbor(sf_dir: str):
    """Nearest-neighbor spacing of the occupied-cell pattern (the
    Clark-Evans ingredient): per occupied 4-degree cell, the exact
    squared Euclidean distance (in cell units) to the nearest OTHER
    occupied cell.  ONE bounded cell-count corpus pass; the NN search
    is an exact dense pairwise minimum over the <=3k occupied cells
    (driver-trivial at any corpus scale — the grid is geometry-
    bounded).  All-integer output, no float anywhere."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_LAT) % spec.LAT_SPAN_MD
        return pa.table({"ck": pa.array((lon_md // W) * np.int64(1000) + lat_md // W)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "ck", count_name="n")
    key = agg.column("ck").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    cx = key // 1000
    cy = key % 1000
    if len(key) < 2:  # a lone cell has no neighbor (oracle: empty join)
        e = pa.array(np.zeros(0, dtype=np.int64))
        return pa.table({"cell_x": e, "cell_y": e, "n_images": e, "nn_d2": e})
    # blocked row-wise min (round-4 ADVICE): peak memory O(block * k)
    # instead of three dense k x k int64 matrices at full grid occupancy
    k = len(cx)
    nn = np.empty(k, dtype=np.int64)
    for lo in range(0, k, 256):
        hi = min(lo + 256, k)
        dx = cx[lo:hi, None] - cx[None, :]
        dy = cy[lo:hi, None] - cy[None, :]
        d2 = dx * dx + dy * dy
        d2[np.arange(lo, hi) - lo, np.arange(lo, hi)] = np.iinfo(np.int64).max
        nn[lo:hi] = d2.min(axis=1)
    return pa.table(
        {
            "cell_x": pa.array(cx),
            "cell_y": pa.array(cy),
            "n_images": pa.array(cnt),
            "nn_d2": pa.array(nn),
        }
    )


ALL_QUERIES["cell_nearest_neighbor"] = q_cell_nearest_neighbor


def q_cell_trend_mk(sf_dir: str):
    """Emerging-hotspot detection: per 4-degree grid cell, the exact
    Mann-Kendall trend statistic S = sum_{i<j} sign(x_j - x_i) over
    the cell's DENSE monthly acquisition-count series (missing months
    count 0, range = the corpus's global [first, last] month) — the
    nonparametric monotone-trend test GIS suites run under "emerging
    hot spot analysis", here over acquisition cadence.  One corpus
    pass packs (cell, month) into a single int64 code and reduces
    bounded tree partials (the grid_hotspots shape); the aggregate is
    GEOMETRY-bounded (<= 85x33 cells x months), so the dense
    pairwise sign sweep is driver-trivial at any corpus scale and
    runs vectorized over upper-triangle index pairs in cell blocks.
    The oracle mirrors the dense scaffold + pair self-join in SQL;
    S is pure integer, no ties correction needed for the label."""
    from ..stages.hashagg import tree_count_sum_by_key

    W = np.int64(4000)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        key = ik % np.int64(spec.MOD)
        lon_md = corpus_mod._mix(key, spec.ST_LON) % spec.LON_SPAN_MD
        lat_md = corpus_mod._mix(key, spec.ST_LAT) % spec.LAT_SPAN_MD
        hours = corpus_mod._mix(key, spec.ST_TIME) % spec.TIME_SPAN_HOURS
        epoch_us = np.datetime64(
            spec.TIME_EPOCH.replace(" ", "T"), "us"
        ).astype(np.int64)
        mon = (
            (epoch_us + hours * np.int64(3_600_000_000))
            .view("datetime64[us]")
            .astype("datetime64[M]")
            .astype(np.int64)
        )  # months since 1970-01; spec range spans < 1024 months
        ck = (lon_md // W) * np.int64(1000) + lat_md // W
        return pa.table({"code": pa.array(ck * np.int64(1024) + mon)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "code", count_name="n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    cnt = agg.column("n").to_numpy(zero_copy_only=False)
    ck = code // 1024
    mon = code % 1024
    lo, hi = int(mon.min()), int(mon.max())
    M = hi - lo + 1
    cells, cell_inv = np.unique(ck, return_inverse=True)
    C = len(cells)
    X = np.zeros((C, M), dtype=np.int64)
    X[cell_inv, mon - lo] = cnt
    iu, ju = np.triu_indices(M, 1)
    s_stat = np.empty(C, dtype=np.int64)
    for b0 in range(0, C, 256):  # block the (C x M(M-1)/2) pair sweep
        b1 = min(b0 + 256, C)
        s_stat[b0:b1] = np.sign(X[b0:b1][:, ju] - X[b0:b1][:, iu]).sum(axis=1)
    trend = np.where(s_stat > 0, "inc", np.where(s_stat < 0, "dec", "flat"))
    return pa.table(
        {
            "cell_x": pa.array(cells // 1000),
            "cell_y": pa.array(cells % 1000),
            "n_images": pa.array(X.sum(axis=1)),
            "s_stat": pa.array(s_stat),
            "trend": pa.array(trend.tolist(), type=pa.string()),
        }
    )


ALL_QUERIES["cell_trend_mk"] = q_cell_trend_mk


def q_dedup_index_quality(sf_dir: str):
    """Index-quality eval for the near-dup arc (the dedup analog of
    ann_recall_eval): how well do MinHash-estimated candidates
    (est_jaccard >= 0.5) match the EXACT n-gram Jaccard >= 0.5 pair
    set?  Both pair streams run distributed, union under a side tag,
    one pair-key hash exchange counts the overlap, and a 1-row tree
    fold yields precision/recall in exact integer ppm.  The curator's
    go/no-go check before trusting the approximate dedup at scale."""
    from ..stages.hashagg import count_sum_by_key, tree_count_sum_by_key

    BIG = np.int64(1) << 32

    def pack_est(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("est_jaccard"), 0.5).to_numpy(zero_copy_only=False)
        a = b.column("doc_a").to_numpy(zero_copy_only=False)[keep]
        bb = b.column("doc_b").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"k": pa.array(a * BIG + bb), "tag": pa.array(np.ones(len(a), np.int64))})

    def pack_true(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy(zero_copy_only=False)
        bb = b.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(a * BIG + bb), "tag": pa.array(np.full(len(a), 2, np.int64))})

    est = q_minhash_lsh_dups(sf_dir).map_batches(
        pack_est, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    true_pairs = q_ngram_jaccard_dups(sf_dir)
    if not isinstance(true_pairs, ray.data.Dataset):
        true_pairs = ray.data.from_arrow(true_pairs)
    tru = true_pairs.map_batches(
        pack_true, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tagged = count_sum_by_key(est.union(tru), "k", sum_cols=("tag",), count_name="__n")

    def fold(b: pa.Table) -> pa.Table:
        t = b.column("tag").to_numpy(zero_copy_only=False)
        c = np.bincount(t, minlength=4)
        return pa.table(
            {
                "z": pa.array(np.zeros(1, np.int64)),
                "n_est_only": pa.array([c[1]]),
                "n_true_only": pa.array([c[2]]),
                "n_both": pa.array([c[3]]),
            }
        )

    g = tree_count_sum_by_key(
        tagged.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "z", sum_cols=("n_est_only", "n_true_only", "n_both"), count_name="__n",
    )
    both = g.column("n_both").to_numpy(zero_copy_only=False)[0]
    n_est = g.column("n_est_only").to_numpy(zero_copy_only=False)[0] + both
    n_true = g.column("n_true_only").to_numpy(zero_copy_only=False)[0] + both
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_est": one(n_est), "n_true": one(n_true), "n_both": one(both),
            "precision_ppm": one(both * np.int64(1_000_000) // n_est),
            "recall_ppm": one(both * np.int64(1_000_000) // n_true),
        }
    )


ALL_QUERIES["dedup_index_quality"] = q_dedup_index_quality


def q_tile_freshness_hist(sf_dir: str):
    """Mosaic freshness audit: per tile, the age in days of its NEWEST
    image (hours remaining to the end of the acquisition window, floor
    days), folded into an age histogram — the 'how stale is my best
    mosaic' report.  Tile explode -> per-tile max acquisition hour via
    the shuffle-free tree max (bounded tile space, the tile-manifest
    pattern) -> bounded day histogram driver-side."""
    from ..stages.hashagg import tree_max_by_key
    from ..stages.tiles import explode_tiles

    def explode_with_hrs(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        batch = batch.append_column("hrs", pa.array(hrs.astype(np.int64)))
        return explode_tiles(batch, ("hrs",))

    def batch_max(b: pa.Table) -> pa.Table:
        t = b.column("tile_id").to_numpy(zero_copy_only=False)
        h = b.column("hrs").to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        ut, start = np.unique(t[order], return_index=True)
        return pa.table(
            {"tile_id": pa.array(ut), "hrs": pa.array(np.maximum.reduceat(h[order], start))}
        )

    exploded = src.images_dataset(sf_dir, light=True).map_batches(
        explode_with_hrs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).map_batches(batch_max, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_max_by_key(exploded, "tile_id", "hrs")
    hrs = agg.column("hrs").to_numpy(zero_copy_only=False)
    age = (np.int64(spec.TIME_SPAN_HOURS) - hrs) // 24
    ua, cnt = np.unique(age, return_counts=True)
    return pa.table(
        {"age_days": pa.array(ua), "n_tiles": pa.array(cnt.astype(np.int64))}
    )


ALL_QUERIES["tile_freshness_hist"] = q_tile_freshness_hist


def q_user_lifespan_hist(sf_dir: str):
    """User-lifetime distribution: days between a user's first and last
    event (calendar-day difference of the truncated timestamps),
    histogrammed — churn-analysis raw material on top of the
    user_features exchange."""
    from ..stages.hashagg import tree_count_sum_by_key

    feats = q_user_features(sf_dir)

    def span(b: pa.Table) -> pa.Table:
        first = b.column("first_ts").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        last = b.column("last_ts").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        return pa.table({"days": pa.array(last - first)})

    agg = tree_count_sum_by_key(
        feats.map_batches(span, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "days", count_name="n_users",
    )
    d = agg.column("days").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "days": pa.array(d[order]),
            "n_users": pa.array(agg.column("n_users").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["user_lifespan_hist"] = q_user_lifespan_hist


def _sat_pixel_hist_agg(sf_dir: str) -> pa.Table:
    """Shared per-satellite decoded-pixel histogram aggregate
    (code = sat_id*256 + value, n_pixels), consumed by
    sat_equalization_lut / sat_otsu_threshold / sat_pixel_gini.
    Round 5: one cheap fold over the FUSED per-image metrics pass
    (pipelines/pixel_fused) instead of a dedicated decode scan."""
    from .pixel_fused import sat_hist

    return sat_hist(sf_dir)


def q_sat_equalization_lut(sf_dir: str):
    """Histogram-equalization lookup table per satellite: the classic
    radiometric-normalization preprocessing step before mosaicking
    imagery from mixed sensors.  Pooled histogram via
    _sat_pixel_hist_agg; the cumulative LUT (cum * 255 // total, exact
    integer) is a window scan over the tiny aggregate."""
    agg = _sat_pixel_hist_agg(sf_dir)
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n_pixels").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, n = code[order], n[order]
    sat = code // 256
    val = code % 256
    # per-sat cumulative -> LUT (bounded: sats x 256 rows)
    us, start = np.unique(sat, return_index=True)
    cum = np.cumsum(n)
    base = np.zeros_like(cum)
    base[start[1:]] = cum[start[1:] - 1]
    base = np.maximum.accumulate(base)
    cum = cum - base
    totals = np.append(cum[np.append(start[1:] - 1, len(cum) - 1)], 0)[:-1]
    tot_el = totals[np.searchsorted(us, sat)]
    return pa.table(
        {
            "sat_id": pa.array(sat),
            "value": pa.array(val),
            "n_pixels": pa.array(n),
            "lut": pa.array(cum * np.int64(255) // tot_el),
        }
    )


ALL_QUERIES["sat_equalization_lut"] = q_sat_equalization_lut


def _ragged_ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for the ragged-index construction of
    per-image pixel coordinates (all-int64, no Python loop)."""
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(starts, counts)


def q_sat_border_contrast(sf_dir: str):
    """Sensor-artifact screen: per satellite, mean decoded brightness of
    each image's 1-pixel BORDER vs its interior (vignetting / dead-edge
    detection).  The border index set (top row, bottom row, side
    columns) is built as vectorized ragged ranges over the flat Arrow
    payload buffer — real pixel gathers, no per-row Python (kernel:
    stages/decode.payload_row_border_sums, run in the FUSED pixel
    pass) — and only bounded per-satellite integer partials reduce.
    Means are exact integer milli (1000*sum // n)."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    def fold(batch: pa.Table) -> pa.Table:
        sat = batch.column("sat_id")
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        npx = batch.column("n_px").to_numpy(zero_copy_only=False)
        total = batch.column("pix_sum").to_numpy(zero_copy_only=False)
        border = batch.column("border_sum").to_numpy(zero_copy_only=False)
        b_px = 2 * w + 2 * h - 4
        return pa.table(
            {
                "sat_id": sat,
                "border_px": pa.array(b_px),
                "border_sum": pa.array(border),
                "inner_px": pa.array(npx - b_px),
                "inner_sum": pa.array(total - border),
            }
        )

    agg = tree_count_sum_by_key(
        per_image(sf_dir).map_batches(
            fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "sat_id",
        sum_cols=("border_px", "border_sum", "inner_px", "inner_sum"),
        count_name="n_images",
    )
    s = agg.column("sat_id").to_numpy(zero_copy_only=False)
    order = np.argsort(s)
    g = lambda c: agg.column(c).to_numpy(zero_copy_only=False)[order]
    bpx, bsum, ipx, isum = g("border_px"), g("border_sum"), g("inner_px"), g("inner_sum")
    return pa.table(
        {
            "sat_id": pa.array(s[order]),
            "n_images": pa.array(g("n_images")),
            "border_mean_milli": pa.array(np.int64(1000) * bsum // bpx),
            "inner_mean_milli": pa.array(np.int64(1000) * isum // ipx),
            "contrast_milli": pa.array(
                np.int64(1000) * bsum // bpx - np.int64(1000) * isum // ipx
            ),
        }
    )


ALL_QUERIES["sat_border_contrast"] = q_sat_border_contrast


def q_events_type_entropy(sf_dir: str):
    """Behavioral predictability: Shannon entropy of each event type's
    next-type transition distribution (low entropy = deterministic
    funnel step, high = branching).  Transition counts come from the
    distributed events_transitions exchange; the entropy fold runs on
    the bounded types^2 table, each -p*ln(p) term floored to integer
    micros BEFORE summing (the docs_tfidf convention: the floor absorbs
    the <=1-ulp libm ln drift and makes the sum order-free)."""
    tab = q_events_transitions(sf_dir)
    a = np.asarray(tab.column("from_type"), dtype=object)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    ua, codes = np.unique(a, return_inverse=True)
    tot = np.bincount(codes, weights=n.astype(np.float64)).astype(np.int64)
    p = n / (1.0 * tot[codes])
    term = np.floor(-(p) * np.log(p) * 1e6).astype(np.int64)
    ent = np.zeros(len(ua), np.int64)
    np.add.at(ent, codes, term)  # types^2 rows — driver-trivial
    branches = np.bincount(codes).astype(np.int64)
    return pa.table(
        {
            "from_type": pa.array(ua.astype("U"), type=pa.string()),
            "n_transitions": pa.array(tot),
            "n_branches": pa.array(branches),
            "entropy_micro": pa.array(ent),
        }
    )


ALL_QUERIES["events_type_entropy"] = q_events_type_entropy


def q_order_cohort_retention(sf_dir: str):
    """Relational cohort retention: customers grouped by the calendar
    quarter of their FIRST order; retention = share who ordered again
    the very next quarter.  One custkey-hash exchange, per-partition
    segment kernel (min quarter + next-quarter membership), bounded
    cohort partials through the tree."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    od = src.table_dataset(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def enc(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[M]").astype(np.int64)
        q = (1970 + months // 12) * 4 + (months % 12) // 3
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        # per-batch (cust, quarter) pre-distinct combiner
        key = np.unique(ck * np.int64(100000) + q)
        return pa.table(
            {
                "o_custkey": pa.array(key // 100000),
                "q": pa.array(key % 100000),
                "__part": pa.array(hash_partition(key // 100000, 64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        ck = group.column("o_custkey").to_numpy(zero_copy_only=False)
        q = group.column("q").to_numpy(zero_copy_only=False)
        # re-distinct across batches (the combiner dedups per batch only)
        key = np.unique(ck * np.int64(100000) + q)
        ck, q = key // 100000, key % 100000
        start = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        q0 = q[start]  # min quarter per customer (q sorted within cust)
        nxt = np.zeros(len(start), np.int64)
        # retained iff (cust, q0+1) exists: the element AFTER q0 in the
        # customer's sorted distinct quarters is q0+1
        after = np.minimum(start + 1, len(q) - 1)
        same_cust = np.r_[ck[after] == ck[start]]
        nxt[(q[after] == q0 + 1) & same_cust] = 1
        return pa.table(
            {
                "cohort_q": pa.array(q0),
                "n_customers": pa.array(np.ones(len(q0), np.int64)),
                "n_retained": pa.array(nxt),
            }
        )

    parted = od.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    per_part = _pm(parted, lambda g: fold(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(
        per_part, "cohort_q", sum_cols=("n_customers", "n_retained"), count_name="__n"
    )
    cq = agg.column("cohort_q").to_numpy(zero_copy_only=False)
    order = np.argsort(cq)
    nc = agg.column("n_customers").to_numpy(zero_copy_only=False)[order]
    nr = agg.column("n_retained").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "cohort_q": pa.array(cq[order]),
            "n_customers": pa.array(nc),
            "n_retained": pa.array(nr),
            "retention_ppm": pa.array(nr * np.int64(1_000_000) // nc),
        }
    )


ALL_QUERIES["order_cohort_retention"] = q_order_cohort_retention


def q_events_pareto_users(sf_dir: str):
    """Pareto concentration: the minimal number of users (by descending
    spend, integer cents) whose running total first reaches 80% of all
    spend — 'how top-heavy is the user base'.  Per-user totals stay
    distributed; a span-bucketed histogram (counts + cents per
    65536-cent span) locates the crossing span, and only THAT span's
    values are fetched — the events_rfm_cells selection machinery
    pointed at a running-total threshold instead of a rank."""
    from ..stages.hashagg import count_sum_by_key, tree_count_sum_by_key
    from ..util import collect_table

    ev = src.table_dataset(sf_dir, "events", columns=["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "m": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    per_user = count_sum_by_key(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "user_id", sum_cols=("m",), count_name="__n",
    ).materialize()  # two passes (span histogram + crossing-span fetch)

    SW = np.int64(65536)

    def spans(b: pa.Table) -> pa.Table:
        m = b.column("m").to_numpy(zero_copy_only=False)
        return pa.table(
            {"s": pa.array(m // SW), "cents": pa.array(m), "cnt": pa.array(np.ones(len(m), np.int64))}
        )

    hist = tree_count_sum_by_key(
        per_user.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "s", sum_cols=("cents", "cnt"), count_name="__n",
    )
    s = hist.column("s").to_numpy(zero_copy_only=False)
    sc = hist.column("cents").to_numpy(zero_copy_only=False)
    cn = hist.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(-s)  # descending spend spans
    s, sc, cn = s[order], sc[order], cn[order]
    total = int(sc.sum())
    n_users_total = int(cn.sum())
    cum = np.cumsum(sc)
    # first span where the running total crosses 80% (cum*5 >= total*4)
    i = int(np.searchsorted(cum * 5, total * 4))
    prior_cents = int(cum[i - 1]) if i else 0
    prior_users = int(cn[:i].sum())
    want = s[i]

    def in_span(b: pa.Table) -> pa.Table:
        m = b.column("m").to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array(m[m // SW == want])})

    vals = collect_table(
        per_user.map_batches(in_span, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema([("m", pa.int64())]),
    ).column("m").to_numpy(zero_copy_only=False)
    vals = np.sort(vals)[::-1]
    lc = prior_cents + np.cumsum(vals)
    j = int(np.searchsorted(lc * 5, total * 4))
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_users_80pct": one(prior_users + j + 1),
            "n_users_total": one(n_users_total),
            "total_cents": one(total),
            "covered_cents": one(int(lc[j])),
        }
    )


ALL_QUERIES["events_pareto_users"] = q_events_pareto_users


def q_sat_seasonality_chi2(sf_dir: str):
    """Seasonality screen: per satellite, the chi-square statistic of
    its quarterly acquisition counts against a uniform null — flags
    satellites with strongly seasonal tasking.  One bounded (sat x 4)
    tree aggregate; each (o - e)^2/e term floors to integer micros
    before the 4-term sum (order-free, e = total/4.0 mirrored as one
    double expression)."""
    from ..stages.hashagg import tree_count_sum_by_key

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        ts = (
            np.datetime64(spec.TIME_EPOCH, "us")
            + hrs.astype("timedelta64[h]").astype("timedelta64[us]")
        )
        months = ts.astype("datetime64[M]").astype(np.int64)
        qtr = (months % 12) // 3
        return pa.table({"code": pa.array(sat * np.int64(4) + qtr)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(enc, "code", count_name="n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    sat = code // 4
    us = np.unique(sat)
    o = np.zeros((len(us), 4), np.int64)
    o[np.searchsorted(us, sat), code % 4] = n
    tot = o.sum(axis=1)
    e = tot / 4.0
    term = np.floor((o - e[:, None]) * (o - e[:, None]) / e[:, None] * 1e6).astype(np.int64)
    return pa.table(
        {
            "sat_id": pa.array(us),
            "n_images": pa.array(tot),
            "chi2_micro": pa.array(term.sum(axis=1)),
        }
    )


ALL_QUERIES["sat_seasonality_chi2"] = q_sat_seasonality_chi2


def q_embedding_norm_hist(sf_dir: str):
    """Embedding-health histogram: L2 norms on an exact integer lattice
    (each element quantized to floor(x * 2^20) first, squared-sum as
    int64) bucketed by norm2q // 2^36 — degenerate / exploding vectors
    show up as mass at the edges.  Map-only partials, bounded buckets."""
    from ..stages.hashagg import tree_count_sum_by_key

    emb = src.table_dataset(sf_dir, "embeddings", columns=["embedding"])
    Q = np.float64(1 << 20)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()), "n_vecs": pa.array([], pa.int64())})
        M = ann_stage._emb_matrix(b.column("embedding"))
        qm = np.floor(M * Q).astype(np.int64)
        norm2q = (qm * qm).sum(axis=1)
        bucket = norm2q >> np.int64(36)
        ub, cnt = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(ub), "n_vecs": pa.array(cnt.astype(np.int64))})

    agg = tree_count_sum_by_key(
        emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "bucket", sum_cols=("n_vecs",), count_name="__n",
    )
    bk = agg.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(bk)
    return pa.table(
        {
            "bucket": pa.array(bk[order]),
            "n_vecs": pa.array(agg.column("n_vecs").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["embedding_norm_hist"] = q_embedding_norm_hist


def q_order_fulfillment_lag_hist(sf_dir: str):
    """Operational-latency distribution: days between an order and its
    FIRST lineitem shipment, histogrammed.  Per-order min ship day via
    one orderkey-hash exchange + segment min (orders are corpus-sized,
    so no tree/driver state), one PK lookup-join attaches the order
    date, and only the bounded day histogram reduces."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    li = src.table_dataset(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def enc(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        day = b.column("l_shipdate").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        # per-batch min combiner
        order = np.argsort(ok, kind="stable")
        uo, start = np.unique(ok[order], return_index=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uo),
                "day": pa.array(np.minimum.reduceat(day[order], start)),
                "__part": pa.array(hash_partition(uo, 64)),
            }
        )

    def part_min(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        d = group.column("day").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        uo, start = np.unique(ok[order], return_index=True)
        return pa.table(
            {"l_orderkey": pa.array(uo), "day": pa.array(np.minimum.reduceat(d[order], start))}
        )

    first_ship = _pm(li.map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ), lambda g: part_min(g.drop_columns(["__part"])))
    od = src.table_dataset(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def od_enc(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "oday": pa.array(
                    b.column("o_orderdate").to_numpy(zero_copy_only=False)
                    .astype("datetime64[D]").astype(np.int64)
                ),
            }
        )

    j = lookup_join(
        first_ship, "l_orderkey", ("day",),
        od.map_batches(od_enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "o_orderkey", "oday",
    )
    lag = j.map_batches(
        lambda b: pa.table(
            {
                "lag_days": pa.array(
                    b.column("day").to_numpy(zero_copy_only=False)
                    - b.column("oday").to_numpy(zero_copy_only=False)
                )
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    agg = tree_count_sum_by_key(lag, "lag_days", count_name="n_orders")
    d = agg.column("lag_days").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "lag_days": pa.array(d[order]),
            "n_orders": pa.array(agg.column("n_orders").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["order_fulfillment_lag_hist"] = q_order_fulfillment_lag_hist


def q_caption_edit_dist_hist(sf_dir: str):
    """String-similarity audit over the near-dup graph: the edit
    distance between the two captions of every phash near-dup pair,
    histogrammed — re-captures should have near-identical metadata, so
    mass at high distances flags mislabeled assets.  Captions derive
    from the pair keys in place (no join back to the corpus); the
    Levenshtein kernel is vectorized ACROSS pairs (stages/text.py
    batch_levenshtein, DP rows over a couple dozen caption chars);
    only the bounded distance histogram reduces."""
    from ..stages.hashagg import tree_count_sum_by_key

    def captions_of(keys: np.ndarray) -> np.ndarray:
        ks = keys.astype("U20")
        c1 = (65 + corpus_mod._mix(keys % np.int64(spec.MOD), spec.ST_CAP1) % 26).astype(
            np.uint32
        ).view("U1")
        c2 = (65 + corpus_mod._mix(keys % np.int64(spec.MOD), spec.ST_CAP2) % 26).astype(
            np.uint32
        ).view("U1")
        return np.char.add(
            np.char.add(np.char.add(np.char.add("img-", ks), "-"), c1), c2
        ).astype(object)

    def dist(b: pa.Table) -> pa.Table:
        ka = pc.cast(pc.utf8_slice_codeunits(b.column("image_a"), 4), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        kb = pc.cast(pc.utf8_slice_codeunits(b.column("image_b"), 4), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = text.batch_levenshtein(captions_of(ka), captions_of(kb))
        ud, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"edit_distance": pa.array(ud), "n_pairs": pa.array(cnt.astype(np.int64))}
        )

    pairs = q_phash_near_dup(sf_dir)
    if not isinstance(pairs, ray.data.Dataset):
        pairs = ray.data.from_arrow(pairs)
    agg = tree_count_sum_by_key(
        pairs.map_batches(dist, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "edit_distance", sum_cols=("n_pairs",), count_name="__n",
    )
    d = agg.column("edit_distance").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "edit_distance": pa.array(d[order]),
            "n_pairs": pa.array(agg.column("n_pairs").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["caption_edit_dist_hist"] = q_caption_edit_dist_hist


def q_phash_bit_balance(sf_dir: str):
    """LSH-index health: the set-fraction of every phash bit position
    (a skewed bit makes its band's buckets collapse and the near-dup
    index degenerate).  Map-only: 62 vectorized shift-and-popcount
    partials per batch straight off the lineitem keys, one 62-key tree;
    fractions are exact integer ppm."""
    from ..stages.hashagg import tree_count_sum_by_key

    def partial(b: pa.Table) -> pa.Table:
        key, ok = corpus_mod.image_key_from_lineitem(b)
        ph = corpus_mod.phash_for_keys(key, ok)
        bits = np.arange(62, dtype=np.int64)
        n_set = np.array([int(((ph >> b_) & 1).sum()) for b_ in bits], dtype=np.int64)
        return pa.table(
            {
                "bit": pa.array(bits),
                "n_set": pa.array(n_set),
                "n_images": pa.array(np.full(62, len(ph), dtype=np.int64)),
            }
        )

    agg = tree_count_sum_by_key(
        src.lineitem_dataset(sf_dir).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "bit", sum_cols=("n_set", "n_images"), count_name="__n",
    )
    b = agg.column("bit").to_numpy(zero_copy_only=False)
    order = np.argsort(b)
    ns = agg.column("n_set").to_numpy(zero_copy_only=False)[order]
    ni = agg.column("n_images").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "bit": pa.array(b[order]),
            "n_set": pa.array(ns),
            "set_ppm": pa.array(ns * np.int64(1_000_000) // ni),
        }
    )


ALL_QUERIES["phash_bit_balance"] = q_phash_bit_balance


def q_mktsegment_revenue_share(sf_dir: str):
    """Revenue share per customer market segment: orders stream through
    ONE PK lookup-join against the corpus-sized customer table (custkey
    -> segment code; both sides co-partition through the tagged-union
    exchange — nothing broadcasts), then a 5-key tree and integer-ppm
    shares."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import tree_count_sum_by_key

    SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    smap = {s: i for i, s in enumerate(SEGS)}

    od = src.table_dataset(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def od_enc(b: pa.Table) -> pa.Table:
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "cents": pa.array(np.floor(tp * 100.0).astype(np.int64)),
            }
        )

    cu = src.table_dataset(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def cu_enc(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "seg": pa.array(_str_codes(b.column("c_mktsegment"), smap)),
            }
        )

    j = lookup_join(
        od.map_batches(od_enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "o_custkey", ("cents",),
        cu.map_batches(cu_enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "c_custkey", "seg",
    )
    agg = tree_count_sum_by_key(j, "seg", sum_cols=("cents",), count_name="n_orders")
    sg = agg.column("seg").to_numpy(zero_copy_only=False)
    order = np.argsort(sg)
    cents = agg.column("cents").to_numpy(zero_copy_only=False)[order]
    total = cents.sum()
    return pa.table(
        {
            "c_mktsegment": pa.array(
                np.asarray(SEGS, dtype=object)[sg[order]].astype("U"), type=pa.string()
            ),
            "n_orders": pa.array(agg.column("n_orders").to_numpy(zero_copy_only=False)[order]),
            "revenue_cents": pa.array(cents),
            "share_ppm": pa.array(cents * np.int64(1_000_000) // total),
        }
    )


ALL_QUERIES["mktsegment_revenue_share"] = q_mktsegment_revenue_share


def q_supplier_region_balance(sf_dir: str):
    """Snowflake dim rollup: supplier account balances aggregated
    through the supplier -> nation -> region chain.  The corpus side is
    one bounded 25-key tree; both dim attaches are driver-side on the
    25-row result (the nation_order_revenue pattern, one level deeper)."""
    from ..stages.hashagg import tree_count_sum_by_key

    su = src.table_dataset(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def enc(b: pa.Table) -> pa.Table:
        bal = b.column("s_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nk": pa.array(b.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)),
                "cents": pa.array(np.floor(bal * 100.0).astype(np.int64)),
            }
        )

    agg = tree_count_sum_by_key(
        su.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "nk", sum_cols=("cents",), count_name="n_suppliers",
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nr = nat.column("n_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    rk = reg.column("r_regionkey").to_numpy(zero_copy_only=False).astype(np.int64)
    rn = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    srt = np.argsort(nk)
    region_of = nr[srt][np.searchsorted(nk[srt], agg.column("nk").to_numpy(zero_copy_only=False))]
    srt_r = np.argsort(rk)
    # fold the 25 nation rows to regions
    cents = agg.column("cents").to_numpy(zero_copy_only=False)
    nsup = agg.column("n_suppliers").to_numpy(zero_copy_only=False)
    ur = np.unique(region_of)
    pos = np.searchsorted(ur, region_of)
    rc = np.zeros(len(ur), np.int64)
    rs = np.zeros(len(ur), np.int64)
    np.add.at(rc, pos, cents)
    np.add.at(rs, pos, nsup)
    names = rn[srt_r][np.searchsorted(rk[srt_r], ur)]
    return pa.table(
        {
            "r_name": pa.array(names.astype("U"), type=pa.string()),
            "n_suppliers": pa.array(rs),
            "bal_cents": pa.array(rc),
        }
    )


ALL_QUERIES["supplier_region_balance"] = q_supplier_region_balance


def q_image_corpus_release(sf_dir: str):
    """The composed IMAGE training-corpus release (the multimodal twin
    of corpus_release): quality gate (cloud <= 0.30, clear >= 50) ->
    phash near-dup removal among the SURVIVORS (banded LSH pairs, CC,
    max-clear/min-key keeper, distributed anti-join — never a
    driver-resident drop set) -> deterministic hash split -> per-split
    release manifest (image count + total pixel payload).  Pixels never
    move; the gate runs before the pair exchange so dedup work scales
    with the accepted corpus only."""
    from ..stages import dedup as dedup_stage
    from ..stages import dedup_finalize as dfz
    from ..stages import graph
    from ..stages.hashagg import tree_count_sum_by_key

    M = np.int64(spec.MOD)

    def gate_mask(key: np.ndarray) -> np.ndarray:
        km = key % M
        cloud_mi = corpus_mod._mix(km, spec.ST_CLOUD) % 1001
        clear = corpus_mod._mix(km, spec.ST_CLEAR) % 101
        return (cloud_mi <= 300) & (clear >= 50)

    def gated_phash(b: pa.Table) -> pa.Table:
        key, ok = corpus_mod.image_key_from_lineitem(b)
        m = gate_mask(key)
        key, ok = key[m], ok[m]
        return pa.table(
            {"image_key": pa.array(key), "phash": pa.array(corpus_mod.phash_for_keys(key, ok))}
        )

    gated = src.lineitem_dataset(sf_dir).map_batches(
        gated_phash, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    pairs = dedup_stage.phash_near_dup(gated).map_batches(
        lambda b: pa.table(
            {
                "ka": pc.cast(pc.utf8_slice_codeunits(b.column("image_a"), 4), pa.int64()),
                "kb": pc.cast(pc.utf8_slice_codeunits(b.column("image_b"), 4), pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    drop = dfz.drop_non_best_members(graph.connected_components(pairs, "ka", "kb"))

    def payload(b: pa.Table) -> pa.Table:
        key, _ = corpus_mod.image_key_from_lineitem(b)
        key = key[gate_mask(key)]
        km = key % M
        w = spec.IMG_WH_MIN + corpus_mod._mix(km, spec.ST_W) % spec.IMG_WH_MOD
        h = spec.IMG_WH_MIN + corpus_mod._mix(km, spec.ST_H) % spec.IMG_WH_MOD
        bkt = corpus_mod._mix(km, spec.ST_SPLIT) % 100
        split = np.where(
            bkt < spec.SPLIT_TRAIN_PCT, 0, np.where(bkt < spec.SPLIT_VAL_PCT, 1, 2)
        ).astype(np.int64)
        return pa.table(
            {"image_key": pa.array(key), "split": pa.array(split), "px": pa.array(w * h)}
        )

    stream = src.lineitem_dataset(sf_dir).map_batches(
        payload, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    surv = dfz.anti_join_keys(stream, "image_key", ("split", "px"), drop)
    agg = tree_count_sum_by_key(
        surv.map_batches(
            lambda b: b.select(["split", "px"]),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        ),
        "split", sum_cols=("px",), count_name="n_images",
    )
    sp = agg.column("split").to_numpy(zero_copy_only=False)
    order = np.argsort(sp)
    names = np.asarray(["train", "val", "test"], dtype=object)
    return pa.table(
        {
            "split": pa.array(names[sp[order]].astype("U"), type=pa.string()),
            "n_images": pa.array(agg.column("n_images").to_numpy(zero_copy_only=False)[order]),
            "total_px": pa.array(agg.column("px").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["image_corpus_release"] = q_image_corpus_release


def q_image_iou_hist(sf_dir: str):
    """Footprint-overlap quality histogram: IoU of every STRICTLY
    overlapping image-footprint pair, in 10%-band buckets — mosaic
    redundancy analysis (high-IoU mass = wasted capture).  Same
    grid-bucketed self-join as image_density (cell = radius 500 md >=
    the 398 md max centroid distance of overlapping boxes, 3x3 probes,
    one cell-hash exchange, segmented cross-product candidates); each
    unordered pair is emitted exactly once (point-cell + key ordering);
    IoU is exact integer md^2 (inter*1e6 // union)."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    R = np.int64(spec.DENSITY_RADIUS_MD)
    STRIDE = np.int64(1024)

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        x, y, hw = corpus_mod.geom_md_from_keys(ik)
        cx, cy = x // R, y // R
        parts = {k: [] for k in ("cell", "key", "x", "y", "hw", "kind")}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts["cell"].append((cx + dx) * STRIDE + (cy + dy))
                parts["key"].append(ik)
                parts["x"].append(x)
                parts["y"].append(y)
                parts["hw"].append(hw)
                parts["kind"].append(
                    np.zeros(len(ik), np.int8) if dx == 0 and dy == 0
                    else np.full(len(ik), 1, np.int8)
                )
        c = np.concatenate(parts["cell"])
        return pa.table(
            {
                "cell": pa.array(c),
                "key": pa.array(np.concatenate(parts["key"])),
                "x": pa.array(np.concatenate(parts["x"])),
                "y": pa.array(np.concatenate(parts["y"])),
                "hw": pa.array(np.concatenate(parts["hw"])),
                "kind": pa.array(np.concatenate(parts["kind"])),
                "__part": pa.array(hash_partition(c, 64)),
            }
        )

    def pairs_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.array([], pa.int64()), "n_pairs": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        hw = group.column("hw").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        # dedup duplicated corpus keys (identical rows) per (cell,key,kind)
        order = np.lexsort((kind, key, cell))
        cell, key, x, y, hw, kind = (
            a[order] for a in (cell, key, x, y, hw, kind)
        )
        first = np.ones(len(cell), dtype=bool)
        first[1:] = (
            (cell[1:] != cell[:-1]) | (key[1:] != key[:-1]) | (kind[1:] != kind[:-1])
        )
        cell, key, x, y, hw, kind = (
            a[first] for a in (cell, key, x, y, hw, kind)
        )
        is_pt = kind == 0
        pcell, pkey, px, py, phw = cell[is_pt], key[is_pt], x[is_pt], y[is_pt], hw[is_pt]
        if len(pcell) == 0:
            return empty
        pstart = np.searchsorted(pcell, cell, side="left")
        pend = np.searchsorted(pcell, cell, side="right")
        cnt = pend - pstart
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        qi = np.repeat(np.arange(len(cell), dtype=np.int64), cnt)
        within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pi = np.repeat(pstart, cnt) + within
        # one emission per unordered pair: probe key strictly above the
        # point key; strict interior overlap on both axes
        iw = np.minimum(x[qi] + hw[qi], px[pi] + phw[pi]) - np.maximum(
            x[qi] - hw[qi], px[pi] - phw[pi]
        )
        ih = np.minimum(y[qi] + hw[qi], py[pi] + phw[pi]) - np.maximum(
            y[qi] - hw[qi], py[pi] - phw[pi]
        )
        ok = (key[qi] > pkey[pi]) & (iw > 0) & (ih > 0)
        if not ok.any():
            return empty
        inter = iw[ok] * ih[ok]
        aq = (2 * hw[qi][ok]) * (2 * hw[qi][ok])
        ap = (2 * phw[pi][ok]) * (2 * phw[pi][ok])
        iou_ppm = inter * np.int64(1_000_000) // (aq + ap - inter)
        ub, n = np.unique(iou_ppm // np.int64(100_000), return_counts=True)
        return pa.table({"bucket": pa.array(ub), "n_pairs": pa.array(n.astype(np.int64))})

    parts = (
        _pm(src.images_dataset(sf_dir, light=True)
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), lambda g: pairs_partition(g.drop_columns(["__part"])))
    )
    agg = tree_count_sum_by_key(parts, "bucket", sum_cols=("n_pairs",), count_name="__n")
    bk = agg.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(bk)
    return pa.table(
        {
            "bucket": pa.array(bk[order]),
            "n_pairs": pa.array(agg.column("n_pairs").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["image_iou_hist"] = q_image_iou_hist


def q_sat_rolling_7d_counts(sf_dir: str):
    """Windowed aggregate over a gap-ful calendar: per satellite, the
    rolling 7-day image count at every window day any image supports —
    the tasking-tempo dashboard series.  Each (sat, day) count fans to
    its 7 window days inside the combiner (no per-row fan: counts fan,
    not images), one bounded tree; no sort-based window function ever
    runs on the corpus."""
    from ..stages.hashagg import tree_count_sum_by_key

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        day = hrs // 24
        code = sat * np.int64(100000) + day
        uc, cnt = np.unique(code, return_counts=True)  # per-batch combiner
        # fan each (sat, day) COUNT to window days day..day+6
        fan = (uc[None, :] + np.arange(7, dtype=np.int64)[:, None]).ravel()
        return pa.table(
            {"code": pa.array(fan), "n_images": pa.array(np.tile(cnt.astype(np.int64), 7))}
        )

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(enc, "code", sum_cols=("n_images",), count_name="__n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code = code[order]
    return pa.table(
        {
            "sat_id": pa.array(code // 100000),
            "wday": pa.array(code % 100000),
            "n_images_7d": pa.array(agg.column("n_images").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["sat_rolling_7d_counts"] = q_sat_rolling_7d_counts


def q_events_bounce_rate(sf_dir: str):
    """Session-quality topline: the share of sessions containing exactly
    one event (bounces), in integer ppm.  Rides the sessionize
    partitioning (one user-hash exchange, segment kernel), folds to a
    2-integer partial per partition."""
    from ..stages.hashagg import tree_count_sum_by_key

    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "event_id", "ts"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def fold(group: pa.Table) -> pa.Table:
        sess = timeseries.sessionize_partition(group)
        n = sess.column("n_events").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "z": pa.array(np.zeros(1, np.int64)),
                "n_sessions": pa.array([np.int64(len(n))]),
                "n_bounce": pa.array([np.int64((n == 1).sum())]),
            }
        )

    per_part = _pm(parted, lambda g: fold(g.drop_columns(["__part"])))
    g = tree_count_sum_by_key(per_part, "z", sum_cols=("n_sessions", "n_bounce"), count_name="__n")
    ns = g.column("n_sessions").to_numpy(zero_copy_only=False)[0]
    nb = g.column("n_bounce").to_numpy(zero_copy_only=False)[0]
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_sessions": one(ns),
            "n_bounce": one(nb),
            "bounce_ppm": one(nb * np.int64(1_000_000) // ns),
        }
    )


ALL_QUERIES["events_bounce_rate"] = q_events_bounce_rate


def q_events_hourly_jsonl(sf_dir: str):
    """Source-format breadth: the hourly event rollup computed through a
    JSONL round-trip — the parquet events stream is exported to
    newline-delimited JSON with Ray's distributed write_json (ts as
    epoch micros: JSON has no timestamp type) and read back with
    read_json before the same aggregate as events_hourly.  Proves the
    text-source path end to end; the export is a distributed job, not a
    driver serialization."""
    import hashlib
    import os
    import shutil

    out = f"/tmp/graft_jsonl_{hashlib.sha1(sf_dir.encode()).hexdigest()[:10]}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    ev = src.table_dataset(sf_dir, "events", columns=["ts", "event_type", "value"])

    def to_jsonable(b: pa.Table) -> pa.Table:
        ts_us = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "ts_us": pa.array(ts_us),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
            }
        )

    ev.map_batches(to_jsonable, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).write_json(out)

    back = ray.data.read_json(out)

    def from_jsonable(b: pa.Table) -> pa.Table:
        ts = b.column("ts_us").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table(
            {
                "ts": pa.array(ts),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
            }
        )

    pre = back.map_batches(
        from_jsonable, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).map_batches(
        timeseries.hourly_events_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = pre.groupby(["bucket", "event_type"]).aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Sum("value_cents")
    )
    return _rename(agg, {"count()": "n_events", "sum(value_cents)": "total_value_cents"})


ALL_QUERIES["events_hourly_jsonl"] = q_events_hourly_jsonl


def q_zone_best_image(sf_dir: str):
    """Per-zone BEST image (lowest cloud, key tiebreak) through the
    exact-refinement zone join — the mosaic-selection rule applied to
    vector zones instead of raster tiles (tile_best_image's twin).
    Argmin rides a packed (cloud_mi * 2^52 + key) integer MIN: per-batch
    combiner + shuffle-free tree over the bounded zone key space, so
    ties break exactly like the oracle's ROW_NUMBER ORDER BY."""
    from ..stages.hashagg import tree_max_by_key

    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        src.zones_table(sf_dir),
        id_col="zone_id",
        img_cols=("image_key",),
        emit_image_id=False,
    )
    SH = np.int64(1) << 52  # keys reach ~2^52 only past sf100; cloud<2^10

    def packed_min(b: pa.Table) -> pa.Table:
        z = b.column("zone_id").to_numpy(zero_copy_only=False).astype(np.int64)
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        cloud = corpus_mod._mix(k % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        assert (k < SH).all()
        packed = cloud * SH + k
        order = np.argsort(z, kind="stable")
        uz, start = np.unique(z[order], return_index=True)
        return pa.table(
            {
                "zone_id": pa.array(uz),
                # tree_max_by_key keeps MAX; negate for the argmin
                "neg": pa.array(-np.minimum.reduceat(packed[order], start)),
            }
        )

    pre = pairs.map_batches(packed_min, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_max_by_key(pre, "zone_id", "neg")
    z = agg.column("zone_id").to_numpy(zero_copy_only=False)
    packed = -agg.column("neg").to_numpy(zero_copy_only=False)
    order = np.argsort(z)
    z, packed = z[order], packed[order]
    key = packed % SH
    return pa.table(
        {
            "zone_id": pa.array(z),
            "image_id": pc.binary_join_element_wise(
                "img-", pc.cast(pa.array(key), pa.string()), ""
            ),
            "cloud_cover": pa.array((packed // SH) / 1000.0),
        }
    )


ALL_QUERIES["zone_best_image"] = q_zone_best_image


def q_sat_tile_jaccard(sf_dir: str):
    """Coverage-similarity matrix: Jaccard of the TILE SETS any two
    satellites cover — which sensors are redundant vs complementary.
    Distinct (tile, sat) pairs dedup in one exchange; per tile the
    (bounded, <=|sats|) sat list emits its segmented-diagonal pairs
    (the country_cooccurrence kernel on tiles); per-sat distinct-tile
    counts ride the same pass; |sats|^2 partials through the tree."""
    from ..stages.hashagg import distinct_values, tree_count_sum_by_key
    from ..stages.tiles import explode_tiles

    W = np.int64(1) << 20  # sat ids grow with sf; 256 overflows past sf0.01

    def explode_sat(batch: pa.Table) -> pa.Table:
        out = explode_tiles(batch, ("sat_id",))
        t = out.column("tile_id").to_numpy(zero_copy_only=False)
        s = out.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        assert (s < W).all()
        return pa.table({"k": pa.array(t * W + s)})

    pairs_k = distinct_values(
        src.images_dataset(sf_dir, light=True).map_batches(
            explode_sat, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "k",
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"code": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        W = np.int64(1) << 20
        k = np.sort(b.column("k").to_numpy(zero_copy_only=False))
        t = k // W
        s = k % W
        # per-sat distinct-tile partials (code = sat packed alone)
        us, cnt = np.unique(s, return_counts=True)
        # per-tile segmented-diagonal sat pairs (sat lists are sorted
        # within each tile segment because k is sorted)
        ut, start = np.unique(t, return_index=True)
        lens = np.diff(np.append(start, len(t)))
        codes, counts = [us + (np.int64(1) << 40)], [cnt.astype(np.int64)]
        mx = int(lens.max()) if len(lens) else 0
        for d in range(1, mx):
            m = lens > d
            if not m.any():
                break
            # vectorized: for shift d, pair (pos, pos+d) within segments
            # (ragged ranges, no per-tile Python)
            ld = (lens[m] - d).astype(np.int64)
            base = np.repeat(start[m], ld) + _ragged_ranges(ld)
            pc_ = s[base] * W + s[base + d]
            uc, cc = np.unique(pc_, return_counts=True)
            codes.append(uc)
            counts.append(cc.astype(np.int64))
        return pa.table(
            {"code": pa.array(np.concatenate(codes)), "n": pa.array(np.concatenate(counts))}
        )

    # the pair emission needs each TILE's sats co-located — the distinct
    # exchange hashed the packed (tile, sat) key, so re-key by tile
    from ..util import hash_partition

    by_tile = pairs_k.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(hash_partition(b.column("k").to_numpy(zero_copy_only=False) // W, 64)),
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    partials = _pm(by_tile, lambda g: fold(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(partials, "code", sum_cols=("n",), count_name="__n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    is_single = code >= (np.int64(1) << 40)
    sat_tiles = dict(zip((code[is_single] - (np.int64(1) << 40)).tolist(), n[is_single].tolist()))
    pc_code, pn = code[~is_single], n[~is_single]
    a = pc_code // W
    b = pc_code % W
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    ukey = lo * W + hi
    uk, inv = np.unique(ukey, return_inverse=True)
    inter = np.zeros(len(uk), np.int64)
    np.add.at(inter, inv, pn)
    sa = uk // W
    sb = uk % W
    na = np.array([sat_tiles[int(x)] for x in sa], dtype=np.int64)
    nb = np.array([sat_tiles[int(x)] for x in sb], dtype=np.int64)
    union = na + nb - inter
    return pa.table(
        {
            "sat_a": pa.array(sa),
            "sat_b": pa.array(sb),
            "n_inter": pa.array(inter),
            "n_union": pa.array(union),
            "jaccard_ppm": pa.array(inter * np.int64(1_000_000) // union),
        }
    )


ALL_QUERIES["sat_tile_jaccard"] = q_sat_tile_jaccard


def q_events_gap_hist(sf_dir: str):
    """Inter-event gap distribution per user stream, minute-bucketed —
    the histogram you read BEFORE picking a sessionization threshold
    (the knee locates the natural session gap).  One user-hash
    exchange; gaps are consecutive diffs after the partition lexsort
    (user, ts, event_id); only the bounded minute histogram reduces."""
    from ..stages.hashagg import tree_count_sum_by_key

    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "event_id", "ts"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"gap_min": pa.array([], pa.int64()), "n_gaps": pa.array([], pa.int64())}
            )
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u_s, t_s = uid[order], ts[order]
        same = u_s[1:] == u_s[:-1]
        gap_min = (t_s[1:] - t_s[:-1])[same] // np.int64(60_000_000)
        ug, cnt = np.unique(gap_min, return_counts=True)
        return pa.table({"gap_min": pa.array(ug), "n_gaps": pa.array(cnt.astype(np.int64))})

    per_part = _pm(parted, lambda g: fold(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(per_part, "gap_min", sum_cols=("n_gaps",), count_name="__n")
    g = agg.column("gap_min").to_numpy(zero_copy_only=False)
    order = np.argsort(g)
    return pa.table(
        {
            "gap_min": pa.array(g[order]),
            "n_gaps": pa.array(agg.column("n_gaps").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["events_gap_hist"] = q_events_gap_hist


def q_pages_last_wins_merge(sf_dir: str):
    """DISTRIBUTED last-wins upsert (the MERGE/ON-CONFLICT-DO-UPDATE
    semantic; D2's in-batch rule globalized): the duplicate-bearing page
    stream hash-exchanges on image_key and each partition keeps the row
    with the HIGHEST page_idx per key — the newest write wins across
    the whole stream, whatever shard it arrived on.  Output is the
    per-satellite merge report: surviving rows, rows that took an
    update, and the exact clear-confidence percent-sum after the merge
    (updates bump clear by +1, so the sum proves the right versions
    won)."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    pages = src.image_pages_dataset(sf_dir)

    def enc(b: pa.Table) -> pa.Table:
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "image_key": b.column("image_key"),
                "page_idx": b.column("page_idx"),
                "clear_pp": pa.array(
                    np.floor(
                        b.column("clear_confidence_percent").to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                "__part": pa.array(hash_partition(k, 64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        k = group.column("image_key").to_numpy(zero_copy_only=False)
        p = group.column("page_idx").to_numpy(zero_copy_only=False)
        c = group.column("clear_pp").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, k))  # per key, highest page_idx LAST
        k_s, p_s, c_s = k[order], p[order], c[order]
        last = np.ones(len(k_s), dtype=bool)
        if len(k_s):
            last[:-1] = k_s[1:] != k_s[:-1]
        sat = k_s[last] % np.int64(spec.KEY_SUPP_MULT)
        order2 = np.argsort(sat, kind="stable")
        sat_s = sat[order2]
        us, start = np.unique(sat_s, return_index=True)
        pw, cw = p_s[last][order2], c_s[last][order2]
        return pa.table(
            {
                "sat_id": pa.array(us),
                "n_images": pa.array(
                    np.diff(np.append(start, len(sat_s))).astype(np.int64)
                ),
                "n_updated": pa.array(np.add.reduceat(pw, start)),
                "clear_pp_sum": pa.array(np.add.reduceat(cw, start)),
            }
        )

    per_part = _pm(pages.map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ), lambda g: merge(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(
        per_part, "sat_id", sum_cols=("n_images", "n_updated", "clear_pp_sum"), count_name="__n"
    )
    s = agg.column("sat_id").to_numpy(zero_copy_only=False)
    order = np.argsort(s)
    g = lambda c: agg.column(c).to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "sat_id": pa.array(s[order]),
            "n_images": pa.array(g("n_images")),
            "n_updated": pa.array(g("n_updated")),
            "clear_pp_sum": pa.array(g("clear_pp_sum")),
        }
    )


ALL_QUERIES["pages_last_wins_merge"] = q_pages_last_wins_merge


def q_tile_sat_diversity(sf_dir: str):
    """Sensor-diversity histogram: how many distinct satellites cover
    each tile, bucketed — single-sensor tiles are the calibration blind
    spots.  Distinct (tile, sat) exchange -> per-tile distinct counts in
    the tile-keyed partitions -> bounded diversity histogram."""
    from ..stages.hashagg import distinct_values, tree_count_sum_by_key
    from ..stages.tiles import explode_tiles
    from ..util import hash_partition

    W = np.int64(1) << 20

    def explode_sat(batch: pa.Table) -> pa.Table:
        out = explode_tiles(batch, ("sat_id",))
        t = out.column("tile_id").to_numpy(zero_copy_only=False)
        s = out.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        assert (s < W).all()
        return pa.table({"k": pa.array(t * W + s)})

    pairs_k = distinct_values(
        src.images_dataset(sf_dir, light=True).map_batches(
            explode_sat, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "k",
    )

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"n_sats": pa.array([], pa.int64()), "n_tiles": pa.array([], pa.int64())}
            )
        t = np.sort(b.column("k").to_numpy(zero_copy_only=False)) // W
        _, cnt = np.unique(t, return_counts=True)
        uc, n = np.unique(cnt, return_counts=True)
        return pa.table(
            {"n_sats": pa.array(uc.astype(np.int64)), "n_tiles": pa.array(n.astype(np.int64))}
        )

    by_tile = pairs_k.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(hash_partition(b.column("k").to_numpy(zero_copy_only=False) // W, 64)),
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    partials = _pm(by_tile, lambda g: fold(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(partials, "n_sats", sum_cols=("n_tiles",), count_name="__n")
    k = agg.column("n_sats").to_numpy(zero_copy_only=False)
    order = np.argsort(k)
    return pa.table(
        {
            "n_sats": pa.array(k[order]),
            "n_tiles": pa.array(agg.column("n_tiles").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["tile_sat_diversity"] = q_tile_sat_diversity


def q_country_sat_matrix(sf_dir: str):
    """Coverage cross-tab: images per (country, satellite) — which
    sensor covers which territory.  The containment join carries only
    the int sat_id through (img_cols pass-through), folds to a packed
    (country_idx, sat) key per batch, one bounded tree."""
    from ..stages.hashagg import tree_count_sum_by_key

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        countries,
        id_col="lc_id",
        img_cols=("sat_id",),
        emit_image_id=False,
    )
    W = np.int64(1) << 20

    def fold(b: pa.Table) -> pa.Table:
        c = b.column("lc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"code": pa.array(c * W + s)})

    agg = tree_count_sum_by_key(
        pairs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "code", count_name="n_images",
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code = code[order]
    isos = np.asarray(countries.column("iso").to_pylist(), dtype=object)
    return pa.table(
        {
            "iso": pa.array(isos[code // W].astype("U"), type=pa.string()),
            "sat_id": pa.array(code % W),
            "n_images": pa.array(agg.column("n_images").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["country_sat_matrix"] = q_country_sat_matrix


def q_city_distance_hist(sf_dir: str):
    """Accessibility profile: histogram of each image's squared planar
    distance to its nearest city (unit square-degree buckets) — how far
    from settlements the archive actually looks.  Composes the
    ring-pruned reverse-kNN stream (image_nearest_city) with a bounded
    bucket tree; the distance column is already oracle-exact."""
    from ..stages.hashagg import tree_count_sum_by_key

    nn = q_image_nearest_city(sf_dir)

    def bucket(b: pa.Table) -> pa.Table:
        d = b.column("dist_sq").to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(np.floor(d).astype(np.int64))})

    agg = tree_count_sum_by_key(
        nn.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "bucket", count_name="n_images",
    )
    k = agg.column("bucket").to_numpy(zero_copy_only=False)
    order = np.argsort(k)
    return pa.table(
        {
            "bucket": pa.array(k[order]),
            "n_images": pa.array(agg.column("n_images").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["city_distance_hist"] = q_city_distance_hist


def q_city_bearing_sectors(sf_dir: str):
    """Directional acquisition bias by country: each image is binned
    into the compass OCTANT (45-degree sectors, exact integer sign /
    magnitude tests on milli-degree deltas — no atan2) of its position
    relative to its NEAREST city, counted per the city's country — the
    anisotropy-of-tasking screen (is coverage systematically north of
    settlements?).  Composes the ring-pruned nearest-facility stream
    (q_image_nearest_city) with a vectorized octant classifier and a
    bounded (country x 8) tree aggregate; the city geometry is
    recovered in exact md ints from the broadcast small side."""
    from ..stages.hashagg import tree_count_sum_by_key

    nn = q_image_nearest_city(sf_dir)
    cities = src.cities_table(sf_dir)
    cid = cities.column("city_id").to_numpy(zero_copy_only=False)
    iso = np.asarray(cities.column("country_iso").to_pylist())
    order = np.argsort(cid)
    cid_s, iso_s = cid[order], iso[order]
    clon_s = (corpus_mod._mix(cid_s, spec.ST_CITY_LON) % spec.LON_SPAN_MD).astype(np.int64)
    clat_s = (corpus_mod._mix(cid_s, spec.ST_CITY_LAT) % spec.LAT_SPAN_MD).astype(np.int64)
    isos = sorted(set(iso_s.tolist()))
    iso_code = np.searchsorted(np.asarray(isos), iso_s)
    OCT = ("ENE", "NNE", "WNW", "NNW", "WSW", "SSW", "ESE", "SSE")

    def classify(b: pa.Table) -> pa.Table:
        keys = pc.cast(
            pc.utf8_slice_codeunits(b.column("image_id"), 4, 2**31 - 1), pa.int64()
        ).to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(keys)
        pos = np.searchsorted(cid_s, b.column("city_id").to_numpy(zero_copy_only=False))
        dx = lon_md.astype(np.int64) - clon_s[pos]
        dy = lat_md.astype(np.int64) - clat_s[pos]
        # octant via exact sign/magnitude tests, mirrored in the oracle
        o = np.where(
            (dx >= 0) & (dy >= 0),
            np.where(dx > dy, 0, 1),
            np.where(
                (dx < 0) & (dy >= 0),
                np.where(-dx > dy, 2, 3),
                np.where(
                    (dx < 0) & (dy < 0),
                    np.where(-dx > -dy, 4, 5),
                    np.where(dx > -dy, 6, 7),
                ),
            ),
        )
        return pa.table({"code": pa.array(iso_code[pos] * np.int64(8) + o)})

    packed = nn.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "code", count_name="n_images")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n_images").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, n = code[order], n[order]
    return pa.table(
        {
            "country_iso": pa.array([isos[int(c) // 8] for c in code], type=pa.string()),
            "octant": pa.array([OCT[int(c) % 8] for c in code], type=pa.string()),
            "n_images": pa.array(n),
        }
    )


ALL_QUERIES["city_bearing_sectors"] = q_city_bearing_sectors


def q_split_source_chi2(sf_dir: str):
    """Split-balance QA: the chi-square statistic of the (split x
    source) contingency table against independence — a biased
    train/val/test hash split over ingestion sources is a silent eval
    skew.  One bounded (3 x |sources|) tree aggregate; each
    (o-e)^2/e term floors to integer micros (e = row_tot * col_tot / n
    as one mirrored double expression)."""
    from ..stages.hashagg import tree_count_sum_by_key

    srcs = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").unique().to_pylist()
    )
    smap = {s: i for i, s in enumerate(srcs)}
    S = np.int64(len(srcs))

    def enc(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        bkt = corpus_mod._mix(d % np.int64(spec.MOD), spec.ST_SPLIT) % 100
        split = np.where(
            bkt < spec.SPLIT_TRAIN_PCT, 0, np.where(bkt < spec.SPLIT_VAL_PCT, 1, 2)
        ).astype(np.int64)
        sc = _str_codes(b.column("source"), smap)
        return pa.table({"code": pa.array(split * S + sc)})

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "source"])
    agg = tree_count_sum_by_key(
        docs.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "code", count_name="n",
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    o = np.zeros((3, int(S)), np.int64)
    o[code // S, code % S] = n
    rt = o.sum(axis=1)
    ct = o.sum(axis=0)
    total = int(o.sum())
    e = rt[:, None] * (1.0 * ct[None, :]) / total
    term = np.floor((o - e) * (o - e) / e * 1e6).astype(np.int64)
    names = np.asarray(["train", "val", "test"], dtype=object)
    return pa.table(
        {
            "split": pa.array(names.astype("U"), type=pa.string()),
            "n_docs": pa.array(rt),
            "chi2_micro": pa.array(term.sum(axis=1)),
        }
    )


ALL_QUERIES["split_source_chi2"] = q_split_source_chi2


def q_label_separation(sf_dir: str):
    """Cluster-separation matrix: squared lattice distance between every
    pair of label centroids — read next to label_inertia (intra) to
    judge class separability before training a probe.  One streaming
    centroid reduce (the label_centroids pass); the labels^2 pair fold
    is driver-trivial."""
    ulab, cent, _ = _label_centroid_matrix(sf_dir)
    L = len(ulab)
    ia, ib = np.triu_indices(L, k=1)
    diff = cent[ia] - cent[ib]
    return pa.table(
        {
            "label_a": pa.array(ulab[ia]),
            "label_b": pa.array(ulab[ib]),
            "dist2_q": pa.array((diff * diff).sum(axis=1).astype(np.int64)),
        }
    )


ALL_QUERIES["label_separation"] = q_label_separation


def q_events_first_touch(sf_dir: str):
    """First-touch attribution: each user's ENTIRE value total is
    credited to their first event's type (ties by event_id) — the
    classic marketing-attribution rule.  One user-hash exchange; the
    partition kernel finds first types and value sums in segment scans;
    bounded per-type partials reduce."""
    from ..stages.hashagg import tree_count_sum_by_key

    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type", "value"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"event_type": pa.array([], pa.string()),
                 "n_users": pa.array([], pa.int64()),
                 "value_cents": pa.array([], pa.int64())}
            )
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = group.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary, dtype=object)
        cents = np.floor(
            group.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u_s = uid[order]
        start = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        first_code = code[order][start]
        vsum = np.add.reduceat(cents[order], start)
        ut, inv = np.unique(first_code, return_inverse=True)
        n_users = np.bincount(inv).astype(np.int64)
        vals = np.zeros(len(ut), np.int64)
        np.add.at(vals, inv, vsum)  # types-sized — partition-trivial
        return pa.table(
            {
                "event_type": pa.array(vocab[ut].astype("U"), type=pa.string()),
                "n_users": pa.array(n_users),
                "value_cents": pa.array(vals),
            }
        )

    per_part = _pm(parted, lambda g: fold(g.drop_columns(["__part"])))
    from ..util import collect_table

    tab = collect_table(
        per_part,
        schema=pa.schema(
            [("event_type", pa.string()), ("n_users", pa.int64()), ("value_cents", pa.int64())]
        ),
    )
    et = np.asarray(tab.column("event_type"), dtype=object)
    nu = tab.column("n_users").to_numpy(zero_copy_only=False)
    vc = tab.column("value_cents").to_numpy(zero_copy_only=False)
    order = np.argsort(et, kind="stable")
    et, nu, vc = et[order], nu[order], vc[order]
    start = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
    return pa.table(
        {
            "event_type": pa.array(et[start].astype("U"), type=pa.string()),
            "n_users": pa.array(np.add.reduceat(nu, start)),
            "value_cents": pa.array(np.add.reduceat(vc, start)),
        }
    )


ALL_QUERIES["events_first_touch"] = q_events_first_touch


def q_cell_cross_sat_revisit(sf_dir: str):
    """Constellation synergy: per 1-degree cell, the minimum time gap
    between captures by DIFFERENT satellites, histogrammed (hours) —
    how fast a second, independent sensor re-sees a spot.  Lemma: the
    global min cross-sat gap is achieved at some ADJACENT pair of the
    time-sorted cell sequence (any witness between a closer cross pair
    must differ from one endpoint and would itself form a closer
    adjacent cross pair), so one sorted segment scan per cell suffices.
    One cell-hash exchange; bounded hour histogram out."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    def enc(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch.column("centroid_lon").to_numpy(zero_copy_only=False)
        lat = batch.column("centroid_lat").to_numpy(zero_copy_only=False)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        cell = (np.floor(lon).astype(np.int64) + 180) * np.int64(400) + (
            np.floor(lat).astype(np.int64) + 90
        )
        return pa.table(
            {
                "cell": pa.array(cell),
                "hrs": pa.array(hrs.astype(np.int64)),
                "sat": pa.array(sat),
                "key": pa.array(ik),
                "__part": pa.array(hash_partition(cell, 64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"min_dt_hours": pa.array([], pa.int64()), "n_cells": pa.array([], pa.int64())}
            )
        c = group.column("cell").to_numpy(zero_copy_only=False)
        h = group.column("hrs").to_numpy(zero_copy_only=False)
        s = group.column("sat").to_numpy(zero_copy_only=False)
        k = group.column("key").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, h, c))
        c, h, s = c[order], h[order], s[order]
        adj = (c[1:] == c[:-1]) & (s[1:] != s[:-1])
        if not adj.any():
            return pa.table(
                {"min_dt_hours": pa.array([], pa.int64()), "n_cells": pa.array([], pa.int64())}
            )
        dt = (h[1:] - h[:-1])[adj]
        cc = c[1:][adj]
        o2 = np.argsort(cc, kind="stable")
        uc, start = np.unique(cc[o2], return_index=True)
        mins = np.minimum.reduceat(dt[o2], start)
        ub, n = np.unique(mins, return_counts=True)
        return pa.table(
            {"min_dt_hours": pa.array(ub), "n_cells": pa.array(n.astype(np.int64))}
        )

    parted = src.images_dataset(sf_dir, light=True).map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    per_part = _pm(parted, lambda g: fold(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(per_part, "min_dt_hours", sum_cols=("n_cells",), count_name="__n")
    d = agg.column("min_dt_hours").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "min_dt_hours": pa.array(d[order]),
            "n_cells": pa.array(agg.column("n_cells").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["cell_cross_sat_revisit"] = q_cell_cross_sat_revisit


def q_source_length_quartiles(sf_dir: str):
    """Per-source document-length quartiles (n_chars) — the length
    profile a curator compares across feeds.  Bounded (source,
    n_chars) histogram through one tree; ceil-rank quantile picks per
    source (the sat_cloud_quantiles convention)."""
    from ..stages.hashagg import tree_count_sum_by_key

    srcs = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").unique().to_pylist()
    )
    smap = {s: i for i, s in enumerate(srcs)}
    W = np.int64(1) << 20

    def enc(b: pa.Table) -> pa.Table:
        sc = _str_codes(b.column("source"), smap)
        n = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        assert (n < W).all()
        return pa.table({"code": pa.array(sc * W + n)})

    docs = src.table_dataset(sf_dir, "documents", columns=["source", "n_chars"])
    hist = tree_count_sum_by_key(
        docs.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "code", count_name="n",
    )
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, n = code[order], n[order]
    sc = code // W
    ln = code % W
    us, start = np.unique(sc, return_index=True)
    bounds = np.append(start, len(sc))
    rows = {"source": [], "n_docs": [], "q1_chars": [], "q2_chars": [], "q3_chars": []}
    names = np.asarray(srcs, dtype=object)
    for i in range(len(us)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cum = np.cumsum(n[lo:hi])
        total = int(cum[-1])
        qs = [int(ln[lo:hi][np.searchsorted(cum, -(-total * k // 4))]) for k in (1, 2, 3)]
        rows["source"].append(names[us[i]])
        rows["n_docs"].append(total)
        rows["q1_chars"].append(qs[0])
        rows["q2_chars"].append(qs[1])
        rows["q3_chars"].append(qs[2])
    return pa.table(
        {
            "source": pa.array(np.asarray(rows["source"], dtype=object).astype("U"), type=pa.string()),
            "n_docs": pa.array(np.asarray(rows["n_docs"], dtype=np.int64)),
            "q1_chars": pa.array(np.asarray(rows["q1_chars"], dtype=np.int64)),
            "q2_chars": pa.array(np.asarray(rows["q2_chars"], dtype=np.int64)),
            "q3_chars": pa.array(np.asarray(rows["q3_chars"], dtype=np.int64)),
        }
    )


ALL_QUERIES["source_length_quartiles"] = q_source_length_quartiles


def q_sat_record_days(sf_dir: str):
    """Running-record detection: per satellite, how many days set a new
    daily-count record (cumulative-max window semantics), plus the
    final record.  The corpus pass is the bounded (sat, day) tree; the
    cummax scan runs on that result, never the corpus."""
    from ..stages.hashagg import tree_count_sum_by_key

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        return pa.table({"code": pa.array(sat * np.int64(100000) + hrs // 24)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(enc, "code", count_name="n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code)  # (sat, day) ascending
    code, n = code[order], n[order]
    sat = code // 100000
    us, start = np.unique(sat, return_index=True)
    # per-sat running max: subtract each segment's prefix influence by
    # doing the cummax segment-locally (segments are contiguous)
    records = np.zeros(len(us), np.int64)
    best = np.zeros(len(us), np.int64)
    bounds = np.append(start, len(sat))
    for i in range(len(us)):  # |sats| iterations on the tiny aggregate
        seg = n[int(bounds[i]) : int(bounds[i + 1])]
        cm = np.maximum.accumulate(seg)
        records[i] = int((seg >= np.r_[np.int64(0), cm[:-1] + 1]).sum())
        best[i] = int(cm[-1])
    return pa.table(
        {
            "sat_id": pa.array(us),
            "n_record_days": pa.array(records),
            "best_day_count": pa.array(best),
        }
    )


ALL_QUERIES["sat_record_days"] = q_sat_record_days


def q_images_without_city(sf_dir: str):
    """Remote-acquisition screen: images whose footprint touches NO
    city 30 km buffer — the anti-join complement of city_image_counts
    (the reference's buffered city screen, negated).  Same broadcast
    circle×box kernel; each batch emits the rows the STRtree + exact
    refinement did NOT match.  Map-only; no exchange at all."""
    from ..stages.broadcast_join import CityBufferJoin
    from ..state.broadcast import cached

    cities = src.cities_table(sf_dir)
    ref = ray.put(cities)

    def anti(batch: pa.Table) -> pa.Table:
        j = cached(ref, CityBufferJoin)
        x0 = batch.column("x0").to_numpy(zero_copy_only=False)
        y0 = batch.column("y0").to_numpy(zero_copy_only=False)
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)
        y1 = batch.column("y1").to_numpy(zero_copy_only=False)
        qi, ci = j.tree.query_batch(x0, y0, x1, y1)
        if len(qi):
            from ..geo import kernels

            d2 = kernels.circle_box_dist_sq(
                j.lon[ci], j.lat[ci], x0[qi], y0[qi], x1[qi], y1[qi]
            )
            qi = qi[d2 <= j.radius[ci] * j.radius[ci]]
        matched = np.zeros(batch.num_rows, dtype=bool)
        matched[qi] = True
        return pa.table({"image_id": batch.column("image_id").filter(pa.array(~matched))})

    return src.images_dataset(sf_dir, light=True).map_batches(
        anti, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["images_without_city"] = q_images_without_city


def q_zone_class_cooccurrence(sf_dir: str):
    """Land-use mixing matrix: pairs of zone CLASSES covered by the
    same image (the country_cooccurrence basket kernel over the
    exact-refinement zone join) — how often residential footage also
    captures industrial land, etc.  Class codes derive from zone_id %
    4 in flight; per-image fan-out is bounded by the 4 classes."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        src.zones_table(sf_dir),
        id_col="zone_id",
        img_cols=("image_key",),
        emit_image_id=False,
    )

    def to_class(b: pa.Table) -> pa.Table:
        z = b.column("zone_id").to_numpy(zero_copy_only=False).astype(np.int64)
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        # per-batch (key, class) pre-distinct combiner
        key = np.unique(k * np.int64(4) + z % 4)
        return pa.table(
            {
                "image_key": pa.array(key // 4),
                "cls": pa.array(key % 4),
                "__part": pa.array(hash_partition(key // 4, 64)),
            }
        )

    def combos(group: pa.Table) -> pa.Table:
        k = group.column("image_key").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {"code": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
            )
        c = group.column("cls").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, k))
        k, c = k[order], c[order]
        keep = np.ones(len(k), dtype=bool)
        keep[1:] = (k[1:] != k[:-1]) | (c[1:] != c[:-1])
        k, c = k[keep], c[keep]
        new_seg = np.ones(len(k), dtype=bool)
        new_seg[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new_seg) - 1
        counts = np.bincount(seg)
        codes = []
        for d in range(1, int(counts.max()) if len(counts) else 1):
            m = seg[d:] == seg[:-d]
            j = np.nonzero(m)[0]
            if len(j):
                codes.append(c[j] * np.int64(8) + c[j + d])
        if not codes:
            return pa.table(
                {"code": pa.array([], pa.int64()), "n_partial": pa.array([], pa.int64())}
            )
        code = np.concatenate(codes)
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(uniq), "n_partial": pa.array(cnt.astype(np.int64))})

    parted = pairs.map_batches(
        to_class, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    per_part = _pm(parted, lambda g: combos(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(per_part, "code", sum_cols=("n_partial",), count_name="__n")
    if "code" not in agg.column_names:  # no image spans two classes
        return pa.table(
            {"class_a": pa.array([], pa.string()), "class_b": pa.array([], pa.string()),
             "n_images": pa.array([], pa.int64())}
        )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code = code[order]
    CL = np.asarray(["Residential", "Industrial", "Agricultural", "Protected"], dtype=object)
    # zone_id % 4: 0 Residential, 1 Industrial, 2 Agricultural, 3 Protected
    return pa.table(
        {
            "class_a": pa.array(CL[code // 8].astype("U"), type=pa.string()),
            "class_b": pa.array(CL[code % 8].astype("U"), type=pa.string()),
            "n_images": pa.array(agg.column("n_partial").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["zone_class_cooccurrence"] = q_zone_class_cooccurrence


def q_langid_accuracy_by_len(sf_dir: str):
    """Sliced model eval: LangId accuracy per document-length band
    (n_chars // 256) — short docs are where n-gram language ID
    degrades, and slice-based evals catch it before aggregate accuracy
    hides it.  The prediction kernel rides the same per-worker-cached
    stage as docs_langid; (band, correct) folds per batch; integer-ppm
    accuracy per band."""
    from ..stages.hashagg import tree_count_sum_by_key

    pred_stage = _cached_text(text.LangId)

    def fold(b: pa.Table) -> pa.Table:
        pred = pred_stage(b.select(["doc_id", "text"]))
        p = pred.column("pred_lang")
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        actual = b.column("lang")
        if isinstance(actual, pa.ChunkedArray):
            actual = actual.combine_chunks()
        ok = pc.equal(p, actual).to_numpy(zero_copy_only=False).astype(np.int64)
        band = b.column("n_chars").to_numpy(zero_copy_only=False) // np.int64(256)
        ub, start = np.unique(np.sort(band), return_index=True)
        order = np.argsort(band, kind="stable")
        return pa.table(
            {
                "band": pa.array(ub),
                "n_docs": pa.array(np.diff(np.append(start, len(band))).astype(np.int64)),
                "n_correct": pa.array(np.add.reduceat(ok[order], start)),
            }
        )

    docs = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]
    )
    agg = tree_count_sum_by_key(
        docs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "band", sum_cols=("n_docs", "n_correct"), count_name="__n",
    )
    bd = agg.column("band").to_numpy(zero_copy_only=False)
    order = np.argsort(bd)
    nd = agg.column("n_docs").to_numpy(zero_copy_only=False)[order]
    nc = agg.column("n_correct").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "band": pa.array(bd[order]),
            "n_docs": pa.array(nd),
            "n_correct": pa.array(nc),
            "accuracy_ppm": pa.array(nc * np.int64(1_000_000) // nd),
        }
    )


ALL_QUERIES["langid_accuracy_by_len"] = q_langid_accuracy_by_len


def q_priority_lag_median(sf_dir: str):
    """Per-priority fulfillment-latency medians: does URGENT actually
    ship faster?  Composition: per-order min ship day (orderkey-hash
    segment min) -> one PK lookup-join pulls a PACKED (orderdate day *
    8 + priority code) value -> bounded (priority, lag-day) histogram
    -> ceil-rank weighted median per priority."""
    from ..stages.bucket_join import lookup_join
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    li = src.table_dataset(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def enc(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        day = b.column("l_shipdate").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        order = np.argsort(ok, kind="stable")
        uo, start = np.unique(ok[order], return_index=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uo),
                "day": pa.array(np.minimum.reduceat(day[order], start)),
                "__part": pa.array(hash_partition(uo, 64)),
            }
        )

    def part_min(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        d = group.column("day").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        uo, start = np.unique(ok[order], return_index=True)
        return pa.table(
            {"l_orderkey": pa.array(uo), "day": pa.array(np.minimum.reduceat(d[order], start))}
        )

    first_ship = _pm(li.map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ), lambda g: part_min(g.drop_columns(["__part"])))

    PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pmap = {s: i for i, s in enumerate(PRIO)}
    od = src.table_dataset(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def od_enc(b: pa.Table) -> pa.Table:
        day = b.column("o_orderdate").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        prio = _str_codes(b.column("o_orderpriority"), pmap)
        return pa.table(
            {"o_orderkey": b.column("o_orderkey"), "dp": pa.array(day * np.int64(8) + prio)}
        )

    j = lookup_join(
        first_ship, "l_orderkey", ("day",),
        od.map_batches(od_enc, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "o_orderkey", "dp",
    )

    def lag_code(b: pa.Table) -> pa.Table:
        dp = b.column("dp").to_numpy(zero_copy_only=False)
        lag = b.column("day").to_numpy(zero_copy_only=False) - dp // 8
        # lags are signed (the synthetic ship dates are independent of
        # order dates): offset into [0, 8192) before packing
        assert (np.abs(lag) < 4096).all()
        return pa.table({"code": pa.array((dp % 8) * np.int64(8192) + lag + 4096)})

    agg = tree_count_sum_by_key(
        j.map_batches(lag_code, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "code", count_name="n",
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, n = code[order], n[order]
    prio = code // 8192
    lag = code % 8192 - 4096
    us, start = np.unique(prio, return_index=True)
    bounds = np.append(start, len(prio))
    med, tot = [], []
    for i in range(len(us)):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        cum = np.cumsum(n[lo:hi])
        total = int(cum[-1])
        med.append(int(lag[lo:hi][np.searchsorted(cum, -(-total * 1 // 2))]))
        tot.append(total)
    names = np.asarray(PRIO, dtype=object)
    return pa.table(
        {
            "o_orderpriority": pa.array(names[us].astype("U"), type=pa.string()),
            "n_orders": pa.array(np.asarray(tot, dtype=np.int64)),
            "median_lag_days": pa.array(np.asarray(med, dtype=np.int64)),
        }
    )


ALL_QUERIES["priority_lag_median"] = q_priority_lag_median


def q_top_terms_per_source(sf_dir: str):
    """Per-group heavy hitters: each source's top-5 terms by count
    (ties -> lexicographically first), the per-feed vocabulary
    fingerprint.  (source, term) counts co-locate by term hash (the
    docs_hapax_ratio exchange); each partition emits its per-source
    local top-5 and the driver merges #partitions x sources x 5 rows —
    the global per-source top-5 is a subset of that union."""
    from ..util import collect_table

    srcs = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").unique().to_pylist()
    )
    smap = {s: i for i, s in enumerate(srcs)}
    S = np.int64(len(srcs))
    K = 5

    def src_term_counts(b: pa.Table) -> pa.Table:
        pf, toks = text._nonempty_tokens(b)
        sc = _str_codes(b.column("source"), smap)
        if len(pf) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "src": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64()), "__part": pa.array([], pa.int64())}
            )
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        key = sc[pf] * V + codes
        uk, cnt = np.unique(key, return_counts=True)
        terms = enc.dictionary.take(pa.array(uk % V))
        return pa.table(
            {
                "term": terms,
                "src": pa.array(uk // V),
                "cnt": pa.array(cnt.astype(np.int64)),
                "__part": pa.array(text._pmi_hash_part(terms)),
            }
        )

    def local_topk(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return pa.table(
                {"src": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        terms = np.asarray(group.column("term"), dtype=object)
        src_c = group.column("src").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        # totals per (src, term) within the partition (complete by hash)
        order = np.lexsort((terms, src_c))
        t_s, s_s, c_s = terms[order], src_c[order], cnt[order]
        st = np.flatnonzero(np.r_[True, (t_s[1:] != t_s[:-1]) | (s_s[1:] != s_s[:-1])])
        tot = np.add.reduceat(c_s, st)
        t_u, s_u = t_s[st], s_s[st]
        out_s, out_t, out_n = [], [], []
        top = np.lexsort((t_u, -tot, s_u))
        s_sorted = s_u[top]
        first = np.flatnonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]])
        for f, e in zip(first, np.append(first[1:], len(top))):
            sel = top[f : min(f + K, e)]
            out_s.append(s_u[sel]); out_t.append(t_u[sel]); out_n.append(tot[sel])
        return pa.table(
            {
                "src": pa.array(np.concatenate(out_s)),
                "term": pa.array(np.concatenate(out_t), type=pa.string()),
                "n": pa.array(np.concatenate(out_n)),
            }
        )

    docs = src.table_dataset(sf_dir, "documents", columns=["source", "text"])
    per_part = _pm(docs.map_batches(
        src_term_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ), lambda g: local_topk(g.drop_columns(["__part"])))
    tab = collect_table(
        per_part,
        schema=pa.schema([("src", pa.int64()), ("term", pa.string()), ("n", pa.int64())]),
    )
    s = tab.column("src").to_numpy(zero_copy_only=False)
    t = np.asarray(tab.column("term"), dtype=object)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    top = np.lexsort((t, -n, s))
    s_sorted = s[top]
    first = np.flatnonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]])
    keep = []
    for f, e in zip(first, np.append(first[1:], len(top))):
        keep.append(top[f : min(f + K, e)])
    keep = np.concatenate(keep) if keep else np.zeros(0, np.int64)
    names = np.asarray(srcs, dtype=object)
    return pa.table(
        {
            "source": pa.array(names[s[keep]].astype("U"), type=pa.string()),
            "term": pa.array(t[keep], type=pa.string()),
            "n": pa.array(n[keep]),
        }
    )


ALL_QUERIES["top_terms_per_source"] = q_top_terms_per_source


def q_country_coverage_gini(sf_dir: str):
    """Coverage-inequality index: the Gini coefficient of per-country
    image counts (0 = perfectly even tasking, 1 = one country hoards
    the archive).  The containment-join tree aggregate is bounded (25
    rows); Gini = sum((2i - n - 1) * x_i) / (n * sum(x)) over the
    ascending counts as ONE mirrored double expression of integers."""
    from ..stages.hashagg import tree_count_sum_by_key

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True), countries, id_col="lc_id"
    )
    counts = tree_count_sum_by_key(pairs, "lc_id", count_name="n")
    x = np.sort(counts.column("n").to_numpy(zero_copy_only=False))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * x).sum())
    den = int(n * x.sum())
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))
    return pa.table(
        {
            "n_countries": one(n),
            "total_pairs": one(int(x.sum())),
            "gini_num": one(num),
            "gini": pa.array(np.asarray([num / (1.0 * den)], dtype=np.float64)),
        }
    )


ALL_QUERIES["country_coverage_gini"] = q_country_coverage_gini


def q_lang_clean_rate(sf_dir: str):
    """Quality-gate pass rate per LANGUAGE: the share of each language's
    documents that survive the corpus_clean gate (min tokens + max
    stopword ratio, integer-exact) — the per-language acceptance report
    a multilingual-corpus curator reads before blaming a language's
    feed.  Map-only (lang, pass) folds, bounded tree, integer-ppm."""
    from ..stages.hashagg import tree_count_sum_by_key

    stop_set = pa.array(sorted(spec.STOPWORDS), type=pa.string())

    def fold(b: pa.Table) -> pa.Table:
        parent, flat, n_docs = text._token_lists(b.column("text"))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=stop_set).to_numpy(zero_copy_only=False)
        nt = np.bincount(parent[nonempty], minlength=n_docs).astype(np.int64)
        sc = np.bincount(parent[nonempty & is_stop], minlength=n_docs).astype(np.int64)
        ok = (
            (nt >= spec.CLEAN_MIN_TOKENS)
            & (sc * 100 <= spec.CLEAN_MAX_STOP_PCT * nt)
        ).astype(np.int64)
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary, dtype=object)
        ul, start = np.unique(np.sort(code), return_index=True)
        order = np.argsort(code, kind="stable")
        return pa.table(
            {
                "lang": pa.array(vocab[ul].astype("U"), type=pa.string()),
                "n_docs": pa.array(np.diff(np.append(start, len(code))).astype(np.int64)),
                "n_clean": pa.array(np.add.reduceat(ok[order], start)),
            }
        )

    docs = src.table_dataset(sf_dir, "documents", columns=["text", "lang"])
    pre = docs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from ..util import collect_table

    tab = collect_table(
        pre, schema=pa.schema([("lang", pa.string()), ("n_docs", pa.int64()), ("n_clean", pa.int64())])
    )
    lg = np.asarray(tab.column("lang"), dtype=object)
    nd = tab.column("n_docs").to_numpy(zero_copy_only=False)
    nc = tab.column("n_clean").to_numpy(zero_copy_only=False)
    order = np.argsort(lg, kind="stable")
    lg, nd, nc = lg[order], nd[order], nc[order]
    start = np.flatnonzero(np.r_[True, lg[1:] != lg[:-1]])
    ndt = np.add.reduceat(nd, start)
    nct = np.add.reduceat(nc, start)
    return pa.table(
        {
            "lang": pa.array(lg[start].astype("U"), type=pa.string()),
            "n_docs": pa.array(ndt),
            "n_clean": pa.array(nct),
            "clean_ppm": pa.array(nct * np.int64(1_000_000) // ndt),
        }
    )


ALL_QUERIES["lang_clean_rate"] = q_lang_clean_rate


def q_source_char_profile(sf_dir: str):
    """Byte-level character-class profile per source: letter / digit /
    space / other fractions in ppm — the 'is this feed prose, tables,
    or noise' fingerprint.  The kernel runs a 256-bin bincount straight
    over the flat Arrow STRING buffer per batch (the zonal pixel
    trick applied to text; the corpus is ASCII so bytes == chars) and
    folds to class counts per source; only (source x 4) integers
    reduce."""
    from ..stages.hashagg import tree_count_sum_by_key

    srcs = sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        .column("source").unique().to_pylist()
    )
    smap = {s: i for i, s in enumerate(srcs)}

    # byte -> class: 0 letter, 1 digit, 2 space, 3 other
    CLS = np.full(256, 3, np.int64)
    CLS[ord("a") : ord("z") + 1] = 0
    CLS[ord("A") : ord("Z") + 1] = 0
    CLS[ord("0") : ord("9") + 1] = 1
    for ws in b" \t\n\r\x0b\x0c":
        CLS[ws] = 2

    def fold(b: pa.Table) -> pa.Table:
        sc = _str_codes(b.column("source"), smap)
        col = b.column("text")
        chunks = col.chunks if hasattr(col, "chunks") else [col]
        out = {}
        done = 0
        acc = np.zeros((len(srcs), 4), np.int64)
        for chunk in chunks:
            m = len(chunk)
            if m == 0:
                continue
            offs = np.frombuffer(chunk.buffers()[1], dtype=np.int32)[
                chunk.offset : chunk.offset + m + 1
            ].astype(np.int64)
            data = np.frombuffer(chunk.buffers()[2], dtype=np.uint8)
            flat = data[offs[0] : offs[-1]]
            rowsrc = np.repeat(sc[done : done + m], np.diff(offs))
            # fused (source, byte) bincount, then fold bytes -> classes
            hist = np.bincount(
                rowsrc * np.int64(256) + flat.astype(np.int64),
                minlength=len(srcs) * 256,
            ).reshape(len(srcs), 256)
            for c in range(4):
                acc[:, c] += hist[:, CLS == c].sum(axis=1)
            done += m
        nz = acc.sum(axis=1) > 0
        idx = np.flatnonzero(nz)
        return pa.table(
            {
                "src": pa.array(idx.astype(np.int64)),
                "letters": pa.array(acc[idx, 0]),
                "digits": pa.array(acc[idx, 1]),
                "spaces": pa.array(acc[idx, 2]),
                "others": pa.array(acc[idx, 3]),
            }
        )

    docs = src.table_dataset(sf_dir, "documents", columns=["source", "text"])
    agg = tree_count_sum_by_key(
        docs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "src", sum_cols=("letters", "digits", "spaces", "others"), count_name="__n",
    )
    sc = agg.column("src").to_numpy(zero_copy_only=False)
    order = np.argsort(sc)
    g = lambda c: agg.column(c).to_numpy(zero_copy_only=False)[order]
    le, di, sp, ot = g("letters"), g("digits"), g("spaces"), g("others")
    tot = le + di + sp + ot
    names = np.asarray(srcs, dtype=object)[sc[order]]
    return pa.table(
        {
            "source": pa.array(names.astype("U"), type=pa.string()),
            "n_chars": pa.array(tot),
            "letter_ppm": pa.array(le * np.int64(1_000_000) // tot),
            "digit_ppm": pa.array(di * np.int64(1_000_000) // tot),
            "space_ppm": pa.array(sp * np.int64(1_000_000) // tot),
        }
    )


ALL_QUERIES["source_char_profile"] = q_source_char_profile


def q_sat_asset_matrix(sf_dir: str):
    """Asset-availability cross-tab: images per (satellite, asset type)
    — the M:N asset relation (reference db.py:180-205) rolled up per
    sensor.  Presence bits derive from the key in flight (no list
    explode needed for counting); one bounded (sat x 3) tree."""
    from ..stages.hashagg import tree_count_sum_by_key

    def fold(b: pa.Table) -> pa.Table:
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ab = corpus_mod._mix(k % np.int64(spec.MOD), spec.ST_ASSET)
        base = sat * np.int64(4)
        codes = np.concatenate(
            [base, base[(ab >> 1) % 2 == 1] + 1, base[(ab >> 2) % 2 == 1] + 2]
        )
        uc, cnt = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(uc), "n": pa.array(cnt.astype(np.int64))})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(enc, "code", sum_cols=("n",), count_name="__n")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code = code[order]
    AT = np.asarray(list(spec.ASSET_TYPES), dtype=object)
    return pa.table(
        {
            "sat_id": pa.array(code // 4),
            "asset_type": pa.array(AT[code % 4].astype("U"), type=pa.string()),
            "n_images": pa.array(agg.column("n").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["sat_asset_matrix"] = q_sat_asset_matrix


def q_docs_vocab_growth(sf_dir: str):
    """Heaps-law curve: vocabulary size after the first N documents (in
    doc_id order) at power-of-two checkpoints — the growth curve that
    predicts tokenizer vocabulary needs at corpus scale.  Each term's
    FIRST document (min doc_id) is found on one term-hash exchange;
    vocab(N) = #terms with first_doc < N folds from a bounded
    bucket histogram (bucket = bit_length of first_doc), cumulative
    driver-side."""
    from ..stages.hashagg import tree_count_sum_by_key

    def term_first(b: pa.Table) -> pa.Table:
        pf, toks = text._nonempty_tokens(b)
        if len(pf) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "first": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int64())}
            )
        d = b.column("doc_id").to_numpy(zero_copy_only=False)[pf]
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        uc, start = np.unique(codes[order], return_index=True)
        first = np.minimum.reduceat(d[order], start)
        terms = enc.dictionary.take(pa.array(uc))
        return pa.table(
            {"term": terms, "first": pa.array(first),
             "__part": pa.array(text._pmi_hash_part(terms))}
        )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "n_terms": pa.array([], pa.int64())}
            )
        terms = np.asarray(group.column("term"), dtype=object)
        first = group.column("first").to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        t_s, f_s = terms[order], first[order]
        st = np.flatnonzero(np.r_[True, t_s[1:] != t_s[:-1]])
        fmin = np.minimum.reduceat(f_s, st)
        # bucket = smallest b with first_doc < 2^b, i.e. bit_length:
        # frexp's exponent is EXACT for integers < 2^53 (float log2 is
        # not, at powers of two); first == 0 -> bucket 0
        bucket = np.where(fmin == 0, 0, np.frexp(fmin.astype(np.float64))[1]).astype(np.int64)
        ub, cnt = np.unique(bucket, return_counts=True)
        return pa.table({"bucket": pa.array(ub), "n_terms": pa.array(cnt.astype(np.int64))})

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    pre = docs.map_batches(term_first, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    per_part = _pm(pre, lambda g: fold(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(per_part, "bucket", sum_cols=("n_terms",), count_name="__n")
    bk = agg.column("bucket").to_numpy(zero_copy_only=False)
    nt = agg.column("n_terms").to_numpy(zero_copy_only=False)
    order = np.argsort(bk)
    bk, nt = bk[order], nt[order]
    # cumulative vocab at checkpoint N = 2^b (terms with first < 2^b)
    return pa.table(
        {
            "n_docs_checkpoint": pa.array(np.int64(2) ** bk),
            "vocab": pa.array(np.cumsum(nt)),
        }
    )


ALL_QUERIES["docs_vocab_growth"] = q_docs_vocab_growth


# --- fixed-size sketches & locality index (stages/sketch.py) ---------------

def q_pixel_pyramid_stats(sf_dir: str):
    """Image-pyramid level-1 build: 2x2 floor-mean pooling over every
    decoded payload (stages/decode.py PyramidPool) — the raster
    overview step of a tile ingest (reference thumbnails,
    api_importer/clients/data.py asset activation).  Bytes stay inside
    the map tasks; only (image_id, pw, ph, pool_sum) rows leave.
    Round 5: pooled sums come from the FUSED pixel pass (vectorized
    ragged-anchor kernel payload_row_pool_sums)."""
    from .pixel_fused import per_image

    def project(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "pw": pa.array(w // 2),
                "ph": pa.array(h // 2),
                "pool_sum": batch.column("pool_sum"),
            }
        )

    return per_image(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["pixel_pyramid_stats"] = q_pixel_pyramid_stats


def q_bloom_semi_join(sf_dir: str):
    """Bloom-filter semi-join pushdown + its audit: urgent orderkeys
    (the dim-side selection) fold into a FIXED BLOOM_BITS-bit Bloom
    array — the broadcast stays ~2 KiB whatever the build cardinality,
    which is the whole point at 100 TB where the exact key set itself
    is too big to ship.  Probe side tests its 3 hash bits per image;
    output per satellite: bloom passes, true members (the audit side
    carries the exact set too — bounded by the dim selection) and the
    false positives the loaded filter admits.  Estimates incl. FPs are
    deterministic, so the oracle mirrors them bit-for-bit."""
    from ..stages import sketch
    from ..stages.hashagg import tree_count_sum_by_key, tree_distinct

    orders = src.table_dataset(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    )

    # one streaming pass emits BOTH the bloom bits and (for the audit
    # leg) the exact urgent keys, tagged; tree-distinct bounds the
    # reduce at BLOOM_BITS + |selection| rows
    def build_both(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        k = b.column("o_orderkey").filter(keep).to_numpy(zero_copy_only=False)
        bits = sketch.bloom_bits_batch(k)
        code = np.concatenate([bits, np.unique(k) + np.int64(spec.BLOOM_BITS)])
        return pa.table({"code": pa.array(code)})

    built = tree_distinct(
        orders.map_batches(
            build_both, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "code",
    )
    code = built.column("code").to_numpy(zero_copy_only=False)
    bloom_ref = ray.put(sketch.bloom_array_from_bits(code[code < spec.BLOOM_BITS]))
    truth_ref = ray.put(np.sort(code[code >= spec.BLOOM_BITS] - np.int64(spec.BLOOM_BITS)))

    OKEY_DIV = np.int64(spec.KEY_LN_MULT * spec.KEY_PART_MULT * spec.KEY_SUPP_MULT)

    def probe(b: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        truth = ray.get(truth_ref)
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        okey = ik // OKEY_DIV
        passes = sketch.bloom_probe(okey, bloom)
        pos = np.searchsorted(truth, okey)
        pos[pos >= len(truth)] = max(len(truth) - 1, 0)
        is_true = (truth[pos] == okey) if len(truth) else np.zeros(len(okey), bool)
        return pa.table(
            {
                "sat_id": pa.array(sat),
                "n_pass": pa.array(passes.astype(np.int64)),
                "n_true": pa.array(is_true.astype(np.int64)),
            }
        )

    probed = src.images_dataset(sf_dir, light=True).map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(probed, "sat_id", sum_cols=("n_pass", "n_true"), count_name="__n")
    n_pass = agg.column("n_pass").to_numpy(zero_copy_only=False)
    n_true = agg.column("n_true").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "sat_id": agg.column("sat_id"),
            "n_pass": pa.array(n_pass),
            "n_true": pa.array(n_true),
            "n_false_pos": pa.array(n_pass - n_true),
        }
    )


ALL_QUERIES["bloom_semi_join"] = q_bloom_semi_join


def q_cms_heavy_hitters(sf_dir: str):
    """Count-min sketch audit over document terms: the per-batch term
    counts fold into a DEPTH x WIDTH counter grid (3 KiB of int64 per
    block whatever the vocab), tree-reduced with no shuffle; the exact
    top-k heavy hitters (the top_terms exchange) are then scored
    against the sketch — est = min over rows of the hashed cell, the
    classic overestimate-only bound.  At 100 TB the grid is the only
    term state that has to exist cluster-wide."""
    from ..stages import sketch
    from ..stages.hashagg import tree_count_sum_by_key

    def cms_fold(b: pa.Table) -> pa.Table:
        keys = sketch.poly_term_keys(b.column("term").combine_chunks() if isinstance(b.column("term"), pa.ChunkedArray) else b.column("term"))
        return sketch.cms_partial_batch(keys, b.column("cnt").to_numpy(zero_copy_only=False))

    partials = _docs(sf_dir).map_batches(
        text.term_count_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).map_batches(cms_fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    tab = tree_count_sum_by_key(partials, "cell", sum_cols=("cnt",), count_name="__n")
    grid = np.zeros(spec.CMS_DEPTH * spec.CMS_WIDTH, dtype=np.int64)
    grid[tab.column("cell").to_numpy(zero_copy_only=False)] = tab.column("cnt").to_numpy(
        zero_copy_only=False
    )
    grid = grid.reshape(spec.CMS_DEPTH, spec.CMS_WIDTH)

    top = q_top_terms(sf_dir)  # exact heavy hitters (term-hash exchange)
    tcol = top.column("term")
    tcol = tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol
    est = sketch.cms_estimate(grid, sketch.poly_term_keys(tcol))
    return pa.table(
        {
            "term": top.column("term"),
            "n_exact": top.column("n"),
            "cms_est": pa.array(est),
        }
    )


ALL_QUERIES["cms_heavy_hitters"] = q_cms_heavy_hitters


def q_hll_distinct_days(sf_dir: str):
    """HyperLogLog distinct acquisition days per satellite, next to the
    exact count (the KMV op's HLL sibling): per-batch (sat, register)
    rho-max partials bound state at #sats x 64 rows whatever the
    corpus; the estimate is exact-integer (alpha in ppm, harmonic sum
    as powers of two) so the oracle reproduces the ESTIMATE bit-for-bit
    — the estimator itself is under test, not just its inputs."""
    from ..stages import sketch
    from ..stages.hashagg import tree_distinct, tree_max_by_key

    m = np.int64(1 << spec.HLL_REG_BITS)
    DAY_STRIDE = np.int64(4096)

    def reg_partial(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        day = (
            corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME)
            % np.int64(spec.TIME_SPAN_HOURS)
        ) // 24
        reg, rho = sketch.hll_register_rho(sketch.hll_value(day))
        rkey = sat * m + reg
        # per-batch register max (bounded #sats x m rows out)
        order = np.argsort(rkey, kind="stable")
        uk, start = np.unique(rkey[order], return_index=True)
        return pa.table(
            {"rkey": pa.array(uk), "rho": pa.array(np.maximum.reduceat(rho[order], start))}
        )

    def day_partial(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        day = (
            corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME)
            % np.int64(spec.TIME_SPAN_HOURS)
        ) // 24
        return pa.table({"dkey": pa.array(np.unique(sat * DAY_STRIDE + day))})

    light = lambda: src.images_dataset(sf_dir, light=True)  # noqa: E731
    regs = tree_max_by_key(
        light().map_batches(reg_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "rkey",
        "rho",
    )
    days = tree_distinct(
        light().map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "dkey",
    )

    rk = regs.column("rkey").to_numpy(zero_copy_only=False)
    rho = regs.column("rho").to_numpy(zero_copy_only=False)
    dk = days.column("dkey").to_numpy(zero_copy_only=False)
    sats = np.unique(dk // DAY_STRIDE)
    n_exact = np.searchsorted(np.sort(dk // DAY_STRIDE), sats, side="right") - np.searchsorted(
        np.sort(dk // DAY_STRIDE), sats, side="left"
    )
    est = np.empty(len(sats), dtype=np.int64)
    for i, s in enumerate(sats):
        file = np.zeros(int(m), dtype=np.int64)
        mask = rk // m == s
        file[rk[mask] % m] = rho[mask]
        est[i] = sketch.hll_estimate(file)
    return pa.table(
        {
            "sat_id": pa.array(sats),
            "n_days_exact": pa.array(n_exact.astype(np.int64)),
            "hll_est": pa.array(est),
        }
    )


ALL_QUERIES["hll_distinct_days"] = q_hll_distinct_days


def q_morton_bucket_counts(sf_dir: str):
    """Z-order locality index: centroids quantized to 8 bits/axis,
    bits interleaved, bucketed by the top 8 code bits (= depth-4
    quadtree pages) — the write-order layout a spatially-clustered
    Lance/parquet sink would sort by, with per-page row counts and key
    ranges (the manifest a reader needs for spatial pruning).  Bucket
    space is 256, so per-batch partials reduce driver-side with no
    exchange at all."""
    from ..stages import sketch
    from ..util import collect_table

    SHIFT = np.int64(2 * spec.MORTON_BITS - spec.MORTON_PREFIX_BITS)

    def partial(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        bucket = sketch.morton_codes(lon_md, lat_md) >> SHIFT
        order = np.argsort(bucket, kind="stable")
        ub, start = np.unique(bucket[order], return_index=True)
        iks = ik[order]
        return pa.table(
            {
                "bucket": pa.array(ub),
                "n": pa.array(np.diff(np.r_[start, len(bucket)]).astype(np.int64)),
                "min_key": pa.array(np.minimum.reduceat(iks, start)),
                "max_key": pa.array(np.maximum.reduceat(iks, start)),
            }
        )

    tab = collect_table(
        src.images_dataset(sf_dir, light=True).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )
    bkt = tab.column("bucket").to_numpy(zero_copy_only=False)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    mn = tab.column("min_key").to_numpy(zero_copy_only=False)
    mx = tab.column("max_key").to_numpy(zero_copy_only=False)
    order = np.argsort(bkt, kind="stable")
    ub, start = np.unique(bkt[order], return_index=True)
    return pa.table(
        {
            "bucket": pa.array(ub),
            "n_images": pa.array(np.add.reduceat(n[order], start)),
            "min_key": pa.array(np.minimum.reduceat(mn[order], start)),
            "max_key": pa.array(np.maximum.reduceat(mx[order], start)),
        }
    )


ALL_QUERIES["morton_bucket_counts"] = q_morton_bucket_counts


def q_weighted_sample_per_satellite(sf_dir: str):
    """Weighted per-group sampling (Efraimidis-Spirakis shape, exact
    integers): priority = hash // (1 + clear_confidence), so clearer
    images win proportionally more often; keep the WSAMPLE_K lowest
    (priority, key) per satellite.  Same partial-top-k combiner scale
    shape as sample_per_satellite — every block contributes at most
    #sats x k rows to the one exchange."""
    from ..util import hash_partition

    k = spec.WSAMPLE_K

    def derive(b: pa.Table):
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        key = ik % np.int64(spec.MOD)
        clear = corpus_mod._mix(key, spec.ST_CLEAR) % 101
        pri = corpus_mod._mix(key, spec.ST_WSAMPLE) // (1 + clear)
        return ik, pri

    def partial(b: pa.Table) -> pa.Table:
        ik, pri = derive(b)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        keep = _topk_per_sat(sat, pri, ik, k)
        t = b.select(["image_id", "sat_id", "image_key"]).take(pa.array(keep))
        return t.append_column("priority", pa.array(pri[keep]))

    def final(group: pa.Table) -> pa.Table:
        sat = group.column("sat_id").to_numpy(zero_copy_only=False)
        pri = group.column("priority").to_numpy(zero_copy_only=False)
        ik = group.column("image_key").to_numpy(zero_copy_only=False)
        keep = _topk_per_sat(sat, pri, ik, k)
        return group.select(["image_id", "sat_id", "priority"]).take(pa.array(keep))

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    parted = pre.map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(hash_partition(b.column("sat_id").to_numpy(zero_copy_only=False), 64)),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    return _pm(parted, lambda g: final(g.drop_columns(["__part"])))


ALL_QUERIES["weighted_sample_per_satellite"] = q_weighted_sample_per_satellite


def q_active_scenes_daily(sf_dir: str):
    """Interval aggregate via difference-array sweep: each scene is
    active for [acq_day, acq_day + dur] (spec.ST_AVAIL windows); the
    daily active count comes from ONE +1/-1 delta pair per interval
    folded into a bounded 2923-slot array per batch — never an
    interval x day join, so the work is O(intervals), not
    O(intervals x window).  The classic scale shape for concurrency /
    in-flight / backlog curves.  Tree reduce over the bounded delta
    array, driver cumsum, zero-active days dropped (group-by mirror)."""
    from ..stages.hashagg import tree_count_sum_by_key

    NDAYS = spec.TIME_SPAN_HOURS // 24  # 2922

    def deltas(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        key = ik % np.int64(spec.MOD)
        d0 = (corpus_mod._mix(key, spec.ST_TIME) % np.int64(spec.TIME_SPAN_HOURS)) // 24
        dur = corpus_mod._mix(key, spec.ST_AVAIL) % np.int64(spec.AVAIL_DUR_MOD) + 1
        d1 = np.minimum(d0 + dur, NDAYS - 1)
        delta = np.bincount(d0, minlength=NDAYS + 1).astype(np.int64)
        delta -= np.bincount(d1 + 1, minlength=NDAYS + 1).astype(np.int64)
        nz = np.flatnonzero(delta)
        return pa.table({"pos": pa.array(nz.astype(np.int64)), "delta": pa.array(delta[nz])})

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        deltas, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(pre, "pos", sum_cols=("delta",), count_name="__n")
    full = np.zeros(NDAYS + 1, dtype=np.int64)
    full[agg.column("pos").to_numpy(zero_copy_only=False)] = agg.column("delta").to_numpy(
        zero_copy_only=False
    )
    active = np.cumsum(full)[:NDAYS]
    nz = np.flatnonzero(active)
    return pa.table({"day": pa.array(nz.astype(np.int64)), "n_active": pa.array(active[nz])})


ALL_QUERIES["active_scenes_daily"] = q_active_scenes_daily


def q_coverage_regions(sf_dir: str):
    """Contiguous-coverage analysis: occupied 0.5-degree cells
    (centroid grid), 4-connected components, histogrammed by region
    size — the "how fragmented is our acquisition footprint" GIS
    report.  Distributed part = ONE bounded tree-distinct over cell
    ids (at most 680x264 rows whatever the corpus); the labeling runs
    as vectorized min-label iteration on the dense driver-side grid
    (converges in component-diameter steps; each step is one 180k-cell
    numpy pass)."""
    from ..stages.hashagg import tree_distinct

    NX = spec.LON_SPAN_MD // spec.REGION_CELL_MD
    NY = spec.REGION_NY

    def cells(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        cid = (lon_md // spec.REGION_CELL_MD) * np.int64(NY) + lat_md // spec.REGION_CELL_MD
        return pa.table({"cid": pa.array(np.unique(cid))})

    tab = tree_distinct(
        src.images_dataset(sf_dir, light=True).map_batches(
            cells, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "cid",
    )
    cid = tab.column("cid").to_numpy(zero_copy_only=False)
    occ = np.zeros((NX, NY), dtype=bool)
    occ[cid // NY, cid % NY] = True
    ids = np.arange(NX * NY, dtype=np.int64).reshape(NX, NY)
    BIG = np.int64(NX * NY + 1)
    lab = np.where(occ, ids, BIG)
    while True:
        nb = np.full_like(lab, BIG)
        nb[1:, :] = np.minimum(nb[1:, :], lab[:-1, :])
        nb[:-1, :] = np.minimum(nb[:-1, :], lab[1:, :])
        nb[:, 1:] = np.minimum(nb[:, 1:], lab[:, :-1])
        nb[:, :-1] = np.minimum(nb[:, :-1], lab[:, 1:])
        new = np.where(occ, np.minimum(lab, nb), BIG)
        if (new == lab).all():
            break
        lab = new
    _, counts = np.unique(lab[occ], return_counts=True)
    size, n = np.unique(counts, return_counts=True)
    return pa.table(
        {"region_size": pa.array(size.astype(np.int64)), "n_regions": pa.array(n.astype(np.int64))}
    )


ALL_QUERIES["coverage_regions"] = q_coverage_regions


def q_sat_coactive_days(sf_dir: str):
    """Bitmap-index set intersection: days each satellite pair was BOTH
    acquiring — the co-observation matrix behind cross-calibration
    planning.  Distributed part = one bounded tree-distinct over
    (sat, day) codes (#sats x 2922 rows max); the pair counts are a
    single (nsat x ndays) boolean matmul driver-side — the bitmap-AND
    popcount, never a day-join."""
    from ..stages.hashagg import tree_distinct

    DAY_STRIDE = np.int64(4096)

    def pairs(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        day = (
            corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME)
            % np.int64(spec.TIME_SPAN_HOURS)
        ) // 24
        return pa.table({"code": pa.array(np.unique(sat * DAY_STRIDE + day))})

    tab = tree_distinct(
        src.images_dataset(sf_dir, light=True).map_batches(
            pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "code",
    )
    code = tab.column("code").to_numpy(zero_copy_only=False)
    sats = np.unique(code // DAY_STRIDE)
    sat_ix = np.searchsorted(sats, code // DAY_STRIDE)
    days = code % DAY_STRIDE
    M = np.zeros((len(sats), spec.TIME_SPAN_HOURS // 24), dtype=np.int64)
    M[sat_ix, days] = 1
    shared = M @ M.T
    ia, ib = np.triu_indices(len(sats), k=1)
    n = shared[ia, ib]
    keep = n > 0
    return pa.table(
        {
            "sat_a": pa.array(sats[ia[keep]]),
            "sat_b": pa.array(sats[ib[keep]]),
            "n_shared": pa.array(n[keep]),
        }
    )


ALL_QUERIES["sat_coactive_days"] = q_sat_coactive_days


def q_range_partition_plan(sf_dir: str):
    """Range-partitioner build + balance audit (the planning pass of a
    distributed sort / spatially-clustered write): pass 1 collects a
    deterministic 1/64 key sample (sample size is O(corpus/64) here;
    production tunes the rate so it stays O(buckets x log)), sorts it
    driver-side and picks RP_BUCKETS-1 boundary keys at equi-depth
    ranks; pass 2 broadcasts the boundary array and bucket-assigns
    every key with one searchsorted per batch, reducing (bucket, n,
    min, max) partials — the exact per-bucket counts audit how balanced
    the plan actually is."""
    from ..util import collect_table

    B = spec.RP_BUCKETS

    def sample(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        keep = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_RPSAMPLE) % np.int64(
            spec.RP_SAMPLE_MOD
        ) == 0
        return pa.table({"key": pa.array(ik[keep])})

    s = collect_table(
        src.images_dataset(sf_dir, light=True).map_batches(
            sample, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )
    sk = np.sort(s.column("key").to_numpy(zero_copy_only=False))
    n = len(sk)
    ranks = (np.arange(1, B, dtype=np.int64) * n) // B  # 1-based rank
    boundaries = sk[ranks - 1]
    bref = ray.put(boundaries)

    def assign(b: pa.Table) -> pa.Table:
        bnd = ray.get(bref)
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(bnd, ik, side="right").astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        ub, start = np.unique(bucket[order], return_index=True)
        iks = ik[order]
        return pa.table(
            {
                "bucket": pa.array(ub),
                "n": pa.array(np.diff(np.r_[start, len(bucket)]).astype(np.int64)),
                "min_key": pa.array(np.minimum.reduceat(iks, start)),
                "max_key": pa.array(np.maximum.reduceat(iks, start)),
            }
        )

    tab = collect_table(
        src.images_dataset(sf_dir, light=True).map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )
    bkt = tab.column("bucket").to_numpy(zero_copy_only=False)
    nn = tab.column("n").to_numpy(zero_copy_only=False)
    mn = tab.column("min_key").to_numpy(zero_copy_only=False)
    mx = tab.column("max_key").to_numpy(zero_copy_only=False)
    order = np.argsort(bkt, kind="stable")
    ub, start = np.unique(bkt[order], return_index=True)
    return pa.table(
        {
            "bucket": pa.array(ub),
            "n_rows": pa.array(np.add.reduceat(nn[order], start)),
            "min_key": pa.array(np.minimum.reduceat(mn[order], start)),
            "max_key": pa.array(np.maximum.reduceat(mx[order], start)),
        }
    )


ALL_QUERIES["range_partition_plan"] = q_range_partition_plan


def q_reciprocal_nearest_city(sf_dir: str):
    """Mutual nearest-neighbor matching (the RNN rule of entity
    matching / dedup): pairs where the city's nearest image is an image
    whose nearest city is that same city.  Scale shape: the reverse
    direction IS kNN with k=1 — the ring-escalating candidate index
    (stages/knn.py: ring-1 emit, exactness guarantee, brute residue)
    bounds pair work by local density instead of a city x corpus
    matrix (a brute reverse pass measured 128 s at sf0.1; this runs
    with the knn_city_scenes budget).  The forward check then runs
    only on the <= #cities candidate images driver-side."""
    cities = src.cities_table(sf_dir)
    order = pc.sort_indices(cities, sort_keys=[("city_id", "ascending")])
    cities = cities.take(order)
    clon = cities.column("lon").to_numpy(zero_copy_only=False)
    clat = cities.column("lat").to_numpy(zero_copy_only=False)
    cid = cities.column("city_id").to_numpy(zero_copy_only=False)

    rev = knn.knn_city_scenes(src.images_dataset(sf_dir, light=True), cities, k=1)
    rev_city = rev.column("city_id").to_numpy(zero_copy_only=False)
    rev_d = rev.column("dist_sq").to_numpy(zero_copy_only=False)
    rev_k = np.array(
        [int(s[4:]) for s in rev.column("image_id").to_pylist()], dtype=np.int64
    )  # 'img-<key>' back to key (bounded #cities rows, driver-side)

    # forward check on the bounded candidate set, PRUNED: the reverse
    # distance of a candidate upper-bounds its nearest-city distance
    # (the selecting city IS at that distance), so its true nearest
    # lies in the lon band |clon - lon| <= sqrt(ub) — a searchsorted
    # range over lon-sorted cities cuts the 15k x 15k full matrix
    # (measured 19 s DRAM-bound) to ~1M ragged pair evals
    cand = np.unique(rev_k)
    ub = np.full(len(cand), np.inf)
    ci = np.searchsorted(cand, rev_k)
    np.minimum.at(ub, ci, rev_d)
    lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(cand)
    can_lon = lon_md / 1000.0 - spec.LON_OFF
    can_lat = lat_md / 1000.0 - spec.LAT_OFF
    r = np.sqrt(ub)
    lorder = np.argsort(clon, kind="stable")
    lon_s, lat_s, cid_s = clon[lorder], clat[lorder], cid[lorder]
    lo = np.searchsorted(lon_s, can_lon - r, side="left")
    hi = np.searchsorted(lon_s, can_lon + r, side="right")
    lens = hi - lo
    seg = np.repeat(np.arange(len(cand)), lens)
    flat = np.arange(len(seg)) - np.repeat(np.cumsum(lens) - lens, lens) + lo[seg]
    d = lon_s[flat] - can_lon[seg]
    d *= d
    t = lat_s[flat] - can_lat[seg]
    d += t * t
    starts = np.cumsum(lens) - lens
    md = np.minimum.reduceat(d, starts)
    # ties at the min -> lowest city_id among them
    tied_id = np.where(d == md[seg], cid_s[flat], np.iinfo(np.int64).max)
    fwd_city = np.minimum.reduceat(tied_id, starts)
    fwd_of = dict(zip(cand.tolist(), fwd_city.tolist()))
    keep = np.array([fwd_of[k] == c for k, c in zip(rev_k.tolist(), rev_city.tolist())])
    ikeys = rev_k[keep]
    return pa.table(
        {
            "city_id": pa.array(rev_city[keep]),
            "image_id": pa.array([f"img-{k}" for k in ikeys.tolist()], type=pa.string()),
            "dist_sq": pa.array(rev_d[keep]),
        }
    )


ALL_QUERIES["reciprocal_nearest_city"] = q_reciprocal_nearest_city


def q_join_size_estimate(sf_dir: str):
    """Sketch-based join-cardinality estimation (the planner op that
    decides broadcast vs shuffle): |images JOIN urgent-orders| is
    estimated as min over CMS rows of dot(grid_images, grid_orders) —
    two fixed 3 x 2^17 counter grids built in one streaming pass per
    side, no key ever leaves the tasks — next to the exact count for
    the audit.  Overestimate-only, bias ~ |A||B|/width (spec note)."""
    from ..stages import sketch
    from ..stages.hashagg import tree_count_sum_by_key

    W = spec.CMS_JOIN_WIDTH
    OKEY_DIV = np.int64(spec.KEY_LN_MULT * spec.KEY_PART_MULT * spec.KEY_SUPP_MULT)

    def cells_of(keys: np.ndarray) -> list[np.ndarray]:
        # quadratic mix, NOT the affine LCG alone: dense integer keys
        # under an affine map land in distinct cells (collision-free by
        # construction), which would make the "estimate" trivially
        # exact — the same sequential-key pitfall the HLL hash hit
        k = keys % np.int64(spec.MOD)
        out = []
        for mult, salt in spec.ST_CMS:
            u = (k * np.int64(mult) + np.int64(salt)) % np.int64(spec.MOD)
            out.append(((u * u + u) % np.int64(spec.MOD)) % np.int64(W))
        return out

    def grid_partial(keys: np.ndarray) -> pa.Table:
        out_c, out_n = [], []
        for j, cells in enumerate(cells_of(keys)):
            g = np.bincount(cells, minlength=W).astype(np.int64)
            nz = np.flatnonzero(g)
            out_c.append(nz + np.int64(j * W))
            out_n.append(g[nz])
        return pa.table(
            {
                "cell": pa.array(np.concatenate(out_c) if out_c else np.empty(0, np.int64)),
                "cnt": pa.array(np.concatenate(out_n) if out_n else np.empty(0, np.int64)),
            }
        )

    def img_part(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        return grid_partial(ik // OKEY_DIV)

    def ord_part(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        return grid_partial(b.column("o_orderkey").filter(keep).to_numpy(zero_copy_only=False))

    def to_grid(tab: pa.Table) -> np.ndarray:
        g = np.zeros(spec.CMS_DEPTH * W, dtype=np.int64)
        g[tab.column("cell").to_numpy(zero_copy_only=False)] = tab.column("cnt").to_numpy(
            zero_copy_only=False
        )
        return g.reshape(spec.CMS_DEPTH, W)

    ga = to_grid(
        tree_count_sum_by_key(
            src.images_dataset(sf_dir, light=True).map_batches(
                img_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            ),
            "cell", sum_cols=("cnt",), count_name="__n",
        )
    )
    orders = src.table_dataset(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    )
    gb = to_grid(
        tree_count_sum_by_key(
            orders.map_batches(
                ord_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            ),
            "cell", sum_cols=("cnt",), count_name="__n",
        )
    )
    est = int(min(int(np.dot(ga[j], gb[j])) for j in range(spec.CMS_DEPTH)))

    # exact side: fixed bounded broadcast of the urgent key set is the
    # audit's ground truth (dim-sized selection, same as bloom op)
    def sel_keys(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        return pa.table(
            {"k": pa.array(np.unique(b.column("o_orderkey").filter(keep).to_numpy(zero_copy_only=False)))}
        )

    from ..stages.hashagg import tree_distinct

    sel = tree_distinct(
        orders.map_batches(sel_keys, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "k",
    )
    truth = np.sort(sel.column("k").to_numpy(zero_copy_only=False))
    tref = ray.put(truth)

    def count_hits(b: pa.Table) -> pa.Table:
        tr = ray.get(tref)
        okey = b.column("image_key").to_numpy(zero_copy_only=False) // OKEY_DIV
        pos = np.searchsorted(tr, okey)
        pos[pos >= len(tr)] = max(len(tr) - 1, 0)
        hit = (tr[pos] == okey) if len(tr) else np.zeros(len(okey), bool)
        return pa.table({"z": pa.array(np.zeros(1, np.int64)), "h": pa.array([int(hit.sum())])})

    hits = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            count_hits, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "z", sum_cols=("h",), count_name="__n",
    )
    n_exact = int(hits.column("h").to_numpy(zero_copy_only=False)[0])
    one = lambda v: pa.array(np.asarray([v], dtype=np.int64))  # noqa: E731
    return pa.table({"n_exact": one(n_exact), "cms_est": one(est)})


ALL_QUERIES["join_size_estimate"] = q_join_size_estimate


def q_events_late_arrivals(sf_dir: str):
    """Watermark-correct streaming aggregation: per hour, how many
    events arrived on time vs LATE (ts below the running-max watermark
    minus 1 h at their arrival position).  The global running max over
    arrival order distributes as the two-pass prefix: bounded per-span
    maxima -> driver exclusive cummax -> broadcast offsets + local
    cummax inside each span partition.  The op every event-time
    pipeline needs before trusting its hourly counts."""
    from ..stages.hashagg import tree_count_sum_by_key, tree_max_by_key
    from ..util import collect_table

    SPAN = np.int64(spec.EV_SPAN)
    SLACK = np.int64(spec.LATE_SLACK_US)
    HOUR = np.int64(3_600_000_000)
    NEG = np.int64(-(1 << 62))

    ev = lambda: src.table_dataset(  # noqa: E731
        sf_dir, "events", columns=["event_id", "ts"]
    )

    def span_max(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        ts = b.column("ts").to_numpy(zero_copy_only=False).view("int64")
        sp = eid // SPAN
        order = np.argsort(sp, kind="stable")
        us, start = np.unique(sp[order], return_index=True)
        return pa.table(
            {"span": pa.array(us), "mx": pa.array(np.maximum.reduceat(ts[order], start))}
        )

    spans = tree_max_by_key(
        ev().map_batches(span_max, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "span",
        "mx",
    )
    sp = spans.column("span").to_numpy(zero_copy_only=False)
    mx = spans.column("mx").to_numpy(zero_copy_only=False)
    order = np.argsort(sp)
    sp, mx = sp[order], mx[order]
    # exclusive prefix max per span (prior spans only)
    prior = np.empty(len(sp), dtype=np.int64)
    prior[0] = NEG
    np.maximum.accumulate(mx[:-1], out=prior[1:]) if len(sp) > 1 else None
    prior_map = dict(zip(sp.tolist(), prior.tolist()))
    pref = ray.put(prior_map)

    def late_partial(group: pa.Table) -> pa.Table:
        pm = ray.get(pref)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False).view("int64")
        order = np.argsort(eid, kind="stable")
        eid, ts = eid[order], ts[order]
        out_h, out_on, out_late = [], [], []
        for s in np.unique(eid // SPAN):
            m = eid // SPAN == s
            t = ts[m]
            run = np.empty(len(t), dtype=np.int64)
            run[0] = pm.get(int(s), NEG)
            if len(t) > 1:
                np.maximum.accumulate(
                    np.maximum(t[:-1], pm.get(int(s), NEG)), out=run[1:]
                )
            late = t < run - SLACK
            hr = ts[m] // HOUR
            code = hr * np.int64(2) + late
            u, c = np.unique(code, return_counts=True)
            out_h.append(u)
            out_on.append(c)
        code = np.concatenate(out_h)
        cnt = np.concatenate(out_on)
        return pa.table({"code": pa.array(code), "n": pa.array(cnt.astype(np.int64))})

    parted = ev().map_batches(
        lambda b: b.append_column(
            "__part",
            pa.array(
                (b.column("event_id").to_numpy(zero_copy_only=False) // SPAN) % 64
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    per = _pm(parted, lambda g: late_partial(g.drop_columns(["__part"])))
    agg = tree_count_sum_by_key(per, "code", sum_cols=("n",), count_name="__c")
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    hr = code // 2
    late = code % 2
    uh = np.unique(hr)
    on_t = np.zeros(len(uh), dtype=np.int64)
    lt = np.zeros(len(uh), dtype=np.int64)
    ix = np.searchsorted(uh, hr)
    np.add.at(on_t, ix[late == 0], n[late == 0])
    np.add.at(lt, ix[late == 1], n[late == 1])
    return pa.table(
        {"hour_id": pa.array(uh), "n_on_time": pa.array(on_t), "n_late": pa.array(lt)}
    )


ALL_QUERIES["events_late_arrivals"] = q_events_late_arrivals


def q_fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit (the data-quality gate of an
    ingest): orphan counts for every dim-side foreign key, each dim
    keyset broadcast sorted once and probed with a searchsorted per
    batch — facts stream, dims never shuffle.  The driver tables are
    referentially clean (all-zero orphans), which the oracle's LEFT
    JOINs confirm independently."""
    from ..stages.hashagg import tree_count_sum_by_key

    def keyset(table: str, col: str) -> "ray.ObjectRef":
        t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[col])
        return ray.put(np.sort(t.column(col).to_numpy(zero_copy_only=False)))

    dims = {
        "supplier": keyset("supplier", "s_suppkey"),
        "part": keyset("part", "p_partkey"),
        "customer": keyset("customer", "c_custkey"),
    }

    def orphan_counts(fact: str, cols: dict[str, tuple[str, "ray.ObjectRef"]]):
        ds = src.table_dataset(sf_dir, fact, columns=list(cols))

        def part(b: pa.Table) -> pa.Table:
            rows_out, rel_ix = [], []
            for i, (col, (rel, ref)) in enumerate(sorted(cols.items())):
                keys = ray.get(ref)
                v = b.column(col).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, v)
                pos[pos >= len(keys)] = max(len(keys) - 1, 0)
                orphan = (keys[pos] != v) if len(keys) else np.ones(len(v), bool)
                rows_out.append((len(v), int(orphan.sum())))
                rel_ix.append(i)
            return pa.table(
                {
                    "rel": pa.array(np.asarray(rel_ix, dtype=np.int64)),
                    "n_rows": pa.array(np.asarray([r[0] for r in rows_out], np.int64)),
                    "n_orphans": pa.array(np.asarray([r[1] for r in rows_out], np.int64)),
                }
            )

        agg = tree_count_sum_by_key(
            ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
            "rel", sum_cols=("n_rows", "n_orphans"), count_name="__n",
        )
        names = [rel for _, (rel, _) in sorted(cols.items())]
        ri = agg.column("rel").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "relation": pa.array([names[i] for i in ri], type=pa.string()),
                "n_rows": agg.column("n_rows"),
                "n_orphans": agg.column("n_orphans"),
            }
        )

    pieces = [
        orphan_counts(
            "lineitem",
            {
                "l_suppkey": ("lineitem.l_suppkey->supplier", dims["supplier"]),
                "l_partkey": ("lineitem.l_partkey->part", dims["part"]),
            },
        ),
        orphan_counts("orders", {"o_custkey": ("orders.o_custkey->customer", dims["customer"])}),
        orphan_counts("events", {"user_id": ("events.user_id->customer", dims["customer"])}),
    ]
    return pa.concat_tables(pieces)


ALL_QUERIES["fk_integrity_audit"] = q_fk_integrity_audit


def q_images_analyze(sf_dir: str):
    """Catalog statistics collection (the ANALYZE every planner needs):
    per image column, row count, min/max and a KMV distinct estimate —
    one streaming pass emitting a BOUNDED partial per block (a stats
    row plus k candidate hash minima per column), reduced driver-side.
    The KMV estimate reuses the sat_distinct_days estimator so the
    ESTIMATE itself is oracle-compared, exact below k."""
    from ..util import collect_table

    K = spec.KMV_K
    COLS = ["sat_id", "w", "h", "cloud_mi", "clear_i"]

    def partial(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        key = ik % np.int64(spec.MOD)
        vals = [
            b.column("sat_id").to_numpy(zero_copy_only=False),
            b.column("w").to_numpy(zero_copy_only=False).astype(np.int64),
            b.column("h").to_numpy(zero_copy_only=False).astype(np.int64),
            corpus_mod._mix(key, spec.ST_CLOUD) % 1001,
            corpus_mod._mix(key, spec.ST_CLEAR) % 101,
        ]
        col_ix, kind, n, vmin, vmax, hv = [], [], [], [], [], []
        for i, v in enumerate(vals):
            col_ix.append(i); kind.append(0); n.append(len(v))
            vmin.append(int(v.min())); vmax.append(int(v.max())); hv.append(spec.MOD)
            u = np.unique(v)
            h = np.sort(corpus_mod._mix(u, spec.ST_KMV))[:K]
            for x in h.tolist():
                col_ix.append(i); kind.append(1); n.append(0)
                vmin.append(0); vmax.append(0); hv.append(x)
        return pa.table(
            {
                "col": pa.array(np.asarray(col_ix, np.int64)),
                "kind": pa.array(np.asarray(kind, np.int64)),
                "n": pa.array(np.asarray(n, np.int64)),
                "vmin": pa.array(np.asarray(vmin, np.int64)),
                "vmax": pa.array(np.asarray(vmax, np.int64)),
                "hv": pa.array(np.asarray(hv, np.int64)),
            }
        )

    tab = collect_table(
        src.images_dataset(sf_dir, light=True).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )
    col = tab.column("col").to_numpy(zero_copy_only=False)
    kind = tab.column("kind").to_numpy(zero_copy_only=False)
    n = tab.column("n").to_numpy(zero_copy_only=False)
    vmin = tab.column("vmin").to_numpy(zero_copy_only=False)
    vmax = tab.column("vmax").to_numpy(zero_copy_only=False)
    hv = tab.column("hv").to_numpy(zero_copy_only=False)
    out_n, out_min, out_max, out_ndv = [], [], [], []
    for i in range(len(COLS)):
        s = (col == i) & (kind == 0)
        out_n.append(int(n[s].sum()))
        out_min.append(int(vmin[s].min()))
        out_max.append(int(vmax[s].max()))
        hs = np.unique(hv[(col == i) & (kind == 1)])
        if len(hs) < K:
            out_ndv.append(float(len(hs)))
        else:
            out_ndv.append(float(K - 1) * spec.MOD / float(hs[K - 1]))
    return pa.table(
        {
            "column": pa.array(COLS, type=pa.string()),
            "n_rows": pa.array(np.asarray(out_n, np.int64)),
            "min_v": pa.array(np.asarray(out_min, np.int64)),
            "max_v": pa.array(np.asarray(out_max, np.int64)),
            "ndv_est": pa.array(np.asarray(out_ndv, np.float64)),
        }
    )


ALL_QUERIES["images_analyze"] = q_images_analyze


def q_adaptive_tile_grid(sf_dir: str):
    """Adaptive (quadtree) tile layout: cells whose image count exceeds
    ADAPTIVE_SPLIT_MAX split into their four res+1 children, down to
    res 7 — the variable-resolution tiling that equalizes per-tile work
    under spatial skew.  One streaming pass emits all three level keys
    (the cell_pyramid combiner shape); the split decision then runs on
    the bounded per-level count tables driver-side."""
    from ..stages.hashagg import tree_count_sum_by_key

    T = spec.ADAPTIVE_SPLIT_MAX
    LEVELS = (5, 6, 7)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        keys = []
        for r in LEVELS:
            edge = np.int64(4000 // (2 ** (r - 5)))
            cx = lon_md // edge
            cy = lat_md // edge
            keys.append(((np.int64(r) << np.int64(11) | cx) << np.int64(10)) | cy)
        return pa.table({"hkey": pa.array(np.concatenate(keys))})

    agg = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "hkey",
        count_name="n",
    )
    hk = agg.column("hkey").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    res = hk >> 21
    cx = (hk >> 10) & ((1 << 11) - 1)
    cy = hk & ((1 << 10) - 1)

    def level(r):
        m = res == r
        return cx[m], cy[m], n[m]

    x5, y5, n5 = level(5)
    x6, y6, n6 = level(6)
    x7, y7, n7 = level(7)
    hot5 = {(a, b) for a, b, c in zip(x5.tolist(), y5.tolist(), n5.tolist()) if c > T}
    hot6 = {
        (a, b)
        for a, b, c in zip(x6.tolist(), y6.tolist(), n6.tolist())
        if c > T and (a // 2, b // 2) in hot5
    }
    rows = []
    rows += [(5, a, b, c) for a, b, c in zip(x5.tolist(), y5.tolist(), n5.tolist()) if c <= T]
    rows += [
        (6, a, b, c)
        for a, b, c in zip(x6.tolist(), y6.tolist(), n6.tolist())
        if (a // 2, b // 2) in hot5 and c <= T
    ]
    rows += [
        (7, a, b, c)
        for a, b, c in zip(x7.tolist(), y7.tolist(), n7.tolist())
        if (a // 2, b // 2) in hot6
    ]
    res_o = np.asarray([r[0] for r in rows], np.int64)
    return pa.table(
        {
            "res": pa.array(res_o),
            "cell_x": pa.array(np.asarray([r[1] for r in rows], np.int64)),
            "cell_y": pa.array(np.asarray([r[2] for r in rows], np.int64)),
            "n_images": pa.array(np.asarray([r[3] for r in rows], np.int64)),
        }
    )


ALL_QUERIES["adaptive_tile_grid"] = q_adaptive_tile_grid


def q_time_ordered_probe(sf_dir: str):
    """Distributed-sort ordinal probe: globally sort images by
    (acquisition hour, key) with Ray's native range-partitioned sort,
    then return every PROBE_STEP-th row by GLOBAL ordinal — per-block
    row counts prefix-summed driver-side give each block its ordinal
    offset, so the probe never materializes the sorted corpus (each
    block slices only its own hits)."""
    step = np.int64(spec.PROBE_STEP)

    def derive(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % np.int64(
            spec.TIME_SPAN_HOURS
        )
        return pa.table({"hrs": pa.array(hrs), "image_key": pa.array(ik)})

    sorted_ds = (
        src.images_dataset(sf_dir, light=True)
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .sort(["hrs", "image_key"])
    )
    # per-block ordinal offsets: block sizes are tiny metadata; the
    # blocks themselves stay in the object store
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def nrows(t: pa.Table) -> int:
        return t.num_rows

    sizes = ray.get([nrows.remote(r) for r in refs])
    offsets = np.cumsum([0] + sizes[:-1])

    @ray.remote
    def probe_block(tab: pa.Table, off: int) -> pa.Table:
        # global 1-based ordinals off+1 .. off+len; hits where
        # (ordinal - 1) % step == 0
        n = tab.num_rows
        first = (-off) % step  # 0-based local index of first hit
        idx = np.arange(first, n, step, dtype=np.int64)
        out = tab.take(pa.array(idx))
        return out.append_column("ordinal", pa.array(off + idx + 1))

    parts = ray.get([probe_block.remote(r, int(o)) for r, o in zip(refs, offsets)])
    out = pa.concat_tables([p for p in parts if p.num_rows])
    return out.select(["ordinal", "hrs", "image_key"])


ALL_QUERIES["time_ordered_probe"] = q_time_ordered_probe


def q_batched_box_queries(sf_dir: str):
    """Multi-tenant query batching: NBOX deterministic lon/lat window
    queries answered in ONE corpus pass — the query set broadcasts,
    each batch computes a (rows x NBOX) containment mask and emits only
    the NBOX column sums; the combiner tree folds them.  Amortizes the
    scan across every concurrent dashboard query instead of NBOX
    corpus passes."""
    from ..stages.hashagg import tree_count_sum_by_key

    q_ix = np.arange(spec.NBOX, dtype=np.int64)
    bx0 = corpus_mod._mix(q_ix, spec.ST_BOX_X) % np.int64(
        spec.LON_SPAN_MD - spec.BOX_W_MD
    )
    by0 = corpus_mod._mix(q_ix, spec.ST_BOX_Y) % np.int64(
        spec.LAT_SPAN_MD - spec.BOX_W_MD
    )
    bx1 = bx0 + np.int64(spec.BOX_W_MD)
    by1 = by0 + np.int64(spec.BOX_W_MD)
    bref = ray.put((bx0, by0, bx1, by1))

    def part(b: pa.Table) -> pa.Table:
        x0, y0, x1, y1 = ray.get(bref)
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        inside = (
            (lon_md[:, None] >= x0[None, :])
            & (lon_md[:, None] < x1[None, :])
            & (lat_md[:, None] >= y0[None, :])
            & (lat_md[:, None] < y1[None, :])
        )
        return pa.table(
            {
                "box_id": pa.array(np.arange(spec.NBOX, dtype=np.int64)),
                "n": pa.array(inside.sum(axis=0).astype(np.int64)),
            }
        )

    agg = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "box_id", sum_cols=("n",), count_name="__c",
    )
    return pa.table({"box_id": agg.column("box_id"), "n_images": agg.column("n")})


ALL_QUERIES["batched_box_queries"] = q_batched_box_queries


def q_adaptive_tile_assignment(sf_dir: str):
    """Write-side companion of adaptive_tile_grid: every image mapped
    to its variable-resolution leaf tile (the finest ancestor in the
    leaf set — the leaves partition space, so exactly one matches),
    counted per (leaf, satellite) — the partition layout + per-sensor
    mix a skew-aware sink would write.  The bounded leaf set
    broadcasts; assignment is three packed-key searchsorted probes per
    batch (finest first), one combiner-tree fold after."""
    from ..stages.hashagg import tree_count_sum_by_key

    grid = q_adaptive_tile_grid(sf_dir)
    res = grid.column("res").to_numpy(zero_copy_only=False)
    gx = grid.column("cell_x").to_numpy(zero_copy_only=False)
    gy = grid.column("cell_y").to_numpy(zero_copy_only=False)
    leaf_keys = np.sort(((res << np.int64(11) | gx) << np.int64(10)) | gy)
    lref = ray.put(leaf_keys)
    SAT_W = np.int64(1024)

    def assign(b: pa.Table) -> pa.Table:
        leaves = ray.get(lref)
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _ = corpus_mod.geom_md_from_keys(ik)
        out = np.zeros(len(ik), dtype=np.int64)
        unresolved = np.ones(len(ik), dtype=bool)
        for r in (7, 6, 5):  # finest leaf wins
            edge = np.int64(4000 // (2 ** (r - 5)))
            k = ((np.int64(r) << np.int64(11) | lon_md // edge) << np.int64(10)) | (
                lat_md // edge
            )
            pos = np.searchsorted(leaves, k)
            pos[pos >= len(leaves)] = max(len(leaves) - 1, 0)
            hit = (leaves[pos] == k) & unresolved
            out[hit] = k[hit]
            unresolved &= ~hit
        if unresolved.any():
            raise ValueError("image outside every adaptive leaf")
        return pa.table({"code": pa.array(out * SAT_W + sat)})

    agg = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "code",
        count_name="n",
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    lk = code // SAT_W
    return pa.table(
        {
            "res": pa.array(lk >> 21),
            "cell_x": pa.array((lk >> 10) & np.int64((1 << 11) - 1)),
            "cell_y": pa.array(lk & np.int64((1 << 10) - 1)),
            "sat_id": pa.array(code % SAT_W),
            "n_images": agg.column("n"),
        }
    )


ALL_QUERIES["adaptive_tile_assignment"] = q_adaptive_tile_assignment


def q_image_kcore(sf_dir: str):
    """Graph k-core decomposition (fixed k): the maximal subgraph of the
    phash near-dup graph where every image keeps >= KCORE_K near-dup
    neighbors — the curator's screen for DENSELY re-captured scenes
    (cliques survive, stragglers and thin chains peel away).  The heavy
    stage is the distributed banded-LSH pair generation; the peel runs
    in ``stages/graph.py`` under the same size gate as connected
    components: vectorized driver sweeps below the edge threshold, two
    hash exchanges per sweep above it (edge state never
    driver-resident).  Both paths equivalence-tested."""
    from ..stages import graph

    core = graph.kcore(
        _phash_pair_keys(sf_dir), "ka", "kb",
        k=spec.KCORE_K, rounds=spec.KCORE_ROUNDS,
    )
    return core.map_batches(
        lambda b: pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(b.column("node"), pa.string()), ""
                ),
                "core_deg": b.column("core_deg"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


ALL_QUERIES["image_kcore"] = q_image_kcore


def q_grid_idw_cloud(sf_dir: str):
    """Spatial interpolation (inverse-distance weighting): a cloud-cover
    surface sampled at grid nodes every IDW_STEP_MD millidegrees, each
    node averaging the cloud fraction of centroids within
    IDW_RADIUS_MD weighted by the integer kernel WNUM // (WEPS + d2).
    Map side: each image emits at most 9 (node, w, w*v) partials (the
    3x3 node neighborhood with an exact d2 <= R2 filter — complete
    because radius <= step).  Reduce side: one combiner tree over the
    OCCUPIED grid (bounded key space, never corpus-sized) — at 10^12
    images this stays a pure pre-aggregated tree, no shuffle.  All
    arithmetic on the int64 lattice, so sums are order-free and the
    SQL mirror is bit-exact."""
    from ..stages.hashagg import tree_count_sum_by_key

    S = np.int64(spec.IDW_STEP_MD)
    R2 = np.int64(spec.IDW_RADIUS_MD) ** 2
    WNUM, WEPS = np.int64(spec.IDW_WNUM), np.int64(spec.IDW_WEPS)
    KM = np.int64(spec.IDW_KMULT)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon_md, lat_md, _hw = corpus_mod.geom_md_from_keys(ik)
        mk = ik.astype(np.int64) % np.int64(spec.MOD)
        cloud_milli = corpus_mod._mix(mk, spec.ST_CLOUD) % np.int64(1001)
        gx0, gy0 = lon_md // S, lat_md // S
        keys, ws, wvs = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                gx, gy = gx0 + dx, gy0 + dy
                ddx, ddy = lon_md - gx * S, lat_md - gy * S
                d2 = ddx * ddx + ddy * ddy
                m = d2 <= R2
                if not m.any():
                    continue
                w = WNUM // (WEPS + d2[m])
                keys.append((gx[m] + 1) * KM + (gy[m] + 1))
                ws.append(w)
                wvs.append(w * cloud_milli[m])
        if not keys:
            return pa.table(
                {"nkey": pa.array([], pa.int64()), "w": pa.array([], pa.int64()),
                 "wv": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "nkey": pa.array(np.concatenate(keys)),
                "w": pa.array(np.concatenate(ws)),
                "wv": pa.array(np.concatenate(wvs)),
            }
        )

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "nkey", sum_cols=("w", "wv"), count_name="n")
    nkey = agg.column("nkey").to_numpy(zero_copy_only=False)
    sw = agg.column("w").to_numpy(zero_copy_only=False)
    swv = agg.column("wv").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "gx": pa.array(nkey // KM - 1),
            "gy": pa.array(nkey % KM - 1),
            "n_images": agg.column("n"),
            "sum_w": pa.array(sw),
            "sum_wv": pa.array(swv),
            "idw_milli": pa.array(swv // sw),
        }
    )


ALL_QUERIES["grid_idw_cloud"] = q_grid_idw_cloud


def q_events_state_history(sf_dir: str):
    """SCD2 interval compaction (gaps-and-islands): each user's event
    stream collapses into validity intervals of consecutive equal
    event_type runs — the type-2 slowly-changing-dimension history
    build every warehouse load performs.  One hash exchange
    co-locates each user's whole stream; per partition a single
    lexsort + boundary scan handles ALL users vectorized (no per-user
    Python).  Output is run-level — bounded by the number of state
    CHANGES, not events."""
    ev = src.table_dataset(
        sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"]
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(parted, lambda g: timeseries.state_history_partition(g.drop_columns(["__part"])))


ALL_QUERIES["events_state_history"] = q_events_state_history


def q_image_knn_graph(sf_dir: str):
    """kNN-GRAPH construction (the ANN-graph build primitive behind
    HNSW/NN-Descent-style indexes): for every image, its K nearest
    other images by exact integer squared Euclidean centroid distance,
    among candidates within DENSITY_RADIUS_MD on both axes (the
    image_density Chebyshev box — its 3x3 grid neighborhood is a
    complete candidate generator).  Same bucketed self-join shape as
    image_density: one cell-hash exchange, per-cell segmented
    cross-product, then a per-PARTITION partial top-K (top-K is a
    valid combiner) and one key-hash exchange merging partials to the
    final top-K — pair work scales with LOCAL density, the merge with
    K * nodes, never all-pairs.  Ties break on neighbor key, so the
    whole ranking lives on the int64 lattice (bit-exact oracle)."""
    from ..util import hash_partition

    R = np.int64(spec.DENSITY_RADIUS_MD)
    STRIDE = np.int64(1024)
    K = int(spec.KNN_GRAPH_K)

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        x, y, _ = corpus_mod.geom_md_from_keys(ik)
        cx, cy = x // R, y // R
        parts_c, parts_k, parts_x, parts_y, parts_t = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts_c.append((cx + dx) * STRIDE + (cy + dy))
                parts_k.append(ik)
                parts_x.append(x)
                parts_y.append(y)
                kind = np.full(len(ik), 1, np.int8)
                if dx == 0 and dy == 0:
                    kind = np.zeros(len(ik), np.int8)
                parts_t.append(kind)
        c = np.concatenate(parts_c)
        return pa.table(
            {
                "cell": pa.array(c),
                "key": pa.array(np.concatenate(parts_k)),
                "x": pa.array(np.concatenate(parts_x)),
                "y": pa.array(np.concatenate(parts_y)),
                "kind": pa.array(np.concatenate(parts_t)),
                "__part": pa.array(hash_partition(c, 64)),
            }
        )

    _EMPTY = pa.table(
        {
            "key": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
            "nb": pa.array([], pa.int64()),
        }
    )

    def _topk(qk: np.ndarray, d2: np.ndarray, nb: np.ndarray) -> pa.Table:
        """Per probe key, the K smallest (d2, nb) rows — shared by the
        per-partition partial and the final merge (top-K composes)."""
        if len(qk) == 0:
            return _EMPTY
        order = np.lexsort((nb, d2, qk))
        qk, d2, nb = qk[order], d2[order], nb[order]
        first = np.ones(len(qk), dtype=bool)
        first[1:] = qk[1:] != qk[:-1]
        idx = np.arange(len(qk), dtype=np.int64)
        first_idx = np.nonzero(first)[0]
        reps = np.diff(np.append(first_idx, len(qk)))
        rank = idx - np.repeat(idx[first_idx], reps)
        keep = rank < K
        return pa.table(
            {"key": pa.array(qk[keep]), "d2": pa.array(d2[keep]), "nb": pa.array(nb[keep])}
        )

    def partial_knn(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        if len(cell) == 0:
            return _EMPTY
        # dedup identical corpus rows per (cell, key, kind)
        order = np.lexsort((kind, key, cell))
        cell, key, x, y, kind = (
            cell[order], key[order], x[order], y[order], kind[order]
        )
        first = np.ones(len(cell), dtype=bool)
        first[1:] = (
            (cell[1:] != cell[:-1]) | (key[1:] != key[:-1]) | (kind[1:] != kind[:-1])
        )
        cell, key, x, y, kind = (
            cell[first], key[first], x[first], y[first], kind[first]
        )
        is_pt = kind == 0
        pcell, pkey, px, py = cell[is_pt], key[is_pt], x[is_pt], y[is_pt]
        if len(pcell) == 0:
            return _EMPTY
        pstart = np.searchsorted(pcell, cell, side="left")
        pend = np.searchsorted(pcell, cell, side="right")
        cnt = pend - pstart
        tot = int(cnt.sum())
        if tot == 0:
            return _EMPTY
        qi = np.repeat(np.arange(len(cell), dtype=np.int64), cnt)
        within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pi = np.repeat(pstart, cnt) + within
        ddx = x[qi] - px[pi]
        ddy = y[qi] - py[pi]
        ok = (np.abs(ddx) <= R) & (np.abs(ddy) <= R) & (key[qi] != pkey[pi])
        return _topk(
            key[qi][ok], (ddx * ddx + ddy * ddy)[ok], pkey[pi][ok]
        )

    def merge_knn(group: pa.Table) -> pa.Table:
        t = _topk(
            group.column("key").to_numpy(zero_copy_only=False),
            group.column("d2").to_numpy(zero_copy_only=False),
            group.column("nb").to_numpy(zero_copy_only=False),
        )
        qk = t.column("key").to_numpy(zero_copy_only=False)
        first = np.ones(len(qk), dtype=bool)
        first[1:] = qk[1:] != qk[:-1]
        idx = np.arange(len(qk), dtype=np.int64)
        first_idx = np.nonzero(first)[0]
        reps = np.diff(np.append(first_idx, len(qk)))
        rank = idx - np.repeat(idx[first_idx], reps) + 1
        return pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(t.column("key"), pa.string()), ""
                ),
                "nb_rank": pa.array(rank),
                "neighbor_id": pc.binary_join_element_wise(
                    "img-", pc.cast(t.column("nb"), pa.string()), ""
                ),
                "d2": t.column("d2"),
            }
        )

    partials = (
        _pm(src.images_dataset(sf_dir, light=True)
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None), lambda g: partial_knn(g.drop_columns(["__part"])))
    )

    def tag_key(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy(zero_copy_only=False)
        return b.append_column("__part", pa.array(hash_partition(k, 64)))

    return (
        _pm(partials.map_batches(
            tag_key, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ), lambda g: merge_knn(g.drop_columns(["__part"])))
    )


ALL_QUERIES["image_knn_graph"] = q_image_knn_graph


def q_sat_fmt_cube(sf_dir: str):
    """OLAP CUBE / GROUPING SETS: counts + cloud sums at ALL four
    grouping levels of (sat_id, fmt) — (sat,fmt), sat subtotals, fmt
    subtotals, grand total — with the standard GROUPING() bitmask id
    (bit 1 = sat aggregated, bit 0 = fmt aggregated).  Distributed
    work computes only the FINEST level (a bounded-key combiner tree);
    every coarser level is derived from it exactly (integer sums
    compose), so the cube costs one pass regardless of how many
    grouping sets are requested — the rollup-from-finest plan a
    warehouse optimizer picks."""
    from ..stages.hashagg import tree_count_sum_by_key

    FMT_W = np.int64(2)

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mk = ik.astype(np.int64) % np.int64(spec.MOD)
        cloud_milli = corpus_mod._mix(mk, spec.ST_CLOUD) % np.int64(1001)
        isq = (
            batch.column("fmt").to_numpy(zero_copy_only=False) == "qraw8"
        ).astype(np.int64)
        return pa.table(
            {"ck": pa.array(sat * FMT_W + isq), "cloud_milli": pa.array(cloud_milli)}
        )

    agg = tree_count_sum_by_key(
        src.images_dataset(sf_dir, light=True).map_batches(
            pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "ck",
        sum_cols=("cloud_milli",),
        count_name="n",
    )
    ck = agg.column("ck").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    cm = agg.column("cloud_milli").to_numpy(zero_copy_only=False)
    sat, isq = ck // FMT_W, ck % FMT_W
    fmt_str = np.where(isq == 1, "qraw8", "raw8")

    def level(gid, sat_v, fmt_v, keys):
        """exact rollup of the finest cells grouped by ``keys``."""
        if keys is None:
            u = np.zeros(1, np.int64)
            inv = np.zeros(len(ck), np.int64)
        else:
            u, inv = np.unique(keys, return_inverse=True)
        ln = np.zeros(len(u), np.int64)
        lc = np.zeros(len(u), np.int64)
        np.add.at(ln, inv, n)
        np.add.at(lc, inv, cm)
        m = len(u)
        return pa.table(
            {
                "gid": pa.array(np.full(m, gid, np.int64)),
                "sat_id": pa.array(
                    sat_v(u) if sat_v else np.full(m, None, object), type=pa.int64()
                ),
                "fmt": pa.array(
                    fmt_v(u) if fmt_v else np.full(m, None, object), type=pa.string()
                ),
                "n_images": pa.array(ln),
                "sum_cloud_milli": pa.array(lc),
            }
        )

    finest = level(0, lambda u: u // FMT_W, lambda u: np.where(u % FMT_W == 1, "qraw8", "raw8"), ck)
    by_sat = level(1, lambda u: u, None, sat)
    by_fmt = level(2, None, lambda u: np.where(u == 1, "qraw8", "raw8"), isq)
    total = level(3, None, None, None)
    return pa.concat_tables([finest, by_sat, by_fmt, total])


ALL_QUERIES["sat_fmt_cube"] = q_sat_fmt_cube


def q_stratified_split(sf_dir: str):
    """EXACT-quota stratified train/val/test split: within each
    satellite (the stratum), rows ranked by the deterministic split
    hash take 'train' while rank*100 < n*80, 'val' while < n*90, else
    'test' — every stratum hits its 80/10/10 quota exactly (the
    stateless hash split in q_dataset_split only guarantees the
    proportions in expectation, which skews small strata).  Scale
    shape: ONE hash exchange on the stratum key; the rank is a
    vectorized lexsort inside each stratum partition and the quota
    derives from the partition's own size — no second pass, no
    broadcast, and the integer comparison rank*100 < n*pct is mirrored
    verbatim in the oracle."""

    def prep(b: pa.Table) -> pa.Table:
        k = b.column("image_key").to_numpy(zero_copy_only=False)
        h = corpus_mod._mix(k % np.int64(spec.MOD), spec.ST_SPLIT)
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "sat_id": b.column("sat_id"),
                "image_key": b.column("image_key"),
                "h": pa.array(h.astype(np.int64)),
            }
        )

    def split_partition(g: pa.Table) -> pa.Table:
        n = g.num_rows
        h = g.column("h").to_numpy(zero_copy_only=False)
        k = g.column("image_key").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, h))
        rk = np.empty(n, np.int64)
        rk[order] = np.arange(n, dtype=np.int64)
        split = np.where(
            rk * 100 < n * spec.SPLIT_TRAIN_PCT,
            "train",
            np.where(rk * 100 < n * spec.SPLIT_VAL_PCT, "val", "test"),
        )
        return pa.table(
            {
                "image_id": g.column("image_id"),
                "sat_id": g.column("sat_id"),
                "split": pa.array(split, type=pa.string()),
            }
        )

    ds = src.images_dataset(sf_dir, light=True).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return ds.groupby("sat_id").map_groups(split_partition, batch_format="pyarrow")


ALL_QUERIES["stratified_split"] = q_stratified_split


def q_events_asof_interpolate(sf_dir: str):
    """Sandwich join + linear interpolation (custom operator the
    Dataset API lacks): per user, each purchase's value interpolated
    between the surrounding views on the user's track — the positional
    analog of q_events_asof_join.  Same shape: event-type pushdown at
    the scan, ONE user-hash exchange, two searchsorteds per partition
    (see stages/timeseries.py:interpolate_partition)."""
    import pyarrow.dataset as pads

    flt = pads.field("event_type").isin(["view", "purchase"])
    ev = src.table_dataset(
        sf_dir, "events",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
        filter=flt,
    )
    parted = ev.map_batches(
        timeseries.add_user_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(parted, lambda g: timeseries.interpolate_partition(g.drop_columns(["__part"])))


ALL_QUERIES["events_asof_interpolate"] = q_events_asof_interpolate


def q_ngram_jaccard_hist(sf_dir: str):
    """Threshold-sensitivity curve of the exact near-dup index: the
    verified pair set histogrammed by integer Jaccard percent
    (n_inter*100 // n_union) — the curator's plot for picking tau
    before a 100-TB dedup run.  Cost: the histogram rides the already
    output-proportional verified pair table; buckets are exact
    integers on both sides."""
    pairs = q_ngram_jaccard_dups(sf_dir)
    inter = pairs.column("n_inter").to_numpy(zero_copy_only=False)
    union = pairs.column("n_union").to_numpy(zero_copy_only=False)
    pct = inter * np.int64(100) // union
    u, c = np.unique(pct, return_counts=True)
    return pa.table(
        {
            "jaccard_pct": pa.array(u.astype(np.int64)),
            "n_pairs": pa.array(c.astype(np.int64)),
        }
    )


ALL_QUERIES["ngram_jaccard_hist"] = q_ngram_jaccard_hist


def q_tile_change_detect(sf_dir: str):
    """CHANGE DETECTION over the tile grid (the classic satellite
    application of raster<->vector assignment): per tile, mean decoded
    pixel brightness of the images acquired in the FIRST half of the
    acquisition window vs the SECOND, emitting tiles whose mean moved
    by >= spec.CHANGE_MILLI/1000 units.  One fused stage derives
    metadata + payload, sums REAL pixel bytes buffer-level, drops the
    bytes and explodes tiles carrying only (half, n_px, pix_sum) —
    pixels never leave the task; the exchange is the bounded
    (tile x 2)-keyed tree aggregate (tile_manifest's pattern).  The
    change test |ps_b*npx_a - ps_a*npx_b|*1000 >= CHANGE_MILLI *
    npx_a*npx_b is pure int64 (exact, no float boundary); the reported
    means/delta are single mirrored double divisions.  int64 range
    note: 255*npx^2 <= 2^63 bounds npx per tile-half at ~1.9e8 pixels —
    beyond that (mega-hot tiles at 10^12-image scale) this test needs
    the int128 the oracle's HUGEINT already uses.
    Round 5: (n_px, pix_sum) come from the FUSED pixel pass; footprints
    and the acquisition half re-derive from image_key — the tile
    explode leg is payload-free."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..stages.tiles import explode_tiles
    from .pixel_fused import attach_footprints, per_image

    def derive_decode_explode(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        half = (hrs * 2 >= spec.TIME_SPAN_HOURS).astype(np.int64)
        imgs = attach_footprints(
            batch.select(["image_key", "n_px", "pix_sum"])
        ).append_column("half", pa.array(half))
        ex = explode_tiles(imgs, ("half", "n_px", "pix_sum"))
        code = (
            ex.column("tile_id").to_numpy(zero_copy_only=False) * np.int64(2)
            + ex.column("half").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "code": pa.array(code),
                "n_px": ex.column("n_px"),
                "pix_sum": ex.column("pix_sum"),
            }
        )

    exploded = per_image(sf_dir).map_batches(
        derive_decode_explode,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    agg = tree_count_sum_by_key(
        exploded, "code", sum_cols=("n_px", "pix_sum"), count_name="n_img"
    )
    code = agg.column("code").to_numpy(zero_copy_only=False)
    n = agg.column("n_img").to_numpy(zero_copy_only=False)
    npx = agg.column("n_px").to_numpy(zero_copy_only=False)
    ps = agg.column("pix_sum").to_numpy(zero_copy_only=False)
    tile = code >> np.int64(1)
    is_b = (code & np.int64(1)).astype(bool)
    order_a = np.argsort(tile[~is_b], kind="stable")
    order_b = np.argsort(tile[is_b], kind="stable")
    ta, tb = tile[~is_b][order_a], tile[is_b][order_b]
    both, ia, ib = np.intersect1d(ta, tb, assume_unique=True, return_indices=True)
    n_a, npx_a, ps_a = n[~is_b][order_a][ia], npx[~is_b][order_a][ia], ps[~is_b][order_a][ia]
    n_b, npx_b, ps_b = n[is_b][order_b][ib], npx[is_b][order_b][ib], ps[is_b][order_b][ib]
    keep = np.abs(ps_b * npx_a - ps_a * npx_b) * np.int64(1000) >= (
        np.int64(spec.CHANGE_MILLI) * npx_a * npx_b
    )
    mean_a = ps_a[keep] / npx_a[keep].astype(np.float64)
    mean_b = ps_b[keep] / npx_b[keep].astype(np.float64)
    return pa.table(
        {
            "tile_id": pa.array(both[keep]),
            "n_a": pa.array(n_a[keep]),
            "n_b": pa.array(n_b[keep]),
            "mean_a": pa.array(mean_a),
            "mean_b": pa.array(mean_b),
            "delta": pa.array(mean_b - mean_a),
        }
    )


ALL_QUERIES["tile_change_detect"] = q_tile_change_detect


def q_grid_dbscan(sf_dir: str):
    """Grid DBSCAN (the named spatial-clustering algorithm, cell
    formulation): 2-degree centroid cells with >= spec.DBSCAN_MINPTS
    images are CORES; 8-connected cores merge into clusters labelled by
    their minimum cell key; occupied non-core cells adjacent to a core
    join the minimum adjacent cluster as BORDER; everything else is
    noise (excluded).  Scale shape: the corpus collapses to the bounded
    cell histogram in one combiner tree (grid_hotspots' exchange) —
    cores/labels are O(grid area), independent of image count, so the
    min-label iteration runs driver-side on a few thousand cells while
    the 10^12 images never shuffle."""
    from ..stages.hashagg import tree_count_sum_by_key

    GYW = np.int64(1000)  # |gy| < 500: key = gx*1000+gy is (gx, gy)-monotone

    def pack(batch: pa.Table) -> pa.Table:
        lon = batch.column("centroid_lon").to_numpy(zero_copy_only=False)
        lat = batch.column("centroid_lat").to_numpy(zero_copy_only=False)
        gx = np.floor(lon / 2.0).astype(np.int64)
        gy = np.floor(lat / 2.0).astype(np.int64)
        return pa.table({"k": pa.array(gx * GYW + gy)})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "k", count_name="n")
    k = agg.column("k").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(k)
    k, n = k[order], n[order]
    is_core = n >= spec.DBSCAN_MINPTS
    ck = k[is_core]
    # 8-neighborhood edges among cores: membership by searchsorted
    offs = np.array(
        [d for d in (dx * int(GYW) + dy for dx in (-1, 0, 1) for dy in (-1, 0, 1)) if d],
        dtype=np.int64,
    )
    nbr = ck[:, None] + offs[None, :]
    pos = np.searchsorted(ck, nbr)
    hit = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == nbr)
    src_i = np.repeat(np.arange(len(ck), dtype=np.int64), hit.sum(axis=1))
    dst_i = pos[hit]
    # min-label propagation to fixpoint: label = min core key in component
    label = ck.copy()
    while True:
        new = label.copy()
        np.minimum.at(new, dst_i, label[src_i])
        np.minimum.at(new, src_i, label[dst_i])
        if np.array_equal(new, label):
            break
        label = new
    # border: occupied non-core cells take the min adjacent core cluster
    bk, bn = k[~is_core], n[~is_core]
    if len(ck):
        bnbr = bk[:, None] + offs[None, :]
        bpos = np.searchsorted(ck, bnbr)
        bhit = (bpos < len(ck)) & (ck[np.minimum(bpos, len(ck) - 1)] == bnbr)
        blab = np.where(bhit, label[np.minimum(bpos, len(ck) - 1)], np.int64(2**62))
        bmin = blab.min(axis=1)
        has_core = bhit.any(axis=1)
    else:
        bmin = np.zeros(len(bk), dtype=np.int64)
        has_core = np.zeros(len(bk), dtype=bool)
    out_k = np.concatenate([ck, bk[has_core]])
    out_n = np.concatenate([n[is_core], bn[has_core]])
    out_c = np.concatenate([label, bmin[has_core]])
    out_role = np.concatenate(
        [np.full(len(ck), "core", dtype="U6"), np.full(int(has_core.sum()), "border", dtype="U6")]
    )
    # decode k = gx*1000 + gy with gy in [-500, 500) (keys can be negative)
    r = np.mod(out_k, GYW)
    gy = np.where(r >= 500, r - GYW, r)
    gx = (out_k - gy) // GYW
    return pa.table(
        {
            "grid_lon": pa.array(gx),
            "grid_lat": pa.array(gy),
            "n_images": pa.array(out_n),
            "cluster_id": pa.array(out_c),
            "role": pa.array(out_role, type=pa.string()),
        }
    )


ALL_QUERIES["grid_dbscan"] = q_grid_dbscan


def q_sat_otsu_threshold(sf_dir: str):
    """Per-satellite Otsu binarization threshold over the pooled
    decoded-pixel histogram — the classic automatic mask-threshold
    selection (land/water, cloud/clear) run before masking imagery
    from each sensor (the reference decodes pixels for its image
    screens: /root/reference/tests/e2e/test_app.py:42-49; this is the
    radiometric-analysis layer the engine adds on top).  Pooled
    (sat x 256) histogram via _sat_pixel_hist_agg (fused derive ->
    chunked bincount -> bounded tree partials; pixel bytes never leave
    the task) -> Otsu's between-class-variance argmax driver-side on
    the tiny aggregate in EXACT arbitrary-precision integers:
    score_u = floor(1e6 * (s0*(N-w0) - (S-s0)*w0)^2 / (w0*(N-w0)*N^2))
    (micro-units of sigma_b^2), candidates = present pixel values with
    0 < w0 < N, ties -> lowest threshold.  The oracle mirrors the same
    integer floor in HUGEINT."""
    agg = _sat_pixel_hist_agg(sf_dir)
    code = agg.column("code").to_numpy(zero_copy_only=False)
    cnt = agg.column("n_pixels").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, cnt = code[order], cnt[order]
    sat = code // 256
    val = code % 256
    us, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    out_sat, out_t, out_score, out_n = [], [], [], []
    for gi in range(len(us)):
        lo, hi = int(bounds[gi]), int(bounds[gi + 1])
        vs = val[lo:hi]
        cs = cnt[lo:hi]
        N = int(cs.sum())
        S = int((vs * cs).sum())
        w0 = 0
        s0 = 0
        best_score = -1
        best_t = -1
        # exact Python-int arithmetic: d^2 * 1e6 overflows int64 long
        # before the corpus does, and the driver loop is over a bounded
        # (sats x <=256) aggregate, not the corpus
        for v, c in zip(vs.tolist(), cs.tolist()):
            w0 += c
            s0 += v * c
            if w0 >= N:
                break
            d = s0 * (N - w0) - (S - s0) * w0
            score = (d * d * 1_000_000) // (w0 * (N - w0) * N * N)
            if score > best_score:
                best_score, best_t = score, v
        if best_t >= 0:
            out_sat.append(int(us[gi]))
            out_t.append(best_t)
            out_score.append(best_score)
            out_n.append(N)
    return pa.table(
        {
            "sat_id": pa.array(np.asarray(out_sat, dtype=np.int64)),
            "threshold": pa.array(np.asarray(out_t, dtype=np.int64)),
            "score_u": pa.array(np.asarray(out_score, dtype=np.int64)),
            "n_pixels": pa.array(np.asarray(out_n, dtype=np.int64)),
        }
    )


ALL_QUERIES["sat_otsu_threshold"] = q_sat_otsu_threshold


def q_sat_pixel_gini(sf_dir: str):
    """Per-satellite Gini impurity of the pooled decoded-pixel value
    distribution — the exact-integer concentration screen that flags a
    sensor whose histogram collapsed (stuck detector, saturated gain:
    impurity drops toward 0) vs a healthy wide distribution (-> 1).
    gini_ppm = 1e6 - (1e6 * sum_v c_v^2) // N^2, computed in Python
    arbitrary-precision ints on the tiny (sat x <=256) aggregate from
    _sat_pixel_hist_agg (pixel bytes never leave the read task); the
    oracle mirrors the same floor in HUGEINT.

    Acknowledged scale bound (round-4 ADVICE): sum_sq is emitted as an
    int64 column, which overflows past ~9.2e18 — i.e. >~3e9 pixels
    concentrated on ONE value for ONE satellite; the oracle's
    CAST(ssq AS BIGINT) fails at the same point, so behavior stays
    mirrored (a crash, not silent corruption).  Beyond that, emit
    sum_sq as two 63-bit limbs (the monthly_mean_center convention)."""
    agg = _sat_pixel_hist_agg(sf_dir)
    code = agg.column("code").to_numpy(zero_copy_only=False)
    cnt = agg.column("n_pixels").to_numpy(zero_copy_only=False)
    order = np.argsort(code)
    code, cnt = code[order], cnt[order]
    sat = code // 256
    us, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    out_sat, out_n, out_ssq, out_g = [], [], [], []
    for gi in range(len(us)):
        cs = cnt[int(bounds[gi]) : int(bounds[gi + 1])].tolist()
        N = sum(cs)
        ssq = sum(c * c for c in cs)
        out_sat.append(int(us[gi]))
        out_n.append(N)
        out_ssq.append(ssq)
        out_g.append(1_000_000 - (1_000_000 * ssq) // (N * N))
    return pa.table(
        {
            "sat_id": pa.array(np.asarray(out_sat, dtype=np.int64)),
            "n_pixels": pa.array(np.asarray(out_n, dtype=np.int64)),
            "sum_sq": pa.array(np.asarray(out_ssq, dtype=np.int64)),
            "gini_ppm": pa.array(np.asarray(out_g, dtype=np.int64)),
        }
    )


ALL_QUERIES["sat_pixel_gini"] = q_sat_pixel_gini


def q_sat_gradient_energy(sf_dir: str):
    """Per-satellite first-difference edge energy over the REAL decoded
    payload bytes: sum of |p[i+1] - p[i]| within each image's row-major
    pixel stream (the 1-D gradient magnitude used as a cheap
    sharpness / texture screen before mosaicking).  A neighborhood
    pixel kernel, not a histogram: per batch the flat Arrow binary
    buffer is diffed once (vectorized int16 abs-diff), per-row sums
    come from one cumulative-sum gather (no reduceat empty-segment
    pitfalls), row-boundary diffs are excluded exactly, and only
    bounded per-satellite (energy, n_diffs) integer partials reduce
    through the tree.  mean_milli = 1000 * energy // n_diffs, exact.
    Round 5: the per-image (e_h, nd_h) come from the FUSED pixel pass
    (pipelines/pixel_fused) — no dedicated decode scan."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sat_id": batch.column("sat_id"),
                "energy": batch.column("e_h"),
                "n_diffs": batch.column("nd_h"),
            }
        )

    partials = per_image(sf_dir).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(partials, "sat_id", sum_cols=("energy", "n_diffs"), count_name="__n")
    sat = agg.column("sat_id").to_numpy(zero_copy_only=False)
    e = agg.column("energy").to_numpy(zero_copy_only=False)
    nd = agg.column("n_diffs").to_numpy(zero_copy_only=False)
    order = np.argsort(sat)
    sat, e, nd = sat[order], e[order], nd[order]
    return pa.table(
        {
            "sat_id": pa.array(sat),
            "energy": pa.array(e),
            "n_diffs": pa.array(nd),
            "mean_milli": pa.array(e * np.int64(1000) // nd),
        }
    )


ALL_QUERIES["sat_gradient_energy"] = q_sat_gradient_energy


def q_sat_vertical_gradient(sf_dir: str):
    """Per-satellite VERTICAL edge energy over the REAL decoded payload
    bytes: sum of |p[i+w] - p[i]| per image (w = the image's pixel
    width, so each pair is a vertically adjacent pixel in the
    row-major stream) — the 2-D companion of sat_gradient_energy's
    horizontal kernel, the anisotropy screen (scan-line striping shows
    up as horizontal>>vertical energy).  The per-row lag kernel groups
    rows by width inside the batch and runs one ragged gather + uint8
    abs-diff + prefix-sum gather per width group (payload_row_lag_energy);
    only bounded per-satellite (energy, n_diffs) partials reduce
    through the tree.  mean_milli = 1000 * energy // n_diffs, exact;
    the oracle mirrors the ramp's per-residue closed form.
    Round 5: per-image (e_v, nd_v) come from the FUSED pixel pass."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sat_id": batch.column("sat_id"),
                "energy": batch.column("e_v"),
                "n_diffs": batch.column("nd_v"),
            }
        )

    partials = per_image(sf_dir).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(partials, "sat_id", sum_cols=("energy", "n_diffs"), count_name="__n")
    sat = agg.column("sat_id").to_numpy(zero_copy_only=False)
    e = agg.column("energy").to_numpy(zero_copy_only=False)
    nd = agg.column("n_diffs").to_numpy(zero_copy_only=False)
    order = np.argsort(sat)
    sat, e, nd = sat[order], e[order], nd[order]
    return pa.table(
        {
            "sat_id": pa.array(sat),
            "energy": pa.array(e),
            "n_diffs": pa.array(nd),
            "mean_milli": pa.array(e * np.int64(1000) // nd),
        }
    )


ALL_QUERIES["sat_vertical_gradient"] = q_sat_vertical_gradient


def q_sat_gradient_anisotropy(sf_dir: str):
    """Horizontal-vs-vertical edge-energy anisotropy per satellite —
    the scan-line artifact screen (push-broom striping shows up as
    mean horizontal gradient >> vertical).  BOTH direction kernels run
    fused in ONE payload pass (each byte is read once from the object
    store, both kernels touch it, only bounded per-sat integer
    partials leave the task); the ratio of means is exact:
    aniso_milli = 1000 * e_h * nd_v // (e_v * nd_h) in Python
    arbitrary-precision ints on the tiny per-sat aggregate, HUGEINT
    in the oracle.  Round 5: both direction kernels already ran fused
    in the ONE shared pixel pass (pipelines/pixel_fused); this query
    is now a bounded per-sat fold over the per-image metrics."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    def fold(batch: pa.Table) -> pa.Table:
        return batch.select(["sat_id", "e_h", "nd_h", "e_v", "nd_v"])

    partials = per_image(sf_dir).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(
        partials, "sat_id", sum_cols=("e_h", "nd_h", "e_v", "nd_v"), count_name="__n"
    )
    sat = agg.column("sat_id").to_numpy(zero_copy_only=False)
    order = np.argsort(sat)
    vals = {
        nm: agg.column(nm).to_numpy(zero_copy_only=False)[order]
        for nm in ("e_h", "nd_h", "e_v", "nd_v")
    }
    aniso = [
        (1000 * int(eh) * int(ndv)) // (int(ev) * int(ndh))
        for eh, ndh, ev, ndv in zip(
            vals["e_h"], vals["nd_h"], vals["e_v"], vals["nd_v"]
        )
    ]
    return pa.table(
        {
            "sat_id": pa.array(sat[order]),
            "e_h": pa.array(vals["e_h"]),
            "nd_h": pa.array(vals["nd_h"]),
            "e_v": pa.array(vals["e_v"]),
            "nd_v": pa.array(vals["nd_v"]),
            "aniso_milli": pa.array(np.asarray(aniso, dtype=np.int64)),
        }
    )


ALL_QUERIES["sat_gradient_anisotropy"] = q_sat_gradient_anisotropy


def q_pixel_metrics_fused(sf_dir: str):
    """The round-5 shared-scan fusion rollup (pipelines/pixel_fused):
    ONE derive -> decode pass computes EVERY per-image pixel metric;
    this query is the per-satellite integer rollup of the fused
    metrics table — the direct oracle check of the fused pass itself
    (each consuming query is additionally oracle-checked on its own).
    Columns: image/pixel counts, exact pixel sum + sum of squares,
    horizontal/vertical gradient energy + diff counts, bright-run
    count, foreground-pixel and 4-connected blob counts."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    cols = (
        "n_px", "pix_sum", "sumsq", "e_h", "nd_h", "e_v", "nd_v",
        "n_runs", "n_fg", "n_blobs",
    )
    agg = tree_count_sum_by_key(
        per_image(sf_dir).map_batches(
            lambda b: b.select(["sat_id", *cols]),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ),
        "sat_id",
        sum_cols=cols,
        count_name="n_images",
    )
    sat = agg.column("sat_id").to_numpy(zero_copy_only=False)
    order = np.argsort(sat)
    out = {"sat_id": pa.array(sat[order])}
    out["n_images"] = pa.array(
        agg.column("n_images").to_numpy(zero_copy_only=False)[order]
    )
    for c in cols:
        out[c] = pa.array(agg.column(c).to_numpy(zero_copy_only=False)[order])
    return pa.table(out)


ALL_QUERIES["pixel_metrics_fused"] = q_pixel_metrics_fused


def q_sat_codec_psnr(sf_dir: str):
    """The BASELINE per-row lossy-codec invariant (decoded-pixel PSNR
    >= 40 dB for qraw8) promoted to a distributed per-satellite audit
    over the REAL stored bytes: the fused pass regenerates each ramp
    original and accumulates the exact squared quantization residual
    per image (stages/decode.payload_row_quant_sse — a corrupted
    payload shows as an impossible residual).  Output is all-integer
    (exact, no libm): per satellite over its qraw8 images — image and
    pixel counts, total SSE, mse_ppm = 1e6*sse//n_px, and
    n_below_40db, the count of images FAILING the 40 dB bar via the
    exact integer test 10000*sse > 65025*n_px (0 for a healthy corpus:
    the ramp's mean squared residual is ~(0+1+4+9)/4 = 3.5, i.e.
    PSNR ~ 42.7 dB > 40)."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    def fold(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        isq = ik % spec.LOSSY_EVERY_MOD >= 8
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False)[isq]
        npx = batch.column("n_px").to_numpy(zero_copy_only=False)[isq]
        sse = batch.column("sse_q").to_numpy(zero_copy_only=False)[isq]
        below = (np.int64(10000) * sse > np.int64(65025) * npx).astype(np.int64)
        return pa.table(
            {
                "sat_id": pa.array(sat),
                "n_px": pa.array(npx),
                "sse": pa.array(sse),
                "n_below_40db": pa.array(below),
            }
        )

    agg = tree_count_sum_by_key(
        per_image(sf_dir).map_batches(
            fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "sat_id",
        sum_cols=("n_px", "sse", "n_below_40db"),
        count_name="n_images",
    )
    sat = agg.column("sat_id").to_numpy(zero_copy_only=False)
    order = np.argsort(sat)
    g = lambda c: agg.column(c).to_numpy(zero_copy_only=False)[order]
    npx, sse = g("n_px"), g("sse")
    return pa.table(
        {
            "sat_id": pa.array(sat[order]),
            "n_images": pa.array(g("n_images")),
            "n_px": pa.array(npx),
            "sse": pa.array(sse),
            "mse_ppm": pa.array(np.int64(1_000_000) * sse // npx),
            "n_below_40db": pa.array(g("n_below_40db")),
        }
    )


ALL_QUERIES["sat_codec_psnr"] = q_sat_codec_psnr


def q_sat_bright_runs(sf_dir: str):
    """Per-satellite count of maximal BRIGHT runs (stored value >
    spec.BRIGHT_T) in each image's row-major pixel stream — the 1-D
    morphological connected-component count that sits under blob /
    glint detection, with row boundaries breaking runs.  The kernel
    thresholds the REAL payload bytes once per batch (vectorized
    uint8 compare), counts run starts as 0->1 transitions via one
    prefix-sum gather (the sat_gradient_energy shape: row-boundary
    pairs excluded exactly) plus the row-leading bright pixel, and
    reduces only bounded per-satellite integer partials.  The oracle
    mirrors the ramp's closed form: within a ramp, a run starts
    exactly where the value equals the lowest bright level (193 raw8 /
    196 qraw8), plus the first-pixel case.
    Round 5: per-image run counts come from the FUSED pixel pass."""
    from ..stages.hashagg import tree_count_sum_by_key
    from .pixel_fused import per_image

    def fold(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sat_id": batch.column("sat_id"),
                "n_runs": batch.column("n_runs"),
            }
        )

    partials = per_image(sf_dir).map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(partials, "sat_id", sum_cols=("n_runs",), count_name="n_images")
    sat = agg.column("sat_id").to_numpy(zero_copy_only=False)
    r = agg.column("n_runs").to_numpy(zero_copy_only=False)
    n = agg.column("n_images").to_numpy(zero_copy_only=False)
    order = np.argsort(sat)
    sat, r, n = sat[order], r[order], n[order]
    return pa.table(
        {
            "sat_id": pa.array(sat),
            "n_runs": pa.array(r),
            "n_images": pa.array(n),
            "runs_per_image_milli": pa.array(r * np.int64(1000) // n),
        }
    )


ALL_QUERIES["sat_bright_runs"] = q_sat_bright_runs


def q_sat_cloud_quartiles_cont(sf_dir: str):
    """PERCENTILE_CONT-style interpolated quartiles of cloud cover per
    satellite, EXACT: cloud takes 1001 discrete milli levels, so the
    same bounded (sat x 1001) histogram exchange as sat_cloud_quantiles
    is a sufficient statistic, and the continuous interpolation
    position (N-1)*j/4 has a quarter-unit remainder — the result is
    emitted as q4x4_milli = x_k_milli*(4-r) + x_{k+1}_milli*r (four
    times the interpolated milli value), an integer both sides compute
    exactly.  The quantile type the reference's pandas `.quantile()`
    screens use (linear interpolation), distributed."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        cint = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        return pa.table({"code": pa.array(sat * np.int64(1001) + cint)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    hist = collect_table(count_sum_by_key(enc, "code", count_name="n"))
    code = hist.column("code").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code, n = code[order], n[order]
    sat = code // 1001
    cint = code % 1001
    uniq_sat, start = np.unique(sat, return_index=True)
    bounds = np.append(start, len(sat))
    out_sat, out_j, out_n, out_q = [], [], [], []
    for gi in range(len(uniq_sat)):
        lo, hi = int(bounds[gi]), int(bounds[gi + 1])
        cum = np.cumsum(n[lo:hi])
        N = int(cum[-1])
        for j in (1, 2, 3):
            posq = (N - 1) * j
            k, r = posq // 4, posq % 4
            xa = int(cint[lo + int(np.searchsorted(cum, k + 1))])
            q4 = xa * (4 - r)
            if r > 0:
                xb = int(cint[lo + int(np.searchsorted(cum, k + 2))])
                q4 += xb * r
            out_sat.append(int(uniq_sat[gi]))
            out_j.append(j)
            out_n.append(N)
            out_q.append(q4)
    return pa.table(
        {
            "sat_id": pa.array(np.asarray(out_sat, dtype=np.int64)),
            "quartile": pa.array(np.asarray(out_j, dtype=np.int64)),
            "n_images": pa.array(np.asarray(out_n, dtype=np.int64)),
            "q4x4_milli": pa.array(np.asarray(out_q, dtype=np.int64)),
        }
    )


ALL_QUERIES["sat_cloud_quartiles_cont"] = q_sat_cloud_quartiles_cont


def q_sat_day_clear_cloudy_outer(sf_dir: str):
    """FULL OUTER join shape over an unbounded derived key: per
    (satellite, acquisition day), the CLEAR image count (cloud < 0.3)
    vs the CLOUDY image count (cloud > 0.7), keeping days where a
    satellite produced only one kind — the mosaic planner's 'usable vs
    wasted days' matrix.  Ray Data has no outer join primitive; the
    idiomatic expression is a tagged union through ONE key-hash
    exchange (count_sum_by_key over both indicator columns), where
    every key survives and absent sides aggregate to zero — the full
    outer falls out of the groupby.  side in
    {'both','clear_only','cloudy_only'}."""
    from ..stages.hashagg import count_sum_by_key
    from ..util import collect_table

    DAYW = np.int64(1 << 20)

    def pack(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False)
        cint = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_CLOUD) % 1001
        day = (corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS) // 24
        clear = cint < 300
        cloudy = cint > 700
        keep = clear | cloudy
        return pa.table(
            {
                "k": pa.array(sat[keep] * DAYW + day[keep]),
                "n_clear": pa.array(clear[keep].astype(np.int64)),
                "n_cloudy": pa.array(cloudy[keep].astype(np.int64)),
            }
        )

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = collect_table(
        count_sum_by_key(enc, "k", sum_cols=("n_clear", "n_cloudy"), count_name="__n")
    )
    k = agg.column("k").to_numpy(zero_copy_only=False)
    nc = agg.column("n_clear").to_numpy(zero_copy_only=False)
    ny = agg.column("n_cloudy").to_numpy(zero_copy_only=False)
    order = np.argsort(k)
    k, nc, ny = k[order], nc[order], ny[order]
    side = np.where(nc == 0, "cloudy_only", np.where(ny == 0, "clear_only", "both"))
    return pa.table(
        {
            "sat_id": pa.array(k // DAYW),
            "day_idx": pa.array(k % DAYW),
            "n_clear": pa.array(nc),
            "n_cloudy": pa.array(ny),
            "side": pa.array(side, type=pa.string()),
        }
    )


ALL_QUERIES["sat_day_clear_cloudy_outer"] = q_sat_day_clear_cloudy_outer


# --- footprint covering + compaction (H3 res 5-9 of the north rule) --------

# A common multiple of every level's cell edge (250..4000 md): offsetting
# lon/lat by it keeps every floor division non-negative, where numpy's
# flooring // and DuckDB's truncating // agree exactly.  Subtracted back
# (as OFF // edge whole cells) at unpack time.
_COVER_OFF = np.int64(4000)
_COVER_LEVELS = (5, 6, 7, 8, 9)


def _cover_cell_bounds(lon: np.ndarray, lat: np.ndarray, hw: np.ndarray, r: int):
    """Inclusive covering-cell index bounds of the [lon±hw]×[lat±hw]
    footprint box at level r (edge = 4000 // 2^(r-5) md), in OFFSET
    coordinates (non-negative; subtract _COVER_OFF // edge to align with
    cell_pyramid_counts' cell indexes)."""
    edge = np.int64(4000 // (2 ** (r - 5)))
    x0 = (lon - hw + _COVER_OFF) // edge
    x1 = (lon + hw + _COVER_OFF) // edge
    y0 = (lat - hw + _COVER_OFF) // edge
    y1 = (lat + hw + _COVER_OFF) // edge
    return x0, x1, y0, y1


def q_footprint_cover_counts(sf_dir: str):
    """Per-cell image counts from the TRUE footprint covering at every
    resolution 5-9 — the north rule's "image footprint encoded to H3
    (res 5-9) covering cells" taken literally (cell_pyramid_counts is
    the centroid form; this one explodes each bbox to ALL cells it
    intersects: ≤3×3 at res 9 since edge 250 md vs box width ≤398 md,
    ≤2×2 at coarser levels).  Reference behavior mirrored: geometry
    indexing before the spatial screens (database/db.py footprint
    columns).  One streaming pass; the ragged explode is pure numpy
    repeat/cumsum arithmetic (no Python per row); only packed
    (res, cx, cy) int64 keys leave the task, reduced by the combiner
    tree — shuffle volume is bounded by occupied cells, never the
    corpus.  At 100 TB this is the cheapest possible formulation: the
    explode fans out ≤25 rows of 8 bytes per image.  Aggregation is the
    HASH-PARTITIONED shape, not the bounded-key combiner tree: ~1M
    distinct cells make per-block partials nearly incompressible, so a
    tree funnels ~6M rows through a driver-adjacent merge chain
    (measured 12.5 s at sf0.1) while 256 hash partitions reduce in
    parallel (3.0 s) and the result streams out without ever being
    driver-resident."""
    from ..stages.hashagg import count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        if ik.size == 0:  # Ray can hand the kernel schema-only empty blocks
            return pa.table({"hkey": pa.array([], type=pa.int64())})
        lon, lat, hw = corpus_mod.geom_md_from_keys(ik)
        out = []
        for r in _COVER_LEVELS:
            x0, x1, y0, y1 = _cover_cell_bounds(lon, lat, hw, r)
            nx = x1 - x0 + 1
            ny = y1 - y0 + 1
            tot = nx * ny
            starts = np.concatenate(([np.int64(0)], np.cumsum(tot)[:-1]))
            idx = np.arange(int(tot.sum()), dtype=np.int64) - np.repeat(starts, tot)
            ny_r = np.repeat(ny, tot)
            cx = np.repeat(x0, tot) + idx // ny_r
            cy = np.repeat(y0, tot) + idx % ny_r
            assert cx.max(initial=0) < 2048 and cy.max(initial=0) < 1024, (
                "cell index overflows the 11/10-bit key fields"
            )
            out.append(((np.int64(r) << np.int64(11) | cx) << np.int64(10)) | cy)
        return pa.table({"hkey": pa.array(np.concatenate(out))})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = count_sum_by_key(packed, "hkey", count_name="n_images", num_partitions=256)

    def unpack(b: pa.Table) -> pa.Table:
        if "hkey" not in b.column_names:  # schema-less empty group block
            return pa.table(
                {
                    "res": pa.array([], type=pa.int64()),
                    "cell_x": pa.array([], type=pa.int64()),
                    "cell_y": pa.array([], type=pa.int64()),
                    "n_images": pa.array([], type=pa.int64()),
                }
            )
        key = b.column("hkey").to_numpy(zero_copy_only=False)
        res = key >> np.int64(21)
        off_c = _COVER_OFF // (np.int64(4000) >> (res - np.int64(5)))
        return pa.table(
            {
                "res": pa.array(res),
                "cell_x": pa.array(((key >> np.int64(10)) & np.int64(2047)) - off_c),
                "cell_y": pa.array((key & np.int64(1023)) - off_c),
                "n_images": b.column("n_images"),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


ALL_QUERIES["footprint_cover_counts"] = q_footprint_cover_counts


def q_footprint_cover_res_hist(sf_dir: str):
    """Covering-fanout audit of the multi-resolution index: per level,
    how many cells an image footprint spans (1..9) and how many images
    span that many — the write-amplification histogram a 10^12-image
    covering index is capacity-planned from.  No explode: the count is
    closed-form from the cell bounds; packed (res, n_cells) key, one
    combiner tree, 45-row output."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon, lat, hw = corpus_mod.geom_md_from_keys(ik)
        keys = []
        for r in _COVER_LEVELS:
            x0, x1, y0, y1 = _cover_cell_bounds(lon, lat, hw, r)
            tot = (x1 - x0 + 1) * (y1 - y0 + 1)
            keys.append(np.int64(r) * np.int64(16) + tot)
        return pa.table({"hkey": pa.array(np.concatenate(keys))})

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="n_images")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "res": pa.array(key // np.int64(16)),
            "n_cells": pa.array(key % np.int64(16)),
            "n_images": agg.column("n_images"),
        }
    )


ALL_QUERIES["footprint_cover_res_hist"] = q_footprint_cover_res_hist


def q_cell_compact_cover(sf_dir: str):
    """H3-style ``compact`` of the occupied centroid-cell set: starting
    from the res-7 occupancy grid (edge 1000 md), any parent whose 4
    children are ALL occupied collapses to the res-6 parent, and any
    res-6 parent whose 4 (now-complete) children are all complete
    collapses again to res 5 — the minimal multi-resolution cell set
    describing the same coverage, the standard trick for shipping AOI
    coverings to every worker cheaply.  Distributed part: the corpus
    collapses to the bounded occupied-cell table (≤340×132 keys) in one
    combiner tree; the promotion closure is O(grid) numpy strided
    reductions on the driver (same bounded-grid pattern, and size
    rationale, as grid_dbscan)."""
    from ..stages.hashagg import tree_count_sum_by_key

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon, lat, _ = corpus_mod.geom_md_from_keys(ik)
        return pa.table(
            {"hkey": pa.array((lon // np.int64(1000)) << np.int64(10) | (lat // np.int64(1000)))}
        )

    packed = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(packed, "hkey", count_name="__n")
    key = agg.column("hkey").to_numpy(zero_copy_only=False)
    NX, NY = spec.LON_SPAN_MD // 1000, spec.LAT_SPAN_MD // 1000  # 340 x 132
    occ = np.zeros((NX, NY), dtype=bool)
    occ[key >> np.int64(10), key & np.int64(1023)] = True
    full6 = occ[0::2, 0::2] & occ[1::2, 0::2] & occ[0::2, 1::2] & occ[1::2, 1::2]
    full5 = full6[0::2, 0::2] & full6[1::2, 0::2] & full6[0::2, 1::2] & full6[1::2, 1::2]
    keep6 = full6 & ~np.repeat(np.repeat(full5, 2, axis=0), 2, axis=1)
    keep7 = occ & ~np.repeat(np.repeat(full6, 2, axis=0), 2, axis=1)
    parts = []
    for res, grid in ((5, full5), (6, keep6), (7, keep7)):
        gx, gy = np.nonzero(grid)
        parts.append(
            (np.full(gx.size, res, dtype=np.int64), gx.astype(np.int64), gy.astype(np.int64))
        )
    return pa.table(
        {
            "res": pa.array(np.concatenate([p[0] for p in parts])),
            "cell_x": pa.array(np.concatenate([p[1] for p in parts])),
            "cell_y": pa.array(np.concatenate([p[2] for p in parts])),
        }
    )


ALL_QUERIES["cell_compact_cover"] = q_cell_compact_cover


def q_lang_mixture_weights(sf_dir: str):
    """Temperature-based multilingual sampling weights (the XLM-R /
    mBERT alpha=0.5 mixture rule): each language's relative sampling
    weight is sqrt(n_max / n_lang), i.e. low-resource languages are
    up-sampled toward (not all the way to) uniform.  Weights are
    RELATIVE to the most frequent language, which keeps every float op
    a single correctly-rounded IEEE primitive (one divide + one sqrt —
    bit-exact vs the SQL mirror, no order-dependent normalizing sum).
    Map-only bounded (lang, count) partials; the weight math runs on
    the language table, never the corpus."""

    def fold(b: pa.Table) -> pa.Table:
        lang = b.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary, dtype=object)
        ul, counts = np.unique(code, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(vocab[ul].astype("U"), type=pa.string()),
                "n_docs": pa.array(counts.astype(np.int64)),
            }
        )

    docs = src.table_dataset(sf_dir, "documents", columns=["lang"])
    pre = docs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    from ..util import collect_table

    tab = collect_table(pre, schema=pa.schema([("lang", pa.string()), ("n_docs", pa.int64())]))
    lg = np.asarray(tab.column("lang"), dtype=object)
    nd = tab.column("n_docs").to_numpy(zero_copy_only=False)
    order = np.argsort(lg, kind="stable")
    lg, nd = lg[order], nd[order]
    start = np.flatnonzero(np.r_[True, lg[1:] != lg[:-1]])
    ndt = np.add.reduceat(nd, start)
    w = np.sqrt(ndt.max().astype(np.float64) / ndt)
    return pa.table(
        {
            "lang": pa.array(lg[start].astype("U"), type=pa.string()),
            "n_docs": pa.array(ndt),
            "weight_rel": pa.array(w),
        }
    )


ALL_QUERIES["lang_mixture_weights"] = q_lang_mixture_weights


def q_sat_month_churn(sf_dir: str):
    """Satellite fleet churn: per calendar month, how many satellites
    were active (>=1 capture), how many were NEW (inactive the previous
    month), and how many CHURNED after it (active this month, silent
    the next; the final observed month reports 0 by convention) — the
    catalog-operations view of constellation continuity.  The corpus
    collapses to distinct (sat, month) codes in one combiner tree
    (bounded by sats x months); presence set arithmetic via np.isin on
    code +/- 1 on the driver."""
    from ..stages.hashagg import tree_count_sum_by_key

    def encode(b: pa.Table) -> pa.Table:
        ik = b.column("image_key").to_numpy(zero_copy_only=False)
        sat = b.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        hrs = corpus_mod._mix(ik % np.int64(spec.MOD), spec.ST_TIME) % spec.TIME_SPAN_HOURS
        ts = (
            np.datetime64(spec.TIME_EPOCH, "us")
            + hrs.astype("timedelta64[h]").astype("timedelta64[us]")
        )
        m = ts.astype("datetime64[M]").astype(np.int64)  # months since 1970
        return pa.table({"code": pa.array(sat * np.int64(100000) + m)})

    enc = src.images_dataset(sf_dir, light=True).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(enc, "code", count_name="__n")
    code = np.sort(agg.column("code").to_numpy(zero_copy_only=False))
    m = code % np.int64(100000)
    mx = m.max()
    is_new = ~np.isin(code - np.int64(1), code)
    churn_next = ~np.isin(code + np.int64(1), code) & (m < mx)
    order = np.argsort(m, kind="stable")  # code order is (sat, m) — regroup by month
    m, is_new, churn_next = m[order], is_new[order], churn_next[order]
    um, start = np.unique(m, return_index=True)
    ends = np.append(start[1:], m.size)
    n_active = (ends - start).astype(np.int64)
    n_new = np.add.reduceat(is_new.astype(np.int64), start)
    n_churn = np.add.reduceat(churn_next.astype(np.int64), start)
    ym = (np.int64(1970) + um // np.int64(12)) * np.int64(100) + (um % np.int64(12) + np.int64(1))
    return pa.table(
        {
            "ym": pa.array(ym),
            "n_active": pa.array(n_active),
            "n_new": pa.array(n_new),
            "n_churned_next": pa.array(n_churn),
        }
    )


ALL_QUERIES["sat_month_churn"] = q_sat_month_churn


def q_events_value_quantiles(sf_dir: str):
    """Exact global percentiles (25/50/75/90/99) of a continuous double
    column via two-pass distributed SELECTION, not a global sort: pass 1
    histograms the order-preserving uint64 image of the doubles into
    65,536 bounded buckets (combiner tree, no row ever shuffled); pass 2
    collects only the target buckets (~1/65k of the corpus each) and
    reads the ranks off a local sort.  Pathologically concentrated
    buckets descend 16 bits at a time and terminate at an exact double —
    ≤4 streaming passes worst case, nothing corpus-sized ever
    driver-resident (see stages/selection.py).  The rank rule mirrors
    SQL PERCENTILE_DISC: smallest value with cume_dist >= q, i.e.
    1-based rank ceil(q*n), computed in exact integer arithmetic."""
    from ..stages import selection

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    ps = (25, 50, 75, 90, 99)
    ranks = [max(1, -(-p * n // 100)) for p in ps]

    def factory():
        return src.table_dataset(sf_dir, "events", columns=["value"])

    vals = selection.quantiles_disc(factory, "value", ranks)
    return pa.table(
        {
            "p": pa.array(list(ps), type=pa.int64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )


ALL_QUERIES["events_value_quantiles"] = q_events_value_quantiles


def q_event_type_value_quantiles(sf_dir: str):
    """Per-group exact percentiles over a continuous double column —
    grouped distributed selection (stages/selection.py): ONE bounded
    (group x 65,536-bucket) histogram pass + ONE multi-slice collect
    pass for all groups together; no global sort, no per-group scans,
    nothing corpus-sized driver-resident.  Rank rule = PERCENTILE_DISC
    (1-based ceil(p*n_g/100), exact integer arithmetic)."""
    from ..stages import selection

    def factory():
        return src.table_dataset(
            sf_dir, "events", columns=["event_type", "value"]
        )

    return selection.grouped_quantiles_disc(factory, "event_type", "value", (25, 50, 75, 90, 99))


ALL_QUERIES["event_type_value_quantiles"] = q_event_type_value_quantiles


def q_tile_month_clear_coverage(sf_dir: str):
    """Spatio-temporal mosaic completeness: per calendar month, how many
    distinct raster tiles saw ANY image and how many saw a CLEAR one
    (cloud_cover < 0.2; mirrored as the exact integer test mix%1001 <
    200), with the clear share in ppm — the 'can we build this month's
    mosaic yet' dashboard.  Footprints explode to covering tiles
    (tiles.explode_tiles), reduce to the bounded (tile, month) table by
    hash partition, then fold to the per-month report with a combiner
    tree; bytes and footprints never shuffle, only packed int64 codes."""
    from ..stages.hashagg import count_sum_by_key, tree_count_sum_by_key

    def pack(b: pa.Table) -> pa.Table:
        ex = tiles.explode_tiles(b, keep_cols=("image_key",))
        ik = ex.column("image_key").to_numpy(zero_copy_only=False)
        if ik.size == 0:
            return pa.table(
                {"code": pa.array([], type=pa.int64()), "clr": pa.array([], type=pa.int64())}
            )
        mk = ik.astype(np.int64) % np.int64(spec.MOD)
        hrs = corpus_mod._mix(mk, spec.ST_TIME) % spec.TIME_SPAN_HOURS
        ts = (
            np.datetime64(spec.TIME_EPOCH, "us")
            + hrs.astype("timedelta64[h]").astype("timedelta64[us]")
        )
        m = ts.astype("datetime64[M]").astype(np.int64)
        clear = (corpus_mod._mix(mk, spec.ST_CLOUD) % np.int64(1001) < 200).astype(np.int64)
        tid = ex.column("tile_id").to_numpy(zero_copy_only=False)
        code = tid * np.int64(100000) + m
        # in-batch combiner: one row per (tile, month) with clear-count
        order = np.argsort(code, kind="stable")
        cs = code[order]
        uniq, start = np.unique(cs, return_index=True)
        return pa.table(
            {
                "code": pa.array(uniq),
                "clr": pa.array(np.add.reduceat(clear[order], start)),
            }
        )

    ds = src.images_dataset(sf_dir, light=True).map_batches(
        pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tm = count_sum_by_key(ds, "code", sum_cols=("clr",), count_name="__n", num_partitions=256)

    def month_fold(b: pa.Table) -> pa.Table:
        if "code" not in b.column_names or b.num_rows == 0:
            return pa.table(
                {
                    "m": pa.array([], type=pa.int64()),
                    "n_tiles": pa.array([], type=pa.int64()),
                    "n_clear_tiles": pa.array([], type=pa.int64()),
                }
            )
        code = b.column("code").to_numpy(zero_copy_only=False)
        clr = b.column("clr").to_numpy(zero_copy_only=False)
        m = code % np.int64(100000)
        order = np.argsort(m, kind="stable")
        ms = m[order]
        uniq, start = np.unique(ms, return_index=True)
        has_clear = (clr[order] > 0).astype(np.int64)
        return pa.table(
            {
                "m": pa.array(uniq),
                "n_tiles": pa.array(np.diff(np.append(start, ms.size)).astype(np.int64)),
                "n_clear_tiles": pa.array(np.add.reduceat(has_clear, start)),
            }
        )

    folded = tm.map_batches(month_fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    agg = tree_count_sum_by_key(folded, "m", sum_cols=("n_tiles", "n_clear_tiles"), count_name="__j")
    m = agg.column("m").to_numpy(zero_copy_only=False)
    nt = agg.column("n_tiles").to_numpy(zero_copy_only=False)
    nc = agg.column("n_clear_tiles").to_numpy(zero_copy_only=False)
    ym = (np.int64(1970) + m // np.int64(12)) * np.int64(100) + (m % np.int64(12) + np.int64(1))
    return pa.table(
        {
            "ym": pa.array(ym),
            "n_tiles": pa.array(nt),
            "n_clear_tiles": pa.array(nc),
            "clear_ppm": pa.array(nc * np.int64(1_000_000) // nt),
        }
    )


ALL_QUERIES["tile_month_clear_coverage"] = q_tile_month_clear_coverage


def q_embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION health stats of the embedding column (the 'is some
    coordinate dead or exploding' pre-training audit): count, sum and
    sum-of-squares per dimension on the exact 2^20 integer lattice
    (float32 * 2^20 is a power-of-two scale — exact in float64 — then
    floor; same convention as embedding_norm_hist).  Each batch folds to
    a 64-row partial (one per dim), merged by the combiner tree: the
    vectors never shuffle and the exchange is O(dim), independent of
    corpus size."""
    from ..stages.hashagg import tree_count_sum_by_key

    emb = src.table_dataset(sf_dir, "embeddings", columns=["embedding"])
    Q = np.float64(1 << 20)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "sumsq_q": pa.array([], pa.int64()),
                }
            )
        M = ann_stage._emb_matrix(b.column("embedding"))
        qm = np.floor(M * Q).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(qm.shape[1], dtype=np.int64)),
                "n_vecs": pa.array(np.full(qm.shape[1], qm.shape[0], dtype=np.int64)),
                "sum_q": pa.array(qm.sum(axis=0)),
                "sumsq_q": pa.array((qm * qm).sum(axis=0)),
            }
        )

    agg = tree_count_sum_by_key(
        emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "dim",
        sum_cols=("n_vecs", "sum_q", "sumsq_q"),
        count_name="__n",
    )
    d = agg.column("dim").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    return pa.table(
        {
            "dim": pa.array(d[order]),
            "n_vecs": pa.array(agg.column("n_vecs").to_numpy(zero_copy_only=False)[order]),
            "sum_q": pa.array(agg.column("sum_q").to_numpy(zero_copy_only=False)[order]),
            "sumsq_q": pa.array(agg.column("sumsq_q").to_numpy(zero_copy_only=False)[order]),
        }
    )


ALL_QUERIES["embedding_dim_stats"] = q_embedding_dim_stats


def q_docs_substring_dups(sf_dir: str):
    """Exact SUBSTRING-level dedup accounting (the fixed-size-chunking
    formulation of exact substring dedup a la "Deduplicating Training
    Data Makes Language Models Better" — chunk-aligned rather than
    suffix-array, which is the content-addressable-storage variant):
    per document, how many of its non-overlapping 64-byte chunks occur
    verbatim in at least one OTHER document, and the bytes a
    chunk-level dedup store would save.  Two exchanges: chunk content
    hashes on the CHUNK (each partition groups by exact bytes and
    computes cross-doc document frequency locally, emitting per-doc
    int64 partials re-split inline by doc hash), then the partials meet
    the doc-dimension stream (doc_id + n_chars only — text is NOT
    re-read) in a doc-hash reduce.  Both exchanges chain on the
    raw-task shuffle (stages/rawshuffle.py run_stage) with no
    intermediate Dataset re-wrap.  The chunk exchange ships corpus
    bytes once — the honest lower bound for EXACT substring dedup;
    everything after is bounded partials.

    Reference parity: the reference has no substring-level dedup (its
    dedup is whole-row first-wins, database/db.py); this extends the
    LLM-pipeline dedup family (exact / MinHash / SimHash / n-gram
    Jaccard / phash / embedding) down to sub-document granularity."""
    from ..stages.rawshuffle import run_stage, split_blocks
    from ..stages.text import CHUNK_LEN, chunk_dup_partials, chunk_emit
    from ..util import collect_block_refs, hash_partition

    # partition count is the scale knob: 64 keeps reduce-task overhead
    # negligible at sandbox scale; raise with cluster size (the chunk
    # exchange is the corpus-sized leg, everything after is partials)
    P = 64
    chunks = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).map_batches(
        lambda b: chunk_emit(b, P),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    ch_splits = split_blocks(collect_block_refs(chunks), "__part", P)

    def partials_k(t: pa.Table | None) -> pa.Table:
        if t is None:
            out = pa.table(
                {"doc_id": pa.array([], pa.int64()), "nd": pa.array([], pa.int64())}
            )
        else:
            out = chunk_dup_partials(t)
        nd = out.column("nd")
        doc = out.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "n_chunks": pa.array(np.zeros(out.num_rows, dtype=np.int64)),
                "n_dup_chunks": nd,
                "__dpart": pa.array(hash_partition(doc, P)),
            }
        )

    mid = run_stage(ch_splits, partials_k, P, split_col="__dpart", n_out=P)

    def tag_dim(b: pa.Table) -> pa.Table:
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False) // CHUNK_LEN
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chunks": pa.array(nc.astype(np.int64)),
                "n_dup_chunks": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                "__dpart": pa.array(hash_partition(doc, P)),
            }
        )

    dims = src.table_dataset(
        sf_dir, "documents", columns=["doc_id", "n_chars"]
    ).map_batches(tag_dim, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    dim_splits = split_blocks(collect_block_refs(dims), "__dpart", P)

    def finish_k(t: pa.Table | None) -> pa.Table:
        if t is None:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chunks": pa.array([], pa.int64()),
                    "n_dup_chunks": pa.array([], pa.int64()),
                    "dup_bytes": pa.array([], pa.int64()),
                }
            )
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        nc = t.column("n_chunks").to_numpy(zero_copy_only=False)
        nd = t.column("n_dup_chunks").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        ds_, start = np.unique(doc[order], return_index=True)
        ncs = np.add.reduceat(nc[order], start)
        nds = np.add.reduceat(nd[order], start)
        return pa.table(
            {
                "doc_id": pa.array(ds_),
                "n_chunks": pa.array(ncs),
                "n_dup_chunks": pa.array(nds),
                "dup_bytes": pa.array(nds * np.int64(CHUNK_LEN)),
            }
        )

    finals = run_stage(mid + dim_splits, finish_k, P)
    return ray.data.from_arrow_refs(finals)


ALL_QUERIES["docs_substring_dups"] = q_docs_substring_dups


# --- cross-source overlap / rare-bigram LM / autocorr / best-IoU -----------


def q_source_overlap(sf_dir: str):
    """Cross-source corpus overlap matrix: for every source pair, the
    EXACT Jaccard similarity of their distinct k-char shingle-hash sets
    next to the MinHash estimate from per-source 64-perm signatures —
    the 'how much does crawl B duplicate crawl A' report that decides
    whether a new source is worth ingesting, with the estimator's error
    visible beside the truth (the dataset-level analog of
    dedup_index_quality).  Scale shape: per-batch distinct (source,
    shingle) rows -> ONE shingle-hash exchange; each partition counts
    per-source distinct shingles, per-pair co-occurrences (sources per
    shingle bounded by the source vocabulary, never corpus-sized) and
    folds the 64 per-source signature mins, so every partial is
    O(sources^2 + sources*perms) and the driver fold is constant-size.
    Doc text never shuffles."""
    from ..util import collect_table, hash_partition

    P = 64

    def emit(batch: pa.Table) -> pa.Table:
        srcs = np.asarray(batch.column("source"), dtype=object)
        txt = batch.column("text")
        h, w_starts, short_idx = text._batch_shingles(txt)
        counts = np.diff(w_starts)
        owner = np.repeat(np.arange(len(srcs), dtype=np.int64), counts)
        hs, owners = [h], [owner]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        for i in short_idx:
            sh = text._shingle_hashes(txt[int(i)].as_py())
            hs.append(sh)
            owners.append(np.full(len(sh), i, dtype=np.int64))
        h_all = np.concatenate(hs)
        o_all = np.concatenate(owners)
        # distinct (source, shingle) within the batch: sources are few,
        # so dedup on (source_code, h) via one lexsort
        codes, inv = np.unique(srcs, return_inverse=True)
        sc = inv[o_all]
        order = np.lexsort((h_all, sc))
        sc, h_all = sc[order], h_all[order]
        first = np.ones(len(sc), dtype=bool)
        first[1:] = (sc[1:] != sc[:-1]) | (h_all[1:] != h_all[:-1])
        sc, h_all = sc[first], h_all[first]
        hi = h_all.view(np.int64)
        return pa.table(
            {
                "source": pa.array(codes[sc], type=pa.string()),
                "h": pa.array(hi),
                "__part": pa.array(hash_partition(hi, P)),
            }
        )

    NPERM = spec.MINHASH_PERMS

    def overlap_partition(group: pa.Table) -> pa.Table:
        s = np.asarray(group.column("source"), dtype=object)
        h = group.column("h").to_numpy(zero_copy_only=False)
        codes, inv = np.unique(s, return_inverse=True)
        ns = len(codes)
        # global distinct (source, h) for this shingle partition
        order = np.lexsort((inv, h))
        sc, hh = inv[order], h[order]
        first = np.ones(len(sc), dtype=bool)
        first[1:] = (sc[1:] != sc[:-1]) | (hh[1:] != hh[:-1])
        sc, hh = sc[first], hh[first]
        # per-source distinct-shingle counts
        n_per = np.bincount(sc, minlength=ns).astype(np.int64)
        # per-pair co-occurrence via the diagonal trick over h-segments
        # (rows are h-major, source-minor sorted; sources per shingle
        # are bounded by the source vocabulary)
        new_seg = np.ones(len(hh), dtype=bool)
        new_seg[1:] = hh[1:] != hh[:-1]
        seg = np.cumsum(new_seg) - 1
        pair_cnt = np.zeros(ns * ns, dtype=np.int64)
        max_c = int(np.bincount(seg).max()) if len(seg) else 0
        for d in range(1, max_c):
            m = seg[d:] == seg[:-d]
            if m.any():
                np.add.at(pair_cnt, sc[:-d][m] * ns + sc[d:][m], 1)
        # per-source signature mins over h32
        h32 = (hh.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        sig = np.full((ns, NPERM), text._MH_P, dtype=np.uint64)
        so = np.argsort(sc, kind="stable")
        sc_s, h32_s = sc[so], h32[so]
        starts = np.flatnonzero(
            np.concatenate([[True], sc_s[1:] != sc_s[:-1]])
        )
        for j in range(NPERM):
            v = (h32_s * text._MH_A[j] + text._MH_B[j]) % text._MH_P
            sig[sc_s[starts], j] = np.minimum.reduceat(v, starts)
        rows_sa, rows_sb, rows_perm, rows_val, rows_kind = [], [], [], [], []
        # kind 0: per-source distinct counts
        rows_sa.append(codes)
        rows_sb.append(np.full(ns, "", dtype=object))
        rows_perm.append(np.full(ns, -1, dtype=np.int64))
        rows_val.append(n_per)
        rows_kind.append(np.zeros(ns, dtype=np.int64))
        # kind 1: pair commons (nonzero only)
        nz = np.flatnonzero(pair_cnt)
        if len(nz):
            rows_sa.append(codes[nz // ns])
            rows_sb.append(codes[nz % ns])
            rows_perm.append(np.full(len(nz), -1, dtype=np.int64))
            rows_val.append(pair_cnt[nz])
            rows_kind.append(np.ones(len(nz), dtype=np.int64))
        # kind 2: signature mins
        rows_sa.append(np.repeat(codes, NPERM))
        rows_sb.append(np.full(ns * NPERM, "", dtype=object))
        rows_perm.append(np.tile(np.arange(NPERM, dtype=np.int64), ns))
        rows_val.append(sig.reshape(-1).view(np.int64).copy())
        rows_kind.append(np.full(ns * NPERM, 2, dtype=np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(rows_kind)),
                "sa": pa.array(np.concatenate(rows_sa), type=pa.string()),
                "sb": pa.array(np.concatenate(rows_sb), type=pa.string()),
                "perm": pa.array(np.concatenate(rows_perm)),
                "val": pa.array(np.concatenate(rows_val)),
            }
        )

    docs = src.table_dataset(
        sf_dir, "documents", columns=["source", "text"]
    )
    parts = _pm(
        docs.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        lambda g: overlap_partition(g.drop_columns(["__part"])),
        n=P,
    )
    tab = collect_table(
        parts,
        schema=pa.schema(
            [("kind", pa.int64()), ("sa", pa.string()), ("sb", pa.string()),
             ("perm", pa.int64()), ("val", pa.int64())]
        ),
    )
    kind = tab.column("kind").to_numpy(zero_copy_only=False)
    sa = np.asarray(tab.column("sa"), dtype=object)
    sb = np.asarray(tab.column("sb"), dtype=object)
    perm = tab.column("perm").to_numpy(zero_copy_only=False)
    val = tab.column("val").to_numpy(zero_copy_only=False)
    sources = np.unique(sa[kind == 0])
    ns = len(sources)
    sidx = {s: i for i, s in enumerate(sources)}
    n_per = np.zeros(ns, dtype=np.int64)
    m0 = kind == 0
    np.add.at(n_per, [sidx[s] for s in sa[m0]], val[m0])
    commons = np.zeros((ns, ns), dtype=np.int64)
    m1 = kind == 1
    np.add.at(
        commons,
        ([sidx[s] for s in sa[m1]], [sidx[s] for s in sb[m1]]),
        val[m1],
    )
    sig = np.full((ns, spec.MINHASH_PERMS), text._MH_P, dtype=np.uint64)
    m2 = kind == 2
    ai = np.asarray([sidx[s] for s in sa[m2]], dtype=np.int64)
    np.minimum.at(sig, (ai, perm[m2]), val[m2].view(np.uint64))
    ia, ib = np.triu_indices(ns, k=1)
    common = commons[ia, ib]
    na, nb = n_per[ia], n_per[ib]
    union = na + nb - common
    eqc = (sig[ia] == sig[ib]).sum(axis=1).astype(np.int64)
    return pa.table(
        {
            "source_a": pa.array(sources[ia], type=pa.string()),
            "source_b": pa.array(sources[ib], type=pa.string()),
            "n_a": pa.array(na),
            "n_b": pa.array(nb),
            "n_common": pa.array(common),
            "jaccard_ppm": pa.array(common * np.int64(1_000_000) // union),
            "est_ppm": pa.array(eqc * np.int64(1_000_000) // np.int64(spec.MINHASH_PERMS)),
        }
    )


ALL_QUERIES["source_overlap"] = q_source_overlap


def q_docs_rare_bigrams(sf_dir: str):
    """Rare-bigram novelty scoring (the cheap LM-perplexity proxy, the
    CCNet-style fluency screen): a doc's rare_ppm is the fraction of
    its bigram OCCURRENCES whose GLOBAL corpus count is <=
    RARE_BIGRAM_MAX — garbled or truly novel text scores high, boilerplate
    scores ~0.  Scale shape: per-batch (doc, bigram) combined count rows
    -> hash(a) exchange computes global bigram totals AND folds per-doc
    (n_bigrams, n_rare) partials in the same pass -> one doc-hash
    exchange sums the partials; the bigram vocabulary never touches the
    driver and doc text never shuffles (the docs_tfidf exchange shape)."""
    from ..stages.rawshuffle import run_stage, split_blocks
    from ..util import collect_block_refs, hash_partition

    P = 64
    RARE = np.int64(spec.RARE_BIGRAM_MAX)

    def bigram_batch(batch: pa.Table) -> pa.Table:
        parent, flat, _ = text._token_lists(batch.column("text"))
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        toks = flat.filter(pa.array(ne))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        pf = parent[ne]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        adj = pf[:-1] == pf[1:] if len(pf) else np.zeros(0, dtype=bool)
        ca, cb = codes[:-1][adj], codes[1:][adj]
        dd = pf[:-1][adj]
        # combine per (doc, a, b)
        nv = np.int64(len(vocab))
        key = (dd * nv + ca) * nv + cb
        uniq, cnts = np.unique(key, return_counts=True)
        ud = uniq // (nv * nv)
        ua = (uniq // nv) % nv
        ub = uniq % nv
        a_t = pc.take(vocab, pa.array(ua))
        b_t = pc.take(vocab, pa.array(ub))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[ud]),
                "a": pa.array(np.asarray(a_t, dtype=object), type=pa.string()),
                "b": pa.array(np.asarray(b_t, dtype=object), type=pa.string()),
                "cnt": pa.array(cnts.astype(np.int64)),
                "__part": pa.array(text._pmi_hash_part(a_t) % np.int64(P)),
            }
        )

    def total_and_fold(group: pa.Table | None) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "n_bi": pa.array([], pa.int64()),
             "n_rare": pa.array([], pa.int64()), "__p2": pa.array([], pa.int64())}
        )
        if group is None or group.num_rows == 0:
            return empty
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        a = np.asarray(group.column("a"), dtype=object)
        b = np.asarray(group.column("b"), dtype=object)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        # global (a, b) totals within this hash(a) partition
        order = np.lexsort((b, a))
        a_s, b_s, c_s, d_s = a[order], b[order], cnt[order], doc[order]
        new = np.ones(len(a_s), dtype=bool)
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        totals = np.add.reduceat(c_s, starts)
        rare_occ = np.where((totals <= RARE)[seg], c_s, np.int64(0))
        # per-doc partials
        do = np.argsort(d_s, kind="stable")
        dd, cc, rr = d_s[do], c_s[do], rare_occ[do]
        dstart = np.flatnonzero(np.concatenate([[True], dd[1:] != dd[:-1]]))
        ud = dd[dstart]
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_bi": pa.array(np.add.reduceat(cc, dstart)),
                "n_rare": pa.array(np.add.reduceat(rr, dstart)),
                "__p2": pa.array(hash_partition(ud, P)),
            }
        )

    def doc_final(group: pa.Table | None) -> pa.Table:
        if group is None or group.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_bigrams": pa.array([], pa.int64()),
                 "n_rare": pa.array([], pa.int64()), "rare_ppm": pa.array([], pa.int64())}
            )
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        nb = group.column("n_bi").to_numpy(zero_copy_only=False)
        nr = group.column("n_rare").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        dd, nbs, nrs = doc[order], nb[order], nr[order]
        starts = np.flatnonzero(np.concatenate([[True], dd[1:] != dd[:-1]]))
        ud = dd[starts]
        tb = np.add.reduceat(nbs, starts)
        tr = np.add.reduceat(nrs, starts)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_bigrams": pa.array(tb),
                "n_rare": pa.array(tr),
                "rare_ppm": pa.array(tr * np.int64(1_000_000) // tb),
            }
        )

    docs = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    pre = docs.map_batches(
        bigram_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    blocks = collect_block_refs(pre)
    if not blocks:
        return doc_final(None)
    s1 = split_blocks(blocks, "__part", P)
    mid = run_stage(s1, total_and_fold, P, split_col="__p2", n_out=P)
    finals = run_stage(mid, doc_final, P)
    return ray.data.from_arrow_refs(finals)


ALL_QUERIES["docs_rare_bigrams"] = q_docs_rare_bigrams


def q_cell_day_autocorr(sf_dir: str):
    """Capture-cadence periodicity: raw temporal autocorrelation of the
    per-(4-deg cell, day) image-count series at day lags 0..AUTOCORR_MAX_LAG,
    normalized against lag 0 in ppm — the revisit-periodicity detector
    (a planner reads peaks as 'this constellation re-images every k
    days').  Scale shape: per-batch (cell, day) count partials -> ONE
    cell-hash exchange (all days of a cell co-locate) -> per-partition
    lag products via searchsorted on the (cell, day) composite -> an
    (AUTOCORR_MAX_LAG+1)-row tree fold.  All-integer arithmetic."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    CELL = np.int64(spec.AUTOCORR_CELL_MD)
    L = spec.AUTOCORR_MAX_LAG
    DSTRIDE = np.int64(4096)  # > TIME_SPAN_HOURS // 24 + max lag

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        x, y, _hw = corpus_mod.geom_md_from_keys(ik)
        day = (
            corpus_mod._mix(ik.astype(np.int64) % np.int64(spec.MOD), spec.ST_TIME)
            % np.int64(spec.TIME_SPAN_HOURS)
        ) // np.int64(24)
        cell = (x // CELL) * np.int64(1024) + y // CELL
        k = cell * DSTRIDE + day
        uniq, cnts = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq),
                "c": pa.array(cnts.astype(np.int64)),
                "__part": pa.array(hash_partition(uniq // DSTRIDE, 64)),
            }
        )

    def lag_partition(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, cs = k[order], c[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        ku = ks[starts]
        cu = np.add.reduceat(cs, starts)
        lags, sums = [], []
        for lag in range(L + 1):
            idx = np.searchsorted(ku, ku + np.int64(lag))
            valid = idx < len(ku)
            valid[valid] = ku[idx[valid]] == ku[valid] + np.int64(lag)
            s = int((cu[valid] * cu[idx[valid]]).sum())
            if s:
                lags.append(lag)
                sums.append(s)
        return pa.table(
            {
                "lag": pa.array(np.asarray(lags, dtype=np.int64)),
                "sum_prod": pa.array(np.asarray(sums, dtype=np.int64)),
            }
        )

    parts = _pm(
        src.images_dataset(sf_dir, light=True).map_batches(
            emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        lambda g: lag_partition(g.drop_columns(["__part"])),
        n=64,
    )
    agg = tree_count_sum_by_key(parts, "lag", sum_cols=("sum_prod",), count_name="__n")
    lag = agg.column("lag").to_numpy(zero_copy_only=False)
    sp = agg.column("sum_prod").to_numpy(zero_copy_only=False)
    order = np.argsort(lag)
    lag, sp = lag[order], sp[order]
    s0 = sp[lag == 0][0]
    return pa.table(
        {
            "lag": pa.array(lag),
            "sum_prod": pa.array(sp),
            "r_ppm": pa.array(sp * np.int64(1_000_000) // s0),
        }
    )


ALL_QUERIES["cell_day_autocorr"] = q_cell_day_autocorr


def q_image_best_iou(sf_dir: str):
    """Best-IoU partner assignment (the detection-style match step):
    per image, the overlapping image with the highest exact
    integer-md^2 IoU, ties to the lowest partner key — which capture
    does this one duplicate MOST.  Same one-emission-per-pair grid
    self-join as image_iou_hist; each pair then contributes an argmax
    candidate to BOTH endpoints, combined partition-locally and
    finished by one image-hash exchange (candidates for one image can
    arise in different grid cells)."""
    from ..util import hash_partition

    R = np.int64(spec.DENSITY_RADIUS_MD)
    STRIDE = np.int64(1024)
    P = 64

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        x, y, hw = corpus_mod.geom_md_from_keys(ik)
        cx, cy = x // R, y // R
        parts = {k: [] for k in ("cell", "key", "x", "y", "hw", "kind")}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts["cell"].append((cx + dx) * STRIDE + (cy + dy))
                parts["key"].append(ik)
                parts["x"].append(x)
                parts["y"].append(y)
                parts["hw"].append(hw)
                parts["kind"].append(
                    np.zeros(len(ik), np.int8) if dx == 0 and dy == 0
                    else np.full(len(ik), 1, np.int8)
                )
        c = np.concatenate(parts["cell"])
        return pa.table(
            {
                "cell": pa.array(c),
                "key": pa.array(np.concatenate(parts["key"])),
                "x": pa.array(np.concatenate(parts["x"])),
                "y": pa.array(np.concatenate(parts["y"])),
                "hw": pa.array(np.concatenate(parts["hw"])),
                "kind": pa.array(np.concatenate(parts["kind"])),
                "__part": pa.array(hash_partition(c, P)),
            }
        )

    def _arg_best(img: np.ndarray, partner: np.ndarray, iou: np.ndarray):
        order = np.lexsort((partner, -iou, img))
        im = img[order]
        first = np.ones(len(im), dtype=bool)
        first[1:] = im[1:] != im[:-1]
        sel = order[first]
        return img[sel], partner[sel], iou[sel]

    _EMPTY = pa.table(
        {"img": pa.array([], pa.int64()), "partner": pa.array([], pa.int64()),
         "iou_ppm": pa.array([], pa.int64()), "__p2": pa.array([], pa.int64())}
    )

    def pairs_partition(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY
        cell = group.column("cell").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        hw = group.column("hw").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, key, cell))
        cell, key, x, y, hw, kind = (a[order] for a in (cell, key, x, y, hw, kind))
        first = np.ones(len(cell), dtype=bool)
        first[1:] = (
            (cell[1:] != cell[:-1]) | (key[1:] != key[:-1]) | (kind[1:] != kind[:-1])
        )
        cell, key, x, y, hw, kind = (a[first] for a in (cell, key, x, y, hw, kind))
        is_pt = kind == 0
        pcell, pkey, px, py, phw = cell[is_pt], key[is_pt], x[is_pt], y[is_pt], hw[is_pt]
        if len(pcell) == 0:
            return _EMPTY
        pstart = np.searchsorted(pcell, cell, side="left")
        pend = np.searchsorted(pcell, cell, side="right")
        cnt = pend - pstart
        tot = int(cnt.sum())
        if tot == 0:
            return _EMPTY
        qi = np.repeat(np.arange(len(cell), dtype=np.int64), cnt)
        within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pi = np.repeat(pstart, cnt) + within
        iw = np.minimum(x[qi] + hw[qi], px[pi] + phw[pi]) - np.maximum(
            x[qi] - hw[qi], px[pi] - phw[pi]
        )
        ih = np.minimum(y[qi] + hw[qi], py[pi] + phw[pi]) - np.maximum(
            y[qi] - hw[qi], py[pi] - phw[pi]
        )
        ok = (key[qi] > pkey[pi]) & (iw > 0) & (ih > 0)
        if not ok.any():
            return _EMPTY
        inter = iw[ok] * ih[ok]
        aq = (2 * hw[qi][ok]) * (2 * hw[qi][ok])
        ap = (2 * phw[pi][ok]) * (2 * phw[pi][ok])
        iou_ppm = inter * np.int64(1_000_000) // (aq + ap - inter)
        ka, kb = key[qi][ok], pkey[pi][ok]
        img = np.concatenate([ka, kb])
        partner = np.concatenate([kb, ka])
        iou2 = np.concatenate([iou_ppm, iou_ppm])
        img, partner, iou2 = _arg_best(img, partner, iou2)
        return pa.table(
            {
                "img": pa.array(img),
                "partner": pa.array(partner),
                "iou_ppm": pa.array(iou2),
                "__p2": pa.array(hash_partition(img, P)),
            }
        )

    def final_partition(group: pa.Table) -> pa.Table:
        img = group.column("img").to_numpy(zero_copy_only=False)
        partner = group.column("partner").to_numpy(zero_copy_only=False)
        iou = group.column("iou_ppm").to_numpy(zero_copy_only=False)
        img, partner, iou = _arg_best(img, partner, iou)
        return pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(pa.array(img), pa.string()), ""
                ),
                "best_image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(pa.array(partner), pa.string()), ""
                ),
                "iou_ppm": pa.array(iou),
            }
        )

    cand = _pm(
        src.images_dataset(sf_dir, light=True).map_batches(
            emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        lambda g: pairs_partition(g.drop_columns(["__part"])),
        n=P,
    )
    return _pm(cand, lambda g: final_partition(g.drop_columns(["__p2"])), n=P, col="__p2")


ALL_QUERIES["image_best_iou"] = q_image_best_iou


def _pq_codebooks(sf_dir: str) -> np.ndarray:
    """(PQ_M, PQ_K, SUBD) int64 lattice codebooks: init = the PQ_K
    lowest vec_ids' subvectors, then PQ_ITERS Lloyd refinements — each
    refinement ONE streaming O(K x D)-partial pass over the corpus with
    a floor-mean driver update (the _kmeans_lattice_centroids shape,
    per subspace)."""
    from ..stages.ann import _kmeans_quant
    from ..state.broadcast import cached
    from ..util import collect_table

    M, K = spec.PQ_M, spec.PQ_K
    init = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", K)],
    ).sort_by("vec_id")
    q0 = _kmeans_quant(init.column("embedding"))
    d = q0.shape[1]
    subd = d // M
    cbs = q0.reshape(K, M, subd).transpose(1, 0, 2).copy()  # (M, K, SUBD)
    ds = src.table_dataset(sf_dir, "embeddings", columns=["embedding"])
    schema = pa.schema(
        [("m", pa.int64()), ("code", pa.int64()), ("cnt", pa.int64()),
         ("sums", pa.list_(pa.int64(), subd))]
    )

    def partial(batch: pa.Table, ref) -> pa.Table:
        cb = cached(ref, lambda x: x)
        qm = _kmeans_quant(batch.column("embedding")).reshape(-1, M, subd)
        ms, codes_r, cnts, sums_r = [], [], [], []
        for m in range(M):
            sub = qm[:, m, :]
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                + (cb[m] * cb[m]).sum(axis=1)[None, :]
                - 2 * (sub @ cb[m].T)
            )
            code = np.argmin(d2, axis=1)  # ties -> lowest code
            cnt = np.bincount(code, minlength=K).astype(np.int64)
            s = np.zeros((K, subd), dtype=np.int64)
            np.add.at(s, code, sub)
            ms.append(np.full(K, m, dtype=np.int64))
            codes_r.append(np.arange(K, dtype=np.int64))
            cnts.append(cnt)
            sums_r.append(s)
        return pa.table(
            {
                "m": pa.array(np.concatenate(ms)),
                "code": pa.array(np.concatenate(codes_r)),
                "cnt": pa.array(np.concatenate(cnts)),
                "sums": pa.array(list(np.concatenate(sums_r)), type=pa.list_(pa.int64(), subd)),
            }
        )

    for _ in range(spec.PQ_ITERS):
        ref = ray.put(cbs)
        tab = collect_table(
            ds.map_batches(
                lambda b, r=ref: partial(b, r),
                batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
            ),
            schema=schema,
        )
        mm = tab.column("m").to_numpy(zero_copy_only=False)
        cc = tab.column("code").to_numpy(zero_copy_only=False)
        cnt = tab.column("cnt").to_numpy(zero_copy_only=False)
        srows = pc.list_flatten(tab.column("sums").combine_chunks()).to_numpy(
            zero_copy_only=False
        ).reshape(len(tab), subd)
        sums = np.zeros((M, K, subd), dtype=np.int64)
        np.add.at(sums, (mm, cc), srows)
        counts = np.zeros((M, K), dtype=np.int64)
        np.add.at(counts, (mm, cc), cnt)
        nz = counts > 0
        new = cbs.copy()
        new[nz] = np.floor(
            sums[nz].astype(np.float64) / counts[nz][:, None]
        ).astype(np.int64)
        cbs = new
    return cbs


def q_ann_pq_adc_topk(sf_dir: str):
    """Product-quantization ANN (the memory-bound scale path the
    IVF/LSH family lacks): PQ_M x PQ_K lattice codebooks compress every
    vector to PQ_M byte codes; queries score candidates through the
    asymmetric-distance (ADC) lookup table — one gather-sum per vector
    instead of a D-dim dot product, the layout that keeps a trillion
    codes in RAM where raw vectors never fit.  All arithmetic on the
    KMEANS_QUANT int64 lattice, so codebook training, encoding, the ADC
    tables and the top-k are bit-exactly oracle-checked — the
    APPROXIMATION is audited, not just bounded (the ann_ivf_lattice
    pattern).  Queries+tables broadcast once (ray.put); encode+score is
    one streaming map with per-batch partial top-k."""
    from ..stages.ann import _kmeans_quant
    from ..state.broadcast import cached

    M, K = spec.PQ_M, spec.PQ_K
    cbs = _pq_codebooks(sf_dir)
    subd = cbs.shape[2]
    qtab = _ann_queries_table(sf_dir)
    qid = qtab.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qm = _kmeans_quant(qtab.column("qe")).reshape(len(qid), M, subd)
    # ADC tables: dt[q, m, code] = ||query_sub - codebook[m, code]||^2
    dt = (
        (qm * qm).sum(axis=2)[:, :, None]
        + (cbs * cbs).sum(axis=2)[None, :, :]
        - 2 * np.einsum("qmd,mkd->qmk", qm, cbs)
    )
    ref = ray.put((qid, dt, cbs))
    _empty = pa.schema(
        [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("adc_d2", pa.int64())]
    ).empty_table()

    def scan(batch: pa.Table) -> pa.Table:
        qid_b, dt_b, cb_b = cached(ref, lambda x: x)
        if batch.num_rows == 0:
            return _empty
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        em = _kmeans_quant(batch.column("embedding")).reshape(len(vid), M, subd)
        codes = np.empty((len(vid), M), dtype=np.int64)
        for m in range(M):
            sub = em[:, m, :]
            d2 = (
                (sub * sub).sum(axis=1)[:, None]
                + (cb_b[m] * cb_b[m]).sum(axis=1)[None, :]
                - 2 * (sub @ cb_b[m].T)
            )
            codes[:, m] = np.argmin(d2, axis=1)
        # adc[q, v] = sum_m dt[q, m, codes[v, m]] — per-query gather over
        # the (M, K) table keeps peak memory at n x M regardless of nq
        marange = np.arange(M)[None, :]
        out_q, out_v, out_s = [], [], []
        for i in range(len(qid_b)):
            adc_i = dt_b[i][marange, codes].sum(axis=1)
            o = np.lexsort((vid, adc_i))[: spec.ANN_TOPK]
            out_q.append(np.full(len(o), qid_b[i]))
            out_v.append(vid[o])
            out_s.append(adc_i[o])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_v)),
                "adc_d2": pa.array(np.concatenate(out_s)),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        vid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        d2 = group.column("adc_d2").to_numpy(zero_copy_only=False)
        o = np.lexsort((vid, d2))[: spec.ANN_TOPK]
        return pa.table(
            {
                "query_id": group.column("query_id").take(pa.array(o)),
                "neighbor_id": pa.array(vid[o]),
                "adc_d2": pa.array(d2[o]),
                "rank": pa.array(np.arange(1, len(o) + 1, dtype=np.int64)),
            }
        )

    emb = src.table_dataset(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cand = emb.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    return cand.groupby("query_id").map_groups(merge_topk, batch_format="pyarrow")


ALL_QUERIES["ann_pq_adc_topk"] = q_ann_pq_adc_topk


def _segments_table(sf_dir: str) -> dict:
    """Deterministic polyline ('river') layer: per nation, SEG_NSEG
    chained segments whose steps all share squared length SEG_LEN2 (the
    common denominator that keeps point-to-segment distance compares
    exact — see spec).  Returns flat endpoint arrays sorted by seg_id;
    layer size = 25 x SEG_NSEG, a broadcast-side table like countries
    (reference rivers reader, geojson_client.py)."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nk = np.sort(nk)
    x0 = corpus_mod._mix(nk, spec.ST_SEG_X) % np.int64(spec.LON_SPAN_MD)
    y0 = corpus_mod._mix(nk, spec.ST_SEG_Y) % np.int64(spec.LAT_SPAN_MD)
    steps = np.asarray(spec.SEG_STEPS, dtype=np.int64)
    NS = spec.SEG_NSEG
    # vertex k = start + cumsum of steps 1..k; step k's index hashes
    # (nkey * 16 + k)
    ks = np.arange(1, NS + 1, dtype=np.int64)
    sidx = corpus_mod._mix(
        (nk[:, None] * np.int64(16) + ks[None, :]).reshape(-1), spec.ST_SEG_D
    ).reshape(len(nk), NS) % np.int64(len(steps))
    dx = steps[sidx, 0]
    dy = steps[sidx, 1]
    vx = np.concatenate([x0[:, None], x0[:, None] + np.cumsum(dx, axis=1)], axis=1)
    vy = np.concatenate([y0[:, None], y0[:, None] + np.cumsum(dy, axis=1)], axis=1)
    seg_id = (nk[:, None] * np.int64(16) + np.arange(NS, dtype=np.int64)[None, :]).reshape(-1)
    return {
        "seg_id": seg_id,
        "ax": vx[:, :-1].reshape(-1),
        "ay": vy[:, :-1].reshape(-1),
        "bx": vx[:, 1:].reshape(-1),
        "by": vy[:, 1:].reshape(-1),
    }


def q_image_nearest_segment(sf_dir: str):
    """Point-to-polyline nearest-neighbor join: each image centroid's
    closest river SEGMENT with the exact scaled squared distance
    d2n = d^2 * SEG_LEN2 (clamped projection; interior case
    |v|^2*L2 - dot(v,w)^2 — all int64, ties to lowest seg_id).  The
    line layer is nation-bounded, so it broadcasts once (ray.put) and
    the join is one streaming map with a vectorized n x S distance
    matrix per batch — the reference's rivers proximity screen made
    exact (geojson rivers, S6)."""
    from ..state.broadcast import cached

    segs = _segments_table(sf_dir)
    ref = ray.put(segs)
    L2 = np.int64(spec.SEG_LEN2)

    def nearest(batch: pa.Table) -> pa.Table:
        s = cached(ref, lambda x: x)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        px, py, _hw = corpus_mod.geom_md_from_keys(ik)
        ax, ay, bx, by = s["ax"], s["ay"], s["bx"], s["by"]
        wx, wy = bx - ax, by - ay
        vx = px[:, None] - ax[None, :]
        vy = py[:, None] - ay[None, :]
        u = vx * wx[None, :] + vy * wy[None, :]
        v2 = vx * vx + vy * vy
        ex = px[:, None] - bx[None, :]
        ey = py[:, None] - by[None, :]
        d2n = np.where(
            u <= 0,
            v2 * L2,
            np.where(u >= L2, (ex * ex + ey * ey) * L2, v2 * L2 - u * u),
        )
        best = np.argmin(d2n, axis=1)  # ties -> lowest index = lowest seg_id
        rows = np.arange(len(ik), dtype=np.int64)
        return pa.table(
            {
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(pa.array(ik), pa.string()), ""
                ),
                "seg_id": pa.array(s["seg_id"][best]),
                "d2n": pa.array(d2n[rows, best]),
            }
        )

    return src.images_dataset(sf_dir, light=True).map_batches(
        nearest, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


ALL_QUERIES["image_nearest_segment"] = q_image_nearest_segment


def q_sat_cusum_changepoint(sf_dir: str):
    """Change-point detection (CUSUM) on each satellite's daily capture
    series: the day k maximizing |N*S_k - (k+1)*T| where S_k is the
    cumulative count through day k over the FULL N-day calendar and T
    the satellite total — the classic mean-shift statistic kept exact
    by clearing the 1/N denominators (all int64, ties to the earliest
    day).  One (sat, day)-count partial pass -> one sat-hash exchange;
    each partition expands its satellites' bounded N-day dense series
    locally (N = TIME_SPAN_HOURS/24, calendar-bounded, never
    corpus-sized) — the fleet-health screen for 'this sensor's cadence
    changed here'."""
    from ..util import hash_partition

    N = spec.TIME_SPAN_HOURS // 24

    def emit(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            corpus_mod._mix(ik.astype(np.int64) % np.int64(spec.MOD), spec.ST_TIME)
            % np.int64(spec.TIME_SPAN_HOURS)
        ) // np.int64(24)
        k = sat * np.int64(4096) + day
        uniq, cnts = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq),
                "c": pa.array(cnts.astype(np.int64)),
                "__part": pa.array(hash_partition(uniq // np.int64(4096), 64)),
            }
        )

    def cusum_partition(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, cs = k[order], c[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        ku = ks[starts]
        cu = np.add.reduceat(cs, starts)
        sat = ku // np.int64(4096)
        day = ku % np.int64(4096)
        out_s, out_d, out_v = [], [], []
        for s in np.unique(sat):
            m = sat == s
            dense = np.zeros(N, dtype=np.int64)
            dense[day[m]] = cu[m]
            S = np.cumsum(dense)
            T = S[-1]
            D = np.int64(N) * S - np.arange(1, N + 1, dtype=np.int64) * T
            a = np.abs(D)
            best = int(np.argmax(a))  # ties -> earliest day
            out_s.append(s)
            out_d.append(best)
            out_v.append(a[best])
        return pa.table(
            {
                "sat_id": pa.array(np.asarray(out_s, dtype=np.int64)),
                "cp_day": pa.array(np.asarray(out_d, dtype=np.int64)),
                "abs_dev": pa.array(np.asarray(out_v, dtype=np.int64)),
            }
        )

    return _pm(
        src.images_dataset(sf_dir, light=True).map_batches(
            emit, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        lambda g: cusum_partition(g.drop_columns(["__part"])),
        n=64,
    )


ALL_QUERIES["sat_cusum_changepoint"] = q_sat_cusum_changepoint


def q_segment_image_counts(sf_dir: str):
    """Distance-range join on the line layer: per river segment, the
    number of images whose centroid lies within SEG_RADIUS_MD (exact
    integer compare d2n <= R^2 * SEG_LEN2 — the corridor-monitoring
    count, zero-count segments included).  Same broadcast layer +
    vectorized distance matrix as image_nearest_segment; per-batch
    partial counts -> shuffle-free tree reduce (segment space is
    layer-bounded)."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..state.broadcast import cached

    segs = _segments_table(sf_dir)
    ref = ray.put(segs)
    L2 = np.int64(spec.SEG_LEN2)
    R2L2 = np.int64(spec.SEG_RADIUS_MD) ** 2 * L2

    def partial(batch: pa.Table) -> pa.Table:
        s = cached(ref, lambda x: x)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        px, py, _hw = corpus_mod.geom_md_from_keys(ik)
        ax, ay, bx, by = s["ax"], s["ay"], s["bx"], s["by"]
        wx, wy = bx - ax, by - ay
        vx = px[:, None] - ax[None, :]
        vy = py[:, None] - ay[None, :]
        u = vx * wx[None, :] + vy * wy[None, :]
        v2 = vx * vx + vy * vy
        ex = px[:, None] - bx[None, :]
        ey = py[:, None] - by[None, :]
        d2n = np.where(
            u <= 0,
            v2 * L2,
            np.where(u >= L2, (ex * ex + ey * ey) * L2, v2 * L2 - u * u),
        )
        n = (d2n <= R2L2).sum(axis=0).astype(np.int64)
        return pa.table({"seg_id": pa.array(s["seg_id"]), "n_near": pa.array(n)})

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = tree_count_sum_by_key(pre, "seg_id", sum_cols=("n_near",), count_name="__n")
    sid = agg.column("seg_id").to_numpy(zero_copy_only=False)
    nn = agg.column("n_near").to_numpy(zero_copy_only=False)
    order = np.argsort(sid)
    return pa.table(
        {"seg_id": pa.array(sid[order]), "n_images": pa.array(nn[order])}
    )


ALL_QUERIES["segment_image_counts"] = q_segment_image_counts


def q_image_skyline(sf_dir: str):
    """Pareto-skyline (multi-objective frontier) PER SATELLITE: the
    (cloud_milli, clear) quality points no other image of the SAME
    satellite dominates — minimize cloud, maximize clear; dominated =
    another has cloud <= AND clear >= with one strict.  The curator's
    'which quality trade-offs does each sensor actually achieve'
    screen.  Distributed shape: per-batch partial counts on the
    bounded (sat, cloud, clear) lattice, ONE sat-hash exchange, then a
    fully vectorized per-partition sweep (per-(sat, cloud) max clear +
    a segment-reset running max) — the fleet can grow to millions of
    sensors without a driver-resident lattice."""
    from ..util import hash_partition

    CSTRIDE = np.int64(128)
    SSTRIDE = np.int64(1 << 20)

    def partial(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mk = ik.astype(np.int64) % np.int64(spec.MOD)
        cloud = corpus_mod._mix(mk, spec.ST_CLOUD) % np.int64(1001)
        clear = corpus_mod._mix(mk, spec.ST_CLEAR) % np.int64(101)
        k = sat * SSTRIDE + cloud * CSTRIDE + clear
        uniq, cnts = np.unique(k, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uniq),
                "n": pa.array(cnts.astype(np.int64)),
                "__part": pa.array(hash_partition(uniq // SSTRIDE, 64)),
            }
        )

    def sweep(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        nn = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, ns = k[order], nn[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        ku = ks[starts]
        nu = np.add.reduceat(ns, starts)
        sat = ku // SSTRIDE
        cloud = (ku % SSTRIDE) // CSTRIDE
        clear = ku % CSTRIDE
        # per-(sat, cloud) max clear: rows are (sat, cloud, clear)-sorted
        # ascending, so the last row of each (sat, cloud) run is its max
        last = np.ones(len(ku), dtype=bool)
        last[:-1] = (sat[1:] != sat[:-1]) | (cloud[1:] != cloud[:-1])
        fsat, fcloud, fclear, fn = sat[last], cloud[last], clear[last], nu[last]
        # segment-reset strict running max over ascending cloud per sat
        seg = np.cumsum(np.concatenate([[0], (fsat[1:] != fsat[:-1]).astype(np.int64)]))
        BIG = np.int64(1 << 20)
        cm = np.maximum.accumulate(fclear + seg * BIG)
        prev = np.concatenate([[np.int64(-1)], cm[:-1] - seg[1:] * BIG])
        prev[np.concatenate([[True], seg[1:] != seg[:-1]])] = np.int64(-1)
        keep = fclear > prev
        return pa.table(
            {
                "sat_id": pa.array(fsat[keep]),
                "cloud_milli": pa.array(fcloud[keep]),
                "clear": pa.array(fclear[keep]),
                "n_images": pa.array(fn[keep]),
            }
        )

    pre = src.images_dataset(sf_dir, light=True).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(pre, lambda g: sweep(g.drop_columns(["__part"])), n=64)


ALL_QUERIES["image_skyline"] = q_image_skyline


def q_tile_manifest_incremental(sf_dir: str):
    """Incremental view maintenance (IVM) for the tile manifest: the
    corpus splits deterministically into a BASE (7/8 of keys) whose
    manifest stands in for the stored materialized view, and a DELTA
    (1/8) processed separately — the merge folds the two bounded
    per-tile partial tables with one shuffle-free tree reduce, never
    re-reading base rows.  Equals the full tile_manifest bit-for-bit
    (the oracle recomputes from scratch); at 100 TB this is the shape
    of a nightly delta import: view-sized state, delta-sized work."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    def side(batch: pa.Table, want_delta: bool) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        part = hash_partition(ik.astype(np.int64), 8)
        mask = part == 0 if want_delta else part != 0
        return batch.filter(pa.array(mask))

    base = src.images_dataset(sf_dir, light=True).map_batches(
        lambda b: side(b, False), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    delta = src.images_dataset(sf_dir, light=True).map_batches(
        lambda b: side(b, True), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    merged = tiles.tile_manifest(base).union(tiles.tile_manifest(delta))
    out = tree_count_sum_by_key(
        merged, "tile_id", sum_cols=("n_images", "total_bytes"), count_name="__n"
    )
    return out.select(["tile_id", "n_images", "total_bytes"])


ALL_QUERIES["tile_manifest_incremental"] = q_tile_manifest_incremental


def q_landcover_pair_support(sf_dir: str):
    """Frequent-itemset support over a join result (market-basket on
    geography): for every unordered featureclass pair, how many images
    intersect BOTH classes — the 'which land covers co-occur in frame'
    planner input.  Broadcast spatial join (featureclass rides the
    build side, image ids stay int keys) -> one image-hash exchange
    collapses each image's matches to a 5-bit class mask -> bounded
    combo histogram (<= 32 rows per partition) -> tree fold + driver
    pair expansion.  Pair support is derived from mask counts, so the
    exchange volume after the join is O(32), never corpus-sized."""
    from ..stages.hashagg import tree_count_sum_by_key
    from ..util import hash_partition

    FCS = np.array(sorted(spec.FEATURECLASSES), dtype=object)

    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        src.land_cover_table(sf_dir),
        id_col="lc_id",
        extra_cols=("featureclass",),
        img_cols=("image_key",),
        emit_image_id=False,
    )

    def pack(batch: pa.Table) -> pa.Table:
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        fc = np.asarray(batch.column("featureclass"), dtype=object)
        code = np.searchsorted(FCS, fc).astype(np.int64)
        # per-batch pre-OR per image cuts the exchange to <= one row
        # per (image, batch)
        order = np.argsort(ik, kind="stable")
        iks, cs = ik[order], code[order]
        starts = np.flatnonzero(np.concatenate([[True], iks[1:] != iks[:-1]]))
        ukeys = iks[starts]
        mask = np.bitwise_or.reduceat(np.int64(1) << cs, starts)
        return pa.table(
            {
                "ik": pa.array(ukeys),
                "mask": pa.array(mask),
                "__part": pa.array(hash_partition(ukeys, 64)),
            }
        )

    def combos(group: pa.Table) -> pa.Table:
        ik = group.column("ik").to_numpy(zero_copy_only=False)
        mask = group.column("mask").to_numpy(zero_copy_only=False)
        order = np.argsort(ik, kind="stable")
        iks, ms = ik[order], mask[order]
        starts = np.flatnonzero(np.concatenate([[True], iks[1:] != iks[:-1]]))
        full = np.bitwise_or.reduceat(ms, starts)
        cnt = np.bincount(full, minlength=32).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"combo": pa.array(nz.astype(np.int64)), "n": pa.array(cnt[nz])})

    pre = _pm(
        pairs.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        lambda g: combos(g.drop_columns(["__part"])),
        n=64,
    )
    agg = tree_count_sum_by_key(pre, "combo", sum_cols=("n",), count_name="__n")
    combo = agg.column("combo").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    out_a, out_b, out_n = [], [], []
    for a in range(len(FCS)):
        for b in range(a + 1, len(FCS)):
            sel = (((combo >> a) & 1) == 1) & (((combo >> b) & 1) == 1)
            tot = int(n[sel].sum())
            if tot:
                out_a.append(FCS[a])
                out_b.append(FCS[b])
                out_n.append(tot)
    return pa.table(
        {
            "fc_a": pa.array(out_a, type=pa.string()),
            "fc_b": pa.array(out_b, type=pa.string()),
            "n_images": pa.array(np.asarray(out_n, dtype=np.int64)),
        }
    )


ALL_QUERIES["landcover_pair_support"] = q_landcover_pair_support


_EXT_DIRS = np.array(
    [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)],
    dtype=np.int64,
)


def q_country_extreme_points(sf_dir: str):
    """Directional extreme points per country (the rotating-calipers /
    convex-hull-lite screen): for each of 8 integer directions, the
    image whose centroid maximizes the dot product — together they
    bracket the coverage hull of each country without a hull algorithm.
    Containment join (broadcast layer) -> per-batch argmax combiner
    caps output at countries x 8 rows per batch -> bounded driver
    fold.  Ties to the lowest image key; all-integer dots."""
    from ..util import collect_table

    countries = src.countries_table(sf_dir)
    countries = countries.append_column(
        "lc_id", pa.array(np.arange(countries.num_rows, dtype=np.int64))
    )
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir, light=True),
        countries,
        id_col="lc_id",
        img_cols=("image_key",),
        emit_image_id=False,
    )
    ND = len(_EXT_DIRS)

    def arg_best(cid, dot, key):
        """rows -> per (cid-with-dir) best (max dot, tie min key)."""
        order = np.lexsort((key, -dot, cid))
        cs = cid[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        sel = order[first]
        return cid[sel], dot[sel], key[sel]

    def combine(batch: pa.Table) -> pa.Table:
        cid = batch.column("lc_id").to_numpy(zero_copy_only=False)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        lon, lat, _hw = corpus_mod.geom_md_from_keys(ik)
        cds, dots, keys = [], [], []
        for di in range(ND):
            dx, dy = _EXT_DIRS[di]
            cds.append(cid * np.int64(8) + np.int64(di))
            dots.append(dx * lon + dy * lat)
            keys.append(ik)
        cd, dot, key = arg_best(
            np.concatenate(cds), np.concatenate(dots), np.concatenate(keys)
        )
        return pa.table(
            {"cd": pa.array(cd), "dot": pa.array(dot), "key": pa.array(key)}
        )

    tab = collect_table(
        pairs.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema([("cd", pa.int64()), ("dot", pa.int64()), ("key", pa.int64())]),
    )
    cd, dot, key = arg_best(
        tab.column("cd").to_numpy(zero_copy_only=False),
        tab.column("dot").to_numpy(zero_copy_only=False),
        tab.column("key").to_numpy(zero_copy_only=False),
    )
    isos = countries.column("iso").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "iso": pa.array(isos[cd // 8], type=pa.string()),
            "dir_idx": pa.array(cd % 8),
            "dot": pa.array(dot),
            "image_id": pc.binary_join_element_wise(
                "img-", pc.cast(pa.array(key), pa.string()), ""
            ),
        }
    )


ALL_QUERIES["country_extreme_points"] = q_country_extreme_points


def q_sat_hardest_images(sf_dir: str):
    """Hard-example mining (active-learning sampler): per satellite,
    the 5 images with the highest mean pixel-gradient energy — the
    'most textured frames first' labeling queue.  Composes the REAL
    payload gradient kernel with a grouped top-k: per-batch per-sat
    top-5 combiner caps blocks at 5 rows per (sat, batch), one sat-hash
    exchange finishes; payload bytes never leave the deriving task.
    mean_milli = 1000*e//nd exact; ties to lowest image key.
    Round 5: per-image (e_h, nd_h) come from the FUSED pixel pass."""
    from ..util import hash_partition
    from .pixel_fused import per_image

    K = 5

    def top_batch(batch: pa.Table) -> pa.Table:
        sat = batch.column("sat_id").to_numpy(zero_copy_only=False)
        ik = batch.column("image_key").to_numpy(zero_copy_only=False)
        e = batch.column("e_h").to_numpy(zero_copy_only=False)
        nd = batch.column("nd_h").to_numpy(zero_copy_only=False)
        mm = e * np.int64(1000) // nd
        order = np.lexsort((ik, -mm, sat))
        # drop duplicate (sat, key) rows (identical derived rows from a
        # duplicated corpus key) — mirrors the oracle's DISTINCT
        kk = ik[order]
        ss = sat[order]
        uniq = np.ones(len(ss), dtype=bool)
        uniq[1:] = (ss[1:] != ss[:-1]) | (kk[1:] != kk[:-1])
        order = order[uniq]
        ss = sat[order]
        # rank within satellite, keep < K
        new = np.ones(len(ss), dtype=bool)
        new[1:] = ss[1:] != ss[:-1]
        seg = np.cumsum(new) - 1
        pos = np.arange(len(ss), dtype=np.int64)
        starts = np.flatnonzero(new)
        rank = pos - starts[seg]
        sel = order[rank < K]
        sel = np.sort(sel)
        return pa.table(
            {
                "sat_id": pa.array(sat[sel]),
                "key": pa.array(ik[sel]),
                "mean_milli": pa.array(mm[sel]),
                "__part": pa.array(hash_partition(sat[sel], 32)),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        sat = group.column("sat_id").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        mm = group.column("mean_milli").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -mm, sat))
        kk = key[order]
        ss = sat[order]
        uniq = np.ones(len(ss), dtype=bool)
        uniq[1:] = (ss[1:] != ss[:-1]) | (kk[1:] != kk[:-1])
        order = order[uniq]
        ss = sat[order]
        new = np.ones(len(ss), dtype=bool)
        new[1:] = ss[1:] != ss[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank = np.arange(len(ss), dtype=np.int64) - starts[seg]
        keep = rank < K
        sel = order[keep]
        return pa.table(
            {
                "sat_id": pa.array(sat[sel]),
                "image_id": pc.binary_join_element_wise(
                    "img-", pc.cast(pa.array(key[sel]), pa.string()), ""
                ),
                "mean_milli": pa.array(mm[sel]),
                "rank": pa.array(rank[keep] + 1),
            }
        )

    pre = per_image(sf_dir).map_batches(
        top_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return _pm(pre, lambda g: finish(g.drop_columns(["__part"])), n=32)


ALL_QUERIES["sat_hardest_images"] = q_sat_hardest_images
