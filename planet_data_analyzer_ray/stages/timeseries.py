"""Time bucketing + event sessionization (the streaming-shaped ops).

§2.9 of SURVEY.md: the reference buckets acquisition times into periods
(/root/reference/app/maps.py:56-76) and groups (lat, lon) counts per
bucket.  Tumbling windows only — ``pc.floor_temporal`` inside
``map_batches`` then a hash groupby.

Sessionization (engine extension for the events stream): session =
maximal run of a user's events with gaps <= SESSION_GAP_MIN minutes;
implemented as groupby(user) + vectorized within-group gap scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec


def month_heatmap_batch(batch: pa.Table) -> pa.Table:
    """images batch -> (bucket, grid_lon, grid_lat) rows for A8 counts."""
    bucket = pc.strftime(
        pc.floor_temporal(batch.column("time_acquired"), unit="month"), format="%Y-%m"
    )
    lon = batch.column("centroid_lon").to_numpy(zero_copy_only=False)
    lat = batch.column("centroid_lat").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "bucket": bucket,
            "grid_lon": pa.array(np.floor(lon).astype(np.int64)),
            "grid_lat": pa.array(np.floor(lat).astype(np.int64)),
        }
    )


def hourly_events_batch(batch: pa.Table) -> pa.Table:
    bucket = pc.strftime(
        pc.floor_temporal(batch.column("ts"), unit="hour"), format="%Y-%m-%d %H"
    )
    value = batch.column("value").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "bucket": bucket,
            "event_type": batch.column("event_type"),
            "value_cents": pa.array(np.floor(value * 100).astype(np.int64)),
        }
    )


def add_user_part(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
    """Stable hash partition on user_id (Fibonacci mix) — the shuffle key
    for all per-user event kernels; one partition holds MANY users and
    each kernel call handles them all with segment scans."""
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    part = (
        uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)
    ) % np.uint64(num_partitions)
    return batch.append_column("__part", pa.array(part.astype(np.int64)))


def sessionize_partition(group: pa.Table) -> pa.Table:
    """All users of one hash partition -> per-session aggregates in ONE
    vectorized pass: lexsort (user, ts, event_id), session starts where
    the user changes or the gap exceeds the threshold, per-session
    bounds from the boundary indices.  Replaces the one-Python-call-per-
    user ``map_groups`` shape (round-1 VERDICT anti-pattern #5)."""
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    n = len(uid)
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "session_seq": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=pa.timestamp("us")),
                "session_end": pa.array([], type=pa.timestamp("us")),
            }
        )
    order = np.lexsort((eid, ts, uid))
    u, t = uid[order], ts[order]
    tsi = t.astype(np.int64)
    gap_us = np.int64(spec.SESSION_GAP_MIN) * 60 * 1_000_000
    is_start = np.ones(n, dtype=bool)
    is_start[1:] = (u[1:] != u[:-1]) | ((tsi[1:] - tsi[:-1]) > gap_us)
    bounds = np.append(np.nonzero(is_start)[0], n)
    starts, ends = bounds[:-1], bounds[1:]
    sess_uid = u[starts]
    # per-user running session number: position within the user's runs
    user_first = np.ones(len(starts), dtype=bool)
    user_first[1:] = sess_uid[1:] != sess_uid[:-1]
    idx = np.arange(len(starts), dtype=np.int64)
    first_idx = np.nonzero(user_first)[0]
    runs = np.diff(np.append(first_idx, len(starts)))
    seq = idx - np.repeat(idx[first_idx], runs) + 1
    return pa.table(
        {
            "user_id": pa.array(sess_uid.astype(np.int64)),
            "session_seq": pa.array(seq),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "session_start": pa.array(t[starts], type=pa.timestamp("us")),
            "session_end": pa.array(t[ends - 1], type=pa.timestamp("us")),
        }
    )


def asof_partition(group: pa.Table) -> pa.Table:
    """All users of one partition: backward as-of join purchase->view in
    one searchsorted over a dense (user_rank, ts) composite key.  Ties
    (equal ts) resolve to the LAST view in (ts, event_id) order — the
    oracle's ORDER BY v.ts DESC, v.view_id DESC rn=1 rule."""
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    etype = group.column("event_type").to_numpy(zero_copy_only=False)
    if len(uid) == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "purchase_id": pa.array([], type=pa.int64()),
                "view_id": pa.array([], type=pa.int64()),
                "gap_minutes": pa.array([], type=pa.int64()),
            }
        )
    tsi = ts.astype(np.int64)
    order = np.lexsort((eid, tsi, uid))
    u, t, e, et = uid[order], tsi[order], eid[order], etype[order]
    # dense user rank keeps the composite key in int64 range
    _, rank = np.unique(u, return_inverse=True)
    t0 = t.min()
    key = rank.astype(np.int64) * (np.int64(t.max() - t0) + 2) + (t - t0)
    is_p = et == "purchase"
    is_v = et == "view"
    p_key, p_id, p_t, p_u = key[is_p], e[is_p], t[is_p], u[is_p]
    v_key, v_id, v_t, v_r = key[is_v], e[is_v], t[is_v], rank[is_v]
    p_r = rank[is_p]
    idx = np.searchsorted(v_key, p_key, side="right") - 1
    has = (idx >= 0) & (v_r[np.maximum(idx, 0)] == p_r)
    idxh = idx[has]
    gap_us = p_t[has] - v_t[idxh]
    return pa.table(
        {
            "user_id": pa.array(p_u[has].astype(np.int64)),
            "purchase_id": pa.array(p_id[has]),
            "view_id": pa.array(v_id[idxh]),
            "gap_minutes": pa.array(gap_us // 60_000_000),
        }
    )


_INTERP_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("purchase_id", pa.int64()),
        ("prev_view_id", pa.int64()),
        ("next_view_id", pa.int64()),
        ("value_interp", pa.float64()),
    ]
)


def interpolate_partition(group: pa.Table) -> pa.Table:
    """Sandwich join + linear interpolation, all users of one partition:
    each purchase gets the per-user view track's value linearly
    interpolated at the purchase timestamp — prev = last view with
    ts <= purchase ts (ties: max event_id), next = first view with
    ts > purchase ts (ties: min event_id); purchases missing either
    neighbor drop.  Both lookups are ONE searchsorted each over the
    dense (user_rank, ts) composite key of asof_partition; ts
    strictness makes the denominator always positive.  The float is a
    single mirrored expression (vp + (vn-vp) * (dt_p/dt_n)) so DuckDB
    agrees bit-for-bit."""
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    etype = group.column("event_type").to_numpy(zero_copy_only=False)
    val = group.column("value").to_numpy(zero_copy_only=False)
    if len(uid) == 0:
        return _INTERP_SCHEMA.empty_table()
    tsi = ts.astype(np.int64)
    order = np.lexsort((eid, tsi, uid))
    u, t, e, et, v = uid[order], tsi[order], eid[order], etype[order], val[order]
    _, rank = np.unique(u, return_inverse=True)
    t0 = t.min()
    key = rank.astype(np.int64) * (np.int64(t.max() - t0) + 2) + (t - t0)
    is_p = et == "purchase"
    is_v = et == "view"
    p_key, p_id, p_t, p_u, p_r = key[is_p], e[is_p], t[is_p], u[is_p], rank[is_p]
    v_key, v_id, v_t, v_r, v_v = key[is_v], e[is_v], t[is_v], rank[is_v], v[is_v]
    nv = len(v_key)
    # prev: last view with (rank, ts) <= (rank_p, ts_p) — equal-ts views
    # sort by event_id, so "last" is the max event_id at the max ts
    ip = np.searchsorted(v_key, p_key, side="right") - 1
    has_p = (ip >= 0) & (v_r[np.maximum(ip, 0)] == p_r)
    # next: first view past ALL equal-key views -> strictly later ts
    inx = np.searchsorted(v_key, p_key, side="right")
    has_n = (inx < nv) & (v_r[np.minimum(inx, nv - 1)] == p_r)
    has = has_p & has_n
    iph, inh = ip[has], inx[has]
    dt_p = (p_t[has] - v_t[iph]).astype(np.float64)
    dt_n = (v_t[inh] - v_t[iph]).astype(np.float64)
    vp, vn = v_v[iph], v_v[inh]
    out = vp + (vn - vp) * (dt_p / dt_n)
    return pa.table(
        {
            "user_id": pa.array(p_u[has].astype(np.int64)),
            "purchase_id": pa.array(p_id[has]),
            "prev_view_id": pa.array(v_id[iph]),
            "next_view_id": pa.array(v_id[inh]),
            "value_interp": pa.array(out),
        }
    )


def sessionize_group(group: pa.Table) -> pa.Table:
    """One user's events -> per-session aggregates.  Mirrors the SQL
    lag/gap window construction (ORDER BY ts, event_id)."""
    ts = group.column("ts").to_numpy(zero_copy_only=False)  # datetime64[us]
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts))
    ts_s = ts[order]
    gap_us = np.int64(spec.SESSION_GAP_MIN) * 60 * 1_000_000
    tsi = ts_s.astype("datetime64[us]").astype(np.int64)
    is_start = np.ones(len(tsi), dtype=bool)
    if len(tsi) > 1:
        is_start[1:] = (tsi[1:] - tsi[:-1]) > gap_us
    session_seq = np.cumsum(is_start)
    uid = group.column("user_id")[0].as_py()
    out_user, out_seq, out_n, out_start, out_end = [], [], [], [], []
    starts = np.nonzero(is_start)[0]
    bounds = np.append(starts, len(tsi))
    for i in range(len(starts)):
        s, e = bounds[i], bounds[i + 1]
        out_user.append(uid)
        out_seq.append(int(session_seq[s]))
        out_n.append(int(e - s))
        out_start.append(ts_s[s])
        out_end.append(ts_s[e - 1])
    return pa.table(
        {
            "user_id": pa.array(out_user, type=pa.int64()),
            "session_seq": pa.array(out_seq, type=pa.int64()),
            "n_events": pa.array(out_n, type=pa.int64()),
            "session_start": pa.array(np.asarray(out_start), type=pa.timestamp("us")),
            "session_end": pa.array(np.asarray(out_end), type=pa.timestamp("us")),
        }
    )


def asof_join_group(group: pa.Table) -> pa.Table:
    """As-of join within one user: each 'purchase' event is joined to
    the most recent prior-or-equal 'view' event (event-time as-of,
    backward direction).  Vectorized via searchsorted on the sorted
    view timestamps; deterministic tie-break by event_id ordering."""
    ts = group.column("ts").to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    etype = group.column("event_type").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts))
    ts, eid, etype = ts[order], eid[order], etype[order]
    is_p = etype == "purchase"
    is_v = etype == "view"
    p_ts, p_id = ts[is_p], eid[is_p]
    v_ts, v_id = ts[is_v], eid[is_v]
    uid = group.column("user_id")[0].as_py()
    idx = np.searchsorted(v_ts, p_ts, side="right") - 1
    has = idx >= 0
    gap_us = (
        p_ts[has].astype("datetime64[us]").astype(np.int64)
        - v_ts[idx[has]].astype("datetime64[us]").astype(np.int64)
    )
    return pa.table(
        {
            "user_id": pa.array(np.full(int(has.sum()), uid, dtype=np.int64)),
            "purchase_id": pa.array(p_id[has]),
            "view_id": pa.array(v_id[idx[has]]),
            "gap_minutes": pa.array(gap_us // 60_000_000),
        }
    )


def latest_state_kernel(batch: pa.Table) -> pa.Table:
    """Last-write-wins compaction: keep each (user_id, event_type)'s
    latest row (max ts, ties to max event_id).  The selection is
    associative, so the same kernel serves as the per-batch combiner
    AND the per-partition finalizer — one lexsort + boundary scan,
    all other columns ride along via ``take``."""
    n = batch.num_rows
    if n == 0:
        return batch
    user = batch.column("user_id").to_numpy(zero_copy_only=False)
    et = batch.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    code = et.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    tsi = batch.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, tsi, code, user))
    u_s, c_s = user[order], code[order]
    last = np.ones(n, dtype=bool)
    last[:-1] = (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])
    return batch.take(pa.array(order[last]))


def user_features_partition(group: pa.Table) -> pa.Table:
    """Feature-table build (ML feature engineering over the event
    stream): per user — event count, distinct event types, integer-cents
    value total, first/last timestamps, mean inter-event gap in exact
    integer microseconds (consecutive gaps telescope, so the mean is
    (last-first)//(n-1) independent of arrival order).  One partition
    holds many users; everything is segment scans after one lexsort."""
    n = group.num_rows
    if n == 0:
        return pa.schema(
            [("user_id", pa.int64()), ("n_events", pa.int64()),
             ("n_types", pa.int64()), ("value_cents", pa.int64()),
             ("first_ts", pa.timestamp("us")), ("last_ts", pa.timestamp("us")),
             ("mean_gap_us", pa.int64())]
        ).empty_table()
    user = group.column("user_id").to_numpy(zero_copy_only=False)
    et = group.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    code = et.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ts = group.column("ts").to_numpy(zero_copy_only=False)
    tsi = ts.astype(np.int64)
    cents = np.floor(
        group.column("value").to_numpy(zero_copy_only=False) * 100.0
    ).astype(np.int64)
    order = np.lexsort((code, user))
    u_s, c_s, t_s, v_s = user[order], code[order], tsi[order], cents[order]
    ustart = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
    cnt = np.diff(np.r_[ustart, n]).astype(np.int64)
    new_type = np.r_[True, (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1])]
    n_types = np.add.reduceat(new_type.astype(np.int64), ustart)
    vsum = np.add.reduceat(v_s, ustart)
    tmin = np.minimum.reduceat(t_s, ustart)
    tmax = np.maximum.reduceat(t_s, ustart)
    gap = np.where(cnt > 1, (tmax - tmin) // np.maximum(cnt - 1, 1), 0)
    return pa.table(
        {
            "user_id": pa.array(u_s[ustart]),
            "n_events": pa.array(cnt),
            "n_types": pa.array(n_types),
            "value_cents": pa.array(vsum),
            "first_ts": pa.array(tmin.view("datetime64[us]")),
            "last_ts": pa.array(tmax.view("datetime64[us]")),
            "mean_gap_us": pa.array(gap),
        }
    )


def transitions_partition(group: pa.Table) -> pa.Table:
    """Sequence mining: per-user consecutive event-type transition
    counts (Markov matrix numerators), one lexsort + adjacency scan for
    ALL users of the partition.  Ordering: ts, ties by event_id."""
    n = group.num_rows
    empty = pa.table(
        {
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    if n < 2:
        return empty
    user = group.column("user_id").to_numpy(zero_copy_only=False)
    et = group.column("event_type")
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    enc = et.dictionary_encode()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary, dtype=object)
    tsi = group.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, tsi, user))
    u_s, c_s = user[order], code[order]
    adj = u_s[1:] == u_s[:-1]
    a, b = c_s[:-1][adj], c_s[1:][adj]
    if len(a) == 0:
        return empty
    v = np.int64(len(vocab))
    pair = a * v + b
    uniq, cnt = np.unique(pair, return_counts=True)
    return pa.table(
        {
            "from_type": pa.array(vocab[(uniq // v).astype(np.int64)], type=pa.string()),
            "to_type": pa.array(vocab[(uniq % v).astype(np.int64)], type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        }
    )


# --- revisit detection: same-sat image pairs within 1 hour ------------------

_REVISIT_PARTS = 64
_HOUR_US = np.int64(3_600_000_000)


def revisit_emit_batch(batch: pa.Table, with_geom: bool = False) -> pa.Table:
    """Banded temporal self-join, map side: every image lands in its
    own (sat, hour) bucket AND the next hour's (so any pair <= 1 h apart
    shares a bucket).  Canonical count rule (applied reduce-side): a
    pair belongs to the bucket of its LATER hour — same-hour pairs are
    counted among own-emissions only, cross-hour pairs exactly where
    the earlier image's +1 emission meets the later image's own.
    ``with_geom`` additionally ships the footprint box in exact integer
    millidegrees (for the spatio-temporal re-capture variant)."""
    from ..util import hash_partition

    sat = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
    key = batch.column("image_key").to_numpy(zero_copy_only=False).astype(np.int64)
    tsi = batch.column("time_acquired").to_numpy(zero_copy_only=False).astype(np.int64)
    h = tsi // _HOUR_US
    sat2 = np.tile(sat, 2)
    key2 = np.tile(key, 2)
    tsi2 = np.tile(tsi, 2)
    h2 = np.tile(h, 2)
    bucket = np.concatenate([h, h + 1])
    gkey = sat2 * np.int64(1 << 21) + bucket
    cols = {
        "gkey": pa.array(gkey),
        "sat_id": pa.array(sat2),
        "image_key": pa.array(key2),
        "tsi": pa.array(tsi2),
        "h": pa.array(h2),
    }
    if with_geom:
        from .. import corpus as corpus_mod

        lon_md, lat_md, hw_md = corpus_mod.geom_md_from_keys(key)
        cols["x0"] = pa.array(np.tile(lon_md - hw_md, 2))
        cols["x1"] = pa.array(np.tile(lon_md + hw_md, 2))
        cols["y0"] = pa.array(np.tile(lat_md - hw_md, 2))
        cols["y1"] = pa.array(np.tile(lat_md + hw_md, 2))
    cols["__part"] = pa.array(hash_partition(gkey, _REVISIT_PARTS))
    return pa.table(cols)


def _tri_pairs(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i < j) local index pairs within segments of the given
    sizes, fully vectorized (triangular-number inversion)."""
    np_pair = sizes * (sizes - 1) // 2
    total = int(np_pair.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    seg = np.repeat(np.arange(len(sizes), dtype=np.int64), np_pair)
    k = np.arange(total, dtype=np.int64) - np.repeat(
        np.r_[np.int64(0), np.cumsum(np_pair)[:-1]], np_pair
    )
    j = np.floor((1.0 + np.sqrt(1.0 + 8.0 * k)) / 2.0).astype(np.int64)
    j = np.where(j * (j - 1) // 2 > k, j - 1, j)  # float-edge guard
    i = k - j * (j - 1) // 2
    return seg, i, j


def revisit_pairs_partition(group: pa.Table, require_overlap: bool = False) -> pa.Table:
    """All revisit pairs of this partition's (sat, hour) buckets: within
    each bucket, curr x curr (same hour) + prev x curr (1 h apart),
    vectorized via segment arithmetic.  Output pairs are key-ordered
    (image_a = lower key) with signed dt_us.  ``require_overlap``
    additionally demands intersecting footprint boxes (exact integer
    millidegree comparisons — the spatio-temporal re-capture join)."""
    empty = pa.table(
        {
            "sat_id": pa.array([], pa.int64()),
            "image_a": pa.array([], pa.string()),
            "image_b": pa.array([], pa.string()),
            "dt_us": pa.array([], pa.int64()),
        }
    )
    n = group.num_rows
    if n == 0:
        return empty
    gkey = group.column("gkey").to_numpy(zero_copy_only=False)
    sat = group.column("sat_id").to_numpy(zero_copy_only=False)
    key = group.column("image_key").to_numpy(zero_copy_only=False)
    tsi = group.column("tsi").to_numpy(zero_copy_only=False)
    h = group.column("h").to_numpy(zero_copy_only=False)
    bucket = gkey % np.int64(1 << 21)
    is_curr = h == bucket
    order = np.lexsort((key, is_curr, gkey))  # prev block (False) first, then curr
    g_s, sat_s, key_s, tsi_s, cur_s = (
        gkey[order], sat[order], key[order], tsi[order], is_curr[order]
    )
    starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]])
    ends = np.r_[starts[1:], n]
    n_prev = np.add.reduceat(np.where(cur_s, 0, 1), starts)
    n_prev[ends == starts] = 0  # defensive; reduceat needs nonempty segs
    n_curr = (ends - starts) - n_prev
    curr_off = starts + n_prev  # curr block start per segment

    idx_a, idx_b = [], []
    # curr x curr: all (i < j) within the key-sorted curr block
    seg, i, j = _tri_pairs(n_curr)
    if len(seg):
        ai = curr_off[seg] + i
        bj = curr_off[seg] + j
        ne = key_s[ai] != key_s[bj]  # corpus dup keys: a.key < b.key excludes
        idx_a.append(ai[ne]); idx_b.append(bj[ne])
    # prev x curr: full cross product per segment
    np_cross = n_prev * n_curr
    total = int(np_cross.sum())
    if total:
        seg2 = np.repeat(np.arange(len(starts), dtype=np.int64), np_cross)
        m = np.arange(total, dtype=np.int64) - np.repeat(
            np.r_[np.int64(0), np.cumsum(np_cross)[:-1]], np_cross
        )
        pi = starts[seg2] + m // n_curr[seg2]
        cj = curr_off[seg2] + m % n_curr[seg2]
        lo = key_s[pi] < key_s[cj]
        idx_a.append(np.where(lo, pi, cj)); idx_b.append(np.where(lo, cj, pi))
    if not idx_a:
        return empty
    ia = np.concatenate(idx_a)
    ib = np.concatenate(idx_b)
    if len(ia):
        # the bucket decomposition admits prev x curr pairs up to 2 h
        # apart on sub-hour timestamps; enforce the op's |dt| <= 1 h
        # contract explicitly (corpus times happen to be hour-quantized,
        # but the kernel must not rely on it)
        within = np.abs(tsi_s[ib] - tsi_s[ia]) <= _HOUR_US
        ia, ib = ia[within], ib[within]
    if require_overlap and len(ia):
        from .. import spec

        buf = np.int64(2 * spec.RECAPTURE_BUFFER_MD)  # both boxes expand
        x0 = group.column("x0").to_numpy(zero_copy_only=False)[order]
        x1 = group.column("x1").to_numpy(zero_copy_only=False)[order]
        y0 = group.column("y0").to_numpy(zero_copy_only=False)[order]
        y1 = group.column("y1").to_numpy(zero_copy_only=False)[order]
        hit = (
            (x0[ia] <= x1[ib] + buf) & (x0[ib] <= x1[ia] + buf)
            & (y0[ia] <= y1[ib] + buf) & (y0[ib] <= y1[ia] + buf)
        )
        ia, ib = ia[hit], ib[hit]
    return pa.table(
        {
            "sat_id": pa.array(sat_s[ia]),
            "image_a": pa.array(
                np.char.add("img-", key_s[ia].astype("U")), type=pa.string()
            ),
            "image_b": pa.array(
                np.char.add("img-", key_s[ib].astype("U")), type=pa.string()
            ),
            "dt_us": pa.array(tsi_s[ib] - tsi_s[ia]),
        }
    )


def state_history_partition(group: pa.Table) -> pa.Table:
    """All users of one hash partition -> SCD2 validity intervals in ONE
    vectorized pass: lexsort (user, ts, event_id); a run starts where
    the user changes or event_type differs from the previous row;
    per-run bounds come from the boundary indices; valid_to is the NEXT
    run's valid_from within the same user (NULL on the user's current
    state) — the standard type-2 dimension close-out rule."""
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    etype = group.column("event_type").to_numpy(zero_copy_only=False)
    n = len(uid)
    if n == 0:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "state": pa.array([], type=pa.string()),
                "valid_from": pa.array([], type=pa.timestamp("us")),
                "valid_to": pa.array([], type=pa.timestamp("us")),
                "last_ts": pa.array([], type=pa.timestamp("us")),
                "n_events": pa.array([], type=pa.int64()),
                "run_seq": pa.array([], type=pa.int64()),
            }
        )
    order = np.lexsort((eid, ts, uid))
    u, t, et = uid[order], ts[order], etype[order]
    is_start = np.ones(n, dtype=bool)
    is_start[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
    bounds = np.append(np.nonzero(is_start)[0], n)
    starts, ends = bounds[:-1], bounds[1:]
    run_uid = u[starts]
    valid_from = t[starts]
    # valid_to = next run's valid_from when it belongs to the same user
    same_user_next = np.zeros(len(starts), dtype=bool)
    same_user_next[:-1] = run_uid[1:] == run_uid[:-1]
    vt = np.empty(len(starts), dtype="datetime64[us]")
    vt[:-1] = valid_from[1:]
    valid_to = pa.array(vt, type=pa.timestamp("us"), mask=~same_user_next)
    # per-user 1-based run index
    user_first = np.ones(len(starts), dtype=bool)
    user_first[1:] = run_uid[1:] != run_uid[:-1]
    idx = np.arange(len(starts), dtype=np.int64)
    first_idx = np.nonzero(user_first)[0]
    reps = np.diff(np.append(first_idx, len(starts)))
    run_seq = idx - np.repeat(idx[first_idx], reps) + 1
    return pa.table(
        {
            "user_id": pa.array(run_uid.astype(np.int64)),
            "state": pa.array(et[starts], type=pa.string()),
            "valid_from": pa.array(valid_from, type=pa.timestamp("us")),
            "valid_to": valid_to,
            "last_ts": pa.array(t[ends - 1], type=pa.timestamp("us")),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "run_seq": pa.array(run_seq),
        }
    )
