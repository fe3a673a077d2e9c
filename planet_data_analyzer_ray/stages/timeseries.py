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
