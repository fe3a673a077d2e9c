"""Broadcast-side joins: dimension attach, city-buffer range join.

J1 (image ⋈ satellite, /root/reference/app/query.py:46 + db.py:93-100):
tiny dimension table shipped once via ``ray.put``, attached inside
``map_batches`` — never a shuffle join.

J4 (city-buffer ⋈ image, db.py:236-245 + app/query.py:94-105): the
reference buffers each city point by 30 km and joins with
``ST_Intersects``; a circle×box intersects test is exactly the
clamped-distance predicate, refined after an STRtree candidate pass
over the circles' bboxes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geo import kernels
from ..geo.strtree import STRtree


class AttachSatellite:
    """J1: attach sat_name + pixel_res from the broadcast satellites dim
    table (reference db.py:91 pixel_res rides along with the name)."""

    def __init__(self, sat_ref):
        table = sat_ref if isinstance(sat_ref, pa.Table) else ray.get(sat_ref)
        sid = table.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        names = table.column("sat_name").to_numpy(zero_copy_only=False)
        # dense lookup array (satellite ids are small ints)
        self.lut = np.empty(int(sid.max()) + 1, dtype=object)
        self.lut[sid] = names
        self.px_lut = np.zeros(int(sid.max()) + 1, dtype=np.float64)
        if "pixel_res" in table.column_names:
            self.px_lut[sid] = table.column("pixel_res").to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sid = batch.column("sat_id").to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.append_column(
            "sat_name", pa.array(self.lut[sid].astype("U"), type=pa.string())
        )
        return batch.append_column("pixel_res", pa.array(self.px_lut[sid]))


def attach_satellite(images: "ray.data.Dataset", satellites: pa.Table) -> "ray.data.Dataset":
    from ..state.broadcast import cached

    ref = ray.put(satellites)

    def attach(batch: pa.Table) -> pa.Table:
        return cached(ref, AttachSatellite)(batch)

    return images.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


class CityBufferJoin:
    """J4: image batch -> (city_id, city_name, image_id) pairs where the
    image footprint intersects the city's buffer circle."""

    def __init__(self, cities_ref):
        t = cities_ref if isinstance(cities_ref, pa.Table) else ray.get(cities_ref)
        self.city_id = t.column("city_id").to_numpy(zero_copy_only=False)
        self.city_name = t.column("city_name").to_numpy(zero_copy_only=False)
        self.lon = t.column("lon").to_numpy(zero_copy_only=False)
        self.lat = t.column("lat").to_numpy(zero_copy_only=False)
        self.radius = t.column("radius").to_numpy(zero_copy_only=False)
        # STRtree over circle bboxes, built once per actor
        self.tree = STRtree(
            self.lon - self.radius,
            self.lat - self.radius,
            self.lon + self.radius,
            self.lat + self.radius,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        x0 = batch.column("x0").to_numpy(zero_copy_only=False)
        y0 = batch.column("y0").to_numpy(zero_copy_only=False)
        x1 = batch.column("x1").to_numpy(zero_copy_only=False)
        y1 = batch.column("y1").to_numpy(zero_copy_only=False)
        qi, ci = self.tree.query_batch(x0, y0, x1, y1)
        if len(qi):
            d2 = kernels.circle_box_dist_sq(
                self.lon[ci], self.lat[ci], x0[qi], y0[qi], x1[qi], y1[qi]
            )
            keep = d2 <= self.radius[ci] * self.radius[ci]
            qi, ci = qi[keep], ci[keep]
        ids = batch.column("image_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "city_id": pa.array(self.city_id[ci]),
                "city_name": pa.array(self.city_name[ci].astype("U"), type=pa.string()),
                "image_id": pa.array(ids[qi], type=pa.string()),
            }
        )


def city_buffer_join(images: "ray.data.Dataset", cities: pa.Table) -> "ray.data.Dataset":
    from ..state.broadcast import cached

    ref = ray.put(cities)

    def join(batch: pa.Table) -> pa.Table:
        return cached(ref, CityBufferJoin)(batch)

    return images.map_batches(
        join, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
