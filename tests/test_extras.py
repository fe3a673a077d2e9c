"""Golden/oracle tests for the secondary operators without SQL mirrors."""

import json

import numpy as np
import pytest

from planet_data_analyzer_ray import corpus
from planet_data_analyzer_ray.geo import kernels
from planet_data_analyzer_ray.pipelines import queries as Q
from planet_data_analyzer_ray.sources import images as src


def test_dissolve_exact_matches_single_shot_union(sf_dir):
    got = {
        r["featureclass"]: r["area_sqkm"]
        for r in Q.q_dissolve_exact_area(sf_dir).to_pandas().to_dict("records")
    }
    lc = src.land_cover_table(sf_dir)
    fc = lc.column("featureclass").to_numpy(zero_copy_only=False)
    x0 = lc.column("x0").to_numpy(zero_copy_only=False)
    y0 = lc.column("y0").to_numpy(zero_copy_only=False)
    x1 = lc.column("x1").to_numpy(zero_copy_only=False)
    y1 = lc.column("y1").to_numpy(zero_copy_only=False)
    for f in np.unique(fc):
        m = fc == f
        expected = (
            kernels.rect_union_area(x0[m], y0[m], x1[m], y1[m]) * 12364.0
        )
        assert got[f] == pytest.approx(expected, rel=1e-12)


def test_geojson_export_golden(sf_dir):
    out = Q.q_geojson_export(sf_dir).to_pandas()
    assert len(out) > 0
    feat = json.loads(out.iloc[0]["feature"])
    assert feat["type"] == "Feature"
    assert feat["geometry"]["type"] == "Polygon"
    ring = feat["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    props = feat["properties"]
    assert props["id"] == out.iloc[0]["image_id"]
    for k in [
        "sat_id",
        "cloud_cover",
        "clear_confidence_percent",
        "time_acquired",
        "area_sqkm",
        "caption",
    ]:
        assert k in props
    # timestamp formatted like the reference (db.py:169)
    import re

    assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", props["time_acquired"])


def test_dense_series_has_empty_buckets(sf_dir):
    df = Q.q_time_series_dense(sf_dir).to_pandas()
    # contiguous months, and the scaffold keeps any zero-count months
    assert df["bucket"].is_monotonic_increasing
    assert (df["total_images"] >= 0).all()
    import pandas as pd

    months = pd.PeriodIndex(df["bucket"], freq="M")
    assert (months[1:] - months[:-1]).map(lambda d: d.n == 1).all()
