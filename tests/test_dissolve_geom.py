"""Exact-geometry dissolve + coverage: pipeline outputs vs single-shot
brute-force unions over the whole layer (the non-SQL oracles)."""

import numpy as np
import pyarrow as pa
import pytest

from planet_data_analyzer_ray.geo import kernels, wkb
from planet_data_analyzer_ray.pipelines import queries as Q
from planet_data_analyzer_ray.sources import images as src
from planet_data_analyzer_ray import spec


def _lc_arrays(sf_dir):
    lc = src.land_cover_table(sf_dir)
    return (
        lc.column("featureclass").to_numpy(zero_copy_only=False),
        lc.column("x0").to_numpy(zero_copy_only=False),
        lc.column("y0").to_numpy(zero_copy_only=False),
        lc.column("x1").to_numpy(zero_copy_only=False),
        lc.column("y1").to_numpy(zero_copy_only=False),
    )


def test_dissolve_geom_area_and_membership(sf_dir):
    out = Q.q_dissolve_geom(sf_dir)
    fc, x0, y0, x1, y1 = _lc_arrays(sf_dir)
    rng = np.random.RandomState(42)
    for row in range(out.num_rows):
        f = out.column("featureclass")[row].as_py()
        m = fc == f
        # area matches a single-shot union to 1e-9
        brute = kernels.rect_union_area(x0[m], y0[m], x1[m], y1[m]) * spec.KM2_PER_DEG2
        assert out.column("area_sqkm")[row].as_py() == pytest.approx(brute, rel=1e-9)
        # decoded geometry covers exactly the same point set
        rx0, ry0, rx1, ry1 = wkb.decode_multipolygon_rects(
            bytes.fromhex(out.column("geom_wkb")[row].as_py())
        )
        px = rng.uniform(x0[m].min() - 0.1, x1[m].max() + 0.1, 500)
        py = rng.uniform(y0[m].min() - 0.1, y1[m].max() + 0.1, 500)
        in_orig = np.zeros(500, dtype=bool)
        for i in np.nonzero(m)[0]:
            in_orig |= (px >= x0[i]) & (px < x1[i]) & (py >= y0[i]) & (py < y1[i])
        in_geom = np.zeros(500, dtype=bool)
        for i in range(len(rx0)):
            in_geom |= (px >= rx0[i]) & (px < rx1[i]) & (py >= ry0[i]) & (py < ry1[i])
        assert (in_orig == in_geom).all(), f
        # disjoint members: total area == sum of member areas
        member_sum = float(((rx1 - rx0) * (ry1 - ry0)).sum()) * spec.KM2_PER_DEG2
        assert member_sum == pytest.approx(brute, rel=1e-9)


def test_coverage_pct_exact_vs_brute_force(sf_dir):
    out = Q.q_coverage_pct_exact(sf_dir)
    fc, lx0, ly0, lx1, ly1 = _lc_arrays(sf_dir)
    imgs = src.images_dataset(sf_dir).to_arrow_refs()
    import ray

    img_tbl = pa.concat_tables([t for t in ray.get(imgs) if t.num_rows])
    ix0 = img_tbl.column("x0").to_numpy(zero_copy_only=False)
    iy0 = img_tbl.column("y0").to_numpy(zero_copy_only=False)
    ix1 = img_tbl.column("x1").to_numpy(zero_copy_only=False)
    iy1 = img_tbl.column("y1").to_numpy(zero_copy_only=False)
    got = {
        out.column("featureclass")[r].as_py(): (
            out.column("lc_area_sqkm")[r].as_py(),
            out.column("covered_area_sqkm")[r].as_py(),
            out.column("coverage_pct")[r].as_py(),
        )
        for r in range(out.num_rows)
    }
    for f in np.unique(fc):
        m = fc == f
        a_brute = kernels.rect_union_area(lx0[m], ly0[m], lx1[m], ly1[m]) * spec.KM2_PER_DEG2
        # brute-force: clip every (img, lc) overlap, single-shot union
        cx0l, cy0l, cx1l, cy1l = [], [], [], []
        for i in np.nonzero(m)[0]:
            ox0 = np.maximum(ix0, lx0[i])
            oy0 = np.maximum(iy0, ly0[i])
            ox1 = np.minimum(ix1, lx1[i])
            oy1 = np.minimum(iy1, ly1[i])
            keep = (ox1 > ox0) & (oy1 > oy0)
            cx0l.append(ox0[keep])
            cy0l.append(oy0[keep])
            cx1l.append(ox1[keep])
            cy1l.append(oy1[keep])
        cx0 = np.concatenate(cx0l)
        cy0 = np.concatenate(cy0l)
        cx1 = np.concatenate(cx1l)
        cy1 = np.concatenate(cy1l)
        i_brute = kernels.rect_union_area(cx0, cy0, cx1, cy1) * spec.KM2_PER_DEG2
        a_got, i_got, pct_got = got[str(f)]
        assert a_got == pytest.approx(a_brute, rel=1e-9)
        assert i_got == pytest.approx(i_brute, rel=1e-9)
        assert pct_got == pytest.approx(100.0 * i_brute / a_brute, rel=1e-9)


def test_country_image_union_vs_brute_force(sf_dir):
    """The distributed big-side dissolve (clip -> cell split -> additive
    per-cell unions) equals a driver-side single-shot rectangle union
    per country."""
    import numpy as np
    import pyarrow.parquet as pq

    from planet_data_analyzer_ray import corpus, spec
    from planet_data_analyzer_ray.geo import kernels
    from planet_data_analyzer_ray.pipelines import queries as Q

    out = Q.q_country_image_union(sf_dir).to_pandas().set_index("country_iso")

    li = pq.read_table(f"{sf_dir}/lineitem.parquet")
    imgs = corpus.derive_images(li, light=True)
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ctry = corpus.derive_countries(nat)
    iso = ctry.column("iso").to_numpy(zero_copy_only=False)
    md = {}
    for c in ("x0", "y0", "x1", "y1"):
        md[c] = np.rint(ctry.column(c).to_numpy(zero_copy_only=False) * 1000).astype(np.int64)
    im = {}
    for c in ("x0", "y0", "x1", "y1"):
        im[c] = np.rint(imgs.column(c).to_numpy(zero_copy_only=False) * 1000).astype(np.int64)
    for j in range(len(iso)):
        m = (
            (im["x0"] < md["x1"][j]) & (md["x0"][j] < im["x1"])
            & (im["y0"] < md["y1"][j]) & (md["y0"][j] < im["y1"])
        )
        if not m.any():
            assert iso[j] not in out.index
            continue
        want = round(
            kernels.rect_union_area(
                np.maximum(im["x0"][m], md["x0"][j]),
                np.maximum(im["y0"][m], md["y0"][j]),
                np.minimum(im["x1"][m], md["x1"][j]),
                np.minimum(im["y1"][m], md["y1"][j]),
            )
        ) * spec.KM2_PER_MD2
        assert out.loc[iso[j], "union_area_sqkm"] == want, iso[j]
