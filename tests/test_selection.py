"""Distributed exact selection (stages/selection.py): rank correctness
against a local sort, the sign-fold order transform, and the
concentrated-bucket recursion down to the shift-0 exact-double terminal."""

import numpy as np
import pyarrow as pa
import pytest

from planet_data_analyzer_ray.stages import selection


def test_order_key_monotone():
    v = np.array([-1e300, -5.5, -1.25, -0.0, 0.0, 1e-308, 3.5, 1e300])
    m = selection.order_key(v)
    assert (np.diff(m.astype(np.float64)) >= 0).all()
    # exact inverse
    back = selection.key_to_float(m)
    assert np.array_equal(back, v) or np.array_equal(
        np.where(back == 0.0, 0.0, back), np.where(v == 0.0, 0.0, v)
    )


def _ds_factory(values):
    import ray.data

    tab = pa.table({"value": pa.array(np.asarray(values, dtype=np.float64))})

    def factory():
        return ray.data.from_arrow(tab).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=7
        )

    return factory


@pytest.mark.parametrize("seed", [0, 1])
def test_quantiles_match_local_sort(sf_dir, seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [rng.normal(size=500), -rng.exponential(size=300), rng.uniform(-2, 2, 200)]
    )
    srt = np.sort(vals)
    ranks = [1, 7, 250, 500, 999, 1000]
    got = selection.quantiles_disc(_ds_factory(vals), "value", ranks)
    assert got == [float(srt[r - 1]) for r in ranks]


def test_concentrated_bucket_recurses_to_exact_double(sf_dir):
    # all values identical: every level's bucket holds everything, so
    # with cap=2 the walk must descend 48->32->16->0 and answer from
    # the shift-0 terminal WITHOUT any collect.
    vals = np.full(50, 3.141592653589793)
    got = selection.quantiles_disc(_ds_factory(vals), "value", [1, 25, 50], cap=2)
    assert got == [3.141592653589793] * 3

    # two spikes, one per sign: the sign fold must route ranks across
    # the negative/positive boundary correctly under recursion too.
    vals = np.concatenate([np.full(30, -2.5), np.full(20, 7.25)])
    got = selection.quantiles_disc(_ds_factory(vals), "value", [1, 30, 31, 50], cap=2)
    assert got == [-2.5, -2.5, 7.25, 7.25]


def test_grouped_quantiles_fallback_path(sf_dir):
    # group "a" is spread out (collect path); group "b" is one spike
    # bigger than cap (per-group recursive fallback).
    rng = np.random.default_rng(7)
    va = rng.normal(size=200)
    vb = np.full(100, 42.0)
    tab = pa.table(
        {
            "grp": pa.array(["a"] * 200 + ["b"] * 100),
            "value": pa.array(np.concatenate([va, vb])),
        }
    )

    def factory():
        import ray.data

        return ray.data.from_arrow(tab).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=37
        )

    got = selection.grouped_quantiles_disc(factory, "grp", "value", (50, 99), cap=50)
    rows = {(r["grp"], r["p"]): r["value"] for r in got.to_pylist()}
    sa = np.sort(va)
    assert rows[("a", 50)] == float(sa[-(-50 * 200 // 100) - 1])
    assert rows[("a", 99)] == float(sa[-(-99 * 200 // 100) - 1])
    assert rows[("b", 50)] == 42.0 and rows[("b", 99)] == 42.0
