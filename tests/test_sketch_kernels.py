"""Unit/property tests for the fixed-size sketch kernels
(stages/sketch.py) and the pyramid pooling stage, against slow
reference implementations."""

import numpy as np
import pyarrow as pa
import pytest

from planet_data_analyzer_ray import spec
from planet_data_analyzer_ray.stages import sketch
from planet_data_analyzer_ray.stages.decode import PyramidPool


def _poly_key_slow(term: str) -> int:
    s = 0
    for i, ch in enumerate(term[: spec.CMS_KEY_CHARS]):
        s += ord(ch) * spec.CMS_POW31[i]
    return s % spec.MOD


def test_poly_term_keys_matches_slow_reference():
    terms = [
        "a",
        "scan",
        "window",
        "",  # empty -> 0
        "x" * spec.CMS_KEY_CHARS,  # exactly at the cap
        "y" * (spec.CMS_KEY_CHARS + 7),  # beyond the cap: truncated
        "Zz9~",
    ]
    got = sketch.poly_term_keys(pa.array(terms, type=pa.string()))
    want = np.array([_poly_key_slow(t) for t in terms], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_poly_term_keys_sliced_array():
    # Arrow offset handling: a slice must hash the same as a fresh array
    base = pa.array(["pad", "alpha", "beta", "gamma"], type=pa.string())
    sliced = base.slice(1, 3)
    fresh = pa.array(["alpha", "beta", "gamma"], type=pa.string())
    np.testing.assert_array_equal(
        sketch.poly_term_keys(sliced), sketch.poly_term_keys(fresh)
    )


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    build = rng.integers(0, 10**9, size=5000).astype(np.int64)
    bloom = sketch.bloom_array_from_bits(sketch.bloom_bits_batch(build))
    assert sketch.bloom_probe(build, bloom).all(), "bloom must never miss a member"


def test_bloom_rejects_most_nonmembers_at_low_load():
    rng = np.random.default_rng(11)
    build = rng.integers(0, 10**9, size=200).astype(np.int64)
    probe = rng.integers(10**9, 2 * 10**9, size=5000).astype(np.int64)
    bloom = sketch.bloom_array_from_bits(sketch.bloom_bits_batch(build))
    fp = sketch.bloom_probe(probe, bloom).mean()
    assert fp < 0.05, f"FP rate {fp} too high at ~4% load"


def test_cms_estimate_never_underestimates():
    rng = np.random.default_rng(13)
    terms = pa.array([f"t{i}" for i in range(300)], type=pa.string())
    counts = rng.integers(1, 100, size=300).astype(np.int64)
    keys = sketch.poly_term_keys(terms)
    part = sketch.cms_partial_batch(keys, counts)
    grid = np.zeros(spec.CMS_DEPTH * spec.CMS_WIDTH, dtype=np.int64)
    grid[part.column("cell").to_numpy()] = part.column("cnt").to_numpy()
    est = sketch.cms_estimate(grid.reshape(spec.CMS_DEPTH, spec.CMS_WIDTH), keys)
    assert (est >= counts).all(), "count-min must only overestimate"


def test_hll_register_rho_known_values():
    m = 1 << spec.HLL_REG_BITS
    # value = reg + m * q
    cases = [
        (5 + m * 0, 5, spec.HLL_RMAX),  # q == 0 -> rho = RMAX
        (3 + m * 1, 3, 1),  # q = 0b1 -> tz 0 -> rho 1
        (0 + m * 8, 0, 4),  # q = 0b1000 -> tz 3 -> rho 4
        (1 + m * (1 << spec.HLL_RMAX), 1, spec.HLL_RMAX),  # capped
    ]
    vals = np.array([v for v, _, _ in cases], dtype=np.int64)
    reg, rho = sketch.hll_register_rho(vals)
    np.testing.assert_array_equal(reg, [r for _, r, _ in cases])
    np.testing.assert_array_equal(rho, [x for _, _, x in cases])


@pytest.mark.parametrize("n", [500, 2000, 50000])
def test_hll_estimate_within_tolerance(n):
    # 64 registers -> ~13% standard error; sequential elements are the
    # hard case (the affine-only hash overestimated 2x here)
    reg, rho = sketch.hll_register_rho(sketch.hll_value(np.arange(n, dtype=np.int64)))
    file = np.zeros(1 << spec.HLL_REG_BITS, dtype=np.int64)
    np.maximum.at(file, reg, rho)
    est = sketch.hll_estimate(file)
    assert 0.6 * n < est < 1.5 * n, f"HLL estimate {est} far off {n}"


def _morton_slow(x: int, y: int) -> int:
    code = 0
    for i in range(spec.MORTON_BITS):
        code |= ((x >> i) & 1) << (2 * i)
        code |= ((y >> i) & 1) << (2 * i + 1)
    return code


def test_morton_codes_match_slow_interleave():
    rng = np.random.default_rng(17)
    lon_md = rng.integers(0, spec.LON_SPAN_MD, size=500).astype(np.int64)
    lat_md = rng.integers(0, spec.LAT_SPAN_MD, size=500).astype(np.int64)
    got = sketch.morton_codes(lon_md, lat_md)
    b = spec.MORTON_BITS
    want = np.array(
        [
            _morton_slow(
                int((lx << b) // spec.LON_SPAN_MD), int((ly << b) // spec.LAT_SPAN_MD)
            )
            for lx, ly in zip(lon_md, lat_md)
        ],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(got, want)
    assert got.max() < 1 << (2 * b)


@pytest.mark.parametrize("w,h", [(16, 16), (17, 16), (16, 17), (5, 3), (2, 2)])
def test_pyramid_pool_matches_slow_reference(w, h):
    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    batch = pa.table(
        {
            "image_id": pa.array(["img-1"]),
            "w": pa.array([w], pa.int32()),
            "h": pa.array([h], pa.int32()),
            "fmt": pa.array(["raw8"]),
            "bytes": pa.array([px.tobytes()], pa.binary()),
        }
    )
    out = PyramidPool()(batch)
    pw, ph = w // 2, h // 2
    want = 0
    for r in range(ph):
        for c in range(pw):
            cell = px[2 * r : 2 * r + 2, 2 * c : 2 * c + 2].astype(int)
            want += int(cell.sum()) // 4
    assert out.column("pw")[0].as_py() == pw
    assert out.column("ph")[0].as_py() == ph
    assert out.column("pool_sum")[0].as_py() == want


def test_pyramid_pool_rejects_unknown_format():
    batch = pa.table(
        {
            "image_id": pa.array(["img-1"]),
            "w": pa.array([2], pa.int32()),
            "h": pa.array([2], pa.int32()),
            "fmt": pa.array(["jpeg"]),
            "bytes": pa.array([b"\x00" * 4], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        PyramidPool()(batch)
