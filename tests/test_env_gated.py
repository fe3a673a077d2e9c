"""Import-gated paths: real jpeg/png codecs (PIL/cv2), the geodetic
EPSG:3035 centroid/area path (pyproj), and the Lance read path.  Each
gate is tested BOTH ways — absent (the sandbox default: honest
NotImplementedError) and present (skip-if-absent goldens, plus
mock-module wiring checks that need no real dependency)."""

import sys
import types

import numpy as np
import pytest

from planet_data_analyzer_ray.geo import geodetic
from planet_data_analyzer_ray.sources import images as img_src
from planet_data_analyzer_ray.stages import decode

# the reference's fixture polygon and goldens
# (/root/reference/tests/resources/fake_feature.py,
#  /root/reference/tests/integration/database/test_db_i.py:213-222)
REF_LON = [1.07935e-10, 20.023127886233997, 15.564234739500566, 8.3899e-11, 1.07935e-10]
REF_LAT = [60.15824184521428, 60.15824184521428, 50.16996707220397, 50.16996707220397, 60.15824184521428]
GOLD_LON, GOLD_LAT = 8.804454520157185, 55.474220203855445
GOLD_AREA = 1244037.118


# --- geodetic (pyproj) ------------------------------------------------------


def test_geodetic_gate_absent_raises():
    if geodetic.HAVE_PYPROJ:
        pytest.skip("pyproj present — gate-open golden test covers this env")
    with pytest.raises(NotImplementedError):
        geodetic.centroid_area_3035(REF_LON, REF_LAT)


@pytest.mark.skipif(not geodetic.HAVE_PYPROJ, reason="pyproj not installed")
def test_geodetic_reference_goldens():
    lon, lat, area = geodetic.centroid_area_3035(REF_LON, REF_LAT)
    assert abs(lon - GOLD_LON) < 1e-9
    assert abs(lat - GOLD_LAT) < 1e-9
    assert area == GOLD_AREA


def test_geodetic_shoelace_planar_identity():
    """The shoelace kernel itself (no projection): unit square centroid
    and area are exact, closed and open rings agree."""
    x = np.array([0.0, 2.0, 2.0, 0.0])
    y = np.array([0.0, 0.0, 2.0, 2.0])
    a2, cx6, cy6 = geodetic._shoelace(x, y)
    assert a2 == 8.0  # 2 * area(4)
    assert cx6 / (3 * a2) == 1.0 and cy6 / (3 * a2) == 1.0


# --- image codecs (PIL/cv2) -------------------------------------------------


def test_codec_gate_absent():
    """Sandbox default: no PIL/cv2 -> png/jpeg honestly unimplemented."""
    reg = decode.build_extra_codecs(modules={})
    assert reg == {}
    if not decode.EXTRA_CODECS:
        with pytest.raises(NotImplementedError):
            decode.decode_one(b"\x00", "png", 1, 1)


def test_codec_gate_wiring():
    """The registry wires png/jpeg to the PIL decoder when PIL is
    importable, to cv2 otherwise, PIL preferred — no real dependency
    needed to verify the switch."""
    reg = decode.build_extra_codecs(modules={"PIL": True, "cv2": True})
    assert reg == {"png": decode._pil_decode, "jpeg": decode._pil_decode}
    reg = decode.build_extra_codecs(modules={"cv2": True})
    assert reg == {"png": decode._cv2_decode, "jpeg": decode._cv2_decode}


def _have_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _have_pil(), reason="PIL not installed")
def test_pil_png_lossless_and_jpeg_psnr():
    """Mirrors the reference e2e decode invariant
    (/root/reference/tests/e2e/test_app.py:42-49): png roundtrips
    exactly; jpeg survivors satisfy PSNR >= 40 dB."""
    import io

    from PIL import Image

    rng = np.random.RandomState(7)
    orig = rng.randint(0, 256, size=(32, 48), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(orig, mode="L").save(buf, format="PNG")
    px = decode.decode_one(buf.getvalue(), "png", 48, 32)
    assert (px == orig).all()
    # jpeg: smooth gradient compresses with high fidelity
    smooth = np.tile(np.arange(48, dtype=np.uint8) * 5, (32, 1))
    jbuf = io.BytesIO()
    Image.fromarray(smooth, mode="L").save(jbuf, format="JPEG", quality=95)
    jpx = decode.decode_one(jbuf.getvalue(), "jpeg", 48, 32)
    assert decode.psnr(jpx, smooth) >= 40.0


# --- lance source -----------------------------------------------------------


def test_lance_gate_absent():
    try:
        import lance  # noqa: F401

        pytest.skip("lance present — mock test covers the wiring")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        img_src.read_images_lance("/tmp/nonexistent.lance")


def test_lance_gate_wires_columns(monkeypatch):
    """With a mock lance module installed, read_images_lance switches to
    ray.data.read_lance and forwards the column-pruning list."""
    calls = {}

    def fake_read_lance(uri, columns=None):
        calls["uri"], calls["columns"] = uri, columns
        return "SENTINEL"

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(img_src.ray.data, "read_lance", fake_read_lance)
    out = img_src.read_images_lance(
        "s3://corpus/images.lance", columns=["image_id", "caption"]
    )
    assert out == "SENTINEL"
    assert calls == {
        "uri": "s3://corpus/images.lance",
        "columns": ["image_id", "caption"],
    }
