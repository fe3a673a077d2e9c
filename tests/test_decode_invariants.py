"""BASELINE per-row payload invariants: decoded-pixel allclose with
PSNR >= 40 dB for lossy formats, byte-identical captions end-to-end."""

import numpy as np
import pytest

from planet_data_analyzer_ray import corpus
from planet_data_analyzer_ray.stages import decode


@pytest.fixture(scope="module")
def images(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )
    return corpus.derive_images(t, with_bytes=True)


def test_lossless_roundtrip_exact(images):
    import pyarrow as pa

    mask = pa.array(np.asarray(images.column("fmt").to_pylist()) == "raw8")
    rows = images.filter(mask).slice(0, 50)
    for row in rows.to_pylist():
        px = decode.decode_one(row["bytes"], row["fmt"], row["w"], row["h"])
        orig = corpus.original_pixels(row["image_key"], row["w"], row["h"]).reshape(
            row["h"], row["w"]
        )
        assert (px == orig).all()
        assert decode.psnr(px, orig) == float("inf")


def test_lossy_psnr_at_least_40db(images):
    import pyarrow as pa

    mask = pa.array(np.asarray(images.column("fmt").to_pylist()) == "qraw8")
    rows = images.filter(mask).slice(0, 100)
    assert rows.num_rows > 0
    for row in rows.to_pylist():
        px = decode.decode_one(row["bytes"], row["fmt"], row["w"], row["h"])
        orig = corpus.original_pixels(row["image_key"], row["w"], row["h"]).reshape(
            row["h"], row["w"]
        )
        p = decode.psnr(px, orig)
        assert p >= 40.0, f"PSNR {p} < 40 dB for {row['image_id']}"


def test_caption_byte_identity_through_pipeline(images, sf_dir):
    """Captions survive the full metadata pipeline byte-identical."""
    import ray

    from planet_data_analyzer_ray.pipelines import queries as Q

    out = Q.q_images_metadata(sf_dir).to_pandas()
    src_caps = dict(
        zip(images.column("image_id").to_pylist(), images.column("caption").to_pylist())
    )
    for iid, cap in zip(out["image_id"], out["caption"]):
        assert src_caps[iid].encode() == cap.encode()


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode.decode_one(b"\x00", "jpeg", 1, 1)


def test_frame_sample_matches_full_decode(images):
    """Sampled-frame sums equal summing every K-th row of the decoded
    array directly (the frame-sample stage reads the same bytes the
    decoder does)."""
    import numpy as np
    import pyarrow as pa

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.stages.decode import FrameSampleStats, decode_one

    batch = images.slice(0, 64)
    out = FrameSampleStats()(batch)
    k = spec.FRAME_SAMPLE_K
    for i in range(batch.num_rows):
        row = {c: batch.column(c)[i].as_py() for c in ("bytes", "fmt", "w", "h")}
        px = decode_one(row["bytes"], row["fmt"], row["w"], row["h"])
        frames = px[::k]
        assert out.column("n_frames")[i].as_py() == row["h"]
        assert out.column("n_sampled")[i].as_py() == frames.shape[0]
        assert out.column("sampled_sum")[i].as_py() == int(
            frames.astype(np.int64).sum()
        )
