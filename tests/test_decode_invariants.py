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


def test_join_survivor_payload_invariant(images, sf_dir):
    """North-rule wording check on the JOIN output itself: every
    surviving row of the flagship spatial join satisfies the payload
    invariant — decoded pixels allclose (PSNR >= 40 dB for lossy,
    exact for lossless) and byte-identical caption (sampled here for
    test speed; the per-row check is deterministic per image)."""
    from planet_data_analyzer_ray.pipelines import queries as Q
    from planet_data_analyzer_ray.sources import images as src

    pairs = Q.q_spatial_join_landcover(sf_dir).to_pandas()
    surviving = sorted(set(pairs["image_id"]))
    assert len(surviving) > 0
    by_id = {}
    for row in images.to_pylist():
        by_id[row["image_id"]] = row
    # pipeline-side captions for the survivors (post-dedup metadata)
    meta = Q.q_images_metadata(sf_dir).to_pandas()
    pipe_caps = dict(zip(meta["image_id"], meta["caption"]))
    for iid in surviving[:: max(1, len(surviving) // 100)]:
        row = by_id[iid]
        px = decode.decode_one(row["bytes"], row["fmt"], row["w"], row["h"])
        orig = corpus.original_pixels(row["image_key"], row["w"], row["h"]).reshape(
            row["h"], row["w"]
        )
        if row["fmt"] == "raw8":
            assert (px == orig).all()
        else:
            assert decode.psnr(px, orig) >= 40.0
        assert pipe_caps[iid].encode() == row["caption"].encode()


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


def test_payload_sums_reduceat_degenerate_rows(monkeypatch):
    """The env-gated reduceat fast path must agree with the per-row loop
    on zero-length payload rows — including a TRAILING empty row (whose
    offset == len(flat) and whose clamped segment used to truncate the
    previous row's sum) and an all-empty chunk (reduceat on an empty
    index list used to raise)."""
    import pyarrow as pa

    cases = [
        [b"\x01\x02\x03", b"", b"\x05\x06"],  # interior empty
        [b"\x01\x02\x03", b"\x05\x06", b""],  # trailing empty
        [b"", b""],  # all empty
        [b"\xff" * 4],  # single row
        [b""],  # single empty row
    ]
    for payloads in cases:
        t = pa.table(
            {
                "bytes": pa.array(payloads, pa.binary()),
                "fmt": pa.array(["raw8"] * len(payloads)),
            }
        )
        monkeypatch.delenv("GRAFT_DECODE_REDUCEAT", raising=False)
        n_loop, s_loop = decode.payload_sums(t)
        monkeypatch.setenv("GRAFT_DECODE_REDUCEAT", "1")
        n_fast, s_fast = decode.payload_sums(t)
        assert (n_loop == n_fast).all()
        assert (s_loop == s_fast).all()
        assert list(n_loop) == [len(p) for p in payloads]
        assert list(s_loop) == [sum(p) for p in payloads]


def test_pixel_histogram_rejects_unknown_format():
    import pyarrow as pa

    t = pa.table(
        {
            "bytes": pa.array([b"\x01\x02"], pa.binary()),
            "fmt": pa.array(["jpeg"]),
        }
    )
    with pytest.raises(NotImplementedError):
        decode.pixel_histogram_batch(t)


# --- shared pair-stat payload kernels ---------------------------------------

def _naive_gradient(rows):
    e, nd = [], []
    for r in rows:
        b = np.frombuffer(r, dtype=np.uint8).astype(np.int64)
        e.append(int(np.abs(np.diff(b)).sum()) if len(b) >= 2 else 0)
        nd.append(max(len(b) - 1, 0))
    return np.asarray(e), np.asarray(nd)


def _naive_runs(rows, t):
    out = []
    for r in rows:
        b = np.frombuffer(r, dtype=np.uint8)
        bright = b > t
        runs = int(bright[0]) if len(b) else 0
        runs += int((~bright[:-1] & bright[1:]).sum()) if len(b) >= 2 else 0
        out.append(runs)
    return np.asarray(out)


@pytest.mark.parametrize("seed", [0, 1])
def test_payload_pair_kernels_vs_naive(seed):
    """payload_row_gradient / payload_row_bright_runs on adversarial
    layouts: 0- and 1-byte rows, multi-chunk columns, and SLICED chunks
    (chunk.offset > 0, non-zero starting byte offset) — all vs a naive
    per-row reference."""
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    rows = [
        rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()
        for n in [0, 1, 2, 7, 0, 256, 1, 33, 300, 0]
    ]
    whole = pa.array(rows, type=pa.binary())
    sliced = whole.slice(2, 6)  # starts mid-buffer: offs[0] > 0
    chunked = pa.chunked_array([whole.slice(0, 4), whole.slice(4, 6)])
    for col, expect_rows in [
        (whole, rows),
        (sliced, rows[2:8]),
        (chunked, rows),
    ]:
        ge, gn = decode.payload_row_gradient(col)
        ee, en = _naive_gradient(expect_rows)
        assert np.array_equal(ge, ee), (ge, ee)
        assert np.array_equal(gn, en)
        got = decode.payload_row_bright_runs(col, 192)
        want = _naive_runs(expect_rows, 192)
        assert np.array_equal(got, want), (got, want)


def _brute_blob_stats(mask):
    """Naive per-image reference: BFS flood fill + direct censuses."""
    h, w = mask.shape
    V = int(mask.sum())
    Eh = int((mask[:, 1:] & mask[:, :-1]).sum())
    Ev = int((mask[1:, :] & mask[:-1, :]).sum())
    Q = int((mask[1:, 1:] & mask[1:, :-1] & mask[:-1, 1:] & mask[:-1, :-1]).sum())
    seen = np.zeros_like(mask, bool)
    blobs = 0
    for i in range(h):
        for j in range(w):
            if mask[i, j] and not seen[i, j]:
                blobs += 1
                stack = [(i, j)]
                seen[i, j] = True
                while stack:
                    a, b = stack.pop()
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        x, y = a + da, b + db
                        if 0 <= x < h and 0 <= y < w and mask[x, y] and not seen[x, y]:
                            seen[x, y] = True
                            stack.append((x, y))
    return V, Eh, Ev, Q, blobs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_payload_blob_stats_vs_bfs(seed):
    """payload_blob_stats vs a BFS flood-fill reference on ARBITRARY
    random masks — including ring/hole patterns where the Euler number
    differs from the component count, so this validates the union-find
    itself (the corpus oracle only exercises the hole-free ramp), plus
    the adversarial layouts of the sibling pair-kernel test (sliced
    chunks, multi-chunk columns)."""
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    dims, rows, expected = [], [], []
    # random dense/sparse masks of assorted shapes
    for w, h, p in [(1, 1, 0.5), (5, 1, 0.6), (1, 7, 0.6), (8, 8, 0.5),
                    (16, 16, 0.35), (16, 16, 0.75), (33, 17, 0.5), (64, 64, 0.55)]:
        m = rng.rand(h, w) < p
        dims.append((w, h))
        rows.append(np.where(m, 200, 10).astype(np.uint8).tobytes())
        expected.append(_brute_blob_stats(m))
    # a deliberate ring: 1 component, 1 hole (euler = 0 != blobs = 1)
    ring = np.zeros((5, 5), bool)
    ring[1:4, 1:4] = True
    ring[2, 2] = False
    dims.append((5, 5))
    rows.append(np.where(ring, 255, 0).astype(np.uint8).tobytes())
    expected.append(_brute_blob_stats(ring))
    v, eh, ev, q, c = _brute_blob_stats(ring)
    assert v - eh - ev + q == 0 and c == 1  # the hole case is real

    whole = pa.array(rows, type=pa.binary())
    sliced = whole.slice(2, 6)
    chunked = pa.chunked_array([whole.slice(0, 4), whole.slice(4, len(rows) - 4)])
    for col, sel in [(whole, slice(None)), (sliced, slice(2, 8)), (chunked, slice(None))]:
        w_arr = np.asarray([d[0] for d in dims[sel]], dtype=np.int64)
        h_arr = np.asarray([d[1] for d in dims[sel]], dtype=np.int64)
        got = decode.payload_blob_stats(col, w_arr, h_arr)
        want = list(zip(*expected[sel]))
        for gi, wi in zip(got, want):
            assert np.array_equal(gi, np.asarray(wi, dtype=np.int64)), (got, expected[sel])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_payload_row_lag_energy_vs_naive(seed):
    """payload_row_lag_energy (the vertical-gradient kernel) vs a naive
    per-row loop on adversarial layouts — random per-row lags
    (including lag > row length and lag on EMPTY rows), mixed widths
    grouped inside one chunk, sliced chunks, multi-chunk columns
    (round-4 ADVICE: the only kernel without a direct naive test)."""
    import pyarrow as pa

    rng = np.random.RandomState(seed)
    lens = [0, 1, 2, 7, 0, 256, 5, 33, 300, 12]
    rows = [rng.randint(0, 256, size=n, dtype=np.uint8).tobytes() for n in lens]
    lags = rng.randint(1, 40, size=len(rows)).astype(np.int64)

    def naive(row_bytes, lag):
        a = np.frombuffer(row_bytes, dtype=np.uint8).astype(np.int64)
        nd = max(len(a) - int(lag), 0)
        return int(np.abs(a[int(lag):] - a[: nd]).sum()) if nd else 0, nd

    whole = pa.array(rows, type=pa.binary())
    sliced = whole.slice(2, 6)
    chunked = pa.chunked_array([whole.slice(0, 4), whole.slice(4, 6)])
    for col, sel in [(whole, slice(None)), (sliced, slice(2, 8)), (chunked, slice(None))]:
        e, nd = decode.payload_row_lag_energy(col, lags[sel])
        want = [naive(r, g) for r, g in zip(rows[sel], lags[sel])]
        assert np.array_equal(e, np.asarray([x[0] for x in want], dtype=np.int64)), (e, want)
        assert np.array_equal(nd, np.asarray([x[1] for x in want], dtype=np.int64))


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_row_kernels_vs_naive(seed):
    """The round-5 fused-pass kernels (sumsq, border, pool, frame,
    thumb, hist) vs naive per-row references on random (w, h) rasters,
    incl. sliced chunks and multi-chunk columns."""
    import pyarrow as pa

    from planet_data_analyzer_ray import spec as S

    rng = np.random.RandomState(seed)
    dims = [(2, 2), (3, 2), (2, 9), (8, 8), (17, 5), (64, 64), (5, 17), (16, 16), (7, 7), (2, 3)]
    rows = [rng.randint(0, 256, size=w * h, dtype=np.uint8).tobytes() for w, h in dims]
    wa = np.asarray([d[0] for d in dims], dtype=np.int64)
    ha = np.asarray([d[1] for d in dims], dtype=np.int64)

    def img(i):
        return np.frombuffer(rows[i], np.uint8).reshape(ha[i], wa[i]).astype(np.int64)

    k, t = S.FRAME_SAMPLE_K, S.THUMB
    whole = pa.array(rows, type=pa.binary())
    sliced = whole.slice(2, 6)
    chunked = pa.chunked_array([whole.slice(0, 4), whole.slice(4, 6)])
    for col, idx in [(whole, range(10)), (sliced, range(2, 8)), (chunked, range(10))]:
        idx = list(idx)
        w_s, h_s = wa[idx], ha[idx]
        assert np.array_equal(
            decode.payload_row_sumsq(col),
            np.asarray([(img(i) ** 2).sum() for i in idx]),
        )
        assert np.array_equal(
            decode.payload_row_border_sums(col, w_s, h_s),
            np.asarray(
                [
                    img(i)[0].sum() + img(i)[-1].sum()
                    + img(i)[1:-1, 0].sum() + img(i)[1:-1, -1].sum()
                    for i in idx
                ]
            ),
        )

        def pool(i):
            a = img(i)
            ph, pw = a.shape[0] // 2, a.shape[1] // 2
            a = a[: ph * 2, : pw * 2]
            return ((a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]) // 4).sum()

        assert np.array_equal(
            decode.payload_row_pool_sums(col, w_s, h_s),
            np.asarray([pool(i) for i in idx]),
        )
        assert np.array_equal(
            decode.payload_row_frame_sums(col, w_s, h_s, k),
            np.asarray([img(i)[::k].sum() for i in idx]),
        )

        def thumb(i):
            a = img(i)
            ji = np.arange(t)
            return a[(ji * a.shape[0]) // t][:, (ji * a.shape[1]) // t].sum()

        assert np.array_equal(
            decode.payload_row_thumb_sums(col, w_s, h_s, t),
            np.asarray([thumb(i) for i in idx]),
        )
        hm = decode.payload_row_hist(col)
        for j, i in enumerate(idx):
            assert np.array_equal(hm[j], np.bincount(img(i).ravel(), minlength=256))


def test_payload_row_quant_sse_vs_naive():
    """payload_row_quant_sse on real corpus payloads (incl. sliced /
    multi-chunk layouts) vs a naive regenerate-and-diff loop; raw8
    rows must give exactly 0."""
    import pyarrow.parquet as pq

    from planet_data_analyzer_ray import corpus as C

    li = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    ).slice(0, 600)
    imgs = C.derive_images(li, with_bytes=True, light=True)
    col = imgs.column("bytes")
    keys = imgs.column("image_key").to_numpy(zero_copy_only=False)
    fmts = imgs.column("fmt").to_numpy(zero_copy_only=False)

    def naive(i, data):
        stored = np.frombuffer(data, np.uint8).astype(np.int64)
        orig = (np.arange(len(stored)) + int(keys[i])) % 256
        d = orig - stored
        assert (d >= 0).all() and (d <= 3).all()
        return int((d * d).sum())

    rows = col.to_pylist()
    want = np.asarray([naive(i, r) for i, r in enumerate(rows)])
    assert (want[fmts == "raw8"] == 0).all()
    assert (want[fmts == "qraw8"] > 0).all()

    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    sliced = arr.slice(7, 300)
    import pyarrow as pa

    chunked = pa.chunked_array([arr.slice(0, 100), arr.slice(100, 500)])
    for c, k, w in [
        (arr, keys, want),
        (sliced, keys[7:307], want[7:307]),
        (chunked, keys, want),
    ]:
        got = decode.payload_row_quant_sse(c, k)
        assert np.array_equal(got, w)
