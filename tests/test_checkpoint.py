"""Checkpoint/resume: injected mid-job failure, then resume skips
completed shards and the final output equals a fresh full run."""

import json
import os

import pyarrow.dataset as pads
import pytest

from planet_data_analyzer_ray.pipelines import checkpoint


def test_shard_ranges_deterministic(sf_dir):
    a = checkpoint.shard_ranges(sf_dir, 8)
    b = checkpoint.shard_ranges(sf_dir, 8)
    assert a == b
    los = [r[0] for r in a]
    assert los == sorted(los)


def test_full_run_then_idempotent_rerun(sf_dir, tmp_path):
    out = str(tmp_path / "ckpt1")
    res1 = checkpoint.run_checkpointed(sf_dir, out, num_shards=6)
    assert res1["written"] == 6 and res1["skipped"] == 0
    res2 = checkpoint.run_checkpointed(sf_dir, out, num_shards=6)
    assert res2["written"] == 0 and res2["skipped"] == 6
    assert res2["total_rows"] == res1["total_rows"]
    # lineage digests stable across runs
    assert [r["digest"] for r in res1["lineage"]] == [
        r["digest"] for r in res2["lineage"]
    ]


def test_crash_and_resume(sf_dir, tmp_path):
    out = str(tmp_path / "ckpt2")
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpoint.run_checkpointed(sf_dir, out, num_shards=6, fail_after=2)
    # resume completes the remaining shards only
    res = checkpoint.run_checkpointed(sf_dir, out, num_shards=6)
    assert res["skipped"] == 2 and res["written"] == 4

    # output equals a fresh run's output (set of image_ids)
    fresh = str(tmp_path / "ckpt3")
    checkpoint.run_checkpointed(sf_dir, fresh, num_shards=6)

    def ids(d):
        return set(
            pads.dataset(
                [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
            )
            .to_table(columns=["image_id"])
            .column("image_id")
            .to_pylist()
        )

    assert ids(out) == ids(fresh)


def test_corrupt_partition_recomputed(sf_dir, tmp_path):
    out = str(tmp_path / "ckpt4")
    checkpoint.run_checkpointed(sf_dir, out, num_shards=4)
    # truncate one part file -> lineage row count mismatch -> recompute
    lp = os.path.join(out, "part-00001.lineage.json")
    rec = json.load(open(lp))
    rec["n_rows"] += 1
    json.dump(rec, open(lp, "w"))
    res = checkpoint.run_checkpointed(sf_dir, out, num_shards=4)
    assert res["written"] == 1 and res["skipped"] == 3


def test_resume_with_different_num_shards_recomputes(sf_dir, tmp_path):
    """Changing the sharding plan invalidates every stale shard: the
    lineage's recorded key range no longer matches the new plan, so
    nothing is silently reused and the output equals a fresh run."""
    out = str(tmp_path / "ckpt5")
    res6 = checkpoint.run_checkpointed(sf_dir, out, num_shards=6)
    res8 = checkpoint.run_checkpointed(sf_dir, out, num_shards=8)
    # ranges differ between 6- and 8-shard plans -> full recompute
    assert res8["skipped"] == 0 and res8["written"] == 8
    assert res8["total_rows"] == res6["total_rows"]
    # output readable and row-complete under the new plan
    import pyarrow.dataset as pads

    files = [
        os.path.join(out, f)
        for f in sorted(os.listdir(out))
        if f.endswith(".parquet")
    ]
    n = sum(pads.dataset(f).count_rows() for f in files[-8:])
    assert n == res8["total_rows"]


def test_clean_export_partitioned_resume(sf_dir, tmp_path):
    """Key-partitioned (hive split=) sink: layout + counts match the
    cleaning pipeline, an idempotent re-run skips the write, and a
    corrupted partition forces a rewrite."""
    out = str(tmp_path / "clean")
    r1 = checkpoint.run_clean_export(sf_dir, out)
    assert not r1["skipped"]
    assert set(r1["rows_per_split"]) <= {"train", "val", "test"}
    from planet_data_analyzer_ray.pipelines.queries import q_corpus_clean

    import tests.util as u

    df = u.to_pandas(q_corpus_clean(sf_dir))
    want = df.groupby("split").size().to_dict()
    assert r1["rows_per_split"] == want
    assert sorted(os.listdir(out))[0] == "_split_manifest.json"

    r2 = checkpoint.run_clean_export(sf_dir, out)
    assert r2["skipped"] and r2["rows_per_split"] == want

    # corrupt one partition -> manifest validation fails -> rewrite
    part_dir = os.path.join(out, "split=train")
    victim = os.path.join(part_dir, sorted(os.listdir(part_dir))[0])
    os.remove(victim)
    r3 = checkpoint.run_clean_export(sf_dir, out)
    assert not r3["skipped"] and r3["rows_per_split"] == want


# --- ManifestParquetDatasink (the Dataset-API sink twin) -------------------


def test_manifest_datasink_roundtrip(tmp_path, ray_session, sf_dir):
    import glob
    import json

    import pyarrow.parquet as pq
    import ray.data

    from planet_data_analyzer_ray.sources import images as src
    from planet_data_analyzer_ray.stages.sink import ManifestParquetDatasink

    out = str(tmp_path / "sink")
    ds = src.images_dataset(sf_dir, light=True).map_batches(
        lambda b: b.select(["image_key", "sat_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    ds.write_datasink(ManifestParquetDatasink(out, key_col="image_key"))

    manifest = json.load(open(f"{out}/manifest.json"))
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == len(manifest["parts"]) > 0
    total = 0
    for f, rec in zip(files, manifest["parts"]):
        t = pq.read_table(f)
        assert t.num_rows == rec["rows"]
        # footer digest matches the manifest's and the recomputed one
        assert t.schema.metadata[b"graft_digest"].decode() == rec["digest"]
        from planet_data_analyzer_ray.stages.sink import _digest

        assert _digest(t, "image_key") == rec["digest"]
        total += t.num_rows
    assert total == manifest["num_rows"] == ds.count()


def test_shuffle_pipeline_crash_and_resume(sf_dir, tmp_path):
    """Round-5 #5: kill-and-resume for the MULTI-EXCHANGE pipeline
    (corpus_clean_chunks through run_checkpointed_shuffle) — the
    injected crash leaves 2 published buckets; the resume re-runs the
    deterministic shuffle, skips them, and every bucket part +
    full-content digest equals a fresh clean run's."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "sck1")
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpoint.run_checkpointed_shuffle(sf_dir, out, num_buckets=6, fail_after=2)
    res = checkpoint.run_checkpointed_shuffle(sf_dir, out, num_buckets=6)
    assert res["skipped"] == 2 and res["written"] == 4

    fresh = str(tmp_path / "sck2")
    res2 = checkpoint.run_checkpointed_shuffle(sf_dir, fresh, num_buckets=6)
    assert res2["written"] == 6 and res2["total_rows"] == res["total_rows"]
    assert [r["digest"] for r in res["lineage"]] == [
        r["digest"] for r in res2["lineage"]
    ]

    def content(d):
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        t = pa.concat_tables([pq.read_table(f) for f in files])
        return t.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])

    assert content(out).equals(content(fresh))


def test_fused_queries_match_with_memo_disabled(sf_dir, monkeypatch):
    """GRAFT_NO_MEMO=1 must leave every fused-family result unchanged
    (the memo is a pure execution optimization, not a semantic one)."""
    from planet_data_analyzer_ray.pipelines import queries as Q
    from planet_data_analyzer_ray.state import memo

    memo.clear()
    with_memo = Q.ALL_QUERIES["pixel_metrics_fused"](sf_dir)
    monkeypatch.setenv("GRAFT_NO_MEMO", "1")
    memo.clear()
    without = Q.ALL_QUERIES["pixel_metrics_fused"](sf_dir)
    assert with_memo.equals(without)
    memo.clear()


def test_fused_parquet_checkpoint_roundtrip(sf_dir, tmp_path, monkeypatch):
    """GRAFT_FUSED_PARQUET_DIR turns the fused pixel pass into a
    write-once parquet feature checkpoint: first build writes files +
    manifest, later sessions read them (validated by manifest), results
    identical to the in-session materialization; a corrupted manifest
    forces a rebuild."""
    import json as _json

    from planet_data_analyzer_ray.pipelines import queries as Q
    from planet_data_analyzer_ray.state import memo

    memo.clear()
    baseline = Q.ALL_QUERIES["pixel_metrics_fused"](sf_dir)

    root = str(tmp_path / "fused_ckpt")
    monkeypatch.setenv("GRAFT_FUSED_PARQUET_DIR", root)
    memo.clear()
    written = Q.ALL_QUERIES["pixel_metrics_fused"](sf_dir)
    assert written.equals(baseline)
    sub = os.path.join(root, os.path.basename(os.path.realpath(sf_dir)))
    manifest = os.path.join(sub, "_fused_manifest.json")
    assert os.path.exists(manifest)
    mtimes = sorted(
        os.path.getmtime(os.path.join(sub, f)) for f in os.listdir(sub)
    )

    # "new session": memo cleared -> must READ the checkpoint, not rewrite
    memo.clear()
    again = Q.ALL_QUERIES["pixel_metrics_fused"](sf_dir)
    assert again.equals(baseline)
    assert sorted(
        os.path.getmtime(os.path.join(sub, f)) for f in os.listdir(sub)
    ) == mtimes

    # corrupt manifest -> rebuild
    rec = _json.load(open(manifest))
    rec["n_rows"] += 1
    _json.dump(rec, open(manifest, "w"))
    memo.clear()
    rebuilt = Q.ALL_QUERIES["pixel_metrics_fused"](sf_dir)
    assert rebuilt.equals(baseline)
    assert _json.load(open(manifest))["n_rows"] == rec["n_rows"] - 1
    memo.clear()
