"""T1 for ACTOR-POOL stages: a stateful map_batches actor whose process
dies mid-job (hard os._exit, not a Python exception) is restarted by Ray
and its batch re-dispatched — the pipeline completes with the exact
result.  This is the failure mode a 256-node cluster actually sees
(OOM-killed / preempted workers), distinct from the transient-exception
retry covered by test_task_retry_transient_failure."""

import os

import pyarrow as pa


def _keysum(ds) -> int:
    return ds.map_batches(
        lambda b: pa.table({"s": pa.array([int(b.column("image_key").to_pandas().sum())])}),
        batch_format="pyarrow",
        batch_size=None,
    ).sum("s")


def test_actor_pool_crash_recovery(sf_dir, tmp_path):
    from planet_data_analyzer_ray.sources import images as src
    from planet_data_analyzer_ray.stages.chaos import CrashOncePassthrough

    marker = str(tmp_path / "crashed-once")

    expected = _keysum(src.images_dataset(sf_dir, light=True))

    ds = src.images_dataset(sf_dir, light=True).map_batches(
        CrashOncePassthrough,
        fn_constructor_args=(marker,),
        concurrency=2,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
        max_restarts=4,  # forwarded to the underlying actor
        max_task_retries=4,
    )
    got = _keysum(ds)

    assert os.path.exists(marker), "the injected crash never fired"
    assert got == expected
