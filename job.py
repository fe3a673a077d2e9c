#!/usr/bin/env python
"""`ray job submit` entrypoint for the flagship pipeline.

On a real cluster:

    ray job submit --working-dir . -- python job.py \
        --sf-dir /data/corpus --out /data/tiles

In this sandbox (local mode), plain `python job.py` connects to the
local cluster (or auto-starts one).  The job runs the flagship spatial
join + tile assignment, writes partitioned resumable tile manifests,
and prints a one-line JSON report (the per-partition lineage lives
next to the output).
"""

from __future__ import annotations

import argparse
import json
import time


def args_validate(args) -> None:
    """F7 analog of the reference's CLI validation
    (/root/reference/api_importer/arg_parser.py:51-61): reject an end
    date before the start date and out-of-range cloud cover before any
    work starts."""
    if args.start_date and args.end_date and args.end_date < args.start_date:
        raise ValueError("The end date can not be before the start date")
    if not (0.0 <= args.cc <= 1.0):
        raise ValueError(f"cloud cover must be in [0, 1], got {args.cc}")
    if args.num_shards is not None and args.num_shards < 1:
        raise ValueError("num_shards must be >= 1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/planet_ray_tiles")
    ap.add_argument("--checkpoint-out", default=None)
    ap.add_argument("--start-date", default=None, help="filter: time_acquired >= (YYYY-MM-DD)")
    ap.add_argument("--end-date", default=None, help="filter: time_acquired <= (YYYY-MM-DD)")
    ap.add_argument("--cc", type=float, default=1.0, help="filter: cloud_cover <= cc")
    ap.add_argument("--num-shards", type=int, default=None)
    ap.add_argument(
        "--num-cpus",
        type=int,
        default=None,
        help="cap the local cluster's CPUs (scaling / resume-kill runs)",
    )
    ap.add_argument(
        "--shuffle-chunks-out",
        default=None,
        help="instead of the flagship: run the checkpointed MULTI-"
        "EXCHANGE pipeline (corpus_clean_chunks via "
        "run_checkpointed_shuffle) into this dir (round-5 resume drill)",
    )
    args = ap.parse_args()
    args_validate(args)

    import ray

    if not ray.is_initialized():
        # address=None honors RAY_ADDRESS (set by `ray job submit`
        # on a cluster; preset to "local" in this sandbox)
        if args.num_cpus:
            ray.init(
                address="local", num_cpus=args.num_cpus, include_dashboard=False
            )
        else:
            ray.init(include_dashboard=False)

    if args.shuffle_chunks_out:
        from planet_data_analyzer_ray.pipelines.checkpoint import (
            run_checkpointed_shuffle,
        )

        t0 = time.perf_counter()
        rep = run_checkpointed_shuffle(
            args.sf_dir, args.shuffle_chunks_out, num_buckets=args.num_shards or 8
        )
        rep = {k: v for k, v in rep.items() if k != "lineage"}
        rep["total_sec"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(rep))
        ray.shutdown()
        return

    from planet_data_analyzer_ray.pipelines.flagship import run_flagship
    from planet_data_analyzer_ray.sources import images as src
    from planet_data_analyzer_ray.stages.tiles import export_tile_manifests

    t0 = time.perf_counter()
    fl = run_flagship(args.sf_dir)
    sink_imgs = src.images_dataset(args.sf_dir)
    if args.start_date or args.end_date or args.cc < 1.0:
        import numpy as np
        import pyarrow as pa

        lo = np.datetime64(args.start_date or "1900-01-01", "us")
        hi = np.datetime64(args.end_date or "2999-01-01", "us")
        cc = args.cc

        def flt(batch: "pa.Table") -> "pa.Table":
            c = batch.column("cloud_cover").to_numpy(zero_copy_only=False)
            ts = batch.column("time_acquired").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((c <= cc) & (ts >= lo) & (ts <= hi)))

        sink_imgs = sink_imgs.map_batches(
            flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    sink = export_tile_manifests(sink_imgs, args.out)
    report = {
        "flagship": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in fl.items()},
        "tile_sink": sink,
        "out": args.out,
    }
    if args.checkpoint_out:
        from planet_data_analyzer_ray.pipelines.checkpoint import run_checkpointed

        report["checkpoint"] = {
            k: v
            for k, v in run_checkpointed(
                args.sf_dir, args.checkpoint_out, num_shards=args.num_shards or 8
            ).items()
            if k != "lineage"
        }
    report["total_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
