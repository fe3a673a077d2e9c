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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/planet_ray_tiles")
    ap.add_argument("--checkpoint-out", default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # address=None honors RAY_ADDRESS (set by `ray job submit`
        # on a cluster; preset to "local" in this sandbox)
        ray.init(include_dashboard=False)

    from planet_data_analyzer_ray.pipelines.flagship import run_flagship
    from planet_data_analyzer_ray.sources import images as src
    from planet_data_analyzer_ray.stages.tiles import export_tile_manifests

    t0 = time.perf_counter()
    fl = run_flagship(args.sf_dir)
    sink = export_tile_manifests(src.images_dataset(args.sf_dir), args.out)
    report = {
        "flagship": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in fl.items()},
        "tile_sink": sink,
        "out": args.out,
    }
    if args.checkpoint_out:
        from planet_data_analyzer_ray.pipelines.checkpoint import run_checkpointed

        report["checkpoint"] = {
            k: v
            for k, v in run_checkpointed(args.sf_dir, args.checkpoint_out).items()
            if k != "lineage"
        }
    report["total_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
