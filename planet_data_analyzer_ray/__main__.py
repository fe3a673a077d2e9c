"""Run any named pipeline from the CLI:

    python -m planet_data_analyzer_ray <query> [--sf-dir DIR] [--out FILE.parquet] [--limit N]
    python -m planet_data_analyzer_ray --list

Streams the pipeline; without --out prints row count + the first
``--limit`` rows, with --out writes parquet (distributed write for
Dataset results).  The analog of the reference's Streamlit query
surface (app/query.py) for batch use.
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser(prog="planet_data_analyzer_ray")
    ap.add_argument("query", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write result parquet here")
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--list", action="store_true", help="list query names")
    args = ap.parse_args()

    from .pipelines.queries import ALL_QUERIES

    if args.list or not args.query:
        for name in sorted(ALL_QUERIES):
            print(name)
        return
    if args.query not in ALL_QUERIES:
        sys.exit(f"unknown query {args.query!r} — try --list")

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)  # honors RAY_ADDRESS
    result = ALL_QUERIES[args.query](args.sf_dir)

    import pyarrow as pa
    import pyarrow.parquet as pq

    if hasattr(result, "write_parquet"):  # ray Dataset
        if args.out:
            result.write_parquet(args.out)
            print(f"wrote {args.out}")
        else:
            result = result.materialize()  # one execution for count + preview
            print(f"{result.count()} rows")
            for row in result.take(args.limit):
                print(row)
    else:  # pyarrow Table / pandas
        tab = result if isinstance(result, pa.Table) else pa.Table.from_pandas(result)
        if args.out:
            pq.write_table(tab, args.out)
            print(f"wrote {args.out}")
        else:
            print(f"{tab.num_rows} rows")
            for row in tab.slice(0, args.limit).to_pylist():
                print(row)
    ray.shutdown()


if __name__ == "__main__":
    main()
