"""Unit tests for the raw-task map-side hash shuffle
(stages/rawshuffle.py): split partitioning, partition co-location, and
end-to-end equivalence with Dataset.groupby().map_groups on the same
kernel."""

import numpy as np
import pyarrow as pa
import ray

from planet_data_analyzer_ray.stages.rawshuffle import (
    run_stage,
    split_blocks,
    split_by_part,
)


def _rand_table(n, seed, parts=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 50, n)),
            "v": pa.array(rng.integers(0, 1000, n)),
            "__part": pa.array(rng.integers(0, parts * 3, n)),  # exercises % n
        }
    )


def test_split_by_part_partitions_and_drops_col():
    t = _rand_table(1000, seed=1)
    parts = split_by_part(t, "__part", 7)
    assert len(parts) == 7
    assert sum(p.num_rows for p in parts) == 1000
    p_orig = t.column("__part").to_numpy()
    for i, p in enumerate(parts):
        assert p.schema.names == ["k", "v"]
        # every row of slice i came from a __part value == i (mod 7)
        mask = (p_orig % 7) == i
        expect = t.drop_columns(["__part"]).take(np.nonzero(mask)[0])
        assert p.column("k").to_pylist() == expect.column("k").to_pylist()
        assert p.column("v").to_pylist() == expect.column("v").to_pylist()


def test_split_by_part_empty_table():
    t = _rand_table(0, seed=2)
    parts = split_by_part(t, "__part", 4)
    assert len(parts) == 4
    assert all(p.num_rows == 0 and p.schema.names == ["k", "v"] for p in parts)


def test_run_stage_matches_groupby_map_groups():
    # per-partition kernel: sum v by k inside the partition; the raw
    # shuffle must co-locate every occurrence of a key (k drives __part)
    n_parts = 5

    def mk(seed):
        rng = np.random.default_rng(seed)
        k = rng.integers(0, 40, 500)
        return pa.table(
            {
                "k": pa.array(k),
                "v": pa.array(rng.integers(0, 1000, 500)),
                "__part": pa.array(k % n_parts),
            }
        )

    blocks = [mk(3), mk(4), mk(5)]

    def kernel(t):
        if t is None or t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        k = t.column("k").to_numpy()
        v = t.column("v").to_numpy()
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, v)
        return pa.table({"k": pa.array(uk), "s": pa.array(s)})

    refs = [ray.put(b) for b in blocks]
    splits = split_blocks(refs, "__part", n_parts)
    out_refs = run_stage(splits, kernel, n_parts)
    got = pa.concat_tables([t for t in ray.get(out_refs) if t.num_rows])

    ds = ray.data.from_arrow(blocks)
    want = pa.concat_tables(
        [
            t
            for t in ray.get(
                [
                    r
                    for b in ds.groupby("__part")
                    .map_groups(
                        lambda g: kernel(g.drop_columns(["__part"])),
                        batch_format="pyarrow",
                    )
                    .iter_internal_ref_bundles()
                    for r in b.block_refs
                ]
            )
            if isinstance(t, pa.Table) and t.num_rows
        ]
    )
    gd = got.to_pandas().sort_values(["k", "s"]).reset_index(drop=True)
    wd = want.to_pandas().sort_values(["k", "s"]).reset_index(drop=True)
    assert gd.equals(wd)


def test_run_stage_chained_exchange_and_empty_partitions():
    # two chained exchanges with a re-split column, including partitions
    # that receive zero rows (n_out larger than the key space)
    t = pa.table(
        {
            "k": pa.array(np.arange(100) % 3),
            "v": pa.array(np.ones(100, np.int64)),
            "__part": pa.array(np.arange(100) % 4),
        }
    )

    def stage1(tb):
        if tb is None or tb.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "__p2": pa.array([], pa.int64())}
            )
        return tb.append_column("__p2", tb.column("k"))

    def stage2(tb):
        if tb is None or tb.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        k = tb.column("k").to_numpy()
        assert len(np.unique(k)) <= 1  # co-located by k
        return pa.table(
            {"k": pa.array(k[:1]), "n": pa.array([int(tb.column("v").to_numpy().sum())])}
        )

    splits = split_blocks([ray.put(t)], "__part", 4)
    s1 = run_stage(splits, stage1, 4, split_col="__p2", n_out=8)
    out = pa.concat_tables([x for x in ray.get(run_stage(s1, stage2, 8)) if x.num_rows])
    d = dict(zip(out.column("k").to_pylist(), out.column("n").to_pylist()))
    assert d == {0: 34, 1: 33, 2: 33}
