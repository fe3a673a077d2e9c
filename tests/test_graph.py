"""Connected components: driver fast path vs distributed min-label
loop vs a reference union-find, on a synthetic graph that mixes
cliques, chains (worst-case diameter) and singleton pairs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from planet_data_analyzer_ray.stages import graph


def _synthetic_pairs() -> pa.Table:
    rng = []
    # clique 100..104
    for i in range(100, 105):
        for j in range(i + 1, 105):
            rng.append((i, j))
    # chain 200..208 (diameter 8 — exercises multi-round convergence
    # with pointer jumping in ~log2(8) rounds)
    for i in range(200, 208):
        rng.append((i, i + 1))
    # isolated pairs
    rng += [(300, 301), (400, 401)]
    # cross-link chain into clique via one edge (bigger component)
    rng.append((104, 200))
    a = pa.array([p[0] for p in rng], type=pa.int64())
    b = pa.array([p[1] for p in rng], type=pa.int64())
    return pa.table({"vec_a": a, "vec_b": b})


def _reference_components(tab: pa.Table) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(tab.column("vec_a").to_pylist(), tab.column("vec_b").to_pylist()):
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("threshold", [10**9, 0], ids=["driver", "distributed"])
def test_connected_components_matches_union_find(threshold):
    tab = _synthetic_pairs()
    want = _reference_components(tab)
    ds = ray.data.from_arrow(tab)
    out = graph.connected_components(
        ds, "vec_a", "vec_b", driver_threshold=threshold, num_partitions=4
    ).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got == want


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_driver_components_random_graphs(pairs):
    """Driver union pass equals reference union-find on arbitrary
    graphs (self-loops and duplicate edges included)."""
    tab = pa.table(
        {
            "vec_a": pa.array([a for a, _ in pairs], pa.int64()),
            "vec_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    want = _reference_components(tab)
    out = graph._driver_components(graph._edges_both_dirs(tab, "vec_a", "vec_b"))
    got = dict(zip(out["node"].to_pylist(), out["label"].to_pylist()))
    assert got == want


def test_pagerank_driver_vs_distributed(sf_dir):
    """Both pagerank paths (driver pass / per-iteration hash exchanges)
    are bit-identical on the sf0.001 phash pair graph and on a tiny
    hand graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.stages import graph
    from planet_data_analyzer_ray.util import collect_table

    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    et = collect_table(
        graph.pagerank(ray.data.from_arrow(empty), "a", "b", iters=3, scale=10**9),
        schema=pa.schema([("node", pa.int64()), ("rank_scaled", pa.int64())]),
    )
    assert et.num_rows == 0 and et.column_names == ["node", "rank_scaled"]

    pairs = pa.table(
        {
            "a": pa.array([1, 2, 2, 5], pa.int64()),
            "b": pa.array([2, 3, 4, 6], pa.int64()),
        }
    )

    def run(threshold):
        ds = graph.pagerank(
            ray.data.from_arrow(pairs), "a", "b",
            iters=3, scale=10**9, driver_threshold=threshold,
        )
        t = collect_table(
            ds, schema=pa.schema([("node", pa.int64()), ("rank_scaled", pa.int64())])
        )
        o = np.argsort(t.column("node").to_numpy(zero_copy_only=False))
        return (
            t.column("node").to_numpy(zero_copy_only=False)[o],
            t.column("rank_scaled").to_numpy(zero_copy_only=False)[o],
        )

    n1, r1 = run(10_000_000)
    n2, r2 = run(0)
    assert (n1 == n2).all() and (r1 == r2).all()
    # rank mass: hub node 2 (degree 3) outranks every leaf
    hub = r1[n1 == 2][0]
    assert all(hub > r1[n1 == v][0] for v in (1, 3, 4, 5, 6))

    from planet_data_analyzer_ray.pipelines.queries import _phash_pair_keys

    real = _phash_pair_keys(sf_dir)
    t1 = collect_table(graph.pagerank(real, "ka", "kb", iters=spec.PAGERANK_ITERS,
                                      scale=spec.PAGERANK_SCALE))
    t2 = collect_table(graph.pagerank(real, "ka", "kb", iters=spec.PAGERANK_ITERS,
                                      scale=spec.PAGERANK_SCALE, driver_threshold=0))
    d1 = t1.to_pandas().sort_values("node").reset_index(drop=True)
    d2 = t2.to_pandas().sort_values("node").reset_index(drop=True)
    assert d1.equals(d2)


def test_triangle_degree_paths_equivalent(sf_dir, monkeypatch):
    """image_triangles' degree attach is size-gated (broadcast below
    TRI_DEG_BROADCAST_MAX, PK lookup-joins above); both paths must
    orient identically and therefore count identically."""
    import __ray_entry__ as em
    from planet_data_analyzer_ray.pipelines import queries as Q
    from tests.util import assert_frames_match, to_pandas

    q = em.queries()["image_triangles"]
    want = to_pandas(q(sf_dir))  # broadcast path (gate = 10M)
    assert len(want) > 0
    monkeypatch.setattr(Q, "TRI_DEG_BROADCAST_MAX", 0)
    got = q(sf_dir)  # distributed lookup-join path
    assert_frames_match(got, want, name="image_triangles lookup-vs-broadcast")


def _reference_kcore(tab: pa.Table, k: int, rounds: int) -> dict[int, int]:
    """Plain-Python simultaneous peel: degree map -> drop all < k ->
    remove touched edges, up to ``rounds`` sweeps."""
    edges = set()
    for a, b in zip(tab.column("vec_a").to_pylist(), tab.column("vec_b").to_pylist()):
        edges.add((a, b))
        edges.add((b, a))
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for s, _d in edges:
            deg[s] = deg.get(s, 0) + 1
        dropped = {n for n, d in deg.items() if d < k}
        if not dropped:
            break
        edges = {(s, d) for s, d in edges if s not in dropped and d not in dropped}
    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    return deg


@pytest.mark.parametrize("threshold", [10**9, 0], ids=["driver", "distributed"])
def test_kcore_matches_reference(threshold):
    tab = _synthetic_pairs()
    want = _reference_kcore(tab, k=2, rounds=12)
    ds = ray.data.from_arrow(tab)
    out = graph.kcore(
        ds, "vec_a", "vec_b", k=2, rounds=12,
        driver_threshold=threshold, num_partitions=4,
    ).to_pandas()
    got = dict(zip(out["node"], out["core_deg"]))
    assert got == want
    # the clique survives the 2-core; the dangling chain tail peels away
    assert 100 in got and 300 not in got


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 4),
)
def test_driver_kcore_random_graphs(pairs, k):
    """Driver peel equals the reference simultaneous peel on arbitrary
    graphs (self-loops and duplicate edges included)."""
    tab = pa.table(
        {
            "vec_a": pa.array([a for a, _ in pairs], pa.int64()),
            "vec_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    both = graph._edges_both_dirs(tab, "vec_a", "vec_b")
    # dedup both-direction rows like the reference's set-of-edges does
    import numpy as _np

    s = both.column("src").to_numpy(zero_copy_only=False)
    d = both.column("dst").to_numpy(zero_copy_only=False)
    u = _np.unique(_np.stack([s, d], axis=1), axis=0)
    ded = pa.table({"src": pa.array(u[:, 0]), "dst": pa.array(u[:, 1])})
    got_tab = graph._driver_kcore(ded, k=k, rounds=12)
    got = dict(zip(got_tab.column("node").to_pylist(), got_tab.column("core_deg").to_pylist()))
    want = _reference_kcore(tab, k=k, rounds=12)
    assert got == want
