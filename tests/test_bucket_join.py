"""bucket_join.lookup_join unit semantics + the pinned Ray 2.49
two-join deadlock repro that motivates it."""

import subprocess
import sys
import textwrap

import numpy as np
import pyarrow as pa
import pytest

from planet_data_analyzer_ray.stages.bucket_join import lookup_join


def test_lookup_join_inner_semantics():
    import ray.data as rd

    stream = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.array([1, 2, 3, 2, 9], np.int64)),
                "pay": pa.array(np.array([10, 20, 30, 21, 90], np.int64)),
            }
        )
    )
    table = rd.from_arrow(
        pa.table(
            {
                "tk": pa.array(np.array([1, 2, 3, 4], np.int64)),
                "tv": pa.array(np.array([100, 200, 300, 400], np.int64)),
            }
        )
    )
    out = (
        lookup_join(stream, "k", ("pay",), table, "tk", "tv", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "pay"])
        .reset_index(drop=True)
    )
    # k=9 has no match (inner); duplicate stream keys both resolve
    assert out["k"].tolist() == [1, 2, 2, 3]
    assert out["pay"].tolist() == [10, 20, 21, 30]
    assert out["tv"].tolist() == [100, 200, 200, 300]


def test_lookup_join_rejects_duplicate_right_keys():
    import ray.data as rd

    stream = rd.from_arrow(
        pa.table({"k": pa.array(np.array([1], np.int64)), "pay": pa.array(np.array([0], np.int64))})
    )
    dup = rd.from_arrow(
        pa.table(
            {
                "tk": pa.array(np.array([1, 1], np.int64)),
                "tv": pa.array(np.array([5, 6], np.int64)),
            }
        )
    )
    with pytest.raises(Exception):  # ray surfaces the AssertionError
        lookup_join(stream, "k", ("pay",), dup, "tk", "tv", num_partitions=1).to_pandas()


_DEADLOCK_SCRIPT = textwrap.dedent(
    """
    import sys
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False, log_to_driver=False)
    import ray.data
    sf = sys.argv[1]
    li = ray.data.read_parquet(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
    od = ray.data.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cu = ray.data.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    j1 = li.join(od, join_type="inner", num_partitions=16, on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(cu, join_type="inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",))
    print("ROWS", j2.count())
    ray.shutdown()
    """
)


def test_ray_two_join_chain_still_deadlocks(sf_dir):
    """Pinned repro for the Ray 2.49 bug that forced bucket_join: two
    chained hash-shuffle ``Dataset.join``s in one streaming plan create
    both aggregator-actor pools eagerly; with default aggregator
    resource requests the second pool cannot schedule at small CPU
    counts and the plan hangs forever (probed this round: deadlocks at
    num_cpus=4 for every sf, completes at 32; fractional
    aggregator_ray_remote_args dodge it only when num_partitions is
    tiny).  If this test ever FAILS (the subprocess finishes), the
    framework bug is fixed — native join chains can be reconsidered and
    this canary retired."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _DEADLOCK_SCRIPT, sf_dir],
            timeout=60,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return  # deadlocked as documented — workaround still required
    if proc.returncode == 0 and "ROWS" in proc.stdout:
        pytest.fail(
            "Ray's two-join chain completed — the 2.49 deadlock appears "
            "fixed; reconsider native Dataset.join chains and retire "
            "this canary (see stages/bucket_join.py docstring)"
        )
    # any other outcome is a CRASH, not the documented deadlock — fail
    # loudly instead of silently passing on an unrelated setup error
    pytest.fail(
        f"two-join canary subprocess crashed (rc={proc.returncode}) "
        f"instead of deadlocking:\n{proc.stderr[-2000:]}"
    )
