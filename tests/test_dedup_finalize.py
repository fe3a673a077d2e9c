"""Both paths of the size-gated dedup-arc finalizers are exact: the
broadcast path (label map collected + ray.put, the sandbox-scale
default) and the hash-exchange path (corpus co-partitioned with the
label table, the 100-TB path) must produce identical results for
images_dedup_near, docs_dedup_near, and phash_cluster_canonical."""

import numpy as np
import pyarrow as pa
import pytest

from planet_data_analyzer_ray.stages import dedup_finalize as dfz

from tests.util import assert_frames_match, to_pandas


@pytest.mark.parametrize(
    "qname",
    ["images_dedup_near", "docs_dedup_near", "phash_cluster_canonical"],
)
def test_finalizer_paths_equivalent(qname, sf_dir, monkeypatch):
    import __ray_entry__ as em

    q = em.queries()[qname]
    want = to_pandas(q(sf_dir))  # broadcast path (gate = 10M)
    assert len(want) > 0
    monkeypatch.setattr(dfz, "DRIVER_THRESHOLD", 0)
    got = q(sf_dir)  # distributed hash-exchange path
    assert_frames_match(got, want, name=f"{qname} distributed-vs-broadcast")


def test_anti_join_keys_unit():
    """anti_join_keys drops exactly the drop-set keys and carries int64
    payloads through the exchange untouched."""
    import ray.data as rd

    keys = np.arange(1000, dtype=np.int64)
    stream = rd.from_arrow(
        pa.table({"k": pa.array(keys), "pay": pa.array(keys * 7)})
    )
    drop = rd.from_arrow(pa.table({"node": pa.array(keys[keys % 3 == 0])}))
    out = (
        dfz.anti_join_keys(stream, "k", ("pay",), drop, num_partitions=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    keep = keys[keys % 3 != 0]
    assert (out["k"].to_numpy() == keep).all()
    assert (out["pay"].to_numpy() == keep * 7).all()


def test_attach_labels_unit():
    """attach_labels inner-joins stream keys to the (node, label) map:
    present keys get their label, absent keys drop."""
    import ray.data as rd

    stream = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(100, dtype=np.int64))})
    )
    node = np.arange(0, 100, 2, dtype=np.int64)  # evens only
    cc = rd.from_arrow(
        pa.table({"node": pa.array(node), "label": pa.array(node // 10)})
    )
    out = (
        dfz.attach_labels(stream, "k", cc, num_partitions=8)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert (out["key"].to_numpy() == node).all()
    assert (out["label"].to_numpy() == node // 10).all()
