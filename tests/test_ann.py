"""ANN: approximate LSH-probe recall vs the exact brute-force baseline,
and task-retry resilience of a streaming stage."""

import numpy as np

from planet_data_analyzer_ray.pipelines import queries as Q


def test_lsh_probe_recall(sf_dir):
    exact = Q.q_ann_topk(sf_dir).to_pandas()
    approx = Q.q_ann_lsh_topk(sf_dir).to_pandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    # synthetic gaussian embeddings have no cluster structure (the
    # LSH worst case); recall rises sharply on clustered real data
    assert np.mean(recalls) >= 0.4, f"mean recall {np.mean(recalls)}"
    # approximate never invents better-than-exact similarity
    m = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (m["sim_a"] == m["sim_e"]).all()


def test_ivf_probe_recall(sf_dir):
    exact = Q.q_ann_topk(sf_dir).to_pandas()
    approx = Q.q_ann_ivf_topk(sf_dir).to_pandas()
    recalls = []
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(truth & got) / len(truth))
    # gaussian embeddings are the worst case for coarse quantizers too;
    # 8 of 32 lists probed must still recover a solid fraction
    assert np.mean(recalls) >= 0.4, f"mean recall {np.mean(recalls)}"
    m = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (m["sim_a"] == m["sim_e"]).all()


def test_task_retry_transient_failure(sf_dir, tmp_path):
    """T1 analog: a stage that fails transiently is retried by Ray and
    the pipeline still completes with the right result."""
    import pyarrow as pa
    import ray

    from planet_data_analyzer_ray.sources import images as src

    marker = tmp_path / "failed-once"

    def flaky(batch: pa.Table) -> pa.Table:
        if not marker.exists():
            marker.write_text("x")
            raise OSError("transient failure (injected)")
        return batch

    ds = src.images_dataset(sf_dir).map_batches(
        flaky,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        max_retries=3,
        retry_exceptions=[OSError],
    )
    assert ds.count() == 6000
    assert marker.exists()
