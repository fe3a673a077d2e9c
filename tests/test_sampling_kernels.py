"""Property tests for the deterministic sampling / quantile kernels:
the distributed results must equal their single-machine definitions on
arbitrary inputs and arbitrary block splits (the invariant that makes
them cluster-size-independent)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from planet_data_analyzer_ray.pipelines.queries import _topk_per_sat


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # sat
            st.integers(0, 20),       # bucket (collisions likely)
            st.integers(0, 10 ** 6),  # key
        ),
        min_size=0,
        max_size=200,
        unique_by=lambda t: t[2],
    ),
    st.integers(1, 7),
)
def test_topk_per_sat_matches_pandas(rows, k):
    sat = np.array([r[0] for r in rows], dtype=np.int64)
    bucket = np.array([r[1] for r in rows], dtype=np.int64)
    key = np.array([r[2] for r in rows], dtype=np.int64)
    got = _topk_per_sat(sat, bucket, key, k)
    df = pd.DataFrame({"sat": sat, "bucket": bucket, "key": key, "i": np.arange(len(sat))})
    want = (
        df.sort_values(["sat", "bucket", "key"], kind="stable")
        .groupby("sat")
        .head(k)["i"]
        .sort_values()
        .to_numpy()
    )
    assert np.array_equal(got, want)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(1, 9)), min_size=1, max_size=80),
    st.integers(1, 4),
)
def test_topk_split_invariance(rows, nsplit):
    """Partial top-k per block then top-k over the concatenated partials
    equals top-k over the whole input — the combiner property that makes
    q_sample_per_satellite's winners independent of block layout."""
    k = 3
    sat = np.array([r[0] % 3 for r in rows], dtype=np.int64)
    bucket = np.array([r[0] for r in rows], dtype=np.int64)
    key = np.arange(len(rows), dtype=np.int64)  # unique tiebreak

    whole = set(map(int, key[_topk_per_sat(sat, bucket, key, k)]))

    parts = np.array_split(np.arange(len(rows)), nsplit)
    surv_s, surv_b, surv_k = [], [], []
    for p in parts:
        if len(p) == 0:
            continue
        keep = _topk_per_sat(sat[p], bucket[p], key[p], k)
        surv_s.append(sat[p][keep])
        surv_b.append(bucket[p][keep])
        surv_k.append(key[p][keep])
    ss, bb, kk = map(np.concatenate, (surv_s, surv_b, surv_k))
    merged = set(map(int, kk[_topk_per_sat(ss, bb, kk, k)]))
    assert merged == whole


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=300), st.sampled_from([50, 90]))
def test_histogram_quantile_matches_duckdb(values, pct):
    """The integer-math histogram pick (1-based ceil(q*n)) equals DuckDB
    quantile_disc on arbitrary multisets — the mirror rule
    q_cloud_quantiles relies on."""
    import duckdb

    v = np.sort(np.array(values, dtype=np.int64))
    uniq, counts = np.unique(v, return_counts=True)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    target = (pct * total + 99) // 100
    got = int(uniq[np.searchsorted(cum, target)])
    want = duckdb.sql(
        f"SELECT quantile_disc(x, {pct / 100}) FROM (SELECT unnest($vals) AS x)",
        params={"vals": [int(x) for x in values]},
    ).fetchone()[0]
    assert got == int(want)


def test_kmv_estimator_error_bound(sf_dir):
    """KMV estimate stays within 4 standard errors (1/sqrt(k-2)) of the
    exact distinct count for every satellite (k=64 -> ~51% hard cap;
    observed mean ~9%)."""
    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.pipelines.queries import q_sat_distinct_days

    df = q_sat_distinct_days(sf_dir).to_pandas()
    assert len(df) > 0
    rel = (df["kmv_estimate"] - df["n_distinct_days"]).abs() / df["n_distinct_days"]
    bound = 4.0 / (spec.KMV_K - 2) ** 0.5
    assert rel.max() <= bound, f"max rel err {rel.max():.3f} > {bound:.3f}"


def test_new_kernels_empty_batch_safe():
    """Ray stages can see empty groups/blocks; every round-3 kernel must
    return a well-formed empty table rather than raising."""
    import pyarrow as pa

    from planet_data_analyzer_ray.stages import decode, text

    empty_docs = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    assert text.tfidf_tf_batch(empty_docs).num_rows == 0
    assert text.CorpusCleanDerive()(empty_docs).num_rows == 0
    e2 = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
        }
    )
    assert text.tfidf_df_attach(e2).num_rows == 0
    e3 = e2.append_column("df", pa.array([], pa.int64()))
    assert text.tfidf_topk_partition(e3, 10).num_rows == 0
    eb = pa.table(
        {
            "bytes": pa.array([], pa.binary()),
            "fmt": pa.array([], pa.string()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
        }
    )
    npx, s = decode.payload_sums(eb)
    assert len(npx) == 0 and len(s) == 0
    assert len(
        _topk_per_sat(
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64), 3
        )
    ) == 0


import pytest


@pytest.mark.parametrize("name", ["spatial_join_sample", "spatial_join_sample_weighted"])
def test_join_sample_topk_binds_at_small_sf(name, sf_dir):
    """JOIN_SAMPLE_K (512) exceeds the sf0.001 join size (~205 pairs),
    so the registered parity test keeps every pair and never exercises
    the top-k/tie-break path.  Re-run with k=16 (< join size) against
    the oracle with its LIMIT lowered to match."""
    import re

    import __ray_entry__ as em
    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.pipelines import queries as Q
    from tests.util import assert_frames_match, run_oracle

    fn = {"spatial_join_sample": Q.q_spatial_join_sample,
          "spatial_join_sample_weighted": Q.q_spatial_join_sample_weighted}[name]
    got = fn(sf_dir, k=16)
    assert got.num_rows == 16
    sql = em.oracle_sql()[name]
    sql16 = re.sub(rf"rn <= {spec.JOIN_SAMPLE_K}\b", "rn <= 16", sql)
    assert sql16 != sql
    assert_frames_match(got, run_oracle(sql16, sf_dir), name=f"{name}-k16")


def test_session3_kernels_empty_batch_safe():
    """BM25 / PMI / k-means kernels on empty blocks."""
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from planet_data_analyzer_ray.stages import ann, text

    empty_docs = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    st = text.bm25_stats_batch(empty_docs)
    assert st.num_rows >= 1  # sentinel row always present
    assert text.bm25_score_batch(empty_docs, {"spark": 1}, 10, 5.0).num_rows == 0
    assert text.pmi_totals_batch(empty_docs).num_rows == 1
    assert text.pmi_count_batch(empty_docs).num_rows == 0
    e1 = pa.table(
        {
            "kind": pa.array([], pa.int64()),
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    assert text.pmi_attach_na(e1).num_rows == 0
    e2 = e1.append_column("na", pa.array([], pa.int64()))
    assert text.pmi_score_partition(e2, 10, 9).num_rows == 0
    cents = np.zeros((4, 8), dtype=np.int64)
    ref = _ray.put(cents)
    empty_emb = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    assert ann.kmeans_partial_batch(empty_emb, ref).num_rows == 0
    assert ann.kmeans_assign_batch(empty_emb, ref).num_rows == 0
