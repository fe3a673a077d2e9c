"""table_dataset: split sizing, memo identity, and cache-bypass paths.

The round-5 read helper memoizes one MATERIALIZED block set per
(session, table, column set) and splits single-row-group files so map
stages parallelize.  These pins keep the cache from silently serving
the wrong columns, leaking across filters, or defeating the
memo-disabled bench mode.
"""

import os

import pyarrow as pa

from planet_data_analyzer_ray.sources import images as src


def test_same_column_set_returns_same_materialized_dataset(sf_dir):
    a = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    b = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    assert a is b  # memo hit: same block set, no re-read


def test_distinct_column_sets_stay_pruned(sf_dir):
    a = src.table_dataset(sf_dir, "documents", columns=["doc_id"])
    b = src.table_dataset(sf_dir, "documents", columns=["doc_id", "text"])
    assert a is not b
    assert set(a.schema().names) == {"doc_id"}
    assert set(b.schema().names) == {"doc_id", "text"}


def test_filter_path_bypasses_memo(sf_dir):
    import pyarrow.dataset as pads

    flt = pads.field("event_type").isin(["view"])
    a = src.table_dataset(sf_dir, "events", columns=["event_id"], filter=flt)
    b = src.table_dataset(sf_dir, "events", columns=["event_id"], filter=flt)
    assert a is not b  # a filter expression is not a safe memo key
    full = src.table_dataset(sf_dir, "events", columns=["event_id"])
    assert a.count() < full.count()


def test_memo_disabled_mode_rereads(sf_dir):
    os.environ["GRAFT_NO_MEMO"] = "1"
    try:
        a = src.table_dataset(sf_dir, "documents", columns=["doc_id"])
        b = src.table_dataset(sf_dir, "documents", columns=["doc_id"])
        assert a is not b
    finally:
        os.environ.pop("GRAFT_NO_MEMO", None)


def test_rows_and_values_match_plain_read(sf_dir):
    import duckdb

    t = src.table_dataset(sf_dir, "orders", columns=["o_orderkey"])
    got = sorted(
        t.to_pandas()["o_orderkey"].tolist()
    )
    want = sorted(
        duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet')"
        ).df()["o_orderkey"].tolist()
    )
    assert got == want
