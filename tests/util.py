"""Test helpers: normalize results + order-insensitive comparison, the
same way the driver's correctness gate does (sort columns by name, sort
rows, compare values)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    # ray Dataset
    return result.to_pandas()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def assert_frames_match(ray_result, oracle_df: pd.DataFrame, name: str = "") -> None:
    a = normalize(to_pandas(ray_result))
    b = normalize(oracle_df)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns differ: {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row counts differ: {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)
