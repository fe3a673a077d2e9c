"""End-to-end parity: every SQL-expressible query pipeline vs its DuckDB
oracle at sf0.001 — the same comparison the driver's correctness gate
runs at sf0.01."""

import pytest

import __ray_entry__ as entrymod
from tests.util import assert_frames_match, run_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, sf_dir):
    result = QUERIES[name](sf_dir)
    expected = run_oracle(ORACLES[name], sf_dir)
    assert_frames_match(result, expected, name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, sf_dir):
    result = QUERIES[name](sf_dir)
    import tests.util as u

    df = u.to_pandas(result)
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke():
    result = entrymod.entry()
    import tests.util as u

    df = u.to_pandas(result)
    assert len(df) >= 1
