"""Guardrails on the driver contract (__ray_entry__)."""

import pathlib
import re

import __ray_entry__ as em


def test_every_query_is_oracle_checked_or_declared_rows_only():
    qs = set(em.queries())
    oracles = set(em.oracle_sql())
    assert oracles <= qs, f"oracle without query: {oracles - qs}"
    missing = qs - oracles - em._NO_ORACLE
    assert not missing, f"queries neither oracle-checked nor declared rows-only: {missing}"
    stale = em._NO_ORACLE - qs
    assert not stale, f"_NO_ORACLE names unknown queries: {stale}"


def test_library_never_calls_ray_init():
    """The driver owns the Ray session; the library and entry module
    must not call ray.init()/ray.shutdown() (driver contract)."""
    root = pathlib.Path(__file__).resolve().parents[1]
    offenders = []
    files = list((root / "planet_data_analyzer_ray").rglob("*.py"))
    files.append(root / "__ray_entry__.py")
    # __main__.py is a CLI entry point — those own their Ray session
    # (driver contract: "only bench.py, your CLI entry points and the
    # test fixture own a Ray session"), like job.py at the repo root
    files = [f for f in files if f.name != "__main__.py"]
    for f in files:
        src = f.read_text()
        if re.search(r"^\s*ray\.(init|shutdown)\(", src, re.M):
            offenders.append(str(f))
    assert not offenders, offenders


def test_entry_schema_stable():
    a = em.entry().to_pandas()
    b = em.entry().to_pandas()
    assert list(a.columns) == list(b.columns)
    assert len(a) >= 1
    assert a.sort_values(list(a.columns)).reset_index(drop=True).equals(
        b.sort_values(list(b.columns)).reset_index(drop=True)
    )


def test_oracle_sql_strings_reference_known_tables():
    known = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in em.oracle_sql().items():
        # `(?<!DISTINCT )` skips the comparison operator `IS [NOT]
        # DISTINCT FROM expr`, which is not a table reference
        froms = set(re.findall(r"(?<!DISTINCT )FROM\s+([a-z_][a-z0-9_]*)", sql))
        unknown = {
            t for t in froms
            if t in known or t.islower()
        } - known
        # every bare lowercase FROM target must be a known base table or
        # a CTE defined inside the same statement
        ctes = set(
            re.findall(
                r"([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\([^)]*\))?\s+AS\s*(?:MATERIALIZED\s*)?\(",
                sql,
            )
        )
        leftover = {t for t in unknown if t not in ctes and t not in {"ps", "bits", "cum", "c"}}
        leftover = {t for t in leftover if t not in {x.lower() for x in ctes}}
        assert not leftover, f"{name}: unknown FROM targets {leftover}"
