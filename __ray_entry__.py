"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (spatial join + tiling) at
sf0.001; ``queries()`` exposes every implemented operator pipeline;
``oracle_sql()`` gives the DuckDB mirror for each SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from planet_data_analyzer_ray import oracle
from planet_data_analyzer_ray.pipelines import queries as Q

# non-SQL-expressible pipelines (stateful sketches / engine-native
# structures): the driver records a rows-only check for these.
_NO_ORACLE = {
    "dissolve_geom",        # union-geometry WKB output; pytest oracle
    "ann_lsh_topk",         # approximate by design; pytest checks recall
    "ann_ivf_topk",         # approximate by design; pytest checks recall
}


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: image metadata ->
    spatial join vs land cover -> per-featureclass counts."""
    return Q.q_count_per_featureclass("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(Q.ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    sql = oracle.oracle_queries()
    return {k: v for k, v in sql.items() if k not in _NO_ORACLE}
