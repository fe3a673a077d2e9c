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
# ann_lsh_topk graduated OUT of this set: its hyperplanes are
# deterministic module constants, so even the approximation now has a
# bit-exact SQL mirror (explicit plane-literal sign expressions).
_NO_ORACLE = {
    "dissolve_geom",        # raw WKB bytes; its geometry CONTENT is now
                            # oracle-checked via dissolve_geom_canonical
                            # (round 5: decodes the actual WKB, canonical
                            # slab re-decomposition == SQL slab sweep),
                            # plus pytest + the dissolve_geom_slabs twin
    "ann_ivf_topk",         # float-kmeans centroids; pytest checks recall
                            # (the lattice-kmeans IVF twin IS oracle-checked)
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
