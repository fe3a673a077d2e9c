"""Pure-numpy geometry kernels (WKB, predicates, STRtree, cell index).

shapely / h3 / pyproj are not available in this environment, so the
engine ships its own vectorized planar-geometry kernels.  Geometry
travels between stages as WKB ``binary`` columns (SURVEY.md §7.0);
decoded coordinate arrays exist only transiently inside a batch UDF.
"""
