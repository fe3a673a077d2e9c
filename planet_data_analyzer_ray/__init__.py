"""planet_data_analyzer_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of marcleerink/planet-data-analyzer's query
and data-processing capabilities (see /root/repo/SURVEY.md) as streaming
``ray.data.Dataset`` pipelines: vectorized Arrow batch kernels, actor
pools for stateful stages (STRtree refinement, image decode), hash
shuffles on spatial cell keys, and checkpoint/resume with per-partition
lineage.  No code is ported from the reference; file:line citations in
docstrings point at the *semantics* being reproduced.
"""

__version__ = "0.1.0"
