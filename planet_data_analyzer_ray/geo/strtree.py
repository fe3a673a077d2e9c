"""Packed STR (Sort-Tile-Recursive) R-tree over bounding boxes, numpy.

The engine's stand-in for the reference's GiST spatial index
(/root/reference/database/db.py:109): bulk-loaded once per actor from a
broadcast layer table (SURVEY.md §2.4 T4), then queried per batch with
vectorized bbox tests.
"""

from __future__ import annotations

import math

import numpy as np


class STRtree:
    """Bulk-loaded two-level-fanout STR tree.

    Leaves hold ``leaf_size`` geometries grouped by STR tiling (sort by
    x-center into vertical slices, then by y-center within a slice), so a
    query touches few leaves; each leaf is tested with one vectorized
    numpy comparison.
    """

    def __init__(self, x0, y0, x1, y1, leaf_size: int = 64):
        self.x0 = np.asarray(x0, dtype=np.float64)
        self.y0 = np.asarray(y0, dtype=np.float64)
        self.x1 = np.asarray(x1, dtype=np.float64)
        self.y1 = np.asarray(y1, dtype=np.float64)
        n = len(self.x0)
        self.n = n
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.leaf_bounds = np.empty((0, 4))
            self.leaf_slices: list[tuple[int, int]] = []
            return
        cx = (self.x0 + self.x1) / 2
        cy = (self.y0 + self.y1) / 2
        n_leaves = max(1, math.ceil(n / leaf_size))
        n_slices = max(1, math.ceil(math.sqrt(n_leaves)))
        per_slice = math.ceil(n / n_slices)
        by_x = np.argsort(cx, kind="stable")
        order_parts = []
        for s in range(n_slices):
            sl = by_x[s * per_slice : (s + 1) * per_slice]
            if len(sl) == 0:
                continue
            order_parts.append(sl[np.argsort(cy[sl], kind="stable")])
        self.order = np.concatenate(order_parts)
        # reorder boxes for cache-friendly leaf scans
        self.lx0 = self.x0[self.order]
        self.ly0 = self.y0[self.order]
        self.lx1 = self.x1[self.order]
        self.ly1 = self.y1[self.order]
        bounds = []
        slices = []
        for start in range(0, n, leaf_size):
            end = min(start + leaf_size, n)
            bounds.append(
                (
                    self.lx0[start:end].min(),
                    self.ly0[start:end].min(),
                    self.lx1[start:end].max(),
                    self.ly1[start:end].max(),
                )
            )
            slices.append((start, end))
        self.leaf_bounds = np.asarray(bounds)
        self.leaf_slices = slices

    def query(self, qx0: float, qy0: float, qx1: float, qy1: float) -> np.ndarray:
        """Indices (into the original arrays) of boxes overlapping the
        query box (closed intervals)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        lb = self.leaf_bounds
        leaf_hit = (
            (lb[:, 0] <= qx1) & (qx0 <= lb[:, 2]) & (lb[:, 1] <= qy1) & (qy0 <= lb[:, 3])
        )
        out = []
        for li in np.nonzero(leaf_hit)[0]:
            s, e = self.leaf_slices[li]
            m = (
                (self.lx0[s:e] <= qx1)
                & (qx0 <= self.lx1[s:e])
                & (self.ly0[s:e] <= qy1)
                & (qy0 <= self.ly1[s:e])
            )
            if m.any():
                out.append(self.order[s:e][m])
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)

    def query_batch(self, qx0, qy0, qx1, qy1) -> tuple[np.ndarray, np.ndarray]:
        """Query many boxes at once; returns (query_idx, tree_idx)
        candidate pairs.

        Vectorized at the *leaf* level: one (n_queries x n_leaves) bounds
        matrix selects (query, leaf) hits, then each touched leaf tests
        all its queries against its boxes in one numpy comparison — the
        Python loop is per leaf, never per query or per box.
        """
        nq = len(qx0)
        if self.n == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        qx0 = np.asarray(qx0, dtype=np.float64)
        qy0 = np.asarray(qy0, dtype=np.float64)
        qx1 = np.asarray(qx1, dtype=np.float64)
        qy1 = np.asarray(qy1, dtype=np.float64)
        # bound the (nq x nleaves) hit matrix to ~32MB: chunk large
        # query batches (keeps temporaries cache/heap-friendly)
        max_q = max(64, 32_000_000 // max(1, len(self.leaf_bounds)))
        if nq > max_q:
            qi_all, ti_all = [], []
            for s in range(0, nq, max_q):
                qi, ti = self.query_batch(
                    qx0[s : s + max_q],
                    qy0[s : s + max_q],
                    qx1[s : s + max_q],
                    qy1[s : s + max_q],
                )
                qi_all.append(qi + s)
                ti_all.append(ti)
            return np.concatenate(qi_all), np.concatenate(ti_all)
        lb = self.leaf_bounds
        # (nq, nleaves) leaf-hit matrix
        hit = (
            (lb[None, :, 0] <= qx1[:, None])
            & (qx0[:, None] <= lb[None, :, 2])
            & (lb[None, :, 1] <= qy1[:, None])
            & (qy0[:, None] <= lb[None, :, 3])
        )
        qi_parts = []
        ti_parts = []
        for li in np.nonzero(hit.any(axis=0))[0]:
            qs = np.nonzero(hit[:, li])[0]
            s, e = self.leaf_slices[li]
            m = (
                (self.lx0[None, s:e] <= qx1[qs, None])
                & (qx0[qs, None] <= self.lx1[None, s:e])
                & (self.ly0[None, s:e] <= qy1[qs, None])
                & (qy0[qs, None] <= self.ly1[None, s:e])
            )
            qq, tt = np.nonzero(m)
            if len(qq):
                qi_parts.append(qs[qq])
                ti_parts.append(self.order[s:e][tt])
        if not qi_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(qi_parts), np.concatenate(ti_parts)
