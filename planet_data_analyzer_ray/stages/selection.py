"""Distributed exact order statistics WITHOUT a global sort.

The classic two-pass selection pattern: a global sort of 10^12 rows to
read off a handful of percentiles is an all-to-all exchange of the
whole corpus; exact selection needs only bounded histogram partials.

Pass 1 histograms the ORDER-PRESERVING uint64 image of the doubles
(sign-folded IEEE bits) into 65,536 top-16-bit buckets — bounded
partials, merged by the combiner tree, never the rows themselves.  The
cumulative histogram locates each requested rank's bucket and residual
rank.  Pass 2 collects only that bucket's values (a ~1/65k slice of the
corpus under any spread-out distribution) and reads the answer off a
local sort.  If a bucket is bigger than ``cap`` (pathologically
concentrated values), the same histogram descends 16 more bits
restricted to the bucket — at shift 0 a bucket IS one exact double, so
the recursion terminates in ≤4 passes with NO collect at all.  Every
pass is a streaming map + bounded merge: nothing corpus-sized ever
reaches the driver or the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashagg import tree_count_sum_by_key

_SIGN = np.uint64(0x8000000000000000)
_MASK16 = np.uint64(0xFFFF)


def order_key(v: np.ndarray) -> np.ndarray:
    """Monotone uint64 image of float64 (total order, no NaN): negative
    floats map to ~bits, non-negatives to bits | sign — standard float
    radix-sort transform."""
    u = v.astype(np.float64).view(np.uint64)
    return np.where(u & _SIGN != 0, ~u, u | _SIGN)


def key_to_float(m: np.ndarray) -> np.ndarray:
    """Inverse of :func:`order_key`."""
    m = np.asarray(m, dtype=np.uint64)
    u = np.where(m & _SIGN != 0, m & ~_SIGN, ~m)
    return u.view(np.float64)


def _hist(ds, col: str, shift: int, prefix: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, count) histogram of bits [shift, shift+16) of order_key,
    over rows whose bits above shift+16 equal ``prefix``."""

    def fold(b: pa.Table) -> pa.Table:
        if col not in b.column_names or b.num_rows == 0:
            return pa.table({"bk": pa.array([], type=pa.int64()), "__one": pa.array([], type=pa.int64())})
        m = order_key(b.column(col).to_numpy(zero_copy_only=False))
        if shift < 48:
            m = m[(m >> np.uint64(shift + 16)) == np.uint64(prefix)]
        bk = ((m >> np.uint64(shift)) & _MASK16).astype(np.int64)
        ub, cnt = np.unique(bk, return_counts=True)
        return pa.table({"bk": pa.array(ub), "__one": pa.array(cnt.astype(np.int64))})

    agg = tree_count_sum_by_key(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "bk",
        sum_cols=("__one",),
        count_name="__junk",
    )
    if agg.num_rows == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    bk = agg.column("bk").to_numpy(zero_copy_only=False)
    n = agg.column("__one").to_numpy(zero_copy_only=False)
    order = np.argsort(bk)
    return bk[order], n[order]


def _collect_bucket(ds, col: str, shift: int, prefix: int, bucket: int) -> np.ndarray:
    """All values in one (shift, prefix, bucket) slice, sorted."""

    def pick(b: pa.Table) -> pa.Table:
        if col not in b.column_names or b.num_rows == 0:
            return pa.table({"v": pa.array([], type=pa.float64())})
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        m = order_key(v)
        keep = ((m >> np.uint64(shift)) & _MASK16) == np.uint64(bucket)
        if shift < 48:
            keep &= (m >> np.uint64(shift + 16)) == np.uint64(prefix)
        return pa.table({"v": pa.array(v[keep])})

    from ..util import collect_table

    tab = collect_table(
        ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema([("v", pa.float64())]),
    )
    return np.sort(tab.column("v").to_numpy(zero_copy_only=False))


def quantiles_disc(ds_factory, col: str, ranks: list[int], cap: int = 1_000_000) -> list[float]:
    """Exact values at the given 1-based ranks of ``col`` ascending.

    ``ds_factory`` is a zero-arg callable returning a fresh Dataset per
    pass (each pass is an independent streaming job).  Ranks must be
    within [1, n].  Returns values aligned with ``ranks``.
    """
    out: dict[int, float] = {}
    # (shift, prefix, ranks_with_offset): ranks are residual (1-based
    # within the slice); offset tracks rows below the slice.
    pending = [(48, 0, [(r, r) for r in ranks])]
    while pending:
        shift, prefix, rk = pending.pop()
        bks, cnts = _hist(ds_factory(), col, shift, prefix)
        cum = np.concatenate(([0], np.cumsum(cnts)))
        # group the slice's residual ranks by destination bucket
        by_bucket: dict[int, list[tuple[int, int]]] = {}
        for orig, resid in rk:
            i = int(np.searchsorted(cum, resid, side="left")) - 1
            i = max(0, min(i, len(bks) - 1))
            by_bucket.setdefault(i, []).append((orig, resid - int(cum[i])))
        for i, sub in by_bucket.items():
            bkt, cnt = int(bks[i]), int(cnts[i])
            if shift == 0:
                # the bucket is one exact double: no collect needed
                val = float(key_to_float(np.array([(prefix << 16) | bkt], dtype=np.uint64))[0])
                for orig, _ in sub:
                    out[orig] = val
            elif cnt <= cap:
                vals = _collect_bucket(ds_factory(), col, shift, prefix, bkt)
                for orig, resid in sub:
                    out[orig] = float(vals[resid - 1])
            else:
                pending.append((shift - 16, (prefix << 16) | bkt, sub))
    return [out[r] for r in ranks]


def grouped_quantiles_disc(
    ds_factory,
    group_col: str,
    col: str,
    ps: tuple[int, ...],
    cap: int = 1_000_000,
) -> pa.Table:
    """Exact PERCENTILE_DISC per GROUP (bounded group cardinality) in
    TWO streaming passes for any spread-out distribution.

    Pass 1 emits (group, top-16-bit bucket, count) partials — also
    yielding each group's total count, so no separate counting pass —
    bounded by G x 65,536.  Pass 2 collects only the (group, bucket)
    slices that contain a requested rank, tagged by group, in ONE scan
    for all groups together.  A pathologically concentrated slice
    (> cap values) falls back to the single-group recursive walk of
    :func:`quantiles_disc` over a group-filtered view (+≤4 passes for
    that group only).  Returns (group, p, value) sorted by (group, p).
    """

    def fold(b: pa.Table) -> pa.Table:
        if col not in b.column_names or b.num_rows == 0:
            return pa.table(
                {
                    "g": pa.array([], type=pa.string()),
                    "bk": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        g = b.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary, dtype=object)
        m = order_key(b.column(col).to_numpy(zero_copy_only=False))
        bk = (m >> np.uint64(48)).astype(np.int64)
        pk = code * np.int64(65536) + bk
        up, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "g": pa.array(vocab[up // 65536].astype("U"), type=pa.string()),
                "bk": pa.array(up % 65536),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    from ..util import collect_table

    part = collect_table(
        ds_factory().map_batches(fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        schema=pa.schema([("g", pa.string()), ("bk", pa.int64()), ("n", pa.int64())]),
    )
    g = np.asarray(part.column("g"), dtype=object)
    bk = part.column("bk").to_numpy(zero_copy_only=False)
    n = part.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((bk, g))
    g, bk, n = g[order], bk[order], n[order]
    start = np.flatnonzero(np.r_[True, (g[1:] != g[:-1]) | (bk[1:] != bk[:-1])])
    g, bk = g[start], bk[start]
    n = np.add.reduceat(n, start)

    # per group: locate each requested rank's bucket + residual
    gstart = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    gend = np.append(gstart[1:], g.size)
    wanted: dict[tuple[str, int], list[tuple[int, int]]] = {}  # (group,bkt) -> [(p, resid)]
    fallback: list[tuple[str, int, int]] = []  # (group, p, rank) needing recursion
    answers: dict[tuple[str, int], float] = {}
    for s, e in zip(gstart, gend):
        grp = str(g[s])
        cnts = n[s:e]
        cum = np.concatenate(([0], np.cumsum(cnts)))
        total = int(cum[-1])
        for p in ps:
            rank = max(1, -(-p * total // 100))
            i = int(np.searchsorted(cum, rank, side="left")) - 1
            i = max(0, min(i, e - s - 1))
            if int(cnts[i]) <= cap:
                wanted.setdefault((grp, int(bk[s + i])), []).append((p, rank - int(cum[i])))
            else:
                fallback.append((grp, p, rank))

    if wanted:
        wantset = {(grp, bkt) for grp, bkt in wanted}

        def pick(b: pa.Table) -> pa.Table:
            if col not in b.column_names or b.num_rows == 0:
                return pa.table(
                    {"g": pa.array([], type=pa.string()), "v": pa.array([], type=pa.float64())}
                )
            gg = np.asarray(b.column(group_col), dtype=object)
            v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            bkt = (order_key(v) >> np.uint64(48)).astype(np.int64)
            keep = np.fromiter(
                ((str(a), int(c)) in wantset for a, c in zip(gg, bkt)),
                dtype=bool,
                count=len(gg),
            )
            return pa.table(
                {"g": pa.array(gg[keep].astype("U"), type=pa.string()), "v": pa.array(v[keep])}
            )

        got = collect_table(
            ds_factory().map_batches(pick, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
            schema=pa.schema([("g", pa.string()), ("v", pa.float64())]),
        )
        gg = np.asarray(got.column("g"), dtype=object)
        vv = got.column("v").to_numpy(zero_copy_only=False)
        bb = (order_key(vv) >> np.uint64(48)).astype(np.int64)
        order = np.lexsort((vv, bb, gg))
        gg, vv, bb = gg[order], vv[order], bb[order]
        sstart = np.flatnonzero(np.r_[True, (gg[1:] != gg[:-1]) | (bb[1:] != bb[:-1])])
        send = np.append(sstart[1:], gg.size)
        for s, e in zip(sstart, send):
            kk = (str(gg[s]), int(bb[s]))
            for p, resid in wanted.get(kk, ()):
                answers[(kk[0], p)] = float(vv[s + resid - 1])

    for grp, p, rank in fallback:
        def gf(grp=grp):
            def flt(b: pa.Table) -> pa.Table:
                if col not in b.column_names or b.num_rows == 0:
                    return pa.table({col: pa.array([], type=pa.float64())})
                gg = np.asarray(b.column(group_col), dtype=object)
                v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
                return pa.table({col: pa.array(v[gg == grp])})

            return ds_factory().map_batches(
                flt, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )

        answers[(grp, p)] = quantiles_disc(gf, col, [rank], cap=cap)[0]

    rows = sorted(answers.items())
    return pa.table(
        {
            group_col: pa.array([k[0] for k, _ in rows], type=pa.string()),
            "p": pa.array([k[1] for k, _ in rows], type=pa.int64()),
            "value": pa.array([v for _, v in rows], type=pa.float64()),
        }
    )
