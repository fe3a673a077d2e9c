"""Fixed-size distributed sketches — the summaries that stay constant-
size no matter the corpus (Bloom, count-min, HyperLogLog) plus the
Z-order locality index.

These are the 100-TB operators: each per-batch kernel folds its block
into a bounded integer state (a bit set, a depth x width counter grid,
a register file, a quadtree page histogram), so the exchange that
follows moves kilobytes regardless of input scale.  Every sketch here
is built from the deterministic spec mix streams, so its *estimates*
— including Bloom false positives — are reproduced bit-for-bit by the
DuckDB oracles (the same convention as the KMV / LSH estimators).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import spec


# --- Bloom filter ----------------------------------------------------------

def bloom_bits_batch(keys: np.ndarray) -> np.ndarray:
    """All K hash-bit positions (deduplicated) for a batch of build-side
    keys — the per-block partial of the Bloom build."""
    keys = keys.astype(np.int64, copy=False) % np.int64(spec.MOD)
    bits = [
        ((keys * np.int64(mult) + np.int64(salt)) % np.int64(spec.MOD))
        % np.int64(spec.BLOOM_BITS)
        for mult, salt in spec.ST_BLOOM
    ]
    return np.unique(np.concatenate(bits)) if bits else np.empty(0, np.int64)


def bloom_array_from_bits(bits: np.ndarray) -> np.ndarray:
    """Dense bool membership array (BLOOM_BITS entries, 128 KiB) — the
    fixed-size broadcast object every probe task reads."""
    arr = np.zeros(spec.BLOOM_BITS, dtype=bool)
    arr[bits] = True
    return arr


def bloom_probe(keys: np.ndarray, bloom: np.ndarray) -> np.ndarray:
    """True where ALL K hash bits of a probe key are set."""
    keys = keys.astype(np.int64, copy=False) % np.int64(spec.MOD)
    ok = np.ones(len(keys), dtype=bool)
    for mult, salt in spec.ST_BLOOM:
        b = ((keys * np.int64(mult) + np.int64(salt)) % np.int64(spec.MOD)) % np.int64(
            spec.BLOOM_BITS
        )
        ok &= bloom[b]
    return ok


# --- order-free polynomial term key (CMS hash input) ----------------------

_POW31 = np.asarray(spec.CMS_POW31, dtype=np.int64)


def poly_term_keys(terms: pa.Array) -> np.ndarray:
    """Order-free polynomial byte hash per term: sum(ascii * 31^i) % MOD
    over the first CMS_KEY_CHARS chars, fully vectorized off the Arrow
    string buffers (no per-term Python).  SUM-shaped on purpose so the
    DuckDB mirror is a position join + SUM."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.frombuffer(terms.buffers()[1], dtype=np.int32)[
        terms.offset : terms.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(terms.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    flat = data[offs[0] : offs[-1]].astype(np.int64)
    # position of each byte within its term
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1] - offs[0], lens)
    w = np.where(pos < spec.CMS_KEY_CHARS, _POW31[np.minimum(pos, spec.CMS_KEY_CHARS - 1)], 0)
    contrib = flat * w  # < 256 * 2^31, sums over <=32 chars stay < 2^44
    keys = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    if nz.any():
        seg = np.add.reduceat(contrib, (offs[:-1] - offs[0])[nz])
        keys[nz] = seg % np.int64(spec.MOD)
    return keys


def cms_cells(term_keys: np.ndarray) -> list[np.ndarray]:
    """Per CMS row: the counter cell of each term key."""
    return [
        ((term_keys * np.int64(mult) + np.int64(salt)) % np.int64(spec.MOD))
        % np.int64(spec.CMS_WIDTH)
        for mult, salt in spec.ST_CMS
    ]


def cms_partial_batch(term_keys: np.ndarray, counts: np.ndarray) -> pa.Table:
    """Fold (term_key, count) rows of one batch into flattened CMS
    partial rows (packed cell = row * WIDTH + cell) — at most
    DEPTH x WIDTH rows leave the task whatever the batch size."""
    out_k, out_n = [], []
    for j, cells in enumerate(cms_cells(term_keys)):
        grid = np.bincount(cells, weights=counts, minlength=spec.CMS_WIDTH).astype(
            np.int64
        )
        nz = np.flatnonzero(grid)
        out_k.append(nz + np.int64(j * spec.CMS_WIDTH))
        out_n.append(grid[nz])
    return pa.table(
        {
            "cell": pa.array(np.concatenate(out_k) if out_k else np.empty(0, np.int64)),
            "cnt": pa.array(np.concatenate(out_n) if out_n else np.empty(0, np.int64)),
        }
    )


def cms_estimate(grid: np.ndarray, term_keys: np.ndarray) -> np.ndarray:
    """Count-min estimate per term key: min over rows of the hashed
    counter cell.  ``grid`` is the (DEPTH, WIDTH) reduced sketch."""
    est = np.full(len(term_keys), np.iinfo(np.int64).max, dtype=np.int64)
    for j, cells in enumerate(cms_cells(term_keys)):
        est = np.minimum(est, grid[j][cells])
    return est


# --- HyperLogLog -----------------------------------------------------------

def hll_value(element: np.ndarray) -> np.ndarray:
    """HLL hash of an int64 element: u = mix(e, ST_HLL), then the
    quadratic (u^2 + u) % MOD — the nonlinearity matters (see spec.py:
    an affine mix of sequential elements has non-uniform trailing
    zeros and overestimates 2x).  u^2 < 2^62 stays in int64."""
    u = (
        element.astype(np.int64) * np.int64(spec.ST_HLL[0]) + np.int64(spec.ST_HLL[1])
    ) % np.int64(spec.MOD)
    return (u * u + u) % np.int64(spec.MOD)


def hll_register_rho(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) of hashed values: register = value % m, rho =
    1 + trailing zeros of value // m, capped at HLL_RMAX (value // m ==
    0 -> RMAX).  Trailing zeros via log2 of the isolated lowest bit
    (exact for powers of two < 2^53)."""
    m = np.int64(1 << spec.HLL_REG_BITS)
    reg = values % m
    q = values // m
    low = q & -q
    tz = np.zeros(len(q), dtype=np.int64)
    nz = q > 0
    tz[nz] = np.log2(low[nz].astype(np.float64)).astype(np.int64)
    rho = np.where(nz, np.minimum(tz + 1, spec.HLL_RMAX), np.int64(spec.HLL_RMAX))
    return reg, rho


def hll_estimate(rho_by_reg: np.ndarray) -> int:
    """Exact-integer HLL estimate from one group's register file
    (length m, missing registers = 0): est = (alpha_ppm * m^2 * 2^RMAX)
    // (1e6 * sum 2^(RMAX - rho)).  Pure int, order-free."""
    m = 1 << spec.HLL_REG_BITS
    s = int(np.sum(np.int64(1) << (spec.HLL_RMAX - rho_by_reg.astype(np.int64))))
    return (spec.HLL_ALPHA_PPM * m * m * (1 << spec.HLL_RMAX)) // (1_000_000 * s)


# --- Morton / Z-order ------------------------------------------------------

def morton_codes(lon_md: np.ndarray, lat_md: np.ndarray) -> np.ndarray:
    """Z-order code of quantized centroids: MORTON_BITS per axis,
    x in even bit lanes, y in odd."""
    b = spec.MORTON_BITS
    x = (lon_md.astype(np.int64) << b) // np.int64(spec.LON_SPAN_MD)
    y = (lat_md.astype(np.int64) << b) // np.int64(spec.LAT_SPAN_MD)
    code = np.zeros(len(x), dtype=np.int64)
    for i in range(b):
        code |= (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
    return code
