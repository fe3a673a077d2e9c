"""Text-analysis stages over the documents table (training-data ops).

Language-ID (marker-word heuristic), quality scoring (token/stopword
ratios), token counting, exact dedup (md5 content hash), document
fingerprinting (rolling hash), MinHash-LSH and SimHash near-dup.

Every kernel is vectorized over the batch's flat UTF-8 buffer (Arrow
string columns are zero-copy ``(offsets, bytes)``): tokenization uses
Arrow's RE2 kernels, shingle hashing is one FNV pass over a sliding
window view of the whole buffer, fingerprints are a powers-table
polynomial sum with ``np.add.reduceat`` per document.  No per-document
Python loops remain in any hot path (the <k-byte padded-document
fallback handles the rare short docs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec


def _utf8_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy flat UTF-8 bytes + int64 offsets of a string column.

    Returns ``(data, offsets)`` where doc *i* occupies
    ``data[offsets[i]:offsets[i+1]]``.  ``data`` is the full buffer; the
    offsets are already rebased to index into it directly.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buffers = col.buffers()
    if pa.types.is_large_string(col.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return data, offsets


def _token_lists(col) -> tuple[np.ndarray, np.ndarray, int]:
    """Arrow-vectorized ``\\S+`` tokenization: returns (flat token array
    indices into docs, nonempty-token mask source) as
    ``(parent_idx, flat_tokens, n_docs)``.  Splitting on ``\\s+`` yields
    empty edge tokens for leading/trailing whitespace; callers filter
    with ``flat_tokens != ''`` to mirror ``re.findall(r'\\S+')``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(col, pattern=r"\s+")
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    return parent, flat, len(col)


class TokenStats:
    """Token counts via one Arrow RE2 pass (count of ``\\S+`` matches)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tokens = pc.count_substring_regex(batch.column("text"), pattern=r"\S+")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
            }
        )


class TokenStatsBPE:
    """Whitespace + BPE-ish token counts in two Arrow RE2 passes.

    The BPE-ish pattern (``spec.BPE_TOKEN_PATTERN``) is an RE2-safe
    simplification of the GPT-2 pre-tokenizer (contractions,
    space-prefixed letter/digit runs, punctuation runs); Arrow and
    DuckDB both execute RE2, so the DuckDB ``regexp_extract_all``
    mirror counts identical matches."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_ws = pc.count_substring_regex(batch.column("text"), pattern=r"\S+")
        n_bpe = pc.count_substring_regex(
            batch.column("text"), pattern=spec.BPE_TOKEN_PATTERN
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pc.cast(n_ws, pa.int64()),
                "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            }
        )


class QualityScore:
    """Stopword ratio + chars/token, vectorized: Arrow regex split,
    ``is_in`` against the stopword set, ``np.bincount`` per doc."""

    def __init__(self):
        self.stop_set = pa.array(sorted(spec.STOPWORDS), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, flat, n_docs = _token_lists(batch.column("text"))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=self.stop_set).to_numpy(
            zero_copy_only=False
        )
        nt = np.bincount(parent[nonempty], minlength=n_docs)
        sc = np.bincount(parent[nonempty & is_stop], minlength=n_docs)
        keep = nt > 0  # oracle excludes empty docs
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False)[keep]
        nt = nt[keep].astype(np.int64)
        sc = sc[keep].astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_id.astype(np.int64)),
                "n_tokens": pa.array(nt),
                "stop_cnt": pa.array(sc),
                "stop_ratio": pa.array(sc / nt.astype(np.float64)),
                "chars_per_token": pa.array(n_chars / nt.astype(np.float64)),
            }
        )


class LangId:
    """Marker-word language heuristic with deterministic tie-break
    (en > de > fr > es; all-zero -> 'und'), mirroring the SQL CASE.
    Vectorized: one ``is_in`` pass per language + bincount + argmax
    (argmax returns the first maximal column = the priority order)."""

    def __init__(self):
        self.markers = [
            pa.array(sorted(spec.LANG_MARKERS[lang]), type=pa.string())
            for lang in spec.LANG_PRIORITY
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, flat, n_docs = _token_lists(batch.column("text"))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n_tok = np.bincount(parent[nonempty], minlength=n_docs)
        hits = np.empty((n_docs, len(self.markers)), dtype=np.int64)
        for j, marks in enumerate(self.markers):
            m = pc.is_in(flat, value_set=marks).to_numpy(zero_copy_only=False)
            hits[:, j] = np.bincount(parent[nonempty & m], minlength=n_docs)
        keep = n_tok > 0
        hits = hits[keep]
        langs = np.asarray(spec.LANG_PRIORITY + ["und"], dtype="U3")
        pred_idx = np.argmax(hits, axis=1)
        pred_idx[hits.max(axis=1) == 0] = len(spec.LANG_PRIORITY)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc_id.astype(np.int64)),
                "pred_lang": pa.array(langs[pred_idx], type=pa.string()),
            }
        )


def content_hash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "content_hash": pa.array(hashes, type=pa.string()),
        }
    )


def content_hash_part_batch(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
    """content_hash + a stable hash partition derived from the digest
    itself (first 16 hex chars viewed as raw uint64 — vectorized, no
    per-row Python hashing)."""
    out = content_hash_batch(batch)
    h8 = np.asarray(out.column("content_hash").to_pylist(), dtype="S8")
    part = (h8.view(np.uint64) % np.uint64(num_partitions)).astype(np.int64)
    return out.append_column("__part", pa.array(part))


def exact_dup_partition(group: pa.Table) -> pa.Table:
    """One hash partition of (doc_id, content_hash) rows: flag the lowest
    doc_id per content_hash as canonical.  Vectorized — a single lexsort
    over the partition, first-of-segment detection, no per-group calls."""
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    hashes = np.asarray(group.column("content_hash").to_pylist(), dtype="S32")
    order = np.lexsort((ids, hashes))
    sh = hashes[order]
    first = np.ones(len(sh), dtype=bool)
    first[1:] = sh[1:] != sh[:-1]
    canon = np.zeros(len(ids), dtype=np.int64)
    canon[order[first]] = 1
    return pa.table(
        {
            "doc_id": group.column("doc_id"),
            "content_hash": group.column("content_hash"),
            "is_canonical": pa.array(canon),
        }
    )


class CorpusCleanDerive:
    """Fused per-batch derive for the composed cleaning pipeline: one
    tokenization pass feeds token counts, stopword counts and language
    hits; md5 content hash and hash split ride along.  The quality gate
    runs HERE, before the dedup exchange — identical texts have
    identical quality metrics, so filtering first is exactly equivalent
    to dedup-then-filter and cuts the exchange to surviving rows only
    (no text ever shuffles)."""

    def __init__(self, num_partitions: int = 64):
        self.num_partitions = num_partitions
        self.stop_set = pa.array(sorted(spec.STOPWORDS), type=pa.string())
        self.markers = [
            pa.array(sorted(spec.LANG_MARKERS[lang]), type=pa.string())
            for lang in spec.LANG_PRIORITY
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        parent, flat, n_docs = _token_lists(batch.column("text"))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        nt = np.bincount(parent[nonempty], minlength=n_docs)
        is_stop = pc.is_in(flat, value_set=self.stop_set).to_numpy(
            zero_copy_only=False
        )
        sc = np.bincount(parent[nonempty & is_stop], minlength=n_docs)
        hits = np.empty((n_docs, len(self.markers)), dtype=np.int64)
        for j, marks in enumerate(self.markers):
            m = pc.is_in(flat, value_set=marks).to_numpy(zero_copy_only=False)
            hits[:, j] = np.bincount(parent[nonempty & m], minlength=n_docs)
        langs = np.asarray(spec.LANG_PRIORITY + ["und"], dtype="U3")
        pred_idx = np.argmax(hits, axis=1)
        pred_idx[hits.max(axis=1) == 0] = len(spec.LANG_PRIORITY)

        from .. import corpus

        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = corpus._mix(doc_id % np.int64(spec.MOD), spec.ST_SPLIT) % 100
        split_names = np.array(["test", "train", "val"], dtype="U")
        split_code = np.where(
            bucket < spec.SPLIT_TRAIN_PCT,
            1,
            np.where(bucket < spec.SPLIT_VAL_PCT, 2, 0),
        )

        keep = (nt >= spec.CLEAN_MIN_TOKENS) & (
            sc * 100 <= spec.CLEAN_MAX_STOP_PCT * nt
        )
        # only survivors are hashed — rows failing the gate never
        # become Python strings
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        texts = col.take(pa.array(np.nonzero(keep)[0])).to_pylist()
        digests = [hashlib.md5(t.encode("utf-8")).digest() for t in texts]
        h16 = np.frombuffer(b"".join(digests), dtype="S16") if digests else np.empty(
            0, dtype="S16"
        )
        part = (
            h16.view(np.uint64).reshape(-1, 2)[:, 0]
            % np.uint64(self.num_partitions)
        ).astype(np.int64) if len(h16) else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_id[keep]),
                "content_hash": pa.array(h16, type=pa.binary(16)),
                "pred_lang": pa.array(langs[pred_idx][keep], type=pa.string()),
                "n_tokens": pa.array(nt[keep].astype(np.int64)),
                "split": pa.array(split_names[split_code][keep], type=pa.string()),
                "__part": pa.array(part),
            }
        )


def corpus_clean_partition(group: pa.Table) -> pa.Table:
    """One content-hash partition: keep the min-doc_id row per hash
    (first-wins canonical), vectorized via one lexsort."""
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    hashes = np.asarray(group.column("content_hash").to_pylist(), dtype="S16")
    order = np.lexsort((ids, hashes))
    hs = hashes[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = hs[1:] != hs[:-1]
    keep = np.sort(order[first])
    return group.select(["doc_id", "pred_lang", "n_tokens", "split"]).take(
        pa.array(keep)
    )


# --- TF-IDF top terms ------------------------------------------------------
#
# Distributed shape: (1) per-batch tf over whole docs (docs are single
# rows, so in-batch (doc, term) counts are already global), term-hash
# partition; (2) per term partition: df = rows per term (tf rows are
# unique per (doc, term)), attached without any driver-side or
# broadcast term table; (3) doc-hash partition: score + top-k per doc.
# Two exchanges total, both carrying only (doc_id, term, tf[, df]).

def tfidf_tf_batch(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
    """doc batch -> unique (doc_id, term, tf) rows + term-hash partition."""
    import pandas as pd

    parent, flat, _ = _token_lists(batch.column("text"))
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tok = pa.table(
        {
            "doc_id": pa.array(doc_id[parent[ne]]),
            "term": flat.filter(pa.array(ne)),
        }
    )
    tf = tok.group_by(["doc_id", "term"]).aggregate([("term", "count")])
    h = pd.util.hash_array(tf.column("term").to_numpy(zero_copy_only=False))
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    return pa.table(
        {
            "doc_id": tf.column("doc_id"),
            "term": tf.column("term"),
            "tf": pc.cast(tf.column("term_count"), pa.int64()),
            "__tpart": pa.array(part),
        }
    )


def tfidf_df_attach(group: pa.Table, num_partitions: int = 64) -> pa.Table:
    """One term partition of tf rows -> df attached per row (rows are
    unique per (doc, term), so df(term) = row count), plus the doc-hash
    partition for the top-k exchange."""
    terms = group.column("term")
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    enc = terms.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    df = np.bincount(codes, minlength=len(enc.dictionary))
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    from ..util import hash_partition

    dpart = hash_partition(doc, num_partitions)
    return pa.table(
        {
            "doc_id": group.column("doc_id"),
            "term": terms,
            "tf": group.column("tf"),
            "df": pa.array(df[codes].astype(np.int64)),
            "__dpart": pa.array(dpart),
        }
    )


def tfidf_topk_partition(group: pa.Table, n_docs: int, k: int = 3) -> pa.Table:
    """One doc partition: score_m = floor(tf * ln(N/df) * 1e6) (integer
    floor absorbs the <=1-ulp libm difference vs the DuckDB mirror; the
    only exactly-integer score is df == N -> ln 1 = 0.0 on both sides),
    then the k best (score desc, term asc) terms per doc."""
    tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    df = group.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
    score_m = np.floor(tf * np.log(float(n_docs) / df) * 1e6).astype(np.int64)
    pdf = group.append_column("score_m", pa.array(score_m)).to_pandas()
    out = (
        pdf.sort_values(
            ["doc_id", "score_m", "term"],
            ascending=[True, False, True],
            kind="stable",
        )
        .groupby("doc_id", sort=False)
        .head(k)
    )
    return pa.Table.from_pandas(
        out[["doc_id", "term", "tf", "df", "score_m"]], preserve_index=False
    )


def exact_dup_groups(group: pa.Table) -> pa.Table:
    """Per content-hash group kernel (kept for the equivalence test;
    the pipeline uses :func:`exact_dup_partition`)."""
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    canon = np.zeros(len(ids), dtype=np.int64)
    canon[ids == ids.min()] = 1
    return pa.table(
        {
            "doc_id": group.column("doc_id"),
            "content_hash": group.column("content_hash"),
            "is_canonical": pa.array(canon),
        }
    )


# --- fingerprints / sketches ----------------------------------------------

FP_MOD = np.int64(1_000_000_007)
FP_BASE = np.int64(257)

_FP_POW = np.array([1], dtype=np.int64)


def _fp_powers(n: int) -> np.ndarray:
    """Powers table B^j mod p for j < n, grown by doubling.  Both factors
    of every product are < p ~ 1e9+7, so the int64 math is exact."""
    global _FP_POW
    while len(_FP_POW) < n:
        m = len(_FP_POW)
        step = (_FP_POW[m - 1] * FP_BASE) % FP_MOD
        _FP_POW = np.concatenate([_FP_POW, (step * _FP_POW[:m]) % FP_MOD])
    return _FP_POW


class Fingerprint:
    """Rolling polynomial hash of the whole document (mod 1e9+7).

    h(doc) = sum(byte_i * B^(L-1-i)) mod p — identical to the Horner
    recurrence, computed in one vectorized pass over the batch's flat
    byte buffer with a per-doc ``add.reduceat``.  Terms are < p so a
    per-doc partial sum stays far below int64 range."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _utf8_flat(batch.column("text"))
        base = offsets[0]
        starts = offsets[:-1] - base
        ends = offsets[1:] - base
        lengths = ends - starts
        flat = data[base : offsets[-1]].astype(np.int64)
        fps = np.zeros(len(lengths), dtype=np.int64)
        nonempty = lengths > 0
        if nonempty.any():
            pow_tab = _fp_powers(int(lengths.max()))
            exp = np.repeat(ends, lengths) - 1 - np.arange(len(flat), dtype=np.int64)
            terms = (flat * pow_tab[exp]) % FP_MOD
            sums = np.add.reduceat(terms, starts[nonempty])
            fps[nonempty] = sums % FP_MOD
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)}
        )


_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _shingle_hashes(text: str, k: int = spec.SHINGLE_K) -> np.ndarray:
    """Distinct k-char-shingle hashes of ONE doc (stable 64-bit FNV-1a).
    Kept as the short-document (< k bytes, space-padded) fallback and
    the property-test reference kernel."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    n = len(data) - k + 1
    arr = np.frombuffer(data, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    h = np.full(n, _FNV_OFF, dtype=np.uint64)
    for j in range(k):
        h = (h ^ windows[:, j].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


def _batch_shingles(
    col, k: int = spec.SHINGLE_K
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All k-shingle FNV hashes for a whole string column in ONE pass.

    Returns ``(h, w_starts, short_idx)``: ``h`` is the concatenated
    (non-unique) window hashes of every doc with >= k bytes, doc *i*'s
    windows at ``h[w_starts[i]:w_starts[i+1]]`` (empty slice for short
    docs); ``short_idx`` lists docs shorter than k bytes, which callers
    hash via the padded per-doc fallback.

    Windows are computed over the flat buffer with a strided view, then
    windows straddling a document boundary are masked out — k-1 boolean
    ops total instead of one Python call per document."""
    data, offsets = _utf8_flat(col)
    base = offsets[0]
    starts = offsets[:-1] - base
    ends = offsets[1:] - base
    lengths = ends - starts
    flat = data[base : offsets[-1]]
    n_docs = len(lengths)
    win_counts = np.maximum(lengths - k + 1, 0)
    w_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(win_counts, out=w_starts[1:])
    short_idx = np.nonzero(lengths < k)[0]
    if len(flat) < k:
        return np.empty(0, dtype=np.uint64), w_starts, short_idx
    windows = np.lib.stride_tricks.sliding_window_view(flat, k)
    h_all = np.full(len(windows), _FNV_OFF, dtype=np.uint64)
    for j in range(k):
        h_all = (h_all ^ windows[:, j].astype(np.uint64)) * _FNV_PRIME
    # valid window start positions: [start_d, end_d - k] per long-enough doc
    long_mask = lengths >= k
    delta = np.zeros(len(windows) + 1, dtype=np.int64)
    vs = starts[long_mask]
    ve = vs + win_counts[long_mask]
    np.add.at(delta, vs, 1)
    np.add.at(delta, ve, -1)
    valid = np.cumsum(delta[:-1]) > 0
    return h_all[valid], w_starts, short_idx


# 64 minhash permutations: h_i(x) = (a_i * x + b_i) mod 2^61-1
_MH_P = np.uint64((1 << 61) - 1)
_rng = np.random.RandomState(1234)
_MH_A = _rng.randint(1, 1 << 31, size=spec.MINHASH_PERMS).astype(np.uint64)
_MH_B = _rng.randint(0, 1 << 31, size=spec.MINHASH_PERMS).astype(np.uint64)

# doc-chunk size (in windows) for the signature matrix: 64 perms x
# 64k windows x 8B = 32 MB working set — sized for this host's DRAM
# wall (whole-buffer mega-passes are pathологically slow here).
_SIG_CHUNK_WINDOWS = 65536


def minhash_signature(text: str) -> np.ndarray:
    """Single-doc signature (fallback + reference kernel)."""
    sh = _shingle_hashes(text) & np.uint64((1 << 32) - 1)
    if len(sh) == 0:
        return np.zeros(spec.MINHASH_PERMS, dtype=np.uint64)
    vals = (sh[None, :] * _MH_A[:, None] + _MH_B[:, None]) % _MH_P
    return vals.min(axis=1)


def batch_minhash_signatures(col) -> np.ndarray:
    """(n_docs, MINHASH_PERMS) signature matrix for a string column.

    Duplicate shingles within a doc don't change a min, so the unique()
    step of the per-doc kernel is skipped; the doc loop collapses to
    ``minimum.reduceat`` over doc-chunked slices of the window array."""
    h, w_starts, short_idx = _batch_shingles(col)
    n_docs = len(w_starts) - 1
    sig = np.empty((n_docs, spec.MINHASH_PERMS), dtype=np.uint64)
    sh32 = h & np.uint64((1 << 32) - 1)
    lo = 0
    while lo < n_docs:
        hi = lo
        while hi < n_docs and (
            w_starts[hi + 1] - w_starts[lo] <= _SIG_CHUNK_WINDOWS or hi == lo
        ):
            hi += 1
        a, b = int(w_starts[lo]), int(w_starts[hi])
        if b > a:
            chunk = sh32[a:b]
            vals = (chunk[None, :] * _MH_A[:, None] + _MH_B[:, None]) % _MH_P
            seg = (w_starts[lo:hi] - w_starts[lo]).astype(np.int64)
            nonzero = (w_starts[lo + 1 : hi + 1] - w_starts[lo:hi]) > 0
            if nonzero.all():
                sig[lo:hi] = np.minimum.reduceat(vals, seg, axis=1).T
            else:
                idx = np.nonzero(nonzero)[0]
                mins = np.minimum.reduceat(vals, seg[idx], axis=1).T
                sig[lo + idx] = mins
        lo = hi
    for i in short_idx:
        sig[i] = minhash_signature(col[int(i)].as_py())
    return sig


def _band_keys(sig: np.ndarray) -> np.ndarray:
    """(n_docs, BANDS) int64 packed band keys: band_idx in bits 58-60,
    a 52-bit FNV mix of the band's 8 signature slots below.  Integer
    mixing replaces the per-doc md5 of the round-1 kernel; bucket
    membership (equal-chunk => equal-key) is unchanged."""
    n = sig.shape[0]
    rows_per_band = spec.MINHASH_PERMS // spec.MINHASH_BANDS
    keys = np.empty((n, spec.MINHASH_BANDS), dtype=np.int64)
    for b in range(spec.MINHASH_BANDS):
        chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        h = np.full(n, _FNV_OFF, dtype=np.uint64)
        for j in range(rows_per_band):
            v = chunk[:, j]
            h = (h ^ (v & np.uint64(0xFF))) * _FNV_PRIME
            h = (h ^ ((v >> np.uint64(8)) & np.uint64(0xFFFF))) * _FNV_PRIME
            h = (h ^ (v >> np.uint64(24))) * _FNV_PRIME
        packed = (np.uint64(b) << np.uint64(58)) | (h >> np.uint64(6))
        keys[:, b] = packed.view(np.int64)
    return keys


class MinHashLSH:
    """doc batch -> (band_key, doc_id, signature) rows for LSH banding.
    Fully vectorized: one signature matrix per batch, integer band keys,
    partition column emitted inline (no second pass)."""

    def __init__(self, num_partitions: int = 64):
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = batch_minhash_signatures(batch.column("text"))
        keys = _band_keys(sig)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n, nb = keys.shape
        band_key = keys.reshape(-1)  # row-major: doc0 b0..b7, doc1 ...
        doc_rep = np.repeat(doc_id.astype(np.int64), nb)
        sig_bytes = sig.tobytes()
        row_nbytes = spec.MINHASH_PERMS * 8
        sig_col = pa.Array.from_buffers(
            pa.binary(row_nbytes), n, [None, pa.py_buffer(sig_bytes)]
        )
        sig_rep = sig_col.take(pa.array(np.repeat(np.arange(n), nb)))
        part = (
            band_key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            >> np.uint64(32)
        ) % np.uint64(self.num_partitions)
        return pa.table(
            {
                "band_key": pa.array(band_key),
                "doc_id": pa.array(doc_rep),
                "signature": sig_rep,
                "__part": pa.array(part.astype(np.int64)),
            }
        )


# LSH buckets with more DISTINCT members than this are salt-split into
# sub-buckets (cross-sub pairs dropped, drop count logged) — the skew
# guard for hot band values at scale.  Far above any bucket the test
# corpora produce, so oracle-compared outputs are unaffected.
LSH_BUCKET_CAP = 4096


def _sig_matrix(col: pa.Array) -> np.ndarray:
    """(n, PERMS) uint64 view of a fixed-size-binary signature column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = col.buffers()[1]
    arr = np.frombuffer(buf, dtype=np.uint64)
    off = col.offset * spec.MINHASH_PERMS
    return arr[off : off + len(col) * spec.MINHASH_PERMS].reshape(
        len(col), spec.MINHASH_PERMS
    )


_MINHASH_PAIR_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("est_jaccard", pa.float64()),
    ]
)


# row-tile for the bucket pair kernel: equality counts are accumulated
# per signature COLUMN over a (tile x bucket) uint8 matrix instead of
# gathering two 512-byte signature rows per candidate pair — the naive
# triu gather moves ~c^2 KB through DRAM per bucket and was the actual
# bottleneck on dense near-dup clusters.
_PAIR_TILE_ROWS = 256


def _minhash_pairs_kernel(
    ids: np.ndarray, sigs: np.ndarray, band_idx: int
) -> pa.Table | None:
    """All (a<b) pairs of one bucket with est. jaccard >= min, emitted
    only if this band is the pair's lowest matching band.

    est_jaccard = (#equal slots)/PERMS, computed by accumulating one
    uint8 equality count matrix per band — identical values to the
    row-gather formulation, a fraction of its memory traffic."""
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    keep_mask = np.ones(len(ids), dtype=bool)
    keep_mask[1:] = ids[1:] != ids[:-1]  # a doc can land twice in a bucket
    ids, sigs = ids[keep_mask], sigs[keep_mask]
    n = len(ids)
    if n < 2:
        return None
    if n > LSH_BUCKET_CAP:
        # salt-split: deterministic sub-buckets; pairs across subs are
        # dropped (logged by the partition kernel via its return count).
        # high bits before the mod: multiply alone preserves parity for
        # even sub counts (single-parity bucket would never split)
        sub = (
            ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)
        ) % np.uint64((n + LSH_BUCKET_CAP - 1) // LSH_BUCKET_CAP)
        outs = []
        for s in np.unique(sub):
            m = sub == s
            t = _minhash_pairs_kernel(ids[m], sigs[m], band_idx)
            if t is not None:
                outs.append(t)
        return pa.concat_tables(outs) if outs else None
    rpb = spec.MINHASH_PERMS // spec.MINHASH_BANDS
    thr = int(np.ceil(spec.MINHASH_JACCARD_MIN * spec.MINHASH_PERMS))
    cols = np.ascontiguousarray(sigs.T)  # (PERMS, n): slot k is one row
    out_a, out_b, out_e = [], [], []
    for t0 in range(0, n, _PAIR_TILE_ROWS):
        t1 = min(t0 + _PAIR_TILE_ROWS, n)
        eqc = np.zeros((t1 - t0, n), dtype=np.uint8)
        prior = np.zeros((t1 - t0, n), dtype=bool)
        for b in range(spec.MINHASH_BANDS):
            bc = np.zeros((t1 - t0, n), dtype=np.uint8)
            for k in range(b * rpb, (b + 1) * rpb):
                bc += cols[k, t0:t1, None] == cols[k, None, :]
            eqc += bc
            if b < band_idx:
                prior |= bc == rpb
        mask = (eqc >= thr) & ~prior
        ii, jj = np.nonzero(mask)
        keep = jj > (t0 + ii)  # global a < b only
        ii, jj = ii[keep], jj[keep]
        if len(ii):
            out_a.append(ids[t0 + ii])
            out_b.append(ids[jj])
            out_e.append(eqc[ii, jj].astype(np.float64) / spec.MINHASH_PERMS)
    if not out_a:
        return None
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a)),
            "doc_b": pa.array(np.concatenate(out_b)),
            "est_jaccard": pa.array(np.concatenate(out_e)),
        }
    )


def minhash_partition_pairs(group: pa.Table) -> pa.Table:
    """All LSH buckets of one hash partition: sort by band_key once,
    drop singleton buckets vectorized, run the pair kernel per surviving
    bucket (phash `_phash_partition_pairs` pattern)."""
    bk = group.column("band_key").to_numpy(zero_copy_only=False)
    order = np.argsort(bk, kind="stable")
    ids_all = group.column("doc_id").to_numpy(zero_copy_only=False)[order]
    sigs_all = _sig_matrix(group.column("signature"))[order]
    bks = bk[order]
    uniq, start, counts = np.unique(bks, return_index=True, return_counts=True)
    outs = []
    for i in np.nonzero(counts > 1)[0]:
        s, c = int(start[i]), int(counts[i])
        band_idx = int(uniq[i] >> np.int64(58))
        t = _minhash_pairs_kernel(ids_all[s : s + c], sigs_all[s : s + c], band_idx)
        if t is not None and t.num_rows:
            outs.append(t)
    if not outs:
        return _MINHASH_PAIR_SCHEMA.empty_table()
    return pa.concat_tables(outs)


def minhash_bucket_pairs(group: pa.Table) -> pa.Table:
    """Single-bucket kernel (kept for tests); the pipeline partitions
    buckets and calls :func:`minhash_partition_pairs`."""
    if group.num_rows < 2:
        return _MINHASH_PAIR_SCHEMA.empty_table()
    band_idx = int(group.column("band_key")[0].as_py() >> 58)
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = _sig_matrix(group.column("signature"))
    t = _minhash_pairs_kernel(ids, sigs.copy(), band_idx)
    return t if t is not None else _MINHASH_PAIR_SCHEMA.empty_table()


class SimHash:
    """64-bit SimHash over distinct shingle hashes — batch-vectorized:
    per-doc unique via one segment-aware lexsort, then 64 bit-count
    passes with ``add.reduceat`` (bit j set iff its vote sum > 0)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        h, w_starts, short_idx = _batch_shingles(col)
        n_docs = len(w_starts) - 1
        counts = np.diff(w_starts)
        seg = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        order = np.lexsort((h, seg))
        hs, ss = h[order], seg[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        hu, su = hs[first], ss[first]  # per-doc distinct shingles
        uniq_counts = np.bincount(su, minlength=n_docs)
        out = np.zeros(n_docs, dtype=np.int64)
        nonzero = uniq_counts > 0
        if nonzero.any():
            seg_starts = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(uniq_counts, out=seg_starts[1:])
            starts_nz = seg_starts[:-1][nonzero]
            val = np.zeros(int(nonzero.sum()), dtype=np.uint64)
            n_per = uniq_counts[nonzero].astype(np.int64)
            for j in range(63):  # sign bit stays clear -> non-negative int64
                bits = ((hu >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
                cnt = np.add.reduceat(bits, starts_nz)
                vote = 2 * cnt - n_per
                val |= (vote > 0).astype(np.uint64) << np.uint64(j)
            out[nonzero] = val.astype(np.int64)
        # short docs (padded single shingle): vote of 1 shingle = its bits
        if len(short_idx):
            texts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            for i in short_idx:
                sh = _shingle_hashes(texts[int(i)].as_py())
                bits = (
                    (sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.int64)
                vote = (2 * bits - 1).sum(axis=0)
                val = np.uint64(0)
                for j in range(63):
                    if vote[j] > 0:
                        val |= np.uint64(1) << np.uint64(j)
                out[int(i)] = np.int64(val)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(out)}
        )


# --- exact n-gram Jaccard near-dup ----------------------------------------
#
# The dedup family the sketches approximate, computed EXACTLY via
# AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW'07;
# Xiao et al., WWW'08): character NGRAM_WIDTH-gram shingle sets,
# jaccard = |A∩B| / (|A|+|B|-|A∩B|).  The 8-byte ASCII window packs
# bijectively into one uint64, so the integer set semantics equal the
# DuckDB oracle's substring-set semantics exactly.
#
# Why not a plain inverted-index pair count: with a shared vocabulary
# nearly every doc pair shares SOME common-word shingle, so exact
# per-pair partial counts are Theta(sum df^2) — 216M exchanged rows at
# sf0.1 for 5k docs.  Prefix filtering orders each doc's shingles
# rarest-first (global (df, sh) order) and indexes only the first
# |d| - ceil(tau*|d|) + 1 of them; the prefix lemma guarantees every
# pair with J >= tau still collides in at least one prefix bucket,
# while common-word shingles fall out of the prefixes entirely.
# Candidates then pass a positional upper bound
#   |A∩B| <= shared_prefix + max(o_a, o_b) - 1,   o_d = ceil(tau*|d|)
# (valid because the un-counted shared elements are the TOP tail of the
# shared sequence under the global order, and that tail lives entirely
# inside ONE doc's suffix: once a shared element falls in suffix(A),
# every larger shared element does too)
# and only the survivors are verified exactly against the full shingle
# sets (broadcast CSR at test scale; doc-hash join at corpus scale).
#
# Exchange units are fixed-width integer tuples throughout; doc text
# never shuffles.  Stages: shingle-hash partition (exact global DF) ->
# doc-hash partition (rarest-first prefix emit) -> shingle-hash
# partition (candidate pairs + shared-prefix counts) -> pair-hash
# partition (bound filter + exact verify).

_NGRAM_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

_NGRAM_SHINGLE_SCHEMA = pa.schema(
    [("sh", pa.int64()), ("doc_id", pa.int64()), ("__part", pa.int64())]
)

_NGRAM_DF_SCHEMA = pa.schema(
    [("sh", pa.int64()), ("doc_id", pa.int64()), ("df", pa.int64()), ("__dpart", pa.int64())]
)

_NGRAM_PREFIX_SCHEMA = pa.schema(
    [
        ("sh", pa.int64()),
        ("doc_id", pa.int64()),
        ("sz", pa.int64()),
        ("rank", pa.int32()),
        ("__part", pa.int64()),
    ]
)

_NGRAM_CAND_SCHEMA = pa.schema(
    [
        ("pair_key", pa.int64()),
        ("meta", pa.int64()),
        ("__ppart", pa.int64()),
    ]
)

# candidate meta packing: sp(12) | min_ra(12) | min_rb(12) | sa(14) | sb(14)
# = 64 bits.  The exchange row shrinks 40 -> 24 bytes (pair_key + meta +
# part key), and BOTH aggregations collapse to one reduceat each:
# sp partials ADD in the top field only when the low 52 bits cannot
# carry (sp < 4096 asserted), and the low 52 bits aggregate by MIN —
# exact because a pair's min_ra and min_rb are achieved at the SAME
# occurrence (both docs order their shingles by the one global
# (df, sh) key, so the first shared shingle is first on both sides),
# making the lexicographic (ra, rb, sa, sb) minimum equal the
# componentwise minimum.  Width guards assert at pack time; docs with
# more than 16383 shingles need a two-word meta (split streams) —
# a documented packing assumption, not a silent cap.
_META_LOW = np.uint64((1 << 52) - 1)
_M12 = np.uint64(0xFFF)
_M14 = np.uint64(0x3FFF)


def _pack_cand_meta(
    sp: np.ndarray, ra: np.ndarray, rb: np.ndarray, sa: np.ndarray, sb: np.ndarray
) -> np.ndarray:
    if len(sp):
        assert (
            sp.max() < 4096 and ra.max() < 4096 and rb.max() < 4096
        ), "candidate meta packing: rank/sp field overflow (>= 4096)"
        assert sa.max() < 16384 and sb.max() < 16384, (
            "candidate meta packing: doc shingle-set size >= 16384 — widen "
            "meta to two words before raising NGRAM width limits"
        )
    return (
        (sp.astype(np.uint64) << np.uint64(52))
        | (ra.astype(np.uint64) << np.uint64(40))
        | (rb.astype(np.uint64) << np.uint64(28))
        | (sa.astype(np.uint64) << np.uint64(14))
        | sb.astype(np.uint64)
    ).view(np.int64)


def _unpack_cand_meta(meta: np.ndarray):
    u = meta.view(np.uint64)
    return (
        (u >> np.uint64(52)).astype(np.int64),
        ((u >> np.uint64(40)) & _M12).astype(np.int64),
        ((u >> np.uint64(28)) & _M12).astype(np.int64),
        ((u >> np.uint64(14)) & _M14).astype(np.int64),
        (u & _M14).astype(np.int64),
    )

_NGRAM_SURV_SCHEMA = pa.schema(
    [("pair_key", pa.int64()), ("sa", pa.int32()), ("sb", pa.int32())]
)

_NGRAM_OUT_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("n_inter", pa.int64()),
        ("n_union", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


class NgramShingles:
    """doc batch -> (sh, doc_id, __part): the DISTINCT uint64-packed
    character shingles of every doc, shingle-hash partition column
    emitted inline.  One vectorized pass over the batch's flat UTF-8
    buffer: W shifted OR-passes pack all windows, a searchsorted-free
    repeat maps window starts to docs, one lexsort dedups per doc."""

    def __init__(self, num_partitions: int | None = None):
        self.num_partitions = (
            spec.NGRAM_SHINGLE_PARTS if num_partitions is None else num_partitions
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _utf8_flat(batch.column("text"))
        # rebase to the column's slice: _utf8_flat returns the FULL
        # values buffer with absolute offsets, which for a sliced /
        # offset column neither starts at doc 0 nor ends at its last doc
        data = data[offsets[0] : offsets[-1]]
        offsets = offsets - offsets[0]
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = spec.NGRAM_WIDTH
        nw = len(data) - w + 1
        if nw <= 0:
            return _NGRAM_SHINGLE_SCHEMA.empty_table()
        d = data.astype(np.uint64)
        h = np.zeros(nw, dtype=np.uint64)
        for k in range(w):
            h |= d[k : k + nw] << np.uint64(8 * k)
        lens = np.diff(offsets)
        parent = np.repeat(np.arange(len(doc_id), dtype=np.int64), lens)[:nw]
        valid = np.arange(nw, dtype=np.int64) + w <= offsets[parent + 1]
        ph, hh = parent[valid], h[valid]
        order = np.lexsort((hh, ph))
        ph, hh = ph[order], hh[order]
        keep = np.ones(len(ph), dtype=bool)
        keep[1:] = (ph[1:] != ph[:-1]) | (hh[1:] != hh[:-1])
        ph, hh = ph[keep], hh[keep]
        part = ((hh * _NGRAM_GOLDEN) >> np.uint64(32)) % np.uint64(
            self.num_partitions
        )
        return pa.table(
            {
                "sh": pa.array(hh.view(np.int64)),
                "doc_id": pa.array(doc_id[ph]),
                "__part": pa.array(part.astype(np.int64)),
            }
        )


def ngram_df_attach(group: pa.Table) -> pa.Table:
    """One shingle-hash partition -> (sh, doc_id, df, __dpart): every
    occurrence of a shingle lives in exactly one partition, so its
    document frequency is exact and local; rows leave re-keyed by doc
    hash for the prefix stage."""
    sh = group.column("sh").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    if len(sh) == 0:
        return _NGRAM_DF_SCHEMA.empty_table()
    _, inv, counts = np.unique(sh, return_inverse=True, return_counts=True)
    df = counts[inv].astype(np.int64)
    dpart = (
        doc.view(np.uint64) * _NGRAM_GOLDEN >> np.uint64(32)
    ) % np.uint64(spec.NGRAM_DOC_PARTS)
    return pa.table(
        {
            "sh": pa.array(sh),
            "doc_id": pa.array(doc),
            "df": pa.array(df),
            "__dpart": pa.array(dpart.view(np.int64)),
        }
    )


def ngram_prefix_emit(group: pa.Table) -> pa.Table:
    """One doc-hash partition -> the PREFIX rows of each of its docs:
    shingles sorted by the global rarest-first (df, sh) order, first
    |d| - ceil(tau*|d|) + 1 kept (prefix lemma: any pair with
    J >= tau shares a prefix shingle).  Emits (sh, doc_id, sz, __part)
    re-keyed by shingle hash for candidate generation."""
    sh = group.column("sh").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    df = group.column("df").to_numpy(zero_copy_only=False)
    if len(sh) == 0:
        return _NGRAM_PREFIX_SCHEMA.empty_table()
    order = np.lexsort((sh, df, doc))
    doc_s, sh_s = doc[order], sh[order]
    newd = np.ones(len(doc_s), dtype=bool)
    newd[1:] = doc_s[1:] != doc_s[:-1]
    starts = np.nonzero(newd)[0]
    sizes = np.diff(np.append(starts, len(doc_s)))
    tau = spec.NGRAM_JACCARD_MIN
    plen = sizes - np.ceil(tau * sizes).astype(np.int64) + 1
    rank = np.arange(len(doc_s), dtype=np.int64) - np.repeat(starts, sizes)
    keep = rank < np.repeat(plen, sizes)
    out_sh = sh_s[keep]
    out_doc = doc_s[keep]
    out_sz = np.repeat(sizes.astype(np.int64), sizes)[keep]
    out_rank = rank[keep].astype(np.int32)  # 0-based rank in the doc's order
    part = (
        out_sh.view(np.uint64) * _NGRAM_GOLDEN >> np.uint64(32)
    ) % np.uint64(spec.NGRAM_PAIR_PARTS)
    return pa.table(
        {
            "sh": pa.array(out_sh),
            "doc_id": pa.array(out_doc),
            "sz": pa.array(out_sz),
            "rank": pa.array(out_rank),
            "__part": pa.array(part.view(np.int64)),
        }
    )


def _tau_ratio_int(tau: float):
    """``tau`` as an exact integer ratio (p, q) when the filter products
    fit int32, else None (float64 fallback).  ``Fraction(float)`` is
    exact, so ``min*q >= max*p`` decides precisely the same set as
    ``min >= tau*max`` — no epsilon, no rounding-direction risk."""
    from fractions import Fraction

    f = Fraction(tau)
    p, q = f.numerator, f.denominator
    if 0 < p and (p + q) * 32768 < 2**31:
        return int(p), int(q)
    return None


def _occ_positional_keep(ra, rb, sa, sb, tau):
    """Per-OCCURRENCE positional prune (sound): a shared shingle at
    0-based ranks (ra, rb) of docs sized (sa, sb) bounds the TRUE
    intersection by min(ra, rb) + min(sa - ra, sb - rb) — shared
    elements strictly before it occupy ranks < ra in a and < rb in b
    (both docs order shingles by the one global (df, sh) key), shared
    elements at-or-after it fit in the smaller remaining suffix.  When
    that bound is below alpha = tau*(sa+sb)/(1+tau) the pair is
    PROVABLY non-dup, so dropping this occurrence can only starve the
    downstream count/positional bounds of an already-failing pair —
    true dups have intersection >= alpha <= bound and always keep all
    their occurrences.  Cuts the candidate exchange ~2x at tau=0.5."""
    ub = np.minimum(ra, rb) + np.minimum(sa - ra, sb - rb)
    return ub >= tau * (sa + sb) / (1.0 + tau) - 1e-9


def ngram_prefix_pair_partition(group: pa.Table) -> pa.Table:
    """One shingle-hash partition of PREFIX rows -> per-pair shared-
    prefix partial counts.  Buckets are tiny under the rarest-first
    order (common shingles never reach a prefix); the size-ratio filter
    min(sz) >= tau*max(sz) is applied before pair emission.

    Buckets hotter than NGRAM_DF_CAP (mass-duplicate clusters — their
    pair output is inherently quadratic) are emitted in row tiles that
    bound transient memory, never dropped: the query is exact.

    NOTE on PPJoin index-prefix pruning (Xiao et al. 2008): a variant
    that generated pairs only from index-prefix LEFT rows was measured
    and REJECTED on this corpus — it cuts pair generation, but the
    counted co-occurrences stop being the full shared-prefix count, so
    the count bound must weaken from tail = max(ceil(tau*s))-1 to the
    band-anchored min(s - max(ip, max_r+1)), and survivors exploded
    7x (68k -> 470k at sf0.1), tripling the verify stage.  Full
    generation + the tight bound is the better trade end-to-end."""
    sh = group.column("sh").to_numpy(zero_copy_only=False)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    sz = group.column("sz").to_numpy(zero_copy_only=False)
    rk = group.column("rank").to_numpy(zero_copy_only=False)
    if len(sh) == 0:
        return _NGRAM_CAND_SCHEMA.empty_table()
    tau = spec.NGRAM_JACCARD_MIN
    order = np.lexsort((doc, sh))
    sh_s, doc_s, sz_s, rk_s = sh[order], doc[order], sz[order], rk[order]
    assert int(sz_s.max()) < 16384 and int(rk_s.max()) < 4096, (
        "candidate meta packing: rank/size field overflow — widen meta "
        "to two words before raising NGRAM width limits"
    )
    # MEMORY-LEAN pair generation: this stage is DRAM-bandwidth-bound
    # when every core of a node runs it concurrently (measured 20x
    # single-task slowdown at 32-way), so the per-PAIR working set is
    # what matters, not instruction count.  One packed (rank, size)
    # int32 word per ROW means pair filtering does ONE 4-byte gather
    # per side (instead of four 8-byte ones), index vectors are int32,
    # and the tau filters run in exact small-int arithmetic (tau = p/q
    # from Fraction(tau), so the integer comparisons decide EXACTLY the
    # same set as the float64 formulas they replace).
    w32 = (rk_s.astype(np.int32) << np.int32(14)) | sz_s.astype(np.int32)
    _M14_32 = np.int32(0x3FFF)
    pq = _tau_ratio_int(tau)
    newb = np.ones(len(sh_s), dtype=bool)
    newb[1:] = sh_s[1:] != sh_s[:-1]
    starts = np.nonzero(newb)[0]
    bounds = np.append(starts, len(sh_s))
    counts = np.diff(bounds)
    n = len(sh_s)
    # vectorized segment all-pairs over every cool bucket at once: each
    # row is the LEFT element of (bucket_size - 1 - local_idx) pairs
    c_row = np.repeat(counts, counts)
    li = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    pc = c_row - 1 - li
    hot_mask = c_row > spec.NGRAM_DF_CAP
    pc = np.where(hot_mask, 0, pc)  # hot buckets go through the tiled path
    cum = np.cumsum(pc)
    P = int(cum[-1]) if n else 0
    keys, occs = [], []

    def _filter(ii, jj):
        # docs ascend within a bucket, so doc_s[ii] < doc_s[jj]
        wa, wb = w32[ii], w32[jj]
        sa = wa & _M14_32
        sb = wb & _M14_32
        ra = wa >> np.int32(14)
        rb = wb >> np.int32(14)
        if pq is not None:
            p_, q_ = np.int32(pq[0]), np.int32(pq[1])
            # size ratio: min >= tau*max  <=>  q*min >= p*max (exact)
            ok = np.minimum(sa, sb) * q_ >= np.maximum(sa, sb) * p_
            # per-occurrence positional bound (see _occ_positional_keep):
            # ub >= tau*(sa+sb)/(1+tau)  <=>  (p+q)*ub >= p*(sa+sb)
            ub = np.minimum(ra, rb) + np.minimum(sa - ra, sb - rb)
            ok &= ub * (p_ + q_) >= (sa + sb) * p_
        else:
            ok = np.minimum(sa, sb) >= tau * np.maximum(sa, sb)
            ok &= _occ_positional_keep(ra, rb, sa, sb, tau)
        if not ok.any():
            return
        iok, jok = ii[ok], jj[ok]
        keys.append((doc_s[iok] << np.int64(32)) | doc_s[jok])
        wa, wb = wa[ok].view(np.uint32), wb[ok].view(np.uint32)
        # pack (ra, rb, sa, sb) straight from the row words — same
        # layout _pack_cand_meta produces (sp=0 in the top 12 bits)
        occs.append(
            ((wa >> np.uint32(14)).astype(np.uint64) << np.uint64(40))
            | ((wb >> np.uint32(14)).astype(np.uint64) << np.uint64(28))
            | ((wa & np.uint32(0x3FFF)).astype(np.uint64) << np.uint64(14))
            | (wb & np.uint32(0x3FFF)).astype(np.uint64)
        )

    # chunk the index construction so transient (ii, jj, ok) arrays stay
    # bounded (~CAP^2 pairs) however many near-cap buckets a partition
    # holds; a chunk boundary falls between rows, and a row's pairs
    # (itself x all later bucket rows) are generated whole with it
    _CHUNK = spec.NGRAM_DF_CAP * spec.NGRAM_DF_CAP
    r0 = 0
    while r0 < n and P:
        base = int(cum[r0 - 1]) if r0 else 0
        r1 = int(np.searchsorted(cum, base + _CHUNK)) + 1
        r1 = min(max(r1, r0 + 1), n)
        pcc = pc[r0:r1]
        Pc = int(pcc.sum())
        r0_next = r1
        if Pc:
            ii = np.repeat(np.arange(r0, r1, dtype=np.int32), pcc)
            jj = ii + np.int32(1) + (
                np.arange(Pc, dtype=np.int32)
                - np.repeat((np.cumsum(pcc, dtype=np.int64) - pcc).astype(np.int32), pcc)
            )
            _filter(ii, jj)
        r0 = r0_next
    # hot PREFIX buckets are mass-duplicate clusters (under the
    # rarest-first order common shingles never reach a prefix
    # otherwise); their pair OUTPUT is inherently quadratic, so emit in
    # row tiles that bound transient memory instead of dropping
    # candidates (this query is exact/oracle-checked)
    hot_buckets = np.nonzero(counts > spec.NGRAM_DF_CAP)[0]
    for i in hot_buckets:
        lo, hi = bounds[i], bounds[i + 1]
        c = hi - lo
        t = spec.NGRAM_DF_CAP
        for s in range(0, c, t):
            e_ = min(s + t, c)
            ii, jj = np.nonzero(np.arange(s, e_)[:, None] < np.arange(c)[None, :])
            _filter(
                (ii + (s + lo)).astype(np.int32), (jj + lo).astype(np.int32)
            )
    if len(hot_buckets):
        import logging

        logging.getLogger(__name__).warning(
            "ngram_prefix_pair_partition: %d prefix buckets over %d docs "
            "(mass-duplicate cluster) emitted in tiles",
            len(hot_buckets),
            spec.NGRAM_DF_CAP,
        )
    if not keys:
        return _NGRAM_CAND_SCHEMA.empty_table()
    allk = np.concatenate(keys) if len(keys) > 1 else keys[0]
    # one packed word per occurrence: (ra, rb, sa, sb) in the low 52
    # bits.  The per-pair MINIMUM of this word is the occurrence at the
    # locally-first shared shingle (both docs order shingles by the one
    # global (df, sh) key), which carries BOTH min ranks — one
    # minimum.reduceat replaces two reduceats + two gathers, and the
    # shared-prefix count sp rides the top 12 bits (segment length).
    occ = (np.concatenate(occs) if len(occs) > 1 else occs[0]).view(np.int64)
    korder = np.argsort(allk, kind="stable")
    allk, occ = allk[korder], occ[korder]
    segs = np.ones(len(allk), dtype=bool)
    segs[1:] = allk[1:] != allk[:-1]
    starts = np.nonzero(segs)[0]
    uniq = allk[starts]
    sp = np.diff(np.append(starts, len(allk))).astype(np.uint64)
    assert len(sp) == 0 or int(sp.max()) < 4096, (
        "candidate meta packing: shared-prefix partial >= 4096 — widen "
        "meta to two words before raising NGRAM width limits"
    )
    # occ is non-negative (top 12 bits zero), so int64 minimum ==
    # uint64 lexicographic minimum on the packed fields
    meta = (
        np.minimum.reduceat(occ, starts).view(np.uint64)
        | (sp << np.uint64(52))
    ).view(np.int64)
    # 512 reduce keys: Ray's sort-based map_groups range-partitions by
    # sampled key values, and few-valued keys skew the reduce
    ppart = (
        (uniq.view(np.uint64) * _NGRAM_GOLDEN) >> np.uint64(33)
    ) % np.uint64(512)
    return pa.table(
        {
            "pair_key": pa.array(uniq),
            "meta": pa.array(meta),
            "__ppart": pa.array(ppart.view(np.int64)),
        }
    )


def ngram_bound_filter(group: pa.Table) -> pa.Table:
    """One pair-key partition -> SURVIVING candidate pairs (pair_key,
    sa, sb rows).  Shared-prefix partials are summed per pair and the
    positional bound sp + max(o_a, o_b) - 1 >= tau*(sa+sb)/(1+tau)
    prunes the non-dups (max, not min: the un-counted shared elements
    are the top tail of the shared sequence under the global order and
    sit entirely in ONE doc's suffix, |suffix(d)| = o_d - 1).  Doc
    sizes ride the candidate rows packed in ``meta`` (constant per
    pair), so this stage needs NO per-doc size broadcast — and the
    whole per-pair reduce is ONE add.reduceat (sp partials, top 12
    bits) + ONE minimum.reduceat (the low 52 bits: the pair's
    globally-first shared shingle carries both min ranks, see the
    packing note at _pack_cand_meta)."""
    key = group.column("pair_key").to_numpy(zero_copy_only=False)
    meta = group.column("meta").to_numpy(zero_copy_only=False)
    if len(key) == 0:
        return _NGRAM_SURV_SCHEMA.empty_table()
    korder = np.argsort(key, kind="stable")
    key, meta = key[korder], meta[korder]
    segs = np.ones(len(key), dtype=bool)
    segs[1:] = key[1:] != key[:-1]
    starts = np.nonzero(segs)[0]
    uniq = key[starts]
    u = meta.view(np.uint64)
    sp_tot = np.add.reduceat((u >> np.uint64(52)).astype(np.int64), starts)
    low = (u & _META_LOW).view(np.int64)  # non-negative: int64 min OK
    _, mra, mrb, sa, sb = _unpack_cand_meta(
        np.minimum.reduceat(low, starts)
    )
    tau = spec.NGRAM_JACCARD_MIN
    alpha = tau * (sa + sb) / (1.0 + tau)
    # count bound: un-counted shared elements are the top tail of the
    # shared sequence and sit in ONE doc's suffix (max, not min)
    b_cnt = sp_tot + np.maximum(np.ceil(tau * sa), np.ceil(tau * sb)) - 1.0
    # positional bound (PPJoin): no shared element precedes the
    # earliest EMITTED one on either side (an earlier one would be in
    # the other doc's suffix, i.e. globally larger — contradiction),
    # so n_inter <= 1 + min(sa-1-min_ra, sb-1-min_rb).  This is the
    # bound with teeth for skewed-size pairs, where the count bound
    # degenerates (max(o) ~ alpha at the size-ratio limit).
    b_pos = 1.0 + np.minimum(sa - 1 - mra, sb - 1 - mrb)
    keep = (b_cnt >= alpha - 1.0) & (b_pos >= alpha - 1.0)  # 1-slack
    return pa.table(
        {
            "pair_key": pa.array(uniq[keep]),
            "sa": pa.array(sa[keep].astype(np.int32)),
            "sb": pa.array(sb[keep].astype(np.int32)),
        }
    )


class NgramPairCount:
    """One FULL shingle partition -> exact per-pair intersection
    partials for the surviving candidate pairs.

    The survivor doc->pairs map is a broadcast bounded by the candidate
    set (itself output-proportional after the count + positional
    filters); for every shingle row of a mapped doc the kernel tests
    whether the pair's other doc shares the same shingle bucket
    (vectorized packed-key searchsorted).  Intersection counting
    happens IN PLACE on the already-partitioned shingle rows: nothing
    proportional to doc content is ever re-shuffled — the only
    exchange is (pair_key, partial) rows, at most #survivors per
    partition."""

    def __init__(self, pairs: pa.Table):
        key = pairs.column("pair_key").to_numpy(zero_copy_only=False)
        a = key >> np.int64(32)
        b = key & np.int64(0xFFFFFFFF)
        # emit from the a-side doc only (counts each shared bucket once)
        doc = a
        order = np.argsort(doc, kind="stable")
        doc = doc[order]
        self.flat_pairs = key[order]
        self.flat_other = b[order]
        newd = np.ones(len(doc), dtype=bool)
        if len(doc):
            newd[1:] = doc[1:] != doc[:-1]
        starts = np.nonzero(newd)[0]
        self.doc_ids = doc[starts] if len(doc) else doc
        self.offsets = np.append(starts, len(doc)).astype(np.int64)

    def __call__(self, group: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("pair_key", pa.int64()), ("partial", pa.int64()), ("__fpart", pa.int64())]
        ).empty_table()
        if len(self.doc_ids) == 0 or group.num_rows == 0:
            return empty
        sh = group.column("sh").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sh))
        sh_s, doc_s = sh[order], doc[order]
        newb = np.ones(len(sh_s), dtype=bool)
        newb[1:] = sh_s[1:] != sh_s[:-1]
        bucket = np.cumsum(newb) - 1  # dense bucket id per row
        # presence set: (bucket << 32) | doc, ascending by construction
        present = (bucket << np.int64(32)) | doc_s
        # expand each a-side doc row to its surviving pairs
        idx = np.searchsorted(self.doc_ids, doc_s)
        idx_c = np.minimum(idx, len(self.doc_ids) - 1)
        sel = np.nonzero(self.doc_ids[idx_c] == doc_s)[0]
        if not len(sel):
            return empty
        i2 = idx_c[sel]
        cnt = self.offsets[i2 + 1] - self.offsets[i2]
        tot = int(cnt.sum())
        starts = np.repeat(self.offsets[i2], cnt)
        within = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        pos = starts + within
        qpair = self.flat_pairs[pos]
        qother = self.flat_other[pos]
        qbucket = np.repeat(bucket[sel], cnt)
        probe = (qbucket << np.int64(32)) | qother
        loc = np.searchsorted(present, probe)
        loc_c = np.minimum(loc, len(present) - 1)
        hit = present[loc_c] == probe
        if not hit.any():
            return empty
        uniq, partial = np.unique(qpair[hit], return_counts=True)
        fpart = (
            uniq.view(np.uint64) * _NGRAM_GOLDEN >> np.uint64(34)
        ) % np.uint64(64)
        return pa.table(
            {
                "pair_key": pa.array(uniq),
                "partial": pa.array(partial.astype(np.int64)),
                "__fpart": pa.array(fpart.view(np.int64)),
            }
        )


def ngram_pair_finalize(group: pa.Table, pairs: pa.Table) -> pa.Table:
    """One pair partition of intersection partials -> final verified
    (doc_a, doc_b, n_inter, n_union, jaccard) rows.  Per-pair doc
    sizes come from the survivor table (pair_key, sa, sb) — the same
    candidate-set-bounded table the verify stage broadcasts — so no
    per-doc size table ever exists."""
    if group.num_rows == 0:
        return _NGRAM_OUT_SCHEMA.empty_table()
    key = group.column("pair_key").to_numpy(zero_copy_only=False)
    partial = group.column("partial").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(key, return_inverse=True)
    inter = np.bincount(inv, weights=partial.astype(np.float64)).astype(np.int64)
    pk = pairs.column("pair_key").to_numpy(zero_copy_only=False)
    porder = np.argsort(pk, kind="stable")
    pk_s = pk[porder]
    loc = np.searchsorted(pk_s, uniq)
    sa = pairs.column("sa").to_numpy(zero_copy_only=False)[porder][loc].astype(np.int64)
    sb = pairs.column("sb").to_numpy(zero_copy_only=False)[porder][loc].astype(np.int64)
    a = uniq >> np.int64(32)
    b = uniq & np.int64(0xFFFFFFFF)
    union = (sa + sb - inter).astype(np.int64)
    jac = inter.astype(np.float64) / union.astype(np.float64)
    m = jac >= spec.NGRAM_JACCARD_MIN
    return pa.table(
        {
            "doc_a": pa.array(a[m]),
            "doc_b": pa.array(b[m]),
            "n_inter": pa.array(inter[m]),
            "n_union": pa.array(union[m]),
            "jaccard": pa.array(jac[m]),
        }
    )


# --- BM25 keyword search ----------------------------------------------------

def bm25_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-batch BM25 corpus-stat partials: one row per query term with
    the batch df (docs containing the term) and one sentinel row
    (term='') carrying (n_docs, total nonempty tokens).  Output is
    O(|Q|) per batch — the global reduce never sees corpus-sized data."""
    parent, flat, n_docs = _token_lists(batch.column("text"))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    terms, dfs = [], []
    for t in spec.BM25_QUERY_TERMS:
        hit = pc.equal(flat, t).to_numpy(zero_copy_only=False) & nonempty
        tf = np.bincount(parent[hit], minlength=n_docs)
        terms.append(t)
        dfs.append(int((tf > 0).sum()))
    terms.append("")
    dfs.append(n_docs)
    toks = [0] * len(spec.BM25_QUERY_TERMS) + [int(nonempty.sum())]
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "nd": pa.array(np.asarray(dfs, dtype=np.int64)),
            "toks": pa.array(np.asarray(toks, dtype=np.int64)),
        }
    )


def bm25_score_batch(
    batch: pa.Table, df_by_term: dict[str, int], n_docs: int, avglen: float
) -> pa.Table:
    """Score one doc batch against the broadcast (df, N, avgdl) stats and
    emit only the batch-local top-k rows (docs never split batches, so
    per-doc scores are complete here).  Per-(doc,term) contributions are
    floored to integer micros BEFORE summing, mirroring the oracle's
    expression order exactly (see oracle.py docs_bm25)."""
    parent, flat, nd = _token_lists(batch.column("text"))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dlen = np.bincount(parent[nonempty], minlength=nd).astype(np.float64)
    k1, b = spec.BM25_K1, spec.BM25_B
    score_m = np.zeros(nd, dtype=np.int64)
    n_terms = np.zeros(nd, dtype=np.int64)
    for t in spec.BM25_QUERY_TERMS:
        df = df_by_term.get(t, 0)
        if df == 0:
            continue
        hit = pc.equal(flat, t).to_numpy(zero_copy_only=False) & nonempty
        tf = np.bincount(parent[hit], minlength=nd).astype(np.float64)
        m = tf > 0
        if not m.any():
            continue
        idf = np.log((float(n_docs - df) + 0.5) / (float(df) + 0.5) + 1.0)
        denom = tf[m] + k1 * ((1.0 - b) + b * dlen[m] / avglen)
        contrib = np.floor(idf * (tf[m] * (k1 + 1.0)) / denom * 1000000.0).astype(np.int64)
        score_m[m] += contrib
        n_terms[m] += 1
    keep = n_terms > 0
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
    s, nt = score_m[keep], n_terms[keep]
    order = np.lexsort((doc_id, -s))[: spec.BM25_TOPK]
    return pa.table(
        {
            "doc_id": pa.array(doc_id[order].astype(np.int64)),
            "n_terms": pa.array(nt[order]),
            "score_m": pa.array(s[order]),
        }
    )


# --- bigram collocations (PMI) ----------------------------------------------

_PMI_PARTS = 64


def _pmi_hash_part(terms: pa.Array | pa.ChunkedArray) -> np.ndarray:
    import pandas as pd

    h = pd.util.hash_array(np.asarray(terms, dtype=object))
    return (h % np.uint64(_PMI_PARTS)).astype(np.int64)


def pmi_totals_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (token, bigram) totals — one row per batch."""
    parent, flat, _ = _token_lists(batch.column("text"))
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    pf = parent[ne]
    nbi = int((pf[:-1] == pf[1:]).sum()) if len(pf) else 0
    return pa.table(
        {
            "t": pa.array([int(ne.sum())], type=pa.int64()),
            "tb": pa.array([nbi], type=pa.int64()),
        }
    )


def pmi_count_batch(batch: pa.Table) -> pa.Table:
    """Batch combiner: unique (a, b, cnt) bigram rows (kind=2) + unique
    (term, cnt) unigram rows (kind=1, b=''), partitioned by hash(a) for
    the na-attach exchange.  Only aggregated vocab rows leave the batch."""
    parent, flat, _ = _token_lists(batch.column("text"))
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(ne))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    pf = parent[ne]
    enc = toks.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    ucnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
    adj = pf[:-1] == pf[1:] if len(pf) else np.zeros(0, dtype=bool)
    ca, cb = codes[:-1][adj], codes[1:][adj]
    pair = ca * np.int64(len(vocab)) + cb
    uniq, cnts = np.unique(pair, return_counts=True)
    pa_codes, pb_codes = uniq // len(vocab), uniq % len(vocab)
    a_terms = pc.take(vocab, pa.array(pa_codes))
    b_terms = pc.take(vocab, pa.array(pb_codes))
    uvocab_np = np.asarray(vocab, dtype=object)
    a_all = pa.array(np.concatenate([np.asarray(a_terms, dtype=object), uvocab_np]), type=pa.string())
    b_all = pa.array(
        np.concatenate([np.asarray(b_terms, dtype=object), np.full(len(vocab), "", dtype=object)]),
        type=pa.string(),
    )
    cnt_all = np.concatenate([cnts.astype(np.int64), ucnt])
    kind = np.concatenate(
        [np.full(len(uniq), 2, dtype=np.int64), np.full(len(vocab), 1, dtype=np.int64)]
    )
    return pa.table(
        {
            "kind": pa.array(kind),
            "a": a_all,
            "b": b_all,
            "cnt": pa.array(cnt_all),
            "__part": pa.array(_pmi_hash_part(a_all)),
        }
    )


def _pmi_sum_rows(kind, a, b, cnt):
    """Vectorized (kind, a, b) group-sum via one lexsort pass."""
    order = np.lexsort((b, a, kind))
    k_s, a_s, b_s, c_s = kind[order], a[order], b[order], cnt[order]
    if len(k_s) == 0:
        return k_s, a_s, b_s, c_s
    new = np.ones(len(k_s), dtype=bool)
    new[1:] = (k_s[1:] != k_s[:-1]) | (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    start = np.flatnonzero(new)
    return k_s[start], a_s[start], b_s[start], np.add.reduceat(c_s, start)


def pmi_attach_na(group: pa.Table) -> pa.Table:
    """One hash(a) partition: global (a,b) + unigram sums, then na
    attached to bigram rows; unigram rows ride on re-keyed by term for
    the hash(b) exchange."""
    kind = group.column("kind").to_numpy(zero_copy_only=False)
    a = np.asarray(group.column("a"), dtype=object)
    b = np.asarray(group.column("b"), dtype=object)
    cnt = group.column("cnt").to_numpy(zero_copy_only=False)
    kind, a, b, cnt = _pmi_sum_rows(kind, a, b, cnt)
    uni = kind == 1
    bi = kind == 2
    ua, ucnt = a[uni], cnt[uni]
    idx = np.searchsorted(ua, a[bi])
    na = ucnt[idx]
    a_out = np.concatenate([a[bi], ua])
    b_out = np.concatenate([b[bi], np.full(uni.sum(), "", dtype=object)])
    part2 = np.concatenate(
        [_pmi_hash_part(pa.array(b[bi], type=pa.string())), _pmi_hash_part(pa.array(ua, type=pa.string()))]
    ) if len(a_out) else np.zeros(0, dtype=np.int64)
    return pa.table(
        {
            "kind": pa.array(np.concatenate([np.full(bi.sum(), 2), np.full(uni.sum(), 1)]).astype(np.int64)),
            "a": pa.array(a_out, type=pa.string()),
            "b": pa.array(b_out, type=pa.string()),
            "cnt": pa.array(np.concatenate([cnt[bi], ucnt])),
            "na": pa.array(np.concatenate([na, np.zeros(uni.sum(), dtype=np.int64)])),
            "__part2": pa.array(part2),
        }
    )


def pmi_score_partition(group: pa.Table, t: int, tb: int) -> pa.Table:
    """One hash(b) partition: attach nb, score, keep the partition-local
    top-k (global top-k is a subset of the per-partition unions)."""
    kind = group.column("kind").to_numpy(zero_copy_only=False)
    a = np.asarray(group.column("a"), dtype=object)
    b = np.asarray(group.column("b"), dtype=object)
    cnt = group.column("cnt").to_numpy(zero_copy_only=False)
    na = group.column("na").to_numpy(zero_copy_only=False)
    uni = kind == 1
    # unigram rows arrive pre-summed globally (one per term from its
    # hash(a) partition); bigram rows are already global sums too.
    ua = a[uni]
    uorder = np.argsort(ua, kind="stable")
    ua_s, ucnt_s = ua[uorder], cnt[uni][uorder]
    bi = np.flatnonzero((kind == 2) & (cnt >= spec.PMI_MIN_COUNT))
    if len(bi) == 0:
        return pa.table(
            {
                "a": pa.array([], type=pa.string()),
                "b": pa.array([], type=pa.string()),
                "nab": pa.array([], type=pa.int64()),
                "pmi_m": pa.array([], type=pa.int64()),
            }
        )
    nb = ucnt_s[np.searchsorted(ua_s, b[bi])]
    nab = cnt[bi].astype(np.float64)
    naf, nbf = na[bi].astype(np.float64), nb.astype(np.float64)
    pmi = np.log((nab / float(tb)) / ((naf / float(t)) * (nbf / float(t))))
    pmi_m = np.floor(pmi * 1000000.0).astype(np.int64)
    order = np.lexsort((b[bi], a[bi], -pmi_m))[: spec.PMI_TOPK]
    sel = bi[order]
    return pa.table(
        {
            "a": pa.array(a[sel], type=pa.string()),
            "b": pa.array(b[sel], type=pa.string()),
            "nab": pa.array(cnt[sel]),
            "pmi_m": pa.array(pmi_m[order]),
        }
    )


# --- word-n-gram windows: decontamination / chunking / repetition -----------

_DECON_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])
_CHUNK_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("n_tokens", pa.int64()),
        ("chunk_text", pa.string()),
    ]
)


def _nonempty_tokens(batch: pa.Table) -> tuple[np.ndarray, pa.StringArray]:
    """(parent doc index, flat nonempty tokens) of the batch — the
    shared front half of every word-n-gram kernel."""
    parent, flat, _ = _token_lists(batch.column("text"))
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(ne))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return parent[ne], toks


def _ngram_strings(batch: pa.Table, n: int) -> tuple[np.ndarray, pa.Array]:
    """Space-joined word n-grams over each doc's nonempty-token stream,
    fully Arrow-vectorized: n shifted zero-copy slices of the flat token
    array joined element-wise (one RE2 split + one join kernel pass per
    batch, no per-document Python)."""
    pf, toks = _nonempty_tokens(batch)
    m = len(pf) - (n - 1)
    if m <= 0:
        return np.empty(0, dtype=np.int64), pa.array([], type=pa.string())
    ok = pf[:m] == pf[n - 1 :]  # window stays inside one doc
    parts = [toks.slice(j, m) for j in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    okp = pa.array(ok)
    return pf[:m][ok], joined.filter(okp)


def decon_bench_batch(batch: pa.Table) -> pa.Table:
    """Benchmark side of decontamination: the batch's distinct
    DECON_NGRAM-gram strings (deduped again across batches on the
    driver before broadcast)."""
    _, ng = _ngram_strings(batch, spec.DECON_NGRAM)
    u = pc.unique(ng)
    return pa.table({"ng": u})


def decon_probe_batch(batch: pa.Table, bench_ref) -> pa.Table:
    """Probe side: per doc, the count of DISTINCT benchmark n-grams it
    contains (docs with zero hits are dropped — they are clean).  The
    benchmark set arrives as a ray.put broadcast resolved once per
    worker; membership is one Arrow ``is_in`` hash probe per batch."""
    from ..state.broadcast import cached

    bench = cached(bench_ref, lambda x: x)
    p, ng = _ngram_strings(batch, spec.DECON_NGRAM)
    if len(p) == 0 or len(bench) == 0:
        return _DECON_OUT_SCHEMA.empty_table()
    hit = pc.is_in(ng, value_set=bench).to_numpy(zero_copy_only=False)
    ph = p[hit]
    if len(ph) == 0:
        return _DECON_OUT_SCHEMA.empty_table()
    ngh = ng.filter(pa.array(hit))
    if isinstance(ngh, pa.ChunkedArray):
        ngh = ngh.combine_chunks()
    enc = ngh.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = np.int64(max(len(enc.dictionary), 1))
    uniq_pairs = np.unique(ph * v + codes)
    n_hits = np.bincount(uniq_pairs // v, minlength=batch.num_rows).astype(np.int64)
    keep = n_hits > 0
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
    return pa.table(
        {"doc_id": pa.array(doc_id), "n_hits": pa.array(n_hits[keep])}
    )


def chunk_tokens_batch(batch: pa.Table) -> pa.Table:
    """Fixed CHUNK_TOKENS-token windows per doc (RAG/packing-style
    chunking).  Chunk boundaries become list offsets over the flat
    token array; chunk text is ONE Arrow ``binary_join`` kernel call —
    no shuffle (each doc's chunks derive from its own row)."""
    pf, toks = _nonempty_tokens(batch)
    if len(pf) == 0:
        return _CHUNK_OUT_SCHEMA.empty_table()
    starts = np.flatnonzero(np.r_[True, pf[1:] != pf[:-1]])
    doc_start_of = np.repeat(starts, np.diff(np.r_[starts, len(pf)]))
    rank = np.arange(len(pf), dtype=np.int64) - doc_start_of
    c = spec.CHUNK_TOKENS
    bnd = np.flatnonzero(rank % c == 0)
    offsets = np.r_[bnd, len(pf)].astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets), toks)
    chunk_text = pc.binary_join(lists, " ")
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)[pf[bnd]]
    return pa.table(
        {
            "doc_id": pa.array(doc_id),
            "chunk_idx": pa.array(rank[bnd] // c),
            "n_tokens": pa.array(np.diff(offsets).astype(np.int64)),
            "chunk_text": chunk_text,
        }
    )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition metrics per doc: duplicate-token fraction
    (1 - distinct/total) and most-frequent-bigram fraction, both as
    exact integer ppm ((x * 10^6) // y) so the oracle mirror needs no
    float parity.  One dictionary-encode + one lexsort per batch."""
    pf, toks = _nonempty_tokens(batch)
    n_docs = batch.num_rows
    nt = np.bincount(pf, minlength=n_docs).astype(np.int64)
    enc = toks.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = np.int64(max(len(enc.dictionary), 1))
    nd = np.bincount(
        np.unique(pf * v + codes) // v, minlength=n_docs
    ).astype(np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    nb = np.zeros(n_docs, dtype=np.int64)
    m = len(pf) - 1
    if m > 0:
        adj = pf[:m] == pf[1:]
        bp, a, b = pf[:m][adj], codes[:m][adj], codes[1:][adj]
        nb = np.bincount(bp, minlength=n_docs).astype(np.int64)
        if len(bp):
            order = np.lexsort((b, a, bp))
            p_s, a_s, b_s = bp[order], a[order], b[order]
            new = np.ones(len(p_s), dtype=bool)
            new[1:] = (
                (p_s[1:] != p_s[:-1]) | (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
            )
            st = np.flatnonzero(new)
            cnts = np.diff(np.r_[st, len(p_s)]).astype(np.int64)
            gdoc = p_s[st]
            dstart = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
            top[gdoc[dstart]] = np.maximum.reduceat(cnts, dstart)
    keep = nt > 0
    dup_ppm = ((nt - nd) * 1_000_000) // np.maximum(nt, 1)
    topb_ppm = np.where(nb > 0, (top * 1_000_000) // np.maximum(nb, 1), 0)
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(doc_id[keep]),
            "n_tokens": pa.array(nt[keep]),
            "n_distinct": pa.array(nd[keep]),
            "dup_token_ppm": pa.array(dup_ppm[keep]),
            "top_bigram_ppm": pa.array(topb_ppm[keep].astype(np.int64)),
        }
    )


def decon_filter_batch(batch: pa.Table, bench_ref) -> pa.Table:
    """Decontamination as a FILTER (for composed pipelines): drop the
    benchmark docs themselves and every probe doc with >= 1 benchmark
    n-gram hit; survivors pass through unchanged."""
    from ..state.broadcast import cached

    did = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sub = batch.filter(pa.array(did % spec.DECON_BENCH_MOD != 0))
    if sub.num_rows == 0:
        return sub
    bench = cached(bench_ref, lambda x: x)
    if len(bench) == 0:
        return sub
    p, ng = _ngram_strings(sub, spec.DECON_NGRAM)
    mask = np.ones(sub.num_rows, dtype=bool)
    if len(p):
        hit = pc.is_in(ng, value_set=bench).to_numpy(zero_copy_only=False)
        mask[np.unique(p[hit])] = False
    return sub.filter(pa.array(mask))


def chunk_members_partition(group: pa.Table) -> pa.Table:
    """One doc_id-hash partition of the survivors semi-join: rows with
    kind=0 are the surviving doc_ids (from the cleaning exchange), rows
    with kind=1 carry text; docs in the survivor set get chunked."""
    kind = group.column("kind").to_numpy(zero_copy_only=False)
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    surv = np.sort(ids[kind == 0])
    docs_mask = kind == 1
    sub = group.filter(pa.array(docs_mask))
    from ..util import sorted_isin

    keep = sorted_isin(surv, ids[docs_mask])
    sub = sub.filter(pa.array(keep)).select(["doc_id", "text"])
    return chunk_tokens_batch(sub)


def term_count_batch(batch: pa.Table) -> pa.Table:
    """Per-batch term-count combiner rows, partitioned by hash(term)
    (the PMI exchange's partitioner) for the heavy-hitters reduce."""
    pf, toks = _nonempty_tokens(batch)
    if len(pf) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
             "__part": pa.array([], pa.int64())}
        )
    enc = toks.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
    terms = pa.array(np.asarray(enc.dictionary, dtype=object), type=pa.string())
    return pa.table(
        {"term": terms, "cnt": pa.array(cnt), "__part": pa.array(_pmi_hash_part(terms))}
    )


def term_topk_partition(group: pa.Table) -> pa.Table:
    """One hash(term) partition: global per-term sums, then the
    partition-local top-k (the global top-k is a subset of the union)."""
    terms = np.asarray(group.column("term"), dtype=object)
    cnt = group.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(terms, kind="stable")
    t_s, c_s = terms[order], cnt[order]
    st = np.flatnonzero(np.r_[True, t_s[1:] != t_s[:-1]])
    tot = np.add.reduceat(c_s, st)
    t_u = t_s[st]
    top = np.lexsort((t_u, -tot))[: spec.TOP_TERMS_K]
    return pa.table(
        {"term": pa.array(t_u[top], type=pa.string()), "n": pa.array(tot[top])}
    )


def batch_levenshtein(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Unit-cost edit distance for P string pairs at once, vectorized
    ACROSS pairs: the DP iterates max-length rows (a couple dozen for
    captions), each row one numpy pass including the insertion-chain
    prefix-min trick (row[j] = min(part[j], min_k<j row[k] + (j-k)) via
    cummin of part - j).  Matches DuckDB's levenshtein() exactly
    (property-tested incl. empty strings)."""
    P = len(A)
    if P == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in A], dtype=np.int64)
    lb = np.array([len(s) for s in B], dtype=np.int64)
    L = int(max(la.max(initial=0), lb.max(initial=0)))
    if L == 0:
        return np.zeros(P, np.int64)
    av = np.asarray(A, dtype=f"U{L}").view(np.uint32).reshape(P, L)
    bv = np.asarray(B, dtype=f"U{L}").view(np.uint32).reshape(P, L)
    j = np.arange(L + 1)
    dp = np.broadcast_to(j, (P, L + 1)).astype(np.int64).copy()
    for i in range(1, L + 1):
        sub = dp[:, :-1] + (av[:, i - 1][:, None] != bv[:, :L]).astype(np.int64)
        dele = dp[:, 1:] + 1
        part = np.concatenate(
            [np.full((P, 1), i, dtype=np.int64), np.minimum(sub, dele)], axis=1
        )
        row = np.minimum(part, np.minimum.accumulate(part - j, axis=1) + j)
        # rows of A beyond la keep the previous dp (that string ended)
        dp = np.where((i <= la)[:, None], row, dp)
    return dp[np.arange(P), lb]


# --- exact chunk-level substring dedup --------------------------------------

CHUNK_LEN = 64  # fixed chunk width (bytes == chars: the corpus is ASCII)

# routing-only polynomial hash powers (FNV prime, wrapping uint64); the
# hash picks the partition — grouping inside a partition is by the
# EXACT chunk bytes, so collisions cannot change results
with np.errstate(over="ignore"):  # uint64 wraparound is the hash
    _CHUNK_POW = np.multiply.accumulate(
        np.concatenate(
            ([1], np.full(CHUNK_LEN - 1, 1099511628211, dtype=np.uint64))
        ).astype(np.uint64)
    )


def chunk_emit(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Explode every doc into its non-overlapping CHUNK_LEN-byte chunks
    (the fixed-size-chunking formulation of exact substring dedup: the
    tail shorter than CHUNK_LEN is ignored).  One flat-buffer pass, no
    per-row Python: chunk bytes are gathered as a (total, CHUNK_LEN)
    uint8 matrix and emitted as fixed_size_binary.  This is the ONE
    stage in the engine that deliberately ships text content through an
    exchange — exact substring dedup is O(corpus bytes) by nature (a
    suffix-array formulation moves the same order of bytes)."""
    from ..util import hash_partition

    data, offsets = _utf8_flat(batch.column("text"))
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    n_chunks = lens // CHUNK_LEN
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                "chunk": pa.array([], pa.binary(CHUNK_LEN)),
                "doc_id": pa.array([], pa.int64()),
                "__part": pa.array([], pa.int64()),
            }
        )
    doc = np.repeat(ids, n_chunks)
    cum = np.concatenate(([0], np.cumsum(n_chunks)))
    within = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], n_chunks)
    starts = np.repeat(offsets[:-1], n_chunks) + within * CHUNK_LEN
    mat = data[starts[:, None] + np.arange(CHUNK_LEN)]  # (total, CHUNK_LEN)
    h = (mat.astype(np.uint64) * _CHUNK_POW).sum(axis=1).view(np.int64)
    chunk = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(CHUNK_LEN), total, [None, pa.py_buffer(mat.tobytes())]
    )
    return pa.table(
        {
            "chunk": chunk,
            "doc_id": pa.array(doc),
            "__part": pa.array(hash_partition(h, num_partitions)),
        }
    )


def chunk_dup_partials(group: pa.Table) -> pa.Table:
    """Per chunk-hash partition: group occurrences by EXACT chunk bytes
    (uint64-word structured view -> np.unique, no Python comparisons),
    mark chunks seen in >= 2 distinct docs, and emit per-doc partial
    dup-occurrence counts (two int64s per doc per partition)."""
    n = group.num_rows
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "nd": pa.array([], pa.int64())}
        )
    ch = group.column("chunk")
    if isinstance(ch, pa.ChunkedArray):
        ch = ch.combine_chunks()
    buf = np.frombuffer(ch.buffers()[1], dtype=np.uint8)
    buf = buf[ch.offset * CHUNK_LEN : (ch.offset + len(ch)) * CHUNK_LEN]
    words = buf.reshape(-1, CHUNK_LEN).view("<u8")  # (n, CHUNK_LEN/8)
    rec = words.view([(f"w{i}", "<u8") for i in range(CHUNK_LEN // 8)]).ravel()
    _, gid = np.unique(rec, return_inverse=True)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, gid))
    gs, ds = gid[order], doc[order]
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = gs[1:] != gs[:-1]
    new_doc = np.ones(n, dtype=bool)
    new_doc[1:] = new_grp[1:] | (ds[1:] != ds[:-1])
    starts = np.flatnonzero(new_grp)
    ndocs = np.add.reduceat(new_doc.astype(np.int64), starts)
    dup_grp = np.zeros(int(gs[-1]) + 1, dtype=bool)
    dup_grp[gs[starts[ndocs >= 2]]] = True
    dup_docs = doc[dup_grp[gid]]
    uniq_doc, counts = np.unique(dup_docs, return_counts=True)
    return pa.table(
        {"doc_id": pa.array(uniq_doc), "nd": pa.array(counts.astype(np.int64))}
    )
