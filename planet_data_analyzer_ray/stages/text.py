"""Text-analysis stages over the documents table (training-data ops).

Language-ID (marker-word heuristic), quality scoring (token/stopword
ratios), token counting, exact dedup (md5 content hash), document
fingerprinting (rolling hash), MinHash-LSH and SimHash near-dup.
Regexes are compiled once per actor (callable classes).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from .. import spec


class TokenStats:
    def __init__(self):
        self.tok_re = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = np.asarray(
            [len(self.tok_re.findall(t)) for t in texts], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "n_tokens": pa.array(n_tokens),
            }
        )


class QualityScore:
    def __init__(self):
        self.tok_re = re.compile(r"\S+")
        self.stopwords = frozenset(spec.STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows = {"doc_id": [], "n_tokens": [], "stop_cnt": [], "n_chars": []}
        for i, t in enumerate(texts):
            toks = self.tok_re.findall(t)
            if not toks:
                continue  # oracle excludes empty docs
            rows["doc_id"].append(int(doc_id[i]))
            rows["n_tokens"].append(len(toks))
            rows["stop_cnt"].append(sum(1 for x in toks if x in self.stopwords))
            rows["n_chars"].append(int(n_chars[i]))
        nt = np.asarray(rows["n_tokens"], dtype=np.int64)
        sc = np.asarray(rows["stop_cnt"], dtype=np.int64)
        nc = np.asarray(rows["n_chars"], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(rows["doc_id"], dtype=np.int64)),
                "n_tokens": pa.array(nt),
                "stop_cnt": pa.array(sc),
                "stop_ratio": pa.array(sc / nt.astype(np.float64)),
                "chars_per_token": pa.array(nc / nt.astype(np.float64)),
            }
        )


class LangId:
    """Marker-word language heuristic with deterministic tie-break
    (en > de > fr > es; all-zero -> 'und'), mirroring the SQL CASE."""

    def __init__(self):
        self.tok_re = re.compile(r"\S+")
        self.markers = {
            lang: frozenset(spec.LANG_MARKERS[lang]) for lang in spec.LANG_PRIORITY
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_lang = [], []
        for i, t in enumerate(texts):
            toks = self.tok_re.findall(t)
            if not toks:
                continue
            hits = {
                lang: sum(1 for x in toks if x in m) for lang, m in self.markers.items()
            }
            if all(v == 0 for v in hits.values()):
                pred = "und"
            else:
                pred = max(spec.LANG_PRIORITY, key=lambda g: (hits[g], -spec.LANG_PRIORITY.index(g)))
            out_id.append(int(doc_id[i]))
            out_lang.append(pred)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_id, dtype=np.int64)),
                "pred_lang": pa.array(out_lang, type=pa.string()),
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


def exact_dup_groups(group: pa.Table) -> pa.Table:
    """Per content-hash group: flag the lowest doc_id as canonical
    (first-wins, D1 analog on documents)."""
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


# --- fingerprints / sketches (engine-native; rows-only driver check) -------

FP_MOD = np.int64(1_000_000_007)
FP_BASE = np.int64(257)


class Fingerprint:
    """Rolling polynomial hash of the whole document (mod 1e9+7)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = np.int64(0)
            for b in t.encode("utf-8"):
                h = (h * FP_BASE + b) % FP_MOD
            fps[i] = h
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps)}
        )


def _shingle_hashes(text: str, k: int = spec.SHINGLE_K) -> np.ndarray:
    """Distinct k-char-shingle hashes (stable 64-bit FNV-1a)."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    n = len(data) - k + 1
    arr = np.frombuffer(data, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    for j in range(k):
        h = (h ^ windows[:, j].astype(np.uint64)) * np.uint64(0x100000001B3)
    return np.unique(h)


# 64 minhash permutations: h_i(x) = (a_i * x + b_i) mod 2^61-1
_MH_P = np.uint64((1 << 61) - 1)
_rng = np.random.RandomState(1234)
_MH_A = _rng.randint(1, 1 << 31, size=spec.MINHASH_PERMS).astype(np.uint64)
_MH_B = _rng.randint(0, 1 << 31, size=spec.MINHASH_PERMS).astype(np.uint64)


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingle_hashes(text) & np.uint64((1 << 32) - 1)  # keep products in range
    if len(sh) == 0:
        return np.zeros(spec.MINHASH_PERMS, dtype=np.uint64)
    vals = (sh[None, :] * _MH_A[:, None] + _MH_B[:, None]) % _MH_P
    return vals.min(axis=1)


class MinHashLSH:
    """doc batch -> (band_key, doc_id, signature) rows for LSH banding."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows_band, rows_doc, rows_sig = [], [], []
        rows_per_band = spec.MINHASH_PERMS // spec.MINHASH_BANDS
        for i, t in enumerate(texts):
            sig = minhash_signature(t)
            for b in range(spec.MINHASH_BANDS):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes() + bytes([b])).hexdigest()[:12]
                rows_band.append(f"{b}:{bh}")
                rows_doc.append(int(doc_id[i]))
                rows_sig.append(sig.tobytes())
        return pa.table(
            {
                "band_key": pa.array(rows_band, type=pa.string()),
                "doc_id": pa.array(np.asarray(rows_doc, dtype=np.int64)),
                "signature": pa.array(rows_sig, type=pa.binary()),
            }
        )


def minhash_bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket; est. jaccard = fraction of
    equal minhash slots; emitted at the pair's lowest matching band."""
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
    )
    if group.num_rows < 2:
        return empty
    band_idx = int(group.column("band_key")[0].as_py().split(":")[0])
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = np.stack(
        [np.frombuffer(s, dtype=np.uint64) for s in group.column("signature").to_pylist()]
    )
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    keep_mask = np.ones(len(ids), dtype=bool)
    keep_mask[1:] = ids[1:] != ids[:-1]  # a doc can land twice in a bucket
    ids, sigs = ids[keep_mask], sigs[keep_mask]
    if len(ids) < 2:
        return empty
    ai, bi = np.triu_indices(len(ids), k=1)
    eq = (sigs[ai] == sigs[bi]).mean(axis=1)
    keep = eq >= spec.MINHASH_JACCARD_MIN
    ai, bi, eq = ai[keep], bi[keep], eq[keep]
    if len(ai) == 0:
        return empty
    rows_per_band = spec.MINHASH_PERMS // spec.MINHASH_BANDS
    is_min = np.ones(len(ai), dtype=bool)
    for b in range(band_idx):
        sl = slice(b * rows_per_band, (b + 1) * rows_per_band)
        band_eq = (sigs[ai][:, sl] == sigs[bi][:, sl]).all(axis=1)
        is_min &= ~band_eq
    ai, bi, eq = ai[is_min], bi[is_min], eq[is_min]
    return pa.table(
        {
            "doc_a": pa.array(ids[ai]),
            "doc_b": pa.array(ids[bi]),
            "est_jaccard": pa.array(eq),
        }
    )


class SimHash:
    """64-bit SimHash over shingle hashes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t)
            if len(sh) == 0:
                out[i] = 0
                continue
            bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            vote = (2 * bits - 1).sum(axis=0)
            val = np.uint64(0)
            for j in range(63):  # keep sign bit clear -> non-negative int64
                if vote[j] > 0:
                    val |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(val)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(out)}
        )
