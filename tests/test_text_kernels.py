"""Vectorized text-sketch kernels vs their per-document reference
implementations, plus the LSH hot-bucket skew guard."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from planet_data_analyzer_ray import spec
from planet_data_analyzer_ray.stages import dedup, text


def _random_docs(n=200, seed=7):
    rng = np.random.RandomState(seed)
    words = ["the", "fox", "jumps", "über", "rivière", "data", "ray", "a", "zz"]
    docs = []
    for i in range(n):
        ln = int(rng.randint(0, 40))
        docs.append(" ".join(rng.choice(words, size=ln)) if ln else "")
    # edge cases: shorter than SHINGLE_K, whitespace-only, exact k
    docs += ["", "ab", "   ", "abcde", "x" * spec.SHINGLE_K]
    return docs


@pytest.fixture(scope="module")
def doc_batch():
    docs = _random_docs()
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
            "n_chars": pa.array([len(d) for d in docs], type=pa.int64()),
        }
    )


def test_fingerprint_matches_horner_loop(doc_batch):
    out = text.Fingerprint()(doc_batch)
    fps = out.column("fingerprint").to_pylist()
    for i, t in enumerate(doc_batch.column("text").to_pylist()):
        h = 0
        for b in t.encode("utf-8"):
            h = (h * 257 + b) % 1_000_000_007
        assert fps[i] == h, f"doc {i}"


def test_batch_minhash_matches_per_doc(doc_batch):
    sig = text.batch_minhash_signatures(doc_batch.column("text"))
    for i, t in enumerate(doc_batch.column("text").to_pylist()):
        ref = text.minhash_signature(t)
        assert np.array_equal(sig[i], ref), f"doc {i}"


def test_simhash_matches_per_doc(doc_batch):
    out = text.SimHash()(doc_batch)
    got = out.column("simhash").to_pylist()
    for i, t in enumerate(doc_batch.column("text").to_pylist()):
        sh = text._shingle_hashes(t)
        bits = (
            (sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int64)
        vote = (2 * bits - 1).sum(axis=0)
        val = 0
        for j in range(63):
            if vote[j] > 0:
                val |= 1 << j
        assert got[i] == val, f"doc {i}"


def test_exact_dup_partition_matches_group_kernel(doc_batch):
    hashed = text.content_hash_part_batch(doc_batch)
    part_out = text.exact_dup_partition(hashed.drop_columns(["__part"]))
    # reference: per-group kernel over each content_hash
    import pandas as pd

    df = hashed.to_pandas()
    ref = (
        df.groupby("content_hash", group_keys=False)
        .apply(
            lambda g: g.assign(
                is_canonical=(g.doc_id == g.doc_id.min()).astype("int64")
            ),
            include_groups=True,
        )
        .reset_index(drop=True)
    )
    got = part_out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    ref = ref[["doc_id", "content_hash", "is_canonical"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_quality_langid_token_stats_run_on_edge_docs(doc_batch):
    # shapes + empty-doc exclusion; oracle parity is covered end-to-end
    q = text.QualityScore()(doc_batch)
    nonempty_docs = sum(
        1 for t in doc_batch.column("text").to_pylist() if t.split()
    )
    assert q.num_rows == nonempty_docs
    l = text.LangId()(doc_batch)
    assert l.num_rows == nonempty_docs
    ts = text.TokenStats()(doc_batch)
    assert ts.num_rows == doc_batch.num_rows
    toks = ts.column("n_tokens").to_pylist()
    for i, t in enumerate(doc_batch.column("text").to_pylist()):
        assert toks[i] == len(t.split()), f"doc {i}"


def test_minhash_hot_bucket_bounded(monkeypatch):
    """Identical docs flood one LSH bucket per band; with the cap forced
    below the flood size, the salt-split keeps each kernel call bounded
    while still emitting only deduplicated (a<b) pairs."""
    monkeypatch.setattr(text, "LSH_BUCKET_CAP", 256)
    n = 1200
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["identical document body " * 10] * n),
            "n_chars": pa.array(np.full(n, 240, dtype=np.int64)),
        }
    )
    banded = text.MinHashLSH()(tbl)
    # NOTE: identical docs are NOT collapsed by doc_id dedup (ids differ)
    # — the salt-split cap bounds the all-pairs blowup instead.
    pairs = text.minhash_partition_pairs(banded.drop_columns(["__part"]))
    # capped: each sub-bucket of <= CAP members contributes all pairs;
    # the kernel must complete quickly and every pair must be est=1.0
    assert pairs.num_rows > 0
    assert np.all(
        pairs.column("est_jaccard").to_numpy(zero_copy_only=False) == 1.0
    )
    a = pairs.column("doc_a").to_numpy(zero_copy_only=False)
    b = pairs.column("doc_b").to_numpy(zero_copy_only=False)
    assert np.all(a < b)
    # emitted only at the lowest band -> no duplicate pairs
    packed = a * np.int64(1 << 32) + b
    assert len(np.unique(packed)) == len(packed)


def test_phash_hot_bucket_salt_split(monkeypatch):
    """A constant-phash flood must not build an O(n^2) triu over the
    whole bucket: the salt-split cap bounds each kernel call."""
    monkeypatch.setattr(dedup, "LSH_BUCKET_CAP", 512)
    n = dedup.LSH_BUCKET_CAP + 500
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "band_key": pa.array(np.zeros(n, dtype=np.int64)),
            "image_key": pa.array(keys),
            "image_id": pa.array([f"img-{k}" for k in keys], type=pa.string()),
            "phash": pa.array(np.full(n, 12345, dtype=np.int64)),
        }
    )
    pairs = dedup.phash_bucket_pairs(tbl)
    # pairs exist within sub-buckets, all hamming 0, none duplicated
    assert pairs.num_rows > 0
    assert np.all(pairs.column("hamming").to_numpy(zero_copy_only=False) == 0)


def test_ngram_shingles_match_substring_sets():
    """uint64-packed shingles == the set of 8-char substrings (ASCII
    bijection), distinct per doc, across batch boundaries and docs
    shorter than the window."""
    docs = ["abcdefghijk", "short", "aaaaaaaaaa", "", "the the the the"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    out = text.NgramShingles()(tbl)
    doc = out.column("doc_id").to_numpy(zero_copy_only=False)
    sh = out.column("sh").to_numpy(zero_copy_only=False)
    from planet_data_analyzer_ray import spec as _spec

    w = _spec.NGRAM_WIDTH
    for i, d in enumerate(docs):
        want = {d[j : j + w] for j in range(len(d) - w + 1)}
        got = {
            int(v).to_bytes(8, "little").decode("ascii")
            for v in sh[doc == i]
        }
        assert got == want, d


def test_ngram_hot_bucket_tiled_emission_is_exact(monkeypatch):
    """A prefix bucket hotter than NGRAM_DF_CAP (mass-duplicate
    cluster) is emitted in row tiles — same pairs as the single-shot
    triu, nothing dropped (the query is exact/oracle-checked)."""
    from planet_data_analyzer_ray import spec as _spec

    n = 50
    tbl = pa.table(
        {
            "sh": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "sz": pa.array(np.full(n, 100, dtype=np.int64)),
            "rank": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    monkeypatch.setattr(_spec, "NGRAM_DF_CAP", 10)  # force tiling
    tiled = text.ngram_prefix_pair_partition(tbl)
    monkeypatch.setattr(_spec, "NGRAM_DF_CAP", 4096)  # single shot
    single = text.ngram_prefix_pair_partition(tbl)
    assert tiled.num_rows == single.num_rows == n * (n - 1) // 2
    assert np.array_equal(
        np.sort(tiled.column("pair_key").to_numpy(zero_copy_only=False)),
        np.sort(single.column("pair_key").to_numpy(zero_copy_only=False)),
    )
    sp = text._unpack_cand_meta(
        tiled.column("meta").to_numpy(zero_copy_only=False)
    )[0]
    assert np.all(sp == 1)


def test_ngram_skewed_size_containment_pair_survives_bound():
    """Regression for the positional-bound direction: doc A contained in
    a 2x-larger doc B whose extra shingles are all RARER than A's, so
    the shared elements sit at the END of B's rarest-first order.  With
    J(A,B) exactly at the threshold the pair must survive the bound
    filter and verify (a min() bound wrongly pruned it)."""
    from planet_data_analyzer_ray import spec as _spec

    # build synthetic shingle rows directly: doc 0 = 40 common shingles
    # (df=2 each, but globally ranked AFTER doc 1's 40 unique rares via
    # df ties broken by shingle value); doc 1 = same 40 + 40 rarer ones
    shared = np.arange(1000, 1040, dtype=np.int64)  # high shingle values
    rare = np.arange(0, 40, dtype=np.int64)  # low values, df=1
    rows_sh = np.concatenate([shared, shared, rare])
    rows_doc = np.concatenate(
        [np.zeros(40, np.int64), np.ones(40, np.int64), np.ones(40, np.int64)]
    )
    out = _run_prefix_chain(
        pa.table({"sh": pa.array(rows_sh), "doc_id": pa.array(rows_doc)})
    )
    # J = 40 / (40 + 80 - 40) = 0.5 == NGRAM_JACCARD_MIN -> must emit
    assert _spec.NGRAM_JACCARD_MIN == 0.5
    assert out.num_rows == 1
    assert out.column("n_inter")[0].as_py() == 40
    assert out.column("jaccard")[0].as_py() == 0.5


def _run_prefix_chain(sh):
    """Driver-side single-partition composition of the distributed
    jaccard kernels: df attach -> prefix emit -> pair partition ->
    bound filter -> survivor expand -> exact intersect."""
    base = sh.drop_columns(["__part"]) if "__part" in sh.column_names else sh
    wd = text.ngram_df_attach(base)
    prefix = text.ngram_prefix_emit(wd.drop_columns(["__dpart"]))
    partials = text.ngram_prefix_pair_partition(prefix.drop_columns(["__part"]))
    surv = text.ngram_bound_filter(partials.drop_columns(["__ppart"]))
    counted = text.NgramPairCount(surv)(base)
    return text.ngram_pair_finalize(counted.drop_columns(["__fpart"]), surv)


def test_ngram_prefix_pipeline_matches_bruteforce():
    """Distributed-kernel composition (df attach -> prefix emit -> pair
    partition -> verify) run driver-side on one partition equals the
    brute-force all-pairs jaccard at the spec threshold."""
    from planet_data_analyzer_ray import spec as _spec

    rng = np.random.default_rng(7)
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    docs = []
    for i in range(30):
        words = base.split()
        k = rng.integers(0, 4)
        for _ in range(k):
            words[rng.integers(0, len(words))] = f"w{rng.integers(0, 9)}"
        docs.append(" ".join(words))
    docs += [f"completely unrelated document number {i} with its own text body" for i in range(10)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    sh = text.NgramShingles()(tbl)
    got = _run_prefix_chain(sh)

    # brute force over full shingle sets
    s = sh.column("sh").to_numpy(zero_copy_only=False)
    d = sh.column("doc_id").to_numpy(zero_copy_only=False)
    sets = {i: set(s[d == i].tolist()) for i in range(len(docs))}
    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= _spec.NGRAM_JACCARD_MIN:
                want.add((a, b, inter, union))
    have = set(
        zip(
            got.column("doc_a").to_pylist(),
            got.column("doc_b").to_pylist(),
            got.column("n_inter").to_pylist(),
            got.column("n_union").to_pylist(),
        )
    )
    assert have == want
    assert len(want) > 0


def test_ngram_multi_partition_flow_matches_bruteforce():
    """Simulate the DISTRIBUTED flow with real partition splits: shingle
    rows split by __part for DF attach and pair-count verify, df rows
    split by __dpart for prefix emit, pair partials split by __ppart for
    the bound filter — partial sums / mins across partitions must
    reproduce the brute-force all-pairs jaccard exactly."""
    rng = np.random.default_rng(11)
    base = "the quick brown fox jumps over the lazy dog and runs far away home again"
    docs = []
    for i in range(40):
        words = base.split()
        for _ in range(int(rng.integers(0, 5))):
            words[rng.integers(0, len(words))] = f"w{rng.integers(0, 9)}"
        docs.append(" ".join(words))
    docs += [f"quite different text body number {i} here now" for i in range(12)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    sh = text.NgramShingles()(tbl)

    def split(t, col, n):
        v = t.column(col).to_numpy(zero_copy_only=False) % n
        return [t.filter(pa.array(v == p)) for p in range(n)]

    # DF attach per shingle partition
    wd_parts = [
        text.ngram_df_attach(g.drop_columns(["__part"])) for g in split(sh, "__part", 4)
    ]
    wd = pa.concat_tables([g for g in wd_parts if g.num_rows])
    # prefix emit per doc partition
    pr_parts = [
        text.ngram_prefix_emit(g.drop_columns(["__dpart"]))
        for g in split(wd, "__dpart", 4)
    ]
    pr = pa.concat_tables([g for g in pr_parts if g.num_rows])
    # pair partials per shingle partition
    pp_parts = [
        text.ngram_prefix_pair_partition(g.drop_columns(["__part"]))
        for g in split(pr, "__part", 4)
    ]
    pp = pa.concat_tables([g for g in pp_parts if g.num_rows])
    # bound filter per pair partition (sizes ride the candidate rows)
    surv_parts = [
        text.ngram_bound_filter(g.drop_columns(["__ppart"]))
        for g in split(pp, "__ppart", 4)
    ]
    surv = pa.concat_tables([g for g in surv_parts if g.num_rows])
    # verify per shingle partition of the FULL rows
    counter = text.NgramPairCount(surv)
    cnt_parts = [
        counter(g.drop_columns(["__part"])) for g in split(sh, "__part", 4)
    ]
    cnt = pa.concat_tables([g for g in cnt_parts if g.num_rows])
    # finalize per pair partition (sizes from the survivor table)
    out_parts = [
        text.ngram_pair_finalize(g.drop_columns(["__fpart"]), surv)
        for g in split(cnt, "__fpart", 4)
    ]
    got = pa.concat_tables([g for g in out_parts if g.num_rows])

    # brute force
    s = sh.column("sh").to_numpy(zero_copy_only=False)
    d = sh.column("doc_id").to_numpy(zero_copy_only=False)
    sets = {i: set(s[d == i].tolist()) for i in range(len(docs))}
    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= spec.NGRAM_JACCARD_MIN:
                want.add((a, b, inter, union))
    have = set(
        zip(
            got.column("doc_a").to_pylist(),
            got.column("doc_b").to_pylist(),
            got.column("n_inter").to_pylist(),
            got.column("n_union").to_pylist(),
        )
    )
    assert have == want
    assert len(want) > 0


def test_phash_hot_bucket_single_parity_splits(monkeypatch):
    """Regression: a hot bucket whose keys all share one parity must
    still split (the salt hash takes high bits before the mod; the raw
    odd-multiplier product preserves parity and recursed forever)."""
    monkeypatch.setattr(dedup, "LSH_BUCKET_CAP", 256)
    n = 400  # ceil(400/256) = 2 sub-buckets: the parity-preserving case
    keys = np.arange(n, dtype=np.int64) * 2  # all even
    tbl = pa.table(
        {
            "band_key": pa.array(np.zeros(n, dtype=np.int64)),
            "image_key": pa.array(keys),
            "image_id": pa.array([f"img-{k}" for k in keys], type=pa.string()),
            "phash": pa.array(np.full(n, 777, dtype=np.int64)),
        }
    )
    pairs = dedup.phash_bucket_pairs(tbl)  # must terminate
    assert pairs.num_rows > 0


def test_ngram_shingles_on_sliced_column():
    """Regression: a sliced Arrow table (nonzero buffer offset, values
    buffer extending beyond the slice) must shingle exactly the sliced
    docs — the kernel rebases the flat buffer to the slice."""
    docs = ["padding document zero", "abcdefghij", "klmnopqrstuv", "tail pad"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    sliced = tbl.slice(1, 2)  # docs 1..2, buffer offset > 0, tail beyond
    out = text.NgramShingles()(sliced)
    full = text.NgramShingles()(tbl)
    fd = full.column("doc_id").to_numpy(zero_copy_only=False)
    want = full.filter(pa.array((fd == 1) | (fd == 2)))
    got = {
        (d, s)
        for d, s in zip(
            out.column("doc_id").to_pylist(), out.column("sh").to_pylist()
        )
    }
    exp = {
        (d, s)
        for d, s in zip(
            want.column("doc_id").to_pylist(), want.column("sh").to_pylist()
        )
    }
    assert got == exp and len(exp) > 0


def test_ngram_window_kernels_basics():
    """Decontamination / chunking / repetition kernels on a tiny batch
    with hand-checked expectations."""
    import numpy as np
    import pyarrow as pa

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.stages import text

    batch = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(["a b a b a", "  a b   c ", "x"], pa.string()),
        }
    )
    # n-gram windows never cross docs
    p, ng = text._ngram_strings(batch, 3)
    assert list(p) == [0, 0, 0, 1]
    assert ng.to_pylist() == ["a b a", "b a b", "a b a", "a b c"]
    # repetition: doc 10 has 5 tokens, 2 distinct, top bigram 'a b' x2 of 4
    rep = text.repetition_stats_batch(batch).to_pydict()
    assert rep["doc_id"] == [10, 11, 12]
    assert rep["n_tokens"] == [5, 3, 1]
    assert rep["n_distinct"] == [2, 3, 1]
    assert rep["dup_token_ppm"] == [600000, 0, 0]
    assert rep["top_bigram_ppm"] == [500000, 500000, 0]
    # chunking at the spec width: single chunk per short doc
    ch = text.chunk_tokens_batch(batch).to_pydict()
    assert ch["doc_id"] == [10, 11, 12]
    assert ch["chunk_idx"] == [0, 0, 0]
    assert ch["chunk_text"] == ["a b a b a", "a b c", "x"]
    # chunk boundary behavior with a forced small width
    old = spec.CHUNK_TOKENS
    try:
        spec.CHUNK_TOKENS = 2
        ch2 = text.chunk_tokens_batch(batch).to_pydict()
        assert ch2["doc_id"] == [10, 10, 10, 11, 11, 12]
        assert ch2["chunk_idx"] == [0, 1, 2, 0, 1, 0]
        assert ch2["chunk_text"] == ["a b", "a b", "a", "a b", "c", "x"]
    finally:
        spec.CHUNK_TOKENS = old
    # empty-batch safety
    empty = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    assert text.decon_bench_batch(empty).num_rows == 0
    assert text.chunk_tokens_batch(empty).num_rows == 0
    assert text.repetition_stats_batch(empty).num_rows == 0


# --- property tests for the round-3 word-n-gram kernels ---------------------

_words = __import__("hypothesis").strategies.sampled_from(
    ["a", "bb", "ccc", "dd", "e"]
)
_doc_texts = __import__("hypothesis").strategies.lists(
    __import__("hypothesis").strategies.lists(_words, min_size=0, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=8,
)


def _ref_pmi(texts, min_count, topk):
    """Pure-Python PMI reference straight from the definition."""
    import math
    from collections import Counter

    uni, bi = Counter(), Counter()
    t = tb = 0
    for s in texts:
        toks = s.split()
        uni.update(toks)
        t += len(toks)
        for x, y in zip(toks, toks[1:]):
            bi[(x, y)] += 1
            tb += 1
    rows = []
    for (x, y), nab in bi.items():
        if nab < min_count:
            continue
        pmi = math.log((nab / tb) / ((uni[x] / t) * (uni[y] / t)))
        rows.append((x, y, nab, math.floor(pmi * 1e6)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:topk]


from hypothesis import given as _given, settings as _settings


@_given(_doc_texts, __import__("hypothesis").strategies.integers(1, 4))
@_settings(max_examples=40, deadline=None)
def test_pmi_kernels_match_reference_any_batch_split(texts, nsplit):
    """The pmi kernel chain (count -> attach -> score) reproduces the
    textbook definition for EVERY batch split of the corpus."""
    import numpy as np
    import pyarrow as pa

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.stages import text

    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    # lower the support floor so random tiny corpora exercise the
    # non-empty scoring path, not just the early-outs
    old_min = spec.PMI_MIN_COUNT
    spec.PMI_MIN_COUNT = 2
    try:
        _pmi_roundtrip(texts, nsplit, tab)
    finally:
        spec.PMI_MIN_COUNT = old_min


def _pmi_roundtrip(texts, nsplit, tab):
    import numpy as np
    import pyarrow as pa

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.stages import text

    tot_t = tot_tb = 0
    counted = []
    step = max(1, -(-len(texts) // nsplit))
    for i in range(0, len(texts), step):
        b = tab.slice(i, step)
        tt = text.pmi_totals_batch(b)
        tot_t += tt.column("t")[0].as_py()
        tot_tb += tt.column("tb")[0].as_py()
        counted.append(text.pmi_count_batch(b))
    counted = [c for c in counted if c.num_rows]
    if not counted or tot_tb == 0:
        assert _ref_pmi(texts, spec.PMI_MIN_COUNT, spec.PMI_TOPK) == []
        return
    allc = pa.concat_tables(counted)
    ex1 = []
    parts = allc.column("__part").to_numpy(zero_copy_only=False)
    for p in np.unique(parts):
        g = allc.filter(pa.array(parts == p)).drop_columns(["__part"])
        ex1.append(text.pmi_attach_na(g))
    e1 = pa.concat_tables([t_ for t_ in ex1 if t_.num_rows])
    out = []
    p2 = e1.column("__part2").to_numpy(zero_copy_only=False)
    for p in np.unique(p2):
        g = e1.filter(pa.array(p2 == p)).drop_columns(["__part2"])
        out.append(text.pmi_score_partition(g, tot_t, tot_tb))
    out = [t_ for t_ in out if t_.num_rows]
    if not out:
        assert _ref_pmi(texts, spec.PMI_MIN_COUNT, spec.PMI_TOPK) == []
        return
    res = pa.concat_tables(out)
    a = np.asarray(res.column("a"), dtype=object)
    b = np.asarray(res.column("b"), dtype=object)
    nab = res.column("nab").to_numpy(zero_copy_only=False)
    pmi_m = res.column("pmi_m").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a, -pmi_m))[: spec.PMI_TOPK]
    got = [
        (a[i], b[i], int(nab[i]), int(pmi_m[i])) for i in order
    ]
    assert got == _ref_pmi(texts, spec.PMI_MIN_COUNT, spec.PMI_TOPK)


@_given(_doc_texts)
@_settings(max_examples=40, deadline=None)
def test_repetition_and_chunks_match_reference(texts):
    import pyarrow as pa
    from collections import Counter

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.stages import text

    tab = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    rep = text.repetition_stats_batch(tab).to_pydict()
    got = dict(
        zip(
            rep["doc_id"],
            zip(rep["n_tokens"], rep["n_distinct"], rep["dup_token_ppm"], rep["top_bigram_ppm"]),
        )
    )
    for i, s in enumerate(texts):
        toks = s.split()
        if not toks:
            assert i not in got
            continue
        nt, nd = len(toks), len(set(toks))
        bi = Counter(zip(toks, toks[1:]))
        nb = sum(bi.values())
        want = (
            nt,
            nd,
            (nt - nd) * 1_000_000 // nt,
            (max(bi.values()) * 1_000_000 // nb) if nb else 0,
        )
        assert got[i] == want, (i, s)
    ch = text.chunk_tokens_batch(tab).to_pydict()
    rows = list(zip(ch["doc_id"], ch["chunk_idx"], ch["n_tokens"], ch["chunk_text"]))
    want_rows = []
    c = spec.CHUNK_TOKENS
    for i, s in enumerate(texts):
        toks = s.split()
        for j in range(0, len(toks), c):
            w = toks[j : j + c]
            want_rows.append((i, j // c, len(w), " ".join(w)))
    assert rows == want_rows


def test_simhash_near_dup_hot_bucket_tiling(sf_dir, monkeypatch):
    """The hot-bucket tiled path of simhash_near_dup emits exactly the
    same pairs as the single-shot diagonal path (nothing dropped):
    force tiling by shrinking the bucket cap below the corpus's largest
    band bucket and compare."""
    import __ray_entry__ as em
    from planet_data_analyzer_ray.stages import dedup as dedup_mod

    from tests.util import normalize, to_pandas

    q = em.queries()["simhash_near_dup"]
    want = normalize(to_pandas(q(sf_dir)))
    assert len(want) > 0
    monkeypatch.setattr(dedup_mod, "LSH_BUCKET_CAP", 4)
    got = normalize(to_pandas(q(sf_dir)))
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# --- batch Levenshtein (pairs-vectorized DP) -------------------------------


def test_batch_levenshtein_matches_duckdb_randoms():
    import duckdb
    import numpy as np
    import random

    from planet_data_analyzer_ray.stages.text import batch_levenshtein

    random.seed(23)
    A = ["".join(random.choices("abcdx-0123", k=random.randint(0, 18))) for _ in range(400)]
    B = ["".join(random.choices("abcdx-0123", k=random.randint(0, 18))) for _ in range(400)]
    con = duckdb.connect()
    ref = np.array(
        [con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0] for a, b in zip(A, B)]
    )
    mine = batch_levenshtein(np.asarray(A, dtype=object), np.asarray(B, dtype=object))
    assert (mine == ref).all()


def test_batch_levenshtein_edges():
    import numpy as np

    from planet_data_analyzer_ray.stages.text import batch_levenshtein

    A = np.asarray(["", "abc", "", "same"], dtype=object)
    B = np.asarray(["", "", "xyz", "same"], dtype=object)
    assert batch_levenshtein(A, B).tolist() == [0, 3, 3, 0]
    assert batch_levenshtein(np.asarray([], dtype=object), np.asarray([], dtype=object)).tolist() == []


def test_ragged_ranges():
    import numpy as np

    from planet_data_analyzer_ray.pipelines.queries import _ragged_ranges

    out = _ragged_ranges(np.array([3, 1, 2], dtype=np.int64))
    assert out.tolist() == [0, 1, 2, 0, 0, 1]


def test_state_history_partition_edges():
    """SCD2 kernel edge semantics: single-event user, ts tie ACROSS a
    state change (event_id breaks the tie), valid_to chaining and NULL
    close-out, per-user run_seq restart."""
    import numpy as np
    import pyarrow as pa

    from planet_data_analyzer_ray.stages.timeseries import state_history_partition

    t0 = np.datetime64("2024-01-01T00:00:00", "us")

    def ts(mins):
        return t0 + np.timedelta64(mins * 60_000_000, "us")

    rows = [
        # user 1: a,a at t0/t1; b at t1 (tie with 2nd a, larger event_id)
        (1, 10, ts(0), "a"),
        (1, 11, ts(1), "a"),
        (1, 12, ts(1), "b"),
        (1, 13, ts(5), "a"),
        # user 2: single event
        (2, 20, ts(3), "x"),
    ]
    tab = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = state_history_partition(tab).to_pydict()
    got = list(
        zip(out["user_id"], out["state"], out["run_seq"], out["n_events"], out["valid_to"])
    )
    # user 1 -> three runs a(2 events), b(1), a(1); user 2 -> one run
    assert got[0][:4] == (1, "a", 1, 2) and got[0][4] is not None
    assert got[1][:4] == (1, "b", 2, 1)
    assert got[2][:4] == (1, "a", 3, 1) and got[2][4] is None  # open run
    assert got[3][:4] == (2, "x", 1, 1) and got[3][4] is None
    # valid_to chains to the NEXT run's valid_from
    assert out["valid_to"][0] == out["valid_from"][1]
    assert out["valid_to"][1] == out["valid_from"][2]
    # empty partition round-trips the schema
    empty = state_history_partition(tab.slice(0, 0))
    assert empty.num_rows == 0 and empty.schema.names == [
        "user_id", "state", "valid_from", "valid_to", "last_ts", "n_events", "run_seq",
    ]


def test_occ_positional_keep_sound():
    """The per-occurrence positional prune must NEVER drop an occurrence
    of a pair whose true Jaccard >= tau: randomized doc sets, exhaustive
    check of every shared element's (rank_a, rank_b) against the keep
    predicate."""
    rng = np.random.default_rng(7)
    tau = spec.NGRAM_JACCARD_MIN
    for trial in range(200):
        n_universe = int(rng.integers(4, 40))
        a = set(rng.choice(n_universe, size=int(rng.integers(2, n_universe + 1)),
                           replace=False).tolist())
        b = set(rng.choice(n_universe, size=int(rng.integers(2, n_universe + 1)),
                           replace=False).tolist())
        inter = len(a & b)
        if inter == 0:
            continue
        jac = inter / len(a | b)
        # both docs order elements by one shared global key (identity here)
        sa_list, sb_list = sorted(a), sorted(b)
        ra = {v: i for i, v in enumerate(sa_list)}
        rb = {v: i for i, v in enumerate(sb_list)}
        for v in sorted(a & b):
            keep = text._occ_positional_keep(
                np.array([ra[v]]), np.array([rb[v]]),
                np.array([len(a)]), np.array([len(b)]), tau,
            )[0]
            ub = min(ra[v], rb[v]) + min(len(a) - ra[v], len(b) - rb[v])
            assert ub >= inter  # the bound itself is valid
            if jac >= tau:
                assert keep, (trial, v, ra[v], rb[v], len(a), len(b), inter)


def test_interpolate_partition_edges():
    """Sandwich-join kernel edges: tie at equal ts (view at purchase ts
    counts as prev, max event_id wins; next must be strictly later),
    missing either neighbor drops the purchase, empty partition
    round-trips the schema."""
    import numpy as np
    import pyarrow as pa

    from planet_data_analyzer_ray.stages.timeseries import interpolate_partition

    t0 = np.datetime64("2024-01-01T00:00:00", "us")

    def ts(mins):
        return t0 + np.timedelta64(mins * 60_000_000, "us")

    rows = [
        # user 1: views at t0 (v=10) and t10 (v=30); purchases at t5
        # (interp 20), at t0 (tie: prev = the t0 view, next = t10),
        # and at t10 (no strictly-later view -> dropped)
        (1, 100, ts(0), "view", 10.0),
        (1, 101, ts(0), "view", 12.0),   # same ts, larger eid -> wins as prev
        (1, 110, ts(10), "view", 30.0),
        (1, 200, ts(5), "purchase", 0.0),
        (1, 201, ts(0), "purchase", 0.0),
        (1, 202, ts(10), "purchase", 0.0),
        # user 2: purchase before any view -> dropped
        (2, 300, ts(5), "purchase", 0.0),
        (2, 310, ts(6), "view", 1.0),
    ]
    tab = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    out = interpolate_partition(tab).to_pydict()
    got = {
        pid: (pv, nv, vi)
        for pid, pv, nv, vi in zip(
            out["purchase_id"], out["prev_view_id"], out["next_view_id"], out["value_interp"]
        )
    }
    # purchase 200 at t5: prev = eid 101 (v=12 at t0), next = 110 (v=30 at t10)
    assert got[200] == (101, 110, 12.0 + (30.0 - 12.0) * 0.5)
    # purchase 201 at t0: prev = the tied view with MAX eid (101), ratio 0
    assert got[201] == (101, 110, 12.0)
    # purchase 202 at t10 has no strictly-later view; user 2 has no prior view
    assert 202 not in got and 300 not in got
    empty = interpolate_partition(tab.slice(0, 0))
    assert empty.num_rows == 0 and empty.schema.names == [
        "user_id", "purchase_id", "prev_view_id", "next_view_id", "value_interp",
    ]


# --- exact chunk-level substring dedup (chunk_emit / chunk_dup_partials) ----


def _chunk_ref(docs):
    """Pure-Python reference over BYTE chunks: per doc_id the number of
    non-overlapping CHUNK_LEN-byte chunks whose bytes occur in >= 2
    distinct docs, counting every occurrence."""
    L = text.CHUNK_LEN
    occ = {}  # chunk -> set of doc ids
    per_doc = []  # (doc_id, [chunks])
    for i, d in enumerate(docs):
        b = d.encode("utf-8")
        chunks = [b[j : j + L] for j in range(0, len(b) - L + 1, L)]
        per_doc.append((i, chunks))
        for c in chunks:
            occ.setdefault(c, set()).add(i)
    return {
        i: sum(1 for c in chunks if len(occ[c]) >= 2)
        for i, chunks in per_doc
        if chunks
    }


def test_chunk_dedup_kernels_match_reference():
    L = text.CHUNK_LEN
    docs = [
        "A" * L + "B" * L,            # 0: shares both chunks with doc 1
        "A" * L + "B" * L + "tail",   # 1
        "C" * L + "C" * L,            # 2: within-doc repeat only -> NOT dup
        "short",                      # 3: no full chunk
        "",                           # 4: empty
        "é" * (L // 2) + "A" * L,     # 5: 2-byte chars -> chunk grid shifts
        "é" * (L // 2) + "A" * L,     # 6: identical to 5 -> both chunks dup
        "D" * (2 * L - 1),            # 7: tail byte ignored, one chunk
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    emitted = text.chunk_emit(batch, num_partitions=1)
    # total chunk count = sum of len(bytes)//L
    exp_total = sum(len(d.encode()) // L for d in docs)
    assert emitted.num_rows == exp_total
    partials = text.chunk_dup_partials(emitted.drop_columns(["__part"]))
    got = dict(
        zip(
            partials.column("doc_id").to_pylist(),
            partials.column("nd").to_pylist(),
        )
    )
    ref = {k: v for k, v in _chunk_ref(docs).items() if v}
    assert got == ref
    # multi-partition split must reproduce the single-partition result:
    # chunk routing is content-hashed, so equal chunks land together
    emitted4 = text.chunk_emit(batch, num_partitions=4)
    merged: dict[int, int] = {}
    for p in range(4):
        part = emitted4.filter(
            pa.compute.equal(emitted4.column("__part"), p)
        ).drop_columns(["__part"])
        t = text.chunk_dup_partials(part)
        for d, n in zip(
            t.column("doc_id").to_pylist(), t.column("nd").to_pylist()
        ):
            merged[d] = merged.get(d, 0) + n
    assert merged == ref


def test_chunk_emit_empty_and_all_short():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["tiny", ""], type=pa.string()),
        }
    )
    out = text.chunk_emit(batch, num_partitions=8)
    assert out.num_rows == 0
    assert out.schema.names == ["chunk", "doc_id", "__part"]
    empty = text.chunk_dup_partials(out.drop_columns(["__part"]))
    assert empty.num_rows == 0
