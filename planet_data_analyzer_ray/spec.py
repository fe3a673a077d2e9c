"""Deterministic corpus specification — the single source of truth.

The engine's input is a table of image+caption pairs
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` (BASELINE.json ``input_hint``).  In this
sandbox we synthesise that corpus deterministically from the driver's
TPC-H-ish parquet tables, using *pure integer arithmetic* so that every
derived value can be reproduced bit-for-bit by a DuckDB SQL oracle:

- ``images``      <- one image per ``lineitem`` row (the big fact table)
- ``satellites``  <- ``supplier``      (dimension, broadcast side)
- ``land_cover``  <- ``part``          (polygon layer; ref: LandCoverClass,
                                        /root/reference/database/db.py:248-253)
- ``cities``      <- ``customer``      (point + 30km-analog buffer; ref:
                                        db.py:227-245)
- ``countries``   <- ``nation``        (big polygons; ref: db.py:208-224)

Coordinate system
-----------------
A planar lon/lat world, lon in [-170, 170], lat in [-66, 66] (no
antimeridian / pole wraparound).  All coordinates are derived as
*integer milli-degrees* and converted with the single expression
``md / 1000.0 - OFFSET`` so numpy and DuckDB produce bit-identical
doubles.  The reference's equal-area EPSG:3035 math
(db.py:73-84,150-158) is modelled by a fixed scale:
``area_sqkm = width_deg * height_deg * KM2_PER_DEG2``.

Mixing function
---------------
``mix(key, mult, salt) = (key*mult + salt) % 2147483647`` (MINSTD-style
LCG step).  ``key`` for images is ``l_orderkey*8 + l_linenumber``
(injective: l_linenumber in 1..7).  All products stay far below 2^63.
"""

from __future__ import annotations

MOD = 2147483647  # 2^31 - 1

# World bounds (milli-degrees spans) -------------------------------------
LON_SPAN_MD = 340_000  # lon in [-170, 170)
LAT_SPAN_MD = 132_000  # lat in [-66, 66)
LON_OFF = 170.0
LAT_OFF = 66.0

# Equal-area scale: 1 deg x 1 deg "equals" this many km^2 (fixed, planar).
KM2_PER_DEG2 = 12364.0
# exact-geometry queries accumulate areas in INTEGER squared
# milli-degrees (md^2) and convert with ONE float multiply, so the Ray
# sum and the DuckDB oracle sum agree bit-for-bit regardless of order
KM2_PER_MD2 = KM2_PER_DEG2 / 1e6

# Image key packing: key = ((l_orderkey*8 + l_linenumber)*32768 +
# l_partkey)*1024 + l_suppkey.  Unique at sf>=0.01; residual collisions
# (tiny sf) yield bit-identical derived rows, so both engine and oracle
# see the same multiset.  Mix input is key % MOD (keeps products < 2^63).
KEY_LN_MULT = 8
KEY_PART_MULT = 32768   # l_partkey < 32768 at sf<=0.1
KEY_SUPP_MULT = 1024    # l_suppkey < 1024 at sf<=0.1

# time_acquired = TIME_EPOCH + (mix % TIME_SPAN_HOURS) hours
TIME_EPOCH = "1994-01-01 00:00:00"
TIME_SPAN_HOURS = 70128  # 8 years
ST_TIME = (40014, 27)

# caption = 'img-<key>-' + chr(65+mix%26) + chr(65+mix2%26)
ST_CAP1 = (48271, 61)
ST_CAP2 = (69621, 67)

# Image streams: (mult, salt) per derived field --------------------------
ST_LON = (48271, 11)
ST_LAT = (69621, 23)
ST_HW = (16807, 7)       # footprint half-width, milli-degrees
ST_CLOUD = (40692, 3)
ST_CLEAR = (25173, 9)
ST_PH_HI = (48271, 101)
ST_PH_LO = (69621, 103)
ST_W = (16807, 13)
ST_H = (16807, 17)

HW_MIN_MD = 50           # half-width in [0.05, 0.199] deg
HW_MOD = 150
IMG_WH_MIN = 16          # image pixel dims in [16, 64]
IMG_WH_MOD = 49

# Duplicate synthesis (ref ON CONFLICT DO NOTHING, db.py:65-70): every
# key % DUP_EVERY == 0 image is re-emitted with page_idx=1 and a
# perturbed clear_confidence; exact dedup must keep page_idx=0.
DUP_EVERY = 7

# Land cover (from part) -------------------------------------------------
LC_GRID_DEG = 4          # base cell size, deg (engine res-5 analog)
LC_NX = 85               # 340 / 4
LC_NY = 33               # 132 / 4
ST_LC_CELL = (48271, 31)
ST_LC_MX0 = (16807, 37)
ST_LC_MX1 = (16807, 41)
ST_LC_MY0 = (16807, 43)
ST_LC_MY1 = (16807, 47)
LC_MARGIN_MOD = 1500     # margins in [0, 1.5) deg -> box width >= 1 deg
FEATURECLASSES = ["Urban area", "River", "Lake", "Forest", "Cropland"]

# Zones (from part): NON-RECTANGULAR layer — right triangles in 4 deg
# cells, 4 orientations.  Exercises the exact polygon-refinement path
# of the spatial joins (the all-rect layers take the bbox fast path).
ST_ZN_CELL = (40692, 107)
ST_ZN_MX0 = (25173, 109)
ST_ZN_MX1 = (25173, 113)
ST_ZN_MY0 = (25173, 127)
ST_ZN_MY1 = (25173, 131)
ST_ZN_OR = (30323, 137)  # orientation: which corner holds the right angle
ZONECLASSES = ["Residential", "Industrial", "Agricultural", "Protected"]

# Multi-part zones (from part): MULTIPOLYGON layer — each zone is TWO
# axis-aligned rects, one in each horizontal half of its hashed 4 deg
# cell.  Exercises the multi-part (any-part-intersects) refinement path
# the reference's Natural Earth country MultiPolygons need
# (/root/reference/database/db.py:208-224, test_db_i.py:234).
ST_MZ_CELL = (48271, 151)
ST_MZ_AX0 = (16807, 157)
ST_MZ_AX1 = (16807, 163)
ST_MZ_AY0 = (16807, 167)
ST_MZ_AY1 = (16807, 173)
ST_MZ_BX0 = (25173, 179)
ST_MZ_BX1 = (25173, 181)
ST_MZ_BY0 = (25173, 191)
ST_MZ_BY1 = (25173, 193)
MZ_MARGIN_MOD = 700  # margins in [0, 0.7) deg inside each 2-deg half

# Rotated footprints (from lineitem): the image square rotated about its
# centroid by one of 4 exact-rational (Pythagorean) angle classes —
# POLYGON probe geometries that are NOT axis-aligned boxes, exercising
# the probe-side exact refinement (reference footprints are arbitrary
# quads, data.py:223-234 'geometry').  Class 0 (no rotation) keeps the
# bbox fast path live inside the same dataset.
ST_ROT = (30323, 197)
ROT_COS = (1.0, 3.0 / 5.0, 5.0 / 13.0, 8.0 / 17.0)
ROT_SIN = (0.0, 4.0 / 5.0, 12.0 / 13.0, 15.0 / 17.0)

# Satellites: pixel resolution attribute (reference db.py:91 Satellite.
# pixel_res; data.py:228 float(properties['pixel_resolution'])).
ST_PXRES = (48271, 139)   # pixel_res = (mix % 46 + 5)/10.0 -> 0.5..5.0 m

# Deterministic train/val/test split (training-data pipeline op):
# bucket = mix % 100; < SPLIT_TRAIN_PCT -> train, < SPLIT_VAL_PCT -> val,
# else test.  Hash-based so the assignment is stable under re-runs,
# resharding and distributed execution order.
ST_SPLIT = (40014, 199)
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 90

# Deterministic per-group sampler: per satellite keep the SAMPLE_K rows
# with the smallest (mix, key) — a stable uniform-without-replacement
# sample whose winners are identical on any cluster size / shard layout.
ST_SAMPLE = (48271, 211)
SAMPLE_K = 5

# Composed corpus-cleaning pipeline thresholds (integer-exact forms:
# stop_cnt * 100 <= CLEAN_MAX_STOP_PCT * n_tokens)
CLEAN_MIN_TOKENS = 30
CLEAN_MAX_STOP_PCT = 15

# Filtered vector search: restrict the corpus side to labels meeting
# the predicate (label % ANN_FILTER_MOD == ANN_FILTER_REM)
ANN_FILTER_MOD = 2
ANN_FILTER_REM = 0

# Join-result sampling (cf. "Random Sampling Over Spatial Range Joins",
# ICDE 2025): a deterministic uniform sample = the JOIN_SAMPLE_K pairs
# with the smallest pair hash — computable as a streaming top-k over
# the join output, never materializing the full result.
ST_PAIR_SAMPLE = (2654435761, 227)
JOIN_SAMPLE_K = 512

# KMV (k-minimum-values) distinct sketch: hash stream + k.  The hash is
# the deterministic spec mix, so the ESTIMATE itself is bit-exactly
# mirrorable in SQL — a cardinality sketch with an oracle.  The
# multiplier must wrap MOD many times even for SMALL inputs (day
# indexes < 4096) or the hash isn't uniform on [0, MOD) and the
# estimator collapses; 2654435761 * 4096 covers ~5000 wraps.
ST_KMV = (2654435761, 911)
KMV_K = 64

# Cities (from customer) -------------------------------------------------
ST_CITY_LON = (48271, 51)
ST_CITY_LAT = (69621, 53)
CITY_RADIUS_DEG = 0.27   # 30 km analog of db.py:243-245 ST_Buffer(30000)

# Countries (from nation): 5 x 5 grid of 68 x 26.4 deg boxes -------------
CTRY_NX = 5
CTRY_W_MD = 68_000
CTRY_H_MD = 26_400

# Tiles (raster<->vector assignment): 0.25 deg fine grid -----------------
TILE_PER_DEG = 4.0
TILE_STRIDE = 2048       # tile_id = (tx+2)*TILE_STRIDE + (ty+2)
TILE_AREA_SQKM = KM2_PER_DEG2 / 16.0  # 772.75

# Coarse cells (engine join key, res-5 analog = 4 deg) -------------------
CELL_DEG = 4.0
CELL_STRIDE = 128        # cell_id = (cx+2)*CELL_STRIDE + (cy+2)

# kNN --------------------------------------------------------------------
KNN_K = 5
KNN_CITY_MOD = 5         # kNN runs for cities with city_id % 5 == 0

# Filters for the filtered-query suite (F1/F2/F3) ------------------------
FILTER_MAX_CLOUD = 0.3
FILTER_DATE_LO = "1994-01-01"
FILTER_DATE_HI = "1996-12-31"
FILTER_SAT_MOD = 4       # satellites with s_suppkey % 4 == 1 are selected
FILTER_SAT_REM = 1

# phash near-dup ---------------------------------------------------------
PHASH_BANDS = 4          # 4 x 16-bit bands over the low 62 bits
PHASH_HAMMING_MAX = 4

# ANN --------------------------------------------------------------------
ANN_QUERY_MOD = 50       # query vectors: vec_id % 50 == 0
ANN_TOPK = 10
ANN_ROUND = 6            # similarity rounded to 6 dp before ranking
EMB_DUP_SIM = 0.30       # same-label near-dup threshold

# Documents --------------------------------------------------------------
STOPWORDS = ["the", "a", "and", "of", "to", "in"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "y", "es"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order
MINHASH_PERMS = 64
MINHASH_BANDS = 8        # 8 bands x 8 rows
SHINGLE_K = 5
MINHASH_JACCARD_MIN = 0.5
# exact n-gram Jaccard near-dup: character shingles of NGRAM_WIDTH bytes
# (ASCII corpus -> an 8-byte window packs BIJECTIVELY into one uint64,
# so integer set semantics equal SQL substring set semantics exactly)
NGRAM_WIDTH = 8
# same near-dup family threshold as MINHASH_JACCARD_MIN: the exact query
# is the ground truth the MinHash sketch approximates.  Also the lever
# that makes prefix filtering effective: at tau=0.5 candidates must
# share rare shingles, so common-word buckets never generate pairs.
NGRAM_JACCARD_MIN = 0.5
NGRAM_DF_CAP = 4096      # prefix buckets hotter than this are dropped (logged)
# partition counts for the jaccard exchanges: shingle-hash partitions
# for DF / verify colocation, doc-hash partitions for prefix emit, and
# shingle-hash partitions for PAIR generation.  Swept at sf0.1/32 cpus
# (round 3): pair parts trade exchange volume (a near-dup pair emits one
# partial row per partition it co-occurs in, so more parts = more rows)
# against per-task sort size and parallelism — 64 beat 16/32/128/256;
# shingle parts feed the DF stage AND the survivor-verify pass, where
# 128 beat 64/256 (the verify kernel is the widest stage).  Env
# overrides let a deployment retune per cluster shape.
import os as _os

NGRAM_SHINGLE_PARTS = int(_os.environ.get("GRAFT_NGRAM_SHINGLE_PARTS", "128"))
NGRAM_DOC_PARTS = int(_os.environ.get("GRAFT_NGRAM_DOC_PARTS", "64"))
NGRAM_PAIR_PARTS = int(_os.environ.get("GRAFT_NGRAM_PAIR_PARTS", "64"))

# BPE-ish regex tokenizer (RE2-safe simplification of the GPT-2 pattern:
# contractions, space-prefixed letter/digit runs, punctuation runs;
# whitespace itself is never a token — no lookahead, and Arrow and
# DuckDB both run RE2, so the match semantics are identical)
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"

# Multimodal frame sampling: treat the h×w payload as h frames of w
# bytes (video analog: frame = row); sample every K-th frame.
FRAME_SAMPLE_K = 4

# Sessionization (events) ------------------------------------------------
SESSION_GAP_MIN = 30

# Item/asset types (reference ItemType/AssetType M:N, db.py:180-205) -----
ITEM_TYPE_MOD = 4        # item_type_id = 'it-' + str(key % 4)
ST_ASSET = (30323, 71)   # asset j present iff bit j of mix set; 'analytic'
ASSET_TYPES = ["analytic", "visual", "udm"]  # bit 0 forced on (>=1 asset)

# AOI filter (F4 analog: a fixed area-of-interest polygon) ---------------
AOI_X0, AOI_Y0, AOI_X1, AOI_Y1 = -30.0, -20.0, 40.0, 30.0

# Thumbnail (multimodal resize op): nearest-neighbor to 8x8 --------------
THUMB = 8

# Bytes / decode ---------------------------------------------------------
# raw8  : pixel(i) = (key + i) % 256, row-major, w*h bytes (lossless)
# qraw8 : pixel(i) = ((key + i) % 256) & 0xFC  (lossy, 6-bit quant:
#         MSE = (0+1+4+9)/4 = 3.5 -> PSNR = 42.7 dB >= the 40 dB bound)
LOSSY_EVERY_MOD = 10     # key % 10 >= 8 -> fmt 'qraw8'
LOSSY_MASK = 0xFC

# grid DBSCAN: 2-degree centroid cells; cells with >= DBSCAN_MINPTS
# images are cores, 8-connected cores merge, occupied non-core cells
# adjacent to a core join its cluster (min label), rest are noise
DBSCAN_MINPTS = 4

# tile change detection: emit tiles whose mean decoded brightness moved
# by >= CHANGE_MILLI/1000 units between the two halves of the
# acquisition window (exact integer cross-multiplication test)
CHANGE_MILLI = 2000

# Paged live-source search (S1 Datasource; reference quick-search
# filters, api_importer/clients/data.py:143-203) ------------------------
PAGED_PAGE_SIZE = 8192
PAGED_MAX_CLOUD = 0.8
PAGED_DATE_LO = "1995-01-01 00:00:00"
PAGED_DATE_HI = "2000-12-31 00:00:00"
PAGED_ITEM_TYPES = ("it-0", "it-1", "it-2")

# BM25 keyword search (Lucene/Okapi variant; idf = ln((N-df+.5)/(df+.5)+1),
# tf-norm k1/b over |d|/avgdl).  Scores are per-(doc,term) floored to
# integer micros BEFORE the per-doc sum so the distributed sum is
# order-free (same trick as docs_tfidf).
BM25_QUERY_TERMS = ("spark", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

# K-means over embeddings (integer-lattice so every engine agrees
# bit-for-bit): vectors quantize to floor(e*KMEANS_QUANT) int64 once;
# assignment = exact int64 squared-L2 argmin (ties -> lowest cluster);
# update = floor(sum/count) per dim (empty cluster keeps its centroid).
KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_QUANT = 1000

# Bigram collocations (PMI): adjacent nonempty-token pairs; score =
# floor(ln((nab/tb) / ((na/t)*(nb/t))) * 1e6) over pairs with support
# >= PMI_MIN_COUNT; top PMI_TOPK by (pmi desc, a, b).
PMI_MIN_COUNT = 5
PMI_TOPK = 15

# Decontamination: benchmark set = documents with doc_id % DECON_BENCH_MOD
# == 0 (a deterministic stand-in for a held-out eval set); a probe doc
# (all other docs) is contaminated when it shares >= 1 word
# DECON_NGRAM-gram (adjacent nonempty tokens, space-joined) with any
# benchmark doc.  3-grams (not the production 8-13) because the
# synthetic corpus draws ~55 tokens/doc from a ~40-word vocabulary —
# wider windows make every doc trivially clean.
DECON_BENCH_MOD = 97
DECON_NGRAM = 3

# Token-window chunking (RAG / sequence-packing prep): each doc's
# nonempty-token stream split into fixed CHUNK_TOKENS windows; chunk
# text = tokens space-joined.
CHUNK_TOKENS = 32

# Hybrid retrieval: BM25 lexical top-k re-ranked by cosine similarity
# to the embedding of vec_id HYBRID_QUERY_VEC (docs without an
# embedding drop out — inner-join semantics); sim rounded to ANN_ROUND
# like every cosine in the engine.
HYBRID_QUERY_VEC = 0

# Integer-lattice PageRank over the phash near-dup graph: r0 = SCALE//N;
# r_{t+1}(v) = (15*SCALE)//(100*N) + sum over in-edges (u,v) of
# (r_t(u)*85)//(100*deg(u)); PAGERANK_ITERS fixed iterations.  Exact
# integer arithmetic -> bit-exact chained-CTE oracle (kmeans pattern).
PAGERANK_SCALE = 10**12
PAGERANK_ITERS = 3

# k-core peel over the phash near-dup graph (image_kcore): drop every
# node with degree < KCORE_K, cascade for at most KCORE_ROUNDS
# SIMULTANEOUS sweeps.  The sweep cap is part of the operator
# definition — engine and oracle run the identical fixed chain, so the
# result is exact even on a chain that hasn't converged by the cap
# (peeling is monotone: converged sweeps are no-ops).
KCORE_K = 3
KCORE_ROUNDS = 12

# IDW interpolation surface (grid_idw_cloud): grid nodes every
# IDW_STEP_MD millidegrees; an image's centroid contributes to every
# node within IDW_RADIUS_MD (radius <= step, so the 3x3 node
# neighborhood with an exact d2 filter is complete).  Integer kernel
# w = IDW_WNUM // (IDW_WEPS + d2_md2) keeps the whole aggregate on the
# int64 lattice: order-free sums -> bit-exact SQL mirror.
IDW_STEP_MD = 1000
IDW_RADIUS_MD = 1000
IDW_WNUM = 10**9
IDW_WEPS = 1000
# composite node key (gx+1)*IDW_KMULT + (gy+1); gy+1 spans
# [0, LAT_SPAN_MD//STEP + 2] so KMULT clears it with room
IDW_KMULT = 1024

# Hotspot detection (Getis-Ord-style, integer-exact): rank nonempty
# 1-deg cells by their 3x3 neighborhood count and keep the top
# HOTSPOT_TOPK (ties -> lowest grid_lon, then grid_lat).  A fixed-mean
# multiplier threshold is degenerate on sparse uniform grids (the max
# 9-cell mass never reaches 2x the naive mean), so the op is a ranking.
HOTSPOT_TOPK = 20

# Proximity-buffered re-capture: revisit pairs whose footprint boxes,
# each expanded by RECAPTURE_BUFFER_MD millidegrees, intersect.  Strict
# overlap is vacuous on this corpus (hw <= 0.064 deg, revisit pairs
# scatter globally), so the buffer makes the spatio-temporal
# refinement observable; comparisons stay exact integer md.
RECAPTURE_BUFFER_MD = 15000

# Heavy hitters: global top-k terms by count (ties lexicographic).
TOP_TERMS_K = 15

# IVF over the integer-lattice kmeans centroids: probe the IVF_LAT_PROBE
# nearest centroids per query (integer distance, ties lowest cid).  The
# whole index is deterministic, so this APPROXIMATE search has a
# bit-exact SQL oracle — the recall/efficiency trade is auditable.
IVF_LAT_PROBE = 3

# Sign-LSH ANN: 16 deterministic hyperplanes; multi-probe radius.  The
# sign is taken on round(dot, ANN_ROUND) (the engine-wide rounding
# convention) so BLAS-vs-serial summation ulps cannot flip a bucket bit
# near zero; the oracle mirrors both the literals and the rounding.
LSH_PLANES = 16
LSH_PROBE_HAMMING = 6

# SemDeDup-style semantic dedup (Abbas et al. 2023): vectors are
# bucketed by the SAME integer-lattice k-means coarse quantizer the IVF
# index uses; within each cluster a vector is dropped when an
# earlier-id vector has rounded cosine >= SEMDEDUP_SIM (keep-lowest-id
# rule; rounding = the engine-wide ANN_ROUND convention so the DuckDB
# mirror is bit-exact).  Cluster size bounds the pair work — at corpus
# scale K grows with the corpus so lists stay bounded (same assumption
# as the IVF index).
SEMDEDUP_SIM = 0.2

# Concat-then-chunk sequence packing (the standard LLM pretraining
# batching layout): documents concatenate in doc_id order and cut every
# PACK_CAP whitespace tokens; a doc belongs to the bin where it STARTS
# (bin = exclusive-prefix-token-count // PACK_CAP).
PACK_CAP = 512
# doc_id-range span per packing partition: the global prefix sum is two
# passes — per-span totals (bounded collect), then per-span local
# cumsum + broadcast span offsets.
PACK_SPAN = 1000

# Unigram-LM surprisal (CCNet-style quality signal without a model
# download): per (doc, term) contribution = tf * floor(-ln(cf/total) *
# 1e6) with cf = corpus term count — flooring each contribution to
# integer micros BEFORE the per-doc sum makes the sum order-free, the
# BM25/tfidf parity trick.
SURPRISAL_SCALE = 1_000_000

# SimHash near-dup: band LSH over the 64-bit signature (4 x 16-bit
# bands, same layout as the phash index); candidates = band matches,
# kept at hamming <= SIMHASH_HAMMING_MAX.  Like the phash op, the
# BAND-candidacy approximation is part of the op's definition and the
# oracle mirrors it exactly.
SIMHASH_BANDS = 4
SIMHASH_HAMMING_MAX = 16

# Deterministic global shuffle (training-export order): rank =
# mix(doc_id, ST_SHUFFLE); the shuffled "page" is the SHUFFLE_PAGE_K
# smallest (rank, doc_id) — a distributed top-k, identical on any
# cluster size / shard layout (the reproducible-shuffle requirement of
# a training-data export).
ST_SHUFFLE = (48271, 233)
SHUFFLE_PAGE_K = 200

# Spatial self-join density: per image, the number of OTHER images
# whose centroid lies within DENSITY_RADIUS_MD in BOTH axes (Chebyshev
# box — exact integer comparisons).  Grid-bucketed: cells of radius
# width, each image probes its 3x3 neighborhood, so pair work is
# bounded by local density (the classic grid self-join, never
# all-pairs).
DENSITY_RADIUS_MD = 500

# kNN-graph construction (image_knn_graph): for every image, its
# KNN_GRAPH_K nearest other images by exact integer squared Euclidean
# distance, among candidates within DENSITY_RADIUS_MD on both axes
# (the same Chebyshev box as image_density — the 3x3 grid neighborhood
# is complete for it).  Ties break on the neighbor key ascending.
KNN_GRAPH_K = 4

# --- Fixed-size distributed sketches (the 100-TB summaries) -------------

# Bloom-filter semi-join pushdown: the build side (urgent orderkeys)
# folds into a FIXED BLOOM_BITS bit array — the broadcast cost of the
# semi-join is constant in the build cardinality, unlike the exact key
# set.  K hash bits per key, one mix stream each; a probe row passes
# when all K bits are set.  False positives are part of the op's
# definition and the oracle mirrors them exactly.
BLOOM_BITS = 1 << 14  # sized to the synthetic corpus so the FP path
#                       is actually exercised (sf0.01 load ~0.4 -> ~7%
#                       FP); production would scale bits with the
#                       build-side cardinality estimate
ST_BLOOM = ((48271, 307), (69621, 311), (40692, 313))

# Count-min sketch (Cormode-Muthukrishnan): CMS_DEPTH rows of
# CMS_WIDTH counters; term cell = mix(term_key, row stream) % width;
# estimate = min over rows.  term_key is an order-free polynomial byte
# hash (sum of ascii * 31^i mod MOD over the first CMS_KEY_CHARS
# chars) so DuckDB can reproduce it with a position join + SUM.
CMS_WIDTH = 16  # deliberately narrower than the ~40-term synthetic
#                 vocab so cell collisions (the overestimate the min
#                 bounds) actually occur; production width >> vocab/eps
CMS_DEPTH = 3
ST_CMS = ((16807, 331), (25173, 337), (30323, 347))
CMS_KEY_CHARS = 32
CMS_POW31 = []  # filled below: 31^i % MOD, i < CMS_KEY_CHARS
_p = 1
for _ in range(CMS_KEY_CHARS):
    CMS_POW31.append(_p)
    _p = (_p * 31) % MOD
del _p
# the audited heavy hitters are the exact top TOP_TERMS_K (the
# top_terms op's output is the sketch's query set)

# HyperLogLog distinct(day) per satellite: m = 2^HLL_REG_BITS
# registers; value = (u^2 + u) % MOD with u = mix(day, ST_HLL) — the
# squaring is essential: an affine mix alone maps consecutive days to
# an arithmetic progression whose trailing-zero distribution is badly
# non-uniform (measured 2x overestimate); the quadratic residue step
# restores it (est/n within 0.88-1.19 at n = 500..50k).  register =
# value % m; rho = 1 + trailing zeros of (value // m), cap HLL_RMAX.
# estimate stays in exact integers: est = (HLL_ALPHA_PPM * m^2 *
# 2^HLL_RMAX) // (1e6 * sum(2^(HLL_RMAX - rho_j))), empty registers
# contributing 2^HLL_RMAX — order-free, so engine and oracle agree
# bit-for-bit (alpha_64 = 0.709 in ppm).
HLL_REG_BITS = 6
HLL_RMAX = 24
HLL_ALPHA_PPM = 709_000
ST_HLL = (48271, 353)

# Morton / Z-order locality index: centroid quantized to MORTON_BITS
# per axis (x = lon_md * 2^bits // LON_SPAN_MD), bits interleaved
# (x even lanes, y odd lanes); bucket = top MORTON_PREFIX_BITS of the
# 2*MORTON_BITS-bit code = a depth-4 quadtree page.  The write-order
# index a spatially-clustered sink would sort by.
MORTON_BITS = 8
MORTON_PREFIX_BITS = 8

# Weighted per-satellite sampling (Efraimidis-Spirakis analog, exact
# integers): priority = mix(key, ST_WSAMPLE) // (1 + clear), so
# clearer images win proportionally more often; keep the WSAMPLE_K
# lowest (priority, key) per satellite.
WSAMPLE_K = 5
ST_WSAMPLE = (69621, 359)

# Scene availability windows (interval op): a scene is "active" from
# its acquisition day through day + duration; duration = mix % 14 + 1
# days.  The daily active count is computed with a difference-array
# sweep (one +1/-1 delta pair per interval into a bounded 2923-slot
# array), NOT an interval x day join — the classic O(n) distributed
# interval-aggregate shape.
ST_AVAIL = (40692, 367)
AVAIL_DUR_MOD = 14

# Coverage-region analysis (grid connected components): occupied cells
# of an 0.5-degree grid (integer md // REGION_CELL_MD), 4-connected.
# The grid is bounded (680 x 264), so labeling runs on the dense array
# driver-side after a distributed occupied-cell reduce; the 0.5-degree
# resolution keeps occupancy below the site-percolation threshold at
# oracle scales so the SQL closure mirror stays tractable.
REGION_CELL_MD = 500
REGION_NY = 264  # LAT_SPAN_MD / REGION_CELL_MD

# Range-partition planner (the distributed sort's prep op): a
# deterministic hash sample of keys (rate 1/RP_SAMPLE_MOD) is
# collected and sorted; boundary i = sample[(i*n)//RP_BUCKETS] (1-based
# rank), i = 1..RP_BUCKETS-1; bucket(key) = #boundaries <= key.  At
# corpus scale the rate is chosen so the sample stays O(buckets *
# log), exactly how Spark/Ray sort partitioners sample.
ST_RPSAMPLE = (16807, 373)
RP_SAMPLE_MOD = 64
RP_BUCKETS = 32

# CMS join-cardinality estimation (AGMS-style inner product): |A join B|
# is estimated as min over rows of dot(cms_A_row, cms_B_row).  The
# integer-key variant uses a wider grid than the term sketch — the
# overestimate bias is ~|A||B|/width, so width must exceed |A||B|/true
# for a useful planner signal; 2^17 keeps the grid at ~3 MB fixed.
CMS_JOIN_WIDTH = 1 << 17

# Watermark / late-data accounting (streaming semantics): arrival
# order = event_id; watermark before event e = max ts of all earlier
# arrivals minus LATE_SLACK_US; e is LATE when its ts is below that.
# The global running max distributes as per-span maxima (span =
# event_id // EV_SPAN, a bounded table) -> driver exclusive cummax ->
# broadcast span offsets + local cummax per span partition — the
# docs_pack_bins two-pass prefix shape.
EV_SPAN = 1000
LATE_SLACK_US = 3_600_000_000  # 1 hour

# Adaptive quadtree tiling: a cell splits into its 4 children while
# its image count exceeds ADAPTIVE_SPLIT_MAX, down to res 7 — the
# variable-resolution tile layout that equalizes work per tile under
# spatial skew (dense AOIs split, oceans stay coarse).
ADAPTIVE_SPLIT_MAX = 30

# Distributed-sort ordinal probe: after the global (time, key) sort,
# every PROBE_STEP-th row (1-based ordinals 1, 1+step, ...) — the
# "inspect the sorted output at fixed ordinals" check a sort pipeline
# ships with.
PROBE_STEP = 997  # prime -> ordinals stride through block boundaries

# Batched box queries: NBOX deterministic lon/lat boxes answered in
# ONE corpus pass (broadcast query set, per-batch containment matrix,
# column-sum partials) — multi-tenant query amortization.
NBOX = 64
ST_BOX_X = (48271, 389)
ST_BOX_Y = (69621, 397)
BOX_W_MD = 20_000  # 20-degree query windows

# bright-run morphology: a pixel is "bright" when its stored value
# exceeds BRIGHT_T; sat_bright_runs counts maximal bright runs in each
# image's row-major stream (row boundaries break runs)
BRIGHT_T = 192

# Rare-bigram novelty filter: a bigram whose GLOBAL corpus count is
# <= RARE_BIGRAM_MAX is "rare"; a doc's rare_ppm (rare bigrams per
# million bigrams) is the fluency/novelty screen — high-rare docs are
# either genuinely novel or garbled (the cheap LM-perplexity proxy).
RARE_BIGRAM_MAX = 2

# Temporal autocorrelation of capture cadence: per (4-deg cell, day)
# image counts c, the raw autocorrelation sum(c[t]*c[t+lag]) per day
# lag 0..AUTOCORR_MAX_LAG, normalized against lag 0 in ppm — the
# revisit-periodicity detector.
AUTOCORR_MAX_LAG = 7
AUTOCORR_CELL_MD = 4000  # the LC 4-degree grid

# Best-IoU partner assignment: per image, the overlapping image with
# the highest exact integer-md^2 IoU (ties -> lowest partner key) —
# the detection-style match step (and the redundancy-pair picker).

# Product quantization (PQ-ADC): the embedding lattice splits into
# PQ_M subspaces of dim/PQ_M dims; each subspace gets a PQ_K-entry
# codebook (init = first PQ_K vectors, PQ_ITERS Lloyd refinements on
# the integer lattice).  Queries score candidates by the ADC table —
# exact int64 arithmetic end to end, so even the approximation is
# oracle-checked (the ann_ivf_lattice pattern).
PQ_M = 8
PQ_K = 16
PQ_ITERS = 2

# Polyline ("river") layer: one SEG_NSEG-segment polyline per nation,
# start point hashed, each step drawn from SEG_STEPS — every step has
# the SAME squared length SEG_LEN2, so point-to-segment squared
# distances scaled by the common denominator are pure int64 and the
# nearest-segment argmin is exactly comparable across segments (the
# reference's rivers layer, S6, as line geometry instead of boxes).
SEG_NSEG = 8
SEG_LEN2 = 25_000_000  # md^2; every SEG_STEPS entry satisfies dx^2+dy^2 = SEG_LEN2
SEG_STEPS = (
    (3000, 4000), (4000, 3000), (0, 5000), (5000, 0),
    (-3000, 4000), (-4000, 3000), (3000, -4000), (4000, -3000),
)
ST_SEG_X = (48619, 401)
ST_SEG_Y = (69427, 409)
ST_SEG_D = (50021, 419)

# segment proximity range join: images whose centroid lies within
# SEG_RADIUS_MD of a segment count toward that segment's corridor
SEG_RADIUS_MD = 5000
