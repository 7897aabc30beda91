"""Partition-count independence — the reproducibility claim, asserted.

At 100 TB the shuffle partition count is a tuning knob that changes
per cluster and per AQE decision; results must not.  Every aggregate
in the repo is engineered to be associative-exact (DECIMAL sums,
integerized errors, integer hash sampling), so the SAME query at a
hostile partition count must produce byte-identical oracle-green
results.  A query that leaks partitioning (double sums, first()/head
nondeterminism, rand()) fails here first.
"""

from __future__ import annotations

import pytest

from fortymhz_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMALL
from tests.diffcheck import compare, make_oracle_conn

# Queries whose shapes could plausibly leak partitioning: float
# aggregation, window cumsum, pandas UDF batch boundaries, explode
# fan-out, hash sampling, iterative collect.
SENSITIVE = [
    "q1_pricing_summary",
    "q_docs_quality",
    "q_pandas_udf_revenue",
    "q_events_sessionize",
    "q_emb_label_centroids",
    "q_vec_int8_quant_error",
    "q_pipeline_curation",
    "q_search_bm25",
    "q_pack_sequences",
    "q_mixture_upsample",
    "q_events_grouped_pandas_stats",
    "q_pack_export",
    # round-3 derived-oracle forms: checksum aggregation (simhash),
    # mapInPandas partition folds (heavy hitters), driver-loop
    # iteration + invariant booleans (kmeans), subset/recall joins
    "q_docs_simhash_near_dups",
    "q_sketch_heavy_hitters",
    # soft-EM unigram: driver-local forward-backward over a
    # distributed word count — the count (and so the model and every
    # invariant) must not depend on partitioning
    "q_docs_unigram_soft_encode",
    "q_vec_kmeans",
    "q_emb_near_dup_lsh_subset",
    "q_docs_jaccard_blocked",
    # round-4 curation queries: centroid-seeding collect + subset/recall
    # joins (semantic dedup), explode fan-out + double-ordered window
    # (tfidf), explode + occurrence-df join (bigram familiarity),
    # global window max + per-row sqrt (mixture temperature)
    "q_emb_semantic_dedup",
    "q_docs_tfidf_top_terms",
    "q_docs_bigram_familiarity",
    "q_mixture_temperature",
    # minhash-lane aggregation under hostile partitioning: the min is
    # order-independent by algebra, these two pin it stays so through
    # the banded join and the estimate/cross-split post-processing
    "q_docs_minhash_estimate",
    "q_docs_decontaminate_fuzzy",
    # fused multi-column aggregate (countDistinct x4 + stringified
    # min/max) and fixed-bounds bucketing under hostile partitioning
    "q_profile_orders",
    "q_histogram_quantity",
    # bloom words collect (the bit_or aggregate must be partition-
    # count-invariant) and the map-only classifier fold
    "q_docs_decontaminate_bloom",
    "q_docs_quality_classifier",
    # per-round TakeOrdered(1) top-pair selection under hostile
    # partitioning (total tie order must make it partition-invariant)
    "q_docs_bpe_merges",
    # round-5: bucketed-array classifier fold (map-only, but the
    # per-lang SUM must stay associative-exact), broadcast-vocab
    # classifier (explode + left join + per-doc agg), arrow-batched
    # BPE encode (pandas-UDF batch boundaries + TakeOrdered vocab
    # collect), and the snapshot MERGE (write partitioning + anti-join
    # + unionByName must not leak into the graded aggregate)
    "q_docs_classifier_trained",
    "q_docs_vocab_classifier",
    "q_docs_bpe_encode_stats",
    "q_snapshot_merge_orders",
    # DSIR: the two fit aggregates feed driver-computed weights — the
    # bucket counts (and so the whole weight table and selection) must
    # be identical under hostile partitioning
    "q_docs_dsir_selection",
    # span removal: distinct-doc block frequencies + the posexplode/
    # rebuild positions must survive hostile partitioning byte-for-byte
    "q_docs_strip_boilerplate",
    # incremental maintenance: the signed delta aggregate + full-outer
    # refresh join must reproduce the direct aggregate at any
    # partition count
    "q_snapshot_incremental_agg",
    # hybrid retrieval: both retrievers' float score chains + global
    # top-20 ranks + the fusion aggregate must be partition-invariant
    "q_docs_hybrid_search",
    # unigram tokenizer: the word-count collect feeding driver EM and
    # the Viterbi encode must be identical under hostile partitioning
    "q_docs_unigram_encode_stats",
    # prototype pruning: kmeans driver loop (decimal-exact means) +
    # per-cluster row_number window — the keep/drop partition must be
    # bit-stable at any partition count (expr assignment contract)
    "q_emb_prototype_prune",
    # gopher repetition: the scan is _spread (repartitioned) before
    # the per-row folds — integer cross-multiplied flags must not
    # notice the partitioning
    "q_docs_gopher_repetition",
    # round-7: alignment-free span dedup — banned-shingle frequencies
    # (distinct-doc counts), the per-doc run-merge window, and the
    # union coverage must all survive hostile partitioning
    "q_docs_span_dedup",
    # approx profile: HLL++ sketch merges are commutative, so the NDV
    # estimates (and the band booleans) must be partition-invariant
    "q_profile_orders_approx",
    # derived-corpus C4 grade: the in-plan re-lining + line folds are
    # map-only; the single-row combine must not notice partitioning
    "q_docs_c4_rules_derived",
    # tokenizer artifact: train → publish → load → encode — the merge
    # table collect and the loaded-artifact encode must be identical
    # under hostile partitioning
    "q_docs_bpe_persisted",
    # span decontamination: eval shingle-set semi join + run merge +
    # union coverage, total output — partitioning must not move a row
    "q_docs_decontaminate_spans",
    # round-8: the strip half — the rebuilt text (token filter against
    # per-doc span lists) must be byte-identical at any partition count
    "q_docs_strip_contaminated_spans",
    # token-budget selection: the two-phase cutoff (driver-side prefix
    # over per-bucket sums + one in-bucket window) must pick the SAME
    # docs at any partition count — the kept set is pure integer
    # arithmetic on ids and token counts
    "q_docs_token_budget_sample",
    # reverse contamination audit: distinct-(id, shingle) reductions +
    # hash join + per-eval aggregates — exact counts at any partitioning
    "q_docs_contamination_report",
    # cross-source matrix: collect_set is sort_array-canonicalized and
    # the pair counts are exact — identical at any partitioning
    "q_docs_source_overlap",
    # distributed training: the epoch-synchronous integer batch update
    # must produce identical weights at any partition count
    "q_docs_classifier_training",
]

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.fixture(scope="module")
def oracle_con():
    return make_oracle_conn(SF_SMALL)


@pytest.mark.parametrize("name", SENSITIVE)
def test_oracle_green_at_hostile_partition_count(spark, oracle_con, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        problems = compare(_QUERIES[name](spark, SF_SMALL), oracle_con, _ORACLES[name])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert not problems, problems[:5]


ENGINE_HASH_GATE = [
    "q_docs_minhash_near_dups",
    "q_docs_simhash_near_dups",
    "q_emb_ann_lsh",
    "q_emb_ann_ivf",
    # trained-codebook / coarse-cell candidates are engine-internal
    # the same way
    "q_emb_ann_pq",
    "q_emb_ann_ivfpq",
    # all-auto index sizing resolves knobs from a corpus count —
    # counts are partition-invariant, so the output must be too
    "q_emb_ann_ivfpq_auto",
    # NB on the ivfpq rows: their coarse assignment rides the arrow
    # batch-matmul default, whose raw cell ids are NOT contractually
    # bit-stable across partitionings (BLAS sum-order ulp flips,
    # similarity.py docstring) — but the GRADED output here is
    # (query_id, n_exact, recall_ok) booleans with measured recall
    # margins of 0.3-0.5 above the bounds, so a single boundary-cell
    # flip cannot change a row.  If this test ever flakes on these
    # rows after a fixture regeneration, re-measure the margins before
    # suspecting the operator.
    #
    # round-7: serving from the persisted artifact must be exactly as
    # run-deterministic as the in-process fit it mirrors (plus the
    # identity boolean must hold at any partition count), and the
    # incremental-dedup path's banded join against persisted lanes
    # must emit the same verified pairs under hostile partitioning
    "q_emb_ann_ivfpq_persisted",
    "q_docs_incremental_dedup",
    # round-8: serving from the persisted ENCODED corpus reads its
    # candidate codes from parquet — the served rows (and the
    # identical_to_inplan boolean) must hold at any partition count
    "q_emb_ann_ivfpq_codes",
    # and from the incrementally EXTENDED codes table likewise
    "q_emb_ann_codes_extend",
    # round-9: serving after a TOMBSTONE delete (and the
    # no-deleted-id boolean) must hold at any partition count, and
    # the drift report's fit/stale/refit inequalities are driver-side
    # scalars over deterministic fits — identical at any partitioning
    "q_emb_ann_codes_delete",
    "q_emb_ann_drift_report",
    # late round-9: the PCA fit's integer-moment partials make the
    # whole model (and thus every graded boolean) bit-identical at
    # any partition count — the module's core discipline
    "q_emb_pca_audit",
    # and the moments lifecycle's byte-identity booleans with it
    "q_emb_pca_incremental",
    # round-10/11 lifecycle rows, same discipline: residual/OPQ
    # serving rides trained codebooks (+ the rotation literal), the
    # refit queries re-run the whole fit lifecycle per call into
    # fresh temp dirs (deterministic fits → identical versions and
    # booleans), the tuner's sample is a deterministic hash-spread
    # stride, and the filtered pair serves from cached meta codes —
    # every one must return byte-identical rows under hostile
    # partitioning
    "q_emb_ann_ivfpq_residual",
    "q_emb_ann_opq",
    "q_emb_ann_refit",
    "q_emb_ann_refit_tombstone",
    "q_emb_ann_tuned",
    "q_emb_knn_filtered",
    "q_emb_ann_filtered",
]


@pytest.mark.parametrize("name", ENGINE_HASH_GATE)
def test_engine_hash_queries_are_run_deterministic(spark, name):
    """Queries whose internals ride engine-specific hashes (xxhash64
    signatures, RP bucket codes) carry derived-invariant oracles since
    round 3, but the oracle can't see the intermediate candidate sets —
    so additionally pin: two runs (one at a hostile partition count)
    return EXACTLY the same rows — hashes/seeds are data-derived,
    never partition- or time-derived."""
    first = sorted(map(tuple, _QUERIES[name](spark, SF_SMALL).collect()))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        second = sorted(map(tuple, _QUERIES[name](spark, SF_SMALL).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert first == second
