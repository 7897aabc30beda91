"""Query registry.

Each query module contributes ``(spark, sf_dir) -> DataFrame`` callables
plus (where SQL-expressible) a DuckDB oracle string with IDENTICAL
output column names and engine-portable value semantics (see
functions/exact.py for why aggregates go through DECIMAL).

``all_queries()`` / ``all_oracles()`` are what ``__spark_entry__``
exposes to the driver harness.

Registration order is EVIDENCE POLICY: the driver's correctness gate
grades exactly the first 50 registered queries per round.  Round 2
graded the north-star surfaces (45 green), round 3 the never-graded
long tail (50/50), round 4 completed the rotation (50/50), rounds 5-8
ran the steady-state policy (new + changed-code + the full deferred
bucket each round; 50/50 every time — see CORRECTNESS_r0{5..8}.json).

Round 13 rotation (the r12 verdict's item #2 — the named spill
promise leads, then changed-code re-grades, then oldest greens to
fill 50):

1. THE ONE NEW ROUND-13 QUERY enters first:
   q_emb_ann_rotation_auto — anisotropy-aware automatic rotation
   selection (the r12 verdict's item #1: rotation="auto" decides
   raw-vs-opq at build time from the training sample's
   contiguous-block moment-mass statistic against a pre-declared
   threshold, records decision + statistic + threshold as index
   geometry, byte-identical to the explicit modes), with THREE
   oracle-recomputed raw columns (n_corpus, n_coarse, rot_dim —
   the standing item-#8 bar).
2. THE FOURTEEN ROUND-9 ROWS SPILLED FROM THE ROUND-12 GATE
   (q_events_view_to_purchase … q_vec_knn_arrow — the r12
   docstring's immovable spill promise; the r12 verdict's item #2
   names them as leading this gate).
3. THE CHANGED-CODE RE-GRADES (code beneath each changed this
   round, so their checks renew NOW rather than riding
   PREVIOUSLY_GREEN): q_emb_ann_opq (the rotation fit path was
   refactored for "auto" — _sample_eig/_opq_rotation split,
   _pq_train's 4-tuple return, decision fields recorded in the
   artifact params), q_emb_ann_filtered (the codes-serving filter
   fallback gained the broad-filter guard and load_ann_codes now
   attaches the manifest row count), q_emb_ann_tuned_persisted
   (load_ann_tuning/load_ann_serving gained the lineage-search +
   pin-aware staleness resolution), q_emb_ann_tuned
   (tune_ann_serving's publish is now CAS-pinned), and
   q_emb_ann_ivfpq (ivfpq_knn's fit call and rotation conflict
   check changed for "auto").
4. THE FIRST 30 OF THE 46 ROUND-10 GREENS (the registry's oldest
   checks once round 12 landed), in their recorded order.

1 new + 14 spill-promise + 5 re-grades + 30 round-10 = 50 exactly.
The round-14 deferred bucket below is the SIXTEEN round-10 rows
that did not fit (q_docs_tfidf_top_terms … q_sql_revenue_by_nation
— the next spill promise, they lead the round-14 gate) followed by
the 46 rows of the round-11 gate not pulled back for re-grade
(CORRECTNESS_r11.json), whose checks become the registry's oldest
once this round lands.  PREVIOUSLY_GREEN holds the 47 rows of the
round-12 gate not pulled back for re-grade (CORRECTNESS_r12.json —
the freshest checks).  Everything outside the gate stays covered by
the local sf0.001 differential (tests/test_oracle_parity.py) either
way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-13 gate (slots 1-50): 1 new + the 14-row round-12 spill
# promise + 5 changed-code re-grades + the first 30 round-10 greens
# (the oldest checks).  New round-13 queries insert at the FRONT;
# each spills the last round-10 row to the round-14 deferred bucket.
ROUND_GATE: tuple[str, ...] = (
    # —— NEW this round: anisotropy-aware automatic rotation
    #    selection (r12 verdict item #1; three oracle-recomputed raw
    #    columns per the standing item-#8 bar) ——
    "q_emb_ann_rotation_auto",
    # —— the round-12 spill promise (round-9 checks: oldest) ——
    "q_events_view_to_purchase",
    "q_full_outer_daily_activity",
    "q_grouping_sets_flag_year",
    "q_mixture_upsample",
    "q_pack_sequences",
    "q_pandas_udf_revenue",
    "q_quantity_percentiles",
    "q_range_join_price_bands",
    "q_set_ops_nations",
    "q_shuffle_epochs",
    "q_snapshot_incremental_agg",
    "q_snapshot_merge_orders",
    "q_unpivot_part_sizes",
    "q_vec_knn_arrow",
    # —— changed-code re-grades (rotation="auto" fit-path refactor;
    #    broad-filter guard + manifest row count on the codes path;
    #    tuning lineage-search + pin-aware staleness; tuning CAS
    #    publish; ivfpq_knn fit call + rotation conflict check) ——
    "q_emb_ann_opq",
    "q_emb_ann_filtered",
    "q_emb_ann_tuned_persisted",
    "q_emb_ann_tuned",
    "q_emb_ann_ivfpq",
    # —— the first 30 round-10 greens (next-oldest checks) ——
    "q_emb_knn_filtered",
    "q_emb_pca_audit",
    "q_emb_pca_incremental",
    "q_window_lag_order_gap",
    "q_window_running_revenue",
    "q_docs_span_dedup",
    "q_docs_c4_rules_derived",
    "q_profile_orders_approx",
    "q_docs_bpe_persisted",
    "q_vec_kmeans",
    "q_emb_prototype_prune",
    "q_emb_ann_ivfpq_auto",
    "q13_order_count_distribution",
    "q_emb_semantic_keep_list",
    "q_text_repetition_stats",
    "q_chunk_token_windows",
    "q16_supplier_diversity",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q21_suppliers_kept_waiting",
    "q5_local_supplier_volume",
    "q_brand_volume",
    "q_cogroup_user_orders",
    "q_distinct_parts_per_flag",
    "q_docs_bigram_familiarity",
    "q_docs_decontaminate_bloom",
    "q_docs_decontaminate_fuzzy",
    "q_docs_jaccard_blocked",
    "q_docs_minhash_estimate",
    "q_docs_simhash_near_dups",
)

# The rows deferring to round 14, in pick-up order: the sixteen
# round-10 rows this round's gate could not fit (the round-14 spill
# promise), then the 46 rows of the round-11 gate not pulled back
# for re-grade (CORRECTNESS_r11.json), whose checks become the
# registry's oldest once round 13 lands.
DEFERRED_TO_NEXT_ROUND: tuple[str, ...] = (
    # —— the 16 round-10 rows the round-13 gate could not fit (the
    #    round-14 spill promise) ——
    "q_docs_tfidf_top_terms",
    "q_events_asof_last_order",
    "q_histogram_quantity",
    "q_mixture_temperature",
    "q_pack_export",
    "q_pipeline_curation",
    "q_pivot_flag_by_status",
    "q_profile_orders",
    "q_right_outer_order_counts",
    "q_rollup_returnflag_status",
    "q_salted_agg_volume",
    "q_scalar_functions",
    "q_search_bm25",
    "q_sketch_cardinality",
    "q_sketch_heavy_hitters",
    "q_sql_revenue_by_nation",
    # —— the 46 round-11-gate rows not re-graded this round
    #    (CORRECTNESS_r11.json, recorded order) ——
    "q_emb_ann_refit_tombstone",
    "q_emb_ann_refit",
    "q_emb_ann_ivfpq_residual",
    "q_text_crossdoc_blocks",
    "q_text_rarity_score",
    "q_top_customers",
    "q_vec_int8_quant_error",
    "q_window_top_orders_per_customer",
    "q_emb_ann_ivfpq_codes",
    "q_docs_strip_contaminated_spans",
    "q_docs_decontaminate_spans",
    "q_docs_incremental_dedup",
    "q_emb_ann_ivfpq_persisted",
    "q_emb_ann_ivf",
    "q_emb_ann_pq",
    "q_docs_strip_boilerplate",
    "q_emb_near_dup_pairs",
    "q_emb_label_centroids",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q_customer_order_counts_outer",
    "q_customers_without_orders",
    "q_docs_bpe_encode_stats",
    "q_docs_bpe_merges",
    "q_docs_bpe_token_stats",
    "q_docs_classifier_trained",
    "q_docs_decontaminate",
    "q_docs_dedup_groups",
    "q_docs_dsir_selection",
    "q_docs_exact_dedup",
    "q_docs_fingerprints",
    "q_docs_hybrid_search",
    "q_docs_lang_id_confusion",
    "q_docs_minhash_near_dups",
    "q_docs_ngram_jaccard_pairs",
    "q_docs_pii_stats",
    "q_docs_quality",
    "q_docs_quality_classifier",
    "q_docs_stratified_sample",
    "q_docs_token_stats",
    "q_docs_vocab_classifier",
    "q_dt_channel_occupancy",
    "q_dt_custom_source_occupancy",
    "q_dt_hits_per_orbit",
)

# Driver-green rows outside the round-13 gate with the FRESHEST
# checks: the round-12 gate's 50 minus the three pulled back for
# changed-code re-grades (CORRECTNESS_r12.json).  The registry
# asserts gate ∪ deferred ∪ previously-green == all registered
# queries.
PREVIOUSLY_GREEN: tuple[str, ...] = (
    "q_dt_orbit_assembly",
    "q_dt_streaming_occupancy",
    "q_events_dedup_ingest",
    "q_events_grouped_pandas_stats",
    "q_events_json_props",
    "q_events_latest_per_user",
    "q_events_sessionize",
    "q_events_sliding_1h_30m",
    "q_media_decode_stats",
    "q_media_features",
    "q_media_frame_sample",
    "q_emb_ann_codes_delete",
    "q_emb_ann_drift_report",
    "q_emb_ann_codes_extend",
    "q_docs_token_budget_sample",
    "q_docs_quality_yield_curve",
    "q_docs_contamination_report",
    "q_docs_source_overlap",
    "q_docs_classifier_training",
    "q10_returned_items",
    "q11_important_suppliers",
    "q12_shipping_delay",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q20_part_share_suppliers",
    "q22_wealthy_inactive_customers",
    "q2_min_cost_supplier",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q_cube_flag_status",
    "q_date_functions",
    "q_docs_c4_rules",
    "q_docs_gopher_repetition",
    "q_docs_gopher_rules",
    "q_docs_top_terms",
    "q_docs_unigram_encode_stats",
    "q_docs_unigram_soft_encode",
    "q_dt_event_time_span",
    "q_emb_ann_lsh",
    "q_emb_knn_bruteforce",
    "q_emb_near_dup_lsh_subset",
    "q_emb_semantic_dedup",
    "q_events_hourly_by_type",
    "q_events_user_enrichment",
    "q_events_value_stats",
)


def _merged() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from fortymhz_spark.queries import (
        curation,
        dt,
        events,
        lakehouse,
        llm,
        media,
        tpch,
        tpch_deep,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (llm, curation, lakehouse, dt, media, events, tpch, tpch_deep):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLE)
    return queries, oracles


def all_queries() -> dict[str, QueryFn]:
    queries, _ = _merged()
    missing = [n for n in ROUND_GATE if n not in queries]
    assert not missing, f"ROUND_GATE names not registered: {missing}"
    accounted = set(ROUND_GATE) | set(DEFERRED_TO_NEXT_ROUND) | set(
        PREVIOUSLY_GREEN
    )
    unaccounted = [n for n in queries if n not in accounted]
    assert not unaccounted, (
        "new query registered without a gate-policy decision (add it to "
        f"ROUND_GATE or DEFERRED_TO_NEXT_ROUND): {unaccounted}"
    )
    rest = [n for n in queries if n not in ROUND_GATE]
    ordered = list(ROUND_GATE) + rest
    assert len(ordered) == len(queries)
    return {n: queries[n] for n in ordered}


def all_oracles() -> dict[str, str]:
    queries, oracles = _merged()
    order = list(all_queries())
    return {n: oracles[n] for n in order if n in oracles}
