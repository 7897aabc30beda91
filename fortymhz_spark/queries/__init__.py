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

Round 12 rotation (the r11 verdict's item #4 — spill promise first,
then changed-code re-grades, then oldest greens to fill 50):

1. THE ONE NEW ROUND-12 QUERY enters first:
   q_emb_ann_tuned_persisted — persisted serving knobs as artifact
   state (the r11 verdict's item #2: tune_ann_serving's accepted
   point recorded next to the (index, codes) version pair,
   load_ann_serving(tuning_dir=) defaulting to it, refit
   invalidation), with THREE oracle-recomputed raw columns
   (n_queries, n_corpus, n_coarse — item #8's standing bar).
2. THE ELEVEN ROUND-8 ROWS SPILLED FROM THE ROUND-11 GATE
   (q_dt_orbit_assembly … q_media_frame_sample — the r11
   docstring's immovable spill promise; the r11 verdict's item #4
   names them as leading this gate).
3. THE CHANGED-CODE RE-GRADES: q_emb_ann_tuned (tune_ann_serving's
   Knuth-hash sample is now reduced mod 2^31 before the multiply —
   the r12 advisor's ANSI int64-overflow fix; bit-identical for
   ids < 2^31 so the graded sample itself does not move — and the
   tuner gained the tuning_dir persistence arm) and q_emb_ann_ivfpq
   (ivfpq_knn's knob resolution gained the persisted-tuning default
   tier: explicit > tuned > formula).  Both were graded green in
   round 11; the code beneath them changed this round, so their
   checks renew NOW rather than riding PREVIOUSLY_GREEN.
4. THE FIRST 36 OF THE 50 ROUND-9 GREENS (the registry's oldest
   checks once round 11 landed), in their recorded order.

1 new + 11 spill-promise + 2 re-grades + 36 round-9 = 50 exactly.
The round-13 deferred bucket below is the FOURTEEN round-9 rows
that did not fit (q_events_view_to_purchase … q_vec_knn_arrow —
the next spill promise, they lead the round-13 gate) followed by
the 46 rows of the round-10 gate (CORRECTNESS_r10.json), whose
checks become the registry's oldest once this round lands.
PREVIOUSLY_GREEN holds the 48 rows of the round-11 gate not pulled
back for re-grade (CORRECTNESS_r11.json — the freshest checks).
Everything outside the gate stays covered by the local sf0.001
differential (tests/test_oracle_parity.py) either way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-12 gate (slots 1-50): 1 new + the 11-row round-11 spill
# promise + 2 changed-code re-grades + the first 36 round-9 greens
# (the oldest checks).  New round-12 queries insert at the FRONT;
# each spills the last round-9 row to the round-13 deferred bucket.
ROUND_GATE: tuple[str, ...] = (
    # —— NEW this round: persisted serving knobs as artifact state
    #    (r11 verdict item #2; three oracle-recomputed raw columns
    #    per the standing item-#8 bar) ——
    "q_emb_ann_tuned_persisted",
    # —— the round-11 spill promise (round-8 checks: oldest) ——
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
    # —— changed-code re-grades (tuner ANSI hash fix + persistence
    #    arm; ivfpq_knn's explicit > tuned > formula knob tier) ——
    "q_emb_ann_tuned",
    "q_emb_ann_ivfpq",
    # —— the first 36 round-9 greens (next-oldest checks) ——
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

# The rows deferring to round 13, in pick-up order: the fourteen
# round-9 rows this round's gate could not fit (the round-13 spill
# promise), then the 46 rows of the round-10 gate
# (CORRECTNESS_r10.json), whose checks become the registry's oldest
# once round 12 lands.
DEFERRED_TO_NEXT_ROUND: tuple[str, ...] = (
    # —— the 14 round-9 rows the round-12 gate could not fit (the
    #    round-13 spill promise) ——
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
    # —— the 46 rows of the round-10 gate (CORRECTNESS_r10.json) ——
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
)

# Driver-green rows outside the round-12 gate with the FRESHEST
# checks: the round-11 gate's 50 minus the two pulled back for
# changed-code re-grades (CORRECTNESS_r11.json).  The registry
# asserts gate ∪ deferred ∪ previously-green == all registered
# queries.
PREVIOUSLY_GREEN: tuple[str, ...] = (
    "q_emb_ann_refit_tombstone",
    "q_emb_ann_opq",
    "q_emb_ann_refit",
    "q_emb_ann_filtered",
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
