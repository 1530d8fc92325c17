"""Driver-facing workload: paired (Spark query, DuckDB oracle SQL).

Each entry maps a SURVEY §2 operator onto the driver-provided tables
(TESTDATA.md).  Numeric determinism policy (so the driver's value-hash
matches bit-for-bit):

- Sums of money/value columns go through ``DECIMAL(18,4)`` — decimal
  addition is exact and order-independent, so Spark's partial aggregation
  across 32 partitions and DuckDB's sequential scan produce identical
  results.  Final values are cast back to DOUBLE (exact conversion).
- Transcendental outputs (log/exp/pow ratios, corr, RMSE) are rounded to
  6 decimals AFTER the final division/log, where the engines' FP noise is
  ~1e-12 — far below the 5e-7 rounding boundary.
- Threshold comparisons against aggregated values always compare decimals,
  never raw double sums (a double sum landing exactly on the threshold
  would be engine-order dependent).
- When a ROUNDED mean of gridded values is emitted (q83): the exact
  decimal sum over an integer count lands exactly ON the half-way
  rounding boundary for some groups, where Spark's shortest-repr
  BigDecimal HALF_UP and DuckDB's double-arithmetic round disagree —
  scale to integers (nanos) right after the per-element rounding and do
  the final round-half-up as integer division ``(2N + d) div (2d)`` in
  BOTH engines.  Also: never scale a SUMMED decimal by 1e9 in Spark
  (decimal(38,9) × int clamps at precision 38 and rounds) — scale the
  per-element decimal(19,9) BEFORE the sum, where precision headroom is
  exact.
- Timestamps are returned as epoch-second BIGINTs, never raw timestamps.
- Every ranking window carries a unique tie-breaker column.

Round-6 continued additions to the idiom set (all proven hash-exact):

- Regression fits (q108/q109) reduce to SUFFICIENT STATISTICS — five
  exact decimal(38,18) sums — with the closed-form slope/intercept/r2
  as one double expression each.  Degenerate-variance guards compare
  an exact COUNT(DISTINCT y), never ``vy > 0`` on a double (FP noise
  makes that engine-dependent when the true value is 0).
- Ordered selections encode multi-key orders as ONE exact BIGINT
  (q105: (1e6-score)*1e10+id; q112: fraction*1e12 div + dense gid) or
  one string (md5 || zero-padded id) so the distributed ranged cumsum
  orders on a single column.
- Deterministic sampling thresholds stay in md5-hex space: literal
  rates as 6-hex-char prefixes (lexicographic compare), RUNTIME rates
  via format_string('%06x', floor(rate*16^6)) with the 'g' sentinel at
  rate >= 1 (q113); numeric uniforms come from the per-nibble
  instr-based hex->int (q110 — cast each term to BIGINT: ANSI-mode
  instr() is 32-bit and nibble*16^7 overflows it).
- Media fingerprints emitted to the driver hash are EXACT integer
  functions of the decoded samples (q111's windowed energy contour);
  DCT-based hashes (pHash) stay pytest-gated — transcendental per-
  pixel math has no portable SQL form.

Round-7 additions to the idiom set (all proven hash-exact):

- Decimal PRODUCTS cap the operand precision at (18,9): a
  (19,9)×(19,9) product wants precision 39, which Spark clamps to
  (38,17) — silently rounding the 18th fractional digit — while
  DuckDB keeps the exact (38,18).  At (18,9) the product is (37,18),
  exact on both engines (q108/q109's sufficient-statistic sums).
- Distributed RANK over a multi-key order: encode the order as ONE
  range-partitionable struct key ((-count), term) and cumsum a unit
  weight through ranged_cumsum — row_number without a single-
  partition window (q108's vocab rank).
- Possibly-NEGATIVE rounded means shift per-element nanos by +1
  before the exact integer round-half-up division and subtract the
  shift after — Spark's `div` truncates toward zero while DuckDB's
  `//` floors, so they only agree on non-negative numerators (q122's
  mean cosine).
- Runtime sampling rates round HALF-UP (floor(x·16^6 + 0.5)) in both
  the literal and dynamic threshold builders, keep-all decisions come
  from EXACT integer/decimal cross-multiplies (never a double landing
  on 1.0), and non-integer rate WEIGHTS (sqrt allocations) are rounded
  to the 1e-9 grid and summed as DECIMAL(19,9) before the double
  division (q113, q121).

Round-7 continued (late-round, all proven hash-exact):

- HOT-PATH order-free sums quantize with ``floor(x*1e9 + 0.5)`` cast
  to BIGINT — pure double ops + floor, IEEE-identical in Spark/
  DuckDB/Python, with NO per-element BigDecimal (per-row
  ``ROUND(x, 9)``/decimal casts measured ~2x whole-query time on the
  kmeans/cohesion centroid updates at sf1).  Keep the
  round-then-decimal idiom only on dim-sized tables (vocab nanos),
  and project those onto the DIM side of the join so they run once
  per term, not once per corpus row (q83) — but do NOT pre-join a
  MULTI-join vocab side into one nano table: that serializes its
  broadcast-build chain ahead of the fact probe (measured 2.3x on
  q106; flat joins let every vocab broadcast build concurrently).
- ``alpha = 1/2^m`` power weights run as iterated IEEE ``sqrt`` —
  correctly rounded on every engine, NO transcendental grid at all;
  integer quota arithmetic stays in DECIMAL(38,0)/HUGEINT with
  largest-remainder leftovers ranked on the bounded group dim (q131).
- Rank-fusion scores are FIXED left-to-right sums of ``1/(k + rank)``
  double divisions over integer ranks — spelled with CAST(... AS
  DOUBLE) literals in the oracle so DuckDB cannot route them through
  exact DECIMAL (q133, the q127 rule).

Round-9 additions to the idiom set:

- NEGATIVE-ZERO normalization: ``ROUND(x, 6)`` of a tiny negative
  ratio (e.g. -2e-10) yields ``-0.0`` in DuckDB but ``+0.0`` in Spark
  (BigDecimal HALF_UP drops the sign), and the driver's value hash
  distinguishes them.  Any rounded SIGNED ratio that can land on zero
  gets ``+ 0.0`` appended on BOTH engines (IEEE: -0.0 + 0.0 = +0.0,
  every other value unchanged) — spelled ``+ CAST(0 AS DOUBLE)`` in
  the oracle so the zero cannot parse as DECIMAL (q197 rel_error,
  retrofitted to q194).
"""

from __future__ import annotations

from rainforest_spark.workload import extended, relational, text, vectors

_MODULES = [relational, text, vectors, extended]

#: Gate-window priority.  The external driver samples the FIRST 50
#: entries of ``queries()`` in iteration order for its hard correctness
#: gate (CORRECTNESS_r*.json); rounds 1-2 left everything registered
#: after slot 49 ungated.  Queries without a green driver row yet come
#: first; long-proven trivial entries are demoted past slot 50 (they
#: remain fully covered by tests/test_oracle_parity.py).
_PRIORITY = [
    # =================== ROUND-14 GATE WINDOW (50) ==================
    # Composition (the r13 steady-state rule: oldest driver rows
    # first).  Freshness before this round: r9×11, r10×50, r11×50,
    # r12×50, r13×50 — so the window is the 11 remaining r9-vintage
    # rows (the trivial scalar/window entries deferred by the r13
    # window, now at the head so the debt retires) plus 39 of the 50
    # r10-vintage rows.  The 11 r10 rows deferred to round 15 are the
    # trivial relational entries whose operator families all carry a
    # FRESH r13 driver row: q02_time_range_projection +
    # q04_threshold_clamp + q06_consistency_filter +
    # q08_segment_exclusion (simple-filter family: q07 r13, q11 r13),
    # q03_sentinel_to_null (codec/null-map family: q31 r13),
    # q05_dedup_distinct (distinct family: q40 r13),
    # q15_table_summary (scan-agg family: q01/q17 r13),
    # q19_hourly_complete (calendar-fill family: q35 r13),
    # q21_contingency (contingency-table family: q188 r13),
    # q28_set_ops (set-op family: q10/q11 r13),
    # q38_left_join_nulls (join family: q09/q12/q13 r13).
    # All 11 stay exact-parity-gated via tests/test_oracle_parity.py;
    # tests/test_gate_rotation forbids silent debt.  A green round
    # leaves NO driver row older than r10.
    #
    # --- stale re-checks: latest green row r9 (all 11 remaining) ---
    "q20_dense_rank", "q23_mode", "q25_lead_fill",
    "q29_string_funcs", "q30_datetime_funcs", "q32_json_extract",
    "q37_group_first", "q41_token_count", "q42_quality_score",
    "q43_lang_id", "q44_ngram_jaccard",
    # --- stale re-checks: latest green row r10 (39 of 50) ---
    "q14_nearest_centroid", "q34_scatter_score",
    "q36_local_supplier_revenue", "q45_minhash_lsh",
    "q50_cosine_topk", "q51_centroid_classify", "q53_prepare_input",
    "q54_auto_embedding_neardup", "q55_bucketed_perfscores",
    "q56_polar_grid_sql", "q57_ivf_ann_topk", "q58_polar_masks",
    "q59_simhash_neardup", "q60_rollup_subtotals",
    "q61_zphi_attenuation", "q65_status_noise_mask",
    "q66_qpe_evaluation", "q67_hzt_fallback_chain",
    "q69_tfidf_top_terms", "q70_multimodal_resize",
    "q71_png_rgb_decode", "q72_jpeg_decode", "q73_wav_decode",
    "q74_frame_sample", "q75_sequence_packing",
    "q76_deterministic_split", "q77_quantized_cosine_topk",
    "q78_document_chunking", "q79_quality_signals",
    "q80_decontamination", "q81_domain_mixture",
    "q197_quantile_sketch", "q198_kmv_cardinality",
    "q199_kmv_token_overlap", "q200_kmv_overlap_matrix",
    "q201_kmv_added_vocab", "q202_kmv_weighted_volume",
    "q203_ann_recall", "q204_latency_bands_sketch",
]

#: The ROUND-13 window this one replaced, kept for the rotation record:
_PRIORITY_R13 = [
    # =================== ROUND-13 GATE WINDOW (50) ==================
    # Composition (VERDICT r12 "Next round" #1): the 2 r12 late
    # additions with NO driver row ever first — q208 (the scalable-
    # Bloom slab-1 modulus/extra-hash math) and q209 (the J12
    # nearest-gate ray fill; J12 moves test→pass on its first green
    # row — the last §2 family whose oracle lacked driver evidence);
    # then the 9 r8-vintage rows deferred by the round-12 window;
    # then 39 of the 50 r9-vintage rows.  The 11 r9 rows deferred to
    # round 14 are the trivial scalar/window entries whose expression
    # trees are hash-verified transitively (the r7 precedent), each
    # with an in-window or fresher family sibling:
    # q20_dense_rank (ranking-window family q157, r12),
    # q23_mode + q37_group_first (argmax/first-by-order family q39,
    # in-window), q25_lead_fill (lead/lag fill family q35, in-window;
    # q167, r12), q29_string_funcs + q30_datetime_funcs +
    # q32_json_extract (trivial scalar functions, demoted on the same
    # grounds in r7; exercised transitively via q127/q159/q158/q169,
    # all r12), q41_token_count (token-count family q117 r11,
    # q108 r12), q42_quality_score (quality family q109/q102/q120,
    # r11; q132 in-window), q43_lang_id (scored-text family q120,
    # r11), q44_ngram_jaccard (n-gram band family q144, in-window).
    # All 11 stay exact-parity-gated via tests/test_oracle_parity.py;
    # tests/test_gate_rotation forbids silent debt.  A green round
    # leaves NO driver row older than r9 and the rotation queue EMPTY
    # (every registered query driver-checked at least once).
    #
    # --- never driver-checked (2, the r12 late additions) ---
    "q208_bloom_slab_membership", "q209_ray_gap_fill",
    # --- stale re-checks: latest green row r8 (all 9 remaining) ---
    "q53_bucketed_prepare", "q111_audio_fingerprint",
    "q112_interleave", "q116_length_batches",
    "q121_stratified_sample", "q132_relative_quality",
    "q133_hybrid_rrf", "q141_rollup_report", "q144_fuzzy_match",
    # --- stale re-checks: latest green row r9 (39 of 50) ---
    "q01_pricing_summary", "q07_wet_hour_filter",
    "q09_broadcast_dim_join", "q10_semi_align", "q11_anti_join",
    "q12_asof_join", "q13_latest_per_hour", "q16_db_logmean",
    "q17_temporal_multiagg", "q18_weighted_vertical",
    "q22_sessionization", "q24_transfer_function",
    "q26_sliding_disagg", "q27_weighted_quantile",
    "q31_dn_discretization", "q33_perfscores",
    "q35_hourly_interpolation", "q39_argmax_linked_agg",
    "q40_fingerprint_dedup", "q46_simhash", "q47_ann_lsh_topk",
    "q48_energy_distance", "q49_multimodal_decode",
    "q52_grid_composite", "q54_embedding_neardup",
    "q62_vpr_correction", "q63_minhash_verified_neardup",
    "q64_bpe_token_count", "q68_neardup_clusters",
    "q187_calibration_curve", "q188_cohens_kappa",
    "q189_cumulative_gains", "q190_mutual_information",
    "q191_embedding_covariance", "q192_lsh_calibration",
    "q193_readability", "q194_hll_cardinality",
    "q195_bloom_membership", "q196_cms_heavy_hitters",
]

#: Registered queries with no driver row yet that do NOT fit the
#: current window — every entry here must be consumed by a future
#: rotation (tests/test_gate_rotation.py enforces that a new query is
#: either in-window, already driver-checked, or listed here).
_QUEUED_FOR_ROTATION: list[str] = [
    # Empty as of round 13: q208/q209 rotated into the window above.
    # Any NEW oracle-paired query that lands after the window is
    # frozen goes here (the r12 pattern) and rotates next round.
]

#: The ROUND-12 window this one replaced, kept for the rotation record:
_PRIORITY_R12 = [
    # --- never driver-checked (1, new in r12) ---
    "q207_station_gates_lut",
    # --- stale re-checks: latest green row r7 (all 8 remaining) ---
    "q150_session_paths", "q151_rolling_active",
    "q152_survival_curve", "q153_fd_violations",
    "q154_integrity_audit", "q155_benford_profile",
    "q156_market_basket", "q157_percentile_rank",
    # --- stale re-checks: latest green row r8 (41 of 50) ---
    "q108_zipf_fit", "q110_weighted_sample", "q119_source_overlap",
    "q122_label_cohesion", "q123_containment_pairs",
    "q124_embedding_novelty", "q126_perplexity_buckets",
    "q127_bm25_topk", "q131_temperature_mixture",
    "q134_paragraph_dedup", "q139_interval_join",
    "q143_scd2_intervals", "q158_cadence_gaps", "q159_inverted_index",
    "q160_spearman_corr", "q161_auc_contrast", "q162_ks_statistic",
    "q163_ab_contrast", "q164_rfm_segments", "q165_attribution",
    "q166_triangle_census", "q167_lead_lag", "q168_psi_drift",
    "q169_ohlc_bars", "q170_quantile_normalize", "q171_nearest_site",
    "q172_component_census", "q173_zorder_cells",
    "q174_seasonal_anomaly", "q175_linear_attribution",
    "q176_seasonal_naive_error", "q177_latency_bands",
    "q178_pareto_frontier", "q179_jackknife_mean",
    "q180_item_similarity", "q181_concordance", "q182_brand_frontier",
    "q183_cuped_contrast", "q184_wilson_ci", "q185_density_clusters",
    "q186_entropy_profile",
]

#: The ROUND-11 window before that, kept for the rotation record:
_PRIORITY_R11 = [
    # --- never driver-checked (2, new in r11) ---
    "q205_outlier_tile", "q206_kmv_novelty_report",
    # --- stale re-checks: latest green row r6 (all 26 remaining) ---
    "q82_domain_cap", "q83_unigram_logprob", "q84_epoch_shard",
    "q85_jl_projection", "q86_pii_redaction", "q87_embedding_dedup",
    "q88_corpus_stats", "q89_packed_tapes", "q90_hard_negatives",
    "q91_pmi_bigrams", "q92_repeated_spans",
    "q93_semantic_decontamination", "q94_vocab_coverage",
    "q95_span_excision", "q96_dsir_weights", "q97_incremental_dedup",
    "q98_domain_terms", "q99_corpus_drift", "q100_novelty_score",
    "q101_leakage_free_split", "q102_boilerplate_removal",
    "q103_cluster_canonical", "q104_margin_alignment",
    "q105_token_budget", "q106_bigram_logprob", "q107_kmeans_clusters",
    # --- stale re-checks: latest green row r7 (22 oldest of 30) ---
    "q109_heaps_fit", "q113_dedup_rebalance", "q114_corpus_diff",
    "q115_duplication_profile", "q117_tokenizer_fertility",
    "q118_masking_plan", "q120_source_scorecard",
    "q125_scatter_density", "q128_length_histogram",
    "q129_source_concentration", "q130_type_token_ratio",
    "q135_funnel", "q136_retention_cohorts",
    "q137_transition_matrix", "q138_conversion_latency",
    "q140_rolling_zscore", "q142_textrank_keywords",
    "q145_time_weighted_mean", "q146_dyadic_ewma",
    "q147_cusum_changepoints", "q148_winsorized_stats",
    "q149_mad_profile",
]

#: The ROUND-10 window before that, kept for the rotation record:
_PRIORITY_R10 = [
    # --- never driver-checked (8) ---
    "q197_quantile_sketch", "q198_kmv_cardinality",
    "q199_kmv_token_overlap", "q200_kmv_overlap_matrix",
    "q201_kmv_added_vocab", "q202_kmv_weighted_volume",
    "q203_ann_recall", "q204_latency_bands_sketch",
    # --- stale re-checks: latest green row r5 (all 18 remaining) ---
    "q19_hourly_complete", "q21_contingency",
    "q36_local_supplier_revenue", "q38_left_join_nulls",
    "q50_cosine_topk", "q51_centroid_classify",
    "q55_bucketed_perfscores", "q56_polar_grid_sql", "q58_polar_masks",
    "q59_simhash_neardup", "q60_rollup_subtotals",
    "q65_status_noise_mask", "q69_tfidf_top_terms",
    "q70_multimodal_resize", "q71_png_rgb_decode", "q72_jpeg_decode",
    "q73_wav_decode", "q74_frame_sample",
    # --- stale re-checks: latest green row r6 (24 of 50) ---
    "q02_time_range_projection", "q03_sentinel_to_null",
    "q04_threshold_clamp", "q05_dedup_distinct",
    "q06_consistency_filter", "q08_segment_exclusion",
    "q14_nearest_centroid", "q15_table_summary", "q28_set_ops",
    "q34_scatter_score", "q45_minhash_lsh", "q53_prepare_input",
    "q54_auto_embedding_neardup", "q57_ivf_ann_topk",
    "q61_zphi_attenuation", "q66_qpe_evaluation",
    "q67_hzt_fallback_chain", "q75_sequence_packing",
    "q76_deterministic_split", "q77_quantized_cosine_topk",
    "q78_document_chunking", "q79_quality_signals",
    "q80_decontamination", "q81_domain_mixture",
]

#: The ROUND-9 window, kept for the rotation record:
_PRIORITY_R9 = [
    # =================== ROUND-9 GATE WINDOW (50) ===================
    # Composition: the 10 queries with NO driver CORRECTNESS row ever
    # (the round-8 sketch/calibration family — VERDICT r8 "Next round"
    # #1) first; a green round closes the rotation invariant: every
    # registered query driver-verified at least once (198/198
    # cross-round union).  Then the 40 STALEST re-checks — the driver
    # regenerates testdata between rounds, so old green rows decay as
    # evidence: all 10 r2-vintage rows, all 6 r4-vintage rows, and 24
    # family representatives from the 42 r5-vintage rows (flagship
    # pricing, broadcast/as-of/latest-run joins, db-logmean,
    # temporal/vertical/sessionized aggs, disagg + weighted quantile
    # windows, DN codec, perfscores + energy distance, interpolation,
    # argmax, exact/simhash/minhash-verified/cluster dedup, LSH ANN,
    # multimodal decode, grid composite, VPR correction, embedding
    # near-dup).  Every query outside the window stays exact-parity-
    # gated via tests/test_oracle_parity.py, and
    # tests/test_gate_rotation.py now FAILS if a registered query is
    # neither driver-checked, in-window, nor explicitly queued.
    #
    # --- never driver-checked (10) ---
    "q187_calibration_curve", "q188_cohens_kappa",
    "q189_cumulative_gains", "q190_mutual_information",
    "q191_embedding_covariance", "q192_lsh_calibration",
    "q193_readability", "q194_hll_cardinality",
    "q195_bloom_membership", "q196_cms_heavy_hitters",
    # --- stale re-checks: latest green row r2 (10) ---
    "q07_wet_hour_filter", "q10_semi_align", "q11_anti_join",
    "q20_dense_rank", "q23_mode", "q25_lead_fill", "q29_string_funcs",
    "q30_datetime_funcs", "q32_json_extract", "q64_bpe_token_count",
    # --- stale re-checks: latest green row r4 (6) ---
    "q24_transfer_function", "q37_group_first", "q41_token_count",
    "q42_quality_score", "q43_lang_id", "q44_ngram_jaccard",
    # --- stale re-checks: latest green row r5 (24 of 42, family
    # representatives; the other 18 stay pytest-parity-gated with
    # in-window siblings: q21→q33/q48 scores, q36/q38→q09/q12 joins,
    # q50/q51→q54/q47 similarity, q55→q33, q56/q58/q65→q52/q62 radar,
    # q59→q46, q60→q141's r8 row, q69→q41/q83 text, q70-q74→q49
    # codecs) ---
    "q01_pricing_summary", "q09_broadcast_dim_join", "q12_asof_join",
    "q13_latest_per_hour", "q16_db_logmean", "q17_temporal_multiagg",
    "q18_weighted_vertical", "q22_sessionization", "q26_sliding_disagg",
    "q27_weighted_quantile", "q31_dn_discretization", "q33_perfscores",
    "q35_hourly_interpolation", "q39_argmax_linked_agg",
    "q40_fingerprint_dedup", "q46_simhash", "q47_ann_lsh_topk",
    "q48_energy_distance", "q49_multimodal_decode", "q52_grid_composite",
    "q54_embedding_neardup", "q62_vpr_correction",
    "q63_minhash_verified_neardup", "q68_neardup_clusters",
]

#: The ROUND-8 window before that, kept for the rotation record:
_PRIORITY_R8 = [
    # =================== ROUND-8 GATE WINDOW (50) ===================
    # Composition: the 30 queries with NO driver CORRECTNESS row ever
    # (q141 + q158-q186 — the round-7 analytics family; VERDICT r7
    # "Next round" #1) first, then 20 r7-green keepers chosen so every
    # demoted operator family keeps a hash-gated representative AND the
    # round-8 ranged_cumsum rewrite's consumers stay in-window (q108,
    # q110, q112, q116, q126, q132 + incoming q160/q164/q170/q178).
    # Every demoted query stays exact-parity-gated via
    # tests/test_oracle_parity.py (the full local replica of the
    # driver gate; 188/188 green).
    #
    # --- never driver-checked (30) ---
    "q141_rollup_report", "q158_cadence_gaps", "q159_inverted_index",
    "q160_spearman_corr", "q161_auc_contrast", "q162_ks_statistic",
    "q163_ab_contrast", "q164_rfm_segments", "q165_attribution",
    "q166_triangle_census", "q167_lead_lag", "q168_psi_drift",
    "q169_ohlc_bars", "q170_quantile_normalize", "q171_nearest_site",
    "q172_component_census", "q173_zorder_cells", "q174_seasonal_anomaly",
    "q175_linear_attribution", "q176_seasonal_naive_error",
    "q177_latency_bands", "q178_pareto_frontier", "q179_jackknife_mean",
    "q180_item_similarity", "q181_concordance", "q182_brand_frontier",
    "q183_cuped_contrast", "q184_wilson_ci", "q185_density_clusters",
    "q186_entropy_profile",
    # --- keepers (20, all r7-green): bucketed radar path, ranged-rank
    # + OLS, sampling, multimodal codec, ordered interleave, packing,
    # contamination matrix, stratified mixture, embedding cohesion /
    # containment / novelty, grouped ranked quality + perplexity,
    # BM25 + RRF retrieval, temperature quotas, paragraph dedup,
    # interval join, SCD-2, blocked fuzzy match ---
    "q53_bucketed_prepare", "q108_zipf_fit", "q110_weighted_sample",
    "q111_audio_fingerprint", "q112_interleave", "q116_length_batches",
    "q119_source_overlap", "q121_stratified_sample",
    "q122_label_cohesion", "q123_containment_pairs",
    "q124_embedding_novelty", "q126_perplexity_buckets", "q127_bm25_topk",
    "q131_temperature_mixture", "q132_relative_quality", "q133_hybrid_rrf",
    "q134_paragraph_dedup", "q139_interval_join", "q143_scd2_intervals",
    "q144_fuzzy_match",
    # Round-8 additions past the window (q187 calibration curve, q188
    # Cohen's kappa, q189 cumulative gains, q190 mutual information)
    # are exact-parity-gated via tests/test_oracle_parity.py and
    # vanilla-probed at sf0.001/0.01/0.1; they queue for a future
    # window rotation.
]

#: The ROUND-7 window this one replaced, kept for the rotation record:
_PRIORITY_R7 = [
    # =================== ROUND-7 GATE WINDOW (50) ===================
    # Composition: 12 never-driver-checked entries first, then 12
    # stale re-checks (latest green row r2-r4 — the driver regenerates
    # testdata between rounds, so old green rows decay as evidence),
    # then 26 in-window keepers chosen so every operator family whose
    # other members were demoted keeps at least one hash-gated
    # representative.  ALL demoted queries stay exact-parity-gated via
    # tests/test_oracle_parity.py (the full 120-query local replica of
    # the driver gate).
    #
    # --- never driver-checked: round-6 additions + the bucketed
    # physical-design variant (driver-hash-proving the Exchange-free
    # prepare_input path content-identical, VERDICT r6 #7) ---
    "q108_zipf_fit", "q109_heaps_fit", "q110_weighted_sample",
    "q111_audio_fingerprint", "q112_interleave",
    "q113_dedup_rebalance", "q114_corpus_diff",
    "q115_duplication_profile", "q116_length_batches",
    "q117_tokenizer_fertility", "q118_masking_plan",
    "q53_bucketed_prepare",
    # --- stale re-checks (oldest-first; green r2-r4).  Six of the
    # original twelve (q42, q29, q30, q32, q20, q23 — trivial scalar/
    # window entries, and q42's feature expressions are now hash-
    # verified transitively through in-window q132) were demoted for
    # the six late-round-7 additions below; all six stay pytest-
    # parity-gated ---
    # (the remaining r2-r4 stale re-checks — q44, q13, q24, q25 — and
    # the r6-green q14 were demoted for the five new operators below;
    # all five stay pytest-parity-gated, and their families keep
    # in-window representatives: dedup via q45/q97/q123, the radar
    # chain via q53/q61/q66, ranking via q34)
    # --- late round-7 additions (never driver-checked): corpus
    # distribution diagnostics + temperature quotas + per-source
    # relative quality + hybrid RRF retrieval ---
    "q128_length_histogram", "q129_source_concentration",
    "q130_type_token_ratio", "q131_temperature_mixture",
    "q132_relative_quality", "q133_hybrid_rrf",
    # --- round-7 continued: MassiveText paragraph-level dedup with
    # reassembly (admitted by demoting q84_epoch_shard, r6-green — the
    # packing family keeps q89/q101/q116 in-window), the single-shuffle
    # conversion funnel and the cohort-retention rollup over events
    # (admitted by demoting q86_pii_redaction and
    # q67_hzt_fallback_chain, both r6-green and pytest-parity-gated;
    # the radar chain keeps q53/q61/q66 + q14/q34 in-window) ---
    "q134_paragraph_dedup", "q135_funnel", "q136_retention_cohorts",
    # --- round-7 continued: event-transition matrix + conversion-
    # latency quantiles (admitted by demoting the stale re-checks
    # q41_token_count and q43_lang_id — their expression trees are
    # hash-verified transitively through in-window q117/q132/q120,
    # and both stay pytest-parity-gated) ---
    "q137_transition_matrix", "q138_conversion_latency",
    # --- round-7 continued: keyless point-in-interval join (time-
    # bucket expansion), pure-integer rolling z-score anomaly gate,
    # hierarchical ROLLUP report, exact-integer TextRank keyword
    # PageRank, SCD-2 validity intervals ---
    "q139_interval_join", "q140_rolling_zscore",
    "q142_textrank_keywords", "q143_scd2_intervals",
    # --- round-7 embedding / retrieval / corpus-health additions
    # (never driver-checked) ---
    "q124_embedding_novelty", "q126_perplexity_buckets",
    "q127_bm25_topk", "q123_containment_pairs",
    "q119_source_overlap", "q120_source_scorecard",
    "q121_stratified_sample", "q122_label_cohesion",
    "q125_scatter_density",
    # --- round-7 continued-4 (never driver-checked): blocked fuzzy
    # entity matching, exact TWAP, dyadic EWMA, CUSUM drift, winsorized
    # stats, MAD profile, session paths, rolling actives, Kaplan-Meier
    # survival, and the data-quality family (FD audit, referential
    # integrity, Benford) ---
    "q144_fuzzy_match", "q145_time_weighted_mean", "q146_dyadic_ewma",
    "q147_cusum_changepoints", "q148_winsorized_stats",
    "q149_mad_profile", "q150_session_paths", "q151_rolling_active",
    "q152_survival_curve", "q153_fd_violations", "q154_integrity_audit",
    "q155_benford_profile", "q156_market_basket", "q157_percentile_rank",
    # 80 registered queries lack ANY driver CORRECTNESS row but only
    # 50 fit; this window carries the 50 above.  Left for the round-8
    # rotation: q141_rollup_report (its ROLLUP machinery is driver-
    # verified via q60), q158/q159 (cadence gaps, inverted index),
    # the stats family q160-q165 (Spearman, AUC, KS, A/B chi-square,
    # RFM, attribution), q166/q167 (triangle census, lead-lag),
    # q168-q171 (PSI, OHLC, quantile normalize, nearest-site),
    # q172-q174 (component census, z-order cells, seasonal gate),
    # q175-q177 (linear attribution, naive forecast, bands),
    # q178/q179 (pareto frontier, jackknife), q180/q181 (item
    # similarity, concordance), q182 (brand frontier), q183 (CUPED)
    # q184 (Wilson intervals), q185 (density clusters) and q186
    # (entropy profile) — all
    # exact-parity-gated via tests/test_oracle_parity.py.  The
    # r6-green keepers rotated out (q54_auto, q87, q89, q95, q97,
    # q101, q102, q106, q53_prepare_input, q61, q66, q34, q45) also
    # stay pytest-gated and keep their bench-tier datapoints.
]


def _ordered(full: dict) -> dict:
    out = {k: full[k] for k in _PRIORITY if k in full}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _ordered(out)


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _ordered(out)
