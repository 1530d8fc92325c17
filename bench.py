#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].  Prints the full per-tier JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
followed by ONE COMPACT self-contained summary as the LAST stdout line
(same contract fields + per-tier totals, worst-3 ratios vs baseline,
streaming state rows, adjudication verdicts, rc — sized to survive the
driver's tail capture, which truncated every BENCH_r*.json through r9).

Each query is forced end-to-end with a noop sink (no driver collect), so
the measured time is the distributed plan, not Arrow transfer.

On a guard trip the run adjudicates itself (VERDICT r9 #6): it records
the load average, settles, re-runs only the offenders best-of-N, folds
the minima back, and emits a machine-readable ``adjudication`` block —
rc=1 only when an offender reproduces after its canary.

LOW-CORE SCALING RUNS (round 14): at $SPARK_GRAFT_CPUS !=
BASELINE_CPUS the committed baseline does not apply (it is a local[32]
artifact — every ratio would measure the core count) and the run's
job is the per-query sf0.1 scaling map, nothing else: baseline guards
off, reps default 2, sf1/sf10 tiers default off (env-overridable).
The round-13 driver's 8-core run timed out (rc=124, parsed null)
re-running dozens of tripped-guard canaries; with these defaults the
same run completes in ~5 min with a full 101-query map, rc=0.

Residual "WindowExec: No Partition Defined" warnings in the tail are
BENIGN — they come from windows over bounded tiny dims, never the fact
tables: the distinct-label rank in dense_group_ids
(operators/windows.py), the one-row-per-partition offset table in
ranged_cumsum (operators/windows.py), the lead()-paired VPR ladder
(grid/corrections.py), and the frame dim in advection
(grid/advection.py).  Don't chase them as drift.

GROWTH POLICY (round 13 — the suite reached ~45-60 min and grew every
round; VERDICT r12 #5): the headline/extra/sf10 lists are FROZEN at
their round-13 size.  A new entry must DISPLACE one — name the
displaced entry and why in the commit.  Route-pair cost exhibits
(exact-vs-sketch, tile-vs-relational, bucketed-vs-shuffle) exist to
price a decision; once that decision is recorded in PERF.md the
EXHIBIT side rotates out of the timed tiers into
``_retired_exhibits()`` (still importable, still plan-shape-linted by
tests — only the recurring wall-clock leaves).  Rotated out in r13,
decisions recorded in PERF.md rounds 9-10: q197_exact_quantiles,
q201_exact_added, q201_sketch_added, q204_latency_bands_sketch.  The
operator-default paths users actually run (q197_sketch_quantiles,
q177_latency_bands, the registered q204 oracle query) stay timed and
guarded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: one per operator family (scan+agg, joins, windows,
#: sessionization, scores, dedup/LSH, text, vectors).
HEADLINE = [
    "q01_pricing_summary",
    "q07_wet_hour_filter",
    "q09_broadcast_dim_join",
    "q10_semi_align",
    "q12_asof_join",
    "q14_nearest_centroid",
    "q17_temporal_multiagg",
    "q18_weighted_vertical",
    "q22_sessionization",
    "q26_sliding_disagg",
    "q33_perfscores",
    "q34_scatter_score",
    "q35_hourly_interpolation",
    "q36_local_supplier_revenue",
    "q39_argmax_linked_agg",
    "q40_fingerprint_dedup",
    "q43_lang_id",
    "q45_minhash_lsh",
    "q49_multimodal_decode",
    "q50_cosine_topk",
    "q54_embedding_neardup",
    "q54_auto_embedding_neardup",
    "q56_polar_grid_sql",
    "q57_ivf_ann_topk",
    "q61_zphi_attenuation",
    "q62_vpr_correction",
    "q48_energy_distance",
    "q66_qpe_evaluation",
    "q67_hzt_fallback_chain",
    # round-6 corpus-shaping ops with non-trivial scale shapes: the
    # token explode + vocab join (q83), the hash-ordered ranged count
    # (q84), the zero-Exchange literal projection chain (q85), and the
    # chained-regex scrub (q86).  Baselines long since committed (the
    # guard is active for these keys — re-mint only deliberately per
    # CLAUDE.md); the same-run sf1/sf10 physics guards also apply.
    "q83_unigram_logprob",
    "q84_epoch_shard",
    "q85_jl_projection",
    "q86_pii_redaction",
    # the bigram fan-out + double vocab join (q91) and the hot-gram
    # join + per-doc sessionization (q92): the two heaviest-shuffle
    # corpus ops added late in round 6
    "q91_pmi_bigrams",
    "q92_repeated_spans",
    # keep-first span excision (gram join + per-doc range arrays) and
    # incremental batch-vs-corpus dedup (two band tables + verified
    # Jaccard) — the heaviest round-6 corpus transforms
    "q95_span_excision",
    "q97_incremental_dedup",
    # round-6 continued-2: the tile fan-out + per-source DF join
    # (q102), the distributed ordered-cumsum budget cut (q105), the
    # bigram fan-out + triple vocab join (q106) and the 2-iteration
    # broadcast-scored k-means (q107)
    "q102_boilerplate_removal",
    "q105_token_budget",
    "q106_bigram_logprob",
    "q107_kmeans_clusters",
    # continued-3: the vocab-rank + token-explode regression (q108),
    # the double-cumsum growth curve (q109) and the WAV-encode ->
    # fingerprint Arrow chain (q111).  Baselines since committed (guard
    # active — re-mint only deliberately); physics guards apply.
    "q108_zipf_fit",
    "q109_heaps_fit",
    "q111_audio_fingerprint",
    # round-7: contiguous-tape packing joins the headline so its sf10
    # spot datapoint (VERDICT r6 #5) has same-run sf0.1/sf1
    # counterparts for the physics guard.  Baselines since committed;
    # the guard is active (re-mint only deliberately).
    "q89_packed_tapes",
    # round-7 additions with non-trivial scale shapes: the distinct
    # (source, gram) self-join contamination matrix and the
    # posexplode-per-dim centroid cohesion
    "q119_source_overlap",
    "q122_label_cohesion",
    # round-7 late additions: the distributed 2-D density binning
    # behind the plotting layer.  (Embedding novelty is benched as the
    # bench-only q124_auto_novelty extra — the ORACLE-paired q124 pins
    # the frozen 3-plane _ND_P for DuckDB pairing, which is the q54
    # candidate-explosion exhibit shape and must not run at the tiers:
    # at sf10 its candidate count is ~1e10 pairs.)  No committed
    # baseline yet (the guard skips unknown keys); same-run sf1
    # physics guards apply.
    "q125_scatter_density",
    # CCNet perplexity buckets: q83's LM pass + the grouped ranged
    # rank over per-language (mean_nll, doc) order
    "q126_perplexity_buckets",
    # round-7 continued: the BM25 corpus pass + top-k fusion (q133
    # rides the q127 token-explode machinery over the whole corpus),
    # and the per-source grouped ranged-rank quality cut (q132).
    # q131's post-count work is all on the per-group dim — benched for
    # the count-agg scan it rides.  Baselines since committed (guard
    # active — re-mint only deliberately); physics guards apply.
    "q131_temperature_mixture",
    "q132_relative_quality",
    "q133_hybrid_rrf",
    # round-7 continued-2: MassiveText paragraph dedup — one
    # map-side-combined groupBy(para) + para-keyed join back + id-keyed
    # reassembly — and the single-shuffle funnel fold over events.
    # Baselines since committed (guard active — re-mint only
    # deliberately); same-run physics guards apply.
    "q134_paragraph_dedup",
    "q135_funnel",
    # round-7 continued-3: the keyless bucket-expansion interval join
    # (sessionize + sequence fan-out + bucket equi-join), the trailing-
    # window integer z-score gate, the 4-iteration exact-integer
    # TextRank join chain, and the two-window SCD-2 build.  No
    # committed baselines yet (guard skips unknown keys); same-run
    # physics guards apply.
    "q139_interval_join",
    "q140_rolling_zscore",
    "q142_textrank_keywords",
    "q143_scd2_intervals",
    # round-7 continued-4: the blocked fuzzy self-join (candidate cost
    # rides the blocking key), the grouped-ranged-rank winsorized
    # stats, the struct-sorted session-path miner, and the bounded-
    # fan-out rolling distinct.  Baselines since committed (guard
    # active — re-mint only deliberately); physics guards apply.
    #
    # q144 is a FIXED-BLOCK EXHIBIT (the q54 frozen-plane posture): its
    # (noun, p_size) block-key cardinality is FIXED (~4.6k blocks), so
    # pair cost grows ~quadratically with N BY CONSTRUCTION — the
    # measured ~15x/decade is the price of that blocking choice, NOT
    # the operator's scaling claim.  The scale-representative number is
    # q144_composite_block (in _extra_queries), whose block-key
    # cardinality grows with N.
    "q144_fuzzy_match",
    "q148_winsorized_stats",
    "q150_session_paths",
    "q151_rolling_active",
    # round-7 continued-5: the basket self-equi-join pair counts
    # (q156), the double ranged-rank + tie equi-join Spearman (q160),
    # the triple ranged-rank RFM rollup (q164), the degree-oriented
    # wedge build (q166), the per-lag slot self-joins (q167), the
    # single-groupBy OHLC bars (q169), the grouped+global rank map
    # (q170) and the 9-cell spatial candidate join (q171).  No
    # committed baselines yet (guard skips unknown keys); same-run
    # physics guards apply.
    "q156_market_basket",
    "q160_spearman_corr",
    "q164_rfm_segments",
    "q166_triangle_census",
    "q167_lead_lag",
    "q169_ohlc_bars",
    "q170_quantile_normalize",
    "q171_nearest_site",
    # round-7 continued-6: the 32-term Morton interleave groupBy
    # (whole-stage-codegen bit math throughput) and the seasonal
    # baseline build + broadcast-back join
    "q173_zorder_cells",
    "q174_seasonal_anomaly",
    # round-7 continued-7: the unit-keyed range-window touch collect +
    # explode (q175), the slot-dim shifted self-join (q176) and the
    # grouped ranged-rank band pick (q177)
    "q175_linear_attribution",
    "q176_seasonal_naive_error",
    "q177_latency_bands",
    # round-7 continued-8: the skyline dim + ranged running-min +
    # join-back (q178) and the group-dim jackknife rollup (q179)
    "q178_pareto_frontier",
    "q179_jackknife_mean",
    # round-7 continued-9: the basket pair fan-out + per-item window
    # (q180) and the match-only token explode (q181)
    "q180_item_similarity",
    "q181_concordance",
    # round-7 continued-10: the grouped ranged running-min frontier
    # (q182) and the unit-rollup CUPED sufficient statistics (q183)
    "q182_brand_frontier",
    "q183_cuped_contrast",
    # round-8: the map-only readability pass and the HLL accuracy
    # report (register sketch + the exact two-stage distinct it
    # exists to replace).  Baselines since committed (the guard is
    # active — re-mint only deliberately); physics guards apply.
    "q193_readability",
    "q194_hll_cardinality",
    # (q204_latency_bands_sketch rotated out r13 under the growth
    # policy: the bounded-vs-exact route decision is recorded in
    # PERF.md r10 and its plan shape stays pinned by
    # tests/test_plan_shapes.py; q177 — the exact operator entry —
    # stays above.)
    # round-11: the relational W7 outlier kernel (49-offset explode +
    # one hash agg over the pixel dim — the oracle-paired route next
    # to the tile_kernel mapInPandas path) and the grouped KMV novelty
    # report (one pass over S·k sketch rows).  Baselines since
    # committed (guard active — re-mint only deliberately).
    "q205_outlier_tile",
    "q206_kmv_novelty_report",
    # round-12: the J8 station→gates LUT join census (two groupBy-built
    # dims + a pixel-key equi-join + one aggregation — broadcast-sized
    # at every tier).  Baseline keys at sf0.1/sf1 were minted from the
    # r12 idle full run (commit 1968c67) — do NOT re-mint without idle
    # canaries (CLAUDE.md).
    "q207_station_gates_lut",
]

#: Regression guard (vs BENCH_BASELINE.json, min-of-5 on an idle
#: machine).  Two triggers, both build breaks:
#: - per-query: > PER_QUERY_RATIO x baseline AND > +PER_QUERY_FLOOR s
#:   absolute (the floor filters local[32] job-overhead noise);
#: - total: > TOTAL_RATIO x the baseline total — this is what catches a
#:   uniform environmental-looking drift (round-2 saw a silent uniform
#:   1.3x; the old 2x-per-query guard never tripped).
#: Re-baseline deliberately (SPARK_GRAFT_BENCH_REBASELINE=1), never by
#: editing thresholds.
PER_QUERY_RATIO = 1.5
PER_QUERY_FLOOR = 0.5
TOTAL_RATIO = 1.15
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")

#: Every committed baseline number was minted on local[32].  The
#: driver ALSO runs this bench at a LOWER core count to measure how
#: each query scales with cores — and against a 32-core baseline every
#: per-query ratio at 8 cores measures the core count, not a plan
#: change, so ~every entry trips the regression guard and the
#: adjudication protocol re-runs dozens of best-of-3 canaries on a
#: machine that is already ~3x slower per query.  That canary storm is
#: what pushed the driver's round-13 8-core run past its timeout
#: (BENCH_r13_c8.json: rc=124, ``parsed: null`` — the run produced
#: NOTHING and PERF_r13.json has an empty scaling map).  At any cpus
#: != BASELINE_CPUS the baseline guards are therefore skipped (the
#: same-run physics guards stay active — tier ratios are
#: cpus-independent) and the rep/tier defaults drop to what a scaling
#: run needs: the full sf0.1 per-query map, min-of-2.
BASELINE_CPUS = 32


def _guard_baseline(base: dict, cpus: int) -> dict:
    """Return the baseline dict the guards may compare against: the
    committed baseline at BASELINE_CPUS, empty at any other core count
    (a 32-core baseline is not a valid bar for an 8-core run)."""
    return base if cpus == BASELINE_CPUS else {}

#: ---- sf1 scale tier (measured 100×-design evidence) -----------------
#: A deterministic ×10 re-keyed scale-up of sf0.1 (tools/scale_gen.py —
#: copies are cipher/sign-mask transformed so dedup workloads scale
#: linearly instead of measuring the duplication artifact).  Generated
#: on first use into a gitignored dir; runs only in the default sf0.1
#: bench (skipped when SPARK_GRAFT_SF_DIR points elsewhere, e.g. dev
#: iteration at sf0.01, or SPARK_GRAFT_BENCH_SF1=0).
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".benchdata", "sf1"))

#: The FULL headline set is timed at sf1 (round-6: every query gets a
#: measured 10x datapoint, not just the 5 heaviest).  The frozen-plane
#: q54 stays in deliberately — it is the documented anti-pattern
#: (~10-13x at 10x data, inside the 20x-linear guard) that
#: q54_auto_embedding_neardup (the operator's DEFAULT path, auto-sized
#: planes) is measured against.  q54_scaled_planes from round 5 is
#: superseded by q54_auto, which is the same auto_planes sizing wired
#: as the operator default and oracle-paired at sf0.01.
SF1_HEADLINE = list(HEADLINE)

#: Physics guard: a query at 10x the data may take at most 2x-linear
#: (20x) its same-run sf0.1 time (+ floor for job overhead).  This is
#: deliberately NOT rebaselineable — it catches superlinear plans even
#: if someone refreshes the regression baseline.  Known shape: frozen
#: 3-plane q54 candidates grow with bucket density (measured ~10x at
#: 10x data, inside the guard); q54_auto is the parameter fix.
SF1_LINEAR_RATIO = 2.0 * 10.0
SF1_LINEAR_FLOOR = 2.0
SF1_PER_QUERY_RATIO = 1.5
SF1_PER_QUERY_FLOOR = 2.0
#: The frozen-plane q54 EXHIBIT is exempt from the tier
#: baseline-REGRESSION guard (never from the physics guard, which is
#: its whole point): it is the deliberately pathological anti-pattern
#: demo whose candidate explosion makes its wall time swing ~3x with
#: ZERO code change (same-code same-data measurements this round:
#: 19.9 / 35.7 / 42.2 / 60.9 s at sf1 — PERF.md round-6 continued-4).
#: Guarding noise would make every future run a coin flip; the
#: operator's DEFAULT path (q54_auto) stays fully guarded.
#: (q197_exact_quantiles held the same exemption through r12 — the
#: EXACT-side cost exhibit, GC-pressure-sensitive, measured swinging
#: 4.6→11.4 s same-code same-data, PERF.md round 10 — until the r13
#: growth policy rotated it out of the timed tiers entirely; the
#: exemption list shrinks with it.  Any NEW member needs the same
#: deliberate-pathology justification in PERF.md.)
TIER_GUARD_EXEMPT = {"q54_embedding_neardup"}

#: ---- sf10 spot tier (second measured decade) ------------------------
#: factor=100 off sf0.1 (tools/scale_gen.py — the md5-permutation
#: cipher takes over past copy 9 so cross-copy text stays disjoint).
#: Three scale-sensitive queries only: the LSH pair (density-driven),
#: and the QPE evaluation chain (join+window-heavy).  Two decades of
#: ratios distinguish real scaling laws from fixed-overhead artifacts.
SF10_DIR = os.environ.get(
    "SPARK_GRAFT_SF10_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".benchdata", "sf10"))
SF10_HEADLINE = [
    "q45_minhash_lsh",
    "q54_auto_embedding_neardup",
    "q66_qpe_evaluation",
    # the two whose scale claims were plan-only through round 5: the
    # Arrow/mapInPandas codec chain (is Python the bottleneck at 100×?)
    # and the IVF probe/score path
    "q49_multimodal_decode",
    "q57_ivf_ann_topk",
    # round-6 continuation: the most data-intensive corpus op (token
    # explode + vocab join) gets its second measured decade too
    "q83_unigram_logprob",
    # the production incremental-dedup path (batch bands x corpus
    # bands + verified Jaccard) — its O(batch) claim gets a second
    # decade too
    "q97_incremental_dedup",
    # round-6 continued-2: the bigram fan-out is the heaviest new
    # shuffle (token^2-adjacent key space through three vocab joins)
    "q106_bigram_logprob",
    # round-7: the span family's ~3x/decade at sf1 was the closest
    # thing to an open scaling question (VERDICT r6 #5) — second
    # decade for the hot-gram fan-out (q92), the keep-first excision
    # (q95), the tile fan-out + per-source join (q102), and the
    # packing pair (hash-ordered ranged count q84, contiguous-tape
    # cumsum q89)
    "q92_repeated_spans",
    "q95_span_excision",
    "q102_boilerplate_removal",
    "q84_epoch_shard",
    "q89_packed_tapes",
    # round-7 additions get their second decade from day one: the
    # AQE-reused gram matrix and the per-dim centroid agg
    "q119_source_overlap",
    "q122_label_cohesion",
    # late round-7: the batch-vs-corpus novelty candidate join scales
    # with bucket density like the q54 family — second decade from day
    # one, on the operator's AUTO-plane default (the frozen-plane
    # oracle pairing would candidate-explode here)
    "q124_auto_novelty",
    # the grouped ranged rank (few-huge-groups: per-language) on top
    # of the q83 LM pass whose own second decade is measured above
    "q126_perplexity_buckets",
    # round-7 continued-2: paragraph dedup's boilerplate-skew claim
    # (map-side combine on the hot paragraph) gets its second decade
    # from day one
    "q134_paragraph_dedup",
    # round-7 continued-3: the bucket-expansion interval join — its
    # fan-out claim (|P| + Σ ceil(len/bucket) through the shuffle,
    # never |P|·|I|) gets a second decade from day one
    "q139_interval_join",
    # round-7 continued-4: rolling distinct actives — the bounded
    # N·|id-days| fan-out claim (shuffle independent of raw event
    # count) gets its second decade from day one
    "q151_rolling_active",
    # round-7 continued-5: the √m-bounded wedge fan-out of the
    # triangle census (does degree orientation hold the candidate
    # count on a 100× co-purchase graph?) and the quantile-normalize
    # rank map (two ranged passes + a rank equi-join at 100×)
    "q166_triangle_census",
    "q170_quantile_normalize",
    # round-8: second decades for the four heaviest r7 analytics whose
    # sf1 ratios were the least flat (VERDICT r7 #7) — the double
    # ranged-rank Spearman, the basket pair fan-outs (market basket,
    # item-item similarity), and the triple ranged-rank RFM rollup
    "q160_spearman_corr",
    "q164_rfm_segments",
    "q156_market_basket",
    "q180_item_similarity",
    # round-8: the scale-representative fuzzy-match shape (growing
    # composite block key — the non-exhibit counterpart of q144)
    "q144_composite_block",
    # round-9: the quantile sketch's bounded register-dim path keeps
    # its decades (operator default); its exact cost-exhibit twin
    # (q197_exact_quantiles) rotated out r13 under the growth policy —
    # decision recorded PERF.md r9-r10, plan pinned by tests.  The
    # q201 added-distinct pair and q204's sketch route rotated out on
    # the same grounds (decisions in PERF.md r10).
    "q197_sketch_quantiles",
    "q177_latency_bands",
    # round-10 (VERDICT r9 #5): streaming's third decade — the RT
    # 10-min chain at 1200 frames (batch count held ~constant via
    # maxFilesPerTrigger=40, so the decade measures rows/state per
    # batch, not scheduler overhead) and the session rollup over the
    # tier's events; state-store rows recorded in the bench summary
    "s01_rt_tenmin",
    "s04_session_rollup",
    # round-10 continued: the other two streaming entries complete the
    # three-decade state table — the dedup-gate state (fingerprints
    # inside the watermark) and the exactly-once HLL sink fold
    "s02_curation_gate",
    "s03_hll_sink",
    # round-11 (VERDICT r10 #3): the bounded-state route pair to s02 —
    # Bloom-gated exactly-once curation, fixed bit-dim state vs s02's
    # linear-in-docs fingerprint state, measured at the same decades
    "s05_gated_curation",
    # round-12 (VERDICT r11 #5): the streaming novelty loop's third
    # decade — exactly-once weighted-KMV maintenance + a per-batch
    # novelty report read from the S·k-row committed sketch store
    # alone (no corpus rescan); state column = sketch rows, constant
    # per source across all three decades
    "s06_kmv_novelty_loop",
    # round-11 continued: second/third decades from day one for the
    # new pair — the pixel-dim explode (its input groupBy is the only
    # corpus-sized stage) and the sketch-row novelty report (its
    # mapInPandas sketch build is the corpus-sized stage)
    "q205_outlier_tile",
    "q206_kmv_novelty_report",
    # round-11 continued-2: the W7 kernel route pair on the GROWING
    # 2048² grid (the oracle fixture saturates at 96×96) — separable
    # two-pass relational vs dense-tile Arrow kernel, third decade
    "q205_relational_route",
    "q205_tile_route",
]
#: same physics, one more decade: <= 2x-linear of same-run sf0.1 (200x)
SF10_LINEAR_RATIO = 2.0 * 100.0
SF10_LINEAR_FLOOR = 5.0

#: (db, sf_dir) -> bucketed table names, written once per bench process
_BUCKETED_TABLES: dict = {}


def _all_extra_queries():
    """Bench-only entries (no oracle pairing — the underlying operator
    chain is driver-gated as q53_prepare_input; these measure the
    PHYSICAL-design delta): the same prepare_input over the same
    fixtures, once from STATION-bucketed tables (Exchange-free
    sort-merge joins) and once from plain parquet (shuffling SMJ).
    Broadcast is disabled in both via per-entry confs so the measured
    plan is the one a 100 TB input takes (at bench SFs every fixture
    would otherwise broadcast and the comparison would measure
    nothing).  The bucketed write happens ONCE per (process, tier) —
    write-time shuffle amortized over repeated reads is the point."""
    from rainforest_spark.ml.dataset import prepare_input
    from rainforest_spark.sources.bucketing import (
        BUCKETED_JOIN_CONFS, bucketed_table, write_training_bucketed,
    )
    from rainforest_spark.workload.extended import (
        q53_fixtures, q53_projection,
    )

    bkt_base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".benchdata", "bucketed")

    def ensure_bucketed(spark, sf_dir):
        key = sf_dir.rstrip("/")
        if key not in _BUCKETED_TABLES:
            g, r, ref, st, rd = q53_fixtures(spark, sf_dir)
            suffix = "_" + os.path.basename(key).replace(".", "_")
            _BUCKETED_TABLES[key] = (
                write_training_bucketed(
                    spark, g, r, ref, "bench_bkt",
                    os.path.join(bkt_base, suffix.strip("_")),
                    suffix=suffix),
                (st, rd))
        return _BUCKETED_TABLES[key]

    def q53_bucketed(spark, sf_dir):
        (tg, tr, tref), (st, rd) = ensure_bucketed(spark, sf_dir)
        out = prepare_input(bucketed_table(spark, tg),
                            bucketed_table(spark, tr),
                            bucketed_table(spark, tref), st, rd)
        return q53_projection(out)

    def q53_shuffle(spark, sf_dir):
        g, r, ref, st, rd = q53_fixtures(spark, sf_dir)
        return q53_projection(prepare_input(g, r, ref, st, rd))

    def q124_auto(spark, sf_dir):
        # the embedding-novelty OPERATOR DEFAULT (auto-sized planes off
        # the corpus count — log2(N/128) keeps bucket density flat as
        # the corpus grows); the oracle-paired q124 pins the frozen
        # 3-plane _ND_P for DuckDB pairing and is a candidate-explosion
        # exhibit at the tiers, exactly like frozen-plane q54
        from pyspark.sql import functions as F

        from rainforest_spark.operators.similarity import embedding_novelty
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        batch = e.filter(F.col("vec_id") % 5 == 0)
        corpus = e.filter(F.col("vec_id") % 5 != 0)
        return embedding_novelty(batch, corpus, "vec_id", "embedding")

    def q144_composite(spark, sf_dir):
        # the NON-exhibit fuzzy-match shape: a block key whose OCCUPIED
        # cardinality grows with N, so per-block sizes — and with them
        # the Sigma n_b^2 pair cost — stay ~flat per decade.  It runs
        # on DOCUMENTS because that is the one text column the scale
        # tiers cipher per copy (tools/scale_gen.py): every copy's
        # first tokens are distinct strings, exactly like real corpus
        # growth.  (A p_name key canNOT work here: part text is copied
        # verbatim 100x, so ANY p_name blocking is quadratic on the
        # tiers by construction — that is what the q144 exhibit
        # demonstrates.)  Same operator, same thresholded levenshtein
        # residual; only the user's blocking choice differs (the
        # operator's documented scale lever).
        from pyspark.sql import functions as F

        from rainforest_spark.operators.joins import fuzzy_match
        d = (spark.read.parquet(os.path.join(sf_dir,
                                             "documents.parquet"))
             .select("doc_id",
                     F.substring("text", 1, 40).alias("head"),
                     F.element_at(F.split(F.col("text"), " "), 1)
                     .alias("tok1"),
                     (F.col("n_chars") / F.lit(64)).cast("long")
                     .alias("lenb")))
        return fuzzy_match(d, "doc_id", "head", ["tok1", "lenb"],
                           max_dist=6)

    def q171_auto(spark, sf_dir):
        # the nearest-site OPERATOR DEFAULT (cell=None — auto-sized
        # from site density, the auto_planes precedent); the
        # oracle-paired q171 pins cell=125000 for DuckDB pairing, which
        # at growing site density is the candidate-explosion shape
        from pyspark.sql import functions as F

        from rainforest_spark.operators.joins import nearest_site
        c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        s = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
        pts = c.select(
            "c_custkey",
            F.pmod(F.col("c_custkey") * F.lit(2654435761), F.lit(1000000))
            .alias("px"),
            F.pmod(F.col("c_custkey") * F.lit(998244353), F.lit(1000000))
            .alias("py"))
        sites = s.select(
            "s_suppkey",
            F.pmod(F.col("s_suppkey") * F.lit(2654435761), F.lit(1000000))
            .alias("sx"),
            F.pmod(F.col("s_suppkey") * F.lit(998244353), F.lit(1000000))
            .alias("sy"))
        return nearest_site(pts, sites, "px", "py", "sx", "sy",
                            ["c_custkey"], ["s_suppkey"], cell=None)

    def _quantile_facts(spark, sf_dir):
        # HIGH-CARDINALITY measurement column: events.value alone has
        # only ~18k distinct values even at sf10 (the generator draws
        # from a coarse grid), so the exact path's distinct-value dim
        # stays bounded and the comparison would never exercise what
        # the sketch replaces — a percentile over a column whose
        # distinct count grows with the data (latencies, sizes,
        # scores).  Perturbing by the unique event_id makes the
        # distinct count track the row count at every tier.
        from pyspark.sql import functions as F

        from rainforest_spark.workload.common import T as _T
        ev = _T(spark, sf_dir, "events")   # nanos/micros-ts safe
        return ev.withColumn(
            "x", F.col("value")
            + F.pmod(F.col("event_id"), F.lit(9999991)).cast("double")
            * F.lit(1e-7))

    def q197_sketch(spark, sf_dir):
        # the register-dim quantile path: ONE bounded-bucket groupBy +
        # a ≤16k-row window — the maintained-rollup shape (r9 sketch
        # family; the oracle-paired q197 carries BOTH sides and so
        # can't show the delta)
        from rainforest_spark.operators.sketches import (
            quantile_buckets, quantile_estimate,
        )
        ev = _quantile_facts(spark, sf_dir)
        return quantile_estimate(
            quantile_buckets(ev, "x", ["event_type"], 8),
            [500000, 900000, 990000], ["event_type"])

    def q191_gram(spark, sf_dir):
        # the LARGE-d scale path of the embedding-covariance audit
        # (VERDICT r8 #7): numpy Gram accumulation per Arrow batch at
        # a synthetic d=256 (4 deterministic affine copies of the
        # tier's d=64 embeddings).  The oracle-pairable expression
        # path at the same d is the documented exhibit — measured once
        # in PERF.md (~50x slower at d=256: 58 s vs 1.1 s at sf1), too
        # slow to re-pay every bench run.
        from pyspark.sql import functions as F

        from rainforest_spark.operators.similarity import gram_accumulate
        e = spark.read.parquet(os.path.join(sf_dir,
                                            "embeddings.parquet"))
        emb = F.col("embedding")
        v = e.select(F.concat(
            emb,
            F.transform(emb, lambda x: x * F.lit(0.5) + F.lit(0.1)),
            F.transform(emb, lambda x: x * F.lit(-0.25)),
            F.transform(emb, lambda x: x * F.lit(2.0) - F.lit(0.05)),
        ).alias("v"))
        return gram_accumulate(v, "v", 256)

    def q201_sketch(spark, sf_dir):
        # the sketch route of "how many NEW distinct values does B
        # add": two partial-min-k mapInPandas passes (NO raw-value
        # shuffle) + a <=256-row broadcast report (r10 kmv_difference).
        # High-cardinality x (the q197 lesson: events.value alone has
        # ~18k distincts even at sf10 — it would never exercise what
        # the sketch replaces).
        from pyspark.sql import functions as F

        from rainforest_spark.operators.sketches import (
            kmv_difference, kmv_sketch,
        )
        ev = _quantile_facts(spark, sf_dir)
        a = ev.where(F.col("user_id") % 2 == 0)
        b = ev.where(F.col("user_id") % 2 == 1)
        return kmv_difference(kmv_sketch(a, "x", None, 256),
                              kmv_sketch(b, "x", None, 256), 256)

    def q201_exact(spark, sf_dir):
        # the exact route the sketch replaces: two full DISTINCTs +
        # an anti join — its shuffle grows with the distinct count
        from pyspark.sql import functions as F

        ev = _quantile_facts(spark, sf_dir)
        a = ev.where(F.col("user_id") % 2 == 0).select("x").distinct()
        b = ev.where(F.col("user_id") % 2 == 1).select("x").distinct()
        return (b.join(a, "x", "anti")
                .agg(F.count(F.lit(1)).cast("long")
                     .alias("n_added_exact")))

    def q197_exact(spark, sf_dir):
        # the exact ranked pass the sketch replaces: distinct-value
        # groupBy + grouped ranged_cumsum + rank probe — its shuffle
        # grows with the distinct count, the sketch's never does
        from rainforest_spark.operators.sketches import exact_quantiles
        ev = _quantile_facts(spark, sf_dir)
        return exact_quantiles(ev, "x",
                               [500000, 900000, 990000], ["event_type"])

    q53_bucketed.confs = dict(BUCKETED_JOIN_CONFS)
    q53_shuffle.confs = dict(BUCKETED_JOIN_CONFS)
    def _w7_grid(spark, sf_dir):
        # a pixel grid that GROWS with the tier (0.5M -> 3.2M -> 4.2M
        # occupied cells of a 2048x2048 canvas): the oracle-paired
        # q205 fixture is frozen at 96x96 for DuckDB pairing, which
        # saturates at every tier and would measure only job overhead
        # — this fixture makes the KERNEL the corpus-sized stage, the
        # thing the route pair exists to compare
        from pyspark.sql import functions as F
        l = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        return (l.groupBy((F.col("l_orderkey") % 2048).cast("int")
                          .alias("x_idx"),
                          (F.col("l_partkey") % 2048).cast("int")
                          .alias("y_idx"))
                .agg((F.sum(F.col("l_quantity").cast("long")) % 1000)
                     .alias("v"))
                .where(F.col("v") % 8 != 0))

    def q205_relational(spark, sf_dir):
        # W7 route pair, relational side: join-free 49-offset explode
        # + ONE hash agg, whole-stage codegen end to end
        from rainforest_spark.grid.image import outlier_relational
        return outlier_relational(_w7_grid(spark, sf_dir), "v", 7)

    def q205_tile(spark, sf_dir):
        # W7 route pair, tile side: dense-block applyInPandas with
        # halo replication — every pixel crosses the Arrow boundary
        # (plus halo copies).  Route equivalence is pytest-gated
        # (tests/test_grid_pipeline.py).
        from rainforest_spark.grid.image import tile_kernel
        return tile_kernel(_w7_grid(spark, sf_dir), "v",
                           kernel="outlier", halo=3)

    active = {"q53_bucketed_prepare": q53_bucketed,
              "q53_shuffle_prepare": q53_shuffle,
              "q124_auto_novelty": q124_auto,
              "q144_composite_block": q144_composite,
              "q171_auto_site": q171_auto,
              "q191_gram_d256": q191_gram,
              "q197_sketch_quantiles": q197_sketch,
              "q205_relational_route": q205_relational,
              "q205_tile_route": q205_tile}
    # Route-pair cost exhibits whose decision is recorded in PERF.md
    # (growth policy, module docstring): no longer timed per run, but
    # still importable so the plan-shape tests keep pinning the
    # bounded-plan guarantees the decisions rest on.
    retired = {"q197_exact_quantiles": q197_exact,
               "q201_sketch_added": q201_sketch,
               "q201_exact_added": q201_exact}
    return active, retired


def _extra_queries():
    """ACTIVE bench-only entries (timed every run)."""
    return _all_extra_queries()[0]


def _retired_exhibits():
    """Cost exhibits rotated out of the timed tiers (growth policy,
    module docstring): decisions recorded in PERF.md, plan shapes
    still pinned by tests/test_plan_shapes.py via this registry."""
    return _all_extra_queries()[1]


#: streaming fixture scale per tier dir basename (frames of synthetic
#: 2-radar polar scans for the RT chain; events/documents come from
#: the tier's own parquet).  sf10 = the THIRD measured decade
#: (VERDICT r9 #5): 1200 frames with maxFilesPerTrigger scaled so the
#: BATCH COUNT stays ~constant across tiers — each decade then
#: measures 10x the rows/state per micro-batch, not 10x the
#: micro-batch scheduling overhead (which is the s01 sf1 number's
#: job; state-boundedness is about rows-per-key-in-state).
_RT_FRAMES = {"sf0.1": 12, "sf1": 120, "sf10": 1200}
_RT_TRIGGER_FILES = {"sf0.1": 4, "sf1": 4, "sf10": 40}
#: per-(label:tier) state-store rows from the LAST progress event with
#: stateOperators — the measured bounded-state evidence recorded in
#: the bench summary next to wall time
_STREAM_STATE: dict[str, dict] = {}
_RT_SCHEMA = ("TIMESTAMP bigint, STATION string, RADAR string, "
              "SWEEP bigint, az_idx int, rng_idx int, ZH double, "
              "VISIB double")
_STREAM_FIXED: dict[str, str] = {}


def _streaming_queries():
    """Streaming bench tier (runs at sf0.1 and sf1): availableNow runs
    of the streaming surface, timed END-TO-END — source listing,
    micro-batch planning, state-store work, watermark advancement and
    sink commits all inside the measured wall.  Every call builds
    FRESH sink/checkpoint dirs (a reused checkpoint would make the
    second rep a no-op replay and 'measure' an empty run) and removes
    them after; the input fixtures are built ONCE per (process, tier)
    so generation never pollutes the timings.  Entries return None —
    the runner skips the noop sink for them (the stream already wrote
    its own)."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from rainforest_spark.session import default_parallelism

    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".benchdata", "stream")

    def _fresh():
        return tempfile.mkdtemp(prefix="bench_stream_")

    def _finish(query, *dirs, label=None):
        try:
            ok = query.awaitTermination(600)
            if not ok:   # r9 ADVICE: never record a truncated wall
                query.stop()
                raise RuntimeError(
                    f"streaming bench entry {label or '?'} still "
                    f"running after 600s — failing loudly instead of "
                    f"recording a partial run as a timing")
            if label:
                prog = query.lastProgress or {}
                ops = prog.get("stateOperators") or []
                if not ops:
                    for p in reversed(query.recentProgress or []):
                        if p.get("stateOperators"):
                            ops = p["stateOperators"]
                            break
                if ops:
                    _STREAM_STATE[label] = {
                        "state_rows": sum(
                            int(o.get("numRowsTotal") or 0)
                            for o in ops),
                        "batches": int(prog.get("batchId", -1)) + 1}
        finally:
            for d in dirs:
                shutil.rmtree(d, ignore_errors=True)

    def _spark_ranged_files(df, order_col: str, n: int, out: str):
        """Split a DataFrame into n time/key-ordered single-file
        parquets with ascending mtimes, EXECUTOR-side (the sf10 tables
        never fit a driver toPandas): approx n-tile bounds, one
        filtered single-file write per range.  NULL order_col rows
        ride the FIRST range (the toPandas path at smaller tiers
        keeps them, so dropping them here would be a silent
        tier-dependent fixture difference)."""
        bounds = df.agg(F.percentile_approx(
            order_col, [i / float(n) for i in range(1, n)], 10000)
            .alias("b")).collect()[0]["b"]
        edges = [None, *bounds, None]
        for f_i in range(n):
            lo, hi = edges[f_i], edges[f_i + 1]
            c = df
            if lo is not None:
                c = c.where(F.col(order_col) >= lo)
            if hi is not None:
                pred = F.col(order_col) < hi
                if lo is None:
                    pred = pred | F.col(order_col).isNull()
                c = c.where(pred)
            tmp = os.path.join(out, f"_tmp{f_i}")
            c.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [p for p in os.listdir(tmp)
                    if p.endswith(".parquet")][0]
            os.replace(os.path.join(tmp, part),
                       os.path.join(out, f"f{f_i}.parquet"))
            shutil.rmtree(tmp, ignore_errors=True)

    def ensure_rt_frames(sf_dir: str) -> str:
        """One 5-min-spaced scan sequence per tier: 2 radars x 360 az
        x 60 gates per frame, one parquet FILE per frame so
        maxFilesPerTrigger yields real multi-batch watermark
        advancement."""
        tier = os.path.basename(sf_dir.rstrip("/"))
        key = f"rt:{tier}"
        if key in _STREAM_FIXED:
            return _STREAM_FIXED[key]
        out = os.path.join(base, "rt", tier.replace(".", "_"))
        frames = _RT_FRAMES.get(tier, 12)
        marker = os.path.join(out, f"_DONE_{frames}")
        if not os.path.exists(marker):
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(out)
            az, rg = np.meshgrid(np.arange(360), np.arange(60),
                                 indexing="ij")
            n = az.size
            rng = np.random.RandomState(11)
            t0 = 1_717_200_000
            for f_i in range(frames):
                chunks = []
                for radar in ("A", "D"):
                    chunks.append(pd.DataFrame({
                        "TIMESTAMP": np.int64(t0 + 300 * f_i),
                        "STATION": "ST00", "RADAR": radar,
                        "SWEEP": np.int64(1),
                        "az_idx": az.ravel().astype(np.int32),
                        "rng_idx": rg.ravel().astype(np.int32),
                        "ZH": rng.uniform(0, 50, n),
                        "VISIB": rng.uniform(50, 100, n)}))
                pd.concat(chunks).to_parquet(
                    os.path.join(out, f"frame_{f_i:04d}.parquet"),
                    index=False)
            open(marker, "w").close()
        _STREAM_FIXED[key] = out
        return out

    def ensure_event_files(spark, sf_dir: str) -> str:
        """A time-ordered multi-file copy of the tier's events table
        (8 range files, f0 oldest, ascending mtimes) so file-source
        micro-batches advance the watermark in event-time order — a
        single-file input would be ONE batch and append mode would
        emit nothing.  Timestamps ship as epoch-second BIGINTs (the
        repo's epoch discipline — also sidesteps pandas/parquet
        timestamp physical-type drift)."""
        tier = os.path.basename(sf_dir.rstrip("/"))
        key = f"ev:{tier}"
        if key in _STREAM_FIXED:
            return _STREAM_FIXED[key]
        out = os.path.join(base, "events", tier.replace(".", "_"))
        marker = os.path.join(out, "_DONE")
        if not os.path.exists(marker):
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(out)
            # T() normalizes the two ts physical encodings the driver
            # has shipped (NANOS vs MICROS — the verify-skill gotcha),
            # so a testdata regeneration can't break the fixture build
            from rainforest_spark.workload.common import T as _T
            ev = (_T(spark, sf_dir, "events")
                  .select("user_id", "event_type", "value",
                          F.col("ts").cast("timestamp").cast("long")
                          .alias("ep")))
            if tier == "sf10":
                # third-decade fixture: 8 time-ordered files,
                # executor-side
                _spark_ranged_files(ev, "ep", 8, out)
            else:
                pdf = ev.orderBy("ep").toPandas()
                per = (len(pdf) + 7) // 8
                for f_i in range(8):
                    chunk = pdf.iloc[f_i * per:(f_i + 1) * per]
                    if len(chunk):
                        chunk.to_parquet(os.path.join(
                            out, f"f{f_i}.parquet"), index=False)
            open(marker, "w").close()
        _STREAM_FIXED[key] = out
        return out

    def ensure_doc_files(spark, sf_dir: str) -> str:
        """A 4-file directory copy of the tier's documents table (the
        file source needs a DIRECTORY, and multiple files give the
        curation gate real micro-batches)."""
        tier = os.path.basename(sf_dir.rstrip("/"))
        key = f"doc:{tier}"
        if key in _STREAM_FIXED:
            return _STREAM_FIXED[key]
        out = os.path.join(base, "docs", tier.replace(".", "_"))
        marker = os.path.join(out, "_DONE")
        if not os.path.exists(marker):
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(out)
            dd = spark.read.parquet(os.path.join(sf_dir,
                                                 "documents.parquet"))
            if tier == "sf10":
                _spark_ranged_files(dd, "doc_id", 4, out)
            else:
                d = dd.orderBy("doc_id").toPandas()
                per = (len(d) + 3) // 4
                for f_i in range(4):
                    chunk = d.iloc[f_i * per:(f_i + 1) * per]
                    if len(chunk):
                        chunk.to_parquet(os.path.join(
                            out, f"f{f_i}.parquet"), index=False)
            open(marker, "w").close()
        _STREAM_FIXED[key] = out
        return out

    ev_schema = ("user_id bigint, event_type string, value double, "
                 "ep bigint")

    def s01_rt_tenmin(spark, sf_dir):
        # the RT post-processing chain's windowed heart: 10-min
        # tumbling agg with watermark over 5-min scan frames (T1-T3)
        from rainforest_spark.streaming.rt import ten_minute_aggregate
        tier = os.path.basename(sf_dir.rstrip("/"))
        src = ensure_rt_frames(sf_dir)
        sink, ckpt = _fresh(), _fresh()
        stream = (spark.readStream.schema(_RT_SCHEMA)
                  .option("maxFilesPerTrigger",
                          _RT_TRIGGER_FILES.get(tier, 4)).parquet(src))
        q = (ten_minute_aggregate(stream, ["ZH"])
             .writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _finish(q, sink, ckpt, label=f"s01:{tier}")

    def s02_curation_gate(spark, sf_dir):
        # the corpus ingest gate: quality filter -> PII scrub ->
        # fingerprint -> watermarked dedup over the tier's documents
        from rainforest_spark.streaming.corpus import curate_stream
        src = ensure_doc_files(spark, sf_dir)
        sink, ckpt = _fresh(), _fresh()
        stream = (spark.readStream
                  .schema("doc_id bigint, text string, lang string, "
                          "source string, n_chars bigint")
                  .option("maxFilesPerTrigger", 2).parquet(src)
                  .withColumn("ingest_ts", F.timestamp_seconds(
                      F.lit(1_717_200_000)
                      + F.pmod(F.col("doc_id"), F.lit(86400)))))
        q = (curate_stream(stream, "text", "ingest_ts",
                           watermark="48 hours")
             .writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        tier = os.path.basename(sf_dir.rstrip("/"))
        _finish(q, sink, ckpt, label=f"s02:{tier}")

    def s05_gated_curation(spark, sf_dir):
        # the BOUNDED-state route pair to s02 (VERDICT r10 #3 — the
        # q177/q204 treatment on the streaming side): same quality →
        # PII → fingerprint chain over the same doc files, but dedup
        # through the fixed-size Bloom bit dim + exact lookup on the
        # "maybe" slice, exactly-once store commits — ZERO Structured
        # Streaming state rows vs s02's one-per-fingerprint (linear in
        # docs).  The state column recorded here is the bit dim:
        # bounded by m_bits however large the corpus grows.
        from rainforest_spark.sources.versioned import read_snapshot
        from rainforest_spark.streaming.corpus import curated_ingest_sink
        src = ensure_doc_files(spark, sf_dir)
        store, ckpt = _fresh(), _fresh()
        m_bits = 1 << 22   # sized for the sf10 corpus (~500k fps)
        sink = curated_ingest_sink(store, m_bits=m_bits, k=4)
        stream = (spark.readStream
                  .schema("doc_id bigint, text string, lang string, "
                          "source string, n_chars bigint")
                  .option("maxFilesPerTrigger", 2).parquet(src))
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        tier = os.path.basename(sf_dir.rstrip("/"))
        label = f"s05:{tier}"
        try:
            ok = q.awaitTermination(600)
            if not ok:
                q.stop()
                raise RuntimeError(
                    f"streaming bench entry {label} still running "
                    f"after 600s — failing loudly instead of "
                    f"recording a partial run as a timing")
            braw = read_snapshot(spark, os.path.join(store, "bits"))
            slab = (F.coalesce(F.col("slab"), F.lit(0))
                    if "slab" in braw.columns else F.lit(0))
            bt = (braw.select(slab.cast("int").alias("slab"), "bit")
                  .distinct())
            per_slab = {int(r["slab"]): int(r["n"]) for r in
                        bt.groupBy("slab")
                        .agg(F.count(F.lit(1)).alias("n")).collect()}
            prog = q.lastProgress or {}
            _STREAM_STATE[label] = {
                "state_rows": 0,           # stateless stream by design
                "bloom_bits_rows": int(sum(per_slab.values())),
                "m_bits": m_bits,
                # scalable-Bloom growth evidence (VERDICT r11 #1):
                # slab count; occupancy stays under the freeze point
                # so the gate's fp rate is bounded at ANY corpus size
                "n_slabs": len(per_slab),
                "batches": int(prog.get("batchId", -1)) + 1}
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    def s06_kmv_novelty_loop(spark, sf_dir):
        # round-12 (VERDICT r11 #5): the streaming novelty LOOP
        # end-to-end — kmv_weighted_sink maintains the per-source
        # WEIGHTED bottom-k sketch exactly-once, and EVERY micro-batch
        # answers the live ingest-ordering question
        # (kmv_novelty_report: "what does each source add to the union
        # of the rest", distinct values AND bytes) from the committed
        # sketch store ALONE — S·k rows read back per decision, the
        # raw corpus never rescanned.  State column = sketch-store
        # rows (≤ S·k, constant in corpus size); batch≡stream report
        # parity is pytest-gated (tests/test_streaming_analytics.py
        # maintained-store ≡ direct-report bit-parity).
        from rainforest_spark.operators.sketches import (
            kmv_novelty_report,
        )
        from rainforest_spark.sources.versioned import read_snapshot
        from rainforest_spark.streaming.analytics import (
            kmv_weighted_sink,
        )
        src = ensure_doc_files(spark, sf_dir)
        store, ckpt = _fresh(), _fresh()
        sk = os.path.join(store, "kmvw")
        sink = kmv_weighted_sink(sk, "text", ["source"], k=256,
                                 weight_col="n_chars",
                                 query_key="s06")
        n_reports = [0]

        def write(batch_df, batch_id):
            sink(batch_df, batch_id)
            rep = kmv_novelty_report(
                read_snapshot(batch_df.sparkSession, sk),
                "source", 256).collect()
            if not rep:
                raise RuntimeError(
                    "s06: empty novelty report from the maintained "
                    "sketch store")
            n_reports[0] += 1

        stream = (spark.readStream
                  .schema("doc_id bigint, text string, lang string, "
                          "source string, n_chars bigint")
                  .option("maxFilesPerTrigger", 2).parquet(src))
        q = (stream.writeStream.foreachBatch(write)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        tier = os.path.basename(sf_dir.rstrip("/"))
        label = f"s06:{tier}"
        try:
            ok = q.awaitTermination(600)
            if not ok:
                q.stop()
                raise RuntimeError(
                    f"streaming bench entry {label} still running "
                    f"after 600s — failing loudly instead of "
                    f"recording a partial run as a timing")
            rows = read_snapshot(spark, sk).count()
            prog = q.lastProgress or {}
            _STREAM_STATE[label] = {
                "state_rows": 0,       # stateless stream (foreachBatch)
                "sketch_rows": int(rows),
                "reports": n_reports[0],
                "batches": int(prog.get("batchId", -1)) + 1}
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)

    def s03_hll_sink(spark, sf_dir):
        # the exactly-once sketch sink: per-batch HLL registers folded
        # into a versioned store through tagged commits (T7)
        from rainforest_spark.streaming.analytics import (
            hll_cardinality_sink,
        )
        src = ensure_event_files(spark, sf_dir)
        store, ckpt = _fresh(), _fresh()
        sink = hll_cardinality_sink(os.path.join(store, "hll"),
                                    "user_id", ["event_type"], b=8)
        stream = (spark.readStream.schema(ev_schema)
                  .option("maxFilesPerTrigger", 2).parquet(src))
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        tier = os.path.basename(sf_dir.rstrip("/"))
        _finish(q, store, ckpt, label=f"s03:{tier}")

    def s04_session_rollup(spark, sf_dir):
        # session-window state at user cardinality: the r9 streaming
        # sessionization over time-ordered event files
        from rainforest_spark.streaming.analytics import (
            session_rollup_stream,
        )
        src = ensure_event_files(spark, sf_dir)
        sink, ckpt = _fresh(), _fresh()
        stream = (spark.readStream.schema(ev_schema)
                  .option("maxFilesPerTrigger", 2).parquet(src))
        q = (session_rollup_stream(stream, ["user_id"], "ep", 1800,
                                   watermark="2 hours",
                                   value_col="value")
             .writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        tier = os.path.basename(sf_dir.rstrip("/"))
        _finish(q, sink, ckpt, label=f"s04:{tier}")

    # s01's keyspace is tiny by construction (1 station × ~6 ten-min
    # windows in flight), but its state ops inherit the session's
    # cpus-sized shuffle partitions — and per-partition state-store
    # commits serialize ~12 ms each behind the global
    # StateStore.loadedProviders lock (thread dumps, r14), so 32
    # near-empty partitions × 31 micro-batches is pure convoy: commit
    # sums 384 s at p32 vs 17.8 s at p8 (sf1).  Size state partitions
    # to the KEY CARDINALITY, not the core count — measured r14
    # steal-guarded: sf1 28–32 → ~14.6 s, sf10 46.6 → 17.7 s (with the
    # checksum fix, session.py).  s04 keeps cpus-sized partitions: its
    # state is user-cardinality (32 k rows at sf10) and data-bound —
    # p8 there would cut real parallelism.
    s01_rt_tenmin.confs = {
        "spark.sql.shuffle.partitions":
            str(min(8, default_parallelism()))}

    return {"s01_rt_tenmin": s01_rt_tenmin,
            "s02_curation_gate": s02_curation_gate,
            "s03_hll_sink": s03_hll_sink,
            "s04_session_rollup": s04_session_rollup,
            "s05_gated_curation": s05_gated_curation,
            "s06_kmv_novelty_loop": s06_kmv_novelty_loop}


def _load_baseline() -> dict:
    """Committed baseline; legacy flat {query: sec} maps to sf0.1."""
    if not os.path.exists(BASELINE_PATH):
        return {}
    raw = json.load(open(BASELINE_PATH))
    if "sf0.1" in raw or "sf1" in raw:
        return raw
    return {"sf0.1": raw}


def main() -> None:
    from rainforest_spark.session import default_parallelism, get_spark
    from rainforest_spark.workload import all_queries

    spark = get_spark("rainforest-spark-bench")
    qs = all_queries()
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    cpus = default_parallelism()
    # low-/alt-core scaling run (see BASELINE_CPUS): full sf0.1 map at
    # min-of-2, scale tiers off by default (env-overridable), baseline
    # guards off — the run must FINISH inside the driver's timeout to
    # be worth anything
    scaling_run = cpus != BASELINE_CPUS

    def run(fn, sf_dir):
        # per-entry conf overrides (fn.confs) must surround the ACTION —
        # Spark plans lazily, so setting them at DataFrame-build time
        # would not affect the executed plan
        confs = getattr(fn, "confs", None)
        saved = {}
        if confs:
            saved = {k: spark.conf.get(k) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
        try:
            out = fn(spark, sf_dir)
            if out is not None:   # streaming entries ran to completion
                out.write.format("noop").mode("overwrite").save()
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    def best_of(fn, sf_dir, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(fn, sf_dir)
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # warm the JVM + parquet footers with the flagship query once
    run(qs["q01_pricing_summary"], SF_DIR)

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS",
                              "5" if not scaling_run else "2"))
    extra = _extra_queries()
    stream_extra = _streaming_queries()
    qs = dict(qs)
    qs.update(extra)
    qs.update(stream_extra)
    # streaming entries get 2 reps regardless of SPARK_GRAFT_BENCH_REPS:
    # each rep is a full fresh-checkpoint availableNow run (multi-batch,
    # state store, sink commits) — min-of-2 already filters host stalls
    # and min-of-5 would triple the tier's wall for no extra signal
    stream_reps = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_REPS",
                                     "2"))
    names = HEADLINE + sorted(extra)
    times = {name: best_of(qs[name], SF_DIR, reps) for name in names}
    times.update({name: best_of(qs[name], SF_DIR, stream_reps)
                  for name in sorted(stream_extra)})
    total = round(sum(times.values()), 3)

    # ---- sf1 tier: only in the default sf0.1 run, opt-out-able --------
    sf1_times: dict[str, float] = {}
    run_sf1 = (sf == "0.1"
               and os.environ.get(
                   "SPARK_GRAFT_BENCH_SF1",
                   "1" if not scaling_run else "0") != "0")
    if run_sf1:
        from rainforest_spark.tools.scale_gen import ensure_tier
        if ensure_tier(spark, SF_DIR, SF1_DIR):
            print(f"generated sf1 tier -> {SF1_DIR}", file=sys.stderr)
        sf1_reps = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_REPS", "2"))
        sf1_times = {name: best_of(qs[name], SF1_DIR, sf1_reps)
                     for name in (SF1_HEADLINE + sorted(extra)
                                  + sorted(stream_extra))}

    # drop per-tier JVM residue (cached relations, broadcast cleanup
    # lag) before the big-tier phase — the accumulated state of ~46
    # sf0.1+sf1 queries is what pushed an sf10 broadcast build over
    # the old 8g heap
    spark.catalog.clearCache()

    # ---- sf10 spot tier: second measured decade, opt-out-able ---------
    sf10_times: dict[str, float] = {}
    run_sf10 = (sf == "0.1"
                and os.environ.get(
                    "SPARK_GRAFT_BENCH_SF10",
                    "1" if not scaling_run else "0") != "0")
    if run_sf10:
        from rainforest_spark.tools.scale_gen import ensure_tier
        if ensure_tier(spark, SF_DIR, SF10_DIR, factor=100):
            print(f"generated sf10 tier -> {SF10_DIR}", file=sys.stderr)
        sf10_reps = int(os.environ.get("SPARK_GRAFT_BENCH_SF10_REPS", "2"))
        # streaming third-decade entries run ONE fresh-checkpoint rep
        # by default: each is a full multi-minute availableNow run and
        # the adjudication canary re-measures on any guard trip anyway
        sf10_stream_reps = int(os.environ.get(
            "SPARK_GRAFT_BENCH_SF10_STREAM_REPS", "1"))
        sf10_times = {name: best_of(
            qs[name], SF10_DIR,
            sf10_stream_reps if name in stream_extra else sf10_reps)
            for name in SF10_HEADLINE}

    # ---- guards + mechanized adjudication -----------------------------
    # This VM exhibits multi-second host stalls that can span BOTH reps
    # of one query (measured: q62@sf1 8.86 s in a full run vs a 1.3 s
    # idle floor minutes later; q54 exhibit 19.9-60.9 s same-code).
    # The round-9 protocol (canary before believing a trip) ran
    # correctly but MANUALLY twice; it now lives in the instrument
    # (VERDICT r9 #6): on any guard trip, bench.py records the load
    # average, settles, re-runs only the offenders best-of-N, and
    # emits a machine-readable adjudication block — so a future rc=1
    # carries its own evidence.  Thresholds are untouched; a real
    # regression reproduces in the canary, a stall does not.
    adjudication: list[dict] = []
    failures: list[dict] = []
    if os.environ.get("SPARK_GRAFT_BENCH_REBASELINE") != "1":
        base = _guard_baseline(_load_baseline(), cpus)
        if sf != "0.1":   # baseline is defined at sf0.1 only
            base = {k: v for k, v in base.items() if k != "sf0.1"}

        # canaries should not inherit the run's JVM residue (cached
        # relations, broadcast cleanup lag) on top of the host noise
        # they exist to filter
        spark.catalog.clearCache()

        def _rerun(tier, name):
            tdir = {"sf0.1": SF_DIR, "sf1": SF1_DIR,
                    "sf10": SF10_DIR}[tier]
            canary_reps = 1 if name in stream_extra else int(
                os.environ.get("SPARK_GRAFT_BENCH_CANARY_REPS", "3"))
            t2 = best_of(qs[name], tdir, canary_reps)
            print(f"adjudication canary {name} {tier}: -> {t2}",
                  file=sys.stderr)
            return t2

        adjudication, failures = adjudicate(
            times, sf1_times, sf10_times, base, _rerun,
            settle=float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE",
                                        "10")))
    total = round(sum(times.values()), 3)

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if sf1_times:
        out["sf1"] = {"queries": sf1_times,
                      "value": round(sum(sf1_times.values()), 3)}
    if sf10_times:
        out["sf10"] = {"queries": sf10_times,
                       "value": round(sum(sf10_times.values()), 3)}
    if adjudication:
        out["adjudication"] = adjudication
    print(json.dumps(out))

    if os.environ.get("SPARK_GRAFT_BENCH_REBASELINE") == "1":
        # the guard only compares at sf0.1 — a rebaseline at any other
        # scale factor would silently poison the committed baseline
        if sf != "0.1":
            print(f"REFUSING rebaseline at sf={sf}: the committed "
                  f"baseline is defined at sf0.1", file=sys.stderr)
            sys.exit(1)
        if cpus != BASELINE_CPUS:
            print(f"REFUSING rebaseline at cpus={cpus}: the committed "
                  f"baseline is a local[{BASELINE_CPUS}] artifact",
                  file=sys.stderr)
            sys.exit(1)
        new_base = {"sf0.1": times}
        old = _load_baseline()
        for tier, tier_times in (("sf1", sf1_times), ("sf10", sf10_times)):
            if tier_times:
                new_base[tier] = tier_times
            elif tier in old:  # keep prior block if this run skipped it
                new_base[tier] = old[tier]
        json.dump(new_base, open(BASELINE_PATH, "w"), indent=1)
        print(f"re-baselined {len(times)} queries -> {BASELINE_PATH}",
              file=sys.stderr)
        spark.stop()
        sys.stdout.flush()
        print(json.dumps(_summary_line(times, sf1_times, sf10_times,
                                       {}, sf, 0, [], [])))
        return

    rc = 1 if failures else 0
    for f_ in failures:
        print(f_["msg"], file=sys.stderr)
    # the compact self-contained record is the LAST stdout line: the
    # driver tail-captures bench output and the full per-tier JSON
    # above can exceed the capture (every BENCH_r*.json through r9 had
    # "parsed": null and r9 lost its sf0.1 numbers entirely) — this
    # line carries the contract fields + per-tier totals + worst-3
    # ratios + stream state + adjudication verdicts in ~4 KB.  Stop
    # the JVM first: its gc/log lines share fd 1 and a background GC
    # warning mid-print would corrupt the one record that must parse
    # (an sf10 run was observed emitting gc,alloc warnings to stdout).
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(_summary_line(times, sf1_times, sf10_times,
                                   base, sf, rc, adjudication,
                                   failures)))
    if rc:
        sys.exit(rc)


def evaluate_guards(times: dict, sf1_times: dict, sf10_times: dict,
                    base: dict) -> list[dict]:
    """All guard trips as structured failures.  Kinds:

    - ``physics``: a scale tier exceeded 2x-linear of the SAME-RUN
      sf0.1 time (not rebaselineable by design);
    - ``regression``: a query exceeded ratio+floor vs its committed
      per-tier baseline;
    - ``uniform_drift``: the sf0.1 common-query total exceeded
      TOTAL_RATIO x the baseline total (carries ``worst`` — the
      highest-ratio queries — for the canary to re-run).
    """
    failures: list[dict] = []
    for tier, tier_times, ratio, floor, mult in (
            ("sf1", sf1_times, SF1_LINEAR_RATIO, SF1_LINEAR_FLOOR,
             "10x"),
            ("sf10", sf10_times, SF10_LINEAR_RATIO, SF10_LINEAR_FLOOR,
             "100x")):
        for name, t1 in tier_times.items():
            if name not in times:
                continue  # tier-only operator variant, no counterpart
            limit = ratio * times[name] + floor
            if t1 > limit:
                failures.append({
                    "kind": "physics", "tier": tier, "name": name,
                    "sec": t1, "limit": round(limit, 3),
                    "baseline": times[name],
                    "msg": (f"{tier.upper()} SUPERLINEAR: {name} "
                            f"{t1:.2f}s at {mult} data > {ratio:.0f}x "
                            f"linear of same-run sf0.1 "
                            f"{times[name]:.2f}s (+{floor}s)")})
    b01 = base.get("sf0.1") or {}
    if b01:
        for n, t in times.items():
            if (n in b01 and t > PER_QUERY_RATIO * b01[n]
                    and t > b01[n] + PER_QUERY_FLOOR):
                failures.append({
                    "kind": "regression", "tier": "sf0.1", "name": n,
                    "sec": t, "baseline": b01[n],
                    "limit": round(max(PER_QUERY_RATIO * b01[n],
                                       b01[n] + PER_QUERY_FLOOR), 3),
                    "msg": (f"BENCH REGRESSION (>{PER_QUERY_RATIO}x + "
                            f"{PER_QUERY_FLOOR}s vs baseline): "
                            f"{n} {t} vs {b01[n]}")})
        common = [n for n in times if n in b01]
        t_sum = sum(times[n] for n in common)
        b_sum = sum(b01[n] for n in common)
        if common and t_sum > TOTAL_RATIO * b_sum:
            worst = sorted(common,
                           key=lambda n: (times[n] / b01[n]
                                          if b01[n] > 0 else 0),
                           reverse=True)[:5]
            failures.append({
                "kind": "uniform_drift", "tier": "sf0.1", "name": None,
                "sec": round(t_sum, 3), "baseline": round(b_sum, 3),
                "limit": round(TOTAL_RATIO * b_sum, 3), "worst": worst,
                "msg": (f"BENCH REGRESSION (uniform drift): "
                        f"common-query total {t_sum:.2f}s > "
                        f"{TOTAL_RATIO}x baseline {b_sum:.2f}s")})
    for tier, tier_times in (("sf1", sf1_times), ("sf10", sf10_times)):
        bt = base.get(tier) or {}
        if not (tier_times and bt):
            continue
        for n, t in tier_times.items():
            if (n in bt and n not in TIER_GUARD_EXEMPT
                    and t > SF1_PER_QUERY_RATIO * bt[n]
                    and t > bt[n] + SF1_PER_QUERY_FLOOR):
                failures.append({
                    "kind": "regression", "tier": tier, "name": n,
                    "sec": t, "baseline": bt[n],
                    "limit": round(max(SF1_PER_QUERY_RATIO * bt[n],
                                       bt[n] + SF1_PER_QUERY_FLOOR),
                                   3),
                    "msg": (f"{tier.upper()} REGRESSION "
                            f"(>{SF1_PER_QUERY_RATIO}x + "
                            f"{SF1_PER_QUERY_FLOOR}s vs baseline): "
                            f"{n} {t} vs {bt[n]}")})
    return failures


def adjudicate(times: dict, sf1_times: dict, sf10_times: dict,
               base: dict, rerun, sleep=time.sleep, loadavg=None,
               settle: float = 10.0):
    """The rc=1 canary protocol, mechanized: evaluate the guards; on
    any trip, record the load average, settle, re-run ONLY the
    offenders (``rerun(tier, name) -> sec``; uniform drift re-runs its
    worst-ratio queries), fold the minima back into the tier dicts,
    re-evaluate, and return ``(adjudication, remaining_failures)``.
    Each adjudication entry carries the evidence the round-9 manual
    protocol wrote in prose: tripped time, canary floor, the limit it
    tripped, the load average at trip time, and the verdict —
    ``regression`` (still failing after the canary) or
    ``environmental`` (the canary cleared it).  MUTATES the tier
    dicts (keeps min of original and canary, like a stalled rep)."""
    tiers = {"sf0.1": times, "sf1": sf1_times, "sf10": sf10_times}
    failures = evaluate_guards(times, sf1_times, sf10_times, base)
    if not failures:
        return [], []
    try:
        la = [round(x, 2) for x in (loadavg or os.getloadavg)()]
    except OSError:   # platform without getloadavg
        la = None
    offenders: list[tuple[str, str, dict]] = []
    seen: set = set()
    for f in failures:
        names = [f["name"]] if f["name"] else f.get("worst", [])
        for n in names:
            if (f["tier"], n) not in seen:
                seen.add((f["tier"], n))
                offenders.append((f["tier"], n, f))
    sleep(settle)
    adjudication = []
    for tier, name, f in offenders:
        tripped = tiers[tier][name]
        canary = rerun(tier, name)
        tiers[tier][name] = min(tripped, canary)
        try:
            la2 = [round(x, 2) for x in (loadavg or os.getloadavg)()]
        except OSError:
            la2 = None
        adjudication.append({
            "query": name, "tier": tier, "kind": f["kind"],
            "tripped_sec": tripped, "canary_sec": canary,
            "baseline_sec": f.get("baseline"),
            "limit_sec": f.get("limit"),
            "loadavg_at_trip": la,
            # the canary shares the run's environment: a high load
            # average HERE means a "regression" verdict still needs
            # the fresh-JVM idle re-measure (the PERF.md protocol) —
            # the in-run canary cannot outrun a degraded host
            "loadavg_at_canary": la2})
    remaining = evaluate_guards(times, sf1_times, sf10_times, base)
    still = {(f["tier"], f["name"]) for f in remaining if f["name"]}
    drift_still = {f["tier"] for f in remaining
                   if f["kind"] == "uniform_drift"}
    for a in adjudication:
        if (a["tier"], a["query"]) in still or (
                a["kind"] == "uniform_drift"
                and a["tier"] in drift_still):
            a["verdict"] = "regression"
        else:
            a["verdict"] = "environmental"
    return adjudication, remaining


def _summary_line(times: dict, sf1_times: dict, sf10_times: dict,
                  base: dict, sf: str, rc: int, adjudication: list,
                  failures: list) -> dict:
    """The compact LAST-line record, sized for the driver's tail
    capture — which is 2000 BYTES (every committed BENCH_r*.json:
    ``tail`` is the last 2000 bytes of stdout, and through r10
    ``parsed`` stayed null because this line still carried the full
    per-query map at ~4-9 KB).  The full per-query JSON line is
    printed immediately before this one; here only the contract
    fields + per-tier totals, worst-3 ratios vs the committed
    baseline, COMPACT stream state (label → [state_rows, batches,
    (bits_rows, m_bits)]) and CAPPED adjudication/failure verdicts —
    bounded under ~1.9 KB at the real ~120-entry scale
    (tests/test_bench_adjudication.py exercises that size)."""
    def worst3(td, bd):
        r = sorted(((round(t / bd[n], 3), n) for n, t in td.items()
                    if n in bd and bd[n] > 0), reverse=True)
        return [[n, ratio] for ratio, n in r[:3]]

    tiers = {"sf0.1": {"total": round(sum(times.values()), 3),
                       "n": len(times),
                       "worst_vs_baseline": worst3(
                           times, base.get("sf0.1") or {})}}
    for key, td in (("sf1", sf1_times), ("sf10", sf10_times)):
        if td:
            tiers[key] = {"total": round(sum(td.values()), 3),
                          "n": len(td),
                          "worst_vs_baseline": worst3(
                              td, base.get(key) or {})}
    line = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rc": rc,
        "n_queries": len(times),
        "tiers": tiers,
    }
    if _STREAM_STATE:
        compact = {}
        for label, st in _STREAM_STATE.items():
            row = [st.get("state_rows"), st.get("batches")]
            if "bloom_bits_rows" in st:
                row += [st["bloom_bits_rows"], st.get("m_bits"),
                        st.get("n_slabs")]
            if "sketch_rows" in st:
                row += [st["sketch_rows"]]
            compact[label] = row
        line["stream_state"] = compact
    if adjudication:
        line["n_adjudications"] = len(adjudication)
        line["adjudication"] = [
            [a["query"], a["tier"], a["kind"], a["tripped_sec"],
             a["canary_sec"], a["verdict"]]
            for a in adjudication[:6]]
    if failures:
        line["n_failures"] = len(failures)
        line["failures"] = [f["msg"][:110] for f in failures[:3]]
    return line


if __name__ == "__main__":
    main()
