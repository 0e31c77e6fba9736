"""Dump physical plans (explain 'formatted') for representative
queries into PLANS.md — the scale-audit artifact: shows predicate
pushdown (PushedFilters), column pruning (ReadSchema), broadcast
joins, and exchange placement for each plan family.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from rakam_api_spark.session import get_spark

SHOW = {
    # round-15 additions
    "returns_impact_by_nation": "two fact shuffles (orderkey, custkey); un-hinted customer/nation joins (AQE build side); ONE 25-row conditional DECIMAL aggregate",
    "order_line_count_value_curve": "lineitem reduces to order grain FIRST (map-side partial); same-key join to orders; enum line-count cells",
    "customer_yoy_retention_by_segment": "distinct (cust,year); Y->Y+1 self-join reuses the custkey hash partitioning; (segment x years) cells",
    "nation_order_value_median_gap": "un-hinted dim joins; ONE 25-group aggregate with exact percentile (approx_percentile at 100 TB, same shape)",
    "priority_settlement_lift": "one fact join + aggregate to <=5x2 cells; marginals aggregate THE CELLS (no second fact scan), broadcast back",
    "brand_size_price_slope": "part-only |brands| aggregate of exact integer/DECIMAL sums; closed-form OLS row-local",
    "supplier_balance_late_bands": "fact join reduces to supplier grain FIRST; un-hinted supplier-dim join of the aggregate; enum band cells",
    "unit_price_consistency_by_type": "partkey aggregate of exact DECIMAL min/max/sum (no wide-decimal squares); per-part spread DECIMAL-cast before the type average (order-free)",
    "high_value_repeat_by_segment": "exact-percentile scalar broadcast back; filtered orders -> (segment,cust) counts; segment cells",
    "inter_session_gap_bands": "shared session kernel (ONE user-keyed exchange); session-grain lag bounded per user; enum band aggregate",
    "value_by_session_position": "session kernel + row_number bounded by session length; enum position bands; raw double mean of exact DECIMAL sum",
    "rapid_fire_share_by_type": "ONE user-keyed lag (integer-us delta); enum per-type aggregate",
    "session_count_duration_quadrants": "session kernel -> user grain; TWO medians in one scalar percentile aggregate broadcast back; 4 cells",
    "type_value_cv_by_hour": "ONE (type,hour) aggregate of exact DECIMAL moments (12,4-operand squares dodge decimal-multiply overflow); row-local CV",
    "consecutive_hour_user_overlap": "distinct (user,abs-hour) by integer div; h->h+1 self-join reuses the hash partitioning; 24 cells",
    "intra_session_type_diversity": "session kernel + ONE session-grain aggregate (count + distinct types); enum band cells",
    "user_daypart_preference": "(user,daypart) aggregate <=4 rows/user; argmax row_number over that bounded partition; 4 cells",
    "word_length_profile_by_lang": "ONE token explode + |langs| aggregate; all sums exact integers",
    "intra_doc_repetition_by_source": "row-local sequence+slice 5-gram transform; ONE explode + doc-grain distinct aggregate; per-doc rate DECIMAL-cast before source average",
    "doc_half_jaccard_by_lang": "purely ROW-LOCAL array math (slice/distinct/intersect) — no explode, no join; |langs| aggregate of DECIMAL-cast scores",
    "adjacent_vector_angle_bands": "corpus posexploded once; successor pairing is a component-grain EQUI-join (hash-partitioned, never a corpus broadcast); exact integer dot/norms; banded on the rounded cosine",
    "window_new_user_share": "user-grain first-seen min joined back on user_id; ONE window aggregate; 9dp share",
    "window_value_skew": "ONE window-keyed aggregate of exact DECIMAL power sums (widened cube); row-local skewness assembly",
    "matview_rows_grain_read": "rows-grain materialized view: plain txn-table scan through the SQL alias (grain classifier skips re-aggregation); refresh was O(increment)",
    "table_changes_since_timestamp": "timestamp-form change-feed TVF: O(log commits) version_at resolution, then the same files-only scan + broadcast attribution as the version form",
    "table_history_audit": "DESCRIBE HISTORY analog: driver-side commit-metadata frame (no table data read); last_n bounds the metadata opens",
    "type_adoption_lag": "two co-keyed user-grain min aggregates joined on user_id; ONE |types| aggregate with NULL-masked percentile; exact integer us lags",
    "order_value_band_status_mix": "two-pass global quartile cutoffs (single-row broadcast crossJoin); (band,status) cells; band totals re-aggregate THE CELLS",
    "window_user_value_concentration": "(window,user) DECIMAL aggregate then ONE window-grain count/sum/max — no rank window; share is max/sum row-local",
    "type_value_autocorr_lag1": "ONE (type,day) DECIMAL aggregate; calendar-bounded self-join on (type, day+1) — cell grain, never event rows; |types| exact cross-moment aggregate, row-local Pearson",
    "doc_length_norm_correlation": "shared quantized-norm kernel (ONE posexplode); id-grain equi-join docs<->norms (no corpus broadcast); |langs| exact DECIMAL cross-moments, row-local Pearson",
    "discount_return_association": "ONE lineitem aggregate on the exact integer discount-percent band (<=11 cells); conditional counts + DECIMAL revenue; shares row-local",
    # round-14 additions
    "window_value_quantiles": "ONE F.window-keyed aggregate (row-local bucket arithmetic); exact percentiles per calendar-bounded window",
    "window_type_churn": "(window,type) cells; shares from cell-aggregate totals; type-partitioned lag over the calendar-bounded window series",
    "matview_incremental_rollup": "cells-grain materialized view read through the SQL alias: txn-table scan of partial cells + the service's enum-sized consumption re-aggregate (refresh itself was O(increment) via the change feed)",
    "realized_vs_retail_by_discount": "un-hinted lineitem-part join; ONE aggregate to <=11 discount-pct cells; DECIMAL value pair",
    "supplier_nation_price_advantage": "un-hinted supplier/part joins + broadcast nation dim; ONE (nation,type) fact aggregate; type globals aggregate the cells",
    "brand_quarter_share_shift": "un-hinted lineitem-part join; ONE (brand,quarter) aggregate; quarter totals aggregate the cells",
    "session_entry_hour_conversion": "shared 30-min session kernel (ONE user-keyed exchange); min-of-struct entry; 24-cell aggregate",
    "event_value_pareto_by_type": "per-type exact percentile broadcast back; ONE conditional DECIMAL aggregate",
    "table_changes_rollup": "change-feed TVF through the SQL service: parquet scan of ONLY the commits' files; (file->version/type) attribution broadcast; enum-sized per-commit rollup",
    "priority_escalation_matrix": "ONE customer-keyed lag window over orders; 5x5 enum cells; broadcast-back row totals",
    "part_substitution_candidates": "DIMENSION-grain self-join co-partitioned on (type,size); per-cell rank window over surviving pairs only",
    "order_value_theil_by_segment": "un-hinted orders-customer equi-join (AQE build side); 5-row segment means broadcast back; map-side ln-term collapse",
    "weekday_revenue_share_drift": "one fact aggregate to (year x dow) cells; year totals aggregate THOSE cells; arithmetic on enum frame",
    "brand_supplier_concentration": "un-hinted lineitem-part join; ONE (brand,supplier) fact aggregate; brand-grain HHI rollup of cells",
    "ship_gap_bands_by_priority": "fact-fact natural-key join; exact integer day bands clamped to [-1,8]; <=5x10 enum grid",
    "type_affinity_lift": "distinct to (user,type); self-join fan-out bounded by C(|types|,2) per user; enum pair cells + broadcast marginals",
    "retention_powerlaw_fit": "user-grain min + (user,day) distinct; day-offset aggregate <=30 rows; closed-form OLS",
    "value_winsorized_means_by_type": "per-type exact percentile broadcast back; ONE clamped DECIMAL aggregate",
    "first_last_type_agreement": "ONE user-grain min/max-of-struct aggregate (no window); enum^2 matrix",
    "user_weekly_cv_bands": "(user,week) counts by integer epoch division; user-grain EXACT integer moments; enum band histogram",
    "daily_count_dispersion_by_type": "(type,day) counts; type-grain exact integer moments; |types| rows",
    "stopword_density_bands": "row-local integer token counts (codegen); enum band aggregate",
    "sentence_length_percentiles_by_lang": "one regex-split explode to sentence grain; |langs| percentile aggregate",
    "readability_composite_by_source": "three row-local integer totals in ONE source aggregate; float chain over |sources| rows",
    "char_trigram_oov_by_source": "ONE trigram explode (corpus-linear); profile is TakeOrdered top-500 broadcast (no rank window); cell aggregate",
    "label_silhouette_proxy": "corpus posexploded once (label carried, no corpus join); broadcast centroid frame; |labels|^2 rival matrix",
    "embedding_norm_percentiles_by_label": "vector-grain exact integer norm reduce; |labels| percentile aggregate",
    "dimension_variance_topk": "ONE d-row exact integer moment aggregate; TakeOrdered on the integer variance numerator (no window)",
    # round-13 additions (batch 2)
    "dup_cluster_lang_purity": "memoized pair graph -> components; ONE lang join; cluster-grain distinct-lang counts; tiny histogram",
    "user_lifetime_km_curve": "ONE user-grain min/max aggregate builds spans (no event-row window); KM windows over calendar-bounded day buckets (exempt class)",
    "purchase_regularity_bands": "purchase filter pushes to the scan; ONE user-keyed lag exchange; user-grain exact integer moments (g^2 through DECIMAL to dodge int64 overflow); enum band rollup",
    "enrich_channel_value": "ReferrerMapper parse is row-local codegen; one enum-sized channel aggregate; DECIMAL value",
    "supplier_share_trend_movers": "fact -> (supplier, quarter) cells in one aggregate; quarter totals broadcast back; supplier-grain OLS rollup; global top-k via TakeOrderedAndProject",
    "price_interaction_type_size": "one part-dim aggregate to enum cells; row/col/grand means aggregate those cells and join back broadcast-sized",
    "doc_length_anova_by_lang": "one |langs|-sized DECIMAL moment aggregate; F-ratio is a final 1-row double chain",
    "packing_efficiency_curve": "one tokenize-count pass to doc grain; broadcast 4-row length grid fan-out; pure integer ceil-div arithmetic",
    "error_budget_burn_daily": "day-grain aggregate; cumulative window over calendar-bounded rows (documented exemption class)",
    "first_vs_later_sessions": "shared session kernel (one user-keyed exchange); exact session_no==1 class; 2-row aggregate",
    # round-13 additions
    "session_handoff_matrix": "shared session kernel (ONE user-keyed exchange, two endpoint row_numbers); hand-off lag runs over session-grain rows; enum^2 cells + broadcast-back from-totals",
    "session_value_by_duration_band": "same session kernel; banding on exact ns thresholds is row-local; one enum-sized aggregate",
    "user_dominant_type_share": "(user,type) counts -> per-user argmax over <=|types| rows; integer-exact decile (n*10 div total); enum histogram",
    "hourly_error_pchart": "one 24-row aggregate; global rate broadcast back; limits are identical IEEE chains both engines",
    "conversion_latency_weekly": "two conditional user-grain aggregates; (week,gap) histogram; cumulative window over DISTINCT gaps; conditional-min rollup (exact integer ranks)",
    "value_by_line_position": "one lineitem aggregate to <=7 position cells; broadcast-back total",
    "part_name_term_premium": "explode over the part DIM only; deterministic top-30; 1-row global average cross-joined broadcast",
    "quarter_end_loading": "orders -> (quarter, tail-flag) cells by exact date arithmetic; enum-sized output",
    "reactivated_order_value_gap": "one customer-partitioned lag over ORDER-grain rows; enum (segment x class) cells; DECIMAL value",
    "supplier_portfolio_diversity": "(supplier,type) revenue cells off a broadcast part join; supplier-grain entropy (rounded-term DECIMAL); nation rollup via broadcast dims",
    "source_unigram_jsd": "ONE token-keyed equi-join between per-source distributions (never |sources|^2 corpus scans); shared terms sum as DECIMAL; private mass from exact integer count sums; final combine stays DECIMAL + one exact *0.5",
    "lang_profile_confusion": "(doc,bigram) counts once; profiles broadcast; fan-out bounded by |langs| enum; per-(doc,lang) scores are exact DECIMAL sums; argmax row_number over |langs| rows per doc",
    "dup_quality_gap": "one text-keyed aggregate for the dup flag (exact equality, no hash); row-local TTR; enum cells",
    "knn_purity_at_k": "rides the brute-force Arrow kernel (per-partition top-k, corpus never pair-joined); the BOUNDED top-k frame broadcasts, corpus label scans stream (no corpus-grain broadcast, r13 fix); query-grain aggregate",
    "vector_margin_histogram": "corpus posexploded once with the label carried through (no corpus-grain label join, r13 fix); |labels|xd centroid table broadcast; (vec,label) aggregate -> 2-rows-per-vec rank filter -> enum histogram",
    "pq_code_balance": "memoized PQ fit (build-once probe-many); audit is one (m,code) aggregate + |subspaces| rollup",
    "embedding_dim_correlation_pairs": "mapInPandas Gram-matrix kernel: d^2 partial rows PER PARTITION regardless of corpus size (BLAS, exact integer-valued f64); keyed reduce; top-k",
    "window_topk_types": "(window,type) partial-agg cells; rank window partitions BY WINDOW over <=|types| rows; same F.window assignment as the streaming plans",
    "dedup_survivor_selection": "bounded pair graph -> components; survivor row_number partitions BY CLUSTER KEY (small groups); source rollup",
    # round-12 additions
    "customer_decile_share_twopass": "rank-offset two-pass decile: range-repartition on the full sort tuple, partition x segment counts to the driver (metadata-scale), rank = offset + partition-local row_number — NO single-task per-segment sort; ntile arithmetic exact",
    "part_size_value_bands": "one partial-agg groupBy of the part dim to <=5 band cells; total aggregates those cells broadcast-back",
    "nation_type_specialization": "fact scan joins two broadcast dim chains; reduce ONCE to (nation,type) cells; argmax row_number windows over the cell table only",
    "supplier_acctbal_by_nation": "one broadcast dim join + one partial-agg groupBy to |nations| cells; DECIMAL balance sums",
    "peak_concurrent_sessions_daily": "sessions via ONE user-partitioned window; +1/-1 boundaries GROUPED to distinct instants before the per-day running-sum window (watch: one day's distinct instants is the window input — two-pass offsets like the decile cut if a day ever exceeds a partition)",
    "value_p90_concentration_by_type": "events reduce to (type,cents) HISTOGRAM cells; cumulative window runs over distinct values only; rank cutoff in exact integer arithmetic (no interpolation)",
    "max_dormancy_histogram": "one lag window PARTITIONED BY USER; per-user max; day-grain histogram (tiny)",
    "heaps_vocab_growth": "ONE tokenize pass to token-grain first_doc; 5 checkpoints = 5 counts over that aggregate via a broadcast 5-row grid (bounded fan-out), never 5 corpus scans",
    "token_entropy_by_source": "one tokenize pass to (source,token) counts; entropy terms rounded into DECIMAL(18,9) then summed (order-free)",
    "intra_inter_label_affinity": "corpus posexploded ONCE; sum-vector identities give all pairwise-dot means from (label,dim) aggregates — no pair ever materialized",
    "supply_degree_histogram": "ONE distinct over (part,supplier) pairs feeds both degree aggregates; histograms are degree-grain",
    "order_value_boxplot_monthly": "orders reduce to (month,cents) histogram cells; one cumulative window over distinct values; all three quartile cutoffs from ONE conditional-min aggregate (exact integer ranks)",
    "event_type_user_jaccard": "events reduce ONCE to distinct (user,type); self-join fan-out bounded by |types|^2 per user; counts exact",
    "centroid_nearest_rival": "same (label,dim) centroid aggregate as label_centroid_distances; argmin row_number over the |labels|^2 cell table only",
    "basket_size_by_segment": "lineitem reduces to order-grain line counts BEFORE joining orders + customer dim; |segments| cells",
    "user_journey_endpoints": "ONE user-grain min/max-struct aggregate; |types|^2 matrix rollup; no window",
    "doc_length_quartiles_by_source": "docs reduce to (source,n_chars) histogram cells; one cumulative window over distinct lengths; three cutoffs from ONE conditional-min aggregate (exact integer ranks)",
    "user_active_streak_histogram": "dedup to (user,day) FIRST; gaps-and-islands key (day_id - row_number) inside the user partition; two enum-sized groupBys",
    "session_first_purchase_position": "two windows over ONE user-keyed exchange (lag marks starts, running sum numbers sessions, row_number positions); session-grain min; bounded histogram",
    "event_type_run_lengths": "rn - rn_by_type islands over ONE user-keyed exchange; island-grain count; (type,len) histogram",
    "customer_onetime_vs_repeat_revenue": "customer-grain lifetime counts (orders touched once); enum label joined back; (year,class) cells",
    "order_lines_value_matrix": "lineitem reduces to order grain FIRST; single join to orders; enum-sized 2-D cell table",
    "nation_revenue_rank_shift": "broadcast customer->nation dims; fact reduces to (nation,half) cells; rank windows over the 25-row nation table only",
    "char_bigram_entropy_by_lang": "row-local transform materializes bigrams in codegen; (lang,bigram) count; per-lang decimal-summed entropy terms",
    "word_pmi_top_pairs": "pair space capped BY CONSTRUCTION to top-100 df vocabulary (broadcast); doc-grain distinct once; ln on exact ints",
    "centroid_distance_histogram": "corpus posexploded ONCE; d-row centroid broadcast; vec-grain exact-decimal aggregate; enum histogram",
    "dimension_discriminability": "corpus posexploded ONCE to (pos,label) cells; all ANOVA terms on exact decimal sums; enum-sized output",
    "event_type_daily_share_volatility": "two day-grain aggregates; shares rounded into DECIMAL and variance from exact sums; no windows",
    "night_owl_vs_early_bird": "(user,band) aggregate off the raw stream; argmax window over <=4 rows/user; enum rollup",
    "repeat_customer_value_uplift": "ONE customer-grain min/max-struct aggregate (no fact-row window); broadcast dim join; segment cells",
    "discount_tax_margin_grid": "single fact pass to an 11x9 enum grid; q1 decimal-chain charge",
    "source_lang_mix": "one enum-sized (source,lang) aggregate; cell+broadcast shares",
    "embedding_quantization_sensitivity": "corpus posexploded ONCE, fanned x4 by literal scales; one aggregate, no joins",
    "value_by_event_ordinal": "ONE row_number window over the user-keyed exchange; bounded histogram",
    "top_value_sessions": "standard session numbering (two windows, one exchange); session-grain aggregate; global top-k on exact decimal",
    "customer_balance_vs_spend_quadrant": "orders reduce to customer grain FIRST; percentile cutoffs broadcast back, row-local bucket comparisons (no global window); 16-cell grid",
    "lang_id_prf": "pure re-aggregation of the lang_id confusion kernel — the audited path IS the deployed path",
    "tokenizer_fertility_by_lang": "two row-local counts per doc (codegen, no explode); enum-sized per-lang aggregate",
    "embedding_exact_dup_groups": "one hash aggregate keyed on the quantized array (row-local transform); enum histogram",
    "session_conversion_by_depth": "standard session numbering (two windows, one exchange); session-grain flag aggregate; enum band rollup",
    "order_value_zscore_outliers": "month-grain exact moments broadcast back over the fact scan; no window over order rows; top-k on rounded z",
    "part_brand_price_dispersion": "one enum-sized brand aggregate; CV from exact decimal moments",
    "monthly_revenue_seasonality_strength": "month-grain aggregate -> month-of-year cells -> two tiny rollups; rounded-term decimal sums of squares",
    "quantity_uniformity_chi2": "one fact groupBy to <=50 cells; exact-integer chi-square numerator; scalar rollup",
    "order_value_percentiles_by_segment": "broadcast dim join; segment-partitioned percentile AGGREGATE (no global window)",
    "supplier_dependency_risk": "(part,supplier) grain FIRST, then part grain, then type enum; rounded-term decimal share averages",
    "brand_cross_region_price_gap": "enum-width supplier->region broadcast chain; (brand,region) cells; <=5-row max-min per brand",
    "error_recovery_time": "ONE forward-frame window (min of following non-error ts) over the user exchange; enum histogram",
    "price_trend_slope_by_type": "fact -> (type,quarter) cells via one part join; integer-x OLS identity on rounded-term decimal sums",
    "cohort_value_retention": "(user,week) decimal value cells; user-grain first-week join; enum offset rollup",
    "length_quality_correlation": "one tokenize pass; per-source Pearson from exact/rounded-term decimal moments",
    "doc_boilerplate_ngram_share": "corpus tokenized ONCE to positional 5-grams; deterministic top-50; broadcast semi-join back; rounded-term share averages",
    # round-11 additions
    "lineitem_field_correlations": "ONE partial-agg pass computes all ten exact decimal moments; Pearson is a final 1-row projection",
    "order_size_histogram": "two partial-agg groupBys (order grain -> size grain) + broadcast-back total; all integers",
    "weekday_hour_peak_per_type": "argmax via row_number over the <=|types|x168 cell aggregate (domain-bounded window input)",
    "sessions_per_user_histogram": "one lag window PARTITIONED BY USER; user-grain sum; 5-wide bands capped at 100 (domain-bounded)",
    "word_freq_top50": "explode -> partial-agg counts -> TakeOrderedAndProject(50); no global sort",
    "avg_word_len_by_lang": "one tokenize pass; exact integer sums per language",
    "daily_value_cusum": "ONE day-grain DECIMAL aggregate; prefix sums via triangular join over the bounded day table; mean broadcast back",
    "centroid_confusion_matrix": "corpus posexploded once; centroid table |labels|*d rows broadcast BY CONSTRUCTION; fan-out linear at (vec,label) grain",
    "order_weekday_priority_mix": "one partial-agg groupBy to <=35 cells; weekday totals join the cell table broadcast-sized",
    "customer_interpurchase_gaps": "telescoped gaps: per-customer mean from (max-min)/(n-1), NO window; one custkey aggregate + dim join",
    "acctbal_decile_profile": "ntile PARTITIONED BY SEGMENT over customer-dim rows (enum partitions, input already one row/customer)",
    "brand_return_rate_quarterly": "fact x part-dim join (AQE broadcast), partial-agg to brand x quarter cells; DECIMAL sums",
    "retail_markup_by_type": "single fact-dim join; aggregate markup = ratio of two exact DECIMAL sums; min/max over bit-identical row doubles",
    "customer_decile_revenue_share": "per-customer DECIMAL aggregate BEFORE the segment-partitioned ntile; segment totals from the 10x|segments| cell table",
    "region_trade_matrix": "two tiny dim chains broadcast onto the fact scan; groupBy to <=25 cells; world total aggregates the cells",
    "new_vs_returning_daily": "reduce to (user,day) then ONE user-keyed aggregate for first days; day rollup; no window",
    "resurrections_monthly": "lag window PARTITIONED BY USER over per-user-day rows (already distinct-reduced)",
    "user_entropy_tiers": "(user,type) counts -> user aggregate -> 4-row tier rollup; entropy rounded both sides before averaging",
    "weekend_lift_by_type": "single partial-agg groupBy with conditional sums; dow is pure column arithmetic (codegen)",
    "first_week_activation_retention": "(user,day) reduction -> one user aggregate computing activation+retention flags together -> 3-row rollup",
    "value_share_by_user_band": "per-user DECIMAL totals; band is a domain-bounded floor expression (no rank window); broadcast-back total",
    "sentence_stats_by_source": "higher-order array exprs stay inside the projection (codegen); partial-agg to |sources| rows; arrays never shuffled",
    "doc_length_gini_by_source": "rank window PARTITIONED BY SOURCE; rank*chars accumulates in DECIMAL(38,6); final two-term float formula",
    "shouting_docs_top20": "regexp strip+measure in codegen; TakeOrderedAndProject(20) — no global sort materialized",
    "token_length_histogram": "explode -> partial-agg counts per 15-bucket domain; share vs broadcast 1-row total",
    "embedding_dimension_profile": "one posexplode pass; per-dim exact integer moments; top-10 via TakeOrderedAndProject",
    "label_centroid_distances": "corpus touched once ((label,dim) aggregate); pair join runs over the tiny centroid table only",
    "q6_forecast_revenue": "pure filter+agg: every predicate reaches the parquet scan "
    "(PushedFilters), 2-column projection, single-row exchange",
    "q5_region_revenue": "5-way dimension join: every dim broadcast, fact table never "
    "shuffled before the final tiny group-by",
    "q4_order_priority": "LEFT SEMI (EXISTS) — no fact-fact multiplicity materialized",
    "asof_view_before_purchase": "as-of join as ONE exchange on the key + a single "
    "window pass (no inequality-join blowup)",
    "sessionization_stats": "sessionization: one shuffle on user_id, window functions "
    "reuse the same partitioning",
    "dedup_minhash_lsh": "MinHash-LSH: doc-local Arrow signature kernel (one row per "
    "doc shuffled, no shingle rows on the wire), bucket groupBy + in-bucket pair "
    "expansion (no self-join), verify explodes shingles for candidate docs only",
    "enrich_geoip": "GeoIP range join: broadcast nested-loop against the small range "
    "dim — the right plan when the build side is tiny and the condition is a range",
    "tumbling_window_counts": "event-time windows: partial aggregation before the "
    "single exchange on (window, event_type)",
    "latest_event_per_user": "top-1-per-group via max(struct): partial-aggregatable, "
    "no window sort — shuffle carries one row per user per partition",
    "cheapest_order_per_customer_sql": "correlated scalar subquery rewritten by "
    "Catalyst into an aggregate + join",
    "daily_value_moving_avg": "RANGE-frame window over PRE-AGGREGATED daily rows — "
    "event-grain rows never enter window state",
    "contamination_check": "benchmark-contamination: the held-out shingle set is "
    "BROADCAST; the corpus streams through one equi-join + per-doc aggregation — "
    "never self-joined",
    "cluster_safe_splits": "leakage-safe splits: corpus LEFT-joins the near-dup "
    "cluster labels on doc_id with NO broadcast hint — the label set is one row per "
    "clustered document, a corpus-fraction-sized frame at web-corpus dup rates, so "
    "AQE picks the strategy (shuffle join at scale); split is a row-local md5 of "
    "the cluster key; the leak check joins only the bounded pair list",
    "lm_bigram_quality": "bigram-LM scoring: doc bigrams partially aggregated per "
    "(doc, bigram) BEFORE the two shuffled equi-joins against the reference count "
    "tables; no broadcast of the corpus-sized LM, no self-join",
    "event_transition_probs": "Markov transitions: one user-partitioned LEAD window "
    "(reuses the events bucketing) into a |types|\u00b2-sized aggregation",
    "rfm_quartiles": "RFM: quartile cutoffs via one 3-value percentile agg then "
    "ROW-LOCAL bucketing against broadcast cutoffs — no global NTILE window",
    "part_copurchase_pairs": "market-basket pairs: lineitem self-join co-partitioned "
    "on l_orderkey, fan-out bounded by per-order line count; count-join strategy "
    "left to AQE (broadcast at test scale, shuffle when the part dim outgrows it)",
    "knn_label_propagation": "kNN labeling: request-sized query components broadcast; "
    "labeled corpus streams one (query,candidate) hash agg; vote is k-rows-per-query",
    "dedup_threshold_curve": "threshold curve: pair graph computed ONCE at the curve "
    "floor, each pair fans to its cleared thresholds row-locally (array filter+explode)",
    "supplier_reliability_wilson": "Wilson ranking: one partial-aggregatable suppkey "
    "rollup over the orderkey fact join; Wilson math row-local on the small aggregate",
    "doc_ngram_novelty": "novelty: shingle->min(doc_id) agg + join back; no self-join, "
    "no corpus window",
    "embedding_drift_by_label": "drift: one (label,window,pos) integer-sum aggregation; "
    "cosine of summed vectors == cosine of centroids, no per-row division",
    "customer_migration_matrix": "tier migration: two per-period custkey rollups, tiny "
    "percentile cutoffs broadcast, row-local tiering, full-outer on the dim key",
    "session_gap_curve": "gap curve: ONE lag-window pass over user-ordered events; each "
    "gap is a row-local comparison fanned from the same delta column",
    "unordered_funnel_completion": "any-order funnel: per-(user,step) first-times "
    "aggregation, |steps|-row user frames, no event-grain window",
    "crosslingual_mining": "bitext mining: rides the bounded LSH cosine pair path; AQE broadcasts the "
    "small pair side against the corpus-sized dim, |langs|\u00b2 rollup — never all-pairs",
    "bpe_merge_candidates": "BPE trainer shape: ONE corpus pass builds the vocab, the "
    "char-pair explosion is per DISTINCT word weighted by count — vocab-scale after scan",
    "pack_sequences": "sequence packing: running-sum window partitioned by source "
    "shard — parallel across sources, no global ordering anywhere",
    "heavy_hitters_sketch": "Misra-Gries frequent items: per-partition counter "
    "sketches (mapInPandas, ≤k rows each) merged by a tiny counter-sum aggregation — "
    "the raw stream is never shuffled",
    "late_sole_supplier": "Q21-shape EXISTS/NOT-EXISTS flattened into one conditional "
    "aggregation over the fact-fact join — no correlated re-scans",
    "rolling_uniques_7d": "trailing-window uniques at DAY grain: distinct (day,user) "
    "pairs fan out via a broadcast day-spine range join — event rows never join",
    "cohort_ltv": "cohort LTV: user-grain first-seen agg, fact join on the native "
    "user key, then a cohort-partitioned window over WEEK-grain cells only",
    "ab_test_lift": "A/B readout: one user-grain aggregation touches data; variant "
    "rollup and the z-test run on two tiny single-row branches",
    "q2_min_cost_supplier": "Q2-shape correlated MIN: per-part minimum joined back "
    "via broadcast (never a per-row subquery), all dims broadcast, top-100 via "
    "TakeOrderedAndProject",
    "q10_returned_items": "Q10 top-20: returnflag + order-date predicates pushed to "
    "both fact scans, customer/nation broadcast, TakeOrderedAndProject merge",
    "q13_order_distribution": "Q13 count-of-counts: left join preserved through the "
    "custkey-grain aggregate, then a tiny regroup — zero-order customers survive",
    "q16_part_supplier_counts": "Q16 NOT-IN: map-side partial distinct on the pair "
    "projection, broadcast part filter, broadcast left-anti for the exclusion list",
    "q19_disjunctive_revenue": "Q19: three OR branches share ONE broadcast hash join "
    "with a residual disjunctive filter — no union of scans",
    "bm25_search": "BM25: term frequencies doc-local (array filter — no token "
    "explode), single-row corpus stats broadcast back, top-k via "
    "TakeOrderedAndProject; the only full-data movement is the scan",
    "dup_ngram_spans": "repeated-span mining: n-grams generated doc-locally, one "
    "hash aggregation with map-side combine, ≥2-docs filter before the tiny top-k",
    "doc_chunking": "context-window chunking: pure doc-local sequence/slice "
    "arithmetic — zero exchanges before the output sort",
    "quality_top_quartile": "per-source top-quartile: rank and count share one "
    "window partitioning on source; no global ordering anywhere",
    "events_pivot_daily": "PIVOT with explicit values: a partial-aggregated "
    "(day, event_type) rollup then the pivot aggregate — no distinct-values pre-job",
    "hourly_counts_gapfilled": "date-spine densification: spine generated from a "
    "single-row min/max aggregate, type dim broadcast, left join touches only the "
    "hour-grain aggregate",
    "segment_overlap_matrix": "audience overlap: per-user bounded type-set collected "
    "once, pair expansion row-local — no user-set self-join",
    "sliding_window_counts": "sliding windows: the 4-window expansion happens inside "
    "the window operator before one partial-aggregated shuffle",
    "sparse_tfidf_pairs": "sparse similarity join: df-band filter bounds every "
    "posting list before the term-keyed pair join — no corpus self-join; integer "
    "idf^2 weights aggregate with map-side combine",
    "attribution_last_touch": "last-touch attribution: touches and conversions "
    "interleave in ONE user-partitioned window (no self-join); the day rollup is "
    "grain-bounded",
    "quantile_rollup_sketch": "KLL rollup: day-grain sketch aggregate then a "
    "per-type merge of KB-sized sketches — raw values cross the wire once",
    "theta_segment_setops": "theta set ops: raw events scanned once into per-segment "
    "sketches; the pair fan-out joins only the KB-sized sketch table (broadcast)",
    "priority_sample": "weighted sampling: row-local hash priorities + "
    "TakeOrderedAndProject (per-partition top-k, driver merges k*partitions rows)",
    "training_shuffle": "epoch shuffle: one hash exchange on shard, per-shard local "
    "sort — no global ordering; rank and rollup share the shard partitioning",
    "rollup_reuse_monthly": "two-level algebraic rollup: month report re-aggregates "
    "the day-grain cells; the second aggregate's input is |types|x|days| rows",
    "session_entry_exit": "entry/exit matrix: sessionize window and per-session "
    "min_by/max_by share the user_id exchange; output is |types|^2 rows",
    "funnel_unordered": "any-order funnel: two user-keyed aggregates share one "
    "exchange; output bounded by the step-set size",
    "hybrid_search": "hybrid retrieval: BM25 scan + TakeOrderedAndProject feeds a "
    "candidate-only cosine rerank (semi-join prune before posexplode; 64-row query "
    "vector broadcast)",
    "ann_pq_topk": "product quantization: codebooks broadcast at every stage; the "
    "ADC scan joins one m-code row per corpus vector against the per-query distance "
    "table",
    "key_skew_report": "skew diagnostics: the top-10 window runs over the user-grain "
    "aggregate, never raw events",
    "funnel_daily_trend": "daily funnel: one conditional aggregation per (day, user), "
    "day-grain rollup reuses the exchange",
    "market_basket_part_types": "basket affinity: baskets collapse to distinct "
    "(order,type) once; ReuseExchange feeds the pair join, singles, and the "
    "broadcast single-row basket count from ONE lineitem⋈part scan — no driver "
    "barrier",
    "q11_important_stock": "Q11 HAVING-vs-scalar: the nation-filtered fact subtree "
    "feeds both the part-grain aggregate and the broadcast single-row total "
    "(ReuseExchange) — threshold test is exact integer-double math",
    "q18_large_volume_customers": "Q18 IN-grouped-HAVING: order-grain quantity "
    "aggregate broadcast back into orders — one fact shuffle, "
    "TakeOrderedAndProject top-100",
    "q21_suppliers_kept_waiting": "Q21 sole-late-shipper: EXISTS/NOT-EXISTS pair "
    "collapsed into one order-grain conditional aggregate — one fact-fact join, "
    "no correlated re-scans",
    "lexical_rarity": "unigram-LM quality proxy: token-grain count shuffle + "
    "count-join + doc-grain aggregate, all map-side combined; top-k via "
    "TakeOrderedAndProject; the score is one exact-integer division",
    "order_backlog_daily": "backlog series: ±1 deltas union into a day-grain "
    "aggregate; the running sum windows over calendar-bounded rows only",
    "revenue_pareto_top100": "Pareto: customer-grain decimal aggregate, top-100 "
    "TakeOrdered, THEN the cumulative window (bounded input), single-row total "
    "broadcast",
    "media_video_dedup": "frame-fingerprint dedup: executor-side decode+hash "
    "(mapInPandas), distinct (video,hash) projection, idf-floor df filter before "
    "the posting-list equi-join — bounded pair expansion, no video×video join",
    "ann_filtered_ivf_topk": "filtered IVF: learned cells probed per query "
    "(broadcast centroids), the predicate's qualifying id set SEMI-JOINS the probed "
    "members before any scoring work, exact rerank on survivors only — filter "
    "pushdown times cell pruning, never full-scan-under-predicate",
    "dup_span_extents": "maximal duplicated spans: positional grams doc-local, "
    "occurrence-capped pair join, islands window partitioned per (pair, diagonal) "
    "— the only corpus-sized shuffle is the gram stream",
    "span_dedup_savings": "span savings: interval-union windows partition per doc "
    "over the already-capped span list — input is orders of magnitude below the "
    "corpus",
    "attribution_time_decay": "time-decay attribution: user-equi join with a "
    "time-range residual, integer 2^(6-k) weights (no libm pow), per-conversion "
    "weight total as a conversion-partitioned window over the pairs",
    "inter_event_time_quantiles": "inter-event cadence: one (user, type)-keyed "
    "window for the lag gaps, exact percentile per type",
    "source_vocab_overlap": "vocabulary overlap: token-grain aggregate is the only "
    "corpus-sized shuffle; the pair join touches |sources|*k top-k rows with "
    "broadcast set sizes",
    "dedup_precision_audit": "dedup QA: the LSH sweep and the exact truth join "
    "only at the tiny pair level (anti-joins + four single-row aggregates "
    "cross-joined) — the expensive all-pairs truth side is the audit's "
    "deliberate sample-scope cost",
    "funnel_step_latency": "funnel hop latency: three conditional min aggregates "
    "share the user-keyed shuffle shape; the percentile aggregate sees two "
    "step groups of user-grain rows",
    "media_resize_stats": "real NN resize: executor-side decode+sample in one "
    "mapInPandas, five scalars per asset on the wire — payload bytes never "
    "shuffle",
    "ann_filtered_ivf_indexed": "filtered ANN over the PERSISTED index: centroids "
    "read from the artifact (no Lloyd at query time), cell IN-list prunes the "
    "partitioned corpus scan, predicate semi-join lands before any scoring",
    "ann_recall_audit": "ANN QA: brute-force truth (one-pass Arrow kernel) and the "
    "IVF chain meet only at the (q_id, neighbor) pair level — a left-semi plus two "
    "single-row aggregates",
    "inter_event_cadence_sketch": "cadence quartiles, sketch path: the same lag-gap "
    "window, then approx_percentile — mergeable map-side state, no per-group value "
    "buffering",
    "session_bounce_rate": "bounce rate: sessionize's user-keyed window, one "
    "session-grain aggregate, a per-day rollup of integral counts",
    "event_cooccurrence_pmi": "PMI: user-day incidence distinct() is the only "
    "corpus-sized shuffle; the pair self-join runs on incidence rows, marginals "
    "broadcast back",
    "user_activity_entropy": "activity entropy: two partial-aggregated shuffles "
    "((user,type) then user), micro-nat integer quantization makes the final mean "
    "an exact integer sum",
    "doc_length_histogram": "length histogram: doc-local token count + binary-string "
    "bucket, one tiny (source, bucket) aggregate — no explode, no window",
    "nation_trade_balance": "trade balance: TWO independent fact aggregations "
    "(supplier-side broadcast dim, customer-side q7-style orderkey+custkey shuffles), "
    "full-outer-joined at the 25-row nation grain — never one mega-join",
    "order_gap_stats": "order cadence: one custkey-partitioned LAG window with a "
    "unique-key tiebreak, custkey-shuffled customer join, 5-segment aggregate",
    "running_revenue_share": "running share: revenue collapses to (region, month) "
    "BEFORE the windows — cumulative and total windows run over a regions x months "
    "aggregate bounded by the date span, both region-partitioned",
    "attribution_position_based": "U-shaped attribution: the linear model's bounded "
    "pair build plus ONE per-conversion rank window (bounded by touches-per-user-"
    "week); credit is row-local arithmetic",
    "event_burstiness": "burstiness: exact integer (user,type,day) counts partially "
    "aggregated map-side; per-user Fano from integer moment sums; one per-type "
    "reduction",
    "session_depth_distribution": "session depth: the sessionizer's one user-keyed "
    "shuffle, (user,session) count, ~10-bucket aggregate; share via single-row "
    "broadcast total",
    "label_centroid_similarity": "centroid confusability: corpus collapses to a "
    "(label, pos) integer-sum aggregate (labels x dims rows at ANY corpus size); "
    "the pair join runs on that aggregate only",
    "embedding_label_outliers": "label outliers: (label, pos) centroid sums joined "
    "back onto the component stream (AQE broadcasts the tiny side); arg-min via "
    "equality join against the per-label minimum, no ordered aggregate",
    "zipf_slope_by_source": "Zipf fit: (source, token) counts map-side combined; the "
    "only sort is the per-source rank window at VOCABULARY grain (never corpus "
    "grain); regression is closed-form from six sums",
    "dedup_savings_by_source": "dedup savings: one md5-grain aggregate + one "
    "equi-join back (the exact_dedup shape) with a per-source rollup — no window, "
    "no self-join",
    "doc_prefix_duplication": "prefix boilerplate: row-local first-k-token hash, "
    "prefix-grain aggregate, join back — exact-dedup shape at prefix grain",
    "ivf_cell_balance": "IVF health: the shared Lloyd fit (broadcast centroids, "
    "integer costs), then vectors collapse to cells to ONE report row — the "
    "re-fit trigger the index maintenance planner watches",
    "order_priority_drift": "priority-mix drift: ONE (month, priority) count "
    "aggregate; chi-square is row-local over <=5 cells per month against the "
    "broadcast overall mix — no windows",
    "supplier_hhi": "supply concentration: (nation, supplier) revenue rollup off "
    "a broadcast dim join, then a 25-row aggregate; HHI from sum-of-squares, no "
    "per-supplier share materialization",
    "dedup_cluster_size_histogram": "cluster-size shape: rides the bounded "
    "dedup_clusters chain; histogram is two tiny aggregations on the component "
    "output (cluster grain then size grain)",
    "customer_order_streaks": "gaps-and-islands without the window: ONE "
    "custkey-grain collect_set(month) aggregate (map-side partial, set bounded "
    "by the date span in months), longest run folds row-locally over the sorted "
    "array — no sort, no islands regroup; the oracle keeps the classic window "
    "formulation so two algorithms must agree",
    "supplier_late_streaks": "consecutive-late runs: one orderkey equi-join "
    "attaches the order date, then BOTH row_number windows AND every downstream "
    "aggregate share the single suppkey exchange (subset-partitioning satisfies "
    "the (suppkey,late,grp) clusterings); late and non-late runs group together "
    "so totals fall out of the same frame — the fact join is scanned ONCE, no "
    "totals re-join; top-25 via TakeOrderedAndProject on a unique composite key",
    "discount_elasticity_by_priority": "regression as aggregation: the "
    "closed-form slope needs only six sums per priority — one partial-aggregated "
    "shuffle after the orderkey join, DECIMAL(38,6) cross terms exact at sf1, "
    "division happens on 5 rows",
    "benford_price_audit": "fraud screen: leading digit via exact "
    "integer-to-string (no libm log10), one 9-row hash aggregate, grand total "
    "joins back as a single-row broadcast",
    "order_survival_curve": "Kaplan-Meier with right-censoring: ONE "
    "custkey-partitioned lead window builds the spans, then risk-set and "
    "survival windows run over the WEEK-grain bucket aggregate — <= span/7 "
    "rows at any corpus size (numeric bound in test_plan_hygiene)",
    "part_price_index_quarterly": "unit-value price index: (part,quarter) "
    "grain partial-aggregated off the scan, base-quarter slice joins back "
    "part-dim-sized (AQE picks the strategy), index from four exact decimal "
    "sums per quarter — no per-part division, no windows",
    "embedding_norm_audit": "norm health: one posexplode + id-grain integer "
    "aggregate (the shared quantized-norm kernel), label join at id grain, "
    "|labels|-row rollup — nothing quadratic, exact integer norms",
    "orders_seasonality_index": "seasonal factors: one 12-row hash aggregate "
    "over the scan; grand totals are a second aggregate OF THE 12 ROWS "
    "broadcast back as one row — the fact table is scanned once",
    "parts_price_size_skyline": "skyline without the quadratic dominance "
    "self-join: per-price-level aggregate, bucket-PARTITIONED running-max "
    "windows, and a triangular join over the tiny per-band table (TPC-H "
    "prices are near-unique, so a global window over levels would be a "
    "single-partition sort of the catalog)",
    "churn_hazard_by_tenure": "discrete hazard: one user-keyed aggregate to "
    "(first, last) week, then the at-risk reverse-cumsum as a triangular "
    "join over the TENURE-grain aggregate — no unpartitioned window, no "
    "second pass over users",
    "customer_gini_by_segment": "Gini: rank window runs per SEGMENT over "
    "per-customer aggregate rows (3 orders of magnitude below the fact "
    "table); rank·spend accumulates in DECIMAL(38,6) so the plan carries "
    "exact arithmetic to the final two-term formula",
    "ivf_nprobe_recall_curve": "one shared Lloyd fit + assignment feeds "
    "every probe budget; per-budget tails reuse the cached quantized "
    "components, truth is the single request-sized brute-force pass",
    "lsh_band_efficiency": "per-band audit rides the production "
    "signature/banding kernels: band pairs from the bucket groupBy's "
    "in-bucket expansion (star fallback intact), verified set semi-joined "
    "per band — no extra corpus scan beyond the pair verify",
    "session_duration_by_entry": "ONE user-partitioned window pass builds "
    "session ids (lag + running sum share the exchange); entry via "
    "struct-MIN in the same session aggregate — no second window",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-dump")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit (explain 'formatted')",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`. What to look for in each:",
        "pushed filters and pruned `ReadSchema` on scans, `BroadcastHashJoin`/"
        "`BroadcastNestedLoopJoin` for dimension joins, `Exchange` count (each is a "
        "shuffle), and partial (`partial_…`) aggregates before exchanges.",
        "",
        "## Size assumptions stated honestly",
        "",
        "- **Identity stitching** (`users.stitch`, `users.identity_components`):"
        " the anonymous mapping and the identified-id set GROW WITH THE USER BASE"
        " (one row per merged visitor), so neither carries a forced `broadcast()`"
        " hint — size-based planning/AQE broadcasts while they are small and"
        " shuffle-joins past the threshold (round-11; the r8"
        " `cluster_safe_splits` precedent).  The ≤50k-edge driver union-find in"
        " `identity_components` is bounded BY CONSTRUCTION (the collect is"
        " gated on the counted edge total); larger graphs take the distributed"
        " min-label propagation, whose lineage is truncated every 5 rounds"
        " (`localCheckpoint`) because the per-round plan otherwise DOUBLES.",
        "- **Merge key targeting** (`txnlog.merge`): the distinct-key probe is"
        " bounded at 100k keys by contract; past it the coarse [lo, hi] range"
        " applies (correct, rewrites more).",
        "- **Exact decile cut** (`customer_decile_revenue_share`): below"
        " 5M customers the segment-partitioned `ntile` window applies (5 enum"
        " partitions over per-customer AGGREGATE rows — a bounded single-task"
        " sort); at or above it the plan switches to the rank-offset two-pass"
        " (`_twopass_deciles`): range-repartition on the sort tuple, a"
        " partitions×segments count collect (metadata-scale), rank = offset +"
        " partition-local row_number — bit-identical ntile arithmetic with"
        " every sort bounded by one range partition (round-12; proven against"
        " the same oracle by `customer_decile_share_twopass`).",
        "",
    ]
    for name, note in SHOW.items():
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"**Why this plan is right:** {note}", "", "```"]
        # keep the tree + scan details; drop the verbose per-node I/O lists
        text = buf.getvalue()
        tree, _, details = text.partition("\n\n\n")
        keep = [tree.strip()]
        for para in details.split("\n\n"):
            if any(k in para for k in ("Scan parquet", "PushedFilters", "BroadcastExchange")):
                keep.append(para.strip())
        out += ["\n\n".join(keep), "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
