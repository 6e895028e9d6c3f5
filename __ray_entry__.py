"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript-extraction pipeline on
sf0.001; ``queries()`` exposes one callable per implemented operator
family (SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives
the DuckDB twin for every SQL-expressible query (same column names,
floats rounded identically on both sides).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere on these paths.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: transcripts -> ExtractTurns actor pool -> (conv_id,
    turn_idx) ordering shuffle; returns the ordered Dataset."""
    from unfurl_ray.engine.pipeline import extract_turns, order_by_turn
    from unfurl_ray.sources.transcripts import build_transcripts

    ds = build_transcripts("/root/testdata/sf0.001")
    extracted = extract_turns(ds, concurrency=4)
    return order_by_turn(extracted)


def queries() -> dict[str, Callable[[str], Any]]:
    from unfurl_ray import pipelines as p

    return {
        # relational core (SURVEY.md §2.2/§2.5-2.7 mappings)
        "q1_pricing_summary": p.q1_pricing_summary,
        "q6_filter_revenue": p.q6_filter_revenue,
        "q_top_orders": p.q_top_orders,
        "q_segment_revenue": p.q_segment_revenue,
        "q_nation_balance": p.q_nation_balance,
        "q_order_lineitem_join": p.q_order_lineitem_join,
        "q_star_join": p.q_star_join,
        "q_semi_join": p.q_semi_join,
        "q_anti_join": p.q_anti_join,
        "q_bloom_semi_join": p.q_bloom_semi_join,
        "q_hll_users": p.q_hll_users,
        "q_heavy_hitters": p.q_heavy_hitters,
        "q_quantile_sketch": p.q_quantile_sketch,
        "q_group_quantile_sketch": p.q_group_quantile_sketch,
        "q_distinct_event_types": p.q_distinct_event_types,
        "q_events_window": p.q_events_window,
        "q_sessionize": p.q_sessionize,
        "q_funnel": p.q_funnel,
        "q_zscore": p.q_zscore,
        "q_transitions": p.q_transitions,
        "q_drift_kl": p.q_drift_kl,
        "q_trending": p.q_trending,
        "q_asof_join": p.q_asof_join,
        "q_asof_join_part": p.q_asof_join_part,
        "q_hopping_window": p.q_hopping_window,
        "q_topk_per_group": p.q_topk_per_group,
        "q_group_median": p.q_group_median,
        "q_quantile_cont": p.q_quantile_cont,
        "q_retention": p.q_retention,
        "q_rollup_revenue": p.q_rollup_revenue,
        "q_skew_join": p.q_skew_join,
        "q_bucketed_join": p.q_bucketed_join,
        "q_stream_dedup": p.q_stream_dedup,
        "q_range_join": p.q_range_join,
        "q_window_join": p.q_window_join,
        "q_mad": p.q_mad,
        "q_new_users": p.q_new_users,
        "q_bm25": p.q_bm25,
        "q_conv_assemble": p.q_conv_assemble,
        "q_sft_pairs": p.q_sft_pairs,
        "q_upsert_merge": p.q_upsert_merge,
        "q_json_extract": p.q_json_extract,
        "q_entropy": p.q_entropy,
        "q_user_entropy": p.q_user_entropy,
        "q_source_sim": p.q_source_sim,
        "q_skew_report": p.q_skew_report,
        "q_mv_update": p.q_mv_update,
        "q_table_checksum": p.q_table_checksum,
        "q_regression": p.q_regression,
        "q_zorder_scan": p.q_zorder_scan,
        "q_group_hll_users": p.q_group_hll_users,
        "q_distinct_users": p.q_distinct_users,
        "q_pivot_events": p.q_pivot_events,
        "q_event_deltas": p.q_event_deltas,
        "q_rolling_range": p.q_rolling_range,
        "q_running_total": p.q_running_total,
        "q_cube_revenue": p.q_cube_revenue,
        "q_bpe_merges": p.q_bpe_merges,
        "q_group_split": p.q_group_split,
        "q_compact_layout": p.q_compact_layout,
        "q_align_union": p.q_align_union,
        "q_decayed_sum": p.q_decayed_sum,
        "q_merge_runs": p.q_merge_runs,
        "q_ewma": p.q_ewma,
        "q_ewma_bot": p.q_ewma_bot,
        "q_sliding_mau_hll": p.q_sliding_mau_hll,
        "q_interval_coverage": p.q_interval_coverage,
        "q_full_outer_join": p.q_full_outer_join,
        "q_triangles": p.q_triangles,
        "q_bpe_encode": p.q_bpe_encode,
        "q_psi_drift": p.q_psi_drift,
        "q_normalize_text": p.q_normalize_text,
        "q_profile": p.q_profile,
        "q_corr_matrix": p.q_corr_matrix,
        "q_editdist_join": p.q_editdist_join,
        "q_row_number": p.q_row_number,
        "q_sorted_neighborhood": p.q_sorted_neighborhood,
        "q_unpivot": p.q_unpivot,
        "q_pagerank": p.q_pagerank,
        "q_sliding_mau": p.q_sliding_mau,
        "q_time_travel": p.q_time_travel,
        "q_winsorize": p.q_winsorize,
        "q_jsonl_roundtrip": p.q_jsonl_roundtrip,
        "q_cooccurrence": p.q_cooccurrence,
        "q_validate": p.q_validate,
        "q_pseudonymize": p.q_pseudonymize,
        "q_stream_neardup": p.q_stream_neardup,
        "q_chi_square": p.q_chi_square,
        "q_daily_p95": p.q_daily_p95,
        "q_hll_overlap": p.q_hll_overlap,
        "q_quality_model": p.q_quality_model,
        "q_als_factors": p.q_als_factors,
        "q_image_phash": p.q_image_phash,
        "q_scd2": p.q_scd2,
        "q_resample_locf": p.q_resample_locf,
        "q_ntile_curriculum": p.q_ntile_curriculum,
        "q_vocab_spectrum": p.q_vocab_spectrum,
        # documents / text analysis
        "q_doc_stats": p.q_doc_stats,
        "q_hash_sample": p.q_hash_sample,
        "q_token_count": p.q_token_count,
        "q_exact_dedup": p.q_exact_dedup,
        "q_dataset_diff": p.q_dataset_diff,
        "q_substring_dedup": p.q_substring_dedup,
        "q_chunk_docs": p.q_chunk_docs,
        "q_fingerprint": p.q_fingerprint,
        "q_quality": p.q_quality,
        "q_percent_rank": p.q_percent_rank,
        "q_langid": p.q_langid,
        "q_repetition": p.q_repetition,
        "q_decontaminate": p.q_decontaminate,
        "q_pack_shards": p.q_pack_shards,
        "q_pack_write": p.q_pack_write,
        "q_export_jsonl": p.q_export_jsonl,
        "q_pii_scrub": p.q_pii_scrub,
        "q_k_anon": p.q_k_anon,
        "q_bigram_counts": p.q_bigram_counts,
        "q_stratified_sample": p.q_stratified_sample,
        "q_weighted_sample": p.q_weighted_sample,
        "q_mixture_sample": p.q_mixture_sample,
        "q_quarantine": p.q_quarantine,
        "q_tfidf_top_terms": p.q_tfidf_top_terms,
        "q_inverted_index": p.q_inverted_index,
        "q_lm_score": p.q_lm_score,
        # dedup families
        "q_minhash_dedup": p.q_minhash_dedup,
        "q_simhash": p.q_simhash,
        "q_setsim_join": p.q_setsim_join,
        "q_dedup_clusters": p.q_dedup_clusters,
        "q_bfs_hops": p.q_bfs_hops,
        "q_curation": p.q_curation,
        "q_training_prep": p.q_training_prep,
        # embeddings / similarity
        "q_cosine_to_query": p.q_cosine_to_query,
        "q_quantize_embeddings": p.q_quantize_embeddings,
        "q_pca": p.q_pca,
        "q_embed_neardup": p.q_embed_neardup,
        "q_embed_neardup_ann": p.q_embed_neardup_ann,
        "q_semdedup": p.q_semdedup,
        "q_knn_topk": p.q_knn_topk,
        "q_knn_ivf": p.q_knn_ivf,
        "q_knn_pq": p.q_knn_pq,
        "q_kmeans_sample": p.q_kmeans_sample,
        # multimodal plumbing
        "q_image_meta": p.q_image_meta,
        # extraction (the reference's core capability)
        "q_extract_meta": p.q_extract_meta,
        "q_main_text": p.q_main_text,
        "q_transcript_types": p.q_transcript_types,
        "q_conv_stats": p.q_conv_stats,
        # session-11 additions
        "q_event_runs": p.q_event_runs,
        "q_auc": p.q_auc,
        "q_mutual_info": p.q_mutual_info,
        "q_prefix_dedup": p.q_prefix_dedup,
        "q_tree_split": p.q_tree_split,
        "q_kcore": p.q_kcore,
        "q_group_mode": p.q_group_mode,
        "q_welch_ttest": p.q_welch_ttest,
        "q_weighted_median": p.q_weighted_median,
        "q_calibration": p.q_calibration,
        "q_changepoint": p.q_changepoint,
        "q_ks_drift": p.q_ks_drift,
        "q_spearman": p.q_spearman,
        "q_gini": p.q_gini,
        "q_isotonic": p.q_isotonic,
        "q_cm_counts": p.q_cm_counts,
        "q_dup_cap": p.q_dup_cap,
        "q_ecdf_norm": p.q_ecdf_norm,
        "q_group_wmedian": p.q_group_wmedian,
        "q_fdr": p.q_fdr,
        "q_pareto": p.q_pareto,
        "q_group_auc": p.q_group_auc,
        "q_join_size_est": p.q_join_size_est,
        "q_cond_entropy": p.q_cond_entropy,
        "q_group_gini": p.q_group_gini,
        "q_group_isotonic": p.q_group_isotonic,
        "q_twap": p.q_twap,
        "q_assortativity": p.q_assortativity,
        "q_common_neighbors": p.q_common_neighbors,
        "q_naive_bayes": p.q_naive_bayes,
        "q_kaplan_meier": p.q_kaplan_meier,
        "q_acf": p.q_acf,
        "q_throttle": p.q_throttle,
        "q_ols_multi": p.q_ols_multi,
        "q_rank_fusion": p.q_rank_fusion,
        "q_collocations": p.q_collocations,
        "q_trigram_paths": p.q_trigram_paths,
        "q_centroid_sep": p.q_centroid_sep,
        "q_feature_hash": p.q_feature_hash,
        "q_benford": p.q_benford,
        "q_ccf": p.q_ccf,
        "q_nb_confusion": p.q_nb_confusion,
        "q_late_events": p.q_late_events,
        "q_keyness": p.q_keyness,
        "q_cume_dist": p.q_cume_dist,
        "q_impute": p.q_impute,
        "q_woe_iv": p.q_woe_iv,
        "q_resample_linear": p.q_resample_linear,
        "q_communities": p.q_communities,
        "q_trimmed_mean": p.q_trimmed_mean,
        "q_attribution": p.q_attribution,
        "q_first_last": p.q_first_last,
        "q_rolling_median": p.q_rolling_median,
        "q_entity_resolution": p.q_entity_resolution,
        "q_histogram": p.q_histogram,
        "q_compress_ratio": p.q_compress_ratio,
        "q_negatives": p.q_negatives,
        "q_dpo_pairs": p.q_dpo_pairs,
        "q_kappa": p.q_kappa,
        "q_seasonal": p.q_seasonal,
        "q_fanout_spectrum": p.q_fanout_spectrum,
        "q_csv_roundtrip": p.q_csv_roundtrip,
        "q_dp_counts": p.q_dp_counts,
        "q_share_of_parent": p.q_share_of_parent,
        "q_schema_evolve": p.q_schema_evolve,
        "q_markov_stationary": p.q_markov_stationary,
        "q_lineage": p.q_lineage,
        "q_weighted_stats": p.q_weighted_stats,
        "q_churn_labels": p.q_churn_labels,
        "q_budget_select": p.q_budget_select,
        "q_mixture_weights": p.q_mixture_weights,
        "q_anova": p.q_anova,
        "q_kruskal": p.q_kruskal,
        "q_rank_overlap": p.q_rank_overlap,
        "q_gap_stats": p.q_gap_stats,
        "q_novelty_curve": p.q_novelty_curve,
        "q3_shipping_priority": p.q3_shipping_priority,
        "q5_region_revenue": p.q5_region_revenue,
        "q10_returned_items": p.q10_returned_items,
        "q_cohort_retention": p.q_cohort_retention,
        "q_rfm": p.q_rfm,
        "q_types_to_date": p.q_types_to_date,
        "q_systematic_sample": p.q_systematic_sample,
        "q_dense_rank": p.q_dense_rank,
        "q_mannwhitney": p.q_mannwhitney,
        "q_zipf_slope": p.q_zipf_slope,
        "q_hhi": p.q_hhi,
        "q_ndcg": p.q_ndcg,
        "q_embed_dim_stats": p.q_embed_dim_stats,
        "q_iqr_outliers": p.q_iqr_outliers,
        "q_lorenz": p.q_lorenz,
        "q_clustering_coeff": p.q_clustering_coeff,
        "q_dup_rate_by_source": p.q_dup_rate_by_source,
        "q_cross_source_overlap": p.q_cross_source_overlap,
        "q_filter_funnel": p.q_filter_funnel,
        "q_source_diversity": p.q_source_diversity,
        "q_wow_change": p.q_wow_change,
        "q_gap_islands": p.q_gap_islands,
        "q_peak_hour": p.q_peak_hour,
        "q_runtime_filter": p.q_runtime_filter,
        "q_knn_classify": p.q_knn_classify,
        "q_set_ops": p.q_set_ops,
        "q_user_journey": p.q_user_journey,
        "q_partition_prune": p.q_partition_prune,
        "q_sssp": p.q_sssp,
        "q13_customer_distribution": p.q13_customer_distribution,
        "q14_promo_revenue": p.q14_promo_revenue,
        "q15_top_supplier": p.q15_top_supplier,
        "q17_small_quantity_revenue": p.q17_small_quantity_revenue,
        "q18_large_orders": p.q18_large_orders,
        "q19_banded_revenue": p.q19_banded_revenue,
        "q22_idle_customers": p.q22_idle_customers,
        "q_interval_join": p.q_interval_join,
        "q7_volume_shipping": p.q7_volume_shipping,
        "q12_late_priority": p.q12_late_priority,
        "q16_supplier_diversity": p.q16_supplier_diversity,
        "q2_min_cost_supplier": p.q2_min_cost_supplier,
        "q4_priority_check": p.q4_priority_check,
        "q8_market_share": p.q8_market_share,
        "q9_product_profit": p.q9_product_profit,
        "q11_important_parts": p.q11_important_parts,
        "q20_recent_suppliers": p.q20_recent_suppliers,
        "q21_waiting_suppliers": p.q21_waiting_suppliers,
        # rows-only: iterative fixpoints, numpy-parity pytests instead
        "q_hits": p.q_hits,
        "q_ppr": p.q_ppr,
        "q_gmm": p.q_gmm,
        "q_conversion_lag": p.q_conversion_lag,
        "q_basket_lift": p.q_basket_lift,
        "q_tenure_value": p.q_tenure_value,
        "q_linear_attribution": p.q_linear_attribution,
        "q_return_rate": p.q_return_rate,
        "q_stickiness": p.q_stickiness,
        "q_fill_lag": p.q_fill_lag,
        "q_dup_char_share": p.q_dup_char_share,
        "q_abc_analysis": p.q_abc_analysis,
        "q_drawdown": p.q_drawdown,
    }


def oracle_sql() -> dict[str, str]:
    from unfurl_ray.ops.textstats import STOPWORDS
    from unfurl_ray.sources.transcripts import TURNS_PER_CONV as _TPC

    stops = ", ".join(
        f"'{w}'" for w in sorted(set().union(*STOPWORDS.values()))
    )
    # q_quality parity notes: ASCII [ \t\n\f\r] classes match the
    # Python kernel's explicit classes (RE2 \s and Python unicode \s
    # disagree); floor(x*10^k + 0.5)/10^k is the same half-up float64
    # rounding the kernel runs (DuckDB round() is half-away, numpy
    # .round() half-even — neither matches the other).
    q_quality_sql = f"""
        WITH w AS (
            SELECT doc_id,
                   length(coalesce(text, '')) AS n_chars,
                   len(list_filter(regexp_split_to_array(
                       coalesce(text, ''), '[ \t\n\f\r]+'),
                       x -> x <> '')) AS n_words,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[^A-Za-z0-9_ \t\n\f\r]')) AS n_punct,
                   len(list_filter(regexp_split_to_array(
                       coalesce(text, ''), '[ \t\n\f\r]+'),
                       x -> lower(x) IN ({stops}))) AS n_stop
            FROM documents
        ), r AS (
            SELECT doc_id, n_words,
                   floor(CAST(n_chars AS DOUBLE) / greatest(n_words, 1)
                         * 1000 + 0.5) / 1000 AS mean_word_len,
                   floor(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)
                         * 10000 + 0.5) / 10000 AS punct_ratio,
                   floor(CAST(n_stop AS DOUBLE) / greatest(n_words, 1)
                         * 10000 + 0.5) / 10000 AS stopword_ratio
            FROM w
        )
        SELECT doc_id, n_words, mean_word_len, punct_ratio,
               stopword_ratio,
               floor(((least(n_words, 200) / 200.0) * 0.4
                      + (1 - least(punct_ratio, 1.0)) * 0.2
                      + least(stopword_ratio, 0.5) * 2 * 0.4)
                     * 10000 + 0.5) / 10000 AS quality
        FROM r
    """
    # q_langid twin: the LangId heuristic IS SQL-expressible — per-lang
    # stopword hits over the first 200 whitespace tokens, argmax with
    # first-lang-wins ties (the cascading CASE mirrors the kernel's
    # strict-> update over dict order), zh override, und when 0 hits.
    _hit_cols = []
    _case_arms = []
    _langs = list(STOPWORDS)
    for _lang in _langs:
        _words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[_lang]))
        _hit_cols.append(
            f"len(list_filter(ws, x -> x IN ({_words}))) AS h_{_lang}"
        )
    for _i, _lang in enumerate(_langs):
        _conds = " AND ".join(
            f"h_{_lang} >= h_{o}" for o in _langs[_i + 1:]
        )
        _case_arms.append(
            f"WHEN {_conds or 'TRUE'} THEN '{_lang}'"
        )
    _max_hits = "greatest(" + ", ".join(f"h_{l}" for l in _langs) + ")"
    q_langid_sql = f"""
        WITH w AS (
            SELECT doc_id, text,
                   list_slice(list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                       x -> x <> ''), 1, 200) AS ws
            FROM documents
        ), hits AS (
            SELECT doc_id, text, {", ".join(_hit_cols)}
            FROM w
        )
        SELECT doc_id,
               CASE WHEN coalesce(text, '') = '' THEN 'und'
                    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                    WHEN {_max_hits} <= 0 THEN 'und'
                    {" ".join(_case_arms)}
               END AS lang_pred
        FROM hits
    """
    # q_transcript_types twin: the generator's template routing is
    # kind = splitmix64(doc_id) % 10 (transcripts._mix), and the
    # extraction engine types each template family deterministically
    # (kind 8 = PDF -> document, kind 9 = plain/empty -> link, all
    # HTML kinds -> website).  splitmix64 in SQL needs 64-bit wrapping
    # multiplication, which overflows INT128 — split each constant
    # into 32-bit halves: (a*b) mod 2^64 =
    # (alo*blo + ((alo*bhi + ahi*blo) mod 2^32) << 32) mod 2^64.
    def _mulmod64(xcol: str, c: int) -> str:
        lo, hi = c % (1 << 32), c >> 32
        return (
            f"((({xcol}) % 4294967296) * {lo}"
            f" + ((((({xcol}) % 4294967296) * {hi}"
            f" + (({xcol}) // 4294967296) * {lo}) % 4294967296)"
            f" * 4294967296)) % 18446744073709551616"
        )

    _m1 = _mulmod64("xor(x, x >> 30)", 0xBF58476D1CE4E5B9)
    _m2 = _mulmod64("xor(x, x >> 27)", 0x94D049BB133111EB)
    q_transcript_types_sql = f"""
        WITH x0 AS (
            SELECT doc_id, CAST(doc_id AS HUGEINT) AS x FROM documents
        ), x1 AS (SELECT doc_id, {_m1} AS x FROM x0),
           x2 AS (SELECT doc_id, {_m2} AS x FROM x1),
           x3 AS (SELECT doc_id, xor(x, x >> 31) % 10 AS kind FROM x2)
        SELECT CASE WHEN kind = 8 THEN 'document'
                    WHEN kind = 9 THEN 'link'
                    ELSE 'website' END AS unfurl_type,
               count(*) AS n
        FROM x3 GROUP BY 1
    """
    # q_curation twin: the full curation chain as ONE statement —
    # quality filter >= 0.3, exact dedup (min doc_id per md5),
    # chunk-fingerprint edges among the deduped survivors, recursive
    # min-label components, keep only cluster representatives.
    q_curation_sql = f"""
        WITH RECURSIVE qual AS ({q_quality_sql}),
        keep1 AS (
            SELECT d.doc_id, d.text, q.quality
            FROM documents d JOIN qual q USING (doc_id)
            WHERE q.quality >= 0.3
        ),
        k2 AS (
            SELECT min(doc_id) AS doc_id FROM keep1 GROUP BY md5(text)
        ),
        keep2 AS (
            SELECT keep1.* FROM keep1 JOIN k2 USING (doc_id)
        ),
        feats AS (
            SELECT doc_id,
                   unnest([md5(substr(text, 64*g + 1, 64))
                           for g in range(0, CAST(ceil(length(text)
                                                       / 64.0)
                                                AS BIGINT))]) AS f
            FROM keep2 WHERE text IS NOT NULL AND length(text) > 0
        ),
        e AS (
            SELECT a.doc_id AS u, b.doc_id AS v
            FROM feats a JOIN feats b USING (f)
            WHERE a.doc_id <> b.doc_id GROUP BY 1, 2
        ),
        reach AS (
            SELECT doc_id AS node, doc_id AS label FROM keep2
            UNION
            SELECT e.v, r.label FROM reach r JOIN e ON e.u = r.node
            WHERE r.label < e.v
        ),
        comp AS (
            SELECT node AS doc_id, min(label) AS component
            FROM reach GROUP BY node
        )
        SELECT k.doc_id, k.quality
        FROM keep2 k JOIN comp USING (doc_id)
        WHERE comp.component = k.doc_id
        ORDER BY k.doc_id
    """
    from unfurl_ray.ops.textstats import EMAIL_RE, PHONE_RE

    # q_repetition parity: same ASCII-whitespace tokenization +
    # half-up float64 rounding as q_quality; bigram list-comprehension
    # mirrors q_bigram_counts.  Single-word docs have no bigram rows
    # (top_bc NULL), so the (nw - 1) = 0 divisor is never reached.
    q_repetition_sql = """
        WITH toks AS (
            SELECT doc_id, list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                       x -> x <> '') AS ws
            FROM documents
        ), words AS (
            SELECT doc_id, unnest(ws) AS w FROM toks
        ), wc AS (
            SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2
        ), wagg AS (
            SELECT doc_id, sum(c) AS nw, count(*) AS nd,
                   max(c) AS top_c
            FROM wc GROUP BY 1
        ), bg AS (
            SELECT doc_id, unnest([ws[g] || ' ' || ws[g+1]
                                   for g in range(1, len(ws))]) AS b
            FROM toks WHERE len(ws) >= 2
        ), bc AS (
            SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2
        ), bagg AS (
            SELECT doc_id, max(c) AS top_bc FROM bc GROUP BY 1
        )
        SELECT t.doc_id,
               CAST(coalesce(w.nw, 0) AS BIGINT) AS n_words,
               floor(coalesce(1.0 - w.nd / CAST(w.nw AS DOUBLE), 0)
                     * 10000 + 0.5) / 10000 AS dup_word_frac,
               floor(coalesce(w.top_c / CAST(w.nw AS DOUBLE), 0)
                     * 10000 + 0.5) / 10000 AS top_word_frac,
               floor(coalesce(b.top_bc / CAST(w.nw - 1 AS DOUBLE), 0)
                     * 10000 + 0.5) / 10000 AS top_bigram_frac
        FROM toks t
        LEFT JOIN wagg w USING (doc_id)
        LEFT JOIN bagg b USING (doc_id)
    """
    # q_pii_scrub: the synthetic contact line and both RE2 patterns
    # are shared verbatim with the kernel (module constants), so the
    # counts and the scrubbed md5 are byte-exact.
    q_pii_scrub_sql = f"""
        WITH aug AS (
            SELECT doc_id,
                   coalesce(text, '') || ' contact: user'
                   || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
                   || printf('%04d', doc_id % 10000) AS t
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{EMAIL_RE}'))
                    AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t, '{PHONE_RE}'))
                    AS BIGINT) AS n_phones,
               md5(regexp_replace(
                       regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
        FROM aug
    """
    q_training_prep_sql = f"""
        WITH w AS (
            SELECT doc_id, text,
                   length(coalesce(text, '')) AS n_chars,
                   len(list_filter(regexp_split_to_array(
                       coalesce(text, ''), '[ \t\n\f\r]+'),
                       x -> x <> '')) AS n_words,
                   len(regexp_extract_all(coalesce(text, ''),
                       '[^A-Za-z0-9_ \t\n\f\r]')) AS n_punct,
                   len(list_filter(regexp_split_to_array(
                       coalesce(text, ''), '[ \t\n\f\r]+'),
                       x -> lower(x) IN ({stops}))) AS n_stop
            FROM documents
        ), r AS (
            SELECT doc_id, text, n_words,
                   floor(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)
                         * 10000 + 0.5) / 10000 AS punct_ratio,
                   floor(CAST(n_stop AS DOUBLE) / greatest(n_words, 1)
                         * 10000 + 0.5) / 10000 AS stopword_ratio
            FROM w
        ), base AS (
            SELECT doc_id, text FROM r
            WHERE doc_id % 97 <> 0
              AND floor(((least(n_words, 200) / 200.0) * 0.4
                         + (1 - least(punct_ratio, 1.0)) * 0.2
                         + least(stopword_ratio, 0.5) * 2 * 0.4)
                        * 10000 + 0.5) / 10000 >= 0.3
        ), toks AS (
            SELECT doc_id, list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                       x -> x <> '') AS ws
            FROM base
        ), btoks AS (
            SELECT doc_id, list_filter(regexp_split_to_array(
                       lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                       x -> x <> '') AS ws
            FROM documents WHERE doc_id % 97 = 0
        ), tg AS (
            SELECT doc_id,
                   unnest([ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2]
                           for g in range(1, len(ws) - 1)]) AS t
            FROM toks WHERE len(ws) >= 3
        ), bench AS (
            SELECT DISTINCT
                   unnest([ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2]
                           for g in range(1, len(ws) - 1)]) AS t
            FROM btoks WHERE len(ws) >= 3
        ), contaminated AS (
            SELECT DISTINCT tg.doc_id FROM tg JOIN bench USING (t)
        ), clean AS (
            SELECT doc_id, text FROM base
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), dedup AS (
            SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)
        ), t AS (
            SELECT c.doc_id,
                   CAST(CASE WHEN trim(c.text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(c.text),
                                                       '\\s+'))
                        END AS BIGINT) AS n_tokens,
                   CAST(((CAST(c.doc_id AS HUGEINT) * 2654435761)
                         % 18446744073709551616) % 8 AS BIGINT)
                       AS bucket
            FROM clean c JOIN dedup USING (doc_id)
        ), cum AS (
            SELECT doc_id, bucket, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS start
            FROM t
        )
        SELECT doc_id, bucket, n_tokens,
               start // 2000 AS shard_idx,
               start - (start // 2000) * 2000 AS shard_offset
        FROM cum ORDER BY doc_id
    """
    return {
        "q_training_prep": q_training_prep_sql,
        "q_quality": q_quality_sql,
        # percent_rank = (rank-1)/(n-1): strictly-smaller count over
        # the same 4-decimal quality expression
        "q_percent_rank": f"""
            WITH qual AS ({q_quality_sql}),
            d AS (
                SELECT q.doc_id, s.source, q.quality
                FROM qual q JOIN documents s USING (doc_id))
            SELECT doc_id, source, quality,
                   round(percent_rank() OVER (
                       PARTITION BY source ORDER BY quality), 6) AS pr
            FROM d ORDER BY doc_id
        """,
        # cume_dist = (rows <= value)/n over the same quality expr
        "q_cume_dist": f"""
            WITH qual AS ({q_quality_sql}),
            d AS (
                SELECT q.doc_id, s.source, q.quality
                FROM qual q JOIN documents s USING (doc_id))
            SELECT doc_id, source, quality,
                   round(cume_dist() OVER (
                       PARTITION BY source ORDER BY quality), 6) AS cd
            FROM d ORDER BY doc_id
        """,
        # DPO preference pairs over the shared quality expression
        "q_dpo_pairs": f"""
            WITH qual AS ({q_quality_sql}),
            t AS (
                SELECT doc_id, doc_id // 8 AS conv, quality
                FROM qual),
            r AS (
                SELECT conv, doc_id, quality,
                       row_number() OVER (PARTITION BY conv
                           ORDER BY quality DESC, doc_id) AS rc,
                       row_number() OVER (PARTITION BY conv
                           ORDER BY quality ASC, doc_id) AS rr,
                       row_number() OVER (PARTITION BY conv
                           ORDER BY doc_id) AS rp
                FROM t)
            SELECT conv AS conv_id,
                   max(CASE WHEN rp = 1 THEN doc_id END)
                       AS prompt_id,
                   max(CASE WHEN rc = 1 THEN doc_id END)
                       AS chosen_id,
                   max(CASE WHEN rc = 1 THEN quality END)
                       AS chosen_q,
                   max(CASE WHEN rr = 1 THEN doc_id END)
                       AS rejected_id,
                   max(CASE WHEN rr = 1 THEN quality END)
                       AS rejected_q
            FROM r GROUP BY conv ORDER BY conv
        """,
        "q_langid": q_langid_sql,
        # Cohen's kappa between langid and the stored label; the
        # margin join drops labels absent on one side (0 terms)
        "q_kappa": f"""
            WITH pred AS ({q_langid_sql}),
            j AS (
                SELECT d.lang AS actual, p.lang_pred AS pred
                FROM documents d JOIN pred p USING (doc_id)),
            c AS (
                SELECT actual, pred, count(*) AS n
                FROM j GROUP BY 1, 2),
            tot AS (SELECT sum(n) AS n FROM c),
            diag AS (
                SELECT coalesce(sum(n), 0) AS agree
                FROM c WHERE actual = pred),
            marg AS (
                SELECT sum(r.rn * co.cn) AS s
                FROM (SELECT actual AS k, sum(n) AS rn
                      FROM c GROUP BY 1) r
                JOIN (SELECT pred AS k, sum(n) AS cn
                      FROM c GROUP BY 1) co ON co.k = r.k)
            SELECT CAST(tot.n AS BIGINT) AS n,
                   CAST(diag.agree AS BIGINT) AS agree,
                   round(agree * 1.0 / tot.n, 6) AS po,
                   round(marg.s * 1.0 / (tot.n * tot.n), 6) AS pe,
                   round((agree * 1.0 / tot.n
                          - marg.s * 1.0 / (tot.n * tot.n))
                         / (1 - marg.s * 1.0 / (tot.n * tot.n)), 6)
                       AS kappa
            FROM tot, diag, marg
        """,
        "q_repetition": q_repetition_sql,
        # budget selection: cumulative-window semantics (a doc is
        # taken while the cum INCLUDING it fits)
        "q_budget_select": f"""
            WITH qual AS ({q_quality_sql}),
            w AS (
                SELECT doc_id, quality, n_words,
                       sum(n_words) OVER (
                           ORDER BY quality DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
                FROM qual)
            SELECT doc_id, quality,
                   CAST(n_words AS BIGINT) AS n_words
            FROM w WHERE cum <= 20000 ORDER BY doc_id
        """,
        # char-weighted quality + exact-int effective sample size
        "q_weighted_stats": f"""
            WITH qual AS ({q_quality_sql}),
            j AS (
                SELECT d.source,
                       length(coalesce(d.text, '')) AS w,
                       q.quality
                FROM documents d JOIN qual q USING (doc_id)),
            a AS (
                SELECT source, count(*) AS n, sum(w) AS sw,
                       sum(w * quality) AS swq,
                       sum(w * w) AS sw2
                FROM j GROUP BY 1)
            SELECT source, CAST(n AS BIGINT) AS n,
                   round(swq / sw, 6) AS weighted_quality,
                   round(sw * sw * 1.0 / sw2, 6) AS ess
            FROM a ORDER BY source
        """,
        # trigram join against the % 97 'benchmark' slice; same
        # tokenizer + list-comprehension n-grams as q_repetition
        "q_decontaminate": """
            WITH toks AS (
                SELECT doc_id, list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents
            ), tg AS (
                SELECT doc_id,
                       unnest([ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2]
                               for g in range(1, len(ws) - 1)]) AS t
                FROM toks WHERE len(ws) >= 3
            ), bench AS (
                SELECT DISTINCT t FROM tg WHERE doc_id % 97 = 0
            ), hits AS (
                SELECT doc_id, count(DISTINCT t) AS n_hits
                FROM tg JOIN bench USING (t)
                WHERE doc_id % 97 <> 0
                GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 97 <> 0
            ORDER BY d.doc_id
        """,
        "q_pii_scrub": q_pii_scrub_sql,
        "q_transcript_types": q_transcript_types_sql,
        "q_curation": q_curation_sql,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   count(*) AS count_order,
                   round(sum(l_quantity) / count(*), 2) AS avg_qty,
                   round(sum(l_extendedprice) / count(*), 2) AS avg_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "q6_filter_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q_top_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
        """,
        "q_segment_revenue": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q_nation_balance": """
            SELECT r_name, n_name,
                   round(sum(s_acctbal), 2) AS total_bal,
                   count(*) AS n_suppliers
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "q_order_lineitem_join": """
            SELECT o_orderstatus, count(*) AS n_items,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus
        """,
        "q_semi_join": """
            SELECT o_orderstatus, count(*) AS n_orders
            FROM orders
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
            GROUP BY o_orderstatus
        """,
        "q_anti_join": """
            SELECT count(*) AS n_customers FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q_bloom_semi_join": """
            SELECT count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING')
        """,
        "q_distinct_event_types": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "q_events_window": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "q_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id,
                   CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "q_hopping_window": """
            WITH assigned AS (
                SELECT event_type, date_trunc('hour', ts) AS window_start,
                       value FROM events
                UNION ALL
                SELECT event_type,
                       date_trunc('hour', ts) - INTERVAL 1 HOUR, value
                FROM events
            )
            SELECT event_type, window_start, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM assigned GROUP BY event_type, window_start
        """,
        "q_topk_per_group": """
            SELECT o_orderstatus, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice
            FROM (
                SELECT o_orderstatus, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rn
                FROM orders)
            WHERE rn <= 3
        """,
        "q_group_median": """
            SELECT o_orderstatus,
                   round(quantile_disc(o_totalprice, 0.5), 2)
                       AS quantile_value,
                   count(*) AS n
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "q_quantile_cont": """
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.25), 6) AS q_025,
                   round(quantile_cont(o_totalprice, 0.5), 6) AS q_05,
                   round(quantile_cont(o_totalprice, 0.9), 6) AS q_09,
                   count(*) AS n
            FROM orders GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q_asof_join": """
            SELECT e.event_id, o.o_orderkey
            FROM (SELECT event_id, user_id % 100 AS join_key, ts
                  FROM events) e
            ASOF LEFT JOIN (
                SELECT join_key, o_orderdate,
                       max(o_orderkey) AS o_orderkey
                FROM (SELECT o_orderkey, o_custkey % 100 AS join_key,
                             o_orderdate FROM orders)
                GROUP BY join_key, o_orderdate) o
              ON e.join_key = o.join_key AND e.ts >= o.o_orderdate
        """,
        # the range-partitioned path must produce the identical join
        "q_asof_join_part": """
            SELECT e.event_id, o.o_orderkey
            FROM (SELECT event_id, user_id % 100 AS join_key, ts
                  FROM events) e
            ASOF LEFT JOIN (
                SELECT join_key, o_orderdate,
                       max(o_orderkey) AS o_orderkey
                FROM (SELECT o_orderkey, o_custkey % 100 AS join_key,
                             o_orderdate FROM orders)
                GROUP BY join_key, o_orderdate) o
              ON e.join_key = o.join_key AND e.ts >= o.o_orderdate
        """,
        "q_doc_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "q_hash_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE ((CAST(doc_id AS HUGEINT) * 2654435761)
                   % 18446744073709551616) % 100 < 10
            ORDER BY doc_id
        """,
        # same token count as q_token_count, same HUGEINT hash bucket
        # as q_hash_sample; start offsets via a window sum, integer //
        "q_pack_shards": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+'))
                            END AS BIGINT) AS n_tokens,
                       CAST(((CAST(doc_id AS HUGEINT) * 2654435761)
                             % 18446744073709551616) % 8 AS BIGINT)
                           AS bucket
                FROM documents
            ), c AS (
                SELECT doc_id, bucket, n_tokens,
                       CAST(coalesce(sum(n_tokens) OVER (
                           PARTITION BY bucket ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT)
                           AS start
                FROM t
            )
            SELECT doc_id, bucket, n_tokens,
                   start // 2000 AS shard_idx,
                   start - (start // 2000) * 2000 AS shard_offset
            FROM c ORDER BY doc_id
        """,
        # the pack_shards assignment aggregated to shard manifests
        "q_pack_write": r"""
            WITH t AS (
                SELECT doc_id,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+'))
                            END AS BIGINT) AS n_tokens,
                       CAST(((CAST(doc_id AS HUGEINT) * 2654435761)
                             % 18446744073709551616) % 8 AS BIGINT)
                           AS bucket
                FROM documents
            ), c AS (
                SELECT bucket, n_tokens,
                       CAST(coalesce(sum(n_tokens) OVER (
                           PARTITION BY bucket ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT)
                           AS start
                FROM t
            )
            SELECT bucket, start // 2000 AS shard_idx,
                   count(*) AS n_rows,
                   CAST(sum(n_tokens) AS BIGINT) AS weight
            FROM c GROUP BY bucket, start // 2000
            ORDER BY bucket, shard_idx
        """,
        "q_token_count": r"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                        END AS BIGINT) AS n_tokens
            FROM documents
        """,
        "q_exact_dedup": """
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS doc_id,
                   count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        # duplicated 5-gram spans: md5 gram identity on both sides,
        # same lowercase-whitespace tokenizer as q_vocab_spectrum
        "q_substring_dedup": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS t
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       substr(md5(array_to_string(t[i:i+4], ' ')),
                              1, 16) AS h
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(
                         1, len(t) - 4)) AS i) s
            ), dup AS (
                SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
            FROM grams WHERE h IN (SELECT h FROM dup)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # sliding-window chunking: same explicit ASCII whitespace
        # tokenizer as q_substring_dedup; window 64, stride 48; the
        # tail chunk is short, never dropped; 1-based list_slice
        # [start+1 : start+64] == tokens[start : start+64]
        "q_chunk_docs": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           coalesce(text, ''), '[ \t\n\f\r]+'),
                           x -> x <> '') AS t
                FROM documents
            ), spans AS (
                SELECT doc_id, t, unnest(generate_series(
                           0, len(t) - 1, 48)) AS start
                FROM toks WHERE len(t) > 0
            )
            SELECT doc_id,
                   CAST(start // 48 AS BIGINT) AS chunk_id,
                   CAST(least(64, len(t) - start) AS BIGINT) AS n_tokens,
                   array_to_string(t[start + 1 : start + 64], ' ')
                       AS chunk_text
            FROM spans ORDER BY doc_id, chunk_id
        """,
        "q_fingerprint": r"""
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                       AS fingerprint_md5
            FROM documents
        """,
        "q_cosine_to_query": """
            SELECT vec_id,
                   round(CAST(list_cosine_similarity(
                       CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[])
                        FROM embeddings WHERE vec_id = 0)
                   ) AS DOUBLE), 4) AS cosine
            FROM embeddings
        """,
        # zipped unnests pair each dim index with its value; all
        # arithmetic CAST to DOUBLE to match the kernel's float64 path
        "q_quantize_embeddings": """
            WITH vals AS (
                SELECT vec_id,
                       unnest(range(1, len(embedding) + 1)) AS d,
                       CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings
            ), stats AS (
                SELECT d, min(x) AS mn,
                       CASE WHEN max(x) = min(x) THEN 1.0
                            ELSE max(x) - min(x) END AS span
                FROM vals GROUP BY d
            ), q AS (
                SELECT vec_id,
                       CAST(least(greatest(
                           floor((x - mn) / span * 255 + 0.5),
                           0), 255) AS BIGINT) - 128 AS c
                FROM vals JOIN stats USING (d)
            )
            SELECT vec_id,
                   CAST(sum(c) AS BIGINT) AS q_sum,
                   CAST(sum(abs(c)) AS BIGINT) AS q_l1
            FROM q GROUP BY vec_id ORDER BY vec_id
        """,
        "q_embed_neardup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(CAST(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 4)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        # whitespace-collapse + trim + NFC; coalesce matches the
        # kernel's fillna('')
        "q_normalize_text": """
            SELECT doc_id,
                   nfc_normalize(trim(regexp_replace(
                       coalesce(text, ''),
                       '[ \t\n\r\f\x0b]+', ' ', 'g'))) AS text_norm,
                   length(nfc_normalize(trim(regexp_replace(
                       coalesce(text, ''),
                       '[ \t\n\r\f\x0b]+', ' ', 'g'))))
                       AS n_chars_norm
            FROM documents ORDER BY doc_id
        """,
        # PSI drift over equi-depth decile bins of the baseline
        # half-month; smoothing (c+1)/(n+10) and floor-half-up
        # rounding mirror the kernel operation-for-operation
        "q_psi_drift": """
            WITH e AS (
                SELECT CAST(floor(value * 100) AS BIGINT) AS c,
                       CASE WHEN ts < TIMESTAMP '2024-01-16'
                            THEN 0 ELSE 1 END AS side
                FROM events
            ), br AS (
                SELECT quantile_disc(c, [0.1, 0.2, 0.3, 0.4, 0.5,
                                         0.6, 0.7, 0.8, 0.9]) AS bs
                FROM e WHERE side = 0
            ), binned AS (
                SELECT len(list_filter(bs, x -> c > x)) AS bin, side
                FROM e CROSS JOIN br
            ), cnt AS (
                SELECT bin,
                       sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
                           AS ca,
                       sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                           AS cb
                FROM binned GROUP BY bin
            ), tot AS (
                SELECT sum(ca) AS na, sum(cb) AS nb FROM cnt
            )
            SELECT bin,
                   floor(((ca + 1.0) / (na + 10.0)) * 1e6 + 0.5)
                       / 1e6 AS p_a,
                   floor(((cb + 1.0) / (nb + 10.0)) * 1e6 + 0.5)
                       / 1e6 AS p_b,
                   floor((((ca + 1.0) / (na + 10.0))
                          - ((cb + 1.0) / (nb + 10.0)))
                         * ln(((ca + 1.0) / (na + 10.0))
                              / ((cb + 1.0) / (nb + 10.0)))
                         * 1e6 + 0.5) / 1e6 AS psi_term
            FROM cnt CROSS JOIN tot ORDER BY bin
        """,
        # triangle count on the cosine>=0.3 graph: id-ordered 3-way
        # self-join counts each triangle once (x<y<z); the Ray side's
        # degree orientation is count-invariant
        "q_triangles": """
            WITH p AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.3
            )
            SELECT (SELECT count(*) FROM p) AS n_edges,
                   CAST(count(*) AS BIGINT) AS n_triangles
            FROM p e1
            JOIN p e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN p e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        # SemDeDup: cosine pair graph -> min-label components (the
        # r.label < e.v prune only drops labels dominated by v's own
        # seed, so min() per node is the component representative);
        # kept = the representative itself
        "q_semdedup": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS pu, b.vec_id AS pv
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.45
            ), e AS (
                SELECT pu AS u, pv AS v FROM pairs
                UNION
                SELECT pv AS u, pu AS v FROM pairs
            ), reach AS (
                SELECT vec_id AS node, vec_id AS label
                FROM embeddings
                UNION
                SELECT e.v, r.label
                FROM reach r JOIN e ON e.u = r.node
                WHERE r.label < e.v
            )
            SELECT node AS vec_id, min(label) AS component,
                   (min(label) = node) AS kept
            FROM reach GROUP BY node ORDER BY vec_id
        """,
        "q_image_meta": """
            SELECT doc_id, 'image/png' AS format,
                   doc_id % 640 + 16 AS width,
                   doc_id % 480 + 9 AS height
            FROM documents ORDER BY doc_id
        """,
        "q_extract_meta": """
            SELECT doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS headline,
                   CASE WHEN rtrim(substr(text, 1, 100)) = '' THEN NULL
                        ELSE rtrim(substr(text, 1, 100)) END AS description,
                   'en' AS language,
                   'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                       AS canonical_url
            FROM documents
        """,
        "q_main_text": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN ''
                        WHEN len(regexp_split_to_array(trim(text), '\s+'))
                             >= 8
                        THEN regexp_replace(trim(text), '\s+', ' ', 'g')
                        ELSE '' END AS main_text
            FROM documents
        """,
        "q_knn_topk": """
            WITH q AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 4
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       round(CAST(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qe)
                           AS DOUBLE), 6) AS cosine
                FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id, cosine FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, vec_id) AS rn
                FROM scored)
            WHERE rn <= 10
        """,
        # conv divisor derived from the kernel's own constant so the
        # oracle can never drift from transcripts.TURNS_PER_CONV
        "q_conv_stats": f"""
            WITH t AS (
                SELECT doc_id,
                       (CAST(doc_id AS HUGEINT) * 2654435761)
                           % 18446744073709551616 AS h
                FROM documents
            )
            SELECT CASE WHEN h % 97 = 0
                        THEN 'conv-hot-' || CAST(h % 3 AS VARCHAR)
                        ELSE 'conv-' || printf('%08d',
                                               doc_id // {_TPC})
                   END AS conv_id,
                   count(*) AS n_turns
            FROM t GROUP BY 1
        """,
        # duplicate clustering: chunk fingerprints -> edges -> min-label
        # connected components, twinned by a recursive CTE (label L is
        # recorded at node v iff L reaches v; the r.label < e.v prune
        # only drops labels dominated by v's own seed, so min() per
        # node is exactly the component representative).
        "q_dedup_clusters": """
            WITH RECURSIVE feats AS (
                SELECT doc_id,
                       unnest([md5(substr(text, 64*g + 1, 64))
                               for g in range(0, CAST(ceil(length(text)
                                                          / 64.0)
                                                   AS BIGINT))]) AS f
                FROM documents
                WHERE text IS NOT NULL AND length(text) > 0
            ), e AS (
                SELECT a.doc_id AS u, b.doc_id AS v
                FROM feats a JOIN feats b USING (f)
                WHERE a.doc_id <> b.doc_id
                GROUP BY 1, 2
            ), reach AS (
                SELECT doc_id AS node, doc_id AS label FROM documents
                UNION
                SELECT e.v, r.label
                FROM reach r JOIN e ON e.u = r.node
                WHERE r.label < e.v
            )
            SELECT node AS doc_id, min(label) AS component
            FROM reach GROUP BY node ORDER BY doc_id
        """,
        # BFS twin: recursive UNION (dedup) keeps each level bounded
        # by nodes x hops; min(hops) is the BFS distance
        "q_bfs_hops": """
            WITH RECURSIVE feats AS (
                SELECT doc_id,
                       unnest([md5(substr(text, 64*g + 1, 64))
                               for g in range(0, CAST(ceil(length(text)
                                                          / 64.0)
                                                   AS BIGINT))]) AS f
                FROM documents
                WHERE text IS NOT NULL AND length(text) > 0
            ), e AS (
                SELECT a.doc_id AS u, b.doc_id AS v
                FROM feats a JOIN feats b USING (f)
                WHERE a.doc_id <> b.doc_id
                GROUP BY 1, 2
            ), walk(node, hops) AS (
                SELECT DISTINCT u, 0 FROM e WHERE u < 100
                UNION
                SELECT e.v, w.hops + 1
                FROM walk w JOIN e ON e.u = w.node
                WHERE w.hops < 3
            )
            SELECT node, min(hops) AS hops FROM walk
            GROUP BY node ORDER BY node
        """,
        "q_bigram_counts": """
            WITH toks AS (
                SELECT list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents
            ), bg AS (
                SELECT unnest([ws[g] || ' ' || ws[g+1]
                               for g in range(1, len(ws))]) AS bigram
                FROM toks WHERE len(ws) >= 2
            )
            SELECT bigram, count(*) AS n FROM bg
            GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
        """,
        # exact set-similarity join twin: distinct 3-word shingles
        # over the whitespace token contract; integer threshold test
        # (i*10 >= 4*union) and half-up 6dp jaccard, matching
        # ops.dedup.set_similarity_join exactly
        "q_setsim_join": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                           '[ \t\n\f\r]+'), x -> x <> '') AS ws
                FROM documents
            ), ix AS (
                SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
                FROM w WHERE len(ws) >= 3
            ), g AS (
                SELECT DISTINCT doc_id,
                       ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
                FROM ix
            ), sz AS (
                SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
                FROM g a JOIN g b
                  ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT da AS doc_a, db AS doc_b,
                   floor(i * 1e6 / (sa.n + sb.n - i) + 0.5) / 1e6
                       AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = da
            JOIN sz sb ON sb.doc_id = db
            WHERE i * 10 >= 4 * (sa.n + sb.n - i)
            ORDER BY doc_a, doc_b
        """,
        # simhash twin: per-word hash = first 8 bytes of md5 (msb
        # first), +-1 vote per bit position per word occurrence,
        # bit set iff the vote sum is strictly positive, packed
        # msb-first then shifted into signed int64 range (u - 2^63).
        "q_simhash": """
            WITH words AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(
                           lower(coalesce(text, '')), '[a-z0-9_]+')) AS w
                FROM documents
            ), bits AS (
                SELECT doc_id, jj.j AS j,
                       sum(CASE WHEN ((strpos('0123456789abcdef',
                                       substr(md5(w), (jj.j // 4) + 1, 1))
                                      - 1) >> (3 - (jj.j % 4))) & 1 = 1
                           THEN 1 ELSE -1 END) AS s
                FROM words
                CROSS JOIN (SELECT unnest(range(0, 64)) AS j) jj
                GROUP BY 1, 2
            ), packed AS (
                SELECT doc_id,
                       sum(CASE WHEN s > 0
                                THEN CAST(1 AS HUGEINT) << (63 - j)
                                ELSE CAST(0 AS HUGEINT) END) AS u
                FROM bits GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(p.u, 0) - 9223372036854775808 AS BIGINT)
                       AS simhash
            FROM documents d LEFT JOIN packed p USING (doc_id)
            ORDER BY d.doc_id
        """,
        # heavy-hitters twin: valid because the corpus vocabulary fits
        # the sketch capacity, so the summary never truncates and
        # count_min == count_max == the exact count.
        "q_heavy_hitters": """
            WITH w AS (
                SELECT unnest(list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '')) AS value
                FROM documents
            )
            SELECT value, count(*) AS count_min, count(*) AS count_max
            FROM w GROUP BY value
            ORDER BY count_min DESC, value LIMIT 20
        """,
        "q_retention": """
            WITH uh AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 3600000000 AS hour
                FROM events
            )
            SELECT a.hour, count(*) AS active,
                   count(b.user_id) AS retained
            FROM uh a LEFT JOIN uh b
              ON b.user_id = a.user_id AND b.hour = a.hour + 1
            GROUP BY a.hour ORDER BY a.hour
        """,
        # overlapping tier bands: one event can match two tiers
        "q_range_join": """
            WITH tiers(tier, lo, hi) AS (VALUES
                ('low', 0.0, 10.0), ('mid', 10.0, 100.0),
                ('high', 100.0, 1e12), ('promo', 50.0, 150.0))
            SELECT tier, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events JOIN tiers
              ON value >= lo AND value < hi
            GROUP BY tier ORDER BY tier
        """,
        "q_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q_pivot_events": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS n_click,
                   count(*) FILTER (event_type = 'error')    AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup')   AS n_signup,
                   count(*) FILTER (event_type = 'view')     AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        # cross-run dedup admission counts: day 2 admits only hashes
        # unseen in day 1 (even doc_ids = day 1, odd = day 2)
        "q_stream_dedup": """
            WITH h AS (
                SELECT doc_id % 2 AS parity, md5(text) AS h
                FROM documents
            ), d1 AS (SELECT h FROM h WHERE parity = 0),
               d2 AS (SELECT h FROM h WHERE parity = 1)
            SELECT 1 AS day,
                   (SELECT count(*) FROM d1) AS n_in,
                   (SELECT count(DISTINCT h) FROM d1) AS n_new
            UNION ALL
            SELECT 2,
                   (SELECT count(*) FROM d2),
                   (SELECT count(DISTINCT h) FROM d2
                    WHERE h NOT IN (SELECT h FROM d1))
            ORDER BY day
        """,
        # same join as q_bucketed_join but exercised via the hybrid
        # hot-broadcast/cold-shuffle path
        "q_skew_join": """
            SELECT o_orderstatus, count(*) AS n_items,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "q_bucketed_join": """
            SELECT o_orderstatus, count(*) AS n_items,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        # collapsed rollup levels labeled 'ALL' on both sides; the
        # double sum rounds at 2dp like q1
        "q_rollup_revenue": """
            SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
            ORDER BY 1, 2
        """,
        # exact window functions: int64 delta + copied-double max need
        # no rounding to hash-match
        "q_event_deltas": """
            SELECT event_id, user_id,
                   coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1)
                       AS delta_us,
                   max(value) OVER (
                       w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS roll_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id
        """,
        # skew-safe RANGE frame: integer cents sum is order-
        # independent, so the hash matches bit-for-bit
        "q_rolling_range": """
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS cnt_w,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w
                        AS BIGINT) AS sum_cents_w
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 300 SECOND PRECEDING
                          AND CURRENT ROW)
            ORDER BY event_id
        """,
        # windowed quantiles: quantile_disc inverse-CDF rank per day
        "q_daily_p95": """
            WITH t AS (
                SELECT epoch_us(ts) // 86400000000 AS day,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT day, CAST(count(*) AS BIGINT) AS n,
                   quantile_disc(cents, 0.5) AS p50_cents,
                   quantile_disc(cents, 0.95) AS p95_cents
            FROM t GROUP BY day ORDER BY day
        """,
        # complete-grid chi-square: zero-observed cells contribute
        # their expected counts; isodow = pandas dayofweek + 1
        "q_chi_square": """
            WITH c AS (
                SELECT event_type, isodow(ts) AS dow,
                       CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY 1, 2
            ),
            r AS (SELECT event_type, sum(n) AS rn FROM c GROUP BY 1),
            col AS (SELECT dow, sum(n) AS cn FROM c GROUP BY 1),
            t AS (SELECT sum(n) AS tot FROM c),
            g AS (
                SELECT r.event_type, col.dow, r.rn * col.cn / t.tot
                           AS e
                FROM r CROSS JOIN col CROSS JOIN t
            )
            SELECT round(sum(pow(coalesce(c.n, 0) - g.e, 2) / g.e), 6)
                       AS chi2,
                   CAST((SELECT (count(*) - 1) FROM r)
                        * (SELECT (count(*) - 1) FROM col)
                        AS BIGINT) AS dof,
                   CAST((SELECT tot FROM t) AS BIGINT) AS n
            FROM g LEFT JOIN c USING (event_type, dow)
        """,
        # same sha256(salt|id) prefix on both sides
        "q_pseudonymize": """
            SELECT substr(sha256('unfurl-demo-salt|' ||
                                 CAST(user_id AS VARCHAR)), 1, 16)
                       AS token,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1
            ORDER BY n_events DESC, token LIMIT 200
        """,
        # one UNION ALL branch per expectation rule
        "q_validate": """
            SELECT 'custkey_not_null' AS rule,
                   CAST(count(*) - count(o_custkey) AS BIGINT)
                       AS violations FROM orders
            UNION ALL
            SELECT 'custkey_ref',
                   CAST(count(*) AS BIGINT) FROM orders o
            WHERE o.o_custkey NOT IN
                  (SELECT c_custkey FROM customer)
            UNION ALL
            SELECT 'orderkey_unique',
                   CAST(count(*) - count(DISTINCT o_orderkey)
                        AS BIGINT) FROM orders
            UNION ALL
            SELECT 'status_enum',
                   CAST(sum(CASE WHEN o_orderstatus NOT IN
                                      ('O', 'F', 'P')
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'totalprice_range',
                   CAST(sum(CASE WHEN o_totalprice < 0
                                   OR o_totalprice > 1000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            ORDER BY rule
        """,
        # SCD2: lead(ver) over ALL changes, upserts kept after the
        # window; same synthesized change stream as q_upsert_merge
        "q_scd2": """
            WITH ch AS (
                SELECT doc_id,
                       'UPDATED ' || text AS text,
                       'upsert' AS op, 1 AS ver
                FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id, '', 'delete', 2
                FROM documents WHERE doc_id % 17 = 0
                UNION ALL
                SELECT doc_id + 10000000, 'INSERTED ' || text,
                       'upsert', 3
                FROM documents WHERE doc_id % 23 = 0
            ),
            w AS (
                SELECT doc_id, text, op,
                       CAST(ver AS BIGINT) AS valid_from,
                       CAST(lead(ver) OVER (
                           PARTITION BY doc_id ORDER BY ver
                       ) AS BIGINT) AS valid_to
                FROM ch
            )
            SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
                   valid_from, valid_to
            FROM w WHERE op = 'upsert'
            ORDER BY doc_id, valid_from
        """,
        # unordered type pairs per user, after per-user distinct
        "q_cooccurrence": """
            WITH d AS (
                SELECT DISTINCT user_id, event_type FROM events
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM d a
            JOIN d b ON a.user_id = b.user_id
                    AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # JSONL export -> tolerant re-ingest preserves every row
        "q_jsonl_roundtrip": """
            SELECT source, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS chars
            FROM documents
            GROUP BY source ORDER BY source
        """,
        # exact integer-cents winsorization: quantile_disc picks the
        # element at floor(q*(n-1)), same as the histogram rank pick
        "q_winsorize": """
            WITH t AS (
                SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events
            ),
            b AS (
                SELECT event_type,
                       CAST(count(*) AS BIGINT) AS n,
                       quantile_disc(cents, 0.05) AS p05_cents,
                       quantile_disc(cents, 0.95) AS p95_cents
                FROM t GROUP BY 1
            )
            SELECT b.event_type, b.n, b.p05_cents, b.p95_cents,
                   round(sum(least(greatest(t.cents, b.p05_cents),
                                   b.p95_cents))
                         / CAST(b.n AS DOUBLE) / 100.0, 4)
                       AS wins_mean
            FROM t JOIN b USING (event_type)
            GROUP BY 1, 2, 3, 4
            ORDER BY 1
        """,
        # v1 = first 15 days, v2 = v1 + the rest (append semantics)
        "q_time_travel": """
            SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM events
            WHERE epoch_us(ts) // 86400000000 < 19738
            UNION ALL
            SELECT 2, CAST(count(*) AS BIGINT),
                   CAST(sum(CAST(floor(value * 100) AS BIGINT))
                        AS BIGINT)
            FROM events
            ORDER BY version
        """,
        # rolling 7-day COUNT(DISTINCT) via the day-grid join twin;
        # inner join = only window days with >=1 contributing event
        "q_sliding_mau": """
            WITH e AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS d
                FROM events
            ),
            b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
            g AS (
                SELECT unnest(generate_series(lo, hi)) AS wd FROM b
            )
            SELECT wd, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
            FROM g JOIN e ON e.d BETWEEN g.wd - 6 AND g.wd
            GROUP BY wd ORDER BY wd
        """,
        # ANALYZE profile: one UNION ALL branch per column, built from
        # the same column list the pipeline profiles
        "q_profile": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS col, count(*) AS n,
                   count(*) - count({c}) AS n_null,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(min({c}) AS VARCHAR) AS min_s,
                   CAST(max({c}) AS VARCHAR) AS max_s,
                   round(CAST(sum(len(CAST({c} AS VARCHAR)))
                              AS DOUBLE) / count({c}), 4) AS avg_len
            FROM documents
            """
            for c in ["doc_id", "lang", "source", "n_chars"]
        ) + " ORDER BY col",
        "q_unpivot": """
            WITH pvt AS (
                SELECT user_id,
                       count(*) FILTER (event_type = 'click')
                           AS click,
                       count(*) FILTER (event_type = 'error')
                           AS error,
                       count(*) FILTER (event_type = 'purchase')
                           AS purchase,
                       count(*) FILTER (event_type = 'signup')
                           AS signup,
                       count(*) FILTER (event_type = 'view')
                           AS view
                FROM events GROUP BY user_id
            )
            SELECT user_id, event_type, n
            FROM pvt UNPIVOT INCLUDE NULLS
                 (n FOR event_type IN
                  (click, error, purchase, signup, view))
            ORDER BY user_id, event_type
        """,
        "q_row_number": """
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS rn
            FROM documents ORDER BY rn
        """,
        # pairs keyed LEAST/GREATEST because rank order sorts by key
        # first, not doc_id
        "q_sorted_neighborhood": """
            WITH d AS (
                SELECT doc_id,
                       substr(trim(regexp_replace(
                           lower(coalesce(text, '')),
                           '[ \t\n\f\r]+', ' ', 'g')), 1, 24) AS s
                FROM documents
            ), r AS (
                SELECT doc_id, s,
                       row_number() OVER (ORDER BY s, doc_id) AS rn
                FROM d
            )
            SELECT least(a.doc_id, b.doc_id) AS doc_a,
                   greatest(a.doc_id, b.doc_id) AS doc_b,
                   CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
            FROM r a JOIN r b
              ON b.rn > a.rn AND b.rn <= a.rn + 5
             AND levenshtein(a.s, b.s) <= 4
            ORDER BY doc_a, doc_b
        """,
        # FastSS blocking is complete for k=1, so the brute
        # length-banded levenshtein join is the exact twin
        "q_editdist_join": """
            WITH d AS (
                SELECT doc_id,
                       substr(trim(regexp_replace(
                           lower(coalesce(text, '')),
                           '[ \t\n\f\r]+', ' ', 'g')), 1, 24) AS s
                FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
            FROM d a JOIN d b
              ON a.doc_id < b.doc_id
             AND abs(length(a.s) - length(b.s)) <= 1
             AND levenshtein(a.s, b.s) <= 1
            ORDER BY doc_a, doc_b
        """,
        # pairwise Pearson: one branch per ordered column pair, same
        # half-up 6dp float ops as the co-moment fold
        "q_corr_matrix": " UNION ALL ".join(
            f"""
            SELECT '{a}' AS col_a, '{b}' AS col_b,
                   floor(corr({a}, {b}) * 1000000 + 0.5) / 1000000
                       AS corr
            FROM lineitem
            """
            for i, a in enumerate(
                ["l_quantity", "l_extendedprice", "l_discount",
                 "l_tax"]
            )
            for b in ["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax"][i + 1:]
        ) + " ORDER BY col_a, col_b",
        # EWMA via the weighted-prefix-sum identity; per-key t0
        # anchor bounds exp args; round(6) absorbs fold-order noise
        "q_ewma": """
            WITH t AS (
                SELECT event_id, user_id, value,
                       epoch_us(ts) AS tu,
                       min(epoch_us(ts)) OVER (PARTITION BY user_id)
                           AS t0
                FROM events
            )
            SELECT event_id, user_id,
                   round(exp(-(tu - t0) / (3.0 * 86400000000))
                         * sum(value * exp((tu - t0)
                                           / (3.0 * 86400000000)))
                           OVER (PARTITION BY user_id
                                 ORDER BY tu, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW),
                         6) AS ewma
            FROM t
            ORDER BY event_id DESC LIMIT 2000
        """,
        # full outer join of two per-user summaries; parity filters
        # force unmatched keys on both ends at every scale factor
        "q_full_outer_join": """
            WITH a AS (
                SELECT user_id,
                       floor(sum(value) * 100 + 0.5) / 100 AS spend
                FROM events
                WHERE event_type = 'purchase' AND user_id % 3 <> 0
                GROUP BY 1
            ), b AS (
                SELECT user_id, count(*) AS n_clicks
                FROM events
                WHERE event_type = 'click' AND user_id % 2 = 0
                GROUP BY 1
            )
            SELECT coalesce(a.user_id, b.user_id) AS user_id,
                   a.spend, b.n_clicks
            FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
            ORDER BY 1
        """,
        # gaps-and-islands interval union per user: duration from
        # exact integer cents so the us arithmetic is identical on
        # both sides; islands break where s > running max end
        "q_interval_coverage": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + CAST(floor(value * 100 + 0.5) AS BIGINT)
                         * 600000 AS e
                FROM events
            ), o AS (
                SELECT user_id, s, e,
                       max(e) OVER (
                           PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS pmax
                FROM iv
            ), isl AS (
                SELECT user_id, s, e,
                       sum(CASE WHEN pmax IS NULL OR s > pmax
                                THEN 1 ELSE 0 END) OVER (
                           PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS gid
                FROM o
            ), g AS (
                SELECT user_id, gid,
                       min(s) AS i_s, max(e) AS i_e
                FROM isl GROUP BY user_id, gid
            )
            SELECT user_id, count(*) AS n_islands,
                   CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        # long-span EWMA (tau = 10 min over a month: past the ~709*tau
        # float64 exp horizon, so the window-identity twin would
        # overflow) — oracle is the O(n^2) pairwise definition whose
        # exp arguments are all <= 0; user_id < 20 bounds the square
        "q_ewma_bot": """
            WITH e AS (
                SELECT event_id, user_id, value, epoch_us(ts) AS tu
                FROM events WHERE user_id < 20
            )
            SELECT a.event_id, a.user_id,
                   round(sum(b.value
                             * exp(-(a.tu - b.tu) / 600000000.0)),
                         6) AS ewma
            FROM e a JOIN e b
              ON a.user_id = b.user_id
             AND (b.tu < a.tu
                  OR (b.tu = a.tu AND b.event_id <= a.event_id))
            GROUP BY a.event_id, a.user_id
            ORDER BY a.event_id
        """,
        # content equality of the merged sorted runs vs the raw table
        # (sortedness is asserted in-pipeline; the compare is
        # order-insensitive)
        "q_merge_runs": """
            SELECT event_id, user_id, value FROM events
            ORDER BY event_id
        """,
        # recency decay anchored at max(ts) (footer stats = true max);
        # round(4) absorbs fold-order float noise
        "q_decayed_sum": """
            WITH m AS (SELECT max(ts) AS t_max FROM events)
            SELECT user_id,
                   round(sum(value * exp(
                       (epoch_us(ts) - epoch_us(t_max))
                       / (7.0 * 86400000000))), 4) AS score
            FROM events, m
            GROUP BY user_id ORDER BY user_id
        """,
        # schema evolution: UNION ALL BY NAME pads absent columns
        # with NULLs, exactly what align_union does with typed nulls
        "q_align_union": """
            SELECT * FROM (
                SELECT doc_id, lang FROM documents
                WHERE doc_id % 2 = 0
                UNION ALL BY NAME
                SELECT doc_id, lang, source, n_chars FROM documents
                WHERE doc_id % 2 = 1
            ) ORDER BY doc_id
        """,
        # per-bucket counts of the compacted layout vs the raw table:
        # same HUGEINT Knuth hash as layout.bucket_of
        "q_compact_layout": """
            SELECT CAST(((CAST(user_id AS HUGEINT) * 2654435761)
                    % 18446744073709551616) % 16 AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events
            GROUP BY 1 ORDER BY 1
        """,
        # same HUGEINT multiplicative hash as q_hash_sample, on the
        # conversation id so splits are leakage-safe by group
        "q_group_split": f"""
            WITH t AS (
                SELECT doc_id, doc_id // {_TPC} AS conv_id,
                       ((CAST(doc_id // {_TPC} AS HUGEINT) * 2654435761)
                        % 18446744073709551616) % 100 AS slot
                FROM documents
            )
            SELECT doc_id, conv_id,
                   CASE WHEN slot < 80 THEN 'train'
                        WHEN slot < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM t ORDER BY doc_id
        """,
        # CUBE via COALESCE'd NULL levels; isodow matches pandas
        # dayofweek + 1 (Mon=1..Sun=7)
        "q_cube_revenue": """
            WITH t AS (
                SELECT event_type,
                       CAST(isodow(ts) AS VARCHAR) AS dow,
                       CAST(floor(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(dow, 'ALL') AS dow,
                   CAST(count(cents) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM t
            GROUP BY CUBE (event_type, dow)
            ORDER BY 1, 2
        """,
        # distributed prefix sum: integer cents make the running sum
        # order-independent, so the hash matches bit-for-bit
        "q_running_total": """
            WITH w AS (
                SELECT event_id, user_id,
                       CAST(count(*) OVER win AS BIGINT) AS cum_n,
                       CAST(sum(CAST(floor(value * 100) AS BIGINT))
                            OVER win AS BIGINT) AS cum_cents
                FROM events
                WINDOW win AS (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT * FROM w
            ORDER BY event_id DESC LIMIT 2000
        """,
        # same whitespace token count as q_token_count
        "q_ntile_curriculum": r"""
            WITH t AS (
                SELECT doc_id, lang,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+'))
                            END AS BIGINT) AS n_tokens
                FROM documents
            )
            SELECT doc_id, lang, n_tokens,
                   CAST(ntile(4) OVER (
                       PARTITION BY lang ORDER BY n_tokens, doc_id
                   ) AS BIGINT) AS bucket
            FROM t ORDER BY doc_id
        """,
        # same lowercase-whitespace tokenizer as q_bigram_counts
        "q_vocab_spectrum": """
            WITH toks AS (
                SELECT unnest(list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '')) AS w
                FROM documents
            ), wc AS (
                SELECT w, count(*) AS n FROM toks GROUP BY w
            )
            SELECT n AS freq, count(*) AS n_words
            FROM wc GROUP BY n ORDER BY freq
        """,
        "q_tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents
            ), tf AS (
                SELECT doc_id, w AS term, count(*) AS n
                FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
                GROUP BY 1, 2
            ), dfr AS (
                SELECT term, count(DISTINCT doc_id) AS df
                FROM tf GROUP BY term
            ), nd AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       floor(tf.n * ln(CAST(nd.n_docs AS DOUBLE)
                                       / dfr.df) * 1e6 + 0.5) / 1e6
                           AS tfidf
                FROM tf JOIN dfr USING (term) CROSS JOIN nd
            )
            SELECT doc_id, term, tfidf FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY tfidf DESC, term) AS rn
                FROM scored)
            WHERE rn <= 3 ORDER BY doc_id, tfidf DESC, term
        """,
        "q_lm_score": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents
            ), w AS (
                SELECT doc_id, unnest(ws) AS word FROM toks
            ), vocab AS (
                SELECT word, count(*) AS n FROM w GROUP BY word
            ), tot AS (SELECT sum(n) AS t FROM vocab),
            per_doc AS (
                SELECT w.doc_id,
                       sum(ln(CAST(vocab.n AS DOUBLE) / tot.t)) AS s,
                       count(*) AS m
                FROM w JOIN vocab USING (word) CROSS JOIN tot
                GROUP BY w.doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN p.m IS NULL THEN NULL
                        ELSE floor(p.s / p.m * 1e6 + 0.5) / 1e6
                   END AS lm_score
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
            ORDER BY d.doc_id
        """,
        "q_inverted_index": """
            WITH tw AS (
                SELECT DISTINCT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[a-z0-9_]{6,}')) AS term
                    FROM documents)
            )
            SELECT term, count(*) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM tw GROUP BY term ORDER BY term
        """,
        "q_stratified_sample": """
            SELECT event_type, event_id, h FROM (
                SELECT event_type, event_id,
                       md5(CAST(event_id AS VARCHAR)) AS h,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY md5(CAST(event_id AS VARCHAR)) DESC,
                                    event_id) AS rn
                FROM events)
            WHERE rn <= 5
        """,
        # A-ES weighted sampling: identical ln(u)/w key on both sides
        # (u = first-8-hex md5 of the id, shifted off 0), rounded to 9
        # decimals with an id tiebreak so libm/numpy ulp noise can't
        # flip the selection
        "q_weighted_sample": """
            SELECT source, doc_id, n_chars, skey FROM (
                SELECT source, doc_id, n_chars,
                       round(ln((CAST(('0x' || substr(
                                 md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS UBIGINT) + 1) / 4294967297.0)
                             / n_chars, 9) AS skey,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY round(ln((CAST(('0x' || substr(
                                 md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS UBIGINT) + 1) / 4294967297.0)
                             / n_chars, 9) DESC, doc_id) AS rn
                FROM documents)
            WHERE rn <= 3 ORDER BY source, doc_id
        """,
        # domain-mixture resampling: quota = round(total * weight) per
        # listed domain, filled ascending by md5 rank
        "q_mixture_sample": """
            SELECT source, doc_id, h FROM (
                SELECT source, doc_id,
                       md5(CAST(doc_id AS VARCHAR)) AS h,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rn
                FROM documents
                WHERE source IN ('src0', 'src1', 'src2'))
            WHERE rn <= CASE source
                WHEN 'src0' THEN 20 WHEN 'src1' THEN 12 ELSE 8 END
            ORDER BY source, doc_id
        """,
        # stream-stream windowed join: click 0-1 h after a view
        "q_window_join": """
            SELECT v.event_id AS left_id, c.event_id AS right_id
            FROM events v JOIN events c
              ON v.user_id = c.user_id
             AND v.event_type = 'view' AND c.event_type = 'click'
             AND c.ts > v.ts
             AND c.ts <= v.ts + INTERVAL 1 HOUR
            ORDER BY 1, 2
        """,
        # grouped median / MAD / 3-MAD outliers in exact integer cents
        "q_mad": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS v
                FROM events),
            m AS (
                SELECT event_type, quantile_disc(v, 0.5) AS med,
                       count(*) AS n
                FROM c GROUP BY 1),
            d AS (
                SELECT c.event_type, abs(c.v - m.med) AS ad
                FROM c JOIN m USING (event_type)),
            s AS (
                SELECT event_type, quantile_disc(ad, 0.5) AS mad
                FROM d GROUP BY 1)
            SELECT m.event_type,
                   m.med / 100.0 AS median,
                   s.mad / 100.0 AS mad,
                   m.n AS n,
                   count(*) FILTER (WHERE d.ad > 3.0 * s.mad)
                       AS n_outliers
            FROM d
            JOIN m USING (event_type)
            JOIN s USING (event_type)
            GROUP BY 1, m.med, s.mad, m.n
            ORDER BY 1
        """,
        # daily first-seen user counts (first-touch attribution)
        "q_new_users": """
            SELECT first_day, count(*) AS new_users
            FROM (
                SELECT user_id,
                       min(strftime(ts, '%Y-%m-%d')) AS first_day
                FROM events GROUP BY user_id)
            GROUP BY first_day
            ORDER BY first_day
        """,
        # BM25 top-20 for the fixed query {hash, merge, vector}
        "q_bm25": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents
            ), docs AS (
                SELECT doc_id, len(ws) AS dl FROM toks
            ), stats AS (
                SELECT count(*) AS n_docs,
                       CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                FROM docs
            ), tf AS (
                SELECT doc_id, w AS term, count(*) AS n
                FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
                WHERE w IN ('hash', 'merge', 'vector')
                GROUP BY 1, 2
            ), df AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term
            ), scored AS (
                SELECT tf.doc_id,
                       sum(ln((stats.n_docs - df.df + 0.5)
                              / (df.df + 0.5) + 1.0)
                           * tf.n * (1.2 + 1.0)
                           / (tf.n + 1.2 * (1.0 - 0.75
                              + 0.75 * docs.dl / stats.avgdl)))
                           AS s
                FROM tf
                JOIN df USING (term)
                JOIN docs USING (doc_id)
                CROSS JOIN stats
                GROUP BY tf.doc_id
            )
            SELECT doc_id, floor(s * 1e6 + 0.5) / 1e6 AS bm25
            FROM scored
            ORDER BY bm25 DESC, doc_id
            LIMIT 20
        """,
        # transcript assembly: convs stitched in turn order (divisor
        # derived from transcripts.TURNS_PER_CONV so it cannot drift)
        "q_conv_assemble": f"""
            SELECT printf('%08d', doc_id // {_TPC}) AS conv_id,
                   string_agg(text, chr(10) ORDER BY doc_id)
                       AS full_text,
                   count(*) AS n_turns
            FROM documents
            GROUP BY 1
            ORDER BY 1
        """,
        # SFT pairs: context = earlier turns, target = this turn
        "q_sft_pairs": f"""
            SELECT conv_id, turn_idx, context, target FROM (
                SELECT printf('%08d', doc_id // {_TPC}) AS conv_id,
                       doc_id % {_TPC} AS turn_idx,
                       string_agg(text, chr(10)) OVER (
                           PARTITION BY doc_id // {_TPC}
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS context,
                       text AS target
                FROM documents)
            WHERE context IS NOT NULL
            ORDER BY conv_id, turn_idx
        """,
        # CDC merge: updates %10, deletes %17 (win), inserts %23
        "q_upsert_merge": """
            SELECT doc_id, length(text) AS n_chars FROM (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 = 0
                            THEN 'UPDATED ' || text ELSE text END
                           AS text
                FROM documents
                WHERE doc_id % 17 <> 0
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, 'NEW ' || text
                FROM documents WHERE doc_id % 23 = 0)
            ORDER BY doc_id
        """,
        # schema-on-read: integer field k out of the JSON props column
        "q_json_extract": """
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS k,
                   count(*) AS n
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY 1
            ORDER BY 1
        """,
        # per-doc character Shannon entropy (low-diversity filter)
        "q_entropy": """
            WITH ch AS (
                SELECT doc_id,
                       unnest(string_split(coalesce(text, ''), ''))
                           AS c
                FROM documents
            ), cnt AS (
                SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2
            ), tot AS (
                SELECT doc_id, sum(n) AS t FROM cnt GROUP BY 1
            )
            SELECT cnt.doc_id,
                   floor(-sum((CAST(n AS DOUBLE) / t)
                              * log2(CAST(n AS DOUBLE) / t))
                         * 1e6 + 0.5) / 1e6 AS entropy
            FROM cnt JOIN tot USING (doc_id)
            GROUP BY 1
            ORDER BY 1
        """,
        # Shannon entropy of each user's event-type mix
        "q_user_entropy": """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY 1, 2
            ), t AS (
                SELECT user_id, sum(n) AS t FROM c GROUP BY 1
            )
            SELECT c.user_id,
                   floor(-sum((CAST(n AS DOUBLE) / t)
                              * log2(CAST(n AS DOUBLE) / t))
                         * 1e6 + 0.5) / 1e6 AS entropy,
                   CAST(sum(n) AS BIGINT) AS n
            FROM c JOIN t USING (user_id)
            GROUP BY 1
            ORDER BY 1
        """,
        # cosine similarity between sources' term-count vectors
        "q_source_sim": """
            WITH w AS (
                SELECT source,
                       unnest(list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')),
                           '[ \t\n\f\r]+'), x -> x <> '')) AS word
                FROM documents
            ), c AS (
                SELECT source, word, count(*) AS n
                FROM w GROUP BY 1, 2
            ), d AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       sum(CAST(a.n AS DOUBLE) * b.n) AS dot
                FROM c a JOIN c b
                  ON a.word = b.word AND a.source < b.source
                GROUP BY 1, 2
            ), nrm AS (
                SELECT source,
                       sqrt(sum(CAST(n AS DOUBLE) * n)) AS nn
                FROM c GROUP BY 1
            )
            SELECT src_a, src_b,
                   floor(dot / (na.nn * nb.nn) * 1e6 + 0.5) / 1e6
                       AS cosine
            FROM d
            JOIN nrm na ON na.source = d.src_a
            JOIN nrm nb ON nb.source = d.src_b
            ORDER BY 1, 2
        """,
        # Gini of the per-user event-count distribution
        "q_skew_report": """
            WITH u AS (
                SELECT user_id, count(*) AS c
                FROM events GROUP BY 1
            ), r AS (
                SELECT c,
                       row_number() OVER (ORDER BY c) AS i,
                       count(*) OVER () AS n,
                       sum(c) OVER () AS s
                FROM u
            )
            SELECT floor(sum((2.0 * i - n - 1) * c)
                         / (any_value(n) * any_value(s))
                         * 1e6 + 0.5) / 1e6 AS gini,
                   any_value(n) AS n_users,
                   CAST(any_value(s) AS BIGINT) AS n_events,
                   max(c) AS max_c
            FROM r
        """,
        # incremental rollup refresh == full recompute
        "q_mv_update": """
            SELECT event_type, count(value) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1
            ORDER BY 1
        """,
        # order-invariant table checksum (md5-prefix sum mod 2^61-1)
        "q_table_checksum": """
            SELECT CAST(CAST(sum(CAST(concat('0x',
                       substr(md5(concat(CAST(doc_id AS VARCHAR), '|',
                                         coalesce(text, ''))), 1, 15))
                       AS BIGINT)) AS HUGEINT)
                   % 2305843009213693951 AS BIGINT) AS checksum,
                   count(*) AS n
            FROM documents
        """,
        # per-type OLS trend via distributed sufficient statistics
        "q_regression": """
            WITH pts AS (
                SELECT event_type,
                       (epoch_us(ts) / 1e6 - 1704067200) / 86400.0
                           AS x,
                       value AS y
                FROM events
            ), s AS (
                SELECT event_type, count(*) AS n, sum(x) AS sx,
                       sum(y) AS sy, sum(x * y) AS sxy,
                       sum(x * x) AS sxx
                FROM pts GROUP BY 1
            )
            SELECT event_type,
                   floor((n * sxy - sx * sy)
                         / (n * sxx - sx * sx) * 1e4 + 0.5) / 1e4
                       AS slope,
                   floor((sy - (n * sxy - sx * sy)
                          / (n * sxx - sx * sx) * sx) / n
                         * 1e4 + 0.5) / 1e4 AS intercept,
                   n
            FROM s
            ORDER BY 1
        """,
        # 2-D box aggregate over the z-ordered layout
        "q_zorder_scan": """
            SELECT event_type, count(value) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events
            WHERE user_id BETWEEN 100 AND 300
              AND epoch_us(ts) // 86400000000 - 19723 BETWEEN 5 AND 10
            GROUP BY 1
            ORDER BY 1
        """,
        # per-day KL divergence vs the global event-type mix
        "q_drift_kl": """
            WITH c AS (
                SELECT date_trunc('day', ts) AS day, event_type,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
            tq AS (
                SELECT event_type,
                       CAST(sum(n) AS DOUBLE)
                           / (SELECT sum(n) FROM c) AS q
                FROM c GROUP BY 1),
            tp AS (
                SELECT day, event_type,
                       CAST(n AS DOUBLE)
                           / sum(n) OVER (PARTITION BY day) AS p
                FROM c)
            SELECT day, round(sum(p * ln(p / q)), 6) AS kl
            FROM tp JOIN tq USING (event_type)
            GROUP BY day ORDER BY day
        """,
        # top-2 event types per day (count desc, type asc ties)
        "q_trending": """
            SELECT day, event_type, n FROM (
                SELECT date_trunc('day', ts) AS day, event_type,
                       count(*) AS n,
                       row_number() OVER (
                           PARTITION BY date_trunc('day', ts)
                           ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY 1, 2)
            WHERE rn <= 2 ORDER BY day, event_type
        """,
        # Markov transition counts over (ts, event_id)-ordered streams
        "q_transitions": """
            WITH o AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
                FROM events)
            SELECT prev AS src, event_type AS dst, count(*) AS n
            FROM o WHERE prev IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # snapshot diff: simulated re-crawl (drop %7, edit %11, add a
        # +1e6-id copy of %13); unchanged pairs excluded
        "q_dataset_diff": """
            WITH old AS (
                SELECT doc_id, md5(text) AS fp FROM documents),
            new AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                                ELSE text END) AS fp
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT doc_id + 1000000, md5(text)
                FROM documents WHERE doc_id % 13 = 0),
            j AS (
                SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                       o.fp AS ofp, n.fp AS nfp
                FROM old o FULL OUTER JOIN new n
                  ON o.doc_id = n.doc_id)
            SELECT doc_id,
                   CASE WHEN ofp IS NULL THEN 'added'
                        WHEN nfp IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM j
            WHERE ofp IS NULL OR nfp IS NULL OR ofp <> nfp
            ORDER BY doc_id
        """,
        # grouped z-score: population stddev; 6-decimal round absorbs
        # summation-order noise between the two-pass moments and
        # DuckDB's single-pass stddev_pop
        "q_zscore": """
            SELECT event_id, event_type, value,
                   round((value - avg(value) OVER w)
                         / stddev_pop(value) OVER w, 6) AS z
            FROM events
            WINDOW w AS (PARTITION BY event_type)
            ORDER BY event_id
        """,
        # first-touch funnel: each step strictly after the user's first
        # qualifying previous step
        "q_funnel": """
            WITH s1 AS (
                SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s1
                  ON e.user_id = s1.user_id AND e.ts > s1.t
                WHERE e.event_type = 'click' GROUP BY 1),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t
                FROM events e JOIN s2
                  ON e.user_id = s2.user_id AND e.ts > s2.t
                WHERE e.event_type = 'purchase' GROUP BY 1)
            SELECT 'signup' AS step,
                   (SELECT count(*) FROM s1) AS n_users
            UNION ALL SELECT 'click', (SELECT count(*) FROM s2)
            UNION ALL SELECT 'purchase', (SELECT count(*) FROM s3)
        """,
        # JSONL export manifest: same Knuth multiplicative hash bucket
        # rule as q_pack_write
        "q_export_jsonl": """
            SELECT CAST(((CAST(doc_id AS HUGEINT) * 2654435761)
                         % 18446744073709551616) % 8 AS BIGINT)
                       AS bucket,
                   count(*) AS n_rows
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # k-anonymity: (source, lang) tuples with < 5 rows suppressed
        "q_k_anon": """
            WITH c AS (
                SELECT source, lang, count(*) AS group_n
                FROM documents GROUP BY source, lang)
            SELECT doc_id,
                   CASE WHEN group_n >= 5 THEN d.source ELSE '*' END
                       AS source,
                   CASE WHEN group_n >= 5 THEN d.lang ELSE '*' END
                       AS lang,
                   group_n
            FROM documents d JOIN c USING (source, lang)
            ORDER BY doc_id
        """,
        "q_star_join": """
            SELECT r_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders, customer, nation, region
            WHERE o_custkey = c_custkey
              AND c_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        # LOCF resample: epoch-aligned 6-hour grid per user between the
        # corpus min/max ts; ASOF LEFT JOIN carries the latest earlier
        # value; exact-ts duplicate events resolve to max(value) on
        # both sides
        "q_resample_locf": """
            WITH bounds AS (
                SELECT CAST(ceil(epoch(min(ts)) / 21600) * 21600
                            AS BIGINT) AS s,
                       CAST(floor(epoch(max(ts)) / 21600) * 21600
                            AS BIGINT) AS e
                FROM events),
            users AS (SELECT DISTINCT user_id FROM events),
            grid AS (
                SELECT user_id, unnest(generate_series(s, e, 21600))
                           AS gsec
                FROM users, bounds),
            ev AS (
                SELECT user_id, epoch_us(ts) AS tus,
                       max(value) AS value
                FROM events GROUP BY user_id, epoch_us(ts))
            SELECT g.user_id, g.gsec, round(e.value, 2) AS value
            FROM grid g ASOF LEFT JOIN ev e
              ON g.user_id = e.user_id AND e.tus <= g.gsec * 1000000
            ORDER BY g.user_id, g.gsec
        """,
        # poison-pill quarantine: the UDF raises ZeroDivisionError on
        # k = 50; quarantined rows carry the id + exception name with
        # null outputs. int(100 / (k-50)) truncates like DuckDB's //
        "q_quarantine": r"""
            WITH x AS (
                SELECT event_id,
                       CAST(regexp_extract(props, '"k": (\d+)', 1)
                            AS BIGINT) AS k
                FROM events)
            SELECT event_id,
                   CASE WHEN k <> 50 THEN k END AS k,
                   CASE WHEN k <> 50 THEN 100 // (k - 50) END AS inv,
                   CASE WHEN k = 50 THEN 'error' ELSE 'ok' END AS status,
                   CASE WHEN k = 50 THEN 'ZeroDivisionError' ELSE '' END
                       AS error
            FROM x ORDER BY event_id
        """,
        # gaps-and-islands twin of the distributed RLE: run id = the
        # row_number-difference trick, runs of >= 2 kept
        "q_event_runs": """
            WITH r AS (
                SELECT user_id, event_type, ts,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                       - row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS grp
                FROM events)
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS run_len,
                   min(ts) AS start_ts, max(ts) AS end_ts
            FROM r GROUP BY user_id, event_type, grp
            HAVING count(*) >= 2
            ORDER BY user_id, start_ts, event_type
        """,
        # the same midrank identity as ops.fit.roc_auc, windowed over
        # the distinct-score histogram
        "q_auc": """
            WITH s AS (
                SELECT value AS score,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS y
                FROM events),
            h AS (
                SELECT score,
                       CAST(sum(y) AS DOUBLE) AS np_,
                       CAST(sum(1 - y) AS DOUBLE) AS nn_
                FROM s GROUP BY score),
            c AS (
                SELECT np_, nn_,
                       coalesce(sum(nn_) OVER (
                           ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_neg
                FROM h)
            SELECT round(sum(np_ * (cum_neg + nn_ / 2))
                         / ((SELECT sum(np_) FROM h)
                            * (SELECT sum(nn_) FROM h)), 6) AS auc,
                   CAST((SELECT sum(np_) FROM h) AS BIGINT) AS n_pos,
                   CAST((SELECT sum(nn_) FROM h) AS BIGINT) AS n_neg
            FROM c
        """,
        # same joint-histogram identities as ops.profile
        # .mutual_information: MI and both entropies from one
        # (x, y, n) table with window-sum marginals
        "q_mutual_info": """
            WITH j AS (
                SELECT event_type AS x,
                       CAST(dayofweek(ts) AS BIGINT) AS y,
                       CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n) AS tot FROM j),
            m AS (
                SELECT n,
                       sum(n) OVER (PARTITION BY x) AS nx,
                       sum(n) OVER (PARTITION BY y) AS ny
                FROM j)
            SELECT round(sum((n / tot) * ln(n * tot / (nx * ny))), 6)
                       AS mi,
                   round(-sum((n / tot) * ln(nx / tot)), 6) AS h_x,
                   round(-sum((n / tot) * ln(ny / tot)), 6) AS h_y
            FROM m, t
        """,
        # blocked self-join twin of the adjacent-successor prefix
        # check; a prefix relation implies equal first-24 chars, so
        # the block join is complete
        "q_prefix_dedup": r"""
            WITH d AS (
                SELECT doc_id,
                       trim(regexp_replace(lower(coalesce(text, '')),
                            '[ \t\n\f\r]+', ' ', 'g')) AS s
                FROM documents),
            e AS (
                SELECT doc_id, s, substr(s, 1, 24) AS blk
                FROM d WHERE length(s) >= 24)
            SELECT a.doc_id,
                   CASE WHEN max(CASE WHEN b.s = a.s
                                 THEN 1 ELSE 0 END) = 1
                        THEN 'exact' ELSE 'prefix' END AS reason
            FROM e a JOIN e b
              ON a.blk = b.blk AND a.doc_id <> b.doc_id
             AND ((b.s = a.s AND b.doc_id < a.doc_id)
                  OR (length(b.s) > length(a.s)
                      AND substr(b.s, 1, length(a.s)) = a.s))
            GROUP BY a.doc_id
            ORDER BY a.doc_id
        """,
        # same cumulative-gain identity as ops.fit.best_split; the
        # sumsq terms cancel in SSE reduction so only (n, sum) move
        "q_tree_split": """
            WITH long AS (
                SELECT 'l_discount' AS feature, l_discount AS value,
                       l_extendedprice AS y FROM lineitem
                UNION ALL
                SELECT 'l_quantity', l_quantity, l_extendedprice
                FROM lineitem
                UNION ALL
                SELECT 'l_tax', l_tax, l_extendedprice FROM lineitem),
            h AS (
                SELECT feature, value,
                       CAST(count(*) AS DOUBLE) AS n, sum(y) AS s
                FROM long GROUP BY 1, 2),
            tot AS (
                SELECT feature, sum(n) AS np_, sum(s) AS sp
                FROM h GROUP BY 1),
            c AS (
                SELECT feature, value,
                       sum(n) OVER w AS nl, sum(s) OVER w AS sl
                FROM h WINDOW w AS (
                    PARTITION BY feature ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
            g AS (
                SELECT c.feature, c.value AS threshold,
                       (sl * sl / nl
                        + (sp - sl) * (sp - sl) / (np_ - nl)
                        - sp * sp / np_) / np_ AS mg,
                       sl / nl AS left_mean,
                       (sp - sl) / (np_ - nl) AS right_mean,
                       CAST(nl AS BIGINT) AS n_left,
                       CAST(np_ - nl AS BIGINT) AS n_right
                FROM c JOIN tot ON c.feature = tot.feature
                WHERE nl < np_)
            SELECT feature, threshold, round(mg, 4) AS mean_gain,
                   round(left_mean, 2) AS left_mean,
                   round(right_mean, 2) AS right_mean,
                   n_left, n_right
            -- order by the UNROUNDED gain: the kernel ties on full
            -- precision, rounding only the reported value
            FROM g ORDER BY mg DESC, feature, threshold
            LIMIT 1
        """,
        "q_group_mode": """
            WITH c AS (
                SELECT user_id, event_type,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
            r AS (
                SELECT user_id, event_type AS mode_type, n,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY n DESC, event_type) AS rk
                FROM c)
            SELECT user_id, mode_type, n FROM r WHERE rk = 1
            ORDER BY user_id
        """,
        # explicit sum-of-squares variance so both engines do the
        # same float ops (var_samp uses a different accumulation)
        "q_welch_ttest": """
            WITH a AS (
                SELECT event_type AS grp,
                       CAST(count(*) AS DOUBLE) AS n,
                       sum(value) AS s,
                       sum(value * value) AS ss
                FROM events
                WHERE event_type IN ('purchase', 'click')
                GROUP BY 1),
            m AS (
                SELECT grp, n, s / n AS mean,
                       (ss - s * s / n) / (n - 1) AS var
                FROM a),
            w AS (
                SELECT p.mean AS m1, c.mean AS m2,
                       p.var / p.n AS a1, c.var / c.n AS a2,
                       p.n AS n1, c.n AS n2
                FROM (SELECT * FROM m WHERE grp = 'purchase') p,
                     (SELECT * FROM m WHERE grp = 'click') c)
            SELECT round(m1, 6) AS mean_purchase,
                   round(m2, 6) AS mean_click,
                   round((m1 - m2) / sqrt(a1 + a2), 6) AS t_stat,
                   round((a1 + a2) * (a1 + a2)
                         / (a1 * a1 / (n1 - 1) + a2 * a2 / (n2 - 1)),
                         6) AS df,
                   CAST(n1 AS BIGINT) AS n_purchase,
                   CAST(n2 AS BIGINT) AS n_click
            FROM w
        """,
        # cumulative-weight selection twin of weighted_quantile; the
        # cum_weight at the selected row rides along as a check
        "q_weighted_median": """
            WITH h AS (
                SELECT l_extendedprice AS v, sum(l_quantity) AS w
                FROM lineitem GROUP BY 1),
            t AS (SELECT sum(w) AS tot FROM h),
            c AS (
                SELECT v, sum(w) OVER (
                    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cw
                FROM h)
            SELECT round(v, 2) AS wmedian,
                   CAST(cw AS BIGINT) AS cum_weight,
                   CAST(tot AS BIGINT) AS total_weight
            FROM c, t WHERE cw >= 0.5 * tot
            ORDER BY v LIMIT 1
        """,
        # NTILE twin of the calibration deciles (ties broken by
        # event_id, same as ntile_by's (order, id) rank)
        "q_calibration": """
            WITH b AS (
                SELECT value AS score,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS y,
                       ntile(10) OVER (ORDER BY value, event_id)
                           AS bucket
                FROM events)
            SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   round(sum(score) / count(*), 6) AS mean_score,
                   round(CAST(sum(y) AS DOUBLE) / count(*), 6)
                       AS purchase_rate
            FROM b GROUP BY bucket ORDER BY bucket
        """,
        # binary-segmentation changepoint = best_split on the day
        # axis; same identity as q_tree_split with one feature
        "q_changepoint": """
            WITH h AS (
                SELECT CAST(epoch_us(ts) // 86400000000 AS DOUBLE)
                           AS day,
                       CAST(count(*) AS DOUBLE) AS n, sum(value) AS s
                FROM events GROUP BY 1),
            tot AS (SELECT sum(n) AS np_, sum(s) AS sp FROM h),
            c AS (
                SELECT day, sum(n) OVER w AS nl, sum(s) OVER w AS sl
                FROM h WINDOW w AS (
                    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)),
            g AS (
                SELECT day,
                       (sl * sl / nl
                        + (sp - sl) * (sp - sl) / (np_ - nl)
                        - sp * sp / np_) / np_ AS mg,
                       sl / nl AS left_mean,
                       (sp - sl) / (np_ - nl) AS right_mean,
                       CAST(nl AS BIGINT) AS n_left,
                       CAST(np_ - nl AS BIGINT) AS n_right
                FROM c, tot WHERE nl < np_)
            SELECT 'daily_value' AS series,
                   CAST(day AS BIGINT) AS break_day,
                   round(mg, 6) AS mean_gain,
                   round(left_mean, 2) AS left_mean,
                   round(right_mean, 2) AS right_mean,
                   n_left, n_right
            -- order by the UNROUNDED gain (kernel ties on full
            -- precision)
            FROM g ORDER BY mg DESC, day LIMIT 1
        """,
        # window-sum identity twin of conditional_entropy:
        # H(Y|X) = H(Y) - MI over the same joint histogram
        "q_cond_entropy": """
            WITH j AS (
                SELECT event_type AS x,
                       CAST(dayofweek(ts) AS BIGINT) AS y,
                       CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY 1, 2),
            t AS (SELECT sum(n) AS tot FROM j),
            m AS (
                SELECT n,
                       sum(n) OVER (PARTITION BY x) AS nx,
                       sum(n) OVER (PARTITION BY y) AS ny
                FROM j),
            s AS (
                SELECT sum((n / tot) * ln(n * tot / (nx * ny)))
                           AS mi,
                       -sum((n / tot) * ln(ny / tot)) AS h_y
                FROM m, t)
            SELECT round(h_y - mi, 6) AS h_y_given_x,
                   round(mi / h_y, 6) AS u_y_given_x
            FROM s
        """,
        # per-group rank-identity Gini twin with closed-form tie runs
        "q_group_gini": """
            WITH h AS (
                SELECT o_orderpriority AS k, o_totalprice AS v,
                       CAST(count(*) AS DOUBLE) AS c
                FROM orders GROUP BY 1, 2),
            c2 AS (
                SELECT k, v, c,
                       sum(c) OVER (PARTITION BY k ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - c AS off
                FROM h),
            s AS (
                SELECT k,
                       sum(v * (c * off + c * (c + 1) / 2)) AS num,
                       sum(v * c) AS tot, sum(c) AS n
                FROM c2 GROUP BY k)
            SELECT k AS o_orderpriority,
                   round(2 * num / (n * tot) - (n + 1) / n, 6)
                       AS gini,
                   CAST(n AS BIGINT) AS n,
                   round(tot, 2) AS total
            FROM s ORDER BY o_orderpriority
        """,
        # per-group midrank-AUC window twin of group_roc_auc
        "q_group_auc": """
            WITH t AS (
                SELECT CAST(epoch_us(ts) // 86400000000 % 7
                            AS BIGINT) AS dow,
                       value AS s,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS pos
                FROM events),
            h AS (
                SELECT dow, s, sum(pos) AS np_,
                       sum(1 - pos) AS nn
                FROM t GROUP BY dow, s),
            c AS (
                SELECT dow, s, np_, nn,
                       sum(nn) OVER (PARTITION BY dow ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - nn AS cnb
                FROM h),
            a AS (
                SELECT dow,
                       sum(np_ * (cnb + nn / 2.0)) AS num,
                       sum(np_) AS p, sum(nn) AS n
                FROM c GROUP BY dow)
            SELECT dow, round(num / (p * n), 6) AS auc,
                   CAST(p AS BIGINT) AS n_pos,
                   CAST(n AS BIGINT) AS n_neg
            FROM a ORDER BY dow
        """,
        # exclusive-prefix-max twin of the 2-D Pareto frontier:
        # a row survives iff its y beats the max y over strictly
        # larger x (NULL prefix = largest x, always kept)
        "q_pareto": """
            WITH mx AS (
                SELECT l_quantity AS x, max(l_extendedprice) AS my
                FROM lineitem GROUP BY 1),
            c AS (
                SELECT x, max(my) OVER (ORDER BY x DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pm
                FROM mx)
            SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
                   round(l.l_quantity, 2) AS l_quantity,
                   round(l.l_extendedprice, 2) AS l_extendedprice
            FROM lineitem l JOIN c ON l.l_quantity = c.x
            WHERE c.pm IS NULL OR l.l_extendedprice > c.pm
            ORDER BY l_orderkey, l_linenumber
        """,
        # suffix-window-min twin of Benjamini-Hochberg: adj =
        # min(1, min over j>=i of p_(j)*m/j); identical float
        # expressions keep both sides bit-equal pre-round
        "q_fdr": """
            WITH t AS (
                SELECT event_id AS id,
                       value - floor(value) AS p
                FROM events WHERE event_type = 'error'),
            r AS (
                SELECT id, p,
                       row_number() OVER (ORDER BY p, id) AS rn,
                       count(*) OVER () AS m
                FROM t),
            a AS (
                SELECT id, p, rn,
                       min(p * m / rn) OVER (
                           ORDER BY rn ROWS BETWEEN CURRENT ROW
                                AND UNBOUNDED FOLLOWING) AS q
                FROM r)
            SELECT CAST(id AS BIGINT) AS event_id,
                   round(p, 6) AS p_value,
                   CAST(rn AS BIGINT) AS rank,
                   round(least(q, 1.0), 6) AS p_adj
            FROM a ORDER BY rank
        """,
        # per-group cumulative-weight selection twin of
        # grouped_weighted_quantile
        "q_group_wmedian": """
            WITH h AS (
                SELECT l_returnflag AS k, l_extendedprice AS v,
                       sum(l_quantity) AS w
                FROM lineitem GROUP BY 1, 2),
            c AS (
                SELECT k, v, w,
                       sum(w) OVER (PARTITION BY k ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cw,
                       sum(w) OVER (PARTITION BY k) AS tot
                FROM h),
            r AS (
                SELECT k, v, tot,
                       row_number() OVER (PARTITION BY k
                           ORDER BY CASE WHEN cw >= 0.5 * tot
                                    THEN 0 ELSE 1 END, v) AS rn
                FROM c)
            SELECT k AS l_returnflag, round(v, 2) AS wmedian,
                   CAST(tot AS BIGINT) AS total_weight
            FROM r WHERE rn = 1 ORDER BY l_returnflag
        """,
        # ASOF-join twin of the reference-ECDF normalization: the
        # largest reference value <= each row's value carries the
        # cumulative count; integer ratios keep both sides bit-equal
        "q_ecdf_norm": """
            WITH ref AS (
                SELECT value AS v, count(*) AS c
                FROM events WHERE event_type = 'view' GROUP BY 1),
            cw AS (
                SELECT v, sum(c) OVER (ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM ref),
            n AS (SELECT count(*) AS nn FROM events
                  WHERE event_type = 'view'),
            p AS (SELECT event_id, value FROM events
                  WHERE event_type = 'purchase')
            SELECT CAST(p.event_id AS BIGINT) AS event_id,
                   round(CAST(coalesce(cw.cum, 0) AS DOUBLE)
                         / n.nn, 6) AS ref_pct
            FROM p ASOF LEFT JOIN cw ON p.value >= cw.v
            CROSS JOIN n
            ORDER BY event_id
        """,
        # row_number twin of the dup-frequency cap
        "q_dup_cap": """
            WITH r AS (
                SELECT doc_id, md5(text) AS content_hash,
                       row_number() OVER (
                           PARTITION BY md5(text) ORDER BY doc_id
                       ) AS rn
                FROM documents)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, content_hash
            FROM r WHERE rn <= 2 ORDER BY doc_id
        """,
        # cumulative-ECDF twin of ks_test; ECDF ratios are exact-int
        # divisions so both sides bit-agree; ties on D break to the
        # smallest value on both sides
        "q_ks_drift": """
            WITH h AS (
                SELECT value AS v,
                       sum(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS na,
                       sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS nb
                FROM events
                WHERE event_type IN ('click', 'purchase')
                GROUP BY 1),
            t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM h),
            c AS (
                SELECT v,
                       sum(na) OVER w AS ca, sum(nb) OVER w AS cb
                FROM h WINDOW w AS (
                    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW))
            SELECT round(abs(CAST(ca AS DOUBLE) / ta
                             - CAST(cb AS DOUBLE) / tb), 6) AS ks_d,
                   v AS at_value,
                   CAST(ta AS BIGINT) AS n_a,
                   CAST(tb AS BIGINT) AS n_b
            FROM c, t
            ORDER BY abs(CAST(ca AS DOUBLE) / ta
                         - CAST(cb AS DOUBLE) / tb) DESC, v
            LIMIT 1
        """,
        # midrank (avg of row_number) Spearman twin in the explicit
        # sum-of-squares form: midranks are half-integers, so every
        # sum is an exact multiple of 0.25 on both sides
        "q_spearman": """
            WITH b AS (
                SELECT l_quantity AS x, l_extendedprice AS y
                FROM lineitem),
            rx AS (
                SELECT x, avg(rn) AS r FROM (
                    SELECT x, row_number() OVER (ORDER BY x) AS rn
                    FROM b) GROUP BY x),
            ry AS (
                SELECT y, avg(rn) AS r FROM (
                    SELECT y, row_number() OVER (ORDER BY y) AS rn
                    FROM b) GROUP BY y),
            j AS (
                SELECT rx.r AS u, ry.r AS v
                FROM b JOIN rx ON b.x = rx.x
                       JOIN ry ON b.y = ry.y),
            s AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       sum(u) AS su, sum(v) AS sv,
                       sum(u * u) AS suu, sum(v * v) AS svv,
                       sum(u * v) AS suv
                FROM j)
            SELECT round((n * suv - su * sv)
                         / sqrt((n * suu - su * su)
                                * (n * svv - sv * sv)), 6)
                       AS spearman_rho,
                   CAST(n AS BIGINT) AS n
            FROM s
        """,
        # rank-identity Gini twin over the distinct-value histogram
        # with closed-form tie runs (off = exclusive cumulative count)
        "q_gini": """
            WITH h AS (
                SELECT o_totalprice AS v,
                       CAST(count(*) AS DOUBLE) AS c
                FROM orders GROUP BY 1),
            c2 AS (
                SELECT v, c,
                       sum(c) OVER (ORDER BY v ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) - c
                           AS off
                FROM h),
            s AS (
                SELECT sum(v * (c * off + c * (c + 1) / 2)) AS num,
                       sum(v * c) AS tot, sum(c) AS n
                FROM c2)
            SELECT round(2 * num / (n * tot) - (n + 1) / n, 6)
                       AS gini,
                   CAST(n AS BIGINT) AS n,
                   round(tot, 2) AS total
            FROM s
        """,
        # per-user time-weighted average via the lead() window
        "q_twap": """
            WITH w AS (
                SELECT user_id, value,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id)
                           - epoch_us(ts) AS dt
                FROM events),
            s AS (
                SELECT user_id, sum(value * dt) AS num,
                       sum(dt) AS den, count(dt) AS n
                FROM w WHERE dt IS NOT NULL
                GROUP BY user_id HAVING sum(dt) > 0)
            SELECT user_id, round(num / den, 6) AS twap,
                   CAST(den AS BIGINT) AS span_us,
                   CAST(n AS BIGINT) AS n_intervals
            FROM s ORDER BY user_id
        """,
        # degree assortativity over the cosine >= 0.3 embedding graph:
        # explicit integer sufficient sums mirror the Ray fold exactly
        "q_assortativity": """
            WITH p AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.3
            ), e AS (
                SELECT u, v FROM p UNION ALL SELECT v, u FROM p
            ), d AS (
                SELECT u AS node, count(*) AS deg FROM e GROUP BY u
            ), j AS (
                SELECT du.deg AS x, dv.deg AS y
                FROM e JOIN d du ON du.node = e.u
                       JOIN d dv ON dv.node = e.v
            ), s AS (
                SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx,
                       sum(y * y) AS syy
                FROM j)
            SELECT CAST(n AS BIGINT) AS n_directed,
                   round((n * sxy - sx * sy)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))),
                         6) AS assortativity
            FROM s
        """,
        # top-20 neighborhood-Jaccard link predictions: wedge
        # self-join counts common neighbors, NOT EXISTS drops pairs
        # that are already edges
        "q_common_neighbors": """
            WITH p AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.3
            ), e AS (
                SELECT u, v FROM p UNION ALL SELECT v, u FROM p
            ), d AS (
                SELECT u AS node, count(*) AS deg FROM e GROUP BY u
            ), w AS (
                SELECT e1.v AS x, e2.v AS y, count(*) AS common
                FROM e e1 JOIN e e2
                  ON e1.u = e2.u AND e1.v < e2.v
                GROUP BY 1, 2
            ), nc AS (
                SELECT x, y, common FROM w
                WHERE NOT EXISTS (
                    SELECT 1 FROM p WHERE p.u = w.x AND p.v = w.y)
            )
            SELECT x, y, CAST(common AS BIGINT) AS common,
                   round(common * 1.0
                         / (dx.deg + dy.deg - common), 6) AS jaccard
            FROM nc JOIN d dx ON dx.node = nc.x
                    JOIN d dy ON dy.node = nc.y
            ORDER BY common * 1.0 / (dx.deg + dy.deg - common) DESC,
                     x, y
            LIMIT 20
        """,
        # Laplace-smoothed categorical NB over the full value x class
        # grid (zero-count cells via the grid LEFT JOIN)
        "q_naive_bayes": """
            WITH t AS (
                SELECT o_orderstatus AS cls,
                       o_orderpriority AS v1,
                       CAST(epoch_us(o_orderdate) // 86400000000 % 7
                            AS VARCHAR) AS v2
                FROM orders),
            m AS (
                SELECT cls, 'priority' AS feature, v1 AS value FROM t
                UNION ALL SELECT cls, 'dow', v2 FROM t),
            c AS (
                SELECT feature, value, cls, count(*) AS cnt
                FROM m GROUP BY 1, 2, 3),
            vf AS (
                SELECT feature, count(DISTINCT value) AS nv
                FROM c GROUP BY 1),
            cn AS (SELECT cls, count(*) AS n FROM t GROUP BY 1),
            grid AS (
                SELECT v.feature, v.value, k.cls
                FROM (SELECT DISTINCT feature, value FROM c) v
                CROSS JOIN (SELECT DISTINCT cls FROM t) k),
            j AS (
                SELECT g.feature, g.value, g.cls,
                       COALESCE(c.cnt, 0) AS cnt
                FROM grid g LEFT JOIN c
                  ON c.feature = g.feature AND c.value = g.value
                 AND c.cls = g.cls),
            rows_ AS (
                SELECT j.feature, j.value, j.cls,
                       CAST(j.cnt AS BIGINT) AS cnt,
                       round(ln(j.cnt + 1.0)
                             - ln(cn.n + 1.0 * vf.nv), 6) AS logp
                FROM j JOIN cn ON cn.cls = j.cls
                       JOIN vf ON vf.feature = j.feature
                UNION ALL
                SELECT '__prior__', cls, cls, CAST(n AS BIGINT),
                       round(ln(1.0 * n)
                             - ln((SELECT 1.0 * count(*) FROM t)), 6)
                FROM cn)
            SELECT * FROM rows_ ORDER BY feature, value, cls
        """,
        # KM estimator: at-risk from the cumulative histogram,
        # survival via the ordered product() window at event times
        "q_kaplan_meier": """
            WITH u AS (
                SELECT user_id,
                       (epoch_us(max(ts)) - epoch_us(min(ts)))
                           // 86400000000 AS t,
                       max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS ev
                FROM events GROUP BY 1),
            h AS (
                SELECT t, sum(ev) AS d, count(*) AS c
                FROM u GROUP BY 1),
            w AS (
                SELECT t, d, c,
                       (SELECT count(*) FROM u)
                       - COALESCE(sum(c) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS n_risk
                FROM h),
            k AS (
                SELECT t, d, n_risk,
                       product(1 - d * 1.0 / n_risk)
                           OVER (ORDER BY t) AS s
                FROM w WHERE d > 0)
            SELECT CAST(t AS BIGINT) AS t,
                   CAST(n_risk AS BIGINT) AS n_risk,
                   CAST(d AS BIGINT) AS d,
                   round(s, 6) AS survival
            FROM k ORDER BY t
        """,
        # gap-tolerant ACF: pairs by exact day offset, full-series
        # denominator
        "q_acf": """
            WITH d AS (
                SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                       sum(o_totalprice) AS x
                FROM orders GROUP BY 1),
            s AS (SELECT sum(x) / count(*) AS m FROM d),
            den AS (
                SELECT sum((x - m) * (x - m)) AS den FROM d, s),
            p AS (
                SELECT r.lag AS lag,
                       sum((a.x - m) * (b.x - m)) AS num,
                       count(*) AS n_pairs
                FROM range(1, 8) r(lag)
                CROSS JOIN s
                CROSS JOIN d a
                JOIN d b ON b.day = a.day + r.lag
                GROUP BY 1)
            SELECT CAST(lag AS BIGINT) AS lag,
                   round(num / den.den, 6) AS acf,
                   CAST(n_pairs AS BIGINT) AS n_pairs
            FROM p, den ORDER BY lag
        """,
        # lag-semantics rapid-repeat filter (1 h)
        "q_throttle": """
            WITH w AS (
                SELECT event_id, user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS dt
                FROM events)
            SELECT event_id, user_id FROM w
            WHERE dt IS NULL OR dt >= 3600000000
            ORDER BY event_id
        """,
        # RRF of spend and order-count rankings; spend in exact cents
        "q_rank_fusion": """
            WITH a AS (
                SELECT o_custkey,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS spend,
                       count(*) AS n
                FROM orders GROUP BY 1),
            r AS (
                SELECT o_custkey,
                       row_number() OVER (
                           ORDER BY spend DESC, o_custkey) AS r1,
                       row_number() OVER (
                           ORDER BY n DESC, o_custkey) AS r2
                FROM a)
            SELECT o_custkey,
                   CAST(r1 AS BIGINT) AS spend_rank,
                   CAST(r2 AS BIGINT) AS count_rank,
                   round(1.0 / (60 + r1) + 1.0 / (60 + r2), 6) AS rrf
            FROM r
            ORDER BY 1.0 / (60 + r1) + 1.0 / (60 + r2) DESC, o_custkey
            LIMIT 20
        """,
        # PMI collocations: integer-exact ratio (c12*Nu^2)/(Nb*c1*c2),
        # q_bigram_counts' tokenizer contract
        "q_collocations": """
            WITH toks AS (
                SELECT list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents),
            uni AS (SELECT unnest(ws) AS w FROM toks),
            ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
            bg AS (
                SELECT unnest([ws[g] || ' ' || ws[g+1]
                               for g in range(1, len(ws))]) AS bigram
                FROM toks WHERE len(ws) >= 2),
            bcnt AS (
                SELECT split_part(bigram, ' ', 1) AS w1,
                       split_part(bigram, ' ', 2) AS w2,
                       count(*) AS n
                FROM bg GROUP BY 1, 2),
            tot AS (
                SELECT (SELECT sum(c) FROM ucnt) AS nu,
                       (SELECT sum(n) FROM bcnt) AS nb),
            j AS (
                SELECT b.w1, b.w2, b.n,
                       ln((b.n * nu * nu) * 1.0
                          / (nb * u1.c * u2.c)) AS pmi
                FROM bcnt b
                JOIN ucnt u1 ON u1.w = b.w1
                JOIN ucnt u2 ON u2.w = b.w2
                CROSS JOIN tot
                WHERE b.n >= 5)
            SELECT w1, w2, CAST(n AS BIGINT) AS n,
                   round(pmi, 6) AS pmi
            FROM j ORDER BY j.pmi DESC, w1, w2 LIMIT 20
        """,
        # consecutive event-type trigrams per user stream
        "q_trigram_paths": """
            WITH o AS (
                SELECT user_id, event_type AS g3,
                       lag(event_type, 1) OVER w AS g2,
                       lag(event_type, 2) OVER w AS g1
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY ts, event_id))
            SELECT g1, g2, g3, count(*) AS n
            FROM o WHERE g1 IS NOT NULL
            GROUP BY 1, 2, 3 ORDER BY g1, g2, g3
        """,
        # per-label centroid cohesion via the unnested dim expansion
        "q_centroid_sep": """
            WITH e AS (
                SELECT CAST(label AS BIGINT) AS label,
                       CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
            x AS (
                SELECT label, i, v[i] AS xi
                FROM e CROSS JOIN range(1, 65) r(i)),
            cent AS (
                SELECT label, i, sum(xi) / count(*) AS ci
                FROM x GROUP BY 1, 2),
            centl AS (
                SELECT label, list(ci ORDER BY i) AS cv
                FROM cent GROUP BY 1),
            cos AS (
                SELECT e.label,
                       list_cosine_similarity(e.v, c.cv) AS cosv
                FROM e JOIN centl c ON c.label = e.label)
            SELECT label, CAST(count(*) AS BIGINT) AS n,
                   round(sum(cosv) / count(*), 6) AS mean_cos
            FROM cos GROUP BY label ORDER BY label
        """,
        # hashing-trick featurization, fingerprint ops' md5 idiom
        "q_feature_hash": """
            WITH toks AS (
                SELECT doc_id, list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents),
            w AS (SELECT doc_id, unnest(ws) AS tok FROM toks),
            h AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(tok), 1, 8))
                            AS BIGINT) % 256 AS bucket
                FROM w)
            SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
            FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket
        """,
        # Benford first-digit audit over exact cents
        "q_benford": """
            WITH c AS (
                SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                           AS cents
                FROM orders),
            h AS (
                SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                            AS BIGINT) AS digit,
                       count(*) AS n
                FROM c GROUP BY 1),
            t AS (SELECT sum(n) AS total FROM h)
            SELECT digit, CAST(n AS BIGINT) AS n,
                   round(total * log10(1 + 1.0 / digit), 6)
                       AS expected,
                   round((n - total * log10(1 + 1.0 / digit)) ** 2
                         / (total * log10(1 + 1.0 / digit)), 6)
                       AS chi2_term
            FROM h, t ORDER BY digit
        """,
        # daily click->purchase cross-correlation, day-offset join
        "q_ccf": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS day,
                       sum(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS x,
                       sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1),
            s AS (
                SELECT sum(x) * 1.0 / count(*) AS mx,
                       sum(y) * 1.0 / count(*) AS my
                FROM d),
            den AS (
                SELECT sqrt(sum((x - mx) * (x - mx)))
                       * sqrt(sum((y - my) * (y - my))) AS den
                FROM d, s),
            p AS (
                SELECT r.lag AS lag,
                       sum((a.x - mx) * (b.y - my)) AS num,
                       count(*) AS n_pairs
                FROM range(-3, 4) r(lag)
                CROSS JOIN s
                CROSS JOIN d a
                JOIN d b ON b.day = a.day + r.lag
                GROUP BY 1)
            SELECT CAST(lag AS BIGINT) AS lag,
                   round(num / den.den, 6) AS ccf,
                   CAST(n_pairs AS BIGINT) AS n_pairs
            FROM p, den ORDER BY lag
        """,
        # NB apply: score mirrors naive_bayes_apply term for term —
        # explicit ln differences, same addition order, ties by
        # class asc via row_number
        "q_nb_confusion": """
            WITH t AS (
                SELECT o_orderkey AS id, o_orderstatus AS cls,
                       o_orderpriority AS v1,
                       CAST(epoch_us(o_orderdate) // 86400000000 % 7
                            AS VARCHAR) AS v2
                FROM orders),
            c1 AS (SELECT v1, cls, count(*) AS n FROM t GROUP BY 1, 2),
            c2 AS (SELECT v2, cls, count(*) AS n FROM t GROUP BY 1, 2),
            cn AS (SELECT cls, count(*) AS n FROM t GROUP BY 1),
            nv1 AS (SELECT count(DISTINCT v1) AS nv FROM t),
            nv2 AS (SELECT count(DISTINCT v2) AS nv FROM t),
            tot AS (SELECT count(*) AS n FROM t),
            k AS (SELECT DISTINCT cls FROM t),
            s AS (
                SELECT t.id, t.cls AS actual, k.cls AS cand,
                       (ln(1.0 * cn.n) - ln(1.0 * tot.n))
                       + (ln(COALESCE(a.n, 0) + 1.0)
                          - ln(cn.n + 1.0 * nv1.nv))
                       + (ln(COALESCE(b.n, 0) + 1.0)
                          - ln(cn.n + 1.0 * nv2.nv)) AS score
                FROM t CROSS JOIN k
                JOIN cn ON cn.cls = k.cls
                CROSS JOIN nv1 CROSS JOIN nv2 CROSS JOIN tot
                LEFT JOIN c1 a ON a.v1 = t.v1 AND a.cls = k.cls
                LEFT JOIN c2 b ON b.v2 = t.v2 AND b.cls = k.cls),
            pck AS (
                SELECT id, actual, cand,
                       row_number() OVER (
                           PARTITION BY id
                           ORDER BY score DESC, cand) AS rn
                FROM s)
            SELECT actual, cand AS predicted,
                   CAST(count(*) AS BIGINT) AS n
            FROM pck WHERE rn = 1
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # per-user watermark: running arrival-order max, 6 h lateness
        "q_late_events": """
            WITH w AS (
                SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                       max(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM events)
            SELECT event_id, user_id,
                   CASE WHEN wm IS NOT NULL
                             AND ts_us < wm - 21600000000
                        THEN 1 ELSE 0 END AS late
            FROM w ORDER BY event_id
        """,
        # Dunning G2 keyness, zero-count sides contribute 0
        "q_keyness": """
            WITH toks AS (
                SELECT lang, list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents),
            w AS (
                SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END
                           AS side,
                       unnest(ws) AS term
                FROM toks),
            c AS (
                SELECT term,
                       sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS a,
                       sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS b
                FROM w GROUP BY 1),
            tt AS (SELECT sum(a) AS c1, sum(b) AS c2 FROM c),
            g AS (
                SELECT term, a, b,
                       2.0 * (
                           CASE WHEN a > 0 THEN a * ln(
                               (a * 1.0)
                               / (c1 * (a + b) * 1.0 / (c1 + c2)))
                                ELSE 0.0 END
                           + CASE WHEN b > 0 THEN b * ln(
                               (b * 1.0)
                               / (c2 * (a + b) * 1.0 / (c1 + c2)))
                                  ELSE 0.0 END) AS g2
                FROM c, tt WHERE a + b >= 10)
            SELECT term, CAST(a AS BIGINT) AS a,
                   CAST(b AS BIGINT) AS b, round(g2, 6) AS g2
            FROM g ORDER BY g.g2 DESC, term LIMIT 20
        """,
        # segment-median imputation of the negative-balance sentinel
        "q_impute": """
            WITH med AS (
                SELECT c_mktsegment,
                       quantile_disc(c_acctbal, 0.5) AS m
                FROM customer WHERE c_acctbal >= 0 GROUP BY 1)
            SELECT c_custkey, c.c_mktsegment,
                   CASE WHEN c_acctbal < 0 THEN med.m
                        ELSE c_acctbal END AS acctbal_imputed,
                   CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END
                       AS was_imputed
            FROM customer c JOIN med USING (c_mktsegment)
            ORDER BY c_custkey
        """,
        # WOE / IV over exact NTILE(10) bins of event value
        "q_woe_iv": """
            WITH t AS (
                SELECT ntile(10) OVER (ORDER BY value, event_id)
                           AS bucket,
                       CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END AS y
                FROM events),
            c AS (
                SELECT bucket, sum(y) AS good,
                       count(*) AS n
                FROM t GROUP BY 1),
            tt AS (
                SELECT sum(good) AS g,
                       sum(n - good) AS b
                FROM c)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(n AS BIGINT) AS n,
                   CAST(good AS BIGINT) AS good,
                   CAST(n - good AS BIGINT) AS bad,
                   round(ln((good * 1.0 * b)
                            / ((n - good) * 1.0 * g)), 6) AS woe,
                   round((good * 1.0 / g - (n - good) * 1.0 / b)
                         * ln((good * 1.0 * b)
                              / ((n - good) * 1.0 * g)), 6)
                       AS iv_term
            FROM c, tt ORDER BY bucket
        """,
        # per-user daily linear interpolation via two ASOF joins;
        # interpolation expression mirrors resample_linear exactly
        "q_resample_linear": """
            WITH d AS (
                SELECT user_id,
                       epoch_us(ts) // 86400000000 AS unit,
                       avg(value) AS v
                FROM events GROUP BY 1, 2),
            span AS (
                SELECT user_id, min(unit) AS u0, max(unit) AS u1
                FROM d GROUP BY 1),
            grid AS (
                SELECT user_id, unnest(range(u0, u1 + 1)) AS unit
                FROM span),
            pv AS (
                SELECT g.user_id, g.unit, d.unit AS pt, d.v AS pvv
                FROM grid g ASOF JOIN d
                  ON g.user_id = d.user_id AND g.unit >= d.unit),
            nx AS (
                SELECT g.user_id, g.unit, d.unit AS nt, d.v AS nvv
                FROM grid g ASOF JOIN d
                  ON g.user_id = d.user_id AND g.unit <= d.unit)
            SELECT p.user_id, p.unit,
                   round(CASE WHEN p.pt = p.unit THEN p.pvv
                         ELSE p.pvv + (n.nvv - p.pvv)
                              * (p.unit - p.pt) / (n.nt - p.pt)
                         END, 6) AS v,
                   CASE WHEN p.pt = p.unit THEN 1 ELSE 0 END
                       AS observed
            FROM pv p JOIN nx n
              ON n.user_id = p.user_id AND n.unit = p.unit
            ORDER BY p.user_id, p.unit
        """,
        # rank-based 10% trimmed mean; floor(0.1*n) in the same
        # float64 both sides
        "q_trimmed_mean": """
            WITH r AS (
                SELECT o_orderpriority AS k, o_totalprice AS v,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS rn,
                       count(*) OVER (
                           PARTITION BY o_orderpriority) AS n
                FROM orders)
            SELECT k AS o_orderpriority,
                   round(sum(v) / count(*), 6) AS trimmed_mean,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(max(n) AS BIGINT) AS n
            FROM r
            WHERE rn > floor(0.1 * n) AND rn <= n - floor(0.1 * n)
            GROUP BY k ORDER BY k
        """,
        # last-touch attribution via strict-inequality ASOF on the
        # globally-unique arrival id
        "q_attribution": """
            WITH t AS (
                SELECT event_id, user_id FROM events
                WHERE event_type = 'purchase'),
            nt AS (
                SELECT event_id, user_id, event_type FROM events
                WHERE event_type <> 'purchase')
            SELECT t.event_id, t.user_id, nt.event_type AS touch
            FROM t ASOF JOIN nt
              ON t.user_id = nt.user_id
             AND t.event_id > nt.event_id
            ORDER BY t.event_id
        """,
        # per-user first/last under the (ts, id) total order
        "q_first_last": """
            WITH r AS (
                SELECT user_id, epoch_us(ts) AS ts_us, value,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS ra,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rd
                FROM events)
            SELECT a.user_id,
                   a.ts_us AS first_ts, a.value AS first_value,
                   d.ts_us AS last_ts, d.value AS last_value
            FROM r a JOIN r d
              ON d.user_id = a.user_id AND d.rd = 1
            WHERE a.ra = 1
            ORDER BY a.user_id
        """,
        # trailing 5-row median; the window frame shrinks at the
        # stream head exactly like pandas min_periods=1
        "q_rolling_median": """
            SELECT event_id, user_id,
                   median(value) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                       AS roll_median
            FROM events ORDER BY event_id
        """,
        # ER composition: FastSS-blocked levenshtein pairs ->
        # recursive min-label CC (q_semdedup's idiom) -> sizes
        "q_entity_resolution": """
            WITH RECURSIVE d AS (
                SELECT doc_id,
                       substr(trim(regexp_replace(
                           lower(coalesce(text, '')),
                           '[ \t\n\f\r]+', ' ', 'g')), 1, 24) AS s
                FROM documents),
            p AS (
                SELECT a.doc_id AS pu, b.doc_id AS pv
                FROM d a JOIN d b
                  ON a.doc_id < b.doc_id
                 AND abs(length(a.s) - length(b.s)) <= 1
                 AND levenshtein(a.s, b.s) <= 1),
            e AS (
                SELECT pu AS u, pv AS v FROM p
                UNION SELECT pv, pu FROM p),
            reach AS (
                SELECT doc_id AS node, doc_id AS label
                FROM documents
                UNION
                SELECT e.v, r.label
                FROM reach r JOIN e ON e.u = r.node
                WHERE r.label < e.v),
            comp AS (
                SELECT node AS doc_id, min(label) AS component
                FROM reach GROUP BY node),
            sz AS (
                SELECT component, count(*) AS cluster_size
                FROM comp GROUP BY 1)
            SELECT c.doc_id, c.component,
                   CAST(sz.cluster_size AS BIGINT) AS cluster_size,
                   CASE WHEN c.doc_id = c.component
                        THEN 1 ELSE 0 END AS is_canonical
            FROM comp c JOIN sz USING (component)
            ORDER BY c.doc_id
        """,
        # 20 equal-width bins; bin expression float-identical
        "q_histogram": """
            WITH s AS (
                SELECT min(o_totalprice) AS mn,
                       max(o_totalprice) AS mx,
                       (max(o_totalprice) - min(o_totalprice)) / 20.0
                           AS w
                FROM orders),
            b AS (
                SELECT CAST(least(floor((o_totalprice - mn) / w),
                                  19.0) AS BIGINT) AS bin
                FROM orders, s)
            SELECT bin, round(mn + bin * w, 6) AS lo,
                   CAST(count(*) AS BIGINT) AS n
            FROM b, s GROUP BY bin, mn, w ORDER BY bin
        """,
        # md5-derived contrastive negatives over dense ids
        "q_negatives": """
            WITH nn AS (
                SELECT count(*) AS n FROM documents),
            a AS (
                SELECT doc_id, unnest(range(0, 4)) AS i
                FROM documents),
            h AS (
                SELECT doc_id, i,
                       CAST(('0x' || substr(md5(
                           CAST(doc_id AS VARCHAR) || '-'
                           || CAST(i AS VARCHAR)), 1, 8))
                           AS BIGINT) % n AS cand
                FROM a, nn)
            SELECT doc_id, CAST(i AS BIGINT) AS neg_rank,
                   CAST(CASE WHEN cand = doc_id
                             THEN (cand + 1) % n
                             ELSE cand END AS BIGINT) AS neg_id
            FROM h, nn ORDER BY doc_id, neg_rank
        """,
        # weekly additive decomposition on the bounded day axis
        "q_seasonal": """
            WITH d AS (
                SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                       sum(o_totalprice) AS x
                FROM orders GROUP BY 1),
            t AS (SELECT day % 7 AS dow, x FROM d),
            g AS (SELECT sum(x) / count(*) AS m FROM t),
            k AS (
                SELECT dow, count(*) AS n_days,
                       sum(x) / count(*) AS mk
                FROM t GROUP BY 1),
            ssw AS (
                SELECT sum((t.x - k.mk) * (t.x - k.mk)) AS ssw
                FROM t JOIN k USING (dow)),
            sst AS (
                SELECT sum((x - m) * (x - m)) AS sst FROM t, g)
            SELECT dow, CAST(n_days AS BIGINT) AS n_days,
                   round(mk, 6) AS mean_rev,
                   round(mk - m, 6) AS effect,
                   round(1 - ssw.ssw / sst.sst, 6) AS strength
            FROM k, g, ssw, sst ORDER BY dow
        """,
        # orders-per-customer frequency spectrum
        "q_fanout_spectrum": """
            WITH pk AS (
                SELECT o_custkey, count(*) AS n_orders
                FROM orders GROUP BY 1)
            SELECT CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM pk GROUP BY 1 ORDER BY 1
        """,
        # CSV roundtrip must equal the source selection
        # (ts as int64 microseconds: the lossless CSV contract)
        "q_csv_roundtrip": """
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
            FROM events ORDER BY event_id
        """,
        # Laplace mechanism with md5-seeded inverse-CDF noise
        "q_dp_counts": """
            WITH c AS (
                SELECT event_type, count(*) AS n
                FROM events GROUP BY 1),
            h AS (
                SELECT event_type, n,
                       (CAST(('0x' || substr(md5(event_type), 1, 8))
                             AS BIGINT) + 0.5) / 4294967296.0 - 0.5
                           AS u
                FROM c)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(n + (-2.0 * sign(u) * ln(1 - 2 * abs(u))),
                         6) AS noisy_n
            FROM h ORDER BY event_type
        """,
        # share-of-parent from exact integer cents
        "q_share_of_parent": """
            WITH c AS (
                SELECT o_orderstatus AS status,
                       o_orderpriority AS priority,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS cents
                FROM orders GROUP BY 1, 2),
            s AS (
                SELECT status, sum(cents) AS scents
                FROM c GROUP BY 1),
            t AS (SELECT sum(cents) AS total FROM c)
            SELECT c.status, c.priority,
                   CAST(c.cents AS BIGINT) AS cents,
                   round(c.cents * 1.0 / s.scents, 6)
                       AS share_of_status,
                   round(s.scents * 1.0 / t.total, 6)
                       AS status_share_of_total
            FROM c JOIN s USING (status), t
            ORDER BY c.status, c.priority
        """,
        # schema-evolution union: old rows (even ids) lack n_chars
        "q_schema_evolve": """
            SELECT doc_id, source, -1 AS n_chars,
                   'old' AS snapshot
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id, source, n_chars, 'new'
            FROM documents WHERE doc_id % 2 = 1
            ORDER BY doc_id
        """,
        # provenance accounting (single-file table -> static basename)
        "q_lineage": """
            SELECT 'documents.parquet' AS file,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM documents WHERE n_chars >= 200
        """,
        # leakage-safe labels: features strictly before the static
        # cutoff, label in the 7-day window after it
        "q_churn_labels": """
            WITH t AS (
                SELECT user_id,
                       CASE WHEN epoch_us(ts) < 1705795200000000
                            THEN 1 ELSE 0 END AS before_f,
                       CASE WHEN epoch_us(ts) < 1705795200000000
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END AS cents,
                       CASE WHEN epoch_us(ts) >= 1705795200000000
                            AND epoch_us(ts) < 1706400000000000
                            AND event_type = 'purchase'
                            THEN 1 ELSE 0 END AS lab
                FROM events),
            a AS (
                SELECT user_id, sum(before_f) AS n_before,
                       sum(cents) AS cents_before,
                       max(lab) AS label
                FROM t GROUP BY 1)
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(n_before AS BIGINT) AS n_before,
                   CAST(cents_before AS BIGINT) AS cents_before,
                   CAST(label AS BIGINT) AS label
            FROM a WHERE n_before > 0 ORDER BY user_id
        """,
        # one-way ANOVA from per-group sufficient stats
        "q_anova": """
            WITH g AS (
                SELECT o_orderpriority AS k, count(*) AS n,
                       sum(o_totalprice) AS s,
                       sum(o_totalprice * o_totalprice) AS ss
                FROM orders GROUP BY 1),
            t AS (
                SELECT count(*) AS k_groups, sum(n) AS nn,
                       sum(s) AS stot, sum(s * s / n) AS sb_part,
                       sum(ss) AS sstot
                FROM g)
            SELECT CAST(k_groups AS BIGINT) AS k_groups,
                   CAST(nn AS BIGINT) AS n,
                   round(((sb_part - stot * stot / nn)
                          / (k_groups - 1))
                         / ((sstot - sb_part) / (nn - k_groups)), 6)
                       AS f_stat,
                   round((sb_part - stot * stot / nn)
                         / ((sb_part - stot * stot / nn)
                            + (sstot - sb_part)), 6) AS eta2
            FROM t
        """,
        # marginal new distinct trigrams per doc-id decile; window
        # cumsum over the first-occurrence histogram
        "q_novelty_curve": """
            WITH toks AS (
                SELECT doc_id, list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents),
            tg AS (
                SELECT DISTINCT doc_id,
                       unnest([ws[g] || ' ' || ws[g+1] || ' '
                               || ws[g+2]
                               for g in range(1, len(ws) - 1)]) AS t
                FROM toks WHERE len(ws) >= 3),
            f AS (SELECT t, min(doc_id) AS first_doc FROM tg
                  GROUP BY 1),
            h AS (
                SELECT CAST(first_doc * 10
                            // (SELECT count(*) FROM documents)
                            AS BIGINT) AS decile,
                       count(*) AS new_grams
                FROM f GROUP BY 1)
            SELECT decile, CAST(new_grams AS BIGINT) AS new_grams,
                   CAST(sum(new_grams) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS cum_grams
            FROM h ORDER BY decile
        """,
        # per-user gap profile; quantile_disc = ceil(q*n)-1 index
        "q_gap_stats": """
            WITH w AS (
                SELECT user_id,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id)
                           - epoch_us(ts) AS dt
                FROM events),
            g AS (SELECT user_id, dt FROM w WHERE dt IS NOT NULL)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(quantile_disc(dt, 0.5) AS BIGINT)
                       AS median_gap_us,
                   CAST(quantile_disc(dt, 0.9) AS BIGINT)
                       AS p90_gap_us
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        # Kruskal-Wallis from the pooled midrank histogram
        "q_kruskal": """
            WITH h AS (
                SELECT o_orderpriority AS k, o_totalprice AS v,
                       count(*) AS c
                FROM orders GROUP BY 1, 2),
            vh AS (SELECT v, sum(c) AS n FROM h GROUP BY 1),
            r AS (
                SELECT v, n,
                       sum(n) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - n
                       + (n + 1) / 2.0 AS rank
                FROM vh),
            g AS (
                SELECT h.k, sum(h.c) AS ni,
                       sum(h.c * r.rank) AS ri
                FROM h JOIN r USING (v) GROUP BY 1),
            t AS (SELECT sum(ni) AS nn FROM g),
            ties AS (SELECT sum(n * n * n - n) AS tt FROM vh)
            SELECT CAST(t.nn AS BIGINT) AS n,
                   CAST((SELECT count(*) FROM g) AS BIGINT)
                       AS k_groups,
                   round(((12.0 / (nn * (nn + 1)))
                          * (SELECT sum(ri * ri / ni) FROM g)
                          - 3 * (nn + 1))
                         / (1 - ties.tt
                            / (nn * nn * nn - nn)), 6) AS h_stat
            FROM t, ties
        """,
        # overlap@k between the two exact-cents rankings
        "q_rank_overlap": """
            WITH a AS (
                SELECT o_custkey,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS spend,
                       count(*) AS n
                FROM orders GROUP BY 1),
            r AS (
                SELECT o_custkey,
                       row_number() OVER (
                           ORDER BY spend DESC, o_custkey) AS r1,
                       row_number() OVER (
                           ORDER BY n DESC, o_custkey) AS r2
                FROM a),
            ks AS (SELECT unnest([5, 10, 20, 50]) AS k)
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(sum(CASE WHEN r1 <= ks.k AND r2 <= ks.k
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS overlap,
                   round(sum(CASE WHEN r1 <= ks.k AND r2 <= ks.k
                                  THEN 1 ELSE 0 END) * 1.0 / ks.k, 6)
                       AS overlap_frac
            FROM r CROSS JOIN ks GROUP BY ks.k ORDER BY ks.k
        """,
        # temperature-scaled mixture weights (tau = 0.7)
        "q_mixture_weights": """
            WITH c AS (
                SELECT source, count(*) AS n
                FROM documents GROUP BY 1),
            t AS (SELECT sum(pow(n, 0.7)) AS z FROM c)
            SELECT source, CAST(n AS BIGINT) AS n,
                   round(pow(n, 0.7) / t.z, 6) AS weight
            FROM c, t ORDER BY source
        """,
        # TPC-H Q3 shape: top-10 open orders by revenue
        "q3_shipping_priority": """
            SELECT o_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < DATE '1998-01-01'
              AND l_shipdate > DATE '1998-01-01'
            GROUP BY 1, 2
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        # TPC-H Q5 shape: local-supplier revenue per ASIA nation, 1996
        "q5_region_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1997-01-01'
            GROUP BY 1
            ORDER BY revenue DESC
        """,
        # TPC-H Q10 shape: returned-item revenue per customer, top 20
        "q10_returned_items": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
                   n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= DATE '1997-10-01'
              AND o_orderdate < DATE '1998-01-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        # TPC-H Q13 shape: customer distribution by order count
        "q13_customer_distribution": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (
                SELECT c_custkey,
                       count(o_orderkey) AS c_count
                FROM customer
                LEFT JOIN orders ON c_custkey = o_custkey
                GROUP BY c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        # TPC-H Q14 shape: promo revenue share for one ship month
        "q14_promo_revenue": """
            SELECT round(
                100.0 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END)
                / sum(l_extendedprice * (1 - l_discount)), 4)
                AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= DATE '1997-09-01'
              AND l_shipdate < DATE '1997-10-01'
        """,
        # TPC-H Q15 shape: max-revenue supplier(s), 1997 Q3
        "q15_top_supplier": """
            WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                       round(sum(l_extendedprice * (1 - l_discount)),
                             2) AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1997-07-01'
                  AND l_shipdate < DATE '1997-10-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue =
                  (SELECT max(total_revenue) FROM revenue)
            ORDER BY s_suppkey
        """,
        # TPC-H Q17 shape: small-quantity avg yearly revenue, Brand#4
        "q17_small_quantity_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#4'
              AND l_quantity < (
                  SELECT 0.2 * avg(l_quantity)
                  FROM lineitem l2
                  WHERE l2.l_partkey = p_partkey)
        """,
        # TPC-H Q18 shape: top-100 orders with sum(quantity) > 300
        "q18_large_orders": """
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                   round(o_totalprice, 2) AS o_totalprice,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey
                HAVING sum(l_quantity) > 300)
            GROUP BY 1, 2, 3, 4, 5
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        # TPC-H Q19 shape: disjunctive brand/size/quantity bands
        "q19_banded_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        # TPC-H Q22 shape: above-average-balance customers idle
        # since 1999, per nation (nationkey as the country code)
        "q22_idle_customers": """
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_acctbal > (
                SELECT avg(c_acctbal) FROM customer
                WHERE c_acctbal > 0.0)
              AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '1999-01-01')
            GROUP BY c_nationkey
            ORDER BY c_nationkey
        """,
        # ABC / Pareto classification of parts by revenue share
        "q_abc_analysis": """
            WITH pr AS (
                SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * 100)
                                AS BIGINT)
                           * (100 - CAST(round(l_discount * 100)
                                         AS BIGINT))) AS val
                FROM lineitem GROUP BY 1),
            tot AS (SELECT sum(val) AS t FROM pr),
            r AS (
                SELECT val,
                       sum(val) OVER (
                           ORDER BY val DESC, l_partkey) AS cum
                FROM pr)
            SELECT CASE WHEN cum * 100 <= t * 80 THEN 'A'
                        WHEN cum * 100 <= t * 95 THEN 'B'
                        ELSE 'C' END AS cls,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(val) AS BIGINT) AS class_val
            FROM r, tot
            GROUP BY 1 ORDER BY 1
        """,
        # worst daily-revenue drop from the running peak
        "q_drawdown": """
            WITH d AS (
                SELECT epoch_us(ts) // 86400000000 AS day,
                       sum(CAST(round(value * 100) AS BIGINT))
                           AS rev
                FROM events GROUP BY 1),
            r AS (
                SELECT rev, max(rev) OVER (ORDER BY day) AS peak
                FROM d)
            SELECT CAST(max(peak - rev) AS BIGINT)
                   AS max_drawdown_cents
            FROM r
        """,
        # DAU/WAU stickiness per day (integer counts, one division)
        "q_stickiness": """
            WITH ud AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events),
            d AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
            w AS (
                SELECT week, count(*) AS wau FROM (
                    SELECT DISTINCT user_id, day // 7 AS week
                    FROM ud) GROUP BY 1)
            SELECT day, CAST(dau AS BIGINT) AS dau,
                   CAST(wau AS BIGINT) AS wau,
                   round(dau * 1.0 / wau, 6) AS stickiness
            FROM d JOIN w ON d.day // 7 = w.week
            ORDER BY day
        """,
        # order-date -> first-shipment lag histogram (integer days)
        "q_fill_lag": """
            WITH f AS (
                SELECT l_orderkey,
                       min(epoch_us(l_shipdate)) AS ship_us
                FROM lineitem GROUP BY 1)
            SELECT (ship_us - epoch_us(o_orderdate))
                   // 86400000000 AS lag_days,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders JOIN f ON o_orderkey = l_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        # per-source duplicated-character share (exact integers)
        "q_dup_char_share": """
            WITH s AS (
                SELECT md5(text) AS digest, source, n_chars
                FROM documents),
            g AS (SELECT digest, count(*) AS gsize
                  FROM s GROUP BY 1)
            SELECT source,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(CASE WHEN gsize >= 2 THEN n_chars
                            ELSE 0 END) AS BIGINT) AS dup_chars,
                   round(sum(CASE WHEN gsize >= 2 THEN n_chars
                             ELSE 0 END) * 1.0 / sum(n_chars), 6)
                       AS dup_share
            FROM s JOIN g USING (digest)
            GROUP BY 1 ORDER BY 1
        """,
        # linear multi-touch attribution credit spectrum
        "q_linear_attribution": """
            WITH t AS (
                SELECT user_id, event_id, event_type,
                       epoch_us(ts) AS ts
                FROM events WHERE event_type <> 'purchase'),
            p AS (
                SELECT user_id, event_id, epoch_us(ts) AS ts
                FROM events WHERE event_type = 'purchase'),
            pr AS (
                SELECT t.event_type, t.event_id AS tid,
                       p.event_id AS pid
                FROM t JOIN p ON t.user_id = p.user_id
                           AND p.ts - t.ts > 0
                           AND p.ts - t.ts <= 3600000000),
            k AS (SELECT pid, count(*) AS k FROM pr GROUP BY 1)
            SELECT event_type, CAST(k AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_touches,
                   round(count(*) * 1.0 / k, 6) AS credit
            FROM pr JOIN k USING (pid)
            GROUP BY event_type, k ORDER BY 1, 2
        """,
        # return rate per part brand (integer counts, one division)
        "q_return_rate": """
            SELECT p_brand,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CASE WHEN l_returnflag = 'R'
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_returned,
                   round(sum(CASE WHEN l_returnflag = 'R'
                             THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                       AS return_rate
            FROM lineitem JOIN part ON p_partkey = l_partkey
            GROUP BY 1 ORDER BY 1
        """,
        # association-rule support/confidence/lift over user baskets
        "q_basket_lift": """
            WITH ut AS (
                SELECT DISTINCT user_id, event_type FROM events),
            s AS (SELECT event_type, count(*) AS n
                  FROM ut GROUP BY 1),
            nb AS (SELECT count(DISTINCT user_id) AS n FROM ut),
            p AS (
                SELECT l.event_type AS a, r.event_type AS b,
                       count(*) AS n_ab
                FROM ut l
                JOIN ut r ON l.user_id = r.user_id
                         AND l.event_type < r.event_type
                GROUP BY 1, 2)
            SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
                   round(n_ab * 1.0 / nb.n, 6) AS support,
                   round(n_ab * 1.0 / sa.n, 6) AS confidence,
                   round(nb.n * n_ab * 1.0 / (sa.n * sb.n), 6)
                       AS lift
            FROM p
            CROSS JOIN nb
            JOIN s sa ON sa.event_type = p.a
            JOIN s sb ON sb.event_type = p.b
            ORDER BY a, b
        """,
        # event value by user tenure week (exact integer cents)
        "q_tenure_value": """
            WITH s AS (
                SELECT user_id, epoch_us(ts) AS t,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
            f AS (SELECT user_id, min(t) AS t0 FROM s GROUP BY 1)
            SELECT (t - t0) // 604800000000 AS tenure_week,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS rev_cents
            FROM s JOIN f USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        # first-view -> first-purchase lag histogram (integer us)
        "q_conversion_lag": """
            WITH v AS (
                SELECT user_id, min(epoch_us(ts)) AS t
                FROM events WHERE event_type = 'view' GROUP BY 1),
            p AS (
                SELECT user_id, min(epoch_us(ts)) AS t
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1)
            SELECT (p.t - v.t) // 3600000000 AS lag_hours,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM v JOIN p USING (user_id)
            WHERE p.t >= v.t
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q11 shape: parts above 0.1% of nation stock value
        "q11_important_parts": """
            WITH pv AS (
                SELECT s_nationkey AS nk, l_partkey,
                       sum(CAST(round(l_extendedprice * 100)
                                AS BIGINT)
                           * (100 - CAST(round(l_discount * 100)
                                         AS BIGINT))) AS val
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                GROUP BY 1, 2),
            nt AS (SELECT nk, sum(val) AS tot FROM pv GROUP BY 1)
            SELECT CAST(nk AS BIGINT) AS s_nationkey, l_partkey,
                   ((val + 50) // 100) / 100.0 AS value
            FROM pv JOIN nt USING (nk)
            WHERE 1000 * val > tot
            ORDER BY 1, 2
        """,
        # TPC-H Q20 shape: suppliers with >50% recent gear shipments
        "q20_recent_suppliers": """
            SELECT l_suppkey AS s_suppkey, s_name,
                   round(sum(l_quantity), 2) AS total_qty,
                   round(sum(CASE WHEN l_shipdate >=
                             DATE '1999-01-01'
                             THEN l_quantity ELSE 0 END), 2)
                       AS recent_qty
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2
            HAVING sum(CASE WHEN l_shipdate >= DATE '1999-01-01'
                       THEN l_quantity ELSE 0 END)
                   > 0.5 * sum(l_quantity)
            ORDER BY 1
        """,
        # TPC-H Q21 shape: sole-late suppliers on shared orders
        "q21_waiting_suppliers": """
            WITH ls AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate >
                           o_orderdate + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1, 2),
            os AS (
                SELECT l_orderkey, count(*) AS n_supp,
                       sum(late) AS n_late
                FROM ls GROUP BY 1)
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM ls
            JOIN os USING (l_orderkey)
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE late = 1 AND n_late = 1 AND n_supp >= 2
            GROUP BY 1
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        # TPC-H Q2 shape: min observed unit price per brand part
        "q2_min_cost_supplier": """
            WITH unit AS (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS u
                FROM lineitem GROUP BY 1, 2),
            best AS (SELECT l_partkey, min(u) AS mu
                     FROM unit GROUP BY 1)
            SELECT l_partkey AS p_partkey,
                   l_suppkey AS s_suppkey, s_name,
                   round(u, 4) AS unit_price
            FROM unit
            JOIN best USING (l_partkey)
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE u = mu AND p_brand = 'Brand#7'
            ORDER BY 1, 2
        """,
        # TPC-H Q4 shape: EXISTS late lineitem per priority
        "q4_priority_check": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= DATE '1997-01-01'
              AND o_orderdate < DATE '1997-04-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q8 shape: NATION_3 market share in its own region
        "q8_market_share": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(CASE WHEN sn.n_name = 'NATION_3'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)),
                         6) AS mkt_share
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE r_name = (
                SELECT r_name FROM region
                JOIN nation ON n_regionkey = r_regionkey
                WHERE n_name = 'NATION_3')
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q9 shape: part-family profit by supplier nation/year
        "q9_product_profit": """
            SELECT sn.n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity), 2)
                       AS profit
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE p_name LIKE '%gear%'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # TPC-H Q7 shape: bilateral trade volume by ship year
        "q7_volume_shipping": """
            SELECT sn.n_name AS supp_nation,
                   cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
                OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
              AND l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        # TPC-H Q12 shape: late lineitems by order year, CASE counts
        "q12_late_priority": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q16 shape: distinct suppliers per (brand, size)
        "q16_supplier_diversity": """
            SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#4'
              AND p_size IN (1, 5, 9, 13, 17)
            GROUP BY 1, 2
            ORDER BY supplier_cnt DESC, p_brand, p_size
        """,
        # interval x interval overlap join, exact integer us
        "q_interval_join": """
            WITH l AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + ((event_id % 7200) + 60) * 1000000 AS e
                FROM events WHERE event_id % 2 = 0),
            r AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts)
                       + ((event_id % 5400) + 120) * 1000000 AS e
                FROM events WHERE event_id % 2 = 1)
            SELECT l.user_id,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(least(l.e, r.e) - greatest(l.s, r.s))
                        AS BIGINT) AS overlap_us
            FROM l JOIN r ON l.user_id = r.user_id
                         AND l.s < r.e AND r.s < l.e
            GROUP BY 1 ORDER BY 1
        """,
        # weekly cohort x offset retention matrix
        "q_cohort_retention": """
            WITH wk AS (
                SELECT user_id,
                       epoch_us(ts) // 604800000000 AS week
                FROM events),
            f AS (SELECT user_id, min(week) AS cohort_week
                  FROM wk GROUP BY 1),
            a AS (SELECT DISTINCT user_id, week FROM wk)
            SELECT cohort_week,
                   week - cohort_week AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # RFM quartile census; monetary in exact integer cents so the
        # per-user sum is order-invariant on both engines
        "q_rfm": """
            WITH per_user AS (
                SELECT user_id,
                       max(epoch_us(ts)) AS recency_us,
                       count(*) AS frequency,
                       sum(CAST(round(value * 100) AS BIGINT))
                           AS monetary_cents
                FROM events GROUP BY 1),
            q AS (
                SELECT ntile(4) OVER (ORDER BY recency_us, user_id)
                           AS r_q,
                       ntile(4) OVER (ORDER BY frequency, user_id)
                           AS f_q,
                       ntile(4) OVER (ORDER BY monetary_cents, user_id)
                           AS m_q
                FROM per_user)
            SELECT CAST(r_q AS BIGINT) AS r_q,
                   CAST(f_q AS BIGINT) AS f_q,
                   CAST(m_q AS BIGINT) AS m_q,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # per-user cumulative distinct event types by day
        "q_types_to_date": """
            WITH d AS (
                SELECT user_id, event_type,
                       epoch_us(ts) // 86400000000 AS day
                FROM events),
            f AS (SELECT user_id, event_type, min(day) AS first_day
                  FROM d GROUP BY 1, 2),
            h AS (SELECT user_id, first_day AS day,
                         count(*) AS n_new
                  FROM f GROUP BY 1, 2)
            SELECT user_id, day,
                   CAST(sum(n_new) OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS BIGINT) AS types_to_date
            FROM h ORDER BY user_id, day
        """,
        # every-997th-row systematic sample in global (ts, id) order
        "q_systematic_sample": """
            WITH n AS (
                SELECT event_id, user_id,
                       row_number() OVER (ORDER BY ts, event_id) AS rn
                FROM events)
            SELECT rn, event_id, user_id
            FROM n WHERE rn % 997 = 0 ORDER BY rn
        """,
        # dense_rank over the heavily-duplicated quantity domain
        "q_dense_rank": """
            WITH h AS (
                SELECT l_returnflag, l_linestatus, l_quantity,
                       count(*) AS n
                FROM lineitem GROUP BY 1, 2, 3)
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CAST(n AS BIGINT) AS n,
                   CAST(dense_rank() OVER (
                       PARTITION BY l_returnflag, l_linestatus
                       ORDER BY l_quantity
                   ) AS BIGINT) AS rnk
            FROM h ORDER BY 1, 2, 3
        """,
        # Mann-Whitney U, tie-corrected z, from the pooled midrank
        # histogram (exact half-integer ranks on both engines)
        "q_mannwhitney": """
            WITH s AS (
                SELECT event_type AS g, value AS v FROM events
                WHERE event_type IN ('click', 'purchase')),
            h AS (SELECT g, v, count(*) AS c FROM s GROUP BY 1, 2),
            vh AS (SELECT v, sum(c) AS cnt FROM h GROUP BY 1),
            rk AS (
                SELECT v, cnt,
                       coalesce(sum(cnt) OVER (
                           ORDER BY v ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0)
                       + (cnt + 1) / 2.0 AS rank
                FROM vh),
            agg AS (
                SELECT h.g, sum(h.c) AS n,
                       sum(h.c * rk.rank) AS rsum
                FROM h JOIN rk ON h.v = rk.v GROUP BY 1),
            t AS (SELECT sum(cnt*cnt*cnt - cnt) AS tt,
                         sum(cnt) AS nn FROM vh),
            f AS (
                SELECT (SELECT n FROM agg WHERE g = 'click') AS n_a,
                       (SELECT n FROM agg WHERE g = 'purchase') AS n_b,
                       (SELECT rsum FROM agg WHERE g = 'click') AS r_a,
                       tt, nn
                FROM t)
            SELECT CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   r_a - n_a * (n_a + 1) / 2.0 AS u_a,
                   round((r_a - n_a * (n_a + 1) / 2.0
                          - n_a * n_b / 2.0)
                         / sqrt(n_a * n_b / 12.0
                                * ((nn + 1) - tt / (nn * (nn - 1)))),
                         6) AS z
            FROM f
        """,
        # ln(freq) ~ ln(rank) OLS slope over the top-1000 unigrams
        "q_zipf_slope": """
            WITH toks AS (
                SELECT unnest(list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '')) AS w
                FROM documents),
            wc AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
            top AS (
                SELECT n, row_number() OVER (ORDER BY n DESC, w) AS r
                FROM wc ORDER BY n DESC, w LIMIT 1000)
            SELECT CAST(count(*) AS BIGINT) AS n_words,
                   round(regr_slope(ln(n), ln(r)), 6) AS zipf_slope
            FROM top
        """,
        # HHI revenue concentration per nation (exact-cents shares)
        "q_hhi": """
            WITH pc AS (
                SELECT c_custkey, c_nationkey,
                       sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS r
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY 1, 2)
            SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
                   round(sum(CAST(r AS DOUBLE) * CAST(r AS DOUBLE))
                         / (sum(r) * sum(r)), 6) AS hhi
            FROM pc JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        # per-user NDCG@10, value-ranked feed vs type-graded relevance
        "q_ndcg": """
            WITH ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY value DESC, event_id) AS pos
                FROM events),
            top AS (
                SELECT user_id, pos,
                       CASE event_type
                           WHEN 'purchase' THEN 3
                           WHEN 'signup' THEN 2
                           WHEN 'click' THEN 1
                           ELSE 0 END AS rel
                FROM ranked WHERE pos <= 10),
            ideal AS (
                SELECT user_id, rel,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY rel DESC) AS ipos
                FROM top),
            d AS (SELECT user_id, sum(rel / log2(pos + 1.0)) AS dcg
                  FROM top GROUP BY 1),
            i AS (SELECT user_id, sum(rel / log2(ipos + 1.0)) AS idcg
                  FROM ideal GROUP BY 1)
            SELECT d.user_id, round(dcg / idcg, 6) AS ndcg
            FROM d JOIN i USING (user_id)
            WHERE idcg > 0 ORDER BY d.user_id
        """,
        # per-dimension embedding mean/std (zip-unnest twin)
        "q_embed_dim_stats": """
            SELECT dim, round(avg(v), 6) AS mean_v,
                   round(stddev_pop(v), 6) AS std_v
            FROM (
                SELECT unnest(CAST(embedding AS DOUBLE[])) AS v,
                       unnest(range(1, len(embedding) + 1)) AS dim
                FROM embeddings)
            GROUP BY 1 ORDER BY 1
        """,
        # Tukey-fence outlier census per event type (exact-cents
        # quantile_disc fences)
        "q_iqr_outliers": """
            WITH c AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
            q AS (
                SELECT event_type,
                       quantile_disc(cents, 0.25) AS q1,
                       quantile_disc(cents, 0.75) AS q3
                FROM c GROUP BY 1)
            SELECT c.event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN c.cents < q1 - 1.5 * (q3 - q1)
                                   OR c.cents > q3 + 1.5 * (q3 - q1)
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_outliers,
                   CAST(q1 AS BIGINT) AS q_025,
                   CAST(q3 AS BIGINT) AS q_075
            FROM c JOIN q USING (event_type)
            GROUP BY 1, q1, q3 ORDER BY 1
        """,
        # Lorenz curve points over exact-NTILE spend deciles
        "q_lorenz": """
            WITH pu AS (
                SELECT user_id,
                       sum(CAST(round(value * 100) AS BIGINT))
                           AS spend
                FROM events GROUP BY 1),
            t AS (
                SELECT spend,
                       ntile(10) OVER (ORDER BY spend, user_id)
                           AS decile
                FROM pu),
            d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
                         sum(spend) AS spend
                  FROM t GROUP BY 1)
            SELECT CAST(decile AS BIGINT) AS decile, n_users,
                   CAST(spend AS BIGINT) AS spend,
                   round(CAST(sum(spend) OVER (ORDER BY decile)
                              AS DOUBLE)
                         / (SELECT sum(spend) FROM d), 6)
                       AS cum_share
            FROM d ORDER BY decile
        """,
        # per-node local clustering coefficient, cosine>=0.3 graph
        "q_clustering_coeff": """
            WITH p AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= 0.3),
            tri AS (
                SELECT e1.u AS x, e1.v AS y, e2.v AS z
                FROM p e1
                JOIN p e2 ON e2.u = e1.u AND e2.v > e1.v
                JOIN p e3 ON e3.u = e1.v AND e3.v = e2.v),
            pern AS (
                SELECT node, count(*) AS t FROM (
                    SELECT x AS node FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri)
                GROUP BY 1),
            deg AS (
                SELECT node, count(*) AS d FROM (
                    SELECT u AS node FROM p
                    UNION ALL SELECT v FROM p)
                GROUP BY 1)
            SELECT deg.node, CAST(d AS BIGINT) AS d,
                   CAST(coalesce(t, 0) AS BIGINT) AS t,
                   round(CASE WHEN d >= 2
                              THEN 2.0 * coalesce(t, 0)
                                   / (d * (d - 1))
                              ELSE 0 END, 6) AS coeff
            FROM deg LEFT JOIN pern USING (node)
            ORDER BY deg.node
        """,
        # per-source exact-dup diagnostics (shared md5 identity)
        "q_dup_rate_by_source": """
            WITH d AS (
                SELECT source, md5(text) AS h, count(*) AS n
                FROM documents GROUP BY 1, 2)
            SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   round(1.0 - count(*) * 1.0 / sum(n), 6)
                       AS dup_rate
            FROM d GROUP BY 1 ORDER BY 1
        """,
        # contents histogrammed by how many sources carry them
        "q_cross_source_overlap": """
            WITH p AS (
                SELECT md5(text) AS h, source FROM documents
                GROUP BY 1, 2),
            s AS (SELECT h, count(*) AS n_sources FROM p GROUP BY 1)
            SELECT CAST(n_sources AS BIGINT) AS n_sources,
                   CAST(count(*) AS BIGINT) AS n_contents
            FROM s GROUP BY 1 ORDER BY 1
        """,
        # Gopher-style rule funnel census
        "q_filter_funnel": """
            WITH t AS (
                SELECT n_chars,
                       len(list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '')) AS n_tok
                FROM documents),
            r AS (
                SELECT (n_tok < 30) AS too_short,
                       (n_chars > 350) AS too_long,
                       ((CASE WHEN n_tok > 0
                              THEN n_chars * 1.0 / n_tok
                              ELSE 0 END) < 3.0
                        OR (CASE WHEN n_tok > 0
                                 THEN n_chars * 1.0 / n_tok
                                 ELSE 0 END) > 8.0) AS odd_words
                FROM t)
            SELECT rule, CAST(n AS BIGINT) AS n FROM (
                SELECT 'too_short' AS rule,
                       sum(CASE WHEN too_short THEN 1 ELSE 0 END) AS n
                FROM r
                UNION ALL
                SELECT 'too_long',
                       sum(CASE WHEN too_long THEN 1 ELSE 0 END)
                FROM r
                UNION ALL
                SELECT 'odd_words',
                       sum(CASE WHEN odd_words THEN 1 ELSE 0 END)
                FROM r
                UNION ALL
                SELECT 'survivors',
                       sum(CASE WHEN NOT (too_short OR too_long
                                          OR odd_words)
                                THEN 1 ELSE 0 END)
                FROM r)
            ORDER BY rule
        """,
        # distinct-bigram / total-bigram ratio per source
        "q_source_diversity": """
            WITH toks AS (
                SELECT source, list_filter(regexp_split_to_array(
                           lower(coalesce(text, '')), '[ \t\n\f\r]+'),
                           x -> x <> '') AS ws
                FROM documents),
            bg AS (
                SELECT source,
                       unnest([ws[g] || ' ' || ws[g+1]
                               for g in range(1, len(ws))]) AS bigram
                FROM toks WHERE len(ws) >= 2),
            pg AS (SELECT source, bigram, count(*) AS n
                   FROM bg GROUP BY 1, 2)
            SELECT source, CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(n) AS BIGINT) AS n_total,
                   round(count(*) * 1.0 / sum(n), 6) AS diversity
            FROM pg GROUP BY 1 ORDER BY 1
        """,
        # week-over-week revenue change per type (consecutive weeks)
        "q_wow_change": """
            WITH w AS (
                SELECT event_type,
                       epoch_us(ts) // 604800000000 AS week,
                       CAST(sum(CAST(round(value * 100) AS BIGINT))
                            AS BIGINT) AS rev_cents
                FROM events GROUP BY 1, 2),
            l AS (
                SELECT event_type, week, rev_cents,
                       lag(week) OVER (PARTITION BY event_type
                                       ORDER BY week) AS pw,
                       lag(rev_cents) OVER (PARTITION BY event_type
                                            ORDER BY week) AS pr
                FROM w)
            SELECT event_type, week, rev_cents,
                   round((rev_cents - pr) * 1.0 / pr, 6) AS wow_pct
            FROM l WHERE pw = week - 1
            ORDER BY event_type, week
        """,
        # islands per user via lag over distinct active days
        "q_gap_islands": """
            WITH d AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events),
            l AS (
                SELECT user_id, day,
                       lag(day) OVER (PARTITION BY user_id
                                      ORDER BY day) AS pd
                FROM d)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(CASE WHEN pd IS NULL OR day - pd > 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_islands
            FROM l GROUP BY 1 ORDER BY 1
        """,
        # argmax hour-of-day per event type
        "q_peak_hour": """
            WITH h AS (
                SELECT event_type,
                       (epoch_us(ts) // 3600000000) % 24 AS hour,
                       count(*) AS n
                FROM events GROUP BY 1, 2)
            SELECT event_type, CAST(hour AS BIGINT) AS peak_hour,
                   CAST(n AS BIGINT) AS n
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY event_type
                      ORDER BY n DESC, hour) AS rn
                  FROM h)
            WHERE rn = 1 ORDER BY event_type
        """,
        # two-phase runtime filter: top-20 parts by revenue, re-scan
        "q_runtime_filter": """
            WITH c AS (
                SELECT l_partkey, l_quantity,
                       CAST(floor(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT) AS cents
                FROM lineitem),
            top AS (
                SELECT l_partkey FROM c GROUP BY 1
                ORDER BY sum(cents) DESC, l_partkey LIMIT 20)
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS rev_cents,
                   round(avg(l_quantity), 6) AS avg_qty
            FROM c WHERE l_partkey IN (SELECT l_partkey FROM top)
            GROUP BY 1 ORDER BY 1
        """,
        # 5-NN majority label vote for the vec_id<4 queries
        "q_knn_classify": """
            WITH q AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 4),
            scored AS (
                SELECT q.query_id, e.vec_id, e.label,
                       round(CAST(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qe)
                           AS DOUBLE), 6) AS cosine
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id),
            top AS (
                SELECT query_id, label FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY cosine DESC, vec_id) AS rn
                    FROM scored)
                WHERE rn <= 5),
            votes AS (
                SELECT query_id, label, count(*) AS v
                FROM top GROUP BY 1, 2)
            SELECT query_id, CAST(label AS BIGINT) AS pred_label,
                   CAST(v AS BIGINT) AS votes
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY v DESC, label) AS rn
                  FROM votes)
            WHERE rn = 1 ORDER BY query_id
        """,
        # INTERSECT / EXCEPT / UNION census over two user sets
        "q_set_ops": """
            WITH f AS (
                SELECT user_id,
                       max(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS c,
                       max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS p
                FROM events GROUP BY 1)
            SELECT CAST(sum(CASE WHEN c = 1 AND p = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_both,
                   CAST(sum(CASE WHEN c = 1 AND p = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_click_only,
                   CAST(sum(CASE WHEN c = 0 AND p = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_purchase_only,
                   CAST(sum(CASE WHEN c = 1 OR p = 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_union
            FROM f
        """,
        # first-5-events journey path census
        "q_user_journey": """
            WITH r AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                           AS rn
                FROM events),
            p AS (
                SELECT user_id,
                       string_agg(event_type, '>' ORDER BY rn)
                           AS path
                FROM r WHERE rn <= 5 GROUP BY 1)
            SELECT path, CAST(count(*) AS BIGINT) AS n_users
            FROM p GROUP BY 1 ORDER BY 1
        """,
        # purchase-only daily rollup (the Ray side reads just the
        # event_type=purchase hive partition)
        "q_partition_prune": """
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY 1
        """,
        # q_sssp: iterative Bellman-Ford fixpoint -> rows-only with a
        # Dijkstra parity pytest (test_sssp_matches_dijkstra).
        # q_markov_stationary: power-iteration fixpoint -> rows-only
        # with a pi P = pi eigen-identity pytest.
        # q_compress_ratio: zlib has no SQL twin -> rows-only with an
        # ordering pytest (repetitive docs compress below prose).
        # q_communities: iterative LPA fixpoint -> rows-only with a
        # deterministic-rule parity pytest.
        # q_ols_multi: float Gram-partial fold (summation-order noise)
        # -> rows-only with a numpy lstsq parity pytest.
        # q_minhash_dedup / q_simhash / q_knn_ivf / q_hll_users /
        # q_quantile_sketch / q_group_quantile_sketch /
        # q_embed_neardup_ann: heuristic, sketch-based or multi-stage
        # pipelines with no faithful single-statement SQL twin ->
        # rows-only checks (each has a pytest bound or parity test).
    }
