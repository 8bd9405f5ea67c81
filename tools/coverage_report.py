"""Generate COVERAGE.md: SURVEY.md §2B operator families → registered
queries with their oracle status.

Usage: python tools/coverage_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES: list[tuple[str, tuple[str, ...]]] = [
    ("Scans / sources / sinks", ("staging_all_varchar", "file_provenance", "json_file_scan", "orc_file_scan", "xml_file_scan", "partition_path_derivation", "metadata_value_synthesis", "layout_zorder_key", "ingest_pipeline_run", "join_bucketed_colocated", "layout_partition_prune_dpp")),
    ("Projection / filter / predicates", ("filter_null_safe_eq", "project_rename_cast", "filter_point_lookup", "filter_like_prefix", "filter_in_set", "filter_null_predicates", "filter_range_between", "distinct_values")),
    ("Joins", ("join_inner_fact", "join_left_outer", "join_right_outer", "join_full_outer", "join_semi", "join_anti", "join_cross", "join_range_theta", "join_asof", "join_broadcast_star", "join_multiway_star", "join_skew_salted", "join_interval_overlap", "join_bloom_prefilter", "join_asof_nearest", "join_strategy_hints")),
    ("Aggregation", ("agg_grouped_basic", "agg_global", "agg_filtered_conditional", "agg_approx_distinct", "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_having", "agg_collect_sorted", "agg_argmax", "agg_percentiles", "agg_stats_moments", "agg_hll_sketch_union", "agg_salted_hotkey", "agg_median", "agg_listagg", "agg_bitmap_distinct", "agg_rollup_grouping_id", "agg_bitwise", "agg_histogram_bins", "agg_regression_family", "agg_approx_quantile", "agg_mode_deterministic", "agg_logspace_means", "agg_weighted_median", "agg_approx_topk")),
    ("Window functions", ("window_rank_family", "window_lag_lead", "window_first_last", "window_running_sum", "window_moving_avg", "window_range_frame", "window_distribution_funcs", "window_topk_per_group", "window_running_distinct", "window_pareto_share", "window_ewma_bounded", "window_running_distinct_approx")),
    ("Sort / limit / top-k", ("sort_multikey_nulls", "limit_topn", "limit_offset_page")),
    ("Set operations", ("setop_union_all", "setop_union_distinct", "setop_intersect", "setop_except", "setop_except_all", "setop_intersect_all", "setop_union_schema_evolution")),
    ("Scalar functions", ("scalar_string_funcs", "scalar_date_funcs", "scalar_math_funcs", "scalar_conditional", "scalar_regex_funcs", "scalar_collation_filter", "scalar_try_arith", "scalar_url_funcs", "scalar_hash_funcs")),
    ("Array / map / JSON", ("array_funcs_basic", "array_higher_order", "array_explode_agg", "array_zip_construct", "array_explode_outer_nulls", "json_extract_props", "json_to_map", "json_variant_extract", "map_funcs_explode")),
    ("Pivot / subqueries", ("pivot_status_by_priority", "unpivot_status_counts", "subquery_exists", "subquery_scalar", "lateral_topk_per_group")),
    ("Headline analytics (TPC-H-shaped)", ("q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority", "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue", "q7_nation_trade_volume", "q8_market_share", "q9_product_profit", "q10_returned_items", "q11_important_parts", "q12_late_line_priority", "q13_order_distribution", "q14_promo_revenue", "q15_top_supplier", "q16_part_supplier_variety", "q17_small_qty_revenue", "q18_large_orders", "q19_disjunctive_filter", "q20_excess_shipments", "q21_waiting_supplier", "q22_sales_opportunity", "analytics_skyline_2d", "analytics_market_basket", "analytics_rfm_segmentation", "analytics_period_over_period")),
    ("Warehouse maintenance", ("scd2_user_state", "warehouse_recursive_calendar", "warehouse_incremental_agg", "model_pipeline_build", "warehouse_snapshot_diff", "warehouse_point_in_time_join", "warehouse_merge_upsert")),
    ("Behavioral / event-sequence analytics", ("behavior_sessionize", "behavior_funnel", "behavior_retention", "behavior_path_trigrams", "behavior_daily_ma7", "timeseries_gapfill_ffill", "behavior_burst_detect", "behavior_ab_test", "timeseries_downsample_ohlc", "behavior_attribution_last_touch", "timeseries_repeat_interval", "behavior_markov_transition", "timeseries_gap_fill_locf", "timeseries_resample_interp", "behavior_event_regex")),
    ("Streaming", ("stream_tumbling_window_agg", "stream_sliding_window_agg", "stream_session_window_agg", "stream_dedup_keys", "stream_stateful_user_rollup", "stream_transform_with_state", "stream_stream_join", "stream_static_enrich", "stream_dedup_within_watermark", "stream_windowed_topk", "stream_incremental_upsert")),
    ("UDF / UDAF / UDTF", ("udf_pandas_scalar", "udaf_grouped_pandas", "udtf_text_chunks", "udf_sql_scalar", "sql_scripting_iterative", "udf_arrow_batch", "udaf_arrow_grouped", "udf_cogrouped_asof")),
    ("Deduplication", ("dedup_exact", "dedup_normalized", "dedup_minhash_candidates", "dedup_simhash", "dedup_jaccard_blocked", "dedup_ngram_jaccard", "dedup_embedding_cosine", "dedup_connected_components", "dedup_semantic_prune", "dedup_url_canonical", "dedup_levenshtein_blocked", "dedup_incremental_against_corpus", "dedup_cluster_canonical")),
    ("Similarity search", ("knn_bruteforce_cosine", "similarity_pairs_threshold", "ann_ivf_search", "ann_lsh_bucketed", "ann_pq_search", "ann_hamming_binarized", "retrieval_rrf_fusion", "embed_label_centroids", "embed_quantize_int8", "embed_covariance_block", "embed_pca_power", "ann_topk_multiquery", "embed_prefix_topk_overlap")),
    ("Text analysis", ("text_token_stats", "text_quality_score", "text_lang_guess", "text_bpe_token_count", "text_fingerprint", "text_heavy_hitters", "text_pii_redact", "text_edit_distance", "text_tfidf_top_terms", "text_repetition_filter", "text_ngram_novelty", "text_lm_surprisal", "text_zipf_fit", "text_domain_blocklist", "text_quality_classifier", "text_bm25_retrieval")),
    ("Multimodal columns", ("multimodal_image_meta", "multimodal_frame_sample", "multimodal_audio_energy", "multimodal_resize_blockmean", "multimodal_feature_histogram", "multimodal_phash_dedup", "multimodal_wav_decode", "multimodal_bmp_decode", "multimodal_wav_features", "multimodal_png_decode", "multimodal_jpeg_decode", "multimodal_gif_decode", "multimodal_avi_mjpeg_decode", "multimodal_mp3_frame_walk", "multimodal_h264_nal_walk", "multimodal_h264_ipcm_decode", "multimodal_avi_av_demux", "multimodal_mp3_maindata_decode", "multimodal_h264_gop_decode", "multimodal_png_adam7_decode", "multimodal_gif_anim_decode", "multimodal_tiff_decode", "multimodal_flac_decode", "multimodal_bmp_rle8_decode", "multimodal_flac_stereo_decode", "multimodal_flac_vbs_decode", "multimodal_mp3_short_block_decode", "multimodal_bmp_rle4_decode", "multimodal_gif_lct_decode", "multimodal_gif_disposal_decode", "multimodal_png_palette_decode", "multimodal_png_colortypes_decode", "multimodal_wav_extended_decode", "multimodal_h264_inter_decode", "multimodal_mp3_hufftables_decode", "multimodal_mp3_wswitch_regions_decode", "multimodal_mp3_mixed_block_decode", "multimodal_jpeg_progressive_decode", "multimodal_jpeg_color_decode", "multimodal_h264_cavlc_decode", "multimodal_mp3_b8_regions_decode", "multimodal_ogg_opus_walk", "multimodal_webm_ebml_walk", "multimodal_mp4_box_walk", "multimodal_aac_adts_walk", "multimodal_jpeg_exif_meta", "multimodal_mp3_imdct_synth", "multimodal_mp3_requant_exact", "multimodal_mp3_requant_short", "multimodal_mp3_requant_ms_stereo", "multimodal_h264_multiref_decode", "multimodal_h264_bframe_decode", "multimodal_webp_vp8l_decode", "multimodal_mp3_id3_tags", "multimodal_webp_vp8l_transform_decode", "multimodal_h264_weighted_decode", "multimodal_mp3_requant_is_stereo", "multimodal_heif_box_walk", "multimodal_gif_interlaced_decode", "multimodal_wav_g711_decode", "multimodal_mp3_id3v1_tags", "multimodal_mp3_linbits_decode", "multimodal_h264_p8x8_decode", "multimodal_h264_tdirect_decode", "multimodal_jpeg_prog_restart_decode", "multimodal_mp3_requant_wide", "multimodal_mp3_requant_escape", "multimodal_h264_fracpel_decode", "multimodal_h264_submb_decode", "multimodal_jpeg_color_restart_decode", "multimodal_mp4_frag_flags_walk", "multimodal_h264_chroma_decode", "multimodal_h264_bpixel_decode", "multimodal_h264_wpixel_decode", "multimodal_h264_dpixel_decode")),
    ("Training-data pipeline", ("datapipe_split_assign", "datapipe_stratified_sample", "datapipe_pack_chunks", "datapipe_pack_greedy", "datapipe_shard_balance", "datapipe_global_shuffle", "datapipe_contamination", "datapipe_vocab_build", "datapipe_domain_mix", "datapipe_leakage_safe_split", "datapipe_corpus_pipeline", "datapipe_domain_quota", "datapipe_weighted_sample", "datapipe_curriculum_phases", "datapipe_c4_filter_cascade", "datapipe_cap_per_source", "datapipe_contamination_ngram", "datapipe_epoch_mixture", "datapipe_bpe_merge_step", "datapipe_bpe_tokenize", "datapipe_quality_percentile_filter", "datapipe_boilerplate_prune", "datapipe_dsir_importance", "datapipe_warc_extract", "datapipe_zip_extract", "datapipe_tar_extract", "datapipe_tfrecord_scan", "datapipe_avro_scan", "datapipe_avro_evolution_scan", "datapipe_gzip_jsonl_scan", "datapipe_pdf_text_extract", "datapipe_subtitle_extract", "datapipe_zstd_scan", "datapipe_zstd_dict_scan", "datapipe_lz4_scan", "datapipe_sliding_chunks")),
    ("Graph analytics", ("graph_pagerank", "graph_triangle_count", "graph_degree_distribution")),
    ("Data quality", ("dq_single_pass_suite", "dq_uniqueness_check", "dq_referential_integrity", "dq_outlier_zscore", "dq_freshness_check", "dq_outlier_mad", "dq_distribution_drift", "dq_benford_first_digit", "dq_anomaly_seasonal", "dq_profile_table", "dq_cross_field_consistency")),
]

LIBRARY_SURFACES = """
## Library surfaces (driven by tests, no query-registry entry)

| Capability | Module | Test |
|---|---|---|
| CSV staging, two-tier schema resolution, all-varchar external views | `ingest/staging.py` | `tests/test_ingestion.py` |
| Key-value metadata store (point lookup / upsert) | `ingest/metadata.py` | `tests/test_ingestion.py` |
| Full ingestion DAG (sense → partition → land → stage) | `ingest/pipeline.py` | `tests/test_ingestion.py` |
| Continuous CSV → partitioned parquet (streaming ingestion) | `streaming/pipelines.py` | `tests/test_streaming_pipeline.py` |
| Incremental foreachBatch partition upsert (exactly-once delta) | `streaming/pipelines.py` | `tests/test_streaming_pipeline.py` |
| Expectation suite + single-pass runner + JSON report | `dq/` | `tests/test_dq.py` |
| One-pass table profiler (nulls/distinct/min/max/mean per column) | `dq/profile.py` | `tests/test_dq.py` |
| observe() metrics piggybacked on the landing write (zero extra scans) | `dq/observe.py` | `tests/test_dq.py` |
| Row-level MERGE INTO (update/delete/insert, atomic swap) | `sources/merge.py` | `tests/test_merge.py` |
| Model registry with ref()-deps, table/view materialization | `models/` | `tests/test_models.py` |
| Salted aggregation / salted broadcast join / skew profiler | `functions/skew.py` | `tests/test_skew.py` |
| Bloom-filter runtime semi-join reduction (no false negatives) | `functions/bloom.py` | `tests/test_bloom.py` |
| Custom Python DataSource (partitioned synthetic generator) | `sources/pysource.py` | `tests/test_pysource_binary.py` |
| Join-strategy hints (merge / shuffle_hash / broadcast) | — (DataFrame hint API) | `tests/test_hints_quarantine.py` |
| PERMISSIVE CSV quarantine (corrupt rows preserved for replay) | `ingest/staging.py` | `tests/test_hints_quarantine.py` |
| binaryFile multimodal ingestion (path/length/content rows) | `sources/readers.py` | `tests/test_pysource_binary.py` |
| PERMISSIVE JSONL quarantine (corrupt lines preserved for replay) | `sources/readers.py` | `tests/test_sources.py` |
| Catalog statistics collection for CBO (ANALYZE TABLE + columns) | `sources/readers.py` | `tests/test_sources.py` |
| Reference-user migration walkthrough (ingest → validate → models) | `examples/migrate_reference_pipeline.py` | `tests/test_ingestion.py` |
| Generic as-of join API (backward/forward/nearest, tolerance) | `functions/temporal.py` | `tests/test_temporal.py` |
| Bucketed co-located joins (zero-Exchange fact⋈fact) | `sources/bucketing.py` | `tests/test_sources.py` |
| Dynamic partition overwrite (partition-scoped upsert) | `sources/readers.py` | `tests/test_sources.py` |
| Media decode/frame kernels (stubbed codecs, real plumbing) | `multimodal/` | `tests/test_multimodal.py` |
| Plan audit (pushdown/broadcast/shuffle/Python-stage facts) | `plans/` | `tests/test_plans.py` |
| Stateful histogram: transformWithStateInPandas, with a declared applyInPandasWithState fallback where the protobuf runtime is absent | `streaming/ops.py` | `tests/test_streaming.py` |
"""


def main() -> None:
    from open_source_etl_spark.registry import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    listed = {n for _, names in FAMILIES for n in names}
    missing = sorted(set(queries) - listed)
    unknown = sorted(listed - set(queries))
    if unknown:
        raise SystemExit(f"COVERAGE lists unregistered queries: {unknown}")

    lines = [
        "# COVERAGE — SURVEY.md §2B operator inventory → registered queries",
        "",
        "Generated by tools/coverage_report.py.  `sql` = DuckDB-oracle",
        "value-hash check; `rows` = rows-only check (engine-specific op).",
        "",
    ]
    for family, names in FAMILIES:
        lines.append(f"## {family}")
        lines.append("")
        for n in names:
            kind = "sql" if n in oracles else "rows"
            doc = (queries[n].__doc__ or "").strip().split("\n")[0]
            lines.append(f"- `{n}` ({kind}) — {doc}")
        lines.append("")
    if missing:
        lines.append("## Unclassified registered queries")
        lines.append("")
        for n in missing:
            lines.append(f"- `{n}`")
        lines.append("")
    lines.append(LIBRARY_SURFACES.strip())
    lines.append("")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}; {len(queries)} queries, {len(oracles)} with oracles; unclassified: {missing}")


if __name__ == "__main__":
    main()
