"""hbase_indexer_spark — a PySpark-native analytics/indexing engine with the
query and data-processing capabilities of NGDATA/hbase-indexer.

The reference (at /root/reference, cited as ``file:line`` in docstrings) is a
CDC -> transform -> index pipeline over HBase cells.  This package re-expresses
the same semantics Spark-first:

- canonical ``cells`` DataFrames instead of HBase KeyValues,
- declarative indexer configs compiled to Catalyst column expressions,
- batch indexing as a plain DataFrame plan (scan -> extract -> doc build),
- incremental indexing as Structured Streaming + foreachBatch upsert,
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal) built on the same engine surface.
"""

__version__ = "0.1.0"

# lazy public API (PEP 562): importing the package stays light; names
# resolve on first touch
_EXPORTS = {
    "IndexerConf": "hbase_indexer_spark.config.indexer_conf",
    "FieldDef": "hbase_indexer_spark.config.indexer_conf",
    "conf_from_xml": "hbase_indexer_spark.config.indexer_conf",
    "conf_from_xml_file": "hbase_indexer_spark.config.indexer_conf",
    "conf_to_xml": "hbase_indexer_spark.config.indexer_conf",
    "build_index": "hbase_indexer_spark.plans.batch",
    "IncrementalIndexer": "hbase_indexer_spark.plans.incremental",
    "IndexStore": "hbase_indexer_spark.sinks.index_store",
    "BucketedIndexStore": "hbase_indexer_spark.sinks.bucket_store",
    "IndexerModel": "hbase_indexer_spark.lifecycle",
    "IndexerDefinition": "hbase_indexer_spark.lifecycle",
    "IndexerSupervisor": "hbase_indexer_spark.lifecycle",
    "IndexerStreamJob": "hbase_indexer_spark.streaming.stream",
    "read_event_stream": "hbase_indexer_spark.streaming.stream",
    "TransformChain": "hbase_indexer_spark.operators.transform",
    "register_stage": "hbase_indexer_spark.operators.transform",
    "register_row_mapper": "hbase_indexer_spark.operators.transform",
    "register_value_mapper": "hbase_indexer_spark.functions.bytes_codec",
    "IndexerRestServer": "hbase_indexer_spark.rest",
    "get_spark": "hbase_indexer_spark.session",
    "replication_status": "hbase_indexer_spark.monitoring",
    "replication_wait": "hbase_indexer_spark.monitoring",
    # training-data-pipeline headliners (full surface in the submodules)
    "exact_dedup_groups": "hbase_indexer_spark.pipeline.dedup",
    "minhash_lsh_dedup_pairs": "hbase_indexer_spark.pipeline.dedup",
    "dedup_clusters": "hbase_indexer_spark.pipeline.dedup",
    "deduped_corpus": "hbase_indexer_spark.pipeline.dedup",
    "span_dedup": "hbase_indexer_spark.pipeline.dedup",
    "dedup_against": "hbase_indexer_spark.pipeline.dedup",
    "pack_sequences": "hbase_indexer_spark.pipeline.pack",
    "sequence_manifest": "hbase_indexer_spark.pipeline.pack",
    "packed_sequence_text": "hbase_indexer_spark.pipeline.pack",
    "shuffle_order": "hbase_indexer_spark.pipeline.pack",
    "shuffled_pack": "hbase_indexer_spark.pipeline.pack",
    "mixture_resample": "hbase_indexer_spark.pipeline.curation",
    "tfidf_topk": "hbase_indexer_spark.pipeline.corpus_stats",
    "unigram_logprob": "hbase_indexer_spark.pipeline.corpus_stats",
    "bigram_logprob": "hbase_indexer_spark.pipeline.corpus_stats",
    # r6: retrieval family + data-quality profilers
    "bm25_topk": "hbase_indexer_spark.pipeline.corpus_stats",
    "bm25_topk_indexed": "hbase_indexer_spark.pipeline.corpus_stats",
    "postings_upsert": "hbase_indexer_spark.pipeline.corpus_stats",
    "rrf_fuse": "hbase_indexer_spark.pipeline.corpus_stats",
    "retrieval_eval": "hbase_indexer_spark.pipeline.corpus_stats",
    "backoff_trigram_logprob": "hbase_indexer_spark.pipeline.corpus_stats",
    "key_skew_report": "hbase_indexer_spark.pipeline.corpus_stats",
    "fk_integrity_report": "hbase_indexer_spark.pipeline.corpus_stats",
    "quality_ensemble": "hbase_indexer_spark.pipeline.curation",
    "edit_distance_dedup": "hbase_indexer_spark.pipeline.dedup",
    "parse_media_headers": "hbase_indexer_spark.pipeline.multimodal",
    "build_ivf_index_pinned": "hbase_indexer_spark.pipeline.similarity",
    "ivf_topk_indexed_pinned": "hbase_indexer_spark.pipeline.similarity",
    "gopher_rules": "hbase_indexer_spark.pipeline.text",
    "char_entropy": "hbase_indexer_spark.pipeline.text",
    "normalize_text": "hbase_indexer_spark.pipeline.text",
    "vocab_overlap": "hbase_indexer_spark.pipeline.text",
    "corpus_report": "hbase_indexer_spark.pipeline.curation",
    "winnow_fingerprints": "hbase_indexer_spark.pipeline.dedup",
    "winnow_overlap_pairs": "hbase_indexer_spark.pipeline.dedup",
    "brute_force_topk": "hbase_indexer_spark.pipeline.similarity",
    "quantize_embeddings": "hbase_indexer_spark.pipeline.similarity",
    "text_profile": "hbase_indexer_spark.pipeline.text",
    "vocab_kmv": "hbase_indexer_spark.pipeline.text",
    "train_test_split": "hbase_indexer_spark.pipeline.curation",
    "decontaminate": "hbase_indexer_spark.pipeline.decontam",
    "ngram_topk": "hbase_indexer_spark.pipeline.decontam",
    "scrub": "hbase_indexer_spark.pipeline.scrub",
    # r4-continuation surface
    "bloom_screen": "hbase_indexer_spark.pipeline.dedup",
    "dedup_keep_best": "hbase_indexer_spark.pipeline.dedup",
    "source_overlap_matrix": "hbase_indexer_spark.pipeline.dedup",
    "dup_size_histogram": "hbase_indexer_spark.pipeline.dedup",
    "chunk_documents": "hbase_indexer_spark.pipeline.pack",
    "span_corruption": "hbase_indexer_spark.pipeline.pack",
    "prefix_lm_pairs": "hbase_indexer_spark.pipeline.pack",
    "fim_transform": "hbase_indexer_spark.pipeline.pack",
    "json_key_profile": "hbase_indexer_spark.plans.events",
    "zorder_key": "hbase_indexer_spark.pipeline.layout",
    "zorder_bucket_stats": "hbase_indexer_spark.pipeline.layout",
    "zorder_write": "hbase_indexer_spark.pipeline.layout",
    "stream_attribution_join": "hbase_indexer_spark.streaming.joins",
    "write_bucketed_table": "hbase_indexer_spark.operators.bucketed",
    "bucketed_revenue_by_priority": "hbase_indexer_spark.operators.bucketed",
    "exact_group_quantiles": "hbase_indexer_spark.pipeline.corpus_stats",
    "hll_overlap": "hbase_indexer_spark.pipeline.corpus_stats",
    "change_feed": "hbase_indexer_spark.sinks.index_store",
    "apply_change_feed": "hbase_indexer_spark.sinks.index_store",
    "low_quality_spans": "hbase_indexer_spark.pipeline.corpus_stats",
    "rolling_active_users": "hbase_indexer_spark.pipeline.corpus_stats",
    "maintain_grouped_sums": "hbase_indexer_spark.plans.ivm",
    "priority_grouping_sets": "hbase_indexer_spark.plans.analytics",
    "token_budget_sample": "hbase_indexer_spark.pipeline.curation",
    "fixed_k_sample": "hbase_indexer_spark.pipeline.curation",
    "epoch_expand": "hbase_indexer_spark.pipeline.curation",
    "label_centroids": "hbase_indexer_spark.pipeline.similarity",
    "knn_label_vote": "hbase_indexer_spark.pipeline.similarity",
    "int8_rerank_topk": "hbase_indexer_spark.pipeline.similarity",
    "bpe_merge_candidates": "hbase_indexer_spark.pipeline.corpus_stats",
    "tfidf_cosine_pairs": "hbase_indexer_spark.pipeline.corpus_stats",
    "nll_outliers": "hbase_indexer_spark.pipeline.corpus_stats",
    "mixed_language": "hbase_indexer_spark.pipeline.text",
    "quality_deciles": "hbase_indexer_spark.pipeline.curation",
    "ngram_novelty": "hbase_indexer_spark.pipeline.dedup",
    "shard_manifest": "hbase_indexer_spark.sinks.sharding",
    "curriculum_order": "hbase_indexer_spark.pipeline.curation",
    "cdc_dedup": "hbase_indexer_spark.pipeline.dedup",
    "ann_recall_report": "hbase_indexer_spark.pipeline.similarity",
    "DedupIndexStore": "hbase_indexer_spark.pipeline.dedup_store",
    "curation_stream": "hbase_indexer_spark.streaming.dedup_stream",
    "ivf_int8_topk": "hbase_indexer_spark.pipeline.similarity",
    "dedup_pair_quality": "hbase_indexer_spark.pipeline.dedup",
    "event_funnel": "hbase_indexer_spark.plans.events",
    "retention_cohorts": "hbase_indexer_spark.plans.events",
    "curation_lineage": "hbase_indexer_spark.pipeline.curation",
    "jaccard_threshold_curve": "hbase_indexer_spark.pipeline.dedup",
    "embedding_drift": "hbase_indexer_spark.pipeline.similarity",
    "token_fertility": "hbase_indexer_spark.pipeline.text",
    "snapshot_diff": "hbase_indexer_spark.pipeline.curation",
    "corpus_summary": "hbase_indexer_spark.pipeline.curation",
    # r5 surface
    "morphline_to_conf": "hbase_indexer_spark.config.morphline_conf",
    "evaluate_timestamp": "hbase_indexer_spark.functions.timeutil",
    "screen_batches": "hbase_indexer_spark.pipeline.dedup_store",
    "embedding_cosine_pairs_lsh": "hbase_indexer_spark.pipeline.dedup",
    "embedding_lsh_recall": "hbase_indexer_spark.pipeline.dedup",
    "semantic_decontam": "hbase_indexer_spark.pipeline.decontam",
    "quality_model_scores": "hbase_indexer_spark.pipeline.text",
    "ivf_index_upsert": "hbase_indexer_spark.pipeline.similarity",
    # r5-continuation surface
    "kmeans_cells": "hbase_indexer_spark.pipeline.dedup",
    "semdedup": "hbase_indexer_spark.pipeline.dedup",
    "substring_dedup": "hbase_indexer_spark.pipeline.dedup",
    "line_dedup": "hbase_indexer_spark.pipeline.dedup",
    "dsir_selection": "hbase_indexer_spark.pipeline.corpus_stats",
    "build_vocab": "hbase_indexer_spark.pipeline.corpus_stats",
    "vocab_encode": "hbase_indexer_spark.pipeline.corpus_stats",
    "c4_line_clean": "hbase_indexer_spark.pipeline.text",
    "pq_train": "hbase_indexer_spark.pipeline.similarity",
    "pq_encode": "hbase_indexer_spark.pipeline.similarity",
    "pq_adc_topk": "hbase_indexer_spark.pipeline.similarity",
    "filter_ablation": "hbase_indexer_spark.pipeline.curation",
    "count_min_sketch": "hbase_indexer_spark.pipeline.corpus_stats",
    "cms_estimates": "hbase_indexer_spark.pipeline.corpus_stats",
    # r5b surface: graph analytics, distinct/quantile/F2 sketches,
    # corpus ingestion
    "trade_edges": "hbase_indexer_spark.pipeline.graph",
    "pagerank": "hbase_indexer_spark.pipeline.graph",
    "personalized_pagerank": "hbase_indexer_spark.pipeline.graph",
    "hll_registers": "hbase_indexer_spark.pipeline.corpus_stats",
    "hll_distinct": "hbase_indexer_spark.pipeline.corpus_stats",
    "hll_stream": "hbase_indexer_spark.streaming.sketch_stream",
    "histogram_quantiles": "hbase_indexer_spark.pipeline.corpus_stats",
    "selfjoin_size_estimate": "hbase_indexer_spark.pipeline.corpus_stats",
    "read_documents": "hbase_indexer_spark.sources.corpus",
    "read_jsonl": "hbase_indexer_spark.sources.corpus",
    "read_csv": "hbase_indexer_spark.sources.corpus",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name: str):
    try:
        module = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), name)


def __dir__():
    return __all__
