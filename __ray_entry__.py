"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship lakehouse maintenance cycle (ingest →
compact → Z-order cluster → MERGE INTO → snapshot expiry → canonical
scan) on sf0.001. ``queries()`` exposes every implemented operator
from SURVEY.md §2 plus the training-data ops; ``oracle_sql()`` gives
the duckdb-equivalent SQL for every SQL-expressible one (approximate /
permutation-hash ops are rows-only by design).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere down this import graph.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from fupi_ray.pipelines import lake
from fupi_ray.pipelines import queries as q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return lake.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # ROUND-5 WINDOW ROTATION (VERDICT r4 item 4): the driver records
    # only the first 50 entries, so this round leads with (a) the 41
    # queries whose newest driver rows were r3-era (the whole r4
    # past-cap tail) and (b) the 9 queries whose kernels changed in r5
    # (streamed matview create; L2-sliced signatures + fused hot-key
    # push shuffle feeding dedup_docs / window-span removers; Arrow-
    # native pair/window map_groups feeding the dedup family). Every
    # other query keeps its r4 driver-green row (≤1 round old) and
    # sits past the cap, still covered by pytest + the local oracle
    # runner (tools/check_oracles.py, recorded in BASELINE.md).
    return {
        # (a) queries whose last driver row predates round 4
        "frame_sample": q.q_frame_sample,
        "sample_exact_n": q.q_sample_exact_n,
        "langid": q.q_langid,
        "quality": q.q_quality,
        "token_stats": q.q_token_stats,
        "group_quantiles": q.q_group_quantiles,
        "decontaminate": q.q_decontaminate,
        "gopher_quality": q.q_gopher_quality,
        "fingerprint": q.q_fingerprint,
        "sample_stratified": q.q_sample_stratified,
        "embed_search": q.q_embed_search,
        "minhash_pairs": q.q_minhash_pairs,
        "simhash_pairs": q.q_simhash_pairs,
        "ivf_topk": q.q_ivf_topk,
        "mix_sources": q.q_mix_sources,
        "group_topk": q.q_group_topk,
        "translate": q.q_translate,
        "rolling_fp": q.q_rolling_fp,
        "explode_sentences": q.q_explode_sentences,
        "segment_sentences": q.q_segment_sentences,
        "centroid_label": q.q_centroid_label,
        "doc_sentence_stats": q.q_doc_sentence_stats,
        "jsonl_scan": q.q_jsonl_scan,
        "range_join": q.q_range_join,
        "pivot_status": q.q_pivot_status,
        "rollup_priority": q.q_rollup_priority,
        "filter_project": q.q_filter_project,
        "sort_limit": q.q_sort_limit,
        "agg_pricing": q.q_agg_pricing,
        "join_enrich": q.q_join_enrich,
        "topk_join": q.q_topk_join,
        "hash_join": q.q_hash_join,
        "anti_join": q.q_anti_join,
        "asof_join": q.q_asof_join,
        "nation_revenue": q.q_nation_revenue,
        "supplier_parts": q.q_supplier_parts,
        "string_agg_events": q.q_string_agg_events,
        "distinct_pairs": q.q_distinct_pairs,
        "window_events": q.q_window_events,
        "session_events": q.q_session_events,
        "rolling_window": q.q_rolling_window,
        # (b) kernels changed in round 5 — need fresh driver rows
        "lake_matview": lake.q_lake_matview,
        "lake_dedup_docs": lake.q_lake_dedup_docs,
        "lake_window_dedup": lake.q_lake_window_dedup,
        "dedup_substring": q.q_dedup_substring,
        "dedup_substring_rm": q.q_dedup_substring_rm,
        "dedup_families": q.q_dedup_families,
        "char_jaccard": q.q_char_jaccard,
        "lake_merge": lake.q_lake_merge,
        "lake_wap": lake.q_lake_wap,
        # ---- driver cap (50) — everything below keeps its r4-green
        # driver row and is re-verified locally this round ----
        "lake_compact": lake.q_lake_compact,
        "lake_cluster": lake.q_lake_cluster,
        "lake_merge_dv": lake.q_lake_merge_dv,
        "lake_merge_delete": lake.q_lake_merge_delete,
        "lake_insert_missing": lake.q_lake_insert_missing,
        "lake_ingest": lake.q_lake_ingest,
        "lake_keyword_index": lake.q_lake_keyword_index,
        "lake_decontaminate": lake.q_lake_decontaminate,
        "lake_evolve": lake.q_lake_evolve,
        "lake_rename": lake.q_lake_rename,
        "lake_expire": lake.q_lake_expire,
        "lake_delete": lake.q_lake_delete,
        "lake_delete_dv": lake.q_lake_delete_dv,
        "lake_update": lake.q_lake_update,
        "lake_update_dv": lake.q_lake_update_dv,
        "lake_rollback": lake.q_lake_rollback,
        "lake_fork": lake.q_lake_fork,
        "lake_fork_merge": lake.q_lake_fork_merge,
        "lake_changelog": lake.q_lake_changelog,
        "lake_cdc_apply": lake.q_lake_cdc_apply,
        "lake_bucket_join": lake.q_lake_bucket_join,
        "lake_sorted_scan": lake.q_lake_sorted_scan,
        "lake_timetravel": lake.q_lake_timetravel,
        "lake_stats": lake.q_lake_stats,
        "pack_tokens": lake.q_pack_tokens,
        "export_shards": lake.q_export_shards,
        "dedup_exact": q.q_dedup_exact,
        "json_extract": q.q_json_extract,
        "bpe_tokens": q.q_bpe_tokens,
        "redact": q.q_redact,
        "fingerprint_fast": q.q_fingerprint_fast,
        "heavy_hitters": q.q_heavy_hitters,
        "mix_token_budget": q.q_mix_token_budget,
        "multimodal": q.q_multimodal,
        "topk_cosine": q.q_topk_cosine,
        "maxsim": q.q_maxsim,
        "embedding_neardup": q.q_embedding_neardup,
        "keyword_search": q.q_keyword_search,
        "distinct_count": q.q_distinct_count,
        "approx_distinct": q.q_approx_distinct,
        "gopher_repetition": q.q_gopher_repetition,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "filter_project": q.SQL_FILTER_PROJECT,
        "sort_limit": q.SQL_SORT_LIMIT,
        "agg_pricing": q.SQL_AGG_PRICING,
        "join_enrich": q.SQL_JOIN_ENRICH,
        "topk_join": q.SQL_TOPK_JOIN,
        "hash_join": q.SQL_HASH_JOIN,
        "anti_join": q.SQL_ANTI_JOIN,
        "asof_join": q.SQL_ASOF_JOIN,
        "nation_revenue": q.SQL_NATION_REVENUE,
        "supplier_parts": q.SQL_SUPPLIER_PARTS,
        "string_agg_events": q.SQL_STRING_AGG_EVENTS,
        "explode_sentences": q.SQL_EXPLODE_SENTENCES,
        "segment_sentences": q.SQL_SEGMENT_SENTENCES,
        "distinct_pairs": q.SQL_DISTINCT_PAIRS,
        "window_events": q.SQL_WINDOW_EVENTS,
        "session_events": q.SQL_SESSION_EVENTS,
        "rolling_window": q.SQL_ROLLING_WINDOW,
        "jsonl_scan": q.SQL_JSONL_SCAN,
        "centroid_label": q.SQL_CENTROID_LABEL,
        "doc_sentence_stats": q.SQL_DOC_SENTENCE_STATS,
        "dedup_exact": q.SQL_DEDUP_EXACT,
        "token_stats": q.SQL_TOKEN_STATS,
        "langid": q.SQL_LANGID,
        "quality": q.SQL_QUALITY,
        "sample_stratified": q.SQL_SAMPLE_STRATIFIED,
        "gopher_quality": q.SQL_GOPHER_QUALITY,
        "gopher_repetition": q.SQL_GOPHER_REPETITION,
        "dedup_substring": q.SQL_DEDUP_SUBSTRING,
        "dedup_substring_rm": q.SQL_DEDUP_SUBSTRING_RM,
        "bpe_tokens": q.SQL_BPE_TOKENS,
        "redact": q.SQL_REDACT,
        "fingerprint": q.SQL_FINGERPRINT,
        "translate": q.SQL_TRANSLATE,
        "multimodal": q.SQL_MULTIMODAL,
        "frame_sample": q.SQL_FRAME_SAMPLE,
        "topk_cosine": q.SQL_TOPK_COSINE,
        "maxsim": q.SQL_MAXSIM,
        "embedding_neardup": q.SQL_EMBEDDING_NEARDUP,
        "char_jaccard": q.SQL_CHAR_JACCARD,
        "dedup_families": q.SQL_DEDUP_FAMILIES,
        "range_join": q.SQL_RANGE_JOIN,
        "mix_sources": q.SQL_MIX_SOURCES,
        "mix_token_budget": q.SQL_MIX_TOKEN_BUDGET,
        "group_topk": q.SQL_GROUP_TOPK,
        "sample_exact_n": q.SQL_SAMPLE_EXACT_N,
        "group_quantiles": q.SQL_GROUP_QUANTILES,
        "decontaminate": q.SQL_DECONTAMINATE,
        "pivot_status": q.SQL_PIVOT_STATUS,
        "rollup_priority": q.SQL_ROLLUP_PRIORITY,
        "keyword_search": q.SQL_KEYWORD_SEARCH,
        "distinct_count": q.SQL_DISTINCT_COUNT,
        "heavy_hitters": q.SQL_HEAVY_HITTERS,
        "json_extract": q.SQL_JSON_EXTRACT,
        "lake_compact": lake.SQL_LAKE_COMPACT,
        "lake_cluster": lake.SQL_LAKE_CLUSTER,
        "lake_merge": lake.SQL_LAKE_MERGE,
        "lake_merge_dv": lake.SQL_LAKE_MERGE_DV,
        "lake_merge_delete": lake.SQL_LAKE_MERGE_DELETE,
        "lake_insert_missing": lake.SQL_LAKE_INSERT_MISSING,
        "lake_ingest": lake.SQL_LAKE_INGEST,
        "lake_keyword_index": lake.SQL_LAKE_KEYWORD_INDEX,
        "lake_dedup_docs": lake.SQL_LAKE_DEDUP_DOCS,
        "lake_decontaminate": lake.SQL_LAKE_DECONTAMINATE,
        "lake_evolve": lake.SQL_LAKE_EVOLVE,
        "lake_rename": lake.SQL_LAKE_RENAME,
        "lake_expire": lake.SQL_LAKE_EXPIRE,
        "lake_bucket_join": lake.SQL_LAKE_BUCKET_JOIN,
        "lake_sorted_scan": lake.SQL_LAKE_SORTED_SCAN,
        "lake_delete": lake.SQL_LAKE_DELETE,
        "lake_delete_dv": lake.SQL_LAKE_DELETE_DV,
        "lake_stats": lake.SQL_LAKE_STATS,
        "lake_update": lake.SQL_LAKE_UPDATE,
        "lake_update_dv": lake.SQL_LAKE_UPDATE_DV,
        "lake_rollback": lake.SQL_LAKE_ROLLBACK,
        "lake_matview": lake.SQL_LAKE_MATVIEW,
        "lake_fork": lake.SQL_LAKE_FORK,
        "lake_fork_merge": lake.SQL_LAKE_FORK_MERGE,
        "lake_changelog": lake.SQL_LAKE_CHANGELOG,
        "lake_cdc_apply": lake.SQL_LAKE_CDC_APPLY,
        "lake_wap": lake.SQL_LAKE_WAP,
        "lake_timetravel": lake.SQL_LAKE_TIMETRAVEL,
        "lake_window_dedup": lake.SQL_LAKE_WINDOW_DEDUP,
        "pack_tokens": lake.SQL_PACK_TOKENS,
        "export_shards": lake.SQL_EXPORT_SHARDS,
        # minhash_pairs / simhash_pairs / ivf_topk / rolling_fp:
        # permutation-hash / approximate ops — rows-only by design
    }
