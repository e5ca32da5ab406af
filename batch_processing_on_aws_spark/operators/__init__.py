from .antijoin import new_keys, unknown_keys
from .audit import missing_value_counts, missing_value_ratios
from .clustering import assign_clusters, connected_components, keep_canonical
from .conformance import conform
from .constraints import (
    accepted_values_violations,
    assert_constraints,
    foreign_key_violations,
    not_null_violations,
    quarantine_split,
    unique_violations,
)
from .features import quantile_normalize, target_encode, winsorize
from .decontam import contamination_report
from .dedup import (
    bow_fingerprint,
    dedup_against_ledger,
    dedup_deterministic,
    dedup_exact,
)
from .pii import redact_pii
from .quality import gopher_quality
from .urls import doc_urls, domain_stats, normalize_url
from .merge import (
    MergeWriter,
    merge_into_sql,
    supports_merge_into,
    upsert_catalog_table,
    upsert_frames,
)
from .packing import pack_sequences
from .sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
    train_val_test_split,
)
from .setops import union_all_by_name, union_distinct
from .sketches import (
    KmvLedger,
    kmv_distinct,
    kmv_intersect_estimate,
    kmv_trailing_distinct,
    kmv_union_estimate,
)
from .textstats import tfidf_cosine_pairs
from .timeseries import (
    date_spine,
    densify_daily,
    fill_forward,
    mad_anomaly,
    seasonal_decompose,
)

__all__ = [
    "KmvLedger",
    "MergeWriter",
    "kmv_distinct",
    "kmv_intersect_estimate",
    "kmv_trailing_distinct",
    "kmv_union_estimate",
    "mad_anomaly",
    "quantile_normalize",
    "quarantine_split",
    "seasonal_decompose",
    "target_encode",
    "tfidf_cosine_pairs",
    "winsorize",
    "accepted_values_violations",
    "assert_constraints",
    "assign_clusters",
    "bow_fingerprint",
    "conform",
    "contamination_report",
    "dedup_against_ledger",
    "doc_urls",
    "domain_stats",
    "gopher_quality",
    "normalize_url",
    "redact_pii",
    "pack_sequences",
    "stratified_hash_sample",
    "connected_components",
    "date_spine",
    "dedup_deterministic",
    "dedup_exact",
    "densify_daily",
    "fill_forward",
    "foreign_key_violations",
    "hash_bucket",
    "hash_sample",
    "keep_canonical",
    "merge_into_sql",
    "missing_value_counts",
    "missing_value_ratios",
    "new_keys",
    "not_null_violations",
    "supports_merge_into",
    "train_val_test_split",
    "union_all_by_name",
    "union_distinct",
    "unique_violations",
    "unknown_keys",
    "upsert_catalog_table",
    "upsert_frames",
]
