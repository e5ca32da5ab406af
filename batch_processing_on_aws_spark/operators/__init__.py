from .antijoin import new_keys, unknown_keys
from .audit import missing_value_counts, missing_value_ratios
from .conformance import conform
from .dedup import dedup_deterministic, dedup_exact
from .merge import MergeWriter, upsert_frames
from .setops import union_all_by_name, union_distinct

__all__ = [
    "MergeWriter",
    "conform",
    "dedup_deterministic",
    "dedup_exact",
    "missing_value_counts",
    "missing_value_ratios",
    "new_keys",
    "union_all_by_name",
    "union_distinct",
    "unknown_keys",
    "upsert_frames",
]
