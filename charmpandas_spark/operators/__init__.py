from .bucketing import bucketed_join, read_bucketed, write_bucketed
from .funnel import funnel_counts, funnel_times
from .merge import merge_into, table_diff
from .pagerank import pagerank
from .resample import resample_events
from .skew import broadcast_join, salted_join

__all__ = [
    "bucketed_join",
    "read_bucketed",
    "write_bucketed",
    "funnel_counts",
    "funnel_times",
    "merge_into",
    "pagerank",
    "table_diff",
    "resample_events",
    "broadcast_join",
    "salted_join",
]
