from .bucketing import bucketed_join, read_bucketed, write_bucketed
from .skew import broadcast_join, salted_join

__all__ = [
    "bucketed_join",
    "read_bucketed",
    "write_bucketed",
    "broadcast_join",
    "salted_join",
]
