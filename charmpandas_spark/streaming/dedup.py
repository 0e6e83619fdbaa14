"""Streaming deduplication — the online half of the dedup family.

The reference has no streaming surface at all (SURVEY §2.7); this is
the north-star addition a continuously-ingesting training-data
pipeline needs: content-fingerprint exact dedup applied to a stream,
with watermark-bounded state so the dedup set does not grow without
bound.

Scale design: ``dropDuplicates``/``dropDuplicatesWithinWatermark``
keep per-key state in the state store (RocksDB-backed on a real
cluster), hash-partitioned by fingerprint — the streaming analogue of
the batch ``exact_dedup`` window. With a watermark, Spark evicts
fingerprint state older than the delay, trading unbounded-history
exactness for bounded memory: duplicates arriving farther apart than
the watermark are NOT collapsed (document retention accordingly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF

from ..functions.text import fingerprint
from ..timestamps import ensure_event_time

__all__ = ["streaming_exact_dedup"]

_FP = "__cps_fp"


def streaming_exact_dedup(
    stream_df: SparkDF,
    text_col: str,
    ts_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> SparkDF:
    """Keep the first-seen row per normalized-content fingerprint.

    Works on batch frames too (same transformation, Structured
    Streaming contract). Without ``ts_col`` the dedup state is
    unbounded (exact forever — batch semantics); with it, the stream
    is watermarked and state for fingerprints older than
    ``watermark_delay`` is evicted.
    """
    out = stream_df.withColumn(_FP, fingerprint(text_col))
    if ts_col is not None and stream_df.isStreaming:
        out = ensure_event_time(out, ts_col).withWatermark(
            ts_col, watermark_delay)
        return out.dropDuplicatesWithinWatermark([_FP]).drop(_FP)
    return out.dropDuplicates([_FP]).drop(_FP)
