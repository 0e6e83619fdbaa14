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

from pyspark.sql import DataFrame as SparkDF, functions as F

from ..functions.text import fingerprint
from ..timestamps import ensure_event_time

__all__ = ["streaming_exact_dedup", "streaming_minhash_dedup"]

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


def streaming_minhash_dedup(
    stream_df: SparkDF,
    index_path: str,
    text_col: str,
    id_col: str,
    sink_path: str,
    checkpoint_path: str,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    hash_fn: str = "md5",
    use_chars: bool = False,
    n: int = 3,
    num_buckets: int = 64,
    processing_time: str | None = None,
):
    """Continuous-ingestion NEAR-dup: each micro-batch probes the
    persisted banded MinHash LSH index (``functions.dedup.
    minhash_index_write`` layout) for near-duplicates of its
    documents, appends its NOVEL documents' band rows so later
    batches see them, and writes the matches ``(doc, matched_doc,
    jaccard)`` to ``sink_path`` — the streaming composition of
    :func:`..functions.dedup.minhash_dedup_incremental`, which is
    RefinedWeb-style dedup-at-ingestion as a standing query.

    Implementation is ``foreachBatch``: the probe is a BATCH plan
    per micro-batch (bloom gate -> partition-pruned bucket scan ->
    band join -> exact Jaccard verify), because the index lives on
    disk, not in the state store — per-batch I/O is proportional to
    the batch's bucket coverage, not history size, and the index is
    shared with every batch consumer (compaction, backfills). State
    semantics: intra-batch near-dups are out of scope (same contract
    as the batch operator); matched docs are NOT appended (the
    survivor represents the cluster). Delivery is AT-LEAST-ONCE on
    both outputs: the checkpoint prevents re-PROCESSING committed
    batches, but a crash between the sink append / index append and
    the checkpoint commit replays that batch — the same match rows
    can land in the sink twice (consumers dedupe on
    (doc, matched_doc), as the registry query does) and novel band
    rows can re-append (duplicate band rows cost probe work, never
    correctness; ``index_compact`` removes them). Exactly-once would
    need a transactional sink (Delta-style), which plain parquet is
    not.

    Trigger: availableNow (drain-and-stop) by default; pass
    ``processing_time`` (e.g. ``"30 seconds"``) to run as a
    continuous standing query instead. Returns the started
    ``StreamingQuery`` — callers ``awaitTermination``.
    """
    from ..functions.dedup import minhash_dedup_incremental, release

    def _probe_batch(batch_df: SparkDF, batch_id: int) -> None:
        spark = batch_df.sparkSession
        matches = minhash_dedup_incremental(
            spark, batch_df, index_path, text_col, id_col,
            threshold=threshold, num_hashes=num_hashes, bands=bands,
            k=k, hash_fn=hash_fn, use_chars=use_chars, n=n,
            num_buckets=num_buckets, append_novel=True)
        (matches.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append").parquet(sink_path))
        release(matches)

    w = (stream_df.writeStream
         .foreachBatch(_probe_batch)
         .option("checkpointLocation", checkpoint_path))
    w = (w.trigger(processingTime=processing_time) if processing_time
         else w.trigger(availableNow=True))
    return w.start()
