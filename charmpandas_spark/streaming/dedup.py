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

__all__ = ["streaming_exact_dedup", "streaming_minhash_dedup",
           "release_streaming_cache"]

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
    shared with every batch consumer (compaction, backfills). The
    index's bloom summary and meta sidecar are CACHED across
    micro-batches (r16): the first batch reads them from disk, later
    batches reuse the in-memory copy, and each novel-band append
    folds its bloom rows into the cached table in lockstep with the
    parquet append — so a standing query pays the index-summary I/O
    once, not per batch. Concurrent WRITERS are safe (ADVICE r16):
    every batch re-lists the ``_cps_bloom``/``_cps_meta`` sidecars
    (one Hadoop-FS listStatus); if another session appended bloom
    deltas or ``index_compact`` rewrote them under the standing
    query, the cache is dropped and re-read that batch — degrading
    to the pre-cache per-batch-read path instead of silently
    skipping matches on a stale bloom negative. The cached blocks
    are freed when the query stops (terminated-query listener
    below). State semantics:
    intra-batch near-dups are out of scope (same contract as the
    batch operator); matched docs are NOT appended (the survivor
    represents the cluster). Delivery is AT-LEAST-ONCE on both
    outputs: the checkpoint prevents re-PROCESSING committed batches,
    but a crash between the sink append / index append and the
    checkpoint commit replays that batch — the same match rows can
    land in the sink twice (consumers dedupe on (doc, matched_doc),
    as the registry query does) and novel band rows can re-append.
    Re-appended band rows cost probe work AND make the replayed batch
    probe its own earlier append; the ``doc != matched_doc`` guard in
    :func:`..functions.dedup.minhash_dedup_incremental` filters the
    resulting jaccard-1.0 self-matches, so replay cannot mislabel a
    genuinely novel doc as a duplicate of itself (ADVICE r15) —
    ``index_compact`` removes the duplicate band rows. Exactly-once
    would need a transactional sink (Delta-style), which plain
    parquet is not.

    Trigger: availableNow (drain-and-stop) by default; pass
    ``processing_time`` (e.g. ``"30 seconds"``) to run as a
    continuous standing query instead. Returns the started
    ``StreamingQuery`` — callers ``awaitTermination``.
    """
    from ..functions.dedup import minhash_dedup_incremental, release

    index_cache: dict = {}

    def _probe_batch(batch_df: SparkDF, batch_id: int) -> None:
        spark = batch_df.sparkSession
        matches = minhash_dedup_incremental(
            spark, batch_df, index_path, text_col, id_col,
            threshold=threshold, num_hashes=num_hashes, bands=bands,
            k=k, hash_fn=hash_fn, use_chars=use_chars, n=n,
            num_buckets=num_buckets, append_novel=True,
            cache=index_cache)
        (matches.withColumn("batch_id", F.lit(batch_id))
                .write.mode("append").parquet(sink_path))
        release(matches)

    w = (stream_df.writeStream
         .foreachBatch(_probe_batch)
         .option("checkpointLocation", checkpoint_path))
    w = (w.trigger(processingTime=processing_time) if processing_time
         else w.trigger(availableNow=True))
    query = w.start()
    # expose the cross-batch cache so the caller (or a stop hook) can
    # free the cached bloom blocks after awaitTermination; freeing is
    # hygiene — the blocks are also reclaimed on session stop.
    query._cps_index_cache = index_cache
    return query


def release_streaming_cache(query) -> None:
    """Free the cross-batch index cache a
    :func:`streaming_minhash_dedup` query pinned (the bloom summary's
    checkpointed blocks). Call after ``awaitTermination``."""
    cache = getattr(query, "_cps_index_cache", None) or {}
    handle = cache.pop("bloom_handle", None)
    if handle is not None:
        handle.unpersist()
    cache.clear()
