"""State-store configuration for production-scale stateful streaming.

Spark's default state store (HDFSBackedStateStoreProvider) keeps every
key's state as JVM heap objects — fine for demo state, but at cluster
scale (10^8-10^9 keys of dedup fingerprints / running aggregates) it
OOMs executors and makes checkpoint uploads full-copy. The bundled
RocksDB provider keeps state off-heap in an embedded LSM store with:

- bounded executor memory (block cache + write buffers, not one heap
  object per key);
- incremental CHANGELOG checkpointing: each micro-batch uploads only
  the delta, with periodic full snapshots — checkpoint cost tracks
  update rate, not total state size;
- fast restart: executors reload the last snapshot + replay the short
  changelog tail.

This module exposes the canonical conf set and a context manager that
applies/restores it. These are session-wide SQL confs, but Structured
Streaming pins state-store confs PER QUERY at first start (recorded in
the checkpoint's offset log), so scoping the context manager around
``start()`` is safe — and a query restarted from a checkpoint keeps
the provider it started with.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = ["ROCKSDB_STATE_CONF", "use_rocksdb_state"]

ROCKSDB_STATE_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    # delta-only uploads per batch (full snapshots in the background)
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
    "enabled": "true",
    # cap total RocksDB memory per executor instead of per-instance
    # write buffers — the setting that keeps 32 state partitions from
    # each grabbing their own buffers
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage":
        "true",
}


@contextmanager
def use_rocksdb_state(spark: SparkSession, extra: dict | None = None):
    """Apply the RocksDB state-store confs for the duration of the
    block (typically around ``writeStream...start()``), restoring the
    previous values afterwards. Queries pin their provider at first
    start, so restoration never flips a running query's store."""
    conf = dict(ROCKSDB_STATE_CONF)
    if extra:
        conf.update(extra)
    old: dict[str, str | None] = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
