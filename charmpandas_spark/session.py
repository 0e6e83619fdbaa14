"""SparkSession construction tuned for the charmpandas-spark engine.

The reference (UIUC-PPL/charmpandas) manages its own elastic runtime:
PE rescale, MetisLB chare migration, per-PE aggregator groups
(reference: charmpandas/interface.py:431-693, src/server.hpp:26-49).
On Spark all of that is session configuration: AQE replaces the
histogram+greedy skew mitigation (src/partition.cpp:1444-1482),
dynamic allocation replaces rescale, and Arrow-accelerated
``toPandas`` replaces the Arrow-IPC CCS fetch path
(src/serialize.hpp:10-47).

Scale notes (100 TB target):
- AQE on: runtime partition coalescing + skew-join splitting means the
  static ``spark.sql.shuffle.partitions`` only needs to be an upper
  bound; at cluster scale set it ~2-3x total cores and let AQE coalesce.
- ``maxPartitionBytes`` 128m keeps scan tasks memory-bounded regardless
  of input size.
- Arrow batch transfer for every Python<->JVM hop.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # AQE: runtime re-planning (coalesce small partitions, split skewed
    # ones, demote/promote join strategies). Replaces the reference's
    # hand-rolled bucket histogram + greedy assignment.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for toPandas / pandas UDFs (the reference's data plane is
    # Arrow IPC end-to-end; this is the Spark equivalent).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Deterministic timestamps across engines (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Scan tasks stay memory-bounded at any input scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast small dimension tables aggressively (star-schema joins).
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    # InferFiltersFromGenerate synthesizes `size(arr) > 0 AND arr IS
    # NOT NULL` from every explode() and pushes it down — through
    # repartition exchanges, into the SCAN stage. For this engine's
    # explode sources the generated array is an EXPRESSION (shingles,
    # spans, n-gram windows: all provably non-empty by construction),
    # so the pushed filter re-evaluates the whole normalize+transform
    # pipeline once per row inside the scan — which is a SINGLE task
    # for any table under maxPartitionBytes, serializing work the
    # repartition right above it exists to spread (measured:
    # decontam_ngrams 4.1 s -> 1.1 s, text_tfidf 2.0 s -> 0.9 s,
    # dedup_spans 2.1 s -> 1.2 s warm best-of-2 at sf0.1; a 20 s+
    # single task in 100-query sweeps). Excluding the rule never
    # changes results — explode drops empty/null inputs natively; the
    # rule is an optimization for exploding STORED columns that are
    # often empty, which this engine does not do.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer."
        "InferFiltersFromGenerate",
    "spark.ui.enabled": "false",
    # Shuffle/spill/broadcast block codec. lz4 (Spark's default,
    # restated for visibility) measured a WASH vs zstd on local[32]
    # — both A/B leg orders committed in CODEC_AB_r17.json; the
    # apparent per-order win was page-cache leg order, not codec. On
    # a real cluster the shuffle crosses NICs and zstd's ratio is
    # the lever (guide §2.3): set SPARK_GRAFT_IO_CODEC=zstd there
    # and re-measure — deployment decision, not a local default.
    "spark.io.compression.codec":
        os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
}


def get_spark(
    app_name: str = "charmpandas-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    32) when no cluster master is configured; on a real cluster pass
    ``None`` with a pre-set master URL and only the SQL conf applies.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if master.startswith("local"):
        # local mode runs all task threads in ONE JVM; Spark's 1g
        # default heap OOMs long before the machine does. Stay UNDER
        # 32g: crossing it disables JVM compressed oops and measurably
        # slows every pointer-heavy operator (observed 2-20x on
        # broadcast joins). On a real cluster the submitter sizes
        # executors instead.
        conf["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "24g")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tiny_df(spark, data, schema):
    """A driver-built small-relation DataFrame in ONE partition.

    ``spark.createDataFrame(local_list)`` parallelizes over
    ``sc.defaultParallelism`` python partitions (32 on the test
    host), so even a ONE-ROW broadcast codebook pays ~32
    python-worker round trips every time its subplan is evaluated —
    measured at ~0.35 s extra per broadcast consumption warm on
    ``local[32]`` (r13). ``parallelize(data, 1)`` makes it one
    partition / one round trip. Use for every driver-built small
    relation (codebooks, k-means centers, PSL tables, blocklists);
    NEVER fix this with ``coalesce(1)``, which evaluates the 32
    python partitions sequentially instead (see SCALING.md)."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema)
