"""SparkSession factory with the engine's tuned configuration.

Design notes (scale-first):

- ``spark.sql.shuffle.partitions`` defaults to the core count here; on
  a real 1000-executor cluster set it to ~2-3x total cores and let AQE
  right-size each stage.  AQE partition coalescing is ON: the
  superstep loop truncates lineage with localCheckpoint every round
  (engine.IterState), which resets partitioning metadata anyway, so
  there is no cross-superstep partitioning reuse to protect — and
  coalescing cuts per-superstep stage latency ~40%% on small shuffles
  (measured: PR10 10.3s → 6.1s at sf0.1) while preventing
  thousands-of-empty-tasks stages at 100 TB.  AQE skew-join splitting
  is ON as the runtime defense for hub-skewed joins.
- Arrow is enabled for the few pandas-UDF paths (ingest id-assignment,
  multimodal stubs); the algorithm hot loops are 100%% JVM.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "default_parallelism"]


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "ligra_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` pins ``local[cpus]`` (used by the N-vs-4N scaling bench);
    default is ``local[$SPARK_GRAFT_CPUS]``.
    """
    cores = cpus or default_parallelism()
    sp = shuffle_partitions or cores
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # ContextCleaner only reclaims shuffle files / checkpoint + cache
        # blocks when the DRIVER GCs, and the fallback periodic GC
        # defaults to 30 min — longer than most iterative runs.  With a
        # large heap and low driver-side allocation pressure, a
        # 100-round peel/superstep loop accumulates every round's
        # blocks and shuffle state until the heap fills and tail rounds
        # degrade into GC thrash (measured: k-truss rounds 12-14 on a
        # 32.7M-edge rMat went 20s -> 49s -> 354s on near-identical
        # inputs).  One minute keeps cleanup concurrent with the loop.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
