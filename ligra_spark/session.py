"""SparkSession factory with the engine's tuned configuration.

Design notes (scale-first):

- ``spark.sql.shuffle.partitions`` defaults to the core count here; on
  a real 1000-executor cluster you set it (or let AQE coalesce) to
  ~2-3x total cores.  The iterative engine relies on *stable* hash
  partitioning across supersteps so co-partitioned joins skip the
  exchange — therefore AQE partition coalescing is disabled for the
  engine session (it would re-bucket every superstep and defeat
  partitioning reuse), while AQE skew-join splitting stays ON (it is
  the runtime defense for hub-skewed shuffles, complementing the
  explicit salting in ``ligra_spark.engine``).
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
        # stable partition counts across supersteps (see module docstring)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
