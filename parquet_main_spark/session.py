"""SparkSession factory tuned for the encode/scan workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | str = "*", app: str = "parquet_main_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session; on a real cluster the same confs apply per
    executor (AQE + skew-join on, Arrow transfers on, UTC timestamps)."""
    # glibc malloc: numpy buffers above the (dynamic, <=32 MiB) mmap
    # threshold are served by mmap and returned by munmap — with many
    # Python workers per node those syscalls serialize on the kernel's
    # per-host mm locks (measured here: the 32-worker encode job ran 2.2x
    # slower until this was raised; 71 s -> 32 s). Serve large buffers from
    # the per-process heap instead: each worker reuses its own arena, no
    # cross-process kernel contention, RSS bounded by per-worker high water.
    # Set BEFORE the JVM starts so its python workers inherit it; on a real
    # cluster ship the same via spark.executorEnv.MALLOC_MMAP_THRESHOLD_.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    if shuffle_partitions is None:
        ncpu = os.cpu_count() or 8
        shuffle_partitions = ncpu if cores == "*" else int(cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "268435456")
        # real-cluster analog of the os.environ set above: executor-spawned
        # python workers get the same malloc tunable
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    )
    # sandbox benchmarking hook: the VM's disk sustains ~180 MB/s, far below
    # a cluster executor's local NVMe — point shuffle/spill at tmpfs so
    # compute scaling is measurable (real clusters set spark.local.dir
    # per-node anyway)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
