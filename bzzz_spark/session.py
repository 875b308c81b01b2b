"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir() -> str | None:
    """Shuffle/spill scratch space.

    On real clusters this is node-local NVMe (spark.local.dir set by the
    cluster manager).  This sandbox's virtio disk serializes concurrent
    shuffle writers (measured 35× slower shuffle-write at 32 threads),
    so default to tmpfs when it exists — the stand-in for fast local
    disks.  Override with $BZZZ_LOCAL_DIR."""
    env = os.environ.get("BZZZ_LOCAL_DIR")
    if env:
        return env
    # tmpfs is only safe when it is actually large: shuffle-mode builds
    # can spill tens of GB, and filling /dev/shm fails the job with
    # ENOSPC while pressuring system memory.  Require generous headroom
    # (≥ 32 GiB free) before electing it; otherwise leave the OS default.
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        try:
            st = os.statvfs("/dev/shm")
            free_bytes = st.f_bavail * st.f_frsize
        except OSError:
            return None
        if free_bytes >= 32 << 30:
            d = "/dev/shm/bzzz-spark-local"
            os.makedirs(d, exist_ok=True)
            return d
    return None


def get_spark(
    app_name: str = "bzzz_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (else 32).  In local mode the
    only memory knob is driver memory; shuffle partitions default to the
    core count (Spark's 200 default over-parallelizes small local runs
    and under-parallelizes huge ones — callers tune for real clusters).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the posting encoder streams tens of millions of rows through
        # mapInPandas; 64k-row batches cut per-batch Python overhead ~6×
        # vs the 10k default (the encoder carries split groups anyway)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # serving-mode query latency: cached postings are filtered by
        # term_id every query; small in-memory columnar batches (with
        # per-batch min/max stats) + the persist()-time
        # sortWithinPartitions(term_id) let the scan SKIP non-matching
        # batches instead of decompressing the whole cached index
        # (measured ~2× lower isolated-query latency at 200k docs)
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("BZZZ_DRIVER_MEM", "16g"))
    )
    local_dir = _default_local_dir()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
