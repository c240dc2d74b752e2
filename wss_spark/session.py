"""SparkSession factory with scale-appropriate defaults.

Settings chosen for correctness-vs-oracle (UTC, ANSI-off parity with the
reference's lenient casts) and for large-cluster behavior (AQE on, skew-join
handling on, Arrow on). ``shuffle_partitions`` defaults to the local core
count; on a real cluster it should be ~2-3x total cores (set via submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wss_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("WSS_MASTER", "local[*]")
    if shuffle_partitions is None:
        env = os.environ.get("WSS_SHUFFLE_PARTITIONS")
        if env:
            shuffle_partitions = int(env)
        elif master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = (os.cpu_count() or 8) if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # pages.html is a wide binary column: keep scan splits modest so a
        # partition of HTML blobs fits comfortably in executor memory.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # keep partition discovery on the driver: local-FS listdir of a few
        # thousand dirs is milliseconds, while the distributed listing job
        # Spark launches past the default threshold (32 paths) costs whole
        # task-scheduling rounds per read — measured 15-20 s to open a
        # 30-wave seen store. At warehouse scale the store is an Iceberg
        # table whose manifests replace directory listing entirely.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "8192")
        .config("spark.driver.memory", os.environ.get("WSS_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/scratch on tmpfs when requested: single-box benchmarks are
    # otherwise bottlenecked on one shared disk, which hides CPU scaling
    # (a real cluster scales disks with nodes)
    local_dir = os.environ.get("WSS_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship ``wss_spark`` to executors (the ``spark-submit --py-files``
    mechanism, done programmatically so local sessions started from any
    cwd — and remote clusters — can unpickle our pandas UDFs)."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(spark.sparkContext._temp_dir, "wss_spark_pkg.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        spark.sparkContext.addPyFile(zip_path)


def build_py_files_zip(out_path: str) -> str:
    """Package the engine for ``spark-submit --py-files`` deployment
    (north-rule packaging requirement)."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    return out_path
