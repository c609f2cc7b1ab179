"""SparkSession factory with scale-appropriate defaults.

Single place to configure AQE, Arrow, and shuffle parallelism so tests,
bench, and the spark-submit entry point agree. On a real cluster the
same builder is used with ``master`` left to spark-submit.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Executor Python workers must be able to import this package: on a real
# cluster that's `spark-submit --py-files`; in local mode we export the
# package root on PYTHONPATH before workers are spawned.
_PKG_ROOT = str(Path(__file__).resolve().parent.parent)

_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make ``datamatcher_spark`` importable on executors of ANY session —
    including ones we didn't build (the correctness driver creates its
    own). Equivalent of ``spark-submit --py-files``: zip the package once
    and ``addPyFile`` it; executors unpack it onto their sys.path.
    Module-level pandas UDFs are pickled by reference, so this is load-
    bearing, not an optimization."""
    import tempfile
    import zipfile

    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"datamatcher_spark_{app_id}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w") as zf:
            for p in sorted(pkg_dir.rglob("*.py")):
                zf.write(p, f"datamatcher_spark/{p.relative_to(pkg_dir)}")
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED.add(app_id)


def get_spark(
    app_name: str = "datamatcher-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Defaults follow the environment contract: ``local[$SPARK_GRAFT_CPUS]``
    (falling back to ``local[*]``) and shuffle partitions sized to the
    core count — at cluster scale these are overridden by spark-submit
    conf, not code.
    """
    existing = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _PKG_ROOT + (os.pathsep + existing if existing else "")
        )

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 0
        except ValueError:
            n = 0
        shuffle_partitions = max(n or os.cpu_count() or 8, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
