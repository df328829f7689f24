"""SparkSession factory with scale-aware defaults.

The same builder serves local test mode (``local[N]``) and a real cluster —
nothing here assumes single-node. Defaults are chosen for the 100 TB design
point and merely *sized down* by env vars for local runs:

- AQE on (runtime coalescing of shuffle partitions + skew-join splitting):
  at 100 TB the static ``spark.sql.shuffle.partitions`` is only an upper
  bound; AQE re-plans per-stage from observed sizes.
- Arrow on for any pandas interchange (vectorized UDF path).
- Session timezone pinned to UTC so event-time bucketing (window /
  date_trunc) is reproducible across drivers regardless of machine TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~128 MiB parquet split targets keep scan tasks uniform at any scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Auto-broadcast threshold: dims (region/nation/supplier/geo fixture)
    # stay far under this at every SF; big joins fall through to sort-merge
    # which AQE may convert back to broadcast from runtime stats.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "logvision-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for tests/bench; on a
    cluster pass ``None`` and submit via spark-submit (builder leaves master
    to the submit environment when SPARK_MASTER is unset and a master is
    already configured).
    """
    builder = SparkSession.builder.appName(app_name)

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        env_master = os.environ.get("SPARK_MASTER")
        if env_master:
            master = env_master
        elif cpus:
            master = f"local[{cpus}]"
        else:
            master = "local[*]"
    builder = builder.master(master)

    conf = dict(DEFAULT_CONF)
    if master.startswith("local"):
        # In local mode the driver JVM IS the engine; the 1g JVM default is
        # mis-sized relative to the 64m broadcast threshold (a deserialized
        # broadcast build needs several× its on-wire estimate). Cluster
        # deployments size driver/executor memory via spark-submit instead.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    if shuffle_partitions is None:
        # Local: a few × cores is plenty. Cluster deployments override to
        # ~2-3× total executor cores (AQE coalesces the excess).
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
