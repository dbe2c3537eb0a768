"""SparkSession factory tuned for the target execution profile.

Local testing runs on local[N]; the configs below are chosen so the same
logical plans scale to a multi-executor cluster: AQE handles runtime
shuffle-partition sizing and skew joins, shuffle partitions default low for
local mode but are overridable, Arrow is on for the (rare) Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oni_ml_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    AQE is enabled so shuffle partition counts and skew handling are decided
    at runtime from actual map output sizes — the setting that lets the same
    plan run at sf0.001 locally and at 100 TB on a large cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local mode: the driver JVM is the executor — give it real heap
        # (must be set before the JVM launches; ignored on getOrCreate reuse)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r12 (guide §3.1/§9): let the planner pick shuffled-hash join when
        # its size conditions hold instead of always sort-merge — drops the
        # per-partition sorts on the many mid-size equi-joins (dedup
        # verify, profile full-outer joins, doc-stat joins). Join strategy
        # does not change results; the oracle gate re-verified all 50
        # entries under this setting. Overridable per run via
        # SPARK_GRAFT_EXTRA_CONF for A/B.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # reliable checkpoints (connected_components on a cluster with a
        # checkpoint dir) are deleted when their frame is GC'd instead of
        # accumulating until application stop
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # read TIMESTAMP(NANOS) parquet (e.g. the events table) as long nanos;
        # io.load_table converts back to a timestamp column
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/oni_ml_spark_warehouse"),
        )
    )
    # experiment/override hook: SPARK_GRAFT_EXTRA_CONF="key=val;key=val"
    # lets the bench and A/B harnesses toggle configs without code edits
    # (scale-dependent settings stay parameterised per the optimization
    # ground rules); explicit extra_conf still wins over the env
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for item in env_conf.split(";"):
        if "=" in item:
            k, _, v = item.partition("=")
            builder = builder.config(k.strip(), v.strip())
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
