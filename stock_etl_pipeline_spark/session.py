"""SparkSession factory.

Defaults chosen for the driver's local[32] single-JVM harness but written so
the same code lands well on a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, broadcast demotion).
- ``spark.sql.session.timeZone=UTC`` so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for the few pandas-UDF paths (similarity / multimodal).
- Shuffle partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "stock-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    An already-running session is reused as-is (Spark is one-JVM-per-process);
    runtime-settable confs are still applied so tests get UTC + AQE even on a
    driver-provided session.
    """
    par = default_parallelism()
    master = master or f"local[{par}]"
    shuffle = shuffle_partitions or par

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[N] is a single JVM acting as driver AND all executors; the
        # 1g default driver heap is sized for a thin cluster driver, not for
        # N executor threads' worth of hash tables + broadcasts (the 10x
        # soak OOMed it). Inert if a session already exists.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Cached plans historically pin their output partitioning, which
        # DISABLES AQE under a persist() — the simhash signature cache fill
        # ran 2.5x slower (static sort-merge vocab join instead of an AQE
        # broadcast). Let AQE re-plan cached subtrees.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Runtime-settable confs, in case we reused an existing session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def apply_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally created session
    (e.g. the driver's)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
    except Exception:
        pass  # static conf on some builds; the persist paths still work
    return spark
