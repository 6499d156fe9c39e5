"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor: AQE on (runtime coalesce + skew-join), Arrow execution
for the pandas-UDF analysis chain, shuffle partitions sized to cores
(overridden per-job at scale), UTC so timestamps compare stably against
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "alix_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N (the "local[N,maxFailures]" form keeps only N);
        # local[*] → real core count; a real cluster sets 2-3x cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        n = n.split(",")[0].strip()
        if n == "*":
            shuffle_partitions = os.cpu_count() or cpus
        else:
            shuffle_partitions = int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    got = spark.sparkContext.master
    if got != master:
        import warnings

        # getOrCreate returns the EXISTING session: a different master/
        # shuffle config is silently ignored — exactly the in-process
        # parallelism-comparison hazard CLAUDE.md warns about (use
        # spark-submit subprocesses for A/B timing)
        warnings.warn(
            f"get_spark: existing session has master={got!r}, "
            f"requested {master!r} ignored (getOrCreate reuse)",
            stacklevel=2,
        )
    spark.sparkContext.setLogLevel("WARN")
    return spark
