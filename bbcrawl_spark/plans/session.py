"""Tuned SparkSession builder for the crawl engine."""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "bbcrawl-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """SparkSession with the engine's scale-oriented defaults.

    * AQE on (runtime re-plan, skew-join splitting, shuffle coalescing)
    * shuffle partitions ∝ cores (overridable; on a real cluster size to
      cluster cores × 2-3)
    * Arrow enabled with a reduced records-per-batch — HTML blobs are large,
      keep Arrow batches memory-bounded on executors
    * runtime Bloom-filter join pruning on (bonus on top of the persistent
      application-level seen Bloom)
    """
    import os

    if master is None:
        master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores or 8) * 2, 8)
    if driver_memory is None:
        # local mode runs every task in the driver JVM: the 1g default heap
        # GC-thrashes as soon as task parallelism rises. Measured on this
        # box: >=16g heaps degrade 2-8x (GC/paging pathology), 12g is the
        # sweet spot; DataFrame.cache spills to disk beyond it anyway.
        driver_memory = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_memory)
        # G1 (the Java 17 default) anti-scales on this box under the high
        # allocation rates of codegen'd string work: measured 8.7s @32c vs
        # 5.3s @8c on a 10M-row regex map. ParallelGC restores scaling
        # (1.3s @32c vs 3.4s @8c on the same workload).
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s
