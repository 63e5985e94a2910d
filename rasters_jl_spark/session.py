"""SparkSession builder with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the same
conf ships via ``spark-submit --py-files`` — nothing here is local-only.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "rasters_jl_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for the engine.

    Defaults chosen for 100 TB-scale behaviour, not just local runs:
    - AQE on (runtime coalescing + skew-join splitting for hot urban cells)
    - Arrow on (every Python boundary is a vectorised pandas UDF)
    - shuffle partitions sized to cores locally; on a cluster this should be
      ~2-3x total executor cores (set via spark-submit conf).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # Join-strategy defaults (guide: pick the strategy deliberately):
    # - autoBroadcastJoinThreshold 64m (env-overridable): the metadata-scale
    #   sides this engine joins against (vocab/model/candidate tables) are
    #   often estimated just past the 10m default after unions/projections,
    #   which left AQE to convert SMJ->BHJ only AFTER paying both map-side
    #   shuffle writes. Corpus-scale relations estimate far above any
    #   threshold at production size, so this never broadcasts a big side;
    #   set SPARK_GRAFT_BROADCAST_THRESHOLD (bytes) per deployment memory.
    # - preferSortMergeJoin=false lets the planner use shuffled-hash when a
    #   side fits per-partition (no sort), the guide's recommended baseline.
    bcast = os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD", str(64 * 1024 * 1024))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", bcast)
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
