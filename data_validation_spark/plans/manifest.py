"""Checkpoint manifest (IO7) — resumable runs.

One small append-only table of completed-partition rows:
``suite:string, run_id:string, partition:string, status:string,
metrics_rows:long, completed_ts:timestamp``.  On resume, the partition
worklist is anti-filtered against completed rows, so a re-run after a
failure processes exactly the unfinished partitions (SURVEY.md J3/IO7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_validation_spark.sources.table_provider import TableProvider

MANIFEST_TABLE = "manifest"
MANIFEST_SCHEMA = ("suite string, run_id string, partition string, "
                   "status string, metrics_rows long")


def completed_partitions(tp: TableProvider, suite_name: str) -> set[str]:
    """Partition labels already completed for this suite (any run)."""
    if not tp.exists(MANIFEST_TABLE):
        return set()
    rows = (tp.read(MANIFEST_TABLE)
            .filter((F.col("suite") == suite_name)
                    & (F.col("status") == "complete"))
            .select("partition").distinct().collect())
    return {r["partition"] for r in rows}


def write_manifest(tp: TableProvider, spark: SparkSession, suite_name: str,
                   run_id: str, partition_rows: list[tuple[str, int]]) -> None:
    """Append one complete-row per processed partition.

    ``partition_rows`` = [(partition_label, metrics_rows_written)].
    """
    if not partition_rows:
        return
    df = spark.createDataFrame(
        [(suite_name, run_id, p, "complete", n) for p, n in partition_rows],
        MANIFEST_SCHEMA).withColumn("completed_ts", F.current_timestamp())
    tp.append(df, MANIFEST_TABLE)
