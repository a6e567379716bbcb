package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Lake sink/source: the Spark form of the reference's
  * Pipelines→R2→Iceberg hop (`/root/reference/src/pipeline.rs:57-143`,
  * `README.md:14-44`) — the HTTP sink + managed landing collapse into a
  * direct partitioned append.
  *
  * Layout: parquet partitioned by `event_date = days(created_at)` —
  * the same partition transform the Iceberg table would use, so
  * time-range queries prune partitions at the source (`.explain` shows
  * PartitionFilters). In production swap `format("parquet")` for
  * `format("iceberg")` + `toTable`; the offline container has no
  * catalog, and nothing else changes.
  *
  * Idempotency: SDK retries can duplicate events (at-least-once with
  * client retry, `pipeline.rs:71-74`); our deterministic uuids make
  * `dropDuplicates("uuid")` a true idempotent-replay guard — within a
  * batch here, per micro-batch epoch in streaming (with a watermark
  * bound on the dedup state).
  */
object Lake {

  val PartitionCol = "event_date"

  private def withPartition(events: DataFrame): DataFrame =
    events.withColumn(PartitionCol,
      to_date(coalesce(col("timestamp"), col("created_at"))))

  /** Batch append of canonical events. */
  def writeEvents(events: DataFrame, path: String, dedup: Boolean = true): Unit = {
    val base = if (dedup) events.dropDuplicates("uuid") else events
    withPartition(base)
      .write
      .partitionBy(PartitionCol)
      .mode("append")
      .parquet(path)
  }

  /** Read the lake back (partition pruning on `event_date`). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compaction (the parquet analogue of Iceberg's
    * `rewrite_data_files`): rewrite each date-partition's accumulated
    * small files into one file — streaming appends produce a file per
    * epoch per partition, and scan planning degrades with file count.
    * Hash-clustering on the partition column sends each date to exactly
    * one task (`parallelism` bounds concurrent tasks, not files/date).
    * Rewrites into a fresh directory (an atomic catalog swap in a real
    * lake; callers point readers at the new path).
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      parallelism: Int = 32): Unit =
    spark.read.parquet(path)
      .repartition(parallelism, col(PartitionCol))
      .write
      .partitionBy(PartitionCol)
      .mode("overwrite")
      .parquet(outPath)

  /** Streaming append: per-epoch dedup + partitioned write via
    * foreachBatch (the exactly-once-per-epoch pattern; uuid dedup makes
    * replayed epochs idempotent).
    */
  def streamWriter(events: DataFrame, path: String,
      checkpoint: String): DataStreamWriter[Row] =
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeEvents(batch, path)
      }
}
