package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental compaction: the batch compactor expressed as a
  * `Trigger.AvailableNow` file-source stream — each run picks up only
  * files that arrived since the last checkpoint and appends them,
  * time-sorted within hour partitions, to a compacted parquet layout
  * partitioned by (date, hour).
  *
  * This is the "compaction as a continuously-running maintenance job"
  * shape: state lives in the checkpoint (processed-files log), so a crash
  * or redeploy resumes exactly-once without re-reading the 100 TB history.
  * Unlike the one-shot CLI (graft.compact.Main) it never rewrites
  * snapshot JSONs — it targets the query-facing compacted layout instead.
  */
object StreamingCompactor {

  /** Start one incremental pass (AvailableNow: drains what exists, then
    * stops). Returns when the pass completes. */
  def runOnce(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      checkpointDir: String,
      timeColumn: String = "time",
      schema: org.apache.spark.sql.types.StructType = null): Unit = {
    val reader = spark.readStream
    val withSchema = if (schema != null) reader.schema(schema)
      else reader.schema(spark.read.parquet(inputDir).schema)
    val in = withSchema.parquet(inputDir)

    val hourNs = 3600L * 1000000000L
    val q = in
      .withColumn("hour_bucket", expr(s"$timeColumn div $hourNs"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per micro-batch: shuffle once by hour bucket, sort within each
        // writer task, emit one sorted zstd file per (bucket, batch)
        batch
          .repartition(col("hour_bucket"))
          .sortWithinPartitions(col("hour_bucket"), col(timeColumn))
          .write
          .mode("append")
          .option("compression", "zstd")
          // see Compactor scaladoc: dictionary encoding collapses on
          // high-cardinality payloads; zstd on sorted rows suffices
          .option("parquet.enable.dictionary", "false")
          .partitionBy("hour_bucket")
          .parquet(outputDir)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Compacted-layout reader for verification: partition-pruned scan. */
  def readCompacted(spark: SparkSession, outputDir: String): DataFrame =
    spark.read.parquet(outputDir)

  def listPartitions(spark: SparkSession, outputDir: String): Seq[String] = {
    val fs = new Path(outputDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(outputDir))) Seq.empty
    else fs.listStatus(new Path(outputDir)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("hour_bucket=")).toSeq.sorted
  }
}
