package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured local SparkSession.
  *
  * Config choices (scale rationale — see SURVEY.md §4):
  *  - shuffle.partitions = #cores locally; on a real cluster this is
  *    AQE-coalesced anyway (adaptive on).
  *  - nanosAsLong: the reference's data model is int64-nanosecond `time`
  *    (kompactor.ts:107, README sample values); Spark's TimestampType is
  *    µs so we keep ns as LongType end-to-end to avoid precision loss.
  *  - UTC session TZ for byte-stable timestamp semantics vs the oracle.
  *  - zstd output codec matches the reference sink (kompactor.ts:109).
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder = b
    .appName("graft")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
    // catalog state (bucketed-table metadata) lives outside the repo
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft-warehouse")
    .config("spark.ui.enabled", "false")
}
