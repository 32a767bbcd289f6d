package graft

import org.apache.spark.sql.SparkSession

/** Headline bench: times every declared query at the driver-given SF and
  * prints the one-line JSON contract. `count()` forces the full plan while
  * keeping result transfer off the clock. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // one warm-up pass outside the clock: JIT + codegen + parquet footer cache
    try queries.head._2(spark, sfDir).count() catch { case _: Throwable => () }
    val results = SparkEntry.benchQueries.map { name =>
      val fn = queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
