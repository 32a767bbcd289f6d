package graft

import org.apache.spark.sql.SparkSession

/** Headline bench: times every declared query at the driver-given SF and
  * prints the one-line JSON contract.
  *
  * Methodology: one untimed warm-up pass over all queries (codegen compile,
  * JIT, parquet footer cache), then two timed passes taking the per-query
  * minimum — the host VM shows multi-second I/O jitter bursts unrelated to
  * the plans (observed: identical 60k-row aggs ranging 0.2s..16s), so a
  * single cold pass measures the hypervisor, not the engine. The noop
  * sink forces evaluation of EVERY output column (a bare `count()` lets
  * Catalyst prune projection-only queries down to the scan, which would
  * flatter exactly the scalar/text operators the bench should measure)
  * while keeping result transfer off the clock.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    val names = SparkEntry.benchQueries
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      } catch { case e: Throwable =>
        // a swallowed failure must not masquerade as a fast query
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop per-query pinned intermediates OFF the clock: every timed run
      // rebuilds its own caches (a warm cache surviving into the next timed
      // pass would flatter exactly the persist-using queries)
      spark.catalog.clearCache()
      sec
    }
    names.foreach(timeOne) // warm-up
    val results = names.map { n => n -> math.min(timeOne(n), timeOne(n)) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // The contract line alone is fragile: sbt decorates stdout and the
    // driver keeps only a tail of it (round 1 recorded `parsed: null` with
    // the line truncated mid-JSON). Persist the artifact to a file first,
    // then print it LAST — after spark.stop() — so even a short log tail
    // ends with the bare JSON line.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_OUT.json"), json + "\n")
    println(json)
    spark.stop()
    println(json)
  }
}
