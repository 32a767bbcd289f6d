package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.DedupIndex
import graft.queries.DedupQueries

/** The posting slab's BIG-PROBE regime, measured (r14 verdict #7): the
  * hash-dir bucket layout wins few-key probes (8 keys → 8/4096 dirs),
  * and its keysHint·2 ≤ buckets gate silently FALLS BACK to the flat
  * full-window scan for decontamination-shaped probes (thousands to
  * hundreds of thousands of keys). This measures all three plans in
  * each regime at the 100× corpus so the break-even is a number, not a
  * heuristic taken on faith:
  *   - auto: what [[DedupIndex.probePostings]] actually does at the
  *     probe's honest keysHint (pruned when engaged, flat otherwise)
  *   - forced: the pruned path engaged regardless (keysHint understated)
  *     — the probe-side bucket collect + per-dir mounts the gate avoids
  *   - flat: the full-window scan (keysHint = -1)
  *
  *   runMain graft.bench.BigProbeBench [docsDir] [buckets]
  *
  * docsDir: a documents fixture (100× via ScaleFixture). Default
  * buckets 4096 (the measured few-key winner). */
object BigProbeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = args.lift(1).map(_.toInt).getOrElse(4096)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    import spark.implicits._
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.Tables.documents(spark, dir)
    val n = docs.count()
    val ixDir = java.nio.file.Files
      .createTempDirectory("bigprobe").toString
    DedupIndex.build(docs, ixDir, n)
    DedupIndex.compactDeltas(spark, ixDir, buckets)
    spark.catalog.clearCache()
    val parts = scala.collection.mutable.ListBuffer[String]()
    parts += s""""n_docs":$n,"buckets":$buckets"""

    // probes: the serve shape (one short doc), a benchmark-eval shape
    // (~4k distinct grams) and a full decontamination sweep (~100k) —
    // all out-of-corpus ids, text drawn from the corpus distribution
    def probeOf(nDocs: Int) = DedupQueries.hashedShingleSets(
        docs.filter(col("doc_id") < nDocs)
          .withColumn("doc_id", col("doc_id") + 900000000L))
      .select(col("doc_id").as("query_id"), explode(col("hs")).as("h"))
    val small = Seq((900000001L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val qSmall = DedupQueries.hashedShingleSets(small)
      .select(col("doc_id").as("query_id"), explode(col("hs")).as("h"))
      .persist()
    // the decontamination sweep: every gram of a large eval set, most
    // of which never occur in the corpus — real grams from 2100 docs
    // (the corpus vocabulary saturates ~27k distinct) padded with
    // synthetic misses to the 100k-key regime (misses still probe
    // buckets/dirs, which is the cost under test)
    val k100k = probeOf(2100).unionByName(
      spark.range(80000).select(lit(990000000L).as("query_id"),
        (col("id") * 2654435761L + 123456789L).as("h")))
    val probes = Seq(
      ("k8", qSmall),
      ("k4k", probeOf(85).persist()),
      ("k100k", k100k.persist()))

    def wall(q: org.apache.spark.sql.DataFrame, hint: Long): Double =
      (1 to 3).map { _ =>
        val s = timed {
          DedupIndex.probePostings(DedupIndex.load(spark, ixDir), q, hint)
            .join(broadcast(q), "h")
            .groupBy(col("query_id"), col("doc_id"))
            .agg(count(lit(1)).as("inter")).count()
          ()
        }
        spark.catalog.clearCache(); s
      }.min

    probes.foreach { case (tag, q) =>
      val keys = q.select("h").distinct().count()
      parts += s""""${tag}_keys":$keys"""
      parts += s""""${tag}_auto_sec":${f(wall(q, keys))}"""
      // forced: understate the hint so the gate engages — the plan the
      // heuristic protects against in the big-key regimes
      parts += s""""${tag}_forced_sec":${f(wall(q, 1L))}"""
      parts += s""""${tag}_flat_sec":${f(wall(q, -1L))}"""
    }
    probes.foreach(_._2.unpersist())
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
