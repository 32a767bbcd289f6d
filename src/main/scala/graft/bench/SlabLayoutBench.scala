package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.DedupIndex
import graft.queries.DedupQueries

/** Deployment-scale evidence for the bucketed probe-slab layout (r12
  * verdict #5): the gate-scale break-even is documented (flat wins at
  * sf0.01 — BENCH_NOTES), and the knob's justification is the claim
  * that at multi-GB slabs a small probe skips 90%+ of the slab's
  * files. This measures that claim directly at the 100× corpus: fold
  * the artifact FLAT, then at each requested bucket count, timing one
  * short posting probe (min-of-3 warm) and counting the files its scan
  * actually opened vs the files the slab holds.
  *
  *   runMain graft.bench.SlabLayoutBench [docsDir] [buckets...]
  *
  * docsDir: a documents fixture (100× via ScaleFixture:
  *   SPARK_GRAFT_FIXTURE_TABLES=documents \
  *     runMain graft.bench.ScaleFixture /root/testdata/sf0.1 /tmp/d100 100).
  * Default buckets: 1024 4096.
  */
object SlabLayoutBench {

  /** Files actually opened by the parquet scans under a FRESH frame's
    * executed plan (the SlabLayoutSpec metric). Executed through the
    * frame's OWN plan RDD with nothing returned: collect() blows the
    * driver's maxResultSize at the 1000× corpus (~5 GB of posting
    * rows), and a noop write executes a DIFFERENT plan tree whose
    * metrics the original nodes never see. */
  private def filesRead(df: DataFrame): Long = {
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val executed = df.queryExecution.executedPlan
    val plans = executed.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    } match {
      case Seq() => Seq(executed)
      case xs => xs
    }
    plans.flatMap(_.collect {
      case s: FileSourceScanExec => s.metrics.get("numFiles").map(_.value)
    }.flatten).sum
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = if (args.length > 1) args.tail.map(_.toInt).toSeq
      else Seq(1024, 4096)
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
      .createTempDirectory("slab_bench").toString
    DedupIndex.build(docs, ixDir, n)
    spark.catalog.clearCache()
    // one short out-of-corpus probe: few distinct shingle hashes, the
    // serve shape the keysHint gate exists for
    val probe = Seq((9500000L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val qPost = DedupQueries.hashedShingleSets(probe)
      .select(col("doc_id").as("query_id"), explode(col("hs")).as("h"))
      .persist()
    val nKeys = qPost.select("h").distinct().count()
    val parts = scala.collection.mutable.ListBuffer[String]()
    parts += s""""n_docs":$n,"probe_keys":$nKeys"""
    // the probed lexical leg: pruned posting view ⋈ probe hashes,
    // rolled up per (query, doc) — RagServe's hybrid shape
    def probeWall(ix: DedupIndex.LoadedDedup, hint: Long): Double = {
      val walls = (1 to 3).map { _ =>
        val s = timed {
          DedupIndex.probePostings(ix, qPost, hint)
            .join(broadcast(qPost), "h")
            .groupBy(col("query_id"), col("doc_id"))
            .agg(count(lit(1)).as("inter")).count()
          ()
        }
        spark.catalog.clearCache(); s
      }
      walls.min
    }
    // the full 8-doc serve probe (cand join + exact verify) — the call
    // a deployment actually makes; measures whether band-side pruning
    // pays on THIS layout
    val serveProbe = docs.filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 900000000L)
      .persist()
    serveProbe.count()
    def stage(tag: String, layout: Int): Unit = {
      DedupIndex.compactDeltas(spark, ixDir, layout)
      val ix = DedupIndex.load(spark, ixDir)
      val slabFiles = filesRead(DedupIndex.load(spark, ixDir).postings)
      val hint = if (layout > 0) nKeys else -1L
      // metric on the bare probed VIEW (join-free): AQE wraps joined
      // scans in leaf query stages the plan collect cannot descend into
      val probed = filesRead(DedupIndex.probePostings(
        DedupIndex.load(spark, ixDir), qPost, hint))
      val wall = probeWall(ix, hint)
      spark.catalog.clearCache()
      parts += s""""${tag}_slab_files":$slabFiles"""
      parts += s""""${tag}_probe_files":$probed"""
      parts += s""""${tag}_probe_sec":${f(wall)}"""
      val serveWalls = (1 to 3).map { _ =>
        val s = timed {
          DedupIndex.serveNearDups(serveProbe,
            DedupIndex.load(spark, ixDir), 8L).count(); ()
        }
        spark.catalog.clearCache(); s
      }
      parts += s""""${tag}_serve8_sec":${f(serveWalls.min)}"""
    }
    stage("flat", 0)
    buckets.foreach(b => stage(s"b$b", b))
    qPost.unpersist()
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
