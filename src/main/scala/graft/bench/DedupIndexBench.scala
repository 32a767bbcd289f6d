package graft.bench

import org.apache.spark.sql.functions.col
import graft.Sessions
import graft.operators.DedupIndex

/** Build-wall vs consume-wall split for the persisted dedup artifact
  * (r9 verdict #3's evidence row): the build pays the signature scan,
  * the LSH+verify pair pass and the d7 component solve ONCE; every
  * consumer is then a join against stored tables. Measures the build,
  * each loaded-artifact consumer, an 8-doc read-only serve batch, and
  * the inline q56 gate (which re-pays the whole pipeline) for contrast.
  *   runMain graft.bench.DedupIndexBench [sfDir]
  */
object DedupIndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    val docs = graft.Tables.documents(spark, dir)
    val n = graft.Tables.documentsRows(spark, dir)
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ixDir = java.nio.file.Files
      .createTempDirectory("dedupix_bench").toString
    val (_, buildSec) = timed(DedupIndex.build(docs, ixDir, n))
    spark.catalog.clearCache()
    val parts = scala.collection.mutable.ListBuffer[String]()
    parts += s""""build_sec":${f(buildSec)}"""
    def consumer(name: String)(mk: DedupIndex.LoadedDedup =>
        org.apache.spark.sql.DataFrame): Unit = {
      val ix = DedupIndex.load(spark, ixDir)
      val (rows, sec) = timed {
        val df = mk(ix)
        val c = df.count()
        df.unpersist() // pageRank/labelProp return caller-owned caches
        c
      }
      spark.catalog.clearCache()
      parts += s""""${name}_sec":${f(sec)},"${name}_rows":$rows"""
    }
    consumer("split")(ix => DedupIndex.splitFrom(docs, ix))
    consumer("keep_best")(ix => DedupIndex.keepBestFrom(docs, ix, n))
    consumer("pagerank")(ix => DedupIndex.pageRankFrom(ix))
    consumer("label_prop")(ix => DedupIndex.labelPropFrom(ix))
    // read-only serve: 8 re-crawled docs under fresh ids
    val batch = docs.filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    consumer("serve8")(ix => DedupIndex.serveNearDups(batch, ix, 8L))
    // append wall at a fixed 8-doc increment (text-free verify path)
    val inc = docs.filter(col("doc_id") >= 8 && col("doc_id") < 16)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    val (_, appendSec) = timed(DedupIndex.append(inc, ixDir))
    spark.catalog.clearCache()
    parts += s""""append8_sec":${f(appendSec)}"""
    // takedown wall at a fixed 8-doc removal: tombstone write +
    // touched-component re-solve (now size-ladder joins, r12 #2) —
    // the O(touched) claim measured across the same octaves as serve
    val victims = spark.range(8).select((col("id") + 16L).as("doc_id"))
    val (_, deleteSec) = timed(DedupIndex.delete(victims, ixDir))
    spark.catalog.clearCache()
    parts += s""""delete8_sec":${f(deleteSec)}"""
    // rebuild wall: the version-swap maintenance call (build into the
    // next v-dir + atomic pointer adoption) — expected ≈ build_sec
    val (_, rebuildSec) = timed(
      DedupIndex.rebuild(docs.unionByName(inc), ixDir))
    spark.catalog.clearCache()
    parts += s""""rebuild_sec":${f(rebuildSec)}"""
    consumer("serve8_post_rebuild")(ix =>
      DedupIndex.serveNearDups(batch, ix, 8L))
    // contrast: the inline q56 gate re-pays signatures + pairs + d7
    val (_, inlineSec) = timed {
      graft.SparkEntry.queries("q56_dedup_split")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.catalog.clearCache()
    parts += s""""inline_q56_sec":${f(inlineSec)}"""
    spark.stop()
    println(s"""{"dir":"$dir","n":$n,${parts.mkString(",")}}""")
  }
}
