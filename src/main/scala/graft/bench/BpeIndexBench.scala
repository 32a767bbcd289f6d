package graft.bench

import graft.Sessions
import graft.operators.BpeIndex

/** Encode wall under a persisted tokenizer vs the inline t15 gate that
  * retrains per call (r10 verdict #7's evidence row).
  *   runMain graft.bench.BpeIndexBench [sfDir]
  */
object BpeIndexBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed(body: => Long): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.Tables.documents(spark, dir)
    val ixDir = java.nio.file.Files
      .createTempDirectory("bpeix_bench").toString
    val t0 = System.nanoTime()
    BpeIndex.build(docs, ixDir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    val loadedSec = timed {
      BpeIndex.encodeFrom(docs, BpeIndex.load(spark, ixDir)).count()
    }
    spark.catalog.clearCache()
    val inlineSec = timed {
      graft.SparkEntry.queries("t15_bpe_encode")(spark, dir).count()
    }
    spark.catalog.clearCache()
    spark.stop()
    println(s"""{"dir":"$dir","build_sec":${f(buildSec)},""" +
      s""""encode_loaded_sec":${f(loadedSec)},"encode_inline_sec":${f(inlineSec)}}""")
  }
}
