package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.queries.DedupQueries

/** Streaming near-dup dedup ≡ batch (the StreamingSketchSpec pattern,
  * applied to MinHash-LSH state instead of a linear sketch): once every
  * document has flowed through the stream, the distinct (earlier, later,
  * sig_matches) match set must equal the batch LSH pipeline's candidate
  * pairs at the same signature threshold — regardless of how the
  * micro-batches split the corpus. Plus the incremental property the
  * operator exists for: a SECOND landing of near-dup content matches
  * against the already-indexed corpus without re-reading it.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val MinMatches = 8

  private def runStream(dir: String, name: String,
      ckpt: String = null): Unit = {
    val q = CorpusIngest.nearDupMatches(
        CorpusIngest.readDocs(spark, dir), MinMatches)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", Option(ckpt).getOrElse(
        Files.createTempDirectory(s"graft_ckpt_$name").toString))
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("streaming match set equals the batch LSH pairs across micro-batches") {
    val dir = Files.createTempDirectory("graft_neardup_stream").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // three id-ordered files -> three micro-batches (ids nondecreasing
    // across batches, so streaming orientation dup_of < doc_id matches
    // the batch doc_a < doc_b)
    val n = Tables.documentsRows(spark, sf)
    docs.filter(col("doc_id") < n / 3).coalesce(1)
      .write.mode("append").parquet(dir)
    docs.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3)
      .coalesce(1).write.mode("append").parquet(dir)
    docs.filter(col("doc_id") >= 2 * n / 3).coalesce(1)
      .write.mode("append").parquet(dir)

    runStream(dir, "neardup_stream")
    val streamed = spark.table("neardup_stream")
      .select("dup_of", "doc_id", "sig_matches").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batch = DedupQueries.minhashLsh(docs, n)
      .filter(col("sig_matches") >= MinMatches)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(batch.nonEmpty, "no near-dup pairs at sf0.001 — gate tested nothing")
    assert(streamed == batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("an increment lands against the already-indexed corpus (state survives restart)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_neardup_inc").toString
    // SHARED checkpoint + durable sink: the second RUN recovers the
    // band-bucket index from the state store and processes ONLY the new
    // file (memory sinks cannot recover, so this uses parquet)
    val ckpt = Files.createTempDirectory("graft_ckpt_neardup_inc").toString
    val outDir = Files.createTempDirectory("graft_neardup_out").toString
    def runOnce(): Unit = {
      val q = CorpusIngest.nearDupMatches(
          CorpusIngest.readDocs(spark, dir), MinMatches)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray"
    Seq((1L, s"$base yankee", "en", "web", 155L),
        (2L, "completely unrelated text about spark physical plans", "en", "web", 52L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    runOnce()
    assert(spark.read.parquet(outDir).isEmpty) // nothing matches yet
    // batch 2 (separate run, recovered state): a near-copy of doc 1 —
    // only the LAST word differs, so 22 of 23 shingles are shared
    Seq((10L, s"$base zulu", "en", "web", 153L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    runOnce()
    val m = spark.read.parquet(outDir)
      .select("doc_id", "dup_of").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((10L, 1L)), s"got $m")
  }
}
