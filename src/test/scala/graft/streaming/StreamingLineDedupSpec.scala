package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.queries.DedupQueries

/** Streaming line-level dedup ≡ batch d17 (r10 verdict #6, the
  * StreamingNearDupSpec pattern at sub-document granularity): once
  * every document has flowed through — in three micro-batches with
  * nondecreasing doc ids — the per-doc (n_lines, n_kept, kept_fp)
  * rollup must equal the batch operator on the union corpus,
  * byte-exact kept-text fingerprints included. Cross-document
  * boilerplate lines are injected deterministically (the d17 gate's
  * own construction) and span the batch cuts, so the line state
  * provably carries across micro-batches.
  */
class StreamingLineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed rollup equals batch d17 across micro-batches") {
    val id = col("doc_id")
    val aug = concat(col("text"),
      when(id % 3 === 0,
        concat(lit("\nboilerplate-"), (id % 5).cast("string")))
        .otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit("\nfooter-"), (id % 3).cast("string")))
        .otherwise(lit("")))
    val docs = Tables.documents(spark, sf).withColumn("text", aug)
      .select("doc_id", "text")
    val n = Tables.documentsRows(spark, sf)

    val landing = Files.createTempDirectory("graft_linededup_in").toString
    docs.filter(id < n / 3).coalesce(1).write.mode("append").parquet(landing)
    docs.filter(id >= n / 3 && id < 2 * n / 3).coalesce(1)
      .write.mode("append").parquet(landing)
    docs.filter(id >= 2 * n / 3).coalesce(1)
      .write.mode("append").parquet(landing)

    val outDir = Files.createTempDirectory("graft_linededup_out").toString
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = CorpusIngest.lineDedupSink(stream, outDir,
      Files.createTempDirectory("graft_ckpt_linededup").toString)
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")

    val streamed = spark.read.parquet(s"$outDir/batch-*")
      .collect().map(_.toString).sorted.toSeq
    val batch = DedupQueries.lineDedupOn(docs)
      .collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache()
    assert(streamed.size == n, s"one rollup row per doc: ${streamed.size}")
    // the gate is meaningful only if lines actually deduplicated across
    // docs (n_kept < n_lines somewhere) — the injected boilerplate
    val dropped = spark.read.parquet(s"$outDir/batch-*")
      .filter(col("n_kept") < col("n_lines")).count()
    assert(dropped > 0, "injected boilerplate must be deduplicated")
    assert(streamed == batch,
      s"stream-only: ${(streamed.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- streamed.toSet).take(3)}")
  }
}
