package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.operators.{AnnIndex, DedupIndex}

/** Orchestrated-ingest walls at REALISTIC crawl-batch sizes (r15
  * verdict #3): every OrchestratedOctave row ingests 8-doc batches —
  * fine for pinning the commit-machinery floor, but production crawl
  * batches are 10k–100k docs. This bench ingests batches of 8 / 1k /
  * 10k / 100k docs into a full artifact surface (dedup + ivfpq +
  * published corpus) built from the fixture, and reports wall and
  * wall-per-doc per size. The claim under test: ingestAll scales with
  * the INCREMENT (the dedup append leg is bipartite increment×corpus,
  * the ANN append assigns the increment against frozen quantizers,
  * the corpus publish writes the increment) on top of a fixed
  * per-batch commit floor — so wall(n) ≈ floor + n·slope, and
  * micro-batch sizing is floor-amortization arithmetic, not a cliff.
  *
  *   runMain graft.bench.IngestBatchBench [fixtureDir] [sizesCsv]
  *
  * fixtureDir: a ScaleFixture output
  * (SPARK_GRAFT_FIXTURE_TABLES=documents,embeddings, factor 100) for
  * the 100× row (500k docs / 200k vectors). Batches need embeddings,
  * so sizes are capped by the fixture's doc⋈vec id overlap. */
object IngestBatchBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes = args.lift(1).getOrElse("8,1000,10000,100000")
      .split(',').map(_.trim.toLong).filter(_ > 0)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val parts = scala.collection.mutable.ListBuffer[String]()

    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val (nDocs, nEmb) = (docs.count(), emb.count())
    parts += s""""documents":$nDocs,"embeddings":$nEmb"""

    val dedupDir = java.nio.file.Files
      .createTempDirectory("ib_dedup").toString
    DedupIndex.build(docs, dedupDir, nDocs)
    spark.catalog.clearCache()
    val annDir = java.nio.file.Files
      .createTempDirectory("ib_ivfpq").toString
    AnnIndex.buildIvfPq(emb, annDir, graft.Tables.EmbeddingDim,
      m = 8, k = 64, nHint = nEmb)
    spark.catalog.clearCache()
    val corpusDir = java.nio.file.Files
      .createTempDirectory("ib_corpus").toString
    docs.select(col("doc_id"), col("text")).write.mode("overwrite")
      .parquet(s"$corpusDir/batch-seed")

    // crawl base: docs that HAVE an embedding (the orchestrated sink's
    // input shape), materialized once so batch slicing is not billed
    val crawlBase = docs.select(col("doc_id"), col("text"))
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxBatch = crawlBase.count()
    parts += s""""crawl_pool":$maxBatch"""

    var batchId = 1000L
    var salt = 2000000000L
    sizes.filter(_ <= maxBatch).foreach { size =>
      // min-of-2 on disjoint id/batch pairs (mutations are not
      // idempotent, so repetitions use fresh ids instead of replays)
      val wall = (0 until 2).map { _ =>
        val crawl = crawlBase.limit(size.toInt)
          .withColumn("doc_id", col("doc_id") + lit(salt))
        salt += 10000000L
        batchId += 1
        val (_, s) = timed(graft.Graft.ingestAll(spark, crawl,
          batchId, Seq(dedupDir), Seq(annDir), Seq(corpusDir)))
        spark.catalog.clearCache()
        s
      }.min
      parts += s""""ingest_${size}_sec":${f(wall)}"""
      parts += s""""ingest_${size}_ms_per_doc":${f(wall * 1000 / size)}"""
    }
    crawlBase.unpersist()
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
