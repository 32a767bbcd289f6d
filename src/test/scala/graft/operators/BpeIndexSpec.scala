package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables, TestSpark}
import graft.queries.TextQueries

/** BPE tokenizer artifact contract (r10 verdict #7, the DedupIndexSpec
  * pattern): loaded merge table ≡ the inline t13 training, encode from
  * the loaded artifact ≡ the inline t15 gate on the training corpus,
  * and — the reason the artifact exists — encoding a NEW corpus uses
  * the FROZEN stored merges, not merges retrained on that corpus. */
class BpeIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"bpeix_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("loaded merges == inline t13; encode-from-loaded == inline t15") {
    val dir = tmp("build")
    val mf = BpeIndex.build(docs, dir)
    assert(mf.family == "bpe" && mf.params("rounds") == 3L && mf.n > 0)
    val ix = BpeIndex.load(spark, dir)
    assert(ix.manifest == mf)
    val gateTrain = rows(SparkEntry.queries("t13_bpe_train")(spark, sf))
    spark.catalog.clearCache()
    assert(rows(ix.merges).nonEmpty && rows(ix.merges) == gateTrain)
    val gateEncode = rows(SparkEntry.queries("t15_bpe_encode")(spark, sf))
    spark.catalog.clearCache()
    assert(rows(BpeIndex.encodeFrom(docs, ix)) == gateEncode,
      "encode from the loaded artifact must equal the inline gate")
  }

  test("a new corpus encodes under the FROZEN tokenizer, not a retrained one") {
    val dir = tmp("frozen")
    BpeIndex.build(docs, dir)
    val ix = BpeIndex.load(spark, dir)
    val newCorpus = docs.filter(col("doc_id") % 7 === 3)
    // frozen semantics: stored merges applied to the new corpus
    val frozen = rows(BpeIndex.encodeFrom(newCorpus, ix))
    val wantFrozen = rows(TextQueries.bpeEncodeWith(newCorpus,
      TextQueries.bpeTrainOn(docs), 3))
    assert(frozen.nonEmpty && frozen == wantFrozen)
    // and the stored merges are the full-corpus ones, not the subset's
    // (retraining on the subset picks different top pairs here — if it
    // ever coincided, this assert would vacuously pass; the identity
    // above is the load-bearing one)
    spark.catalog.clearCache()
  }

  test("foreign directory refuses loudly") {
    val dir = tmp("foreign")
    val emb = Tables.embeddings(spark, sf)
    AnnIndex.buildSq(emb, dir, Tables.EmbeddingDim,
      Tables.embeddingsRows(spark, sf))
    val e = intercept[IllegalArgumentException](BpeIndex.load(spark, dir))
    assert(e.getMessage.contains("expected 'bpe'"))
  }
}
