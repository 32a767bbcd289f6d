package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-drift tolerance beyond events (the round-6 failure class,
  * generalized): a driver regeneration may change at-rest widths without
  * changing values — float32 embeddings becoming float64 (pyarrow's
  * default when a cast is forgotten) is the most plausible next one.
  * The engine's contract: every embedding consumer quantizes through
  * `CAST(v AS DOUBLE)` first (TextOps.quantize, mirrored in the SQL
  * oracle twin), so element width must not change ANY quantized value;
  * id-width changes coerce inside joins/aggs and never hit a hardcoded
  * accessor (all `getLong` sites read engine-computed values, audited
  * round 7). */
class CorpusDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("embeddings element-width drift (float->double) leaves quantized ops identical") {
    val dir = Files.createTempDirectory("graft_drift_emb").toString
    Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"),
        col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def sig(d: String): Array[(Long, Seq[Long])] =
      graft.operators.KMeans.prepare(Tables.embeddings(spark, d))
        .select(col("vec_id"), col("q"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
        .sortBy(_._1)
    assert(sig(dir).toSeq == sig(sf).toSeq,
      "quantized vectors must be bit-identical across element widths")

    // and a full operator built on them agrees end to end
    val pairs = graft.queries.DedupQueries.embNearDupBanded(
      Tables.embeddings(spark, dir), 8, 16, threshold = 0.9,
      dim = Tables.EmbeddingDim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = graft.queries.DedupQueries.embNearDupBanded(
      Tables.embeddings(spark, sf), 8, 16, threshold = 0.9,
      dim = Tables.EmbeddingDim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(pairs == expected)
  }

  test("documents id-width drift (int64->int32) coerces, never crashes") {
    val dir = Files.createTempDirectory("graft_drift_doc").toString
    Tables.documents(spark, sf)
      .withColumn("doc_id", col("doc_id").cast("int"))
      .withColumn("n_chars", col("n_chars").cast("int"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val narrow = graft.queries.DedupQueries.jaccardPairs(
      Tables.documents(spark, dir))
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val wide = graft.queries.DedupQueries.jaccardPairs(
      Tables.documents(spark, sf))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(narrow == wide)
  }
}
