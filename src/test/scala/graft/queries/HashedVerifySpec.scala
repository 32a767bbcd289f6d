package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The r16 one-pass rewire's exactness gate: [[DedupQueries.jaccardPairs]]
  * and [[DedupQueries.containmentPairs]] now verify on the pinned
  * hashed-shingle table (one shingle+md5 pass, 8-byte set elements)
  * instead of re-shingling corpus text and intersecting ~25-byte strings.
  * The claim — |hs| = |sh| because [[graft.operators.TextOps.shingles]]
  * is DISTINCT, and hash-set intersections equal string-set intersections
  * under the library-wide md5-60 representation (the d11 contract) — is
  * pinned here row-for-row against the retained string-verify twin, so a
  * future shingle change that reintroduces duplicates (or a hash-width
  * change) fails this spec instead of silently skewing `uni`. */
class HashedVerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(df.columns.map(col): _*).collect().toSeq

  test("hashed one-pass jaccardPairs equals the string two-pass verify") {
    val docs = Tables.documents(spark, sf)
    val n = Tables.documentsRows(spark, sf)
    val hashed = DedupQueries.jaccardPairs(docs, n)
    // the pre-r16 shape: string shingle verify over the same candidates
    val cand = DedupQueries.candidatesFromSigArr(
      DedupQueries.minhashSigArrFromHashes(
        DedupQueries.hashedShingleSets(docs)), n)
    val strings = DedupQueries.jaccardVerify(cand, docs, n)
    assert(sortedRows(hashed) == sortedRows(strings))
    spark.catalog.clearCache()
  }

  test("hashed containmentPairs equals a string containment verify") {
    val docs = Tables.documents(spark, sf)
    val n = Tables.documentsRows(spark, sf)
    val hashed = DedupQueries.containmentPairs(docs, nHint = n)
    val sh = docs
      .select(col("doc_id"), graft.operators.TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val cand = DedupQueries.candidatesFromSigArr(
      DedupQueries.minhashSigArrFromHashes(
        DedupQueries.hashedShingleSets(docs)), n)
    val strings = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("bigint"))
      .withColumn("n_a", size(col("sh_a")).cast("bigint"))
      .withColumn("n_b", size(col("sh_b")).cast("bigint"))
      .withColumn("cont_a", col("inter").cast("double") / col("n_a").cast("double"))
      .withColumn("cont_b", col("inter").cast("double") / col("n_b").cast("double"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= 0.6)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "cont_a", "cont_b")
    assert(sortedRows(hashed) == sortedRows(strings))
    spark.catalog.clearCache()
  }
}
