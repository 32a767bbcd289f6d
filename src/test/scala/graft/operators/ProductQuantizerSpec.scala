package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ProductQuantizer: structural invariants of the code/codebook layout,
  * and the semantics that matter at scale — a STRONG neighbor (planted
  * high-cosine twin) survives compression: ADC proposes it, rerank
  * puts it at rank 1. (The weak-neighbor regime is gated separately in
  * SimilarityRecallSpec next to s2/s3 — recall there is a function of
  * the pair's cosine, not of the machinery.)
  */
class ProductQuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Dim = 64
  private val M = 8
  private val K = 16
  private val NQ = 8

  /** Deterministic corpus: 200 unit-ish base vectors (ids 100..299);
    * ids 0..7 are noisy twins of 100..107 (cosine ≈ 0.99). */
  private lazy val emb: DataFrame = {
    import spark.implicits._
    def base(id: Int): Array[Double] = {
      val r = new scala.util.Random(id * 7919 + 13)
      Array.fill(Dim)(r.nextGaussian())
    }
    val rows =
      (100 until 300).map { id => (id.toLong, base(id).map(_.toFloat).toSeq) } ++
        (0 until NQ).map { q =>
          val r = new scala.util.Random(q + 1)
          val v = base(100 + q).map(_ + 0.05 * r.nextGaussian())
          (q.toLong, v.map(_.toFloat).toSeq)
        }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val n = emb.count()
  private lazy val prepared = ProductQuantizer.prepare(emb, Dim, M)
  private lazy val fitOut = ProductQuantizer.fit(prepared, K, updates = 1, n)

  test("every vector gets exactly m codes; codebooks stay within k-ish") {
    val (codes, cb) = fitOut
    val perVec = codes.groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= M).count()
    assert(perVec == 0, "some vector is missing a subspace code")
    // hash-stride seeding targets ~k seeds per subspace; Lloyd can only
    // shrink cells to nothing, never add — bound with slack for stride
    // variance
    val sizes = cb.groupBy(col("sub")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    assert(sizes.length == M)
    assert(sizes.forall(s => s >= 2 && s <= 3L * K),
      s"codebook sizes out of range: ${sizes.mkString(",")}")
    // codes reference existing codebook entries only
    val orphans = codes.join(cb,
      codes("sub") === cb("sub") && codes("code") === cb("cid"), "left_anti")
    assert(orphans.count() == 0, "code points at a vanished centroid")
  }

  test("planted high-cosine twins survive compression: rank 1 after rerank") {
    val (codes, cb) = fitOut
    val queries = prepared.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("sub"), col("qs").as("qqs"))
    val cand = ProductQuantizer.adcTopK(codes, cb, queries, topK = 20)
    val vecs = emb.select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
    val qfull = vecs.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val top1 = ProductQuantizer.rerank(cand, vecs, qfull, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until NQ).foreach { q =>
      assert(top1.get(q.toLong).contains(100L + q),
        s"query $q: expected twin ${100 + q}, got ${top1.get(q.toLong)}")
    }
  }

  test("adc distances equal the replayed LUT sums (plumbing exactness)") {
    val (codes, cb) = fitOut
    val queries = prepared.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("sub"), col("qs").as("qqs"))
    val adc = ProductQuantizer.adcTopK(codes, cb, queries, topK = 5)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    // replay driver-side from collected codes + codebook + query subvecs
    val cbm = cb.collect().map(r => (r.getInt(0), r.getLong(1)) ->
      r.getSeq[Long](2)).toMap
    val qsub = queries.collect().map(r => r.getInt(1) -> r.getSeq[Long](2)).toMap
    val codeRows = codes.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byVec = codeRows.groupBy(_._1)
    adc.foreach { case (nid, adist) =>
      val expect = byVec(nid).map { case (_, sub, code) =>
        val c = cbm((sub, code)); val q = qsub(sub)
        q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      assert(adist == expect, s"vec $nid: adist $adist != replay $expect")
    }
  }
}
