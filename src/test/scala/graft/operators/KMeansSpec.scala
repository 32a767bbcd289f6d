package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** KMeans: the determinism pitfalls this operator exists to avoid are
  * pinned here — floor division on NEGATIVE centroid sums (Spark `div`
  * truncates toward zero; the operator's pmod form must floor, matching
  * the oracle's `//`), argmin tie-breaks, and recovery of planted
  * clusters under Lloyd rounds.
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("update centroids are elementwise FLOOR(sum/count), negatives included") {
    // two members in one cell with sums (-3, 3, -1): floor means with
    // m=2 are (-2, 1, -1) — truncation would give (-1, 1, 0)
    val prepared = KMeans.prepare(emb(
      0L -> Seq(-1.0f, 2.0f, -0.5f),
      1L -> Seq(-2.0f, 1.0f, -0.5f)))
    // force both vectors into one cell: a single centroid
    val cent = prepared.limit(1)
      .select(col("vec_id").as("cid"), col("q").as("c"), col("nn").as("cnn"))
    val updated = KMeans.update(KMeans.assign(prepared, cent))
      .select("c").as[Seq[Long]].collect()
    assert(updated.length == 1)
    assert(updated.head == Seq(-1500000L, 1500000L, -500000L))
    // and a case where the sum is NOT exactly divisible: floor(-3/2)=-2
    val prepared2 = KMeans.prepare(emb(
      0L -> Seq(-1.0e-6f, 0f, 0f),  // quantizes to -1
      1L -> Seq(-2.0e-6f, 0f, 0f))) // quantizes to -2
    val cent2 = prepared2.limit(1)
      .select(col("vec_id").as("cid"), col("q").as("c"), col("nn").as("cnn"))
    val up2 = KMeans.update(KMeans.assign(prepared2, cent2))
      .select("c").as[Seq[Long]].collect()
    assert(up2.head.head == -2L, s"floor(-3/2) must be -2, got ${up2.head.head}")
  }

  test("assignment picks the nearest centroid, ties break on smaller cid") {
    val prepared = KMeans.prepare(emb(5L -> Seq(0.0f, 0.0f)))
    // two centroids equidistant from the origin point
    val cents = Seq(
      (10L, Seq(1000000L, 0L), 1000000L * 1000000L),
      (7L, Seq(-1000000L, 0L), 1000000L * 1000000L))
      .toDF("cid", "c", "cnn")
    val got = KMeans.assign(prepared, cents)
      .select("cell").as[Long].collect()
    assert(got.toSeq == Seq(7L))
  }

  test("planted separated clusters are recovered by one Lloyd round") {
    // 20 vectors in two tight blobs around (+1,+1) and (-1,-1); seeds
    // are hash-strided so may start unbalanced — one update must land
    // one centroid in each blob and assign every member to its blob
    val rows = (0L until 20L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      val jitter = (i % 5).toFloat * 1e-3f
      i -> Seq(s + jitter, s - jitter)
    }
    val prepared = KMeans.prepare(emb(rows: _*))
    val (asg, _) = KMeans.fit(prepared, k = 2, updates = 1)
    val byCell = asg.select("cell", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2 % 2).toSet).toMap
    // every cell is pure: all-even (blob +) or all-odd (blob −)
    assert(byCell.values.forall(_.size == 1),
      s"a cell mixes the two blobs: $byCell")
  }

  test("fit(updates = 0) equals a single assign against the seeds") {
    val rows = (0L until 12L).map(i => i -> Seq(i.toFloat, (i % 3).toFloat))
    val prepared = KMeans.prepare(emb(rows: _*))
    val seeds = KMeans.init(prepared, k = 3)
    val direct = KMeans.assign(prepared, seeds)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val (asg, _) = KMeans.fit(prepared, k = 3, updates = 0)
    val fitted = asg.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(direct == fitted)
  }
}
