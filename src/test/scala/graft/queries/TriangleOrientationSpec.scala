package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Degree orientation for p2's triangle enumeration (r7 verdict #5): on
  * a power-law similarity graph, orienting edges by node ID leaves a
  * low-ID hub as the SOURCE of all its edges, so the wedge join fans out
  * C(deg, 2) candidate rows from that single node. Orienting by
  * (degree, id) points every hub edge INTO the hub — the wedge count is
  * then bounded by the arboricity-style Σ over low-degree endpoints,
  * the standard distributed-triangle bound. This spec measures both
  * orientations on a planted hub and pins the invariance of the final
  * per-node counts.
  */
class TriangleOrientationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Star with hub id 20 — MEDIAN of the id order, the id-orientation
    * worst case: the hub keeps ~d/2 in-edges and ~d/2 out-edges, so it
    * is the middle of (d/2)² wedges. Leaves 0..19 and 21..40, plus one
    * leaf-leaf edge (1,2) to close a single triangle (1, 2, 20). */
  private val Hub = 20L
  private def hubGraph = {
    import spark.implicits._
    (((0 to 40).filter(_ != Hub).map(i => (i.toLong, Hub)) :+ (1L, 2L)))
      .toDF("doc_a", "doc_b")
  }

  test("planted hub: degree orientation collapses the wedge volume") {
    val g = hubGraph
    // id orientation (the pre-r8 form): 20 in-edges x 20 out-edges
    // through the hub -> 400 hub wedges
    val idOriented = g.select(
      least(col("doc_a"), col("doc_b")).as("src"),
      greatest(col("doc_a"), col("doc_b")).as("dst"))
    val idWedges = DedupQueries.orientedWedges(idOriented).count()
    assert(idWedges >= 400L,
      s"id orientation should fan the hub out to >=400 wedges, got $idWedges")
    // degree orientation: every hub edge points INTO the hub; the only
    // wedge sources are degree<=2 leaves
    val degOriented = DedupQueries.degreeOriented(g)
    val degWedges = DedupQueries.orientedWedges(degOriented).count()
    assert(degWedges <= 3L,
      s"degree orientation must bound hub fan-out, got $degWedges wedges")
    // both orientations enumerate the SAME single triangle
    assert(DedupQueries.orientedTriangleCounts(degOriented)
      .agg(sum(col("n_tri"))).head().getLong(0) == 3L) // 3 nodes x 1 tri
    assert(DedupQueries.orientedTriangleCounts(idOriented)
      .agg(sum(col("n_tri"))).head().getLong(0) == 3L)
  }

  test("per-node counts are orientation-invariant (oracle parity contract)") {
    import spark.implicits._
    // K4 plus a pendant: known counts — each K4 node is in C(3,2)=3
    // triangles, pendant in 0
    val k4 = (for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield (a.toLong, b.toLong)) :+ (4L, 9L)
    val g = k4.toDF("doc_a", "doc_b")
    val byDeg = DedupQueries.triangleCounts(g).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val idOriented = g.select(
      least(col("doc_a"), col("doc_b")).as("src"),
      greatest(col("doc_a"), col("doc_b")).as("dst"))
    val byId = DedupQueries.orientedTriangleCounts(idOriented).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byDeg == byId, s"$byDeg vs $byId")
    assert(byDeg(1L) == (3L, 3L) && byDeg(4L) == (4L, 3L) &&
      byDeg(9L) == (1L, 0L))
  }
}
