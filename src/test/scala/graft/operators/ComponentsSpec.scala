package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Components: pointer jumping must handle graph shapes plain label
  * propagation cannot reach within the round cap — the d7 query only
  * ever sees clique-shaped dedup graphs, so the adversarial diameters
  * are pinned here against a driver-side union-find oracle.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 300-node chain converges within the round cap (log-diameter)") {
    // plain propagation needs 300 rounds; pointer jumping ~log2(300)
    val chain = (0L until 299L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("random multi-component graphs match union-find") {
    val rnd = new scala.util.Random(77)
    (1 to 3).foreach { trial =>
      val n = 120
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val got = run(edges)
      // Components only labels nodes that appear in edges
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got == expected.filter(kv => touched.contains(kv._1)), s"trial $trial")
    }
  }

  test("an empty edge list yields an empty labeling (no NPE on empty agg)") {
    assert(run(Seq.empty).isEmpty)
  }

  test("leaves no pinned storage behind after suite-level cleanup") {
    run((0L until 50L).map(i => (i, i + 1)))
    spark.catalog.clearCache()
    // facade localCheckpoint RDDs from other suites in the shared session
    // are by-design storage (owned by their DataFrames, GC-collected);
    // the contract here is that the fixpoint's OWN persists are released
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.toString.contains("localCheckpoint"))
    assert(leaked.isEmpty, leaked.map(_.toString).mkString(", "))
  }
}
