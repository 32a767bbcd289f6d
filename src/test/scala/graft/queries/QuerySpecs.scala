package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}
import graft.functions.XHash
import graft.operators.TextOps

/** Cross-cutting quality properties the DuckDB hash-compare can't express:
  * sketch accuracy bounds, LSH recall against ground truth, and the
  * cross-engine hash contract.
  */
class QuerySpecs extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracle key exists") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // spot-run a sample cheaply at the smallest SF
    Seq("q1_pricing_summary", "d2_minhash_lsh", "s1_cosine_topk", "m1_media_meta")
      .foreach(n => assert(qs(n)(spark, sf).count() > 0, n))
  }

  test("approx_count_distinct lands within configured error of exact") {
    val approx = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.1,
        s"$k: approx=${approx(k)} exact=$ex")
    }
    // the declared query gates the same bound in-row: every *_ok true
    SparkEntry.queries("q19_approx_distinct")(spark, sf).collect()
      .foreach(r => assert(r.getBoolean(3) && r.getBoolean(4), r.toString))
  }

  test("approx_percentile lands within relative error of exact") {
    val approx = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr(
        // q34's shipped accuracy (1000): rank error 0.1% of the group —
        // far inside the 5% value gate below, at a tenth the sketch
        // state of the 10000 default (the partial-agg buffer each
        // partition serializes scales with accuracy)
        "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)")
        .as("aps"))
      .select(col("l_returnflag"), element_at(col("aps"), 1),
        element_at(col("aps"), 2), element_at(col("aps"), 3))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = SparkEntry.queries("q20_percentiles")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (k, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(k)
      Seq((a50, p50), (a90, p90), (a99, p99)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.05, s"$k: approx=$a exact=$e")
      }
    }
    // the declared query gates the same bound in-row: every *_ok true
    SparkEntry.queries("q34_approx_percentiles")(spark, sf).collect()
      .foreach(r =>
        assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
          r.toString))
  }

  test("XHash matches the DuckDB-computable definition (fixed vector)") {
    // '0x' || substr(md5('hello'),1,15) == 419982666956583591 (DuckDB-checked)
    val got = spark.range(1)
      .select(XHash.hash60(lit("hello"))).head.getLong(0)
    assert(got == 419982666956583591L)
  }

  test("MinHash-LSH candidates achieve full recall on high-jaccard pairs") {
    // ground truth: all-pairs shingle jaccard >= 0.9 at sf0.001
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val truth = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")).cast("double"))
      .filter(col("jac") >= 0.9)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("d2_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val missed = truth -- cand
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${truth.size} true pairs")
  }

  test("d15 edit-distance lens separates in-place edits from reorderings") {
    import spark.implicits._
    // three doc families, each pair sharing nearly all shingles so the LSH
    // candidate pass keeps them: (a) an in-place single-word edit — high
    // edit_sim; (b) a block swap (same bag of words, big positional
    // displacement) — the case bag-of-shingles Jaccard cannot see but
    // Levenshtein penalizes; (c) an exact duplicate — edit_sim 1.0.
    val w = (0 until 60).map(i => s"tok$i")
    val base = w.mkString(" ")
    val edited = (w.updated(30, "CHANGED")).mkString(" ")
    val swapped = (w.drop(30) ++ w.take(30)).mkString(" ")
    val docs = Seq(
      (1L, base), (2L, edited), (3L, swapped), (4L, base)
    ).toDF("doc_id", "text")
    val got = DedupQueries.editDistancePairs(docs, nHint = 4L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(4)))).toMap
    spark.catalog.clearCache()
    // exact dup: distance 0, sim 1.0
    assert(got((1L, 4L)) == ((0L, 1.0)))
    // in-place edit: distance = |"CHANGED"| vs |"tok30"| replacement cost
    val (dEdit, sEdit) = got((1L, 2L))
    assert(dEdit > 0L && sEdit > 0.95,
      s"in-place edit should score high: dist $dEdit sim $sEdit")
    // block swap shares the full vocabulary but displaces every token:
    // the position-sensitive lens must rank it clearly below the edit
    val sSwap = got.get((1L, 3L)).map(_._2)
    assert(sSwap.forall(_ < sEdit),
      s"reordering must score below in-place edit: swap $sSwap vs edit $sEdit")
  }

  test("quantized cosine tracks float cosine within 1e-4") {
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"),
        TextOps.quantize(col("embedding")).as("q"))
    val both = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        TextOps.qcosine(col("a.q"), col("b.q")).as("qcos"),
        (aggregate(zip_with(col("a.embedding"), col("b.embedding"),
          (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, v) => s + v) /
          (sqrt(aggregate(transform(col("a.embedding"),
            x => x.cast("double") * x.cast("double")), lit(0.0), (s, v) => s + v)) *
            sqrt(aggregate(transform(col("b.embedding"),
              x => x.cast("double") * x.cast("double")), lit(0.0), (s, v) => s + v))))
          .as("fcos"))
      .select(max(abs(col("qcos") - col("fcos"))).as("maxerr"))
      .head.getDouble(0)
    assert(both < 1e-4, s"quantization error $both")
  }
}
