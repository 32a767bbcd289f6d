package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The d5 scale story at PRODUCTION parameters: real near-dup corpora are
  * deduped at cosine ≥ ~0.9, where the banded signature uses NARROW bands
  * (many bits) — random pairs collide in a band with probability ≈ 2^-bits
  * while true near-dups still share one. The declared d5 query runs wide
  * bands because its gate threshold is a low 0.45; this spec pins the
  * narrow-band behavior the operator family claims at scale: planted
  * near-duplicates are all recalled while the candidate set stays a tiny
  * fraction of all pairs.
  */
class DedupScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("d11 containment: planted quote-inclusions recalled 100% where LSH misses") {
    import spark.implicits._
    // 20 long docs of 200 distinct words each (no sharing across docs),
    // plus 20 short docs that each quote 15 consecutive words of one long
    // doc: Jaccard = 13/198 ≈ 0.066 (<0.2) but containment(short→long)=1.0
    // — the exact small-inside-large case the round-3 verdict flagged.
    val longDocs = (0 until 20).map { d =>
      (d.toLong, (0 until 200).map(i => s"w${d}x$i").mkString(" "))
    }
    val shortDocs = (0 until 20).map { d =>
      (1000L + d, (50 until 65).map(i => s"w${d}x$i").mkString(" "))
    }
    val docs = (longDocs ++ shortDocs).toDF("doc_id", "text")
    val expected = (0 until 20).map(d => (d.toLong, 1000L + d)).toSet

    val full = DedupQueries.containmentJoin(docs, theta = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(full == expected,
      s"prefix-filter containment must recall exactly the planted pairs: $full")
    // cont for the short side must be exactly 1.0 (full inclusion)
    val conts = DedupQueries.containmentJoin(docs, theta = 0.9)
      .collect().map(r => math.max(r.getDouble(5), r.getDouble(6)))
    spark.catalog.clearCache()
    assert(conts.forall(_ == 1.0))

    // the d9 shared-LSH variant structurally misses these pairs: a band
    // matches with p ≈ J^rows ≈ 0.066^4 ≈ 2e-5 — deterministic hashes, so
    // on this corpus it finds none of them (the gap d11 closes)
    val viaLsh = DedupQueries.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(viaLsh.intersect(expected).isEmpty,
      "corpus no longer demonstrates the LSH containment gap")
  }

  test("d11 boundary pair: exactly-θ containment at θ=0.9 is still a candidate") {
    import spark.implicits._
    // 12 tokens → 10 word-3-gram shingles; B differs from A only in the
    // last token, so |A∩B| = 9 of 10 and cont = 9.0/10.0 which clears the
    // θ=0.9 verify in IEEE double. With only these two docs each doc's
    // single RAREST shingle (df=1) is precisely the one the other doc is
    // missing — the adversarial layout for a prefix that is too short.
    // The old k = ⌊fl(1.0−0.9)·10⌋+1 = 1 (fl(0.1) < 0.1) deterministically
    // missed this pair; the predicate-derived k = n_sh − minInter + 1 = 2
    // must recall it.
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = ((1 to 11).map(i => s"w$i") :+ "zz").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = DedupQueries.containmentJoin(docs, theta = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(got == Set((1L, 2L)),
      s"θ-boundary pair must survive the prefix filter: got $got")
  }

  test("narrow-band LSH: full recall on planted near-dups, tiny candidate set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_d5prod").toString
    val src = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    // plant 5 near-duplicates: tiny additive perturbation => cosine ~0.999
    val planted = src.filter(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
    src.unionAll(planted).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val bands = 8
    val rowBits = 16
    val pairs = DedupQueries.embNearDupBanded(
      Tables.embeddings(spark, dir), bands, rowBits, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 5L).map(i => (i, i + 100000L)).toSet
    assert(pairs == expected,
      s"planted pairs must be exactly the result: got $pairs")

    // candidate volume: narrow bands must prune, not enumerate. Rebuild
    // the candidate stage alone and compare against all pairs (505*504/2).
    val dim = 64
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        graft.operators.TextOps.quantize(col("embedding")).as("q"))
    val bandStructs = (0 until bands).map { b =>
      val sig = (0 until rowBits).map { j =>
        when(graft.operators.TextOps.qdot(col("q"),
          lit(DedupQueries.d5Weights(dim, b, j))) > 0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band_idx"), sig.as("band_sig"))
    }
    val bandRows = e.select(col("vec_id"),
        explode(array(bandStructs: _*)).as("band"))
      .select(col("vec_id"), col("band.band_idx"), col("band.band_sig"))
    val nCand = bandRows.as("a").join(bandRows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
    val allPairs = 505L * 504L / 2L
    assert(nCand < allPairs / 20,
      s"narrow bands kept $nCand of $allPairs pairs — not pruning")
  }
}
