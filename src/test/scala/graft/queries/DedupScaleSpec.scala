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

  test("pre-flight guard: demo-regime banding on a large corpus refuses before any job") {
    // the round-4 100× lesson as a spec: d5's demo config (32 bands × 4
    // bits at θ=0.45) on a big corpus expects ~n² chance candidates and
    // filled the disk twice before being killed. The guard must refuse at
    // PLAN-BUILD time. The poison UDF proves no task ever evaluated a row
    // (it would surface as a SparkException, not the guard's
    // IllegalArgumentException), and the job group proves no job — not
    // even a count — was submitted when nHint and dim are supplied.
    val sc = spark.sparkContext
    val poison = udf((id: Long) => {
      throw new RuntimeException("a task evaluated the guarded frame"); id
    })
    val emb = spark.range(500000L).select(col("id").as("vec_id"),
      array(poison(col("id")).cast("float"), lit(0f)).as("embedding"))
    sc.setJobGroup("d5guard", "pre-flight guard spec", true)
    try {
      val ex = intercept[IllegalArgumentException] {
        DedupQueries.embNearDupBanded(emb, DedupQueries.D5Bands,
          DedupQueries.D5Rows, threshold = 0.45, dim = 2, nHint = 500000L)
      }
      assert(ex.getMessage.contains("autoBandParams(500000, 0.45)"),
        s"guard error must name the fix: ${ex.getMessage}")
      Thread.sleep(300) // status store is listener-fed (async)
      assert(sc.statusTracker.getJobIdsForGroup("d5guard").isEmpty,
        "guard must fire before any job is submitted")
    } finally sc.clearJobGroup()

    // force = true passes the guard; since r8 the pinned stages then
    // MATERIALIZE at build (CacheDisciplineSpec contract), so building
    // on the poison frame evaluates it — the surfaced error being the
    // POISON (a SparkException), not the guard's IllegalArgumentException,
    // proves force bypassed the guard and nothing short-circuited it
    val forcedEx = intercept[org.apache.spark.SparkException] {
      DedupQueries.embNearDupBanded(emb, DedupQueries.D5Bands,
        DedupQueries.D5Rows, threshold = 0.45, dim = 2, nHint = 500000L,
        force = true)
    }
    assert(forcedEx.getMessage.contains("a task evaluated the guarded frame"))
    spark.catalog.clearCache()
    // ...and on a real frame the forced build yields the d5 contract
    val tiny = spark.range(8L).select(col("id").as("vec_id"),
      array(col("id").cast("float"), lit(1f)).as("embedding"))
    val forced = DedupQueries.embNearDupBanded(tiny, DedupQueries.D5Bands,
      DedupQueries.D5Rows, threshold = 0.45, dim = 2, nHint = 500000L,
      force = true)
    assert(forced.columns.toSeq == Seq("vec_a", "vec_b", "cosine"))
    spark.catalog.clearCache()

    // the facade guards too, and without nHint it derives n itself
    val ex2 = intercept[IllegalArgumentException] {
      graft.Graft.embeddingNearDups(
        spark.range(500000L).select(col("id").as("vec_id"),
          array(lit(1f), lit(0f)).as("embedding")), dim = 2)
    }
    assert(ex2.getMessage.contains("autoBandParams"))

    // auto-tuned configs stay far inside the budget across decades — the
    // guard never blocks the path it recommends
    for (n <- Seq(1e4, 1e6, 1e8); t <- Seq(0.8, 0.9, 0.95)) {
      val (b, bits) = DedupQueries.autoBandParams(n.toLong, t)
      assert(DedupQueries.expectedChanceCandidates(n.toLong, b, bits) <=
        DedupQueries.DefaultCandidateBudget,
        s"autoBandParams($n, $t) = ($b, $bits) busts the guard budget")
    }
  }

  test("autoBandParams solves the band cap: recall contract holds across the envelope") {
    // r5 advice #2: the cap must be SOLVED (rowBits descends until fewer,
    // more-permissive bands reach the target inside the cap and the
    // guard budget), not merely described. The r4 advisor's two broken
    // points — (t=0.7, n=1e5) achieved ~0.39 and (t=0.8, n=1e6) ~0.56 —
    // must now meet the 0.9 contract.
    // closed-form twin of the solver's feasibility test: does ANY
    // (bands ≤ 128, in-budget) width reach the target at this (n, t)?
    def solvable(n: Long, t: Double): Boolean = (6 to 30).exists { bits =>
      val q = math.pow(1.0 - math.acos(t) / math.Pi, bits)
      val bands = math.ceil(math.log(10.0) / -math.log1p(-q))
      bands <= 128 && DedupQueries.expectedChanceCandidates(
        n, bands.toInt, bits) <= DedupQueries.DefaultCandidateBudget
    }
    for (t <- Seq(0.7, 0.75, 0.8, 0.85, 0.9);
         n <- Seq(1000L, 10000L, 100000L, 1000000L)) {
      val (b, bits) = DedupQueries.autoBandParams(n, threshold = t)
      val r = DedupQueries.bandedRecallAt(b, bits, t)
      assert(b >= 1 && b <= 128, s"($n, $t): bands $b outside the cap")
      assert(DedupQueries.expectedChanceCandidates(n, b, bits) <=
        DedupQueries.DefaultCandidateBudget,
        s"($n, $t) = ($b, $bits): solved config busts the guard budget")
      if (solvable(n, t))
        assert(r >= 0.9, s"($n, $t) = ($b, $bits): achieved recall $r < 0.9")
      else // only (t=0.7, n=1e6) in this sweep — 102 bands at 13 bits
           // would reach 0.9 but needs 6.2e9 chance candidates, 3× budget
        assert(r >= 0.75,
          s"($n, $t): infeasible point must still maximize recall, got $r")
    }
    assert(!solvable(1000000L, 0.7) && solvable(562000L, 0.7),
      "the t=0.7 feasibility boundary sits between n=5.6e5 and 1e6")
    // the two r4 advisor points now MEET the contract
    val (ba, bitsA) = DedupQueries.autoBandParams(100000L, threshold = 0.7)
    assert(DedupQueries.bandedRecallAt(ba, bitsA, 0.7) >= 0.9)
    val (bb, bitsB) = DedupQueries.autoBandParams(1000000L, threshold = 0.8)
    assert(DedupQueries.bandedRecallAt(bb, bitsB, 0.8) >= 0.9)
    // inside the old envelope the default width already fits the cap and
    // the derived config is unchanged (no needless bit descent)
    val (b3, bits3) = DedupQueries.autoBandParams(5000000L, threshold = 0.9)
    assert(b3 < 128, "t=0.9, n=5e6 is inside the envelope")
    assert(bits3 == 25, "default rowBits = ceil(log2 n) + 2 when the cap does not bind")
    assert(DedupQueries.bandedRecallAt(b3, bits3, 0.9) >= 0.9)
    // where NO in-cap in-budget config reaches the target (very low
    // threshold at large n) the fallback maximizes achieved recall and
    // still respects both constraints — degraded, never runaway
    val (b4, bits4) = DedupQueries.autoBandParams(1000000L, threshold = 0.3)
    assert(b4 >= 1 && b4 <= 128)
    assert(DedupQueries.expectedChanceCandidates(1000000L, b4, bits4) <=
      DedupQueries.DefaultCandidateBudget)
    assert(DedupQueries.bandedRecallAt(b4, bits4, 0.3) < 0.9,
      "t=0.3 at n=1e6 must be genuinely infeasible for this test to bite")
  }

  test("auto-banded signature compiles under janino's method limit (no fallback)") {
    // 50 bands × 20 bits ≈ the autoBandParams(500k, 0.9) width whose
    // UNROLLED projection crossed janino's 64 KB method limit at the 100×
    // octave and silently ran interpreted (~2× slower, BENCH_NOTES 100×
    // finding #2). The BandedSignatures loop expression keeps generated
    // code O(1) in bands×bits; codegen.fallback=false makes any compile
    // failure a hard error instead of a quiet ERROR log.
    val dim = 64
    val emb = spark.range(200L).select(col("id").as("vec_id"),
      array((0 until dim).map(i =>
        ((col("id") * (i + 3)) % 17 - 8).cast("float")): _*).as("embedding"))
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      DedupQueries.embNearDupBanded(emb, bands = 50, rowBits = 20,
        threshold = 0.9, dim = dim, nHint = 200L).collect()
    } finally {
      prev.fold(spark.conf.unset("spark.sql.codegen.fallback"))(v =>
        spark.conf.set("spark.sql.codegen.fallback", v))
      spark.catalog.clearCache()
    }
  }

  test("s4/d14: k ~ sqrt(n) keeps within-cell pairs n^1.5-class across a decade") {
    // SemDeDup's scale claim (r6 verdict #4 — the one d-family operator
    // without octave evidence): with k = ⌈√n⌉ cells the within-cell pair
    // volume is ~ n²/(2k) = n^1.5/2 for balanced cells. Two decades of
    // synthetic embeddings pin (a) the absolute bound with a 5× skew
    // allowance and (b) the decade growth ratio: n^1.5 predicts ~31.6×,
    // where a fixed-k (quadratic) clustering would grow ~100×.
    def candPairs(n: Long): Long = {
      val dim = 16 // operator is dim-agnostic; small dim keeps the spec fast
      val emb = spark.range(n).select(col("id").as("vec_id"),
        array((0 until dim).map(i =>
          ((pmod(xxhash64(col("id"), lit(i)), lit(2000L)).cast("double")
            / 1000.0) - 1.0).cast("float")): _*).as("embedding"))
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val (asg, _) = graft.operators.KMeans.fit(
        graft.operators.KMeans.prepare(emb), k, updates = 1, nHint = n)
      val pairs = asg.groupBy(col("cell")).agg(count(lit(1)).as("m"))
        .agg(sum(expr("m * (m - 1) div 2"))).head().getLong(0)
      spark.catalog.clearCache()
      pairs
    }
    def bound(n: Long): Double = 5.0 * math.pow(n.toDouble, 1.5) / 2.0
    val p2k = candPairs(2000L)
    val p20k = candPairs(20000L)
    assert(p2k.toDouble <= bound(2000L),
      s"n=2000: $p2k within-cell pairs busts the 5x-skew n^1.5 bound ${bound(2000L)}")
    assert(p20k.toDouble <= bound(20000L),
      s"n=20000: $p20k within-cell pairs busts the 5x-skew n^1.5 bound ${bound(20000L)}")
    val ratio = p20k.toDouble / p2k.toDouble
    assert(ratio < 50.0,
      s"decade growth $ratio is quadratic-class — cells are not absorbing scale")
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
