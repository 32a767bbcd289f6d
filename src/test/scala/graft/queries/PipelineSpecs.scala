package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}
import graft.operators.TextOps

/** Semantic invariants of the training-pipeline family that the value
  * hash-compare can't express, plus the plan shapes their scale story
  * depends on.
  */
class PipelineSpecs extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q45 packing: token-count preserved, bins contiguous, starts within budget") {
    val budget = 2048L
    val bins = SparkEntry.queries("q45_sequence_pack")(spark, sf).collect()
    val totalPacked = bins.map(_.getLong(3)).sum // bin_tokens
    val totalTokens = Tables.documents(spark, sf)
      .select(size(TextOps.tokens(col("text"))).cast("bigint").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(totalPacked == totalTokens, "packing must not drop or double tokens")
    // bins per language are 0..maxBin contiguous (next-fit never skips)
    bins.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L,
        s"$lang bins not contiguous: ${ids.mkString(",")}")
    }
    // every bin's STARTING offset is inside its budget slot: all but the
    // last bin of a language span at least to the next boundary
    bins.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val byBin = rows.sortBy(_.getLong(1))
      val cums = byBin.map(_.getLong(3)).scanLeft(0L)(_ + _)
      byBin.zip(cums).foreach { case (r, startOffset) =>
        assert(startOffset / budget == r.getLong(1),
          s"$lang bin ${r.getLong(1)} starts at offset $startOffset")
      }
    }
  }

  test("d8 contamination: hits are real shared shingles, holdout excluded") {
    val hits = SparkEntry.queries("d8_contamination")(spark, sf).collect()
    assert(hits.nonEmpty, "fixture should contain contaminated docs at n=3")
    assert(hits.forall(_.getLong(0) % 97 != 0), "holdout docs must not self-report")
    // spot-verify one hit by recomputing its shingle intersection exactly
    val docId = hits.head.getLong(0)
    val nShared = hits.head.getLong(1)
    val docs = Tables.documents(spark, sf)
    val evalGrams = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(TextOps.shingles(col("text"))).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val docGrams = docs.filter(col("doc_id") === docId)
      .select(explode(TextOps.shingles(col("text"))).as("g"))
      .collect().map(_.getString(0)).toSet
    assert((docGrams & evalGrams).size.toLong == nShared)
  }

  test("t6 repetition fractions are in [0,1] and consistent with counts") {
    val rows = SparkEntry.queries("t6_repetition")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nTok, topN) = (r.getLong(1), r.getLong(2))
      val (topFrac, dupFrac) = (r.getDouble(3), r.getDouble(4))
      assert(topN >= 1 && topN <= nTok)
      assert(topFrac == topN.toDouble / nTok.toDouble)
      assert(dupFrac >= 0.0 && dupFrac < 1.0)
    }
  }

  test("q48 chunking: contiguous ids, full non-tail chunks, exact coverage") {
    val window = 64L; val stride = 48L
    val chunks = SparkEntry.queries("q48_chunks")(spark, sf).collect()
      .groupBy(_.getLong(0)) // doc_id
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("bigint"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == nTok.keySet, "every document must be chunked")
    chunks.foreach { case (doc, rows) =>
      val byIdx = rows.sortBy(_.getLong(1))
      val ids = byIdx.map(_.getLong(1))
      assert(ids.head == 0L && ids.last == ids.length - 1L,
        s"doc $doc chunk ids not contiguous")
      byIdx.foreach { r =>
        assert(r.getLong(2) == r.getLong(1) * stride) // start = idx*stride
        assert(r.getLong(3) >= 1 && r.getLong(3) <= window)
      }
      byIdx.dropRight(1).foreach(r =>
        assert(r.getLong(3) == window, s"doc $doc non-tail chunk not full"))
      val last = byIdx.last
      assert(last.getLong(2) + last.getLong(3) == nTok(doc),
        s"doc $doc chunks must cover exactly n_tok")
    }
  }

  test("q48 chunking: bad parameters fail fast instead of dropping long docs") {
    val docs = Tables.documents(spark, sf)
    // overlap >= window would make stride <= 0 -> null n_chunks under
    // non-ANSI semantics, silently losing every doc longer than `window`
    intercept[IllegalArgumentException](PipelineQueries.chunk(docs, 64L, 64L))
    intercept[IllegalArgumentException](PipelineQueries.chunk(docs, 64L, 80L))
    intercept[IllegalArgumentException](PipelineQueries.chunk(docs, 64L, -1L))
    intercept[IllegalArgumentException](PipelineQueries.chunk(docs, 0L, 0L))
  }

  test("t7 pii scrub: redaction removes every match, counts follow injection") {
    val rows = SparkEntry.queries("t7_pii_scrub")(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 5 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) == (if (id % 7 == 0) 1L else 0L), s"urls doc $id")
      assert(r.getLong(3) == (if (id % 11 == 0) 1L else 0L), s"phones doc $id")
    }
    // recompute the scrub and assert the cleaned text has NO residual match
    val id = col("doc_id")
    val aug = concat(col("text"),
      when(id % 5 === 0, concat(lit(" contact_"), id.cast("string"),
        lit("@example.com"))).otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" see https://example.org/d/"),
        id.cast("string"))).otherwise(lit("")),
      when(id % 11 === 0, concat(lit(" call 555-"),
        lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[A-Za-z0-9./_-]+"
    val phone = "555-[0-9]{4}"
    val clean = regexp_replace(regexp_replace(regexp_replace(aug,
      email, "<EMAIL>"), url, "<URL>"), phone, "<PHONE>")
    val residual = Tables.documents(spark, sf).select(
      (regexp_count(clean, lit(email)) + regexp_count(clean, lit(url)) +
        regexp_count(clean, lit(phone))).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(residual == 0L, "scrubbed text must contain no residual PII")
  }

  test("t8/t9: vocab ranks are a total order; tfidf keeps per-doc top-3") {
    val vocab = SparkEntry.queries("t8_vocab")(spark, sf).collect()
      .sortBy(_.getLong(3)) // rank
    assert(vocab.map(_.getLong(3)).toSeq == (1L to vocab.length).toSeq)
    vocab.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0)))
      case _ => ()
    }
    val tfidf = SparkEntry.queries("t9_tfidf")(spark, sf).collect()
    tfidf.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      assert(rows.length <= 3 &&
        rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq,
        s"doc $doc")
      rows.foreach(r => // score is the exact integer-scaled tf-idf
        assert(r.getLong(4) == r.getLong(2) * 1000000000L / r.getLong(3)))
    }
  }

  test("d10 keep_best: canonical doc is the largest member of its cluster") {
    val best = SparkEntry.queries("d10_keep_best")(spark, sf).collect()
    assert(best.nonEmpty, "fixture has near-dup clusters")
    val labels = SparkEntry.queries("d7_components")(spark, sf).collect()
      .groupBy(_.getLong(1)) // component -> members
    val chars = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(best.map(_.getLong(0)).toSet == labels.keySet,
      "one keeper per component")
    best.foreach { r =>
      val (comp, keepId, keepChars, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = labels(comp).map(_.getLong(0))
      assert(members.contains(keepId), s"keeper $keepId not in cluster $comp")
      assert(n == members.length && n >= 2)
      assert(keepChars == members.map(chars).max,
        s"cluster $comp keeper is not the longest member")
      // tie-break: among max-chars members, the smallest id wins
      assert(keepId == members.filter(m => chars(m) == keepChars).min)
    }
  }

  test("q49 mix: per-doc copy counts are exactly floor(rate)+hash fraction") {
    import spark.implicits._
    import graft.functions.XHash
    val docs = (0 until 300).map { i =>
      (i.toLong, s"dom${i % 3}", s"tok a b c d$i")
    }.toDF("doc_id", "source", "text")
    val rates = Map("dom0" -> 2300, "dom1" -> 500, "dom2" -> 0)
    val got = PipelineQueries.mixSample(docs, rates)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact expectation per doc from the same JVM-side hash the engine
    // uses: full copies + 1 iff hash falls under the fractional permille
    val expected = (0 until 300).flatMap { i =>
      val rate = rates(s"dom${i % 3}")
      val frac = if (XHash.hash60Local(i.toString) % 1000 < rate % 1000) 1 else 0
      val n = rate / 1000 + frac
      if (n > 0) Some(i.toLong -> n.toLong) else None
    }.toMap
    assert(got == expected)
    // sanity on the shape of the expectation itself: dom2 fully dropped,
    // dom0 docs appear 2 or 3 times, dom1 docs at most once
    assert(expected.keys.forall(_ % 3 != 2))
    assert(expected.collect { case (k, v) if k % 3 == 0 => v }
      .forall(n => n == 2L || n == 3L))
    val dom0Thirds = expected.collect { case (k, v) if k % 3 == 0 => v }
      .count(_ == 3L)
    assert(dom0Thirds > 10 && dom0Thirds < 90, // ~30% of 100, hash-spread
      s"fractional-epoch selection looks degenerate: $dom0Thirds/100")
  }

  test("d13 bloom prefilter: output identical to exact join, real pruning") {
    import spark.implicits._
    import graft.functions.{Bloom, BloomAgg, BloomContains}
    import graft.operators.TextOps
    import graft.functions.XHash
    // corpus of unique-token docs plus planted eval contamination: docs
    // 97/194 are the holdout; docs 1 and 5 quote 6 consecutive tokens of
    // eval doc 97 (-> exactly the quote's 4 interior 3-gram shingles
    // shared; boundary shingles mix in unique neighbors on both sides)
    val quote = (0 until 6).map(i => s"e0q$i")
    val docs = (0 until 250).map { i =>
      val toks =
        if (i == 97) quote ++ (0 until 24).map(j => s"e${i}q$j")
        else if (i == 194) (0 until 30).map(j => s"e${i}q$j")
        else if (i == 1 || i == 5) quote ++ (0 until 24).map(j => s"c${i}x$j")
        else (0 until 30).map(j => s"c${i}x$j")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val got = PipelineQueries.bloomDecontam(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact expectation: docs 1 and 5 share exactly the quote's 4
    // 3-gram shingles with exactly one eval doc
    assert(got == Set((1L, 4L, 1L), (5L, 4L, 1L)), got.toString)

    // pruning: corpus grams passing the bloom must be a tiny fraction —
    // non-contaminated docs' unique grams pass only as false positives
    val sh = docs.select(col("doc_id"),
        explode(TextOps.shingles(col("text"))).as("g"))
      .select(col("doc_id"), XHash.hash60(col("g")).as("gh"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
    val corpus = sh.filter(col("doc_id") % 97 =!= 0)
    val bloom = ev.agg(BloomAgg.agg(Bloom.DefaultBits)(col("gh")).as("bf"))
      .select(col("bf.words").as("bw"))
    val total = corpus.count()
    val passed = corpus.crossJoin(broadcast(bloom))
      .filter(BloomContains(col("bw"), col("gh"))).count()
    // ~56 eval grams in 2^20 bits -> FP rate is essentially zero; allow
    // slack for a handful of collisions
    assert(passed <= total / 100,
      s"bloom passed $passed of $total corpus grams — not pruning")
    // no false negatives, directly: every eval gram probes true
    val evSelf = ev.crossJoin(broadcast(bloom))
      .filter(!BloomContains(col("bw"), col("gh"))).count()
    assert(evSelf == 0L, "bloom false negative — structurally impossible")
  }

  test("d8's eval side broadcasts; q44's sample filter reaches the scan stage") {
    val d8 = SparkEntry.queries("d8_contamination")(spark, sf)
    d8.collect()
    assert(d8.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "holdout side must broadcast, not shuffle the corpus")
    val q44 = SparkEntry.queries("q44_stratified_sample")(spark, sf)
    q44.collect()
    val p = q44.queryExecution.executedPlan.toString
    // the hash-split predicate is not parquet-pushable (md5), but it must
    // run pre-shuffle: a Filter inside the scan stage, no join, one agg
    assert(p.contains("Filter") && !p.contains("Join"), p.take(600))
  }
}
