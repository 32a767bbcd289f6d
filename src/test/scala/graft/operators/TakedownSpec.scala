package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.{Tables, TestSpark}

/** Takedown / tombstone deletion contract (r11 verdict #1): removing
  * documents or vectors from a persisted artifact must (a) exclude them
  * from EVERY consumer the instant the delete commits — no physical
  * rewrite on the takedown path, (b) become a physical row drop at the
  * next compaction, after which delete-then-compact ≡
  * rebuild-without-those-docs is a hash identity for every stored
  * table and consumer, (c) stay crash-safe under the shared ArtifactIO
  * protocol (staged tombstones invisible until the manifest commit;
  * retries converge), and (d) treat unknown / already-removed ids as a
  * committed-nothing no-op.
  */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"takedown_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def ids(xs: Seq[Long], c: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    xs.toDF(c)
  }

  /** documents plus a planted 3-doc near-dup cluster on doc 0's text —
    * guarantees a component with enough members that removing one
    * exercises the targeted re-solve (relabel + possible split). */
  private def corpus: DataFrame = {
    val t0 = docs.filter(col("doc_id") === 0L).drop("doc_id")
    val planted = t0
      .crossJoin(ids(Seq(5000001L, 5000002L, 5000003L), "doc_id"))
      .withColumn("text", concat(col("text"), lit(" planted tail"),
        (col("doc_id") % 2).cast("string")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(docs.columns.map(col).toIndexedSeq: _*)
    docs.unionByName(planted)
  }

  private def dedupState(ix: DedupIndex.LoadedDedup) = Seq(
    rows(ix.signatures.select(col("doc_id"), concat_ws(",", col("sig")))),
    rows(ix.bands),
    rows(ix.shingleSets.select(col("doc_id"), concat_ws(",", col("hs")))),
    rows(ix.postings), rows(ix.pairs), rows(ix.components))

  private val stateNames =
    Seq("signatures", "bands", "shingles", "postings", "pairs", "components")
  private def assertSameState(a: DedupIndex.LoadedDedup,
      b: DedupIndex.LoadedDedup, clue: String): Unit =
    stateNames.zip(dedupState(a).zip(dedupState(b))).foreach {
      case (nm, (x, y)) =>
        val (onlyA, onlyB) = (x.diff(y), y.diff(x))
        assert(onlyA.isEmpty && onlyB.isEmpty,
          s"$clue: $nm differs (left=${x.size}, right=${y.size}); " +
            s"onlyLeft=${onlyA.take(4)} onlyRight=${onlyB.take(4)}")
    }

  test("dedup: tombstones exclude immediately; compact == rebuild-without") {
    val all = corpus.persist()
    val n = all.count()
    // removal set: a planted cluster member (forces a component
    // re-solve), a min-id member (forces a relabel: doc 0 is the
    // planted cluster's min id), and an id that never existed
    val removeSeq = Seq(0L, 5000002L)
    val removeDf = ids(removeSeq :+ 999999999L, "doc_id")
    val dir = tmp("dedup")
    DedupIndex.build(all, dir, n)
    val ctlDir = tmp("dedup_ctl")
    val keptDocs = all.filter(!col("doc_id").isInCollection(removeSeq))
    DedupIndex.build(keptDocs, ctlDir, n - removeSeq.size)

    assert(DedupIndex.delete(removeDf, dir) == removeSeq.size,
      "only ids that exist count as removed")
    // IMMEDIATE exclusion, before any physical fold: every table view
    // and the component table match the rebuild-without control
    val ixDel = DedupIndex.load(spark, dir)
    val ixCtl = DedupIndex.load(spark, ctlDir)
    assert(ixDel.manifest.n == n - removeSeq.size)
    assertSameState(ixDel, ixCtl,
      "post-delete views must equal rebuild-without")
    // consumers: the read-only serve probe finds the same near-dups
    val probe = corpus.filter(col("doc_id") === 5000001L)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    assert(rows(DedupIndex.serveNearDups(probe, ixDel, 1L)) ==
      rows(DedupIndex.serveNearDups(probe, ixCtl, 1L)))
    assert(rows(DedupIndex.splitFrom(keptDocs, ixDel)) ==
      rows(DedupIndex.splitFrom(keptDocs, ixCtl)))
    assert(rows(DedupIndex.keepBestFrom(keptDocs, ixDel, n - 2)) ==
      rows(DedupIndex.keepBestFrom(keptDocs, ixCtl, n - 2)))

    // repeat delete: everything already tombstoned → no-op, no commit
    val mfBefore = ArtifactIO.readManifest(spark, dir)
    assert(DedupIndex.delete(removeDf, dir) == 0L)
    assert(ArtifactIO.readManifest(spark, dir) == mfBefore,
      "a no-op delete must not commit")
    // re-ingesting a tombstoned id while the window is live is REFUSED
    // (r12 ADVICE): the live anti-join would hide the rows and the next
    // compaction would physically drop them — a silent data loss
    intercept[IllegalArgumentException] {
      DedupIndex.append(corpus.filter(col("doc_id") === 5000002L), dir)
    }
    assert(ArtifactIO.readManifest(spark, dir) == mfBefore,
      "a refused re-ingest must not commit")

    // compaction applies the tombstones PHYSICALLY and empties the window
    val mfc = DedupIndex.compactDeltas(spark, dir)
    assert(mfc.params("tomb_deltas") == 0L)
    val ixPost = DedupIndex.load(spark, dir)
    assertSameState(ixPost, ixCtl,
      "delete-then-compact must equal rebuild-without")
    // the physical slabs themselves hold no removed doc (not just the
    // filtered view): read the committed slab dirs raw
    val mfp = ixPost.manifest
    val slab = spark.read.parquet(
      f"$dir/signatures.parquet/delta-${mfp.params("sig_base")}%05d")
    assert(slab.filter(col("doc_id").isInCollection(removeSeq)).isEmpty)
    // append after takedown still works and converges with the control
    val inc = docs.filter(col("doc_id") < 6)
      .withColumn("doc_id", col("doc_id") + 7000000L)
    DedupIndex.append(inc, dir)
    DedupIndex.append(inc, ctlDir)
    val a = DedupIndex.load(spark, dir)
    val b = DedupIndex.load(spark, ctlDir)
    assert(rows(a.pairs) == rows(b.pairs))
    assert(rows(a.components) == rows(b.components))
    all.unpersist()
    spark.catalog.clearCache()
  }

  test("dedup: staged tombstones invisible until commit; retry converges") {
    val dir = tmp("dedup_crash")
    val all = corpus
    DedupIndex.build(all, dir, -1L)
    val pre = dedupState(DedupIndex.load(spark, dir))
    val mfPre = ArtifactIO.readManifest(spark, dir)
    // crash state: a delete staged its tombstone delta (and garbage)
    // but died before the manifest commit — readers must see NOTHING
    ids(Seq(5000001L), "doc_id").write.mode("overwrite")
      .parquet(s"$dir/tombstones.parquet/delta-00000")
    val orphan = Paths.get(dir, "tombstones.parquet", "delta-00007")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    assert(dedupState(DedupIndex.load(spark, dir)) == pre,
      "a staged-but-uncommitted tombstone delta must be invisible")
    assert(ArtifactIO.readManifest(spark, dir) == mfPre)
    // the retried delete heals the orphans and converges
    assert(DedupIndex.delete(ids(Seq(5000001L), "doc_id"), dir) == 1L)
    assert(!Files.exists(orphan), "retry must heal orphan tombstones")
    val ctlDir = tmp("dedup_crash_ctl")
    DedupIndex.build(all.filter(col("doc_id") =!= 5000001L), ctlDir, -1L)
    assertSameState(DedupIndex.load(spark, dir),
      DedupIndex.load(spark, ctlDir), "post-retry state")
    spark.catalog.clearCache()
  }

  test("ivfpq: delete excludes from serving immediately; compact is physical") {
    val emb = Tables.embeddings(spark, sf)
    val nEmb = Tables.embeddingsRows(spark, sf)
    val dim = Tables.EmbeddingDim
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = nEmb)
    val inc = emb.filter(col("vec_id") < 4)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"),
        col("label"))
    AnnIndex.appendIvfPq(inc, dir, batchId = 0L)
    val preIx = AnnIndex.loadIvfPq(spark, dir)
    val preCodes = preIx.codes.persist()
    preCodes.count()
    // remove two corpus vectors + one unknown id
    val removeSeq = Seq(0L, 10000001L)
    assert(AnnIndex.deleteIvfPq(
      ids(removeSeq :+ 888888888L, "vec_id"), dir) == removeSeq.size)
    val mfDel = AnnIndex.readManifest(spark, dir)
    assert(mfDel.n == preIx.manifest.n - removeSeq.size)
    // serving excludes the ids immediately — and equals a manual
    // filter of the pre-delete codes under the same frozen quantizer
    val ctl = preIx.copy(codes =
      preCodes.filter(!col("vec_id").isInCollection(removeSeq)))
    val postIx = AnnIndex.loadIvfPq(spark, dir)
    assert(rows(postIx.codes) == rows(ctl.codes))
    assert(rows(AnnIndex.ivfPqTopK(postIx, emb, nQueries = 4)) ==
      rows(AnnIndex.ivfPqTopK(ctl, emb, nQueries = 4)))
    // repeat delete: no-op, no commit
    assert(AnnIndex.deleteIvfPq(ids(removeSeq, "vec_id"), dir) == 0L)
    assert(AnnIndex.readManifest(spark, dir) == mfDel)
    // re-ingesting a tombstoned vec_id while the window is live is
    // REFUSED (r12 ADVICE) — and must not commit anything
    intercept[IllegalArgumentException] {
      AnnIndex.appendIvfPq(emb.filter(col("vec_id") === 0L)
        .select(col("vec_id"), col("embedding"), col("label")), dir)
    }
    assert(AnnIndex.readManifest(spark, dir) == mfDel,
      "a refused re-ingest must not commit")
    // compaction drops the rows physically and empties the window
    val mfc = AnnIndex.compactIvfPqDeltas(spark, dir)
    assert(mfc.params("tomb_deltas") == 0L && mfc.params("deltas") == 1L)
    val slab = spark.read.parquet(
      f"$dir/ivfpq_codes.parquet/delta-${mfc.params("deltas_base")}%05d")
    assert(slab.filter(col("vec_id").isInCollection(removeSeq)).isEmpty)
    assert(rows(AnnIndex.loadIvfPq(spark, dir).codes) == rows(ctl.codes))
    // append after takedown: replay guard intact, grace window swept
    assert(AnnIndex.appendIvfPq(inc, dir, batchId = 0L) == 0L,
      "an applied batchId stays a no-op across delete + compaction")
    val inc2 = emb.filter(col("vec_id") >= 4 && col("vec_id") < 6)
      .select((col("vec_id") + 20000000L).as("vec_id"), col("embedding"),
        col("label"))
    assert(AnnIndex.appendIvfPq(inc2, dir, batchId = 1L) == 2L * 8)
    preCodes.unpersist()
    spark.catalog.clearCache()
  }
}
