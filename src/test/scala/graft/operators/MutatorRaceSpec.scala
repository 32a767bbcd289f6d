package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.{Tables, TestSpark}

/** Enforced single-mutator contract (r12 verdict #1): every artifact
  * mutation commits through [[ArtifactIO.commitManifest]] — an epoch
  * CAS against the manifest the mutation READ at entry — so two
  * interleaved mutators on one artifact either lose nothing or refuse
  * loudly ([[ConcurrentMutationException]]); a silently lost takedown
  * commit was a legal hazard, not a perf bug. The race seam
  * ([[ArtifactIO.raceHookForTests]]) fires a competing mutation inside
  * the victim's commit — after its read-modify-write, before its
  * manifest write — the exact window the old rename-only commit lost.
  */
class MutatorRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"race_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def ids(xs: Seq[Long], c: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    xs.toDF(c)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("commitManifest: CAS refuses a stale base; the winner's commit stands") {
    val dir = tmp("cas")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0) // fresh build: epoch absent = 0
    assert(ArtifactIO.epochOf(m0) == 0L)
    // mutator A: read m0, commit → epoch 1
    val a = ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
    assert(ArtifactIO.epochOf(a) == 1L && a.n == 11L)
    assert(ArtifactIO.readManifest(spark, dir) == a)
    // mutator B: ALSO read m0 (stale) — its commit must refuse, and the
    // manifest must still hold A's commit untouched
    val e = intercept[ConcurrentMutationException] {
      ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 99L))
    }
    assert(e.getMessage.contains("epoch"))
    assert(ArtifactIO.readManifest(spark, dir) == a,
      "the losing CAS must not disturb the winner's commit")
    // B retried against the FRESH state converges: epoch 2
    val b = ArtifactIO.commitManifest(spark, dir, a, a.copy(n = 12L))
    assert(ArtifactIO.epochOf(b) == 2L)
  }

  test("lease: a held commit lease refuses a second mutator outright (r13 #3)") {
    // the residual CAS window was two mutators whose full write+verify
    // interleaved — both passed verify, the winner was silently
    // overwritten. The lease serializes the whole check→write→verify
    // section: while a mutator holds it, a contender cannot even reach
    // the pre-check, so the interleave cannot be STARTED, let alone
    // pass. Simulate the holder by planting a fresh lock file.
    val dir = tmp("lease")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir, ".manifest.lock")
    val out = fs.create(lock, false)
    try out.write("someone-else".getBytes("UTF-8")) finally out.close()
    val e = intercept[ConcurrentMutationException] {
      ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
    }
    assert(e.getMessage.contains("lease"))
    assert(ArtifactIO.readManifest(spark, dir) == m0,
      "a refused contender must not have written anything")
    assert(fs.exists(lock), "the holder's lease must stand")
    // holder finishes (releases): the retried commit converges
    fs.delete(lock, false)
    val a = ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
    assert(ArtifactIO.epochOf(a) == 1L)
    assert(!fs.exists(lock), "a completed commit must release its lease")
  }

  test("lease covers the whole mutation: a held lease refuses BEFORE staging") {
    // r14 review #1: the CAS refuses a loser only at its commit — after
    // its heal sweep may have deleted, and its staged writes
    // overwritten, slots a concurrent winner committed from the same
    // stale window numbers. Mutations now hold the lease for their
    // whole heal→stage→commit section, so a contender refuses before
    // touching any data dir.
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 40)
    val dir = tmp("leased_mut")
    DedupIndex.build(docs, dir, 40L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir, ".manifest.lock")
    val out = fs.create(lock, false)
    try out.write("someone-else".getBytes("UTF-8")) finally out.close()
    intercept[ConcurrentMutationException] {
      DedupIndex.delete(ids(Seq(0L), "doc_id"), dir)
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir,
      "tombstones.parquet")),
      "a lease-refused delete must not have staged a tombstone delta")
    fs.delete(lock, false)
    assert(DedupIndex.delete(ids(Seq(0L), "doc_id"), dir) == 1L)
    spark.catalog.clearCache()
  }

  test("lease: takeover of a crashed holder converges after OBSERVED " +
    "staleness (skew-free - a far-past mtime alone is not enough)") {
    val dir = tmp("lease_ttl")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir, ".manifest.lock")
    val out = fs.create(lock, false)
    try out.write("crashed-holder".getBytes("UTF-8")) finally out.close()
    // a lock whose mtime is far in the past — on the OLD absolute-age
    // rule this was stolen instantly, which clock skew could abuse to
    // steal a LIVE holder's lock; takeover now needs this process to
    // observe the mtime unchanged (no heartbeat) for a full local TTL
    fs.setTimes(lock, System.currentTimeMillis() - 1000L, -1L)
    val saved = ArtifactIO.leaseTtlMs
    ArtifactIO.leaseTtlMs = 150L
    try {
      val e = intercept[ConcurrentMutationException] {
        ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      }
      assert(e.getMessage.contains("not yet observed stale"),
        "the first sighting must refuse, not steal")
      Thread.sleep(200L) // a full local TTL with no heartbeat observed
      val a = ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      assert(ArtifactIO.epochOf(a) == 1L && a.n == 11L)
      assert(!fs.exists(lock),
        "the takeover's commit must release the re-acquired lease")
      // a FUTURE-skewed mtime (writer clock ahead of ours) also cannot
      // block takeover forever: staleness is observed, not computed
      val out2 = fs.create(lock, false)
      try out2.write("future-holder".getBytes("UTF-8")) finally out2.close()
      fs.setTimes(lock, System.currentTimeMillis() + 3600000L, -1L)
      intercept[ConcurrentMutationException] {
        ArtifactIO.commitManifest(spark, dir, a, a.copy(n = 12L))
      }
      Thread.sleep(200L)
      val b = ArtifactIO.commitManifest(spark, dir, a, a.copy(n = 12L))
      assert(ArtifactIO.epochOf(b) == 2L,
        "a future-skewed crashed lock must still be taken over")
    } finally ArtifactIO.leaseTtlMs = saved
  }

  test("lease renewal: a mutation outliving the old TTL keeps its lease " +
    "via heartbeat; a contender refuses throughout (r14 verdict #2)") {
    val dir = tmp("lease_renew")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val saved = ArtifactIO.leaseTtlMs
    // heartbeat every ttl/3 ≈ 333 ms. The original 400 ms TTL flaked
    // twice on this host (r16): a single multi-hundred-ms I/O stall on
    // one heartbeat write let a contender legitimately observe
    // staleness — the bursty-I/O band BENCH_NOTES documents reaches
    // seconds. 1 s TTL needs the stall to eat ~3 beats ≈ a full second
    // of FS latency before the test (correctly) reports a takeover.
    ArtifactIO.leaseTtlMs = 1000L
    try {
      val committed = ArtifactIO.withCommitLease(spark, dir) {
        // the body runs 3× the TTL — without renewal, the contender's
        // takeover at any point past the TTL would steal the lock and
        // the commit below would refuse
        val deadline = System.currentTimeMillis() + 3000L
        var refusals = 0
        while (System.currentTimeMillis() < deadline) {
          Thread.sleep(250L)
          // contender from ANOTHER thread (the thread-local held-lease
          // registry must not short-circuit the refusal)
          val t = new Thread(() => {
            try ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 99L))
            catch { case _: ConcurrentMutationException => refusals += 1 }
          })
          t.start(); t.join()
        }
        assert(refusals > 0, "contenders must have been refused mid-hold")
        ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      }
      assert(ArtifactIO.epochOf(committed) == 1L && committed.n == 11L,
        "the long-held mutation's own commit must land")
      assert(ArtifactIO.readManifest(spark, dir) == committed)
    } finally ArtifactIO.leaseTtlMs = saved
  }

  test("requireLeaseOwned: a taken-over holder refuses before its next " +
    "staged write (r14 advisor #1)") {
    val dir = tmp("lease_owned")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir, ".manifest.lock")
    val saved = ArtifactIO.leaseTtlMs
    ArtifactIO.leaseTtlMs = 60L * 1000 // keep the heartbeat out of the way
    try {
      intercept[ConcurrentMutationException] {
        ArtifactIO.withCommitLease(spark, dir) {
          ArtifactIO.requireLeaseOwned(spark, dir) // held: passes
          // simulate a TTL takeover landing mid-mutation: the lock now
          // carries the winner's token
          fs.delete(lock, false)
          val out = fs.create(lock, false)
          try out.write("takeover-winner".getBytes("UTF-8"))
          finally out.close()
          ArtifactIO.requireLeaseOwned(spark, dir) // must refuse HERE
          fail("a stale holder must refuse before staging")
        }
      }
      assert(ArtifactIO.lockTokenOfForTests(spark, dir)
        .contains("takeover-winner"),
        "the stale holder's exit must not delete the winner's lock")
    } finally {
      ArtifactIO.leaseTtlMs = saved
      fs.delete(lock, false)
    }
  }

  test("steal-file leak: a leftover is swept once OBSERVED unchanged " +
    "for a TTL (skew-free - a far-past mtime alone is not enough, r15 " +
    "advisor #3)") {
    val dir = tmp("steal_sweep")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val leaked = new org.apache.hadoop.fs.Path(dir,
      ".manifest.lock.steal-deadbeef")
    val out = fs.create(leaked, false)
    try out.write("x".getBytes("UTF-8")) finally out.close()
    // even a far-past mtime is NOT swept on first sight: a sweeper
    // whose clock runs ahead of the store's mtime clock must not race
    // a renamer still mid-delete (absolute age was the old rule)
    fs.setTimes(leaked, System.currentTimeMillis() - 3600000L, -1L)
    val saved = ArtifactIO.leaseTtlMs
    ArtifactIO.leaseTtlMs = 100L
    try {
      val a = ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      assert(fs.exists(leaked),
        "the first acquire only OBSERVES the leftover - sweeping on " +
          "absolute mtime age is the clock-skew hazard")
      Thread.sleep(150L) // a full local TTL with the signature unchanged
      ArtifactIO.commitManifest(spark, dir, a, a.copy(n = 12L))
      assert(!fs.exists(leaked),
        "a leftover observed unchanged for a TTL must be swept at the " +
          "next acquire")
    } finally ArtifactIO.leaseTtlMs = saved
  }

  test("release resilience: an unreadable own lock is still released, " +
    "not stranded for a TTL (r14 advisor #3)") {
    val dir = tmp("lease_release")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir, ".manifest.lock")
    ArtifactIO.withCommitLease(spark, dir) {
      // truncate our own lock to zero bytes: every token read now
      // returns unreadable — the release path must delete it anyway
      // instead of refusing every later mutator for the full TTL
      fs.create(lock, true).close()
    }
    assert(!fs.exists(lock),
      "an unreadable own lock must be released, not stranded")
    // and the next mutator proceeds immediately
    val a = ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
    assert(ArtifactIO.epochOf(a) == 1L)
  }

  test("dedup: takedown interleaving an append refuses the append, loses nothing") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 60)
    val dir = tmp("dedup")
    DedupIndex.build(docs, dir, 60L)
    val inc = docs.filter(col("doc_id") < 4)
      .withColumn("doc_id", col("doc_id") + 7000000L)
    // the takedown fires inside the append's commit window — after the
    // append's read-modify-write, before its manifest write
    ArtifactIO.raceHookForTests = Some(() => {
      assert(DedupIndex.delete(ids(Seq(0L), "doc_id"), dir) == 1L)
    })
    try {
      intercept[ConcurrentMutationException] { DedupIndex.append(inc, dir) }
    } finally ArtifactIO.raceHookForTests = None
    // the takedown's commit survived in full ...
    val mf = ArtifactIO.readManifest(spark, dir)
    assert(mf.n == 59L, "the takedown's n must stand")
    assert(mf.params("tomb_deltas") == 1L, "the tombstone window must stand")
    // ... and NOTHING of the refused append is visible to readers
    val ix = DedupIndex.load(spark, dir)
    assert(ix.signatures.filter(col("doc_id") >= 7000000L).isEmpty,
      "the refused append must be invisible")
    assert(ix.signatures.filter(col("doc_id") === 0L).isEmpty,
      "the takedown must be in force")
    // the retried append replays its whole read-modify-write against
    // the fresh state and converges with an unraced control
    assert(DedupIndex.append(inc, dir) > 0L)
    val ctlDir = tmp("dedup_ctl")
    DedupIndex.build(docs.filter(col("doc_id") =!= 0L), ctlDir, 59L)
    DedupIndex.append(inc, ctlDir)
    val (after, ctl) = (DedupIndex.load(spark, dir),
      DedupIndex.load(spark, ctlDir))
    assert(rows(after.pairs) == rows(ctl.pairs))
    assert(rows(after.components) == rows(ctl.components))
    spark.catalog.clearCache()
  }

  test("ivfpq: rebuild refuses when an append committed mid-build (r11 #5)") {
    val emb = Tables.embeddings(spark, sf)
    val dim = Tables.EmbeddingDim
    val n = Tables.embeddingsRows(spark, sf)
    val dir = tmp("ivfpq")
    AnnIndex.buildIvfPq(emb, dir, dim, m = 8, k = 64, nHint = n)
    val inc = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"),
        col("label"))
    // the streaming append lands while the rebuild's re-fit is running;
    // its last_batch is FRESHER than anything the rebuild carries over
    ArtifactIO.raceHookForTests = Some(() => {
      assert(AnnIndex.appendIvfPq(inc, dir, batchId = 5L) == 3L * 8)
    })
    try {
      intercept[ConcurrentMutationException] { AnnIndex.rebuild(emb, dir, n) }
    } finally ArtifactIO.raceHookForTests = None
    // the append's commit survived: codes present, replay guard fresh
    val mf = AnnIndex.readManifest(spark, dir)
    assert(mf.params("last_batch") == 5L,
      "the append's replay guard must not be lost")
    assert(!mf.params.contains("version"),
      "the refused rebuild must not have swapped a version in")
    assert(AnnIndex.loadIvfPq(spark, dir).codes
      .filter(col("vec_id") >= 10000000L).select("vec_id").distinct()
      .count() == 3L)
    // the retried rebuild (against a corpus that now INCLUDES the
    // appended vectors) converges and carries the fresh guard forward
    val embAll = emb.unionByName(inc)
    val mf2 = AnnIndex.rebuild(embAll, dir, n + 3)
    assert(mf2.params("version") == 1L && mf2.params("last_batch") == 5L)
    assert(AnnIndex.loadIvfPq(spark, dir).codes
      .filter(col("vec_id") >= 10000000L).select("vec_id").distinct()
      .count() == 3L)
    spark.catalog.clearCache()
  }
}
