package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** The artifact concurrency machinery against an object-store
  * simulator ([[ObjSimFileSystem]]: frozen mtimes, no-op `setTimes`,
  * optionally non-atomic exclusive create) — r15 verdict #1/#2. The
  * r13–r15 lease/pin work was specced only on the local FS, where
  * `setTimes` works; on S3A/GCS it is a silent no-op, so an
  * mtime-touch heartbeat never lands and a LIVE mutation longer than
  * the TTL would be observed stale and stolen mid-write. The
  * heartbeat and pin renewal now REWRITE content (monotonic seq), and
  * staleness keys on the observed (mtime, length, body) signature —
  * these tests pin that on a store where mtime never moves at all. */
class ObjectStoreLeaseSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration.set("fs.objsim.impl",
      classOf[ObjSimFileSystem].getName)
    s
  }

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"objsim_$name")
    d.toFile.deleteOnExit()
    "objsim:" + d.toString
  }

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("content heartbeat: a live long mutation on an mtime-frozen " +
    "store is never observed stale (r15 verdict #1)") {
    val dir = tmp("live")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val saved = ArtifactIO.leaseTtlMs
    ArtifactIO.leaseTtlMs = 400L // heartbeat every ~133 ms
    try {
      val committed = ArtifactIO.withCommitLease(spark, dir) {
        // the body runs 3x the TTL on a store whose mtime NEVER
        // advances: with the old setTimes heartbeat every contender
        // past 400 ms would observe a static signature and steal the
        // live lock; the content heartbeat's seq bumps keep the
        // observed signature moving, so every contender refuses
        val deadline = System.currentTimeMillis() + 1200L
        var refusals = 0
        var stolen = 0
        while (System.currentTimeMillis() < deadline) {
          Thread.sleep(100L)
          val t = new Thread(() => {
            try {
              ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 99L))
              stolen += 1
            } catch { case _: ConcurrentMutationException => refusals += 1 }
          })
          t.start(); t.join()
        }
        assert(stolen == 0,
          "a live heartbeating holder must never be stolen on an " +
            "mtime-frozen store")
        assert(refusals > 0, "contenders must have been refused mid-hold")
        ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      }
      assert(ArtifactIO.epochOf(committed) == 1L && committed.n == 11L,
        "the long-held mutation's own commit must land")
    } finally ArtifactIO.leaseTtlMs = saved
  }

  test("takeover: a crashed holder on an mtime-frozen store is still " +
    "taken over once its signature is observed unchanged for a TTL") {
    val dir = tmp("crashed")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val fs = fsOf(dir)
    val lock = new org.apache.hadoop.fs.Path(dir, ".manifest.lock")
    val out = fs.create(lock, false)
    try out.write("crashed-holder".getBytes("UTF-8")) finally out.close()
    val saved = ArtifactIO.leaseTtlMs
    ArtifactIO.leaseTtlMs = 150L
    try {
      val e = intercept[ConcurrentMutationException] {
        ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      }
      assert(e.getMessage.contains("not yet observed stale"),
        "the first sighting must refuse, not steal")
      Thread.sleep(250L) // a full local TTL, no heartbeat: body static
      val a = ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
      assert(ArtifactIO.epochOf(a) == 1L && a.n == 11L,
        "a frozen mtime must not block takeover of a genuinely " +
          "crashed holder - staleness is observed content, not mtime")
      assert(!fs.exists(lock))
    } finally ArtifactIO.leaseTtlMs = saved
  }

  test("non-atomic create: the lease degrades, the CAS backstop still " +
    "refuses the loser, and the degradation is reported (r15 verdict #2)") {
    val dir = tmp("nonatomic")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    assert(!ArtifactIO.lockCreateIsAtomic(fsOf(dir)),
      "objsim is not a declared-atomic scheme")
    ObjSimFileSystem.nonAtomicCreate = true
    val saved = ArtifactIO.leaseTtlMs
    ArtifactIO.leaseTtlMs = 60L * 1000 // keep heartbeats out of the way
    try {
      var winner: ArtifactIO.Manifest = null
      intercept[ConcurrentMutationException] {
        ArtifactIO.withCommitLease(spark, dir) {
          // mutator B slides PAST the held lease from another thread -
          // on this store exclusive create silently succeeds over the
          // holder's lock, so the lease cannot serialize contention
          val t = new Thread(() => {
            winner = ArtifactIO.commitManifest(spark, dir, m0,
              m0.copy(n = 99L))
          })
          t.start(); t.join()
          assert(winner != null && ArtifactIO.epochOf(winner) == 1L,
            "without atomic create the lease must NOT have stopped B " +
              "- that is the degraded mode being simulated")
          assert(winner.params.get("lock_best_effort").contains(1L),
            "a manifest committed under a best-effort lease must " +
              "record it (r15 verdict #2)")
          // the original holder now commits from its stale read: the
          // backstop layers (lock token arbitration, then the epoch
          // CAS) must refuse it - the winner's commit stands
          ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 11L))
          fail("the stale holder must have been refused")
        }
      }
      assert(ArtifactIO.readManifest(spark, dir) == winner,
        "the loser must not have disturbed the winner's commit")
      // the pure epoch-CAS leg: no lock held at all, stale base
      val e = intercept[ConcurrentMutationException] {
        ArtifactIO.commitManifest(spark, dir, m0, m0.copy(n = 12L))
      }
      assert(e.getMessage.contains("epoch"),
        "a stale base with no lock contention is refused by the CAS")
    } finally {
      ObjSimFileSystem.nonAtomicCreate = false
      ArtifactIO.leaseTtlMs = saved
    }
  }

  test("declared atomic create: the conf key overrides the scheme " +
    "heuristic in both directions") {
    val fs = fsOf(tmp("conf"))
    val key = ArtifactIO.AtomicCreateConfKey
    val before = fs.getConf.get(key)
    try {
      fs.getConf.set(key, "true")
      assert(ArtifactIO.lockCreateIsAtomic(fs),
        "a deployment with conditional create declares atomicity")
      fs.getConf.set(key, "false")
      assert(!ArtifactIO.lockCreateIsAtomic(fs))
    } finally {
      if (before == null) fs.getConf.unset(key)
      else fs.getConf.set(key, before)
    }
  }

  test("pin renewal: a renewing reader on an mtime-frozen store " +
    "survives past the raw TTL; an abandoned pin is still swept") {
    val dir = tmp("pin")
    val m0 = ArtifactIO.Manifest("dedup", 0, 10L, Map("sig_deltas" -> 1L))
    ArtifactIO.writeManifest(spark, dir, m0)
    val saved = ArtifactIO.pinTtlMs
    ArtifactIO.pinTtlMs = 600L
    try {
      val pin = ArtifactIO.pinReader(spark, dir)
      val pinFile = new org.apache.hadoop.fs.Path(dir,
        s".pins/pin-${pin.id}.json")
      val fs = fsOf(dir)
      // renew every 150 ms for ~2.5 TTLs: with the old setTimes
      // renewal nothing lands on this store and the pin would expire
      // at the raw TTL; the content renewal's renew_seq bumps reset
      // the sweep's observation window every cycle
      val deadline = System.currentTimeMillis() + 1500L
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(150L)
        pin.renew(spark)
        assert(ArtifactIO.pinnedManifests(spark, dir).nonEmpty,
          "a renewing reader must stay protected past the raw TTL")
      }
      // abandon: once the signature sits unchanged for a full TTL the
      // sweep drops it (bounded by polling, not a single sleep, so a
      // loaded host cannot flake the margin)
      val sweepBy = System.currentTimeMillis() + 5000L
      var live = true
      while (live && System.currentTimeMillis() < sweepBy) {
        Thread.sleep(150L)
        live = ArtifactIO.pinnedManifests(spark, dir).nonEmpty
      }
      assert(!live, "an abandoned pin must expire by observed TTL")
      assert(!fs.exists(pinFile), "the expired pin file must be swept")
    } finally ArtifactIO.pinTtlMs = saved
  }
}
