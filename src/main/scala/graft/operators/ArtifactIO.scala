package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** A compare-and-swap manifest commit found the artifact moved by
  * another mutator. Nothing from the losing mutation is visible to
  * readers (its staged dirs are orphans the next mutation heals);
  * re-run the whole read-modify-write to retry. */
final class ConcurrentMutationException(msg: String)
  extends java.io.IOException(msg)

/** An increment re-ingests ids the artifact's LIVE tombstone window
  * still lists: appending would hide the rows behind the anti-join and
  * the next compaction would drop them physically. A typed exception —
  * not message-matched text — because the ingest sinks' poison-pill
  * unblock keys its recovery (fold the window, retry once) on catching
  * exactly this case. */
final class TombstonedIdsException(msg: String)
  extends IllegalArgumentException(msg)

/** Shared crash-safe manifest commit for persisted index artifacts
  * ([[AnnIndex]], [[DedupIndex]]) — the compactor's snapshot commit
  * protocol ([[graft.compact.Orchestrator]] writeAtomic /
  * recoverInterruptedCommits) applied to the artifacts' one mutable
  * file: write `.manifest.json.tmp` fully, delete the target, rename
  * tmp → target, length-verify; reads heal every interrupted state. On
  * stores where rename is copy+delete the only crash-visible states are
  * (tmp+old), (tmp only) or (new) — never a torn manifest. */
object ArtifactIO {

  /** What a manifest records: enough to re-plan queries without
    * touching the corpus (family dispatch, quantizer geometry, commit
    * points for delta/versioned tables). `dim` is 0 for artifacts with
    * no vector geometry. */
  final case class Manifest(family: String, dim: Int, n: Long,
      params: Map[String, Long])

  private val mapper = new ObjectMapper()

  /** Monotonic commit counter — the CAS token every mutation's commit
    * bumps by exactly one. 0 on pre-epoch manifests (and fresh builds
    * that never mutated), so old artifacts CAS cleanly on their first
    * post-upgrade mutation. */
  def epochOf(m: Manifest): Long = m.params.getOrElse("epoch", 0L)

  /** TEST-ONLY race seam: popped (one-shot, so a mutation the hook
    * itself runs doesn't recurse) and invoked at the top of
    * [[commitManifest]] — i.e. after the caller's read-modify-write but
    * before its commit (and before the lease acquire, so the hook's
    * competing mutation can itself commit), the exact window a
    * concurrent mutator exploits. Specs install a competing mutation
    * here to pin the CAS refusal. */
  @volatile private[graft] var raceHookForTests: Option[() => Unit] = None

  /** Lease time-to-live: a `.manifest.lock` older than this is a
    * crashed holder and may be taken over. Commits hold the lease for
    * milliseconds (one manifest write + two reads), so ten minutes is
    * far beyond any live commit; tests lower it to pin takeover. */
  @volatile private[graft] var leaseTtlMs: Long = 10L * 60 * 1000

  private def lockPath(dir: String) = new Path(dir, ".manifest.lock")

  /** Acquire the create-exclusive commit lease (r13 verdict #3): the
    * epoch CAS alone had a residual window — two mutators whose full
    * write+verify interleaved could BOTH pass the post-rename verify —
    * so the check→write→verify critical section is now serialized by a
    * lock file created with `overwrite = false` (atomic on HDFS and
    * object stores with atomic create; best-effort on raw local FS,
    * where the CAS remains the backstop). A fresh lock held by another
    * mutator refuses immediately ([[ConcurrentMutationException]] — the
    * caller retries its whole read-modify-write); a lock older than
    * [[leaseTtlMs]] is a crashed holder and is taken over through an
    * atomic rename (single-winner even when several contenders see the
    * same stale lock). Returns the holder token to verify at release. */
  private def acquireLease(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): String = {
    val lock = lockPath(dir)
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean = {
      // split the exclusive CREATE (contended: already-exists is the
      // normal refusal) from the token WRITE (ours alone: a failure
      // mid-write must remove the partial lock before propagating, or
      // one transient IO error locks every mutator out for a full TTL)
      val out =
        try fs.create(lock, false)
        catch { case _: java.io.IOException => return false }
      try { out.write(token.getBytes("UTF-8")); out.close(); true }
      catch {
        case e: java.io.IOException =>
          try fs.delete(lock, false)
          catch { case scala.util.control.NonFatal(_) => () }
          throw e
      }
    }
    if (!tryCreate()) {
      val age =
        try System.currentTimeMillis() - fs.getFileStatus(lock)
          .getModificationTime
        catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (age <= leaseTtlMs)
        throw new ConcurrentMutationException(
          s"commit lease at $lock is held by a live mutator " +
            s"(age ${age} ms <= ttl $leaseTtlMs ms) - nothing was " +
            "written; re-run the mutation when the holder's commit lands")
      // stale: takeover through an atomic rename — of N contenders that
      // saw the same crashed lock, exactly one wins the rename; the
      // losers fall through to tryCreate and refuse on the fresh lock
      val steal = new Path(dir, s".manifest.lock.steal-$token")
      if (age != Long.MaxValue && fs.rename(lock, steal))
        fs.delete(steal, false)
      if (!tryCreate())
        throw new ConcurrentMutationException(
          s"commit lease at $lock was re-acquired by a concurrent " +
            "mutator during takeover - re-run the mutation")
    }
    token
  }

  /** The lock file's current token, None when missing/unreadable. */
  private def lockTokenOf(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[String] =
    try {
      val in = fs.open(lockPath(dir))
      val buf = new Array[Byte](64)
      // loop the read: a single read() may under-fill on remote FS
      // and a truncated token would strand our own lock for the TTL
      var (n, r) = (0, 0)
      try { while (r >= 0 && n < buf.length) {
        r = in.read(buf, n, buf.length - n); if (r > 0) n += r
      } } finally in.close()
      if (n > 0) Some(new String(buf, 0, n, "UTF-8")) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Release the lease if WE still hold it (token match): after a TTL
    * takeover the lock belongs to the new holder and must stand. */
  private def releaseLease(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, token: String): Unit =
    if (lockTokenOf(fs, dir).contains(token))
      fs.delete(lockPath(dir), false)

  /** Held-lease registry for the current thread — what makes
    * [[withCommitLease]] re-entrant: [[commitManifest]] inside a leased
    * section reuses the held lease instead of refusing itself. Keyed by
    * the normalized dir path. */
  private val heldLeases = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }
  private def leaseKey(dir: String): String = new Path(dir).toString

  /** Run `body` HOLDING the commit lease for `dir` — the whole-mutation
    * critical section (r14 review finding #1): the manifest CAS alone
    * refuses a loser only AT ITS COMMIT, which is after its heal sweep
    * may have deleted — and its staged writes overwritten — delta/
    * tombstone slots a concurrent winner committed from the same stale
    * window numbers. Every mutation wraps its heal→stage→commit section
    * here (with [[requireUnmoved]] as the first statement inside), so a
    * stale mutator refuses BEFORE touching any data dir. Re-entrant per
    * thread. The lease is now held for the mutation's duration rather
    * than the commit's: a crash mid-mutation parks contenders for one
    * TTL before takeover, and a mutation outliving the TTL (only
    * [[AnnIndex.rebuild]]'s full re-fit plausibly does — it is
    * deliberately NOT wrapped) falls back to the CAS backstop. */
  def withCommitLease[A](spark: SparkSession, dir: String)(body: => A): A = {
    val key = leaseKey(dir)
    if (heldLeases.get.contains(key)) return body // re-entrant
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val token = acquireLease(fs, dir)
    heldLeases.set(heldLeases.get + (key -> token))
    try body
    finally {
      heldLeases.set(heldLeases.get - key)
      releaseLease(fs, dir, token)
    }
  }

  /** Refuse (inside the lease) when the artifact moved since the caller
    * read `base` — the guarantee that every heal/stage write that
    * follows targets slots no concurrent winner committed. A missing
    * manifest (first-ever commit) passes. */
  def requireUnmoved(spark: SparkSession, dir: String,
      base: Manifest): Unit = {
    val cur =
      try Some(readManifest(spark, dir))
      catch { case _: java.io.FileNotFoundException => None }
    cur.filter(c => epochOf(c) != epochOf(base)).foreach { c =>
      throw new ConcurrentMutationException(
        s"manifest at $dir moved from epoch ${epochOf(base)} to " +
          s"${epochOf(c)} since this mutation read it (a concurrent " +
          "mutator committed) - nothing was staged; re-run against the " +
          "fresh state")
    }
  }

  /** Enforced single-mutator commit (r12 verdict #1): publish `next`
    * only if the artifact is still at `base`'s epoch — the CAS the
    * atomic-rename commit alone cannot give. Every artifact mutation
    * (append / delete / compact / rebuild) routes its manifest commit
    * here with the manifest it READ at entry as `base`; a mutation that
    * lost the race (its read-modify-write is stale — e.g. a rebuild
    * racing an append's fresher `last_batch`, or an ingest sink racing
    * a takedown sink on one artifact) throws
    * [[ConcurrentMutationException]] INSTEAD of silently overwriting
    * the winner's commit. Two layers:
    *  1. pre-commit check: re-read the manifest; a moved epoch refuses
    *     before anything is written (the common interleave)
    *  2. post-commit verify: re-read after the rename; if the manifest
    *     on disk is not OUR commit, a mutator raced us inside the
    *     check-to-rename window and won — refuse loudly so the caller
    *     knows THIS mutation did not land (its staged dirs are orphans
    *     the next mutation heals; a retry replays the whole
    *     read-modify-write and converges)
    * The check→write→verify section runs under a create-exclusive
    * lease file ([[acquireLease]], r13 verdict #3), which closes the
    * residual window the CAS alone left (two mutators whose full
    * write+verify interleaved could both pass verify); on stores
    * without atomic create the CAS layers remain the backstop.
    * MutatorRaceSpec pins the enforced cases. Returns the committed
    * (epoch-stamped) manifest. */
  def commitManifest(spark: SparkSession, dir: String, base: Manifest,
      next: Manifest): Manifest = {
    val hook = raceHookForTests
    if (hook.isDefined) { raceHookForTests = None; hook.foreach(_()) }
    val expected = epochOf(base)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // re-entrant under [[withCommitLease]]: a mutation that leased its
    // whole heal→stage→commit section commits on the lease it holds —
    // but the holder must RE-VERIFY ownership at the commit (r14 review
    // pass 2): a mutation that outlived the TTL had its lock taken
    // over, and committing anyway would run check→write→verify
    // concurrently with the new holder's, reopening the interleave the
    // lease exists to close. The old commit-time acquire refused this
    // case; the ownership check preserves that.
    val heldToken = heldLeases.get.get(leaseKey(dir))
    val alreadyHeld = heldToken.isDefined
    if (alreadyHeld && lockTokenOf(fs, dir) != heldToken)
      throw new ConcurrentMutationException(
        s"commit lease at ${lockPath(dir)} was taken over while this " +
          "mutation ran (it outlived the lease TTL) - refusing the " +
          "commit; its staged data is orphaned and will be healed")
    val token = if (alreadyHeld) heldToken.get else acquireLease(fs, dir)
    try {
      // ONLY a genuinely missing manifest (the first-ever commit, e.g.
      // compactCorpus) may skip the pre-check; any other read failure
      // must refuse — writing blind past a transient FS/parse error
      // would bypass the CAS and silently overwrite a concurrent
      // winner's commit, the exact hazard this method exists to prevent
      val cur =
        try Some(readManifest(spark, dir))
        catch { case _: java.io.FileNotFoundException => None }
      cur.filter(c => epochOf(c) != expected).foreach { c =>
        throw new ConcurrentMutationException(
          s"manifest at $dir moved from epoch $expected to ${epochOf(c)} " +
            "during this mutation (a concurrent mutator committed) - " +
            "nothing was written; re-run the mutation against the fresh state")
      }
      val stamped = next.copy(params = next.params + ("epoch" -> (expected + 1)))
      writeManifest(spark, dir, stamped)
      val after = readManifest(spark, dir)
      if (after != stamped)
        throw new ConcurrentMutationException(
          s"manifest commit at $dir was overwritten by a concurrent mutator " +
            s"(found epoch ${epochOf(after)}, expected ${expected + 1}) - " +
            "THIS mutation did not land; its staged data is orphaned and " +
            "will be healed; re-run to retry")
      stamped
    } finally if (!alreadyHeld) releaseLease(fs, dir, token)
  }

  def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val root = mapper.createObjectNode()
    root.put("family", m.family)
    root.put("dim", m.dim)
    root.put("n", m.n)
    val p = root.putObject("params")
    m.params.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    val bytes = root.toPrettyString.getBytes("UTF-8")
    val path = new Path(dir, "manifest.json")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(path, false)
    if (!fs.rename(tmp, path)) {
      // a crash-healing reader may have raced us inside the
      // delete-to-rename window — either promoting OUR tmp itself (the
      // commit completed, just not by our hand) or deleting it as stale
      // next to a manifest that is now gone. Losing the rename is a
      // failure only if the target doesn't hold what we wrote; before
      // concluding failure, re-create the target from the bytes still in
      // hand — without this, a writer that dies here leaves the artifact
      // with NO manifest at all (the race destroyed the old commit point
      // and the rename never installed the new one).
      def landed: Boolean =
        try parseManifest(fs, path) == m
        catch { case scala.util.control.NonFatal(_) => false }
      if (!landed) {
        val retry = fs.create(path, true)
        try retry.write(bytes) finally retry.close()
        if (!landed)
          throw new java.io.IOException(s"rename $tmp -> $path failed " +
            "and direct re-create did not verify")
      }
    } else {
      val len = fs.getFileStatus(path).getLen
      if (len != bytes.length)
        throw new java.io.IOException(
          s"manifest commit verify failed: $path is $len bytes, expected ${bytes.length}")
    }
  }

  private def parseManifest(fs: org.apache.hadoop.fs.FileSystem,
      path: Path): Manifest = {
    val in = fs.open(path)
    val root = try mapper.readTree(in) finally in.close()
    val params = scala.collection.mutable.Map[String, Long]()
    root.get("params").fields().forEachRemaining { e =>
      params(e.getKey) = e.getValue.asLong()
    }
    Manifest(root.get("family").asText(), root.get("dim").asInt(),
      root.get("n").asLong(), params.toMap)
  }

  /** Read a manifest back; fails loudly on a missing/foreign directory
    * (loading half an index would corrupt every query served from it).
    * Heals an interrupted [[writeManifest]] first — the compactor's
    * recoverInterruptedCommits cases — but stays PASSIVE while a live
    * writer may be mid-commit: on (tmp exists, target missing) the
    * target is retried briefly before recovery (a writer inside its
    * delete-to-rename window finishes in milliseconds; a crashed one
    * never does), and a recovery rename lost to a concurrent healer
    * counts as success if the target now parses. Heal cases: target
    * missing + PARSEABLE tmp → finish the rename (an unparseable tmp —
    * a crash mid-tmp-write on a first-ever build — is deleted, never
    * promoted into a corrupt manifest); parseable target → ignore the
    * stale tmp (the next commit overwrites it; deleting it here would
    * race a live writer's fresh tmp); corrupt target + parseable tmp →
    * complete the commit from the tmp; both unparseable → refuse loudly
    * rather than pick one blind. The stale-tmp delete next to a
    * parseable target keeps crashed-commit leftovers from accumulating;
    * its only race (a reader dropping a LIVE writer's fresh tmp) is
    * DETECTED by the writer's lost-rename content check, which then
    * re-creates the target from the bytes it still holds — detection
    * plus best-effort repair, not a full transactional guarantee. */
  def readManifest(spark: SparkSession, dir: String): Manifest = {
    val path = new Path(dir, "manifest.json")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(path.getParent, s".${path.getName}.tmp")
    def parses(p: Path): Boolean =
      try { parseManifest(fs, p); true }
      catch { case scala.util.control.NonFatal(_) => false }
    def recoverRename(): Unit =
      if (!fs.rename(tmp, path) && !parses(path))
        throw new java.io.IOException(s"manifest recovery rename failed: $tmp")
    if (fs.exists(tmp) && !fs.exists(path)) {
      // a live writer sits in its delete-to-rename window for only an
      // instant (a local/HDFS delete+rename is µs–ms) — back off
      // exponentially 1,2,4,8,16,16,16 ms (~63 ms total) before
      // concluding this is a crash, so a genuinely crashed first-ever
      // build taxes every subsequent read well under 100 ms instead of
      // a flat half-second poll
      var delay = 1L
      var total = 0L
      while (total < 63 && !fs.exists(path)) {
        Thread.sleep(delay); total += delay; delay = math.min(delay * 2, 16L)
      }
    }
    if (fs.exists(tmp)) {
      if (!fs.exists(path)) {
        if (parses(tmp)) recoverRename()
        else fs.delete(tmp, false) // torn first-ever commit: nothing to heal
      } else if (parses(path)) {
        fs.delete(tmp, false) // committed manifest wins; drop the stale tmp
      } else if (parses(tmp)) {
        fs.delete(path, false)
        recoverRename()
      } else {
        throw new java.io.IOException(
          s"both $path and $tmp are unparseable — refusing to pick one " +
            "blind; manual repair required")
      }
    }
    parseManifest(fs, path)
  }

  /** Delete numbered subdirectories of `root` outside the committed
    * live window `[liveBase, committed)` — the orphan-heal step before
    * staging a new delta/version (an orphan above the window is data
    * from a mutation that never reached its manifest commit; the retry
    * overwrites slot `committed`, later slots are abandoned) and the
    * garbage-collection step after a compaction commit (slots below
    * `liveBase` were folded into the committed slab; readers already
    * ignore them, so deleting them is safe at any point after the
    * commit — the compactor's delete-AFTER-rewrite ordering). `prefix`
    * is e.g. "delta-" or "v-". */
  def healOrphans(spark: SparkSession, root: String, prefix: String,
      committed: Long, liveBase: Long = 0L): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.listStatus(p).foreach { st =>
      val suffix = st.getPath.getName.stripPrefix(prefix)
      if (st.getPath.getName.startsWith(prefix) && suffix.nonEmpty &&
          suffix.forall(_.isDigit) &&
          (suffix.toLong >= committed || suffix.toLong < liveBase))
        fs.delete(st.getPath, true)
    }
  }
}
