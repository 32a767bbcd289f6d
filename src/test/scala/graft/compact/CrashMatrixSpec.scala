package graft.compact

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.{FilterFileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Crash-matrix fault injection for the whole commit protocol (r2 verdict
  * next-5): a wrapping FileSystem fails the N-th MUTATING call
  * (create/delete/rename), for every N across the full
  * merge→rewrite→delete→GC sequence. After every injected crash the
  * invariant must hold:
  *
  *   1. snapshot metadata never references missing data (every file in
  *      every parseable snapshot exists on disk — modulo a snapshot tmp
  *      that recovery will roll forward), and
  *   2. a second, un-faulted run converges: everything compacts, all
  *      originals are gone, snapshots reference exactly the outputs.
  */
class CrashMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = 1737928800L * 1000000000L

  private class FaultyFs(
      under: org.apache.hadoop.fs.FileSystem, failAt: Int)
      extends FilterFileSystem(under) {
    val mutations = new AtomicInteger
    private def tick(op: String, p: Path): Unit =
      if (mutations.incrementAndGet() == failAt)
        throw new java.io.IOException(s"injected fault at $op $p")
    override def create(p: Path, overwrite: Boolean)
        : org.apache.hadoop.fs.FSDataOutputStream = {
      tick("create", p); super.create(p, overwrite)
    }
    override def delete(p: Path, recursive: Boolean): Boolean = {
      tick("delete", p); super.delete(p, recursive)
    }
    override def rename(src: Path, dst: Path): Boolean = {
      tick("rename", src); super.rename(src, dst)
    }
  }

  private def writeParquetFile(dest: File, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    dest.getParentFile.mkdirs()
    val tmp = new File(dest.getParentFile, ".tmp_" + dest.getName)
    rows.toDF("time", "sensor", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles.find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles.foreach(_.delete()); tmp.delete()
  }

  /** Two buckets (two hours), two WAL files each, one snapshot. */
  private def buildFixture(): File = {
    val dir = Files.createTempDirectory("graft_crashmatrix").toFile
    val metas = for {
      hour <- Seq(21, 22)
      file <- 0 to 1
    } yield {
      val wal = f"${hour * 10 + file + 1}%010d"
      val rel = f"edge0/dbs/db-0/table-0/2025-01-26/$hour%02d-${file * 30}%02d/$wal.parquet"
      val t0 = base + (hour - 21).toLong * 3600L * 1000000000L
      val rows = (0 until 5).map(i =>
        (t0 + (file * 100 + i).toLong * 1000000000L, "s", i * 1.0))
      writeParquetFile(new File(dir, rel), rows)
      FileMeta((hour * 10 + file).toLong, rel, new File(dir, rel).length(),
        rows.length, rows.map(_._1).min, rows.map(_._1).min, rows.map(_._1).max)
    }
    val snap = SnapshotMeta("edge0", metas.map(_.size_bytes).sum,
      metas.map(_.row_count).sum, metas.map(_.min_time).min,
      metas.map(_.max_time).max,
      Vector(DbTables(0, Vector(TableFiles(0, metas.toVector)))))
    val snapDir = new File(dir, "edge0/snapshots"); snapDir.mkdirs()
    Files.writeString(Paths.get(snapDir.toString, "0000000001.info.json"),
      SnapshotCodec.render(snap))
    dir
  }

  /** Every file referenced by any parseable snapshot exists on disk.
    * A snapshot that fails to parse is only tolerated when its rollback
    * copy (.tmp) exists — the window recovery rolls forward from. */
  private def assertNoDanglingRefs(dir: File): Unit = {
    val snapDir = new File(dir, "edge0/snapshots")
    snapDir.listFiles.filter(_.getName.endsWith(".info.json")).foreach { f =>
      val parsed =
        try Some(SnapshotCodec.parse(Files.readString(f.toPath)))
        catch { case scala.util.control.NonFatal(_) => None }
      parsed match {
        case Some(snap) =>
          snap.allFiles.foreach { fm =>
            assert(new File(dir, fm.path).isFile,
              s"${f.getName} references missing data: ${fm.path}")
          }
        case None =>
          assert(new File(snapDir, s".${f.getName}.tmp").isFile,
            s"${f.getName} is corrupt with no recovery tmp")
      }
    }
  }

  private def countMutations(dir: File): Int = {
    val fs = new FaultyFs(Compactor.localFs(spark), failAt = Int.MaxValue)
    new Orchestrator(spark, CompactConfig(dataDir = dir.toString,
      bucketParallelism = 1), Some(fs)).run()
    fs.mutations.get()
  }

  test("invariant holds after a crash at EVERY FS mutation point") {
    val total = countMutations(buildFixture())
    assert(total > 10, s"fixture exercises too few mutations: $total")
    (1 to total).foreach { n =>
      val dir = buildFixture()
      val fs = new FaultyFs(Compactor.localFs(spark), failAt = n)
      val orch = new Orchestrator(spark, CompactConfig(
        dataDir = dir.toString, bucketParallelism = 1), Some(fs))
      try { orch.runHost("edge0"); () }
      catch { case _: Throwable => () } // the injected crash (possibly wrapped)
      assertNoDanglingRefs(dir)

      // second, un-faulted run converges to the fully-compacted state
      val clean = new Orchestrator(spark,
        CompactConfig(dataDir = dir.toString, bucketParallelism = 1))
      clean.run()
      val snap = SnapshotCodec.parse(Files.readString(
        Paths.get(dir.toString, "edge0/snapshots/0000000001.info.json")))
      val refs = snap.allFiles.map(_.path).sorted
      assert(refs.length == 2, s"failAt=$n: expected 2 compacted refs, got $refs")
      assert(refs.forall(_.contains("c_")), s"failAt=$n: uncompacted refs: $refs")
      refs.foreach(p => assert(new File(dir, p).isFile,
        s"failAt=$n: referenced output missing: $p"))
      // the snapshot view of the data is complete: all 20 rows, no dupes.
      // (A crash between rewrite and delete may leave UNREFERENCED stray
      // WALs — by design: deleting files no snapshot references would race
      // the live database; strays are invisible to every reader.)
      val rows = spark.read
        .parquet(refs.map(p => new File(dir, p).toString): _*).count()
      assert(rows == 20L, s"failAt=$n: snapshot view has $rows rows, not 20")
    }
  }
}
