package graft.compact

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** An unparseable snapshot makes its whole host unplannable: its file
  * references are invisible, so compacting and deleting around it could
  * strand the only reference to a data file. Both planning branches must
  * report the bad snapshot and skip the host WITHOUT mutating anything —
  * and without failing the run (r5 ADVICE #1). */
class BadSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = 1737928800L * 1000000000L

  private def buildHost(dir: File, host: String): Vector[FileMeta] = {
    import spark.implicits._
    val metas = (0 until 3).map { i =>
      val wal = f"${i + 1}%010d"
      val rel = s"$host/dbs/db-0/t0/2025-01-26/00-${i * 10}%02d/$wal.parquet"
      val dest = new File(dir, rel)
      dest.getParentFile.mkdirs()
      val tmp = new File(dest.getParentFile, ".t")
      val rows = (0 until 5).map(j => (base + (i * 10 + j) * 1000000000L, j * 1.0))
      rows.toDF("time", "value").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles.find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
      tmp.listFiles.foreach(_.delete()); tmp.delete()
      FileMeta(i + 1L, rel, dest.length(), rows.length,
        rows.map(_._1).min, rows.map(_._1).min, rows.map(_._1).max)
    }.toVector
    val snap = SnapshotMeta(host, metas.map(_.size_bytes).sum,
      metas.map(_.row_count).sum, metas.map(_.min_time).min,
      metas.map(_.max_time).max,
      Vector(DbTables(0, Vector(TableFiles(0, metas)))))
    val snapDir = new File(dir, s"$host/snapshots"); snapDir.mkdirs()
    Files.writeString(Paths.get(snapDir.toString, "0000000001.info.json"),
      SnapshotCodec.render(snap))
    Files.writeString(Paths.get(snapDir.toString, "0000000002.info.json"),
      "{ this is not a snapshot")
    metas
  }

  private def check(threshold: Int): Unit = {
    val dir = Files.createTempDirectory(s"graft_badsnap_$threshold").toFile
    val metas = buildHost(dir, "h1")
    val goodBefore = Files.readString(
      Paths.get(dir.toString, "h1/snapshots/0000000001.info.json"))

    val reports = new Orchestrator(spark, CompactConfig(
      dataDir = dir.toString, distributedPlanThreshold = threshold)).run()
    assert(reports.length == 1)
    val r = reports.head
    assert(r.compacted == 0)
    assert(r.deleted.isEmpty && r.rewrittenSnapshots.isEmpty)
    assert(r.skippedPaths.exists(_.endsWith("0000000002.info.json")))
    // nothing on disk was touched: originals present, good snapshot intact
    metas.foreach(m => assert(new File(dir, m.path).isFile))
    assert(Files.readString(Paths.get(dir.toString,
      "h1/snapshots/0000000001.info.json")) == goodBefore)
  }

  test("driver-side branch skips the host on an unparseable snapshot") {
    check(threshold = 1000000)
  }

  test("executor-side branch skips the host on an unparseable snapshot") {
    check(threshold = 0)
  }
}
