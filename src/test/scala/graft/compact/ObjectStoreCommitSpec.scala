package graft.compact

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Object-store commit protocol (VERDICT r1 §Next-7): on S3A-style
  * stores `FileSystem.rename` is copy+delete, not atomic — so every
  * publish is staged (tmp write → delete → rename → length verify) and
  * the crash windows that protocol leaves are healed on the next run:
  *  - snapshot `.X.info.json.tmp` with X missing  → rename completed;
  *  - stale tmp next to a live X                  → tmp dropped;
  *  - partial/garbage file at a final data name   → overwritten by the
  *    re-run (nothing references an output until its bucket's snapshot
  *    rewrite commits).
  */
class ObjectStoreCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = 1737928800L * 1000000000L

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

  /** Minimal one-bucket fixture: two WAL files in one hour. */
  private def buildFixture(): File = {
    val dir = Files.createTempDirectory("graft_oscommit").toFile
    val rel1 = "edge0/dbs/db-0/table-0/2025-01-26/22-00/0000000001.parquet"
    val rel2 = "edge0/dbs/db-0/table-0/2025-01-26/22-10/0000000002.parquet"
    val rows1 = Seq((base + 1L, "a", 1.0), (base + 5L, "a", 1.5))
    val rows2 = Seq((base + 600L * 1000000000L, "b", 2.0))
    writeParquetFile(new File(dir, rel1), rows1)
    writeParquetFile(new File(dir, rel2), rows2)
    def fm(id: Long, p: String, rows: Seq[(Long, String, Double)]) =
      FileMeta(id, p, new File(dir, p).length(), rows.length,
        rows.map(_._1).min, rows.map(_._1).min, rows.map(_._1).max)
    val snap = SnapshotMeta("edge0", 0, 0, base, base + 1,
      Vector(DbTables(0, Vector(TableFiles(0,
        Vector(fm(1, rel1, rows1), fm(2, rel2, rows2)))))))
    val snapDir = new File(dir, "edge0/snapshots"); snapDir.mkdirs()
    Files.writeString(Paths.get(snapDir.toString, "0000000001.info.json"),
      SnapshotCodec.render(snap))
    dir
  }

  private def run(dir: File): Seq[HostReport] =
    new Orchestrator(spark, CompactConfig(dataDir = dir.toString)).run()

  test("interrupted snapshot commit (tmp present, target gone) is completed") {
    val dir = buildFixture()
    val snap = new File(dir, "edge0/snapshots/0000000001.info.json")
    val tmp = new File(dir, "edge0/snapshots/.0000000001.info.json.tmp")
    // simulate the delete→rename crash window: full content in tmp, no target
    Files.copy(snap.toPath, tmp.toPath)
    Files.delete(snap.toPath)

    val r = run(dir).head
    assert(snap.isFile, "recovery must restore the snapshot from its tmp")
    assert(!tmp.exists())
    assert(r.compacted == 1) // and planning proceeded from the recovered file
    val s = SnapshotCodec.parse(Files.readString(snap.toPath))
    assert(s.allFiles.exists(_.path.contains("c_0000000001_0000000002_h22")))
  }

  test("stale snapshot tmp next to a live target is dropped, not applied") {
    val dir = buildFixture()
    val snap = new File(dir, "edge0/snapshots/0000000001.info.json")
    val tmp = new File(dir, "edge0/snapshots/.0000000001.info.json.tmp")
    Files.writeString(tmp.toPath, "{ \"stale\": true }") // garbage tmp

    val r = run(dir).head
    assert(r.compacted == 1)
    assert(!tmp.exists(), "stale tmp must be garbage-collected")
    val s = SnapshotCodec.parse(Files.readString(snap.toPath))
    assert(s.allFiles.exists(_.path.contains("c_0000000001_0000000002_h22")))
  }

  test("corrupt target next to a complete tmp: commit completed from tmp") {
    // crash mid-rename on a copy+delete store: PARTIAL target, complete
    // tmp. Recovery must not delete the tmp (the only good copy) — it
    // must finish the commit from it (r2 advice, medium).
    val dir = buildFixture()
    val snap = new File(dir, "edge0/snapshots/0000000001.info.json")
    val tmp = new File(dir, "edge0/snapshots/.0000000001.info.json.tmp")
    val full = Files.readString(snap.toPath)
    Files.writeString(tmp.toPath, full) // complete content in the tmp
    Files.writeString(snap.toPath, full.take(full.length / 2)) // truncated X

    val r = run(dir).head
    assert(!tmp.exists())
    val s = SnapshotCodec.parse(Files.readString(snap.toPath)) // parses again
    assert(r.compacted == 1) // and planning proceeded from the recovered file
    assert(s.allFiles.exists(_.path.contains("c_0000000001_0000000002_h22")))
  }

  test("both target and tmp corrupt: loud failure, nothing deleted") {
    val dir = buildFixture()
    val snap = new File(dir, "edge0/snapshots/0000000001.info.json")
    val tmp = new File(dir, "edge0/snapshots/.0000000001.info.json.tmp")
    Files.writeString(tmp.toPath, "not json")
    Files.writeString(snap.toPath, "also not json")
    val orch = new Orchestrator(spark, CompactConfig(dataDir = dir.toString))
    val err = intercept[java.io.IOException] { orch.runHost("edge0") }
    assert(err.getMessage.contains("unparseable"), err.getMessage)
    assert(snap.isFile && tmp.isFile, "recovery must not destroy evidence")
  }

  test("a truncating rename (S3A partial copy) fails the commit verify") {
    // fault injection: a FileSystem whose rename silently truncates the
    // destination — the copy+delete failure mode of object stores. The
    // commit's length verification must catch it and fail the merge
    // while inputs and snapshots are untouched.
    val dir = buildFixture()
    val under = Compactor.localFs(spark)
    val truncating = new org.apache.hadoop.fs.FilterFileSystem(under) {
      override def rename(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean = {
        val ok = super.rename(src, dst)
        if (ok && dst.getName.startsWith("c_")) {
          val full = under.getFileStatus(dst).getLen
          val out = under.create(dst, true)
          try out.write(Array.fill[Byte]((full / 2).toInt)(0x1))
          finally out.close()
        }
        ok
      }
    }
    val snaps = new File(dir, "edge0/snapshots").listFiles
      .filter(_.getName.endsWith(".info.json"))
      .map(f => SnapshotCodec.parse(Files.readString(f.toPath))).toVector
    val (buckets, _) = Planner.plan(snaps, windowHours = 1)
    val err = intercept[java.io.IOException] {
      new Compactor(spark, truncating)
        .merge(new org.apache.hadoop.fs.Path(dir.toString), buckets.head)
    }
    assert(err.getMessage.contains("commit verify failed"), err.getMessage)
    // inputs still intact — nothing references the bad output
    assert(new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/0000000001.parquet").isFile)
    assert(new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-10/0000000002.parquet").isFile)
  }

  test("partial file at the final output name is overwritten by a re-run") {
    val dir = buildFixture()
    val out = new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000002_h22.parquet")
    // simulate a crashed non-atomic copy: truncated garbage at the final name
    out.getParentFile.mkdirs()
    Files.write(out.toPath, Array.fill[Byte](128)(0x42))

    val r = run(dir).head
    assert(r.compacted == 1)
    // the re-run replaced the partial file with a complete, readable one
    val rows = spark.read.parquet(out.toString).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }
}
