package graft.compact

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Golden end-to-end test over a synthetic InfluxDB3-layout tree
  * (FIXTURES.md §1): multi-file hour, singleton hour, duplicate refs
  * across snapshots, missing file, >2^53 timestamps, idempotence, dry-run.
  */
class CompactorE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = 1737928800L * 1000000000L // 2025-01-26T22:00Z in ns, > 2^53

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

  /** Build the fixture tree; returns (dataDir, per-file row data). */
  private def buildFixture(): (File, Map[String, Seq[(Long, String, Double)]]) = {
    val dir = Files.createTempDirectory("graft_e2e").toFile
    val h = "edge0"
    def rel(p: String) = s"$h/dbs/$p"
    // hour 22, table-0: three files, deliberately written out of time order
    val data = Map(
      rel("db-0/table-0/2025-01-26/22-10/0000000002.parquet") ->
        Seq((base + 600L * 1000000000L, "s2", 2.0), (base + 601L * 1000000000L, "s2", 2.5)),
      rel("db-0/table-0/2025-01-26/22-00/0000000001.parquet") ->
        Seq((base + 5L, "s1", 1.0), (base + 1L, "s1", 1.5)),
      rel("db-0/table-0/2025-01-26/22-40/0000000003.parquet") ->
        Seq((base + 2400L * 1000000000L, "s3", 3.0)),
      // singleton hour 23 — must remain untouched
      rel("db-0/table-0/2025-01-26/23-00/0000000005.parquet") ->
        Seq((base + 3600L * 1000000000L + 7L, "s1", 4.0)),
      // second table, same hour 22 — must NOT merge with table-0
      rel("db-1/table-9/2025-01-26/22-00/0000000006.parquet") ->
        Seq((base + 9L, "t", 6.0)),
      rel("db-1/table-9/2025-01-26/22-30/0000000007.parquet") ->
        Seq((base + 10L, "t", 7.0)))
    data.foreach { case (p, rows) => writeParquetFile(new File(dir, p), rows) }

    def fm(id: Long, p: String, rows: Seq[(Long, String, Double)]): FileMeta = {
      val f = new File(dir, p)
      FileMeta(id, p, f.length(), rows.length, rows.map(_._1).min,
        rows.map(_._1).min, rows.map(_._1).max)
    }
    val t0Files = Vector(
      fm(1, rel("db-0/table-0/2025-01-26/22-00/0000000001.parquet"),
        data(rel("db-0/table-0/2025-01-26/22-00/0000000001.parquet"))),
      fm(2, rel("db-0/table-0/2025-01-26/22-10/0000000002.parquet"),
        data(rel("db-0/table-0/2025-01-26/22-10/0000000002.parquet"))),
      fm(5, rel("db-0/table-0/2025-01-26/23-00/0000000005.parquet"),
        data(rel("db-0/table-0/2025-01-26/23-00/0000000005.parquet"))))
    val snap1 = SnapshotMeta("edge0", t0Files.map(_.size_bytes).sum,
      t0Files.map(_.row_count).sum, t0Files.map(_.min_time).min,
      t0Files.map(_.max_time).max,
      Vector(DbTables(0, Vector(TableFiles(0, t0Files)))))
    // snapshot 2: re-references file 2 (dedup), adds 3, a MISSING file, and db-1
    val t0b = Vector(
      fm(2, rel("db-0/table-0/2025-01-26/22-10/0000000002.parquet"),
        data(rel("db-0/table-0/2025-01-26/22-10/0000000002.parquet"))),
      fm(3, rel("db-0/table-0/2025-01-26/22-40/0000000003.parquet"),
        data(rel("db-0/table-0/2025-01-26/22-40/0000000003.parquet"))),
      FileMeta(4, rel("db-0/table-0/2025-01-26/22-50/0000000004.parquet"),
        999, 9, base, base, base + 1)) // referenced but never written
    val t9 = Vector(
      fm(6, rel("db-1/table-9/2025-01-26/22-00/0000000006.parquet"),
        data(rel("db-1/table-9/2025-01-26/22-00/0000000006.parquet"))),
      fm(7, rel("db-1/table-9/2025-01-26/22-30/0000000007.parquet"),
        data(rel("db-1/table-9/2025-01-26/22-30/0000000007.parquet"))))
    val snap2 = SnapshotMeta("edge0", 0, 0, base, base + 1,
      Vector(DbTables(0, Vector(TableFiles(0, t0b))),
        DbTables(1, Vector(TableFiles(9, t9)))))

    val snapDir = new File(dir, s"$h/snapshots"); snapDir.mkdirs()
    Files.writeString(Paths.get(snapDir.toString, "0000000001.info.json"),
      SnapshotCodec.render(snap1))
    Files.writeString(Paths.get(snapDir.toString, "0000000002.info.json"),
      SnapshotCodec.render(snap2))
    (dir, data)
  }

  private def runPipeline(dir: File, dryRun: Boolean = false): Seq[HostReport] =
    new Orchestrator(spark,
      CompactConfig(dataDir = dir.toString, dryRun = dryRun, bucketParallelism = 2))
      .run()

  test("end-to-end compaction: merge, sort, rename, rewrite, delete, GC") {
    val (dir, data) = buildFixture()
    val reports = runPipeline(dir)
    assert(reports.length == 1)
    val r = reports.head
    assert(r.compacted == 2) // (db-0,table-0,h22) and (db-1,table-9,h22)

    // (a) exact output name + location
    val out0 = new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000003_h22.parquet")
    val out9 = new File(dir,
      "edge0/dbs/db-1/table-9/2025-01-26/22-00/c_0000000006_0000000007_h22.parquet")
    assert(out0.isFile && out9.isFile)

    // (b) rows = union of inputs, globally sorted by time
    val rows = spark.read.parquet(out0.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val expected = (data.filterKeys(_.contains("table-0/2025-01-26/22-"))
      .values.flatten.toSeq).sortBy(_._1)
    assert(rows == expected)
    assert(rows.map(_._1) == rows.map(_._1).sorted)

    // (c) originals deleted, empty hour dirs pruned
    assert(!new File(dir, "edge0/dbs/db-0/table-0/2025-01-26/22-10").exists())
    assert(!new File(dir, "edge0/dbs/db-0/table-0/2025-01-26/22-40").exists())
    // singleton hour untouched
    assert(new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/23-00/0000000005.parquet").isFile)

    // (d) snapshots rewritten surgically with exact Long stats
    val s1 = SnapshotCodec.parse(Files.readString(
      Paths.get(dir.toString, "edge0/snapshots/0000000001.info.json")))
    val t0 = s1.databases.find(_.dbId == 0).get.tables.find(_.tableId == 0).get
    val t0paths = t0.files.map(_.path)
    assert(t0paths.contains(
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000003_h22.parquet"))
    // the hour-23 singleton survives the rewrite (no clobber)
    assert(t0paths.contains(
      "edge0/dbs/db-0/table-0/2025-01-26/23-00/0000000005.parquet"))
    assert(!t0paths.exists(_.contains("22-10")))
    val newMeta = t0.files.find(_.path.contains("c_0000000001")).get
    assert(newMeta.row_count == 5) // 2+2+1 rows
    assert(newMeta.size_bytes == out0.length()) // REAL size, not input sum
    assert(newMeta.min_time == base + 1L) //       exact ns, > 2^53
    assert(newMeta.max_time == base + 2400L * 1000000000L)

    val s2 = SnapshotCodec.parse(Files.readString(
      Paths.get(dir.toString, "edge0/snapshots/0000000002.info.json")))
    val t0b = s2.databases.find(_.dbId == 0).get.tables.find(_.tableId == 0).get
    // dangling (missing-on-disk) reference is kept, not clobbered
    assert(t0b.files.exists(_.path.contains("22-50/0000000004.parquet")))
    assert(t0b.files.exists(_.path.contains("c_0000000001_0000000003_h22")))

    // (e) idempotence: second run is a no-op
    val again = runPipeline(dir)
    assert(again.head.compacted == 0)
    assert(again.head.rewrittenSnapshots.isEmpty)

    // top-level stats are Long-exact
    assert(s1.row_count == s1.allFiles.map(_.row_count).sum)
    assert(s1.min_time > (1L << 53)) // would be corrupted by a double path
  }

  test("dry-run plans but writes nothing") {
    val (dir, _) = buildFixture()
    val before = listTree(dir)
    val reports = runPipeline(dir, dryRun = true)
    assert(reports.head.buckets == 2 && reports.head.compacted == 0)
    assert(listTree(dir) == before)
  }

  test("re-compaction folds an existing compacted file with new WAL files") {
    val (dir, _) = buildFixture()
    runPipeline(dir)
    // a late-arriving WAL file lands in the already-compacted hour
    val late = "edge0/dbs/db-0/table-0/2025-01-26/22-50/0000000008.parquet"
    val lateRows = Seq((base + 2500L * 1000000000L, "s4", 8.0))
    writeParquetFile(new File(dir, late), lateRows)
    val lateMeta = FileMeta(8, late, new File(dir, late).length(), 1,
      lateRows.head._1, lateRows.head._1, lateRows.head._1)
    val existing = SnapshotCodec.parse(Files.readString(
      Paths.get(dir.toString, "edge0/snapshots/0000000002.info.json")))
    val patched = existing.copy(databases = existing.databases.map { db =>
      if (db.dbId != 0) db
      else db.copy(tables = db.tables.map(t =>
        if (t.tableId != 0) t else t.copy(files = t.files :+ lateMeta)))
    })
    Files.writeString(
      Paths.get(dir.toString, "edge0/snapshots/0000000002.info.json"),
      SnapshotCodec.render(patched))

    val r = runPipeline(dir).head
    assert(r.compacted == 1)
    val out = new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000008_h22.parquet")
    assert(out.isFile)
    val rows = spark.read.parquet(out.toString).count()
    assert(rows == 6) // 5 previously compacted + 1 late
  }

  test("crash window recovery: output written, metadata rewrite never ran") {
    // With the fixed ordering (write -> rewrite meta -> delete; SURVEY.md
    // §7.4 bug 5) the only possible partial state after a crash is "stale
    // compacted file exists, metadata and originals untouched". A re-run
    // must recover to exactly the golden end state with zero data loss.
    val (dir, data) = buildFixture()
    val root = new org.apache.hadoop.fs.Path(dir.toString)
    val fs = Compactor.localFs(spark)
    val snapDir = new File(dir, "edge0/snapshots")
    val snaps = snapDir.listFiles.filter(_.getName.endsWith(".info.json"))
      .sortBy(_.getName)
      .map(f => SnapshotCodec.parse(Files.readString(f.toPath))).toVector
    val (buckets, _) = Planner.plan(snaps, windowHours = 1)
    val b0 = buckets.find(b => b.db == "db-0" && b.table == "table-0").get
    val present = b0.files.filter(f => new File(dir, f.path).isFile)
    // "crash": merge only — no metadata rewrite, no deletes
    new Compactor(spark, fs).merge(root,
      b0.copy(files = present, sources = present.map(_.path).toSet))
    assert(new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000003_h22.parquet").isFile)
    assert(new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-10/0000000002.parquet").isFile)

    // recovery = just run the pipeline again
    val r = runPipeline(dir).head
    assert(r.compacted == 2)
    val out0 = new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000003_h22.parquet")
    val rows = spark.read.parquet(out0.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val expected = data.filterKeys(_.contains("table-0/2025-01-26/22-"))
      .values.flatten.toSeq.sortBy(_._1)
    assert(rows == expected) // no loss, no duplication
    assert(!new File(dir, "edge0/dbs/db-0/table-0/2025-01-26/22-10").exists())
    val s1 = SnapshotCodec.parse(Files.readString(
      Paths.get(dir.toString, "edge0/snapshots/0000000001.info.json")))
    assert(s1.allFiles.exists(_.path.contains("c_0000000001_0000000003_h22")))
  }

  private def listTree(dir: File): Set[String] = {
    def walk(f: File): Seq[String] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) :+ f.toString
      else Seq(f.toString)
    walk(dir).toSet
  }
}
