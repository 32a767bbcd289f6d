package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The z-order layout's reason to exist, measured on REAL parquet
  * footers: a time-sorted file set has useless series zone maps (every
  * file spans the whole hash range — a one-series probe reads all of
  * them), while the z-ordered set bounds BOTH axes per file, so the
  * same probe skips most files. This is the scan-pruning win a 100 TB
  * store gets from writing compacted files as curve segments. */
class LayoutPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val NumFiles = 16

  /** per-FILE min/max of the named int64 columns, from the footers */
  private def fileStats(dir: String,
      cols: Set[String]): Seq[Map[String, (Long, Long)]] = {
    val conf = new Configuration()
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).toSeq
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getPath), conf))
        try {
          val m = collection.mutable.Map[String, (Long, Long)]()
          r.getFooter.getBlocks.forEach { b =>
            b.getColumns.forEach { c =>
              val name = c.getPath.toDotString
              if (cols.contains(name) && c.getStatistics != null &&
                c.getStatistics.hasNonNullValue) {
                c.getStatistics.genericGetMin match {
                  case lo: java.lang.Long =>
                    val hi = c.getStatistics.genericGetMax
                      .asInstanceOf[java.lang.Long]
                    val cur = m.getOrElse(name, (Long.MaxValue, Long.MinValue))
                    m(name) = (math.min(cur._1, lo), math.max(cur._2, hi))
                  case _ => ()
                }
              }
            }
          }
          m.toMap
        } finally r.close()
      }
      .filter(_.nonEmpty) // empty range partitions write zero-row files
  }

  private def filesAdmitting(stats: Seq[Map[String, (Long, Long)]],
      preds: Map[String, (Long, Long)]): Int =
    stats.count(s => preds.forall { case (c, (lo, hi)) =>
      val (mn, mx) = s(c)
      mx >= lo && mn <= hi
    })

  test("one-series probe: z-order skips most files, time-sort reads all") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        graft.functions.XHash.hash60(concat(lit("z:"),
          col("user_id").cast("string"), lit("/"), col("event_type")))
          .as("series_h"))
      .persist()
    val n = ev.count()
    val zdir = java.nio.file.Files.createTempDirectory("graft_zlayout").toString
    val tdir = java.nio.file.Files.createTempDirectory("graft_tlayout").toString
    try {
      Layout.writeZOrdered(ev, "event_id", "ts_us", "series_h",
        zdir, NumFiles, rowBound = n)
      Layout.writeTimeSorted(ev, "ts_us", tdir, NumFiles)

      // nothing lost, zkey written
      assert(spark.read.parquet(zdir).count() == n)
      assert(spark.read.parquet(zdir).columns.contains("zkey"))
      assert(spark.read.parquet(tdir).count() == n)

      val zStats = fileStats(zdir, Set("ts_us", "series_h"))
      val tStats = fileStats(tdir, Set("ts_us", "series_h"))
      assert(zStats.size >= NumFiles / 2 && tStats.size >= NumFiles / 2)

      // probe series: the hash of one real (user, type) pair
      val h0 = ev.select(col("series_h")).head().getLong(0)
      val seriesPred = Map("series_h" -> ((h0, h0)))
      val tMatched = filesAdmitting(tStats, seriesPred)
      val zMatched = filesAdmitting(zStats, seriesPred)
      // time-sorted files each span ~the full hash range (series
      // interleave across time), z files bound the series axis
      assert(tMatched >= (tStats.size * 9) / 10,
        s"time-sorted zone maps should admit ~all files: $tMatched/${tStats.size}")
      assert(zMatched * 2 <= tMatched,
        s"z-order must at least halve the admitted files: $zMatched vs $tMatched")

      // combined (series AND 2-day window): z at least matches the
      // time-layout's pruning — with the series bound stacked on top
      val bounds = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (tsLo, tsHi) = (bounds.getLong(0), bounds.getLong(1))
      val dayUs = 86400L * 1000000L
      val window = Map("ts_us" -> ((tsLo, math.min(tsHi, tsLo + 2 * dayUs))),
        "series_h" -> ((h0, h0)))
      val tBoth = filesAdmitting(tStats, window)
      val zBoth = filesAdmitting(zStats, window)
      assert(zBoth <= tBoth,
        s"combined predicate: z admitted $zBoth vs time-sorted $tBoth")
    } finally {
      ev.unpersist()
      Seq(zdir, tdir).foreach { d =>
        val f = new java.io.File(d)
        Option(f.listFiles).foreach(_.foreach(x => { x.delete(); () }))
        f.delete()
      }
    }
  }

  test("3-axis probe: (type AND user) predicates prune beyond 2-axis") {
    // tag-heavy payloads want time x 2+ tags (r7 verdict #9): split the
    // series hash into its two real tag axes. A (type_h, user_h) point
    // probe must admit FEW 3-axis files, while the time-sorted layout
    // (every file spans both hash ranges) admits ~all.
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"),
        graft.functions.XHash.hash60(col("event_type")).as("type_h"),
        graft.functions.XHash.hash60(col("user_id").cast("string"))
          .as("user_h"))
      .persist()
    val n = ev.count()
    val zdir = java.nio.file.Files.createTempDirectory("graft_z3layout").toString
    val tdir = java.nio.file.Files.createTempDirectory("graft_t3layout").toString
    try {
      Layout.writeZOrderedAxes(ev, "event_id",
        Seq("ts_us", "type_h", "user_h"), zdir, NumFiles, rowBound = n)
      Layout.writeTimeSorted(ev, "ts_us", tdir, NumFiles)
      assert(spark.read.parquet(zdir).count() == n)

      val zStats = fileStats(zdir, Set("ts_us", "type_h", "user_h"))
      val tStats = fileStats(tdir, Set("ts_us", "type_h", "user_h"))
      assert(zStats.size >= NumFiles / 2 && tStats.size >= NumFiles / 2)

      val probe = ev.select(col("type_h"), col("user_h")).head()
      val pred = Map("type_h" -> ((probe.getLong(0), probe.getLong(0))),
        "user_h" -> ((probe.getLong(1), probe.getLong(1))))
      val tMatched = filesAdmitting(tStats, pred)
      val zMatched = filesAdmitting(zStats, pred)
      assert(tMatched >= (tStats.size * 9) / 10,
        s"time-sorted zone maps should admit ~all files: $tMatched/${tStats.size}")
      assert(zMatched * 2 <= tMatched,
        s"3-axis z-order must at least halve the admitted files: " +
          s"$zMatched vs $tMatched")
      // the third axis buys pruning a 2-axis (time x type) layout cannot
      // have on user_h: any single file bounds user_h to < the full range
      val zUserSpan = zStats.map(s => s("user_h")._2 - s("user_h")._1).min
      val tUserSpan = tStats.map(s => s("user_h")._2 - s("user_h")._1).min
      assert(zUserSpan < tUserSpan,
        s"tightest z-file user_h span $zUserSpan !< time-sorted $tUserSpan")
    } finally {
      ev.unpersist()
      Seq(zdir, tdir).foreach { d =>
        val f = new java.io.File(d)
        Option(f.listFiles).foreach(_.foreach(x => { x.delete(); () }))
        f.delete()
      }
    }
  }
}
