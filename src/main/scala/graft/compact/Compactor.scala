package graft.compact

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Merge-and-write executor: the engine's equivalent of the reference's
  * single data-moving query — `SELECT * FROM read_parquet([...]) ORDER BY
  * time` into one ZSTD parquet file (kompactor.ts:98-114) — plus the
  * size-targeted splitting the reference declares but never runs
  * (maxDesiredFileSizeBytes/splitPercentage, kompactor.ts:38-40,53-57).
  *
  * Physical strategy per bucket:
  *  - output fits the large cutoff → `coalesce(1).sortWithinPartitions`:
  *    ONE task, ZERO shuffle — a ≤~130 MB external sort is cheap, and the
  *    single-file contract forces one writer anyway;
  *  - oversized → `repartitionByRange(n, time).sortWithinPartitions`: one
  *    range exchange, n parallel sorted writers, n time-disjoint files.
  *  Cluster scale comes from bucket-level parallelism (buckets are
  *  independent jobs), not from parallelizing inside one ≤130 MB sort.
  */
final case class CompactResult(files: Vector[FileMeta])

class Compactor(
    spark: SparkSession,
    fs: FileSystem,
    timeColumn: String = "time",
    maxDesiredFileSizeBytes: Long = 100L << 20, // kompactor.ts:38
    percentageMaxFileSize: Int = 30, //            kompactor.ts:39
    rowGroupTargetBytes: Long = 8L << 20) {

  /** 130% of target — above this an output is split (kompactor.ts:53-57,
    * dead code in the reference, live here). */
  def largeCutoffBytes: Long =
    maxDesiredFileSizeBytes + maxDesiredFileSizeBytes * percentageMaxFileSize / 100
  def smallCutoffBytes: Long =
    maxDesiredFileSizeBytes * percentageMaxFileSize / 100

  /** Merge `bucket`'s files into 1..n time-sorted ZSTD parquet files under
    * `rootDir`. Returns the new FileMeta entries (real output sizes +
    * footer-exact row counts and time bounds — never input-sum estimates;
    * SURVEY.md §7.4 bug 3). */
  def merge(rootDir: Path, bucket: Bucket): CompactResult = {
    val inputs = bucket.files.map(f => new Path(rootDir, f.path).toString)
    val totalBytes = bucket.files.map(_.size_bytes).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / maxDesiredFileSizeBytes).toInt)
    val split = totalBytes > largeCutoffBytes && nOut > 1

    val df = spark.read.parquet(inputs: _*)
    val sorted: DataFrame =
      if (!split) df.coalesce(1).sortWithinPartitions(col(timeColumn))
      else df.repartitionByRange(nOut, col(timeColumn))
        .sortWithinPartitions(col(timeColumn))

    val tmpDir = new Path(rootDir,
      s"${bucket.outputDir}/.tmp_c_${bucket.firstWal}_${bucket.lastWal}")
    fs.delete(tmpDir, true)
    sorted.write
      .mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.block.size", rowGroupTargetBytes.toString)
      .parquet(tmpDir.toString)

    // rename part files onto the exact reference naming contract:
    // c_<first>_<last>_h<HH>.parquet, or _pNN suffixed when split.
    val parts = fs.listStatus(tmpDir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val outNames =
      if (parts.length == 1) Vector(bucket.outputName)
      else parts.indices.map(i =>
        bucket.outputName.stripSuffix(".parquet") + f"_p$i%02d.parquet").toVector
    val metas = parts.zip(outNames).zipWithIndex.map { case ((part, name), i) =>
      val dest = new Path(rootDir, s"${bucket.outputDir}/$name")
      fs.delete(dest, false)
      if (!fs.rename(part, dest))
        throw new java.io.IOException(s"rename $part -> $dest failed")
      footerStats(dest, relPath = s"${bucket.outputDir}/$name",
        id = bucket.files.head.id + i)
        // chunk_time carries over from the first input (reference
        // "first(chunk_time)" semantics, kompactor.ts:280)
        .copy(chunk_time = bucket.files.head.chunk_time)
    }.toVector
    fs.delete(tmpDir, true)
    CompactResult(metas)
  }

  /** Exact stats from the written file's parquet footer — no rescan job.
    * Falls back to planner rollup bounds when the time column carries no
    * statistics. */
  private def footerStats(file: Path, relPath: String, id: Long): FileMeta = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(file, fs.getConf))
    try {
      val footer = reader.getFooter
      val rows = reader.getRecordCount
      var minT = Long.MaxValue
      var maxT = Long.MinValue
      footer.getBlocks.forEach { block =>
        block.getColumns.forEach { c =>
          if (c.getPath.toDotString == timeColumn && c.getStatistics != null &&
            c.getStatistics.hasNonNullValue) {
            c.getStatistics.genericGetMin match {
              case l: java.lang.Long =>
                minT = math.min(minT, l)
                maxT = math.max(maxT,
                  c.getStatistics.genericGetMax.asInstanceOf[java.lang.Long])
              case _ => ()
            }
          }
        }
      }
      val len = fs.getFileStatus(file).getLen
      FileMeta(id, relPath, len, rows,
        chunk_time = if (minT != Long.MaxValue) minT else 0L,
        min_time = if (minT != Long.MaxValue) minT else 0L,
        max_time = if (maxT != Long.MinValue) maxT else 0L)
    } finally reader.close()
  }
}

object Compactor {
  def localFs(spark: SparkSession): FileSystem =
    FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
  def fsFor(path: Path, conf: Configuration): FileSystem = path.getFileSystem(conf)
}
