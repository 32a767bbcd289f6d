package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for the compactor's output files —
  * the write-side consumer of q52's z-order keys.
  *
  * The reference writes each merged file sorted on time alone
  * (`kompactor.ts:107` ORDER BY time): perfect time-range zone maps,
  * useless series zone maps — a one-series query still reads every
  * file of its window. Writing files as contiguous Z-ORDER-curve
  * segments instead gives every file a tight parquet row-group
  * min/max on BOTH axes, so the scan prunes on either predicate (the
  * layout lakehouse OPTIMIZE commands produce; ZorderPruningSpec
  * measures the file-skip ratio on real footers).
  *
  * Scale shape: the annotate pass is q52's (two exact-rank shuffles +
  * per-row bit math), then ONE range exchange on zkey — the same cost
  * class as the time-sorted write it replaces. `repartitionByRange`
  * samples boundaries, so file CONTENT is deterministic per file
  * count while boundaries may flex with sampling; the zkey column is
  * written so readers can verify/rewrite segments exactly.
  */
object Layout {

  /** Write `df` as `numFiles` z-ordered parquet files under `outDir`.
    * The two layout axes must be numeric columns (e.g. a µs timestamp
    * and a series hash); every input column is preserved, plus the
    * `zkey` curve position. `rowBound`, when > 0, must be the EXACT row
    * count (it becomes the bucket divisor) and saves a counting pass. */
  def writeZOrdered(df: DataFrame, idCol: String, xCol: String,
      yCol: String, outDir: String, numFiles: Int = 64,
      rowBound: Long = -1L): Unit =
    writeZOrderedAxes(df, idCol, Seq(xCol, yCol), outDir, numFiles, rowBound)

  /** N-axis form (tag-heavy payloads want time × 2+ tags): same write
    * shape, per-axis bit budget from PipelineQueries.zAxisBits, axis 0
    * owning the top bit of each interleave group. 2-axis calls produce
    * byte-identical keys to [[writeZOrdered]]'s historical layout. */
  def writeZOrderedAxes(df: DataFrame, idCol: String,
      axisCols: Seq[String], outDir: String, numFiles: Int = 64,
      rowBound: Long = -1L): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    graft.queries.PipelineQueries
      .zorderAnnotateAxes(df, idCol, axisCols, rowBound)
      .drop("zshard")
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(outDir)
  }

  /** The baseline the reference produces: the same rows written as
    * `numFiles` time-range-partitioned files sorted on `xCol` (its
    * ORDER BY time in file-set form). For the pruning comparison. */
  def writeTimeSorted(df: DataFrame, xCol: String, outDir: String,
      numFiles: Int = 64): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, col(xCol))
      .sortWithinPartitions(col(xCol))
      .write.mode("overwrite").parquet(outDir)
  }
}
