package graft.compact

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** A bucket whose input files disagree on schema must refuse to merge:
  * Spark's multi-file parquet read otherwise adopts ONE footer's schema
  * and silently drops the other files' extra columns from the output.
  */
class SchemaGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = 1737928800L * 1000000000L

  private def writeFile(dest: File, df: org.apache.spark.sql.DataFrame): Unit = {
    dest.getParentFile.mkdirs()
    val tmp = new File(dest.getParentFile, ".tmp_" + dest.getName)
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles.find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles.foreach(_.delete()); tmp.delete()
  }

  test("mismatched input schemas fail loudly instead of dropping columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_guard").toFile
    val rel1 = "edge0/dbs/db-0/table-0/2025-01-26/22-00/0000000001.parquet"
    val rel2 = "edge0/dbs/db-0/table-0/2025-01-26/22-10/0000000002.parquet"
    writeFile(new File(dir, rel1),
      Seq((base + 1L, "s", 1.0)).toDF("time", "sensor", "value"))
    // second file has an EXTRA column — a schema-evolution landing
    writeFile(new File(dir, rel2),
      Seq((base + 2L, "s", 2.0, "eu")).toDF("time", "sensor", "value", "region"))
    def fm(id: Long, p: String) =
      FileMeta(id, p, new File(dir, p).length(), 1, base, base, base + 2)
    val bucket = Bucket("edge0", "db-0", "table-0", "2025-01-26", 22,
      Vector(fm(1, rel1), fm(2, rel2)), Set(rel1, rel2))

    val err = intercept[IllegalArgumentException] {
      new Compactor(spark, Compactor.localFs(spark))
        .merge(new Path(dir.toString), bucket)
    }
    assert(err.getMessage.contains("disagree on schema"), err.getMessage)
    // nothing was written or deleted
    assert(new File(dir, rel1).isFile && new File(dir, rel2).isFile)
    assert(!new File(dir,
      "edge0/dbs/db-0/table-0/2025-01-26/22-00/c_0000000001_0000000002_h22.parquet").exists())
  }
}
