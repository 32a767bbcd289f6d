package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.functions.CountMinAgg
import graft.operators.TextOps

/** The Count-Min sketch is a LINEAR sketch (merge = elementwise sum),
  * which is exactly what makes it streaming-correct: the sketch of a
  * stream equals the batch sketch of the same data regardless of how
  * micro-batches split it. Pin that equality end-to-end through a real
  * streaming aggregation (file source, one file per trigger → multiple
  * micro-batches through the state store).
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val D = 4
  private val W = 32

  test("streaming sketch equals the batch sketch across micro-batches") {
    val dir = Files.createTempDirectory("graft_cm_stream").toString
    val docs = Tables.documents(spark, sf)
    // three separate files -> three micro-batches at maxFilesPerTrigger=1
    docs.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    docs.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.mode("append").parquet(dir)
    docs.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.mode("append").parquet(dir)

    val sketchOf = (df: org.apache.spark.sql.DataFrame) => df
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .agg(CountMinAgg.countMin(D, W)(
        CountMinAgg.bucketsFor(D, W)(col("token"))).as("cm"))
      .select(col("cm.cells").as("cells"))

    val stream = sketchOf(spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir))
    val q = stream.writeStream
      .outputMode("complete").format("memory").queryName("cm_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ckpt_cm").toString)
      .start()
    val batches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(batches >= 3, s"expected >= 3 micro-batches, got $batches")

    val streamed = spark.table("cm_stream").collect()
    assert(streamed.length == 1)
    val got = streamed.head.getSeq[Long](0)
    val want = sketchOf(spark.read.parquet(dir)).collect().head.getSeq[Long](0)
    assert(got == want, "streaming sketch diverged from the batch sketch")
    assert(got.sum > 0, "empty sketch — the gate tested nothing")
  }
}
