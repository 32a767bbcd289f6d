package graft.bench

import org.apache.spark.sql.execution.ExplainMode
import graft.{Sessions, SparkEntry}

/** Plan inspector: `runMain graft.bench.ExplainTool <query> [sfDir] [mode]`
  * prints the formatted physical plan of a declared query — the
  * .explain-and-iterate loop the scale rubric asks for, as a tool. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val mode = args.lift(2).getOrElse("formatted")
    val spark = Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE so reuse/codegen shows in the plan
    println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    spark.stop()
  }
}
