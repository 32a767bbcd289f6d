package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions

/** Octave evidence for the operators that landed after the last full
  * ScaleReport session (r8 verdict #2): ts14/ts15 (events family),
  * s9/s10 (embeddings), q55/m5 (documents). Each row is wall (noop-sink,
  * every output column evaluated — the Bench discipline) + output rows
  * (the linearity evidence). Run at 1× (sf0.1) and the ScaleFixture
  * 10×/100× replicas:
  *   runMain graft.bench.NewOpsOctave [sfDir] [name1,name2,...]
  * The optional second arg overrides the query list (r9 verdict #4:
  * targeted octave rows for later-landing operators).
  */
object NewOpsOctave {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    val names = args.drop(1).headOption
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("ts14_counter_rate", "ts15_histogram_quantile",
        "s9_recall_eval", "s10_ivfpq", "q55_weighted_sample",
        "m5_image_neardup"))
    val parts = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val rows = fn(spark, dir).count()
      spark.catalog.clearCache()
      val key = name.split('_').head
      s""""${key}_rows":$rows,"${key}_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, sec)}"""
    }
    spark.stop()
    println(s"""{"dir":"$dir",${parts.mkString(",")}}""")
  }
}
