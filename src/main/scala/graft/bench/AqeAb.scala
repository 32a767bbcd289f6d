package graft.bench

import org.apache.spark.sql.SparkSession
import graft.{Sessions, SparkEntry}

/** Interleaved A/B of AQE coalescing settings: cross-run host drift on
  * this VM (±20%) swamps sequential A/Bs, so each timed pass runs EVERY
  * setting back-to-back on the same query before moving on — the
  * within-pass deltas see the same host weather. Both knobs are
  * runtime-settable SQL confs. `runMain graft.bench.AqeAb [sfDir]`. */
object AqeAb {
  private val Queries = Seq(
    "d3_jaccard_pairs", "d6_dedup_keep", "t18_lm_perplexity",
    "s13_hybrid_rrf", "d17_line_dedup", "s14_mmr_rerank",
    "p1_pagerank", "p2_triangles", "d7_components", "q36_map_funcs",
    "q20_percentiles", "q56_dedup_split")
  // (label, parallelismFirst, advisory)
  private val Settings = Seq(
    ("pf_true", "true", "64m"),
    ("adv_1m", "false", "1m"),
    ("adv_256k", "false", "256k"),
    ("adv_64k", "false", "64k"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.quietBenignWarnings()
    val qs = SparkEntry.queries
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      sec
    }
    def applySetting(s: (String, String, String)): Unit = {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", s._2)
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", s._3)
    }
    // warm-up (codegen/JIT/footers) once per (query, setting)
    Queries.foreach { q => Settings.foreach { s => applySetting(s); timeOne(q) } }
    val best = collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to 3).foreach { pass =>
      Queries.foreach { q =>
        // rotate setting order per pass so no setting always sees the
        // colder cache / hotter host slot
        val rot = Settings.drop(pass % Settings.size) ++
          Settings.take(pass % Settings.size)
        rot.foreach { s =>
          applySetting(s)
          val sec = timeOne(q)
          val k = (q, s._1)
          if (sec < best(k)) best(k) = sec
        }
      }
      System.err.println(s"[aqe-ab] pass $pass done")
    }
    println("query," + Settings.map(_._1).mkString(","))
    Queries.foreach { q =>
      println(q + "," + Settings.map(s => f"${best((q, s._1))}%.3f").mkString(","))
    }
    val totals = Settings.map(s => Queries.map(q => best((q, s._1))).sum)
    println("TOTAL," + totals.map(t => f"$t%.3f").mkString(","))
    spark.stop()
  }
}
