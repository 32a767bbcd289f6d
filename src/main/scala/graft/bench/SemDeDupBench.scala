package graft.bench

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.queries.SimilarityQueries

/** Octave evidence for d14's bucketed query-set configuration (r14
  * verdict #8): the exact SemDeDup gate config is m²-bound within
  * cells (documented honest, arithmetic-bound by ~200k vectors); the
  * bucketed config compares every member against only the qPerCell
  * lowest-id members of its cell — n·qPerCell candidate cosines and
  * n·k assign work, both linear at fixed knobs. Run at three octaves
  * (e.g. 200k / 600k / 2M vectors via ScaleFixture embeddings
  * fixtures); the walls must sit inside the linear-class band.
  *
  *   runMain graft.bench.SemDeDupBench [embDir] [k] [qPerCell] [threshold]
  */
object SemDeDupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(16)
    val q = args.lift(2).map(_.toInt).getOrElse(16)
    val t = args.lift(3).map(_.toDouble).getOrElse(0.45)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    // k <= 0 = auto-k (ceil sqrt n, r15 verdict #4) - resolve for the
    // report so octave rows show the layout actually used
    val kEff = if (k > 0) k else SimilarityQueries.autoSemK(n)
    val walls = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      val dups = SimilarityQueries
        .semanticDedupBucketedOn(emb, k, q, t, nHint = n).count()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dups, s)
    }
    spark.stop()
    println(s"""{"dir":"$dir","n":$n,"k":$kEff,"auto":${k <= 0},""" +
      s""""q_per_cell":$q,"threshold":$t,"dups":${walls.head._1},""" +
      s""""wall_sec":${f(walls.map(_._2).min)}}""")
  }
}
