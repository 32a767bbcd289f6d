package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.TextOps
import graft.queries.DedupQueries

/** A/B for the d5 demo-regime verification order (candidates from wide
  * 32×4 banding admit ~all pairs): current plan dedups AFTER the cosine
  * filter (measured best at sf0.1); this probes whether a distinct on the
  * candidate multiset BEFORE verification wins once the multiset is
  * ~2 n² rows (each random pair collides in ~2 of 32 four-bit bands, so
  * distinct-first halves the dot-product work at the cost of a full
  * pair shuffle).
  *
  * Usage: runMain graft.bench.D5Ab [sfDir]
  */
object D5Ab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val dim = Tables.EmbeddingDim

    def variantDistinctFirst(bands: Int, rowBits: Int, threshold: Double): DataFrame = {
      val e = emb
        .select(col("vec_id"), TextOps.quantize(col("embedding")).as("q"))
        .withColumn("nn", TextOps.qdot(col("q"), col("q")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandStructs = (0 until bands).map { b =>
        val sig = (0 until rowBits).map { j =>
          when(TextOps.qdot(col("q"), lit(DedupQueries.d5Weights(dim, b, j))) > 0,
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
        struct(lit(b).as("band_idx"), sig.as("band_sig"))
      }
      val bandRows = e.select(col("vec_id"),
          explode(array(bandStructs: _*)).as("band"))
        .select(col("vec_id"), col("band.band_idx"), col("band.band_sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bandRows.as("a").join(bandRows.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_sig") === col("b.band_sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
        .join(e.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nn").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nn").as("nb")), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          (TextOps.qdot(col("qa"), col("qb")).cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cosine"))
        .filter(col("cosine") >= threshold)
    }

    def time(label: String)(f: => DataFrame): Unit = {
      // warm-up + min-of-2 (host I/O jitter)
      def once(): Double = {
        val t0 = System.nanoTime()
        val n = f.count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.err.println(f"[d5ab] $label%-16s $s%7.2fs  rows=$n")
        s
      }
      once(); val best = math.min(once(), once())
      println(f"""{"variant":"$label","sec":$best%.3f}""")
    }

    time("filter_first") {
      // force: this tool exists to MEASURE the demo regime at octave
      // fixtures, exactly the case the pre-flight guard refuses for users
      DedupQueries.embNearDupBanded(emb, 32, 4, 0.45, dim, force = true)
    }
    time("distinct_first") {
      variantDistinctFirst(32, 4, 0.45)
    }
    spark.stop()
  }
}
