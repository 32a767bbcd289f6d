package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** DistributedRank must be value-identical to Spark's window functions
  * (the oracle gate separately pins the q35 rewrite against DuckDB) while
  * keeping every data-sized window partition bounded by a shard — the
  * whole point is that no group, however large, funnels through one
  * sorter task. */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  /** All physical nodes, descending through AQE stage wrappers (plain
    * collect stops at QueryStageExec boundaries). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def windowExecs(df: DataFrame): Seq[WindowExec] =
    allNodes(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }

  test("withRowNumber equals window row_number on grouped and global orders") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")

    val wGrouped = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def pairs(df: DataFrame) = df.collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("rn")).toMap
    val expectGrouped = pairs(orders
      .withColumn("rn", row_number().over(wGrouped).cast("bigint")))
    val gotGrouped = pairs(DistributedRank.withRowNumber(orders,
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      shardKey = negate(col("o_totalprice")), numShards = 7,
      rowBound = Long.MaxValue))
    assert(gotGrouped == expectGrouped)

    // empty groupCols = a fully global ORDER BY (the a_scan shape)
    val expectGlobal = pairs(orders
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_orderkey"))).cast("bigint")))
    val gotGlobal = pairs(DistributedRank.withRowNumber(orders, Seq.empty,
      Seq(col("o_orderkey")), shardKey = col("o_orderkey"), numShards = 5,
      rowBound = Long.MaxValue))
    assert(gotGlobal == expectGlobal)
  }

  test("withRankFamily equals the window rank family, including ntile edge cases") {
    // tiny skewed groups exercise qi=0 (n < tiles), n=1 (percent_rank=0),
    // and uneven tiles (n mod k != 0)
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L), ("a", 6L),
      ("a", 7L),           // n=7, k=4: tiles 2,2,2,1
      ("b", 10L), ("b", 11L), ("b", 12L), // n=3 < k
      ("c", 20L))          // n=1: percent_rank division guard
      .toDF("g", "k")
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
    val expect = df
      .select(col("g"), col("k"),
        row_number().over(w).cast("bigint").as("rn"),
        ntile(4).over(w).cast("bigint").as("ntile"),
        percent_rank().over(w).as("percent_rank"),
        cume_dist().over(w).as("cume_dist"),
        nth_value(col("k"), 1).over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)).as("first_value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    val got = DistributedRank.withRankFamily(df, Seq("g"), Seq(col("k")),
        shardKey = col("k"), tiles = 4, firstCol = "k", numShards = 3,
        rowBound = Long.MaxValue)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("rn"), r.getAs[Long]("ntile"),
          r.getAs[Double]("percent_rank"), r.getAs[Double]("cume_dist"),
          r.getAs[Long]("first_value"))).toMap
    assert(got == expect)

    // and on real data at a real shard count
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val wo = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expectO = orders
      .select(col("o_orderkey"),
        ntile(4).over(wo).cast("bigint").as("q4"),
        round(percent_rank().over(wo), 6).as("pr"),
        round(cume_dist().over(wo), 6).as("cd"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val gotO = DistributedRank.withRankFamily(orders,
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")),
        shardKey = negate(col("o_totalprice")),
        tiles = 4, firstCol = "o_orderkey", rowBound = Long.MaxValue,
        firstOrderKey = struct(negate(col("o_totalprice")),
          col("o_orderkey")))
      .select(col("o_orderkey"), col("ntile"),
        round(col("percent_rank"), 6).as("pr"),
        round(col("cume_dist"), 6).as("cd"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(gotO == expectO)
  }

  test("no data-sized window: every WindowExec is sharded or runs over the counts aggregate") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val ranked = DistributedRank.withRankFamily(orders,
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      shardKey = negate(col("o_totalprice")),
      tiles = 4, firstCol = "o_orderkey", rowBound = Long.MaxValue,
      firstOrderKey = struct(negate(col("o_totalprice")),
        col("o_orderkey")))
    ranked.collect() // materialize so adaptive plans are final
    val execs = windowExecs(ranked)
    assert(execs.nonEmpty, "expected window nodes in the plan")
    execs.foreach { w =>
      val parts = w.partitionSpec.map(_.toString).mkString(",")
      val sharded = parts.contains("__shard")
      // a window partitioned by the value-derived shard never sees more
      // than one shard's rows per task; any OTHER window must sit above
      // the per-(shard, group) counts AGGREGATE (shards × groups rows)
      val overAggregate = allNodes(w.child).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
      assert(sharded || overAggregate,
        s"window over unsharded row data: partitionSpec=[$parts]")
    }
    // and the offsets window (group-only partitioning) must exist —
    // partitioned by fewer columns than the data windows
    assert(execs.exists(w => !w.partitionSpec.map(_.toString)
        .mkString(",").contains("__shard")),
      "expected the tiny counts-table window")
  }

  test("small inputs take the plain window plan (no shard machinery)") {
    // q35's sf0.1 regression (r5 verdict next-round #2): the shard
    // machinery is a ~0.8 s constant a 150k-row table doesn't need.
    // Below the bound — via an explicit rowBound OR the optimizer's
    // byte estimate (this 15k-row scan) — the plain window plan must
    // come out, and values must be identical to the sharded path.
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val small = DistributedRank.withRankFamily(orders,
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      shardKey = negate(col("o_totalprice")),
      tiles = 4, firstCol = "o_orderkey")
    small.collect()
    assert(windowExecs(small).nonEmpty)
    assert(!windowExecs(small).exists(_.partitionSpec.map(_.toString)
        .mkString(",").contains("__shard")),
      "small input should not pay the shard machinery")
    // and no quantile/counts jobs: the whole plan is scan -> window
    def vals(df: DataFrame) = df.collect().map(r =>
      r.getAs[Long]("o_orderkey") -> (r.getAs[Long]("rn"),
        r.getAs[Long]("ntile"), r.getAs[Double]("percent_rank"),
        r.getAs[Double]("cume_dist"), r.getAs[Long]("first_value"))).toMap
    val sharded = DistributedRank.withRankFamily(orders,
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey")),
      shardKey = negate(col("o_totalprice")),
      tiles = 4, firstCol = "o_orderkey", rowBound = Long.MaxValue,
      firstOrderKey = struct(negate(col("o_totalprice")),
        col("o_orderkey")))
    assert(vals(small) == vals(sharded))
  }
}
