package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Bucketed layout must (a) keep join results identical to the plain join
  * and (b) actually eliminate the shuffle — asserted on the executed plan,
  * not assumed.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("co-located join on bucketed tables plans without a shuffle") {
    val base = Files.createTempDirectory("graft_bucketed").toString
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", s"$base/o", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", s"$base/l", "o_orderkey", 8)

    // force SMJ so the exchange (or its absence) is what we measure
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed =
        Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(!Bucketing.hasShuffle(bucketed), "bucketed join must not shuffle")

      val plain = orders.join(lineitem, "o_orderkey")
      assert(Bucketing.hasShuffle(plain), "probe sanity: plain join shuffles")

      // identical results
      val a = bucketed.groupBy("o_custkey")
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val b = plain.groupBy("o_custkey")
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("groupBy on the bucket key also avoids the exchange") {
    val base = Files.createTempDirectory("graft_bucketed_agg").toString
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders_agg", s"$base/o", "o_orderkey", 8)
    try {
      val agg = spark.table("b_orders_agg").groupBy("o_orderkey")
        .agg(sum(col("o_totalprice")).as("s"))
      agg.collect()
      assert(!Bucketing.hasShuffle(agg))
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
