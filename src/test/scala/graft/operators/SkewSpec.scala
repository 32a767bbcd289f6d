package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted distinct count equals plain countDistinct") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(countDistinct(col("l_partkey")).as("n_distinct"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.skewedCountDistinct(li, col("l_returnflag"), col("l_partkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum (long-exact)") {
    val li = Tables.lineitem(spark, sf)
      .withColumn("qty_l", col("l_quantity").cast("long"))
    val plain = li.groupBy(col("l_linestatus").as("k"))
      .agg(sum(col("qty_l")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.skewedSum(li, col("l_linestatus"), col("qty_l"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }
}
