package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted sum/count equals plain groupBy on skewed data") {
    import spark.implicits._
    // 90% of rows share one key (hot), rest uniform
    val skewed = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 100))
        .as("k"), (col("id") % 13).cast("double").as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", buckets = 16)
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("salted join equals plain join on skewed keys") {
    val li = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count().orderBy("o_orderstatus")
      .collect().toSeq
    val salted = Skew.saltedJoin(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"), "k")
      .groupBy("o_orderstatus").count().orderBy("o_orderstatus")
      .collect().toSeq
    assert(salted == plain)
  }

  test("right-salted join equals plain join, incl. right-outer unmatched rows") {
    val li = Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    // right side: orders plus planted keys with NO lineitems — a
    // right-outer must emit each exactly once despite left replication
    val o = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
      .unionByName(spark.range(5)
        .select((col("id") - 100).as("k"), lit("X").as("o_orderstatus")))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderstatus").collect().toSeq
    val plain = agg(li.join(o, Seq("k"), "right_outer"))
    val salted = agg(Skew.rightSaltedJoin(li, o, "k", joinType = "right_outer"))
    assert(salted == plain)
    // unmatched planted rows appear exactly once each
    val planted = Skew.rightSaltedJoin(li, o, "k", joinType = "right_outer")
      .filter(col("o_orderstatus") === "X").count()
    assert(planted == 5)
    // left-preserving joins are rejected (they'd need saltedJoin)
    intercept[IllegalArgumentException] {
      Skew.rightSaltedJoin(li, o, "k", joinType = "left_outer")
    }
  }
}
