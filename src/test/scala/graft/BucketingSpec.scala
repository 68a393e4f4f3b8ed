package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {

  test("co-located bucketed join plans without any shuffle exchange") {
    // force the SMJ path — otherwise the small side broadcasts and the
    // assertion would pass trivially
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4, Seq("l_orderkey"))
    Bucketing.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b",
      "l_orderkey", 4, Seq("l_orderkey"))

    val joined = Bucketing.table(spark, "li_b")
      .join(Bucketing.table(spark, "o_b"), Seq("l_orderkey"))
    assert(Bucketing.isShuffleFree(joined),
      joined.queryExecution.executedPlan.toString.take(1500))

    // same count as the plain join
    val plain = li.join(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
    assert(joined.count() == plain.count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val agg = Bucketing.table(spark, "li_b")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(Bucketing.isShuffleFree(agg),
      agg.queryExecution.executedPlan.toString.take(1500))
  }
}
