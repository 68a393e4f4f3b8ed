package graft

import org.apache.spark.sql.functions._
import graft.core.{Envelope, Tables}
import graft.functions.Transforms

class TransformsSpec extends SparkSpec {

  private def customer = Tables.table(spark, sf, "customer")

  test("pick keeps only listed fields plus envelope, ignores unknown") {
    val env = Envelope.wrap(customer, "customer")
    val out = Transforms.pick(Seq("c_custkey", "c_name", "not_a_field"))(env)
    assert(out.columns.toSeq ==
      Seq("op", "ts", "ns", "c_custkey", "c_name"))
    assert(out.count() == customer.count())
  }

  test("omit drops fields; rename renames only present fields") {
    val out = Transforms.omit(Seq("c_acctbal"))(customer)
    assert(!out.columns.contains("c_acctbal"))
    val ren = Transforms.rename(Map("c_name" -> "nm", "ghost" -> "g"))(customer)
    assert(ren.columns.contains("nm") && !ren.columns.contains("ghost"))
  }

  test("remap rewrites mapped namespaces, passes others through") {
    val env = Envelope.wrap(customer.limit(5), "customer")
      .unionByName(Envelope.wrap(customer.limit(5), "other"))
    val out = Transforms.remap(Map("customer" -> "cust2"))(env)
    val nss = out.select("ns").distinct().collect().map(_.getString(0)).toSet
    assert(nss == Set("cust2", "other"))
  }

  test("nsFilter trims /slashes/ and applies rlike") {
    val env = Envelope.wrap(customer.limit(3), "db.customer")
      .unionByName(Envelope.wrap(customer.limit(3), "db.orders"))
    assert(Transforms.nsFilter("/cust/")(env).count() == 3)
    assert(Transforms.nsFilter("db\\.")(env).count() == 6)
  }

  test("skip: numeric coercion compares string values as numbers") {
    // skipper.go:88-111 — "1000.5" (string) compares numerically
    val gt = Transforms.skip("c_acctbal", ">", "1000.5")(customer)
    val expected = customer.filter(col("c_acctbal") > 1000.5).count()
    assert(gt.count() == expected)
    // string field coerced numerically on both sides
    val strDf = spark.range(5).selectExpr("CAST(id AS STRING) AS s")
    assert(Transforms.skip("s", ">=", 3)(strDf).count() == 2)
  }

  test("skip: eq and regex") {
    assert(Transforms.skip("c_mktsegment", "eq", "BUILDING")(customer).count() ==
      customer.filter(col("c_mktsegment") === "BUILDING").count())
    assert(Transforms.skip("c_name", "=~", "0$")(customer).count() ==
      customer.filter(col("c_name").rlike("0$")).count())
  }

  test("skip: unknown operator throws") {
    intercept[IllegalArgumentException] {
      Transforms.skip("c_name", "!!", "x")(customer)
    }
  }

  test("opfilter whitelist/blacklist") {
    val env = Envelope.wrap(customer.limit(4), "c", op = Envelope.Op.Insert)
      .unionByName(Envelope.wrap(customer.limit(6), "c", op = Envelope.Op.Delete))
    assert(Transforms.opFilter(whitelist = Seq("insert"))(env).count() == 4)
    assert(Transforms.opFilter(blacklist = Seq("insert"))(env).count() == 6)
    assert(Transforms.opFilter()(env).count() == 10)
  }
}
