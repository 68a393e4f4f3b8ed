package graft

import org.apache.spark.sql.functions._
import graft.core.{Envelope, Tables}
import graft.functions.RowUdf

class RowUdfSpec extends SparkSpec {

  test("row udf can rewrite op/ns/doc and drop rows") {
    val env = Envelope.wrap(Tables.table(spark, sf, "region"), "region")
    val out = RowUdf.transform(env, m => {
      if (m.doc("r_name") == "ASIA") None
      else Some(m.copy(ns = "geo", op = Envelope.Op.Update,
        doc = m.doc + ("r_name" -> m.doc("r_name").toLowerCase)))
    }, Seq("r_regionkey", "r_name"))
    val rows = out.collect()
    assert(rows.length == 4) // ASIA dropped
    assert(rows.forall(_.getAs[String]("ns") == "geo"))
    assert(rows.forall(_.getAs[String]("op") == "update"))
    assert(rows.map(_.getAs[String]("r_name")).toSet ==
      Set("africa", "america", "europe", "middle east"))
  }

  test("command messages bypass the udf") {
    val env = Envelope.wrap(Tables.table(spark, sf, "region"),
      "region", op = Envelope.Op.Command)
    val out = RowUdf.apply(_ => None)(RowUdf.toMsgs(env))
    assert(out.count() == 5) // nothing dropped: commands bypass transforms
  }
}
