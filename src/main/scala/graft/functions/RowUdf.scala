package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.core.Envelope

/** The arbitrary per-message transform surface — the reference's goja/otto
  * JavaScript row-UDFs (`function/gojajs/goja.go:53-155`,
  * `function/ottojs/otto.go:47-212`) re-expressed as a typed Scala map over
  * the envelope. JS-engine parity is explicitly out of scope (SURVEY §7.3);
  * the CONTRACT is preserved:
  *
  *   - the function sees the full envelope {op, ts, ns, doc} and may
  *     rewrite any part of it (goja.go:128-155);
  *   - returning None drops the message (nil/Skip/false semantics,
  *     pipeline/node.go:607-615, otto.go:195-199);
  *   - `command` messages bypass the transform (node.go:597).
  *
  * The doc is a Map[String,String] — the schemaless `data.Data` analogue.
  * This is a deserialization boundary (Dataset.map, not codegen'd Column
  * algebra); use the Transforms builders when the logic fits them — this
  * exists for the long tail the builders can't express.
  */
object RowUdf {

  /** Schemaless message: the `message.Msg` of the reference. */
  final case class Msg(op: String, ts: Long, ns: String,
      doc: Map[String, String])

  type MsgFunc = Msg => Option[Msg]

  implicit private val msgEncoder: Encoder[Msg] = Encoders.product[Msg]

  /** Envelope DataFrame (op/ts/ns + doc columns) → Dataset[Msg]: doc
    * columns are stringified into the map (schemaless view). Doc column
    * names must be unique (duplicates would collide as map keys — under
    * spark.sql.mapKeyDedupPolicy=EXCEPTION map_concat throws at runtime). */
  def toMsgs(df: DataFrame): Dataset[Msg] = {
    val docCols = df.columns.filterNot(
      Seq(Envelope.OpCol, Envelope.TsCol, Envelope.NsCol).contains)
    require(docCols.distinct.length == docCols.length,
      s"duplicate doc column names: ${docCols.diff(docCols.distinct).mkString(",")}")
    // envelope-only frames (zero doc columns) get an empty map — map_concat
    // with no arguments fails to resolve
    val mapCol =
      if (docCols.isEmpty) map().cast("map<string,string>")
      else map_concat(docCols.map(c => map(lit(c), col(c).cast("string"))): _*)
    df.select(col(Envelope.OpCol), col(Envelope.TsCol).cast("long"),
        col(Envelope.NsCol), mapCol.as("doc"))
      .as[Msg](msgEncoder)
  }

  /** Apply the row-UDF with reference drop/bypass semantics. */
  def apply(fn: MsgFunc)(msgs: Dataset[Msg]): Dataset[Msg] =
    msgs.flatMap { m =>
      if (m.op == Envelope.Op.Command) Some(m) // transforms bypass commands
      else fn(m)
    }(msgEncoder)

  /** Full pipeline step: envelope df → udf → envelope-shaped df with the
    * doc re-exposed as selected string columns. */
  def transform(df: DataFrame, fn: MsgFunc, docFields: Seq[String]): DataFrame = {
    val out = apply(fn)(toMsgs(df))
    // try_element_at: the udf may legally DROP doc fields; ANSI
    // element_at would throw MAP_KEY_DOES_NOT_EXIST instead of null
    val cols = Seq(col("op"), col("ts"), col("ns")) ++
      docFields.map(f => try_element_at(col("doc"), lit(f)).as(f))
    out.select(cols: _*)
  }

  /** Like `toMsgs`, but doc values are EXTENDED JSON (Mejson) instead of
    * bare casts — the reference marshals the doc through mejson before
    * handing it to the JS VM precisely so types survive the string
    * boundary (`function/gojajs/goja.go:94-101`). A long stays 64-bit, a
    * timestamp stays a date, binary stays bytes. */
  def toMejsonMsgs(df: DataFrame): Dataset[Msg] = {
    val docCols = df.columns.filterNot(
      Seq(Envelope.OpCol, Envelope.TsCol, Envelope.NsCol).contains)
    require(docCols.distinct.length == docCols.length,
      s"duplicate doc column names: ${docCols.diff(docCols.distinct).mkString(",")}")
    val mapCol =
      if (docCols.isEmpty) map().cast("map<string,string>")
      else map_concat(docCols.map(c =>
        map(lit(c), Mejson.to_mejson(col(c)))): _*)
    df.select(col(Envelope.OpCol), col(Envelope.TsCol).cast("long"),
        col(Envelope.NsCol), mapCol.as("doc"))
      .as[Msg](msgEncoder)
  }

  /** Type-preserving pipeline step: doc values cross the UDF as extended
    * JSON and come back TYPED per `outSchema` — the full goja round-trip
    * (mejson.Marshal → transform → re-read,
    * `function/gojajs/goja.go:94-155`). The udf reads/writes mejson
    * strings (`Mejson.write`/`Mejson.parse` for values it touches). */
  def transformTyped(df: DataFrame, fn: MsgFunc,
      outSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val out = apply(fn)(toMejsonMsgs(df))
    val cols = Seq(col("op"), col("ts"), col("ns")) ++
      outSchema.fields.map(f =>
        Mejson.from_mejson(try_element_at(col("doc"), lit(f.name)),
          f.dataType).as(f.name))
    out.select(cols: _*)
  }
}
