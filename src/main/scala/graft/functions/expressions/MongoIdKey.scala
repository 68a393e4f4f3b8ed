package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical mongo id-key extraction as a codegen'd expression.
  *
  * The oplog update-refetch join (`MongoOplog.resolveUpdates`, the
  * engine's form of `getOriginalDoc`, reference
  * `adaptor/mongodb/reader.go:296-315`) keys BOTH sides by a canonical
  * `_id` string: extended-JSON number/oid wrappers collapse so a raw
  * oplog `{"_id": 3}` meets a Mejson-rendered `{"$numberLong": "3"}` on
  * equal terms. As a ScalaUDF that canonicalization broke the apply
  * path's whole-stage codegen span; this expression is the same logic
  * (it delegates to the SAME canonId code, so the join key is
  * bit-identical) emitted as a static call inside generated code.
  */
object MongoIdKeys {

  /** Key of a full document's `_id` field (the envelope side). */
  def docKey(s: UTF8String): UTF8String =
    if (s == null) null
    else graft.sources.MongoOplog.idKey(s.toString)
      .map(UTF8String.fromString).orNull

  /** Key of a bare extended-JSON id value (the collection side). */
  def valueKey(s: UTF8String): UTF8String =
    if (s == null) null
    else graft.sources.MongoOplog.idKeyValue(s.toString)
      .map(UTF8String.fromString).orNull

  /** `_id` key of a document-JSON string column. */
  def id_key_of_doc(c: Column): Column =
    Bridge.column(MongoIdKey(Bridge.expression(c), fromDoc = true))

  /** key of a bare id-value extended-JSON string column. */
  def id_key_of_value(c: Column): Column =
    Bridge.column(MongoIdKey(Bridge.expression(c), fromDoc = false))

  /** key of a TYPED id column (the collection side): canonicalizes the
    * value's mejson form directly — same key as `id_key_of_value ∘
    * to_mejson` without the render/parse round-trip or the UDF node. */
  def id_key_of_typed(c: Column): Column =
    Bridge.column(MongoIdTypedKey(Bridge.expression(c)))

  /** `Mejson.write` of any column as a codegen'd expression (the UDF
    * `Mejson.to_mejson` is fine elsewhere; the CDC apply path wants its
    * whole-stage codegen span unbroken). */
  def mejson_write(c: Column): Column =
    Bridge.column(MejsonWrite(Bridge.expression(c)))

  /** Boxed spelling of `c` for a codegen'd Object-arg call: explicit
    * `valueOf` for primitives (no reliance on Janino autoboxing). */
  private[expressions] def boxed(dt: DataType, c: String): String =
    if (CodeGenerator.isPrimitiveType(dt))
      s"${CodeGenerator.boxedType(dt)}.valueOf($c)"
    else c
}

case class MongoIdKey(child: Expression, fromDoc: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (fromDoc) "mongo_id_key_doc" else "mongo_id_key_value"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (fromDoc) MongoIdKeys.docKey(s) else MongoIdKeys.valueKey(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val keys = "graft.functions.expressions.MongoIdKeys"
      val fn = if (fromDoc) "docKey" else "valueKey"
      s"""
         |${ev.value} = $keys.$fn($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Canonical id key of a TYPED column (any Spark type): Catalyst value →
  * external → mejson JValue → canonId. Produces the identical key the
  * string path does for the same logical value, because `canonId ∘ parse ∘
  * write = canonId ∘ toJValue`. */
case class MongoIdTypedKey(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "mongo_id_key_typed"

  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(child.dataType)

  /** Codegen entry point (also the eval body): `v` is the CATALYST value. */
  def keyOf(v: Any): UTF8String =
    graft.sources.MongoOplog
      .canonId(graft.functions.Mejson.toJValue(toScala(v)))
      .map(UTF8String.fromString).orNull

  override def nullSafeEval(input: Any): Any = keyOf(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("typedKey", this,
      classOf[MongoIdTypedKey].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.keyOf(${MongoIdKeys.boxed(child.dataType, c)});
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `Mejson.write` as an expression: Catalyst value → external → extended
  * JSON text. Same output as the `Mejson.to_mejson` UDF (it shares
  * `Mejson.write`), but stays inside whole-stage codegen. */
case class MejsonWrite(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "mejson_write"

  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(child.dataType)

  /** Codegen entry point (also the eval body): `v` is the CATALYST value. */
  def render(v: Any): UTF8String =
    UTF8String.fromString(graft.functions.Mejson.write(toScala(v)))

  override def nullSafeEval(input: Any): Any = render(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mejsonWrite", this,
      classOf[MejsonWrite].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.render(${MongoIdKeys.boxed(child.dataType, c)});
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
