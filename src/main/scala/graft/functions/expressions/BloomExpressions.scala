package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built Bloom filter, attached to
  * the plan as a reference object (the [[CodebookExpressions]] pattern:
  * plan size O(1) in the filter's bits, codegen'd probe, shipped once
  * per executor with the closure). The at-scale replacement for a
  * broadcast DISTINCT-set semi-join when the set is large and a bounded
  * false-positive rate is acceptable (membership is one-sided: never a
  * false NEGATIVE). */
object BloomExpressions {

  def bloom_might_contain(value: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(value), bloom))
}

/** True iff `child` (string) might be in `bloom`; false = definitely
  * absent. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bf = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainString($x.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
