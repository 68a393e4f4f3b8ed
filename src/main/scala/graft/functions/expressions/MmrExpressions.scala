package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

object MmrExpressions {

  /** Greedy MMR selection over a per-query candidate array — see
    * [[MmrSelect]]. `cands` must be array<struct<id long, sim double,
    * vec array<float>>>. */
  def mmr_select(cands: Column, k: Int, lambda: Double): Column =
    Bridge.column(MmrSelect(Bridge.expression(cands), k, lambda))
}

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998):
  * greedily build a k-item result where each step takes the remaining
  * candidate maximizing
  *
  *   λ · sim(q, c)  −  (1 − λ) · max_{s ∈ selected} cos(c, s)
  *
  * — relevance traded against redundancy with what is already chosen.
  * λ = 1 degrades to plain top-k; λ → 0 maximizes diversity alone.
  *
  * Runs AFTER candidate generation: the input is one query's shortlist
  * (R ≈ tens of rows — produced by any of the ANN stacks), so the
  * O(k · R · dim) greedy loop is per-ROW work on #queries rows, never
  * corpus-scale; the expression form keeps the whole rerank inside the
  * dataflow (no driver loop, no UDF registry). Deterministic: sims are
  * sequential float→double folds, each step breaks score ties by
  * smaller id, and the selection order IS the output rank — pinnable.
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, "mmr_select requires k >= 1")
  require(lambda >= 0.0 && lambda <= 1.0,
    s"mmr_select requires lambda in [0, 1], got $lambda")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "mmr_select"

  private def wantType: Boolean = child.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 3 =>
      fields(0).dataType == LongType && fields(1).dataType == DoubleType &&
        (fields(2).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (wantType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "mmr_select input must be array<struct<id: bigint, sim: double, " +
        s"vec: array<float>>>, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val sims = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      sims(i) = row.getDouble(1)
      vecs(i) = row.getArray(2).toFloatArray()
      var s = 0.0
      val v = vecs(i)
      var d = 0
      while (d < v.length) { s += v(d).toDouble * v(d).toDouble; d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    def cos(a: Int, b: Int): Double = {
      if (norms(a) == 0.0 || norms(b) == 0.0) return 0.0
      val va = vecs(a); val vb = vecs(b)
      var s = 0.0
      var d = 0
      while (d < va.length) { s += va(d).toDouble * vb(d).toDouble; d += 1 }
      s / (norms(a) * norms(b))
    }
    val taken = new Array[Boolean](n)
    // running max cos to the selection; -inf so a NEGATIVE max (an
    // anti-correlated candidate) is preserved, not clamped to 0 — after
    // the first selection every remaining entry is a real cos value
    val maxSimToSel = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[Any](math.min(k, n))
    var step = 0
    while (step < out.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val penalty = if (step == 0) 0.0 else maxSimToSel(c)
          val rawScore = lambda * sims(c) - (1.0 - lambda) * penalty
          // NaN sims/vectors would fail both comparison branches and leave
          // best = -1; demote them to -inf so they rank last but never crash
          val score = if (java.lang.Double.isNaN(rawScore)) Double.NegativeInfinity else rawScore
          if (score > bestScore ||
              (score == bestScore && (best < 0 || ids(c) < ids(best)))) {
            bestScore = score
            best = c
          }
        }
        c += 1
      }
      if (best < 0) return new GenericArrayData(out.take(step))
      taken(best) = true
      out(step) = new GenericInternalRow(Array[Any](step + 1, ids(best)))
      // fold the new selection into every remaining candidate's max
      var r = 0
      while (r < n) {
        if (!taken(r)) {
          val s = cos(r, best)
          if (s > maxSimToSel(r)) maxSimToSel(r) = s
        }
        r += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
