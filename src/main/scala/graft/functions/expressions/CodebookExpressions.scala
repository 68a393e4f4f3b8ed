package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Centroid-codebook expressions for the large-`nlist` ANN paths.
  *
  * The small-`nlist` form inlines every centroid as literal arrays inside
  * one projection (`Similarity.assignExpr` / `ProductQuantizer.argminL2`)
  * — ideal to ~10³ centroids, but the expression TREE is O(nlist × dim):
  * at the list counts `Similarity.autoNlist` targets for real corpora
  * (up to 2¹⁶), Catalyst analysis and Janino collapse under ~4M literal
  * nodes long before any row is scored.
  *
  * These expressions bind the codebook as ONE attached `float[][]`
  * reference object instead (`ctx.addReferenceObj` — shipped with the
  * serialized plan once, like a broadcast small table), so plan size is
  * O(1) in nlist and the per-row scan is a tight generated loop over the
  * array. Semantics are EXACTLY the literal form's: scores accumulate in
  * double in element order, ties break toward the smaller centroid index
  * (the literal path's `array_min`/`array_sort` over (score, idx)
  * structs), so the two forms are bit-identical and the threshold switch
  * in [[graft.operators.Similarity]] / [[graft.operators.ProductQuantizer]]
  * never changes results.
  */
object CodebookExpressions {

  /** Indices of the `n` smallest-score centroids (ascending score, ties
    * by index). `metric = "dot"`: score_j = −(x·c_j) — argmax dot, the
    * cosine assignment against pre-normalized centroids. `metric = "l2"`:
    * score_j = ‖c_j‖² − 2·x·c_j — argmin L2 with the row-common ‖x‖²
    * dropped. Returns int for n = 1, array<int> otherwise. */
  def codebook_topn(vec: Column, codebook: Array[Array[Float]],
      metric: String, n: Int): Column =
    Bridge.column(CodebookTopN(Bridge.expression(vec), codebook, metric, n))

  /** x·c_j for every centroid j, as array<double>. */
  def codebook_dots(vec: Column, codebook: Array[Array[Float]]): Column =
    Bridge.column(CodebookDots(Bridge.expression(vec), codebook))
}

/** Top-`n` centroid indices by score over an attached codebook.
  * One fused loop per row: nlist sub-scores, bounded insertion into an
  * n-slot selection (n is 1 or nprobe — tiny), no intermediate arrays.
  */
case class CodebookTopN(child: Expression, codebook: Array[Array[Float]],
    metric: String, n: Int) extends UnaryExpression {
  require(metric == "dot" || metric == "l2", s"bad metric $metric")
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType =
    if (n == 1) IntegerType else ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = s"codebook_top${n}_$metric"

  // ‖c_j‖² terms, computed once driver-side exactly as the literal path
  // does (double accumulation over the float components in order)
  private lazy val c2: Array[Double] =
    codebook.map(_.foldLeft(0.0)((s, v) => s + v.toDouble * v.toDouble))

  @transient private lazy val negateDot = metric == "dot"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val k = codebook.length
    val bestS = Array.fill(math.min(n, k))(Double.PositiveInfinity)
    val bestI = Array.fill(math.min(n, k))(-1)
    var j = 0
    while (j < k) {
      val c = codebook(j)
      val d = math.min(x.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += x.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      val s = if (negateDot) -dot else c2(j) - 2.0 * dot
      // strict <: on ties the EARLIER index stays — the literal form's
      // (score, idx) struct-ordering tie-break
      if (s < bestS(bestS.length - 1)) {
        var p = bestS.length - 1
        while (p > 0 && s < bestS(p - 1)) {
          bestS(p) = bestS(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestS(p) = s; bestI(p) = j
      }
      j += 1
    }
    if (n == 1) java.lang.Integer.valueOf(bestI(0))
    else new GenericArrayData(bestI.filter(_ >= 0))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cb = ctx.addReferenceObj("codebook", codebook, "float[][]")
      val c2Ref = ctx.addReferenceObj("c2", c2, "double[]")
      val slots = ctx.freshName("slots")
      val bestS = ctx.freshName("bestS")
      val bestI = ctx.freshName("bestI")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val score =
        if (negateDot) s"-$dot" else s"$c2Ref[$j] - 2.0 * $dot"
      val emit =
        if (n == 1) s"${ev.value} = $bestI[0];"
        else {
          val cnt = ctx.freshName("cnt")
          s"""
             |int $cnt = 0;
             |while ($cnt < $slots && $bestI[$cnt] >= 0) $cnt++;
             |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
             |    java.util.Arrays.copyOf($bestI, $cnt));
           """.stripMargin
        }
      s"""
         |int $slots = Math.min($n, $cb.length);
         |double[] $bestS = new double[$slots];
         |int[] $bestI = new int[$slots];
         |java.util.Arrays.fill($bestS, Double.POSITIVE_INFINITY);
         |java.util.Arrays.fill($bestI, -1);
         |for (int $j = 0; $j < $cb.length; $j++) {
         |  float[] $c = $cb[$j];
         |  int $d = Math.min($x.numElements(), $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $dot += (double) $x.getFloat($i) * (double) $c[$i];
         |  }
         |  double $s = $score;
         |  if ($s < $bestS[$slots - 1]) {
         |    int $p = $slots - 1;
         |    while ($p > 0 && $s < $bestS[$p - 1]) {
         |      $bestS[$p] = $bestS[$p - 1]; $bestI[$p] = $bestI[$p - 1]; $p--;
         |    }
         |    $bestS[$p] = $s; $bestI[$p] = $j;
         |  }
         |}
         |$emit
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** x·c_j for every centroid of an attached codebook, as array<double>.
  * The large-nlist form of the per-query coarse-dot table in
  * [[graft.operators.ProductQuantizer.ivfAdcTopK]]. */
case class CodebookDots(child: Expression, codebook: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "codebook_dots"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val out = new Array[Double](codebook.length)
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      val d = math.min(x.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += x.getFloat(i).toDouble * c(i).toDouble; i += 1 }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cb = ctx.addReferenceObj("codebook", codebook, "float[][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      s"""
         |double[] $out = new double[$cb.length];
         |for (int $j = 0; $j < $cb.length; $j++) {
         |  float[] $c = $cb[$j];
         |  int $d = Math.min($x.numElements(), $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $dot += (double) $x.getFloat($i) * (double) $c[$i];
         |  }
         |  $out[$j] = $dot;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
