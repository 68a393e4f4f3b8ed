package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lattice expressions for the unigram-LM tokenizer
  * ([[graft.operators.UnigramLm]], Kudo 2018). Both bind the piece
  * vocabulary as attached reference objects (the CodebookExpressions
  * pattern — shipped once with the plan, O(1) plan size in |vocab|) and
  * run a per-row dynamic program over the word's segmentation lattice.
  *
  * Eval-based (CodegenFallback), deliberately: these run over word TYPES
  * — the vocabulary-bounded row set the trainer collapses the corpus to —
  * never over corpus tokens, so they are not on the scan hot path and a
  * generated-code DP buys nothing. Determinism contract: all arithmetic
  * is fixed-order per row, and every emitted number is on the 1e-9
  * integer grid, so outputs are bit-identical under any partitioning.
  */
object UnigramExpressions {

  /** Per-word E-step: expected piece counts over all segmentations under
    * the current model, as (piece_id, floor(1e9·E[count])) pairs. */
  def unigram_estep(word: Column, pieces: Array[String],
      logpGrid: Array[Long]): Column =
    Bridge.column(UnigramEStep(Bridge.expression(word), pieces, logpGrid))

  /** Per-word Viterbi segmentation under the final model: the maximum-
    * log-probability piece sequence (exact integer DP on the grid). */
  def unigram_viterbi(word: Column, pieces: Array[String],
      logpGrid: Array[Long]): Column =
    Bridge.column(UnigramViterbi(Bridge.expression(word), pieces, logpGrid))

  /** Grid score an unknown single character receives at encode time
    * (floor(1e9·ln(1e-10)) — far below any trained piece, so unknowns
    * never displace a real segmentation). */
  val UnkGrid: Long = math.floor(1e9 * math.log(1e-10)).toLong
}

private[expressions] trait UnigramVocabBound { self: Expression =>
  def pieces: Array[String]
  def logpGrid: Array[Long]

  @transient protected lazy val pieceId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), Integer.valueOf(i)); i += 1 }
    m
  }
  @transient protected lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  // probabilities derive from the grid (not the other way around) so the
  // local replica in the spec reconstructs them exactly
  @transient protected lazy val probs: Array[Double] =
    logpGrid.map(g => math.exp(g * 1e-9))
}

/** array<struct<piece_id:int, grid:bigint>> of expected counts: for each
  * vocabulary piece occurring in the word, floor(1e9 · Σ_occurrences
  * α(s)·p·β(e)/Z) — the forward-backward posterior. Words the vocabulary
  * cannot cover (possible only after pruning) return an empty array. */
case class UnigramEStep(child: Expression, pieces: Array[String],
    logpGrid: Array[Long])
  extends UnaryExpression with CodegenFallback with UnigramVocabBound {
  require(pieces.length == logpGrid.length)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece_id", IntegerType, nullable = false),
    StructField("grid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "unigram_estep"

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // forward: alpha(i) = P(prefix of length i); l ascending at each i
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var s = 0.0
      var l = 1
      val lmax = math.min(maxLen, i)
      while (l <= lmax) {
        val id = pieceId.get(w.substring(i - l, i))
        if (id != null) s += alpha(i - l) * probs(id.intValue())
        l += 1
      }
      alpha(i) = s
      i += 1
    }
    val z = alpha(n)
    if (z == 0.0) return new GenericArrayData(Array.empty[Any])
    // backward: beta(i) = P(suffix from i); l ascending at each i
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var s = 0.0
      var l = 1
      val lmax = math.min(maxLen, n - i)
      while (l <= lmax) {
        val id = pieceId.get(w.substring(i, i + l))
        if (id != null) s += probs(id.intValue()) * beta(i + l)
        l += 1
      }
      beta(i) = s
      i -= 1
    }
    // posteriors accumulated per piece in fixed (start asc, len asc) order
    val exp = new java.util.TreeMap[Integer, java.lang.Double]()
    var s0 = 0
    while (s0 < n) {
      var l = 1
      val lmax = math.min(maxLen, n - s0)
      while (l <= lmax) {
        val id = pieceId.get(w.substring(s0, s0 + l))
        if (id != null) {
          val c = alpha(s0) * probs(id.intValue()) * beta(s0 + l) / z
          val prev = exp.get(id)
          exp.put(id, if (prev == null) c else prev.doubleValue() + c)
        }
        l += 1
      }
      s0 += 1
    }
    val out = Seq.newBuilder[Any]
    val it = exp.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val grid = math.floor(1e9 * e.getValue.doubleValue()).toLong
      if (grid > 0)
        out += InternalRow(e.getKey.intValue(), grid)
    }
    new GenericArrayData(out.result().toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<string> Viterbi segmentation: exact max-sum DP on the integer
  * grid scores. Ties break toward the SHORTER last piece (l ascending,
  * strict improvement required) — exact on the grid, so replicable.
  * A character no piece covers scores [[UnigramExpressions.UnkGrid]] and
  * is emitted as itself, guaranteeing totality. */
case class UnigramViterbi(child: Expression, pieces: Array[String],
    logpGrid: Array[Long])
  extends UnaryExpression with CodegenFallback with UnigramVocabBound {
  require(pieces.length == logpGrid.length)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = Array.fill(n + 1)(Long.MinValue)
    val from = new Array[Int](n + 1) // chosen piece length ending at i
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(math.max(maxLen, 1), i)
      while (l <= lmax) {
        if (best(i - l) != Long.MinValue) {
          val id = pieceId.get(w.substring(i - l, i))
          val sc =
            if (id != null) logpGrid(id.intValue())
            else if (l == 1) UnigramExpressions.UnkGrid
            else Long.MinValue
          if (sc != Long.MinValue && best(i - l) + sc > best(i)) {
            best(i) = best(i - l) + sc
            from(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = n
    while (p > 0) {
      val l = from(p)
      out.prepend(UTF8String.fromString(w.substring(p - l, p)))
      p -= l
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
