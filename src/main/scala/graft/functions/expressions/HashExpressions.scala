package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths Spark's built-ins can't
  * express in one pass. All three implement `doGenCode`, so they stay inside
  * whole-stage codegen — no UDF/serialization overhead per row.
  *
  * Preference order per the build rules: built-ins compose poorly here —
  * a MinHash signature via `transform`+`array_min` × numHashes re-walks the
  * shingle array numHashes times; these walk it once.
  */
object HashExpressions {

  /** XXH64 of a UTF8String with a seed — shared by eval paths. */
  @inline def xxh64(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  def minhash_signature(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), numHashes))

  def simhash64(c: Column): Column = Bridge.column(SimHash64(Bridge.expression(c)))

  def dot_product_f(a: Column, b: Column): Column =
    Bridge.column(DotProductFloat(Bridge.expression(a), Bridge.expression(b)))
}

/** MinHash signature of an array<string> in ONE pass over the array.
  *
  * Per element: h1 = xxh64(bytes, seed1), h2 = xxh64(bytes, seed2);
  * the i-th hash function is h1 + i*h2 (Kirsch–Mitzenmacher double
  * hashing), signature[i] = min over elements. One array walk total vs
  * numHashes walks for the compositional form.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h1 = HashExpressions.xxh64(s, 42L)
        val h2 = HashExpressions.xxh64(s, 1337L)
        var i = 0
        var h = h1
        while (i < numHashes) {
          if (h < sig(i)) sig(i) = h
          h += h2
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    UTF8String $s = $arr.getUTF8String($j);
         |    long $h1 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    long $h2 = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 1337L);
         |    long $h = $h1;
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      if ($h < $sig[$i]) $sig[$i] = $h;
         |      $h += $h2;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-token 64-bit hash for SimHash: the FIRST 8 BYTES OF MD5, big-endian.
  *
  * md5 (not xxh64) deliberately: it is the one hash both this engine and
  * the DuckDB oracle compute identically (`md5(tok)` hex matches JVM
  * MessageDigest byte-for-byte), which makes the simhash oracle-checkable
  * by brute-force hamming in SQL. Bit b of the long == bit (b%4) of the
  * hex nibble at char 16 - b/4 of the md5 hex string — the form the
  * oracle extracts with substr + strpos arithmetic.
  */
object Md5Hash {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  // Token frequencies are Zipfian: a small per-thread memo over the token
  // string converts most md5 calls into a hash-map probe. Purely a cache —
  // the value is a function of the bytes — so determinism is unaffected.
  // Bounded by wholesale clear (cheaper than LRU bookkeeping per probe).
  private val CacheMax = 1 << 16
  private val cache = ThreadLocal.withInitial[
    java.util.HashMap[UTF8String, java.lang.Long]](() =>
    new java.util.HashMap[UTF8String, java.lang.Long](1 << 12))

  private def compute(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h
  }

  def hash64(s: UTF8String): Long = {
    val c = cache.get()
    val hit = c.get(s)
    if (hit != null) hit.longValue()
    else {
      val h = compute(s)
      if (c.size() >= CacheMax) c.clear()
      // clone: s may alias a reused UnsafeRow buffer
      c.put(s.clone(), java.lang.Long.valueOf(h))
      h
    }
  }
}

/** 64-bit SimHash of an array<string> (token list) in one pass: each token
  * hash (md5-derived — see Md5Hash) votes ±1 on every bit; the result sets
  * bits with a non-negative sum (zero votes → 1, so an empty token list
  * yields all-ones — the oracle mirrors this with COALESCE(w,0) >= 0).
  * Near-duplicate docs differ in a few bits (compare by hamming distance).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = Md5Hash.hash64(arr.getUTF8String(j))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val md5h = "graft.functions.expressions.Md5Hash"
      s"""
         |int[] $acc = new int[64];
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    long $h = $md5h.hash64($arr.getUTF8String($j));
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($acc[$b] >= 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two array<float> columns, accumulated in double.
  * The ANN hot path: one fused loop instead of zip_with + aggregate
  * (which materializes an intermediate array per row).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
