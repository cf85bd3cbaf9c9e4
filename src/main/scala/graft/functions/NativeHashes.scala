package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hot loops for the text-dedup hash families. The higher-order
  * function formulations (TextDedup round 1) evaluate interpreted lambda
  * frames per element — ~10^7 of them per bench run; these expressions run
  * the same math as tight Java over the md5 *bytes* (hex digit j's high bit
  * is a bit test on byte j/2), producing bit-identical results to the
  * hex-string formulation and therefore to the DuckDB oracles.
  *
  * Codegen calls the static helpers below, so the projection stays inside
  * whole-stage codegen.
  */
object NativeHashes {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 32-bit SimHash over token occurrences: bit j = sign of Σ±1 where +1
    * iff hex digit j of md5(token) has its high bit set. Null elements are
    * skipped (absent tokens contribute nothing). */
  def simhash32(tokens: ArrayData): Long = {
    val counts = new Array[Int](32)
    val md = md5Local.get()
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(t).getBytes)
        var j = 0
        while (j < 32) {
          val b = digest(j >> 1)
          val high = if ((j & 1) == 0) (b & 0x80) != 0 else (b & 0x08) != 0
          counts(j) += (if (high) 1 else -1)
          j += 1
        }
      }
      t += 1
    }
    var acc = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) acc |= (1L << j)
      j += 1
    }
    acc
  }

  /** md5 as lowercase hex of raw bytes — shared hot-path helper. */
  def md5HexOf(input: Array[Byte]): String = {
    val md = md5Local.get()
    md.reset()
    toHex(md.digest(input)).toString
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 15).toByte
      out(2 * i + 1) = hexChars(bytes(i) & 15).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** MinHash signature array: sigs[s] = min over shingles of
    * md5(shingle ":" s) — identical bytes hashed, identical hex strings
    * out (unsigned byte order == hex lexicographic order). Empty/all-null
    * shingle input yields an EMPTY array (not fabricated zero digests), so
    * `filter(size(sigs) > 0)` excludes degenerate docs; shingle bytes are
    * extracted once, not once per hash index. */
  def minhashSigs(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val bytes = new Array[Array[Byte]](n)
    var nb = 0
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        bytes(nb) = shingles.getUTF8String(i).getBytes
        nb += 1
      }
      i += 1
    }
    if (nb == 0) return new GenericArrayData(Array.empty[AnyRef])
    val mins = Array.ofDim[Byte](numHashes, 16)
    val have = new Array[Boolean](numHashes)
    val md = md5Local.get()
    var s = 0
    while (s < numHashes) {
      val suffix = (":" + s).getBytes("UTF-8")
      i = 0
      while (i < nb) {
        md.reset()
        md.update(bytes(i))
        md.update(suffix)
        val digest = md.digest()
        if (!have(s) || unsignedLess(digest, mins(s))) {
          System.arraycopy(digest, 0, mins(s), 0, 16)
          have(s) = true
        }
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(toHex(_): AnyRef))
  }

  private[functions] def requireStringArray(fn: String, child: Expression)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$fn expects array<string>, got ${other.simpleString}")
    }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken) as one native pass:
    * positional n-gram bytes (single-space join, nulls skipped — exactly
    * concat_ws semantics), md5 per gram, sliding window-`w` minima compared
    * in unsigned digest order (== hex lexicographic order), distinct
    * preserving first appearance. Byte-identical to TextFunctions.winnow's
    * interpreted higher-order-function formulation, which spent ~9 s of the
    * sf0.1 bench in lambda frames; this runs inside whole-stage codegen. */
  def winnow(tokens: ArrayData, n: Int, w: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val nGrams = len - n + 1
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5Local.get()
    val digests = new Array[Array[Byte]](nGrams)
    i = 0
    while (i < nGrams) {
      md.reset()
      var first = true
      var k = 0
      while (k < n) {
        val tb = toks(i + k)
        if (tb != null) {
          if (!first) md.update(' '.toByte)
          md.update(tb)
          first = false
        }
        k += 1
      }
      digests(i) = md.digest()
      i += 1
    }
    val out = new java.util.LinkedHashSet[AnyRef]()
    if (nGrams >= w) {
      i = 0
      while (i <= nGrams - w) {
        var m = i
        var k = i + 1
        while (k < i + w) {
          if (unsignedLess(digests(k), digests(m))) m = k
          k += 1
        }
        out.add(toHex(digests(m)))
        i += 1
      }
    } else {
      var m = 0
      i = 1
      while (i < nGrams) {
        if (unsignedLess(digests(i), digests(m))) m = i
        i += 1
      }
      out.add(toHex(digests(m)))
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }
}

/** Session-local registration of every native text expression. Deployment:
  * inject the same builders via SparkSessionExtensions (see GraftExtensions
  * in FloatCosine.scala). */
object NativeTextFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash32",
      exprs => SimHash32Expr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sigs",
      exprs => MinHashSigsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      exprs => WinnowExpr(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]), "built-in")
  }
}

/** simhash32(tokens array<string>) → bigint. */
case class SimHash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    NativeHashes.requireStringArray("graft_simhash32", child)
  override def nullSafeEval(v: Any): Any =
    NativeHashes.simhash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeHashes.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** winnow(tokens array<string>, n, w) → array<string> of distinct sliding
  * window-minimum gram hashes. */
case class WinnowExpr(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    NativeHashes.requireStringArray("graft_winnow", child)
  override def nullSafeEval(v: Any): Any =
    NativeHashes.winnow(v.asInstanceOf[ArrayData], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeHashes.winnow($c, $n, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sigs(shingles array<string>, k) → array<string> of hex minima. */
case class MinHashSigsExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    NativeHashes.requireStringArray("graft_minhash_sigs", child)
  override def nullSafeEval(v: Any): Any =
    NativeHashes.minhashSigs(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHashes.minhashSigs($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
