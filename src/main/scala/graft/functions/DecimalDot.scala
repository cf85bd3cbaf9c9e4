package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native single-pass DECIMAL(28,16)-exact dot product over two numeric
  * arrays — the hot inner loop of every decimal-contract cosine
  * (assignment argmax, SemDeDup pair verification, k-means scoring).
  *
  * Produces BIT-IDENTICAL results to the composed higher-order-function
  * formulation it replaces
  * (`aggregate(zip_with(a, b, (x,y) -> (x*y)::DECIMAL(28,16)), 0, +)`),
  * because it reproduces each of its steps exactly:
  *
  *  - per-term rounding: `java.math.BigDecimal.valueOf(x*y)` (the shortest
  *    decimal representation of the double — exactly what Spark's
  *    `Cast(double → DECIMAL(28,16))` builds) `.setScale(16, HALF_UP)`;
  *  - accumulation: exact scale-16 decimal addition (associative, so any
  *    order matches the oracle's grouped sum; here index order);
  *  - output: `BigDecimal.doubleValue()` of the exact sum, the same
  *    conversion as `Cast(decimal → double)`.
  *
  * What it AVOIDS is the per-term machinery cost of the HOF chain: the
  * zip_with intermediate array allocation, per-element lambda dispatch,
  * Decimal wrapper boxing, and the per-step precision check of
  * `(acc + v).cast(DECIMAL(28,16))`. The fast path accumulates the scale-16
  * unscaled values in a primitive long (exact while |Σ| < 2^63·10⁻¹⁶ ≈
  * 9.2·10², far above any cosine/norm term sum over unit-scale embeddings)
  * and falls back to BigInteger accumulation on overflow — same values,
  * never wrong, just slower.
  *
  * Null semantics replicate zip_with + aggregate: a null element anywhere,
  * or mismatched array lengths (zip_with pads with null), poison the result
  * to NULL.
  */
case class DecimalDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // can return NULL even for non-null inputs (length mismatch, NaN/Inf
  // term — the zip_with poisoning semantics); without this override,
  // non-nullable children make codegen declare ev.isNull as the literal
  // `false`, the `isNull = true` assignment fails to compile, and the
  // whole projection silently falls back to interpreter mode
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dec_dot expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DecMath.decDotBoxed(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("decdot")
      s"""
        |java.lang.Double $r = graft.functions.DecMath.decDotBoxed(
        |  $a, $leftIsFloat, $b, $rightIsFloat);
        |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helpers for [[DecimalDotExpr]] — a standalone object so the
  * generated code can call them as plain static methods. */
object DecMath {

  /** 10^28 — the unscaled-magnitude bound of DECIMAL(28,16). */
  private[functions] val limit28: BigInteger = BigInteger.TEN.pow(28)

  /** Scale-16 HALF_UP decimal-exact dot product; null on length mismatch or
    * null element (the zip_with null-padding semantics). */
  def decDotBoxed(a: ArrayData, aFloat: Boolean,
                  b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var i = 0
    var acc = 0L
    var big: BigInteger = null // engaged on long overflow; exact either way
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val p = x * y
      // Cast(double → DECIMAL(28,16)) semantics under ANSI (the Spark-4
      // default these sessions run under), established empirically in
      // DecimalDotSpec: NaN/Inf cast to NULL (poisoning the sum), while a
      // FINITE value exceeding precision 28 throws — mirror both exactly
      // (only the exception class is simpler here)
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      val t = JBigDecimal.valueOf(p).setScale(16, RoundingMode.HALF_UP)
      val u = t.unscaledValue()
      if (u.abs.compareTo(DecMath.limit28) >= 0)
        throw new ArithmeticException(
          s"dec_dot: term $p cannot be represented as DECIMAL(28,16)")
      if (big == null) {
        if (u.bitLength() < 63) {
          val ul = u.longValue()
          val sum = acc + ul
          // overflow check (Math.addExact without the throw): engage the
          // BigInteger path and keep going — values stay exact. NB the
          // long fast path can never violate the precision-28 bound
          // (2^63·10⁻¹⁶ ≈ 9.2·10² ≪ 10¹²), so no per-step check here.
          if (((acc ^ sum) & (ul ^ sum)) < 0L)
            big = BigInteger.valueOf(acc).add(BigInteger.valueOf(ul))
          else acc = sum
        } else big = BigInteger.valueOf(acc).add(u)
      } else big = big.add(u)
      // the reference formulation re-casts the RUNNING sum to (28,16) each
      // step, so an intermediate overflow throws even if the total fits
      if (big != null && big.abs.compareTo(DecMath.limit28) >= 0)
        throw new ArithmeticException(
          "dec_dot: running sum exceeds DECIMAL(28,16)")
      i += 1
    }
    val exact = if (big == null) new JBigDecimal(BigInteger.valueOf(acc), 16)
      else new JBigDecimal(big, 16)
    java.lang.Double.valueOf(exact.doubleValue())
  }

  /** [[decDotBoxed]] against a plain double[] side (a driver-collected
    * centroid) — identical per-term rounding, accumulation, and poisoning
    * semantics, so a caller substituting a collected centroid for the
    * broadcast column gets the bit-identical dot. */
  def decDotMixed(a: ArrayData, aFloat: Boolean,
                  c: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (c.length != n) return null
    var i = 0
    var acc = 0L
    var big: BigInteger = null
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val p = x * c(i)
      if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) return null
      val t = JBigDecimal.valueOf(p).setScale(16, RoundingMode.HALF_UP)
      val u = t.unscaledValue()
      if (u.abs.compareTo(DecMath.limit28) >= 0)
        throw new ArithmeticException(
          s"dec_dot: term $p cannot be represented as DECIMAL(28,16)")
      if (big == null) {
        if (u.bitLength() < 63) {
          val ul = u.longValue()
          val sum = acc + ul
          if (((acc ^ sum) & (ul ^ sum)) < 0L)
            big = BigInteger.valueOf(acc).add(BigInteger.valueOf(ul))
          else acc = sum
        } else big = BigInteger.valueOf(acc).add(u)
      } else big = big.add(u)
      if (big != null && big.abs.compareTo(DecMath.limit28) >= 0)
        throw new ArithmeticException(
          "dec_dot: running sum exceeds DECIMAL(28,16)")
      i += 1
    }
    val exact = if (big == null) new JBigDecimal(BigInteger.valueOf(acc), 16)
      else new JBigDecimal(big, 16)
    java.lang.Double.valueOf(exact.doubleValue())
  }
}
