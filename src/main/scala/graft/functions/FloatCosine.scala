package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The throughput path for similarity scoring: a single fused loop in
  * generated Java (stays inside whole-stage codegen), versus the interpreted
  * lambda evaluation of the higher-order-function formulation
  * (Similarity.cosineFast) and the decimal-exact oracle path
  * (Similarity.cosineToQuery). Accumulation is plain double left-to-right,
  * identical to cosineFast's aggregate order, so the two agree bit-for-bit.
  *
  * Demonstrates the preferred extension ladder from SURVEY.md §7: compose
  * built-ins first, drop to a custom `Expression` with `doGenCode` only for
  * hot scoring loops.
  */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_cosine expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // zero-norm guard, identical to Similarity.cosineFast / IvfIndex.knn
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val getX = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double x = $getX;
        |  double y = $getY;
        |  $dot += x * y; $na += x * x; $nb += y * y;
        |}
        |${ev.value} = $dot / java.lang.Math.max(
        |  java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb), 1e-12);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatCosine {

  val name = "float_cosine"

  private def builder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name takes exactly 2 arguments")
    FloatCosine(args.head, args(1))
  }

  /** Session-local registration (tests, ad-hoc sessions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Column-API entry point; requires register(spark) first. */
  def apply(a: Column, b: Column): Column = call_function(name, a, b)
}

/** Deployment-grade registration moved to [[graft.GraftExtensions]], which
  * injects this function plus the native text expressions and the custom
  * planner strategy; this alias keeps the historical conf value
  * `graft.functions.GraftExtensions` working. */
class GraftExtensions extends graft.GraftExtensions
