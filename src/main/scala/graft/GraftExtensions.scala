package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatCosine, MinHashSigsExpr, SimHash32Expr, WinnowExpr}
import graft.plans.TopKPerKeyStrategy

/** The library's single deployment entry point:
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * makes every graft extension available in every session of the cluster
  * with no per-session registration calls:
  *
  *  - SQL functions: `float_cosine` (codegen'd cosine over array<float>),
  *    `graft_simhash32`, `graft_minhash_sigs`, `graft_winnow` (the native
  *    text-hash expressions behind the dedup operators);
  *  - planner strategy: [[graft.plans.TopKPerKeyStrategy]] for the custom
  *    per-key top-k logical operator (GraftPlanBridge also lazily injects
  *    it via experimental methods for sessions built without extensions —
  *    both paths are idempotent).
  *
  * The session-local `register(spark)` helpers on the individual objects
  * remain for tests and ad-hoc sessions; this class is the cluster-wide
  * form of exactly the same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, exprClass: Class[_],
                 builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(exprClass.getName, name),
      builder)

  /** SQL-analysis-time argument validation: a wrong arity or a non-literal
    * where a literal parameter is required must surface as a clean
    * AnalysisException (standard Spark error conditions, function named) —
    * not as an IndexOutOfBounds / NPE from inside the builder. */
  private def checkArity(name: String, signature: String,
                         args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name` ($signature)",
          "expectedNum" -> n.toString,
          "actualNum" -> args.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Evaluate a foldable int parameter (e.g. a literal `k`); reject
    * non-constant expressions with the standard NON_FOLDABLE_ARGUMENT. */
  private def litInt(name: String, param: String, expr: Expression): Int = {
    def fail(): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$name`",
          "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""))
    if (!expr.foldable) fail()
    expr.eval() match {
      case i: Int => i
      case _ => fail()
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    val cosSig = "float_cosine(array<float>, array<float>)"
    e.injectFunction(fn(FloatCosine.name, classOf[FloatCosine], args => {
      checkArity(FloatCosine.name, cosSig, args, 2)
      FloatCosine(args.head, args(1))
    }))
    e.injectFunction(fn("graft_simhash32", classOf[SimHash32Expr], args => {
      checkArity("graft_simhash32", "graft_simhash32(array<string>)", args, 1)
      SimHash32Expr(args.head)
    }))
    val mhSig = "graft_minhash_sigs(array<string>, k int literal)"
    e.injectFunction(fn("graft_minhash_sigs", classOf[MinHashSigsExpr], args => {
      checkArity("graft_minhash_sigs", mhSig, args, 2)
      MinHashSigsExpr(args(0), litInt("graft_minhash_sigs", "k", args(1)))
    }))
    val wnSig = "graft_winnow(array<string>, k int literal, w int literal)"
    e.injectFunction(fn("graft_winnow", classOf[WinnowExpr], args => {
      checkArity("graft_winnow", wnSig, args, 3)
      WinnowExpr(args(0), litInt("graft_winnow", "k", args(1)),
        litInt("graft_winnow", "w", args(2)))
    }))
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // rewrite the stock row_number()<=k window idiom into the two-phase
    // bounded-heap operator (see WindowTopKRewrite's safety conditions)
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}
