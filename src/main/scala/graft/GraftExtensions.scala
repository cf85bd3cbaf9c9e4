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

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn(FloatCosine.name, classOf[FloatCosine],
      args => FloatCosine(args.head, args(1))))
    e.injectFunction(fn("graft_simhash32", classOf[SimHash32Expr],
      args => SimHash32Expr(args.head)))
    e.injectFunction(fn("graft_minhash_sigs", classOf[MinHashSigsExpr],
      args => MinHashSigsExpr(args(0), args(1).eval().asInstanceOf[Int])))
    e.injectFunction(fn("graft_winnow", classOf[WinnowExpr],
      args => WinnowExpr(args(0), args(1).eval().asInstanceOf[Int],
        args(2).eval().asInstanceOf[Int])))
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
