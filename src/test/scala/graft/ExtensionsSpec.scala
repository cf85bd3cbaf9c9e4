package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerKeyStrategy

/** The spark.sql.extensions deployment path: a session built with
  * `graft.GraftExtensions` must expose every graft SQL function and the
  * custom planner strategy with ZERO session-local register() calls. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session has all functions + planner strategy") {
    // materialize the shared context first, then build a SEPARATE session
    // (same SparkContext) with the extensions conf; restore the shared
    // session as active/default afterwards so later suites are unaffected
    val shared = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions, not .config("spark.sql.extensions", ...): the conf is
    // STATIC — with a pre-existing SparkContext (shared across suites) it is
    // silently ignored ("some configuration may not take effect"), which on
    // a real cluster cannot happen (the conf is read at context launch).
    // withExtensions runs the exact same class through the same
    // SparkSessionExtensions object, so the injection logic is what's tested.
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      assert(s2 ne shared, "builder must create a fresh session")
      val r = s2.sql(
        """SELECT float_cosine(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS c,
                  graft_simhash32(array('a', 'b', 'a')) AS sh,
                  size(graft_minhash_sigs(array('x', 'y'), 5)) AS nsig,
                  size(graft_winnow(array('a','b','c','d','e','f'), 3, 4)) AS nfp
        """).first()
      assert(r.getDouble(0) == 1.0)
      assert(r.getLong(1) != 0L)
      assert(r.getInt(2) == 5)
      assert(r.getInt(3) >= 1)
      // the custom strategy is part of the session's planner, not just
      // lazily patched into experimental methods by GraftPlanBridge
      assert(s2.sessionState.planner.strategies.contains(TopKPerKeyStrategy))
      // misuse surfaces as clean AnalysisExceptions naming the function —
      // never IndexOutOfBounds (arity) or NPE (non-literal k)
      val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT graft_minhash_sigs(array('x'))").collect()
      }
      assert(wrongArity.getMessage.contains("graft_minhash_sigs"))
      assert(wrongArity.getCondition.startsWith("WRONG_NUM_ARGS"))
      val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT graft_winnow(array('a','b'), length('ab'), cast(rand() * 4 AS INT))")
          .collect()
      }
      assert(nonFoldable.getCondition == "NON_FOLDABLE_ARGUMENT",
        nonFoldable.getMessage)
      val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT graft_minhash_sigs(array('x'), 'five')").collect()
      }
      assert(wrongType.getCondition == "NON_FOLDABLE_ARGUMENT")
      assert(intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT float_cosine(array(1.0F))").collect()
      }.getCondition.startsWith("WRONG_NUM_ARGS"))
      assert(intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT graft_simhash32(array('a'), 2)").collect()
      }.getCondition.startsWith("WRONG_NUM_ARGS"))
      // and the legacy alias class injects identically
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s3 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions()(_))
        .getOrCreate()
      assert(s3.sql("SELECT float_cosine(array(1.0F), array(1.0F))")
        .first().getDouble(0) == 1.0)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
