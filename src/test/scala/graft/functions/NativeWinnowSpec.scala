package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native WinnowExpr must be byte-identical to the interpreted
  * higher-order-function formulation (TextFunctions.winnow) — same grams,
  * same md5 hex, same window minima, same distinct-with-first-appearance
  * order — across normal docs and every length edge case. */
class NativeWinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "x1", "y2", "z3", "", "tok")

  private def compare(docsSeq: Seq[(Long, String)], n: Int, w: Int): Unit = {
    NativeTextFunctions.register(spark)
    val df = docsSeq.toDF("doc_id", "text")
    val both = df.select(
      col("doc_id"),
      TextFunctions.winnow(TextFunctions.tokens(col("text")), n, w).as("interp"),
      call_function("graft_winnow",
        TextFunctions.tokens(col("text")), lit(n), lit(w)).as("native"))
    val bad = both.filter(not(col("interp") === col("native")))
    assert(bad.count() == 0, s"mismatch rows: ${bad.take(3).mkString("; ")}")
  }

  test("random docs: native == interpreted, order included") {
    val rnd = new Random(11)
    val docsSeq = (0L until 300L).map { i =>
      val len = rnd.nextInt(60)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    compare(docsSeq, 3, 4)
    compare(docsSeq, 2, 5)
  }

  test("length edge cases: below n, exactly n, between n and n+w-1, exactly n+w-1") {
    val docsSeq = Seq(
      1L -> "",                        // 1 empty token after split
      2L -> "a b",                     // below n=3
      3L -> "a b c",                   // exactly one gram
      4L -> "a b c d",                 // 2 grams < w
      5L -> "a b c d e",               // 3 grams < w
      6L -> "a b c d e f",             // exactly w grams
      7L -> "a a a a a a a")           // all-identical grams → 1 distinct min
    compare(docsSeq, 3, 4)
  }

  test("explicit null tokens are skipped like concat_ws") {
    NativeTextFunctions.register(spark)
    val df = Seq(Tuple1(Seq[String]("a", null, "b", "c", "d", "e", "f")))
      .toDF("toks")
    val both = df.select(
      TextFunctions.winnow(col("toks"), 3, 4).as("interp"),
      call_function("graft_winnow", col("toks"), lit(3), lit(4)).as("native"))
    val r = both.first()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }
}
