package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native DecimalDotExpr must be BIT-identical to the retired
  * higher-order-function decimal accumulation on every input shape the
  * decimal contract can see — this equality is what lets the round-9 swap
  * keep all 250 oracle hashes unchanged. */
class DecimalDotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assertBitEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.select(
      Similarity.decDot(col("a"), col("b")).as("native"),
      Similarity.decDotHof(col("a"), col("b")).as("hof")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val nNull = r.isNullAt(0); val hNull = r.isNullAt(1)
      assert(nNull == hNull, s"row $i null mismatch: native=$nNull hof=$hNull")
      if (!nNull) {
        val nb = java.lang.Double.doubleToRawLongBits(r.getDouble(0))
        val hb = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        assert(nb == hb,
          s"row $i bits differ: native=${r.getDouble(0)} hof=${r.getDouble(1)}")
      }
    }
  }

  test("float arrays: seeded random corpus, incl. values near half-way ties") {
    val rnd = new scala.util.Random(42)
    val data = (1 to 500).map { _ =>
      val n = 64
      (Array.fill(n)((rnd.nextFloat() - 0.5f) * 4f),
        Array.fill(n)((rnd.nextFloat() - 0.5f) * 4f))
    }
    assertBitEqual(data.toDF("a", "b"))
  }

  test("double arrays (centroid side) and mixed magnitudes") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 300).map { _ =>
      val n = 64
      (Array.fill(n)((rnd.nextDouble() - 0.5) * 2),
        Array.fill(n)((rnd.nextDouble() - 0.5) * 1e-8))
    }
    assertBitEqual(data.toDF("a", "b"))
  }

  test("float × double mixed element types") {
    val rnd = new scala.util.Random(11)
    val data = (1 to 200).map { _ =>
      (Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f),
        Array.fill(64)((rnd.nextDouble() - 0.5) * 2))
    }
    val df = data.toDF("a", "b")
    val rows = df.select(
      Similarity.decDot(col("a"), col("b")).as("native"),
      Similarity.decDotHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("adversarial scalars: zeros, ±0.0, denormals, exact powers of two") {
    val specials = Seq(
      Array(0.0f, -0.0f, 1.0f, -1.0f, 0.5f, 0.25f, 1.5f, Float.MinPositiveValue),
      Array(0.1f, 0.2f, 0.3f, 1e-7f, 1e5f, -1e-7f, 3.1415927f, 2.7182817f),
      Array.fill(8)(0.0f),
      Array.fill(8)(1.0f))
    val data = for (a <- specials; b <- specials) yield (a, b)
    assertBitEqual(data.toDF("a", "b"))
  }

  test("ANSI overflow: a term beyond DECIMAL(28,16) throws on BOTH paths") {
    // 1e7 * 1e7 = 1e14 needs 30 digits at scale 16 — out of range
    val df = Seq((Array(1e7f), Array(1e7f))).toDF("a", "b")
    intercept[Throwable](
      df.select(Similarity.decDotHof(col("a"), col("b"))).collect())
    intercept[Throwable](
      df.select(Similarity.decDot(col("a"), col("b"))).collect())
  }

  test("large-magnitude terms engage the BigInteger overflow path exactly") {
    // |x*y| ~ 1e3 → unscaled ~1e19 > Long.MaxValue: per-term BigInteger
    val data = Seq(
      (Array.fill(64)(1000.0), Array.fill(64)(1000.0)),
      (Array.fill(64)(-1000.0), Array.fill(64)(1000.0)),
      (Array(9.0e2, -9.0e2, 9.0e2), Array(1.0e3, 1.0e3, 1.0e3)))
    assertBitEqual(data.toDF("a", "b"))
  }

  test("null semantics: length mismatch and null elements poison to NULL") {
    val df = Seq(
      (Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(1f))),
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(2f)))
    ).toDF("a", "b")
    assertBitEqual(df)
    val out = df.select(Similarity.decDot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("NaN/Inf products poison to NULL on BOTH paths (ANSI casts them null)") {
    val df = Seq(
      (Array(1.0, Double.NaN), Array(1.0, 1.0)),
      (Array(Double.MaxValue, 1.0), Array(Double.MaxValue, 1.0)) // product = Inf
    ).toDF("a", "b")
    assertBitEqual(df)
    val out = df.select(Similarity.decDot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("whole-stage codegen and interpreted eval agree") {
    val rnd = new scala.util.Random(3)
    val data = (1 to 100).map(_ =>
      (Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = data.toDF("a", "b")
    val gen = df.select(Similarity.decDot(col("a"), col("b"))).collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(Similarity.decDot(col("a"), col("b"))).collect()
      gen.zip(interp).foreach { case (g, i) =>
        assert(java.lang.Double.doubleToRawLongBits(g.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(i.getDouble(0)))
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
