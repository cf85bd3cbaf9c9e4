package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Similarity

class FloatCosineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("native expression equals the HOF formulation bit-for-bit") {
    FloatCosine.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0L).select("embedding")
      .first().getSeq[Float](0)
    val both = emb.select(
      FloatCosine(col("embedding"), typedLit(q)).as("native"),
      Similarity.cosineFast(col("embedding"), typedLit(q)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("registered for SQL and participates in codegen") {
    FloatCosine.register(spark)
    Tables.load(spark, dir, "embeddings").createOrReplaceTempView("emb_fc")
    val df = spark.sql(
      "SELECT vec_id, float_cosine(embedding, embedding) AS self FROM emb_fc")
    // self-cosine is exactly 1.0 up to fp rounding
    assert(df.filter(abs(col("self") - 1.0) > 1e-9).count() == 0)
    // the plan stays inside whole-stage codegen: the projection carrying
    // floatcosine renders with the codegen-stage marker `*(N)`. With AQE
    // in the plan (the Tables.load parallelize exchange makes it
    // adaptive), codegen stages only exist in the FINAL plan — execute
    // THIS df first so toString renders isFinalPlan=true.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project .*floatcosine".r.findFirstIn(plan).isDefined, plan)
  }

  test("type error on wrong input types names the function") {
    FloatCosine.register(spark)
    Tables.load(spark, dir, "documents").createOrReplaceTempView("docs_fc")
    val e = intercept[Exception] {
      spark.sql("SELECT float_cosine(text, text) FROM docs_fc").collect()
    }
    assert(e.getMessage.contains("float_cosine"))
  }
}
