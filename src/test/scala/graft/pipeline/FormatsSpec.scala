package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** File-format surface beyond parquet/JSON/CSV: ORC roundtrip (built-in
  * columnar alternative; same writer/reader contract). */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ORC roundtrip preserves rows and schema") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/orders"
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == orders.schema)
    assert(back.count() == orders.count())
    assert(back.except(orders).count() == 0 && orders.except(back).count() == 0)
  }
}
