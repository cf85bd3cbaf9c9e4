package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Degree-oriented triangle census against hand-countable graphs. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def census(edges: Seq[(Long, Long)]) = {
    val df = spark.createDataFrame(edges).toDF("u", "v")
    Triangles.census(df, "u", "v").collect().head
  }

  test("K4: 4 triangles, cc = 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = census(k4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 12) // 4 nodes * C(3,2)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Double]("global_cc") == 1.0)
  }

  test("path graph: 0 triangles, wedges > 0") {
    val r = census(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("n_wedges") == 2)
    assert(r.getAs[Double]("global_cc") == 0.0)
  }

  test("triangle with a pendant: the skewed-hub orientation still counts once") {
    // star hub 1 with leaves 2..5 plus the closing edge 2-3: exactly one
    // triangle {1,2,3}; hub degree 4 dominates, so orientation flips edges
    // toward the hub — the count must not care
    val r = census(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L)))
    assert(r.getAs[Long]("n_triangles") == 1)
    assert(r.getAs[Long]("n_edges") == 5)
  }
}
