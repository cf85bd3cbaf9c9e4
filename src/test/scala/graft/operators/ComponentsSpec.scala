package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Connected components: chains must collapse to one group (the property
  * pairwise keep-min dedup gets wrong), disjoint pairs stay separate, and
  * the labeling is the component minimum for every member. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def starLabelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponentsStars(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to a single component labeled with its min id") {
    // 5-3-9-1-7: diameter 4, min label must travel the whole chain
    val labels = labelsOf(Seq((5L, 3L), (3L, 9L), (9L, 1L), (1L, 7L)))
    assert(labels == Map(5L -> 1L, 3L -> 1L, 9L -> 1L, 1L -> 1L, 7L -> 1L))
  }

  test("disjoint clusters keep distinct labels; duplicate edges are harmless") {
    val labels = labelsOf(Seq(
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 10L), // triangle + dup edges
      (20L, 21L),                                     // separate pair
      (31L, 30L)))                                    // reversed order pair
    assert(labels == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("star graph: all leaves adopt the hub's component minimum") {
    val leaves = (1L to 20L).filter(_ != 7L)
    val labels = labelsOf(leaves.map(l => (7L, l)))
    assert(labels.values.toSet == Set(1L))
    assert(labels.size == 20)
  }

  test("string node ids: chain collapses to the lexicographic minimum") {
    // non-numeric labels exercise the change-detection convergence probe
    // (no decimal sum exists for strings) — added for the ER use case
    val pairs = Seq(("delta", "bravo"), ("bravo", "echo"), ("echo", "alpha"),
      ("zulu", "yankee"))
    val labels = Components.connectedComponents(
      pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("delta" -> "alpha", "bravo" -> "alpha",
      "echo" -> "alpha", "alpha" -> "alpha",
      "zulu" -> "yankee", "yankee" -> "yankee"))
  }

  /** Local union-find ground truth: node -> min id of its component. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    nodes.map { n =>
      n -> nodes.filter(m => find(m) == find(n)).min
    }.toMap
  }

  test("random graph matches a local union-find reference") {
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(labelsOf(pairs) == unionFind(pairs))
  }

  test("large-star/small-star matches union-find on chains, stars, and random graphs") {
    val rnd = new scala.util.Random(29)
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      // a 41-node chain: diameter 40 would exceed propagation's default
      // round budget — the geometric contraction handles it in O(log^2 n)
      (0L until 40L).map(i => (i, i + 1)),
      (2L to 30L).map(l => (1L, l)),                           // hub star
      Seq.fill(250)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter { case (a, b) => a != b },                     // random
      Seq((5L, 9L)))                                           // single edge
    cases.foreach { pairs =>
      assert(starLabelsOf(pairs) == unionFind(pairs))
    }
  }

  test("self-loop-only nodes are labeled as their own component by both algorithms") {
    val pairs = Seq((7L, 7L), (1L, 2L))
    val expected = Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    assert(labelsOf(pairs) == expected)
    assert(starLabelsOf(pairs) == expected)
  }

  test("non-convergence within maxIters is an error, not a wrong answer") {
    // a 6-node path has diameter 5 > maxIters 2
    val pairs = (0L until 5L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(pairs, "a", "b", maxIters = 2)
    }
    assert(e.getMessage.contains("converge"))
  }
}
