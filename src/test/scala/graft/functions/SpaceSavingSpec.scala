package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Space-Saving guarantees from Metwally et al. ICDT'05, exercised through
  * the real distributed aggregation path (multiple partitions → merge):
  *  - exact regime (k >= distinct): output equals groupBy counts, err = 0;
  *  - eviction regime: every item with true freq > n/k is reported, and
  *    est - err <= true <= est for all reported items. */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int,
                     parts: Int = 4): Seq[(String, Long, Long)] =
    items.toDF("item").repartition(parts)
      .agg(SpaceSaving.topK(k)(col("item")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h._1"), col("h._2"), col("h._3"))
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime: k >= distinct items reproduces groupBy counts with err 0") {
    val items = Seq.fill(30)("a") ++ Seq.fill(12)("b") ++ Seq.fill(5)("c") ++
      Seq("d")
    val got = sketch(items, k = 16).map { case (i, c, e) => i -> (c, e) }.toMap
    assert(got == Map("a" -> (30L, 0L), "b" -> (12L, 0L),
      "c" -> (5L, 0L), "d" -> (1L, 0L)))
  }

  test("eviction regime: freq > n/k items always survive; bounds hold") {
    // 2 heavy items among a long tail of singletons, k far below distinct
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(250)("hot2")
    val tail = (1 to 300).map(i => s"t$i")
    val items = scala.util.Random.shuffle(heavy ++ tail) // seedless: property, not value
    val n = items.size
    val k = 16
    val truth = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val got = sketch(items, k)
    assert(got.size <= k)
    val reported = got.map(_._1).toSet
    // guarantee 1: anything above n/k must be present
    truth.filter { case (_, c) => c > n.toLong / k }.keys
      .foreach(i => assert(reported.contains(i), s"heavy item $i missing"))
    // guarantee 2: est is an overestimate bounded by est - err
    got.foreach { case (i, est, err) =>
      val t = truth.getOrElse(i, 0L)
      assert(t <= est, s"$i: true $t > est $est")
      assert(est - err <= t, s"$i: est-err ${est - err} > true $t")
    }
    // the two hot items' estimates are near-exact (their counters never evict)
    val asMap = got.map { case (i, c, e) => i -> (c, e) }.toMap
    assert(asMap("hot1")._1 >= 400L && asMap("hot2")._1 >= 250L)
  }

  test("merge of disjoint under-filled sketches is the exact union") {
    // each partition sees a disjoint key range; with k >= total distinct the
    // merge path must sum without introducing error
    val items = (1 to 8).flatMap(p => Seq.fill(p * 3)(s"p$p"))
    val got = sketch(items, k = 16, parts = 8)
      .map { case (i, c, e) => i -> (c, e) }.toMap
    (1 to 8).foreach(p => assert(got(s"p$p") == (p * 3L, 0L)))
  }
}
