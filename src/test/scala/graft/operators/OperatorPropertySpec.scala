package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-based invariants for the round-5 operators, against
  * independent in-memory reference implementations:
  *  - SpaceSaving: published guarantees hold for ANY stream and ANY
  *    partition split / merge order (pure sketch ops — no Spark jobs, so
  *    hundreds of cases are cheap);
  *  - PageRank: agrees with a naive dense reference on random symmetric
  *    graphs; teleport floor and mass conservation hold;
  *  - ZOrder: the shift/mask spreading equals a per-bit reference
  *    interleave for the full 16-bit domain sample;
  *  - applyCdc: equals an in-memory fold of the change log (the
  *    executable spec of CDC semantics). */
class OperatorPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, n: Int = 60)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: $res")
  }

  // ---- SpaceSaving: pure sketch-level properties -------------------------

  test("SpaceSaving guarantees hold under any split and merge order") {
    val genStream = for {
      nKinds <- Gen.choose(1, 40)
      items <- Gen.listOfN(300, Gen.choose(0, nKinds - 1).map(i => s"i$i"))
    } yield items
    check("space-saving", n = 100)(Prop.forAll(genStream, Gen.choose(2, 12),
      Gen.choose(1, 6)) { (items, k, splits) =>
      val agg = new graft.functions.SpaceSaving(k)
      val chunks = items.grouped(math.max(1, items.size / splits)).toList
      val parts = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.reduceLeft(agg.merge)
      val truth = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      val out = agg.finish(merged).map { case (i, c, e) => i -> (c, e) }.toMap
      val nTotal = items.size.toLong
      val heavyPresent = truth.forall { case (i, c) =>
        c <= nTotal / k || out.contains(i) }
      val boundsHold = out.forall { case (i, (est, err)) =>
        val t = truth.getOrElse(i, 0L); t <= est && est - err <= t }
      heavyPresent && boundsHold && out.size <= k
    })
  }

  // ---- PageRank vs naive dense reference ---------------------------------

  private def naivePageRank(edges: Seq[(String, String)], iters: Int)
      : Map[String, Double] = {
    val out = edges.groupBy(_._1)
    val deg = out.map { case (s, es) => s -> es.size }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var r = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2)
      r = nodes.map { n =>
        val s = in.getOrElse(n, Nil)
          .map { case (src, _) => r(src) / deg(src) }.sum
        n -> ((1.0 - 0.85) + 0.85 * s)
      }.toMap
    }
    r
  }

  test("PageRank agrees with the dense reference on random symmetric graphs") {
    val genGraph = for {
      n <- Gen.choose(3, 12)
      m <- Gen.choose(n - 1, n * 2)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (s"n$a", s"n$b"))
      if es.nonEmpty
    } yield es.distinct
    check("pagerank", n = 8)(Prop.forAll(genGraph) { base =>
      val edges = (base ++ base.map(_.swap)).distinct
      val got = PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters = 3)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = naivePageRank(edges, 3)
      val floor = 1.0 - 0.85
      got.keySet == want.keySet &&
        got.forall { case (k, v) =>
          v >= floor - 1e-12 && math.abs(v - want(k)) < 1e-9 } &&
        math.abs(got.values.sum - got.size) < 1e-9 // symmetric: mass = n
    })
  }

  // ---- ZOrder vs per-bit reference ---------------------------------------

  test("ZOrder spreading equals per-bit reference interleave") {
    def refZ(a: Int, b: Int): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val pairs = (0 until 1000).map { i =>
      val a = (i * 40503) & 0xFFFF; val b = (i * 2654435761L).toInt & 0xFFFF
      (a, b)
    } ++ Seq((0, 0), (0xFFFF, 0xFFFF), (0xFFFF, 0), (0, 0xFFFF), (1, 0x8000))
    val got = pairs.toDF("a", "b")
      .select(graft.functions.ZOrder.zValue(col("a"), col("b")))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z == refZ(a, b), s"z($a,$b): got $z want ${refZ(a, b)}")
    }
  }

  // ---- applyCdc vs in-memory fold ----------------------------------------

  test("applyCdc equals the in-memory change-log fold") {
    val genOps = Gen.listOfN(12, for {
      op <- Gen.oneOf("I", "U", "D")
      key <- Gen.choose(0, 4).map(i => s"r$i")
      v <- Gen.choose(0, 99)
    } yield (op, key, s"v$v"))
    check("cdc-fold", n = 6)(Prop.forAll(genOps) { ops =>
      val t = s"cdc_prop_${math.abs(ops.hashCode)}"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (run_id STRING, state STRING) USING parquet")
      try {
        Seq(("r0", "init0"), ("r1", "init1")).toDF("run_id", "state")
          .write.mode("append").insertInto(t)
        val withSeq = ops.zipWithIndex
          .map { case ((op, k, v), i) => (op, i.toLong, k, v) }
        graft.pipeline.Loader.applyCdc(spark,
          withSeq.toDF("op", "seq", "run_id", "state"), t, Seq("run_id"))
        val got = spark.table(t).collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        // reference: latest op per key decides; non-D latest upserts its
        // payload, D latest deletes; untouched keys keep the snapshot row
        val latest = withSeq.groupBy(_._3)
          .map { case (k, xs) => k -> xs.maxBy(_._2) }
        val want = (Map("r0" -> "init0", "r1" -> "init1") -- latest.keys) ++
          latest.collect { case (k, (op, _, _, v)) if op != "D" => k -> v }
        got == want
      } finally spark.sql(s"DROP TABLE IF EXISTS $t")
    })
  }
}
