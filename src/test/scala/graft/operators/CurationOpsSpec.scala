package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Mathematical invariants for the round-10 curation/graph operators,
  * independent of the DuckDB oracle (which proves cross-engine hash
  * equality but not that the math is RIGHT): PCA against a plain-double
  * reimplementation, ABTT's exact-zero projection-sum identity, PPR's
  * component confinement and its all-seeds ≡ PageRank equivalence, HITS
  * normalization/bipartite invariants, MMR's greedy-selection contract,
  * and DSIR's directional selection pressure.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("v_pca matches an independent plain-double power iteration") {
    // recompute mean/covariance/4 power rounds in straight Scala doubles —
    // different accumulation order and no decimal casts, so agreement to
    // 1e-6 is evidence the relational chain computes the right matrix,
    // not just a self-consistent one
    val embs = graft.Tables.load(spark, dir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = embs.length; val d = embs.head.length
    val mean = Array.tabulate(d)(j => embs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      embs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum)
    var v = Array.fill(d)(1.0)
    var nrm = 0.0
    for (_ <- 1 to 4) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      nrm = w.map(math.abs).max
      v = w.map(_ / nrm)
    }
    val got = q("v_pca").orderBy("i").collect()
    assert(got.length == d)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(math.abs(r.getDouble(1) - v(k)) < 1e-6,
        s"loading $k: ${r.getDouble(1)} vs ${v(k)}")
    }
    assert(math.abs(got.head.getDouble(2) - nrm) / nrm < 1e-6)
  }

  test("v_abtt: projections sum to ~0 (mean removed) and residuals are valid") {
    val rows = q("v_abtt").collect()
    // Σ_docs (x−m)·v = v·Σ(x−m) = 0 exactly before rounding; 6-dp rounding
    // over n rows bounds the drift
    val dotSum = rows.map(_.getDouble(1)).sum
    assert(math.abs(dotSum) < rows.length * 1e-6 * 2)
    // residual norm² = |cx|² − dot²/|v|² ∈ [0, |cx|²]
    rows.foreach(r => assert(r.getDouble(2) >= -1e-6))
  }

  test("personalized PageRank confines mass to the seed component") {
    // two disconnected symmetric components; seeds only in the first →
    // the second holds exactly 0 rank at every round (no teleport, no
    // in-flow), while every seed-component node is strictly positive
    val c1 = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val c2 = Seq("x" -> "y", "y" -> "x")
    val ranks = PageRank.runPersonalized((c1 ++ c2).toDF("src", "dst"),
        "src", "dst", Seq("a").toDF("node"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("x") == 0.0 && ranks("y") == 0.0)
    assert(Seq("a", "b", "c").forall(ranks(_) > 0.0))
  }

  test("personalized PageRank with ALL nodes seeded equals plain PageRank") {
    // e(v)=1 everywhere makes the update law identical term-for-term, so
    // the two entry points must agree BIT-FOR-BIT, not just approximately
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    val edges = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    val allNodes = Seq("a", "b", "c").toDF("node")
    val ppr = PageRank.runPersonalized(edges, "src", "dst", allNodes, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pr = PageRank.run(edges, "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ppr == pr)
  }

  test("g_hits: max-normalized scores in (0,1], sides respect bipartiteness") {
    val rows = q("g_hits").collect()
    val (hubs, auths) = rows.partition(_.getString(1) == "hub")
    assert(hubs.nonEmpty && auths.nonEmpty)
    // longEdges encoding: suppliers even, parts odd
    hubs.foreach(r => assert(r.getLong(0) % 2 == 0))
    auths.foreach(r => assert(r.getLong(0) % 2 == 1))
    Seq(hubs, auths).foreach { side =>
      val scores = side.map(_.getDouble(2))
      assert(scores.max == 1.0) // inf-norm normalization pins the max
      scores.foreach(sc => assert(sc > 0.0 && sc <= 1.0))
    }
  }

  test("v_mmr: greedy contract — distinct picks, first pick = top relevance") {
    val picks = q("v_mmr").orderBy("step").collect()
    assert(picks.length == 8)
    assert(picks.map(_.getLong(1)).distinct.length == 8)
    // step 1 maximizes pure relevance (empty redundancy set)
    val rel1 = picks.head.getDouble(2)
    picks.foreach(r => assert(r.getDouble(2) <= rel1 + 1e-9))
    // and equals the brute-force top-1
    val top1 = q("v_knn_brute").orderBy(desc("cosine")).first()
    assert(picks.head.getLong(1) == top1.getLong(0))
  }

  test("t_dsir: sign test matches score, and target-language docs score higher") {
    val out = q("t_dsir")
    val rows = out.collect()
    rows.foreach { r =>
      val score = r.getDouble(4); val sel = r.getInt(5)
      assert((score > 0) == (sel == 1))
    }
    // directional pressure: mean score of en (target) docs must exceed the
    // mean over the rest — the whole point of importance reweighting
    val withLang = out.join(
      graft.Tables.load(spark, dir, "documents").select("doc_id", "lang"),
      "doc_id")
    val en = withLang.filter(col("lang") === "en")
      .agg(avg("score")).first().getDouble(0)
    val rest = withLang.filter(col("lang") =!= "en")
      .agg(avg("score")).first().getDouble(0)
    assert(en > rest)
  }
}
