package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AssignCellExpr (per-row prefilter+decimal argmax) must be bit-identical
  * to the relational formulation it replaced: corpus × broadcast(seeds),
  * decimal-exact cosineFromParts, max(struct(c, -cell)). The old
  * formulation is reconstructed here as the semantic reference. */
class AssignCellSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The replaced crossJoin+agg argmax, verbatim. */
  private def referenceAssign(corpus: org.apache.spark.sql.DataFrame,
                              seedSrc: org.apache.spark.sql.DataFrame,
                              nCells: Int): org.apache.spark.sql.DataFrame = {
    val seedDf = seedSrc.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("ce"),
        Similarity.decNorm2(col("embedding")).as("cn2"))
    corpus.select(col("vec_id"), col("embedding"),
        Similarity.decNorm2(col("embedding")).as("vn2"))
      .crossJoin(broadcast(seedDf))
      .groupBy(col("vec_id"))
      .agg(max(struct(
        Similarity.cosineFromParts(
          Similarity.decDot(col("embedding"), col("ce")),
          col("vn2"), col("cn2")).as("c"),
        (-col("cell")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).cast("int").as("cell"))
  }

  private def randCorpus(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("random corpora: expression argmax == relational argmax") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val corpus = randCorpus(200, 64, seed)
      val got = IvfIndex.assignSampled(corpus, "vec_id", "embedding", 16)
        .select("vec_id", "cell").as[(Long, Int)].collect().toMap
      val want = referenceAssign(corpus, corpus, 16)
        .as[(Long, Int)].collect().toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("duplicate centroids tie to the smallest cell") {
    val base = randCorpus(40, 8, 99L).as[(Long, Seq[Float])].collect()
    // make cells 3 and 11 identical: every vector equidistant ties 3
    val seeded = base.map { case (id, v) =>
      if (id == 11L) (id, base(3)._2) else (id, v)
    }.toSeq.toDF("vec_id", "embedding")
    val got = IvfIndex.assignSampled(seeded, "vec_id", "embedding", 16)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val want = referenceAssign(seeded, seeded, 16)
      .as[(Long, Int)].collect().toMap
    assert(got == want)
    assert(!got.values.exists(_ == 11), "cell 11 duplicates cell 3; ties must go low")
  }

  test("a vector equal to a centroid assigns to it") {
    val corpus = randCorpus(64, 16, 5L)
    val got = IvfIndex.assignSampled(corpus, "vec_id", "embedding", 8)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    for (c <- 0 until 8) assert(got(c.toLong) == c, s"seed vector $c")
  }

  test("near-tie margin robustness: perturbations at the 1e-7 scale") {
    // centroids engineered so two cells score within ~1e-7 of each other —
    // inside the 1e-6 prefilter margin, so BOTH must be decimal-reranked
    // and the exact order decides (the failure mode a too-small margin or
    // a fast-only argmax would get wrong)
    val dim = 32
    val c0 = Array.fill(dim)(0.1f)
    val c1 = c0.clone(); c1(0) = c0(0) + 1e-7f
    val probes = (0 until 50).map { i =>
      val v = c0.clone(); v(i % dim) = v(i % dim) + (i - 25) * 1e-8f
      ((i + 2).toLong, v.toSeq)
    }
    val rows = Seq((0L, c0.toSeq), (1L, c1.toSeq)) ++ probes
    val df = rows.toDF("vec_id", "embedding")
    val got = IvfIndex.assignSampled(df, "vec_id", "embedding", 2)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val want = referenceAssign(df, df, 2).as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("interpreted helper agrees with the codegen'd column path") {
    val corpus = randCorpus(50, 24, 11L)
    val seeds = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell"), col("embedding"),
        Similarity.decNorm2(col("embedding")).as("cn2"))
      .orderBy("cell").collect()
    val cents = seeds.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val cn2s = seeds.map(_.getDouble(2))
    val viaDf = IvfIndex.assignSampled(corpus, "vec_id", "embedding", 4)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    corpus.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val v = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Float](1).toArray)
      val cell = graft.functions.AssignCell.assign(v, true, cents, cn2s, 1e-6)
      assert(cell != null && cell.intValue() == viaDf(r.getLong(0)))
    }
  }
}
