package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end recall of the fuzzy-dedup pipeline on planted near-duplicates:
  * generate a corpus, plant mutated copies at known similarity levels, and
  * assert MinHash-LSH banding surfaces them and SimHash keeps them close.
  * (The oracle checks prove determinism; this proves the operators detect
  * what they exist to detect.) */
class DedupRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("data", "spark", "query", "join", "scan", "merge",
    "sort", "filter", "table", "column", "row", "batch", "stream", "window",
    "hash", "key", "value", "order", "group", "agg")

  /** base docs + near-dup copies with `mutations` token replacements */
  private def corpus(nBase: Int, nDup: Int, docLen: Int, mutations: Int) = {
    val rnd = new Random(7)
    val base = (0 until nBase).map { i =>
      (i.toLong, Seq.fill(docLen)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (0 until nDup).map { j =>
      val (srcId, text) = base(rnd.nextInt(nBase))
      val toks = text.split(" ").toBuffer
      (0 until mutations).foreach { _ =>
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      }
      (1000L + j, toks.mkString(" "), srcId)
    }
    val docs = (base.map { case (id, t) => (id, t) } ++
      dups.map { case (id, t, _) => (id, t) }).toDF("doc_id", "text")
    val planted = dups.map { case (id, _, src) =>
      (math.min(id, src), math.max(id, src))
    }.toSet
    (docs, planted)
  }

  test("MinHash-LSH banding recalls >=80% of planted near-dups (2 mutations in 40 tokens)") {
    val (docs, planted) = corpus(nBase = 60, nDup = 20, docLen = 40, mutations = 2)
    val found = TextDedup.minhashLshPairs(docs, "doc_id", "text", 3, 15, 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall; found ${found.size} pairs")
  }

  test("incremental LSH matching finds planted batch-vs-corpus near-dups with correct best match") {
    val (base, _) = corpus(nBase = 50, nDup = 0, docLen = 40, mutations = 0)
    // batch = 15 lightly-mutated copies of known corpus docs + 10 novel docs
    val rnd = new Random(41)
    val dupRows = (0 until 15).map { j =>
      val src = base.collect()(j * 3)
      val toks = src.getString(1).split(" ").toBuffer
      toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      (2000L + j, toks.mkString(" "), src.getLong(0))
    }
    val novel = (0 until 10).map { j =>
      (3000L + j, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val spark2 = spark; import spark2.implicits._
    val batch = (dupRows.map(t => (t._1, t._2)) ++ novel).toDF("doc_id", "text")
    val got = TextDedup.incrementalLshMatches(base, batch,
        "doc_id", "text", 3, 15, 3, minEqual = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = dupRows.map(t => t._1 -> t._3).toMap
    val hit = expected.count { case (b, src) => got.get(b).contains(src) }
    assert(hit >= 12, s"only $hit/15 planted dups matched to their source: $got")
    // novel docs may band-collide by chance but must not pass the 9/15 bar
    assert(novel.map(_._1).count(got.contains) == 0,
      s"novel docs spuriously matched: $got")
  }

  test("exact copies always collide in every band and have identical simhash") {
    val (docs, _) = corpus(nBase = 30, nDup = 0, docLen = 30, mutations = 0)
    val copies = docs.withColumn("doc_id", col("doc_id") + 500L)
    val both = docs.unionByName(copies)
    val pairs = TextDedup.minhashLshPairs(both, "doc_id", "text", 3, 15, 3)
      .filter(col("doc_b") === col("doc_a") + 500L)
    assert(pairs.count() == 30, "every exact copy must be a candidate")
    assert(pairs.filter(col("n_equal") =!= 15).count() == 0,
      "exact copies agree on all 15 signatures")
    val sh = TextDedup.simhash(both, "doc_id", "text")
    val joined = sh.as("a").join(sh.as("b"),
      col("b.doc_id") === col("a.doc_id") + 500L)
    assert(joined.filter(col("a.simhash") =!= col("b.simhash")).count() == 0)
  }

  test("stop-shingle doc-frequency cap preserves pairs and exact Jaccard scores") {
    val (docs, planted) = corpus(nBase = 60, nDup = 20, docLen = 40, mutations = 2)
    def pairs(cap: Int) =
      TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 3, 10, maxShingleDf = cap)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cap = 3
    // the cap must actually bind on this corpus, or the test proves nothing
    val maxDf = TextDedup.shingleTable(docs, "doc_id", "text", 3)
      .groupBy("sh").count().agg(max("count")).first().getLong(0)
    assert(maxDf > cap, s"corpus max shingle df $maxDf does not exceed cap $cap")
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(cap)
    assert(capped == uncapped,
      s"capped run changed results: only-capped=${capped -- uncapped} only-uncapped=${uncapped -- capped}")
    val found = capped.map(p => (p._1, p._2))
    assert(planted.count(found.contains).toDouble / planted.size >= 0.9)
  }

  test("unrelated random docs produce few false-positive candidates") {
    val (docs, _) = corpus(nBase = 100, nDup = 0, docLen = 40, mutations = 0)
    val pairs = TextDedup.minhashLshPairs(docs, "doc_id", "text", 3, 15, 3).count()
    assert(pairs <= 20, s"expected near-zero false candidates, got $pairs")
  }
}
