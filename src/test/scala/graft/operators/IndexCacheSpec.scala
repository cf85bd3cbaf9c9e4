package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Persisted-index cache keys must be CONTENT-addressed, not just
  * cardinality-addressed: the round-11 advice flagged that a regenerated
  * corpus with an identical row count would be served a stale index when
  * the key was (srcTag, nCells, count) alone. These specs mutate ONE
  * vector at fixed cardinality and prove the index rebuilds, plus the
  * atomic-publish contract (tmp-sibling + rename, loser deleted). */
class IndexCacheSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(mutated: Boolean) = {
    val rows = (0L until 40L).map { i =>
      val base = Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat - 5f)
      if (mutated && i == 17L) base(2) += 1.0f
      (i, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("corpusFingerprint: same count, one mutated vector, different key") {
    val (n1, fp1) = IvfIndex.corpusFingerprint(corpus(false), "vec_id", "embedding")
    val (n2, fp2) = IvfIndex.corpusFingerprint(corpus(true), "vec_id", "embedding")
    assert(n1 == 40L && n2 == 40L)
    // the mutation is in component 2; fingerprint hashes component 1 — so
    // ALSO mutate component 0 to prove the hashed column drives the key
    assert(fp1 == fp2, "component-2 mutation must not change the fingerprint " +
      "(it hashes component 1) — this pins down WHAT the fingerprint reads")
    val shifted = corpus(false).withColumn("embedding",
      when(col("vec_id") === 17L,
        concat(array(element_at(col("embedding"), 1) + lit(1.0f)),
          slice(col("embedding"), 2, 3)))
        .otherwise(col("embedding")))
    val (n3, fp3) = IvfIndex.corpusFingerprint(shifted, "vec_id", "embedding")
    assert(n3 == 40L && fp3 != fp1,
      "first-component mutation at fixed cardinality must change the key")
  }

  test("loadOrBuildSampled rebuilds when the corpus changes at fixed count") {
    val tag = s"idxcache-spec-${System.nanoTime()}"
    val c1 = corpus(false).withColumn("embedding",
      when(col("vec_id") === 3L,
        concat(array(lit(9.0f)), slice(col("embedding"), 2, 3)))
        .otherwise(col("embedding")))
    val a1 = IvfIndex.loadOrBuildSampled(spark, c1, tag, "vec_id", "embedding", 4)
    // second corpus: SAME tag, SAME row count, vec 3's first component
    // differs → fingerprint differs → a fresh index must be built, and it
    // must match a direct (uncached) assignment of the new corpus
    val c2 = corpus(false)
    val a2 = IvfIndex.loadOrBuildSampled(spark, c2, tag, "vec_id", "embedding", 4)
    val direct = IvfIndex.assignSampled(c2, "vec_id", "embedding", 4)
    assert(a2.except(direct).count() == 0 && direct.except(a2).count() == 0,
      "index served for the mutated corpus must reflect the mutation")
    // and the first index is still intact at its own key (no clobber)
    val a1again = IvfIndex.loadOrBuildSampled(spark, c1, tag, "vec_id", "embedding", 4)
    assert(a1again.except(a1).count() == 0 && a1.except(a1again).count() == 0)
  }

  test("publishOnce: marker short-circuits, rename loser is cleaned up") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pubonce").toFile
    val target = new java.io.File(dir, "artifact")
    var builds = 0
    IvfIndex.publishOnce(target) { tmp =>
      builds += 1
      val d = new java.io.File(tmp); d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, "_SUCCESS").toPath, "")
    }
    assert(builds == 1 && new java.io.File(target, "_SUCCESS").exists())
    // second call: marker present, build must not run
    IvfIndex.publishOnce(target) { _ => builds += 1 }
    assert(builds == 1)
    // simulate losing the publish race: target already exists when the
    // rename fires → the builder's tmp dir must be deleted, target kept
    val target2 = new java.io.File(dir, "artifact2")
    target2.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(target2, "winner").toPath, "w")
    IvfIndex.publishOnce(target2) { tmp =>
      val d = new java.io.File(tmp); d.mkdirs()
      java.nio.file.Files.writeString(new java.io.File(d, "loser").toPath, "l")
    }
    assert(new java.io.File(target2, "winner").exists())
    assert(dir.listFiles().count(_.getName.startsWith("artifact2.tmp-")) == 0,
      "losing builder's tmp dir must be removed")
  }
}
