package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the runtime-filter pattern that makes
  * selective joins viable at 100 TB: instead of shuffling the entire big
  * side into the join, a compact bloom sketch of the small side's keys is
  * built first and applied as a codegen'd scan-side predicate, so only
  * probable matches reach the shuffle. An exact semi join afterwards removes
  * the bloom's false positives, so the result is IDENTICAL to the plain semi
  * join (false negatives are impossible by construction) — which is exactly
  * what lets the DuckDB oracle check the optimized plan against the naive
  * semantics.
  *
  * This is the same mechanism as Spark's own runtime row-level filters
  * (spark.sql.optimizer.runtime.bloomFilter.*), exposed as an explicit
  * operator: the engine's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (both codegen-capable) over
  * xxhash64 of the key, not a Scala UDF.
  *
  * The sketch travels to the driver as a single scalar row (KB-to-MB scale,
  * bounded by numBits — the same payload a broadcast would carry) and is
  * embedded as a literal, because `BloomFilterMightContain` requires its
  * bloom input to be a constant or scalar subquery.
  */
object BloomPrune {

  private def register(df: DataFrame): Unit = {
    val reg = df.sparkSession.sessionState.functionRegistry
    // seed 42 = XxHash64's default, the one Spark's own runtime filters use
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      (args: Seq[Expression]) =>
        new BloomFilterAggregate(XxHash64(Seq(args.head), 42L), args(1), args(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      (args: Seq[Expression]) =>
        BloomFilterMightContain(args.head, XxHash64(Seq(args(1)), 42L)),
      "built-in")
  }

  /** Build the bloom sketch of `keys.keyCol` (distributed aggregate; one
    * scalar row to the driver, like a watermark read). */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedItems: Long, numBits: Long): Array[Byte] =
    buildBloomKey(keys, col(keyCol), expectedItems, numBits)

  /** Column-expression variant — e.g. `xxhash64(pk1, pk2)` to sketch a
    * composite key. Probe with the SAME expression. Returns null over an
    * empty keys side (BloomFilterAggregate of zero rows) — callers branch
    * to the unpruned plan. */
  def buildBloomKey(keys: DataFrame, key: Column,
                    expectedItems: Long, numBits: Long): Array[Byte] = {
    register(keys)
    keys.select(call_function("graft_bloom_agg", key,
        lit(expectedItems), lit(numBits)).as("bf"))
      .first().getAs[Array[Byte]](0)
  }

  /** Scan-side membership predicate over the embedded sketch. */
  def mightContain(df: DataFrame, bloom: Array[Byte], key: Column): Column = {
    register(df)
    call_function("graft_bloom_contains", lit(bloom), key)
  }

  /** Semi join of `big` against `keys`, bloom-pruned before the shuffle;
    * result rows are exactly `big semi-join keys` (the exact join clears
    * false positives). The keys side is renamed onto `bigKey` and joined
    * by using-column, so same-named key columns (`bigKey == keyCol`) stay
    * unambiguous. */
  def prunedSemiJoin(big: DataFrame, keys: DataFrame,
                     bigKey: String, keyCol: String,
                     expectedItems: Long = 1000000L,
                     numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(keys, keyCol, expectedItems, numBits)
    big.filter(mightContain(big, bloom, col(bigKey)))
      .join(keys.select(col(keyCol).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
