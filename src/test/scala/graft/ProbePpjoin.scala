package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Scratch diagnostic for the round-12 scale gate: d_ppjoin_capped filled
  * the disk at sf3. Prints the derived cap and the candidate-pair volume
  * Σ_sh C(df,2) (df ≤ cap) per SF dir — the number that decides whether
  * the blow-up is candidate-count growth or something downstream.
  * Usage: sbt "Test/runMain graft.ProbePpjoin /tmp/sf1 /tmp/sf3" */
object ProbePpjoin {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(32, "probe-ppjoin")
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val d = Tables.load(spark, dir, "documents")
      val prefix = TextDedup.ppjoinPrefix(d, "doc_id", "text", 3, 3, 10)
        .localCheckpoint(true)
      val cap = TextDedup.derivePrefixDfCapExactFrom(prefix)
      val freq = prefix.groupBy("sh").agg(count(lit(1)).as("f"))
      val stats = freq.agg(
        count(lit(1)).as("keys"),
        max(col("f")).as("max_df"),
        sum(when(col("f") <= cap, (col("f") * (col("f") - 1) / 2)
          .cast("long")).otherwise(lit(0L))).as("cand_pairs"),
        sum(when(col("f") > cap, lit(1L)).otherwise(lit(0L)))
          .as("excluded_keys"))
        .first()
      println(s"[ppjoin] $dir cap=$cap keys=${stats.getLong(0)} " +
        s"max_df=${stats.getLong(1)} cand_pairs=${stats.getLong(2)} " +
        s"excluded=${stats.getLong(3)}")
    }
    spark.stop()
  }
}
