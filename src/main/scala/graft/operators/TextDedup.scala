package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

import graft.functions.TextFunctions

/** Document deduplication operators, each designed as a distributed plan that
  * survives 100 TB: no driver-side collection, candidate generation always
  * goes through a key-equality shuffle join (shingle, band key, or hash-prefix
  * block) rather than an all-pairs cross join, so cost scales with bucket
  * sizes, not corpus².
  *
  * The reference's only dedup is exact-PK insert-if-absent
  * (gcs_to_postgres.py:153-177); these generalize it to content dedup for
  * LLM-pipeline workloads.
  */
object TextDedup {

  /** Exact dedup groups: one row per distinct content hash with the count of
    * copies and the id to keep (min). Survivors = `keep_id`s; a full dedup is
    * `df.withColumn("h", md5(col(textCol))).dropDuplicates("h")`. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** doc_id → exploded distinct word-n-gram shingles. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"), explode(col("shs")).as("sh"))

  /** N-gram Jaccard near-duplicate pairs (threshold as an exact rational
    * predicate `num*inter >= den*union`, so both engines decide ties
    * identically). Shuffle pattern: explode → join on shingle → count. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, thresholdNum: Int, thresholdDen: Int): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_cnt"))
    inter
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("union_cnt", col("n_a") + col("n_b") - col("inter_cnt"))
      .filter(col("inter_cnt") * thresholdDen >= col("union_cnt") * thresholdNum)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt").cast(LongType),
        round(col("inter_cnt").cast("double") / col("union_cnt"), 6).as("jaccard"))
  }

  /** MinHash signatures: for each (doc, seed) the lexicographic min of
    * md5(shingle ":" seed) — a deterministic hash family expressible
    * identically in any engine with md5. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.crossJoin(broadcast(
        spark_seeds(numHashes)))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("sh"), lit(":"), col("seed").cast("string")))).as("sig"))

  private def spark_seeds(n: Int) = {
    import org.apache.spark.sql.SparkSession
    val s = SparkSession.active
    s.range(n).select(col("id").cast(IntegerType).as("seed"))
  }

  /** LSH banding: band key = md5 of the ordered concat of the band's
    * signatures; candidate pairs are docs sharing any band key. Estimated
    * similarity = fraction of matching signature positions. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, shingleN)
    val sigs = minhashSignatures(sh, numHashes)
    val bands = sigs
      .groupBy(col("doc_id"), (col("seed") / rowsPerBand).cast(IntegerType).as("band"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("seed"), col("sig")))), s => s("sig")),
        ",")).as("bkey"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val eq = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("seed"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("seed"), col("sig").as("sig_b")),
        Seq("doc_b", "seed"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(when(col("sig_a") === col("sig_b"), 1).otherwise(0)).cast(LongType).as("n_equal"))
    eq.select(col("doc_a"), col("doc_b"), col("n_equal"),
      round(col("n_equal").cast("double") / numHashes, 6).as("est_sim"))
  }

  /** 32-bit SimHash: bit j is the sign of the count-weighted sum of
    * (2·b−1) over tokens, where b = high bit of hex digit j of md5(token).
    * Integer arithmetic only — bit-exact across engines. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val js = spark_seeds(32).withColumnRenamed("seed", "j")
    tok.crossJoin(broadcast(js))
      .withColumn("contrib",
        when(expr("substring(md5(tok), j + 1, 1)")
            .isInCollection(Seq("8", "9", "a", "b", "c", "d", "e", "f")),
          col("cnt")).otherwise(-col("cnt")))
      .groupBy("doc_id", "j").agg(sum(col("contrib")).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), j)")).otherwise(0L))
        .cast(LongType).as("simhash"))
  }

  /** SimHash near-dup pairs, blocked on the top byte of the hash (an LSH-style
    * prefix block: pairs differing in the top 8 bits are not candidates) so
    * the join is per-block, never corpus². */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    sh.as("a").join(sh.as("b"),
        expr("shiftright(a.simhash, 24) = shiftright(b.simhash, 24)")
          && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.simhash ^ b.simhash)").cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
  }
}
