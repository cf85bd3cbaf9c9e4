package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Two layers:
  *  - `cosineParts`/`knnBrute`: exact brute-force — explode to (id, i, x),
  *    join on position, exact DECIMAL(28,16) accumulation of the per-position
  *    products so the dot product is bit-identical regardless of partition
  *    order (the oracle-determinism contract, see Core.scala).
  *  - `signBlock`/`knnLsh`/`nearDupPairs`: the 100 TB scale path — a
  *    random-hyperplane-style LSH using the coordinate hyperplanes of the
  *    first `nBits` dimensions. Candidates must share the query's sign block,
  *    turning corpus-wide scans into one bucket's worth of exact work. The
  *    blocking key is a plain string column, so at scale it partitions,
  *    bucket-joins, and prunes like any other key.
  *
  * Fast non-oracle scoring (plain double accumulation, codegen'd, single
  * pass, no explode) is `cosineFast` — use it in throughput paths where
  * cross-engine bit-equality is not required.
  */
object Similarity {

  /** Exact per-vector squared-norm + dot-with-query components. Input must
    * have columns (id, i, x) and (i, qv). */
  private def accum(parts: DataFrame, qparts: DataFrame): DataFrame =
    parts.join(qparts, "i")
      .groupBy("id")
      .agg(
        sum((col("x").cast("double") * col("qv").cast("double")).cast(DecimalType(28, 16)))
          .cast("double").as("dot"),
        sum((col("x").cast("double") * col("x").cast("double")).cast(DecimalType(28, 16)))
          .cast("double").as("norm2"))

  private def explodeVec(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "x")))

  /** Exact top-k nearest neighbours of `queryId`'s embedding by cosine. */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String,
               queryId: Long, k: Int): DataFrame = {
    val parts = explodeVec(emb, idCol, vecCol)
    val qparts = explodeVec(emb.filter(col(idCol) === queryId), idCol, vecCol)
      .select(col("i"), col("x").as("qv"))
    val qnorm = qparts
      .agg(sum((col("qv").cast("double") * col("qv").cast("double")).cast(DecimalType(28, 16)))
        .cast("double").as("qnorm2"))
    accum(parts, qparts)
      .crossJoin(broadcast(qnorm))
      .filter(col("id") =!= queryId)
      .select(col("id").as("vec_id"),
        (col("dot") / (sqrt(col("norm2")) * sqrt(col("qnorm2")))).as("c_raw"))
      // order by the unrounded value (like the oracle) so the k-boundary
      // cannot differ between engines; round only for output.
      .orderBy(col("c_raw").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), round(col("c_raw"), 6).as("cosine"))
  }

  /** Sign-block LSH key over the first nBits dimensions: '1'/'0' per sign. */
  def signBlock(vec: Column, nBits: Int): Column =
    concat((1 to nBits).map(i =>
      when(element_at(vec, i) >= 0f, "1").otherwise("0")): _*)

  /** LSH-pruned top-k: only vectors in the query's sign block are scored.
    * Same exact arithmetic as knnBrute, ~2^nBits× less of it. */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
             queryId: Long, k: Int, nBits: Int): DataFrame = {
    val blocked = emb.withColumn("block", signBlock(col(vecCol), nBits))
    val qblock = blocked.filter(col(idCol) === queryId)
      .select(col("block").as("qb"))
    val cands = blocked.crossJoin(broadcast(qblock))
      .filter(col("block") === col("qb")).drop("block", "qb")
    knnBrute(cands, idCol, vecCol, queryId, k)
  }

  /** Embedding near-duplicate pairs within sign blocks: cosine >= threshold.
    * The threshold compares the deterministic double, so both engines agree. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   nBits: Int, minCosine: Double): DataFrame = {
    val blocked = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBlock(col(vecCol), nBits).as("block"))
    val pairs = blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("va"), col("b.id").as("vb"),
        col("a.v").as("av"), col("b.v").as("bv"))
      .select(col("va"), col("vb"),
        posexplode(arrays_zip(col("av"), col("bv"))).as(Seq("i", "xy")))
      .select(col("va"), col("vb"),
        col("xy")("av").cast("double").as("x"), col("xy")("bv").cast("double").as("y"))
    pairs
      .groupBy("va", "vb")
      .agg(
        sum((col("x") * col("y")).cast(DecimalType(28, 16))).cast("double").as("dot"),
        sum((col("x") * col("x")).cast(DecimalType(28, 16))).cast("double").as("na"),
        sum((col("y") * col("y")).cast(DecimalType(28, 16))).cast("double").as("nb"))
      .withColumn("cosine", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .filter(col("cosine") >= minCosine)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Plain double cosine — single-pass, codegen'd, for throughput paths. */
  def cosineFast(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(na) * sqrt(nb))
  }
}
