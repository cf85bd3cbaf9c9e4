package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product quantization ANN (Jégou, Douze, Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split each vector into `m`
  * subvectors, quantize each against a per-subspace codebook, answer
  * queries with asymmetric distance computation (ADC) — the query stays
  * exact, every corpus vector costs one m-byte code lookup. The fourth
  * member of the ANN family (brute / sign-LSH / IVF / PQ): where IVF
  * prunes WHICH vectors are scored, PQ compresses HOW each is scored —
  * production systems compose them (IVF-PQ).
  *
  * Codebooks here are SAMPLED (codewords = sub-slices of the first
  * `nCodes` corpus rows — the same deterministic Faiss-niter=0
  * construction as IvfIndex.knnSampled), so every stage is relational and
  * the driver's SQL oracle replays encode, LUT, and ADC bit-for-bit.
  *
  * Scale shape: encoding is corpus×(m·nCodes broadcast rows) with
  * map-side-combined argmin — the code table (m small ints per vector) is
  * the only corpus-sized artifact, ~dim·4/m× smaller than the embeddings;
  * the ADC LUT is m·nCodes rows broadcast; the estimate is one
  * key-equality join + per-vector decimal sum. Nothing shuffles at
  * embedding width.
  */
object PqIndex {

  private val dec = DecimalType(28, 16)

  /** Exact decimal sum of squared per-position differences (squared L2) —
    * associative-exact like Similarity's decDot, so the oracle's
    * unnest+group sum matches bit for bit. */
  private def decL2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        (d * d).cast(dec)
      }),
      lit(java.math.BigDecimal.ZERO).cast(dec),
      (acc, v) => (acc + v).cast(dec))
      .cast("double")

  /** Top-k by ADC-estimated squared L2 (ascending; ties → smaller id).
    * `m` subspaces × `nCodes` codewords; embedding length must divide
    * evenly by `m`. */
  def knnPq(emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
            k: Int, m: Int, nCodes: Int): DataFrame = {
    val queryRows = emb.filter(col(idCol) === queryId).select(col(vecCol)).take(1)
    require(queryRows.nonEmpty, s"query vector not found: $idCol = $queryId")
    val query: Seq[Float] = queryRows.head.getSeq[Float](0)
    require(query.length % m == 0,
      s"dim ${query.length} not divisible by m=$m")
    val subDim = query.length / m
    def slices(df: DataFrame, idAs: String): DataFrame =
      df.select(col(idCol).as(idAs),
          explode(array((0 until m).map(i => struct(
            lit(i).as("sub"),
            slice(col(vecCol), i * subDim + 1, subDim).as("sv"))): _*)).as("s"))
        .select(col(idAs), col("s.sub").as("sub"), col("s.sv").as("sv"))
    val codebook = slices(emb.filter(col(idCol) < nCodes), "code")
      .select(col("code").cast("int").as("code"), col("sub"),
        col("sv").as("cv"))
    // encode: per (vector, subspace) the nearest codeword by decimal
    // squared L2; min(struct(d, code)) → ties take the smallest code
    val enc = slices(emb, "vid").join(broadcast(codebook), "sub")
      .groupBy(col("vid"), col("sub"))
      .agg(min(struct(decL2(col("sv"), col("cv")).as("d"),
        col("code").as("code"))).as("mn"))
      .select(col("vid"), col("sub"), col("mn.code").as("code"))
    // ADC lookup table: exact query-subvector ↔ codeword distances
    val qslices = typedLit(query.grouped(subDim).map(_.toSeq).toSeq)
    val lut = codebook.select(col("sub"), col("code"),
      decL2(col("cv"), element_at(qslices, col("sub") + 1)).as("qd"))
    enc.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vid") =!= queryId)
      .groupBy(col("vid"))
      .agg(sum(col("qd").cast(dec)).as("est"))
      .orderBy(col("est").asc, col("vid").asc)
      .limit(k)
      .select(col("vid").as("vec_id"),
        round(col("est").cast("double"), 6).as("dist_est"))
  }
}
