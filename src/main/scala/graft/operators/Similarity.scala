package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Exact scoring uses per-row DECIMAL(28,16) accumulation of the per-position
  * products: decimal addition is exact and associative, so the result is
  * bit-identical to the DuckDB oracle's grouped decimal sum regardless of
  * evaluation order — and it runs as one codegen'd expression per row, no
  * explode, no join, no shuffle.
  *
  * The 100 TB scale path is `signBlock`/`knnLsh`/`nearDupPairs`: a
  * random-hyperplane-style LSH on the signs of the first `nBits` dimensions.
  * Candidates must share the block key (a plain string column that
  * partitions, bucket-joins, and prunes like any other key), turning
  * corpus-wide scans into one bucket's worth of exact work.
  *
  * `cosineFast` is the plain-double variant for throughput paths where
  * cross-engine bit-equality is not required.
  */
object Similarity {

  private val dec = DecimalType(28, 16)

  /** Exact decimal sum of products of two float/double arrays (dot product
    * when a≠b, squared norm when a=b). Associative-exact: equals the
    * oracle's unnest+group sum bit for bit. Since round 9 this is the
    * native single-pass [[graft.functions.DecimalDotExpr]] — bit-identical
    * to the HOF formulation it replaced (DecimalDotSpec proves equality on
    * adversarial inputs) at a fraction of its per-term machinery cost. */
  private[graft] def decDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftPlanBridge
    GraftPlanBridge.exprColumn(graft.functions.DecimalDotExpr(
      GraftPlanBridge.columnExpr(a), GraftPlanBridge.columnExpr(b)))
  }

  /** The retired higher-order-function formulation of [[decDot]], kept
    * (test-only) as the semantic reference the native expression must
    * match bit-for-bit. */
  private[graft] def decDotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(dec)),
      lit(java.math.BigDecimal.ZERO).cast(dec),
      (acc, v) => (acc + v).cast(dec))
      .cast("double")

  /** Zero-norm guard: a zero vector would make cosine 0/0 = NaN, which
    * also diverges from the oracle; clamping the denominator (like
    * IvfIndex.knn) maps it to 0. The same `greatest(..., 1e-12)` appears in
    * every oracle so non-degenerate results stay bit-identical. */
  private def safeDenom(d: Column): Column = greatest(d, lit(1e-12))

  /** Exact cosine between an embedding column and a fixed query vector. */
  def cosineToQuery(vec: Column, query: Seq[Float]): Column = {
    val q = typedLit(query)
    decDot(vec, q) / safeDenom(sqrt(decDot(vec, vec)) * sqrt(decDot(q, q)))
  }

  /** Exact decimal-accumulated SUM of products of two scalar columns —
    * the grouped-aggregate twin of decDot for (key,dim)-exploded frames
    * (per-product decimal cast, associative-exact accumulation, same
    * values as the oracle's sum(CAST(a*b AS DECIMAL(28,16)))). */
  def decDotCols(a: Column, b: Column): Column =
    sum((a * b).cast(dec)).cast("double")

  /** Exact cosine between two embedding COLUMNS (both sides vary per row) —
    * same decimal accumulation contract as cosineToQuery, for operators
    * that score against a joined frame (e.g. IVF centroid assignment). */
  def cosineCols(a: Column, b: Column): Column =
    decDot(a, b) / safeDenom(sqrt(decDot(a, a)) * sqrt(decDot(b, b)))

  /** Exact decimal squared norm — for call sites that HOIST the norms out
    * of a pair loop (cosineCols inside an N×k join evaluates 3 decimal
    * dots per PAIR; precomputing n² per row and per broadcast side leaves
    * 1 per pair + 1 per row + 1 per cell — same values, same hashes,
    * third of the decimal work). Recompose via [[cosineFromParts]]. */
  private[graft] def decNorm2(a: Column): Column = decDot(a, a)

  /** Cosine from a precomputed dot and squared norms — bit-identical to
    * [[cosineCols]] on the same inputs (same division, same guard). */
  private[graft] def cosineFromParts(dot: Column, n2a: Column, n2b: Column): Column =
    dot / safeDenom(sqrt(n2a) * sqrt(n2b))

  /** Exact top-k nearest neighbours of `queryId`'s embedding by cosine.
    * Fetching the query vector is a 1-row driver scalar (like a watermark);
    * the scan itself is a single projection + TakeOrderedAndProject. */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String,
               queryId: Long, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val queryRows = emb.filter(col(idCol) === queryId).select(col(vecCol)).take(1)
    require(queryRows.nonEmpty, s"query vector not found: $idCol = $queryId")
    val query: Seq[Float] = queryRows.head.getSeq[Float](0)
    emb.filter(col(idCol) =!= queryId)
      .select(col(idCol).as("vec_id"),
        cosineToQuery(col(vecCol), query).as("c_raw"))
      // order by the unrounded value (like the oracle) so the k-boundary
      // cannot differ between engines; round only for output.
      .orderBy(col("c_raw").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), round(col("c_raw"), 6).as("cosine"))
  }

  /** Batched multi-query exact kNN — the SERVING shape (one query at a
    * time is a benchmark fiction; retrieval serves batches). The query
    * TABLE broadcasts against the corpus (serving batches are tiny next to
    * the corpus), each (vector, query) pair costs one decimal cosine, and
    * the per-query top-k runs through the custom TopKPerKey operator — its
    * map-side partial pass means the exchange carries at most
    * partitions·queries·k scored triples (id, query_id, cosine), never the
    * corpus and never embeddings. Corpus rows sharing an id with a query
    * are excluded (self-match), mirroring [[knnBrute]]. */
  def knnBatch(emb: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val q = queries.select(col(qidCol).cast("long").as("query_id"),
      col(qvecCol).as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("vec_id"),
        cosineCols(col(vecCol), col("qv")).as("c_raw"))
    org.apache.spark.sql.GraftPlanBridge.topKPerKey(scored,
        Seq("query_id"), Seq("c_raw" -> false, "vec_id" -> true), k)
      .select(col("query_id"), col("vec_id"),
        round(col("c_raw"), 6).as("cosine"))
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
    * Two-phase verification: a cheap codegen'd double cosine prefilters
    * candidates (with a margin far wider than double-vs-decimal divergence,
    * ~1e-12), then the decimal-exact cosine decides — results are identical
    * to decimal-only, but the expensive exact path runs only on survivors. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   nBits: Int, minCosine: Double): DataFrame = {
    val blocked = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBlock(col(vecCol), nBits).as("block"))
    blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .filter(cosineFast(col("a.v"), col("b.v")) >= minCosine - 1e-9)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        (decDot(col("a.v"), col("b.v"))
          / safeDenom(sqrt(decDot(col("a.v"), col("a.v")))
            * sqrt(decDot(col("b.v"), col("b.v"))))).as("c_raw"))
      .filter(col("c_raw") >= minCosine)
      .select(col("vec_a"), col("vec_b"), round(col("c_raw"), 6).as("cosine"))
  }

  /** Plain double cosine — the throughput path (prefilters, coarse
    * scoring). Since round 9 this routes through the codegen'd
    * [[graft.functions.FloatCosine]] expression (one fused loop inside
    * whole-stage codegen) instead of three interpreted HOF folds; the
    * accumulation order is identical (index-ordered, 0.0 seed), so every
    * value — including the v_knn_refine coarse scores the oracle replays
    * via list_reduce — is bit-unchanged. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftPlanBridge
    GraftPlanBridge.exprColumn(graft.functions.FloatCosine(
      GraftPlanBridge.columnExpr(a), GraftPlanBridge.columnExpr(b)))
  }
}
