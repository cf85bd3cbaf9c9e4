package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PageRank over an edge list — the canonical iterative graph
  * operator (Page et al., "The PageRank Citation Ranking", 1999; the Pregel
  * formulation in Malewicz et al., SIGMOD'10). A training-data pipeline uses
  * it to score documents by link authority (quality weighting / crawl
  * frontier prioritization), complementing the content-quality signals in
  * [[graft.queries.TextOps]].
  *
  * Non-normalized damped formulation: rank' = (1-d) + d * Σ rank(in)/deg(in),
  * all nodes seeded at 1.0. Callers that need dangling-mass conservation
  * should symmetrize or self-loop their edges first (the declared query
  * symmetrizes, so every node has out-degree >= 1).
  *
  * Scale posture (the same contract as [[Components]]):
  *  - each iteration is ONE shuffle join (static out-degree-annotated edges
  *    x current ranks on src) + ONE aggregation on dst — cost is
  *    O(|E|/cluster) per round, never all-pairs, no driver-side state;
  *  - the static edge+degree frame is localCheckpoint'd once, and ranks are
  *    lineage-truncated every `checkpointEvery` rounds so the iterative plan
  *    stays O(1) instead of doubling per round;
  *  - per-node contribution sums accumulate in DECIMAL(28,18) — exact and
  *    order-independent, so the result is bit-identical regardless of
  *    partitioning (each term is one IEEE double division of identical
  *    operands in any engine; the decimal sum of those terms is exact).
  */
object PageRank {

  /** Ranks after `iters` rounds: (node, rank). `edges` is directed
    * (srcCol -> dstCol); duplicate edges count once per occurrence, so pass
    * a distinct frame for simple-graph semantics. Nodes with no in-edges
    * hold the teleport floor (1-d). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
          damping: Double = 0.85, checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // static across iterations: every edge annotated with its source degree
    val out = e.join(deg, "src").localCheckpoint()
    val nodes = out.select(col("src").as("node"))
      .union(out.select(col("dst").as("node"))).distinct().localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (i <- 1 to iters) {
      val contrib = out
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum((col("rank") / col("deg"))
          .cast(DecimalType(28, 18))).as("in_sum"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) *
            coalesce(col("in_sum").cast("double"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** CONVERGENCE-terminated PageRank — iterate until the max RELATIVE
    * per-node rank movement drops below `relEps` (strict <), capped at
    * `maxIters`. Returns (ranks, stoppingRound).
    *
    * Relative (not absolute) movement because ranks are non-normalized:
    * hub ranks grow into the hundreds while leaves sit at the 0.15
    * teleport floor, so no absolute threshold fits both. The max-relative
    * movement decays geometrically at ~the damping factor, so the
    * threshold maps deterministically to a data-dependent round count.
    *
    * Determinism contract (the v_kmeans_conv idiom): each round's ranks
    * are doubles from identical decimal-exact contribution sums, bit-equal
    * across engines; the movement is IEEE subtract/abs/divide + an
    * order-independent max over those identical doubles (never re-rounded
    * through decimal), so both engines compute the identical stopping
    * round. Per round the driver receives ONE scalar (the movement max —
    * a node-cardinality join collapsed to one row); everything row-shaped
    * stays distributed, and ranks are localCheckpointed every round
    * because each frame is consumed twice (movement probe + next round). */
  def runConverged(edges: DataFrame, srcCol: String, dstCol: String,
                   maxIters: Int, relEps: Double,
                   damping: Double = 0.85): (DataFrame, Int) = {
    require(maxIters >= 1, "maxIters must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val out = e.join(deg, "src").localCheckpoint()
    val nodes = out.select(col("src").as("node"))
      .union(out.select(col("dst").as("node"))).distinct().localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0).as("rank")).localCheckpoint()
    var r = 0
    var stopped = false
    while (r < maxIters && !stopped) {
      r += 1
      val contrib = out
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum((col("rank") / col("deg"))
          .cast(DecimalType(28, 18))).as("in_sum"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) *
            coalesce(col("in_sum").cast("double"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      // prev rank >= the teleport floor (1-d) > 0 — the divide is safe
      val move = next.select(col("node"), col("rank").as("nr"))
        .join(ranks.select(col("node"), col("rank").as("pr")), "node")
        .agg(max(abs(col("nr") - col("pr")) / col("pr")))
        .first().getDouble(0)
      if (move < relEps) stopped = true
      ranks = next
    }
    (ranks, r)
  }
}
