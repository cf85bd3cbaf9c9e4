package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.PageRank

/** Graph analytics over the supplier–part co-occurrence graph derived from
  * `lineitem` — the iterative-algorithm surface beyond connected components
  * ([[graft.operators.Components]], declared in TextOps). The reference has
  * no graph operators; a training-data pipeline needs link-style authority
  * scores for source weighting, and PageRank is the canonical shape of every
  * such fixpoint computation (one join + one aggregation per round).
  *
  * Determinism contract: node ids are strings ('s'+suppkey / 'p'+partkey, so
  * the two key spaces cannot collide), the graph is symmetrized (every node
  * has out-degree >= 1 — no dangling mass), per-round contribution sums
  * accumulate in DECIMAL(28,18) (order-independent), and the oracle unrolls
  * the identical three iterations as chained CTEs.
  */
object GraphOps {

  /** Symmetrized distinct supplier–part edges: s<k> <-> p<k>. */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.load(s, dir, "lineitem")
      .select(concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
              concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      .distinct()
    // prefixes differ, so the swapped copy cannot duplicate a forward edge
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g_pagerank" -> ((s, dir) =>
      PageRank.run(edges(s, dir), "src", "dst", iters = 3)
        .select(col("node"), round(col("rank"), 6).as("rank"))),
    "g_degree_dist" -> ((s, dir) =>
      // degree distribution per bipartite side — the 1-pass profile that
      // sizes every downstream graph join (skew detection at 100 TB)
      edges(s, dir).groupBy("src").agg(count(lit(1)).as("deg"))
        .groupBy(substring(col("src"), 1, 1).as("side"), col("deg"))
        .agg(count(lit(1)).as("n_nodes"))),
    "g_triangles" -> ((s, dir) => {
      // triangle census of the part–part co-order graph (parts appearing in
      // the same order; the supplier–part graph is bipartite = triangle-
      // free). Engine counts via degree orientation (skew-proof wedge
      // fan-out, operators.Triangles); the oracle counts via the plain
      // id-ordered 3-way join — orientation is a performance trick, the
      // count is orientation-invariant, so agreement checks both the
      // algorithm and its implementation.
      val pp = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val e = pp.as("a").join(pp.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      graft.operators.Triangles.census(e, "u", "v")
    })
  )

  private val edgesSql =
    """e0 AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                     'p' || CAST(l_partkey AS VARCHAR) AS dst
              FROM lineitem),
       edges AS (SELECT src, dst FROM e0
                 UNION ALL
                 SELECT dst AS src, src AS dst FROM e0)"""

  /** One damped-update CTE round: rank' = (1-0.85) + 0.85 * Σ rank_in/deg_in,
    * decimal-exact inner sum, double outer arithmetic — identical to the
    * engine's [[PageRank]] iteration. The teleport term is spelled
    * 1.0 - 0.85 (not the literal 0.15) because that is the double the engine
    * computes: 0.15000000000000002, one ulp off the decimal literal. */
  private def iterSql(prev: String, out: String): String =
    s"""(SELECT n.node,
           (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) *
             CAST(COALESCE(s.in_sum, 0) AS DOUBLE) AS rank
         FROM nodes n LEFT JOIN (
           SELECT o.dst AS node,
                  sum(CAST(r.rank / o.deg AS DECIMAL(28,18))) AS in_sum
           FROM $out o JOIN $prev r ON o.src = r.node GROUP BY 1) s
           USING (node))"""

  val oracles: Map[String, String] = Map(
    "g_pagerank" ->
      s"""WITH $edgesSql,
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         outd AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
         i1 AS ${iterSql("r0", "outd")},
         i2 AS ${iterSql("i1", "outd")},
         i3 AS ${iterSql("i2", "outd")}
         SELECT node, round(rank, 6) AS rank FROM i3""",
    "g_degree_dist" ->
      s"""WITH $edgesSql,
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1)
         SELECT substr(src, 1, 1) AS side, CAST(deg AS BIGINT) AS deg,
                count(*) AS n_nodes
         FROM deg GROUP BY 1, 2""",
    "g_triangles" ->
      // id-ordered 3-way join (a<b<c): e1=(a,b), e2=(b,c), e3=(a,c) —
      // the orientation-free formulation; counts match the engine's
      // degree-oriented wedge+close exactly
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
               FROM pp a JOIN pp b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         deg AS (SELECT n, count(*) AS d
                 FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
                 GROUP BY 1),
         tri AS (SELECT count(*) AS n_triangles
                 FROM e e1 JOIN e e2 ON e1.v = e2.u
                           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         w AS (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg)
         SELECT (SELECT count(*) FROM e) AS n_edges,
                w.n_wedges, tri.n_triangles,
                round(3.0 * tri.n_triangles / w.n_wedges, 6) AS global_cc
         FROM tri, w"""
  )
}
