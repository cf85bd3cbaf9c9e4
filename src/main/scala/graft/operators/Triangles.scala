package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via DEGREE ORIENTATION (Suri &
  * Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
  * WWW'11): orient every undirected edge from its lower-(degree, id)
  * endpoint to the higher, enumerate wedges only from each node's ORIENTED
  * out-edges, and close them with one semi join. Each triangle {a,b,c}
  * (ordered by (deg, id)) is counted exactly once as the wedge a→b, a→c
  * closed by b→c.
  *
  * Why this is the 100× plan: on a power-law graph the naive wedge join
  * fans out as Σ deg² — the "curse of the last reducer" (one celebrity
  * node generates billions of wedges). Oriented out-degree is bounded by
  * O(√E) regardless of skew, so the wedge join is Σ outdeg² ≤ E·√E spread
  * evenly across keys. Every step is a key-equality join/aggregate —
  * no driver state, nothing collected.
  */
object Triangles {

  /** Global triangle census of an undirected graph given as distinct
    * id-ordered edges (u < v, one row per edge): edge/wedge/triangle
    * counts + the global clustering coefficient (3·triangles / wedges,
    * one IEEE division of exact integers — determinism contract). */
  def census(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges.select(col(uCol).as("u"), col(vCol).as("v"))
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val sized = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    // orient low → high by (degree, id); ties cannot loop (ids distinct)
    val uLow = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = sized.select(
      when(uLow, col("u")).otherwise(col("v")).as("src"),
      when(uLow, col("v")).otherwise(col("u")).as("dst"),
      when(uLow, col("dv")).otherwise(col("du")).as("ddst"))
    // wedges from each src's out-edges, smaller-(deg,id) dst first so each
    // unordered out-pair appears once
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
      .select(col("x.dst").as("b"), col("y.dst").as("c"))
    val tri = wedges.join(
        oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    // ALL wedges (not just oriented ones) for the clustering coefficient:
    // Σ d·(d-1)/2 over nodes, integer-exact
    val nWedges = deg.agg(sum(expr("(d * (d - 1)) DIV 2"))
      .cast("long").as("n_wedges"))
    nEdges.crossJoin(nWedges).crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("global_cc"))
  }
}
