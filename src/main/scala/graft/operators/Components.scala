package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the step that turns near-duplicate PAIRS (LSH/SimHash candidates) into
  * dedup GROUPS with one canonical survivor per group. The reference's
  * dedup is exact-PK only (gcs_to_postgres.py:153-177); pair generators
  * alone under-delete: near-dup relations are not transitive closures, so
  * keeping "min of each pair" can drop both members of a chain a-b-c.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum label among
  * itself and its neighbors; fixpoint = each node labeled with the minimum
  * id of its component. Rounds needed = graph diameter, which for
  * near-duplicate graphs (LSH clusters are near-cliques) is small.
  *
  * Scale posture: each round is one shuffle join (edges x labels on node
  * id) plus a min-aggregation — never materializes the transitive closure,
  * no driver-side state beyond the 1-row convergence count.
  * `localCheckpoint` truncates the plan each round so lineage stays O(1)
  * across iterations instead of doubling (iterative DataFrame plans
  * otherwise grow until the optimizer chokes). For adversarial graphs with
  * long chains at 100 TB, swap the propagation body for the
  * large-star/small-star edge rewriting of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SoCC'14) — O(log^2 n) rounds over
  * the same join primitive; the driver loop and convergence test stay as
  * written here.
  */
object Components {

  /** Labels every node that appears in `pairs` with the minimum node id
    * reachable from it. Returns (node, comp); singletons (docs in no pair)
    * are not rows — they are their own component by definition.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 30): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    // per-node labels only ever decrease (new = min(old, neighbors)), so the
    // global label sum is strictly monotone until fixpoint: an unchanged sum
    // IS convergence — one 1-row aggregate per round instead of a
    // change-detection join
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // decimal(38,0) accumulation: a long sum could overflow on huge
      // graphs with large ids, silently faking (non-)convergence
      import org.apache.spark.sql.types.DecimalType
      df.agg(coalesce(sum(col("comp").cast(DecimalType(38, 0))),
        lit(java.math.BigDecimal.ZERO))).first().getDecimal(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      labels = edges
        .join(labels.select(col("node").as("src"), col("comp")), "src")
        .select(col("dst").as("node"), col("comp"))
        .union(labels)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds")
    labels
  }
}
