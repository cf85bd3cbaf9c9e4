package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Components

/** Scale probe for the connected-components operators (DESIGN.md
  * "Measured scaling"): a synthetic million-edge pair graph shaped like a
  * worst-case dedup explosion — 50k clusters of 20 docs (spanning star +
  * redundant intra-cluster edges) plus one 2k-node chain to stress round
  * counts. Run: sbt "runMain graft.ProbeCC". */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "probe-cc")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val clusters = 50000
    val per = 20
    // star edges hub->member plus a redundant ring member->next
    val star = spark.range(clusters.toLong * (per - 1)).select(
      (col("id") / (per - 1)).cast("long").as("c"),
      (col("id") % (per - 1)).as("i"))
      .select((col("c") * per).as("a"), (col("c") * per + col("i") + 1).as("b"))
    val ring = spark.range(clusters.toLong * (per - 1)).select(
      (col("id") / (per - 1)).cast("long").as("c"),
      (col("id") % (per - 1)).as("i"))
      .select((col("c") * per + col("i")).as("a"), (col("c") * per + col("i") + 1).as("b"))
    val chainBase = clusters.toLong * per
    val chain = spark.range(2000).select(
      (lit(chainBase) + col("id")).as("a"), (lit(chainBase) + col("id") + 1).as("b"))
    val cliques = star.union(ring).cache()
    val withChain = cliques.union(chain).cache()
    val nCliqueEdges = cliques.count()
    val nChainEdges = withChain.count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def comps(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count_distinct(col("comp"))).first().getLong(0)

    // realistic dedup shape (diameter 2): propagation's home turf
    val (propN, propS) = time {
      comps(Components.connectedComponents(cliques, "a", "b"))
    }
    println(f"[probe-cc] propagation, clique graph: $nCliqueEdges%,d edges -> $propN%,d components in $propS%.1f s")
    val (starN, starS) = time {
      comps(Components.connectedComponentsStars(cliques, "a", "b"))
    }
    println(f"[probe-cc] large/small-star, clique graph: $starN%,d components in $starS%.1f s")
    assert(propN == starN, s"algorithms disagree: $propN vs $starN")
    // adversarial shape: a 2001-node chain (diameter 2000) that propagation
    // cannot finish in any sane round budget — stars contracts it in O(log n)
    val (chainN, chainS) = time {
      comps(Components.connectedComponentsStars(withChain, "a", "b"))
    }
    println(f"[probe-cc] large/small-star, +2001-node chain: $nChainEdges%,d edges -> $chainN%,d components in $chainS%.1f s")
    assert(chainN == propN + 1, s"expected ${propN + 1}, got $chainN")
    spark.stop()
  }
}
