package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** Staged layout for edge-sized frames consumed by ITERATIVE per-round
  * joins (PageRank/HITS/LPA/Louvain/Luby/KMV-sketch rounds, random
  * walks): hash-partitioned by the per-round join key, sorted within
  * partitions, persisted.
  *
  * Why persist and not localCheckpoint: a cached InMemoryRelation keeps
  * the repartition+sort's outputPartitioning and outputOrdering visible
  * to EnsureRequirements (AQE does not re-plan cached plans), so every
  * round's SortMergeJoin exchanges and sorts ONLY the node-sized side;
  * a localCheckpoint under AQE collapses to an unpartitioned LogicalRDD
  * and the engine re-exchanges AND re-sorts the edge side every round —
  * the g_walks sf10 spill (measured 607.7 → 196.5 s, DESIGN.md round 12).
  *
  * This is the bucketed-graph layout a deployment stores its adjacency
  * in: sort once at write, join co-located forever. Callers unpersist
  * once every round's output is checkpointed.
  *
  * CONSUMERS MUST `hint("merge")` THE STAGED SIDE AT THE JOIN. With no
  * shuffle below the per-round join, the join strategy is frozen at
  * initial planning, and the compilation paths disagree: a plain action
  * broadcasts the node-sized frame (fine), but the persist/checkpoint
  * materialization paths see exact stats ONLY for the cached edge frame
  * (the frontier is a stats-less LogicalRDD) and BROADCAST THE EDGE
  * CACHE as the build side — measured 0.5 → 17 s per g_walks step at
  * sf0.1. The merge hint pins the scale-correct plan on every path: SMJ
  * streaming the pre-sorted cache with zero edge-side exchange or sort,
  * exactly what a bucketed adjacency buys on a cluster.
  */
object EdgeLayout {
  def stageByKey(df: DataFrame, key: String): DataFrame = {
    // EXPLICIT partition count: a bare repartition(col) is
    // REPARTITION_BY_COL, which AQE coalesces by size — at small SFs the
    // cached frame collapsed to 1-4 partitions and every per-round
    // consumer (join + projection + aggregate) ran near-single-threaded
    // (measured: g_pagerank 2.5 → 10.3 s at sf0.1 before this pin). An
    // explicit N is exempt from coalescing; the session's
    // shuffle-partition setting is exactly the deployment's bucket-count
    // knob for a stored adjacency.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, col(key))
      .sortWithinPartitions(key)
      .persist(StorageLevel.MEMORY_AND_DISK)
  }
}
