package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic for the round-12 scale gate: prints the join
  * strategy of one g_walks step at each SF dir to confirm/refute the
  * broadcast→sort-merge cliff hypothesis. Dev-only, not part of the
  * suite. Usage: sbt "Test/runMain graft.ProbeWalkPlan /tmp/sf1 /tmp/sf3" */
object ProbeWalkPlan {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(32, "probe-walk-plan")
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val e0 = Tables.load(spark, dir, "lineitem")
        .select((col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      val frontier = e.select(col("src").as("node")).distinct()
        .select(col("node").as("walk_id"), col("node"))
        .localCheckpoint()
      println(s"=== $dir edges=${e.count()} frontier=${frontier.count()}")
      val step = e.join(frontier, e("src") === frontier("node"))
        .select(col("walk_id"),
          md5(concat(col("walk_id").cast("string"), lit(":1:"),
            col("dst").cast("string"))).as("h"),
          col("dst"))
        .groupBy("walk_id")
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"))
      val plan = step.queryExecution.executedPlan.toString
      println(Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
        .map(j => s"$j=${plan.contains(j)}").mkString(s"[$dir] ", " ", ""))
      // per-step timing of the real 4-step loop
      var fr = frontier
      (1 to 4).foreach { t =>
        val t0 = System.nanoTime()
        fr = e.join(fr, e("src") === fr("node"))
          .select(col("walk_id"),
            md5(concat(col("walk_id").cast("string"), lit(s":$t:"),
              col("dst").cast("string"))).as("h"),
            col("dst"))
          .groupBy("walk_id")
          .agg(min(struct(col("h"), col("dst"))).as("m"))
          .select(col("walk_id"), col("m.dst").as("node"))
          .localCheckpoint()
        println(f"[$dir] step=$t secs=${(System.nanoTime() - t0) / 1e9}%.1f " +
          f"rows=${fr.count()}")
      }
    }
    spark.stop()
  }
}
