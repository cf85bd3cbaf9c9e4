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
        .repartition(col("src"))
        .sortWithinPartitions("src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val frontier = e.select(col("src").as("node")).distinct()
        .select(col("node").as("walk_id"), col("node"))
        .localCheckpoint()
      println(s"=== $dir edges=${e.count()} frontier=${frontier.count()}")
      def stepOf(fr: org.apache.spark.sql.DataFrame, t: Int) =
        e.join(fr, e("src") === fr("node"))
          .select(col("walk_id"),
            expr("cast(conv(substring(md5(concat(cast(walk_id as string)" +
              s", ':$t:', cast(dst as string))), 1, 15), 16, 10) as " +
              "decimal(38,0)) * 9223372036854775808 + dst").as("hd"))
          .groupBy("walk_id")
          .agg(min(col("hd")).as("hd"))
          .select(col("walk_id"),
            expr("cast(hd % 9223372036854775808 as bigint)").as("node"))
      val step = stepOf(frontier, 1)
      val plan = step.queryExecution.executedPlan.toString
      if (sys.env.contains("PROBE_DUMP_PLAN")) println(plan)
      println(Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "HashAggregate", "SortAggregate")
        .map(j => s"$j=${plan.contains(j)}").mkString(s"[$dir] ", " ", "") +
        s" exchanges=${"Exchange hashpartitioning".r.findAllIn(plan).length}" +
        s" sorts=${"\\+- Sort ".r.findAllIn(plan).length}")
      // per-step timing of the real 4-step loop
      var fr = frontier
      (1 to 4).foreach { t =>
        val t0 = System.nanoTime()
        fr = stepOf(fr, t).localCheckpoint()
        println(f"[$dir] step=$t secs=${(System.nanoTime() - t0) / 1e9}%.1f " +
          f"rows=${fr.count()}")
      }
    }
    spark.stop()
  }
}
