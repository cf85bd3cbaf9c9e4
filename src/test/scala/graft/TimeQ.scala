package graft

/** PERMANENT quiet-host measurement harness — the DESIGN.md / PLANS.md A/B
  * protocol (warm tables, n=3, min/med/max per query, noop sink so write
  * cost never pollutes the number). Targeted per-query timing that the
  * full Bench run is too coarse for; every PLANS.md "quiet median" comes
  * from this entry point. Usage:
  *   sbt "Test/runMain graft.TimeQ <sfDir> <query> [query...]"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_sql_pipe", "q_exec_immediate", "q_sql_script", "q_higher_order",
        "v_quantize_int8", "v_semdedup", "v_prototypicality", "t_mix_sqrt", "g_lpa")
    val spark = Engine.local(32, "timeq")
    // warm all tables
    graft.Tables.names.foreach(n => graft.Tables.load(spark, dir, n).count())
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[timeq] $n%-20s min=${ts(0)}%.2f med=${ts(1)}%.2f max=${ts(2)}%.2f")
    }
    spark.stop()
  }
}
