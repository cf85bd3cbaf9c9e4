package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporary round-12 probe: stage-level timing of v_pca's topComponent
  * chain and the streaming outer-join replay (staging vs drain), to aim
  * the optimization before changing anything (guide §1). Deleted after
  * the numbers land in OPTIMIZATION_r12.md. */
object ProbeStages {
  def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val which = args.headOption.getOrElse("pca")
    if (which.contains("pca")) (1 to 2).foreach { rep =>
      println(s"== v_pca stage breakdown rep $rep ==")
      val e = timed("emb load")(Tables.load(spark, sfDir, "embeddings"))
      val ex = e.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), (col("pos") + 1).as("i"),
          col("x").cast("double").as("x"))
      val meanRows = timed("means agg+collect") {
        ex.groupBy("i")
          .agg(sum(col("x").cast(DecimalType(28, 16))).as("sx"),
            count(lit(1)).as("n"))
          .select(col("i"),
            (col("sx").cast("double") / col("n").cast("double")).as("m"))
          .orderBy("i").collect()
      }
      val means: Array[Double] = meanRows.map(_.getDouble(1))
      val cov = timed("gram pass + checkpoint") {
        e.withColumn("m_arr", typedLit(means.toSeq))
          .select(explode(expr(
            """flatten(transform(embedding, (xi, di) ->
                 transform(embedding, (xj, dj) ->
                   named_struct('i', di + 1, 'j', dj + 1,
                     'p', CAST((CAST(xi AS DOUBLE) - element_at(m_arr, di + 1))
                             * (CAST(xj AS DOUBLE) - element_at(m_arr, dj + 1))
                           AS DECIMAL(28,16))))))""")).as("t"))
          .select(col("t.i"), col("t.j"), col("t.p"))
          .groupBy("i", "j")
          .agg(sum(col("p")).cast("double").as("c"))
          .localCheckpoint()
      }
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      var v = timed("v0 distinct + checkpoint") {
        cov.select(col("i").as("j")).distinct()
          .select(col("j"), lit(1.0).as("v"), lit(0.0).as("nrm"))
          .localCheckpoint()
      }
      for (r <- 1 to 4) {
        v = timed(s"power round $r") {
          val w = cov.join(v.select(col("j"), col("v")), "j")
            .groupBy("i")
            .agg(sum((col("c") * col("v"))
              .cast(DecimalType(28, 16))).cast("double").as("w"))
          w.select(col("i").as("j"),
              (col("w") / max(abs(col("w"))).over(wAll)).as("v"),
              max(abs(col("w"))).over(wAll).as("nrm"))
            .localCheckpoint()
        }
      }
      timed("final count")(v.count())
    }
    if (which.contains("stream")) (1 to 2).foreach { rep =>
      println(s"== s_stream_outer stage breakdown rep $rep ==")
      val (path, schema) = timed("stageEventsChunkedReplayFull") {
        graft.streaming.EventsStream.stageEventsChunkedReplayFull(spark, sfDir, 4)
      }
      val joined = timed("plan build") {
        val clicks = graft.streaming.EventsStream.readStagedReplay(spark, path, schema)
          .filter(col("event_type") === "click")
        val errors = graft.streaming.EventsStream.readStagedReplay(spark, path, schema)
          .filter(col("event_type") === "error")
        graft.streaming.EventsStream.clickErrorJoin(clicks, errors,
          windowSec = 600L, joinType = "left_outer")
      }
      val drained = timed("drain (runToMemory)") {
        graft.streaming.EventsStream.runToMemory(spark, joined,
          s"probe_stream_sink_$rep", "append")
      }
      timed("final agg count") {
        drained.filter(col("user_id") >= 0)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_rows"))
          .count()
      }
    }
    spark.stop()
  }
}
