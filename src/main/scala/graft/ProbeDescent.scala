package graft

/** Convergence probe for NN-Descent (DESIGN.md round 12): prints the
  * per-round changed-edge count over the real corpus at each gated SF —
  * the measurement that fixes δ (the stop threshold is changed < δ·N·k)
  * and the round cap in v_knn_descent_conv. Run:
  * sbt "runMain graft.ProbeDescent [sfDir ...]". */
object ProbeDescent {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "probe-descent")
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val rows = graft.queries.VectorOps.probeDescentChanges(spark, dir, 6)
      rows.foreach { case (i, changed, n) =>
        println(f"[probe-descent] $dir round=$i changed=$changed " +
          f"n=$n ratio=${changed.toDouble / (n * 3)}%.4f")
      }
      // mod=16 is the gated query's batch (the v_knn_graph_append id
      // scheme); larger mods emulate production-like smaller batches to
      // measure how the affected set scales with batch fraction
      Seq(16, 160, 640).foreach { mod =>
        val app = graft.queries.VectorOps.probeDescentAppend(spark, dir, mod)
        app.foreach { case (i, a, n, nNew) =>
          println(f"[probe-append] $dir mod=$mod round=$i affected=$a " +
            f"n=$n batch=$nNew frac=${a.toDouble / n}%.3f")
        }
      }
    }
    spark.stop()
  }
}
