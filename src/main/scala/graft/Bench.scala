package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Median of an odd-or-even sized sample (lower-middle for even n):
    * deterministic, no interpolation — we compare medians across rounds,
    * not absolute values. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.length - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // n=3 by default: round 3→4 ran IDENTICAL code and a single contended
    // run swung individual queries 0.74×–5.3×; medians of 3 are the minimum
    // that survives one bad interleaving. Override via SPARK_GRAFT_BENCH_REPS.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state warmup (untimed): touch every table once so file
    // listing, footer reads, and codegen/JIT warm-up don't land on
    // whichever query happens to run first
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val samples: Map[String, Seq[Double]] = SparkEntry.queries.map { case (name, fn) =>
      name -> (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        // failed runs are reported as -1 (not a time) and excluded from
        // the total, so a broken query cannot masquerade as a fast one
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
    }
    val results: Map[String, Double] = samples.map { case (name, ts) =>
      name -> (if (ts.exists(_ < 0)) -1.0 else median(ts))
    }
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = ok.values.sum
    // per-query max/min spread across reps — the noise floor for this run;
    // >2 means the host was contended and deltas below that are not signal
    val spreads = samples.values.filter(_.forall(_ > 0))
      .map(ts => ts.max / math.max(ts.min, 1e-9))
    val spreadMax = if (spreads.isEmpty) 1.0 else spreads.max
    val slowest = ok.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"per_query_median","value":${fmt(total)},"unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"}"""
    val short =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":${results.size - ok.size},"reps":$reps,"spread_max":${fmt(spreadMax)},"slowest":$slowest,"sf":"$sfDir"}"""
    // stop FIRST so no Spark shutdown logging can land after the JSON: the
    // driver parses the bench from the TAIL of the captured output, and the
    // 105-entry per-query line alone overflowed that window four rounds
    // running (parsed:null) — so the full line prints first (for humans and
    // diffing) and a SHORT final line carries the machine-readable summary
    spark.stop()
    println(full)
    println(short)
    System.out.flush()
  }
}
