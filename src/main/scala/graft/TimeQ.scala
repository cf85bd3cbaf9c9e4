package graft

import org.apache.spark.sql.SparkSession

/** Temporary A/B timing probe (round-12 protocol): warm all tables, then
  * time the named queries with 1 untimed warm-up + 3 timed reps each,
  * printing min/med/max. Same session shape as Bench (local[$CPUS],
  * shuffle partitions = cpus). Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.TimeQ q1,q2,..."
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      def run1(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run1() // untimed warm-up
      val ts = (1 to 3).map(_ => run1()).sorted
      println(f"[timeq] $name%-28s min=${ts.head}%.3f med=${ts(1)}%.3f max=${ts(2)}%.3f")
    }
    spark.stop()
  }
}
