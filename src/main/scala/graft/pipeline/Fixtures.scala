package graft.pipeline

import java.nio.file.{Files, Path, StandardCopyOption}

/** Bundled reference-shaped staging fixtures (whole-file JSON arrays,
  * FIXTURES.md §A). Classpath resources are not Spark-readable when the app
  * runs from a jar (`jar:` URLs), so they are materialized once into a temp
  * directory and read from there. */
object Fixtures {

  val files: Seq[String] =
    Seq("dags.json", "dagRuns1.json", "dagRuns2.json", "taskInstances1.json",
      "cdc.json")

  lazy val dir: String = {
    val tmp: Path = Files.createTempDirectory("graft-fixtures")
    files.foreach { name =>
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      require(in != null, s"missing bundled fixture /fixtures/$name")
      try Files.copy(in, tmp.resolve(name), StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
    tmp.toString
  }
}
