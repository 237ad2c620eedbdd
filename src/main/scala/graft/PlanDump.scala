package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for a set of declared queries in ONE
  * session (Verify --plan pays a JVM+session per query; the r19
  * optimization round needs before/after plans for dozens).
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.PlanDump <outDir> <suffix> [q01,...|all]"
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Session configs match the
  * Bench builder so the dumped plan is the plan the bench actually runs
  * (same AQE/threshold/excluded-rule settings). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length < 3 || args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.tunedBuilder(sfDir, cpus.toInt)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        val exchanges = "Exchange".r.findAllIn(plan).length
        System.err.println(f"[plan] $name%-28s exchanges=$exchanges")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
