package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection (not part of the library contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // keep configs aligned with Verify/Bench so audited plans are the
      // plans that actually run
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args(0) == "entry") {
      val rows = SparkEntry.entry(spark).collect()
      println(s"=== entry rows: ${rows.length}")
      rows.take(10).foreach(r => println("=== " + r))
      spark.stop()
      return
    }
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    if (sys.env.get("PLAN_MODE").contains("formatted")) {
      df.explain("formatted")
      spark.stop()
      return
    }
    val plan = df.queryExecution.optimizedPlan.toString
    println("=== occurrences of tokenizer chain (regexp_replace): " +
      "regexp_replace".r.findAllIn(plan).length)
    println("=== occurrences of ascii: " + "ascii".r.findAllIn(plan).length)
    println("=== plan size chars: " + plan.length)
    println(plan.take(Integer.parseInt(sys.env.getOrElse("PLAN_CHARS", "4000"))))
    spark.stop()
  }
}
