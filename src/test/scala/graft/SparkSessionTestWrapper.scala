package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs. */
object SparkSessionTestWrapper {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Bench.scala: 128-key fallback would sort the candidate stream
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 17).toString)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSessionTestWrapper {
  lazy val spark: SparkSession = SparkSessionTestWrapper.spark
}
