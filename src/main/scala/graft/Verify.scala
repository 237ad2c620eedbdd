package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Side modes (dev workflow, formerly tools/Scratch.scala):
  *   runMain graft.Verify --entry            flagship smoke (10 rows)
  *   runMain graft.Verify --plan <query>     optimized plan + tokenizer
  *                                           chain occurrence count
  */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0).startsWith("--")) { inspect(args); return }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // see Bench.scala: 128-key fallback would sort the candidate stream
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 17).toString)
      // data-sized initial exchange width, aligned with Bench — the gate
      // must prove results invariant under the scale config (it did:
      // 147/147 bit-identical at 8× width, the rule's upper regime)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Graft.initialPartitionsFor(Graft.dirBytes(sfDir), cpus.toInt).toString)
      // InferFiltersFromGenerate copies the full (expensive) generator
      // child expression into a Filter — for embedding pipelines that
      // doubles the per-row work for no benefit.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // events.parquet carries ns timestamps; read them as long (the ts
      // column is not part of any checked output)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q40_tfidf_sparse,q42_clean_text → dump a subset
    // (local iteration; the driver always runs the full map)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Plan/smoke inspection — configs aligned with the gate run so the
    * audited plan is the plan that actually runs. */
  private def inspect(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(0) match {
      case "--entry" =>
        val rows = SparkEntry.entry(spark).collect()
        println(s"=== entry rows: ${rows.length}")
        rows.take(10).foreach(r => println("=== " + r))
      case "--plan" if args.length < 2 =>
        System.err.println("usage: Verify --plan <query_name>")
        spark.stop()
        sys.exit(1)
      case "--plan" =>
        val df = SparkEntry.queries(args(1))(spark,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
        if (sys.env.get("PLAN_MODE").contains("formatted")) df.explain("formatted")
        else {
          val plan = df.queryExecution.optimizedPlan.toString
          println("=== occurrences of tokenizer chain (regexp_replace): " +
            "regexp_replace".r.findAllIn(plan).length)
          println("=== occurrences of ascii: " + "ascii".r.findAllIn(plan).length)
          println("=== plan size chars: " + plan.length)
          println(plan.take(Integer.parseInt(sys.env.getOrElse("PLAN_CHARS", "4000"))))
        }
      case other =>
        System.err.println(s"unknown mode $other (expected --entry or --plan)")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
