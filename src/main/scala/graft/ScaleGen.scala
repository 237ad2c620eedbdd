package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-validation data generator (VERDICT r11 brief item 2).
  *
  * Replicates a driver-generated sf directory `factor`× so the bench can
  * measure how each query's cost actually grows with data — the first
  * empirical check of the "would this survive 100×" plan-inspection
  * claims. Usage:
  *
  *   runMain graft.ScaleGen <srcSfDir> <outDir> [factor=10]
  *
  * Design choices, so the scaled corpus stresses the same plan shapes a
  * genuinely larger corpus would:
  *
  *  - Replica 0 is byte-identical to the source, so point lookups the
  *    queries make (`doc_id === 0`, `vec_id < 8`) still hit.
  *  - Fact-table keys are offset per replica (`doc_id + i·n`), and
  *    offsets are applied consistently across join sides
  *    (o_custkey ↔ c_custkey, o_orderkey ↔ l_orderkey), so join
  *    fan-outs scale linearly like a real bigger corpus — not
  *    quadratically like a keyspace collision would.
  *  - Replica texts get a deterministic per-replica word permutation:
  *    10 exact copies of every doc would inflate dedup/LSH candidate
  *    pairs ~factor² (every doc in a 10-clique), which no real 10×
  *    corpus does. Permuting words keeps length/vocab/token stats
  *    identical but breaks shingle identity between replicas, so
  *    near-dup density per doc stays at the source corpus's rate.
  *  - Replica embeddings get a small deterministic per-element jitter
  *    (±5%), for the same reason: identical vectors would put every
  *    replica family at cosine 1.0, collapsing kNN/ANN structure into
  *    factor-sized ties instead of a realistically thicker space.
  *  - Dimension tables (nation, region, part, supplier) are copied
  *    unchanged — dimensions don't grow with corpus size, and q25's
  *    broadcast of nation must stay realistically broadcast-sized.
  *
  * Output lives under the repo (gitignored), never under /root/testdata.
  */
object ScaleGen {
  /** Deterministic word shuffle; identity at seed 0. Fibonacci-hash rank
    * per position, stable sort — reproducible across runs and JVMs. */
  def permuteWords(text: String, seed: Int): String =
    if (seed == 0) text
    else {
      val w = text.split(" ", -1)
      w.indices
        .sortBy(j => (j * 2654435761L + seed * 0x9e3779b9L) & 0x7fffffffL)
        .map(w)
        .mkString(" ")
    }

  /** ±5% multiplicative jitter on one element; identity at seed 0. */
  def jitter(v: Float, vecId: Long, dim: Int, seed: Int): Float =
    if (seed == 0) v
    else {
      val h = (vecId * 31L + dim * 7L + seed * 0x9e3779b9L) & 0x7fffffffL
      (v * (1.0 + ((h % 2001L) - 1000L) / 2e4)).toFloat
    }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: ScaleGen <srcSfDir> <outDir> [factor=10]")
      sys.exit(1)
    }
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession
      .builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scalegen] wrote $name")
    }

    /** Union `factor` per-replica projections of `df`. */
    def replicate(df: DataFrame)(project: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => project(df, i)).reduce(_ unionAll _)

    // documents: offset ids, permute replica texts, recompute n_chars
    val nDocs = tbl("documents").count()
    val permute = udf(permuteWords _)
    write(
      replicate(tbl("documents")) { (d, i) =>
        d.select(
          (col("doc_id") + lit(i * nDocs)).as("doc_id"),
          permute(col("text"), lit(i)).as("text"),
          col("lang"), col("source"))
      }.withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    // embeddings: offset ids, jitter replica vectors (stay FloatType)
    val nVecs = tbl("embeddings").count()
    val jitterVec = udf { (vec: Seq[Float], vecId: Long, seed: Int) =>
      vec.zipWithIndex.map { case (v, d) => jitter(v, vecId, d, seed) }
    }
    write(
      replicate(tbl("embeddings")) { (e, i) =>
        e.select(
          (col("vec_id") + lit(i * nVecs)).as("vec_id"),
          jitterVec(col("embedding"), col("vec_id"), lit(i)).as("embedding"),
          col("label"))
      },
      "embeddings")

    // fact tables: consistent key offsets across join sides, derived
    // from the source keyspace so replicas never collide at any sf
    def keyCeil(name: String, key: String): Long =
      tbl(name).agg(max(col(key))).head().getLong(0) + 1L
    val orderStep = keyCeil("orders", "o_orderkey")
    val custStep = keyCeil("customer", "c_custkey")
    write(
      replicate(tbl("lineitem")) { (l, i) =>
        l.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderStep))
      },
      "lineitem")
    write(
      replicate(tbl("orders")) { (o, i) =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderStep))
          .withColumn("o_custkey", col("o_custkey") + lit(i * custStep))
      },
      "orders")
    write(
      replicate(tbl("customer")) { (c, i) =>
        c.withColumn("c_custkey", col("c_custkey") + lit(i * custStep))
      },
      "customer")
    val nEvents = tbl("events").count()
    val userStep = keyCeil("events", "user_id")
    write(
      replicate(tbl("events")) { (e, i) =>
        e.withColumn("event_id", col("event_id") + lit(i * nEvents))
          .withColumn("user_id", col("user_id") + lit(i * userStep))
      },
      "events")

    // dimension tables: unchanged (dimensions don't grow with the corpus)
    Seq("nation", "region", "part", "supplier").foreach(t => write(tbl(t), t))

    System.err.println(s"[scalegen] done: $out = $src × $factor")
    spark.stop()
  }
}
