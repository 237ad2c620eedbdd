package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale-factor dataset for the scale-validation
  * bench (VERDICT r11 brief item 2) by replicating the driver's sf0.1
  * tables `factor`× with structure-preserving perturbations. The driver
  * only ships sf{0.001,0.01,0.1}, so the 10× point has to be derived —
  * the transforms below are chosen so each replica is *statistically*
  * like the base corpus rather than a literal copy (a literal copy would
  * turn every doc into a 10-way exact duplicate and blow up the dedup
  * queries' candidate structure):
  *
  *  - `documents`: `doc_id += r·10⁷`; text words ROTATED by r (shingles,
  *    minhash signatures, and hashed-token embeddings all change, while
  *    length / char / whitespace statistics are preserved, so per-replica
  *    near-dup structure matches the base corpus instead of creating
  *    cross-replica near-dups). Query/eval splits key on small doc_id
  *    ranges (`doc_id < 100` etc.), so the fixed-size query sets are
  *    untouched while the corpus grows — exactly the scaling shape the
  *    bench should measure. Docs of ≤1 word rotate to themselves (rare,
  *    harmless: they contribute 10-way exact-dup groups to q11's count).
  *  - `embeddings`: `vec_id += r·10⁷`; vector DIMENSIONS rotated by r
  *    (norms and within-replica geometry preserved, cross-replica
  *    neighborhoods scrambled — cluster count grows with the corpus).
  *  - TPC-H tables: all foreign keys offset CONSISTENTLY per replica
  *    (orderkey +r·10⁸, custkey/partkey +r·10⁷, suppkey +r·10⁶,
  *    event/user ids likewise) so per-key join fan-out is identical to
  *    the base tables. `nation`/`region` stay fixed — dims don't scale.
  *
  * Usage: `sbt "runMain graft.ScaleData [inDir] [outDir] [factor]"`.
  * Output goes under target/ (gitignored); nothing outside the repo is
  * written.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val in = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/scale/sf1.0"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String) = spark.read.parquet(s"$in/$name.parquet")
    def write(df: DataFrame, name: String, files: Int): Unit =
      df.coalesce(files).write.mode("overwrite").parquet(s"$out/$name.parquet")

    /** Union of `factor` per-replica transforms; replica 0 is the
      * untouched base so the small-id query/eval splits survive. */
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => if (r == 0) df else f(df, r)).reduce(_ union _)

    // rotate the word list by r (identity when the doc has ≤1 word)
    def rotateWords(text: org.apache.spark.sql.Column, r: Int) = {
      val w = split(text, " ")
      val n = size(w)
      val k = pmod(lit(r), n)
      when(n <= 1, text).otherwise(
        array_join(concat(slice(w, k + 1, n - k), slice(w, lit(1), k)), " "))
    }

    write(replicate(read("documents")) { (d, r) =>
      d.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
        .withColumn("text", rotateWords(col("text"), r))
    }, "documents", 4)

    write(replicate(read("embeddings")) { (d, r) =>
      val v = col("embedding")
      val n = size(v)
      val k = pmod(lit(r), n)
      d.withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
        .withColumn("embedding",
          when(n <= 1, v).otherwise(concat(slice(v, k + 1, n - k), slice(v, lit(1), k))))
    }, "embeddings", 4)

    write(replicate(read("events")) { (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * 100000000L))
        .withColumn("user_id", col("user_id") + lit(r * 10000000L))
    }, "events", 4)

    write(replicate(read("lineitem")) { (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(r * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * 1000000L))
    }, "lineitem", 8)

    write(replicate(read("orders")) { (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(r * 10000000L))
    }, "orders", 4)

    write(replicate(read("customer")) { (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * 10000000L))
    }, "customer", 2)

    write(replicate(read("part")) { (d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * 10000000L))
    }, "part", 2)

    write(replicate(read("supplier")) { (d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * 1000000L))
    }, "supplier", 1)

    // dimension tables don't scale
    write(read("nation"), "nation", 1)
    write(read("region"), "region", 1)

    val counts = Seq("documents", "embeddings", "events", "lineitem",
      "orders", "customer", "part", "supplier", "nation", "region")
      .map(t => s""""$t":${spark.read.parquet(s"$out/$t.parquet").count()}""")
    println(s"""{"scaled":"$out","factor":$factor,${counts.mkString(",")}}""")
    spark.stop()
  }
}
