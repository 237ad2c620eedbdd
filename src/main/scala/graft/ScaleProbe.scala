package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.functions.K
import graft.operators.Similarity

/** Scale-experiment harness behind SCALING.md: times the ANN clustering
  * composition on one sf directory at (a) a FIXED small-corpus
  * `nPlanes` constant — the gated q116/q120 settings — and (b) the
  * [[Similarity.nPlanesFor]] auto-sized plane count. The bucket
  * self-join scores Σ_b |bucket|² ≈ n²/2^nPlanes pairs, so a fixed
  * constant carried across a 10× data growth costs ~100× candidate
  * work; auto-sizing holds expected occupancy ≤ targetBucket and the
  * candidate term ≈ n·targetBucket — linear. This harness is how that
  * prediction is MEASURED rather than asserted (the oracle-gated
  * queries must keep their constants — the DuckDB SQL mirrors them —
  * so the demonstration lives here, not in the gate).
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [reps=3]
  * Prints one JSON line per timed variant.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: ScaleProbe <sfDir> [reps=3]"); sys.exit(1) }
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = vecs.count()
    val auto = Similarity.nPlanesFor(n)

    def time(label: String, nPlanes: Int, k: Int, probes: Int, salt: Int): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Similarity.semanticClustersAnn(vecs, "vec_id", "embedding",
            K.Dim, nPlanes = nPlanes, k = k, iterations = 12,
            probes = probes, salt = salt)
          .select(col("id"), col("cluster"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = secs(secs.length / 2)
      println(f"""{"probe":"$label","sf":"$sfDir","n":$n,"nPlanes":$nPlanes,"probes":$probes,"salt":$salt,"median_sec":$med%.3f,"passes":[${secs.map(s => f"$s%.3f").mkString(",")}]}""")
    }

    // q116's gated constants vs its auto-sized twin
    time("fixed_q116", nPlanes = 4, k = 4, probes = 0, salt = 1)
    time("auto_q116", nPlanes = auto, k = 4, probes = 0, salt = 1)
    // q120's gated constants vs its auto-sized twin (probes track planes)
    time("fixed_q120", nPlanes = 8, k = 2, probes = 8, salt = 4)
    time("auto_q120", nPlanes = auto, k = 2, probes = math.min(8, auto), salt = 4)
    spark.stop()
  }
}
