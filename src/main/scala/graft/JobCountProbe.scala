package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Job/stage/task accounting for one declared query or an internal
  * loop — the r20 measurement tool behind guide §1.1/§1.2: before
  * cutting "overhead", count what the driver actually schedules. Runs
  * the target once with a listener attached and prints one line per
  * job (description, stage count, task count, wall ms) plus a summary.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.JobCountProbe <query|bpe> [merges]"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.isEmpty) "bpe" else args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.tunedBuilder(sfDir, cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, var desc: String, var t0: Long, var ms: Long,
                       var stages: Int, var tasks: Int)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[Int]())
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, J(e.jobId, d, e.time, 0, e.stageIds.size, 0))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.ms = e.time - j.t0
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute tasks to the job that owns the stage (best effort:
        // local mode runs jobs mostly sequentially here)
        val last = if (order.isEmpty) -1 else order.get(order.size - 1)
        val j = jobs.get(last)
        if (j != null) j.tasks += e.stageInfo.numTasks
      }
    }

    // warmup outside the listener so JIT/codegen init doesn't count
    if (target != "bpe")
      try SparkEntry.queries(target)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[jobs] warmup: $e") }

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    target match {
      case "bpe" =>
        import spark.implicits._
        val merges = if (args.length > 1) args(1).toInt else 64
        val nWords = 100000
        val synth = spark.range(nWords.toLong).map { i =>
          val len = 3 + (ScaleGen.fmix64(i * 0x9e3779b97f4a7c15L) & 7L).toInt
          val w = new StringBuilder
          var j = 0
          while (j < len) {
            w += ('a' + (ScaleGen.fmix64(i * 31L + j) % 26 + 26) % 26).toChar
            j += 1
          }
          (w.toString, 1L + nWords.toLong / (i + 1L))
        }.toDF("word", "cnt")
          .groupBy("word").agg(sum(col("cnt")).as("cnt"))
          .localCheckpoint(true)
        val (bat, rounds) = graft.operators.TokenizerTrain
          .trainBpeMergesBatched(synth, merges, driverWords = 0)
        System.err.println(s"[jobs] bpe: learned=${bat.size} rounds=$rounds")
      case "rawjob" =>
        // floor check: what does an empty 1-task RDD job cost here?
        val tiny = spark.sparkContext.parallelize(1 to 10, 1)
        tiny.count()
        (1 to 20).foreach { i =>
          val t = System.nanoTime()
          tiny.count()
          System.err.println(f"[raw] count $i: ${(System.nanoTime() - t) / 1e6}%.1f ms")
        }
        // and a persisted-read single-task job over a 100k-row partition
        val big = spark.sparkContext.parallelize(1 to 100000, 1)
          .map(i => Array.fill(8)(i.toString)).persist()
        big.count()
        (1 to 10).foreach { i =>
          val t = System.nanoTime()
          big.mapPartitions(it => Iterator.single(it.size)).collect()
          System.err.println(f"[raw] scan $i: ${(System.nanoTime() - t) / 1e6}%.1f ms")
        }
      case q =>
        SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
    }
    val wallMs = (System.nanoTime() - t0) / 1e6
    spark.sparkContext.removeSparkListener(listener)

    Thread.sleep(300) // drain listener bus
    import scala.jdk.CollectionConverters._
    val js = order.asScala.toSeq.map(jobs.get)
    js.foreach(j => println(
      f"[job] id=${j.id}%4d ms=${j.ms}%6d stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}"))
    println(f"[jobs] target=$target n_jobs=${js.size} n_stages=${js.map(_.stages).sum} " +
      f"n_tasks=${js.map(_.tasks).sum} job_ms_sum=${js.map(_.ms).sum} wall_ms=$wallMs%.0f")
    spark.stop()
  }
}
