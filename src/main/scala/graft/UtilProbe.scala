package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Thread-utilization measurement for a gated query — the instrument
  * behind SCALING.md's "the sf1 base underutilizes 32 threads" reading
  * of q100's 4.4× cohort ratio (the worst in the 100× table). A
  * super-unity wall-clock ratio on a compute-linear plan has two
  * candidate causes: the plan grew super-linearly (bad), or the small
  * base simply never filled the machine so the big run pays the same
  * per-row cost at higher occupancy (benign). Wall-clock can't separate
  * them; the ratio of SUMMED TASK TIME can — task time is the actual
  * compute bill, independent of how many threads happened to be busy.
  *
  * A [[SparkListener]] sums `executorRunTime` and `executorCpuTime`
  * over every task the query runs; utilization = task-run-time /
  * (wall × cores). If the sf1→sf10 TASK-time ratio is ~the data ratio
  * while the WALL ratio is higher and sf1 utilization is low, the
  * super-unity wall ratio is occupancy, not plan growth.
  *
  * Usage: runMain graft.UtilProbe <sfDir> [queryName=q100_tied_sparse]
  * [reps=3]. Prints one JSON line per rep (median is the caller's
  * business; the listener totals are per-rep exact).
  */
object UtilProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: UtilProbe <sfDir> [query] [reps]"); sys.exit(1) }
    val sfDir = args(0)
    val query = if (args.length > 1) args(1) else "q100_tied_sparse"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Graft.tunedBuilder(sfDir, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val runMs = new LongAdder
    val cpuNs = new LongAdder
    val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          runMs.add(m.executorRunTime); cpuNs.add(m.executorCpuTime); tasks.add(1L)
        }
    })

    val fn = SparkEntry.queries(query)
    // warmup: JIT/codegen off the measured reps (the Bench protocol)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    for (rep <- 1 to reps) {
      runMs.reset(); cpuNs.reset(); tasks.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallSec = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously — drain before reading
      org.apache.spark.GraftListenerBridge.waitUntilListenerBusEmpty(spark.sparkContext)
      val taskSec = runMs.sum() / 1e3
      val cpuSec = cpuNs.sum() / 1e9
      val util = taskSec / (wallSec * cpus)
      println(f"""{"probe":"util","query":"$query","sf":"$sfDir","rep":$rep,"wall_sec":$wallSec%.3f,"task_sec":$taskSec%.1f,"cpu_sec":$cpuSec%.1f,"tasks":${tasks.sum()},"cores":$cpus,"utilization":$util%.3f}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filter(!org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(_))
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
