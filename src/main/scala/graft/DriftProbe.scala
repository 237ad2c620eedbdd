package graft

/** Same-session A/B of the two SQL-conf profiles the suite has been
  * benched under, closing the round-13 attribution question: BENCH_r13
  * (widened scale config) read +13% over BENCH_r12 (flat cores-sized
  * config) on the shared 144 queries at sf0.1, and SCALING.md could
  * only argue from the ±15–20% measured session drift that the config
  * was not the cause. Cross-session comparisons can't separate the two
  * — this probe can: it runs the full gated suite under BOTH profiles
  * in ONE session, pass-interleaved (widened, flat, widened, flat, …),
  * so every per-config median is drawn from the same JVM/JIT/block-
  * store neighborhood and the per-config delta IS the config cost,
  * with drift differenced out.
  *
  * Profiles (both runtime-settable SQL confs, flipped between passes):
  *  - `widened` — the round-13 scale config: hash-agg fallback
  *    threshold 128k, initial exchange width data-sized
  *    ([[Graft.initialPartitionsFor]]; the [p, 16p] clamp makes it
  *    cores-sized at sf0.1's ~17 MB — the probe logs both widths so
  *    the "structural no-op at small sf" claim is proven, not argued).
  *  - `flat` — the round-12 config: Spark's default 128-key fallback,
  *    initial width = cores (what an unset initialPartitionNum means
  *    when `spark.sql.shuffle.partitions` = cores).
  *
  * Prints one JSON line per profile (Bench's schema plus a "config"
  * field) and writes both to `DRIFT_AB_<sfTag>.json`.
  *
  * Usage: runMain graft.DriftProbe  (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_REPEAT = passes PER CONFIG (default
  * 2), SPARK_GRAFT_ONLY)
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeat = math.max(1, sys.env.get("SPARK_GRAFT_REPEAT")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(2))
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = Graft.tunedBuilder(sfDir, cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val FallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val InitKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val widenedInit = Graft.initialPartitionsFor(Graft.dirBytes(sfDir), cpus)
    // cores-sized width == what r12's unset initialPartitionNum meant
    // (AQE falls back to shuffle.partitions = cores)
    val profiles: Seq[(String, Map[String, String])] = Seq(
      "widened" -> Map(FallbackKey -> (1 << 17).toString, InitKey -> widenedInit.toString),
      "flat" -> Map(FallbackKey -> "128", InitKey -> cpus.toString))
    System.err.println(
      s"[drift] widened initial width = $widenedInit, flat = $cpus" +
        (if (widenedInit == cpus) " (clamp makes the width a structural no-op at this sf)" else ""))

    def purge(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filter(!org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(_))
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // FULL untimed warmup pass: a single warmed query is not enough —
    // the first A/B attempt showed the first timed pass carrying the
    // whole session's per-query codegen/JIT cold-start, which read as
    // a 2–4× "config cost" concentrated on exactly the alphabetically
    // first queries. The two profiles share every physical plan at any
    // one sf (the fallback threshold is a runtime knob, not a plan
    // property; the width only differs where the clamp lifts), so one
    // warmup pass warms both.
    suite.foreach { case (name, fn) =>
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[drift] warmup $name: $e") }
      purge()
    }
    System.err.println("[drift] warmup pass done")

    val times = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.ArrayBuffer[Double]]
    val failed = scala.collection.mutable.Set.empty[(String, String)]
    // alternate profile order per pass (W F / F W / …): each pass-level
    // neighborhood carry-over lands on a different profile each pass
    // instead of always taxing the first one
    for (pass <- 1 to repeat;
         (profile, confs) <- if (pass % 2 == 1) profiles else profiles.reverse) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      suite.foreach { case (name, fn) =>
        if (!failed.contains((profile, name))) {
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable => System.err.println(s"[drift] $profile/$name: $e"); false }
          val sec = (System.nanoTime() - t0) / 1e9
          if (ok) times.getOrElseUpdate((profile, name),
            scala.collection.mutable.ArrayBuffer.empty) += sec
          else failed += ((profile, name))
          purge()
        }
      }
      System.err.println(s"[drift] pass $pass/$repeat ($profile) done")
    }

    // headline = per-query BEST pass (the steady-state-closest sample,
    // the 100×-cohort convention); the raw per-pass samples ride along
    // so median or spread can be recomputed from the artifact.
    // A query that failed under EITHER profile leaves BOTH totals
    // (the A/B delta is only meaningful over the intersection of
    // succeeded queries — summing different query sets would shift the
    // delta by the full cost of the asymmetric query).
    val failedAnywhere = failed.map(_._2).toSet
    val lines = profiles.map { case (profile, confs) =>
      val results = suite.map { case (name, _) =>
        val ok = !failedAnywhere.contains(name)
        val samples = times.getOrElse((profile, name),
          scala.collection.mutable.ArrayBuffer.empty[Double]).toSeq
        val sec = if (samples.isEmpty) 0.0 else samples.min
        (name, sec, ok, samples)
      }
      val qs = results.map { case (k, v, ok, _) => "\"" + k + "\":" + (if (ok) v else -1) }
        .mkString("{", ",", "}")
      val passes = results.map { case (k, _, _, samples) =>
        "\"" + k + "\":" + samples.map(t => f"$t%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val fj = results.filter(!_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
      val total = results.filter(_._3).map(_._2).sum
      System.err.println(f"[drift] $profile best-pass total = $total%.1f s over ${results.size} queries")
      s"""{"metric":"drift_ab","config":"$profile","confs":${confs.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")},"value":$total,"unit":"sec","queries":$qs,"passes":$passes,"failed":$fj,"sf":"$sfDir","passes_per_config":$repeat}"""
    }
    lines.foreach(println)
    val sfTag = new java.io.File(sfDir).getName
    try java.nio.file.Files.write(java.nio.file.Paths.get(s"DRIFT_AB_$sfTag.json"),
      (lines.mkString("\n") + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[drift] write: $e") }
    spark.stop()
  }
}
