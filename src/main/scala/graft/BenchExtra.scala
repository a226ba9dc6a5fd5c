package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1) — SEPARATE from the
  * frozen graft.Bench so the driver contract is untouched.
  *
  * Per query it can:
  *  - capture `.explain("formatted")` into plans/<tag>/<query>_<suffix>.txt
  *    (the judge checks plan claims against these files);
  *  - time `count()` passes (the frozen bench's action) and/or a
  *    noop-sink pass (guide §1.4: computes every column, isolates the
  *    computation from result collection).
  *
  * Usage: sbt "runMain graft.BenchExtra [--passes N] [--suffix before]
  *   [--plans-dir plans/r07] [--noop] [query ...]"
  * No query args = the full bench list. Reads SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS like Bench.
  */
object BenchExtra {

  val benchQueries: Seq[String] = Seq(
    "q1_agg", "q2_join_top", "q3_window", "q4_events_hourly",
    "q5_setops", "q6_rollup", "q7_sessions", "q8_anti_semi", "q9_brand_volume",
    "q10_cube", "q11_grouping_sets", "q12_moving", "q13_pivot", "q14_percentile",
    "q15_ranks",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_jaccard", "dedup_embed_cosine", "dedup_clusters", "dedup_clusters_fix",
    "ann_topk", "ann_lsh", "ann_ivf",
    "curate_sample", "curate_filter",
    "text_quality", "text_tokens", "text_fingerprint", "text_langid",
    "x_media_features", "x_image_dups", "x_image_dups_xcodec",
    "x_audio_features", "x_frames")

  def main(args: Array[String]): Unit = {
    var passes = 3
    var suffix = "before"
    var plansDir = ""
    var noop = false
    var stages = false
    val qs = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--passes" => passes = args(i + 1).toInt; i += 2
        case "--suffix" => suffix = args(i + 1); i += 2
        case "--plans-dir" => plansDir = args(i + 1); i += 2
        case "--noop" => noop = true; i += 1
        case "--stages" => stages = true; i += 1
        case q => qs += q; i += 1
      }
    }
    val queryNames = if (qs.nonEmpty) qs.toSeq else benchQueries

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.storage.memoryMapThreshold", "512m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warm state the frozen bench has before the suite loop: corpus
    // generated + extraction table materialized on disk
    SparkEntry.ensureExtracted(spark, sfDir)

    if (stages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for (s <- si.submissionTime; c <- si.completionTime)
            yield (c - s) / 1000.0).getOrElse(-1.0)
          val m = si.taskMetrics
          System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=$wall%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
            f"run=${m.executorRunTime / 1e3}%6.2f " +
            f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  ${si.name.takeWhile(_ != '\n').take(60)}")
        }
      })

    // --extract: time the SAME pass the frozen Bench times (extract +
    // count/sum agg over the cached corpus), with stage detail
    if (queryNames == Seq("extract")) {
      import graft.corpus.Gen
      import graft.spark.Pipeline
      val name = new java.io.File(sfDir).getName
      val corpusDir = s"${SparkEntry.DataRoot}/corpus/$name"
      Gen.writeCorpus(spark, corpusDir, nDocs = Bench.benchDocs(name))
      val docs = Gen.readDocs(spark, corpusDir).cache()
      val media = Gen.readMedia(spark, corpusDir)
      docs.count()
      (1 to passes).foreach { i =>
        spark.sparkContext.setJobDescription(s"bench-extra: extract pass $i")
        val t0 = System.nanoTime()
        Pipeline.extract(spark, docs, media).toDF()
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("bytes_in")))
          .collect()
        System.err.println(f"[bench-extra] extract pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop()
      return
    }

    val out = new StringBuilder
    queryNames.foreach { q =>
      spark.sparkContext.setJobDescription(s"bench-extra: $q")
      val df = SparkEntry.queries(q)(spark, sfDir)
      if (plansDir.nonEmpty) {
        val dir = new java.io.File(plansDir)
        dir.mkdirs()
        val w = new java.io.PrintWriter(
          new java.io.File(dir, s"${q}_$suffix.txt"), "UTF-8")
        try w.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        finally w.close()
      }
      val times = (1 to passes).map { _ =>
        // construction INSIDE the timer — the frozen Bench times
        // `queries(q)(spark, sfDir).count()` as one unit, and some
        // builders run jobs at construction (cluster propagation,
        // centroid collects, dimsOf)
        val t0 = System.nanoTime()
        val df2 = SparkEntry.queries(q)(spark, sfDir)
        if (noop) df2.write.format("noop").mode("overwrite").save()
        else df2.count()
        (System.nanoTime() - t0) / 1e9
      }
      val line = f"$q%-24s ${times.map(t => f"$t%7.3f").mkString(" ")}  min=${times.min}%.3f"
      System.err.println("[bench-extra] " + line)
      out.append(line).append('\n')
    }
    println("=== BENCH-EXTRA RESULTS ===")
    print(out)
    spark.stop()
  }
}
