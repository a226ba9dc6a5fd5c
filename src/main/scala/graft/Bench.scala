package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Gen
import graft.spark.Pipeline

/** Driver-run benchmark: one JSON line on stdout.
  *
  * Headline metric: extraction docs/sec + bytes/sec over the interleaved
  * corpus (BASELINE.md primary metric), plus per-query wall times for the
  * operator suite. Corpus generation is cached on disk and excluded from
  * the timed region.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // CPU-heavy per byte: small scan splits keep all cores fed; avoid
      // mmap churn on shuffle blocks (see PERF.md)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.storage.memoryMapThreshold", "512m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus + one warm extraction (also warms JIT + disk cache); the
    // extracted table is cached on disk for the x_* queries.
    val name = new java.io.File(sfDir).getName
    val corpusDir = s"${SparkEntry.DataRoot}/corpus/$name"
    Gen.writeCorpus(spark, corpusDir, nDocs = benchDocs(name))
    val docs = Gen.readDocs(spark, corpusDir).cache()
    val media = Gen.readMedia(spark, corpusDir)
    val nDocs = docs.count() // materialize cache outside the timed region

    // warm-up extraction (JIT + page cache) outside the timed region
    Pipeline.extract(spark, docs, media).toDF()
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).collect()

    // timed headline: MEDIAN of 3 full extraction passes (payload join +
    // kernels + assembly). This host's throughput drifts 2-3x between
    // windows (see BASELINE.md); a single pass is not a headline.
    var outDocs = 0L
    var bytesIn = 0L
    val passes = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val agg = Pipeline.extract(spark, docs, media)
        .toDF()
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("bytes_in")))
        .collect()(0)
      outDocs = agg.getLong(0)
      bytesIn = agg.getLong(1)
      (System.nanoTime() - t0) / 1e9
    }
    val extractSec = passes.sorted.apply(passes.size / 2)

    // operator suite timings (each fully materialized via count)
    val benchQueries = Seq(
      "q1_agg", "q2_join_top", "q3_window", "q4_events_hourly",
      "q5_setops", "q6_rollup", "q7_sessions",
      "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
      "dedup_jaccard", "dedup_embed_cosine", "dedup_clusters", "dedup_clusters_fix",
      "ann_topk", "ann_lsh", "ann_ivf",
      "curate_sample", "curate_filter",
      "text_quality", "text_tokens", "text_fingerprint", "text_langid",
      "x_media_features", "x_image_dups", "x_image_dups_xcodec",
      "x_audio_features", "x_frames")
    val results = benchQueries.map { q =>
      val s0 = System.nanoTime()
      try { SparkEntry.queries(q)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      q -> (System.nanoTime() - s0) / 1e9
    }

    val all = ("x_extract" -> extractSec) +: results
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    val docsPerSec = outDocs / extractSec
    val bytesPerSec = bytesIn / extractSec
    val passStr = passes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","docs":$outDocs,"docs_per_sec":$docsPerSec%.1f,"bytes_per_sec":$bytesPerSec%.0f,"cpus":$cpus,"corpus_docs":$nDocs,"extract_passes_sec":$passStr}"""
    println(json)
    writeJson(s"${SparkEntry.DataRoot}/bench.json", json)
    spark.stop()
  }

  /** The result JSON also lands in a clean file: stdout is interleaved
    * with sbt/log4j noise, so log-regexing drivers get a first-class copy.
    */
  def writeJson(path: String, json: String): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println(json) finally w.close()
  }

  def benchDocs(name: String): Long = name match {
    case "sf0.001" => 500L
    case "sf0.01"  => 5000L
    case "sf0.1"   => 50000L
    case _         => 1000L
  }
}
