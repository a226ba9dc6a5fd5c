package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round equivalence harness: prints `query rows md5` for
  * every declared query (or the ones named as args) so a before/after
  * diff proves an optimization did not change any result. Rows are
  * serialized via toJSON in the query's own (ordered) output order.
  *
  * Usage: sbt "runMain graft.VerifyEquiv [query ...]"
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object VerifyEquiv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val out = new StringBuilder
    names.foreach { q =>
      spark.sparkContext.setJobDescription(s"verify-equiv: $q")
      val line = try {
        val rows = SparkEntry.queries(q)(spark, sfDir).toJSON.collect()
        val digest = java.security.MessageDigest.getInstance("MD5")
        rows.foreach(r => digest.update(r.getBytes("UTF-8")))
        val md5 = digest.digest().map("%02x".format(_)).mkString
        f"$q%-24s ${rows.length}%8d  $md5"
      } catch {
        case e: Throwable => f"$q%-24s ERROR ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
      System.err.println("[verify-equiv] " + line)
      out.append(line).append('\n')
    }
    println("=== VERIFY-EQUIV RESULTS ===")
    print(out)
    spark.stop()
  }
}
