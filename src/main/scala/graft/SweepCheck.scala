package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Gen
import graft.spark.Pipeline

/** Large-corpus span-equality sweep: extraction vs generator goldens over
  * N docs (default 400k). Rare-event bugs (~1 per few hundred thousand
  * docs — e.g. the r2 zip-misroute) never surface in unit-sized suites;
  * this is the per-round gate before claiming a new format done.
  * Exit code 1 on any mismatch, with the first few offender docs dumped.
  */
object SweepCheck {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpusDir = s"${SparkEntry.DataRoot}/corpus/sweep-$n"
    Gen.writeCorpus(spark, corpusDir, n)
    val out = Pipeline.extract(spark,
      Gen.readDocs(spark, corpusDir), Gen.readMedia(spark, corpusDir)).toDF()
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), sha2(to_json(col("spans")), 256).as("fp"))
    val golden = Gen.readGolden(spark, corpusDir)
    val mismatches = fp(out).as("a")
      .join(fp(golden).as("b"), Seq("doc_id"), "full_outer")
      .filter(col("a.fp").isNull || col("b.fp").isNull || col("a.fp") =!= col("b.fp"))
      .cache()
    val bad = mismatches.count()
    println(s"""{"metric":"sweep_mismatches","value":$bad,"docs":$n}""")
    if (bad > 0) {
      val ids = mismatches.select("doc_id").limit(5).collect().map(_.getString(0))
      println(s"MISMATCHED ids: ${ids.mkString(",")}")
      golden.filter(col("doc_id").isin(ids: _*)).show(5, truncate = false)
      out.filter(col("doc_id").isin(ids: _*)).select("doc_id", "spans").show(5, truncate = false)
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
