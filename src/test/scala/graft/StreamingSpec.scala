package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Gen
import graft.spark.{IcebergLite, Pipeline, Runner}
import graft.streaming.StreamingFacade

/** The streaming facade: identical kernels lifted into Structured
  * Streaming via readStream + foreachBatch (SURVEY.md §2.10). The batch
  * pipeline's output is the oracle.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming extraction == batch extraction (AvailableNow over the corpus)") {
    spark.sparkContext.setLogLevel("WARN")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-scorpus").toString
    Gen.writeCorpus(spark, corpusDir, nDocs = 200)
    val outDir = java.nio.file.Files.createTempDirectory("graft-sout").toString

    val q = StreamingFacade.start(spark, s"$corpusDir/docs.parquet",
      s"$corpusDir/media.parquet", outDir)
    q.awaitTermination(120000)

    val streamed = IcebergLite.readAll(spark, Runner.extractedDir(outDir)).get
    assert(streamed.count() == 200)
    assert(streamed.select("doc_id").distinct().count() == 200)

    // batch oracle: identical span fingerprints per doc
    val batch = Pipeline.extract(spark,
      Gen.readDocs(spark, corpusDir), Gen.readMedia(spark, corpusDir)).toDF()
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), sha2(to_json(col("spans")), 256).as("fp"))
    val diff = fp(streamed).as("a").join(fp(batch).as("b"), Seq("doc_id"), "full_outer")
      .filter(col("a.fp").isNull || col("b.fp").isNull || col("a.fp") =!= col("b.fp"))
      .count()
    assert(diff == 0)
    // micro-batches left lineage: multiple stream-<n> run ids
    assert(streamed.select("run_id").distinct().count() >= 2)
  }
}
