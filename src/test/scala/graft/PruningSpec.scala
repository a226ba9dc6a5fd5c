package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Gen

/** Iceberg-style layout behaviors: directory partition pruning on
  * kind_major, row-group stats pushdown on size_class.
  */
class PruningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kind_major predicate becomes a PartitionFilter (no data read for other kinds)") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    Gen.writeCorpus(spark, dir, nDocs = 300)
    val docs = Gen.readDocs(spark, dir)
    val q = docs.filter(col("kind_major") === "pdf").select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("kind_major"), plan.take(1500))
    // the filter is NOT a post-scan data filter
    assert(q.count() > 0)
    // size_class predicate is pushed to the scan (row-group stats)
    val q2 = docs.filter(col("size_class") >= 6).select(col("doc_id"))
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.contains("PushedFilters") && plan2.contains("size_class"), plan2.take(1500))
  }

  test("media branch's docs scan prunes span.text from ReadSchema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune2").toString
    Gen.writeCorpus(spark, dir, nDocs = 200)
    val docs = Gen.readDocs(spark, dir)
    val media = Gen.readMedia(spark, dir)
    val plan = graft.spark.Pipeline.extract(spark, docs, media)
      .toDF().queryExecution.executedPlan.toString
    // exactly one docs scan (the text branch) may read text:string; the
    // media branch's scan must read only <kind, media_ref, offset>
    val readSchemas = plan.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("spans:array")).toVector
    assert(readSchemas.nonEmpty)
    val withText = readSchemas.count(_.contains("text:string"))
    assert(withText == 1,
      s"expected exactly 1 spans scan with text (the text branch), got $withText:\n" +
        readSchemas.mkString("\n"))
  }
}
