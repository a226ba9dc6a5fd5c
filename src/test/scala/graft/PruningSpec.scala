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
}
