package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.spark.{Pipeline, Runner}

/** Structured-Streaming facade over the batch kernels (SURVEY.md §2.10:
  * the reference has no streaming semantics — its "streaming" is
  * incremental stdout emission — but the kernels lift into
  * readStream + foreachBatch untouched; each micro-batch is an exactly-once
  * Runner commit, so the checkpoint story is shared with batch).
  */
object StreamingFacade {

  /** Stream the docs table (new parquet files appearing under
    * `docsDir`) through the extraction pipeline into an IcebergLite table
    * at `outDir`, media resolved against the (static) media table.
    */
  def start(spark: SparkSession, docsDir: String, mediaDir: String,
      outDir: String, cfg: Pipeline.Config = Pipeline.Config()): StreamingQuery = {
    val mediaStatic = spark.read.parquet(mediaDir)
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "8")
      .parquet(docsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // resume/anti-join semantics identical to batch: the IcebergLite
        // commit inside Runner.run is the exactly-once boundary
        Runner.run(batch.sparkSession, batch, mediaStatic, outDir,
          runId = s"stream-$batchId", cfg)
        ()
      }
      .start()
  }
}
