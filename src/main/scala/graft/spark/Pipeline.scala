package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{Extract, Lang}

/** The extraction pipeline: docs + media -> Dataset[ExtractedRow].
  *
  * Scale design (the reference is serial, reference: lib/rika/cli/
  * rika_command.rb:82-90; everything below is our distribution strategy):
  *
  *  - spans are EXPLODED and extracted per-span immediately after the
  *    media join, so raw payload bytes cross exactly ONE shuffle (the
  *    join's own hash exchange on media_ref, which is uniformly
  *    distributed by construction) and are dropped before assembly;
  *  - inline text spans never join media: they take a cheap salted
  *    repartition on pmod(hash(doc_id, idx), P) instead — explicit skew
  *    mixing so giant docs that arrive clustered in scan splits (as
  *    size-class-partitioned Iceberg layouts would) don't straggle one
  *    executor (north rule: skew handled explicitly);
  *  - per-doc assembly shuffles only EXTRACTED text (orders of magnitude
  *    smaller than payloads), grouped by doc_id;
  *  - kernels run inside mapPartitions: parser state (lang profiles,
  *    format tables) is JVM-static, amortized per executor, mirroring the
  *    reference's one-JVM claim (reference: README.md:225-228).
  */
object Pipeline {

  final case class Config(
      maxContentLength: Int = -1,
      saltPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
      broadcastMedia: Boolean = false)

  /** Full pipeline. `docs(doc_id, spans)`, `media(media_ref, bytes_b64)`. */
  def extract(spark: SparkSession, docs: DataFrame, media: DataFrame,
      cfg: Config = Config()): Dataset[ExtractedRow] = {
    import spark.implicits._

    val spanRows = docs.select(
      col("doc_id"),
      explode(col("spans")).as("span"))
      .select(
        col("doc_id"),
        col("span.offset").as("span_idx"),
        col("span.kind").as("kind"),
        col("span.text").as("text"),
        col("span.media_ref").as("media_ref"))

    val textSpans = spanRows.filter(col("media_ref").isNull)
    val mediaSpans = spanRows.filter(col("media_ref").isNotNull)

    val p = if (cfg.saltPartitions > 0) cfg.saltPartitions
      else spark.sessionState.conf.numShufflePartitions

    // inline text: explicit salt mixing (one narrow-payload shuffle)
    val textSalted = textSpans
      .repartition(p, pmod(hash(col("doc_id"), col("span_idx")), lit(p)))

    // media payloads: the join's own exchange on media_ref IS the salt —
    // refs are unique per span, so hash distribution is uniform. Broadcast
    // the media table instead when the caller knows it is small.
    val mediaSide = if (cfg.broadcastMedia) broadcast(media) else media
    val mediaJoined = mediaSpans.join(mediaSide, Seq("media_ref"), "left")
      .select(col("doc_id"), col("span_idx"), col("kind"), col("text"),
        col("media_ref"), col("bytes_b64"))

    val opt = Extract.Options(cfg.maxContentLength)

    val textExtracted = textSalted.as[(String, Int, String, String, String)]
      .mapPartitions { it =>
        it.map { case (docId, idx, kind, text, _) =>
          toSpanExtract(docId, idx, null,
            Extract.extractText(kind, text, opt),
            if (text == null) 0L else text.length.toLong)
        }
      }

    val mediaExtracted = mediaJoined
      .as[(String, Int, String, String, String, String)]
      .mapPartitions { it =>
        it.map { case (docId, idx, kind, _, ref, b64) =>
          val bytes =
            if (b64 == null) null
            else if (b64.isEmpty) Array.emptyByteArray
            else java.util.Base64.getDecoder.decode(b64)
          toSpanExtract(docId, idx, ref,
            Extract.extractBytes(kind, bytes, opt),
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }

    assemble(spark, textExtracted.union(mediaExtracted))
  }

  private def toSpanExtract(docId: String, idx: Int, ref: String,
      out: Extract.Out, bytesIn: Long): SpanExtract =
    SpanExtract(
      doc_id = docId,
      span_idx = idx,
      out_kind = if (out.isMedia) "media" else if (out.blocks.nonEmpty) "text" else "none",
      blocks = out.blocks,
      media_ref = ref,
      content_type = out.contentType,
      metadata = out.metadata.toSeq.map { case (k, v) => MetaEntry(k, v) },
      issue_type = out.issue.getOrElse(""),
      bytes_in = bytesIn)

  /** Reassemble per-doc rows from extracted spans: dense output offsets in
    * input-span order, doc-level content type / language / sorted
    * metadata, failure taxonomy. Only extracted text crosses this shuffle.
    */
  private def assemble(spark: SparkSession,
      spansEx: Dataset[SpanExtract]): Dataset[ExtractedRow] = {
    import spark.implicits._
    spansEx.groupByKey(_.doc_id).mapGroups { (docId, it) =>
      val parts = it.toArray.sortBy(_.span_idx)

      val outSpans = Vector.newBuilder[Span]
      var off = 0
      parts.foreach { p =>
        if (p.out_kind == "media") {
          outSpans += Span("media", null, p.media_ref, off); off += 1
        } else p.blocks.foreach { b =>
          outSpans += Span("text", b, null, off); off += 1
        }
      }

      val cts = parts.map(_.content_type).distinct
      val contentType = if (cts.length == 1) cts.head else "multipart/mixed"

      // language over a bounded sample of extracted text (doc-level, like
      // the reference's whole-content detect, reference: lib/rika/parser.rb:30)
      val sample = new StringBuilder
      var i = 0
      while (i < parts.length && sample.length < 4096) {
        parts(i).blocks.foreach { b =>
          if (sample.length < 4096) {
            sample.append(b.take(4096 - sample.length)); sample.append('\n')
          }
        }
        i += 1
      }
      val language = Lang.detect(sample.toString)

      // metadata merge: first span wins per key; engine-injected keys
      // mirror the reference (reference: lib/rika/parser.rb:31-32), sorted
      // case-insensitively (reference: lib/rika/parser.rb:34).
      val merged = scala.collection.mutable.LinkedHashMap[String, String]()
      parts.foreach(_.metadata.foreach(e =>
        if (!merged.contains(e.key)) merged += (e.key -> e.value)))
      merged += ("Content-Type" -> contentType)
      merged += ("rika:language" -> language)
      merged += ("rika:data-source" -> docId)
      val metadata = merged.toSeq
        .sortBy { case (k, _) => (k.toLowerCase, k) }
        .map { case (k, v) => MetaEntry(k, v) }

      val issues = parts.map(_.issue_type).filter(_.nonEmpty)
      ExtractedRow(
        doc_id = docId,
        spans = outSpans.result(),
        content_type = contentType,
        language = language,
        metadata = metadata,
        status = if (issues.isEmpty) "ok" else "failed",
        issue_type = issues.headOption.getOrElse(""),
        bytes_in = parts.map(_.bytes_in).sum)
    }
  }
}
