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
  *    media join, so raw payload bytes cross at most ONE shuffle (the
  *    join's hash exchange on media_ref, uniformly distributed by
  *    construction) and are dropped before any further movement;
  *  - per-doc assembly is one linear exchange of EXTRACTED text only
  *    (orders of magnitude smaller than payloads); every subtree is
  *    consumed exactly once — a singles fast-path split was measured
  *    slower because any DAG fork recomputes the scan+join subtrees;
  *  - inline-text spans extract directly in the scan stage: byte-bounded
  *    scan splits (spark.sql.files.maxPartitionBytes) balance extraction
  *    cost across cores. cfg.saltPartitions adds an explicit salted
  *    repartition on pmod(hash(doc_id, span_idx)) — the north rule's skew
  *    mixing for layouts where scan splits cluster heavy docs (a giant doc
  *    is span-granular here, so a 256-span monster lands on up to 256
  *    partitions, not one);
  *  - kernels run inside mapPartitions: parser state (lang profiles,
  *    format tables) is JVM-static, amortized per executor, mirroring the
  *    reference's one-JVM claim (reference: README.md:225-228).
  */
object Pipeline {

  final case class Config(
      maxContentLength: Int = -1,
      saltPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
      broadcastMedia: Boolean = false,
      /** Extract only media rows actually referenced by a doc span: a
        * keys-only semi-join gates the media scan, so a RESUME run (99%
        * of docs committed, anti-joined away upstream) runs kernels only
        * on the missing 1%'s media instead of re-extracting everything.
        * The referenced-keys side is broadcast (doc_id-sized keys; on a
        * resume it is the small todo set by construction) so payload
        * bytes still never cross an exchange.
        *
        * Default OFF (r7): on a full fresh run the gate prunes nothing —
        * every media row is referenced — while its key set costs one
        * extra docs scan plus a broadcast barrier before the media scan
        * can start. Output rows are identical either way (the downstream
        * LEFT join keyed by span-side refs drops unreferenced extracts).
        * Runner.run turns the gate ON automatically whenever it resumes
        * (committed snapshots exist), which is the case the gate is for.
        */
      gateMediaByReference: Boolean = false,
      /** Broadcast cap for the gate's referenced-key set. A full
        * gated run over a 100 TB corpus has ~1e9 distinct media_refs —
        * far past any broadcast threshold and a driver OOM if forced.
        * Above this row-count estimate the gate is DISABLED entirely
        * (media extracts unpruned; the downstream left join keeps
        * results identical) rather than switched to a shuffled
        * left_semi, because a shuffled semi-join would move the MEDIA
        * side — payload bytes — through an exchange, which this
        * pipeline never does. Resume runs keep the broadcast: their
        * todo set is small by construction.
        */
      gateBroadcastMaxKeys: Long = 4L * 1000 * 1000)

  /** Full pipeline. `docs(doc_id, spans)`, `media(media_ref, bytes_b64)`. */
  def extract(spark: SparkSession, docs: DataFrame, media: DataFrame,
      cfg: Config = Config()): Dataset[ExtractedRow] = {
    import spark.implicits._

    // branch-specialized projections. The media branch never touches the
    // heavy span.text field — but explode(spans) plants a size(spans)>0
    // filter on the FULL struct column, defeating nested-schema pruning
    // (verified: ReadSchema kept text:string). Extracting the needed
    // fields as parallel arrays (GetArrayStructFields, which
    // NestedColumnAliasing handles) and zipping them back lets the scan
    // read only <kind, media_ref, offset> (verified in ReadSchema) — the
    // text column is the bulk of the docs table's inline bytes.
    def spanRows(withText: Boolean) =
      if (withText)
        docs.select(col("doc_id"), explode(col("spans")).as("span"))
          .select(col("doc_id"),
            col("span.offset").as("span_idx"), col("span.kind").as("kind"),
            col("span.text").as("text"), col("span.media_ref").as("media_ref"))
      else
        docs.select(col("doc_id"),
            explode(arrays_zip(col("spans.offset"), col("spans.kind"),
              col("spans.media_ref"))).as("span"))
          .select(col("doc_id"),
            col("span.offset").as("span_idx"), col("span.kind").as("kind"),
            col("span.media_ref").as("media_ref"))

    val p = if (cfg.saltPartitions > 0) cfg.saltPartitions
      else spark.sessionState.conf.numShufflePartitions

    val opt = Extract.Options(cfg.maxContentLength)

    // ---- text spans ----------------------------------------------------
    // inline text extracts in the scan stage: byte-bounded scan splits
    // (spark.sql.files.maxPartitionBytes) balance extraction cost across
    // cores; optional explicit salt mixing via cfg.saltPartitions for
    // layouts where scan splits cluster heavy docs
    val textSpans = spanRows(withText = true).filter(col("media_ref").isNull)
    val textMixed =
      if (cfg.saltPartitions > 0)
        textSpans.repartition(p, pmod(hash(col("doc_id"), col("span_idx")), lit(p)))
      else textSpans

    def extractTextRows(df: DataFrame): Dataset[SpanExtract] =
      df.select(col("doc_id"), col("span_idx"), col("kind"), col("text"))
        .as[(String, Int, String, String)]
        .mapPartitions(_.map { case (docId, idx, kind, text) =>
          toSpanExtract(docId, idx, null,
            Extract.extractText(kind, text, opt),
            if (text == null) 0L else text.length.toLong)
        })

    // ---- media spans ---------------------------------------------------
    // EXTRACT-BEFORE-JOIN (round 2): payloads are base64-decoded AND
    // kernel-extracted inside the media table's OWN scan stage, so raw
    // bytes never cross any exchange at any scale — the join that attaches
    // results to spans moves only text-sized MediaExtract rows. This also
    // removes the r1 broadcast-spans path's serial section (collecting and
    // building a spans hash relation on the driver — an Amdahl cap whose
    // cost is invisible at 2 cores and ~20% of the pass at 8), and
    // deduplicates kernel work when several spans reference one media row.
    // Detection is content-first (D1 re-sniffs), so extraction needs
    // nothing from the span row. Unreferenced media (the resume case) is
    // gated out by a broadcast semi-join on keys BEFORE payloads are
    // decoded — see Config.gateMediaByReference.
    val mediaSpans = spanRows(withText = false).filter(col("media_ref").isNotNull)
    // the shuffle-join path repartitions mediaSpans on media_ref; deriving
    // the gate's key set from the SAME repartitioned subtree makes the
    // two identical exchanges reuse one docs scan+explode (plan-audited:
    // the separate keys subtree re-scanned docs once per pass)
    val mediaSpansParted =
      if (cfg.broadcastMedia) mediaSpans
      else mediaSpans.repartition(p, col("media_ref"))
    // The gate's key set is broadcast ONLY while its size estimate is
    // under gateBroadcastMaxKeys. Above the cap (a full run over a
    // ~1e9-media corpus) the gate is dropped entirely rather than
    // switched to a shuffled semi-join: a shuffled left_semi would move
    // the MEDIA side — payload bytes — through an exchange, which this
    // pipeline never does. Over-extraction is harmless for results (the
    // downstream span join is a LEFT join keyed by span-side refs, so
    // unreferenced extracts simply drop out) and a full-scale run is
    // fully-referenced by construction; resume runs have a small todo
    // key set and always stay on the broadcast path.
    val gatedMedia =
      if (cfg.gateMediaByReference) {
        val keys = mediaSpansParted.select(col("media_ref")).distinct()
        val stats = keys.queryExecution.optimizedPlan.stats
        val estKeys = stats.rowCount.map(_.longValue)
          .getOrElse(stats.sizeInBytes.longValue / 48L) // ~48 B per md5-ish id row
        if (estKeys <= cfg.gateBroadcastMaxKeys)
          media.join(broadcast(keys), Seq("media_ref"), "left_semi")
        else media
      } else media
    val extractedMedia: Dataset[MediaExtract] = gatedMedia
      .select(col("media_ref"), unbase64(col("bytes_b64")).as("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (ref, bytes) =>
        val out = Extract.extractBytes("media", bytes, opt)
        MediaExtract(ref,
          if (out.isMedia) "media" else if (out.blocks.nonEmpty) "text" else "none",
          out.blocks, out.contentType,
          out.metadata.toSeq.map { case (k, v) => MetaEntry(k, v) },
          out.issue.getOrElse(""),
          if (bytes == null) 0L else bytes.length.toLong)
      })

    // left join keeps spans whose media_ref resolves nothing -> io_error
    // taxonomy rows (null-filled columns defaulted below). Both sides are
    // text-sized; broadcastMedia broadcasts the extracted side, otherwise
    // an explicit hash exchange on media_ref (uniform by construction).
    val exDF = extractedMedia.toDF()
    val mediaJoined =
      if (cfg.broadcastMedia)
        mediaSpans.join(broadcast(exDF), Seq("media_ref"), "left")
      else
        mediaSpansParted
          .hint("shuffle_hash")
          .join(exDF.repartition(p, col("media_ref")), Seq("media_ref"), "left")

    val emptyMeta = array().cast("array<struct<key:string,value:string>>")
    val mediaRows: Dataset[SpanExtract] = mediaJoined.select(
        col("doc_id"), col("span_idx"),
        coalesce(col("out_kind"), lit("none")).as("out_kind"),
        coalesce(col("blocks"), array().cast("array<string>")).as("blocks"),
        col("media_ref"),
        coalesce(col("content_type"), lit("application/octet-stream")).as("content_type"),
        coalesce(col("metadata"), emptyMeta).as("metadata"),
        coalesce(col("issue_type"), lit(Extract.IssueIoError)).as("issue_type"),
        coalesce(col("bytes_in"), lit(0L)).as("bytes_in"))
      .as[SpanExtract]

    // ---- finalize ------------------------------------------------------
    // one linear flow, each subtree consumed exactly once (a singles
    // fast-path split would recompute the scan+join subtrees — measured
    // slower than shuffling the small extracted text). Only extracted
    // text crosses this exchange; payload bytes are gone.
    // collect_list(struct) => ObjectHashAggregate whose update appends
    // RAW rows: the previous typed Aggregator deserialized every span
    // row through its ExpressionEncoder in groupByKey AND in the agg
    // update path (r7 stage audit: ~15 CPU-s per pass, ~40% of pass
    // CPU); assembly now decodes each doc's span list ONCE in a typed
    // map after the (unchanged, partial-aggregated) doc_id exchange.
    val spanCols = Seq("doc_id", "span_idx", "out_kind", "blocks",
      "media_ref", "content_type", "metadata", "issue_type", "bytes_in")
    extractTextRows(textMixed).union(mediaRows).toDF()
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(spanCols.map(col): _*)).as("parts"))
      .as[(String, Seq[SpanExtract])]
      .map { case (docId, parts) =>
        assembleDoc(docId, parts.toArray.sortBy(_.span_idx))
      }
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

  /** Per-doc finalization from extracted spans (sorted by span_idx): dense
    * output offsets in input order, doc-level content type / language /
    * sorted metadata, failure taxonomy.
    */
  def assembleDoc(docId: String, parts: Array[SpanExtract]): ExtractedRow = {
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

    // metadata merge: first span wins per key; engine-injected keys mirror
    // the reference (reference: lib/rika/parser.rb:31-32), sorted
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
