package graft.spark

/** Canonical row shapes for the extraction engine.
  *
  * Input shape is fixed by BASELINE.json `input_hint`:
  *   docs(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)
  * plus the binary side table media(media_ref, bytes_b64, length).
  *
  * Output mirrors the reference's per-document ParseResult
  * (reference: lib/rika/parse_result.rb:5-14) re-expressed columnar:
  * fixed envelope + dynamic metadata. Metadata is materialized as an
  * ordered array<struct<key,value>> sorted case-insensitively by key
  * (reference: lib/rika/parser.rb:34 — key_sort contract), because Spark
  * MapType is unordered and ordered equality is part of the contract.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class DocRow(doc_id: String, spans: Seq[Span])

case class MediaRow(media_ref: String, bytes_b64: String, length: Long)

case class MetaEntry(key: String, value: String)

/** One extracted document (reference: lib/rika/parser.rb:36-45). */
case class ExtractedRow(
    doc_id: String,
    spans: Seq[Span],
    content_type: String,
    language: String,
    metadata: Seq[MetaEntry],
    status: String,    // "ok" | "failed"
    issue_type: String, // "" | empty_file | io_error | invalid_input | parse_error
    bytes_in: Long      // total payload bytes consumed (throughput metrics)
)

/** Extraction result of ONE media payload, computed inside the media
  * table's scan stage — payload bytes never cross any exchange; only this
  * (text-sized) row does.
  */
case class MediaExtract(
    media_ref: String,
    out_kind: String, // text | media | none
    blocks: Seq[String],
    content_type: String,
    metadata: Seq[MetaEntry],
    issue_type: String,
    bytes_in: Long
)

/** Per-span intermediate (post-extraction, pre-assembly): raw bytes are
  * already dropped — only extracted text crosses the assembly shuffle.
  */
case class SpanExtract(
    doc_id: String,
    span_idx: Int,
    out_kind: String, // text | media | none
    blocks: Seq[String],
    media_ref: String,
    content_type: String,
    metadata: Seq[MetaEntry],
    issue_type: String,
    bytes_in: Long
)
