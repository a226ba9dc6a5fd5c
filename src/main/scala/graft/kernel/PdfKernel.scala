package graft.kernel

import java.nio.charset.StandardCharsets

/** E3 - PDF layout parser, from scratch (JDK-only).
  *
  * Pipeline: object index (brute scan, robust to broken xref) -> object
  * lexer -> FlateDecode -> page tree -> per-font ToUnicode CMap ->
  * content-stream interpreter (q/Q/cm, BT/ET, Td, TD, T-star, Tm, TL, Tj, TJ, quote ops)
  * with full matrix tracking -> reading-order reconstruction (y desc,
  * x asc, paragraph break on larger-than-usual leading).
  *
  * Observable reference contract (all asserted by our specs):
  * content begins with a newline, then the first text line
  * (spec/rika/parser_spec.rb:157-162); truncation at 9 chars yields
  * "\nStopping" (spec/rika/parser_spec.rb:168-170); Info dict surfaces as
  * dc:title/dc:creator/pdf:docinfo:* string metadata
  * (spec/rika/parser_spec.rb:85-92,203-205); dc:format carries the header
  * version ("application/pdf; version=1.3").
  */
object PdfKernel {

  final class PdfParseException(msg: String) extends RuntimeException(msg)

  // one Inflater per executor thread, reset between streams — a fresh
  // native zlib context per stream was ~25% of plain-PDF kernel time
  private val inflaters = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue() = new java.util.zip.Inflater()
  }

  // parse-path telemetry (tests assert modern xref-stream PDFs index via
  // the validated stream chain, not the brute header scan)
  val xrefStreamDocs = new java.util.concurrent.atomic.AtomicLong
  val bruteScanDocs = new java.util.concurrent.atomic.AtomicLong

  // ------------------------------------------------------- stream filters

  private[graft] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = inflaters.get()
    inf.reset()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](16384)
    val maxOut = 256 << 20 // decompression-bomb guard
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val k = inf.inflate(buf)
        if (k == 0 && !inf.finished()) return out.toByteArray
        out.write(buf, 0, k)
        if (out.size() > maxOut)
          throw new PdfParseException("FlateDecode output exceeds bound")
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException =>
        throw new PdfParseException("bad FlateDecode stream")
    } // no end(): the thread-local instance is reused (reset() above)
  }

  /** PDF LZWDecode (ISO 32000 §7.4.4): MSB-first codes 9->12 bits,
    * Clear=256/EOD=257, /EarlyChange (default 1) bumps the width one
    * entry early. Table frozen at 4096 (no implicit reset).
    */
  private[graft] def lzwDecode(src: Array[Byte], earlyChange: Int): Array[Byte] = {
    val Clear = 256; val Eod = 257; val MaxTable = 4096
    val maxOut = 256 << 20
    val prefix = new Array[Int](MaxTable)
    val suffix = new Array[Byte](MaxTable)
    val stack = new Array[Byte](MaxTable)
    val out = new java.io.ByteArrayOutputStream(src.length * 3 + 64)
    var next = 258
    var width = 9
    var prev = -1
    var bitPos = 0
    val totalBits = src.length * 8
    var firstByte: Byte = 0
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c >= 258) {
        if (sp >= MaxTable || c >= next) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (c >= 256) return false
      firstByte = c.toByte
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      true
    }
    while (bitPos + width <= totalBits) {
      var code = 0
      var k = 0
      while (k < width) {
        val b = bitPos + k
        code = (code << 1) | ((src(b >> 3) >> (7 - (b & 7))) & 1)
        k += 1
      }
      bitPos += width
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (code == Eod) return out.toByteArray
      else if (prev == -1) {
        if (code >= 256) throw new PdfParseException("bad LZW start code")
        if (!emit(code)) throw new PdfParseException("bad LZW stream")
        prev = code
      } else {
        if (code > next) throw new PdfParseException("bad LZW code")
        if (code == next) {
          val saved = firstByte
          if (!emit(prev)) throw new PdfParseException("bad LZW stream")
          out.write(saved & 0xff)
          firstByte = saved
        } else if (!emit(code)) throw new PdfParseException("bad LZW stream")
        if (next < MaxTable) {
          prefix(next) = prev
          suffix(next) = firstByte
          next += 1
          if (next == (1 << width) - earlyChange && width < 12) width += 1
        }
        prev = code
      }
      if (out.size() > maxOut) throw new PdfParseException("LZW output exceeds bound")
    }
    out.toByteArray
  }

  /** ASCII85Decode: 5 chars '!'..'u' -> 4 bytes, 'z' = 4 zeros, '~'
    * terminates; whitespace ignored; partial final group padded with 'u'.
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 8)
    var tuple = 0L
    var cnt = 0
    var i = 0
    // skip an optional <~ leader
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      if (c == '~') done = true
      else if (c == 'z' && cnt == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        cnt += 1
        if (cnt == 5) {
          out.write(((tuple >> 24) & 0xff).toInt); out.write(((tuple >> 16) & 0xff).toInt)
          out.write(((tuple >> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; cnt = 0
        }
      } // anything else (whitespace, stray bytes): skipped
      i += 1
    }
    if (cnt > 1) { // partial group: pad with 'u', emit cnt-1 bytes
      var k = cnt
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      var sh = 24
      var j = 0
      while (j < cnt - 1) { out.write(((tuple >> sh) & 0xff).toInt); sh -= 8; j += 1 }
    }
    out.toByteArray
  }

  /** RunLengthDecode: n<128 copy n+1 literals; n>128 repeat next byte
    * 257-n times; 128 = EOD.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 8)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      i += 1
      if (l == 128) i = data.length
      else if (l < 128) {
        val n = math.min(l + 1, data.length - i)
        out.write(data, i, n)
        i += n
      } else if (i < data.length) {
        val b = data(i) & 0xff
        i += 1
        var k = 0
        while (k < 257 - l) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  /** /Predictor post-processing (ISO 32000 §7.4.4.4): 2 = TIFF
    * horizontal differencing, 10..15 = PNG row filters (each row carries
    * its own tag byte, so every PNG value decodes the same way).
    * Predictor-coded xref streams are the modern-producer default.
    */
  private[graft] def applyPredictor(data: Array[Byte], predictor: Int,
      colors: Int, bpc: Int, columns: Int): Array[Byte] = {
    if (predictor <= 1 || colors < 1 || bpc < 1 || columns < 1) return data
    val bpp = math.max(1, (colors * bpc + 7) / 8)
    val rowBytes = (columns * colors * bpc + 7) / 8
    if (rowBytes <= 0) return data
    if (predictor == 2) {
      if (bpc != 8) return data // sub-byte TIFF differencing: pass through
      val out = data.clone()
      var base = 0
      while (base + rowBytes <= out.length) {
        var i = bpp
        while (i < rowBytes) { out(base + i) = (out(base + i) + out(base + i - bpp)).toByte; i += 1 }
        base += rowBytes
      }
      out
    } else {
      val stride = rowBytes + 1
      val nRows = data.length / stride
      val out = new Array[Byte](nRows * rowBytes)
      val prevRow = new Array[Byte](rowBytes)
      var r = 0
      while (r < nRows) {
        val tag = data(r * stride) & 0xff
        val src = r * stride + 1
        val dst = r * rowBytes
        var i = 0
        while (i < rowBytes) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = prevRow(i) & 0xff
          val ul = if (i >= bpp) prevRow(i - bpp) & 0xff else 0
          val v = tag match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) / 2)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => raw
          }
          out(dst + i) = v.toByte
          i += 1
        }
        System.arraycopy(out, dst, prevRow, 0, rowBytes)
        r += 1
      }
      out
    }
  }

  /** The full filter pipeline over a raw stream payload (filters applied
    * in declaration order, /DecodeParms entry i paired with filter i;
    * abbreviated names per §7.4 Table 6). Unknown filters pass through
    * (best effort, same as before).
    */
  private[graft] def decodeFilters(data0: Array[Byte], filters: Seq[String],
      parms: Seq[Map[String, Int]]): Array[Byte] =
    filters.zipWithIndex.foldLeft(data0) { case (data, (f, i)) =>
      val p = if (i < parms.length) parms(i) else Map.empty[String, Int]
      def pred(d: Array[Byte]): Array[Byte] =
        applyPredictor(d, p.getOrElse("Predictor", 1), p.getOrElse("Colors", 1),
          p.getOrElse("BitsPerComponent", 8), p.getOrElse("Columns", 1))
      f match {
        case "FlateDecode" | "Fl" => pred(inflate(data))
        case "LZWDecode" | "LZW"  => pred(lzwDecode(data, p.getOrElse("EarlyChange", 1)))
        case "ASCIIHexDecode" | "AHx" =>
          val hex = new String(data, StandardCharsets.ISO_8859_1)
            .takeWhile(_ != '>').filterNot(_.isWhitespace)
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
        case "ASCII85Decode" | "A85" => ascii85Decode(data)
        case "RunLengthDecode" | "RL" => runLengthDecode(data)
        case "CCITTFaxDecode" | "CCF" =>
          // scanned-page bilevel images (ISO 32000 §7.4.6): K selects
          // G4 (<0) / G3 1-D (0) / G3 2-D (>0); output rows pack 1 bpp
          CcittFax.decode(data, p.getOrElse("K", 0),
              p.getOrElse("Columns", 1728), p.getOrElse("Rows", 0),
              blackIs1 = p.getOrElse("BlackIs1", 0) == 1,
              byteAlign = p.getOrElse("EncodedByteAlign", 0) == 1)
            .map(_._1).getOrElse(data) // malformed: pass through
        case "JBIG2Decode" =>
          // scanned-page bilevel images, segment-embedded (ISO 32000
          // §7.4.7): MMR generic regions composite onto the page plane
          Jbig2.decodeEmbedded(data).map(_._1).getOrElse(data)
        case _ => data // unsupported filter: pass through (best effort)
      }
    }

  // ---------------------------------------------------------------- model
  sealed trait PObj
  case class PNum(v: Double) extends PObj
  case class PStr(bytes: Array[Byte]) extends PObj
  case class PName(v: String) extends PObj
  case class PBool(v: Boolean) extends PObj
  case object PNull extends PObj
  case class PArr(items: Vector[PObj]) extends PObj
  case class PDict(m: Map[String, PObj]) extends PObj
  case class PRef(num: Int, gen: Int) extends PObj
  case class PStream(dict: PDict, raw: Array[Byte]) extends PObj
  case class POp(name: String) extends PObj // content-stream operator token

  final case class Result(
      text: String,
      lines: Vector[String],
      metadata: Map[String, String],
      pageCount: Int)

  // ------------------------------------------------------------ doc parse
  def extract(bytes: Array[Byte]): Result = {
    val doc = new Doc(bytes)
    val version = {
      val head = new String(bytes, 0, math.min(16, bytes.length), StandardCharsets.ISO_8859_1)
      if (head.startsWith("%PDF-")) head.drop(5).takeWhile(c => c.isDigit || c == '.') else "1.4"
    }
    // Encrypted PDFs with an EMPTY user password decrypt transparently
    // (standard security handler, RC4/AESV2 — see PdfCrypt); documents
    // needing a real password degrade to a taxonomy row, not a crash.
    if (doc.encryptedUnsupported)
      throw new PdfParseException("encrypted PDF: password required or unsupported scheme")

    val pages = doc.pages
    val pageTexts = pages.map(p => pageText(doc, p))
    // annotation text follows its page's body; document-end surface in
    // the reference's order: outline (bookmark) titles, then AcroForm
    // field lines
    val annots = pages.map(p => pageAnnotations(doc, p))
    val bookmarks = outlineTitles(doc)
    val fields = acroFields(doc)
    val fieldLines = fields.map { case (n, v) => s"$n: $v" }
    val tailLines = bookmarks ++ fieldLines
    val allLines = pages.indices.toVector.flatMap(i =>
      pageTexts(i)._1 ++ annots(i).map(_._2)) ++ tailLines
    val body = pages.indices.map { i =>
      val base = pageTexts(i)._2
      val al = annots(i)
      if (al.isEmpty) base else base + al.map(_._2 + "\n").mkString
    }.mkString("") + tailLines.map(_ + "\n").mkString
    val unmapped = pageTexts.map(_._3).sum
    var meta = infoMetadata(doc, version, pages.length, body, unmapped)
    val annotTypes = annots.flatten.map(_._1)
    if (annotTypes.nonEmpty)
      meta += ("pdf:annotationTypes" -> annotTypes.distinct.mkString(","))
    if (doc.root.exists(r =>
        doc.deref(r.m.getOrElse("AcroForm", PNull)).exists(_.isInstanceOf[PDict])))
      meta += ("pdf:hasAcroFormFields" -> fields.nonEmpty.toString)
    val embedded = embeddedFileNames(doc)
    if (embedded.nonEmpty) {
      meta += ("pdf:embeddedFileCount" -> embedded.length.toString)
      meta += ("pdf:embeddedFileNames" -> embedded.take(8).mkString(","))
    }
    // XMP packet: fills dc: holes the Info dict left (Info wins overlap)
    val xmp = xmpMetadata(doc)
    xmp.get("title").foreach(v =>
      if (!meta.contains("dc:title")) meta += ("dc:title" -> v))
    xmp.get("creator").foreach(v =>
      if (!meta.contains("dc:creator")) meta += ("dc:creator" -> v))
    xmp.get("description").foreach(v => meta += ("dc:description" -> v))
    // embedded image XObjects: count + dims + filters (the Tika-delegate
    // "embedded resources" surface, as string metadata per the data model)
    val images = pages.flatMap(p => pageImages(doc, p))
    if (images.nonEmpty) {
      meta += ("pdf:imageCount" -> images.length.toString)
      meta += ("pdf:imageDimensions" ->
        images.map { case (w, h, _) => s"${w}x$h" }.mkString(","))
      val filters = images.map(_._3).filter(_.nonEmpty).distinct
      if (filters.nonEmpty) meta += ("pdf:imageFilters" -> filters.mkString(","))
    }
    Result(body, allLines, meta, pages.length)
  }

  /** Image XObjects reachable from a page's resources: (w, h, filter). */
  private def pageImages(doc: Doc, page: PDict): Vector[(Int, Int, String)] =
    (for {
      res <- doc.deref(page.m.getOrElse("Resources", PNull)).collect { case d: PDict => d }
      xo  <- doc.deref(res.m.getOrElse("XObject", PNull)).collect { case d: PDict => d }
    } yield xo.m.valuesIterator.flatMap { ref =>
      doc.deref(ref).collect { case s: PStream => s.dict }
        .filter(_.m.get("Subtype").contains(PName("Image")))
        .map { d =>
          def dim(k: String): Int = d.m.get(k) match {
            case Some(PNum(v)) if v > 0 && v <= 1e7 => v.toInt
            case _ => 0
          }
          val filter = d.m.get("Filter") match {
            case Some(PName(f))   => f
            case Some(PArr(items)) =>
              items.collect { case PName(f) => f }.mkString("+")
            case _ => ""
          }
          (dim("Width"), dim("Height"), filter)
        }
    }.toVector).getOrElse(Vector.empty)

  /** Page annotation text: markup annotations contribute their /Contents
    * string, link annotations their /A /URI target — the surface the
    * reference exposes through Tika's PDF handler (reference:
    * lib/rika/parser.rb delegates whole-document extraction to Tika).
    * Popup and Widget annotations are skipped: a popup mirrors its parent
    * markup's contents and widgets surface through the AcroForm walk.
    * Returns (subtype, line) pairs in /Annots array order.
    */
  private def pageAnnotations(doc: Doc, page: PDict): Vector[(String, String)] =
    doc.deref(page.m.getOrElse("Annots", PNull)) match {
      case Some(PArr(items)) =>
        items.flatMap { it =>
          doc.deref(it).collect { case d: PDict => d }.flatMap { d =>
            val sub = d.m.get("Subtype") match {
              case Some(PName(s)) => s
              case _              => ""
            }
            sub match {
              case "Popup" | "Widget" => None
              case "Link" =>
                for {
                  a <- doc.deref(d.m.getOrElse("A", PNull))
                    .collect { case x: PDict => x }
                  if a.m.get("S").flatMap(doc.deref).forall(_ == PName("URI"))
                  u <- doc.deref(a.m.getOrElse("URI", PNull))
                    .collect { case PStr(b) => decodePdfString(b) }
                  if u.nonEmpty
                } yield (sub, u)
              case _ =>
                doc.deref(d.m.getOrElse("Contents", PNull))
                  .collect { case PStr(b) => decodePdfString(b) }
                  .filter(_.nonEmpty)
                  .map(c => (sub, c))
            }
          }
        }
      case _ => Vector.empty
    }

  /** AcroForm terminal fields as (fully-qualified name, value) pairs in
    * /Fields depth-first order. A kid dict carrying its own /T is a child
    * field (name joins with '.'); kids without /T are widget attachments
    * of the same field, so a node whose kids are all widget-only stays
    * terminal. Values: text strings decoded, name values (checkbox /Yes)
    * verbatim, missing -> "". Cycle- and depth-capped like the page walk.
    */
  private def acroFields(doc: Doc): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val seen = scala.collection.mutable.Set[Int]()
    def strOf(o: PObj): Option[String] = doc.deref(o).collect {
      case PStr(b)  => decodePdfString(b)
      case PName(n) => n
    }
    def walk(d: PDict, prefix: String, depth: Int): Unit = {
      if (depth > 32) return
      val name = d.m.get("T").flatMap(strOf) match {
        case Some(t) if prefix.isEmpty => t
        case Some(t)                   => s"$prefix.$t"
        case None                      => prefix
      }
      val kidFields = doc.deref(d.m.getOrElse("Kids", PNull)) match {
        case Some(PArr(ks)) =>
          ks.flatMap {
            case r @ PRef(n, _) =>
              if (seen.add(n)) doc.deref(r).collect { case kd: PDict => kd }
              else None
            case k => doc.deref(k).collect { case kd: PDict => kd }
          }.filter(_.m.contains("T"))
        case _ => Vector.empty
      }
      if (kidFields.nonEmpty) kidFields.foreach(walk(_, name, depth + 1))
      else if (d.m.contains("T"))
        out += ((name, d.m.get("V").flatMap(strOf).getOrElse("")))
    }
    for {
      root <- doc.root
      af <- doc.deref(root.m.getOrElse("AcroForm", PNull))
        .collect { case x: PDict => x }
      fs <- doc.deref(af.m.getOrElse("Fields", PNull))
        .collect { case PArr(items) => items }
    } fs.foreach {
      case r @ PRef(n, _) =>
        if (seen.add(n)) doc.deref(r).collect { case d: PDict => walk(d, "", 0) }
      case o => doc.deref(o).collect { case d: PDict => walk(d, "", 0) }
    }
    out.result()
  }

  /** Outline (bookmark) titles, depth-first in /First-/Next order — the
    * reference's default surface (Tika extracts bookmark text unless
    * disabled; rika keeps the default). Cycle- and count-capped.
    */
  private def outlineTitles(doc: Doc): Vector[String] = {
    val out = Vector.newBuilder[String]
    val seen = scala.collection.mutable.Set[Int]()
    var n = 0
    def walk(item: PObj, depth: Int): Unit = {
      var cur = item
      var guard = 0
      while (guard < 4096 && n < 4096) {
        guard += 1
        val d = (cur match {
          case r @ PRef(num, _) =>
            if (!seen.add(num)) return
            doc.deref(r)
          case o => Some(o)
        }).collect { case x: PDict => x }.getOrElse(return)
        d.m.get("Title").flatMap {
          case PStr(b) => Some(decodePdfString(b))
          case r: PRef => doc.deref(r).collect { case PStr(b) => decodePdfString(b) }
          case _       => None
        }.filter(_.nonEmpty).foreach { t => out += t; n += 1 }
        if (depth < 32) d.m.get("First").foreach(walk(_, depth + 1))
        d.m.get("Next") match {
          case Some(nx) => cur = nx
          case None     => return
        }
      }
    }
    for {
      root <- doc.root
      ol <- doc.deref(root.m.getOrElse("Outlines", PNull))
        .collect { case d: PDict => d }
      first <- ol.m.get("First")
    } walk(first, 0)
    out.result()
  }

  /** Embedded-file (attachment) names from the /Names /EmbeddedFiles
    * name tree — surfaced as metadata only (names + count), mirroring
    * the EML/MSG attachment convention: the reference's default parse
    * does not inline attachment content either.
    */
  private def embeddedFileNames(doc: Doc): Vector[String] = {
    val out = Vector.newBuilder[String]
    val seen = scala.collection.mutable.Set[Int]()
    def fileName(spec: PObj): Option[String] =
      doc.deref(spec).collect { case d: PDict => d }.flatMap { d =>
        d.m.get("UF").orElse(d.m.get("F")).flatMap {
          case PStr(b) => Some(decodePdfString(b))
          case r: PRef => doc.deref(r).collect { case PStr(b) => decodePdfString(b) }
          case _       => None
        }
      }
    def walk(node: PObj, depth: Int): Unit = {
      if (depth > 16) return
      node match {
        case PRef(num, _) if !seen.add(num) => return
        case _                              => ()
      }
      doc.deref(node).collect { case d: PDict => d }.foreach { d =>
        d.m.get("Names").flatMap(doc.deref) match {
          case Some(PArr(items)) =>
            // alternating (name string, filespec) pairs
            var i = 0
            while (i + 1 < items.length) {
              val label = doc.deref(items(i)).collect {
                case PStr(b) => decodePdfString(b)
              }
              out += fileName(items(i + 1)).orElse(label).getOrElse("")
              i += 2
            }
          case _ => ()
        }
        d.m.get("Kids").flatMap(doc.deref) match {
          case Some(PArr(kids)) => kids.foreach(walk(_, depth + 1))
          case _                => ()
        }
      }
    }
    for {
      root <- doc.root
      names <- doc.deref(root.m.getOrElse("Names", PNull))
        .collect { case d: PDict => d }
      ef <- names.m.get("EmbeddedFiles")
    } walk(ef, 0)
    out.result().filter(_.nonEmpty)
  }

  /** XMP metadata stream (/Root /Metadata, the ISO 16684 packet real
    * producers embed alongside the Info dict): dc:title / dc:creator /
    * dc:description from the first rdf:li of each. Matching is by local
    * name inside the dc element (the packet's namespace story is fixed
    * in practice). Returns raw field -> value; the caller merges with
    * Info-wins precedence — dc:description has no Info counterpart, so
    * XMP is its only source.
    */
  private def xmpMetadata(doc: Doc): Map[String, String] = {
    val xmlOpt = for {
      root <- doc.root
      s <- doc.deref(root.m.getOrElse("Metadata", PNull))
        .collect { case s: PStream => s }
    } yield doc.decodeStream(s)
    xmlOpt match {
      case Some(xml) if xml.nonEmpty =>
        try {
          import javax.xml.stream.XMLStreamConstants._
          val r = OoxmlUtil.factory.createXMLStreamReader(
            new java.io.ByteArrayInputStream(xml))
          var out = Map.empty[String, String]
          var cur: String = null
          var inLi = false
          val buf = new StringBuilder
          while (r.hasNext) {
            r.next() match {
              case START_ELEMENT =>
                val ln = r.getLocalName
                if (ln == "title" || ln == "creator" || ln == "description")
                  cur = ln
                else if (ln == "li" && cur != null) { inLi = true; buf.setLength(0) }
              case CHARACTERS | CDATA => if (inLi) buf.append(r.getText)
              case END_ELEMENT =>
                val ln = r.getLocalName
                if (ln == "li" && inLi) {
                  inLi = false
                  if (cur != null && buf.nonEmpty && !out.contains(cur))
                    out += (cur -> buf.toString)
                } else if (ln == cur) cur = null
              case _ => ()
            }
          }
          r.close()
          out
        } catch { case _: Exception => Map.empty }
      case _ => Map.empty
    }
  }

  /** One page's (lines, text-with-layout, unmapped-glyph count). Text =
    * "\n" + lines joined by "\n" (blank line inserted at paragraph-sized
    * leading gaps) + "\n".
    */
  private def pageText(doc: Doc, page: PDict): (Vector[String], String, Int) = {
    val fonts: Map[String, Font] = (for {
      res   <- doc.deref(page.m.getOrElse("Resources", PNull)).collect { case d: PDict => d }
      fdict <- doc.deref(res.m.getOrElse("Font", PNull)).collect { case d: PDict => d }
    } yield fdict.m.map { case (fname, fref) =>
      fname -> loadFont(doc, doc.deref(fref).collect { case d: PDict => d }.getOrElse(PDict(Map.empty)))
    }).getOrElse(Map.empty)

    // multi-part contents assemble in one pass with a hard size bound
    // (fuzzing found the quadratic fold + unbounded concat: 20 refs to a
    // 64 MiB stream OOM'd the old code)
    val MaxPageContent = 64 << 20
    val content: Array[Byte] = doc.deref(page.m.getOrElse("Contents", PNull)) match {
      case Some(s: PStream) =>
        val d = doc.decodeStream(s)
        if (d.length > MaxPageContent) java.util.Arrays.copyOf(d, MaxPageContent) else d
      case Some(PArr(items)) =>
        val out = new java.io.ByteArrayOutputStream()
        items.iterator
          .flatMap(it => doc.deref(it).collect { case s: PStream => s })
          .takeWhile(_ => out.size() < MaxPageContent)
          .foreach { s =>
            val d = doc.decodeStream(s)
            val room = MaxPageContent - out.size()
            out.write('\n')
            out.write(d, 0, math.min(d.length, room))
          }
        out.toByteArray
      case _ => Array.emptyByteArray
    }

    val interp = new ContentInterp(fonts)
    val items = interp.run(content)
    val (lines, text) = assemble(items)
    (lines, text, interp.unmappedGlyphs)
  }

  /** A positioned text run in device space. */
  final case class Run(x: Double, y: Double, size: Double, text: String)

  private def assemble(items: Vector[Run]): (Vector[String], String) = {
    if (items.isEmpty) return (Vector.empty, "")
    // Group runs into lines by y with tolerance proportional to font size.
    val sorted = items.sortBy(r => (-r.y, r.x))
    val lines = Vector.newBuilder[(Double, Vector[Run])]
    var curY = sorted.head.y
    var cur = Vector.newBuilder[Run]
    for (r <- sorted) {
      val tol = math.max(2.0, r.size * 0.4)
      if (math.abs(r.y - curY) <= tol) cur += r
      else {
        lines += ((curY, cur.result().sortBy(_.x)))
        curY = r.y
        cur = Vector.newBuilder[Run]
        cur += r
      }
    }
    lines += ((curY, cur.result().sortBy(_.x)))
    val ls = lines.result()
    // join runs left-to-right; insert a synthetic space when a positive
    // x-gap remains after a (deliberately generous) width estimate of the
    // previous run — covers PDFs that position words via Td/Tm instead of
    // space glyphs, while never double-spacing runs that carry their own
    // spaces (the estimate overshoots, so touching runs never gap)
    val lineTexts = ls.map { case (_, runs) =>
      val sb = new StringBuilder
      var prevEnd = Double.NegativeInfinity
      runs.foreach { r =>
        if (sb.nonEmpty && r.x - prevEnd > 0.3 * r.size &&
            !sb.last.isWhitespace && !r.text.head.isWhitespace)
          sb.append(' ')
        sb.append(r.text)
        prevEnd = r.x + r.text.length * 0.5 * r.size
      }
      sb.toString
    }
    // Paragraph breaks: leading gap noticeably larger than the median gap.
    val gaps = ls.sliding(2).collect { case Vector((y1, _), (y2, _)) => y1 - y2 }.toVector
    val medGap = if (gaps.nonEmpty) gaps.sorted.apply(gaps.length / 2) else 0.0
    val sb = new StringBuilder("\n")
    var i = 0
    while (i < lineTexts.length) {
      if (i > 0) {
        sb.append('\n')
        if (medGap > 0 && gaps(i - 1) > medGap * 1.5) sb.append('\n')
      }
      sb.append(lineTexts(i))
      i += 1
    }
    sb.append('\n')
    (lineTexts, sb.toString)
  }

  // ---------------------------------------------------------------- fonts
  final case class Font(toUnicode: Map[Int, String], twoByte: Boolean) {
    // 1-byte fast path: array-indexed glyph map (null = unmapped) —
    // avoids a boxed Map lookup per glyph in the hot decode loop
    val oneByte: Array[String] =
      if (twoByte) null
      else {
        val a = new Array[String](256)
        toUnicode.foreach { case (k, v) => if (k >= 0 && k < 256) a(k) = v }
        a
      }
    val hasMap: Boolean = toUnicode.nonEmpty
  }

  private def loadFont(doc: Doc, fd: PDict): Font = {
    val twoByte = fd.m.get("Subtype").collect { case PName(s) => s }.contains("Type0")
    val cmap = doc.deref(fd.m.getOrElse("ToUnicode", PNull)) match {
      case Some(s: PStream) => parseCMap(doc.decodeStream(s))
      case _                => Map.empty[Int, String]
    }
    if (cmap.nonEmpty || twoByte) Font(cmap, twoByte)
    else {
      // no ToUnicode: simple fonts map through /Encoding — a base
      // encoding (WinAnsi == cp1252; Standard/MacRoman approximate to
      // it, documented subset) overridden by /Differences glyph names.
      // This is how most real single-byte-font PDFs carry their text.
      doc.deref(fd.m.getOrElse("Encoding", PNull)) match {
        case Some(PName(_)) => Font(winAnsiTable, twoByte = false)
        case Some(d: PDict) =>
          var table = winAnsiTable
          doc.deref(d.m.getOrElse("Differences", PNull)) match {
            case Some(PArr(items)) =>
              var code = -1
              items.foreach {
                case PNum(v) if v >= 0 && v <= 255 => code = v.toInt
                case PName(n) if code >= 0 && code <= 255 =>
                  glyphToText(n).foreach(t => table += (code -> t))
                  code += 1
                case _ => ()
              }
            case _ => ()
          }
          Font(table, twoByte = false)
        case _ => Font(Map.empty, twoByte = false)
      }
    }
  }

  /** WinAnsiEncoding (≡ windows-1252) as code -> text for the printable
    * range; undefined cp1252 slots stay unmapped (they count as
    * unmapped glyphs, like PDFBox's .notdef handling).
    */
  private lazy val winAnsiTable: Map[Int, String] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    (0x20 to 0xff).flatMap { code =>
      val s = new String(Array(code.toByte), cs)
      if (s.length == 1 && s.charAt(0) != 0xfffd.toChar) Some(code -> s) else None
    }.toMap
  }

  /** Adobe Glyph List subset for /Differences resolution: the ASCII
    * block by name, the Latin-1/cp1252 names, and the uniXXXX / uXXXXXX
    * algorithmic forms (AGL specification rules).
    */
  private def glyphToText(name: String): Option[String] =
    GlyphNames.get(name).orElse {
      if (name.startsWith("uni") && name.length >= 7)
        hexChar(name.substring(3, 7))
      else if (name.startsWith("u") && (name.length == 5 || name.length == 7))
        hexChar(name.substring(1))
      else None
    }

  private def hexChar(h: String): Option[String] =
    try {
      val cp = Integer.parseInt(h, 16)
      if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
        Some(new String(Character.toChars(cp)))
      else None
    } catch { case _: NumberFormatException => None }

  private lazy val GlyphNames: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    for (c <- 'A' to 'Z') b += (c.toString -> c.toString)
    for (c <- 'a' to 'z') b += (c.toString -> c.toString)
    b ++= Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
      "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "exclamdown" -> "¡", "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
      "section" -> "§", "copyright" -> "©", "ordfeminine" -> "ª",
      "guillemotleft" -> "«", "registered" -> "®", "degree" -> "°",
      "plusminus" -> "±", "mu" -> "µ", "paragraph" -> "¶",
      "periodcentered" -> "·", "ordmasculine" -> "º", "guillemotright" -> "»",
      "onequarter" -> "¼", "onehalf" -> "½", "threequarters" -> "¾",
      "questiondown" -> "¿",
      "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â", "Atilde" -> "Ã",
      "Adieresis" -> "Ä", "Aring" -> "Å", "AE" -> "Æ", "Ccedilla" -> "Ç",
      "Egrave" -> "È", "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
      "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î", "Idieresis" -> "Ï",
      "Eth" -> "Ð", "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
      "Ocircumflex" -> "Ô", "Otilde" -> "Õ", "Odieresis" -> "Ö", "Oslash" -> "Ø",
      "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û", "Udieresis" -> "Ü",
      "Yacute" -> "Ý", "Thorn" -> "Þ", "germandbls" -> "ß",
      "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â", "atilde" -> "ã",
      "adieresis" -> "ä", "aring" -> "å", "ae" -> "æ", "ccedilla" -> "ç",
      "egrave" -> "è", "eacute" -> "é", "ecircumflex" -> "ê", "edieresis" -> "ë",
      "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
      "eth" -> "ð", "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
      "ocircumflex" -> "ô", "otilde" -> "õ", "odieresis" -> "ö", "oslash" -> "ø",
      "ugrave" -> "ù", "uacute" -> "ú", "ucircumflex" -> "û", "udieresis" -> "ü",
      "yacute" -> "ý", "thorn" -> "þ", "ydieresis" -> "ÿ",
      "OE" -> "Œ", "oe" -> "œ", "Scaron" -> "Š", "scaron" -> "š",
      "Zcaron" -> "Ž", "zcaron" -> "ž", "Ydieresis" -> "Ÿ", "florin" -> "ƒ",
      "circumflex" -> "ˆ", "tilde" -> "˜", "endash" -> "–", "emdash" -> "—",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotesinglbase" -> "‚", "quotedblleft" -> "“",
      "quotedblright" -> "”", "quotedblbase" -> "„", "dagger" -> "†",
      "daggerdbl" -> "‡", "bullet" -> "•", "ellipsis" -> "…",
      "perthousand" -> "‰", "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "Euro" -> "€", "trademark" -> "™")
    b.result()
  }

  /** ToUnicode CMap: codespacerange ignored (we key on code ints),
    * bfchar + bfrange (incremental and array-destination forms).
    */
  def parseCMap(data: Array[Byte]): Map[Int, String] = {
    val toks = new Lexer(data).allTokens()
    val m = Map.newBuilder[Int, String]
    var i = 0
    def hexInt(o: PObj): Option[Int] = o match {
      case PStr(b) =>
        Some(b.foldLeft(0)((acc, x) => (acc << 8) | (x & 0xff)))
      case PNum(v) => Some(v.toInt)
      case _       => None
    }
    def hexStr(o: PObj): Option[String] = o match {
      case PStr(b) if b.length % 2 == 0 =>
        val cs = new Array[Char](b.length / 2)
        var k = 0
        while (k < cs.length) {
          cs(k) = (((b(2 * k) & 0xff) << 8) | (b(2 * k + 1) & 0xff)).toChar
          k += 1
        }
        Some(new String(cs))
      case PStr(b) => Some(new String(b, StandardCharsets.ISO_8859_1))
      case _       => None
    }
    while (i < toks.length) {
      toks(i) match {
        case POp("beginbfchar") =>
          var j = i + 1
          while (j + 1 < toks.length && toks(j) != POp("endbfchar")) {
            for (src <- hexInt(toks(j)); dst <- hexStr(toks(j + 1))) m += (src -> dst)
            j += 2
          }
          i = j
        case POp("beginbfrange") =>
          var j = i + 1
          while (j + 2 < toks.length && toks(j) != POp("endbfrange")) {
            (toks(j), toks(j + 1), toks(j + 2)) match {
              case (lo, hi, PArr(dsts)) =>
                for (l <- hexInt(lo); h <- hexInt(hi)) {
                  var c = l
                  var k = 0
                  while (c <= h && k < dsts.length) {
                    hexStr(dsts(k)).foreach(s => m += (c -> s))
                    c += 1; k += 1
                  }
                }
              case (lo, hi, dst) =>
                for (l <- hexInt(lo); h <- hexInt(hi); d0 <- hexStr(dst)) {
                  var c = l
                  while (c <= h) {
                    val add = c - l
                    val s =
                      if (d0.isEmpty) ""
                      else d0.init + (d0.last + add).toChar
                    m += (c -> s)
                    c += 1
                  }
                }
            }
            j += 3
          }
          i = j
        case _ => ()
      }
      i += 1
    }
    m.result()
  }

  // ----------------------------------------------------- content interp
  /** 2D affine matrix [a b c d e f]. */
  final case class Mat(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double) {
    def *(o: Mat): Mat = Mat(
      a * o.a + b * o.c, a * o.b + b * o.d,
      c * o.a + d * o.c, c * o.b + d * o.d,
      e * o.a + f * o.c + o.e, e * o.b + f * o.d + o.f)
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
    def scaleY: Double = math.sqrt(b * b + d * d)
  }
  object Mat { val I = Mat(1, 0, 0, 1, 0, 0) }

  private final class ContentInterp(fonts: Map[String, Font]) {
    private var ctm = Mat.I
    private val ctmStack = scala.collection.mutable.Stack[Mat]()
    private var tm = Mat.I    // text matrix
    private var tlm = Mat.I   // text line matrix
    private var font: Font = Font(Map.empty, twoByte = false)
    private var fontSize = 12.0
    private var leading = 0.0
    private var inText = false
    private val out = Vector.newBuilder[Run]

    def run(content: Array[Byte]): Vector[Run] = {
      // stream tokens (never materialize the token list: fuzzing showed
      // corrupted FlateDecode data can inflate to tens of MB of garbage
      // that would lex into tens of millions of tokens)
      val lex = new Lexer(content, contentMode = true)
      val stack = scala.collection.mutable.ArrayBuffer[PObj]()
      val maxOps = 16 << 20
      var n = 0
      var tok = lex.next()
      while (tok.isDefined && n < maxOps) {
        tok.get match {
          case POp("ID") =>
            // inline image: raw bytes follow until EI — skip them
            lex.skipInlineImage(); stack.clear()
          case POp(op) => exec(op, stack); stack.clear()
          case o =>
            stack += o
            if (stack.length > 4096) stack.clear() // garbage guard
        }
        n += 1
        tok = lex.next()
      }
      out.result()
    }

    private def num(o: PObj): Double = o match { case PNum(v) => v; case _ => 0.0 }

    private def exec(op: String, st: scala.collection.mutable.ArrayBuffer[PObj]): Unit = op match {
      case "q" => ctmStack.push(ctm)
      case "Q" => if (ctmStack.nonEmpty) ctm = ctmStack.pop()
      case "cm" if st.length >= 6 =>
        ctm = Mat(num(st(0)), num(st(1)), num(st(2)), num(st(3)), num(st(4)), num(st(5))) * ctm
      case "BT" => inText = true; tm = Mat.I; tlm = Mat.I
      case "ET" => inText = false
      case "Tf" if st.length >= 2 =>
        st(0) match {
          case PName(f) => font = fonts.getOrElse(f, Font(Map.empty, twoByte = false))
          case _        => ()
        }
        fontSize = num(st(1))
      case "Tm" if st.length >= 6 =>
        tm = Mat(num(st(0)), num(st(1)), num(st(2)), num(st(3)), num(st(4)), num(st(5)))
        tlm = tm
      case "Td" if st.length >= 2 =>
        tlm = Mat(1, 0, 0, 1, num(st(0)), num(st(1))) * tlm; tm = tlm
      case "TD" if st.length >= 2 =>
        leading = -num(st(1))
        tlm = Mat(1, 0, 0, 1, num(st(0)), num(st(1))) * tlm; tm = tlm
      case "TL" if st.length >= 1 => leading = num(st(0))
      case "T*" =>
        tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm
      case "Tj" if st.length >= 1 => show(st(0))
      case "'" if st.length >= 1 =>
        tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm; show(st(0))
      case "\"" if st.length >= 3 =>
        tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm; show(st(2))
      case "TJ" if st.length >= 1 =>
        st(0) match {
          case PArr(items) =>
            val sb = new StringBuilder
            items.foreach {
              case s: PStr             => sb.append(decode(s))
              case PNum(v) if v < -180 => sb.append(' ') // big negative kern = word gap
              case _                   => ()
            }
            emit(sb.toString)
          case _ => ()
        }
      case _ => () // drawing/color/etc: no text effect
    }

    private def show(o: PObj): Unit = o match {
      case s: PStr => emit(decode(s))
      case _       => ()
    }

    /** Glyph codes a declared ToUnicode CMap failed to map (the per-page
      * average feeds pdf:unmappedUnicodeCharsPerPage, reference:
      * lib/rika.rb:92-95). Fonts without any CMap decode via the simple
      * byte encoding and are not counted as unmapped.
      */
    var unmappedGlyphs: Int = 0

    private def decode(s: PStr): String = {
      val b = s.bytes
      val sb = new StringBuilder
      if (font.twoByte) {
        var i = 0
        while (i + 1 < b.length) {
          val code = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
          font.toUnicode.get(code) match {
            case Some(u) => sb.append(u)
            case None =>
              if (font.toUnicode.nonEmpty) unmappedGlyphs += 1
              sb.append(code.toChar)
          }
          i += 2
        }
      } else {
        var i = 0
        while (i < b.length) {
          val code = b(i) & 0xff
          val u = font.oneByte(code)
          if (u != null) sb.append(u)
          else {
            if (font.hasMap) unmappedGlyphs += 1
            sb.append(code.toChar) // ISO-8859-1: byte k == char k
          }
          i += 1
        }
      }
      sb.toString
    }

    private def emit(text: String): Unit = {
      if (inText && text.nonEmpty) {
        val trm = tm * ctm
        val (x, y) = trm.apply(0, 0)
        out += Run(x, y, fontSize * trm.scaleY, text)
      }
    }
  }

  // -------------------------------------------------------------- lexer
  /** PDF object/token lexer over a byte array. In contentMode bare
    * identifiers become POp tokens (content-stream operators).
    */
  final class Lexer(data: Array[Byte], contentMode: Boolean = false) {
    var pos = 0
    private val n = data.length
    // fuzz hardening: corrupted FlateDecode garbage can lex forever or
    // nest arbitrarily deep — bounded token budget + structure depth
    private var budget: Long = 8L << 20
    private var depth = 0

    def allTokens(): Vector[PObj] = {
      val out = Vector.newBuilder[PObj]
      var t = next()
      while (t.isDefined) { out += t.get; t = next() }
      out.result()
    }

    @inline private def ws(b: Int): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
    @inline private def delim(b: Int): Boolean =
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

    def skipWs(): Unit = {
      var go = true
      while (go && pos < n) {
        val b = data(pos) & 0xff
        if (ws(b)) pos += 1
        else if (b == '%') { while (pos < n && data(pos) != '\n'.toByte) pos += 1 }
        else go = false
      }
    }

    /** After an inline-image ID operator (ISO 32000 §8.9.7): skip the
      * raw sample bytes to the whitespace-delimited EI, leaving the
      * lexer just past it. Without this, binary payload (which can hold
      * unbalanced parens) would lex as garbage and derail text
      * extraction for the rest of the stream.
      */
    def skipInlineImage(): Unit = {
      if (pos < n && ws(data(pos) & 0xff)) pos += 1 // the byte after ID
      var i = pos
      while (i + 1 < n) {
        if (data(i) == 'E' && data(i + 1) == 'I' &&
          (i == pos || ws(data(i - 1) & 0xff)) &&
          (i + 2 >= n || ws(data(i + 2) & 0xff) || delim(data(i + 2) & 0xff))) {
          pos = i + 2
          return
        }
        i += 1
      }
      pos = n
    }

    def next(): Option[PObj] = {
      skipWs()
      if (pos >= n) return None
      budget -= 1
      if (budget <= 0) { pos = n; return None }
      val b = data(pos) & 0xff
      b match {
        case '(' => Some(string())
        case '<' =>
          if (pos + 1 < n && data(pos + 1) == '<'.toByte) {
            pos += 2
            if (depth > 64) Some(PNull) // contents re-lexed flat; harmless
            else { depth += 1; val d = dict(); depth -= 1; Some(d) }
          }
          else Some(hexString())
        case '[' if depth > 64 => pos += 1; Some(PNull)
        case '[' =>
          pos += 1
          depth += 1
          val items = Vector.newBuilder[PObj]
          var count = 0
          skipWs()
          // item cap: corrupted streams can open an array that never
          // closes — collect a bounded prefix, keep scanning to the end
          while (pos < n && data(pos) != ']'.toByte) {
            val o = next()
            if (count < 65536) { o.foreach(items += _); count += 1 }
            skipWs()
          }
          pos += 1
          depth -= 1
          Some(PArr(items.result()))
        case ']' | '>' | '}' | ')' => pos += 1; next()
        case '/' => Some(name())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          Some(numberOrRef())
        case _ => Some(keyword())
      }
    }

    private def dict(): PObj = {
      val m = Map.newBuilder[String, PObj]
      var go = true
      while (go) {
        skipWs()
        if (pos + 1 < n && data(pos) == '>'.toByte && data(pos + 1) == '>'.toByte) {
          pos += 2; go = false
        } else if (pos >= n) go = false
        else {
          (next(), { skipWs(); next() }) match {
            case (Some(PName(k)), Some(v)) => m += (k -> v)
            case _                         => go = false
          }
        }
      }
      PDict(m.result())
    }

    private def string(): PObj = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < n && depth > 0) {
        val c = data(pos) & 0xff
        if (c == '\\' && pos + 1 < n) {
          pos += 1
          val e = data(pos) & 0xff
          e match {
            case 'n'  => out.write('\n'); pos += 1
            case 'r'  => out.write('\r'); pos += 1
            case 't'  => out.write('\t'); pos += 1
            case 'b'  => out.write('\b'); pos += 1
            case 'f'  => out.write('\f'); pos += 1
            case '('  => out.write('('); pos += 1
            case ')'  => out.write(')'); pos += 1
            case '\\' => out.write('\\'); pos += 1
            case '\r' => pos += 1; if (pos < n && data(pos) == '\n'.toByte) pos += 1
            case '\n' => pos += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0
              while (k < 3 && pos < n && data(pos) >= '0'.toByte && data(pos) <= '7'.toByte) {
                v = v * 8 + (data(pos) - '0'.toByte); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); pos += 1
          }
        } else if (c == '(') { depth += 1; out.write(c); pos += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); pos += 1 }
        else { out.write(c); pos += 1 }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PObj = {
      pos += 1
      val hex = new StringBuilder
      while (pos < n && data(pos) != '>'.toByte) {
        val c = (data(pos) & 0xff).toChar
        if (!ws(c)) hex.append(c)
        pos += 1
      }
      pos += 1
      if (hex.length % 2 == 1) hex.append('0')
      val out = new Array[Byte](hex.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      PStr(out)
    }

    private def name(): PObj = {
      pos += 1
      val sb = new StringBuilder
      while (pos < n && !ws(data(pos) & 0xff) && !delim(data(pos) & 0xff)) {
        val c = data(pos) & 0xff
        if (c == '#' && pos + 2 < n) {
          sb.append(Integer.parseInt(
            new String(data, pos + 1, 2, StandardCharsets.ISO_8859_1), 16).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def numberOrRef(): PObj = {
      val start = pos
      while (pos < n && !ws(data(pos) & 0xff) && !delim(data(pos) & 0xff)) pos += 1
      // allocation-free parse of the PDF number grammar [+-]?d*[.d*];
      // anything else (malformed token) falls back to 0.0 like before
      var v = 0.0
      var sawDot = false
      locally {
        var i = start
        var neg = false
        var ok = i < pos
        if (ok && (data(i) == '+' || data(i) == '-')) { neg = data(i) == '-'; i += 1 }
        var intPart = 0.0
        var frac = 0.0
        var scale = 0.1
        var digits = 0
        while (i < pos && ok) {
          val c = data(i)
          if (c >= '0' && c <= '9') {
            if (sawDot) { frac += (c - '0') * scale; scale *= 0.1 }
            else intPart = intPart * 10 + (c - '0')
            digits += 1
          } else if (c == '.' && !sawDot) sawDot = true
          else ok = false
          i += 1
        }
        if (ok && digits > 0) v = if (neg) -(intPart + frac) else intPart + frac
        else if (!ok) { sawDot = false; v = 0.0 }
      }
      // object reference lookahead: "<int> <int> R"
      if (!contentMode && v >= 0 && v == math.floor(v) && !sawDot) {
        val save = pos
        skipWs()
        val s2 = pos
        while (pos < n && (data(pos) >= '0'.toByte && data(pos) <= '9'.toByte)) pos += 1
        if (pos > s2) {
          val gen = new String(data, s2, pos - s2, StandardCharsets.ISO_8859_1).toInt
          val save2 = pos
          skipWs()
          if (pos < n && data(pos) == 'R'.toByte &&
              (pos + 1 >= n || ws(data(pos + 1) & 0xff) || delim(data(pos + 1) & 0xff))) {
            pos += 1
            return PRef(v.toInt, gen)
          }
          pos = save2
          pos = save // not a ref: rewind fully
        } else pos = save
      }
      PNum(v)
    }

    private def keyword(): PObj = {
      val start = pos
      while (pos < n && !ws(data(pos) & 0xff) && !delim(data(pos) & 0xff)) pos += 1
      val s = new String(data, start, pos - start, StandardCharsets.ISO_8859_1)
      s match {
        case "true"  => PBool(true)
        case "false" => PBool(false)
        case "null"  => PNull
        case other   => POp(other)
      }
    }
  }

  // --------------------------------------------------------------- index
  /** Document object index: brute scan for "N G obj" headers — robust to
    * damaged/absent xref tables (also covers xref-stream PDFs without
    * parsing them). Objects parsed lazily and memoized.
    */
  private final class Doc(val bytes: Array[Byte]) {
    private val raw = new String(bytes, StandardCharsets.ISO_8859_1)

    // ---- primary index: cross-reference stream chain -------------------
    // startxref -> /Type /XRef stream(s) (W-column records, Index
    // sections, /Prev chain), decoded through the real filter pipeline —
    // including the PNG /Predictor row coding that virtually every
    // modern producer applies to xref streams. Every type-1 offset is
    // validated against its "N G obj" header byte-for-byte; ANY mismatch
    // discards the whole chain (index integrity beats coverage) and the
    // brute header scan below takes over. Newest-section entries win
    // across the /Prev chain (incremental updates). Classic xref-table
    // PDFs intentionally stay on the brute path: it is already robust
    // for them and needs no table parse.

    /** One xref stream at `off`: (type-1 entries (num, offset, gen),
      * stream dict, /Prev or -1).
      */
    private def parseXrefStreamAt(off: Int): Option[(Seq[(Int, Int, Int)], Map[String, PObj], Long)] = {
      if (off < 0 || off + 4 >= bytes.length) return None
      // the offset must land on a "N G obj" header for the stream object
      val headEnd = raw.indexOf("obj", off)
      if (headEnd < 0 || headEnd - off > 64) return None
      val lex = new Lexer(bytes)
      lex.pos = headEnd + 3
      lex.next() match {
        case Some(d: PDict) if d.m.get("Type").contains(PName("XRef")) =>
          lex.skipWs()
          if (!raw.startsWith("stream", lex.pos)) return None
          var p = lex.pos + "stream".length
          if (p < bytes.length && bytes(p) == '\r'.toByte) p += 1
          if (p < bytes.length && bytes(p) == '\n'.toByte) p += 1
          // /Length must be direct here (obj() is not built yet); an
          // indirect Length falls back to the endstream scan
          val len = d.m.get("Length") match {
            case Some(PNum(v)) if v >= 0 => v.toInt
            case _ =>
              val e = raw.indexOf("endstream", p)
              if (e < 0) return None else e - p
          }
          val rawData = java.util.Arrays.copyOfRange(bytes, p,
            math.min(p.toLong + len, bytes.length.toLong).toInt)
          val filters: Seq[String] = d.m.get("Filter") match {
            case Some(PName(f)) => Seq(f)
            case Some(PArr(fs)) => fs.collect { case PName(f) => f }
            case _              => Seq.empty
          }
          def intParms(m: Map[String, PObj]): Map[String, Int] =
            m.collect { case (k, PNum(x)) => k -> x.toInt }
          val parms: Seq[Map[String, Int]] =
            d.m.get("DecodeParms").orElse(d.m.get("DP")) match {
              case Some(PDict(m)) => Seq(intParms(m))
              case Some(PArr(ps)) => ps.map {
                case PDict(m) => intParms(m)
                case _        => Map.empty[String, Int]
              }
              case _ => Seq.empty
            }
          val data = PdfKernel.decodeFilters(rawData, filters, parms)
          val wArr = d.m.get("W") match {
            case Some(PArr(ws)) => ws.collect { case PNum(v) => v.toInt }
            case _              => return None
          }
          if (wArr.length < 3 || wArr.exists(w => w < 0 || w > 8)) return None
          val size = d.m.get("Size") match {
            case Some(PNum(v)) if v > 0 && v < (1 << 24) => v.toInt
            case _ => return None
          }
          val sections: Seq[(Int, Int)] = d.m.get("Index") match {
            case Some(PArr(xs)) =>
              val ns = xs.collect { case PNum(v) => v.toInt }
              if (ns.length % 2 != 0) return None
              ns.grouped(2).map { g => (g(0), g(1)) }.toSeq
            case _ => Seq((0, size))
          }
          val w1 = wArr(0); val w2 = wArr(1); val w3 = wArr(2)
          val rec = w1 + w2 + w3
          if (rec <= 0) return None
          val entries = Seq.newBuilder[(Int, Int, Int)]
          var pos = 0
          sections.foreach { case (start, count) =>
            if (count < 0 || count > (1 << 24)) return None
            var k = 0
            while (k < count && pos + rec <= data.length) {
              def fld(o: Int, w: Int, dflt: Long): Long =
                if (w == 0) dflt
                else {
                  var v = 0L
                  var j = 0
                  while (j < w) { v = (v << 8) | (data(pos + o + j) & 0xff); j += 1 }
                  v
                }
              val t = fld(0, w1, 1L) // absent type field defaults to 1
              val f2 = fld(w1, w2, 0L)
              val f3 = fld(w1 + w2, w3, 0L)
              // type 0 (free) and type 2 (inside an ObjStm) carry no
              // top-level offset; ObjStm members come in via the lazy
              // objStmObjects index (the ObjStm itself is type 1)
              if (t == 1 && f2 >= 0 && f2 < bytes.length)
                entries += ((start + k, f2.toInt, f3.toInt))
              pos += rec
              k += 1
            }
          }
          val prev = d.m.get("Prev") match {
            case Some(PNum(v)) => v.toLong
            case _             => -1L
          }
          Some((entries.result(), d.m, prev))
        case _ => None
      }
    }

    /** True iff a full "num gen obj" header sits at `off`. Validating
      * all three tokens (not just a digit run matching the number)
      * means a stale or crafted offset landing on a coincidental
      * integer — e.g. inside stream data — discards the chain and the
      * brute scan recovers the document (ADVICE r5).
      */
    private def headerMatchesAt(off: Int, num: Int, gen: Int): Boolean = {
      var p = off
      def skipWs(): Unit =
        while (p < bytes.length && (bytes(p) == ' ' || bytes(p) == '\r' ||
          bytes(p) == '\n' || bytes(p) == '\t')) p += 1
      def readInt(): Int = {
        var v = 0
        var any = false
        while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
          v = v * 10 + (bytes(p) - '0')
          if (v > (1 << 24)) return -1
          p += 1
          any = true
        }
        if (!any) -1 else v
      }
      skipWs()
      if (readInt() != num) return false
      val p1 = p
      skipWs()
      if (p == p1) return false // whitespace required between tokens
      if (readInt() != gen) return false
      val p2 = p
      skipWs()
      if (p == p2) return false
      p + 3 <= bytes.length && bytes(p) == 'o' && bytes(p + 1) == 'b' &&
        bytes(p + 2) == 'j'
    }

    private val xrefIndex: Option[(Map[Int, Int], Map[Int, Int], Map[String, PObj])] =
      try {
        val sx = raw.lastIndexOf("startxref")
        if (sx < 0) None
        else {
          var p = sx + "startxref".length
          while (p < bytes.length && (bytes(p) == ' ' || bytes(p) == '\r' ||
            bytes(p) == '\n' || bytes(p) == '\t')) p += 1
          var off = 0L
          var any = false
          while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
            off = off * 10 + (bytes(p) - '0')
            p += 1
            any = true
          }
          if (!any || off >= bytes.length) None
          else {
            val offsets = scala.collection.mutable.HashMap[Int, Int]()
            val gens = scala.collection.mutable.HashMap[Int, Int]()
            var trailerDict = Map.empty[String, PObj]
            var cur = off
            var hops = 0
            var ok = true
            val seenOff = scala.collection.mutable.Set[Long]()
            while (cur >= 0 && hops < 32 && ok && seenOff.add(cur)) {
              parseXrefStreamAt(cur.toInt) match {
                case None => ok = false
                case Some((entries, dict, prevOff)) =>
                  if (hops == 0) trailerDict = dict
                  entries.foreach { case (num, o, g) =>
                    if (!offsets.contains(num)) { offsets(num) = o; gens(num) = g }
                  }
                  cur = prevOff
                  hops += 1
              }
            }
            if (!ok || offsets.isEmpty) None
            else if (offsets.forall { case (num, o) =>
              headerMatchesAt(o, num, gens.getOrElse(num, 0)) })
              Some((offsets.toMap, gens.toMap, trailerDict))
            else None
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    // index: validated xref-stream chain when available, else one brute
    // scan building both maps (object header offsets + generations)
    private val (objOffsets, objGens): (Map[Int, Int], Map[Int, Int]) =
      xrefIndex match {
        case Some((offs, gens, _)) =>
          PdfKernel.xrefStreamDocs.incrementAndGet()
          (offs, gens)
        case None =>
          PdfKernel.bruteScanDocs.incrementAndGet()
          val mo = Map.newBuilder[Int, Int]
          val mg = Map.newBuilder[Int, Int]
          val re = java.util.regex.Pattern.compile("""(?m)^\s*(\d+)\s+(\d+)\s+obj\b""")
          val matcher = re.matcher(raw)
          while (matcher.find()) {
            val num = matcher.group(1).toInt
            mo += (num -> matcher.start())
            mg += (num -> matcher.group(2).toInt)
          }
          (mo.result(), mg.result())
      }
    private val cache = scala.collection.mutable.HashMap[Int, PObj]()

    // ---- standard security handler (empty user password) --------------
    // Initialized AFTER trailer; objects parsed during init see
    // cryptState = None (the /Encrypt dict itself is never encrypted)
    // and the cache is cleared afterwards so everything re-parses
    // decrypted. encryptedUnsupported: /Encrypt present but not openable
    // (real password, or a scheme outside V1/V2/V4-AESV2).
    private var cryptState: Option[PdfCrypt.Crypt] = None
    private var encObjNum = -1
    var encryptedUnsupported = false

    private def initCrypt(): Unit = trailer.m.get("Encrypt").foreach { encRef =>
      encryptedUnsupported = true // until proven openable
      encObjNum = encRef match { case PRef(n, _) => n; case _ => -1 }
      val enc: Map[String, PObj] = (encRef match {
        case PRef(n, _) => obj(n)
        case d: PDict   => d
        case _          => PNull
      }) match {
        case PDict(m) => m
        case _        => Map.empty
      }
      def num(k: String, dflt: Int): Int = enc.get(k) match {
        case Some(PNum(v)) => v.toInt
        case _             => dflt
      }
      def str(k: String): Array[Byte] = enc.get(k) match {
        case Some(PStr(b)) => b
        case _             => Array.emptyByteArray
      }
      if (!enc.get("Filter").contains(PName("Standard"))) return
      val v = num("V", 0)
      val r = num("R", 0)
      if (v == 5 && r == 6) { // PDF 2.0: AES-256 (AESV3)
        val cfm = for {
          cf <- enc.get("CF").collect { case PDict(m) => m }
          std <- cf.get("StdCF").collect { case PDict(m) => m }
          m <- std.get("CFM").collect { case PName(n) => n }
        } yield m
        if (!cfm.contains("AESV3")) return
        val strf5 = enc.get("StrF").collect { case PName(n) => n }.getOrElse("Identity")
        if (strf5 != "StdCF" && strf5 != "Identity") return
        PdfCrypt.r6FileKey(str("U"), str("UE")) match {
          case Some(key) =>
            cryptState = Some(PdfCrypt.Crypt(key, aes = true, v5 = true,
              strings = strf5 == "StdCF"))
            encryptedUnsupported = false
            cache.clear()
          case None => () // real password
        }
        return
      }
      if (!Set(1, 2, 4).contains(v) || r < 2 || r > 4) return
      val lengthBits = if (v == 1) 40 else num("Length", if (v == 4) 128 else 40)
      // V4: crypt filters — only the StdCF/Identity pair with CFM V2
      // (RC4) or AESV2 is supported
      var aes = false
      var strEncrypted = true
      if (v == 4) {
        val cfm = for {
          cf <- enc.get("CF").collect { case PDict(m) => m }
          std <- cf.get("StdCF").collect { case PDict(m) => m }
          m <- std.get("CFM").collect { case PName(n) => n }
        } yield m
        cfm match {
          case Some("AESV2") => aes = true
          case Some("V2")    => aes = false
          case _             => return
        }
        val stmf = enc.get("StmF").collect { case PName(n) => n }.getOrElse("Identity")
        if (stmf != "StdCF") return
        // /StrF defaults to Identity (ISO 32000 §7.6.5): strings pass
        // through verbatim while streams still decrypt with StdCF
        val strf = enc.get("StrF").collect { case PName(n) => n }.getOrElse("Identity")
        if (strf != "StdCF" && strf != "Identity") return
        strEncrypted = strf == "StdCF"
      }
      val encryptMeta = enc.get("EncryptMetadata") match {
        case Some(PBool(b)) => b
        case _              => true
      }
      val id0 = trailer.m.get("ID") match {
        case Some(PArr(PStr(b) +: _)) => b
        case _                        => Array.emptyByteArray
      }
      val o = str("O")
      val u = str("U")
      if (o.length < 32 || u.length < 16) return
      // /P is a signed 32-bit value but real producers write it as the
      // unsigned equivalent (e.g. 4294963392 for -3904); wrap rather
      // than let Double→Int saturate to Int.MaxValue (wrong file key)
      val pVal = enc.get("P") match {
        case Some(PNum(pv)) => (pv.toLong & 0xffffffffL).toInt
        case _              => -1
      }
      val key = PdfCrypt.fileKey(o, pVal, id0, r, lengthBits, encryptMeta)
      if (!PdfCrypt.verifyEmptyUser(key, r, id0, u)) return // real password
      cryptState = Some(PdfCrypt.Crypt(key, aes, strings = strEncrypted))
      encryptedUnsupported = false
      cache.clear() // re-parse everything through the decryptor
    }

    /** Decrypt every string and stream payload in a freshly-parsed
      * top-level object (strings inside object streams are NOT
      * separately encrypted — the ObjStm payload already was; XRef
      * streams are never encrypted).
      */
    private def decryptObj(c: PdfCrypt.Crypt, n: Int, g: Int, o: PObj): PObj =
      o match {
        case PStr(b)     => if (c.strings) PStr(c.decrypt(n, g, b)) else o
        case PArr(items) => PArr(items.map(decryptObj(c, n, g, _)))
        case PDict(m)    => PDict(m.map { case (k, v) => k -> decryptObj(c, n, g, v) })
        case s @ PStream(d, rawBytes) =>
          if (d.m.get("Type").contains(PName("XRef"))) s
          else PStream(decryptObj(c, n, g, d).asInstanceOf[PDict],
            c.decrypt(n, g, rawBytes))
        case other => other
      }

    /** PDF 1.5+ object streams (/Type /ObjStm): compressed objects are
      * invisible to the top-level brute scan, so every ObjStm is expanded
      * once, lazily, into this secondary index. Header = N pairs
      * "objnum offset" before /First.
      */
    private var objStmBuilding = false
    private var objStmCache: Map[Int, PObj] = null
    private def objStmObjects: Map[Int, PObj] = {
      if (objStmCache != null) return objStmCache
      if (objStmBuilding) return Map.empty // re-entrant deref during build
      objStmBuilding = true
      val m = Map.newBuilder[Int, PObj]
      objOffsets.keys.foreach { num =>
        obj(num) match {
          case s @ PStream(PDict(d), _) if d.get("Type").contains(PName("ObjStm")) =>
            try {
              val data = decodeStream(s)
              val n = d.get("N").collect { case PNum(v) => v.toInt }.getOrElse(0)
              val first = deref(d.getOrElse("First", PNull))
                .collect { case PNum(v) => v.toInt }.getOrElse(0)
              val head = new Lexer(data)
              val pairs = (0 until n).flatMap { _ =>
                (head.next(), head.next()) match {
                  case (Some(PNum(on)), Some(PNum(off))) => Some(on.toInt -> off.toInt)
                  case _ => None
                }
              }
              pairs.foreach { case (objNum, off) =>
                val lex = new Lexer(data)
                lex.pos = first + off
                lex.next().foreach(o => m += (objNum -> o))
              }
            } catch { case scala.util.control.NonFatal(_) => () }
          case _ => ()
        }
      }
      objStmCache = m.result()
      objStmBuilding = false
      objStmCache
    }

    val trailer: PDict = {
      val m = Map.newBuilder[String, PObj]
      // xref-stream PDFs carry the trailer entries (Root/Info/Encrypt/ID)
      // in the newest XRef stream dict itself; classic "trailer" blocks
      // found below override (hybrid/incremental files come later in the
      // byte stream)
      xrefIndex.foreach { case (_, _, d) =>
        m ++= (d -- Seq("Type", "W", "Index", "Length", "Filter",
          "DecodeParms", "DP", "Prev"))
      }
      var idx = raw.indexOf("trailer")
      while (idx >= 0) {
        val lex = new Lexer(bytes)
        lex.pos = idx + "trailer".length
        lex.next() match {
          case Some(PDict(d)) => m ++= d
          case _              => ()
        }
        idx = raw.indexOf("trailer", idx + 1)
      }
      var d = m.result()
      if (!d.contains("Root")) {
        // xref-stream PDFs: find the catalog by scanning objects.
        objOffsets.keys.toSeq.sorted.foreach { num =>
          if (!d.contains("Root")) obj(num) match {
            case PDict(dd) if dd.get("Type").contains(PName("Catalog")) =>
              d += ("Root" -> PRef(num, 0))
            case PStream(PDict(dd), _) if dd.get("Type").contains(PName("XRef")) =>
              dd.get("Root").foreach(r => d += ("Root" -> r))
              dd.get("Info").foreach(r => if (!d.contains("Info")) d += ("Info" -> r))
            case _ => ()
          }
        }
      }
      PDict(d)
    }

    initCrypt() // after trailer: needs /Encrypt + /ID from it

    def obj(num: Int): PObj = cache.getOrElseUpdate(num, parseObjAt(num)) match {
      case PNull if !objOffsets.contains(num) =>
        objStmObjects.getOrElse(num, PNull) // compressed object streams
      case other => other
    }

    private def parseObjAt(num: Int): PObj = {
      val parsed = parseObjRaw(num)
      cryptState match {
        case Some(c) if num != encObjNum =>
          decryptObj(c, num, objGens.getOrElse(num, 0), parsed)
        case _ => parsed
      }
    }

    private def parseObjRaw(num: Int): PObj = objOffsets.get(num) match {
      case None => PNull
      case Some(off) =>
        val lex = new Lexer(bytes)
        lex.pos = off
        lex.next(); lex.next() // obj number, generation
        lex.next() match {
          case Some(POp("obj")) => ()
          case _                => () // lexer may fold differently; tolerate
        }
        lex.skipWs()
        // after "N G obj": the object value
        val headEnd = raw.indexOf("obj", off) + 3
        lex.pos = math.max(lex.pos, headEnd)
        lex.next() match {
          case Some(d: PDict) =>
            lex.skipWs()
            if (raw.startsWith("stream", lex.pos)) {
              var p = lex.pos + "stream".length
              if (p < bytes.length && bytes(p) == '\r'.toByte) p += 1
              if (p < bytes.length && bytes(p) == '\n'.toByte) p += 1
              val len = deref(d.m.getOrElse("Length", PNull)) match {
                case Some(PNum(v)) => v.toInt
                case _ =>
                  val e = raw.indexOf("endstream", p)
                  if (e < 0) 0 else e - p
              }
              val end = math.min(p + len, bytes.length)
              PStream(d, java.util.Arrays.copyOfRange(bytes, p, end))
            } else d
          case Some(o) => o
          case None    => PNull
        }
    }

    /** Dereference with a visited-set cycle guard: a crafted ref cycle
      * ("1 0 obj 2 0 R" / "2 0 obj 1 0 R", or a self-reference) must
      * resolve to null, not StackOverflowError — a stack overflow is an
      * Error that escapes the extractor's NonFatal taxonomy and would
      * kill the whole Spark task from one poison document.
      */
    def deref(o: PObj): Option[PObj] = o match {
      case PRef(num0, _) =>
        val seen = scala.collection.mutable.Set[Int](num0)
        var cur: PObj = obj(num0)
        var done = false
        while (!done) cur match {
          case PRef(n, _) =>
            if (seen.add(n)) cur = obj(n)
            else { cur = PNull; done = true } // ref cycle: treat as missing
          case _ => done = true
        }
        Some(cur)
      case PNull => None
      case other => Some(other)
    }

    def decodeStream(s: PStream): Array[Byte] = {
      val filters: Seq[String] = deref(s.dict.m.getOrElse("Filter", PNull)) match {
        case Some(PName(f))   => Seq(f)
        case Some(PArr(fs))   => fs.collect { case PName(f) => f }
        case _                => Seq.empty
      }
      // /DecodeParms (or legacy /DP): one dict, or an array parallel to
      // the filter array; values dereferenced to plain ints
      def intParms(d: PDict): Map[String, Int] =
        d.m.flatMap { case (k, v) =>
          deref(v) match {
            case Some(PNum(x))  => Some(k -> x.toInt)
            case Some(PBool(b)) => Some(k -> (if (b) 1 else 0)) // BlackIs1 etc.
            case _              => None
          }
        }
      val parms: Seq[Map[String, Int]] =
        deref(s.dict.m.get("DecodeParms").orElse(s.dict.m.get("DP"))
            .getOrElse(PNull)) match {
          case Some(d: PDict) => Seq(intParms(d))
          case Some(PArr(ps)) => ps.map { p =>
            deref(p) match {
              case Some(d: PDict) => intParms(d)
              case _              => Map.empty[String, Int]
            }
          }
          case _ => Seq.empty
        }
      PdfKernel.decodeFilters(s.raw, filters, parms)
    }

    def pages: Vector[PDict] = {
      val rootOpt = deref(trailer.m.getOrElse("Root", PNull)).collect { case d: PDict => d }
      val pagesRoot = rootOpt.flatMap(r => deref(r.m.getOrElse("Pages", PNull)))
        .collect { case d: PDict => d }
      val out = Vector.newBuilder[PDict]
      // each referenced kid object number is walked at most once: a cyclic
      // /Kids array with multiple back-references is otherwise a traversal
      // bomb (fan-out^depth) even under a depth cap
      val seenKids = scala.collection.mutable.Set[Int]()
      def walk(node: PDict, depth: Int): Unit = {
        if (depth > 64) return
        node.m.get("Type") match {
          case Some(PName("Page")) => out += node
          case _ =>
            deref(node.m.getOrElse("Kids", PNull)) match {
              case Some(PArr(kids)) =>
                kids.foreach {
                  case r @ PRef(n, _) =>
                    if (seenKids.add(n))
                      deref(r).collect { case d: PDict => walk(d, depth + 1) }
                  case k =>
                    deref(k).collect { case d: PDict => walk(d, depth + 1) }
                }
              case _ => ()
            }
        }
      }
      pagesRoot.foreach(walk(_, 0))
      val res = out.result()
      if (res.isEmpty) {
        // fallback: any object that looks like a page
        objOffsets.keys.toSeq.sorted.foreach { num =>
          obj(num) match {
            case d: PDict if d.m.get("Type").contains(PName("Page")) => out += d
            case _ => ()
          }
        }
        out.result()
      } else res
    }

    def info: Option[PDict] =
      deref(trailer.m.getOrElse("Info", PNull)).collect { case d: PDict => d }

    def root: Option[PDict] =
      deref(trailer.m.getOrElse("Root", PNull)).collect { case d: PDict => d }
  }

  // ------------------------------------------------------------ metadata
  private def infoMetadata(doc: Doc, version: String, nPages: Int, body: String,
      unmappedGlyphs: Int): Map[String, String] = {
    var meta = Map(
      "dc:format" -> s"application/pdf; version=$version",
      "pdf:PDFVersion" -> version,
      "xmpTPg:NPages" -> nPages.toString)
    if (nPages > 0) {
      meta += ("pdf:charsPerPage" -> (body.length / nPages).toString)
      // per-page average of glyphs a ToUnicode CMap failed to map
      // (reference: lib/rika.rb:92-95; absent in metadata-only mode like
      // charsPerPage)
      meta += ("pdf:unmappedUnicodeCharsPerPage" -> (unmappedGlyphs / nPages).toString)
    }
    doc.info.foreach { d =>
      def str(k: String): Option[String] = d.m.get(k).flatMap {
        case PStr(b) => Some(decodePdfString(b))
        case _       => None
      }
      str("Title").foreach { v => meta ++= Map("dc:title" -> v, "pdf:docinfo:title" -> v) }
      str("Author").foreach { v =>
        meta ++= Map("dc:creator" -> v, "pdf:docinfo:creator" -> v)
      }
      str("Creator").foreach { v =>
        meta ++= Map("xmp:CreatorTool" -> v, "pdf:docinfo:creator_tool" -> v)
      }
      str("Producer").foreach { v =>
        meta ++= Map("pdf:producer" -> v, "pdf:docinfo:producer" -> v)
      }
      str("CreationDate").foreach { v =>
        meta += ("pdf:docinfo:created" -> v)
        pdfDateToIso(v).foreach(iso =>
          meta ++= Map("dcterms:created" -> iso, "xmp:CreateDate" -> iso))
      }
      str("ModDate").foreach { v =>
        meta += ("pdf:docinfo:modified" -> v)
        pdfDateToIso(v).foreach(iso => meta += ("dcterms:modified" -> iso))
      }
      str("Subject").foreach { v =>
        meta ++= Map("dc:subject" -> v, "pdf:docinfo:subject" -> v)
      }
      str("Keywords").foreach(v => meta += ("pdf:docinfo:keywords" -> v))
    }
    meta
  }

  /** PDF date string (ISO 32000 §7.9.4: D:YYYYMMDDHHmmSS±HH'mm' with
    * every field after the year optional) -> UTC ISO 8601, the dcterms
    * shape the reference surfaces via Tika. Unparseable -> None (the
    * raw value stays under pdf:docinfo:*).
    */
  private[graft] def pdfDateToIso(v: String): Option[String] = {
    var s = v.trim
    if (s.startsWith("D:")) s = s.substring(2)
    def num(off: Int, len: Int, dflt: Int): Int =
      if (s.length >= off + len && s.substring(off, off + len).forall(_.isDigit))
        s.substring(off, off + len).toInt
      else dflt
    if (s.length < 4 || !s.take(4).forall(_.isDigit)) return None
    val y = num(0, 4, 0); val mo = num(4, 2, 1); val d = num(6, 2, 1)
    val h = num(8, 2, 0); val mi = num(10, 2, 0); val se = num(12, 2, 0)
    var offMin = 0
    if (s.length > 14) {
      val c = s.charAt(14)
      if (c == '+' || c == '-') {
        val oh = num(15, 2, 0)
        // the minutes field may follow an apostrophe (D:...+05'30') or
        // not (D:...+0530), or be absent entirely (ADVICE r5)
        val om =
          if (s.length > 17 && s.charAt(17) == '\'') num(18, 2, 0)
          else num(17, 2, 0)
        offMin = (oh * 60 + om) * (if (c == '-') -1 else 1)
      } // 'Z' (or nothing): already UTC
    }
    if (mo < 1 || mo > 12 || d < 1 || d > 31 || h > 23 || mi > 59 || se > 60) return None
    try {
      val utc = java.time.LocalDateTime.of(y, mo, d, h, mi, math.min(59, se))
        .minusMinutes(offMin)
      Some(utc.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** PDF text string: UTF-16BE with BOM, else PDFDocEncoding (~latin-1). */
  private def decodePdfString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else new String(b, StandardCharsets.ISO_8859_1)
}
