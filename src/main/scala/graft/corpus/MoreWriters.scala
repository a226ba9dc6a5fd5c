package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

/** Deterministic writers for the round-2 format tail (RTF, ODT, EPUB,
  * TIFF, MP3/ID3) with analytically-known expected text/metadata, like
  * the other corpus writers.
  */

object RtfWriter {

  final case class Spec(title: String, author: String,
      paragraphs: Vector[String],
      // tables -> rows -> cells (\trowd/\cell/\row): one tab-joined
      // line per row, after the paragraphs
      tables: Vector[Vector[Vector[String]]] = Vector.empty)

  /** Expected extracted content: paragraphs joined by newlines (one \n
    * per \par; a blank line between paragraphs = two \par marks), then
    * table rows as tab-joined lines.
    */
  def expectedText(spec: Spec): String =
    spec.paragraphs.map(_ + "\n").mkString("\n") +
      spec.tables.flatMap(_.map(_.mkString("\t") + "\n")).mkString

  def write(spec: Spec): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '{'  => "\\{"
      case '}'  => "\\}"
      case c if c < 128 => c.toString
      case c    => // unicode escape with 1 fallback char; \uN takes a
        // SIGNED 16-bit value per spec (kernel accepts both forms)
        val n = if (c.toInt > 32767) c.toInt - 65536 else c.toInt
        s"\\u$n?"
    }
    // \info statistics (Word always emits these): deterministic from the
    // spec so KernelSpec can assert meta:word-count / meta:page-count
    val nWords = spec.paragraphs.map(_.split("\\s+").count(_.nonEmpty)).sum
    val sb = new StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0")
    sb.append("{\\fonttbl{\\f0\\froman Times New Roman;}}")
    sb.append("{\\colortbl;\\red0\\green0\\blue0;}")
    sb.append(s"{\\info{\\title ${esc(spec.title)}}{\\author ${esc(spec.author)}}")
    sb.append(s"\\nofpages1\\nofwords$nWords}")
    sb.append("{\\stylesheet{\\s0 Normal;}}")
    sb.append("\\f0\\fs24 ")
    spec.paragraphs.zipWithIndex.foreach { case (p, i) =>
      if (i > 0) sb.append("\\par ") // blank line between paragraphs
      sb.append(esc(p)).append("\\par\n")
    }
    spec.tables.foreach { rows =>
      rows.foreach { cells =>
        sb.append("\\trowd")
        cells.indices.foreach(ci => sb.append(s"\\cellx${(ci + 1) * 2000}"))
        sb.append(' ')
        cells.foreach(c => sb.append(esc(c)).append("\\cell "))
        sb.append("\\row\n")
      }
    }
    sb.append("}")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }
}

object OdtWriter {

  final case class Spec(title: String, creator: String,
      paragraphs: Vector[String],
      // tables -> rows -> cells: one tab-joined line per row (the
      // DOCX/HTML row convention), rendered after the paragraphs
      tables: Vector[Vector[Vector[String]]] = Vector.empty)

  /** Expected extracted content: paragraphs then table rows (cells
    * tab-joined), joined by \n, trailing \n (same shape as DOCX).
    */
  def expectedText(spec: Spec): String = {
    val lines = spec.paragraphs ++ spec.tables.flatMap(_.map(_.mkString("\t")))
    if (lines.isEmpty) "" else lines.mkString("", "\n", "\n")
  }

  def write(spec: Spec): Array[Byte] = {
    val contentXml = {
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      sb.append("<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" ")
      sb.append("xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\" ")
      sb.append("xmlns:table=\"urn:oasis:names:tc:opendocument:xmlns:table:1.0\">")
      sb.append("<office:body><office:text>")
      spec.paragraphs.foreach { p =>
        sb.append("<text:p>").append(DocxWriter.xmlEsc(p)).append("</text:p>")
      }
      spec.tables.foreach { rows =>
        sb.append("<table:table>")
        rows.foreach { cells =>
          sb.append("<table:table-row>")
          cells.foreach { c =>
            sb.append("<table:table-cell><text:p>")
            sb.append(DocxWriter.xmlEsc(c))
            sb.append("</text:p></table:table-cell>")
          }
          sb.append("</table:table-row>")
        }
        sb.append("</table:table>")
      }
      sb.append("</office:text></office:body></office:document-content>")
      sb.toString
    }
    // mimetype MUST be the first entry, STORED (ODF spec) — OoxmlZip
    // stores the first entry, so the magic head-window sees it verbatim
    OoxmlZip.build(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.text",
      "content.xml" -> contentXml,
      "meta.xml" -> metaXml(spec.title, spec.creator, spec.paragraphs)))
  }

  /** Shared ODF meta.xml (DC + document-statistic) — ODS/ODP reuse it. */
  private[corpus] def metaXml(title: String, creator: String,
      paragraphs: Vector[String]): String = {
    val nWords = paragraphs.map(_.split("\\s+").count(_.nonEmpty)).sum
    val nChars = paragraphs.map(_.length).sum
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
    "<office:document-meta xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
    "xmlns:meta=\"urn:oasis:names:tc:opendocument:xmlns:meta:1.0\" " +
    "xmlns:dc=\"http://purl.org/dc/elements/1.1/\"><office:meta>" +
    s"<dc:title>${DocxWriter.xmlEsc(title)}</dc:title>" +
    s"<dc:creator>${DocxWriter.xmlEsc(creator)}</dc:creator>" +
    s"""<meta:document-statistic meta:page-count="1" meta:word-count="$nWords" meta:character-count="$nChars"/>""" +
    "</office:meta></office:document-meta>"
  }
}

object OdsWriter {

  final case class Spec(title: String, creator: String,
      tables: Vector[Vector[Vector[String]]]) // table -> rows -> cells

  def expectedText(spec: Spec): String =
    spec.tables.map(_.map(_.mkString("\t")).mkString("\n"))
      .filter(_.nonEmpty).mkString("\n\n")

  def write(spec: Spec): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" ")
    sb.append("xmlns:table=\"urn:oasis:names:tc:opendocument:xmlns:table:1.0\" ")
    sb.append("xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">")
    sb.append("<office:body><office:spreadsheet>")
    spec.tables.zipWithIndex.foreach { case (rows, t) =>
      sb.append(s"""<table:table table:name="Sheet${t + 1}">""")
      rows.foreach { cells =>
        sb.append("<table:table-row>")
        cells.foreach { c =>
          sb.append("<table:table-cell office:value-type=\"string\"><text:p>")
          sb.append(DocxWriter.xmlEsc(c))
          sb.append("</text:p></table:table-cell>")
        }
        sb.append("</table:table-row>")
      }
      sb.append("</table:table>")
    }
    sb.append("</office:spreadsheet></office:body></office:document-content>")
    OoxmlZip.build(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.spreadsheet",
      "content.xml" -> sb.toString,
      "meta.xml" -> OdtWriter.metaXml(spec.title, spec.creator, Vector.empty)))
  }
}

object OdpWriter {

  final case class Spec(title: String, creator: String,
      pages: Vector[Vector[String]]) // page -> paragraphs

  def expectedText(spec: Spec): String =
    spec.pages.map(_.filter(_.nonEmpty).mkString("\n"))
      .filter(_.nonEmpty).mkString("\n\n")

  def write(spec: Spec): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" ")
    sb.append("xmlns:draw=\"urn:oasis:names:tc:opendocument:xmlns:drawing:1.0\" ")
    sb.append("xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">")
    sb.append("<office:body><office:presentation>")
    spec.pages.zipWithIndex.foreach { case (paras, i) =>
      sb.append(s"""<draw:page draw:name="page${i + 1}"><draw:frame><draw:text-box>""")
      paras.foreach(p => sb.append("<text:p>").append(DocxWriter.xmlEsc(p)).append("</text:p>"))
      sb.append("</draw:text-box></draw:frame></draw:page>")
    }
    sb.append("</office:presentation></office:body></office:document-content>")
    OoxmlZip.build(Seq(
      "mimetype" -> "application/vnd.oasis.opendocument.presentation",
      "content.xml" -> sb.toString,
      "meta.xml" -> OdtWriter.metaXml(spec.title, spec.creator, Vector.empty)))
  }
}

object EpubWriter {

  final case class Spec(title: String, creator: String,
      chapters: Vector[Vector[String]], // chapter -> paragraphs
      // reading order must come from the OPF spine, not file paths:
      // when set, chapter at SPINE position i is stored as file
      // ch{n-1-i}.xhtml, so path order is the REVERSE of reading order
      reverseNames: Boolean = false)

  /** Expected extracted content: per chapter, paragraphs joined by blank
    * lines; chapters joined by blank lines (HtmlKernel full-text blocks)
    * in SPINE order — independent of reverseNames.
    */
  def expectedText(spec: Spec): String =
    spec.chapters.map(_.mkString("\n\n")).filter(_.nonEmpty).mkString("\n\n")

  def write(spec: Spec): Array[Byte] = {
    def chapterXhtml(paras: Vector[String]): String =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<html xmlns=\"http://www.w3.org/1999/xhtml\"><head><title>c</title></head><body>" +
      paras.map(p => s"<p>${DocxWriter.xmlEsc(p)}</p>").mkString +
      "</body></html>"
    val n = spec.chapters.size
    def fileOf(i: Int): String = if (spec.reverseNames) s"ch${n - 1 - i}.xhtml" else s"ch$i.xhtml"
    val opf =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\" unique-identifier=\"id\">" +
      "<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
      s"<dc:title>${DocxWriter.xmlEsc(spec.title)}</dc:title>" +
      s"<dc:creator>${DocxWriter.xmlEsc(spec.creator)}</dc:creator>" +
      "<dc:identifier id=\"id\">graft-synth</dc:identifier>" +
      "<dc:language>en</dc:language></metadata>" +
      "<manifest>" + spec.chapters.indices.map(i =>
        s"""<item id="c$i" href="${fileOf(i)}" media-type="application/xhtml+xml"/>""").mkString +
      "</manifest><spine>" + spec.chapters.indices.map(i =>
        s"""<itemref idref="c$i"/>""").mkString + "</spine></package>"
    val container =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<container version=\"1.0\" xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
      "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" media-type=\"application/oebps-package+xml\"/>" +
      "</rootfiles></container>"
    OoxmlZip.build(Seq(
      "mimetype" -> "application/epub+zip", // stored first (EPUB OCF spec)
      "META-INF/container.xml" -> container,
      "OEBPS/content.opf" -> opf) ++
      spec.chapters.zipWithIndex.map { case (c, i) =>
        s"OEBPS/${fileOf(i)}" -> chapterXhtml(c)
      })
  }
}

object TiffWriter {

  final case class Spec(width: Int, height: Int, software: String,
      // Some(c): bilevel CCITT fax scan — c = 3 (G3; fax2d selects the
      // T4Options 2-D mode) or c = 4 (G4/MMR). The scanned-TIFF shape.
      fax: Option[Int] = None, fax2d: Boolean = false,
      // > 0: a multi-page TIFF — this many extra minimal 8x8 gray IFDs
      // chained behind the first (xmpTPg:NPages = 1 + extraPages)
      extraPages: Int = 0)

  /** The bilevel plane a fax spec encodes (packed 1 = black, MSB-first,
    * stride ceil(w/8)): thresholded deterministic noise, realistic runs.
    */
  def bilevelPlane(spec: Spec): Array[Byte] = {
    val stride = (spec.width + 7) / 8
    val px = new Array[Byte](stride * spec.height)
    var x = (spec.width * 31L) ^ (spec.height * 17L)
    var i = 0
    while (i < spec.width * spec.height) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 33) & 0xff) >= 128) {
        val cx = i % spec.width; val cy = i / spec.width
        px(cy * stride + (cx >> 3)) =
          (px(cy * stride + (cx >> 3)) | (0x80 >> (cx & 7))).toByte
      }
      i += 1
    }
    px
  }

  /** The full 8-bit gray plane this spec encodes (decode-grade: the real
    * TiffDecoder must reproduce it exactly). Fax specs expand their
    * bilevel plane to 0/255 luma.
    */
  def plane(spec: Spec): Array[Byte] = {
    if (spec.fax.isDefined) {
      val px = bilevelPlane(spec)
      val stride = (spec.width + 7) / 8
      val out = new Array[Byte](spec.width * spec.height)
      var i = 0
      while (i < out.length) {
        val cx = i % spec.width; val cy = i / spec.width
        val black = ((px(cy * stride + (cx >> 3)) >> (7 - (cx & 7))) & 1) == 1
        out(i) = if (black) 0 else 0xff.toByte
        i += 1
      }
      return out
    }
    val out = new Array[Byte](spec.width * spec.height)
    var x = (spec.width * 31L) ^ (spec.height * 17L)
    var i = 0
    while (i < out.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = ((x >>> 33) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Little-endian baseline TIFF: one IFD carrying dims, compression=none,
    * a software tag and a complete single-strip 8-bit gray plane.
    */
  def write(spec: Spec): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
    val sw = spec.software + "\u0000"
    val isFax = spec.fax.isDefined
    val strip: Array[Byte] =
      if (isFax) {
        val kk = if (spec.fax.contains(4)) -1 else if (spec.fax2d) 4 else 0
        graft.kernel.CcittFax.encode(bilevelPlane(spec), spec.width,
          spec.height, kk, byteAlign = false)
      } else plane(spec)
    val nTags = if (spec.fax.contains(3)) 11 else 10
    val ifdOff = 8
    val swOff = ifdOff + 2 + nTags * 12 + 4
    val dataOff = swOff + sw.length
    out.write('I'); out.write('I'); u16(42); u32(ifdOff)
    u16(nTags)
    def tag(id: Int, typ: Int, cnt: Int, v: Int): Unit = { u16(id); u16(typ); u32(cnt); u32(v) }
    tag(0x0100, 3, 1, spec.width)   // ImageWidth SHORT
    tag(0x0101, 3, 1, spec.height)  // ImageLength SHORT
    tag(0x0102, 3, 1, if (isFax) 1 else 8) // BitsPerSample
    tag(0x0103, 3, 1, spec.fax.getOrElse(1)) // Compression
    tag(0x0106, 3, 1, if (isFax) 0 else 1)   // Photometric (fax: WhiteIsZero)
    tag(0x0111, 4, 1, dataOff)      // StripOffsets
    tag(0x0115, 3, 1, 1)            // SamplesPerPixel
    tag(0x0116, 4, 1, spec.height)  // RowsPerStrip
    tag(0x0117, 4, 1, strip.length) // StripByteCounts
    if (spec.fax.contains(3))
      tag(0x0124, 4, 1, if (spec.fax2d) 1 else 0) // T4Options
    tag(0x0131, 2, sw.length, swOff) // Software ASCII
    u32(0) // next IFD
    out.write(sw.getBytes(StandardCharsets.US_ASCII))
    out.write(strip)
    var bytes = out.toByteArray
    // multi-page: chain extra minimal IFDs (8x8 gray, uncompressed);
    // each previous IFD's next-pointer patches to the new IFD offset
    var prevNextPtr = ifdOff + 2 + nTags * 12
    var k = 0
    while (k < spec.extraPages) {
      val pageIfd = bytes.length
      def p16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def p32(v: Int): Array[Byte] = p16(v & 0xffff) ++ p16((v >> 16) & 0xffff)
      // patch the previous chain pointer (little-endian)
      System.arraycopy(p32(pageIfd), 0, bytes, prevNextPtr, 4)
      val nT = 9
      val dataOff2 = pageIfd + 2 + nT * 12 + 4
      val b = new ByteArrayOutputStream()
      b.write(p16(nT))
      def tag2(id: Int, typ: Int, cnt: Int, v: Int): Unit = {
        b.write(p16(id)); b.write(p16(typ)); b.write(p32(cnt)); b.write(p32(v))
      }
      tag2(0x0100, 3, 1, 8); tag2(0x0101, 3, 1, 8)
      tag2(0x0102, 3, 1, 8); tag2(0x0103, 3, 1, 1)
      tag2(0x0106, 3, 1, 1); tag2(0x0111, 4, 1, dataOff2)
      tag2(0x0115, 3, 1, 1); tag2(0x0116, 4, 1, 8)
      tag2(0x0117, 4, 1, 64)
      b.write(p32(0)) // next IFD (patched on the following iteration)
      val plane2 = new Array[Byte](64)
      var x2 = (spec.width * 131L) ^ (k + 1)
      var j = 0
      while (j < 64) {
        x2 = x2 * 6364136223846793005L + 1442695040888963407L
        plane2(j) = ((x2 >>> 33) & 0xff).toByte
        j += 1
      }
      b.write(plane2)
      prevNextPtr = pageIfd + 2 + nT * 12
      bytes = bytes ++ b.toByteArray
      k += 1
    }
    bytes
  }
}

object Mp3Writer {

  final case class Spec(title: String, artist: String, album: String,
      nFrames: Int = 8,
      // > 0: VBR stream — first frame carries a Xing header with this
      // frame count (exact duration = vbrFrames * 1152 / 44100), the
      // rest cycle through different bitrates like a real VBR encode
      vbrFrames: Int = 0,
      // id3v2=false: bare frame-synced stream (no leading tag);
      // id3v1=true: 128-byte "TAG" trailer with the same fields
      id3v2: Boolean = true,
      id3v1: Boolean = false)

  /** ID3v2.3 tag + a few sync-marked dummy audio frames. */
  def write(spec: Spec): Array[Byte] = {
    def frame(id: String, text: String): Array[Byte] = {
      val data = Array(0.toByte) ++ text.getBytes(StandardCharsets.ISO_8859_1)
      val out = new ByteArrayOutputStream()
      out.write(id.getBytes(StandardCharsets.US_ASCII))
      val n = data.length
      out.write((n >> 24) & 0xff); out.write((n >> 16) & 0xff)
      out.write((n >> 8) & 0xff); out.write(n & 0xff)
      out.write(0); out.write(0) // flags
      out.write(data)
      out.toByteArray
    }
    val out = new ByteArrayOutputStream()
    if (spec.id3v2) {
      val frames = frame("TIT2", spec.title) ++ frame("TPE1", spec.artist) ++
        frame("TALB", spec.album)
      out.write("ID3".getBytes(StandardCharsets.US_ASCII))
      out.write(3); out.write(0); out.write(0) // v2.3, flags
      val size = frames.length
      out.write((size >> 21) & 0x7f); out.write((size >> 14) & 0x7f)
      out.write((size >> 7) & 0x7f); out.write(size & 0x7f)
      out.write(frames)
    }
    var x = spec.title.hashCode.toLong
    def junk(n: Int): Unit = {
      var i = 0
      while (i < n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        out.write(((x >>> 33) & 0xff).toInt)
        i += 1
      }
    }
    if (spec.vbrFrames > 0) {
      // VBR: first frame (128 kbps stereo @44.1k -> 417 bytes) carries
      // "Xing" + flags(FRAMES) + the frame count after the 32-byte side
      // info; remaining frames cycle bitrates like a real VBR encode
      val firstSize = 144 * 128000 / 44100 // 417
      out.write(0xff); out.write(0xfb); out.write(0x90); out.write(0x00)
      for (_ <- 0 until 32) out.write(0) // side info (stereo)
      out.write("Xing".getBytes(StandardCharsets.US_ASCII))
      out.write(0); out.write(0); out.write(0); out.write(1) // flags: FRAMES
      val n = spec.vbrFrames
      out.write((n >> 24) & 0xff); out.write((n >> 16) & 0xff)
      out.write((n >> 8) & 0xff); out.write(n & 0xff)
      junk(firstSize - 4 - 32 - 12) // header + side info + Xing(4+4+4)
      val cycle = Array((0x10, 32), (0x60, 80), (0x90, 128), (0xb0, 192))
      for (f <- 1 until spec.vbrFrames) {
        val (nib, kbps) = cycle(f % 4)
        out.write(0xff); out.write(0xfb); out.write(nib); out.write(0x00)
        junk(144 * kbps * 1000 / 44100 - 4)
      }
    } else {
      // CONSISTENT MPEG-1 Layer III frames: bitrate index 1 (32 kbps) at
      // 44.1 kHz -> frame size floor(144*32000/44100) = 104 bytes incl.
      // the 4-byte header, so a header-derived duration estimate
      // (audio_bytes*8/bitrate) matches the actual frame count
      for (_ <- 0 until spec.nFrames) {
        out.write(0xff); out.write(0xfb); out.write(0x10); out.write(0x00)
        junk(100)
      }
    }
    if (spec.id3v1) { // 128-byte legacy trailer
      def pad(v: String, n: Int): Array[Byte] = {
        val b = v.getBytes(StandardCharsets.ISO_8859_1).take(n)
        b ++ new Array[Byte](n - b.length)
      }
      out.write("TAG".getBytes(StandardCharsets.US_ASCII))
      out.write(pad(spec.title, 30))
      out.write(pad(spec.artist, 30))
      out.write(pad(spec.album, 30))
      out.write(pad("1999", 4))
      out.write(new Array[Byte](30)) // comment
      out.write(255)                 // genre: none
    }
    out.toByteArray
  }
}
