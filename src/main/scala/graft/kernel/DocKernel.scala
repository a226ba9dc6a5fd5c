package graft.kernel

/** E5 - legacy Word (.doc) extractor: CFB/OLE2 sector+FAT walk (regular
  * AND mini-stream), FIB parse, and BOTH text layouts — the non-complex
  * fcMin/fcMac range and the fComplex piece table (Clx/PlcPcd in the
  * 0Table/1Table stream, mixed cp1252/UTF-16LE pieces in any file
  * order) — from scratch. The reference's specs pin detection (content
  * type `application/msword` or `application/x-tika-msoffice`,
  * spec/rika/parser_spec.rb:240-243) and best-effort text; the piece
  * table is what real Word files (edited more than once) actually use.
  */
object DocKernel {

  final case class Result(text: String, isWord: Boolean,
      metadata: Map[String, String] = Map.empty)

  private[kernel] val MaxTextChars = 64 << 20

  def extract(bytes: Array[Byte]): Result =
    Cfb.parse(bytes) match {
      case None    => Result("", isWord = false)
      case Some(c) => extractFrom(c)
    }

  /** Word extraction over an already-parsed CFB (shared with the .msg
    * dispatch in Extract, which parses the container once).
    */
  def extractFrom(c: Cfb.Reader): Result = {
    c.stream("WordDocument") match {
      case None => Result("", isWord = false)
      case Some(wd) =>
        val table =
          if (fibFlag(wd, 0x0200)) c.stream("1Table").orElse(c.stream("0Table"))
          else c.stream("0Table").orElse(c.stream("1Table"))
        val meta = c.stream("SummaryInformation")
          .map(summaryInfo).getOrElse(Map.empty)
        Result(docText(wd, table), isWord = true, meta)
    }
  }

  // CFB plumbing (sector/FAT/mini-stream walk) lives in [[Cfb]] — shared
  // with the .msg kernel.

  /** OLE property set (\x05-prefixed SummaryInformation): title/subject/author/
    * last-author/appname as dc: and meta: keys — the metadata surface
    * Tika exposes for .doc (the reference delegates to it, README.md:3-8).
    */
  private[kernel] def summaryInfo(b: Array[Byte]): Map[String, String] = {
    def u16(p: Int): Int =
      if (p + 2 > b.length) -1 else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      if (p + 4 > b.length) -1L
      else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    if (u16(0) != 0xfffe) return Map.empty // byte-order mark
    val nSets = u32(24)
    if (nSets < 1) return Map.empty
    val secOff = u32(44) // first section offset (after 16-byte FMTID at 28)
    if (secOff < 0 || secOff + 8 > b.length) return Map.empty
    val base = secOff.toInt
    val nProps = u32(base + 4)
    if (nProps < 0 || nProps > 256) return Map.empty
    val keys = Map(
      2L -> "dc:title", 3L -> "dc:subject", 4L -> "dc:creator",
      6L -> "dc:description", 8L -> "meta:last-author",
      18L -> "extended-properties:Application")
    var meta = Map.empty[String, String]
    var i = 0
    while (i < nProps) {
      val pid = u32(base + 8 + i * 8)
      val off = u32(base + 8 + i * 8 + 4)
      // off is a raw u32: an OOB/sentinel value (e.g. 0xffffffff) must lose
      // only this property, not throw past the property loop and degrade
      // the whole document (incl. extractable body text) to parse_error
      if (off >= 0 && base.toLong + off + 8 <= b.length) keys.get(pid).foreach { key =>
        val p = base + off.toInt
        val typ = u32(p)
        val v: Option[String] = typ match {
          case 30 => // VT_LPSTR: length (incl. NUL) + ANSI bytes
            val len = u32(p + 4).toInt
            if (len > 0 && len <= (1 << 16) && p + 8 + len <= b.length)
              Some(new String(b, p + 8, len,
                java.nio.charset.Charset.forName("windows-1252"))
                .takeWhile(_ != 0.toChar))
            else None
          case 31 => // VT_LPWSTR: length in chars (incl. NUL) + UTF-16LE
            val len = u32(p + 4).toInt
            if (len > 0 && len <= (1 << 16) && p + 8 + len * 2 <= b.length)
              Some(new String(b, p + 8, len * 2,
                java.nio.charset.StandardCharsets.UTF_16LE)
                .takeWhile(_ != 0.toChar))
            else None
          case _ => None
        }
        v.filter(_.nonEmpty).foreach { s =>
          meta += (key -> s)
          if (key == "dc:creator") meta += ("meta:author" -> s)
        }
      }
      i += 1
    }
    meta
  }

  private def fibFlag(wd: Array[Byte], mask: Int): Boolean =
    wd.length >= 12 && (((wd(10) & 0xff) | ((wd(11) & 0xff) << 8)) & mask) != 0

  /** FIB text: the fComplex piece table (Clx in the table stream) when
    * present and parseable, else the non-complex fcMin/fcMac range.
    */
  private def docText(wd: Array[Byte], table: Option[Array[Byte]]): String = {
    if (wd.length < 32) return ""
    val magic = (wd(0) & 0xff) | ((wd(1) & 0xff) << 8)
    if (magic != 0xa5ec) return ""
    val viaPieces = table.flatMap(t => pieceTableText(wd, t))
    viaPieces.getOrElse(rangeText(wd))
  }

  /** fcClx/lcbClx from the variable-length FIB: base(32) + csw + rgW +
    * cslw + rgLw + cbRgFcLcb + rgFcLcb, with fcClx = FcLcb pair 33.
    */
  private def pieceTableText(wd: Array[Byte], table: Array[Byte]): Option[String] = {
    def u16(p: Int): Int =
      if (p + 2 > wd.length) -1 else (wd(p) & 0xff) | ((wd(p + 1) & 0xff) << 8)
    def u32(b: Array[Byte], p: Int): Long =
      if (p + 4 > b.length) -1L
      else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    val csw = u16(32)
    if (csw < 0 || csw > 0x100) return None
    val cslwAt = 34 + csw * 2
    val cslw = u16(cslwAt)
    if (cslw < 0 || cslw > 0x100) return None
    val cbAt = cslwAt + 2 + cslw * 4
    val cb = u16(cbAt)
    if (cb < 34) return None // need at least 34 pairs to reach fcClx
    val rg = cbAt + 2
    val fcClx = u32(wd, rg + 33 * 8)
    val lcbClx = u32(wd, rg + 33 * 8 + 4)
    if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length) return None

    // Clx: RgPrc (clxt=0x01 blocks) then Pcdt (clxt=0x02 + lcb + PlcPcd)
    var pos = fcClx.toInt
    val end = (fcClx + lcbClx).toInt
    while (pos < end && (table(pos) & 0xff) == 0x01) {
      val cbG = (table(pos + 1) & 0xff) | ((table(pos + 2) & 0xff) << 8)
      pos += 3 + cbG
    }
    if (pos >= end || (table(pos) & 0xff) != 0x02) return None
    val lcb = u32(table, pos + 1)
    val plc = pos + 5
    if (lcb < 4 + 12 || plc + lcb > end) return None
    val n = ((lcb - 4) / 12).toInt
    if (n <= 0 || n > (1 << 20)) return None
    val cps = Array.tabulate(n + 1)(k => u32(table, plc + k * 4))
    val sb = new StringBuilder
    var k = 0
    while (k < n) {
      val pcdOff = plc + (n + 1) * 4 + k * 8
      val fcRaw = u32(table, pcdOff + 2)
      val chars = (cps(k + 1) - cps(k)).toInt
      if (chars < 0 || sb.length + chars > MaxTextChars) return None
      val compressed = (fcRaw & 0x40000000L) != 0L
      if (compressed) {
        val off = ((fcRaw & 0x3fffffffL) >>> 1).toInt
        if (off < 0 || off + chars > wd.length) return None
        sb.append(new String(wd, off, chars,
          java.nio.charset.Charset.forName("windows-1252")))
      } else {
        val off = (fcRaw & 0x3fffffffL).toInt
        if (off < 0 || off + chars * 2 > wd.length) return None
        sb.append(new String(wd, off, chars * 2,
          java.nio.charset.StandardCharsets.UTF_16LE))
      }
      k += 1
    }
    Some(clean(sb.toString))
  }

  /** Non-complex layout: fcMin/fcMac at 24/28 bound the text run. 8-bit
    * cp1252 unless the bytes look UTF-16LE.
    */
  private def rangeText(wd: Array[Byte]): String = {
    def u32(p: Int): Int =
      ((wd(p) & 0xff) | ((wd(p + 1) & 0xff) << 8) |
        ((wd(p + 2) & 0xff) << 16) | ((wd(p + 3) & 0xff) << 24))
    val fcMin = u32(24)
    val fcMac = u32(28)
    if (fcMin < 0 || fcMac <= fcMin || fcMac > wd.length) return ""
    val slice = java.util.Arrays.copyOfRange(wd, fcMin, fcMac)
    // UTF-16LE heuristic: half the even or odd bytes are NUL.
    var nulEven = 0
    var k = 0
    while (k + 1 < slice.length) { if (slice(k + 1) == 0) nulEven += 1; k += 2 }
    val text =
      if (slice.length >= 4 && nulEven * 2 > slice.length / 2)
        new String(slice, java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(slice, java.nio.charset.Charset.forName("windows-1252"))
    clean(text)
  }

  /** Word paragraph mark is CR. Table marks map onto the shared
    * tab-joined row convention (same surface as DOCX/ODT/RTF/HTML): in
    * the character stream every cell ends with 0x07 and the row itself
    * ends with a TTP paragraph that is one more 0x07, so "A␇B␇␇" is a
    * two-cell row — the doubled mark becomes the row's newline and the
    * remaining single marks become the in-row tab joins. Control chars
    * other than tab/newline are stripped.
    */
  private def clean(text: String): String =
    text.replace("\r\n", "\n").replace('\r', '\n')
      .replace("" + 7.toChar + 7.toChar, "\n").replace(7.toChar, '\t')
      .filter(c => c == '\n' || c == '\t' || c >= ' ')
}
