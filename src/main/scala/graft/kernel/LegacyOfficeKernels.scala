package graft.kernel

/** Legacy binary Office kernels over the shared Cfb walker: .xls (BIFF8)
  * and .ppt (PowerPoint 97-2003 record stream). Real document lakes are
  * full of both; the reference reaches them through Tika
  * (reference: README.md:3-8). Bounded, from-scratch, never-throw.
  */

/** BIFF8 workbook text: record walk of the `Workbook` stream — SST
  * (shared strings, incl. Continue-record splits BETWEEN and WITHIN
  * strings), LABELSST / NUMBER / RK cells, sheet substreams delimited by
  * BOF records. Text shape matches XlsxKernel: one line per row, cells
  * tab-separated, sheets separated by a blank line.
  */
object XlsKernel {

  final case class Result(sheets: Vector[String], metadata: Map[String, String]) {
    def text: String = sheets.filter(_.nonEmpty).mkString("\n\n")
  }

  def isXls(c: Cfb.Reader): Boolean =
    c.stream("Workbook").isDefined || c.stream("Book").isDefined

  def extract(c: Cfb.Reader): Result = {
    val wb = c.stream("Workbook").orElse(c.stream("Book"))
      .getOrElse(return Result(Vector.empty, Map.empty))
    def u16(p: Int): Int = (wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (wb(p) & 0xffL) | ((wb(p + 1) & 0xffL) << 8) |
        ((wb(p + 2) & 0xffL) << 16) | ((wb(p + 3) & 0xffL) << 24)

    var sst = Vector.empty[String]
    // cells per sheet substream: (sheet, row, col) -> text
    val cells = scala.collection.mutable.ArrayBuffer[(Int, Int, Int, String)]()
    var sheet = -1 // globals substream is sheet -1; first worksheet BOF -> 0
    var p = 0
    var guard = 0
    while (p + 4 <= wb.length && guard < (1 << 22)) {
      guard += 1
      val op = u16(p)
      val len = u16(p + 2)
      val body = p + 4
      if (body + len > wb.length) { p = wb.length }
      else {
        op match {
          case 0x0809 => sheet += 1 // BOF: globals first, then one per sheet
          case 0x00fc => // SST: payload + any directly-following Continues
            var segs = Vector((body, len))
            var q = body + len
            while (q + 4 <= wb.length && u16(q) == 0x003c) {
              val cl = u16(q + 2)
              if (q + 4 + cl > wb.length) q = wb.length
              else { segs :+= (q + 4, cl); q += 4 + cl }
            }
            sst = parseSst(wb, segs)
          case 0x00fd if len >= 10 => // LABELSST
            val isst = u32(body + 6).toInt
            if (isst >= 0 && isst < sst.size)
              cells += ((sheet, u16(body), u16(body + 2), sst(isst)))
          case 0x0203 if len >= 14 => // NUMBER (IEEE754 LE at +6)
            val bits = (0 until 8).foldRight(0L)((k, acc) => (acc << 8) | (wb(body + 6 + k) & 0xffL))
            cells += ((sheet, u16(body), u16(body + 2), fmt(java.lang.Double.longBitsToDouble(bits))))
          case 0x027e if len >= 10 => // RK
            val rk = u32(body + 6)
            cells += ((sheet, u16(body), u16(body + 2), fmt(rkValue(rk))))
          case _ => ()
        }
        p = body + len
      }
    }
    val sheets = cells.groupBy(_._1).toVector.sortBy(_._1).map { case (_, cs) =>
      cs.groupBy(_._2).toVector.sortBy(_._1).map { case (_, row) =>
        row.sortBy(_._3).map(_._4).mkString("\t")
      }.mkString("\n")
    }
    Result(sheets, Map.empty)
  }

  /** RK-encoded number: bit0 = /100, bit1 = int30 vs double-high-bits. */
  private def rkValue(rk: Long): Double = {
    val v =
      if ((rk & 2) != 0) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** XLUnicodeRichExtendedString list over SST segments. The header
    * (total u32, unique u32) opens the first segment; char data may hit a
    * segment boundary mid-string, where the next segment re-opens with a
    * fresh grbit byte (the compressed/wide flag may CHANGE mid-string).
    */
  private def parseSst(wb: Array[Byte], segs: Vector[(Int, Int)]): Vector[String] = {
    var si = 0
    var p = segs(si)._1
    def end = segs(si)._1 + segs(si)._2
    def more: Boolean = p < end || si + 1 < segs.size
    def hop(): Boolean = { // advance to next segment when exhausted
      if (p >= end) {
        if (si + 1 >= segs.size) return false
        si += 1; p = segs(si)._1
      }
      true
    }
    def u8(): Int = { if (!hop()) return -1; val v = wb(p) & 0xff; p += 1; v }
    def u16(): Int = { val a = u8(); val b = u8(); if (a < 0 || b < 0) -1 else a | (b << 8) }
    def u32(): Long = { val a = u16(); val b = u16(); if (a < 0 || b < 0) -1L else (a.toLong | (b.toLong << 16)) }

    if (u32() < 0 || u32() < 0) return Vector.empty // cstTotal, cstUnique headers
    val out = Vector.newBuilder[String]
    var n = 0
    while (more && n < (1 << 20)) {
      val cch = u16()
      if (cch < 0) n = 1 << 20
      else {
        var grbit = u8()
        if (grbit < 0) n = 1 << 20
        else {
          val cRun = if ((grbit & 8) != 0) u16() else 0
          val cbExt = if ((grbit & 4) != 0) u32() else 0L
          val sb = new StringBuilder
          var k = 0
          var ok = true
          while (k < cch && ok) {
            if (p >= end) { // segment boundary inside char data: new grbit
              ok = hop()
              if (ok) grbit = u8()
              if (grbit < 0) ok = false
            }
            if (ok) {
              if ((grbit & 1) != 0) { // wide: UTF-16LE code unit
                val lo = u8(); val hi = u8()
                if (lo < 0 || hi < 0) ok = false
                else sb.append((lo | (hi << 8)).toChar)
              } else {
                val b = u8()
                if (b < 0) ok = false
                else sb.append(new String(Array(b.toByte),
                  java.nio.charset.Charset.forName("windows-1252")).charAt(0))
              }
              k += 1
            }
          }
          if (!ok) n = 1 << 20
          else {
            // skip rich runs (4 bytes each) + ext block
            var skip = cRun * 4 + cbExt
            while (skip > 0 && hop()) {
              val take = math.min(skip, (end - p).toLong)
              p += take.toInt; skip -= take
              if (skip > 0 && p >= end && si + 1 >= segs.size) skip = 0
            }
            out += sb.toString
            n += 1
          }
        }
      }
    }
    out.result()
  }
}

/** PowerPoint 97-2003: recursive record walk of the `PowerPoint Document`
  * stream collecting TextCharsAtom (UTF-16LE) / TextBytesAtom (cp1252)
  * payloads in stream order — the same atom set Tika's extractor reads.
  */
object PptKernel {

  final case class Result(paragraphs: Vector[String]) {
    def text: String = paragraphs.filter(_.nonEmpty).mkString("\n")
  }

  def isPpt(c: Cfb.Reader): Boolean = c.stream("PowerPoint Document").isDefined

  def extract(c: Cfb.Reader): Result = {
    val b = c.stream("PowerPoint Document")
      .getOrElse(return Result(Vector.empty))
    val out = Vector.newBuilder[String]
    walk(b, 0, b.length, 0, out)
    Result(out.result().flatMap(_.split("[\r]").toVector).map(_.trim).filter(_.nonEmpty))
  }

  private def walk(b: Array[Byte], start: Int, limit: Int, depth: Int,
      out: scala.collection.mutable.Builder[String, Vector[String]]): Unit = {
    if (depth > 16) return
    def u16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    var p = start
    while (p + 8 <= limit) {
      val verInst = u16(p)
      val typ = u16(p + 2)
      val len = u32(p + 4)
      val body = p + 8
      if (len < 0 || body + len > limit) return
      val e = (body + len).toInt
      if ((verInst & 0xf) == 0xf) walk(b, body, e, depth + 1, out) // container
      else typ match {
        case 0x0fa0 => // TextCharsAtom (UTF-16LE)
          out += new String(b, body, (len.toInt / 2) * 2,
            java.nio.charset.StandardCharsets.UTF_16LE)
        case 0x0fa8 => // TextBytesAtom (cp1252)
          out += new String(b, body, len.toInt,
            java.nio.charset.Charset.forName("windows-1252"))
        case _ => ()
      }
      p = e
    }
  }
}
