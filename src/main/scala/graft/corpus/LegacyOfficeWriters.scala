package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Deterministic legacy binary Office writers (.xls BIFF8, .ppt) with
  * analytically-known expected text, built on CfbWriter.buildStreams.
  */

object XlsBinWriter {

  /** sheets: sheet -> rows -> cells; all-digit cells become NUMBER
    * records, others LABELSST via the SST. splitSst forces a Continue
    * record that splits MID-STRING (char-aligned, fresh grbit) — the
    * BIFF8 corner real Excel files exercise constantly.
    */
  final case class Spec(title: String, author: String,
      sheets: Vector[Vector[Vector[String]]], splitSst: Boolean)

  def expectedText(spec: Spec): String =
    spec.sheets.map(_.map(_.mkString("\t")).mkString("\n"))
      .filter(_.nonEmpty).mkString("\n\n")

  def write(spec: Spec): Array[Byte] = {
    val textCells = spec.sheets.flatten.flatten.filterNot(isNum)
    val strings = textCells.distinct
    val isst = strings.zipWithIndex.toMap

    def u16(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def u32(out: ByteArrayOutputStream, v: Long): Unit = {
      u16(out, (v & 0xffff).toInt); u16(out, ((v >> 16) & 0xffff).toInt)
    }
    def rec(op: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      u16(out, op); u16(out, payload.length); out.write(payload)
      out.toByteArray
    }

    def strBytes(s: String, wide: Boolean): Array[Byte] =
      if (wide) s.getBytes(StandardCharsets.UTF_16LE)
      else s.getBytes(StandardCharsets.US_ASCII)

    // SST payload(s): header + XLUnicodeRichExtendedString list. When
    // splitSst, the middle string's char data is cut at a char boundary;
    // the Continue segment re-opens with a fresh grbit byte.
    val sstRecords: Array[Byte] = {
      val seg1 = new ByteArrayOutputStream()
      u32(seg1, strings.size.toLong); u32(seg1, strings.size.toLong)
      val splitAt = if (spec.splitSst && strings.nonEmpty) strings.size / 2 else -1
      var seg2: ByteArrayOutputStream = null
      strings.zipWithIndex.foreach { case (s, i) =>
        val wide = s.exists(_ > 0x7f)
        val grbit = if (wide) 1 else 0
        val target = if (seg2 != null) seg2 else seg1
        if (i == splitAt && s.length >= 2) {
          // header + first half in segment 1, fresh grbit + rest in segment 2
          u16(seg1, s.length); seg1.write(grbit)
          val cut = s.length / 2
          seg1.write(strBytes(s.substring(0, cut), wide))
          seg2 = new ByteArrayOutputStream()
          seg2.write(grbit)
          seg2.write(strBytes(s.substring(cut), wide))
        } else {
          u16(target, s.length); target.write(grbit)
          target.write(strBytes(s, wide))
        }
      }
      val out = new ByteArrayOutputStream()
      out.write(rec(0x00fc, seg1.toByteArray))
      if (seg2 != null) out.write(rec(0x003c, seg2.toByteArray))
      out.toByteArray
    }

    def bof(dt: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      u16(out, 0x0600); u16(out, dt)
      u16(out, 0x0dbb); u16(out, 0x07cc); u32(out, 0L); u32(out, 0x0600L)
      rec(0x0809, out.toByteArray)
    }
    val eof = rec(0x000a, Array.emptyByteArray)

    def cell(row: Int, col: Int, v: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      u16(out, row); u16(out, col); u16(out, 0) // ixfe
      if (isNum(v)) {
        val bits = java.lang.Double.doubleToLongBits(v.toDouble)
        var k = 0
        while (k < 8) { out.write(((bits >> (8 * k)) & 0xff).toInt); k += 1 }
        rec(0x0203, out.toByteArray)
      } else {
        u32(out, isst(v).toLong)
        rec(0x00fd, out.toByteArray)
      }
    }

    val wb = new ByteArrayOutputStream()
    wb.write(bof(0x0005)) // globals
    wb.write(sstRecords)
    wb.write(eof)
    spec.sheets.foreach { rows =>
      wb.write(bof(0x0010)) // worksheet
      rows.zipWithIndex.foreach { case (cells, r) =>
        cells.zipWithIndex.foreach { case (v, c) => wb.write(cell(r, c, v)) }
      }
      wb.write(eof)
    }
    CfbWriter.buildStreams(Seq(
      "Workbook" -> wb.toByteArray,
      "SummaryInformation" -> CfbWriter.summaryInfo(
        Option(spec.title), Option(spec.author))))
  }

  private def isNum(s: String): Boolean = s.nonEmpty && s.forall(_.isDigit)
}

object PptBinWriter {

  final case class Spec(slides: Vector[Vector[String]]) // slide -> paragraphs

  def expectedText(spec: Spec): String =
    spec.slides.flatten.map(_.trim).filter(_.nonEmpty).mkString("\n")

  def write(spec: Spec): Array[Byte] = {
    def u16(out: ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def rec(verInst: Int, typ: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      u16(out, verInst); u16(out, typ)
      val n = payload.length
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
      out.write(payload)
      out.toByteArray
    }
    def atom(p: String): Array[Byte] =
      if (p.forall(_ < 0x80))
        rec(0x0000, 0x0fa8, p.getBytes(StandardCharsets.US_ASCII))
      else
        rec(0x0000, 0x0fa0, p.getBytes(StandardCharsets.UTF_16LE))

    val slides = spec.slides.map { paras =>
      val body = new ByteArrayOutputStream()
      paras.foreach(p => body.write(atom(p)))
      rec(0x000f, 0x03ee, body.toByteArray) // slide container
    }
    val doc = new ByteArrayOutputStream()
    slides.foreach(doc.write)
    val stream = rec(0x000f, 0x03e8, doc.toByteArray) // document container
    CfbWriter.buildStreams(Seq(
      "PowerPoint Document" -> stream,
      "Current User" -> Array.fill[Byte](16)(0)))
  }
}
