package graft.kernel

/** JBIG2 (ITU-T T.88) — the bilevel image coding PDF embeds for scanned
  * pages via /Filter /JBIG2Decode (ISO 32000 §7.4.7). Scope: the
  * "embedded organization" (no file header, 1-byte page associations),
  * page information segments, and immediate generic region segments
  * coded with MMR=1 — whose body is exactly the T.6 (G4) bitstream the
  * CcittFax engine already decodes (k = -1, no EOLs). Regions composite
  * onto the page bitmap with OR, the T.88 default for generic regions.
  * Arithmetic-coded (MQ) generic regions and symbol/text segments are
  * out of scope and fail the decode (the PDF layer then passes the
  * stream through untouched, same as any unsupported filter).
  *
  * Reference behavior: lib/rika/parser.rb delegates to Tika, whose PDF
  * chain hands JBIG2 streams to a decoder with this same embedded
  * segment model.
  */
object Jbig2 {

  /** One decoded generic region: position + packed rows (1 = black,
    * MSB-first, stride ceil(w/8)).
    */
  final case class Region(x: Int, y: Int, w: Int, h: Int, packed: Array[Byte])

  private final case class Seg(num: Long, segType: Int, page: Long,
      payload: Array[Byte])

  private val MaxDim = 1 << 16
  private val MaxArea = 1 << 26 // 64 Mpx packed = 8 MiB page bitmap

  private def be32(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)

  /** Parse the embedded-organization segment sequence. Returns None on
    * any structural violation (truncation, unknown-length segments).
    */
  private def segments(data: Array[Byte]): Option[Vector[Seg]] = {
    val out = Vector.newBuilder[Seg]
    var off = 0
    var n = 0
    while (off < data.length) {
      if (n > 1024 || off + 11 > data.length) return None
      val num = be32(data, off)
      val flags = data(off + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      off += 5
      // referred-to segment count + retain bits (T.88 §7.2.4)
      val rt = data(off) & 0xff
      val cnt = rt >>> 5
      var count = 0
      if (cnt == 7) {
        if (off + 4 > data.length) return None
        count = (be32(data, off) & 0x1fffffffL).toInt
        if (count > 256) return None
        off += 4 + (count + 8) / 8 // long form: retain bits follow
      } else {
        count = cnt
        off += 1
      }
      // referred segment numbers: size keyed to THIS segment's number
      val refSize = if (num <= 256) 1 else if (num <= 65536) 2 else 4
      off += count * refSize
      if (off + (if (pageAssoc4) 8 else 5) > data.length) return None
      val page = if (pageAssoc4) { val p = be32(data, off); off += 4; p }
      else { val p = (data(off) & 0xffL); off += 1; p }
      val len = be32(data, off)
      off += 4
      if (len == 0xffffffffL) return None // unknown length: unsupported
      if (len > (data.length - off).toLong) return None
      val payload = java.util.Arrays.copyOfRange(data, off, off + len.toInt)
      off += len.toInt
      out += Seg(num, segType, page, payload)
      n += 1
    }
    Some(out.result())
  }

  /** Generic region segment payload (types 36/38/39) -> Region; MMR-coded
    * bodies only.
    */
  private def genericRegion(payload: Array[Byte]): Option[Region] = {
    if (payload.length < 18) return None
    val w = be32(payload, 0)
    val h = be32(payload, 4)
    val x = be32(payload, 8)
    val y = be32(payload, 12)
    // payload(16) = external combination operator (region composes with
    // OR for our scope); payload(17) = generic region flags
    val flags = payload(17) & 0xff
    val mmr = (flags & 1) == 1
    val template = (flags >> 1) & 3
    val tpgdon = (flags >> 3) & 1
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || w * h > MaxArea ||
      x > MaxDim || y > MaxDim) return None
    if (mmr) {
      val body = java.util.Arrays.copyOfRange(payload, 18, payload.length)
      CcittFax.decode(body, k = -1, columns = w.toInt, rows = h.toInt,
          blackIs1 = true, byteAlign = false)
        .map { case (px, _) => Region(x.toInt, y.toInt, w.toInt, h.toInt, px) }
    } else {
      // arithmetic (MQ) generic coding: templates 0-3 with nominal AT
      // pixels, with or without TPGDON (typical prediction, the
      // real-encoder default); adaptive (non-nominal) AT positions
      // fail the decode (PDF layer passes the stream through)
      val at = NominalAt(template)
      if (payload.length < 18 + at.length) return None
      var i = 0
      var nominal = true
      while (i < at.length) {
        if (payload(18 + i) != at(i)) nominal = false
        i += 1
      }
      if (!nominal) return None
      val body = java.util.Arrays.copyOfRange(payload, 18 + at.length, payload.length)
      decodeGenericArith(body, w.toInt, h.toInt, template, tpgdon == 1)
        .map(px => Region(x.toInt, y.toInt, w.toInt, h.toInt, px))
    }
  }

  /** Nominal AT pixel positions per template (T.88 §6.2.5.3): with
    * these, each template's context is a contiguous raster window —
    * template 0: rows y-2 (x-2..x+2), y-1 (x-3..x+3), y (x-4..x-1), 16
    * bits; template 1: (x-1..x+2)/(x-2..x+3)/(x-3..x-1), 13 bits;
    * template 2: (x-1..x+1)/(x-2..x+2)/(x-2..x-1), 10 bits; template 3
    * (one reference row): (x-3..x+2)/(x-4..x-1), 10 bits — packed in
    * raster order MSB-first. Encoder and decoder share contextAt, so
    * the pair stays conformance-locked by construction.
    */
  private val NominalAt: Array[Array[Byte]] = Array(
    Array(3, -1, -3, -1, 2, -2, -2, -2),
    Array(3, -1),
    Array(2, -1),
    Array(2, -1))

  @inline private def bitOf(px: Array[Byte], stride: Int, w: Int, h: Int,
      x: Int, y: Int): Int =
    if (x < 0 || x >= w || y < 0 || y >= h) 0
    else (px(y * stride + (x >> 3)) >> (7 - (x & 7))) & 1

  // per-template context windows: (dxFrom, dxTo) for rows y-2, y-1, y
  // (y-2 absent for template 3)
  private val CtxRows: Array[Array[Int]] = Array(
    Array(-2, 2, -3, 3, -4, -1),
    Array(-1, 2, -2, 3, -3, -1),
    Array(-1, 1, -2, 2, -2, -1),
    Array(0, -1, -3, 2, -4, -1)) // (0, -1) = empty y-2 row

  private def contextAt(template: Int, px: Array[Byte], stride: Int,
      w: Int, h: Int, x: Int, y: Int): Int = {
    val r = CtxRows(template)
    var ctx = 0
    var dx = r(0)
    while (dx <= r(1)) { ctx = (ctx << 1) | bitOf(px, stride, w, h, x + dx, y - 2); dx += 1 }
    dx = r(2)
    while (dx <= r(3)) { ctx = (ctx << 1) | bitOf(px, stride, w, h, x + dx, y - 1); dx += 1 }
    dx = r(4)
    while (dx <= r(5)) { ctx = (ctx << 1) | bitOf(px, stride, w, h, x + dx, y); dx += 1 }
    ctx
  }

  /** TPGDON's per-row "typical" flag is coded in a per-template fixed
    * context (T.88 §6.2.5.7); a typical row copies the row above.
    */
  private val LtpContext = Array(0x9B25, 0x0795, 0x00E5, 0x0195)

  private def decodeGenericArith(data: Array[Byte], w: Int, h: Int,
      template: Int, tpgdon: Boolean): Option[Array[Byte]] = {
    val stride = (w + 7) / 8
    val out = new Array[Byte](stride * h)
    val cx = new Array[Byte](1 << 16)
    val dec = new MqCoder.Dec(data)
    var ltp = 0
    var y = 0
    while (y < h) {
      if (tpgdon) ltp ^= dec.decode(cx, LtpContext(template))
      if (ltp == 1) {
        // typical row: copy the previous (row 0 copies the all-white top)
        if (y > 0)
          System.arraycopy(out, (y - 1) * stride, out, y * stride, stride)
      } else {
        var x = 0
        while (x < w) {
          if (dec.decode(cx, contextAt(template, out, stride, w, h, x, y)) == 1)
            out(y * stride + (x >> 3)) = (out(y * stride + (x >> 3)) | (0x80 >> (x & 7))).toByte
          x += 1
        }
      }
      y += 1
    }
    Some(out)
  }

  /** MQ-encode a packed plane as a template-0 generic region body (the
    * inverse of decodeGenericArith) — the corpus writer's oracle hook,
    * kept beside the decoder like CcittFax.encode.
    */
  private[graft] def encodeGenericArith(px: Array[Byte], w: Int, h: Int,
      tpgdon: Boolean = false, template: Int = 0): Array[Byte] = {
    val stride = (w + 7) / 8
    val cx = new Array[Byte](1 << 16)
    val enc = new MqCoder.Enc
    var ltp = 0
    var y = 0
    while (y < h) {
      var typical = false
      if (tpgdon) {
        typical = rowEqualsPrev(px, stride, y)
        val sltp = ltp ^ (if (typical) 1 else 0)
        enc.encode(cx, LtpContext(template), sltp)
        ltp ^= sltp
      }
      if (!typical) {
        var x = 0
        while (x < w) {
          enc.encode(cx, contextAt(template, px, stride, w, h, x, y),
            bitOf(px, stride, w, h, x, y))
          x += 1
        }
      }
      y += 1
    }
    enc.flush()
  }

  private def rowEqualsPrev(px: Array[Byte], stride: Int, y: Int): Boolean = {
    var i = 0
    while (i < stride) {
      val prev = if (y == 0) 0.toByte else px((y - 1) * stride + i)
      if (px(y * stride + i) != prev) return false
      i += 1
    }
    true
  }

  /** The AT-pixel bytes the writer emits for a template. */
  private[graft] def nominalAtBytes(template: Int = 0): Array[Byte] =
    NominalAt(template).clone()

  /** Decode an embedded JBIG2 stream to the page bitmap: (packed 1=black
    * rows, width, height). Page dims come from the page information
    * segment; 0xffffffff (striped/unknown) height falls back to the
    * regions' extent.
    */
  def decodeEmbedded(data: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
    val segs = segments(data).getOrElse(return None)
    var pageW = -1L
    var pageH = -1L
    val regions = Vector.newBuilder[Region]
    segs.foreach { s =>
      s.segType match {
        case 48 => // page information
          if (s.payload.length >= 8) {
            pageW = be32(s.payload, 0)
            pageH = be32(s.payload, 4)
          }
        case 36 | 38 | 39 =>
          genericRegion(s.payload) match {
            case Some(r) => regions += r
            case None    => return None // unsupported coding: whole decode fails
          }
        case _ => () // end-of-page/file, extensions: no bitmap effect
      }
    }
    val rs = regions.result()
    if (rs.isEmpty) return None
    val w = (if (pageW > 0 && pageW <= MaxDim) pageW.toInt
             else rs.map(r => r.x + r.w).max)
    val h = (if (pageH > 0 && pageH != 0xffffffffL && pageH <= MaxDim) pageH.toInt
             else rs.map(r => r.y + r.h).max)
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || w.toLong * h > MaxArea)
      return None
    val stride = (w + 7) / 8
    val page = new Array[Byte](stride * h)
    rs.foreach { r =>
      val rStride = (r.w + 7) / 8
      var ry = 0
      while (ry < r.h) {
        val py = r.y + ry
        if (py >= 0 && py < h) {
          var rx = 0
          while (rx < r.w) {
            val bit = (r.packed(ry * rStride + (rx >> 3)) >> (7 - (rx & 7))) & 1
            val px = r.x + rx
            if (bit == 1 && px >= 0 && px < w) {
              val idx = py * stride + (px >> 3)
              page(idx) = (page(idx) | (0x80 >> (px & 7))).toByte
            }
            rx += 1
          }
        }
        ry += 1
      }
    }
    Some((page, w, h))
  }
}
