package graft.kernel

/** JBIG2 (ITU-T T.88) — the bilevel image coding PDF embeds for scanned
  * pages via /Filter /JBIG2Decode (ISO 32000 §7.4.7). Scope: the
  * "embedded organization" (no file header), page information segments,
  * immediate generic regions (MMR bodies through the CcittFax engine,
  * or MQ-arithmetic templates 0-3 with nominal AT pixels and TPGDON),
  * and the symbol-coded shape real text encoders emit: symbol
  * dictionaries (SDHUFF=0/REFAGG=0) + text regions (SBHUFF=0/REFINE=0/
  * TRANSPOSED=0) built on the Annex-A arithmetic integer procedures.
  * Regions composite onto the page bitmap with OR. Out of scope (decode
  * fails -> the PDF layer passes the stream through): Huffman-coded
  * segments, refinement/aggregate coding, halftone regions, non-nominal
  * AT pixels.
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
    val dec = new MqCoder.Dec(data)
    Some(decodeGenericWith(dec, new Array[Byte](1 << 16), w, h, template, tpgdon))
  }

  /** Generic-region bitmap decode against caller-owned coder state — the
    * symbol dictionary decodes all its symbol bitmaps through ONE
    * decoder and ONE context array (T.88 §6.5.8.1).
    */
  private def decodeGenericWith(dec: MqCoder.Dec, cx: Array[Byte],
      w: Int, h: Int, template: Int, tpgdon: Boolean): Array[Byte] = {
    val stride = (w + 7) / 8
    val out = new Array[Byte](stride * h)
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
    out
  }

  /** MQ-encode a packed plane as a template-0 generic region body (the
    * inverse of decodeGenericArith) — the corpus writer's oracle hook,
    * kept beside the decoder like CcittFax.encode.
    */
  private[graft] def encodeGenericArith(px: Array[Byte], w: Int, h: Int,
      tpgdon: Boolean = false, template: Int = 0): Array[Byte] = {
    val enc = new MqCoder.Enc
    encodeGenericWith(enc, new Array[Byte](1 << 16), px, w, h, template, tpgdon)
    enc.flush()
  }

  private[graft] def encodeGenericWith(enc: MqCoder.Enc, cx: Array[Byte],
      px: Array[Byte], w: Int, h: Int, template: Int, tpgdon: Boolean): Unit = {
    val stride = (w + 7) / 8
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

  /** One dictionary symbol: a small bitmap (1 = black, packed rows). */
  private final case class Sym(w: Int, h: Int, px: Array[Byte])

  /** Symbol dictionary segment (type 0), SDHUFF=0 / REFAGG=0 scope —
    * the arithmetic shape jbig2 text encoders emit: height classes via
    * IADH/IADW deltas, each symbol bitmap generic-coded through ONE
    * shared MQ decoder + context array (T.88 §6.5.8.1), export runs via
    * IAEX. `input` carries symbols from earlier dictionaries; returns
    * the dictionary's EXPORT list (the chain convention: a later dict
    * re-exports its inputs plus its new symbols).
    */
  private def symbolDict(payload: Array[Byte], input: Vector[Sym]): Option[Vector[Sym]] = {
    if (payload.length < 12) return None
    val flags = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
    if ((flags & 1) != 0 || ((flags >> 1) & 1) != 0) return None // SDHUFF/REFAGG
    val template = (flags >> 10) & 3
    val at = NominalAt(template)
    if (payload.length < 2 + at.length + 8) return None
    var i = 0
    while (i < at.length) {
      if (payload(2 + i) != at(i)) return None
      i += 1
    }
    val off = 2 + at.length
    val numEx = be32(payload, off)
    val numNew = be32(payload, off + 4)
    if (numNew < 0 || numNew > 4096 || numEx < 0 || numEx > 8192) return None
    val dec = new MqCoder.Dec(
      java.util.Arrays.copyOfRange(payload, off + 8, payload.length))
    val cxGb = new Array[Byte](1 << 16)
    val cxIadh = new Array[Byte](512)
    val cxIadw = new Array[Byte](512)
    val cxIaex = new Array[Byte](512)
    val newSyms = Vector.newBuilder[Sym]
    var made = 0
    var hcHeight = 0
    var areaBudget = 1 << 24 // adversarial cap: total symbol pixels
    while (made < numNew.toInt) {
      hcHeight += dec.int(cxIadh).getOrElse(return None)
      if (hcHeight <= 0 || hcHeight > 512) return None
      var symWidth = 0
      var cont = true
      // each height class runs to its IADW OOB marker — the final class's
      // marker must be CONSUMED even when the symbol count is already met,
      // or the export-run decode desyncs (T.88 §6.5.5 loop shape)
      while (cont) {
        dec.int(cxIadw) match {
          case None => cont = false // OOB: height class complete
          case Some(dw) =>
            symWidth += dw
            if (symWidth <= 0 || symWidth > 512 || made >= numNew.toInt)
              return None
            areaBudget -= symWidth * hcHeight
            if (areaBudget < 0) return None
            newSyms += Sym(symWidth, hcHeight,
              decodeGenericWith(dec, cxGb, symWidth, hcHeight, template, tpgdon = false))
            made += 1
        }
      }
    }
    val all = input ++ newSyms.result()
    val exported = Vector.newBuilder[Sym]
    var idx = 0
    var curFlag = false
    var guard = 0
    while (idx < all.length && guard < 10000) {
      guard += 1
      val run = dec.int(cxIaex).getOrElse(return None)
      if (run < 0) return None
      if (curFlag) {
        var j = 0
        while (j < run && idx + j < all.length) { exported += all(idx + j); j += 1 }
      }
      idx += run
      curFlag = !curFlag
    }
    Some(exported.result())
  }

  /** Text region segment (types 4/6/7), SBHUFF=0 / REFINE=0 /
    * TRANSPOSED=0 scope: §6.4.5 strip/instance decoding placing
    * dictionary symbols onto the region plane with OR.
    */
  private def textRegion(payload: Array[Byte], syms: Vector[Sym]): Option[Region] = {
    if (payload.length < 23 || syms.isEmpty) return None
    val w = be32(payload, 0); val h = be32(payload, 4)
    val x = be32(payload, 8); val y = be32(payload, 12)
    val flags = ((payload(17) & 0xff) << 8) | (payload(18) & 0xff)
    if ((flags & 1) != 0 || ((flags >> 1) & 1) != 0 || // SBHUFF / REFINE
      ((flags >> 6) & 1) != 0 || ((flags >> 9) & 1) != 0) // TRANSPOSED / DEFPIXEL
      return None
    val strips = 1 << ((flags >> 2) & 3)
    val refCorner = (flags >> 4) & 3
    var dsOffset = (flags >> 10) & 0x1f
    if (dsOffset > 15) dsOffset -= 32
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || w * h > MaxArea) return None
    val numInstances = be32(payload, 19)
    if (numInstances < 0 || numInstances > (1 << 20)) return None
    val symCodeLen =
      if (syms.length == 1) 1
      else 32 - Integer.numberOfLeadingZeros(syms.length - 1)
    val dec = new MqCoder.Dec(
      java.util.Arrays.copyOfRange(payload, 23, payload.length))
    val cxIadt = new Array[Byte](512)
    val cxIafs = new Array[Byte](512)
    val cxIads = new Array[Byte](512)
    val cxIait = new Array[Byte](512)
    val cxIaid = new Array[Byte](1 << (symCodeLen + 1))
    val stride = (w.toInt + 7) / 8
    val page = new Array[Byte](stride * h.toInt)
    var stripT = -dec.int(cxIadt).getOrElse(return None) * strips
    var firstS = 0
    var inst = 0
    var guard = 0
    var drawBudget = 1L << 28 // adversarial cap: total drawn pixels
    while (inst < numInstances.toInt && guard < (1 << 21)) {
      guard += 1
      stripT += dec.int(cxIadt).getOrElse(return None) * strips
      var curS = 0
      var first = true
      var stripDone = false
      while (!stripDone && inst < numInstances.toInt) {
        if (first) {
          firstS += dec.int(cxIafs).getOrElse(return None)
          curS = firstS
          first = false
        } else dec.int(cxIads) match {
          case None      => stripDone = true
          case Some(ids) => curS += ids + dsOffset
        }
        if (!stripDone) {
          val curT = if (strips == 1) 0 else dec.int(cxIait).getOrElse(return None)
          val t = stripT + curT
          val id = dec.id(cxIaid, symCodeLen)
          if (id < 0 || id >= syms.length) return None
          val sym = syms(id)
          val top = refCorner match {
            case 1 | 3 => t              // TOPLEFT / TOPRIGHT
            case _     => t - sym.h + 1  // BOTTOMLEFT / BOTTOMRIGHT
          }
          drawBudget -= sym.w.toLong * sym.h
          if (drawBudget < 0) return None
          drawSym(page, stride, w.toInt, h.toInt, sym, curS, top)
          curS += sym.w - 1
          inst += 1
        }
      }
    }
    if (inst < numInstances.toInt) return None
    Some(Region(x.toInt, y.toInt, w.toInt, h.toInt, page))
  }

  private def drawSym(page: Array[Byte], stride: Int, w: Int, h: Int,
      sym: Sym, left: Int, top: Int): Unit = {
    val sStride = (sym.w + 7) / 8
    var yy = 0
    while (yy < sym.h) {
      val py = top + yy
      if (py >= 0 && py < h) {
        var xx = 0
        while (xx < sym.w) {
          if (((sym.px(yy * sStride + (xx >> 3)) >> (7 - (xx & 7))) & 1) == 1) {
            val px = left + xx
            if (px >= 0 && px < w)
              page(py * stride + (px >> 3)) =
                (page(py * stride + (px >> 3)) | (0x80 >> (px & 7))).toByte
          }
          xx += 1
        }
      }
      yy += 1
    }
  }

  /** Decode an embedded JBIG2 stream to the page bitmap: (packed 1=black
    * rows, width, height). Page dims come from the page information
    * segment; 0xffffffff (striped/unknown) height falls back to the
    * regions' extent.
    */
  def decodeEmbedded(data: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
    val segs = segments(data).getOrElse(return None)
    var pageW = -1L
    var pageH = -1L
    var symbols = Vector.empty[Sym]
    val regions = Vector.newBuilder[Region]
    segs.foreach { s =>
      s.segType match {
        case 48 => // page information
          if (s.payload.length >= 8) {
            pageW = be32(s.payload, 0)
            pageH = be32(s.payload, 4)
          }
        case 0 => // symbol dictionary: exports replace the working set
          symbols = symbolDict(s.payload, symbols).getOrElse(return None)
        case 4 | 6 | 7 =>
          textRegion(s.payload, symbols) match {
            case Some(r) => regions += r
            case None    => return None
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
